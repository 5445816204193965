package graft

/** JVM-lifetime temp directories for query fixtures.
  *
  * The lifecycle / interop / streaming queries materialize a catalog root,
  * bucket blob, or checkpoint dir per INVOCATION, and Bench/Verify invoke
  * each builder several times per run — without cleanup, repeated runs
  * leave corpus-sized orphans in /tmp until the disk fills. Every fixture
  * root is created through here and deleted (best-effort, recursive) by one
  * JVM shutdown hook.
  */
object TempRoots {
  private val created = new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]()

  Runtime.getRuntime.addShutdownHook(new Thread(() => {
    created.forEach { p =>
      try deleteRecursively(p.toFile)
      catch { case _: Throwable => () } // best-effort; never block shutdown
    }
  }, "graft-temp-cleanup"))

  private def deleteRecursively(f: java.io.File): Unit = {
    val cs = f.listFiles()
    if (cs != null) cs.foreach(deleteRecursively)
    f.delete(); ()
  }

  /** Like Files.createTempDirectory, but registered for shutdown cleanup. */
  def create(prefix: String): java.nio.file.Path = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    created.add(p)
    p
  }
}
