package graft

import java.net.URI
import java.nio.file.Files
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import org.apache.hadoop.fs.{FileSystem, Path, RawLocalFileSystem}
import org.apache.spark.sql.functions._

import graft.collection._

/** The per-scheme atomic exclusive-create seam (r13, r12 VERDICT #4).
  *
  * Hadoop's `create(…, overwrite=false)` is a real CAS only where a single
  * arbiter serializes it (local kernel O_EXCL, HDFS namenode). On S3A and
  * most object stores it is check-then-create — two drivers flushing the
  * same collection could BOTH win a version claim, and the orphan sweep
  * would then delete the other winner's published data. The catalog
  * therefore refuses any scheme without a registered real-CAS protocol,
  * and deployments plug in their store's conditional PUT.
  *
  * `mocks3:` below is RawLocalFileSystem wearing an object-store scheme:
  * everything works EXCEPT that the scheme is not in the registry — the
  * refusal must fire before any multi-writer publish primitive runs. */
class ClaimProtocolSpec extends SparkSpec {
  import spark.implicits._

  private def mockRoot(scheme: String): String = {
    val impl = scheme match {
      case "mocks3"  => classOf[MockObjectStoreFs]
      case "mocks3b" => classOf[MockObjectStoreFsB]
      case _         => classOf[MockObjectStoreFsH]
    }
    spark.sparkContext.hadoopConfiguration
      .set(s"fs.$scheme.impl", impl.getName)
    // the meta-UPDATE path goes through FileContext (atomic rename),
    // which resolves the AbstractFileSystem side of the scheme
    if (scheme == "mocks3b")
      spark.sparkContext.hadoopConfiguration
        .set("fs.AbstractFileSystem.mocks3b.impl", classOf[MockAbstractFsB].getName)
    if (scheme == "mocks3h")
      spark.sparkContext.hadoopConfiguration
        .set("fs.AbstractFileSystem.mocks3h.impl", classOf[MockAbstractFsH].getName)
    s"$scheme://" + Files.createTempDirectory("graft-claimproto").toString
  }

  private def rows = (0 until 20)
    .map(i => (s"id-$i", Seq(i.toFloat, 1f, 2f, 3f))).toDF("id", "vector")

  private def meta(name: String) = CollectionMeta(name, dim = 4,
    distance = "euclidean",
    fields = Seq(IndexField("id", "string", primaryKey = true)))

  test("an unregistered scheme refuses LOUDLY at the first publish CAS") {
    val cat = new GraftCatalog(spark, mockRoot("mocks3"))
    val ex = intercept[UnsupportedOperationException](cat.createCollection(meta("c")))
    assert(ex.getMessage.contains("mocks3"))
    assert(ex.getMessage.contains("registerClaimProtocol"))
    assert(ex.getMessage.contains("check-then-create"))
  }

  test("a registered conditional-create protocol makes the store publishable") {
    // the deployment seam: this scheme's backing store (local disk here)
    // DOES have an atomic create — register it and the full lifecycle
    // works. A separate scheme from the refusal test: registrations are
    // process-global, and this one may outlive the test harmlessly.
    GraftCatalog.registerClaimProtocol("mocks3b", GraftCatalog.NioExclusiveCreate)
    locally {
      val cat = new GraftCatalog(spark, mockRoot("mocks3b"))
      cat.createCollection(meta("ok"))
      cat.loadCollection("ok")
      cat.insert("ok", rows)
      assert(cat.flush("ok") === 1)
      val hits = cat.search("ok", Array(5f, 1f, 2f, 3f), topK = 3)
        .select("id").collect().map(_.getString(0))
      assert(hits.head === "id-5")
      // duplicate create still loses loudly through the plugged protocol
      val ex = intercept[IllegalArgumentException](cat.createCollection(meta("ok")))
      assert(ex.getMessage.contains("already exists"))
    }
  }

  test("check-then-create really does double-win under a race — the hazard is real") {
    // The non-atomic shape the refusal exists to keep out: HEAD-then-PUT
    // with a latch forcing both racers past the HEAD before either PUT.
    // Both "win" — on a real object store that is two flushes believing
    // they own one version slot.
    val dir = Files.createTempDirectory("graft-racyproto")
    val target = new Path("file:" + dir.resolve("claim").toString)
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val pastTheCheck = new CountDownLatch(2)
    def checkThenCreate(): Boolean = {
      if (fs.exists(target)) return false // the HEAD
      pastTheCheck.countDown()
      pastTheCheck.await(10, TimeUnit.SECONDS) // both racers saw "absent"
      val os = fs.create(target, true) // the PUT (unconditional, like S3)
      try os.write(1) finally os.close()
      true
    }
    val pool = Executors.newFixedThreadPool(2)
    try {
      val a = pool.submit(() => checkThenCreate())
      val b = pool.submit(() => checkThenCreate())
      assert(a.get(30, TimeUnit.SECONDS) && b.get(30, TimeUnit.SECONDS),
        "both racers won the check-then-create — the exact corruption the " +
          "claim-protocol refusal prevents")
    } finally pool.shutdownNow()
    // the registered file: protocol on the same shape: exactly one winner
    val t2 = new Path("file:" + dir.resolve("claim2").toString)
    val wins = (1 to 2).map(i => GraftCatalog.NioExclusiveCreate
      .tryExclusiveCreate(fs, t2, Array[Byte](i.toByte)))
    assert(wins.count(identity) === 1)
  }

  // ---- the deployable HTTP conditional-PUT client (r13 verdict #3) ----

  /** An in-tree S3-ish endpoint enforcing TRUE compare-and-set semantics:
    * PUT with `If-None-Match: *` atomically creates the object iff absent
    * (server-side serialization — exactly the arbiter a real object store
    * provides), 412 when it exists. FILE-BACKED so the same bytes are
    * visible to a Hadoop FileSystem rooted at the same directory — the
    * catalog creates claims through the protocol but reads/deletes them
    * through `fs`, and on a real store both hit the same objects. */
  private class MockCasStore {
    import com.sun.net.httpserver.{HttpExchange, HttpServer}
    val server: HttpServer =
      HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.setExecutor(Executors.newFixedThreadPool(8))
    /** one-shot: commit (or refuse) as usual, then kill the exchange with
      * no response — the ambiguous network fault. */
    @volatile var dropNextResponse = false
    /** respond 503 to the next N PUTs (transient store faults). */
    @volatile var failuresRemaining = 0
    private val lock = new Object
    server.createContext("/", (ex: HttpExchange) => {
      val p = java.nio.file.Paths.get(ex.getRequestURI.getPath)
      def respond(code: Int, body: Array[Byte] = Array.emptyByteArray): Unit = {
        if (dropNextResponse) { dropNextResponse = false; ex.close() }
        else {
          ex.sendResponseHeaders(code, if (body.isEmpty) -1 else body.length)
          if (body.nonEmpty) ex.getResponseBody.write(body)
          ex.close()
        }
      }
      ex.getRequestMethod match {
        case "PUT" =>
          val body = ex.getRequestBody.readAllBytes()
          if (failuresRemaining > 0) { failuresRemaining -= 1; respond(503) }
          else if (ex.getRequestHeaders.getFirst("If-None-Match") != "*") respond(400)
          else lock.synchronized {
            if (java.nio.file.Files.exists(p)) respond(412)
            else {
              java.nio.file.Files.createDirectories(p.getParent)
              java.nio.file.Files.write(p, body)
              respond(200)
            }
          }
        case "GET" =>
          if (java.nio.file.Files.exists(p))
            respond(200, java.nio.file.Files.readAllBytes(p))
          else respond(404)
        case _ => respond(405)
      }
    })
    server.start()
    def uriFor(path: Path): java.net.URI =
      java.net.URI.create(s"http://127.0.0.1:${server.getAddress.getPort}" +
        path.toUri.getPath)
    def stop(): Unit = server.stop(0)
  }

  private def localFs =
    new Path("file:///").getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("HTTP conditional-PUT: N racers through the real client, exactly one " +
    "winner, the store holds the winner's token") {
    val store = new MockCasStore
    try {
      val client = new HttpConditionalPutClaim(store.uriFor)
      val dir = Files.createTempDirectory("graft-httpcas")
      val target = new Path("file:" + dir.resolve("claim").toString)
      val n = 8
      val start = new CountDownLatch(1)
      val pool = Executors.newFixedThreadPool(n)
      try {
        val futures = (0 until n).map { i =>
          val token = s"racer-$i".getBytes("UTF-8")
          pool.submit(() => {
            start.await(10, TimeUnit.SECONDS)
            (i, client.tryExclusiveCreate(localFs, target, token))
          })
        }
        start.countDown()
        val results = futures.map(_.get(30, TimeUnit.SECONDS))
        val winners = results.filter(_._2)
        assert(winners.size === 1,
          s"claim CAS must have exactly one winner, got ${winners.size}")
        val stored = new String(
          java.nio.file.Files.readAllBytes(dir.resolve("claim")), "UTF-8")
        assert(stored === s"racer-${winners.head._1}")
      } finally pool.shutdownNow()
    } finally store.stop()
  }

  test("HTTP conditional-PUT: 412 reads as a lost race; transient 503s retry " +
    "to a verdict; a deployment fault surfaces, never a phantom verdict") {
    val store = new MockCasStore
    try {
      val client = new HttpConditionalPutClaim(store.uriFor)
      val dir = Files.createTempDirectory("graft-httpcas2")
      val t1 = new Path("file:" + dir.resolve("c1").toString)
      assert(client.tryExclusiveCreate(localFs, t1, "a".getBytes))
      assert(!client.tryExclusiveCreate(localFs, t1, "b".getBytes)) // 412
      // transient faults: 2×503 then the conditional create proceeds
      store.failuresRemaining = 2
      val t2 = new Path("file:" + dir.resolve("c2").toString)
      assert(client.tryExclusiveCreate(localFs, t2, "c".getBytes))
      // a 4xx outside the contract (bad request here) is a FAULT: the
      // client must throw, not report a race verdict
      val bad = new HttpConditionalPutClaim(
        p => store.uriFor(p), sign = _.setRequestProperty("If-None-Match", "bogus"))
      val t3 = new Path("file:" + dir.resolve("c3").toString)
      intercept[GraftCatalog.ClaimProtocolFault] {
        bad.tryExclusiveCreate(localFs, t3, "d".getBytes)
      }
    } finally store.stop()
  }

  test("HTTP conditional-PUT: an ambiguous connection fault resolves by " +
    "ownership probe — win iff OUR token landed") {
    val store = new MockCasStore
    try {
      val client = new HttpConditionalPutClaim(store.uriFor)
      val dir = Files.createTempDirectory("graft-httpcas3")
      // fault AFTER our commit: the object holds our token ⇒ we won
      val t1 = new Path("file:" + dir.resolve("c1").toString)
      store.dropNextResponse = true
      assert(client.tryExclusiveCreate(localFs, t1, "mine".getBytes))
      // fault over an object someone ELSE committed ⇒ we lost
      val t2 = new Path("file:" + dir.resolve("c2").toString)
      assert(client.tryExclusiveCreate(localFs, t2, "theirs".getBytes))
      store.dropNextResponse = true
      assert(!client.tryExclusiveCreate(localFs, t2, "mine".getBytes))
    } finally store.stop()
  }

  test("the full catalog lifecycle publishes through the HTTP CAS on an " +
    "object-store scheme") {
    val store = new MockCasStore
    try {
      GraftCatalog.registerClaimProtocol("mocks3h",
        new HttpConditionalPutClaim(store.uriFor))
      val cat = new GraftCatalog(spark, mockRoot("mocks3h"))
      cat.createCollection(meta("web"))
      cat.loadCollection("web")
      cat.insert("web", rows)
      assert(cat.flush("web") === 1)
      val hits = cat.search("web", Array(5f, 1f, 2f, 3f), topK = 3)
        .select("id").collect().map(_.getString(0))
      assert(hits.head === "id-5")
      // a second flush claims the next version slot through the same CAS
      cat.insert("web", Seq(("id-99", Seq(99f, 1f, 2f, 3f))).toDF("id", "vector"))
      assert(cat.flush("web") === 2)
      // duplicate create still loses loudly through the HTTP protocol
      val ex = intercept[IllegalArgumentException](cat.createCollection(meta("web")))
      assert(ex.getMessage.contains("already exists"))
    } finally store.stop()
  }

  test("HadoopAtomicCreate: only already-exists means lost race — every other " +
    "create fault surfaces as the fault it is") {
    val dir = Files.createTempDirectory("graft-faultproto")
    // a store throwing a transient fault at create time (safemode / quota /
    // permission): must PROPAGATE, not read as a phantom concurrent creator
    class FaultyFs extends RawLocalFileSystem {
      override def create(f: Path, overwrite: Boolean): org.apache.hadoop.fs.FSDataOutputStream =
        throw new java.io.IOException("namenode is in safe mode")
    }
    val faulty = new FaultyFs
    faulty.initialize(new URI("file:///"), spark.sparkContext.hadoopConfiguration)
    val ex = intercept[java.io.IOException](GraftCatalog.HadoopAtomicCreate
      .tryExclusiveCreate(faulty, new Path("file:" + dir.resolve("c1")), Array[Byte](1)))
    assert(ex.getMessage.contains("safe mode"))
    // already-exists still reports the lost race quietly (false, no throw)
    val real = new Path("file:" + dir.toString)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val p = new Path("file:" + dir.resolve("c2"))
    assert(GraftCatalog.HadoopAtomicCreate.tryExclusiveCreate(real, p, Array[Byte](1)))
    assert(!GraftCatalog.HadoopAtomicCreate.tryExclusiveCreate(real, p, Array[Byte](2)))
  }
}

/** RawLocalFileSystem wearing an object-store scheme — everything works
  * except the scheme is unknown to the claim registry. */
class MockObjectStoreFs extends RawLocalFileSystem {
  override def getScheme: String = "mocks3"
  override def getUri: URI = URI.create("mocks3:///")
}

/** Same, on the scheme the registration test claims. */
class MockObjectStoreFsB extends RawLocalFileSystem {
  override def getScheme: String = "mocks3b"
  override def getUri: URI = URI.create("mocks3b:///")
}

/** FileContext-side binding for mocks3b (the catalog's atomic meta-replace
  * rename goes through AbstractFileSystem). */
class MockAbstractFsB(uri: URI, conf: org.apache.hadoop.conf.Configuration)
  extends org.apache.hadoop.fs.DelegateToFileSystem(
    uri, new MockObjectStoreFsB, conf, "mocks3b", false)

/** The scheme the HTTP-CAS lifecycle test publishes through: local-disk
  * data, claims via the HTTP conditional-PUT protocol. */
class MockObjectStoreFsH extends RawLocalFileSystem {
  override def getScheme: String = "mocks3h"
  override def getUri: URI = URI.create("mocks3h:///")
}

class MockAbstractFsH(uri: URI, conf: org.apache.hadoop.conf.Configuration)
  extends org.apache.hadoop.fs.DelegateToFileSystem(
    uri, new MockObjectStoreFsH, conf, "mocks3h", false)
