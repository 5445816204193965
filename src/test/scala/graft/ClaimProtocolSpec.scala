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
    val impl =
      if (scheme == "mocks3") classOf[MockObjectStoreFs] else classOf[MockObjectStoreFsB]
    spark.sparkContext.hadoopConfiguration
      .set(s"fs.$scheme.impl", impl.getName)
    if (scheme == "mocks3b")
      // the meta-UPDATE path goes through FileContext (atomic rename),
      // which resolves the AbstractFileSystem side of the scheme
      spark.sparkContext.hadoopConfiguration
        .set("fs.AbstractFileSystem.mocks3b.impl", classOf[MockAbstractFsB].getName)
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
