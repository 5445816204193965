package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame

import graft.collection._

/** Durability/concurrency core of the catalog, beyond the claim-CAS specs in
  * CatalogDeltaSpec: torn-claim self-healing, the publish fence (lease
  * fencing after a reclaim), the stale-resident anchor gate, timeTravel's
  * published-head bound, atomic meta swaps, and drop-vs-flush races. */
class CatalogDurabilitySpec extends SparkSpec {
  import spark.implicits._

  private def newRoot() = Files.createTempDirectory("graft-durab").toString
  private def fs(root: String) =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private val fields = Seq(
    IndexField("id", "string", primaryKey = true),
    IndexField("label", "integer"))

  private def meta(name: String, versioning: Boolean = false) =
    CollectionMeta(name, dim = 4, distance = "euclidean",
      quantization = "none", fields = fields, versioning = versioning)

  private def rows(ids: Seq[Int], labelOf: Int => Long = _ % 10): DataFrame =
    ids.map { i =>
      val rnd = new scala.util.Random(i)
      (s"id-$i", labelOf(i), Array.fill(4)(rnd.nextFloat()))
    }.toDF("id", "label", "vector")

  private def idSet(df: DataFrame): Set[String] =
    df.select("id").collect().map(_.getString(0)).toSet

  // ---- torn claims (created, never written) ----

  test("a torn EMPTY claim self-heals: unparseable content falls back to mtime staleness") {
    val root = newRoot()
    val cat = new GraftCatalog(spark, root)
    cat.createCollection(meta("t1"))
    cat.loadCollection("t1")
    cat.insert("t1", rows(1 to 20))
    assert(cat.flush("t1") === 1)
    cat.insert("t1", rows(21 to 25))
    // a writer that died between claim CREATE and claim WRITE leaves a
    // 0-byte claim — no embedded timestamp to parse
    fs(root).create(new Path(s"$root/t1/v2.claim"), false).close()
    assert(new java.io.File(s"$root/t1/v2.claim")
      .setLastModified(System.currentTimeMillis() - 31L * 60 * 1000))
    // pre-fix this slot was wedged FOREVER (unparseable => "not stale");
    // the mtime fallback reclaims it on the normal staleness horizon
    assert(cat.flushDelta("t1") === 2)
    assert(idSet(spark.read.parquet(s"$root/t1/v2")) === (21 to 25).map(i => s"id-$i").toSet)
  }

  test("a FRESH torn claim is still respected — mtime fallback does not loosen the race") {
    val root = newRoot()
    val cat = new GraftCatalog(spark, root)
    cat.createCollection(meta("t2"))
    cat.loadCollection("t2")
    cat.insert("t2", rows(1 to 10))
    assert(cat.flush("t2") === 1)
    cat.insert("t2", rows(11 to 12))
    fs(root).create(new Path(s"$root/t2/v2.claim"), false).close() // fresh mtime
    intercept[GraftCatalog.ConcurrentFlushException] { cat.flushDelta("t2") }
    // the refusal preserves the ledger: clearing the claim, the retry lands
    fs(root).delete(new Path(s"$root/t2/v2.claim"), false)
    assert(cat.flushDelta("t2") === 2)
  }

  // ---- the stale-resident anchor gate ----

  test("a writer anchored below the published head may not flush: re-load, then retry") {
    val root = newRoot()
    val catA = new GraftCatalog(spark, root)
    val catB = new GraftCatalog(spark, root)
    catA.createCollection(meta("s1"))
    catA.loadCollection("s1")
    catA.insert("s1", rows(1 to 10))
    assert(catA.flush("s1") === 1)
    catB.loadCollection("s1") // B anchors on v1
    catA.insert("s1", rows(Seq(11)))
    assert(catA.flushDelta("s1") === 2) // A durably publishes id-11
    catB.insert("s1", rows(Seq(99)))
    // B's resident state never folded A's v2 — a full flush would compact
    // id-11 away, a delta publish would advance B's anchor past state it
    // never saw (same loss one flush later). Both must refuse.
    intercept[GraftCatalog.StaleResidentException] { catB.flush("s1") }
    intercept[GraftCatalog.StaleResidentException] { catB.flushDelta("s1") }
    // nothing was published or lost by the refusals
    assert(catB.getMeta("s1").currentVersion === 2)
    // re-anchor (discards B's unflushed id-99 — documented re-load
    // semantics), redo the mutation, publish cleanly
    catB.loadCollection("s1")
    assert(idSet(catB.resident("s1")).contains("id-11"))
    catB.insert("s1", rows(Seq(99)))
    assert(catB.flushDelta("s1") === 3)
    val folded = idSet(catB.loadCollection("s1"))
    assert(folded === ((1 to 11).map(i => s"id-$i").toSet + "id-99"))
  }

  test("same-driver sequential load/mutate/flush cycles never trip the anchor gate") {
    val root = newRoot()
    val cat = new GraftCatalog(spark, root)
    cat.createCollection(meta("s2"))
    cat.loadCollection("s2")
    cat.insert("s2", rows(1 to 5))
    assert(cat.flush("s2") === 1)
    cat.insert("s2", rows(Seq(6)))
    assert(cat.flushDelta("s2") === 2)
    cat.insert("s2", rows(Seq(7)))
    assert(cat.flush("s2") === 3) // compaction right after a delta
    assert(idSet(cat.resident("s2")) === (1 to 7).map(i => s"id-$i").toSet)
  }

  // ---- lease fencing after a reclaim ----

  /** Catalog whose flush pauses between the claim CAS and the first rename —
    * the deterministic stand-in for a GC-stalled writer. */
  private class PausingCatalog(root: String, pause: (String, Int) => Unit)
      extends GraftCatalog(spark, root) {
    override protected def interleaveAfterClaim(name: String, v: Int): Unit =
      pause(name, v)
  }

  test("a writer whose claim was reclaimed mid-flush is fenced out and touches nothing") {
    val root = newRoot()
    var interleaved = false
    // B sees ANY claim as instantly stale — the deterministic stand-in for
    // "A stalled past staleClaimMs"
    val catB = new GraftCatalog(spark, root, staleClaimMs = 0)
    val catA = new PausingCatalog(root, (name, v) => if (v == 2 && !interleaved) {
      interleaved = true
      Thread.sleep(20) // claim ts must be strictly in B's past
      catB.loadCollection(name)
      catB.insert(name, rows(Seq(200)))
      catB.flush(name) // reclaims A's claim, publishes v2
    })
    catA.createCollection(meta("f1"))
    catA.loadCollection("f1")
    catA.insert("f1", rows(1 to 10))
    assert(catA.flush("f1") === 1) // v1: the hook only interleaves on v2
    catA.insert("f1", rows(Seq(100)))
    intercept[GraftCatalog.ConcurrentFlushException] { catA.flush("f1") }
    // B's published version is intact and readable; A corrupted nothing
    assert(catA.getMeta("f1").currentVersion === 2)
    val head = idSet(spark.read.parquet(s"$root/f1/v2"))
    assert(head.contains("id-200") && !head.contains("id-100"))
    // A's staging did not leak
    val leftovers = fs(root).listStatus(new Path(s"$root/f1"))
      .map(_.getPath.getName).filter(_.startsWith(".staging-"))
    assert(leftovers.isEmpty, s"staging leak: ${leftovers.mkString(",")}")
  }

  test("a dropCollection racing a flush wins cleanly: no meta-only ghost resurrection") {
    val root = newRoot()
    val catB = new GraftCatalog(spark, root)
    var interleaved = false
    val catA = new PausingCatalog(root, (name, v) => if (v == 2 && !interleaved) {
      interleaved = true
      catB.dropCollection(name)
    })
    catA.createCollection(meta("f2"))
    catA.loadCollection("f2")
    catA.insert("f2", rows(1 to 10))
    assert(catA.flush("f2") === 1)
    catA.insert("f2", rows(Seq(11)))
    intercept[Exception] { catA.flush("f2") } // fenced (claim gone) or rename fails
    // pre-fix, flush's writeMeta recreated the dir tree: exists()==true with
    // no version dirs — an unreadable shell listCollections would show
    assert(!catA.exists("f2"), "dropped collection resurrected as a meta shell")
    assert(!fs(root).exists(new Path(s"$root/f2/meta.json")))
  }

  // ---- timeTravel bound by the published head ----

  test("timeTravel refuses unpublished versions — in-flight dirs are not history") {
    val root = newRoot()
    val cat = new GraftCatalog(spark, root)
    cat.createCollection(meta("v1", versioning = true))
    cat.loadCollection("v1")
    cat.insert("v1", rows(1 to 5))
    cat.flush("v1")
    cat.insert("v1", rows(Seq(6)))
    cat.flush("v1")
    assert(idSet(cat.timeTravel("v1", 1)) === (1 to 5).map(i => s"id-$i").toSet)
    assert(idSet(cat.timeTravel("v1", 2)) === (1 to 6).map(i => s"id-$i").toSet)
    intercept[IllegalArgumentException] { cat.timeTravel("v1", 0) }
    intercept[IllegalArgumentException] { cat.timeTravel("v1", 3) }
    // a crashed writer's orphan dir above the head must stay invisible even
    // though the path exists on disk
    rows(Seq(7)).write.parquet(s"$root/v1/v3")
    intercept[IllegalArgumentException] { cat.timeTravel("v1", 3) }
  }

  // ---- atomic meta swaps ----

  test("meta updates leave no temp files and stay parseable across the lifecycle") {
    val root = newRoot()
    val cat = new GraftCatalog(spark, root)
    cat.createCollection(meta("m1"))
    cat.loadCollection("m1")
    cat.insert("m1", rows(1 to 5))
    cat.flush("m1")
    cat.insert("m1", rows(Seq(6)))
    cat.flushDelta("m1")
    val names = fs(root).listStatus(new Path(s"$root/m1")).map(_.getPath.getName)
    assert(!names.exists(_.startsWith(".meta-tmp-")), names.mkString(","))
    assert(cat.getMeta("m1").currentVersion === 2)
  }

  test("a torn CREATE (0-byte meta.json) fails loudly and is recoverable by drop") {
    val root = newRoot()
    val cat = new GraftCatalog(spark, root)
    fs(root).mkdirs(new Path(s"$root/m2"))
    fs(root).create(new Path(s"$root/m2/meta.json"), false).close() // crashed creator
    intercept[IllegalArgumentException] { cat.createCollection(meta("m2")) }
    intercept[Exception] { cat.getMeta("m2") } // torn meta never parses as valid
    cat.dropCollection("m2") // recovery path needs no meta parse
    cat.createCollection(meta("m2"))
    assert(cat.getMeta("m2").currentVersion === 0)
  }
}
