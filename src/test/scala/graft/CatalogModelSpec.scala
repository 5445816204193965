package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame

import graft.FilterExpr.Single
import graft.collection._

/** Model-based randomized lifecycle test: drive a versioned collection with
  * a seeded random sequence of upsert / delete-by-predicate / flushDelta /
  * flush (compaction) / loadCollection (re-anchor), mirroring every op into
  * a plain in-memory map, and assert the engine's state equals the model —
  * resident after every mutation window, folded after every re-load, and
  * historically via timeTravel against the recorded per-version model. This
  * pins the delta-chain LWW fold semantics end-to-end across interleavings
  * no hand-written scenario enumerates (delta-over-delta, compaction
  * mid-chain, re-anchor discarding unflushed work, deletes racing upserts
  * of the same key in one ledger window). */
class CatalogModelSpec extends SparkSpec {
  import spark.implicits._

  private val fields = Seq(
    IndexField("id", "string", primaryKey = true),
    IndexField("label", "integer"))

  private def rows(entries: Seq[(Int, Long)]): DataFrame =
    entries.map { case (i, lab) =>
      val rnd = new scala.util.Random(i)
      (s"id-$i", lab, Array.fill(4)(rnd.nextFloat()))
    }.toDF("id", "label", "vector")

  private def engineState(df: DataFrame): Map[String, Long] =
    df.select("id", "label").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  private def runSeed(seed: Int): Unit = {
    val rnd = new scala.util.Random(seed)
    val root = Files.createTempDirectory(s"graft-model-$seed").toString
    val cat = new GraftCatalog(spark, root)
    val name = s"mdl$seed"
    cat.createCollection(CollectionMeta(name, dim = 4, distance = "euclidean",
      quantization = "none", fields = fields, versioning = true))
    cat.loadCollection(name)

    var resident = Map.empty[String, Long] // mirrors the in-memory state
    var committed = Map.empty[String, Long] // mirrors the last published fold
    var dirty = false // mutations since the last publish (ledger non-empty)
    val byVersion = scala.collection.mutable.Map.empty[Int, Map[String, Long]]

    def publishFull(): Unit = {
      val v = cat.flush(name)
      committed = resident; dirty = false
      byVersion(v) = committed
    }

    for (step <- 1 to 30) {
      rnd.nextInt(10) match {
        case 0 | 1 | 2 | 3 => // upsert a batch (new ids and overwrites mixed)
          val batch = Seq.fill(1 + rnd.nextInt(8))(
            (1 + rnd.nextInt(50), rnd.nextInt(10).toLong))
            // at most one row per pk per batch is the upsert contract
            .groupBy(_._1).map(_._2.head).toSeq
          cat.insert(name, rows(batch))
          resident ++= batch.map { case (i, lab) => s"id-$i" -> lab }
          dirty = true
        case 4 | 5 => // delete by label predicate (strictly-true matches only)
          val target = rnd.nextInt(10).toLong
          cat.delete(name, Single("label", FilterExpr.Eq, target))
          resident = resident.filterNot(_._2 == target)
          dirty = true
        case 6 => // O(changes) delta publish — legal once a base exists
          if (dirty && cat.getMeta(name).currentVersion > 0) {
            val v = cat.flushDelta(name)
            committed = resident; dirty = false
            byVersion(v) = committed
          } else publishFull()
        case 7 => publishFull() // full publish / compaction mid-chain
        case 8 => // re-anchor: discards unflushed resident work AND ledger
          cat.loadCollection(name)
          resident = committed; dirty = false
        case 9 => // steady-state check against the model, mid-sequence
          assert(engineState(cat.resident(name)) === resident,
            s"seed=$seed step=$step resident drift")
      }
    }

    // final: resident, fold-on-load, and every historical version
    assert(engineState(cat.resident(name)) === resident, s"seed=$seed final resident")
    if (dirty) publishFull()
    assert(engineState(cat.loadCollection(name)) === committed, s"seed=$seed final fold")
    val head = cat.getMeta(name).currentVersion
    assert(byVersion.keySet === (1 to head).toSet, s"seed=$seed version bookkeeping")
    for (v <- 1 to head)
      assert(engineState(cat.timeTravel(name, v)) === byVersion(v),
        s"seed=$seed timeTravel(v$v) diverges from the recorded model")
    cat.dropCollection(name)
  }

  test("randomized lifecycle agrees with the model (seed 1)") { runSeed(1) }
  test("randomized lifecycle agrees with the model (seed 2)") { runSeed(2) }
  test("randomized lifecycle agrees with the model (seed 3)") { runSeed(3) }
}
