package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dedicated micro-bench for the delta-chain FOLD LOAD (the
  * `catalog_fold_load_1m` row): builds the same 1M-row collection as the
  * full Bench, delta-flushes a 10k batch, then measures
  * release → load → count repeatedly on an otherwise idle machine.
  *
  * Exists because the full-suite number runs once, late in a long process,
  * and has twice drifted double-digit between rounds (r9 1.83 s → r10
  * 2.62 s) without any code on its path changing — this isolates the row
  * so a drift can be attributed to the tree or to machine overlap in
  * minutes instead of a full bench run.
  */
object FoldProbe {
  def main(args: Array[String]): Unit = {
    val benchDir = sys.env.getOrElse("SPARK_GRAFT_BENCH_DIR", "/root/repo/target/bench-1m")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_FOLD_REPS", "6").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes", (16 * 1024 * 1024).toString)
      .config("spark.locality.wait", "0")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Bench.ensureBenchData(spark, benchDir, 1000000L)
    val e = spark.read.parquet(benchDir)
    val root = graft.TempRoots.create("graft-foldprobe").toString
    val cat = new graft.collection.GraftCatalog(spark, root)
    cat.createCollection(graft.collection.CollectionMeta("bd", dim = 128,
      distance = "euclidean", fields = Seq(
        graft.collection.IndexField("id", "string", primaryKey = true),
        graft.collection.IndexField("label", "integer"))))
    cat.loadCollection("bd")
    cat.insert("bd", e.select(col("vec_id").cast("string").as("id"),
      col("label").cast("long").as("label"), col("embedding").as("vector")))
    def timed(fn: => Unit): Double = {
      val t0 = System.nanoTime(); fn; (System.nanoTime() - t0) / 1e9
    }
    println(f"flush_full_1m ${timed(cat.flush("bd"))}%.3f")
    cat.insert("bd", e.where(col("vec_id") < 10000)
      .select(col("vec_id").cast("string").as("id"),
        (col("label") + 100).cast("long").as("label"), col("embedding").as("vector")))
    println(f"flush_delta_10k ${timed(cat.flushDelta("bd"))}%.3f")
    // fold loads over the 1-segment chain FIRST — the r9-r11 protocol, kept
    // comparable before the chain grows below
    val ts = (1 to reps).map { i =>
      cat.releaseCollection("bd")
      val t = timed { cat.loadCollection("bd"); cat.resident("bd").count(): Unit }
      println(f"fold_load_1m rep$i $t%.3f")
      t
    }
    println(f"fold_load_1m min ${ts.min}%.3f med ${ts.sorted.apply(ts.length / 2)}%.3f")
    // flush_delta_10k is runs=1 in the full suite (a flushDelta consumes its
    // pending ledger, so it can't naively re-run); here each rep inserts a
    // FRESH 10k batch and times its own segment write — the production
    // shape of successive delta flushes, min/med over reps (r12, the
    // 0.72→0.92 s settle ask)
    val dts = (1 to reps).map { i =>
      cat.insert("bd", e.where(col("vec_id") >= i * 10000L && col("vec_id") < (i + 1) * 10000L)
        .select(col("vec_id").cast("string").as("id"),
          (col("label") + 100 + i).cast("long").as("label"), col("embedding").as("vector")))
      val t = timed(cat.flushDelta("bd"))
      println(f"flush_delta_10k rep$i $t%.3f")
      t
    }
    println(f"flush_delta_10k min ${dts.min}%.3f med ${dts.sorted.apply(dts.length / 2)}%.3f")
    cat.dropCollection("bd")
    spark.stop()
  }
}
