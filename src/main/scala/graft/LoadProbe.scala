package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dedicated micro-bench for the driver-local rung LOADS
  * (`multi_local_load_1m` / `local_rung_load_1m` in the full suite): builds
  * 1M-row IVF collections once, then times the O(corpus) `local*Index`
  * loaders repeatedly on an otherwise idle machine. Iteration tooling only
  * — never run by the driver.
  *
  * Exists to price the r14 RowArrays change (bulk arraycopy of Row array
  * columns into the rung builders instead of a boxed per-element foreach)
  * on exactly the rows it targets, without a full-suite run: the suite
  * rows are one-shot, late in a long process, and have drifted 2-10× on
  * host windows (r13 row_stats evidence), so a paired A/B against a
  * pre-change worktree on a quiet host is the only attributable signal.
  * Covers the float path (stored form of the 1M suites) and the f16 short
  * path (the other bulk-copied decode) for both the single-vector and
  * multi-vector loaders.
  */
object LoadProbe {
  def main(args: Array[String]): Unit = {
    val benchDir = sys.env.getOrElse("SPARK_GRAFT_BENCH_DIR", "/root/repo/target/bench-1m")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_LOAD_REPS", "3").toInt
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
    val root = graft.TempRoots.create("graft-loadprobe").toString
    val cat = new graft.collection.GraftCatalog(spark, root)
    def timed(fn: => Unit): Double = {
      val t0 = System.nanoTime(); fn; (System.nanoTime() - t0) / 1e9
    }
    def report(name: String)(fn: => Unit): Unit = {
      val ts = (1 to reps).map { i =>
        val t = timed(fn)
        println(f"$name rep$i $t%.3f")
        t
      }
      println(f"$name min ${ts.min}%.3f med ${ts.sorted.apply(ts.length / 2)}%.3f")
    }

    // single-vector IVF, float stored form (the sv/local_rung_load_1m shape;
    // seed centroids, no Lloyd — training quality is irrelevant to decode)
    cat.createCollection(graft.collection.CollectionMeta("lp", dim = 128,
      distance = "cosine",
      fields = Seq(
        graft.collection.IndexField("id", "string", primaryKey = true),
        graft.collection.IndexField("label", "integer")),
      ivfCells = Some(256), ivfTrainIterations = Some(0),
      ivfTrainSampleMod = Some(16L)))
    cat.loadCollection("lp")
    cat.insert("lp", e.select(col("vec_id").cast("string").as("id"),
      col("label").cast("long").as("label"), col("embedding").as("vector")))
    println(f"ivf_flush_1m ${timed(cat.flush("lp"))}%.3f")
    cat.releaseCollection("lp")
    report("local_ivf_load_1m")(cat.localIvfIndex("lp"): Unit)

    // same layout stored f16 (the short decode path)
    cat.createCollection(graft.collection.CollectionMeta("lph", dim = 128,
      distance = "cosine", quantization = "f16",
      fields = Seq(
        graft.collection.IndexField("id", "string", primaryKey = true)),
      ivfCells = Some(256), ivfTrainIterations = Some(0),
      ivfTrainSampleMod = Some(16L)))
    cat.loadCollection("lph")
    cat.insert("lph", e.select(col("vec_id").cast("string").as("id"),
      col("embedding").as("vector")))
    println(f"ivf_f16_flush_1m ${timed(cat.flush("lph"))}%.3f")
    cat.releaseCollection("lph")
    report("local_ivf_f16_load_1m")(cat.localIvfIndex("lph"): Unit)

    // multi-vector CFLAT, 2×128-d float (the mvb/multi_local_load_1m shape)
    cat.createCollection(graft.collection.CollectionMeta("lpm", dim = 128,
      distance = "cosine",
      fields = Seq(
        graft.collection.IndexField("id", "string", primaryKey = true),
        graft.collection.IndexField("v0", "vector"),
        graft.collection.IndexField("v1", "vector")),
      ivfCells = Some(256), ivfTrainIterations = Some(0),
      ivfTrainSampleMod = Some(16L)))
    cat.loadCollection("lpm")
    cat.insert("lpm", e.select(col("vec_id").cast("string").as("id"),
      col("embedding").as("v0"), reverse(col("embedding")).as("v1")))
    println(f"multi_flush_1m ${timed(cat.flush("lpm"))}%.3f")
    cat.releaseCollection("lpm")
    report("local_multi_load_1m")(cat.localMultiIndex("lpm"): Unit)

    spark.stop()
  }
}
