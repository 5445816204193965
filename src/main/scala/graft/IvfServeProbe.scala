package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dedicated micro-bench for the r12 prepared PROBED routes: searchIvf /
  * searchMultiIvf plan-per-call vs their prepared (plan-once/execute-many)
  * forms on the same 1M layout — the evidence row for the r11 verdict's
  * task 8 ("p50 drop on serve_ivf_1m with the pruning spec intact").
  * Isolated like FoldProbe so the number attributes to the tree, not to
  * full-suite machine overlap.
  */
object IvfServeProbe {
  def main(args: Array[String]): Unit = {
    val benchDir = sys.env.getOrElse("SPARK_GRAFT_BENCH_DIR", "/root/repo/target/bench-1m")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_PROBE_REPS", "24").toInt
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
    val rnd = new scala.util.Random(11)
    def freshVec() = Array.fill(128)(rnd.nextFloat() * 2 - 1)
    def measure(name: String, warm: Int = 3)(fn: Array[Float] => Unit): Unit = {
      (0 until warm).foreach(_ => fn(freshVec()))
      val ts = (0 until reps).map { _ =>
        val v = freshVec()
        val t0 = System.nanoTime(); fn(v)
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"$name min ${ts.head}%.4f p50 ${ts(ts.length / 2)}%.4f")
    }

    // single-vector probed layout
    val root = graft.TempRoots.create("graft-ivfserve").toString
    val cat = new graft.collection.GraftCatalog(spark, root)
    cat.createCollection(graft.collection.CollectionMeta("sv", dim = 128,
      distance = "cosine",
      fields = Seq(
        graft.collection.IndexField("id", "string", primaryKey = true),
        graft.collection.IndexField("label", "integer")),
      ivfCells = Some(256), ivfTrainIterations = Some(2), ivfTrainSampleMod = Some(16L),
      binaryIndex = Some(true)))
    cat.loadCollection("sv")
    cat.insert("sv", e.select(col("vec_id").cast("string").as("id"),
      (col("vec_id") % 100).cast("long").as("label"), col("embedding").as("vector")))
    cat.flush("sv")
    measure("serve_ivf_1m")(v => cat.searchIvf("sv", v, 10, nprobe = 8).collect(): Unit)
    measure("serve_ivf_prepared_1m")(v => cat.searchIvfPrepared("sv", v, 10, nprobe = 8): Unit)
    val f = Some(graft.FilterExpr.Single("label", graft.FilterExpr.Lt, 50L): graft.FilterExpr)
    measure("serve_ivf_filtered_1m")(v =>
      cat.searchIvf("sv", v, 10, nprobe = 8, filter = f).collect(): Unit)
    measure("serve_ivf_filtered_prepared_1m")(v =>
      cat.searchIvfPrepared("sv", v, 10, nprobe = 8, filter = f): Unit)
    measure("serve_bin_1m")(v => cat.searchBinary("sv", v, 10).collect(): Unit)
    measure("serve_bin_prepared_1m")(v => cat.searchBinaryPrepared("sv", v, 10): Unit)
    cat.dropCollection("sv")

    // PQ cost decomposition: the default route shape (all-cells residual
    // ADC — 256 LUTs ≈ 8 MB shipped per request) vs the probed shape
    // (nprobe=8 → 8 LUTs ≈ 256 KB) vs the ADC pass alone (rerank off) —
    // tells us whether serve_pq's cost is the LUT ship, the analysis, or
    // the rerank job, BEFORE any prepared-PQ machinery is built.
    cat.createCollection(graft.collection.CollectionMeta("pv", dim = 128,
      distance = "cosine",
      fields = Seq(graft.collection.IndexField("id", "string", primaryKey = true)),
      ivfCells = Some(256), ivfTrainIterations = Some(2), ivfTrainSampleMod = Some(16L),
      pqSubspaces = Some(16), pqCodewords = Some(256),
      pqTrainIterations = Some(0), pqTrainSampleMod = Some(64L)))
    cat.loadCollection("pv")
    cat.insert("pv", e.select(col("vec_id").cast("string").as("id"),
      col("embedding").as("vector")))
    cat.flush("pv")
    measure("serve_pq_1m")(v => cat.searchPq("pv", v, 10).collect(): Unit)
    measure("serve_pq_probed_1m")(v =>
      cat.searchPq("pv", v, 10, nprobe = Some(8)).collect(): Unit)
    measure("serve_pq_adc_only_1m")(v =>
      cat.searchPq("pv", v, 10, rerank = false).collect(): Unit)
    measure("serve_pq_adc_probed_1m")(v =>
      cat.searchPq("pv", v, 10, rerank = false, nprobe = Some(8)).collect(): Unit)
    measure("serve_pq_prepared_1m")(v => cat.searchPqPrepared("pv", v, 10): Unit)
    measure("serve_pq_prepared_probed_1m")(v =>
      cat.searchPqPrepared("pv", v, 10, nprobe = Some(8)): Unit)
    measure("serve_pq_adc_prepared_1m")(v =>
      cat.searchPqPrepared("pv", v, 10, rerank = false): Unit)
    cat.dropCollection("pv")

    // multi-vector probed layout
    cat.createCollection(graft.collection.CollectionMeta("mv", dim = 128,
      distance = "cosine",
      fields = Seq(
        graft.collection.IndexField("id", "string", primaryKey = true),
        graft.collection.IndexField("v0", "vector"),
        graft.collection.IndexField("v1", "vector")),
      ivfCells = Some(256), ivfTrainIterations = Some(1), ivfTrainSampleMod = Some(16L)))
    cat.loadCollection("mv")
    cat.insert("mv", e.select(col("vec_id").cast("string").as("id"),
      col("embedding").as("v0"), reverse(col("embedding")).as("v1")))
    cat.flush("mv")
    def fqs(q0: Array[Float], q1: Array[Float]) = Seq(
      graft.operators.MultiVectorSearch.FieldQuery("v0", q0, ratio = 60),
      graft.operators.MultiVectorSearch.FieldQuery("v1", q1, ratio = 40))
    measure("serve_multi_ivf_1m")(v =>
      cat.searchMultiIvf("mv", fqs(v, freshVec()), 10, nprobe = 8).collect(): Unit)
    measure("serve_multi_ivf_prepared_1m")(v =>
      cat.searchMultiIvfPrepared("mv", fqs(v, freshVec()), 10, nprobe = 8): Unit)
    cat.dropCollection("mv")
    spark.stop()
  }
}
