package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Decomposition probe for the r12 verdict's one open perf signal: the
  * DRIVER's BENCH_full_r12.json read serve_multi_ivf_10m at 2.48 s against
  * a 0.163 s band while its full-scan sibling (same snapshot, same
  * searchMultiIvf path, nprobe=256) moved only 1.6x — so something
  * per-request and FIXED-cost in the plan-per-call path inflated ~+2 s on
  * that host. This main splits one non-prepared request into its phases:
  *
  *   build     searchMultiIvf(...) itself — getMeta (2x: entry +
  *             multiSearchParts), fs.exists on the centroid dir, cached
  *             readCentroids + probeCells, DataFrame construction
  *   analyze   queryExecution.analyzed      (Catalyst analysis)
  *   optimize  queryExecution.optimizedPlan (optimizer)
  *   plan      queryExecution.executedPlan  (physical planning incl.
  *             partition-directory pruning over the 256-cell layout)
  *   exec1     first executeCollect on the fresh plan — includes the
  *             whole-stage-codegen Janino compile iff the generated
  *             source misses the codegen cache, plus the pruned I/O
  *   exec2     second collect on the SAME DataFrame — warm plan, warm
  *             codegen: the floor a prepared request should approach
  *
  * plus the end-to-end plan-per-call and prepared rows for the same
  * queries. Phases are reported min/p50 over `SPARK_GRAFT_PROBE_REPS`
  * requests with FRESH query vectors (fresh literals per request — the
  * serving shape). The collection builds once into a persistent root
  * (`target/probe-multiivf10`) so re-runs skip the ~10 GB flush.
  */
object MultiIvfServeProbe {
  def main(args: Array[String]): Unit = {
    val benchDir = sys.env.getOrElse("SPARK_GRAFT_BENCH_DIR", "/root/repo/target/bench-1m")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_PROBE_REPS", "9").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes", (16 * 1024 * 1024).toString)
      .config("spark.locality.wait", "0")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dir10m = benchDir + "-10m"
    Bench.ensureBenchData(spark, dir10m, 10000000L)
    val root = "/root/repo/target/probe-multiivf10"
    val cat = new graft.collection.GraftCatalog(spark, root)
    if (!cat.exists("mvt")) {
      cat.createCollection(graft.collection.CollectionMeta("mvt", dim = 128,
        distance = "cosine",
        fields = Seq(
          graft.collection.IndexField("id", "string", primaryKey = true),
          graft.collection.IndexField("v0", "vector"),
          graft.collection.IndexField("v1", "vector")),
        ivfCells = Some(256), ivfTrainIterations = Some(1),
        ivfTrainSampleMod = Some(64L)))
      cat.loadCollection("mvt")
      val e = spark.read.parquet(dir10m)
      cat.insert("mvt", e.select(col("vec_id").cast("string").as("id"),
        col("embedding").as("v0"), reverse(col("embedding")).as("v1")))
      val t0 = System.nanoTime()
      cat.flush("mvt")
      println(f"one-time flush ${(System.nanoTime() - t0) / 1e9}%.1f s")
      cat.releaseCollection("mvt")
    }

    val rnd = new scala.util.Random(17)
    def freshVec() = Array.fill(128)(rnd.nextFloat() * 2 - 1)
    def fqs() = Seq(
      graft.operators.MultiVectorSearch.FieldQuery("v0", freshVec(), ratio = 60),
      graft.operators.MultiVectorSearch.FieldQuery("v1", freshVec(), ratio = 40))

    def report(name: String, ts: Seq[Double]): Unit = {
      val s = ts.sorted
      println(f"$name%-28s min ${s.head}%.4f p50 ${s(s.length / 2)}%.4f max ${s.last}%.4f")
    }

    def gcMillis(): Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
        .map(_.getCollectionTime).sum
    }

    def phases(nprobe: Int): Unit = {
      val keys = Seq("build", "analyze", "optimize", "plan", "exec1", "exec2", "total")
      val acc = keys.map(_ -> scala.collection.mutable.ArrayBuffer.empty[Double]).toMap
      // warm once: FS metadata, centroid sidecar artifact, codegen of the shape
      cat.searchMultiIvf("mvt", fqs(), 10, nprobe = nprobe).collect()
      (0 until reps).foreach { _ =>
        val t0 = System.nanoTime()
        val df = cat.searchMultiIvf("mvt", fqs(), 10, nprobe = nprobe)
        val t1 = System.nanoTime()
        df.queryExecution.analyzed
        val t2 = System.nanoTime()
        df.queryExecution.optimizedPlan
        val t3 = System.nanoTime()
        df.queryExecution.executedPlan
        val t4 = System.nanoTime()
        df.collect()
        val t5 = System.nanoTime()
        df.collect()
        val t6 = System.nanoTime()
        Seq(t1 - t0, t2 - t1, t3 - t2, t4 - t3, t5 - t4, t6 - t5, t5 - t0)
          .map(_ / 1e9).zip(keys).foreach { case (v, k) => acc(k) += v }
      }
      keys.foreach(k => report(s"phase_${k}_np$nprobe", acc(k).toSeq))
    }

    def endToEnd(name: String, warm: Int = 2)(fn: () => Unit): Unit = {
      (0 until warm).foreach(_ => fn())
      val g0 = gcMillis()
      report(name, (0 until reps).map { _ =>
        val t0 = System.nanoTime(); fn(); (System.nanoTime() - t0) / 1e9
      })
      println(f"  gc during $name: ${(gcMillis() - g0) / 1e3}%.2f s over $reps reps")
    }

    // The first probe run caught a SESSION-AGE effect: phases(8) right
    // after the flush read exec=0.13-0.26 s, while the same plan-per-call
    // request at the END of the run read 1.37-1.64 s against a prepared
    // row of 0.145 s on the same warm snapshot. So: measure the same row
    // at three session ages, with GC time per block, and phases both
    // early and late — whatever grows between them is the fixed cost.
    endToEnd("getMeta")(() => { cat.getMeta("mvt"): Unit })
    endToEnd("serve_multi_ivf_10m_EARLY")(() =>
      cat.searchMultiIvf("mvt", fqs(), 10, nprobe = 8).collect(): Unit)
    phases(8)
    endToEnd("serve_multi_ivf_10m_MID")(() =>
      cat.searchMultiIvf("mvt", fqs(), 10, nprobe = 8).collect(): Unit)
    endToEnd("serve_multi_ivf_prep_10m")(() =>
      cat.searchMultiIvfPrepared("mvt", fqs(), 10, nprobe = 8): Unit)
    endToEnd("serve_multi_full_10m", warm = 1)(() =>
      cat.searchMultiIvf("mvt", fqs(), 10, nprobe = 256).collect(): Unit)
    endToEnd("serve_multi_ivf_10m_LATE")(() =>
      cat.searchMultiIvf("mvt", fqs(), 10, nprobe = 8).collect(): Unit)
    endToEnd("serve_multi_ivf_prep_late")(() =>
      cat.searchMultiIvfPrepared("mvt", fqs(), 10, nprobe = 8): Unit)
    phases(8)
    spark.stop()
  }
}
