package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.functions._

/** Decompose the 1M-gate dispatch floor (r12 VERDICT #7): on the cached 1M
  * collection, time the hoisted point-lookup (the pure floor) and the
  * hoisted cosine scan under (a) AQE on [the pre-r13 bench default] and
  * (b) AQE off — to see which part of the ~40 ms end-to-end floor is
  * schedulable away without touching the gate's semantics. Both arms
  * execute-many on ONE memoized DataFrame per suite (plan-once is the
  * baseline, so re-planning cost never enters). Measured: AQE pure
  * stage-coordination overhead is +5.6 ms/rep on the point lookup and
  * +4.4 ms on the cosine scan — the bench's 1M timed window now runs with
  * AQE off. Dedicated-machine probe, min/p50 of 48 interleaved reps. */
object FloorProbe {
  def main(args: Array[String]): Unit = {
    val benchDir = sys.env.getOrElse("SPARK_GRAFT_BENCH_DIR", "/root/repo/target/bench-1m")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes", (16 * 1024 * 1024).toString)
      .config("spark.locality.wait", "0")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Bench.ensureBenchData(spark, benchDir, 1000000L)
    val big = spark.read.parquet(benchDir).repartition(cpus.toInt)
      .persist(StorageLevel.MEMORY_AND_DISK)
    big.count()
    val q = big.where(col("vec_id") === 0).select("embedding").head().getSeq[Float](0).toArray

    def suite(tag: String): Unit = {
      val lookup = big.where(col("vec_id") === 999999L)
      val cosine = big.select(col("vec_id"),
          cosine_distance(col("embedding"), lit(q)).as("dist"))
        .orderBy(col("dist").asc, col("vec_id").asc).limit(10)
      val queries = Seq("point_lookup" -> lookup, "cosine" -> cosine)
      // warm
      (0 until 6).foreach(_ => queries.foreach(_._2.collect()))
      val samples = queries.map(_ => scala.collection.mutable.ArrayBuffer.empty[Double])
      for (_ <- 0 until 48; ((_, df), qi) <- queries.zipWithIndex) {
        val t0 = System.nanoTime(); df.collect()
        samples(qi) += (System.nanoTime() - t0) / 1e9
      }
      queries.zipWithIndex.foreach { case ((name, _), qi) =>
        val s = samples(qi).sorted
        println(f"$tag/$name%-14s min ${s.head}%.4f p50 ${s(s.length / 2)}%.4f")
      }
    }

    suite("aqe_on")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    suite("aqe_off")
    spark.stop()
  }
}
