package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.functions._

/** Throwaway profiling harness for the sq8-vs-f16 10M scan gap
  * (VERDICT r6 "What's wrong #2"). Times the exact bench plans on the
  * existing 10M cache plus kernel-only floors over raw arrays, so the gap
  * can be attributed to (a) the generated decode loop, (b) the cached
  * column representation, or (c) machine noise. Run:
  *   sbt "Test/runMain graft.ProfSq8"
  */
object ProfSq8 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("prof-sq8").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.driver.memory", "96g")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("PROF_DIR", "/root/repo/target/bench-1m-10m")
    val read = spark.read.parquet(dir)
    val (sqMins, sqScales) = graft.ann.Sq.trainStats(read, "embedding", sampleMod = 16L, idCol = "vec_id")
    val big = read
      .withColumn("emb_sq8", graft.ann.Sq.encode(col("embedding"), sqMins, sqScales))
      .persist(StorageLevel.MEMORY_AND_DISK)
    big.count()
    System.gc()
    val q = big.where(col("vec_id") === 0).select("embedding").head().getSeq[Float](0).toArray
    val qF16 = q.map(x => QuantKernels.f16ToFloat(QuantKernels.floatToF16(x)))
    val qSq8 = graft.ann.Sq.roundTrip(q, sqMins, sqScales)

    def sq8(): Unit = big.select(col("vec_id"),
        graft.ann.Sq.distance(col("emb_sq8"), qSq8, sqMins, sqScales, "cosine").as("dist"))
      .orderBy(col("dist").asc, col("vec_id").asc).limit(10).collect()
    def f16(): Unit = big.select(col("vec_id"),
        cosine_distance_quant(col("emb_f16"), lit(qF16), "f16").as("dist"))
      .orderBy(col("dist").asc, col("vec_id").asc).limit(10).collect()
    def f32(): Unit = big.select(col("vec_id"),
        cosine_distance(col("embedding"), lit(q)).as("dist"))
      .orderBy(col("dist").asc, col("vec_id").asc).limit(10).collect()

    val suite = Seq("sq8" -> (() => sq8()), "f16" -> (() => f16()), "f32" -> (() => f32()))
    // warm
    suite.foreach { case (_, fn) => (1 to 4).foreach(_ => fn()) }
    val samples = scala.collection.mutable.Map.empty[String, List[Double]].withDefaultValue(Nil)
    for (_ <- 1 to 12; (n, fn) <- suite) {
      val t0 = System.nanoTime(); fn()
      samples(n) = ((System.nanoTime() - t0) / 1e9) :: samples(n)
    }
    suite.foreach { case (n, _) =>
      val s = samples(n).sorted
      println(f"$n%-4s min=${s.head}%.3f med=${s(s.size / 2)}%.3f max=${s.last}%.3f")
    }

    // Kernel-only floor: single-thread raw-array loops, 200k rows x 128d.
    val n = 200000; val dim = 128
    val rnd = new java.util.Random(42)
    val codes = Array.fill(n)(Array.fill(dim)(rnd.nextInt(256).toByte))
    val shorts = Array.fill(n)(Array.fill(dim)(QuantKernels.floatToF16(rnd.nextFloat())))
    def sq8Kernel(): Double = {
      var best = Double.MaxValue
      val buf = new Array[Double](dim)
      var r = 0
      while (r < n) {
        val a = codes(r)
        var j = 0
        while (j < dim) { buf(j) = sqMins(j) + (a(j) & 0xFF).toDouble * sqScales(j); j += 1 }
        var acc = 0.0; var na = 0.0; var nb = 0.0; var i = 0
        while (i < dim) { val x = buf(i); val y = qSq8(i); acc += x * y; na += x * x; nb += y * y; i += 1 }
        val d = math.abs(1.0 - acc / (math.sqrt(na) * math.sqrt(nb)))
        if (d < best) best = d
        r += 1
      }
      best
    }
    def f16Kernel(): Double = {
      var best = Double.MaxValue
      val buf = new Array[Float](dim)
      var r = 0
      while (r < n) {
        val a = shorts(r)
        var j = 0
        while (j < dim) { buf(j) = QuantKernels.f16ToFloat(a(j)); j += 1 }
        var acc = 0.0; var na = 0.0; var nb = 0.0; var i = 0
        while (i < dim) { val x = buf(i).toDouble; val y = qF16(i).toDouble; acc += x * y; na += x * x; nb += y * y; i += 1 }
        val d = math.abs(1.0 - acc / (math.sqrt(na) * math.sqrt(nb)))
        if (d < best) best = d
        r += 1
      }
      best
    }
    (1 to 3).foreach(_ => { sq8Kernel(); f16Kernel() })
    def t(fn: () => Double): Double = { val t0 = System.nanoTime(); fn(); (System.nanoTime() - t0) / 1e9 }
    val k1 = (1 to 5).map(_ => t(() => sq8Kernel())).min
    val k2 = (1 to 5).map(_ => t(() => f16Kernel())).min
    println(f"kernel-floor sq8=${k1}%.4f f16=${k2}%.4f (200k rows, 1 thread)")
    spark.stop()
  }
}
