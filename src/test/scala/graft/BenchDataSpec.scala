package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** The bench generators' cross-dataset invariant: the 100M binary-code
  * generator must emit EXACTLY the code Bin.encode produces over the float
  * collection's embedding for the same vec_id — the 100M Hamming row's
  * correctness rests on the query (encoded from the float collection) and
  * the corpus (codes-only, floats never materialized) agreeing. */
class BenchDataSpec extends SparkSpec {

  test("ensureBinCodeBenchData codes equal Bin.encode over ensureBenchData " +
    "embeddings row for row (the codes-only generator is faithful)") {
    val n = 2000L
    val floatDir = Files.createTempDirectory("bench-float").toString + "/d"
    val codeDir = Files.createTempDirectory("bench-code").toString + "/d"
    Bench.ensureBenchData(spark, floatDir, n)
    val floats = spark.read.parquet(floatDir)
    val th = graft.ann.Bin.trainThresholds(floats, "embedding",
      sampleMod = 16L, idCol = "vec_id")
    Bench.ensureBinCodeBenchData(spark, codeDir, n, th)

    val direct = floats.select(col("vec_id"),
      graft.ann.Bin.encode(col("embedding"), th).as("bin_code"))
    val generated = spark.read.parquet(codeDir)
    assert(generated.count() === n)
    // anti-join on (vec_id, code): zero mismatches in either direction
    assert(generated.join(direct, Seq("vec_id", "bin_code"), "left_anti").count() === 0L)
    assert(direct.join(generated, Seq("vec_id", "bin_code"), "left_anti").count() === 0L)
  }
}
