package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions._

/** Quantized flat scans — the e2e scenario family {f16, bf16, f8}_search
  * (FIXTURES.md §1). Both stored and query vectors are quantized, similarity
  * is computed on the dequantized values, mirroring
  * /root/reference/edge/f16_quantization.go:35-53.
  *
  * No DuckDB oracle (bit-level float formats aren't SQL-expressible) → the
  * driver records rows-only checks; the strong assertions live in
  * QuantizationSpec (round-trip exactness, self-match, loss bounds mirroring
  * pkg/compresshelper/compresshelper_test.go).
  *
  * In a real collection the quantized column is materialized at ingest
  * (2-4× smaller parquet + scan); here it's computed on the fly because
  * TESTDATA is float32.
  */
object QuantizedQueries {
  import Tables.tbl

  private def scan(s: SparkSession, dir: String, format: String): DataFrame = {
    val e = tbl(s, dir, "embeddings")
    val qv = e.where(col("vec_id") === 0).select("embedding").head().getSeq[Float](0).toArray
    val storedDecoded = dequantize(quantize(col("embedding"), format), format)
    val queryDecoded = dequantize(quantize(lit(qv), format), format)
    e.select(
        col("vec_id"),
        round(cosine_distance(storedDecoded, queryDecoded), 6).as("dist"))
      .orderBy(col("dist").asc, col("vec_id").asc)
      .limit(10)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "flat_scan_f16" -> ((s, dir) => scan(s, dir, "f16")),
    "flat_scan_bf16" -> ((s, dir) => scan(s, dir, "bf16")),
    "flat_scan_f8" -> ((s, dir) => scan(s, dir, "f8"))
  )

  /** Not SQL-expressible — intentionally empty. */
  val oracles: Map[String, String] = Map.empty
}
