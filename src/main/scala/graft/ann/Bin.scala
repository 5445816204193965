package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.GraftBridge.{column, expression}
import org.apache.spark.sql.graft.{BinEncode, HammingDistanceBin, HammingDistanceCols}

/** Binary (1-bit/dim) quantization — training + Column-API surface; see
  * BinExpressions.scala for the code format and scale rationale.
  *
  * The threshold is the per-dimension midrange (min+max)/2, trained in the
  * same ONE posexplode aggregation as [[Sq.trainStats]] — min/max are
  * order-independent and exact in doubles, so an external engine (the
  * DuckDB oracle) reproduces every bit decision; a mean or median would be
  * summation-order- or interpolation-dependent. Midrange also centers the
  * bit against the corpus's actual spread, unlike a fixed sign(x) cut that
  * degenerates on all-positive embedding families.
  *
  * Scale design mirrors Sq: shuffle volume is partitions × dim; the driver
  * collects exactly `dim` rows; `sampleMod` trains on the deterministic
  * id-hash sample for the 100 TB path (midrange from a sample only moves
  * the cut by tail mass — bits near the cut flip, Hamming shifts by O(1),
  * and the exact re-rank pass absorbs it).
  */
object Bin {

  /** Per-dimension midrange thresholds. `sampleMod` > 1 trains on the
    * deterministic xxhash64(id) % mod == 0 sample (requires `idCol`);
    * an empty sample falls back to the full corpus. */
  def trainThresholds(df: DataFrame, vecCol: String,
                      sampleMod: Long = 1L, idCol: String = ""): Array[Double] =
    trainThresholdsOpt(df, vecCol, sampleMod, idCol).getOrElse(
      throw new IllegalArgumentException(
        "requirement failed: cannot train binary thresholds on an empty corpus"))

  /** [[trainThresholds]], with "empty corpus" reported as None instead of a
    * throw — the min/max aggregation returning zero rows IS the emptiness
    * probe, so callers that skip the layout on an empty corpus (flush)
    * need no separate `df.isEmpty` job (r14, guide §1.2: every extra tiny
    * job is a full dispatch floor on the lifecycle path). */
  def trainThresholdsOpt(df: DataFrame, vecCol: String,
                         sampleMod: Long = 1L, idCol: String = ""): Option[Array[Double]] = {
    val base =
      if (sampleMod <= 1L) df
      else {
        require(idCol.nonEmpty, "sampleMod > 1 requires an idCol for the deterministic sample")
        val sampled = df.where(pmod(xxhash64(col(idCol)), lit(sampleMod)) === 0)
        if (sampled.isEmpty) df else sampled
      }
    val rows = base.select(posexplode(col(vecCol)).as(Seq("d", "x")))
      .groupBy(col("d")).agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
      .orderBy(col("d")).collect()
    if (rows.isEmpty) None
    else Some(rows.map(r => (r.getAs[Float]("mn").toDouble + r.getAs[Float]("mx").toDouble) / 2.0))
  }

  /** Encode a float32 vector column to packed sign-bit codes (binary,
    * ceil(dim/8) bytes). */
  def encode(v: Column, thresholds: Array[Double]): Column =
    column(BinEncode(expression(v), thresholds))

  /** Driver-side encode of one query vector — the plan constant the fused
    * Hamming kernel compares against. */
  def encodeOne(q: Array[Float], thresholds: Array[Double]): Array[Byte] =
    BinEncode.pack(q, thresholds)

  /** Fused Hamming distance (XOR + popcount) between stored packed codes
    * and a pre-encoded query code. Long-typed for oracle schema parity. */
  def hamming(codes: Column, queryCode: Array[Byte]): Column =
    column(HammingDistanceBin(expression(codes), queryCode))

  /** Hamming distance between two packed-code COLUMNS — the multi-query
    * form (query codes are a broadcast table side, not a plan constant). */
  def hammingCols(a: Column, b: Column): Column =
    column(HammingDistanceCols(expression(a), expression(b)))
}
