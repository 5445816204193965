package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.GraftBridge.{column, expression}
import org.apache.spark.sql.graft.{Sq8Encode, Sq8Decode, VecDistanceSq8}

/** Trained scalar quantization (SQ8) — see SqExpressions.scala for the
  * format. This object is the training + Column-API surface:
  * [[trainStats]] learns per-dimension affine ranges from the corpus in one
  * aggregation; encode/decode/distance embed the trained stats as plan
  * constants (dim-sized — O(KB)) so the operators stay row-local and
  * codegen'd.
  *
  * Scale design: training is a posexplode of (dim, value) pairs whose
  * map-side partial aggregation collapses each partition to `dim` rows
  * before the shuffle — shuffle volume is partitions × dim, independent of
  * corpus size; the driver collects exactly `dim` rows. For a 100 TB corpus
  * pass a `sampleMod` to train on a deterministic id-hash sample (min/max
  * from a 1/k sample only narrows ranges — clamping absorbs out-of-range
  * tails), mirroring the IVF/PQ sampled-training discipline.
  */
object Sq {

  /** Per-dimension (mins, scales): scale_d = (max_d − min_d)/255.
    * `sampleMod` > 1 trains on the deterministic xxhash64(id) % mod == 0
    * row sample (requires `idCol`). */
  def trainStats(df: DataFrame, vecCol: String,
                 sampleMod: Long = 1L, idCol: String = ""): (Array[Double], Array[Double]) = {
    val base =
      if (sampleMod <= 1L) df
      else {
        require(idCol.nonEmpty, "sampleMod > 1 requires an idCol for the deterministic sample")
        val sampled = df.where(pmod(xxhash64(col(idCol)), lit(sampleMod)) === 0)
        // an over-aggressive mod on a small corpus must not train on nothing
        if (sampled.isEmpty) df else sampled
      }
    val rows = base.select(posexplode(col(vecCol)).as(Seq("d", "x")))
      .groupBy(col("d")).agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
      .orderBy(col("d")).collect()
    require(rows.nonEmpty, "cannot train SQ8 stats on an empty corpus")
    val mins = rows.map(_.getAs[Float]("mn").toDouble)
    val scales = rows.map(r =>
      (r.getAs[Float]("mx").toDouble - r.getAs[Float]("mn").toDouble) / 255.0)
    (mins, scales)
  }

  /** Encode a float32 vector column to 1-byte/dim SQ8 codes (binary). */
  def encode(v: Column, mins: Array[Double], scales: Array[Double]): Column =
    column(Sq8Encode(expression(v), mins, scales))

  /** Decode SQ8 codes to the quantized double values. */
  def decode(codes: Column, mins: Array[Double], scales: Array[Double]): Column =
    column(Sq8Decode(expression(codes), mins, scales))

  /** Fused asymmetric distance between stored codes and a pre-decoded
    * query (double[]), decoding inside the scan loop. */
  def distance(codes: Column, query: Array[Double],
               mins: Array[Double], scales: Array[Double], metric: String): Column =
    column(VecDistanceSq8(expression(codes), query, mins, scales, metric))

  /** Driver-side encode/decode round trip of one query vector — the value
    * the fused kernel compares against (both sides quantized, mirroring the
    * f16/bf16/f8 scan discipline). */
  def roundTrip(q: Array[Float], mins: Array[Double], scales: Array[Double]): Array[Double] = {
    require(q.length == mins.length, s"dimension mismatch: ${q.length} vs ${mins.length}")
    Array.tabulate(q.length) { i =>
      Sq8Encode.decodeOne(Sq8Encode.encodeOne(q(i), mins(i), scales(i)), mins(i), scales(i))
    }
  }
}
