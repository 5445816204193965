package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Johnson–Lindenstrauss random projection — the dimension-reduction
  * primitive that makes wide-embedding pipelines cheap at corpus scale:
  * project d-dim vectors onto k ≪ d dimensions with a Rademacher (±1/√k)
  * matrix and run candidate generation (LSH bucketing, coarse top-K) in
  * the small space, verifying survivors in the original space.
  * (JL lemma: pairwise distances are preserved within ε for
  * k = O(ε⁻² log n); Achlioptas 2003 shows ±1 entries suffice.)
  *
  * The matrix is DETERMINISTIC — entry (i, j) is the low bit of
  * md5("family|i|j") mapped to ±1 — so projections are reproducible
  * across runs, partitionings, and engines (the DuckDB oracle regenerates
  * the same matrix from the same md5 strings). The projection is a plan
  * constant (k·d literals, e.g. 16×64 doubles) applied as a codegen'd
  * ordered fold per component: row-local, zero shuffles, no model state
  * to distribute.
  */
object RandomProjection {

  /** ±1 from the low bit of md5("family|i|j") — bit-compatible with the
    * oracle's `(h15(md5(...)) % 2) * 2 - 1`. */
  private[ann] def sign(family: String, i: Int, j: Int): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$family|$i|$j".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(15)
    if (java.lang.Long.parseLong(hex, 16) % 2 == 0) -1.0 else 1.0
  }

  /** `array<double>` of the k projected components of `vec` (a d-dim
    * array column). Each component is a LEFT-TO-RIGHT fold over j — the
    * same association order the oracle's `list_reduce` uses, so values
    * match bit-for-bit, not just to rounding. */
  def projectExpr(vec: Column, inDim: Int, outDim: Int,
                  family: String = "rp"): Column = {
    require(inDim >= 1 && outDim >= 1 && outDim <= inDim,
      s"need 1 <= outDim <= inDim, got $outDim / $inDim")
    val scale = 1.0 / math.sqrt(outDim.toDouble)
    // a wrong-length vector would zip into silent nulls — fail loudly instead
    val checked = when(size(vec) === inDim, vec.cast("array<double>"))
      .otherwise(raise_error(concat(
        lit(s"random projection expects $inDim dims, got "), size(vec).cast("string"))))
    val comps = (0 until outDim).map { i =>
      val gs = array((0 until inDim).map(j => lit(sign(family, i, j))): _*)
      aggregate(zip_with(checked, gs, (x, g) => x * g),
        lit(0.0), (acc, x) => acc + x) * lit(scale)
    }
    array(comps: _*)
  }

  /** `df` with the projected vector appended as `outCol`. */
  def project(df: DataFrame, vecCol: String, inDim: Int, outDim: Int,
              outCol: String = "projected", family: String = "rp"): DataFrame =
    df.withColumn(outCol, projectExpr(col(vecCol), inDim, outDim, family))
}
