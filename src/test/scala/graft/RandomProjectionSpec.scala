package graft

import org.apache.spark.sql.functions._

import graft.ann.RandomProjection

/** JL random projection — unit layer under the oracle-checked `rp_topk`
  * query. */
class RandomProjectionSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read.parquet(s"$sfDir/embeddings.parquet").cache()

  test("projection is deterministic and exactly linear under scaling") {
    val p1 = RandomProjection.project(emb, "embedding", 64, 16)
      .select("vec_id", "projected").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val p2 = RandomProjection.project(emb.repartition(7), "embedding", 64, 16)
      .select("vec_id", "projected").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(p1 === p2) // pure function of content, bit-exact
    // scaling by a power of two distributes exactly through the fold
    val doubled = emb.select(col("vec_id"),
      transform(col("embedding"), x => x * lit(2.0f)).as("embedding"))
    val pd = RandomProjection.project(doubled, "embedding", 64, 16)
      .select("vec_id", "projected").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    pd.foreach { case (id, v) =>
      assert(v === p1(id).map(_ * 2.0), s"linearity broke for $id") }
  }

  test("cosine distortion is JL-bounded and shrinks with k (worst case: near-random vectors)") {
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val orig = emb.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble)).toMap
    def projMap(k: Int) = RandomProjection.project(emb, "embedding", 64, k)
      .select("vec_id", "projected").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val ids = orig.keys.toSeq.sorted.take(60)
    def meanErr(proj: Map[Long, Seq[Double]]) = {
      val errs = for (a <- ids; b <- ids if a < b)
        yield math.abs(cos(orig(a), orig(b)) - cos(proj(a), proj(b)))
      (errs.sum / errs.size, errs.max)
    }
    // the test embeddings are ~isotropic noise — the hardest case: expected
    // distortion ≈ 1/√k (measured 0.20 at k=16, 0.145 at k=32)
    val (m16, x16) = meanErr(projMap(16))
    assert(m16 < 0.25, s"mean cosine distortion at k=16: $m16")
    assert(x16 < 0.85, s"max cosine distortion at k=16: $x16")
    val (m32, _) = meanErr(projMap(32))
    assert(m32 < 0.8 * m16, s"distortion did not shrink with k: $m32 vs $m16")
  }

  test("contract errors") {
    intercept[IllegalArgumentException](
      RandomProjection.projectExpr(col("embedding"), 64, 65))
    intercept[IllegalArgumentException](
      RandomProjection.projectExpr(col("embedding"), 64, 0))
    // wrong-length vectors fail loudly instead of zipping into nulls
    val bad = Seq((1L, Seq(1.0f, 2.0f))).toDF("vec_id", "embedding")
    val e = intercept[Exception](
      RandomProjection.project(bad, "embedding", 64, 16).collect())
    assert(e.getMessage.contains("expects 64 dims") ||
      Option(e.getCause).exists(_.getMessage.contains("expects 64 dims")))
  }
}
