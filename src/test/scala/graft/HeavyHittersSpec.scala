package graft

import org.apache.spark.sql.functions._

import graft.operators.HeavyHitters

/** CMS-pruned heavy hitters: the sketch may overestimate (coarse eps, hash
  * collisions) but never underestimate — so candidates are a superset, the
  * exact pass settles them, and the output is bit-identical to the plain
  * groupBy-HAVING at ANY sketch sizing. */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  // 5 heavy keys x 50 rows + 2000 singletons
  private lazy val skewed = (
    (0 until 5).flatMap(h => Seq.fill(50)(s"heavy_$h")) ++
    (0 until 2000).map(i => s"rare_$i")
  ).toDF("k")

  private def exact(threshold: Long) =
    skewed.groupBy(col("k").as("key")).agg(count(lit(1)).as("n"))
      .where(col("n") >= threshold)
      .collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq

  test("frequentKeys equals the plain groupBy-HAVING on skewed data") {
    val got = HeavyHitters.frequentKeys(skewed, col("k"), threshold = 50L)
      .collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    assert(got === exact(50L))
    assert(got.map(_._1) === (0 until 5).map(h => s"heavy_$h"))
  }

  test("a deliberately coarse sketch changes nothing but the pruning rate") {
    // eps=0.1 on 2250 rows: slack ~225 swamps the threshold — candidates
    // degrade toward everything, output must stay exact
    val got = HeavyHitters.frequentKeys(skewed, col("k"), threshold = 50L,
        eps = 0.1, confidence = 0.9)
      .collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    assert(got === exact(50L))
  }

  test("candidate prefilter is a superset of heavy rows and actually prunes") {
    val bytes = HeavyHitters.sketch(skewed, col("k"), eps = 1e-4,
      confidence = 0.99)
    val cand = HeavyHitters.candidates(skewed, col("k"), 50L, bytes)
    val n = cand.count()
    // all 250 heavy rows must survive; slack eps*N = 0.225 rounds to ~0
    // extra keys, leave generous room for hash-collision stragglers
    assert(n >= 250L, s"lost heavy rows: $n")
    assert(n <= 500L, s"sketch barely pruned: $n of ${skewed.count()}")
    val heavySurvivors = cand.where(col("k").startsWith("heavy_")).count()
    assert(heavySurvivors === 250L)
  }

  test("empty input yields an empty (key, n) result") {
    val empty = skewed.where(lit(false))
    val out = HeavyHitters.frequentKeys(empty, col("k"), threshold = 2L)
    assert(out.columns.toSeq === Seq("key", "n"))
    assert(out.count() === 0L)
  }

  test("threshold contract") {
    intercept[IllegalArgumentException] {
      HeavyHitters.frequentKeys(skewed, col("k"), threshold = 0L)
    }
  }
}
