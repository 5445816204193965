package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.SketchExpressions

/** Exact heavy hitters (keys with count ≥ threshold) over a high-cardinality
  * key, candidate-pruned by a count-min sketch.
  *
  * Why not a plain groupBy? For low-cardinality keys (words), map-side
  * partial aggregation already shrinks the shuffle to vocabulary size and a
  * plain groupBy is optimal. For corpus-cardinality keys (shingles, URLs,
  * n-grams) the "vocabulary" IS the corpus: every row shuffles once just to
  * discover its key occurred twice. The sketch pass fixes the shape: one
  * aggregation builds a fixed-size CMS (map-side partial sketches, driver
  * merge), then a codegen'd probe — no shuffle — drops every row whose
  * key's count UPPER BOUND is below the threshold, and only the surviving
  * sliver pays the exact groupBy shuffle.
  *
  * Exactness: CMS never underestimates, so no qualifying key can be
  * filtered out (every row of a key with count ≥ T probes ≥ T); the exact
  * count on candidates kills the overestimated stragglers. The output is
  * bit-identical to the plain groupBy-HAVING at any (eps, confidence) —
  * sizing only moves the pruning rate, never the answer (HeavyHittersSpec
  * pins this with a deliberately coarse sketch).
  *
  * Sizing at 100 TB: the estimate overshoots by ≤ eps·N (N = total rows
  * ingested), so the scale-stable parameterization is RELATIVE support —
  * threshold = ⌈φ·N⌉ with eps = φ/2 (the textbook frequent-items pairing):
  * slack eps·N = threshold/2 stays proportionally under the threshold at
  * every corpus size while the sketch stays a CONSTANT 2/eps = 4/φ
  * counters. A fixed absolute threshold with fixed eps instead degrades
  * toward "everything is a candidate" as N grows (still exact, just
  * unpruned — the plain groupBy as the graceful floor). */
object HeavyHitters {

  /** Serialized CMS of `key`'s xxhash64 stream. Unlike the bloom aggregate,
    * CountMinSketchAgg never returns SQL NULL — empty input yields a valid
    * EMPTY sketch (every estimate 0), which flows through candidates →
    * exact count as an empty result with the contract schema. Hashing to
    * 64-bit first keeps the probe a primitive-long codegen path; hash
    * collisions only merge counts (more overestimate, still a superset —
    * the exact pass is immune). */
  def sketch(df: DataFrame, key: Column, eps: Double, confidence: Double,
             seed: Int = 42): Array[Byte] =
    df.select(SketchExpressions.cmsAgg(xxhash64(key), eps, confidence, seed).as("s"))
      .head().getAs[Array[Byte]]("s")

  /** The rows whose key's sketch upper bound reaches `threshold` — a
    * provable superset of all heavy keys' rows, no shuffle. */
  def candidates(df: DataFrame, key: Column, threshold: Long,
                 sketchBytes: Array[Byte]): DataFrame =
    df.where(SketchExpressions.cmsEstimate(sketchBytes, xxhash64(key)) >= threshold)

  /** (key, n) for every distinct key value with exact count ≥ threshold. */
  def frequentKeys(df: DataFrame, key: Column, threshold: Long,
                   eps: Double = 1e-4, confidence: Double = 0.99,
                   seed: Int = 42): DataFrame = {
    require(threshold >= 1, s"threshold must be >= 1, got $threshold")
    candidates(df, key, threshold, sketch(df, key, eps, confidence, seed))
      .select(key.as("key"))
      .groupBy("key").agg(count(lit(1)).as("n"))
      .where(col("n") >= threshold)
  }
}
