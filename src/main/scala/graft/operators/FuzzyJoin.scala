package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance similarity self-join via deletion-neighborhood blocking
  * (FastSS / SymSpell family — Bocek et al. 2007, "Fast Similarity Search
  * in Large Dictionaries"). For threshold 1 the candidate generator is
  * provably LOSSLESS: ed(s,t) ≤ 1 implies the deletion neighborhoods
  * D1(s) = {s} ∪ {s minus one char} and D1(t) intersect —
  *  - ed = 0: s itself is in both;
  *  - substitution at i: deleting position i from both sides yields the
  *    same string;
  *  - insert/delete: the shorter string IS a member of the longer one's
  *    deletion neighborhood.
  * (FuzzyJoinSpec pins this against brute force over random strings.)
  *
  * Scale shape: explode each row into |s|+1 deletion variants (bounded by
  * the key length — use a SHORT key column, e.g. a title or fixed prefix,
  * never the document body), one equi-join on the variant string, then an
  * exact `levenshtein ≤ 1` verify on the deduplicated candidate pairs.
  * Never all-pairs: the shuffle carries (L+1)× the key rows and the
  * verify touches only candidates. Hot variant keys are exactly the true
  * near-duplicate clusters, so candidate volume is output-bound — the
  * same property the exact-dedup groupBy has.
  */
object FuzzyJoin {

  /** All single-character-deletion variants of `c`, plus `c` itself,
    * deduplicated (repeated chars produce equal variants). Empty strings
    * have only themselves. */
  def deletionVariants(c: Column): Column =
    array_distinct(deletionVariantsRaw(c))

  /** [[deletionVariants]] WITHOUT the per-row dedup — callers that dedup
    * downstream (e.g. on the variant hash, where element compares are 8-byte
    * longs instead of strings) skip the O(v²) string-compare pass here. */
  def deletionVariantsRaw(c: Column): Column =
    when(length(c) === 0, array(c)).otherwise(
      concat(
        array(c),
        transform(sequence(lit(1), length(c)), i =>
          concat(c.substr(lit(1), i - 1), c.substr(i + 1, length(c))))))

  /** The order-2 deletion neighborhood: `c`, every single deletion, every
    * DOUBLE deletion (positions i < j) — 1 + L + L(L−1)/2 variants,
    * deduplicated. Still bounded by the key length (the |s|²/2 blow-up is
    * why the key must stay SHORT — a 30-char title explodes into ≤ 466
    * variants, a document body must never come through here). The FastSS
    * losslessness generalizes: ed(s,t) ≤ 2 ⟹ deleting the ≤ 2 touched
    * positions from each side yields a COMMON member of D2(s) ∩ D2(t)
    * (substitutions delete on both sides, inserts/deletes on the longer
    * side only) — FuzzyJoinSpec pins this against brute force. */
  def deletionVariants2(c: Column): Column =
    array_distinct(deletionVariants2Raw(c))

  /** [[deletionVariants2]] without the per-row dedup (see
    * [[deletionVariantsRaw]] — at t=2 the dedup is ~466² element compares
    * per 30-char key, by far the hottest part of the candidate build). */
  def deletionVariants2Raw(c: Column): Column = {
    val len = length(c)
    // sequence(a, b) counts DOWN when a > b — guard L < 2 explicitly, and
    // the inner range starts at i+1 ≤ L by the outer bound
    val doubles = when(len >= 2,
      flatten(transform(sequence(lit(1), len - 1), i =>
        transform(sequence(i + 1, len), j =>
          concat(c.substr(lit(1), i - 1),
            c.substr(i + 1, j - i - 1),
            c.substr(j + 1, len))))))
      .otherwise(array().cast("array<string>"))
    concat(deletionVariantsRaw(c), doubles)
  }

  /** Distinct pairs (id_a < id_b) of rows whose `strCol` values are within
    * edit distance `threshold` (1 or 2), with the distance. Candidates from
    * the order-`threshold` deletion neighborhood (lossless — see above),
    * then one exact levenshtein verify per deduplicated pair.
    * Output: id_a, id_b, d.
    *
    * r14 shape (guide §2.3/§2.4): the join key is xxhash64(variant), not
    * the variant string — an 8-byte shuffle key instead of a ~30-char
    * string, and the per-row dedup (`array_distinct`, O(v²) element
    * compares at v≈466 for t=2) compares longs instead of strings. Hash
    * collisions only ADD candidate pairs; the exact levenshtein verify
    * keeps the output identical to the brute-force truth. Both join sides
    * are built from the same exploded subtree (identical canonical plans —
    * AQE's runtime exchange reuse can then serve the second side from the
    * first's shuffle; the formatted initial plan still prints both). */
  def editPairs(df: DataFrame, idCol: String, strCol: String, threshold: Int): DataFrame = {
    require(threshold == 1 || threshold == 2,
      s"deletion-neighborhood blocking supports thresholds 1 and 2, got $threshold " +
        "(t >= 3 explodes the variant count cubically — use n-gram blocking instead)")
    val variants: Column => Column =
      if (threshold == 1) deletionVariantsRaw else deletionVariants2Raw
    val src = df.select(col(idCol).as("id"), col(strCol).as("s"))
    // The explode multiplies rows ~|s|²/2× (t=2), so a narrow input that
    // arrives in fewer partitions than the cluster has cores runs the
    // ENTIRE variant build single-threaded (measured: 7.1 task-seconds in
    // one task at sf0.1 — the whole row's wall time). Spreading the
    // PRE-explode rows is a trivial shuffle (rows × ~40 B) that buys full
    // parallelism for the 466×-bigger generate; at scale the input already
    // has ≥ cores partitions and this is a no-op (guide §2.5 input skew).
    val para = df.sparkSession.sparkContext.defaultParallelism
    val spread = if (src.rdd.getNumPartitions < para) src.repartition(para) else src
    val exploded = spread.withColumn("vh",
      explode(array_distinct(transform(variants(col("s")), v => xxhash64(v)))))
    val va = exploded.select(col("id").as("id_a"), col("s").as("s_a"), col("vh"))
    val vb = exploded.select(col("id").as("id_b"), col("s").as("s_b"), col("vh"))
    // merge hint: the pre-explode size ESTIMATE is what the planner sees,
    // so it broadcast the whole EXPLODED side (collected on the driver —
    // ~|s|²/2 × rows; at sf0.1 a 932k-row driver build, at scale an OOM).
    // Sort-merge keeps both exploded sides distributed, reuses one
    // Exchange for the self-join, and AQE splits hot-variant skew.
    va.hint("merge").join(vb, Seq("vh"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "s_a", "s_b").distinct()
      // compute the O(|a|·|b|) edit distance ONCE per candidate — Catalyst
      // does not CSE an expression across the Filter/Project boundary
      .withColumn("d", levenshtein(col("s_a"), col("s_b")).cast("long"))
      .where(col("d") <= threshold)
      .select("id_a", "id_b", "d")
  }

  /** Threshold-1 pairs (the r7 operator, now a view over [[editPairs]]). */
  def editPairs1(df: DataFrame, idCol: String, strCol: String): DataFrame =
    editPairs(df, idCol, strCol, threshold = 1)

  /** Threshold-2 pairs — real entity resolution hits t=2 immediately. */
  def editPairs2(df: DataFrame, idCol: String, strCol: String): DataFrame =
    editPairs(df, idCol, strCol, threshold = 2)
}
