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
    when(length(c) === 0, array(c)).otherwise(
      array_distinct(concat(
        array(c),
        transform(sequence(lit(1), length(c)), i =>
          concat(c.substr(lit(1), i - 1), c.substr(i + 1, length(c)))))))

  /** The order-2 deletion neighborhood: `c`, every single deletion, every
    * DOUBLE deletion (positions i < j) — 1 + L + L(L−1)/2 variants,
    * deduplicated. Still bounded by the key length (the |s|²/2 blow-up is
    * why the key must stay SHORT — a 30-char title explodes into ≤ 466
    * variants, a document body must never come through here). The FastSS
    * losslessness generalizes: ed(s,t) ≤ 2 ⟹ deleting the ≤ 2 touched
    * positions from each side yields a COMMON member of D2(s) ∩ D2(t)
    * (substitutions delete on both sides, inserts/deletes on the longer
    * side only) — FuzzyJoinSpec pins this against brute force. */
  def deletionVariants2(c: Column): Column = {
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
    array_distinct(concat(deletionVariants(c), doubles))
  }

  /** Distinct pairs (id_a < id_b) of rows whose `strCol` values are within
    * edit distance `threshold` (1 or 2), with the distance. Candidates from
    * the order-`threshold` deletion neighborhood (lossless — see above),
    * then one exact levenshtein verify per deduplicated pair.
    * Output: id_a, id_b, d. */
  def editPairs(df: DataFrame, idCol: String, strCol: String, threshold: Int): DataFrame = {
    require(threshold == 1 || threshold == 2,
      s"deletion-neighborhood blocking supports thresholds 1 and 2, got $threshold " +
        "(t >= 3 explodes the variant count cubically — use n-gram blocking instead)")
    val variants: Column => Column =
      if (threshold == 1) deletionVariants else deletionVariants2
    val va = df.select(col(idCol).as("id_a"), col(strCol).as("s_a"))
      .withColumn("vv", explode(variants(col("s_a"))))
    val vb = df.select(col(idCol).as("id_b"), col(strCol).as("s_b"))
      .withColumn("vv", explode(variants(col("s_b"))))
    va.join(vb, "vv")
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
