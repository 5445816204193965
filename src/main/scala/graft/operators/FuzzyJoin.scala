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

  /** Distinct pairs (id_a < id_b) of rows whose `strCol` values are within
    * edit distance 1, with the distance. Output: id_a, id_b, d. */
  def editPairs1(df: DataFrame, idCol: String, strCol: String): DataFrame = {
    val va = df.select(col(idCol).as("id_a"), col(strCol).as("s_a"))
      .withColumn("vv", explode(deletionVariants(col("s_a"))))
    val vb = df.select(col(idCol).as("id_b"), col(strCol).as("s_b"))
      .withColumn("vv", explode(deletionVariants(col("s_b"))))
    va.join(vb, "vv")
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "s_a", "s_b").distinct()
      // compute the O(|a|·|b|) edit distance ONCE per candidate — Catalyst
      // does not CSE an expression across the Filter/Project boundary
      .withColumn("d", levenshtein(col("s_a"), col("s_b")).cast("long"))
      .where(col("d") <= 1)
      .select("id_a", "id_b", "d")
  }
}
