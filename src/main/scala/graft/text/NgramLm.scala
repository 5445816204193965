package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Word-bigram language-model quality scoring — the model-based filter of
  * corpus prep (the CCNet/KenLM discipline): train token statistics on a
  * reference slice, score every document by its average bigram
  * log-likelihood, and gate or bucket on the score. Everything is
  * deterministic — counts, an add-½ smoothed conditional, natural log —
  * so the DuckDB oracle replicates scores to the rounding digit.
  *
  * Model: P(w2|w1) = (c(w1 w2) + ½) / (c(w1 ·) + ½·V), with V the train
  * vocabulary size; a bigram outside the (capped) model backs off to
  * c=0 under the same formula, an unseen head to 1/V.
  *
  * Scale: training is two count shuffles plus a DISTRIBUTED top-K
  * (`orderBy.limit` → partial TakeOrdered per partition, never a global
  * window) that caps the model at `maxBigrams`/`maxUnigrams` rows —
  * dropped tail entries score as unseen, trading a bounded likelihood
  * underestimate for a broadcastable model. Scoring is two broadcast
  * joins + row-local log + one per-doc agg; the corpus is never
  * shuffled by content.
  */
object NgramLm {

  /** Capped bigram table (`bigram`, `c_bg`), head table (`w1`, `c_head`),
    * and train vocabulary size. Both tables are driver-bounded by
    * construction and broadcast at score time. */
  final case class Model(bigrams: DataFrame, heads: DataFrame, vocabSize: Long)

  private def toks(textCol: String): Column = split(col(textCol), " ")

  /** `array<string>` of space-joined adjacent token pairs. */
  private def bigramsOf(textCol: String): Column = {
    val t = toks(textCol)
    zip_with(slice(t, lit(1), size(t) - 1), slice(t, lit(2), size(t) - 1),
      (a, b) => concat_ws(" ", a, b))
  }

  /** Count bigrams/heads/vocab on `df`, keeping the `maxBigrams` /
    * `maxUnigrams` most frequent entries (ties broken by the token text —
    * a total order, so the cap is deterministic on every engine). */
  def train(df: DataFrame, textCol: String,
            maxBigrams: Int = 1 << 20, maxUnigrams: Int = 1 << 20): Model = {
    require(maxBigrams >= 1 && maxUnigrams >= 1, "model caps must be >= 1")
    val bg = df.select(explode(bigramsOf(textCol)).as("bigram"))
      .groupBy("bigram").agg(count(lit(1)).as("c_bg"))
      .orderBy(col("c_bg").desc, col("bigram")).limit(maxBigrams)
    val t = toks(textCol)
    val hd = df.select(explode(slice(t, lit(1), size(t) - 1)).as("w1"))
      .groupBy("w1").agg(count(lit(1)).as("c_head"))
      .orderBy(col("c_head").desc, col("w1")).limit(maxUnigrams)
    val vocab = df.select(explode(t).as("t"))
      .agg(countDistinct("t")).head().getLong(0)
    // Consistency across the two caps: a bigram kept by maxBigrams whose
    // HEAD was dropped by maxUnigrams would score with c_bg > 0 but
    // c_head = 0 — a conditional above 1 and a POSITIVE log-likelihood
    // (an unbounded overestimate masquerading as quality). Such orphaned
    // bigrams leave the model with their head and take the unseen-head
    // path (≈1/V), preserving the cap's bounded-underestimate semantics.
    // Both tables are cap-bounded, so the semi-join is driver-sized.
    val bgKept = bg.withColumn("w1", substring_index(col("bigram"), " ", 1))
      .join(hd.select("w1"), Seq("w1"), "left_semi").drop("w1")
    Model(bgKept, hd, vocab)
  }

  /** Per-document average bigram log-likelihood:
    * `(id, n_bigrams, avg_logp)`. Documents with fewer than two tokens
    * have no bigrams and drop out (no likelihood is defined for them —
    * filter or default upstream). */
  def score(df: DataFrame, idCol: String, textCol: String, model: Model): DataFrame = {
    val logp = log(
      (coalesce(col("c_bg"), lit(0L)).cast("double") + 0.5) /
        (coalesce(col("c_head"), lit(0L)).cast("double") + 0.5 * model.vocabSize))
    df.select(col(idCol), explode(bigramsOf(textCol)).as("bigram"))
      .join(broadcast(model.bigrams), Seq("bigram"), "left")
      .withColumn("w1", substring_index(col("bigram"), " ", 1))
      .join(broadcast(model.heads), Seq("w1"), "left")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_bigrams"), avg(logp).as("avg_logp"))
  }
}
