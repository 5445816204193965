package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.text.Winnowing

/** Train/eval decontamination: detect evaluation documents whose content
  * overlaps the training corpus — the benchmark-leakage check every LLM
  * data pipeline runs before training. Built on the winnowing (MOSS)
  * fingerprint sketch: any shared substring of length ≥ k + w − 1 chars is
  * GUARANTEED to produce a shared fingerprint, so substring-level copies
  * cannot hide, while the sketch keeps only ~2/(w+1) of the grams.
  *
  * Scale shape: the train index is one distinct-aggregate over exploded
  * fingerprints; the overlap is a fingerprint equi-join + per-doc count —
  * never a doc×doc comparison. At 100 TB both sides shuffle on the
  * fingerprint key only.
  */
object Decontaminate {

  /** DISTINCT winnow fingerprints of the training corpus — the (persistable)
    * contamination index. O(distinct fps) rows. */
  def fingerprintIndex(train: DataFrame, textCol: String,
                       k: Int = 8, w: Int = 4): DataFrame =
    train.select(explode(Winnowing.fingerprints(col(textCol), k, w)).as("fp")).distinct()

  /** Per eval-document overlap against a [[fingerprintIndex]]: n_fp (the
    * doc's fingerprint count), n_shared (how many also occur in train),
    * overlap_ratio, contaminated (majority overlap). Zero-overlap docs are
    * kept (left join) — absence of evidence is a result. Docs with NO
    * fingerprints (null/empty text) have no row here — they carry no
    * evidence either way; [[clean]] keeps them. `index` must hold distinct
    * fingerprints ([[fingerprintIndex]]'s contract — duplicates would
    * inflate n_shared); it is joined as-is, not re-deduplicated, so the
    * persisted index pays its distinct shuffle once at build time. */
  def overlap(eval: DataFrame, idCol: String, textCol: String, index: DataFrame,
              k: Int = 8, w: Int = 4): DataFrame = {
    val evalFps = eval.select(col(idCol),
      explode(Winnowing.fingerprints(col(textCol), k, w)).as("fp"))
    val idx = index.select(col("fp")).withColumn("__hit", lit(1))
    evalFps.join(idx, Seq("fp"), "left")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_fp"), count(col("__hit")).as("n_shared"))
      .withColumn("overlap_ratio", round(col("n_shared") / col("n_fp"), 6))
      .withColumn("contaminated", (col("n_shared") * 2 >= col("n_fp")).cast("long"))
  }

  /** [[overlap]] filtered to the clean side — the decontaminated eval set.
    * Anti-joins the CONTAMINATED ids, so docs absent from [[overlap]]'s
    * output (no fingerprints — null/empty text) are kept, honoring the
    * absence-of-evidence contract rather than silently dropping them. */
  def clean(eval: DataFrame, idCol: String, textCol: String, index: DataFrame,
            k: Int = 8, w: Int = 4): DataFrame = {
    val flagged = overlap(eval, idCol, textCol, index, k, w)
      .where(col("contaminated") === 1).select(col(idCol))
    eval.join(flagged, Seq(idCol), "left_anti")
  }
}
