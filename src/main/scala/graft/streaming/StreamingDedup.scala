package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact deduplication — the ingest-time counterpart of
  * [[graft.dedup.Dedup.exactGroups]]: an arriving document stream keeps only
  * the FIRST arrival of each distinct content (batch dedup keeps the min-id
  * representative; both keep exactly one row per distinct content, so the
  * surviving CONTENT set is identical — asserted in StreamingDedupSpec).
  *
  * State is one 32-byte md5 fingerprint per distinct content, held by the
  * state store. Unbounded over an unbounded stream — correct for a
  * finite backfill or keyed retention; for continuous ingest where
  * re-crawls arrive within a bounded delay, [[dropExactDuplicatesWithinWatermark]]
  * evicts fingerprints once the watermark passes them, bounding state by
  * the delay window. Works identically over `read` and `readStream` inputs.
  */
object StreamingDedup {

  /** Keep the first arrival of each distinct `textColName` content.
    * Dedup key is the md5 fingerprint, not the text itself — state-store
    * entries stay 32 bytes regardless of document size. */
  def dropExactDuplicates(docs: DataFrame, textColName: String): DataFrame =
    docs.withColumn("__fp", md5(col(textColName).cast("binary")))
      .dropDuplicates("__fp")
      .drop("__fp")

  /** Streaming NEAR-dup guard: keep the first arrival per full MinHash
    * signature (k mins concatenated). Two docs share the full signature
    * with probability J^k (J = shingle Jaccard), so this drops only
    * very-close rewrites (J ≳ 0.9 at k=8) — the cheap ingest-time filter.
    * Banded OR-semantics (any band collides → candidate) needs a second
    * stateful stage + verify join; that remains the batch pipeline
    * ([[graft.dedup.MinHashLSH.nearDuplicates]]) run over the deduped
    * stream's sink, where it is one more batch job. State per distinct
    * signature is k longs. `family` picks the hash family: `xx` (default —
    * the production path) or `md5` (engine-independent, the oracle path:
    * the streaming_dedup_replay CORRECTNESS row replays a 2-batch file
    * stream against DuckDB's signature computation). */
  def dropSignatureDuplicates(docs: DataFrame, textColName: String, k: Int = 8,
                              family: String = "xx"): DataFrame =
    graft.dedup.MinHashLSH.withSignatures(docs, textColName, k, family)
      .withColumn("__sig", concat_ws(":", (0 until k).map(j => col(s"sig_$j")): _*))
      .dropDuplicates("__sig")
      .drop((0 until k).map(j => s"sig_$j") :+ "__sig": _*)

  /** Watermark-bounded variant: duplicates are dropped only while their
    * fingerprint is within the watermark delay of the stream's event time —
    * state evicts as the watermark advances (the 100 TB continuous-ingest
    * shape; a re-crawl later than `delay` is re-admitted, by contract). */
  def dropExactDuplicatesWithinWatermark(
      docs: DataFrame, textColName: String,
      tsCol: String, delay: String): DataFrame =
    docs.withWatermark(tsCol, delay)
      .withColumn("__fp", md5(col(textColName).cast("binary")))
      .dropDuplicatesWithinWatermark("__fp")
      .drop("__fp")
}
