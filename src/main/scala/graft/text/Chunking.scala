package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Document chunking for LLM training/retrieval pipelines: split each
  * document into overlapping token windows (context-window packing,
  * embedding-index units). Row-local except the explode — no shuffle; at
  * corpus scale the cost is the output row count, exactly like the shingle
  * explodes in the dedup family.
  *
  * Token = whitespace run split (the same tokenizer as
  * [[TextAnalysis.tokens]] and the DuckDB-replicable oracle split).
  */
object Chunking {

  /** Explode `textCol` into chunks of `chunkTokens` tokens with
    * `overlapTokens` tokens shared between consecutive chunks
    * (stride = chunk − overlap). Every document yields ≥ 1 chunk (short
    * docs yield themselves); the last chunk may be short. Output:
    * idCol, chunk_id (0-based), n_chunk_tokens, chunk_text. */
  def chunks(df: DataFrame, idCol: String, textCol: String,
             chunkTokens: Int, overlapTokens: Int = 0): DataFrame = {
    require(chunkTokens >= 1, s"chunkTokens must be >= 1, got $chunkTokens")
    require(overlapTokens >= 0 && overlapTokens < chunkTokens,
      s"overlapTokens must be in [0, chunkTokens), got $overlapTokens")
    val stride = chunkTokens - overlapTokens
    val toks = split(col(textCol), "\\s+")
    // integer ceil((n - overlap) / stride), clamped to >= 1: after the
    // clamp, truncating division (Spark) and floor division (DuckDB //)
    // agree for every n
    val nc = greatest(lit(1L),
      ((size(toks) - lit(overlapTokens) + lit(stride - 1)) / lit(stride)).cast("long"))
    df.select(col(idCol), toks.as("__toks"), nc.as("__nc"))
      .select(col(idCol), col("__toks"),
        explode(sequence(lit(0L), col("__nc") - 1)).as("chunk_id"))
      .select(col(idCol), col("chunk_id"),
        slice(col("__toks"), (col("chunk_id") * stride + 1).cast("int"), lit(chunkTokens)).as("__c"))
      .select(col(idCol), col("chunk_id"),
        size(col("__c")).cast("long").as("n_chunk_tokens"),
        array_join(col("__c"), " ").as("chunk_text"))
  }
}
