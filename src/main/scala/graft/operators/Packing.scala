package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM pretraining: concatenate documents in a
  * deterministic order and split the resulting token stream at every
  * `contextTokens` boundary (the GPT-style concat-and-split discipline —
  * documents may straddle a window boundary; padding waste is zero).
  *
  * Scale shape: packing is inherently a running sum over an order, so a
  * GLOBAL order would serialize into one partition — instead the corpus is
  * split into `shards` independent streams by id hash and each shard packs
  * itself. One window shuffle partitioned by shard; shard population is
  * ~n/shards and the hash order inside a shard is deterministic, so the
  * same corpus always packs identically (re-runs, backfills, engines).
  */
object Packing {

  /** Assign every document its position in the packed token stream:
    * `shard`, `seq_id` (which context window the doc's FIRST token lands
    * in), `seq_offset` (offset of that token inside the window). The
    * deterministic order inside a shard is (order-hash, id) — id-hash
    * derived like [[Sampling.hashBucket]], so packing is a pure function
    * of the corpus content. */
  def packSequences(df: DataFrame, idCol: String, tokensCol: String,
                    contextTokens: Int, shards: Int = 1024,
                    family: String = "pack"): DataFrame = {
    require(contextTokens >= 1, s"contextTokens must be >= 1, got $contextTokens")
    require(shards >= 1, s"shards must be >= 1, got $shards")
    val w = Window.partitionBy(col("__shard")).orderBy(col("__ord"), col(idCol))
    df.withColumn("__shard", Sampling.hashBucket(col(idCol), family, shards))
      .withColumn("__ord", Sampling.hashBucket(col(idCol), family + "-order", 1 << 30))
      .withColumn("__start", sum(col(tokensCol).cast("long")).over(w) - col(tokensCol))
      .select(col(idCol),
        col("__shard").as("shard"),
        (col("__start") / contextTokens).cast("long").as("seq_id"),
        pmod(col("__start"), lit(contextTokens.toLong)).as("seq_offset"),
        col(tokensCol).cast("long").as(tokensCol))
  }

  /** Per-(shard, seq) packing stats: how many documents START in each
    * window and their token mass — the packing-efficiency audit (every
    * window except each shard's last is filled by construction; straddling
    * docs carry the overflow into the next window). */
  def packStats(packed: DataFrame, tokensCol: String): DataFrame =
    packed.groupBy("shard", "seq_id")
      .agg(count(lit(1)).as("n_docs"), sum(col(tokensCol)).as("n_tokens"))
}
