package graft.ann

import org.apache.spark.sql.{DataFrame, Row}

/** Driver-side row iteration for the local serving-rung loaders, with a
  * BOUNDED job count (r14 s3, guide §1.2/§5).
  *
  * `toLocalIterator` dispatches ONE JOB PER PARTITION — measured 8 × ~10 ms
  * of pure dispatch per rung load at bench scale, and each of those jobs
  * runs a single task, so the upstream compute is sequential anyway. For
  * inputs the planner can prove small (driver-side `sizeInBytes` from the
  * optimized plan's stats — parquet file sizes / cached-relation bytes; no
  * job), a plain `collect()` is strictly better: ONE job whose tasks run in
  * parallel across cores, holding rows a driver that is about to build the
  * resident rung from them can afford. Above the threshold the
  * partition-streamed iterator keeps the transient footprint at one
  * partition — the 100 TB-scale contract the loaders were built on.
  *
  * Iteration order is identical on both paths (partition order, then row
  * order within each partition), so the built rungs are bit-identical.
  * Threshold parameterised via `graft.localLoad.collectBytes` (planned
  * input bytes; default 256 MiB — decoded Row overhead lands well inside a
  * serving driver's headroom). */
private[graft] object LocalLoad {
  val CollectBytesConf = "graft.localLoad.collectBytes"
  val DefaultCollectBytes: Long = 256L << 20

  def boundedIterator(rows: DataFrame): java.util.Iterator[Row] = {
    val limit = rows.sparkSession.conf.getOption(CollectBytesConf)
      .map(_.toLong).getOrElse(DefaultCollectBytes)
    // unknown stats default to spark.sql.defaultSizeInBytes = Long.Max —
    // i.e. the fallback direction is the streamed iterator, never an
    // unbounded collect
    val planned = rows.queryExecution.optimizedPlan.stats.sizeInBytes
    if (planned <= BigInt(limit)) java.util.Arrays.asList(rows.collect(): _*).iterator()
    else rows.toLocalIterator()
  }
}
