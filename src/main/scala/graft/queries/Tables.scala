package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

object Tables {
  /** Per-path memo of the INFERRED input-table schema (r14 s3, guide
    * §1.2): a bare `spark.read.parquet` launches one schema-inference job
    * per call (~20-25 ms pure dispatch, measured), and every declared
    * query pays it for each table it opens. The testdata tables are
    * immutable per TESTDATA.md, so the first open of a path infers (one
    * job) and every later open passes that same inferred schema
    * explicitly — the metastore role every SQL engine fills. Data is
    * still scanned from parquet on every query; only the schema METADATA
    * is memoized, and only ever from an actual inference of the same
    * path. */
  private val tblSchemas =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.types.StructType]()

  /** Drop every memoized schema (r15, ADVICE): the memo is sound only under
    * the TESTDATA immutability contract — a same-JVM rewrite of a table
    * path (e.g. a test fixture regenerating data with a changed schema)
    * would otherwise silently read with the stale schema. Fixtures that
    * rewrite table paths must call this after the rewrite. */
  def invalidateSchemas(): Unit = tblSchemas.clear()

  /** Load one driver-provided TESTDATA table (TESTDATA.md). */
  def tbl(s: SparkSession, dir: String, name: String): DataFrame = {
    val p = s"$dir/$name.parquet"
    val sch = tblSchemas.computeIfAbsent(p, _ => s.read.parquet(p).schema)
    s.read.schema(sch).parquet(p)
  }

  /** The embedding vectors of every `vec_id <= maxId`, fetched in ONE
    * bounded job (r14, guide §1.2/§5: the query preambles used to issue a
    * separate point-lookup job per needed vector — dim probe, query vector,
    * 8 seed centroids — and each tiny job pays the full dispatch floor;
    * at maxId ≤ a few hundred this is a KB-scale sidecar, never data). */
  def embUpTo(e: DataFrame, maxId: Long): Map[Long, Array[Float]] =
    e.where(col("vec_id") <= maxId).select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap

  /** Run `body` with shuffle partitions sized from the bounded replay
    * input (r14, guide §2.2/§2.5: scale-adaptive partitioning — AQE cannot
    * re-plan STATEFUL streaming shuffles, and the state-partition count is
    * frozen into the checkpoint at query start, so it must be derived from
    * input size rather than left at the session default; at the session
    * default every micro-batch pays one state-store checkpoint file and
    * one task per partition regardless of data). ~50k input rows per state
    * partition, floor 2, capped at the session default so a deployment
    * whose input warrants it keeps its configured parallelism.
    *
    * Also scopes OFF checkpoint-file checksums: the 4.1 checksum manager
    * writes a sidecar per checkpoint file and its per-query thread pool
    * stalls up to 500 ms at close ("Thread pool did not shutdown after
    * 500 ms" in the r14 baseline log). Corruption detection adds nothing
    * to a single-run replay over a throwaway local checkpoint; durable
    * production checkpoints keep the default. */
  def withReplayPartitions[T](s: SparkSession, inputRows: Long)(body: SparkSession => T): T = {
    // The scope runs on a CLONED session (r15, r14 VERDICT #8): the r14
    // version mutated the SHARED session conf and restored it in a finally
    // — correct single-threaded, but a concurrent query on the same session
    // could observe the replay-sized values. The clone shares the
    // SparkContext and cache but owns its conf; the body must build its
    // stream from the session it receives (streaming snapshots the conf at
    // query start from the stream's own session). The clone — and its
    // scoped conf — is discarded with the scope; nothing to restore.
    val scoped = org.apache.spark.sql.graft.Sessions.cloneSession(s)
    val n = math.max(2L,
      math.min(s.conf.get("spark.sql.shuffle.partitions").toLong, inputRows / 50000L + 1L))
    scoped.conf.set("spark.sql.shuffle.partitions", n.toString)
    scoped.conf.set("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
    body(scoped)
  }
}
