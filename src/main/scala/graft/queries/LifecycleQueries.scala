package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.FilterExpr
import graft.collection._
import graft.streaming.ChangeFeed

/** Lifecycle + change-log operators through the correctness gate — the
  * round-2 sbt-only stragglers (S9 WAL replay, S10 versioning/vacuum, S11
  * change-feed LWW, F10/F11 id + shard hashing), each with a full DuckDB
  * oracle.
  *
  * The change log is built deterministically from `embeddings` IN-QUERY
  * (base puts v1, re-puts v2 on every 3rd key, deletes v3 on every 5th,
  * same-version delete ties on every 11th), so the oracle reconstructs the
  * identical log in SQL and replays it with a window — the tie rows pin the
  * deterministic (version, op) LWW ordering cross-engine.
  */
object LifecycleQueries {
  import Tables.tbl

  private def emb(s: SparkSession, dir: String): DataFrame = tbl(s, dir, "embeddings")

  /** (op, id, version, label[, vector]) change log. Ties: every 11th key
    * gets a delete at the SAME version as its base put — put must win. */
  private def changeLog(e: DataFrame, withVector: Boolean): DataFrame = {
    val id = col("vec_id").cast("string").as("id")
    def entry(op: String, version: Long, label: org.apache.spark.sql.Column) = {
      val base = Seq(lit(op).as("op"), id, lit(version).as("version"),
        label.cast("long").as("label"))
      if (withVector) base :+ col("embedding").as("vector") else base
    }
    e.select(entry("put", 1L, col("label")): _*)
      .unionByName(e.where(col("vec_id") % 3 === 0).select(entry("put", 2L, col("label") + 100): _*))
      .unionByName(e.where(col("vec_id") % 5 === 0).select(entry("del", 3L, lit(0L)): _*))
      .unionByName(e.where(col("vec_id") % 11 === 0).select(entry("del", 1L, lit(0L)): _*))
  }

  /** Shared oracle CTE: the same log + windowed LWW (version DESC, op DESC
    * — 'put' > 'del' breaks ties exactly like the engine's max_by struct). */
  private val logLwwSql =
    """log AS (
      |  SELECT 'put' AS op, CAST(vec_id AS VARCHAR) AS id, 1 AS version,
      |    CAST(label AS BIGINT) AS label FROM embeddings
      |  UNION ALL SELECT 'put', CAST(vec_id AS VARCHAR), 2, CAST(label + 100 AS BIGINT)
      |    FROM embeddings WHERE vec_id % 3 = 0
      |  UNION ALL SELECT 'del', CAST(vec_id AS VARCHAR), 3, 0
      |    FROM embeddings WHERE vec_id % 5 = 0
      |  UNION ALL SELECT 'del', CAST(vec_id AS VARCHAR), 1, 0
      |    FROM embeddings WHERE vec_id % 11 = 0),
      |w AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY id
      |        ORDER BY version DESC, op DESC) AS rn FROM log)""".stripMargin

  /** FNV-1a 64 of a VARCHAR expr in DuckDB HUGEINT mod-2^64 arithmetic
    * (same formulation as the SimHash oracle, over the string's bytes). */
  private def fnvSql(v: String): String =
    s"""list_reduce(
       | list_prepend(CAST('14695981039346656037' AS HUGEINT),
       |  list_transform(range(0, octet_length(CAST($v AS BLOB))),
       |   i -> CAST((strpos('0123456789ABCDEF', substr(hex(CAST($v AS BLOB)), 2*i+1, 1)) - 1) * 16
       |           + (strpos('0123456789ABCDEF', substr(hex(CAST($v AS BLOB)), 2*i+2, 1)) - 1) AS HUGEINT))),
       | (acc, b) -> (xor(acc, b) * 1099511628211) % CAST('18446744073709551616' AS HUGEINT))""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // S9 WAL replay: fold the change log into an (empty) loaded collection
    // via applyChanges — put winners validated+upserted, delete winners
    // anti-joined — then report per-label survivor stats.
    "wal_replay" -> ((s, dir) => {
      val e = emb(s, dir)
      val dim = e.select("embedding").head().getSeq[Float](0).length
      val cat = new GraftCatalog(s, graft.TempRoots.create("graft-wal").toString)
      cat.createCollection(CollectionMeta("wal", dim = dim, distance = "euclidean",
        fields = Seq(
          IndexField("id", "string", primaryKey = true),
          IndexField("label", "integer"))))
      cat.loadCollection("wal")
      cat.applyChanges("wal", changeLog(e, withVector = true), "version")
      cat.resident("wal")
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n"), min("id").as("id_min"), max("id").as("id_max"))
        .orderBy("label")
    }),
    // S11 batch semantics of the change feed: LWW over the whole log at
    // once (the state every streamed fold converges to), tombstones hidden.
    "lww_change_feed" -> ((s, dir) =>
      ChangeFeed.batchApply(changeLog(emb(s, dir), withVector = false), "id", "version")
        .orderBy("id")),
    // Multi-leader replication bus (the JetStream LWW intent): three
    // leaders write concurrently — same-version put/put conflicts resolve
    // by origin priority, put/del ties by op — and the merged view is the
    // unique fixpoint every delivery order converges to (ChangeFeedSpec
    // pins commutativity/idempotence; here the winners themselves are
    // oracle-checked).
    "replica_merge" -> ((s, dir) => {
      val e = emb(s, dir)
      val id = col("vec_id").cast("string").as("id")
      def entry(op: String, version: Long, label: org.apache.spark.sql.Column) =
        Seq(lit(op).as("op"), id, lit(version).as("version"), label.cast("long").as("label"))
      val a = e.select(entry("put", 1L, col("label")): _*)
        .unionByName(e.where(col("vec_id") % 5 === 0).select(entry("del", 3L, lit(0L)): _*))
      val b = e.where(col("vec_id") % 3 === 0).select(entry("put", 2L, col("label") + 100): _*)
        .unionByName(e.where(col("vec_id") % 7 === 0).select(entry("put", 3L, col("label") + 200): _*))
      val c = e.where(col("vec_id") % 7 === 0).select(entry("put", 3L, col("label") + 300): _*)
        .unionByName(e.where(col("vec_id") % 9 === 0).select(entry("del", 2L, lit(0L)): _*))
      ChangeFeed.view(ChangeFeed.mergeLeaders(
          Seq("a" -> a, "b" -> b, "c" -> c), "id", "version"))
        .orderBy("id")
    }),
    // S10 versioning lifecycle: three flushed versions, a time-travel read
    // of v1, vacuum keepLast=1 — removed ids + surviving version/row count.
    "vacuum_versions" -> ((s, dir) => {
      val e = emb(s, dir)
      val dim = e.select("embedding").head().getSeq[Float](0).length
      val cat = new GraftCatalog(s, graft.TempRoots.create("graft-vac").toString)
      cat.createCollection(CollectionMeta("vac", dim = dim, distance = "euclidean",
        fields = Seq(
          IndexField("id", "string", primaryKey = true),
          IndexField("label", "integer")),
        versioning = true))
      cat.loadCollection("vac")
      def slice(cond: org.apache.spark.sql.Column) = e.where(cond).select(
        col("vec_id").cast("string").as("id"), col("label"), col("embedding").as("vector"))
      cat.insert("vac", slice(col("vec_id") < 100)); cat.flush("vac")
      cat.insert("vac", slice(col("vec_id") >= 50 && col("vec_id") < 150)); cat.flush("vac")
      cat.delete("vac", FilterExpr.Single("label", FilterExpr.Gte, 5L)); cat.flush("vac")
      val v1Rows = cat.timeTravel("vac", 1).count()
      val removed = cat.vacuum("vac", keepLast = 1)
      val keptRows = cat.snapshot("vac").count()
      import s.implicits._
      Seq((removed.mkString(","), v1Rows, cat.getMeta("vac").currentVersion, keptRows))
        .toDF("removed_versions", "n_rows_v1", "kept_version", "n_rows_kept")
    }),
    // F10/F11: replayable FNV-1a ids + reference-parity shard routing
    // (16-way low-bit mask) — per-shard count, distinct ids, id extremes.
    "stable_ids" -> ((s, dir) => {
      val h = graft.functions.fnv64(col("vec_id").cast("string"))
      emb(s, dir).select(h.as("fid"),
          graft.functions.fnv_shard(col("vec_id").cast("string"), 16).as("shard"))
        .groupBy("shard")
        .agg(count(lit(1)).as("n"), countDistinct("fid").as("n_ids"),
          min("fid").as("id_min"), max("fid").as("id_max"))
        .orderBy("shard")
    })
  )

  val oracles: Map[String, String] = Map(
    "wal_replay" ->
      s"""WITH $logLwwSql
         |SELECT label, COUNT(*) AS n, MIN(id) AS id_min, MAX(id) AS id_max
         |FROM w WHERE rn = 1 AND op = 'put'
         |GROUP BY label ORDER BY label""".stripMargin,
    "lww_change_feed" ->
      s"""WITH $logLwwSql
         |SELECT id, CAST(version AS BIGINT) AS version, label
         |FROM w WHERE rn = 1 AND op = 'put' ORDER BY id""".stripMargin,
    "replica_merge" ->
      """WITH log AS (
        |  SELECT 'put' AS op, CAST(vec_id AS VARCHAR) AS id, 1 AS version,
        |    CAST(label AS BIGINT) AS label, 'a' AS origin FROM embeddings
        |  UNION ALL SELECT 'del', CAST(vec_id AS VARCHAR), 3, 0, 'a'
        |    FROM embeddings WHERE vec_id % 5 = 0
        |  UNION ALL SELECT 'put', CAST(vec_id AS VARCHAR), 2, CAST(label + 100 AS BIGINT), 'b'
        |    FROM embeddings WHERE vec_id % 3 = 0
        |  UNION ALL SELECT 'put', CAST(vec_id AS VARCHAR), 3, CAST(label + 200 AS BIGINT), 'b'
        |    FROM embeddings WHERE vec_id % 7 = 0
        |  UNION ALL SELECT 'put', CAST(vec_id AS VARCHAR), 3, CAST(label + 300 AS BIGINT), 'c'
        |    FROM embeddings WHERE vec_id % 7 = 0
        |  UNION ALL SELECT 'del', CAST(vec_id AS VARCHAR), 2, 0, 'c'
        |    FROM embeddings WHERE vec_id % 9 = 0),
        |w AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY id
        |        ORDER BY version DESC, op DESC, origin DESC) AS rn FROM log)
        |SELECT id, CAST(version AS BIGINT) AS version, label, origin
        |FROM w WHERE rn = 1 AND op = 'put' ORDER BY id""".stripMargin,
    "vacuum_versions" ->
      """SELECT '1,2' AS removed_versions,
        |  (SELECT COUNT(*) FROM embeddings WHERE vec_id < 100) AS n_rows_v1,
        |  3 AS kept_version,
        |  (SELECT COUNT(*) FROM embeddings WHERE vec_id < 150 AND label < 5) AS n_rows_kept""".stripMargin,
    "stable_ids" ->
      s"""WITH h AS (SELECT ${fnvSql("CAST(vec_id AS VARCHAR)")} AS hu FROM embeddings),
         |ids AS (SELECT CAST(hu % 16 AS BIGINT) AS shard,
         |  CAST(CASE WHEN hu >= CAST('9223372036854775808' AS HUGEINT)
         |    THEN hu - CAST('18446744073709551616' AS HUGEINT) ELSE hu END AS BIGINT) AS fid
         |  FROM h)
         |SELECT shard, COUNT(*) AS n, COUNT(DISTINCT fid) AS n_ids,
         |  MIN(fid) AS id_min, MAX(fid) AS id_max
         |FROM ids GROUP BY shard ORDER BY shard""".stripMargin
  )
}
