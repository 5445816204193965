package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.FilterExpr

/** Snapshot-level mutations (SURVEY.md §2.3 J3 upsert, §2.2 P5 delete).
  *
  * The reference mutates in-memory maps row-at-a-time; the Spark-native shape
  * is a declarative rewrite of the collection snapshot (what Delta MERGE /
  * DELETE compile to — Delta itself isn't on the classpath in this build, so
  * the engine expresses the same plans directly).
  *
  * Scale notes: `upsert` is an anti-join on the primary key — with updates ≪
  * base (the normal case) Catalyst/AQE broadcasts the update side, so the
  * base table is a single pushed-down scan with no shuffle. `deleteWhere` is
  * a pure filter — file-skipping prunes untouched partitions.
  */
object Mutations {

  /** MERGE semantics keyed by `pk`: rows of `updates` replace base rows with
    * the same key, new keys are inserted (edge upsert path,
    * /root/reference/edge/none_vectorstore.go:67-85). Last-writer-wins within
    * `updates` is the caller's responsibility (or use [[latestByKey]]). */
  def upsert(base: DataFrame, updates: DataFrame, pk: String): DataFrame =
    base.join(updates.select(col(pk)), Seq(pk), "left_anti").unionByName(updates)

  /** Delete rows matching a (typically conjunctive-EQ) filter
    * (/root/reference/edge/none_vectorstore.go:105-127); returns survivors.
    *
    * A row is deleted only when the predicate is STRICTLY TRUE: on rows where
    * it evaluates to NULL (a nullable column holding NULL, a map missing the
    * key) `where(!pred)` would silently drop the row too — `<=> true` keeps
    * it, matching the bitmap index's "absent key = no postings = no match". */
  def deleteWhere(df: DataFrame, filter: FilterExpr): DataFrame =
    df.where(!(filter.toColumn <=> lit(true)))

  /** Delete by explicit key set (core Delete RPC path,
    * /root/reference/core/core.go:537-565): anti-join on the pk — the small
    * key side broadcasts, the base stays a single scan. */
  def deleteByKeys(base: DataFrame, keys: DataFrame, pk: String): DataFrame =
    base.join(keys.select(col(pk)), Seq(pk), "left_anti")

  /** Last-writer-wins compaction of a change feed: keep, per key, the row
    * with the highest version/timestamp column — the JetStream LWW
    * replication semantics of the reference's README (SURVEY.md §2.9),
    * expressed as max_by aggregation (no window, single shuffle on pk).
    *
    * Version ties break deterministically on the `op` column when present
    * ("put" > "del" — an equal-version put/delete pair resolves to the put on
    * every path, batch or streamed), then on any extra `tiebreaks` columns
    * (e.g. a replica origin id — see [[graft.streaming.ChangeFeed.mergeLeaders]]).
    * Rows equal on the full ordering but differing elsewhere have no defined
    * winner: LWW convergence assumes the ordering identifies writes; give
    * concurrent writers distinct versions or a distinguishing tiebreak. */
  def latestByKey(changes: DataFrame, pk: String, versionCol: String): DataFrame =
    latestByKey(changes, pk, versionCol,
      Seq("op").filter(changes.columns.contains(_)))

  /** [[latestByKey]] with an explicit version-tie ordering suffix. */
  def latestByKey(changes: DataFrame, pk: String, versionCol: String,
                  tiebreaks: Seq[String]): DataFrame = {
    val cols = changes.columns.filter(c => c != pk)
    val ord = struct((versionCol +: tiebreaks).map(col): _*)
    changes.groupBy(col(pk))
      .agg(max_by(struct(cols.map(col).toIndexedSeq: _*), ord).as("_latest"))
      .select(col(pk) +: cols.map(c => col(s"_latest.$c").as(c)).toIndexedSeq: _*)
  }
}
