package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-stream operators (SURVEY.md §2.9 Spark mapping): watermarked
  * event-time windows, gap-based session windows, and keyed custom state via
  * flatMapGroupsWithState. The reference has no windowed aggregation — these
  * are the training-pipeline extensions the §2.9 mapping calls for, built on
  * the same engine surface (each single-aggregation operator works
  * identically over `read` and `readStream` inputs — the watermark only
  * matters for the streaming case; [[sessionStats]]' per-user rollup is the
  * one batch-only composition, see its doc).
  *
  * Scale: windowed/session aggregation is one shuffle keyed by
  * (window/user); state in [[statefulLww]] is per-key and bounded (one row),
  * managed by the state store — the mapGroupsWithState shape that holds at
  * millions of keys.
  */
object EventStream {

  /** Event-time tumbling-window aggregation; `watermarkDelay` bounds late
    * data (streaming only — ignored by batch plans). */
  def windowedAgg(events: DataFrame, windowDur: String,
                  watermarkDelay: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowDur).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 6).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"), col("sum_value"))

  /** Per-(user, session) gap-based sessionization (a session closes when
    * the next event is >= gap after the last) — the streaming-legal single
    * aggregation: append mode needs the watermark to finalize sessions
    * (a no-op for batch inputs). One row per closed session. */
  def sessionWindows(events: DataFrame, gap: String, userCol: String = "user_id",
                     watermarkDelay: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermarkDelay)
      .groupBy(session_window(col("ts"), gap).as("s"), col(userCol))
      .agg(count(lit(1)).as("n_in_session"))
      .select(col(userCol), col("s.start").as("session_start"),
        col("s.end").as("session_end"), col("n_in_session"))

  /** Per-user rollup of [[sessionWindows]]: session count + event count.
    * BATCH-ONLY: the second, unwindowed aggregation is a chained streaming
    * aggregation Spark rejects in every output mode — for streams, run
    * [[sessionWindows]] and roll up per-session rows downstream. */
  def sessionStats(events: DataFrame, gap: String, userCol: String = "user_id"): DataFrame =
    sessionWindows(events, gap, userCol)
      .groupBy(col(userCol))
      .agg(count(lit(1)).as("n_sessions"), sum("n_in_session").as("n_events"))

  /** One change-feed row (same log schema as [[ChangeFeed]]). */
  case class ChangeRow(op: String, id: String, version: Long, payload: String)

  /** Per-key LWW winner held as explicit state. */
  case class KeyState(op: String, version: Long, payload: String)

  /** LWW via keyed custom state (flatMapGroupsWithState): every micro-batch
    * updates each touched key's winner and emits it — the per-key state
    * formulation of [[ChangeFeed.fold]]'s relational merge, for consumers
    * that want a continuous update stream rather than folded snapshots.
    * Deletes remain tombstoned in state (same no-resurrection guarantee).
    * Version ties break on op ("put" > "del"), matching
    * [[graft.operators.Mutations.latestByKey]] so both paths converge to the
    * same winner; ties equal on (version, op) assume identical payloads. */
  def statefulLww(changes: Dataset[ChangeRow]): Dataset[(String, KeyState)] = {
    import changes.sparkSession.implicits._
    changes.groupByKey(_.id)
      .flatMapGroupsWithState[KeyState, (String, KeyState)](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (id: String, rows: Iterator[ChangeRow], state: GroupState[KeyState]) =>
          val candidates = state.getOption.iterator ++
            rows.map(r => KeyState(r.op, r.version, r.payload))
          val winner = candidates.maxBy(s => (s.version, s.op))
          state.update(winner)
          Iterator((id, winner))
      }
  }
}
