package graft

import java.nio.file.Files

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.dedup.Dedup
import graft.streaming.StreamingDedup

/** Streaming exact dedup: first-arrival-wins across micro-batches, same
  * surviving content set as the batch min-id dedup. */
class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  test("cross-micro-batch duplicates are dropped; content set equals batch dedup") {
    val dir = Files.createTempDirectory("graft-sdedup").toString
    val ckpt = Files.createTempDirectory("graft-sdedup-ckpt").toString
    // two files -> two micro-batches (maxFilesPerTrigger=1); the re-crawl
    // file repeats batch-1 content under new ids
    Seq((1L, "alpha content"), (2L, "beta content"), (3L, "alpha content"))
      .toDF("doc_id", "text").coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(dir + "/f1")
    Seq((11L, "alpha content"), (12L, "gamma content"), (13L, "beta content"))
      .toDF("doc_id", "text").coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(dir + "/f2")
    val all = spark.read.parquet(dir + "/f1", dir + "/f2")
    val schema = all.schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(dir + "/*")
    val q = StreamingDedup.dropExactDuplicates(stream, "text").writeStream
      .format("memory").queryName("sdedup")
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append()).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("sdedup")
    // one survivor per distinct content, even across micro-batches
    assert(streamed.count() === 3L)
    val streamedTexts = streamed.select("text").collect().map(_.getString(0)).toSet
    val batchTexts = Dedup.dropExactDuplicates(all, "doc_id", "text")
      .select("text").collect().map(_.getString(0)).toSet
    assert(streamedTexts === batchTexts)
  }

  test("signature near-dup guard: exact + signature-identical rewrites dropped across batches") {
    val dir = Files.createTempDirectory("graft-sndup").toString
    val ckpt = Files.createTempDirectory("graft-sndup-ckpt").toString
    val base = (0 until 40).map(i => s"tok$i").mkString(" ")
    Seq((1L, base), (2L, "totally different little text here"))
      .toDF("doc_id", "text").coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(dir + "/f1")
    // batch 2: an exact re-crawl + an unrelated doc; the exact copy shares
    // the full signature and must be dropped, the unrelated doc survives
    Seq((11L, base), (12L, "another unrelated document entirely"))
      .toDF("doc_id", "text").coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(dir + "/f2")
    val schema = spark.read.parquet(dir + "/f1").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(dir + "/*")
    val q = StreamingDedup.dropSignatureDuplicates(stream, "text").writeStream
      .format("memory").queryName("sndup")
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append()).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val survivors = spark.table("sndup").select("doc_id").collect().map(_.getLong(0)).toSet
    assert(survivors === Set(1L, 2L, 12L), s"got $survivors")
    // output schema is clean: no signature scratch columns
    assert(spark.table("sndup").columns.toSeq === Seq("doc_id", "text"))
  }

  test("watermark-bounded dedup: duplicates within the delay dropped, state evictable") {
    val dir = Files.createTempDirectory("graft-sdedup-wm").toString
    val ckpt = Files.createTempDirectory("graft-sdedup-wm-ckpt").toString
    Seq(
      (1L, "2024-01-01 00:00:00", "dup text"),
      (2L, "2024-01-01 00:01:00", "dup text"), // within delay -> dropped
      (3L, "2024-01-01 00:02:00", "other text")
    ).toDF("doc_id", "ts_s", "text")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema).parquet(dir)
    val q = StreamingDedup
      .dropExactDuplicatesWithinWatermark(stream, "text", "ts", "10 minutes")
      .writeStream.format("memory").queryName("sdedup_wm")
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append()).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val out = spark.table("sdedup_wm").select("doc_id").collect().map(_.getLong(0)).toSet
    assert(out === Set(1L, 3L))
  }
}
