package graft

import org.apache.spark.sql.functions._

import graft.operators.Bucketing
import graft.queries.Tables

/** Bucketed-layout guarantees: the write-once shuffle buys (a) an
  * exchange-free sort-merge join on the bucket key and (b) bucket pruning
  * for point filters — and the layout never changes query RESULTS. */
class BucketingSpec extends SparkSpec {

  private lazy val tmp = java.nio.file.Files.createTempDirectory("graft-bkt-spec").toString

  private def writeBoth(): Unit = {
    Bucketing.writeBucketed(
      Tables.tbl(spark, sfDir, "documents").select("doc_id", "lang", "source"),
      tmp + "/docs", "graft_spec_bkt_docs", "doc_id", buckets = 8)
    Bucketing.writeBucketed(
      Tables.tbl(spark, sfDir, "embeddings").select("vec_id", "label"),
      tmp + "/emb", "graft_spec_bkt_emb", "vec_id", buckets = 8)
  }

  test("colocated join matches the plain join exactly") {
    writeBoth()
    val got = Bucketing.colocatedJoin(spark,
        "graft_spec_bkt_docs", "graft_spec_bkt_emb", "doc_id", "vec_id")
      .select("doc_id", "lang", "label")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).sorted.toSeq
    val d = Tables.tbl(spark, sfDir, "documents")
    val e = Tables.tbl(spark, sfDir, "embeddings")
    val want = d.join(e, d("doc_id") === e("vec_id"))
      .select("doc_id", "lang", "label")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).sorted.toSeq
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("colocated join plans with zero Exchange on either side") {
    writeBoth()
    val p = Bucketing.colocatedJoin(spark,
        "graft_spec_bkt_docs", "graft_spec_bkt_emb", "doc_id", "vec_id")
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"bucketed join still shuffles:\n$p")
    assert(p.contains("SortMergeJoin"), s"merge hint lost:\n$p")
  }

  test("point filter on the bucket key prunes to one bucket") {
    writeBoth()
    // autoBucketedScan=true (the default) DISABLES bucketed reading for
    // queries that don't exploit the distribution (joins/aggs) to regain
    // split parallelism — so point-lookup bucket pruning needs it off
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try {
      val p = spark.table("graft_spec_bkt_docs").where(col("doc_id") === 7L)
        .queryExecution.executedPlan.toString
      assert(p.contains("SelectedBucketsCount: 1 out of 8"),
        s"bucket pruning missing from the scan:\n$p")
    } finally
      spark.conf.unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")
  }

  test("a failed replacement write leaves the serving table intact") {
    writeBoth()
    val before = spark.table("graft_spec_bkt_docs").count()
    assert(before > 0)
    val bad = Tables.tbl(spark, sfDir, "documents")
      .select("doc_id", "lang", "source")
      .withColumn("boom", expr("assert_true(doc_id < 0)"))
    intercept[Exception] {
      Bucketing.writeBucketed(bad, tmp + "/docs", "graft_spec_bkt_docs", "doc_id", 8)
    }
    assert(spark.table("graft_spec_bkt_docs").count() === before)
  }

  test("a failed replacement write cleans up its staging table and files") {
    writeBoth()
    val bad = Tables.tbl(spark, sfDir, "documents")
      .select("doc_id", "lang", "source")
      .withColumn("boom", expr("assert_true(doc_id < 0)"))
    intercept[Exception] {
      Bucketing.writeBucketed(bad, tmp + "/docs", "graft_spec_bkt_docs", "doc_id", 8)
    }
    val staged = spark.catalog.listTables()
      .filter(col("name").startsWith("graft_spec_bkt_docs__staging_")).count()
    assert(staged === 0, "staging table leaked after a failed write")
  }

  test("replacing a table whose location IS the parent path keeps the new data") {
    // a table written by an older layout (location = path itself, which
    // CONTAINS the fresh b<stamp> dir) must not be deleted out from under
    // the new data during the post-swap cleanup
    val path = tmp + "/legacy"
    val d = Tables.tbl(spark, sfDir, "documents").select("doc_id", "lang", "source")
    d.write.format("parquet").option("path", path)
      .bucketBy(8, "doc_id").sortBy("doc_id").saveAsTable("graft_spec_bkt_legacy")
    val before = spark.table("graft_spec_bkt_legacy").count()
    assert(before > 0)
    Bucketing.writeBucketed(d, path, "graft_spec_bkt_legacy", "doc_id", buckets = 8)
    assert(spark.table("graft_spec_bkt_legacy").count() === before)
  }

  test("contract errors: bad bucket count, missing key") {
    val d = Tables.tbl(spark, sfDir, "documents")
    intercept[IllegalArgumentException] {
      Bucketing.writeBucketed(d, tmp + "/x", "graft_spec_bkt_x", "doc_id", buckets = 0)
    }
    intercept[IllegalArgumentException] {
      Bucketing.writeBucketed(d, tmp + "/x", "graft_spec_bkt_x", "nope", buckets = 4)
    }
  }
}
