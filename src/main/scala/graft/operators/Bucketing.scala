package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed table layout: pay the partitioning shuffle ONCE at write time,
  * then every equi-join / aggregation on the bucket key runs exchange-free.
  *
  * The 100 TB rationale: a fact table that is joined on the same key by
  * every downstream query (doc_id, user_id, …) re-shuffles its full volume
  * per query under the default layout. Hash-bucketing the files at ingest
  * (`bucketBy` + `sortBy`) records the partitioning in the table spec, so
  * Catalyst plans a sort-merge join with NO Exchange on either bucketed
  * side — and a point filter on the bucket key prunes to 1/n of the files
  * before the scan ("SelectedBucketsCount" in the plan). This is the batch
  * analog of the reference's shard-by-hash placement
  * (root_layer/edge-lite shard hash, FNV-1a mod 16): co-locate once,
  * query forever.
  *
  * Bucket-count choice at scale: buckets are the join's parallelism ceiling
  * (one task per bucket), so size them like shuffle partitions — corpus
  * bytes / target partition size, rounded to a power of two; both sides of
  * a co-located join must agree (Spark requires equal counts; v2 bucketing
  * relaxes to multiples).
  *
  * Operational note: `spark.sql.sources.bucketing.autoBucketedScan.enabled`
  * (default true) turns bucketed reading OFF for queries that don't exploit
  * the distribution, trading bucket-pruning for file-split parallelism —
  * point lookups that should prune to one bucket need it set to false.
  */
object Bucketing {

  /** Write `df` as an external parquet table hash-bucketed (and per-bucket
    * sorted) on `key`, replacing any previous table of the same name. The
    * sort makes the merge-join side streamable with no per-query Sort.
    *
    * Stage-then-swap (the GraftCatalog.flush discipline): the replacement
    * is FULLY written under a fresh subdir and a staging table name before
    * the serving catalog entry is touched, so a failed write (disk full,
    * executor loss, bad expression) cannot destroy the table downstream
    * joins are using; the previous data directory is removed only after
    * the swap succeeds. */
  def writeBucketed(df: DataFrame, path: String, table: String, key: String,
                    buckets: Int): Unit = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    require(df.columns.contains(key),
      s"bucket key '$key' not in columns (${df.columns.mkString(", ")})")
    val spark = df.sparkSession
    val stamp = java.util.UUID.randomUUID().toString.take(8)
    val dataDir = s"$path/b$stamp"
    val staged = s"${table}__staging_$stamp"
    val prevLoc = if (spark.catalog.tableExists(table)) tableLocation(spark, table) else None
    try {
      df.write.format("parquet").option("path", dataDir)
        .bucketBy(buckets, key).sortBy(key)
        .saveAsTable(staged)
    } catch {
      case e: Throwable =>
        // failed mid-stage: drop the staging entry and its partial files so
        // retries don't accumulate catalog/disk garbage (flush discipline)
        spark.sql(s"DROP TABLE IF EXISTS `$staged`")
        val p = new org.apache.hadoop.fs.Path(dataDir)
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (fs.exists(p)) fs.delete(p, true)
        throw e
    }
    // swap: catalog-only operations; the old data stays readable until here
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    spark.sql(s"ALTER TABLE `$staged` RENAME TO `$table`")
    prevLoc.foreach { loc =>
      val fsConf = spark.sparkContext.hadoopConfiguration
      val newPath = new org.apache.hadoop.fs.Path(dataDir)
      val newFs = newPath.getFileSystem(fsConf)
      val newQ = newFs.makeQualified(newPath)
      val prevPath = new org.apache.hadoop.fs.Path(loc)
      val prevFs = prevPath.getFileSystem(fsConf)
      val prevQ = prevFs.makeQualified(prevPath)
      // Never delete the new data: compare QUALIFIED URIs (the catalog
      // reports a file: URI, the caller passes a raw path) and skip any
      // previous location that equals OR is an ancestor of the fresh
      // dataDir — a table written by an older layout may sit at `path`
      // itself, which contains `path/b<stamp>`.
      val isAncestorOfNew =
        Iterator.iterate(newQ)(_.getParent).takeWhile(_ != null).contains(prevQ)
      if (!isAncestorOfNew && prevFs.exists(prevQ)) prevFs.delete(prevQ, true)
    }
  }

  /** The external location of `table` (DESCRIBE FORMATTED's Location row). */
  private def tableLocation(spark: SparkSession, table: String): Option[String] =
    spark.sql(s"DESCRIBE FORMATTED `$table`").collect()
      .find(r => Option(r.getString(0)).exists(_.trim == "Location"))
      .map(_.getString(1).trim)

  /** Equi-join two bucketed tables on their bucket keys. The merge hint
    * keeps the planner on sort-merge (a broadcast pick would hide the
    * layout's point); with matching bucket specs the executed plan has no
    * Exchange — asserted by BucketingSpec. */
  def colocatedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                    leftKey: String, rightKey: String): DataFrame = {
    val l = spark.table(leftTable)
    val r = spark.table(rightTable)
    l.hint("merge").join(r, l(leftKey) === r(rightKey))
  }
}
