package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Each entry in [[queries]] is one operator from SURVEY.md §2 (or a
  * training-pipeline extension); [[oracleSql]] carries the DuckDB-equivalent
  * SQL for the driver's correctness gate. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("flat_scan_cosine")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    VectorSearchQueries.queries ++
      FilterSearchQueries.queries ++
      QuantizedQueries.queries ++
      PersistenceQueries.queries ++
      PipelineQueries.queries ++
      RetrievalQueries.queries ++
      LifecycleQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  lazy val oracleSql: Map[String, String] =
    VectorSearchQueries.oracles ++
      FilterSearchQueries.oracles ++
      QuantizedQueries.oracles ++
      PersistenceQueries.oracles ++
      PipelineQueries.oracles ++
      RetrievalQueries.oracles ++
      LifecycleQueries.oracles
}
