package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

object Tables {
  /** Load one driver-provided TESTDATA table (TESTDATA.md). */
  def tbl(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")
}
