package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.RangeJoin

/** Binned range join contracts: pair-exact equivalence with the naive
  * theta-join (the executable spec), exactly-once matching across bucket
  * boundaries, the loud oversized-interval guard, and the no-nested-loop
  * plan shape that is the operator's reason to exist. */
class RangeJoinSpec extends SparkSpec {

  import spark.implicits._

  // deterministic fixture: 400 points, 60 intervals of varying width,
  // 8 keys; widths straddle 1..6 buckets at bucketWidth=50
  private lazy val points: DataFrame = spark.range(0, 400)
    .select((col("id") % 8).as("k"), (xxhash64(col("id")) % 1000).as("t"),
      col("id").as("pid"))
  private lazy val intervals: DataFrame = spark.range(0, 60)
    .select((col("id") % 8).as("k"),
      (xxhash64(col("id"), lit(1)) % 900).as("s"), col("id").as("iid"))
    .withColumn("e", col("s") + pmod(xxhash64(col("iid"), lit(2)), lit(300)))

  private def thetaPairs: Set[(Long, Long)] =
    points.as("p").join(intervals.as("i"),
        col("p.k") === col("i.k") && col("p.t") >= col("i.s") && col("p.t") <= col("i.e"))
      .select(col("pid"), col("iid")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("pair set == naive theta-join, each pair exactly once") {
    val binned = RangeJoin.join(points, intervals, "k", "t", "s", "e", bucketWidth = 50L)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(binned.length === binned.toSet.size, "duplicate pairs from bucket explode")
    assert(binned.toSet === thetaPairs)
  }

  test("bucket width does not change the result (fan-out/selectivity dial only)") {
    for (w <- Seq(7L, 100L, 5000L)) {
      val got = RangeJoin.join(points, intervals, "k", "t", "s", "e", bucketWidth = w)
        .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === thetaPairs, s"bucketWidth=$w")
    }
  }

  test("negative domains bucket correctly (floor, not truncate-toward-zero)") {
    val p = Seq((1L, -75L, 1L), (1L, -25L, 2L), (1L, 25L, 3L)).toDF("k", "t", "pid")
    val iv = Seq((1L, -80L, -20L, 10L)).toDF("k", "s", "e", "iid")
    val got = RangeJoin.join(p, iv, "k", "t", "s", "e", bucketWidth = 50L)
      .select("pid").collect().map(_.getLong(0)).toSet
    assert(got === Set(1L, 2L))
  }

  test("interval spanning more than maxBucketsPerInterval fails loudly") {
    val p = Seq((1L, 5L, 1L)).toDF("k", "t", "pid")
    val iv = Seq((1L, 0L, 10000L, 10L)).toDF("k", "s", "e", "iid")
    val ex = intercept[Exception](
      RangeJoin.join(p, iv, "k", "t", "s", "e", bucketWidth = 10L,
        maxBucketsPerInterval = 100).collect())
    assert(ex.getMessage.contains("range_join"), s"got: ${ex.getMessage}")
  }

  test("inverted interval (end < start) matches nothing — and cannot bypass the span guard") {
    // sequence(bs, be) DESCENDS when bs > be: an inverted dirty row used to
    // sail past the span guard (negative span) and explode |span| buckets
    val p = Seq((1L, 5L, 1L)).toDF("k", "t", "pid")
    val iv = Seq(
      (1L, 0L, 10L, 10L),            // normal: matches the point
      (1L, 1000000000000L, 0L, 11L), // inverted, astronomically wide
      (1L, 7L, 3L, 12L)              // inverted, small
    ).toDF("k", "s", "e", "iid")
    val got = RangeJoin.join(p, iv, "k", "t", "s", "e", bucketWidth = 10L,
        maxBucketsPerInterval = 100)
      .select("iid").collect().map(_.getLong(0)).toSet
    assert(got === Set(10L))
  }

  test("column collisions are rejected up front") {
    val iv = intervals.withColumnRenamed("iid", "pid")
    val ex = intercept[IllegalArgumentException](
      RangeJoin.join(points, iv, "k", "t", "s", "e", bucketWidth = 50L))
    assert(ex.getMessage.contains("collision"))
  }

  test("plan shape: hash equi-join, no nested loop / cartesian") {
    val plan = RangeJoin.join(points, intervals, "k", "t", "s", "e", bucketWidth = 50L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.linesIterator.take(5).mkString("\n"))
    assert(!plan.contains("CartesianProduct"), plan.linesIterator.take(5).mkString("\n"))
  }
}
