package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (range-containment) join: pair each point row with every
  * interval row of the same key whose `[start, end]` contains the point —
  * the "events inside maintenance windows / sessions / validity ranges"
  * primitive.
  *
  * Spark-first shape: NOT a `(key = key AND start ≤ t AND t ≤ end)`
  * theta-join — Catalyst executes that as a per-key nested loop (or worse,
  * BroadcastNestedLoop), quadratic in the key's row count. Instead time is
  * binned into fixed-width buckets: each interval row is exploded to the
  * buckets it covers (bounded fan-out = its span in buckets), each point
  * belongs to exactly ONE bucket, and the join becomes a hash equi-join on
  * `(key, bucket)` with a residual containment filter. Because a point's
  * bucket is unique and an interval appears once per covered bucket, every
  * qualifying pair is produced EXACTLY once — no distinct pass. One shuffle
  * keyed by (key, bucket); skew is bounded by bucket width, and the plan
  * scales like any equi-join at 100 TB.
  *
  * `bucketWidth` tunes fan-out vs selectivity: pick it near the typical
  * interval length (span ≈ 1-2 buckets). Intervals spanning more than
  * `maxBucketsPerInterval` buckets fail loudly (raise_error in the explode
  * path) rather than silently exploding the shuffle — widen the bucket or
  * split the giant interval upstream.
  *
  * Columns are numeric (e.g. epoch nanos as long); callers convert
  * timestamps. Interval/point payload column names must not collide. */
object RangeJoin {

  def join(points: DataFrame, intervals: DataFrame,
           keyCol: String, tCol: String, startCol: String, endCol: String,
           bucketWidth: Long, maxBucketsPerInterval: Int = 1024): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    require(maxBucketsPerInterval > 0, "maxBucketsPerInterval must be positive")
    val collisions = (intervals.columns.toSet - keyCol) & (points.columns.toSet - keyCol)
    require(collisions.isEmpty, s"column collision between sides: $collisions")

    val pb = points.withColumn("__bucket", floor(col(tCol) / bucketWidth).cast("long"))
    // the guard lives INSIDE the sequence bound so it cannot be pruned away
    val guardedEnd = {
      val bs = floor(col(startCol) / bucketWidth).cast("long")
      val be = floor(col(endCol) / bucketWidth).cast("long")
      when(be - bs < lit(maxBucketsPerInterval.toLong), be)
        .otherwise(raise_error(format_string(
          s"range_join: interval [%s, %s] spans more than $maxBucketsPerInterval " +
            s"buckets of width $bucketWidth — widen bucketWidth or split the interval",
          col(startCol), col(endCol))).cast("long"))
    }
    val ib = intervals
      // An inverted interval (end < start) contains no points by definition
      // — drop it BEFORE the explode: Spark's sequence(bs, be) generates a
      // DESCENDING sequence when bs > be, so an inverted dirty row would
      // sail past the span guard (be - bs is negative) and then try to
      // materialize |span| buckets anyway. NULL bounds also match nothing.
      .where(col(endCol) >= col(startCol))
      .withColumn("__bucket",
        explode(sequence(floor(col(startCol) / bucketWidth).cast("long"), guardedEnd)))
    pb.join(ib, Seq(keyCol, "__bucket"))
      .where(col(tCol) >= col(startCol) && col(tCol) <= col(endCol))
      .drop("__bucket")
  }
}
