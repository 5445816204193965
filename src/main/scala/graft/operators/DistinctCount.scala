package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distinct counting at corpus scale — the HLL++ member of the sketch
  * family (bloom → membership, CMS → frequency, MinHash → similarity,
  * HLL → cardinality).
  *
  * At 100 TB `COUNT(DISTINCT x)` is the trap: exact distinct shuffles every
  * distinct value (the value set itself can be corpus-sized), while Spark's
  * `approx_count_distinct` (HyperLogLog++, Heule et al. 2013) is one scan
  * with fixed-size register merges — map-side combined, partition-order
  * independent, DETERMINISTIC for a given input set. The production path is
  * approx-only; [[audit]] exists to calibrate trust in it: it runs BOTH on
  * the same relation and flags any group whose estimate strays past
  * `tolSds` standard deviations (HLL++'s rsd is the relative standard
  * deviation, so the bound is `|approx − exact| ≤ tolSds·rsd·exact`; small
  * groups sit in HLL++'s sparse mode and are exact). Run the audit on a
  * sample or at the dev scale factor, then ship [[approxDistinct]].
  */
object DistinctCount {

  /** Per-group HLL++ estimate — the one-pass production shape. */
  def approxDistinct(df: DataFrame, groupCols: Seq[Column], valueCol: Column,
                     rsd: Double = 0.05): DataFrame = {
    require(rsd > 0 && rsd < 1, s"rsd must be in (0, 1), got $rsd")
    df.groupBy(groupCols: _*).agg(approx_count_distinct(valueCol, rsd).as("approx_distinct"))
  }

  /** Exact + estimate + within-bound flag per group (see object doc). */
  def audit(df: DataFrame, groupCols: Seq[Column], valueCol: Column,
            rsd: Double = 0.05, tolSds: Double = 3.0): DataFrame = {
    require(rsd > 0 && rsd < 1, s"rsd must be in (0, 1), got $rsd")
    require(tolSds > 0, s"tolSds must be positive, got $tolSds")
    df.groupBy(groupCols: _*)
      .agg(
        countDistinct(valueCol).as("exact_distinct"),
        approx_count_distinct(valueCol, rsd).as("approx_distinct"))
      .withColumn("hll_ok",
        abs(col("approx_distinct") - col("exact_distinct")).cast("double")
          <= lit(tolSds * rsd) * col("exact_distinct").cast("double"))
  }
}
