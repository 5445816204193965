package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, content-keyed sampling and dataset splitting — the
  * reproducibility discipline a training-data pipeline needs: membership is
  * a pure function of the row's id (no RNG, no partition sensitivity), so
  * train/val/test assignment survives re-runs, re-partitions, backfills and
  * engine changes, and a holdout never leaks when the corpus is rebuilt.
  *
  * The hash is the md5-based 60-bit family used by the MinHash signatures
  * (engine-replicable bit-for-bit in the DuckDB oracle); the id-hash
  * discipline is the same one `Ann.trainCentroids(sampleMod)` uses for the
  * corpus-scale training subsample. All operators are row-local
  * projections/filters — zero shuffles.
  */
object Sampling {

  /** 60-bit md5 bucket of `id` under a `family` label, in [0, buckets):
    * int64(first 15 hex digits of md5(family || '|' || id)) mod buckets.
    * Different family labels give independent assignments over the same
    * ids (split vs subsample vs A/B never correlate). */
  def hashBucket(id: Column, family: String, buckets: Int): Column = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    // A NULL id has no identity, and a null hash silently picks a DIFFERENT
    // behavior per consumer (where-filters drop the row, assignSplit's case
    // chain falls through to the LAST split — holdout contamination with
    // exactly the malformed rows, window ordering sorts nulls first). One
    // loud contract instead: membership is a pure function of the id, so
    // NULL ids must be filtered or repaired upstream.
    when(id.isNull, raise_error(lit(
        "sampling: id is NULL — membership is a pure function of the id; " +
          "filter or repair NULL ids upstream")).cast("long"))
      .otherwise(
        pmod(conv(substring(md5(concat(lit(family), lit("|"), id.cast("string"))), 1, 15), 16, 10)
          .cast("long"), lit(buckets.toLong)))
  }

  /** Add a `split` column assigning each row to one of the named splits by
    * cumulative weight ranges over the bucket space — e.g.
    * `Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)`. Weights are
    * normalized; realized proportions are exact to 1/buckets. */
  def assignSplit(df: DataFrame, idCol: String, splits: Seq[(String, Double)],
                  family: String = "split", buckets: Int = 10000,
                  splitCol: String = "split"): DataFrame = {
    require(splits.nonEmpty, "at least one split required")
    require(splits.forall(_._2 > 0), "split weights must be positive")
    val total = splits.map(_._2).sum
    val thresholds = splits.scanLeft(0.0) { case (acc, (_, w)) => acc + w }.tail
      .map(c => math.round(c / total * buckets))
    val b = hashBucket(col(idCol), family, buckets)
    val caseCol = splits.map(_._1).zip(thresholds).init
      .foldRight(lit(splits.last._1): Column) {
        case ((name, t), els) => when(b < t, lit(name)).otherwise(els)
      }
    df.withColumn(splitCol, caseCol)
  }

  /** Keep a deterministic `fraction` of rows (exact to 1/buckets). */
  def hashSample(df: DataFrame, idCol: String, fraction: Double,
                 family: String = "sample", buckets: Int = 10000): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction must be in [0,1], got $fraction")
    df.where(hashBucket(col(idCol), family, buckets) < math.round(fraction * buckets))
  }

  /** Per-stratum deterministic sampling — the corpus-mixing step of LLM
    * data prep: down-weight dominant strata (a language, a crawl source)
    * by keeping only a per-stratum fraction of rows, with admission a pure
    * function of the row id so the mix is reproducible across re-runs and
    * engines. Strata not named in `rates` keep `defaultRate`. Row-local
    * filter (one case-expression over the id hash): zero shuffles, and at
    * 100 TB the filter sits below the parquet scan's column pruning — only
    * `idCol`/`stratumCol` feed the predicate.
    */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
                       rates: Seq[(String, Double)], defaultRate: Double = 1.0,
                       family: String = "mix", buckets: Int = 10000): DataFrame = {
    require((defaultRate +: rates.map(_._2)).forall(r => r >= 0.0 && r <= 1.0),
      "stratum rates must be in [0,1]")
    val threshold = rates.foldRight(lit(math.round(defaultRate * buckets)): Column) {
      case ((stratum, rate), els) =>
        when(col(stratumCol) === stratum, lit(math.round(rate * buckets))).otherwise(els)
    }
    df.where(hashBucket(col(idCol), family, buckets) < threshold)
  }

  /** Cap every stratum at `maxRows`, keeping a deterministic hash-ordered
    * prefix — the "no single domain dominates" guard of corpus prep. The
    * kept subset is a pure function of the ids (the hash order is a uniform
    * shuffle of each stratum, so the prefix IS a uniform sample), stable
    * across re-runs and engines.
    *
    * Scale: one window shuffle partitioned by stratum. A stratum lands on
    * one reducer, so a stratum vastly larger than `maxRows` should be
    * pre-thinned with [[hashSample]] (rate ≈ a few × maxRows/|stratum|)
    * before the exact cap — the same two-phase discipline as a skewed
    * top-K. */
  def capPerStratum(df: DataFrame, idCol: String, stratumCol: String,
                    maxRows: Int, family: String = "cap"): DataFrame = {
    require(maxRows >= 1, s"maxRows must be >= 1, got $maxRows")
    require(!df.columns.contains("_rk"),
      "input already has a _rk column; rename it before capping")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol))
      .orderBy(hashBucket(col(idCol), family, 1 << 30), col(idCol))
    df.withColumn("_rk", row_number().over(w))
      .where(col("_rk") <= maxRows)
      .drop("_rk")
  }
}
