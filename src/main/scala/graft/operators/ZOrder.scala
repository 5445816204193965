package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering — the multi-dimensional layout step a
  * 100 TB lakehouse table needs: interleaving the bit-planes of several
  * dimensions into one sort key makes every written parquet row group
  * cover a tight range of EVERY clustered dimension, so min/max row-group
  * statistics prune scans filtered on any of them (a 1-D sort prunes only
  * its leading column).
  *
  * All arithmetic is exact integer work — one min/max scan per build, a
  * per-dimension power-of-two bucket width (a right shift, never a float
  * division, so there is no boundary rounding to disagree across engines),
  * and a bitwise interleave — everything whole-stage-codegen'd, and
  * bit-replicable in the DuckDB oracle.
  *
  * Scale: stats are one agg action (2·dims values); clustering is one
  * range shuffle + in-partition sort, the same cost as any sorted write.
  * ZOrderSpec proves the payoff end to end: a 2-D box filter over the
  * z-clustered layout reads a fraction of the row groups the 1-D layout
  * reads (parquet row-group skipping via pushed min/max filters).
  */
object ZOrder {

  /** Per-column shifts from one min/max scan: `(minValue, rightShift)`
    * such that `(v - min) >> shift` lands in `[0, 2^bits)`. */
  def fitShifts(df: DataFrame, cols: Seq[String], bits: Int): Seq[(Long, Int)] = {
    require(cols.nonEmpty, "at least one column required")
    require(bits >= 1 && bits * cols.size <= 62,
      s"bits * dims must fit a long, got $bits * ${cols.size}")
    val aggs = cols.flatMap(c =>
      Seq(min(col(c).cast("long")).as(s"mn_$c"), max(col(c).cast("long")).as(s"mx_$c")))
    val r = df.agg(aggs.head, aggs.tail: _*).head()
    // check EVERY dimension, naming the offender: min/max are null per
    // column, so a later all-null clustered column would otherwise surface
    // as a bare NPE from getLong instead of a contract error
    cols.zipWithIndex.foreach { case (c, i) =>
      require(!r.isNullAt(2 * i),
        s"cannot fit z-order shifts: input is empty or column '$c' is all-null")
    }
    cols.indices.map { i =>
      val mn = r.getLong(2 * i)
      // UNSIGNED range: for columns spanning more than half the long range
      // (xxhash64/stable_id values), max - min wraps negative in signed
      // arithmetic — but the wrapped value IS the unsigned distance, and
      // numberOfLeadingZeros reads its unsigned bit length correctly
      // (nlz = 0 → bitLen 64). [[zvalue]] computes the offsets in matching
      // unsigned arithmetic (halved-operand form — ANSI-safe).
      val range = r.getLong(2 * i + 1) - mn // driver-side JVM math wraps (wanted)
      val bitLen = 64 - java.lang.Long.numberOfLeadingZeros(range) // 0 for range=0
      (mn, math.max(bitLen - bits, 0))
    }
  }

  /** The interleaved z-value column for `cols` under `shifts` (from
    * [[fitShifts]]): bit b of dimension i lands at position b·dims + i. */
  def zvalue(cols: Seq[String], shifts: Seq[(Long, Int)], bits: Int): Column = {
    val n = cols.size
    val buckets = cols.zip(shifts).map { case (c, (mn, sh)) =>
      // Exact floor((v - mn) / 2^sh) in UNSIGNED arithmetic, ANSI-safe for
      // columns spanning more than half the long range (where v - mn both
      // wraps AND trips Spark's overflow check): map to unsigned order by
      // flipping the sign bit, then work on HALVED operands — always
      // < 2^63, so plain subtraction cannot overflow — and correct the
      // dropped low bit. halfd = floor(d/2) + corr with corr = 1 iff the
      // base is odd and u even (the only case the halves over-count).
      val u = col(c).cast("long").bitwiseXOR(lit(Long.MinValue))
      val base = mn ^ Long.MinValue
      val halfd = shiftrightunsigned(u, 1) - lit(base >>> 1)
      val corr: Column =
        if ((base & 1L) == 0L) lit(0L)
        else u.bitwiseXOR(lit(1L)).bitwiseAND(lit(1L)) // 1 - (u & 1)
      if (sh >= 1) shiftrightunsigned(halfd - corr, sh - 1)
      else (halfd - corr) * lit(2L) +
        u.bitwiseAND(lit(1L)).bitwiseXOR(lit(base & 1L)) // + (d & 1)
    }
    val terms = for (b <- 0 until bits; i <- 0 until n)
      yield shiftleft(shiftright(buckets(i), b).bitwiseAND(lit(1L)), b * n + i)
    terms.reduce(_ bitwiseOR _)
  }

  /** Cluster `df` for writing: range-partition and sort by the z-value,
    * then drop it — each output partition (and the row groups inside it)
    * covers a contiguous z-range, i.e. a tight box in every dimension. */
  def cluster(df: DataFrame, cols: Seq[String], bits: Int = 12,
              numPartitions: Int = 0, zCol: String = "_z"): DataFrame = {
    val shifts = fitShifts(df, cols, bits)
    val withZ = df.withColumn(zCol, zvalue(cols, shifts, bits))
    val parts = if (numPartitions > 0) numPartitions
                else df.sparkSession.sessionState.conf.numShufflePartitions
    withZ.repartitionByRange(parts, col(zCol)).sortWithinPartitions(zCol).drop(zCol)
  }
}
