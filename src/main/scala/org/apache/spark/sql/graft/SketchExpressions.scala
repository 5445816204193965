// Catalyst extension glue (same private[sql] rationale as VectorExpressions):
// Column wrappers over Spark's internal bloom-filter expressions, the same
// machinery AQE's runtime row-level filtering injects (InjectRuntimeFilter).
// Exposed here as an explicit operator building block so the engine can build
// a corpus-side membership sketch ONCE and prune a batch-side scan before any
// shuffle — the 100 TB incremental-dedup shape.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions.lit
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-sketch Column API.
  *
  * The aggregate ingests LONG hashes (pair with `xxhash64`) and returns the
  * serialized sketch as BINARY — `optimalNumOfBits(n, fpp)/8` bytes, i.e.
  * ~0.9 MB for 1M items at 3% fpp — small enough to ship back to the driver
  * and re-embed as a plan-constant literal for the probe side.
  */
object SketchExpressions {
  import GraftBridge.{column, expression}

  /** Aggregate a LongType column into a serialized bloom filter (BINARY).
    * Returns SQL NULL on empty input (no rows ingested). Sized by the
    * classic optimal-bits formula; `expectedItems` overshoot is safe (fpp
    * only drops), undershoot degrades fpp but NEVER correctness — probes
    * have no false negatives regardless. */
  def bloomFilterAgg(values: Column, expectedItems: Long, fpp: Double): Column = {
    require(expectedItems > 0, s"expectedItems must be > 0, got $expectedItems")
    require(fpp > 0.0 && fpp < 1.0, s"fpp must be in (0, 1), got $fpp")
    val numBits = BloomFilter.optimalNumOfBits(expectedItems, fpp)
    column(new BloomFilterAggregate(
      expression(values),
      expression(lit(expectedItems)),
      expression(lit(numBits))).toAggregateExpression())
  }

  /** Probe a serialized bloom filter (BINARY, foldable — pass a `lit` of
    * the aggregated bytes) with a LongType value. False positives possible
    * at the configured fpp; false negatives never. */
  def mightContain(bloom: Column, value: Column): Column =
    column(BloomFilterMightContain(expression(bloom), expression(value)))
}
