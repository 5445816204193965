// Catalyst extension glue (same private[sql] rationale as VectorExpressions):
// Column wrappers over Spark's internal bloom-filter expressions, the same
// machinery AQE's runtime row-level filtering injects (InjectRuntimeFilter).
// Exposed here as an explicit operator building block so the engine can build
// a corpus-side membership sketch ONCE and prune a batch-side scan before any
// shuffle — the 100 TB incremental-dedup shape.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.{BloomFilterAggregate, CountMinSketchAgg}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType}
import org.apache.spark.util.sketch.{BloomFilter, CountMinSketch}

/** Bloom-sketch Column API.
  *
  * The aggregate ingests LONG hashes (pair with `xxhash64`) and returns the
  * serialized sketch as BINARY — `optimalNumOfBits(n, fpp)/8` bytes, i.e.
  * ~0.9 MB for 1M items at 3% fpp — small enough to ship back to the driver
  * and re-embed as a plan-constant literal for the probe side.
  */
object SketchExpressions {
  import GraftBridge.{column, expression}

  /** Session cap on bloom items (`spark.sql.optimizer.runtime.bloomFilter
    * .maxNumItems`): BloomFilterAggregate silently Math.min-clamps its
    * sizing to this, which would degrade fpp without a trace — so
    * [[bloomFilterAgg]] refuses loudly instead and callers that can
    * degrade gracefully check these caps first. */
  def bloomMaxItems: Long = org.apache.spark.sql.internal.SQLConf.get
    .getConfString("spark.sql.optimizer.runtime.bloomFilter.maxNumItems", "4000000").toLong

  /** Session cap on bloom bits (`…runtime.bloomFilter.maxNumBits`). */
  def bloomMaxBits: Long = org.apache.spark.sql.internal.SQLConf.get
    .getConfString("spark.sql.optimizer.runtime.bloomFilter.maxNumBits", "67108864").toLong

  /** The smallest fpp whose optimal sizing for `items` still fits the
    * session's numBits cap: optimalNumOfBits(n, p) = −n·ln p / ln²2 ≤ max
    * ⇒ p ≥ exp(−max·ln²2 / n). */
  def fppFloor(items: Long): Double = {
    require(items > 0, s"items must be > 0, got $items")
    math.exp(-bloomMaxBits * math.log(2.0) * math.log(2.0) / items.toDouble)
  }

  /** Aggregate a LongType column into a serialized bloom filter (BINARY).
    * Returns SQL NULL on empty input (no rows ingested). Sized by the
    * classic optimal-bits formula; `expectedItems` overshoot is safe (fpp
    * only drops), undershoot degrades fpp but NEVER correctness — probes
    * have no false negatives regardless.
    *
    * Sizings past the session caps fail LOUDLY here: BloomFilterAggregate
    * would otherwise Math.min-clamp items/bits internally and ship a
    * silently undersized sketch whose realized fpp can be arbitrarily
    * worse than requested. Raise the two confs in the error message (the
    * caps are per-sketch memory guards, not correctness bounds) or shard
    * the input by hash range and build one sketch per shard. */
  def bloomFilterAgg(values: Column, expectedItems: Long, fpp: Double): Column = {
    require(expectedItems > 0, s"expectedItems must be > 0, got $expectedItems")
    require(fpp > 0.0 && fpp < 1.0, s"fpp must be in (0, 1), got $fpp")
    require(expectedItems <= bloomMaxItems,
      s"expectedItems=$expectedItems exceeds spark.sql.optimizer.runtime.bloomFilter" +
        s".maxNumItems=$bloomMaxItems; raise the conf or shard the input " +
        "(BloomFilterAggregate would clamp silently and degrade fpp)")
    val numBits = BloomFilter.optimalNumOfBits(expectedItems, fpp)
    require(numBits <= bloomMaxBits,
      s"optimalNumOfBits($expectedItems, $fpp)=$numBits exceeds spark.sql.optimizer" +
        s".runtime.bloomFilter.maxNumBits=$bloomMaxBits; raise the conf or use " +
        s"fpp >= ${fppFloor(expectedItems)} (BloomFilterAggregate would clamp silently)")
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

  /** Aggregate a LongType column into a serialized count-min sketch
    * (BINARY). Sizing rule: the estimate overshoots a key's true count by
    * up to eps · N (N = TOTAL rows ingested, not distinct keys) with
    * probability ≥ confidence, so pick eps ≈ tolerable-slack / N — the
    * sketch is O(1/eps) bytes and corpus-size-independent otherwise. */
  def cmsAgg(values: Column, eps: Double, confidence: Double, seed: Int): Column = {
    require(eps > 0.0 && eps < 1.0, s"eps must be in (0, 1), got $eps")
    require(confidence > 0.0 && confidence < 1.0,
      s"confidence must be in (0, 1), got $confidence")
    column(new CountMinSketchAgg(expression(values),
      expression(lit(eps)), expression(lit(confidence)),
      expression(lit(seed))).toAggregateExpression())
  }

  /** Per-row upper-bound count of a LongType value against a driver-held
    * serialized count-min sketch (never underestimates — the property the
    * heavy-hitter prefilter's losslessness rests on). */
  def cmsEstimate(sketchBytes: Array[Byte], value: Column): Column =
    column(CmsEstimateLong(sketchBytes, expression(value)))
}

/** cms_estimate(value): the sketch's count upper bound for `value`. The
  * deserialized sketch rides the plan as a reference object (Serializable),
  * deserialized once per executor, probed inside whole-stage codegen. */
case class CmsEstimateLong(sketchBytes: Array[Byte], child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def prettyName: String = "cms_estimate"
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true // IsNotNull inference, like every sibling

  @transient private lazy val cms: CountMinSketch = CountMinSketch.readFrom(sketchBytes)

  override def nullSafeEval(v: Any): Any = cms.estimateCount(v)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cmsSketch", cms,
      "org.apache.spark.util.sketch.CountMinSketch")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = $ref.estimateCount((Object) $a);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
