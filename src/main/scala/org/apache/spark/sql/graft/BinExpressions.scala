// Same private[sql]-visibility rationale as VectorExpressions.scala.
package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Binary (1-bit/dim) quantization — the terminal rung of the quantization
  * ladder (f32 → f16/bf16 → sq8 → pq → binary). Each dimension collapses to
  * a single sign bit against a trained per-dimension threshold; distance is
  * Hamming over the packed bit codes (XOR + popcount). The reference engine
  * stops at the stateless minifloats (/root/reference/edge/f16_quantization
  * .go); binary codes are the standard first-pass filter of large-scale
  * retrieval stacks (FAISS `IndexBinaryFlat`, Charikar's SimHash random
  * hyperplanes applied to the identity basis): 32× smaller than f32, and
  * the scan is integer-only — no FP pipeline at all.
  *
  * bit_d = (x_d > t_d)   t_d = trained per-dim threshold (midrange — see
  * graft.ann.Bin.trainThresholds; exact-reproducible, order-independent)
  *
  * Packing is MSB-first within each byte (dim 0 → bit 7 of byte 0), tail
  * bits of a non-multiple-of-8 dimension are zero — both sides pack
  * identically so tail bits never contribute to the XOR.
  *
  * At 100 TB the packed column is what is persisted and scanned: 8 bytes
  * per 64-dim vector, so a 1B-row first-pass scan reads 8 GB instead of
  * 256 GB of floats, and candidates are re-ranked exactly (the
  * `binary_rerank` query / FIXTURES two-pass discipline).
  */
case class BinEncode(child: Expression, thresholds: Array[Double])
    extends UnaryExpression with ExpectsInputTypes {
  require(thresholds.nonEmpty, "thresholds must be non-empty")
  override def prettyName: String = "bin_encode"
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    require(n == thresholds.length, s"vector dimension mismatch: $n vs ${thresholds.length}")
    BinEncode.pack(Array.tabulate(n)(i => a.getFloat(i)), thresholds)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val th = ctx.addReferenceObj("binThresholds", thresholds, "double[]")
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i"); val out = ctx.freshName("out")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $th.length) {
         |  throw new IllegalArgumentException("vector dimension mismatch: " + $n + " vs " + $th.length);
         |}
         |final byte[] $out = new byte[($n + 7) >> 3];
         |for (int $i = 0; $i < $n; $i++) {
         |  if (((double) $a.getFloat($i)) > $th[$i]) {
         |    $out[$i >> 3] |= (byte) (0x80 >>> ($i & 7));
         |  }
         |}
         |${ev.value} = $out;
       """.stripMargin
    })
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object BinEncode {
  /** MSB-first sign-bit packing — the single definition both the codegen
    * template above and the driver-side query encode share. */
  def pack(v: Array[Float], thresholds: Array[Double]): Array[Byte] = {
    require(v.length == thresholds.length,
      s"vector dimension mismatch: ${v.length} vs ${thresholds.length}")
    val out = new Array[Byte]((v.length + 7) >> 3)
    var i = 0
    while (i < v.length) {
      if (v(i).toDouble > thresholds(i)) {
        out(i >> 3) = (out(i >> 3) | (0x80 >>> (i & 7))).toByte
      }
      i += 1
    }
    out
  }
}

/** Hamming distance between stored packed codes and a plan-constant query
  * code: XOR + popcount, 8 bytes at a time through Long.bitCount (one
  * POPCNT instruction each on x86/ARM). Integer-only hot loop — no FP, no
  * allocation, no branches beyond the tail. Output is long so the oracle's
  * BIGINT sum compares schema-exact. */
case class HammingDistanceBin(child: Expression, query: Array[Byte])
    extends UnaryExpression with ExpectsInputTypes {
  require(query.nonEmpty, "query code must be non-empty")
  override def prettyName: String = "hamming_distance_bin"
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any =
    HammingDistanceBin.hamming(v.asInstanceOf[Array[Byte]], query)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val q = ctx.addReferenceObj("binQuery", query, "byte[]")
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i"); val acc = ctx.freshName("acc")
      s"""
         |final int $n = $a.length;
         |if ($n != $q.length) {
         |  throw new IllegalArgumentException("code length mismatch: " + $n + " vs " + $q.length);
         |}
         |long $acc = 0L;
         |int $i = 0;
         |for (; $i + 8 <= $n; $i += 8) {
         |  $acc += Long.bitCount(
         |    (org.apache.spark.unsafe.Platform.getLong($a, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + $i)) ^
         |    (org.apache.spark.unsafe.Platform.getLong($q, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + $i)));
         |}
         |for (; $i < $n; $i++) {
         |  $acc += Integer.bitCount(($a[$i] ^ $q[$i]) & 0xFF);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object HammingDistanceBin {
  def hamming(a: Array[Byte], b: Array[Byte]): Long = {
    require(a.length == b.length, s"code length mismatch: ${a.length} vs ${b.length}")
    var acc = 0L; var i = 0
    while (i < a.length) { acc += Integer.bitCount((a(i) ^ b(i)) & 0xFF); i += 1 }
    acc
  }
}

/** Hamming distance between TWO packed code columns — the set-returning
  * form of [[HammingDistanceBin]] (whose query code is a plan constant):
  * the shape a multi-query audit or a binary code-join needs, where the
  * query code is itself a column (e.g. the broadcast query side of a
  * cross join). Same integer-only XOR + popcount loop, 8 bytes per
  * POPCNT. */
case class HammingDistanceCols(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def prettyName: String = "hamming_distance_cols"
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, BinaryType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    HammingDistanceBin.hamming(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i"); val acc = ctx.freshName("acc")
      s"""
         |final int $n = $a.length;
         |if ($n != $b.length) {
         |  throw new IllegalArgumentException("code length mismatch: " + $n + " vs " + $b.length);
         |}
         |long $acc = 0L;
         |int $i = 0;
         |for (; $i + 8 <= $n; $i += 8) {
         |  $acc += Long.bitCount(
         |    (org.apache.spark.unsafe.Platform.getLong($a, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + $i)) ^
         |    (org.apache.spark.unsafe.Platform.getLong($b, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + $i)));
         |}
         |for (; $i < $n; $i++) {
         |  $acc += Integer.bitCount(($a[$i] ^ $b[$i]) & 0xFF);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
