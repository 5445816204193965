// Same private[sql]-visibility rationale as VectorExpressions.scala.
package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

import graft.functions.TextKernels

/** simhash64(tokens): 64-bit SimHash document fingerprint over a token array
  * — near-duplicate detection via Hamming distance on the output. Row-local,
  * codegen'd: one pass over tokens per row, no shuffle. */
case class SimHash64(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def prettyName: String = "simhash64"
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any =
    TextKernels.simhash64(v.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.TextKernels.simhash64($a);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** normalize_text(s): ingest-side canonicalization — NFC, control-char
  * strip, whitespace collapse, trim (see TextKernels.normalizeText for the
  * exact order and the oracle-parity rationale). Row-local, codegen'd. */
case class NormalizeText(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def prettyName: String = "normalize_text"
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any =
    TextKernels.normalizeText(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.TextKernels.normalizeText($a);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** sorted_intersect_count(a, b): |a ∩ b| for two SORTED, DISTINCT string
  * arrays via a single merge pass — the verification kernel of the dedup
  * pipelines. `array_intersect` hashes one side into a fresh OpenHashSet
  * per evaluation; on an m²-pair blocked-Jaccard verify that allocation
  * dominates. The merge does zero allocation and compares UTF8String
  * binary order (what `array_sort` produces for strings). Inputs MUST be
  * sorted+distinct — callers pre-sort once per row, not per pair. */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def prettyName: String = "sorted_intersect_count"
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType), ArrayType(StringType))
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    TextKernels.sortedIntersectCount(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.TextKernels.sortedIntersectCount($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(l, r)
}

/** minhash_sig(shingles, seed): min over the shingle array of the
  * md5-derived 60-bit hash family `int64(first 15 hex digits of
  * md5(seed|shingle))` — one MinHash signature component. Semantically
  * identical to the `array_min(transform(sh, s -> conv(substr(md5(…)))))`
  * formulation (the DuckDB oracle replicates that form bit-for-bit), but a
  * direct digest kernel with no per-evaluation string allocation. Like
  * array_min over an empty array, an empty or all-null shingle array yields
  * NULL (the kernel's Long.MAX_VALUE sentinel is unreachable as a real
  * 60-bit signature). */
case class MinHashSig(child: Expression, seed: Int)
    extends UnaryExpression with ExpectsInputTypes {
  override def prettyName: String = "minhash_sig"
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  private lazy val prefix = s"$seed|".getBytes(java.nio.charset.StandardCharsets.UTF_8)

  override def nullSafeEval(v: Any): Any = {
    val sig = TextKernels.minhashSig(v.asInstanceOf[ArrayData], prefix)
    if (sig == Long.MaxValue) null else sig
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val p = ctx.addReferenceObj("mhPrefix", prefix, "byte[]")
    nullSafeCodeGen(ctx, ev, a => s"""
      ${ev.value} = graft.functions.TextKernels.minhashSig($a, $p);
      if (${ev.value} == Long.MAX_VALUE) { ${ev.isNull} = true; }""")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** minhash_sigs(shingles, k): all k MinHash signature components as one
  * array<long> — bit-identical to k [[MinHashSig]] columns (seeds 0..k−1)
  * but a single pass that materializes each shingle's bytes once instead
  * of k times. NULL on empty/all-null input, like the scalar form. */
case class MinHashSigs(child: Expression, k: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(k >= 1, "k must be positive")
  override def prettyName: String = "minhash_sigs"
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  private lazy val prefixes: Array[Array[Byte]] =
    (0 until k).map(j => s"$j|".getBytes(java.nio.charset.StandardCharsets.UTF_8)).toArray

  override def nullSafeEval(v: Any): Any = {
    val sigs = TextKernels.minhashSigs(v.asInstanceOf[ArrayData], prefixes)
    if (sigs(0) == Long.MaxValue) null
    else new org.apache.spark.sql.catalyst.util.GenericArrayData(sigs)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val p = ctx.addReferenceObj("mhPrefixes", prefixes, "byte[][]")
    val sigs = ctx.freshName("mhSigs")
    nullSafeCodeGen(ctx, ev, a => s"""
      long[] $sigs = graft.functions.TextKernels.minhashSigs($a, $p);
      if ($sigs[0] == Long.MAX_VALUE) { ${ev.isNull} = true; }
      else { ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sigs); }""")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** winnow_fingerprints(text, k, w): the winnowing document sketch — SORTED
  * DISTINCT window-w minima of the FNV-1a hashes of the char k-grams.
  * Value-identical (as a set) to the nested-lambda Column formulation in
  * [[graft.text.Winnowing]] (pinned by TextAnalysisSpec), but a single
  * zero-per-gram-allocation kernel pass per row. */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(k >= 1 && w >= 1, "k and w must be positive")
  override def prettyName: String = "winnow_fingerprints"
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      TextKernels.winnow(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], k, w))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.TextKernels.winnow($a, $k, $w));""".stripMargin)

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** fnv64(s): FNV-1a 64-bit hash of a string's UTF-8 bytes — the reference's
  * id/shard hash family (/root/reference/pkg/sharding/shard.go:34-48).
  * Deterministic and engine-independent (the DuckDB oracle reproduces it in
  * HUGEINT arithmetic), so ids derived from it are replayable. */
case class Fnv64(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def prettyName: String = "fnv64"
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any =
    TextKernels.fnv1a64(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.TextKernels.fnv1a64($a.getBytes());")

  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}
