// Same private[sql]-visibility rationale as VectorExpressions.scala.
package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types._

/** Trained scalar quantization (SQ8) — the uniform-affine int8 rung of the
  * quantization ladder, between the stateless float formats (f16/bf16/f8,
  * QuantExpressions.scala) and product quantization (PqExpressions.scala).
  * The reference engine ships only the stateless formats
  * (/root/reference/edge/f16_quantization.go, f8_quantization.go); SQ8 is
  * the training-pipeline extension every FAISS-style stack expects
  * (`ScalarQuantizer QT_8bit`): per-dimension affine ranges trained from the
  * corpus, 1 byte/dim (4× smaller than f32, 2× smaller than f16) with far
  * better resolution than the 1-5-2 minifloat because the 256 levels adapt
  * to each dimension's actual spread.
  *
  * code_d  = clamp(round((x_d − min_d) / scale_d), 0, 255)   scale_d = (max_d − min_d)/255
  * dec_d   = min_d + code_d · scale_d
  *
  * All arithmetic is double (floats widen exactly), rounding is
  * round-half-up on a non-negative operand — both chosen so an external
  * engine (the DuckDB oracle) reproduces codes and decodes bit-for-bit.
  * A degenerate dimension (max = min ⇒ scale ≤ 0) encodes as 0 and decodes
  * exactly to min_d.
  *
  * The trained (mins, scales) ride as plan constants (`addReferenceObj`) —
  * dim-sized, O(KB) — never as a join. At 100 TB the encoded column is what
  * is persisted and scanned; decode runs fused inside the scoring loop
  * ([[VecDistanceSq8]]), so the scan reads 1 byte/dim and never
  * materializes a decoded array per row.
  */
case class Sq8Encode(child: Expression, mins: Array[Double], scales: Array[Double])
    extends UnaryExpression with ExpectsInputTypes {
  require(mins.length == scales.length,
    s"mins/scales length mismatch: ${mins.length} vs ${scales.length}")
  override def prettyName: String = "sq8_encode"
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    require(n == mins.length, s"vector dimension mismatch: $n vs ${mins.length}")
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      out(i) = Sq8Encode.encodeOne(a.getFloat(i), mins(i), scales(i))
      i += 1
    }
    out
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mn = ctx.addReferenceObj("sqMins", mins, "double[]")
    val sc = ctx.addReferenceObj("sqScales", scales, "double[]")
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val out = ctx.freshName("out"); val r = ctx.freshName("r")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $mn.length) {
         |  throw new IllegalArgumentException("vector dimension mismatch: " + $n + " vs " + $mn.length);
         |}
         |final byte[] $out = new byte[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($sc[$i] > 0.0) {
         |    final long $r = Math.round(((double) $a.getFloat($i) - $mn[$i]) / $sc[$i]);
         |    $out[$i] = (byte) ($r < 0L ? 0 : ($r > 255L ? 255 : (int) $r));
         |  }
         |}
         |${ev.value} = $out;
       """.stripMargin
    })
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** JVM-wide interned ADC tables for [[VecDistanceSq8]] — one shared copy
  * per (metric, query, mins, scales) instead of one per task (see the
  * doGenCode note). Entries are content-keyed; a small LRU bounds residency
  * (a serving loop cycles queries, each with its own table). Thread-safe:
  * the worst race builds the same deterministic table twice. */
object Sq8LutCache {
  private final case class Key(metric: String, q: Seq[Double], mn: Seq[Double], sc: Seq[Double])
  /** Residency is bounded by TOTAL BYTES, not entry count: a table is
    * dim×256×8 B (×2 for cosine), so at dim=1536 one cosine entry is
    * ~6.3 MB and a fixed entry count would silently pin hundreds of MB in
    * every executor. 64 MB holds ~128 dim=128 cosine tables or ~10 dim=1536
    * ones; eviction is LRU, and the worst case after eviction is rebuilding
    * a table (milliseconds), never wrong answers. */
  private val MaxBytes = 64L << 20
  private var totalBytes = 0L
  private val cache = new java.util.LinkedHashMap[Key, Array[Double]](64, 0.75f, true)

  /** Build the per-(dim, code) contribution table. Cosine interleaves
    * (dec·q, dec·dec) pairs so both gathers land in one cache line; the
    * other metrics collapse to a single per-element contribution. Entry
    * arithmetic mirrors the per-element op sequence of
    * metric(decode(codes), query) exactly — bit-identical accumulation. */
  private def build(metric: String, query: Array[Double],
                    mins: Array[Double], scales: Array[Double]): Array[Double] = {
    val n = query.length
    metric match {
      case "cosine" =>
        val t = new Array[Double](n << 9)
        var i = 0
        while (i < n) {
          val y = query(i)
          var c = 0
          while (c < 256) {
            val x = mins(i) + c.toDouble * scales(i)
            val base = ((i << 8) | c) << 1
            t(base) = x * y
            t(base + 1) = x * x
            c += 1
          }
          i += 1
        }
        t
      case _ =>
        val t = new Array[Double](n << 8)
        var i = 0
        while (i < n) {
          val y = query(i)
          var c = 0
          while (c < 256) {
            val x = mins(i) + c.toDouble * scales(i)
            t((i << 8) | c) = metric match {
              case "euclidean" => val d = x - y; d * d
              case "manhattan" => math.abs(x - y)
              case "dot"       => x * y
            }
            c += 1
          }
          i += 1
        }
        t
    }
  }

  def getOrBuild(metric: String, query: Array[Double],
                 mins: Array[Double], scales: Array[Double]): Array[Double] = {
    val key = Key(metric, query.toSeq, mins.toSeq, scales.toSeq)
    cache.synchronized {
      val hit = cache.get(key)
      if (hit != null) return hit
    }
    val built = build(metric, query, mins, scales) // build OUTSIDE the lock
    cache.synchronized {
      val raced = cache.get(key)
      if (raced != null) raced
      else {
        cache.put(key, built)
        totalBytes += built.length.toLong * 8
        // evict least-recently-used until under the byte budget (access-order
        // map: the iterator walks eldest-first); never evict what we just put
        val it = cache.entrySet().iterator()
        while (totalBytes > MaxBytes && it.hasNext) {
          val e = it.next()
          if (!(e.getKey eq key)) {
            totalBytes -= e.getValue.length.toLong * 8
            it.remove()
          }
        }
        built
      }
    }
  }
}

object Sq8Encode {
  def encodeOne(x: Float, mn: Double, sc: Double): Byte =
    if (sc <= 0.0) 0.toByte
    else {
      val r = Math.round((x.toDouble - mn) / sc)
      (if (r < 0L) 0 else if (r > 255L) 255 else r.toInt).toByte
    }
  def decodeOne(c: Byte, mn: Double, sc: Double): Double =
    mn + (c & 0xFF).toDouble * sc
}

/** Decode SQ8 codes back to the quantized double values (min_d + c·scale_d).
  * Output is array<double> — the decode is exact in doubles, which is what
  * lets the oracle reproduce distances to the rounding digit. */
case class Sq8Decode(child: Expression, mins: Array[Double], scales: Array[Double])
    extends UnaryExpression with ExpectsInputTypes {
  require(mins.length == scales.length,
    s"mins/scales length mismatch: ${mins.length} vs ${scales.length}")
  override def prettyName: String = "sq8_decode"
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[Array[Byte]]
    require(a.length == mins.length,
      s"vector dimension mismatch: ${a.length} vs ${mins.length}")
    val out = new Array[Double](a.length)
    var i = 0
    while (i < a.length) { out(i) = Sq8Encode.decodeOne(a(i), mins(i), scales(i)); i += 1 }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mn = ctx.addReferenceObj("sqMins", mins, "double[]")
    val sc = ctx.addReferenceObj("sqScales", scales, "double[]")
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i"); val out = ctx.freshName("out")
      s"""
         |final int $n = $a.length;
         |if ($n != $mn.length) {
         |  throw new IllegalArgumentException("vector dimension mismatch: " + $n + " vs " + $mn.length);
         |}
         |final double[] $out = new double[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $out[$i] = $mn[$i] + ((double) ($a[$i] & 0xFF)) * $sc[$i];
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Fused SQ8 asymmetric distance. The query, mins, and scales are ALL plan
  * constants, so the per-element arithmetic against any of the 256 possible
  * codes is computable ahead of the scan: codegen precomputes an ADC-style
  * lookup table per (dimension, code) — for cosine an interleaved
  * (dec·q, dec·dec) pair table plus the constant query self-norm, for
  * euclidean/manhattan/dot a single per-element contribution table — and
  * the generated hot loop is one byte-indexed gather + add per element.
  * This replaced the fissioned decode-buffer form after the r7 kernel
  * dissection showed the affine decode (2 double loads + int→double convert
  * per element) ran 3× slower than f16's table decode and made sq8 the only
  * scan over the 10M bench gate (0.064 s → 0.033 s per 200k×128 rows,
  * single thread).
  *
  * Bit-exactness: each table entry is produced by the IDENTICAL fp-op
  * sequence the fissioned loop executed per element ((mn+c·sc) then the
  * metric op), and the accumulation order over elements is unchanged — so
  * results are bit-identical to metric(decode(codes), query) and to the
  * interpreted path below (QuantizationSpec pins this). Table cost: dim×256
  * doubles (×2 for cosine) ≈ 256-512 KB at dim=128, shipped once per task
  * as a codegen reference object — the same weight class as the IVF
  * centroid constants. */
case class VecDistanceSq8(child: Expression, query: Array[Double],
                          mins: Array[Double], scales: Array[Double], metric: String)
    extends UnaryExpression with ExpectsInputTypes {
  require(VecDistanceQuant.metrics.contains(metric), s"unknown metric: $metric")
  require(query.length == mins.length && mins.length == scales.length,
    s"query/mins/scales length mismatch: ${query.length}/${mins.length}/${scales.length}")
  override def prettyName: String = s"${metric}_distance_sq8"
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[Array[Byte]]
    val n = a.length
    require(n == query.length, s"vector dimension mismatch: $n vs ${query.length}")
    var acc = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    metric match {
      case "cosine" =>
        while (i < n) { val x = Sq8Encode.decodeOne(a(i), mins(i), scales(i)); val y = query(i)
          acc += x * y; na += x * x; nb += y * y; i += 1 }
        math.abs(1.0 - acc / (math.sqrt(na) * math.sqrt(nb)))
      case "euclidean" =>
        while (i < n) { val d = Sq8Encode.decodeOne(a(i), mins(i), scales(i)) - query(i)
          acc += d * d; i += 1 }
        math.sqrt(acc)
      case "manhattan" =>
        while (i < n) { acc += math.abs(Sq8Encode.decodeOne(a(i), mins(i), scales(i)) - query(i)); i += 1 }
        acc
      case "dot" =>
        while (i < n) { acc += Sq8Encode.decodeOne(a(i), mins(i), scales(i)) * query(i); i += 1 }
        -acc
    }
  }

  /** Query self-norm Σ y·y, accumulated in element order — the same value
    * the fissioned loop's `nb` accumulator produced (query is constant, so
    * it never depended on the row). */
  private lazy val queryNormSq: Double = {
    var nb = 0.0; var i = 0
    while (i < query.length) { val y = query(i); nb += y * y; i += 1 }
    nb
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // The table is INTERNED per JVM (content-keyed LRU), not shipped as a
    // reference object: a reference object is deserialized per task, so 32
    // concurrent scan tasks would hold 32 private copies of a 256-512 KB
    // table — 8-16 MB of hot gather targets thrashing L3 where ONE shared
    // copy fits. The generated init fetches (or builds once) the shared
    // array from the small (query, mins, scales) constants.
    val qRef = ctx.addReferenceObj("sq8Query", query, "double[]")
    val mnRef = ctx.addReferenceObj("sq8Mins", mins, "double[]")
    val scRef = ctx.addReferenceObj("sq8Scales", scales, "double[]")
    val tab = ctx.addMutableState("double[]", "sq8LutShared",
      v => s"""$v = org.apache.spark.sql.graft.Sq8LutCache.getOrBuild(
              |  "$metric", $qRef, $mnRef, $scRef);""".stripMargin,
      forceInline = false)
    // emit the constant via its raw bits: a plain decimal interpolation
    // breaks codegen COMPILATION on NaN/Infinity query vectors ("NaND" is
    // not a Java literal), silently dropping the whole stage to interpreted
    val qNorm = s"Double.longBitsToDouble(${java.lang.Double.doubleToRawLongBits(queryNormSq)}L)"
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i"); val ix = ctx.freshName("ix")
      val acc = ctx.freshName("acc"); val na = ctx.freshName("na")
      val loop = metric match {
        case "cosine" =>
          s"""double $acc = 0.0; double $na = 0.0;
             |for (int $i = 0; $i < $n; $i++) {
             |  final int $ix = (($i << 8) | ($a[$i] & 0xFF)) << 1;
             |  $acc += $tab[$ix]; $na += $tab[$ix + 1];
             |}
             |${ev.value} = Math.abs(1.0 - $acc / (Math.sqrt($na) * Math.sqrt($qNorm)));""".stripMargin
        case "euclidean" =>
          s"""double $acc = 0.0;
             |for (int $i = 0; $i < $n; $i++) {
             |  $acc += $tab[($i << 8) | ($a[$i] & 0xFF)];
             |}
             |${ev.value} = Math.sqrt($acc);""".stripMargin
        case "manhattan" =>
          s"""double $acc = 0.0;
             |for (int $i = 0; $i < $n; $i++) {
             |  $acc += $tab[($i << 8) | ($a[$i] & 0xFF)];
             |}
             |${ev.value} = $acc;""".stripMargin
        case "dot" =>
          s"""double $acc = 0.0;
             |for (int $i = 0; $i < $n; $i++) {
             |  $acc += $tab[($i << 8) | ($a[$i] & 0xFF)];
             |}
             |${ev.value} = -$acc;""".stripMargin
      }
      s"""
         |final int $n = $a.length;
         |if ($n != ${query.length}) {
         |  throw new IllegalArgumentException("vector dimension mismatch: " + $n + " vs " + ${query.length});
         |}
         |$loop
       """.stripMargin
    })
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
