package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Product quantization — the ANN memory-scale path beyond the scalar f16/f8
  * quantizers (F6-F8): split the vector into `m` subspaces, vector-quantize
  * each against a `ksub`-entry codebook, and store ONE BYTE per subspace
  * (Jégou, Douze, Schmid, "Product Quantization for Nearest Neighbor
  * Search", TPAMI 2011 — public method). A 128-d float32 vector (512 B)
  * compresses to m=16 bytes: at 100 TB of embeddings the PQ codes for the
  * whole corpus fit in cluster memory, and search touches only codes + a
  * per-query lookup table (ADC), never the raw vectors.
  *
  * Both expressions keep the codebook/LUT as codegen reference objects, so
  * the generated code is constant-size in m and ksub (same design as
  * [[VecArgMinDistance]] — the expanded per-codeword expression tree would
  * fall out of whole-stage codegen past a few dozen codewords).
  */

/** pq_encode(v): the m-byte PQ code of a float32 vector. Per subspace, the
  * nearest (euclidean) sub-codeword wins, comparing on `round(dist, 6)` with
  * the LOWEST code index on ties — semantics identical per-subspace to
  * [[VecArgMinDistance]] over the sliced vector (pinned by PqSpec), so the
  * assignment is reproducible in any engine that can round a distance.
  *
  * `cents(j)(c)` = sub-codeword c of subspace j; subspace widths may vary,
  * their sum must equal the input dimension; ksub ≤ 256 (one byte). */
case class PqEncode(child: Expression, cents: Array[Array[Array[Float]]])
    extends UnaryExpression with ExpectsInputTypes {
  require(cents.nonEmpty, "empty codebook")
  require(cents.forall(cb => cb.nonEmpty && cb.length <= 256),
    s"each subspace needs 1..256 codewords (one byte per code)")
  require(cents.forall(cb => cb.forall(_.length == cb(0).length)),
    "ragged sub-codeword dimensions within a subspace")

  private val m = cents.length
  /** Start offset of each subspace within the full vector. */
  private val offs: Array[Int] = cents.scanLeft(0)((o, cb) => o + cb(0).length).init
  private val dim: Int = offs.last + cents.last(0).length

  override def prettyName: String = "pq_encode"
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData].toFloatArray()
    if (a.length != dim)
      throw new IllegalArgumentException(s"vector dimension mismatch: ${a.length} vs $dim")
    val out = new Array[Byte](m)
    var j = 0
    while (j < m) {
      val cb = cents(j); val off = offs(j); val dn = cb(0).length
      var best = 0; var bestR = Double.PositiveInfinity
      var c = 0
      while (c < cb.length) {
        val cc = cb(c)
        var acc = 0.0; var i = 0
        while (i < dn) { val t = a(off + i).toDouble - cc(i).toDouble; acc += t * t; i += 1 }
        val d = math.sqrt(acc)
        // same lazily-rounded argmin as VecArgMinDistance: rounding can only
        // flip the winner within this window, so the hot path stays a plain
        // double compare
        if (d < bestR + 1e-6 + 4.0 * Math.ulp(d)) {
          val rd = java.math.BigDecimal.valueOf(d)
            .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
          if (rd < bestR) { bestR = rd; best = c }
        }
        c += 1
      }
      out(j) = best.toByte
      j += 1
    }
    out
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val centsRef = ctx.addReferenceObj("pqCents", cents, "float[][][]")
      val offsRef = ctx.addReferenceObj("pqOffs", offs, "int[]")
      val a = ctx.freshName("a"); val out = ctx.freshName("out")
      val j = ctx.freshName("j"); val c = ctx.freshName("c"); val i = ctx.freshName("i")
      val cb = ctx.freshName("cb"); val cc = ctx.freshName("cc")
      val off = ctx.freshName("off"); val dn = ctx.freshName("dn")
      val acc = ctx.freshName("acc"); val d = ctx.freshName("d"); val rd = ctx.freshName("rd")
      val best = ctx.freshName("best"); val bestR = ctx.freshName("bestR")
      s"""
         |final float[] $a = $v.toFloatArray();
         |if ($a.length != $dim) {
         |  throw new IllegalArgumentException("vector dimension mismatch: " + $a.length + " vs " + $dim);
         |}
         |final byte[] $out = new byte[$m];
         |for (int $j = 0; $j < $m; $j++) {
         |  final float[][] $cb = $centsRef[$j];
         |  final int $off = $offsRef[$j];
         |  final int $dn = $cb[0].length;
         |  int $best = 0;
         |  double $bestR = Double.POSITIVE_INFINITY;
         |  for (int $c = 0; $c < $cb.length; $c++) {
         |    final float[] $cc = $cb[$c];
         |    double $acc = 0.0;
         |    for (int $i = 0; $i < $dn; $i++) {
         |      final double t = (double) $a[$off + $i] - (double) $cc[$i];
         |      $acc += t * t;
         |    }
         |    final double $d = Math.sqrt($acc);
         |    if ($d < $bestR + 1e-6 + 4.0 * Math.ulp($d)) {
         |      final double $rd = java.math.BigDecimal.valueOf($d)
         |        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue();
         |      if ($rd < $bestR) { $bestR = $rd; $best = $c; }
         |    }
         |  }
         |  $out[$j] = (byte) $best;
         |}
         |${ev.value} = $out;
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** pq_adc_distance(code): asymmetric distance of a query against an m-byte
  * PQ code — `sqrt(Σⱼ lut[j·ksub + code[j]])` where `lut` holds the SQUARED
  * euclidean distances from the query's subvectors to every sub-codeword
  * (built once per query, driver-side). The scan is m byte-indexed table
  * lookups per row: no decode, no per-row allocation, and the cached input
  * is the m-byte code column, not the float vector. */
case class PqAdcDistance(child: Expression, lut: Array[Double], ksub: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(ksub >= 1 && ksub <= 256, s"ksub must be in 1..256, got $ksub")
  require(lut.nonEmpty && lut.length % ksub == 0,
    s"LUT length ${lut.length} is not a multiple of ksub=$ksub")

  private val m = lut.length / ksub

  override def prettyName: String = "pq_adc_distance"
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any = {
    val code = v.asInstanceOf[Array[Byte]]
    if (code.length != m)
      throw new IllegalArgumentException(s"code length mismatch: ${code.length} vs $m")
    var acc = 0.0; var j = 0
    while (j < m) { acc += lut(j * ksub + (code(j) & 0xFF)); j += 1 }
    math.sqrt(acc)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val lutRef = ctx.addReferenceObj("pqLut", lut, "double[]")
      val code = ctx.freshName("code"); val acc = ctx.freshName("acc")
      val j = ctx.freshName("j")
      s"""
         |final byte[] $code = $v;
         |if ($code.length != $m) {
         |  throw new IllegalArgumentException("code length mismatch: " + $code.length + " vs " + $m);
         |}
         |double $acc = 0.0;
         |for (int $j = 0; $j < $m; $j++) {
         |  $acc += $lutRef[$j * $ksub + ($code[$j] & 0xFF)];
         |}
         |${ev.value} = Math.sqrt($acc);
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
