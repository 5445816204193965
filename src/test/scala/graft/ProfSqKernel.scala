package graft

import graft.functions.QuantKernels

/** Spark-free kernel dissection for the sq8-vs-f16 gap: times decode-only,
  * metric-only, and fused variants over raw arrays. Run:
  *   sbt "Test/runMain graft.ProfSqKernel"
  */
object ProfSqKernel {
  val n = 200000; val dim = 128

  def main(args: Array[String]): Unit = {
    val rnd = new java.util.Random(42)
    val codes = Array.fill(n)(Array.fill(dim)(rnd.nextInt(256).toByte))
    val shorts = Array.fill(n)(Array.fill(dim)(QuantKernels.floatToF16(rnd.nextFloat())))
    val mins = Array.fill(dim)(rnd.nextDouble() * 0.01 - 0.005)
    val scales = Array.fill(dim)(rnd.nextDouble() * 1e-5 + 1e-6)
    val q = Array.fill(dim)(rnd.nextDouble() * 0.01)
    val qf = q.map(_.toFloat)

    var sink = 0.0

    // decode-only: sq8 affine vs f16 table
    def decSq8(): Double = {
      val buf = new Array[Double](dim); var s = 0.0; var r = 0
      while (r < n) {
        val a = codes(r); var j = 0
        while (j < dim) { buf(j) = mins(j) + (a(j) & 0xFF).toDouble * scales(j); j += 1 }
        s += buf(dim - 1); r += 1
      }
      s
    }
    def decF16(): Double = {
      val buf = new Array[Float](dim); var s = 0.0; var r = 0
      while (r < n) {
        val a = shorts(r); var j = 0
        while (j < dim) { buf(j) = QuantKernels.f16ToFloat(a(j)); j += 1 }
        s += buf(dim - 1); r += 1
      }
      s
    }
    // metric-only over pre-decoded buffers
    val dbuf = Array.fill(n)(Array.fill(dim)(rnd.nextDouble()))
    val fbuf = Array.fill(n)(Array.fill(dim)(rnd.nextFloat()))
    def cosD(): Double = {
      var best = Double.MaxValue; var r = 0
      while (r < n) {
        val b = dbuf(r); var acc = 0.0; var na = 0.0; var nb = 0.0; var i = 0
        while (i < dim) { val x = b(i); val y = q(i); acc += x * y; na += x * x; nb += y * y; i += 1 }
        val d = math.abs(1.0 - acc / (math.sqrt(na) * math.sqrt(nb))); if (d < best) best = d
        r += 1
      }
      best
    }
    def cosF(): Double = {
      var best = Double.MaxValue; var r = 0
      while (r < n) {
        val b = fbuf(r); var acc = 0.0; var na = 0.0; var nb = 0.0; var i = 0
        while (i < dim) { val x = b(i).toDouble; val y = qf(i).toDouble; acc += x * y; na += x * x; nb += y * y; i += 1 }
        val d = math.abs(1.0 - acc / (math.sqrt(na) * math.sqrt(nb))); if (d < best) best = d
        r += 1
      }
      best
    }
    // fused-variant candidates for sq8 (same per-element arithmetic ORDER)
    def sq8Fused(): Double = {
      var best = Double.MaxValue
      val buf = new Array[Double](dim); var r = 0
      while (r < n) {
        val a = codes(r); var j = 0
        while (j < dim) { buf(j) = mins(j) + (a(j) & 0xFF).toDouble * scales(j); j += 1 }
        var acc = 0.0; var na = 0.0; var nb = 0.0; var i = 0
        while (i < dim) { val x = buf(i); val y = q(i); acc += x * y; na += x * x; nb += y * y; i += 1 }
        val d = math.abs(1.0 - acc / (math.sqrt(na) * math.sqrt(nb))); if (d < best) best = d
        r += 1
      }
      best
    }
    // int-staging variant: byte->int buffer first (vectorizable), then the
    // affine+metric loop over int codes
    def sq8IntStage(): Double = {
      var best = Double.MaxValue
      val ib = new Array[Int](dim); var r = 0
      while (r < n) {
        val a = codes(r); var j = 0
        while (j < dim) { ib(j) = a(j) & 0xFF; j += 1 }
        var acc = 0.0; var na = 0.0; var nb = 0.0; var i = 0
        while (i < dim) {
          val x = mins(i) + ib(i).toDouble * scales(i); val y = q(i)
          acc += x * y; na += x * x; nb += y * y; i += 1
        }
        val d = math.abs(1.0 - acc / (math.sqrt(na) * math.sqrt(nb))); if (d < best) best = d
        r += 1
      }
      best
    }
    // ADC-LUT variant: query/mins/scales are plan constants, so precompute
    // per-(dim, code) products — the scan loop becomes two table gathers.
    // Each entry is the SAME fp-op sequence as the fissioned form, so the
    // accumulated values are bit-identical.
    val lutXY = new Array[Double](dim << 8)
    val lutXX = new Array[Double](dim << 8)
    var nbConst = 0.0
    locally { var i = 0
      while (i < dim) {
        val y = q(i); nbConst += y * y
        var c = 0
        while (c < 256) {
          val x = mins(i) + c.toDouble * scales(i)
          lutXY((i << 8) | c) = x * y
          lutXX((i << 8) | c) = x * x
          c += 1
        }
        i += 1
      } }
    def sq8Lut(): Double = {
      var best = Double.MaxValue; var r = 0
      while (r < n) {
        val a = codes(r); var acc = 0.0; var na = 0.0; var i = 0
        while (i < dim) {
          val ix = (i << 8) | (a(i) & 0xFF)
          acc += lutXY(ix); na += lutXX(ix); i += 1
        }
        val d = math.abs(1.0 - acc / (math.sqrt(na) * math.sqrt(nbConst)))
        if (d < best) best = d
        r += 1
      }
      best
    }
    // interleaved single table: (xy, xx) adjacent — both gathers in one line
    val lutIlv = new Array[Double](dim << 9)
    locally { var i = 0
      while (i < dim) {
        var c = 0
        while (c < 256) {
          val base = ((i << 8) | c) << 1
          lutIlv(base) = lutXY((i << 8) | c)
          lutIlv(base + 1) = lutXX((i << 8) | c)
          c += 1
        }
        i += 1
      } }
    def sq8LutIlv(): Double = {
      var best = Double.MaxValue; var r = 0
      while (r < n) {
        val a = codes(r); var acc = 0.0; var na = 0.0; var i = 0
        while (i < dim) {
          val ix = ((i << 8) | (a(i) & 0xFF)) << 1
          acc += lutIlv(ix); na += lutIlv(ix + 1); i += 1
        }
        val d = math.abs(1.0 - acc / (math.sqrt(na) * math.sqrt(nbConst)))
        if (d < best) best = d
        r += 1
      }
      best
    }
    // parity probe: LUT vs fissioned on one row must be bit-identical
    locally {
      val a = codes(0)
      val buf = new Array[Double](dim)
      var j = 0
      while (j < dim) { buf(j) = mins(j) + (a(j) & 0xFF).toDouble * scales(j); j += 1 }
      var acc = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < dim) { val x = buf(i); val y = q(i); acc += x * y; na += x * x; nb += y * y; i += 1 }
      val ref = math.abs(1.0 - acc / (math.sqrt(na) * math.sqrt(nb)))
      var acc2 = 0.0; var na2 = 0.0; i = 0
      while (i < dim) { val ix = (i << 8) | (a(i) & 0xFF); acc2 += lutXY(ix); na2 += lutXX(ix); i += 1 }
      val lut = math.abs(1.0 - acc2 / (math.sqrt(na2) * math.sqrt(nbConst)))
      println(s"parity: ref=$ref lut=$lut identical=${java.lang.Double.doubleToRawLongBits(ref) == java.lang.Double.doubleToRawLongBits(lut)}")
    }
    val suite = Seq(
      "dec_sq8" -> (() => decSq8()), "dec_f16" -> (() => decF16()),
      "cos_dbl" -> (() => cosD()), "cos_flt" -> (() => cosF()),
      "sq8_fissioned" -> (() => sq8Fused()), "sq8_int_stage" -> (() => sq8IntStage()),
      "sq8_lut" -> (() => sq8Lut()),
      "sq8_lut_ilv" -> (() => sq8LutIlv()))
    suite.foreach { case (_, f) => (1 to 5).foreach(_ => sink += f()) }
    suite.foreach { case (name, f) =>
      val ts = (1 to 7).map { _ => val t0 = System.nanoTime(); sink += f(); (System.nanoTime() - t0) / 1e9 }
      println(f"$name%-14s min=${ts.min}%.4f")
    }
    println(s"(sink $sink)")
  }
}
