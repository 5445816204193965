package graft

/** Spark-free dissection of the pq_encode kernel (r8 verdict task #3: driver
  * numbers 33.6 → 80.7 → 46.3 s at 10M on an unchanged kernel — prove where
  * the time goes before touching anything). Variants over raw arrays, all
  * m=16 / ksub=256 / dsub=8 / dim=128 (the bench shape):
  *
  *   full      — the shipped kernel logic verbatim (gate + BigDecimal round)
  *   noround   — gate admissions skip the BigDecimal re-derivation
  *               (semantics-breaking; isolates decimal-rounding cost)
  *   puresq    — plain squared-distance argmin, no gate, no rounding
  *               (the arithmetic floor)
  *   dotform   — |c|²−2⟨x,c⟩ candidate selection (fp-different; shows what
  *               the inner-product rewrite would buy IF semantics allowed)
  *
  * Run: sbt "Test/runMain graft.ProfPqEncode"
  */
object ProfPqEncode {
  val n = 100000; val m = 16; val ksub = 256; val dsub = 8; val dim = m * dsub

  def main(args: Array[String]): Unit = {
    val rnd = new java.util.Random(42)
    val vecs = Array.fill(n)(Array.fill(dim)(rnd.nextFloat() * 2 - 1))
    // flattened per-subspace codebooks, the kernel's layout
    val flat = Array.fill(m)(Array.fill(ksub * dsub)(rnd.nextFloat() * 2 - 1))
    val cnorm = flat.map { f => // |c|² per codeword (dotform variant)
      val out = new Array[Double](ksub)
      var c = 0
      while (c < ksub) {
        var s = 0.0; var i = 0
        while (i < dsub) { val x = f(c * dsub + i).toDouble; s += x * x; i += 1 }
        out(c) = s; c += 1
      }
      out
    }

    var sink = 0L

    def full(): Long = {
      var s = 0L; var r = 0
      while (r < n) {
        val a = vecs(r); var j = 0
        while (j < m) {
          val f = flat(j); val off = j * dsub
          var best = 0; var bestR = Double.PositiveInfinity; var gateSq = Double.PositiveInfinity
          var c = 0; var base = 0
          while (c < ksub) {
            var acc = 0.0; var i = 0
            while (i < dsub) { val t = a(off + i).toDouble - f(base + i).toDouble; acc += t * t; i += 1 }
            if (acc < gateSq) {
              val rd = java.math.BigDecimal.valueOf(math.sqrt(acc))
                .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
              if (rd < bestR) {
                bestR = rd; best = c
                val g = rd + 2e-6 + 4.0 * Math.ulp(rd); gateSq = g * g
              }
            }
            c += 1; base += dsub
          }
          s += best; j += 1
        }
        r += 1
      }
      s
    }

    def noround(): Long = {
      var s = 0L; var r = 0
      while (r < n) {
        val a = vecs(r); var j = 0
        while (j < m) {
          val f = flat(j); val off = j * dsub
          var best = 0; var bestR = Double.PositiveInfinity; var gateSq = Double.PositiveInfinity
          var c = 0; var base = 0
          while (c < ksub) {
            var acc = 0.0; var i = 0
            while (i < dsub) { val t = a(off + i).toDouble - f(base + i).toDouble; acc += t * t; i += 1 }
            if (acc < gateSq) {
              val rd = math.sqrt(acc) // no decimal re-derivation
              if (rd < bestR) {
                bestR = rd; best = c
                val g = rd + 2e-6 + 4.0 * Math.ulp(rd); gateSq = g * g
              }
            }
            c += 1; base += dsub
          }
          s += best; j += 1
        }
        r += 1
      }
      s
    }

    def puresq(): Long = {
      var s = 0L; var r = 0
      while (r < n) {
        val a = vecs(r); var j = 0
        while (j < m) {
          val f = flat(j); val off = j * dsub
          var best = 0; var bestSq = Double.PositiveInfinity
          var c = 0; var base = 0
          while (c < ksub) {
            var acc = 0.0; var i = 0
            while (i < dsub) { val t = a(off + i).toDouble - f(base + i).toDouble; acc += t * t; i += 1 }
            if (acc < bestSq) { bestSq = acc; best = c }
            c += 1; base += dsub
          }
          s += best; j += 1
        }
        r += 1
      }
      s
    }

    def dotform(): Long = {
      var s = 0L; var r = 0
      while (r < n) {
        val a = vecs(r); var j = 0
        while (j < m) {
          val f = flat(j); val nn = cnorm(j); val off = j * dsub
          var best = 0; var bestV = Double.PositiveInfinity
          var c = 0; var base = 0
          while (c < ksub) {
            var dot = 0.0; var i = 0
            while (i < dsub) { dot += a(off + i).toDouble * f(base + i).toDouble; i += 1 }
            val v = nn(c) - 2.0 * dot
            if (v < bestV) { bestV = v; best = c }
            c += 1; base += dsub
          }
          s += best; j += 1
        }
        r += 1
      }
      s
    }

    // the shipped r9 form: buffer squared distances + true min (phase 1),
    // decimal-round only the candidates inside the min's rounding band
    val bandBuf = new Array[Double](ksub)
    def twophase(): Long = {
      var s = 0L; var r = 0
      while (r < n) {
        val a = vecs(r); var j = 0
        while (j < m) {
          val f = flat(j); val off = j * dsub
          var minSq = Double.PositiveInfinity
          var c = 0; var base = 0
          while (c < ksub) {
            var acc = 0.0; var i = 0
            while (i < dsub) { val t = a(off + i).toDouble - f(base + i).toDouble; acc += t * t; i += 1 }
            bandBuf(c) = acc
            if (acc < minSq) minSq = acc
            c += 1; base += dsub
          }
          val g = math.sqrt(minSq) + 2e-6 + 4.0 * Math.ulp(math.sqrt(minSq))
          val gateSq = g * g
          var best = 0; var bestR = Double.PositiveInfinity
          c = 0
          while (c < ksub) {
            if (bandBuf(c) < gateSq) {
              val rd = java.math.BigDecimal.valueOf(math.sqrt(bandBuf(c)))
                .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
              if (rd < bestR) { bestR = rd; best = c }
            }
            c += 1
          }
          s += best * (j + 1) // position-weighted so reorderings can't cancel
          j += 1
        }
        r += 1
      }
      s
    }

    // single pass, no full buffer: maintain the true running min plus the
    // SHORT list of band candidates (admit on acc < gate, prune the list
    // when the min improves). Final list = exactly {c : acc_c < final
    // gate²} in index order; rounding runs only over it (~1-2 entries).
    val candIdx = new Array[Int](ksub); val candAcc = new Array[Double](ksub)
    def onepass(): Long = {
      var s = 0L; var r = 0
      while (r < n) {
        val a = vecs(r); var j = 0
        while (j < m) {
          val f = flat(j); val off = j * dsub
          var minSq = Double.PositiveInfinity; var gateSq = Double.PositiveInfinity
          var nc = 0
          var c = 0; var base = 0
          while (c < ksub) {
            var acc = 0.0; var i = 0
            while (i < dsub) { val t = a(off + i).toDouble - f(base + i).toDouble; acc += t * t; i += 1 }
            if (acc < gateSq) {
              if (acc < minSq) {
                minSq = acc
                val sq = math.sqrt(acc)
                val g = sq + 2e-6 + 4.0 * Math.ulp(sq)
                gateSq = g * g
                // prune entries the tighter gate excludes, preserving order
                var w = 0; var k = 0
                while (k < nc) {
                  if (candAcc(k) < gateSq) { candIdx(w) = candIdx(k); candAcc(w) = candAcc(k); w += 1 }
                  k += 1
                }
                nc = w
              }
              candIdx(nc) = c; candAcc(nc) = acc; nc += 1
            }
            c += 1; base += dsub
          }
          var best = 0; var bestR = Double.PositiveInfinity
          var k = 0
          while (k < nc) {
            val rd = java.math.BigDecimal.valueOf(math.sqrt(candAcc(k)))
              .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
            if (rd < bestR) { bestR = rd; best = candIdx(k) }
            k += 1
          }
          s += best * (j + 1)
          j += 1
        }
        r += 1
      }
      s
    }

    // parity: twophase must agree with the r6 running-gate form codeword
    // for codeword (position-weighted checksums over all n rows)
    def fullChecksum(): Long = {
      var s = 0L; var r = 0
      while (r < n) {
        val a = vecs(r); var j = 0
        while (j < m) {
          val f = flat(j); val off = j * dsub
          var best = 0; var bestR = Double.PositiveInfinity; var gateSq = Double.PositiveInfinity
          var c = 0; var base = 0
          while (c < ksub) {
            var acc = 0.0; var i = 0
            while (i < dsub) { val t = a(off + i).toDouble - f(base + i).toDouble; acc += t * t; i += 1 }
            if (acc < gateSq) {
              val rd = java.math.BigDecimal.valueOf(math.sqrt(acc))
                .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
              if (rd < bestR) {
                bestR = rd; best = c
                val g = rd + 2e-6 + 4.0 * Math.ulp(rd); gateSq = g * g
              }
            }
            c += 1; base += dsub
          }
          s += best * (j + 1)
          j += 1
        }
        r += 1
      }
      s
    }

    def time(name: String, fn: () => Long): Unit = {
      (1 to 3).foreach(_ => sink += fn()) // warm
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); sink += fn(); (System.nanoTime() - t0) / 1e9
      }.sorted
      val usRow = ts.head * 1e6 / n
      println(f"$name%-10s min=${ts.head}%.3f s  med=${ts(2)}%.3f s  ($usRow%.2f µs/row; " +
        f"x10M/32thr ≈ ${ts.head * 100 / 32}%.1f s)")
    }

    time("puresq", puresq _)
    time("noround", noround _)
    time("full", full _)
    time("dotform", dotform _)
    time("twophase", twophase _)
    time("onepass", onepass _)
    val fc = fullChecksum()
    val parity2 = twophase() == fc; val parity1 = onepass() == fc
    println(s"sink=$sink twophase==full: $parity2 onepass==full: $parity1")
    assert(parity2, "twophase argmin diverged from the running-gate form")
    assert(parity1, "onepass argmin diverged from the running-gate form")
  }
}
