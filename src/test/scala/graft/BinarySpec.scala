package graft

import org.apache.spark.sql.functions._

import graft.ann.Bin
import org.apache.spark.sql.graft.{BinEncode, HammingDistanceBin}

/** Binary (1-bit/dim) quantization contracts: packing layout, Hamming
  * metric axioms, threshold training (incl. the sampled-training fallback),
  * codegen ≡ driver-side pack, and the two-pass rerank agreeing with the
  * exact scan on its candidate set. */
class BinarySpec extends SparkSpec {
  import spark.implicits._

  private def naiveHamming(a: Array[Float], b: Array[Float], th: Array[Double]): Long =
    a.indices.count(i => (a(i).toDouble > th(i)) != (b(i).toDouble > th(i))).toLong

  test("pack: MSB-first layout, zero tail padding on non-multiple-of-8 dims") {
    // 5 dims: bits 1,0,1,1,0 against threshold 0 → byte 1011_0000 = 0xB0
    val th = Array.fill(5)(0.0)
    val code = BinEncode.pack(Array(1f, -1f, 2f, 0.5f, -3f), th)
    assert(code.length === 1)
    assert((code(0) & 0xFF) === 0xB0)
    // 9 dims → 2 bytes, second byte holds only bit 7 (dim 8)
    val th9 = Array.fill(9)(0.0)
    val c9 = BinEncode.pack(Array.fill(9)(1f), th9)
    assert(c9.length === 2)
    assert((c9(0) & 0xFF) === 0xFF && (c9(1) & 0xFF) === 0x80)
  }

  test("hamming: identity, symmetry, and agreement with the naive bit count") {
    val rnd = new scala.util.Random(7)
    val th = Array.fill(64)(0.0)
    for (_ <- 1 to 200) {
      val a = Array.fill(64)(rnd.nextFloat() * 2 - 1)
      val b = Array.fill(64)(rnd.nextFloat() * 2 - 1)
      val ca = BinEncode.pack(a, th); val cb = BinEncode.pack(b, th)
      assert(HammingDistanceBin.hamming(ca, ca) === 0L)
      assert(HammingDistanceBin.hamming(ca, cb) === HammingDistanceBin.hamming(cb, ca))
      assert(HammingDistanceBin.hamming(ca, cb) === naiveHamming(a, b, th))
    }
  }

  test("codegen encode + fused hamming ≡ driver-side pack + naive count") {
    val rnd = new scala.util.Random(11)
    val dim = 37 // deliberately not a multiple of 8
    val rows = (0 until 64).map(i => (i.toLong, Array.fill(dim)(rnd.nextFloat() * 2 - 1)))
    val df = rows.toDF("id", "vec")
    val th = Bin.trainThresholds(df, "vec")
    val q = rows(3)._2
    val qc = Bin.encodeOne(q, th)
    val got = df.select(col("id"), Bin.hamming(Bin.encode(col("vec"), th), qc).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for ((id, v) <- rows) assert(got(id) === naiveHamming(v, q, th), s"row $id")
  }

  test("hammingCols (two-column form) == the plan-constant fused hamming") {
    val rnd = new scala.util.Random(13)
    val dim = 37 // not a multiple of 8: exercises the byte tail after the 8-byte loop
    val rows = (0 until 48).map(i => (i.toLong, Array.fill(dim)(rnd.nextFloat() * 2 - 1)))
    val df = rows.toDF("id", "vec")
    val th = Bin.trainThresholds(df, "vec")
    val coded = df.select(col("id"), Bin.encode(col("vec"), th).as("c"))
    val q = rows(5)._2
    val qdf = Seq(("q5", Bin.encodeOne(q, th))).toDF("qid", "qc")
    val got = coded.crossJoin(org.apache.spark.sql.functions.broadcast(qdf))
      .select(col("id"), Bin.hammingCols(col("c"), col("qc")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = coded.select(col("id"), Bin.hamming(col("c"), Bin.encodeOne(q, th)).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === want)
  }

  test("trainThresholds: midrange per dimension, exact") {
    val df = Seq(
      (1L, Array(0f, -2f, 5f)),
      (2L, Array(4f, 0f, 5f)),
      (3L, Array(2f, 6f, 5f))).toDF("id", "vec")
    val th = Bin.trainThresholds(df, "vec")
    assert(th.toSeq === Seq(2.0, 2.0, 5.0))
    // degenerate dim (min == max): strict > means the bit is always 0
    val c = BinEncode.pack(Array(3f, 3f, 5f), th)
    assert((c(0) & 0x20) === 0, "degenerate dim must encode 0")
  }

  test("trainThresholds: over-aggressive sampleMod falls back to the full corpus") {
    val df = Seq((1L, Array(1f, 2f)), (2L, Array(3f, 4f))).toDF("id", "vec")
    val full = Bin.trainThresholds(df, "vec")
    val sampled = Bin.trainThresholds(df, "vec", sampleMod = 1000000L, idCol = "id")
    assert(sampled.toSeq === full.toSeq)
  }

  test("trainThresholdsOpt: empty corpus is None, train still throws; non-empty matches (r14)") {
    val empty = Seq.empty[(Long, Array[Float])].toDF("id", "vec")
    assert(Bin.trainThresholdsOpt(empty, "vec").isEmpty)
    intercept[IllegalArgumentException](Bin.trainThresholds(empty, "vec"))
    val df = Seq((1L, Array(1f, 2f)), (2L, Array(3f, 4f))).toDF("id", "vec")
    assert(Bin.trainThresholdsOpt(df, "vec").map(_.toSeq) ===
      Some(Bin.trainThresholds(df, "vec").toSeq))
  }

  test("dimension mismatch is a loud contract error") {
    val df = Seq((1L, Array(1f, 2f, 3f))).toDF("id", "vec")
    val th = Array(0.0, 0.0)
    val ex = intercept[Exception] {
      df.select(Bin.encode(col("vec"), th)).collect()
    }
    assert(ex.getMessage != null)
    intercept[IllegalArgumentException] {
      HammingDistanceBin.hamming(Array[Byte](1, 2), Array[Byte](1))
    }
  }

  test("binary_rerank: exact cosine over the Hamming candidate set (sf0.001)") {
    val q = graft.queries.QuantizedQueries.queries("binary_rerank")(spark, sfDir).collect()
    assert(q.length === 10)
    // distances ascending, ties by id
    val dists = q.map(_.getDouble(1)).toSeq
    assert(dists === dists.sorted)
    // the Hamming prefilter at 3× over-fetch must recover the exact top-1
    // (vec_id 0 at distance 0 from itself survives any prefilter: its code
    // IS the query code, Hamming 0)
    assert(q.head.getLong(0) === 0L && q.head.getDouble(1) === 0.0)
  }
}
