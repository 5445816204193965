package graft

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal

/** Multimodal plumbing: binary payload column, typed metadata, batched
  * per-partition feature extraction (stub decoder — the Spark-side shape is
  * what's under test; see Multimodal.scala). */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq((1L, "abc"), (2L, ""), (3L, "aaaa")).toDF("doc_id", "text")

  test("payload metadata: byte length and first byte") {
    val pm = Multimodal.payloadMeta(Multimodal.withPayload(df, "text"))
      .select("doc_id", "n_bytes", "head_byte").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2))).toMap
    assert(pm(1L) === ((3L, 97L)))  // 'a' = 0x61
    assert(pm(3L) === ((4L, 97L)))
    assert(pm(2L)._1 === 0L)
  }

  test("unnormalized features are the exact byte histogram (sums to n_bytes)") {
    val pm = Multimodal.withPayload(df, "text")
    val f = Multimodal.extractFeatures(pm, "doc_id", "payload", dim = 4, normalize = false)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(f(1L).sum === 3.0f)
    assert(f(3L).sum === 4.0f)
    // 'a'=97, 97%4=1 -> all mass in bin 1 for "aaaa"
    assert(f(3L)(1) === 4.0f)
  }

  test("normalized features have unit L2 norm; empty payload stays zero") {
    val pm = Multimodal.withPayload(df, "text")
    val f = Multimodal.extractFeatures(pm, "doc_id", "payload", dim = 4)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val n1 = math.sqrt(f(1L).map(x => x.toDouble * x).sum)
    assert(math.abs(n1 - 1.0) < 1e-6)
    assert(f(2L).forall(_ == 0.0f))
  }

  test("REAL codec: javax.imageio decodes a generated PNG to exact pixel stats") {
    // 2×2 image with known pixels via the deterministic generator at id=0:
    // w=8, h=8, pixel formula — decode must reproduce the formula's means
    val id = 0L
    val bytes = Multimodal.syntheticPng(id)
    val dec = new Multimodal.ImageStatsDecoder
    dec.init()
    val f = dec.decode(bytes).get
    assert(f(0) === 8.0 && f(1) === 8.0) // w = 8 + 0%9, h = 8 + 0%7
    val px = for (x <- 0 until 8; y <- 0 until 8) yield ((x * 7 + y * 13) % 256).toDouble
    assert(f(2) === px.sum / 64.0) // mean_r exact (long-accumulated)
  }

  test("REAL codec: corrupt payloads yield decode_ok=false and zeros, never a crash") {
    val rows = Seq(
      (1L, Multimodal.syntheticPng(1L)),
      (2L, Array[Byte](1, 2, 3, 4)),          // garbage
      (3L, Array.emptyByteArray)              // empty
    ).toDF("doc_id", "payload")
    val out = Multimodal.extractWith(rows, "doc_id", "payload", new Multimodal.ImageStatsDecoder)
      .collect().map(r => r.getLong(0) -> ((r.getBoolean(2), r.getSeq[Double](1)))).toMap
    assert(out(1L)._1 === true)
    assert(out(2L)._1 === false && out(2L)._2.forall(_ == 0.0))
    assert(out(3L)._1 === false)
  }

  test("NULL payloads yield decode_ok=false in every decoder, never an NPE") {
    val rows = Seq[(Long, Array[Byte])](
      (1L, Multimodal.syntheticPng(1L)),
      (2L, null)
    ).toDF("doc_id", "payload")
    for (dec <- Seq(new Multimodal.ImageStatsDecoder, new Multimodal.AudioStatsDecoder,
                    new Multimodal.VideoStatsDecoder())) {
      val out = Multimodal.extractWith(rows, "doc_id", "payload", dec)
        .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
      assert(out(2L) === false, dec.getClass.getSimpleName)
    }
    // direct decoder calls too (library users bypass extractWith)
    assert(new Multimodal.ImageStatsDecoder().decode(null).isEmpty)
    assert(new Multimodal.AudioStatsDecoder().decode(null).isEmpty)
    assert(new Multimodal.VideoStatsDecoder().decode(null).isEmpty)
  }

  test("hostile AVI: a deep LIST(LIST(…)) tower is rejected as corrupt, not a stack overflow") {
    // 20k nesting levels × 12 bytes — would overflow the thread stack in an
    // unbounded recursive walker, and StackOverflowError escapes NonFatal
    val levels = 20000
    val bb = java.nio.ByteBuffer.allocate(12 + levels * 12)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(4 + levels * 12).put("AVI ".getBytes("US-ASCII"))
    for (i <- 0 until levels) {
      // chunk at level i spans (levels - i) * 12 bytes; size excludes its
      // own fourcc+size header (8 bytes)
      bb.put("LIST".getBytes("US-ASCII")).putInt((levels - i) * 12 - 8)
        .put("hdrl".getBytes("US-ASCII"))
    }
    assert(new Multimodal.VideoStatsDecoder().decode(bb.array()).isEmpty)
  }

  test("REAL codec: distributed encode→decode round trip over many ids (PNG lossless)") {
    val ids = spark.range(0, 50).toDF("doc_id")
    val imgs = Multimodal.withSyntheticImages(ids, "doc_id")
    val feats = Multimodal.extractWith(imgs, "doc_id", "payload", new Multimodal.ImageStatsDecoder)
    assert(feats.where(!col("decode_ok")).count() === 0L)
    val dims = feats.select(col("doc_id"),
        element_at(col("features"), 1).as("w"), element_at(col("features"), 2).as("h"))
      .collect()
    dims.foreach { r =>
      val id = r.getLong(0)
      assert(r.getDouble(1) === 8.0 + id % 9, s"width mismatch at id=$id")
      assert(r.getDouble(2) === 8.0 + id % 7, s"height mismatch at id=$id")
    }
  }

  test("REAL audio codec: WAV PCM round trip reproduces the formula's amplitude stats") {
    val id = 3L
    val n = 400 + (id % 100).toInt
    val dec = new Multimodal.AudioStatsDecoder
    val f = dec.decode(Multimodal.syntheticWav(id)).get
    assert(f(0) === n.toDouble && f(1) === 8000.0)
    val samples = (0 until n).map(i => (((i.toLong * 7919 + id * 104729) % 65536) - 32768).toInt)
    assert(f(2) === samples.map(s => math.abs(s).toLong).sum.toDouble / n)
    assert(f(4) === samples.sliding(2).count(p => (p(0) >= 0) != (p(1) >= 0)).toDouble)
    // corrupt bytes refuse cleanly
    assert(dec.decode(Array[Byte](9, 9, 9)).isEmpty)
  }

  test("REAL video container: DIB AVI round trip reproduces the formula's sampled-frame stats") {
    val id = 6L // w=8+6%5=9, h=6+6%5=7, nFrames=3+6%4=5, sampled f∈{0,2,4}
    val dec = new Multimodal.VideoStatsDecoder(sampleStep = 2)
    dec.init()
    val f = dec.decode(Multimodal.syntheticAvi(id)).get
    assert(f(0) === 5.0 && f(1) === 9.0 && f(2) === 7.0) // frames, w, h
    assert(f(3) === 10.0) // fps = dwRate/dwScale
    assert(f(4) === 3.0)  // frames 0, 2, 4 sampled
    val px = for (fr <- Seq(0, 2, 4); x <- 0 until 9; y <- 0 until 7)
      yield ((x * 7 + y * 13 + fr * 17 + id) % 256).toDouble
    assert(f(5) === px.sum / px.length) // mean_r EXACT: DIB is lossless
    // corrupt / truncated / non-AVI bytes refuse cleanly
    assert(dec.decode(Array[Byte](1, 2, 3)).isEmpty)
    assert(dec.decode(Multimodal.syntheticAvi(id).take(40)).isEmpty)
    assert(dec.decode(Multimodal.syntheticWav(id)).isEmpty)
  }

  test("REAL video container: a second (audio) stream neither clobbers the bitmap header nor pollutes pixel stats") {
    // the audio strl's WAVEFORMATEX strf parses at the bitmap offsets as
    // bitCount!=24, and its '01wb' chunks interleave between frames — an
    // ungated parser misroutes DIB decode or mixes audio bytes into the
    // sums; the gated one must decode identically to the video-only file
    val id = 6L
    val dec = new Multimodal.VideoStatsDecoder(sampleStep = 2)
    dec.init()
    val plain = dec.decode(Multimodal.syntheticAvi(id)).get
    val withAudio = dec.decode(Multimodal.syntheticAvi(id, audioTrack = true)).get
    assert(plain.toSeq === withAudio.toSeq)
  }

  test("REAL video container: a SECOND video stream's strf cannot clobber the selected stream's format") {
    // stream 1 declares MJPG/16bpp with no frames of its own; a parser
    // that re-arms the strf parse on every vids strh would overwrite
    // stream 0's DIB/24bpp format and fail to decode its raw frames
    val id = 6L
    val dec = new Multimodal.VideoStatsDecoder(sampleStep = 2)
    dec.init()
    val plain = dec.decode(Multimodal.syntheticAvi(id)).get
    val twoVideo = dec.decode(Multimodal.syntheticAvi(id, secondVideoTrack = true)).get
    assert(plain.toSeq === twoVideo.toSeq)
  }

  test("REAL video codec: MJPEG AVI decodes through javax.imageio's JPEG path") {
    val id = 3L // w=11, h=9, nFrames=6, sampled {0,2,4}
    val dec = new Multimodal.VideoStatsDecoder(sampleStep = 2)
    dec.init()
    val f = dec.decode(Multimodal.syntheticMjpegAvi(id)).get
    assert(f(0) === 6.0 && f(1) === 11.0 && f(2) === 9.0 && f(4) === 3.0)
    // JPEG is lossy: means are near the formula's, not exact
    val px = for (fr <- Seq(0, 2, 4); x <- 0 until 11; y <- 0 until 9)
      yield ((x * 7 + y * 13 + fr * 17 + id) % 256).toDouble
    assert(math.abs(f(5) - px.sum / px.length) < 16.0,
      s"MJPEG mean_r ${f(5)} too far from formula ${px.sum / px.length}")
    assert(f(5) > 0 && f(5) < 256 && f(6) > 0 && f(6) < 256)
  }

  test("REAL video codec: distributed encode→decode round trip over many ids") {
    val ids = spark.range(0, 40).toDF("doc_id")
    val avis = Multimodal.withSyntheticVideo(ids, "doc_id")
    val feats = Multimodal.extractWith(avis, "doc_id", "payload",
      new Multimodal.VideoStatsDecoder(sampleStep = 2))
    assert(feats.where(!col("decode_ok")).count() === 0L)
    feats.select(col("doc_id"),
        element_at(col("features"), 1).as("nf"),
        element_at(col("features"), 2).as("w"),
        element_at(col("features"), 3).as("h"),
        element_at(col("features"), 5).as("sampled"))
      .collect().foreach { r =>
        val id = r.getLong(0)
        assert(r.getDouble(1) === 3.0 + id % 4, s"n_frames mismatch at id=$id")
        assert(r.getDouble(2) === 8.0 + id % 5, s"width mismatch at id=$id")
        assert(r.getDouble(3) === 6.0 + id % 5, s"height mismatch at id=$id")
        assert(r.getDouble(4) === (((3 + id % 4) + 1) / 2).toDouble, s"sampled mismatch at id=$id")
      }
  }

  test("feature output feeds the vector operators downstream (search over features)") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val feats = Multimodal.extractFeatures(
      Multimodal.withPayload(docs, "text"), "doc_id", "payload", dim = 16)
    val q = feats.where(col("doc_id") === 0).head().getSeq[Float](1).toArray
    val top = graft.operators.VectorSearch.search(feats,
      graft.operators.SearchRequest(q, topK = 3, metric = "cosine",
        idCol = "doc_id", vectorCol = "features")).collect()
    assert(top.head.getAs[Long]("doc_id") === 0L) // self-match first
    assert(top.head.getAs[Double]("dist") === 0.0)
  }
}
