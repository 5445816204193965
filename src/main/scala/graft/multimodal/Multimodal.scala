package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media (image/audio/video) travels as an
  * opaque `binary` column with typed metadata alongside; decode / feature
  * extraction runs batched per partition.
  *
  * Two decoders behind the same per-partition seam:
  *  - [[ImageStatsDecoder]] — a REAL pure-JVM image codec (`javax.imageio`
  *    PNG/BMP/GIF/JPEG): decode to pixels, emit (width, height, channel
  *    means). Failed decodes yield ok=false + zeros, the
  *    skip-don't-crash contract a corpus-scale ingest needs.
  *  - [[extractFeatures]]'s folded byte histogram — kept as the
  *    codec-independent fallback whose arithmetic any engine can replicate
  *    (the bitwise-oracle-checked path).
  *  - [[VideoStatsDecoder]] — a REAL pure-JDK AVI container parser
  *    (RIFF chunk walker: avih/strh/strf headers + movi frame chunks) with
  *    two codec paths: uncompressed DIB frames decoded directly (lossless →
  *    oracle-exact), MJPEG frames decoded through `javax.imageio`'s JPEG
  *    codec (real-world path; lossy, so plumbing-tested rather than
  *    value-pinned). Every `sampleStep`-th frame is decoded — the
  *    frame-sample operation of a media pipeline.
  */
object Multimodal {

  /** Per-partition decode seam: implementations hold their (possibly
    * expensive) codec state per PARTITION, not per row. */
  trait PayloadDecoder extends Serializable {
    /** Called once per partition before any decode (codec/model init). */
    def init(): Unit = ()
    /** Feature width of [[decode]]'s Some payload. */
    def dim: Int
    /** None = undecodable payload (corrupt bytes, wrong format). */
    def decode(bytes: Array[Byte]): Option[Array[Double]]
  }

  /** Real image decoder: `javax.imageio` → (width, height, meanR, meanG,
    * meanB). Channel sums accumulate in Long (exact), one division at the
    * end — deterministic and engine-reproducible given lossless formats. */
  class ImageStatsDecoder extends PayloadDecoder {
    @transient private var ready = false
    override def init(): Unit = {
      // ImageIO scans for plugins lazily; do it once per partition, and
      // disable the on-disk cache (pure in-memory decode)
      javax.imageio.ImageIO.setUseCache(false)
      ready = true
    }
    override def dim: Int = 5
    override def decode(bytes: Array[Byte]): Option[Array[Double]] = {
      if (!ready) init()
      if (bytes == null) return None
      // NonFatal, not just IOException: ImageIO plugin readers throw
      // RuntimeExceptions (IndexOutOfBounds, NegativeArraySize, CMM…) on
      // truncated/corrupt bytes — any of them is "undecodable", not a
      // task-killing failure (the skip-don't-crash contract).
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        catch { case scala.util.control.NonFatal(_) => null }
      Option(img).map { im =>
        val w = im.getWidth; val h = im.getHeight
        var sr = 0L; var sg = 0L; var sb = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = im.getRGB(x, y)
            sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
            x += 1
          }
          y += 1
        }
        val n = w.toLong * h
        Array(w.toDouble, h.toDouble, sr.toDouble / n, sg.toDouble / n, sb.toDouble / n)
      }
    }
  }

  /** Real audio decoder: `javax.sound.sampled` WAV (PCM 16-bit) →
    * (n_samples, sample_rate, mean |amplitude|, RMS, zero crossings).
    * Integer/long accumulation where exact; one division/sqrt at the end —
    * deterministic and engine-reproducible for lossless PCM. */
  class AudioStatsDecoder extends PayloadDecoder {
    override def dim: Int = 5
    override def decode(bytes: Array[Byte]): Option[Array[Double]] = {
      if (bytes == null) return None
      val in =
        try javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        catch { case scala.util.control.NonFatal(_) => null }
      Option(in).flatMap { ais =>
        try {
          val fmt = ais.getFormat
          if (fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1) None
          else {
            val raw = ais.readAllBytes()
            val bb = java.nio.ByteBuffer.wrap(raw).order(
              if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
              else java.nio.ByteOrder.LITTLE_ENDIAN)
            val n = raw.length / 2
            var sumAbs = 0L; var sumSq = 0L; var crossings = 0L
            var prevNonNeg = true; var i = 0
            while (i < n) {
              val s = bb.getShort(i * 2).toInt
              sumAbs += math.abs(s)
              sumSq += s.toLong * s
              val nonNeg = s >= 0
              if (i > 0 && nonNeg != prevNonNeg) crossings += 1
              prevNonNeg = nonNeg
              i += 1
            }
            if (n == 0) None
            else Some(Array(n.toDouble, fmt.getSampleRate.toDouble,
              sumAbs.toDouble / n, math.sqrt(sumSq.toDouble / n), crossings.toDouble))
          }
        } catch { case scala.util.control.NonFatal(_) => None }
        finally ais.close()
      }
    }
  }

  /** Real video decoder: minimal AVI (RIFF) container parser + frame
    * sampling. Emits (n_frames, width, height, fps, n_sampled, meanR,
    * meanG, meanB) where the channel means aggregate every `sampleStep`-th
    * frame (frame-sample, the standard first step of any video featurizer —
    * decoding every frame of a 100 TB corpus is never the plan).
    *
    * Codec paths inside the container:
    *  - `00db` uncompressed DIB (BITMAPINFOHEADER biCompression=0,
    *    24-bit): decoded directly from the bottom-up padded BGR rows —
    *    lossless, so stats are bit-exactly the pixel formula's (the
    *    oracle-checked path);
    *  - `00dc` MJPEG: each frame is a JPEG stream, decoded through
    *    `javax.imageio` (the real-world codec path; lossy).
    * Sums accumulate in Long (exact); one division at the end. Corrupt or
    * non-AVI bytes → None (skip-don't-crash). */
  class VideoStatsDecoder(sampleStep: Int = 2) extends PayloadDecoder {
    require(sampleStep >= 1, "sampleStep must be >= 1")
    override def init(): Unit = javax.imageio.ImageIO.setUseCache(false)
    override def dim: Int = 8
    override def decode(bytes: Array[Byte]): Option[Array[Double]] =
      if (bytes == null) None
      else try decodeAvi(bytes) catch { case scala.util.control.NonFatal(_) => None }

    private def decodeAvi(bytes: Array[Byte]): Option[Array[Double]] = {
      val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      def fourcc(pos: Int): String =
        new String(bytes, pos, 4, java.nio.charset.StandardCharsets.US_ASCII)
      if (bytes.length < 12 || fourcc(0) != "RIFF" || fourcc(8) != "AVI ") return None
      var totalFrames = 0L; var width = 0; var height = 0
      var scale = 0L; var rate = 0L
      var bitCount = 0; var compression = 0
      // Streams are numbered in strl order and frame chunks carry the
      // 2-digit stream number ('00db' = stream 0 DIB) — the video stream's
      // index gates BOTH the strf header parse and the frame collection, so
      // an audio stream's WAVEFORMATEX cannot clobber the bitmap header and
      // its '01wb' chunks never mix into the pixel stats.
      var streamCount = 0; var videoStream = -1; var expectVideoStrf = false
      val frames = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, String)] // (off, len, kind)
      // RIFF chunk walker: chunks are (fourcc, size, payload) padded to even;
      // LIST payloads nest. `limit` guards truncated containers. Depth is
      // bounded: a crafted LIST(LIST(LIST(…))) tower at 12 bytes/level would
      // otherwise overflow the thread stack — and StackOverflowError is a
      // VirtualMachineError that decode's NonFatal catch does NOT contain.
      // Real AVI nests 3 deep (RIFF > hdrl/movi > strl/rec); 64 is generous.
      def walk(from: Int, to: Int, depth: Int = 0): Unit = {
        if (depth > 64) return // hostile nesting — treat as corrupt
        var pos = from
        while (pos + 8 <= to) {
          val fc = fourcc(pos); val size = bb.getInt(pos + 4)
          if (size < 0 || pos + 8 + size > to) return // truncated/corrupt
          fc match {
            case "LIST" if size >= 4 => walk(pos + 12, pos + 8 + size, depth + 1)
            case "avih" if size >= 40 =>
              totalFrames = bb.getInt(pos + 8 + 16).toLong & 0xFFFFFFFFL
              width = bb.getInt(pos + 8 + 32); height = bb.getInt(pos + 8 + 36)
            case "strh" if size >= 32 =>
              // arm the strf parse ONLY for the SELECTED (first) video
              // stream: a second 'vids' strh re-arming it would let that
              // stream's strf clobber the first's bitCount/compression
              // while the frame chunks are still gated to the first —
              // mis-decoding valid frames. Any other strh disarms, so a
              // malformed file whose vids strl lacks its strf can't have
              // a later stream's strf land in the video slot.
              if (fourcc(pos + 8) == "vids" && videoStream < 0) {
                videoStream = streamCount
                scale = bb.getInt(pos + 8 + 20).toLong & 0xFFFFFFFFL
                rate = bb.getInt(pos + 8 + 24).toLong & 0xFFFFFFFFL
                expectVideoStrf = true
              } else expectVideoStrf = false
              streamCount += 1
            case "strf" if size >= 20 && expectVideoStrf =>
              bitCount = bb.getShort(pos + 8 + 14) & 0xFFFF
              compression = bb.getInt(pos + 8 + 16)
              expectVideoStrf = false
            case c if c.length == 4 && (c.endsWith("db") || c.endsWith("dc")) &&
                videoStream >= 0 && c.take(2) == f"$videoStream%02d" =>
              frames += ((pos + 8, size, c.takeRight(2)))
            case _ => ()
          }
          pos += 8 + size + (size & 1)
        }
      }
      walk(12, bytes.length)
      if (frames.isEmpty || width <= 0 || height <= 0) return None
      val fps = if (scale > 0) rate.toDouble / scale else 0.0
      var sr = 0L; var sg = 0L; var sb = 0L; var sampled = 0L
      // means divide by the pixels actually SUMMED, not the header dims —
      // a sloppy encoder's compressed frames may decode at a different
      // size than avih declares, and header-based division would silently
      // scale the means by the area ratio
      var nPix = 0L
      var f = 0
      while (f < frames.length) {
        if (f % sampleStep == 0) {
          val (off, len, kind) = frames(f)
          if (kind == "db" && compression == 0 && bitCount == 24) {
            // bottom-up BGR rows, stride padded to 4 bytes
            val stride = ((width * 3 + 3) / 4) * 4
            if (len < stride * height) return None
            var y = 0
            while (y < height) {
              val rowOff = off + (height - 1 - y) * stride
              var x = 0
              while (x < width) {
                sb += bytes(rowOff + x * 3) & 0xFF
                sg += bytes(rowOff + x * 3 + 1) & 0xFF
                sr += bytes(rowOff + x * 3 + 2) & 0xFF
                x += 1
              }
              y += 1
            }
            nPix += width.toLong * height
          } else {
            // compressed frame (MJPEG et al): a self-contained image stream
            val img = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(bytes, off, len))
            if (img == null) return None
            var y = 0
            while (y < img.getHeight) {
              var x = 0
              while (x < img.getWidth) {
                val rgb = img.getRGB(x, y)
                sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
                x += 1
              }
              y += 1
            }
            nPix += img.getWidth.toLong * img.getHeight
          }
          sampled += 1
        }
        f += 1
      }
      val n = nPix
      if (n == 0) None
      else Some(Array(
        (if (totalFrames > 0) totalFrames else frames.length).toDouble,
        width.toDouble, height.toDouble, fps, sampled.toDouble,
        sr.toDouble / n, sg.toDouble / n, sb.toDouble / n))
    }
  }

  /** Deterministic synthetic AVI per id — UNCOMPRESSED 24-bit DIB frames:
    * w = 8+id%5, h = 6+id%5, frames = 3+id%4 at 10 fps; frame f's pixel
    * (x,y) = ((x·7+y·13+f·17+id)%256, (x·3+y·5+f·11+2id)%256,
    * (x·11+y+f·29+3id)%256). Lossless, so sampled-frame channel means are
    * exactly the formula's — the oracle recomputes them without a codec. */
  def syntheticAvi(id: Long, audioTrack: Boolean = false,
                   secondVideoTrack: Boolean = false): Array[Byte] = {
    val w = 8 + (id % 5).toInt; val h = 6 + (id % 5).toInt
    val nFrames = 3 + (id % 4).toInt
    val stride = ((w * 3 + 3) / 4) * 4
    val frames = (0 until nFrames).map { f =>
      val data = new Array[Byte](stride * h)
      var y = 0
      while (y < h) {
        val rowOff = (h - 1 - y) * stride // bottom-up
        var x = 0
        while (x < w) {
          data(rowOff + x * 3) = ((x * 11 + y + f * 29 + 3 * id) % 256).toByte     // B
          data(rowOff + x * 3 + 1) = ((x * 3 + y * 5 + f * 11 + 2 * id) % 256).toByte // G
          data(rowOff + x * 3 + 2) = ((x * 7 + y * 13 + f * 17 + id) % 256).toByte // R
          x += 1
        }
        y += 1
      }
      data
    }
    buildAvi(w, h, fps = 10, frames, handler = "DIB ", compression = 0, chunkId = "00db",
      audioTrack = audioTrack, secondVideoTrack = secondVideoTrack)
  }

  /** Deterministic MJPEG AVI per id: the same pixel formula encoded as JPEG
    * frames (`javax.imageio`) in `00dc` chunks — exercises the REAL
    * compressed-codec path of [[VideoStatsDecoder]]. JPEG is lossy, so
    * specs assert container stats + decode success, not exact means. */
  def syntheticMjpegAvi(id: Long): Array[Byte] = {
    val w = 8 + (id % 5).toInt; val h = 6 + (id % 5).toInt
    val nFrames = 3 + (id % 4).toInt
    val frames = (0 until nFrames).map { f =>
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val r = ((x * 7 + y * 13 + f * 17 + id) % 256).toInt
          val g = ((x * 3 + y * 5 + f * 11 + 2 * id) % 256).toInt
          val b = ((x * 11 + y + f * 29 + 3 * id) % 256).toInt
          img.setRGB(x, y, (r << 16) | (g << 8) | b)
          x += 1
        }
        y += 1
      }
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", out)
      out.toByteArray
    }
    buildAvi(w, h, fps = 10, frames,
      handler = "MJPG", compression = fourccLe("MJPG"), chunkId = "00dc")
  }

  private def fourccLe(s: String): Int =
    (s(0) & 0xFF) | ((s(1) & 0xFF) << 8) | ((s(2) & 0xFF) << 16) | ((s(3) & 0xFF) << 24)

  /** Minimal spec-correct AVI writer: RIFF('AVI ') { LIST(hdrl){ avih,
    * LIST(strl){ strh, strf } [, audio strl] }, LIST(movi){ frame chunks
    * [interleaved '01wb' audio] } }. `audioTrack` adds a stream-1 PCM
    * audio strl whose WAVEFORMATEX strf and '01wb' chunks exercise the
    * decoder's stream gating (an ungated parser lets the audio strf
    * clobber the bitmap header and mixes audio bytes into pixel stats). */
  private def buildAvi(w: Int, h: Int, fps: Int, frames: Seq[Array[Byte]],
                       handler: String, compression: Int, chunkId: String,
                       audioTrack: Boolean = false,
                       secondVideoTrack: Boolean = false): Array[Byte] = {
    def le(i: Int): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(4).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.putInt(i); b.array()
    }
    def le16(i: Int): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(2).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.putShort(i.toShort); b.array()
    }
    def fcc(s: String) = s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    def chunk(id: String, payload: Array[Byte]): Array[Byte] = {
      val pad = if (payload.length % 2 == 1) Array[Byte](0) else Array.empty[Byte]
      fcc(id) ++ le(payload.length) ++ payload ++ pad
    }
    def list(listType: String, children: Array[Byte]): Array[Byte] =
      fcc("LIST") ++ le(children.length + 4) ++ fcc(listType) ++ children
    val maxFrame = frames.map(_.length).max
    val avih = le(1000000 / fps) ++ le(0) ++ le(0) ++ le(0) ++
      le(frames.length) ++ le(0) ++ le(if (audioTrack) 2 else 1) ++ le(maxFrame) ++
      le(w) ++ le(h) ++ le(0) ++ le(0) ++ le(0) ++ le(0)
    val strh = fcc("vids") ++ fcc(handler) ++ le(0) ++ le16(0) ++ le16(0) ++
      le(0) ++ le(1) ++ le(fps) ++ le(0) ++ le(frames.length) ++
      le(maxFrame) ++ le(0) ++ le(0) ++
      le16(0) ++ le16(0) ++ le16(w) ++ le16(h)
    val strf = le(40) ++ le(w) ++ le(h) ++ le16(1) ++ le16(24) ++
      le(compression) ++ le(maxFrame) ++ le(0) ++ le(0) ++ le(0) ++ le(0)
    val videoStrl = list("strl", chunk("strh", strh) ++ chunk("strf", strf))
    val (audioStrl, audioChunk) =
      if (!audioTrack) (Array.empty[Byte], Array.empty[Byte])
      else {
        val astrh = fcc("auds") ++ Array.fill[Byte](52)(0)
        // WAVEFORMATEX-ish PCM blob (30 bytes >= the parser's 20-byte
        // strf floor): its bytes at the bitmap bitCount/compression
        // offsets are NOT 24/0, so an ungated parse visibly breaks
        val astrf = le16(1) ++ le16(1) ++ le(8000) ++ le(16000) ++
          le16(2) ++ le16(16) ++ Array.fill[Byte](14)(0)
        (list("strl", chunk("strh", astrh) ++ chunk("strf", astrf)),
         chunk("01wb", Array.fill[Byte](64)(7)))
      }
    // a SECOND vids strl (MJPG, 16bpp — both fields differ from stream
    // 0's) with no frame chunks of its own: a parser that re-arms the
    // strf parse on every vids strh lets this clobber stream 0's format
    // while the frames stay gated to stream 0 — mis-decoding valid video
    val secondVideoStrl =
      if (!secondVideoTrack) Array.empty[Byte]
      else {
        val strh2 = fcc("vids") ++ fcc("MJPG") ++ le(0) ++ le16(0) ++ le16(0) ++
          le(0) ++ le(1) ++ le(fps * 2) ++ le(0) ++ le(frames.length) ++
          le(maxFrame) ++ le(0) ++ le(0) ++
          le16(0) ++ le16(0) ++ le16(w) ++ le16(h)
        val strf2 = le(40) ++ le(w) ++ le(h) ++ le16(1) ++ le16(16) ++
          le(0x47504A4D) ++ le(maxFrame) ++ le(0) ++ le(0) ++ le(0) ++ le(0)
        list("strl", chunk("strh", strh2) ++ chunk("strf", strf2))
      }
    val hdrl = list("hdrl",
      chunk("avih", avih) ++ videoStrl ++ audioStrl ++ secondVideoStrl)
    val movi = list("movi",
      frames.flatMap(fdata => chunk(chunkId, fdata) ++ audioChunk).toArray)
    val body = fcc("AVI ") ++ hdrl ++ movi
    fcc("RIFF") ++ le(body.length) ++ body
  }

  /** Shared attach-payload shape: encode a deterministic payload per id
    * INSIDE the partition (like a real media fetch/transcode would), one
    * (id, payload) row out. The three public attachers differ only in the
    * generator. */
  private def withSyntheticPayload(df: DataFrame, idCol: String, payloadCol: String)
                                  (gen: Long => Array[Byte]): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField(payloadCol, BinaryType, nullable = false)))
    val rdd = df.select(col(idCol).cast("long")).rdd.mapPartitions { it =>
      it.map { r => Row(r.getLong(0), gen(r.getLong(0))) }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Attach a synthetic DIB AVI payload per row (distributed encode, like
    * [[withSyntheticImages]]). */
  def withSyntheticVideo(df: DataFrame, idCol: String,
                         payloadCol: String = "payload"): DataFrame =
    withSyntheticPayload(df, idCol, payloadCol)(syntheticAvi(_))

  /** Deterministic synthetic WAV per id (PCM 16-bit mono, 8 kHz):
    * n = 400 + id%100 samples, sample(i) = ((i·7919 + id·104729) mod 65536)
    * − 32768 — integer PCM, losslessly round-tripped, so decoded stats are
    * exactly the formula's. */
  def syntheticWav(id: Long): Array[Byte] = {
    val n = 400 + (id % 100).toInt
    val pcm = new Array[Byte](n * 2)
    val bb = java.nio.ByteBuffer.wrap(pcm).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var i = 0
    while (i < n) {
      bb.putShort(i * 2, (((i.toLong * 7919 + id * 104729) % 65536) - 32768).toShort)
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** Attach a synthetic WAV payload per row (distributed encode, like
    * [[withSyntheticImages]]). */
  def withSyntheticAudio(df: DataFrame, idCol: String,
                         payloadCol: String = "payload"): DataFrame =
    withSyntheticPayload(df, idCol, payloadCol)(syntheticWav)

  /** Decode + featurize through a [[PayloadDecoder]]: one decoder init per
    * partition, fixed-width double vector out, `decode_ok=false` + zeros for
    * undecodable payloads. The distributed shape of a production media
    * pipeline — only the codec inside the seam varies. */
  def extractWith(df: DataFrame, idCol: String, payloadCol: String,
                  decoder: PayloadDecoder): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("features", ArrayType(DoubleType, containsNull = false), nullable = false),
      StructField("decode_ok", BooleanType, nullable = false)))
    val dim = decoder.dim
    val rdd = df.select(col(idCol).cast("long"), col(payloadCol)).rdd.mapPartitions { it =>
      decoder.init() // once per partition, not per row
      it.map { r =>
        val bytes = r.getAs[Array[Byte]](1)
        // NULL payload (nullable source, failed upstream fetch) is an
        // undecodable row by contract — guarded here so no user-supplied
        // decoder can turn it into a task-killing NPE.
        val decoded = if (bytes == null) None else decoder.decode(bytes)
        decoded match {
          case Some(f) => Row(r.getLong(0), f, true)
          case None    => Row(r.getLong(0), new Array[Double](dim), false)
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Deterministic synthetic PNG per id for testing the REAL codec path
    * end-to-end: w=8+id%9, h=8+id%7, pixel(x,y) =
    * ((x·7+y·13+id)%256, (x·3+y·5+2id)%256, (x·11+y+3id)%256). PNG is
    * lossless, so decoded stats are exactly the formula's — an oracle can
    * recompute them without any codec. */
  def syntheticPng(id: Long): Array[Byte] = {
    val w = 8 + (id % 9).toInt; val h = 8 + (id % 7).toInt
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = ((x * 7 + y * 13 + id) % 256).toInt
        val g = ((x * 3 + y * 5 + 2 * id) % 256).toInt
        val b = ((x * 11 + y + 3 * id) % 256).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Attach a synthetic PNG payload per row (distributed; the encoder runs
    * inside the partition like a real media fetch/transcode would). */
  def withSyntheticImages(df: DataFrame, idCol: String,
                          payloadCol: String = "payload"): DataFrame =
    withSyntheticPayload(df, idCol, payloadCol)(syntheticPng)

  /** Stand-in media payload: utf-8 bytes of a text column. A real pipeline
    * reads `binaryFile` sources or parquet with real media bytes. */
  def withPayload(df: DataFrame, textCol: String, payloadCol: String = "payload"): DataFrame =
    df.withColumn(payloadCol, col(textCol).cast("binary"))

  /** Payload metadata the way a media pipeline tracks it (size, magic byte). */
  def payloadMeta(df: DataFrame, payloadCol: String = "payload"): DataFrame =
    df.withColumn("n_bytes", length(col(payloadCol)).cast("long"))
      .withColumn("head_byte", expr(s"cast(conv(hex(substring($payloadCol, 1, 1)), 16, 10) as long)"))

  /** Decode + featurize each payload into a dim-width float vector using
    * the codec-INDEPENDENT folded byte histogram — deterministic,
    * locality-preserving for byte-similar payloads, replicable by any
    * engine (the bitwise-oracle-checked path). Real codecs go through
    * [[extractWith]] + a [[PayloadDecoder]] ([[ImageStatsDecoder]],
    * [[AudioStatsDecoder]], [[VideoStatsDecoder]]). */
  def extractFeatures(df: DataFrame, idCol: String, payloadCol: String, dim: Int = 16,
                      normalize: Boolean = true): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("features", ArrayType(FloatType, containsNull = false), nullable = false)))
    val rdd = df.select(col(idCol).cast("long"), col(payloadCol)).rdd.mapPartitions { it =>
      // one decoder/model init per partition would go here (not per row)
      it.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        Row(id, fakeDecode(bytes, dim, normalize))
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** STUB decode: folded byte histogram, optionally L2-normalized float32
    * (`normalize=false` keeps raw integer counts — exactly reproducible by
    * any engine, which is what the oracle-checked query uses). */
  private def fakeDecode(bytes: Array[Byte], dim: Int, normalize: Boolean): Array[Float] = {
    val hist = new Array[Float](dim)
    var i = 0
    while (i < bytes.length) { hist((bytes(i) & 0xff) % dim) += 1.0f; i += 1 }
    if (!normalize) return hist
    var acc = 0.0f
    hist.foreach(x => acc += x * x)
    val norm = math.sqrt(acc.toDouble).toFloat
    if (norm == 0.0f) hist else hist.map(_ / norm)
  }
}
