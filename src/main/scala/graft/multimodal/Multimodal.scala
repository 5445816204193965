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
  * Audio/video codecs aren't in the JDK; they'd plug in as further
  * [[PayloadDecoder]]s behind the identical seam.
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
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        catch { case _: java.io.IOException => null }
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
      val in =
        try javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        catch {
          case _: javax.sound.sampled.UnsupportedAudioFileException => null
          case _: java.io.IOException => null
        }
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
        } catch { case _: java.io.IOException => None }
        finally ais.close()
      }
    }
  }

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
                         payloadCol: String = "payload"): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField(payloadCol, BinaryType, nullable = false)))
    val rdd = df.select(col(idCol).cast("long")).rdd.mapPartitions { it =>
      it.map { r => Row(r.getLong(0), syntheticWav(r.getLong(0))) }
    }
    spark.createDataFrame(rdd, outSchema)
  }

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
        decoder.decode(r.getAs[Array[Byte]](1)) match {
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
                          payloadCol: String = "payload"): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField(payloadCol, BinaryType, nullable = false)))
    val rdd = df.select(col(idCol).cast("long")).rdd.mapPartitions { it =>
      it.map { r => Row(r.getLong(0), syntheticPng(r.getLong(0))) }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Stand-in media payload: utf-8 bytes of a text column. A real pipeline
    * reads `binaryFile` sources or parquet with real media bytes. */
  def withPayload(df: DataFrame, textCol: String, payloadCol: String = "payload"): DataFrame =
    df.withColumn(payloadCol, col(textCol).cast("binary"))

  /** Payload metadata the way a media pipeline tracks it (size, magic byte). */
  def payloadMeta(df: DataFrame, payloadCol: String = "payload"): DataFrame =
    df.withColumn("n_bytes", length(col(payloadCol)).cast("long"))
      .withColumn("head_byte", expr(s"cast(conv(hex(substring($payloadCol, 1, 1)), 16, 10) as long)"))

  /** Decode + featurize each payload into a dim-width float vector.
    *
    * ??? REAL DECODER GOES HERE: replace `fakeDecode` with the actual codec
    * (JPEG decode → pixel stats, PCM decode → spectral features, …). The
    * fake is a folded byte histogram — deterministic, locality-preserving
    * for byte-similar payloads, and cheap — so the plumbing and everything
    * downstream is fully testable without codecs. */
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
