package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media (image/audio/video) travels as an
  * opaque `binary` column with typed metadata alongside; decode / feature
  * extraction runs batched per partition.
  *
  * The DECODE STEP IS A STUB: this container has no image/audio codecs, so
  * [[extractFeatures]] uses a deterministic fake (folded byte histogram,
  * L2-normalized) clearly marked below. Everything around it is the real
  * production shape: binary-in/fixed-width-vector-out schema, mapPartitions
  * batching (one decoder init per partition, the JVM analog of a Pandas-UDF
  * batch), and the output feeding directly into the vector operators
  * (search/dedup) downstream.
  */
object Multimodal {

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
