package graft.interop

import java.io.{DataInputStream, EOFException, InputStream}
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import graft.collection.{CollectionMeta, GraftCatalog, IndexField}
import graft.functions.QuantKernels

/** One-way importer for the reference engine's persisted collection buckets —
  * the migration story for a user moving an existing coltt deployment onto
  * this engine. A coltt bucket holds three objects
  * (`edge/edge_helper.go:85-117`):
  *
  *   `<col>.meta.json`     — collection Metadata JSON
  *                           (`edge/edge_metadata.go:22-35`): dim, distance
  *                           enum (0=Cosine, 1=Euclidean), quantization enum
  *                           (0=None, 1=F16, 2=F8, 3=BF16), the index-field
  *                           map, versioning flag.
  *   `<col>.vertex`        — the binary vertex blob
  *                           (`edge/none_vectorstore.go:308-423` encode /
  *                           :425-516 decode): 16 shard sections, each
  *                           `u64 count` then per entry `u64 key`,
  *                           `u32 vecLen`, vecLen vector elements (f32 BE for
  *                           None; u16 f16/bf16 bits or u8 f8 bits for the
  *                           quantized stores, `f16_vectorstore.go:317-343`),
  *                           `u32 metaCount`, then per metadata entry
  *                           `u16 keyLen + keyBytes` and a 1-byte type tag:
  *                           0 = i64 BE, 1 = string (u16 len + bytes),
  *                           2 = f64 BE, 3 = bool byte. All big-endian.
  *   `<col>.inverted.raw`  — the serialized roaring-bitmap inverted index.
  *                           NOT read on IMPORT: its postings are derivable
  *                           from the vertex metadata, and this engine's
  *                           filters run on parquet pushdown/statistics
  *                           instead of posting lists. (The reference
  *                           itself LOADS the file verbatim on its own
  *                           startup path — edge/edge.go:374,
  *                           none_vectorstore.go:279 — which is why the
  *                           EXPORT side, [[ColttExport]], must write a
  *                           real one.)
  *
  * The u64 vertex keys are the reference's internal snowflake commit ids
  * (`edge/id_generator.go:24-39`) — identity lives in the primary-key
  * metadata field, so the keys are NOT imported; rows re-key by their
  * declared pk, exactly as the reference's own upsert path resolves identity
  * (`none_vectorstore.go:66-85`).
  *
  * Scale shape: the blob is parsed in ONE sequential driver pass — inherent
  * to the format (shard sections have no length prefix, so random access is
  * impossible), and within the source system's own envelope by construction:
  * a coltt snapshot is the serialized form of a collection the reference
  * holds fully in memory on one node. The decoded rows then take the normal
  * distributed ingest path (validate → insert → flush), so everything after
  * the parse scales like any other bulk load. */
object ColttImport {

  /** The reference's enum wire values (gen/protoc/v4/edgepb/edge.pb.go:97-146). */
  private val distanceNames = Map(0 -> "cosine", 1 -> "euclidean")
  private val quantizationNames = Map(0 -> "none", 1 -> "f16", 2 -> "f8", 3 -> "bf16")
  private val fieldTypeNames = Map(0 -> "string", 1 -> "integer", 2 -> "float", 3 -> "boolean")

  private val ShardCount = 16 // EDGE_MAP_SHARD_COUNT, edge/constants.go

  /** Parse-time sanity bounds — generous multiples of anything the
    * reference can produce (its protos cap dim at u32 but real collections
    * sit ≤ a few thousand dims and ≤ hundreds of metadata keys). Their job
    * is to turn a corrupt length field into a loud error instead of a
    * multi-gigabyte allocation. */
  private val MaxDim = 1 << 16
  private val MaxMetaEntries = 1 << 16
  private val MaxVectorsPerVertex = 1 << 12

  /** Shared meta.json header parse (dim/distance/quantization/versioning
    * plus the index_type walk — the JSON layout is identical between the
    * edge and experimental engines); `fieldOf(colName, typeInt, fieldJson)`
    * maps one declared field, engine-specifically. */
  private def parseMetaCommon(name: String, metaJson: String)(
      fieldOf: (String, Int, org.json4s.JValue) => IndexField): CollectionMeta = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    implicit val fmts: Formats = DefaultFormats
    val j = JsonMethods.parse(metaJson)
    val dist = (j \ "distance").extract[Int]
    val quant = (j \ "quantization").extract[Int]
    val fields = (j \ "index_type") match {
      case JObject(kvs) => kvs.map { case (col, fj) =>
        fieldOf((fj \ "index_name").extractOpt[String].getOrElse(col),
          (fj \ "index_type").extract[Int], fj)
      }.sortBy(_.name)
      case _ => throw new IllegalArgumentException("meta.json has no index_type map")
    }
    CollectionMeta(
      name = name,
      dim = (j \ "dim").extract[Int],
      distance = distanceNames.getOrElse(dist,
        throw new IllegalArgumentException(s"unknown distance enum $dist")),
      quantization = quantizationNames.getOrElse(quant,
        throw new IllegalArgumentException(s"unknown quantization enum $quant")),
      fields = fields,
      versioning = (j \ "versioning").extractOpt[Boolean].getOrElse(false))
  }

  private def jBool(fj: org.json4s.JValue, key: String): Boolean = {
    import org.json4s._
    implicit val fmts: Formats = DefaultFormats
    (fj \ key).extractOpt[Boolean].getOrElse(false)
  }

  /** Parse `<col>.meta.json` into this engine's [[CollectionMeta]].
    * Quantization is imported as declared — the reference persists the
    * QUANTIZED vector bits, and [[parseVertexBlob]] decodes them back to the
    * exact float values the reference's own loader produces. */
  def parseMetadata(name: String, metaJson: String): CollectionMeta =
    parseMetaCommon(name, metaJson) { (fname, t, fj) =>
      IndexField(fname,
        fieldTypeNames.getOrElse(t, throw new IllegalArgumentException(
          s"unknown index_type $t on field $fname")),
        enableNull = jBool(fj, "enable_null"),
        primaryKey = jBool(fj, "primary_key"))
    }

  /** One decoded vertex: the (dequantized) vector and the typed metadata map. */
  final case class ColttVertex(key: Long, vector: Array[Float], meta: Map[String, Any])

  /** Bytes per stored vector element for a quantization. */
  private def elementWidth(quantization: String): Int = quantization match {
    case "none" => 4
    case "f16" | "bf16" => 2
    case "f8" => 1
    case q => throw new IllegalArgumentException(s"unknown quantization: $q")
  }

  /** Decode one vertex entry from an already-positioned stream. */
  private def parseOneVertex(d: DataInputStream, quantization: String): ColttVertex = {
    def readElem(): Float = quantization match {
      case "none" => java.lang.Float.intBitsToFloat(d.readInt())
      case "f16"  => QuantKernels.f16ToFloat(d.readShort())
      case "bf16" => QuantKernels.bf16ToFloat(d.readShort())
      case "f8"   => QuantKernels.f8ToFloat(d.readByte())
      case q      => throw new IllegalArgumentException(s"unknown quantization: $q")
    }
    val key = d.readLong()
    val vecLen = d.readInt()
    // bound BEFORE allocating: a corrupt/hostile length field must fail
    // loudly, not drive a multi-GB allocation (same rule on every count)
    require(vecLen >= 0 && vecLen <= MaxDim, s"corrupt vector length $vecLen")
    val vec = new Array[Float](vecLen)
    var i = 0
    while (i < vecLen) { vec(i) = readElem(); i += 1 }
    val metaCount = d.readInt()
    require(metaCount >= 0 && metaCount <= MaxMetaEntries, s"corrupt metadata count $metaCount")
    val meta = mutable.LinkedHashMap.empty[String, Any]
    var k = 0
    while (k < metaCount) {
      val keyLen = d.readUnsignedShort()
      val keyBytes = new Array[Byte](keyLen)
      d.readFully(keyBytes)
      val metaKey = new String(keyBytes, StandardCharsets.UTF_8)
      meta(metaKey) = d.readByte() match {
        case 0 => d.readLong()
        case 1 =>
          val len = d.readUnsignedShort()
          val b = new Array[Byte](len)
          d.readFully(b)
          new String(b, StandardCharsets.UTF_8)
        case 2 => d.readDouble()
        case 3 => d.readByte() != 0
        case t => throw new IllegalArgumentException(s"unsupported metadata type tag: $t")
      }
      k += 1
    }
    ColttVertex(key, vec, meta.toMap)
  }

  /** LAZY decode of one shard section (`u64 count` + entries) — the unit
    * both import paths share. The distributed path consumes this as a true
    * stream (one vertex live at a time); only the sequential driver path
    * materializes it. */
  private def shardSectionIterator(d: DataInputStream,
                                   quantization: String): Iterator[ColttVertex] = {
    val entryCount = d.readLong()
    require(entryCount >= 0 && entryCount < Int.MaxValue, s"corrupt shard count $entryCount")
    new Iterator[ColttVertex] {
      private var j = 0L
      override def hasNext: Boolean = j < entryCount
      override def next(): ColttVertex = { j += 1; parseOneVertex(d, quantization) }
    }
  }

  private def parseShardSection(d: DataInputStream, quantization: String): Seq[ColttVertex] =
    shardSectionIterator(d, quantization).toIndexedSeq

  /** Sequential decode of a `<col>.vertex` blob (format in the class doc).
    * `quantization` selects the element width/decoder; the decoded floats are
    * bit-identical to what the reference's own `LoadVertex` + dequantize
    * produces. */
  def parseVertexBlob(in: InputStream, quantization: String): Seq[ColttVertex] = {
    val d = new DataInputStream(new java.io.BufferedInputStream(in, 1 << 20))
    try (0 until ShardCount).flatMap(_ => parseShardSection(d, quantization))
    catch {
      case _: EOFException =>
        throw new IllegalArgumentException(
          "truncated coltt vertex blob: hit EOF before all 16 shard sections were read")
    } finally d.close()
  }

  /** Byte offset of each of the 16 shard sections, found by ONE sequential
    * skip-scan that reads only the length fields (O(blob) IO, O(1) memory —
    * the format has no section index, so this is the cheapest possible
    * partitioning pass). Every skip honors the same sanity bounds as the
    * real parse. */
  def sectionOffsets(in: InputStream, quantization: String): Array[Long] = {
    val width = elementWidth(quantization)
    val d = new DataInputStream(new java.io.BufferedInputStream(in, 1 << 20))
    var pos = 0L
    def skipFully(n: Long): Unit = {
      var left = n
      while (left > 0) {
        val s = d.skip(left)
        if (s <= 0) { // skip() may return 0 at EOF — distinguish via a read
          if (d.read() < 0) throw new EOFException()
          left -= 1
        } else left -= s
      }
      pos += n
    }
    def readInt(): Int = { pos += 4; d.readInt() }
    def readLong(): Long = { pos += 8; d.readLong() }
    def readU16(): Int = { pos += 2; d.readUnsignedShort() }
    def readTag(): Int = { pos += 1; val t = d.readByte(); t.toInt }
    val offs = new Array[Long](ShardCount)
    try {
      var shard = 0
      // the LAST section's offset is known the moment section 14's scan
      // ends — don't burn up to 1/16 of the blob's IO scanning it; the
      // executor parse validates every section anyway
      while (shard < ShardCount - 1) {
        offs(shard) = pos
        val count = readLong()
        require(count >= 0 && count < Int.MaxValue, s"corrupt shard count $count")
        var j = 0L
        while (j < count) {
          skipFully(8) // key
          val vecLen = readInt()
          require(vecLen >= 0 && vecLen <= MaxDim, s"corrupt vector length $vecLen")
          skipFully(vecLen.toLong * width)
          val metaCount = readInt()
          require(metaCount >= 0 && metaCount <= MaxMetaEntries,
            s"corrupt metadata count $metaCount")
          var k = 0
          while (k < metaCount) {
            skipFully(readU16().toLong) // key bytes
            readTag() match {
              case 0 => skipFully(8)
              case 1 => skipFully(readU16().toLong)
              case 2 => skipFully(8)
              case 3 => skipFully(1)
              case t => throw new IllegalArgumentException(s"unsupported metadata type tag: $t")
            }
            k += 1
          }
          j += 1
        }
        shard += 1
      }
      offs(ShardCount - 1) = pos
    } catch {
      case _: EOFException =>
        throw new IllegalArgumentException(
          "truncated coltt vertex blob: hit EOF before all 16 shard sections were read")
    } finally d.close()
    offs
  }

  /** Decoded vertices → a DataFrame in this engine's ingest shape: metadata
    * columns by declared name, vector in the `vector` column.
    * Missing nullable fields stay NULL (insert-time validation applies the
    * declared defaults, the same standardAnalyzer semantics). */
  /** The ingest frame's schema — ONE definition shared by the sequential
    * and distributed paths so they cannot desynchronize. */
  private def ingestSchema(fields: Seq[IndexField]): StructType =
    StructType(
      fields.map(f => StructField(f.name, f.dataType, nullable = true)) :+
        StructField("vector", ArrayType(FloatType, containsNull = false),
          nullable = false))

  def verticesToRows(spark: SparkSession, meta: CollectionMeta,
                     vertices: Seq[ColttVertex]): DataFrame = {
    val fields = meta.fields
    val rows = vertices.map(v => vertexToRow(fields, v))
    spark.createDataFrame(spark.sparkContext.parallelize(rows.toSeq, 32),
      ingestSchema(fields))
  }

  /** One vertex → an ingest Row under the declared fields (shared by the
    * driver-side and executor-side paths — must stay serializable-closure
    * friendly: only case classes and primitives). The map[Any] ascription
    * matters: an if/else over (Double, Long) branches unifies to Double and
    * silently widens the Long — guard patterns keep each branch's own type. */
  private def vertexToRow(fields: Seq[IndexField], v: ColttVertex): Row =
    Row.fromSeq(fields.map(f => v.meta.get(f.name).map[Any] {
      case i: Long if f.fieldType == "float"     => i.toDouble
      case x: Double if f.fieldType == "integer" => x.toLong
      case other                                 => other
    }.orNull) :+ v.vector.toSeq)

  /** [[importSnapshot]] without the O(corpus) driver-memory envelope: one
    * driver-side SKIP-SCAN finds the 16 shard-section offsets (reads only
    * length fields — O(blob) IO, O(1) memory), then each section is parsed
    * by an EXECUTOR task seeking straight to its offset and STREAMING
    * entries one at a time (one vertex live per task, never a section-sized
    * buffer), and rows flow into the normal distributed ingest. Parallelism
    * is format-bound at 16 (the encoder's EDGE_MAP_SHARD_COUNT); with the
    * reference's roughly uniform key sharding the sections are balanced.
    * Results are identical to [[importSnapshot]] (same entry parser). */
  def importSnapshotDistributed(spark: SparkSession, catalog: GraftCatalog,
                                name: String, srcDir: String): Long = {
    val srcPath = new Path(srcDir)
    val fs = srcPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def readAll(p: Path): String = {
      val in = fs.open(p)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    }
    val meta = parseMetadata(name, readAll(new Path(srcDir, s"$name.meta.json")))
    val vertexPath = new Path(srcDir, s"$name.vertex")
    val offsets = sectionOffsets(fs.open(vertexPath), meta.quantization)
    val fields = meta.fields
    val quant = meta.quantization
    val pathStr = vertexPath.toString
    val serConf = new org.apache.spark.sql.graft.SerializableHadoopConf(
      spark.sparkContext.hadoopConfiguration)
    val schema = ingestSchema(fields)
    val rowsRdd = spark.sparkContext
      .parallelize(offsets.toIndexedSeq, offsets.length)
      .flatMap { off =>
        val p = new Path(pathStr)
        val in = p.getFileSystem(serConf.value).open(p)
        in.seek(off)
        val d = new DataInputStream(new java.io.BufferedInputStream(in, 1 << 20))
        // the stream must outlive this flatMap call (the iterator is
        // consumed downstream) — close on task completion, not here
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => d.close()))
        def truncated() = new IllegalArgumentException(
          s"truncated coltt vertex blob: section at offset $off hit EOF")
        val base =
          try shardSectionIterator(d, quant)
          catch { case _: EOFException => throw truncated() }
        // translate an EOF DURING consumption too (the count header read
        // above is not the only place a truncated section can surface)
        new Iterator[Row] {
          override def hasNext: Boolean = base.hasNext
          override def next(): Row =
            try vertexToRow(fields, base.next())
            catch { case _: EOFException => throw truncated() }
        }
      }
    catalog.createCollection(meta)
    try {
      catalog.loadCollection(name)
      catalog.insert(name, spark.createDataFrame(rowsRdd, schema))
      catalog.flush(name)
    } catch { case e: Throwable =>
      try catalog.dropCollection(name) catch { case _: Throwable => () }
      throw e
    }
    // count AFTER the flush: the snapshot is the materialized result, so
    // this reads the published parquet instead of re-parsing the blob
    catalog.snapshot(name).count()
  }

  /** Encode vertices into the reference's blob format (the exact inverse of
    * [[parseVertexBlob]]) — the write half of the interop story: round-trip
    * fixtures, and exporting a (small) collection BACK to a coltt
    * deployment. Entries are distributed over the 16 shard sections by
    * `key % 16`; the reference's own sharding hash is irrelevant to
    * compatibility because its loader reads sections strictly in order. */
  def encodeVertexBlob(vertices: Seq[ColttVertex], quantization: String = "none"): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val d = new java.io.DataOutputStream(bos)
    val byShard = vertices.groupBy(v => ((v.key % ShardCount) + ShardCount) % ShardCount)
    (0 until ShardCount).foreach { s =>
      val entries = byShard.getOrElse(s.toLong, Seq.empty)
      d.writeLong(entries.size.toLong)
      entries.foreach { v =>
        d.writeLong(v.key)
        d.writeInt(v.vector.length)
        v.vector.foreach { f =>
          quantization match {
            case "none" => d.writeInt(java.lang.Float.floatToIntBits(f))
            case "f16"  => d.writeShort(QuantKernels.floatToF16(f))
            case "bf16" => d.writeShort(QuantKernels.floatToBf16(f))
            case "f8"   => d.writeByte(QuantKernels.floatToF8(f))
            case q      => throw new IllegalArgumentException(s"unknown quantization: $q")
          }
        }
        d.writeInt(v.meta.size)
        v.meta.foreach { case (k, value) => writeMetaEntry(d, k, value) }
      }
    }
    d.flush()
    bos.toByteArray
  }

  /** One vertex metadata wire entry (u16 keyLen + key, then type tag +
    * payload: 0 = i64 BE, 1 = string u16+bytes, 2 = f64 BE, 3 = bool) —
    * THE single writer shared by [[encodeVertexBlob]] and
    * [[ColttExport]], so the two encoders of this byte format cannot
    * drift. */
  private[interop] def writeMetaEntry(d: java.io.DataOutputStream, key: String,
                                      value: Any): Unit = {
    val kb = key.getBytes(StandardCharsets.UTF_8)
    require(kb.length <= 65535, s"metadata key too long: $key")
    d.writeShort(kb.length)
    d.write(kb)
    value match {
      case i: Long    => d.writeByte(0); d.writeLong(i)
      case s0: String =>
        d.writeByte(1)
        val sb = s0.getBytes(StandardCharsets.UTF_8)
        require(sb.length <= 65535, s"metadata string too long: $s0")
        d.writeShort(sb.length); d.write(sb)
      case x: Double  => d.writeByte(2); d.writeDouble(x)
      case b: Boolean => d.writeByte(3); d.writeByte(if (b) 1 else 0)
      case other => throw new IllegalArgumentException(
        s"unsupported metadata type: ${other.getClass.getName}")
    }
  }

  /** Full import: read `<name>.meta.json` + `<name>.vertex` from `srcDir`,
    * create the collection in `catalog`, bulk-insert every vertex, and flush
    * the first snapshot. Returns the row count. The source collection must
    * not already exist in the catalog. */
  def importSnapshot(spark: SparkSession, catalog: GraftCatalog,
                     name: String, srcDir: String): Long = {
    val fs = new Path(srcDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    def readAll(p: Path): String = {
      val in = fs.open(p)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    }
    val meta = parseMetadata(name, readAll(new Path(srcDir, s"$name.meta.json")))
    val vertexIn = fs.open(new Path(srcDir, s"$name.vertex"))
    val vertices = parseVertexBlob(vertexIn, meta.quantization)
    catalog.createCollection(meta)
    // the target did not exist before this call (createCollection enforces
    // it), so a failure past this point rolls the collection back — the
    // import stays retryable instead of stranding a half-imported target
    // behind an "already exists" error
    try {
      catalog.loadCollection(name)
      if (vertices.nonEmpty)
        catalog.insert(name, verticesToRows(spark, meta, vertices))
      catalog.flush(name)
    } catch { case e: Throwable =>
      try catalog.dropCollection(name) catch { case _: Throwable => () }
      throw e
    }
    vertices.size.toLong
  }

  // ---- experimental (CFLAT multi-vector) bucket format ----

  /** Parse the EXPERIMENTAL engine's `<col>.meta.json`
    * (`experimental/experimental_metadata.go:24-36`): same JSON shape as
    * edge but the index_type map carries `index_type = 4` VECTOR fields
    * (proto v3 experimental.proto IndexType) and — crucially — NO
    * primary_key flag: identity in the experimental store is the vertex
    * map's string key itself (`multi_vector_vertex.go:38`,
    * `map[string]VertexEdge`). The import therefore synthesizes a string pk
    * column, `pkName`, to carry those keys. */
  def parseExperimentalMetadata(name: String, metaJson: String,
                                pkName: String = "_key"): CollectionMeta = {
    val parsed = parseMetaCommon(name, metaJson) { (fname, t, fj) =>
      if (t == 4) IndexField(fname, "vector")
      else IndexField(fname,
        fieldTypeNames.getOrElse(t, throw new IllegalArgumentException(
          s"unknown index_type $t on field $fname")),
        enableNull = jBool(fj, "enable_null"))
    }
    require(!parsed.fields.exists(_.name == pkName),
      s"pk column name $pkName collides with a declared field — pass another pkName")
    parsed.copy(fields = IndexField(pkName, "string", primaryKey = true) +: parsed.fields)
  }

  /** One decoded experimental vertex: string key, named vectors, metadata
    * (tags 0/1 only — the experimental encoder persists i64 and string,
    * `multi_vector_vertex.go:245-271`). */
  final case class ColttMvVertex(key: String, vectors: Map[String, Array[Float]],
                                 meta: Map[String, Any])

  /** Sequential decode of an experimental `<col>.vertex` blob
    * (`multi_vector_vertex.go:183-243` encode / :279-352 decode): 16 shard
    * sections, each `u64 count`, then per entry `u16 keyLen + key`,
    * `u32 mvCount` of (`u16 nameLen + name`, `u32 dim`, dim×f32 BE), and
    * `u32 metaCount` of (`u16 keyLen + key`, tag 0 = i64 BE | 1 = string).
    * Elements are ALWAYS f32 — the experimental store persists raw floats
    * regardless of the declared quantization enum. */
  def parseMultiVectorBlob(in: InputStream): Seq[ColttMvVertex] = {
    val d = new DataInputStream(new java.io.BufferedInputStream(in, 1 << 20))
    val out = mutable.ArrayBuffer.empty[ColttMvVertex]
    def readString(): String = {
      val len = d.readUnsignedShort()
      val b = new Array[Byte](len)
      d.readFully(b)
      new String(b, StandardCharsets.UTF_8)
    }
    try {
      var shard = 0
      while (shard < ShardCount) {
        val count = d.readLong()
        require(count >= 0 && count < Int.MaxValue, s"corrupt shard count $count")
        var j = 0L
        while (j < count) {
          val key = readString()
          val mvCount = d.readInt()
          require(mvCount >= 0 && mvCount <= MaxVectorsPerVertex, s"corrupt multi-vector count $mvCount")
          val vecs = mutable.LinkedHashMap.empty[String, Array[Float]]
          var m = 0
          while (m < mvCount) {
            val vname = readString()
            val dim = d.readInt()
            require(dim >= 0 && dim <= MaxDim, s"corrupt vector dim $dim")
            val vec = new Array[Float](dim)
            var i = 0
            while (i < dim) { vec(i) = java.lang.Float.intBitsToFloat(d.readInt()); i += 1 }
            vecs(vname) = vec
            m += 1
          }
          val metaCount = d.readInt()
          require(metaCount >= 0 && metaCount <= MaxMetaEntries, s"corrupt metadata count $metaCount")
          val meta = mutable.LinkedHashMap.empty[String, Any]
          var k = 0
          while (k < metaCount) {
            val metaKey = readString()
            meta(metaKey) = d.readByte() match {
              case 0 => d.readLong()
              case 1 => readString()
              case t => throw new IllegalArgumentException(
                s"unsupported experimental metadata type tag: $t (only 0=i64, 1=string)")
            }
            k += 1
          }
          out += ColttMvVertex(key, vecs.toMap, meta.toMap)
          j += 1
        }
        shard += 1
      }
    } catch {
      case _: EOFException =>
        throw new IllegalArgumentException(
          "truncated coltt multi-vector blob: hit EOF before all 16 shard sections were read")
    } finally d.close()
    out.toSeq
  }

  /** Encode experimental vertices (exact inverse of [[parseMultiVectorBlob]];
    * entries shard by a key hash — section placement is irrelevant to the
    * reference's in-order loader). */
  def encodeMultiVectorBlob(vertices: Seq[ColttMvVertex]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val d = new java.io.DataOutputStream(bos)
    val byShard = vertices.groupBy(v => math.floorMod(v.key.hashCode, ShardCount))
    (0 until ShardCount).foreach { s =>
      val entries = byShard.getOrElse(s, Seq.empty)
      d.writeLong(entries.size.toLong)
      entries.foreach(v => writeMvVertexEntry(d, v.key, v.vectors.toSeq, v.meta.toSeq))
    }
    d.flush()
    bos.toByteArray
  }

  /** One experimental vertex wire entry (u16 keyLen + key, u32 mvCount of
    * named f32 vectors, u32 metaCount of tagged i64/string entries) — THE
    * single writer shared by [[encodeMultiVectorBlob]] and
    * [[ColttExport]], the [[writeMetaEntry]] discipline for this format. */
  private[interop] def writeMvVertexEntry(d: java.io.DataOutputStream, key: String,
                                          vectors: Seq[(String, Array[Float])],
                                          meta: Seq[(String, Any)]): Unit = {
    def writeString(s: String): Unit = {
      val b = s.getBytes(StandardCharsets.UTF_8)
      require(b.length <= 65535, s"string too long: $s")
      d.writeShort(b.length); d.write(b)
    }
    writeString(key)
    d.writeInt(vectors.size)
    vectors.foreach { case (vname, vec) =>
      writeString(vname)
      d.writeInt(vec.length)
      vec.foreach(f => d.writeInt(java.lang.Float.floatToIntBits(f)))
    }
    d.writeInt(meta.size)
    meta.foreach { case (k, value) =>
      writeString(k)
      value match {
        case i: Long    => d.writeByte(0); d.writeLong(i)
        case s0: String => d.writeByte(1); writeString(s0)
        case other => throw new IllegalArgumentException(
          s"experimental metadata supports i64/string only, got: ${other.getClass.getName}")
      }
    }
  }

  /** Full experimental (multi-vector) import: meta.json + vertex blob →
    * create → insert (pk + one column per named vector + metadata columns)
    * → flush. Returns the row count. */
  def importExperimentalSnapshot(spark: SparkSession, catalog: GraftCatalog,
                                 name: String, srcDir: String,
                                 pkName: String = "_key"): Long = {
    val fs = new Path(srcDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val metaIn = fs.open(new Path(srcDir, s"$name.meta.json"))
    val metaJson = try scala.io.Source.fromInputStream(metaIn, "UTF-8").mkString
                   finally metaIn.close()
    val meta = parseExperimentalMetadata(name, metaJson, pkName)
    val vertices = parseMultiVectorBlob(fs.open(new Path(srcDir, s"$name.vertex")))
    catalog.createCollection(meta)
    // same rollback-on-failure contract as importSnapshot
    try {
    catalog.loadCollection(name)
    if (vertices.nonEmpty) {
      val scalarFields = meta.fields.filter(f => !f.primaryKey && !f.isVector)
      val vecFields = meta.vectorFields
      val schema = StructType(
        StructField(pkName, StringType, nullable = false) +:
          (scalarFields.map(f => StructField(f.name, f.dataType, nullable = true)) ++
            vecFields.map(f => StructField(f.name,
              ArrayType(FloatType, containsNull = false), nullable = false))))
      val rows = vertices.map { v =>
        Row.fromSeq(
          v.key +:
            // the experimental encoder persists only i64/string tags, so a
            // declared float/boolean field arrives as i64 ("1"-ish) or not
            // at all — coerce what is coercible, leave the rest to
            // insert-time validation
            (scalarFields.map(f => v.meta.get(f.name).map[Any] {
              case i: Long if f.fieldType == "float"   => i.toDouble
              case i: Long if f.fieldType == "boolean" => i != 0L
              case other                               => other
            }.orNull) ++
              vecFields.map(f => v.vectors.getOrElse(f.name,
                throw new IllegalArgumentException(
                  s"vertex ${v.key} is missing declared vector field ${f.name}")).toSeq)))
      }
      catalog.insert(name,
        spark.createDataFrame(spark.sparkContext.parallelize(rows, 32), schema))
    }
    catalog.flush(name)
    } catch { case e: Throwable =>
      try catalog.dropCollection(name) catch { case _: Throwable => () }
      throw e
    }
    vertices.size.toLong
  }
}
