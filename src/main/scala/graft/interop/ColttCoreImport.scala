package graft.interop

import java.io.{DataInputStream, EOFException, InputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.CRC32

import scala.collection.mutable

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

import graft.collection.{CollectionMeta, GraftCatalog, IndexField}

/** One-way importer for the reference CORE engine's commit log — the third
  * and last of the reference's persistence formats (edge and experimental
  * buckets are [[ColttImport]]). The core engine persists every mutation as
  * a protobuf-marshaled KV record inside a bitcask-style WAL
  * (`core/core.go:449,542` `proto.Marshal(&diskkv)` →
  * `CommitLog.Put("<col>_<autoId>", bytes)`), so a migration needs three
  * layers, all public formats, none of which require protobuf tooling:
  *
  * '''1. WAL chunk layer''' (`pkg/wal/segment.go`): segment files named
  * `%09d.SEG` are sequences of 32 KB blocks. Each chunk is a 7-byte header —
  * crc32-IEEE (4, LE), data length (2, LE u16), chunk type (1) — followed by
  * the data. The CRC covers header[4:7] then the data
  * (`segment.go:366-375`). A record that fits the current block is one FULL
  * chunk; otherwise it is split FIRST/MIDDLE.../LAST across blocks
  * (`segment.go:236-275`). If fewer than 8 bytes remain in a block the
  * writer zero-pads to the block boundary before the next chunk
  * (`segment.go:214-219`), so a header never starts in a block's last
  * 7 bytes.
  *
  * '''2. diskv record layer''' (`diskv/record.go:69-130`): each chunk
  * payload is a LogRecord — type byte (0 normal / 1 deleted / 2
  * batch-finished), batch id (uvarint), key size (zigzag varint), value
  * size (zigzag varint), expire nanos (zigzag varint), key bytes, value
  * bytes. Replay follows `diskv/db.go:497-563` exactly: records stage under
  * their batch id and apply — in WAL order — only when the matching
  * batch-finished record (key = the batch id's DECIMAL-STRING bytes,
  * `pkg/snowflake/snowflake.go:320-328`) arrives; records with batch id 0
  * are merge output (`diskv/merge.go:37,145`) and apply directly; expired
  * records delete their key. Uncommitted tail batches are dropped — the
  * same atomicity the reference recovers with. HINT / MERGEFIN / FLOCK
  * files are index/lock artifacts and are ignored: merged segments CONTAIN
  * their surviving records (at batch id 0), so replaying every `.SEG` in
  * ascending id order reproduces the exact final KV state with or without
  * a completed merge.
  *
  * '''3. protobuf wire layer''' (public wire format: varint tags,
  * length-delimited fields): `<col>_archive` holds a `diskproto.Collection`
  * (`idl/proto/v3/disk.proto`: name=1, hnsw params 2-10, dim=11,
  * distance=12, quantization=13) and `<col>_<autoId>` holds a
  * `diskproto.Dataset` (collection_unique_id=1 uint64,
  * user_specific_id=2 string, vector=3 packed float,
  * metadata=4 google.protobuf.Struct). Struct values arrive as
  * null/double/string/bool (proto Struct numbers are ALWAYS double);
  * nested structs/lists are rejected loudly — the reference's own index
  * layer flattens to scalar maps too. Unknown fields are skipped by wire
  * type, so a record from a newer writer still decodes.
  *
  * Identity: the core's HNSW keys are internal snowflake commit ids; user
  * identity is `user_specific_id` (the reference resolves updates via
  * `PureSearch({"_id": id})`, `core/core.go:505`). Rows therefore re-key by
  * a synthesized string pk column (default `_id`); if one user id was
  * inserted twice the entry with the LARGEST snowflake id wins (snowflake
  * ids are time-ordered, so that is the latest write).
  *
  * Scale shape: one sequential driver pass per segment — inherent to the
  * format (chunks have no index; batch atomicity needs ordered replay) and
  * within the source's own envelope: a core WAL is the single-node commit
  * log of a collection the reference holds fully in RAM. The decoded rows
  * then take the normal distributed ingest path (validate → insert →
  * flush), so everything downstream scales like any bulk load. */
object ColttCoreImport {

  // ---- sanity bounds: a corrupt length field must fail loudly, never
  // drive a multi-GB allocation (same rule as ColttImport) ----
  private val MaxKeyLen = 1 << 20
  private val MaxValueLen = 1 << 28
  private val MaxDim = 1 << 16
  private val MaxMetaEntries = 1 << 16

  private val BlockSize = 32 * 1024
  private val ChunkHeaderSize = 7

  private val ChunkFull: Byte = 0
  private val ChunkFirst: Byte = 1
  private val ChunkMiddle: Byte = 2
  private val ChunkLast: Byte = 3

  private val RecNormal: Byte = 0
  private val RecDeleted: Byte = 1
  private val RecBatchFinished: Byte = 2

  /** Distance strings the core persists (`core/constants.go:29-30`). */
  private val distanceNames = Map("cosine-dot" -> "cosine", "euclidean" -> "euclidean")

  // =====================================================================
  // protobuf wire primitives (hand-rolled; the wire format is public and
  // stable: https://protobuf.dev/programming-guides/encoding/)
  // =====================================================================

  /** Cursor over a byte array with the four proto wire-type readers. */
  private final class PbReader(buf: Array[Byte], var pos: Int, val end: Int) {
    def this(buf: Array[Byte]) = this(buf, 0, buf.length)
    def hasMore: Boolean = pos < end
    def readByte(): Int = {
      if (pos >= end) throw new IllegalArgumentException("truncated protobuf message")
      val b = buf(pos) & 0xff; pos += 1; b
    }
    def readVarint(): Long = {
      var shift = 0; var out = 0L
      while (shift < 64) {
        val b = readByte()
        out |= (b & 0x7fL) << shift
        if ((b & 0x80) == 0) return out
        shift += 7
      }
      throw new IllegalArgumentException("malformed varint (over 10 bytes)")
    }
    def readFixed32(): Int = {
      if (pos + 4 > end) throw new IllegalArgumentException("truncated fixed32")
      val v = (buf(pos) & 0xff) | ((buf(pos + 1) & 0xff) << 8) |
        ((buf(pos + 2) & 0xff) << 16) | ((buf(pos + 3) & 0xff) << 24)
      pos += 4; v
    }
    def readFixed64(): Long = {
      val lo = readFixed32() & 0xffffffffL
      val hi = readFixed32() & 0xffffffffL
      lo | (hi << 32)
    }
    /** Returns a sub-reader over a length-delimited field's payload. */
    def readDelimited(): PbReader = {
      val len = readVarint()
      require(len >= 0 && len <= end - pos, s"corrupt length-delimited field: $len")
      val r = new PbReader(buf, pos, pos + len.toInt)
      pos += len.toInt; r
    }
    def readBytesField(): Array[Byte] = {
      val r = readDelimited()
      java.util.Arrays.copyOfRange(buf, r.pos, r.end)
    }
    def readStringField(): String = {
      val r = readDelimited()
      new String(buf, r.pos, r.end - r.pos, StandardCharsets.UTF_8)
    }
    /** Skip one field of the given wire type — forward compatibility. */
    def skipField(wireType: Int): Unit = wireType match {
      case 0 => readVarint(): Unit
      case 1 => readFixed64(): Unit
      case 2 => readDelimited(): Unit
      case 5 => readFixed32(): Unit
      case t => throw new IllegalArgumentException(s"unsupported wire type $t")
    }
  }

  private[graft] final class PbWriter {
    private val out = new java.io.ByteArrayOutputStream()
    def writeVarint(v0: Long): Unit = {
      var v = v0
      while ((v & ~0x7fL) != 0) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
      out.write(v.toInt)
    }
    def tag(field: Int, wireType: Int): Unit = writeVarint((field.toLong << 3) | wireType)
    def fixed32(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >> 8) & 0xff)
      out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
    }
    def fixed64(v: Long): Unit = { fixed32(v.toInt); fixed32((v >>> 32).toInt) }
    def bytesField(field: Int, b: Array[Byte]): Unit = {
      tag(field, 2); writeVarint(b.length.toLong); out.write(b)
    }
    def stringField(field: Int, s: String): Unit =
      bytesField(field, s.getBytes(StandardCharsets.UTF_8))
    def varintField(field: Int, v: Long): Unit = { tag(field, 0); writeVarint(v) }
    def toBytes: Array[Byte] = out.toByteArray
  }

  // =====================================================================
  // diskproto messages
  // =====================================================================

  /** One decoded `diskproto.Dataset` record. Metadata values are
    * Double / String / Boolean (proto Struct scalars); explicit nulls are
    * dropped (absent == null for Struct fields). */
  final case class CoreDataset(uniqueId: Long, userId: String,
                               vector: Array[Float], meta: Map[String, Any])

  /** The subset of `diskproto.Collection` the import needs (the rest are
    * HNSW tuning knobs with no counterpart here — logged, not imported). */
  final case class CoreCollectionConfig(name: String, dim: Int,
                                        distance: String, quantization: String)

  /** Decode a `google.protobuf.Struct` payload into a scalar map. */
  private def decodeStruct(r: PbReader): Map[String, Any] = {
    val out = mutable.LinkedHashMap.empty[String, Any]
    while (r.hasMore) {
      val t = r.readVarint()
      val field = (t >>> 3).toInt
      val wt = (t & 7).toInt
      if (field == 1 && wt == 2) { // map<string, Value> entry
        val e = r.readDelimited()
        var key: String = null
        var value: Option[Any] = None // None == proto null_value / absent
        while (e.hasMore) {
          val et = e.readVarint()
          ((et >>> 3).toInt, (et & 7).toInt) match {
            case (1, 2) => key = e.readStringField()
            case (2, 2) =>
              val v = e.readDelimited()
              while (v.hasMore) {
                val vt = v.readVarint()
                ((vt >>> 3).toInt, (vt & 7).toInt) match {
                  case (1, 0) => v.readVarint(): Unit // NullValue
                  case (2, 1) => value = Some(java.lang.Double.longBitsToDouble(v.readFixed64()))
                  case (3, 2) => value = Some(v.readStringField())
                  case (4, 0) => value = Some(v.readVarint() != 0L)
                  case (5, 2) | (6, 2) => throw new IllegalArgumentException(
                    s"nested Struct/List metadata is not importable (key $key)")
                  case (f, w) => v.skipField(w): Unit
                }
              }
            case (_, w) => e.skipField(w)
          }
        }
        require(key != null, "Struct map entry without a key")
        value.foreach(out(key) = _)
        require(out.size <= MaxMetaEntries, "corrupt metadata: too many entries")
      } else r.skipField(wt)
    }
    out.toMap
  }

  /** Decode a `diskproto.Dataset` value (`idl/proto/v3/disk.proto:24-29`).
    * Accepts the packed float encoding proto3 emits AND the unpacked form a
    * spec-compliant writer may produce. */
  def decodeDataset(bytes: Array[Byte]): CoreDataset = {
    val r = new PbReader(bytes)
    var uniqueId = 0L
    var userId = ""
    val vec = new mutable.ArrayBuffer[Float]()
    var meta = Map.empty[String, Any]
    while (r.hasMore) {
      val t = r.readVarint()
      ((t >>> 3).toInt, (t & 7).toInt) match {
        case (1, 0) => uniqueId = r.readVarint()
        case (2, 2) => userId = r.readStringField()
        case (3, 2) => // packed floats
          val p = r.readDelimited()
          require((p.end - p.pos) % 4 == 0, "packed float field length not a multiple of 4")
          require((p.end - p.pos) / 4 + vec.size <= MaxDim, "corrupt vector: too many elements")
          while (p.hasMore) vec += java.lang.Float.intBitsToFloat(p.readFixed32())
        case (3, 5) => // unpacked single float
          require(vec.size < MaxDim, "corrupt vector: too many elements")
          vec += java.lang.Float.intBitsToFloat(r.readFixed32())
        // MERGE, don't replace: proto3 allows a singular message field to
        // arrive as multiple concatenated chunks (message patching); a
        // conforming decoder merges their keys
        case (4, 2) => meta = meta ++ decodeStruct(r.readDelimited())
        case (_, w) => r.skipField(w)
      }
    }
    CoreDataset(uniqueId, userId, vec.toArray, meta)
  }

  /** Decode a `diskproto.Collection` value (`idl/proto/v3/disk.proto:8-22`). */
  def decodeCollectionConfig(bytes: Array[Byte]): CoreCollectionConfig = {
    val r = new PbReader(bytes)
    var name = ""; var dim = 0; var distance = ""; var quant = ""
    while (r.hasMore) {
      val t = r.readVarint()
      ((t >>> 3).toInt, (t & 7).toInt) match {
        case (1, 2)  => name = r.readStringField()
        case (11, 0) => dim = r.readVarint().toInt
        case (12, 2) => distance = r.readStringField()
        case (13, 2) => quant = r.readStringField()
        case (_, w)  => r.skipField(w) // hnsw knobs 2-10: no counterpart here
      }
    }
    require(dim > 0 && dim <= MaxDim, s"corrupt collection config: dim $dim")
    CoreCollectionConfig(name, dim, distance, quant)
  }

  /** Encode a Dataset — the exact inverse of [[decodeDataset]], for
    * round-trip fixtures and for exporting BACK to a core deployment. */
  def encodeDataset(ds: CoreDataset): Array[Byte] = {
    val w = new PbWriter
    if (ds.uniqueId != 0L) w.varintField(1, ds.uniqueId)
    if (ds.userId.nonEmpty) w.stringField(2, ds.userId)
    if (ds.vector.nonEmpty) {
      val pw = new PbWriter
      ds.vector.foreach(f => pw.fixed32(java.lang.Float.floatToIntBits(f)))
      w.bytesField(3, pw.toBytes)
    }
    if (ds.meta.nonEmpty) {
      val sw = new PbWriter
      ds.meta.foreach { case (k, value) =>
        val vw = new PbWriter
        value match {
          case d: Double  => vw.tag(2, 1); vw.fixed64(java.lang.Double.doubleToLongBits(d))
          case s: String  => vw.stringField(3, s)
          case b: Boolean => vw.varintField(4, if (b) 1L else 0L)
          case other => throw new IllegalArgumentException(
            s"core metadata supports double/string/boolean, got ${other.getClass.getName}")
        }
        val ew = new PbWriter
        ew.stringField(1, k)
        ew.bytesField(2, vw.toBytes)
        sw.bytesField(1, ew.toBytes)
      }
      w.bytesField(4, sw.toBytes)
    }
    w.toBytes
  }

  /** Encode a Collection config (inverse of [[decodeCollectionConfig]]). */
  def encodeCollectionConfig(cfg: CoreCollectionConfig): Array[Byte] = {
    val w = new PbWriter
    w.stringField(1, cfg.name)
    w.varintField(11, cfg.dim.toLong)
    w.stringField(12, cfg.distance)
    w.stringField(13, cfg.quantization)
    w.toBytes
  }

  // =====================================================================
  // WAL chunk layer
  // =====================================================================

  /** Iterate the reassembled records of one segment file, CRC-checking
    * every chunk and stitching FIRST/MIDDLE/LAST spans back together
    * (`pkg/wal/segment.go` block/chunk layout in the class doc). */
  def segmentRecords(in: InputStream): Iterator[Array[Byte]] = {
    val d = new DataInputStream(new java.io.BufferedInputStream(in, 1 << 20))
    new Iterator[Array[Byte]] {
      private var blockRemaining = BlockSize
      private var nextRec: Array[Byte] = _
      private var done = false

      private def readChunk(): Option[(Byte, Array[Byte])] = {
        // a header never starts in a block's last 7 bytes — those are
        // zero padding (segment.go:214-219)
        while (blockRemaining <= ChunkHeaderSize) {
          var toSkip = blockRemaining
          while (toSkip > 0) {
            val s = d.skipBytes(toSkip)
            if (s <= 0) { if (d.read() < 0) return None; toSkip -= 1 } else toSkip -= s
          }
          blockRemaining = BlockSize
        }
        val header = new Array[Byte](ChunkHeaderSize)
        val first = d.read()
        if (first < 0) return None // clean EOF at a chunk boundary
        header(0) = first.toByte
        try d.readFully(header, 1, ChunkHeaderSize - 1)
        catch { case _: EOFException => throw new IllegalArgumentException(
          "truncated WAL segment: EOF inside a chunk header") }
        val storedCrc = (header(0) & 0xffL) | ((header(1) & 0xffL) << 8) |
          ((header(2) & 0xffL) << 16) | ((header(3) & 0xffL) << 24)
        val len = (header(4) & 0xff) | ((header(5) & 0xff) << 8)
        val tpe = header(6)
        require(len <= blockRemaining - ChunkHeaderSize,
          s"corrupt WAL chunk: length $len overruns its 32 KB block")
        val data = new Array[Byte](len)
        try d.readFully(data)
        catch { case _: EOFException => throw new IllegalArgumentException(
          "truncated WAL segment: EOF inside a chunk body") }
        val crc = new CRC32()
        crc.update(header, 4, 3) // length + type, then data (segment.go:372-373)
        crc.update(data)
        require((crc.getValue & 0xffffffffL) == storedCrc,
          "corrupt WAL chunk: CRC mismatch")
        blockRemaining -= ChunkHeaderSize + len
        Some((tpe, data))
      }

      // a record can never legally exceed header + key + value at their
      // sanity bounds — cap span reassembly BEFORE accumulating, so a
      // crafted chain of CRC-valid MIDDLE chunks fails loudly instead of
      // allocating without limit (the file-wide corrupt-length rule)
      private val MaxRecordBytes = 64 + MaxKeyLen + MaxValueLen

      private def advance(): Unit = try {
        nextRec = null
        var pending: java.io.ByteArrayOutputStream = null
        def accumulate(data: Array[Byte]): Unit = {
          require(pending.size().toLong + data.length <= MaxRecordBytes,
            s"corrupt WAL: chunk span exceeds the $MaxRecordBytes-byte record bound")
          pending.write(data)
        }
        while (nextRec == null && !done) {
          readChunk() match {
            case None =>
              done = true
              require(pending == null,
                "truncated WAL segment: EOF inside a FIRST/MIDDLE chunk span")
            case Some((ChunkFull, data)) =>
              require(pending == null, "corrupt WAL: FULL chunk inside a span")
              nextRec = data
            case Some((ChunkFirst, data)) =>
              require(pending == null, "corrupt WAL: nested FIRST chunk")
              pending = new java.io.ByteArrayOutputStream()
              accumulate(data)
            case Some((ChunkMiddle, data)) =>
              require(pending != null, "corrupt WAL: MIDDLE chunk without FIRST")
              accumulate(data)
            case Some((ChunkLast, data)) =>
              require(pending != null, "corrupt WAL: LAST chunk without FIRST")
              accumulate(data)
              nextRec = pending.toByteArray
              pending = null
            case Some((t, _)) =>
              throw new IllegalArgumentException(s"corrupt WAL: unknown chunk type $t")
          }
        }
        if (done) d.close()
      } catch { case e: Throwable =>
        // close the underlying stream on ANY failure path, not just clean
        // EOF — a corrupt segment mid-replay must not leak the FS handle
        try d.close() catch { case _: Throwable => () }
        throw e
      }

      advance()
      override def hasNext: Boolean = nextRec != null
      override def next(): Array[Byte] = {
        val r = nextRec
        if (r == null) throw new NoSuchElementException
        advance()
        r
      }
    }
  }

  /** Chunked segment writer — the exact inverse of [[segmentRecords]],
    * mirroring `segment.go:214-275` (FULL vs FIRST/MIDDLE/LAST split, zero
    * padding when under 8 bytes remain in a block). Fixture/export side. */
  final class SegmentWriter(out: java.io.OutputStream) {
    private var blockRemaining = BlockSize
    private def putChunk(tpe: Byte, data: Array[Byte], off: Int, len: Int): Unit = {
      val header = new Array[Byte](ChunkHeaderSize)
      header(4) = (len & 0xff).toByte
      header(5) = ((len >> 8) & 0xff).toByte
      header(6) = tpe
      val crc = new CRC32()
      crc.update(header, 4, 3)
      crc.update(data, off, len)
      val sum = crc.getValue
      header(0) = (sum & 0xff).toByte
      header(1) = ((sum >> 8) & 0xff).toByte
      header(2) = ((sum >> 16) & 0xff).toByte
      header(3) = ((sum >> 24) & 0xff).toByte
      out.write(header); out.write(data, off, len)
      blockRemaining -= ChunkHeaderSize + len
    }
    def write(record: Array[Byte]): Unit = {
      if (blockRemaining <= ChunkHeaderSize) {
        out.write(new Array[Byte](blockRemaining))
        blockRemaining = BlockSize
      }
      if (record.length + ChunkHeaderSize <= blockRemaining)
        putChunk(ChunkFull, record, 0, record.length)
      else {
        var off = 0
        var first = true
        while (off < record.length) {
          if (blockRemaining <= ChunkHeaderSize) {
            out.write(new Array[Byte](blockRemaining))
            blockRemaining = BlockSize
          }
          val space = blockRemaining - ChunkHeaderSize
          val left = record.length - off
          val take = math.min(space, left)
          // the split loop is only entered when the record overflows the
          // current block, so the first chunk can never also be the last —
          // FULL is impossible here
          val tpe = if (first) ChunkFirst
            else if (take == left) ChunkLast
            else ChunkMiddle
          putChunk(tpe, record, off, take)
          off += take
          first = false
        }
      }
    }
    def flush(): Unit = out.flush()
  }

  // =====================================================================
  // diskv record layer
  // =====================================================================

  /** One diskv LogRecord (`diskv/record.go:46-52`). */
  final case class WalRecord(tpe: Byte, batchId: Long, expire: Long,
                             key: Array[Byte], value: Array[Byte])

  /** Decode a chunk payload into a LogRecord (`record.go:97-130`).
    * Sizes are zigzag varints (Go `binary.PutVarint`); batch id is an
    * unsigned varint. */
  def decodeLogRecord(buf: Array[Byte]): WalRecord = {
    val r = new PbReader(buf)
    val tpe = r.readByte().toByte
    val batchId = r.readVarint()
    def zigzag(): Long = { val v = r.readVarint(); (v >>> 1) ^ -(v & 1) }
    val keySize = zigzag()
    val valueSize = zigzag()
    val expire = zigzag()
    require(keySize >= 0 && keySize <= MaxKeyLen, s"corrupt record: key size $keySize")
    require(valueSize >= 0 && valueSize <= MaxValueLen, s"corrupt record: value size $valueSize")
    require(keySize + valueSize <= r.end - r.pos,
      "corrupt record: key+value sizes overrun the record")
    val key = java.util.Arrays.copyOfRange(buf, r.pos, r.pos + keySize.toInt)
    val value = java.util.Arrays.copyOfRange(buf, r.pos + keySize.toInt,
      r.pos + keySize.toInt + valueSize.toInt)
    WalRecord(tpe, batchId, expire, key, value)
  }

  /** Encode a LogRecord (inverse of [[decodeLogRecord]]). */
  def encodeLogRecord(rec: WalRecord): Array[Byte] = {
    val head = new java.io.ByteArrayOutputStream()
    head.write(rec.tpe.toInt)
    def uvarint(v0: Long): Unit = {
      var v = v0
      while ((v & ~0x7fL) != 0) { head.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
      head.write(v.toInt)
    }
    def zigzag(v: Long): Unit = uvarint((v << 1) ^ (v >> 63))
    uvarint(rec.batchId)
    zigzag(rec.key.length.toLong)
    zigzag(rec.value.length.toLong)
    zigzag(rec.expire)
    head.write(rec.key)
    head.write(rec.value)
    head.toByteArray
  }

  // =====================================================================
  // replay
  // =====================================================================

  /** Replay every `.SEG` segment under `walDir` (ascending file id) into
    * the final KV state, with the reference's exact batch-atomicity rules
    * (`diskv/db.go:497-563`): stage per batch id → apply on batch-finished;
    * batch id 0 applies directly; expired records delete; uncommitted tail
    * batches are dropped. `nowNanos` is the expiry clock (epoch nanos),
    * parameterized so fixtures are deterministic. */
  def replayWal(spark: SparkSession, walDir: String,
                nowNanos: Long = System.currentTimeMillis() * 1000000L): mutable.LinkedHashMap[String, Array[Byte]] = {
    val dirPath = new Path(walDir)
    val fs = dirPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val segs = fs.listStatus(dirPath).map(_.getPath)
      .filter(_.getName.endsWith(".SEG"))
      .flatMap(p => p.getName.stripSuffix(".SEG").toLongOption.map(_ -> p))
      .sortBy(_._1)
    require(segs.nonEmpty, s"no .SEG segment files under $walDir")
    val kv = mutable.LinkedHashMap.empty[String, Array[Byte]]
    val staged = mutable.LinkedHashMap.empty[Long, mutable.ArrayBuffer[WalRecord]]
    segs.foreach { case (_, segPath) =>
      // the iterator closes the stream on its OWN failure/EOF paths, but a
      // throw from this consumer body (corrupt LogRecord, non-decimal batch
      // key) unwinds past it — close unconditionally so no replay failure
      // mode leaks the FS handle (close is idempotent)
      val in = fs.open(segPath)
      try segmentRecords(in).foreach { chunk =>
        val rec = decodeLogRecord(chunk)
        val key = new String(rec.key, StandardCharsets.UTF_8)
        rec.tpe match {
          case RecBatchFinished =>
            val batchId = key.toLongOption.getOrElse(throw new IllegalArgumentException(
              s"corrupt batch-finished record: key '$key' is not a decimal batch id"))
            staged.remove(batchId).foreach(_.foreach { r =>
              val k = new String(r.key, StandardCharsets.UTF_8)
              if (r.tpe == RecNormal) kv(k) = r.value else kv.remove(k)
            })
          case RecNormal if rec.batchId == 0L =>
            kv(key) = rec.value // merge output applies directly (merge.go:145)
          case RecNormal | RecDeleted =>
            if (rec.expire > 0 && rec.expire <= nowNanos) kv.remove(key)
            else staged.getOrElseUpdate(rec.batchId, mutable.ArrayBuffer.empty) += rec
          case t => throw new IllegalArgumentException(s"corrupt record: unknown type $t")
        }
      } finally {
        try in.close() catch { case _: Throwable => () }
      }
    }
    kv // uncommitted batches left in `staged` are dropped, as on reference recovery
  }

  // =====================================================================
  // import
  // =====================================================================

  /** Infer the scalar field schema from the replayed datasets. Proto Struct
    * numbers are always double, so numeric fields import as `float`
    * (DoubleType) — the core is schemaless and the narrower type does not
    * exist on the wire. A key must carry ONE scalar type across all rows;
    * mixed-type keys fail loudly rather than guessing. */
  private def inferFields(datasets: Seq[CoreDataset], pkName: String): Seq[IndexField] = {
    val types = mutable.LinkedHashMap.empty[String, String]
    datasets.foreach(_.meta.foreach { case (k, v) =>
      if (k != pkName) { // pk carries identity already; "_id" metadata is its copy
        // the ingest DataFrame appends its own "vector" column and the
        // catalog owns the "__" namespace — a metadata key there would
        // produce an ambiguous/shadowed column deep inside insert; reject
        // with the real reason instead
        require(k != "vector" && !k.startsWith("__"),
          s"metadata key '$k' collides with a reserved column name — " +
            "rename it in the source collection before importing")
        val t = v match {
          case _: Double  => "float"
          case _: String  => "string"
          case _: Boolean => "boolean"
          case other => throw new IllegalArgumentException(
            s"unsupported metadata value type ${other.getClass.getName} for key $k")
        }
        types.get(k) match {
          case Some(prev) if prev != t => throw new IllegalArgumentException(
            s"metadata key $k has mixed types across rows ($prev vs $t) — not importable")
          case _ => types(k) = t
        }
      }
    })
    types.map { case (k, t) => IndexField(k, t, enableNull = true) }.toSeq.sortBy(_.name)
  }

  /** Full core import: replay the WAL under `walDir`, read
    * `<name>_archive` for the collection config, decode every
    * `<name>_<autoId>` Dataset, resolve identity by `user_specific_id`
    * (largest snowflake id wins), infer the scalar schema, then
    * create → insert → flush through the normal ingest path. Returns the
    * imported row count. Rolls the collection back on any failure so the
    * import stays retryable. */
  def importCoreCollection(spark: SparkSession, catalog: GraftCatalog,
                           name: String, walDir: String, pkName: String = "_id",
                           nowNanos: Long = System.currentTimeMillis() * 1000000L): Long = {
    val kv = replayWal(spark, walDir, nowNanos)
    val cfgBytes = kv.getOrElse(s"${name}_archive", throw new IllegalArgumentException(
      s"collection $name has no ${name}_archive config record in the WAL"))
    val cfg = decodeCollectionConfig(cfgBytes)
    val distance = distanceNames.getOrElse(cfg.distance,
      throw new IllegalArgumentException(s"unknown core distance '${cfg.distance}'"))
    val prefix = name + "_"
    val datasets = kv.iterator.collect {
      // diskRule1 keys are "<col>_<decimal autoId>" (core/constants.go:41);
      // the numeric-suffix check excludes the _archive record and any
      // other collection whose name shares the prefix
      case (k, v) if k.startsWith(prefix) && k.length > prefix.length &&
        k.substring(prefix.length).forall(_.isDigit) => decodeDataset(v)
    }.toIndexedSeq
    datasets.foreach { ds =>
      require(ds.vector.length == cfg.dim,
        s"dataset ${ds.userId} has dim ${ds.vector.length}, collection declares ${cfg.dim}")
      require(ds.userId.nonEmpty, s"dataset ${ds.uniqueId} has an empty user_specific_id")
    }
    // identity: latest write per user id (snowflake ids are time-ordered)
    val resolved = datasets.groupBy(_.userId).valuesIterator
      .map(_.maxBy(_.uniqueId)).toIndexedSeq.sortBy(_.uniqueId)
    val scalarFields = inferFields(resolved, pkName)
    val meta = CollectionMeta(name, dim = cfg.dim, distance = distance,
      // the core writes quantization "None" unconditionally (core/core.go:111)
      // and persists raw floats; import as none
      quantization = "none",
      fields = IndexField(pkName, "string", primaryKey = true) +: scalarFields)
    catalog.createCollection(meta)
    try {
      catalog.loadCollection(name)
      if (resolved.nonEmpty) {
        val schema = StructType(
          StructField(pkName, StringType, nullable = false) +:
            (scalarFields.map(f => StructField(f.name, f.dataType, nullable = true)) :+
              StructField("vector", ArrayType(FloatType, containsNull = false),
                nullable = false)))
        val rows = resolved.map { ds =>
          Row.fromSeq(ds.userId +:
            (scalarFields.map(f => ds.meta.get(f.name).orNull) :+ ds.vector.toSeq))
        }
        catalog.insert(name,
          spark.createDataFrame(spark.sparkContext.parallelize(rows, 32), schema))
      }
      catalog.flush(name)
    } catch { case e: Throwable =>
      try catalog.dropCollection(name) catch { case _: Throwable => () }
      throw e
    }
    resolved.size.toLong
  }

  // =====================================================================
  // fixture/export writer
  // =====================================================================

  /** Export a collection BACK to a core-format WAL — the write half of the
    * migration story, matching `encodeVertexBlob` / `encodeMultiVectorBlob`
    * for the other two engines: one segment holding the `<name>_archive`
    * config record plus one committed batch of Dataset puts. The sink is a
    * single sequential CRC-chunked file, so the WRITE is inherently
    * driver-side — but the rows stream through `toLocalIterator` (one
    * partition resident at a time, the LocalBinIndex discipline), each
    * encoding to its WAL record as it arrives; the collection is never
    * materialized on the driver heap. Scalar fields become Struct metadata
    * (integers widen to double — that wire has only doubles); vector
    * quantization is decoded to floats first (the core stores raw f32).
    * The result round-trips through [[importCoreCollection]]. */
  def exportCoreCollection(spark: SparkSession, catalog: GraftCatalog,
                           name: String, walDir: String): Long = {
    val meta = catalog.getMeta(name)
    require(meta.vectorFields.isEmpty,
      "multi-vector collections have no core v3 representation (export to CFLAT instead)")
    val distance = meta.distance match {
      case "cosine" => "cosine-dot"
      case "euclidean" => "euclidean"
      case d => throw new IllegalArgumentException(
        s"core v3 supports cosine/euclidean, collection declares $d")
    }
    val scalarFields = meta.fields.filterNot(_.primaryKey)
    val snap = catalog.snapshot(name)
    // the core stores raw f32 — decode quantized storage back to the float
    // values the reference's own loader would see
    val stored = col(graft.collection.CollectionMeta.VectorCol)
    val vecExpr = meta.quantization match {
      case "none" => stored
      case q => graft.functions.dequantize(stored, q)
    }
    // (projection, row → CoreDataset) per collection mode; uniqueId is the
    // running row counter (snapshot rows are already identity-resolved, so
    // any strictly increasing assignment is a valid snowflake stand-in)
    val (proj, toDataset): (org.apache.spark.sql.DataFrame, (Row, Long) => CoreDataset) =
      if (meta.isSchemaless) {
        // core-mode collections keep metadata in the map column, not
        // meta.fields — exporting only (id, vector) would silently drop it
        // all. map<string,string> values export as Struct strings.
        (snap.select(col(meta.idColumn),
          col(graft.collection.CollectionMeta.MetaCol), vecExpr.as("vector")),
          (r, id) => {
            val mm: Map[String, Any] =
              r.getMap[String, String](1).toMap.map { case (k, v) => k -> (v: Any) }
            CoreDataset(uniqueId = id, userId = r.get(0).toString,
              vector = r.getSeq[Float](2).toArray, meta = mm)
          })
      } else {
        (snap.select(
          (meta.idColumn +: scalarFields.map(_.name)).map(col) :+ vecExpr.as("vector"): _*),
          (r, id) => {
            val metaMap = scalarFields.zipWithIndex.flatMap { case (f, fi) =>
              Option(r.get(fi + 1)).map { v =>
                f.name -> (v match {
                  case l: Long => l.toDouble // Struct numbers are double
                  case i2: Int => i2.toDouble
                  case d: Double => d
                  case b: Boolean => b
                  case s: String => s
                  case other => throw new IllegalArgumentException(
                    s"field ${f.name}: no Struct representation for ${other.getClass.getName}")
                })
              }
            }.toMap[String, Any]
            CoreDataset(uniqueId = id, userId = r.get(0).toString,
              vector = r.getSeq[Float](scalarFields.size + 1).toArray, meta = metaMap)
          })
      }
    val dirPath = new Path(walDir)
    val fs = dirPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(dirPath)
    val out = fs.create(new Path(dirPath, "000000001.SEG"), true)
    var n = 0L
    try {
      val w = new SegmentWriter(out)
      // merge-style config record at batch id 0 (same framing as
      // writeWalFixture's directPuts)
      w.write(encodeLogRecord(WalRecord(RecNormal, 0L, 0L,
        s"${name}_archive".getBytes(StandardCharsets.UTF_8),
        encodeCollectionConfig(CoreCollectionConfig(name, meta.dim, distance, "None")))))
      val it = proj.toLocalIterator()
      while (it.hasNext) {
        n += 1
        val ds = toDataset(it.next(), n)
        require(ds.vector.length == meta.dim,
          s"row ${ds.userId}: vector dim ${ds.vector.length} != collection dim ${meta.dim}")
        w.write(encodeLogRecord(WalRecord(RecNormal, 1L, 0L,
          s"${name}_$n".getBytes(StandardCharsets.UTF_8), encodeDataset(ds))))
      }
      // batch-finished record commits the batch — written LAST, so a crash
      // mid-export leaves an uncommitted batch the reference's own replay
      // (and ours) drops atomically
      w.write(encodeLogRecord(WalRecord(RecBatchFinished, 1L, 0L,
        "1".getBytes(StandardCharsets.UTF_8), Array.emptyByteArray)))
      w.flush()
    } finally out.close()
    n
  }

  /** Write a complete single-segment WAL fixture (`000000001.SEG`) with the
    * reference's batch framing: each `(ops, batchId)` group becomes its
    * records followed by a batch-finished record keyed by the batch id's
    * decimal string; `finishLast = false` leaves the LAST group uncommitted
    * (the atomicity case). `Left(key → value)` is a put, `Right(key)` a
    * delete. */
  def writeWalFixture(out: java.io.OutputStream,
                      batches: Seq[(Long, Seq[Either[(String, Array[Byte]), String]])],
                      finishLast: Boolean = true,
                      directPuts: Seq[(String, Array[Byte])] = Seq.empty): Unit = {
    val w = new SegmentWriter(out)
    directPuts.foreach { case (k, v) => // merge-style records at batch id 0
      w.write(encodeLogRecord(WalRecord(RecNormal, 0L, 0L,
        k.getBytes(StandardCharsets.UTF_8), v)))
    }
    batches.zipWithIndex.foreach { case ((batchId, ops), i) =>
      ops.foreach {
        case Left((k, v)) => w.write(encodeLogRecord(WalRecord(RecNormal, batchId, 0L,
          k.getBytes(StandardCharsets.UTF_8), v)))
        case Right(k) => w.write(encodeLogRecord(WalRecord(RecDeleted, batchId, 0L,
          k.getBytes(StandardCharsets.UTF_8), Array.emptyByteArray)))
      }
      if (finishLast || i < batches.size - 1)
        w.write(encodeLogRecord(WalRecord(RecBatchFinished, batchId, 0L,
          batchId.toString.getBytes(StandardCharsets.UTF_8), Array.emptyByteArray)))
    }
    w.flush()
  }
}
