package graft.interop

import java.io.{BufferedOutputStream, DataOutputStream, File, FileOutputStream}
import java.nio.charset.StandardCharsets
import java.nio.file.Files

import scala.collection.mutable

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col

import graft.collection.{CollectionMeta, GraftCatalog}

/** Write half of the edge-bucket migration ([[ColttImport]] is the read
  * half): export a collection as the reference engine's persisted bucket —
  * `<col>.meta.json`, `<col>.vertex`, `<col>.inverted.raw` — so a user can
  * move data BACK under a running coltt edge node. Mirrors the reference's
  * own writers byte-for-byte:
  *
  *   meta.json      — edge/edge_metadata.go:22-35 (`dim`, `distance` /
  *                    `quantization` enum ints, `index_type` feature map,
  *                    `versioning`).
  *   .vertex        — edge/none_vectorstore.go:308-423 SaveVertex: 16 shard
  *                    sections in order, each `u64 count` then per entry
  *                    `u64 key`, `u32 vecLen`, the STORED vector elements
  *                    (f32 BE for None; u16 f16/bf16 bits / u8 f8 bits for
  *                    the quantized stores — our storage keeps exactly those
  *                    bits, so quantized exports are bit-identical to what
  *                    the reference itself would persist), `u32 metaCount`,
  *                    per metadata entry `u16 keyLen + key` and a type tag
  *                    (0 = i64 BE, 1 = string u16+bytes, 2 = f64 BE,
  *                    3 = bool byte). All big-endian.
  *   .inverted.raw  — pkg/inverted/save.go SerializeBinary: LE u32
  *                    shardCount; per field shard LE u32 keyLen + name,
  *                    LE u32 valueCount; per value a tagged payload
  *                    (0 = i64, 1 = f64, 2 = string, 3 = bool — note the
  *                    DIFFERENT tag order from the vertex blob) then LE u32
  *                    byte length + the roaring64 bitmap of the posting
  *                    keys. The reference LOADS this file verbatim
  *                    (edge/edge.go:374-379, none_vectorstore.go:279-281 —
  *                    it does NOT rebuild postings from metadata), so the
  *                    export writes real bitmaps in the public 64-bit
  *                    Roaring interchange format ([[Roaring64]]).
  *
  * Vertex keys are the reference's internal snowflakes; snapshot rows are
  * already identity-resolved by pk, so a strictly increasing counter in pk
  * order is a valid stand-in (the import side re-keys by pk anyway, and the
  * reference's own upsert path resolves identity through the pk metadata
  * field). Shard placement follows the reference's `ShardVertex` routing
  * (FNV-1a over the key's little-endian bytes, pkg/sharding/shard.go:34-41)
  * so a loaded bucket spreads across its 16 shards exactly as a native one.
  *
  * Scale shape: like [[ColttCoreImport.exportCoreCollection]], the sink
  * format is inherently driver-sequential; rows stream through
  * `toLocalIterator` in pk order (one partition resident at a time) into 16
  * shard spill files that are concatenated at the end, so the collection is
  * never materialized on the driver heap. The posting-list accumulator IS
  * O(rows × fields) driver memory — the same envelope the reference's own
  * in-RAM BitmapIndex occupies for the identical data, i.e. anything a
  * coltt edge node can hold, this export can write. NULL metadata values
  * export as ABSENT keys (the reference's "absent key = no postings"
  * semantics, the same contract our filters honor). */
object ColttExport {

  private val distanceEnums = Map("cosine" -> 0, "euclidean" -> 1)
  private val quantizationEnums = Map("none" -> 0, "f16" -> 1, "f8" -> 2, "bf16" -> 3)
  private val fieldTypeEnums = Map("string" -> 0, "integer" -> 1, "float" -> 2, "boolean" -> 3)
  private val ShardCount = 16 // EDGE_MAP_SHARD_COUNT, edge/constants.go

  /** `ShardVertex(key, 16)`: FNV-1a-64 over the key's LITTLE-ENDIAN 8
    * bytes, unsigned-mod the shard count (pkg/sharding/shard.go:34-41). */
  private[graft] def shardOf(key: Long): Int = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < 8) {
      h ^= (key >>> (8 * i)) & 0xFFL
      h *= 0x100000001b3L
      i += 1
    }
    java.lang.Long.remainderUnsigned(h, ShardCount.toLong).toInt
  }

  /** `<col>.meta.json` exactly as edge_metadata.go marshals it. */
  private def metaJson(meta: CollectionMeta): String = {
    import org.json4s.JsonDSL._
    import org.json4s.jackson.JsonMethods
    val features = meta.fields.map { f =>
      f.name -> (
        ("index_name" -> f.name) ~
          ("index_type" -> fieldTypeEnums.getOrElse(f.fieldType,
            throw new IllegalArgumentException(
              s"field ${f.name}: no edge representation for type ${f.fieldType}"))) ~
          ("enable_null" -> f.enableNull) ~
          ("primary_key" -> f.primaryKey))
    }
    JsonMethods.compact(JsonMethods.render(
      ("dim" -> meta.dim) ~
        ("distance" -> distanceEnums(meta.distance)) ~
        ("quantization" -> quantizationEnums(meta.quantization)) ~
        ("index_type" -> features.foldLeft(org.json4s.JObject())(_ ~ _)) ~
        ("versioning" -> meta.versioning)))
  }

  /** Export `name`'s flushed snapshot as an edge bucket under `destDir`
    * (resolved through the Hadoop FileSystem API like the engine-format
    * `exportCollection` — an `s3a://`/`hdfs://` destination writes where it
    * says, not into a local directory that happens to spell the URI).
    * Refuses a non-empty destination (mixing this export with a partial or
    * previous bucket would hand a reference node a meta.json / vertex /
    * inverted.raw combination that never existed together), and best-effort
    * deletes its own partial output on failure so a retry sees an empty
    * directory again. Returns the number of exported rows. Round-trips
    * through [[ColttImport.importSnapshotDistributed]] (spec-pinned, all
    * four quantizations). */
  def exportEdgeCollection(spark: org.apache.spark.sql.SparkSession, catalog: GraftCatalog,
                           name: String, destDir: String): Long = {
    val meta = catalog.getMeta(name)
    require(!meta.isMultiVector,
      "multi-vector collections have no edge representation (they are the " +
        "experimental engine's CFLAT records)")
    require(!meta.isSchemaless,
      "schemaless (core v3) collections export through " +
        "ColttCoreImport.exportCoreCollection, not the edge bucket format")
    require(distanceEnums.contains(meta.distance),
      s"edge buckets support cosine/euclidean, collection declares ${meta.distance}")
    val destPath = new org.apache.hadoop.fs.Path(destDir)
    val dfs = destPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (dfs.exists(destPath))
      require(dfs.listStatus(destPath).isEmpty,
        s"export destination $destDir is not empty — refusing to mix this " +
          "bucket with existing files")
    else dfs.mkdirs(destPath)
    val pk = meta.idColumn
    val scalarFields = meta.fields // pk included: identity lives in the metadata map
    val snap = catalog.snapshot(name)
      .select((scalarFields.map(f => col(f.name)) :+
        col(CollectionMeta.VectorCol)): _*)
      .orderBy(col(pk)) // deterministic keys: counter in pk order

    // one streaming pass: entries spill into 16 LOCAL temp shard files
    // (sections need their counts up front, so the blob cannot be written
    // single-pass), postings accumulate per (field, value)
    val shardFiles = Array.tabulate(ShardCount)(i =>
      File.createTempFile(s"graft-coltt-export-$i-", ".shard"))
    try {
      val shardOuts = shardFiles.map(f =>
        new DataOutputStream(new BufferedOutputStream(new FileOutputStream(f))))
      val counts = new Array[Long](ShardCount)
      // insertion-ordered so the written shard order is deterministic
      val postings = mutable.LinkedHashMap.empty[String, mutable.LinkedHashMap[Any, mutable.ArrayBuffer[Long]]]
      var rows = 0L
      try {
        val it = snap.toLocalIterator()
        while (it.hasNext) {
          val r = it.next()
          rows += 1
          val key = rows // 1-based counter = valid snowflake stand-in
          val s = shardOf(key)
          counts(s) += 1
          writeVertexEntry(shardOuts(s), key, r, meta, scalarFields.size)
          var fi = 0
          while (fi < scalarFields.size) {
            val f = scalarFields(fi)
            val v = r.get(fi)
            if (v != null) {
              val norm: Any = v match {
                case l: Long => l
                case i: Int => i.toLong
                // −0.0 folds into +0.0: the reference's in-RAM index keys
                // values by Go interface equality, where +0 == −0 selects
                // ONE map entry — two separate exported entries would let
                // the second silently overwrite the first on load
                case d: Double => if (d == 0.0) 0.0 else d
                case fl: Float => if (fl == 0.0f) 0.0 else fl.toDouble
                case b: Boolean => b
                case s0: String => s0
                case other => throw new IllegalArgumentException(
                  s"field ${f.name}: no edge metadata representation for ${other.getClass.getName}")
              }
              postings.getOrElseUpdate(f.name, mutable.LinkedHashMap.empty)
                .getOrElseUpdate(norm, mutable.ArrayBuffer.empty[Long]) += key
            }
            fi += 1
          }
        }
      } finally shardOuts.foreach(_.close())

      try {
        // <col>.vertex: 16 sections in shard order, u64 count + spilled bytes
        val vOut = new DataOutputStream(new BufferedOutputStream(
          dfs.create(new org.apache.hadoop.fs.Path(destPath, s"$name.vertex"), true)))
        try {
          var s = 0
          while (s < ShardCount) {
            vOut.writeLong(counts(s))
            Files.copy(shardFiles(s).toPath, vOut)
            s += 1
          }
        } finally vOut.close()
        val mOut = dfs.create(new org.apache.hadoop.fs.Path(destPath, s"$name.meta.json"), true)
        try mOut.write(metaJson(meta).getBytes(StandardCharsets.UTF_8))
        finally mOut.close()
        writeInverted(dfs, new org.apache.hadoop.fs.Path(destPath, s"$name.inverted.raw"), postings)
      } catch {
        case t: Throwable =>
          // a partial bucket is worse than no bucket: best-effort cleanup so
          // a retry sees the empty directory again, then surface the failure
          Seq(s"$name.vertex", s"$name.meta.json", s"$name.inverted.raw").foreach { f =>
            try dfs.delete(new org.apache.hadoop.fs.Path(destPath, f), false)
            catch { case _: Throwable => () }
          }
          throw t
      }
      rows
    } finally shardFiles.foreach(_.delete())
  }

  /** One vertex entry (the body of a shard section), none_vectorstore.go
    * SaveVertex: key, vecLen, stored elements, metaCount, tagged metadata. */
  private def writeVertexEntry(out: DataOutputStream, key: Long, r: Row,
                               meta: CollectionMeta, vecIdx: Int): Unit = {
    out.writeLong(key)
    meta.quantization match {
      case "none" =>
        val v = r.getSeq[Float](vecIdx)
        out.writeInt(v.length)
        v.foreach(out.writeFloat)
      case "f16" | "bf16" =>
        val v = r.getSeq[Short](vecIdx)
        out.writeInt(v.length)
        v.foreach(out.writeShort(_))
      case "f8" =>
        val v = r.getAs[Array[Byte]](vecIdx)
        out.writeInt(v.length)
        out.write(v)
      case q => throw new IllegalArgumentException(s"unknown quantization: $q")
    }
    // count only non-null metadata (absent key = no postings); the entry
    // encoding itself is ColttImport.writeMetaEntry — ONE writer for this
    // byte format, shared with the fixture encoder, so they cannot drift
    var metaCount = 0
    var fi = 0
    while (fi < vecIdx) { if (r.get(fi) != null) metaCount += 1; fi += 1 }
    out.writeInt(metaCount)
    fi = 0
    while (fi < vecIdx) {
      val v = r.get(fi)
      if (v != null) {
        val norm: Any = v match {
          case i: Int => i.toLong
          case f: Float => f.toDouble
          case other => other
        }
        ColttImport.writeMetaEntry(out, meta.fields(fi).name, norm)
      }
      fi += 1
    }
  }

  /** `<col>.inverted.raw`, pkg/inverted/save.go SerializeBinary: note the
    * little-endian framing around BIG-endian value payloads, and the value
    * tag order (0 = i64, 1 = f64, 2 = string, 3 = bool) that differs from
    * the vertex blob's. */
  private def writeInverted(
      dfs: org.apache.hadoop.fs.FileSystem, path: org.apache.hadoop.fs.Path,
      postings: mutable.LinkedHashMap[String, mutable.LinkedHashMap[Any, mutable.ArrayBuffer[Long]]])
      : Unit = {
    val out = new DataOutputStream(new BufferedOutputStream(dfs.create(path, true)))
    def writeIntLE(v: Int): Unit = {
      out.write(v & 0xFF); out.write((v >>> 8) & 0xFF)
      out.write((v >>> 16) & 0xFF); out.write((v >>> 24) & 0xFF)
    }
    try {
      writeIntLE(postings.size)
      postings.foreach { case (field, values) =>
        val fb = field.getBytes(StandardCharsets.UTF_8)
        writeIntLE(fb.length); out.write(fb)
        writeIntLE(values.size)
        values.foreach { case (value, keys) =>
          value match { // BE payloads inside the LE framing (save.go writeValue)
            case l: Long => out.writeByte(0); out.writeLong(l)
            case d: Double => out.writeByte(1); out.writeDouble(d)
            case s: String =>
              val sb = s.getBytes(StandardCharsets.UTF_8)
              require(sb.length <= 65535, s"inverted value too long on $field")
              out.writeByte(2); out.writeShort(sb.length); out.write(sb)
            case b: Boolean => out.writeByte(3); out.writeByte(if (b) 1 else 0)
            case other => throw new IllegalArgumentException(
              s"no inverted-value representation for ${other.getClass.getName}")
          }
          val bm = Roaring64.serialize(keys.toArray) // keys ascending by construction
          writeIntLE(bm.length)
          out.write(bm)
        }
      }
    } finally out.close()
  }
}
