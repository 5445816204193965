package graft.interop

import java.io.{BufferedOutputStream, DataOutputStream, File, FileOutputStream}
import java.nio.charset.StandardCharsets
import java.nio.file.Files

import scala.collection.mutable

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.col

import graft.collection.{CollectionMeta, GraftCatalog, IndexField}

/** Write half of the bucket migrations ([[ColttImport]] is the read half):
  * export collections BACK as the reference engines' native persisted
  * buckets, so a user can move data under a running coltt node again.
  *
  * [[exportEdgeCollection]] (single-vector) mirrors the edge writers
  * byte-for-byte:
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
  * Edge vertex keys are the reference's internal snowflakes; snapshot rows
  * are already identity-resolved by pk, so a strictly increasing counter in
  * pk order is a valid stand-in (the import side re-keys by pk anyway, and
  * the reference's own upsert path resolves identity through the pk
  * metadata field). Shard placement follows the reference's `ShardVertex`
  * routing (FNV-1a over the key's little-endian bytes,
  * pkg/sharding/shard.go:34-41): the engine loads sections into shard maps
  * AS STORED and addresses entries by that hash, so placement is semantic.
  *
  * [[exportExperimentalCollection]] (CFLAT multi-vector) writes the
  * experimental bucket — meta.json + `<col>.vertex` only
  * (experimental_helper.go:84-89; no inverted file on that engine).
  *
  * Scale shape (both): like [[ColttCoreImport.exportCoreCollection]], the
  * sink formats are inherently driver-sequential; rows stream through
  * `toLocalIterator` in pk order (one partition resident at a time) into 16
  * shard spill files concatenated at the end, so the collection is never
  * materialized on the driver heap. The edge posting-list accumulator IS
  * O(rows × fields) driver memory — the same envelope the reference's own
  * in-RAM BitmapIndex occupies for the identical data, i.e. anything a
  * coltt node can hold, this export can write. NULL metadata values export
  * as ABSENT keys (the reference's "absent key = no postings" semantics,
  * the same contract our filters honor). */
object ColttExport {

  private val distanceEnums = Map("cosine" -> 0, "euclidean" -> 1)
  private val quantizationEnums = Map("none" -> 0, "f16" -> 1, "f8" -> 2, "bf16" -> 3)
  private val fieldTypeEnums = Map("string" -> 0, "integer" -> 1, "float" -> 2, "boolean" -> 3)
  private val ShardCount = 16 // EDGE_MAP_SHARD_COUNT, edge/constants.go
  /** Dot-prefixed (invisible to the reference's bucket loader) atomic claim
    * marker a running export holds on its destination directory. */
  private[interop] val ExportLockFile = "._graft_export_lock"

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

  /** `ShardVertexV2(key, 16)`: FNV-1a-64 over the raw key bytes,
    * unsigned-mod the shard count (pkg/sharding/shard.go:43-48) — the
    * EXPERIMENTAL engine's routing (string keys, multi_vector_vertex.go:70). */
  private[graft] def shardOfKey(key: String): Int = {
    var h = 0xcbf29ce484222325L
    val bytes = key.getBytes(StandardCharsets.UTF_8)
    var i = 0
    while (i < bytes.length) {
      h ^= bytes(i) & 0xFFL
      h *= 0x100000001b3L
      i += 1
    }
    java.lang.Long.remainderUnsigned(h, ShardCount.toLong).toInt
  }

  /** `<col>.meta.json` exactly as edge_metadata.go marshals it (the
    * experimental engine shares the layout; declared vector fields carry
    * index_type 4, experimental_metadata.go). */
  private def metaJson(meta: CollectionMeta, includePk: Boolean = true): String = {
    import org.json4s.JsonDSL._
    import org.json4s.jackson.JsonMethods
    val declared = if (includePk) meta.fields else meta.fields.filterNot(_.primaryKey)
    val features = declared.map { f =>
      f.name -> (
        ("index_name" -> f.name) ~
          ("index_type" -> (if (f.isVector) 4 else fieldTypeEnums.getOrElse(f.fieldType,
            throw new IllegalArgumentException(
              s"field ${f.name}: no edge representation for type ${f.fieldType}")))) ~
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

  /** Shared bucket-writing scaffold for both engines: refuse a non-empty
    * destination (mixing this export with a partial or previous bucket
    * would hand a reference node files that never existed together),
    * stream `snap` through 16 LOCAL temp shard spill files (sections need
    * their counts up front, so the blob cannot be written single-pass),
    * concatenate them under their `u64` counts as `<name>.vertex`, write
    * `<name>.meta.json`, run `extra` for format-specific files, and
    * best-effort delete partial output on failure so a retry sees the
    * empty directory again. The destination resolves through the Hadoop
    * FileSystem (an `s3a://`/`hdfs://` URI writes where it says, not into
    * a local directory that happens to spell the URI). Returns the row
    * count. */
  private def writeBucket(spark: SparkSession, name: String, destDir: String,
                          snap: DataFrame, metaJsonStr: String, extraFiles: Seq[String],
                          shardFor: (Row, Long) => Int,
                          writeEntry: (DataOutputStream, Row, Long) => Unit,
                          extra: (FileSystem, Path) => Unit): Long = {
    val destPath = new Path(destDir)
    val dfs = destPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (dfs.exists(destPath))
      require(dfs.listStatus(destPath).isEmpty,
        s"export destination $destDir is not empty — refusing to mix this " +
          "bucket with existing files")
    else dfs.mkdirs(destPath)
    // Atomic claim on the destination: the emptiness check above is
    // check-then-act, so two concurrent exports could both pass it and
    // interleave into a mixed bucket. FileSystem.create(overwrite = false)
    // is atomic on HDFS/local — exactly one contender wins; the loser (or a
    // retry racing a crashed export whose cleanup died) fails loudly. The
    // marker is removed on every exit path below.
    val lockPath = new Path(destPath, ExportLockFile)
    try dfs.create(lockPath, false).close()
    catch {
      case e: java.io.IOException => throw new IllegalStateException(
        s"export destination $destDir is claimed by a concurrent (or crashed) " +
          s"export — $ExportLockFile exists; remove it if no export is running", e)
    }
    // files and streams are created INSIDE the guarded region so a failure
    // midway (temp dir full, fd exhaustion) still deletes what was created
    val shardFiles = new Array[File](ShardCount)
    val shardOuts = new Array[DataOutputStream](ShardCount)
    try { try {
      var i = 0
      while (i < ShardCount) {
        shardFiles(i) = File.createTempFile(s"graft-bucket-export-$i-", ".shard")
        shardOuts(i) = new DataOutputStream(new BufferedOutputStream(
          new FileOutputStream(shardFiles(i))))
        i += 1
      }
      val counts = new Array[Long](ShardCount)
      var rows = 0L
      try {
        val it = snap.toLocalIterator()
        while (it.hasNext) {
          val r = it.next()
          rows += 1
          val s = shardFor(r, rows)
          counts(s) += 1
          writeEntry(shardOuts(s), r, rows)
        }
      } finally shardOuts.foreach(o => if (o != null) o.close())
      try {
        val vOut = new DataOutputStream(new BufferedOutputStream(
          dfs.create(new Path(destPath, s"$name.vertex"), true)))
        try {
          var s = 0
          while (s < ShardCount) {
            vOut.writeLong(counts(s))
            Files.copy(shardFiles(s).toPath, vOut)
            s += 1
          }
        } finally vOut.close()
        val mOut = dfs.create(new Path(destPath, s"$name.meta.json"), true)
        try mOut.write(metaJsonStr.getBytes(StandardCharsets.UTF_8))
        finally mOut.close()
        extra(dfs, destPath)
      } catch {
        case t: Throwable =>
          // a partial bucket is worse than no bucket: best-effort cleanup so
          // a retry sees the empty directory again, then surface the failure
          (Seq(s"$name.vertex", s"$name.meta.json") ++ extraFiles).foreach { f =>
            try dfs.delete(new Path(destPath, f), false)
            catch { case _: Throwable => () }
          }
          throw t
      }
      rows
    } finally shardFiles.foreach(f => if (f != null) { f.delete(); () })
    } finally {
      // release the claim on success AND failure — the failure path already
      // best-effort-deleted partial output, and a retry re-runs the
      // emptiness check either way
      try { dfs.delete(lockPath, false); () } catch { case _: Throwable => () }
    }
  }

  /** Export `name`'s flushed snapshot as an EDGE bucket under `destDir`.
    * Returns the number of exported rows. Round-trips through
    * [[ColttImport.importSnapshotDistributed]] (spec-pinned, all four
    * quantizations). */
  def exportEdgeCollection(spark: SparkSession, catalog: GraftCatalog,
                           name: String, destDir: String): Long = {
    val meta = catalog.getMeta(name)
    require(!meta.isMultiVector,
      "multi-vector collections have no edge representation — use " +
        "exportExperimentalCollection (the CFLAT bucket format)")
    require(!meta.isSchemaless,
      "schemaless (core v3) collections export through " +
        "ColttCoreImport.exportCoreCollection, not the edge bucket format")
    require(distanceEnums.contains(meta.distance),
      s"edge buckets support cosine/euclidean, collection declares ${meta.distance}")
    val pk = meta.idColumn
    val scalarFields = meta.fields // pk included: identity lives in the metadata map
    val snap = catalog.snapshot(name)
      .select((scalarFields.map(f => col(f.name)) :+
        col(CollectionMeta.VectorCol)): _*)
      .orderBy(col(pk)) // deterministic keys: counter in pk order
    // insertion-ordered so the written shard order is deterministic;
    // postings accumulate in PRIMITIVE long vectors — boxed Longs at one
    // object per posting would put the driver an order of magnitude above
    // the reference's own in-RAM index envelope on big collections
    val postings = mutable.LinkedHashMap.empty[String, mutable.LinkedHashMap[Any, LongVec]]
    writeBucket(spark, name, destDir, snap, metaJson(meta),
      extraFiles = Seq(s"$name.inverted.raw"),
      shardFor = (_, rowIdx) => shardOf(rowIdx), // 1-based counter = snowflake stand-in
      writeEntry = (out, r, rowIdx) => {
        writeVertexEntry(out, rowIdx, r, meta, scalarFields.size)
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
              .getOrElseUpdate(norm, new LongVec) += rowIdx
          }
          fi += 1
        }
      },
      extra = (dfs, destPath) =>
        writeInverted(dfs, new Path(destPath, s"$name.inverted.raw"), postings))
  }

  /** Export a MULTI-VECTOR collection as an experimental (CFLAT) bucket —
    * the THIRD engine's write half (edge and core have theirs).
    *
    * Keys are the pk strings THEMSELVES (the experimental vertex key IS the
    * user key — identity preserved, nothing synthesized), routed by the
    * reference's `ShardVertexV2` FNV-1a string hash. Placement is semantic,
    * not cosmetic: the engine loads sections into shard maps AS STORED and
    * looks keys up by that same hash (multi_vector_vertex.go:70-78, 279),
    * so a mis-sharded entry would be unreachable for updates/deletes on a
    * live node (the fixture encoder's hashCode routing is import-only for
    * exactly this reason). Elements are ALWAYS f32 on this wire — quantized
    * storage decodes first, and the declared quantization enum rides the
    * metadata for the engine's in-memory store variant. Metadata carries
    * only i64/string tags (multi_vector_vertex.go:245-271): integers export
    * as i64, booleans as 0/1 i64 (the importer's documented coercion),
    * strings as strings, and FLOAT fields refuse loudly — the wire cannot
    * hold them. Per-field dim overrides refuse too: the experimental
    * metadata JSON carries ONE collection-level dim, and the reference's
    * own update path checks every vector against it
    * (multi_vector_vertex.go ChangedVertex) — a mixed-dim bucket would be
    * un-updatable on a live node and un-importable back. The pk is NOT in
    * index_type (identity is the vertex key;
    * [[ColttImport.parseExperimentalMetadata]] re-synthesizes the pk column
    * on import — pass the original pk name as its `pkName`). NULLs export
    * as absent keys. */
  def exportExperimentalCollection(spark: SparkSession, catalog: GraftCatalog,
                                   name: String, destDir: String): Long = {
    val meta = catalog.getMeta(name)
    require(meta.isMultiVector,
      "exportExperimentalCollection writes CFLAT multi-vector buckets; " +
        "single-vector collections export through exportEdgeCollection")
    require(distanceEnums.contains(meta.distance),
      s"experimental buckets support cosine/euclidean, collection declares ${meta.distance}")
    val floatFields = meta.fields.filter(f => !f.isVector && f.fieldType == "float")
    require(floatFields.isEmpty,
      s"the experimental metadata wire holds only i64/string — float " +
        s"field(s) ${floatFields.map(_.name).mkString(", ")} have no representation")
    val vecFields = meta.vectorFields
    val offDim = vecFields.filter(f => meta.dimOf(f) != meta.dim)
    require(offDim.isEmpty,
      s"the experimental metadata JSON carries ONE collection-level dim (${meta.dim}) — " +
        s"per-field overrides (${offDim.map(f => s"${f.name}=${meta.dimOf(f)}").mkString(", ")}) " +
        "have no representation and would be un-updatable on a reference node")
    val pk = meta.idColumn
    val scalars = meta.fields.filter(f => !f.isVector && !f.primaryKey)
    val vecCols = vecFields.map { f =>
      val stored = col(f.name)
      (meta.quantization match {
        case "none" => stored
        case q      => graft.functions.dequantize(stored, q)
      }).as(f.name)
    }
    val snap = catalog.snapshot(name)
      .select((col(pk) +: scalars.map(f => col(f.name))) ++ vecCols: _*)
      .orderBy(col(pk))
    writeBucket(spark, name, destDir, snap, metaJson(meta, includePk = false),
      extraFiles = Seq.empty,
      shardFor = (r, _) => shardOfKey(r.getString(0)),
      writeEntry = (out, r, _) => writeMvEntry(out, r, scalars, vecFields),
      extra = (_, _) => ())
  }

  /** One experimental vertex entry from a snapshot row (pk, scalars…,
    * vectors…) — the byte encoding itself is
    * [[ColttImport.writeMvVertexEntry]], ONE writer for this format shared
    * with the fixture encoder, so they cannot drift. */
  private def writeMvEntry(out: DataOutputStream, r: Row,
                           scalars: Seq[IndexField],
                           vecFields: Seq[IndexField]): Unit = {
    val vectors = vecFields.zipWithIndex.map { case (f, vi) =>
      f.name -> r.getSeq[Float](1 + scalars.size + vi).toArray
    }
    val metaEntries = scalars.zipWithIndex.flatMap { case (f, i) =>
      Option(r.get(1 + i)).map { v =>
        val norm: Any = v match {
          case l: Long    => l
          case i2: Int    => i2.toLong
          case b: Boolean => if (b) 1L else 0L
          case s: String  => s
          case other => throw new IllegalArgumentException(
            s"field ${f.name}: the experimental wire holds only i64/string, " +
              s"got ${other.getClass.getName}")
        }
        f.name -> norm
      }
    }
    ColttImport.writeMvVertexEntry(out, r.getString(0), vectors, metaEntries)
  }

  /** One EDGE vertex entry (the body of a shard section),
    * none_vectorstore.go SaveVertex: key, vecLen, stored elements,
    * metaCount, tagged metadata. */
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
        // −0.0 folds into +0.0 HERE TOO: the postings accumulator already
        // folds it (Go map keys treat +0 == −0), and the vertex blob must
        // write the SAME bytes for the same value — a raw −0.0 here would
        // make the two writers of one value disagree byte-wise in a format
        // that advertises bit-exact round-trips
        val norm: Any = v match {
          case i: Int => i.toLong
          case f: Float => if (f == 0.0f) 0.0 else f.toDouble
          case d: Double => if (d == 0.0) 0.0 else d
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
  /** Growable primitive long vector (the posting accumulator). */
  private final class LongVec {
    private var a = new Array[Long](4)
    private var n = 0
    def +=(v: Long): Unit = {
      if (n == a.length) a = java.util.Arrays.copyOf(a, a.length * 2)
      a(n) = v; n += 1
    }
    def toArray: Array[Long] = java.util.Arrays.copyOf(a, n)
  }

  private def writeInverted(
      dfs: FileSystem, path: Path,
      postings: mutable.LinkedHashMap[String, mutable.LinkedHashMap[Any, LongVec]])
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
