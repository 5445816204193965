package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.collection._
import graft.interop.ColttCoreImport
import graft.interop.ColttCoreImport.{CoreCollectionConfig, CoreDataset, WalRecord}

/** Migration-path spec for the reference CORE engine's commit log
  * (bitcask WAL of proto-marshaled KV records, diskv/db.go + core/core.go):
  * wire-format round trips at each layer, the reference's replay semantics
  * (batch atomicity, merge records, deletes, LWW), and end-to-end import
  * parity with a directly-ingested twin collection. */
class ColttCoreImportSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 4

  private def vec(seed: Int): Array[Float] = {
    val r = new scala.util.Random(seed)
    Array.fill(dim)(r.nextFloat())
  }

  private def ds(i: Int, label: Double = 0.0): CoreDataset =
    CoreDataset(uniqueId = 9000L + i, userId = s"u$i", vector = vec(i),
      meta = Map[String, Any]("label" -> (if (label != 0.0) label else i.toDouble),
        "src" -> s"s${i % 3}", "ok" -> (i % 2 == 0)))

  private def put(col: String, d: CoreDataset): Either[(String, Array[Byte]), String] =
    Left(s"${col}_${d.uniqueId}" -> ColttCoreImport.encodeDataset(d))

  private def del(col: String, uniqueId: Long): Either[(String, Array[Byte]), String] =
    Right(s"${col}_$uniqueId")

  private def archive(col: String): (String, Array[Byte]) =
    s"${col}_archive" -> ColttCoreImport.encodeCollectionConfig(
      CoreCollectionConfig(col, dim, "euclidean", "None"))

  private def writeSeg(dir: java.nio.file.Path, segId: Long,
                       batches: Seq[(Long, Seq[Either[(String, Array[Byte]), String]])],
                       finishLast: Boolean = true,
                       directPuts: Seq[(String, Array[Byte])] = Seq.empty): Unit = {
    val out = new java.io.FileOutputStream(dir.resolve(f"$segId%09d.SEG").toFile)
    try ColttCoreImport.writeWalFixture(out, batches, finishLast, directPuts)
    finally out.close()
  }

  test("protobuf layer: Dataset and Collection round-trip, unknown fields skip, " +
    "unpacked floats accepted") {
    val d0 = ds(7)
    val dec = ColttCoreImport.decodeDataset(ColttCoreImport.encodeDataset(d0))
    assert(dec.uniqueId === d0.uniqueId && dec.userId === d0.userId)
    assert(dec.vector.toSeq === d0.vector.toSeq && dec.meta === d0.meta)

    // empty metadata / empty vector stay decodable
    val bare = ColttCoreImport.decodeDataset(ColttCoreImport.encodeDataset(
      CoreDataset(1L, "x", Array.emptyFloatArray, Map.empty)))
    assert(bare.userId === "x" && bare.vector.isEmpty && bare.meta.isEmpty)

    // forward compatibility: an unknown field (99, varint) before the known
    // ones must be skipped by wire type, not break the decode
    val extra = Array[Byte]((99 << 3).toByte, 0x2a) ++ ColttCoreImport.encodeDataset(d0)
    assert(ColttCoreImport.decodeDataset(extra).userId === d0.userId)

    // unpacked repeated float (field 3, wire type 5 per element) is legal
    // on the wire; the reference's proto3 writer packs, a compliant decoder
    // accepts both
    val unpacked = (0 until dim).flatMap { i =>
      val bits = java.lang.Float.floatToIntBits(d0.vector(i))
      Seq(((3 << 3) | 5).toByte, (bits & 0xff).toByte, ((bits >> 8) & 0xff).toByte,
        ((bits >> 16) & 0xff).toByte, ((bits >> 24) & 0xff).toByte)
    }.toArray
    assert(ColttCoreImport.decodeDataset(unpacked).vector.toSeq === d0.vector.toSeq)

    val cfg = CoreCollectionConfig("c1", 128, "cosine-dot", "None")
    assert(ColttCoreImport.decodeCollectionConfig(
      ColttCoreImport.encodeCollectionConfig(cfg)) === cfg)
  }

  test("WAL chunk layer: multi-block records, block padding, CRC validation") {
    // records sized to force FULL chunks, block-boundary padding, and a
    // FIRST/MIDDLE/LAST span (70 KB > two 32 KB blocks)
    val rnd = new scala.util.Random(3)
    val records = Seq(100, 5000, 32760, 70 * 1024, 17, 31000).map { n =>
      val b = new Array[Byte](n); rnd.nextBytes(b); b
    }
    val bos = new java.io.ByteArrayOutputStream()
    val w = new ColttCoreImport.SegmentWriter(bos)
    records.foreach(w.write)
    val got = ColttCoreImport.segmentRecords(
      new java.io.ByteArrayInputStream(bos.toByteArray)).toSeq
    assert(got.size === records.size)
    got.zip(records).foreach { case (g, r) => assert(g.sameElements(r)) }

    // flip one data byte → the CRC must catch it
    val corrupt = bos.toByteArray.clone()
    corrupt(40) = (corrupt(40) ^ 0x01).toByte
    val ex = intercept[IllegalArgumentException] {
      ColttCoreImport.segmentRecords(new java.io.ByteArrayInputStream(corrupt)).toSeq
    }
    assert(ex.getMessage.contains("CRC"))
  }

  test("LogRecord layer: zigzag sizes, uvarint batch id, round-trip") {
    val rec = WalRecord(tpe = 0, batchId = 987654321098L, expire = 0L,
      key = "core_9001".getBytes("UTF-8"), value = Array[Byte](1, 2, 3))
    val dec = ColttCoreImport.decodeLogRecord(ColttCoreImport.encodeLogRecord(rec))
    assert(dec.tpe === rec.tpe && dec.batchId === rec.batchId)
    assert(dec.key.sameElements(rec.key) && dec.value.sameElements(rec.value))
  }

  test("replay semantics: batch atomicity, LWW overwrite, delete, merge records, " +
    "expiry, multi-segment order") {
    val dir = Files.createTempDirectory("core-wal-replay")
    // segment 1: merge-style direct put (batch 0) + batch 10 (a, b) +
    // batch 11 re-puts a (LWW) and deletes b
    writeSeg(dir, 1L,
      batches = Seq(
        10L -> Seq(Left("k_a" -> Array[Byte](1)), Left("k_b" -> Array[Byte](2))),
        11L -> Seq(Left("k_a" -> Array[Byte](3)), Right("k_b"))),
      directPuts = Seq("k_m" -> Array[Byte](9)))
    // segment 2: batch 12 puts c, then an UNCOMMITTED batch 13 that would
    // overwrite a — must be dropped on replay
    writeSeg(dir, 2L,
      batches = Seq(
        12L -> Seq(Left("k_c" -> Array[Byte](4))),
        13L -> Seq(Left("k_a" -> Array[Byte](99)))),
      finishLast = false)
    val kv = ColttCoreImport.replayWal(spark, dir.toString)
    assert(kv.keySet === Set("k_m", "k_a", "k_c"))
    assert(kv("k_a").toSeq === Seq[Byte](3)) // batch 11 won; batch 13 dropped
    assert(kv("k_m").toSeq === Seq[Byte](9))

    // an expired record deletes its key at replay time (db.go:550-553)
    val dir2 = Files.createTempDirectory("core-wal-expire")
    val out = new java.io.FileOutputStream(dir2.resolve("000000001.SEG").toFile)
    val w = new ColttCoreImport.SegmentWriter(out)
    w.write(ColttCoreImport.encodeLogRecord(WalRecord(0, 0L, 0L,
      "k_e".getBytes, Array[Byte](5)))) // live (merge record)
    w.write(ColttCoreImport.encodeLogRecord(WalRecord(0, 20L, expire = 1000L,
      "k_e".getBytes, Array[Byte](6)))) // expired long ago
    w.write(ColttCoreImport.encodeLogRecord(WalRecord(2, 20L, 0L,
      "20".getBytes, Array.emptyByteArray)))
    w.flush(); out.close()
    val kv2 = ColttCoreImport.replayWal(spark, dir2.toString,
      nowNanos = 2000L)
    assert(!kv2.contains("k_e"))
  }

  test("full import: WAL-replayed collection matches a direct-ingest twin " +
    "(insert + update + delete + uncommitted tail)") {
    val dir = Files.createTempDirectory("core-wal-full")
    val all = (1 to 40).map(i => ds(i))
    // batch 1: archive + first 20 inserts; batch 2: rest; batch 3: update
    // rows 3,6 (same uniqueId re-put, new label) and delete rows 5,10;
    // batch 4 (uncommitted): a bogus overwrite that must not apply
    writeSeg(dir, 1L,
      batches = Seq(
        100L -> all.take(20).map(put("core", _)),
        101L -> all.drop(20).map(put("core", _)),
        102L -> Seq(
          put("core", ds(3, label = 300.0)),
          put("core", ds(6, label = 600.0)),
          del("core", 9005L), del("core", 9010L)),
        103L -> Seq(put("core", ds(1, label = 111.0)))),
      finishLast = false,
      directPuts = Seq(archive("core")))
    val cat = new GraftCatalog(spark, Files.createTempDirectory("graft-core-imp").toString)
    val n = ColttCoreImport.importCoreCollection(spark, cat, "core", dir.toString)
    assert(n === 38L) // 40 - 2 deleted

    // twin: the expected final state ingested directly
    val expected = all.filterNot(d => d.uniqueId == 9005L || d.uniqueId == 9010L)
      .map(d => if (d.uniqueId == 9003L) ds(3, 300.0)
                else if (d.uniqueId == 9006L) ds(6, 600.0) else d)
    val twin = new GraftCatalog(spark, Files.createTempDirectory("graft-core-twin").toString)
    twin.createCollection(CollectionMeta("core", dim = dim, distance = "euclidean",
      fields = Seq(
        IndexField("_id", "string", primaryKey = true),
        IndexField("label", "float", enableNull = true),
        IndexField("ok", "boolean", enableNull = true),
        IndexField("src", "string", enableNull = true))))
    twin.loadCollection("core")
    twin.insert("core", expected.map(d =>
      (d.userId, d.meta("label").asInstanceOf[Double], d.meta("ok").asInstanceOf[Boolean],
        d.meta("src").asInstanceOf[String], d.vector))
      .toDF("_id", "label", "ok", "src", "vector"))

    val q = vec(77)
    val got = cat.search("core", q, 10).collect().map(_.toString).toSeq
    val want = twin.search("core", q, 10).collect().map(_.toString).toSeq
    assert(got === want && got.nonEmpty)

    // inferred schema: Struct numbers are double → float fields; pk synthesized
    val m = cat.getMeta("core")
    assert(m.idColumn === "_id")
    assert(m.fields.map(f => f.name -> f.fieldType).toMap ===
      Map("_id" -> "string", "label" -> "float", "ok" -> "boolean", "src" -> "string"))

    // updated label visible; deleted rows gone; uncommitted batch dropped
    val s = cat.snapshot("core")
    assert(s.where(col("_id") === "u3").select("label").head().getDouble(0) === 300.0)
    assert(s.where(col("_id") === "u5").count() === 0L)
    assert(s.where(col("_id") === "u1").select("label").head().getDouble(0) === 1.0)
  }

  test("identity resolution: duplicate user ids keep the latest snowflake id") {
    val dir = Files.createTempDirectory("core-wal-dup")
    val v1 = CoreDataset(5001L, "dup", vec(1), Map[String, Any]("label" -> 1.0))
    val v2 = CoreDataset(5009L, "dup", vec(2), Map[String, Any]("label" -> 2.0))
    writeSeg(dir, 1L,
      batches = Seq(200L -> Seq(put("c2", v2), put("c2", v1))), // order scrambled
      directPuts = Seq(s"c2_archive" ->
        ColttCoreImport.encodeCollectionConfig(CoreCollectionConfig("c2", dim, "euclidean", "None"))))
    val cat = new GraftCatalog(spark, Files.createTempDirectory("graft-core-dup").toString)
    assert(ColttCoreImport.importCoreCollection(spark, cat, "c2", dir.toString) === 1L)
    assert(cat.snapshot("c2").select("label").head().getDouble(0) === 2.0)
  }

  test("guards: missing archive, dim mismatch, mixed-type metadata, nested Struct") {
    val dirA = Files.createTempDirectory("core-wal-noarch")
    writeSeg(dirA, 1L, batches = Seq(300L -> Seq(put("c3", ds(1)))))
    val cat = new GraftCatalog(spark, Files.createTempDirectory("graft-core-bad").toString)
    assert(intercept[IllegalArgumentException] {
      ColttCoreImport.importCoreCollection(spark, cat, "c3", dirA.toString)
    }.getMessage.contains("_archive"))

    val dirB = Files.createTempDirectory("core-wal-dim")
    writeSeg(dirB, 1L,
      batches = Seq(301L -> Seq(put("c4",
        CoreDataset(1L, "x", Array.fill(dim + 1)(0.5f), Map.empty)))),
      directPuts = Seq("c4_archive" ->
        ColttCoreImport.encodeCollectionConfig(CoreCollectionConfig("c4", dim, "euclidean", "None"))))
    assert(intercept[IllegalArgumentException] {
      ColttCoreImport.importCoreCollection(spark, cat, "c4", dirB.toString)
    }.getMessage.contains("dim"))

    val dirC = Files.createTempDirectory("core-wal-mixed")
    writeSeg(dirC, 1L,
      batches = Seq(302L -> Seq(
        put("c5", CoreDataset(1L, "a", vec(1), Map[String, Any]("f" -> 1.0))),
        put("c5", CoreDataset(2L, "b", vec(2), Map[String, Any]("f" -> "one"))))),
      directPuts = Seq("c5_archive" ->
        ColttCoreImport.encodeCollectionConfig(CoreCollectionConfig("c5", dim, "euclidean", "None"))))
    assert(intercept[IllegalArgumentException] {
      ColttCoreImport.importCoreCollection(spark, cat, "c5", dirC.toString)
    }.getMessage.contains("mixed types"))

    // a metadata key named "vector" (legal on the schemaless core wire)
    // would shadow the ingest DataFrame's own vector column — clear
    // rejection, not an ambiguous-reference Spark error mid-insert
    val dirR = Files.createTempDirectory("core-wal-reserved")
    writeSeg(dirR, 1L,
      batches = Seq(303L -> Seq(
        put("c6", CoreDataset(1L, "a", vec(1), Map[String, Any]("vector" -> 1.0))))),
      directPuts = Seq("c6_archive" ->
        ColttCoreImport.encodeCollectionConfig(CoreCollectionConfig("c6", dim, "euclidean", "None"))))
    assert(intercept[IllegalArgumentException] {
      ColttCoreImport.importCoreCollection(spark, cat, "c6", dirR.toString)
    }.getMessage.contains("reserved"))

    // nested Struct metadata is out of importable scope — loud error.
    // Hand-build Dataset{metadata: Struct{"k": Value{struct_value: {}}}}
    val w = new ColttCoreImport.PbWriter
    w.stringField(2, "nested")
    val nestedStruct = {
      val vw = new ColttCoreImport.PbWriter
      vw.bytesField(5, Array.emptyByteArray) // Value.struct_value (empty Struct)
      val ew = new ColttCoreImport.PbWriter
      ew.stringField(1, "k")
      ew.bytesField(2, vw.toBytes)
      val sw = new ColttCoreImport.PbWriter
      sw.bytesField(1, ew.toBytes)
      sw.toBytes
    }
    w.bytesField(4, nestedStruct)
    assert(intercept[IllegalArgumentException] {
      ColttCoreImport.decodeDataset(w.toBytes)
    }.getMessage.contains("nested"))
  }

  test("export → import round-trip: a collection written to core WAL format " +
    "re-imports with identical state") {
    val src = new GraftCatalog(spark, Files.createTempDirectory("graft-core-exp-src").toString)
    src.createCollection(CollectionMeta("exp", dim = dim, distance = "euclidean",
      fields = Seq(
        IndexField("_id", "string", primaryKey = true),
        IndexField("label", "float", enableNull = true),
        IndexField("ok", "boolean", enableNull = true))))
    src.loadCollection("exp")
    src.insert("exp", (1 to 25).map(i =>
      (s"r$i", i * 1.5, i % 2 == 0, vec(i))).toDF("_id", "label", "ok", "vector"))
    src.flush("exp")
    val walDir = Files.createTempDirectory("core-wal-export").toString
    assert(ColttCoreImport.exportCoreCollection(spark, src, "exp", walDir) === 25L)

    val dst = new GraftCatalog(spark, Files.createTempDirectory("graft-core-exp-dst").toString)
    assert(ColttCoreImport.importCoreCollection(spark, dst, "exp", walDir) === 25L)
    def state(c: GraftCatalog) = c.snapshot("exp")
      .select("_id", "label", "ok").collect().map(_.toString).toSet
    assert(state(dst) === state(src))
    val q = vec(42)
    assert(dst.search("exp", q, 5).collect().map(_.toString).toSeq ===
      src.search("exp", q, 5).collect().map(_.toString).toSeq)

    // multi-vector collections have no core representation — loud error
    val mv = new GraftCatalog(spark, Files.createTempDirectory("graft-core-exp-mv").toString)
    mv.createCollection(CollectionMeta("m", dim = dim, distance = "euclidean",
      fields = Seq(IndexField("_key", "string", primaryKey = true),
        IndexField("v0", "vector"), IndexField("v1", "vector"))))
    assert(intercept[IllegalArgumentException] {
      ColttCoreImport.exportCoreCollection(spark, mv, "m", walDir)
    }.getMessage.contains("multi-vector"))
  }

  test("export streams a MULTI-partition snapshot through toLocalIterator — " +
    "round-trips row-for-row with no full driver materialization (r8 verdict #6)") {
    val src = new GraftCatalog(spark, Files.createTempDirectory("graft-core-exp-big").toString)
    src.createCollection(CollectionMeta("big", dim = dim, distance = "cosine",
      fields = Seq(IndexField("_id", "string", primaryKey = true),
        IndexField("score", "float", enableNull = true))))
    src.loadCollection("big")
    // 16 input partitions so the export's partition-at-a-time iterator
    // actually crosses partition boundaries (and interleaves row order
    // differently from a single collect)
    src.insert("big", spark.range(0, 2000).repartition(16)
      .selectExpr("cast(id as string) as _id", "cast(id as double) * 0.5 as score",
        s"transform(sequence(1, $dim), j -> cast(sin(id * j) as float)) as vector"))
    src.flush("big")
    assert(src.snapshot("big").rdd.getNumPartitions > 1,
      "fixture must exercise the multi-partition path")
    val walDir = Files.createTempDirectory("core-wal-exp-big").toString
    assert(ColttCoreImport.exportCoreCollection(spark, src, "big", walDir) === 2000L)
    val dst = new GraftCatalog(spark, Files.createTempDirectory("graft-core-exp-big-dst").toString)
    assert(ColttCoreImport.importCoreCollection(spark, dst, "big", walDir) === 2000L)
    def state(c: GraftCatalog) = c.snapshot("big")
      .select("_id", "score").collect().map(_.toString).toSet
    assert(state(dst) === state(src))
    // vectors survive byte-exactly: same top-k under the same query
    val q = vec(7)
    assert(dst.search("big", q, 10).collect().map(_.toString).toSeq ===
      src.search("big", q, 10).collect().map(_.toString).toSeq)
  }

  test("EMPTY collection round-trips: export writes config + a zero-member " +
    "committed batch, import replays it to an empty searchable collection") {
    val src = new GraftCatalog(spark, Files.createTempDirectory("graft-core-exp-empty").toString)
    src.createCollection(CollectionMeta("emp", dim = dim, distance = "euclidean",
      fields = Seq(IndexField("_id", "string", primaryKey = true))))
    src.loadCollection("emp")
    src.flush("emp") // v1 with zero rows
    val walDir = Files.createTempDirectory("core-wal-empty").toString
    assert(ColttCoreImport.exportCoreCollection(spark, src, "emp", walDir) === 0L)
    val dst = new GraftCatalog(spark, Files.createTempDirectory("graft-core-emp-dst").toString)
    assert(ColttCoreImport.importCoreCollection(spark, dst, "emp", walDir) === 0L)
    assert(dst.search("emp", vec(1), 5).collect().isEmpty)
    assert(dst.getMeta("emp").dim === dim)
  }

  test("schemaless (core-mode) collection exports its MAP metadata, not an empty Struct") {
    import org.apache.spark.sql.functions.col
    val src = new GraftCatalog(spark, Files.createTempDirectory("graft-core-sless").toString)
    src.createCollection(CollectionMeta("sx", dim = dim, distance = "euclidean",
      schemaless = Some(true)))
    src.loadCollection("sx")
    src.insert("sx", (1 to 10).map(i => (s"k$i", vec(i), s"lbl$i")).toDF("_id", "vector", "tag"))
    src.flush("sx")
    val walDir = Files.createTempDirectory("core-wal-sless").toString
    assert(ColttCoreImport.exportCoreCollection(spark, src, "sx", walDir) === 10L)
    // the WAL must carry the metadata: re-import and read it back
    val dst = new GraftCatalog(spark, Files.createTempDirectory("graft-core-sless-dst").toString)
    assert(ColttCoreImport.importCoreCollection(spark, dst, "sx", walDir) === 10L)
    val tags = dst.snapshot("sx").select(col("_id"), col("tag"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(tags === (1 to 10).map(i => s"k$i" -> s"lbl$i").toMap)
  }

  test("proto3 merge semantics: metadata Struct split across two field-4 chunks merges keys") {
    val d = ds(1)
    val full = ColttCoreImport.encodeDataset(d)
    val half1 = ColttCoreImport.encodeDataset(d.copy(meta = Map("a" -> 1.0)))
    val half2 = ColttCoreImport.encodeDataset(d.copy(meta = Map("b" -> "x")))
    // splice: all of half1, plus ONLY the field-4 chunk of half2 (encode a
    // meta-only dataset and strip its other fields by re-encoding with
    // empty identity — simpler: concatenate both messages; proto3 says
    // later singular scalars overwrite, repeated bytes of an embedded
    // message MERGE)
    val spliced = half1 ++ half2
    val got = ColttCoreImport.decodeDataset(spliced)
    assert(got.meta === Map("a" -> 1.0, "b" -> "x"))
    assert(got.uniqueId === d.uniqueId && got.userId === d.userId)
    // vector field: concatenation doubles the packed floats — acceptable
    // for this splice; identity/meta are what the merge contract pins
    assert(full.nonEmpty)
  }

  test("independent fixture: a hand-assembled segment (own varints, own chunk " +
    "framing, own proto bytes) replays identically — the writer is NOT the " +
    "library's own encoder") {
    // Everything below is built byte-by-byte from the reference's documented
    // layout, sharing no code with SegmentWriter/encodeLogRecord/
    // encodeDataset, so encode∘decode=id bugs cannot self-certify.
    val out = new java.io.ByteArrayOutputStream()
    def uvarint(v0: Long): Array[Byte] = {
      var v = v0; val b = scala.collection.mutable.ArrayBuffer.empty[Byte]
      while ((v & ~0x7fL) != 0) { b += ((v & 0x7f) | 0x80).toByte; v >>>= 7 }
      b += v.toByte; b.toArray
    }
    def zig(v: Long): Array[Byte] = uvarint((v << 1) ^ (v >> 63))
    def chunk(tpe: Int, data: Array[Byte]): Unit = {
      val crc = new java.util.zip.CRC32()
      val lenType = Array[Byte]((data.length & 0xff).toByte,
        ((data.length >> 8) & 0xff).toByte, tpe.toByte)
      crc.update(lenType); crc.update(data)
      val s = crc.getValue
      out.write(Array[Byte](s.toByte, (s >> 8).toByte, (s >> 16).toByte, (s >> 24).toByte))
      out.write(lenType); out.write(data)
    }
    def record(tpe: Int, batchId: Long, key: String, value: Array[Byte]): Array[Byte] = {
      val k = key.getBytes("UTF-8")
      Array(tpe.toByte) ++ uvarint(batchId) ++ zig(k.length.toLong) ++
        zig(value.length.toLong) ++ zig(0L) ++ k ++ value
    }
    // diskproto.Dataset{1: 77, 2: "hand", 3: packed [1.5f, -2.0f], 4: Struct{"label": 3.0}}
    val f1 = java.lang.Float.floatToIntBits(1.5f)
    val f2 = java.lang.Float.floatToIntBits(-2.0f)
    def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    val labelBits = java.lang.Double.doubleToLongBits(3.0)
    val valueMsg = Array[Byte](0x11) ++ // field 2, wt 1 (fixed64 number_value)
      (0 until 8).map(i => ((labelBits >> (8 * i)) & 0xff).toByte).toArray
    val entryMsg = Array[Byte](0x0a, 5) ++ "label".getBytes ++ // field 1 string key
      Array[Byte](0x12, valueMsg.length.toByte) ++ valueMsg    // field 2 Value
    val structMsg = Array[Byte](0x0a, entryMsg.length.toByte) ++ entryMsg
    val dsBytes = Array[Byte](0x08, 77) ++                     // field 1 varint 77
      Array[Byte](0x12, 4) ++ "hand".getBytes ++               // field 2 string
      Array[Byte](0x1a, 8) ++ le32(f1) ++ le32(f2) ++          // field 3 packed floats
      Array[Byte](0x22, structMsg.length.toByte) ++ structMsg  // field 4 Struct
    chunk(0, record(0, 5L, "hc_77", dsBytes))
    chunk(0, record(2, 5L, "5", Array.emptyByteArray)) // batch-finished, decimal key
    val dir = Files.createTempDirectory("core-wal-hand")
    Files.write(dir.resolve("000000001.SEG"), out.toByteArray)

    val kv = ColttCoreImport.replayWal(spark, dir.toString)
    assert(kv.keySet === Set("hc_77"))
    val got = ColttCoreImport.decodeDataset(kv("hc_77"))
    assert(got.uniqueId === 77L && got.userId === "hand")
    assert(got.vector.toSeq === Seq(1.5f, -2.0f))
    assert(got.meta === Map("label" -> 3.0))
    // and the library's own encoders produce byte-identical proto output
    // for this record (cross-check in the OTHER direction)
    assert(ColttCoreImport.encodeDataset(got).sameElements(dsBytes))
  }

  test("fuzz: random junk segments fail loudly, never hang or allocate wildly") {
    for (seed <- 1 to 50) {
      val r = new scala.util.Random(seed)
      val junk = Array.fill(64 + r.nextInt(4096))(r.nextInt().toByte)
      intercept[Exception] {
        val recs = ColttCoreImport.segmentRecords(
          new java.io.ByteArrayInputStream(junk)).toSeq
        // if the chunk layer happened to pass (CRC collision is ~2^-32 per
        // seed — effectively never), the record layer must still throw
        recs.foreach(ColttCoreImport.decodeLogRecord)
        throw new IllegalStateException("junk parsed cleanly — bound failure")
      }
    }
    // hostile value size: the sanity bound must reject BEFORE allocating.
    // Craft by hand: type=0, batch=1, keySize=zigzag(1), valueSize=zigzag(2^30)
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(0); bos.write(1); bos.write(2) // zigzag(1) = 2
    // zigzag(2^30) varint
    var v = (1L << 30) << 1
    while ((v & ~0x7fL) != 0) { bos.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
    bos.write(v.toInt)
    bos.write(0) // expire
    bos.write('k')
    val ex = intercept[IllegalArgumentException] {
      ColttCoreImport.decodeLogRecord(bos.toByteArray)
    }
    assert(ex.getMessage.contains("corrupt record"))
  }
}
