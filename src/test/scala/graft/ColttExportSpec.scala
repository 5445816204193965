package graft

import java.io.{ByteArrayInputStream, DataInputStream}
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.collection.{CollectionMeta, GraftCatalog, IndexField}
import graft.interop.{ColttExport, ColttImport, Roaring64}

/** The edge-bucket EXPORT (write half of the migration): round-trips
  * through [[ColttImport]] (whose read side is itself pinned against an
  * independent encoder in ColttImportSpec, so the chain never verifies a
  * writer with its own reader), shard routing is pinned against an
  * independently written FNV-1a, and the roaring bitmaps are decoded by an
  * INDEPENDENT spec-local reader written from the public
  * RoaringFormatSpec — the encoder and this decoder share no code, so a
  * mistaken reading of the spec on one side fails the test. */
class ColttExportSpec extends SparkSpec {
  import spark.implicits._

  private def newCatalog() =
    new GraftCatalog(spark, Files.createTempDirectory("graft-cexp").toString)

  private def fixture(n: Int, dim: Int) =
    (0 until n).map { i =>
      val v = Array.tabulate(dim)(j => ((i * 31 + j * 7) % 13 - 6).toFloat / 6f)
      (f"$i%03d",
        if (i % 11 == 3) Option.empty[Long] else Some((i % 5).toLong),
        i / 10.0, i % 2 == 0, v.toSeq)
    }.toDF("id", "label", "score", "flag", "vector")

  private def exMeta(name: String, dim: Int, quant: String = "none") =
    CollectionMeta(name, dim = dim, distance = "euclidean", quantization = quant,
      fields = Seq(
        IndexField("id", "string", primaryKey = true),
        IndexField("label", "integer", enableNull = true),
        IndexField("score", "float"),
        IndexField("flag", "boolean")))

  private def exportOf(name: String, quant: String): (GraftCatalog, String) = {
    val cat = newCatalog()
    cat.createCollection(exMeta(name, dim = 8, quant = quant))
    cat.loadCollection(name)
    cat.insert(name, fixture(40, 8))
    cat.flush(name)
    val dest = Files.createTempDirectory("graft-cexp-out").toString
    val n = ColttExport.exportEdgeCollection(spark, cat, name, dest)
    assert(n === 40)
    (cat, dest)
  }

  test("export → import round-trip preserves every row, typed metadata, " +
    "NULL-as-absent, and vectors — all four quantizations") {
    for (quant <- Seq("none", "f16", "bf16", "f8")) {
      val name = s"rt$quant"
      val (cat, dest) = exportOf(name, quant)
      val cat2 = newCatalog()
      val n = ColttImport.importSnapshotDistributed(spark, cat2, name, dest)
      assert(n === 40, s"$quant: imported $n of 40")
      def canon(df: org.apache.spark.sql.DataFrame) = {
        val vec = quant match {
          case "none" => col(CollectionMeta.VectorCol)
          case q      => graft.functions.dequantize(col(CollectionMeta.VectorCol), q)
        }
        df.select(col("id"), col("label"), col("score"), col("flag"),
            vec.cast("array<double>").as("v"))
          .collect().map(r => (r.getString(0), Option(r.get(1)), r.getDouble(2),
            r.getBoolean(3), r.getSeq[Double](4))).sortBy(_._1)
      }
      val src = canon(cat.loadCollection(name))
      val got = canon(cat2.loadCollection(name))
      assert(got === src, s"$quant: round-trip diverged")
      // the re-imported metadata declares the same schema
      val m2 = cat2.getMeta(name)
      assert(m2.dim === 8 && m2.distance === "euclidean" && m2.quantization === quant)
      assert(m2.fields.map(f => (f.name, f.fieldType, f.primaryKey)).sortBy(_._1) ===
        exMeta(name, 8, quant).fields.map(f => (f.name, f.fieldType, f.primaryKey)).sortBy(_._1))
    }
  }

  test("shard routing matches an independent FNV-1a over little-endian key bytes") {
    def independentShard(key: Long): Int = {
      val bytes = java.nio.ByteBuffer.allocate(8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).putLong(key).array()
      var h = BigInt("cbf29ce484222325", 16)
      val mask = (BigInt(1) << 64) - 1
      bytes.foreach { b => h = ((h ^ BigInt(b & 0xFF)) * BigInt("100000001b3", 16)) & mask }
      (h mod BigInt(16)).toInt
    }
    val rnd = new scala.util.Random(3)
    (1 to 500).foreach { _ =>
      val k = rnd.nextLong()
      assert(ColttExport.shardOf(k) === independentShard(k), s"key $k")
    }
    // and the blob's section sizes follow that routing: re-parse per section
    val (_, dest) = exportOf("shards", "none")
    val blob = Files.readAllBytes(Paths.get(dest, "shards.vertex"))
    val verts = ColttImport.parseVertexBlob(new ByteArrayInputStream(blob), "none")
    assert(verts.size === 40)
    // keys 1..40 in pk order; every parsed key must sit in its FNV shard —
    // recover section membership by walking counts
    val d = new DataInputStream(new ByteArrayInputStream(blob))
    (0 until 16).foreach { s =>
      val count = d.readLong()
      var i = 0L
      while (i < count) {
        val key = d.readLong()
        assert(ColttExport.shardOf(key) === s, s"key $key placed in shard $s")
        val vecLen = d.readInt()
        d.skipBytes(vecLen * 4)
        val metaCount = d.readInt()
        (0 until metaCount).foreach { _ =>
          d.skipBytes(d.readUnsignedShort())
          d.readByte() match {
            case 0 => d.skipBytes(8)
            case 1 => d.skipBytes(d.readUnsignedShort())
            case 2 => d.skipBytes(8)
            case 3 => d.skipBytes(1)
            case t => fail(s"unknown meta tag $t")
          }
        }
        i += 1
      }
    }
    assert(d.read() === -1, "trailing bytes after the 16 sections")
  }

  /** LE u32 from a stream (the inverted-index framing around BE payloads). */
  private def readIntLE(d: DataInputStream): Int = {
    val b = new Array[Byte](4); d.readFully(b)
    (b(0) & 0xFF) | ((b(1) & 0xFF) << 8) | ((b(2) & 0xFF) << 16) | ((b(3) & 0xFF) << 24)
  }

  // --- independent roaring decoder, written from the public spec ---

  /** Little-endian cursor over a byte array (the spec's framing). */
  private final class LeCursor(bytes: Array[Byte]) {
    var pos = 0
    def u8(): Int = { val v = bytes(pos) & 0xFF; pos += 1; v }
    def u16(): Int = u8() | (u8() << 8)
    def u32(): Int = u16() | (u16() << 16)
    def u64(): Long = (u32().toLong & 0xFFFFFFFFL) | ((u32().toLong & 0xFFFFFFFFL) << 32)
    def done: Boolean = pos == bytes.length
  }

  /** One 32-bit portable roaring bitmap (no-run cookie), per
    * RoaringFormatSpec — advances the cursor past exactly this bitmap and
    * VERIFIES the offset header points where the containers land. */
  private def decode32(c: LeCursor): Seq[Long] = {
    val base = c.pos
    val cookie = c.u32()
    assert(cookie === 12346, s"expected SERIAL_COOKIE_NO_RUNCONTAINER, got $cookie")
    val nCont = c.u32()
    val keysCards = (0 until nCont).map(_ => (c.u16(), c.u16() + 1))
    val offsets = (0 until nCont).map(_ => c.u32())
    keysCards.zip(offsets).flatMap { case ((key, card), off) =>
      assert(off === c.pos - base, s"container key=$key: offset $off vs actual ${c.pos - base}")
      val vals =
        if (card <= 4096) (0 until card).map(_ => c.u16())
        else {
          val words = (0 until 1024).map(_ => c.u64())
          for (w <- 0 until 1024; bit <- 0 until 64
               if (words(w) & (1L << bit)) != 0) yield w * 64 + bit
        }
      assert(vals.length === card, s"container key=$key: ${vals.length} values, header said $card")
      vals.map(v => (key.toLong << 16) | v.toLong)
    }
  }

  /** 64-bit portable roaring: u64 bucket count, per ascending bucket a u32
    * high word + a 32-bit bitmap of the low words. */
  private def decode64(bytes: Array[Byte]): Seq[Long] = {
    val c = new LeCursor(bytes)
    val nBuckets = c.u64()
    val out = (0L until nBuckets).flatMap { _ =>
      val high = c.u32().toLong & 0xFFFFFFFFL
      decode32(c).map(l => (high << 32) | l)
    }
    assert(c.done, "trailing bytes after the roaring buckets")
    out
  }

  test("Roaring64.serialize conforms to the public format: independent decode " +
    "recovers the set (arrays, a bitset container, multi-container, multi-bucket)") {
    def check(values: Seq[Long]): Unit = {
      val got = decode64(Roaring64.serialize(values.toArray))
      assert(got === values, s"roaring round-trip diverged for ${values.take(10)}…")
    }
    check(Seq(1L))
    check(Seq(1L, 2L, 3L, 40L))
    check(1L to 40L)
    // > 4096 in one 16-bit container → bitset container
    check(0L until 5000L)
    // values spanning several 16-bit containers
    check(Seq(5L, 70000L, 70001L, 200000L))
    // spec detail: tail bits — max container value
    check(Seq(65535L, 65536L, 131071L))
    // values spanning several 32-bit buckets (the 64-bit layer)
    check(Seq(1L, (1L << 32) + 5L, (1L << 32) + 6L, (7L << 32) + 9L))
  }

  test("inverted.raw: independent decode of the whole file recovers exact postings " +
    "(LE framing, BE value payloads, per-field shards, NULLs absent)") {
    val (_, dest) = exportOf("inv", "none")
    val d = new DataInputStream(new ByteArrayInputStream(
      Files.readAllBytes(Paths.get(dest, "inv.inverted.raw"))))
    val nShards = readIntLE(d)
    val shards = (0 until nShards).map { _ =>
      val name = { val b = new Array[Byte](readIntLE(d)); d.readFully(b); new String(b, "UTF-8") }
      val nVals = readIntLE(d)
      name -> (0 until nVals).map { _ =>
        val value: Any = d.readByte() match {
          case 0 => d.readLong()
          case 1 => d.readDouble()
          case 2 => { val b = new Array[Byte](d.readUnsignedShort()); d.readFully(b); new String(b, "UTF-8") }
          case 3 => d.readByte() != 0
          case t => fail(s"unknown inverted tag $t")
        }
        val bm = new Array[Byte](readIntLE(d)); d.readFully(bm)
        value -> decode32Outer(bm)
      }.toMap
    }.toMap
    assert(d.read() === -1, "trailing bytes after the shard sections")
    assert(shards.keySet === Set("id", "label", "score", "flag"))
    // keys are 1-based in pk order: pk f"$i%03d" sorts numerically, so row i
    // holds key i+1. label = i % 5 except i % 11 == 3 (NULL → absent).
    val expectLabel2 = (0 until 40).filter(i => i % 11 != 3 && i % 5 == 2).map(i => (i + 1).toLong)
    assert(shards("label")(2L) === expectLabel2)
    val allNullIdx = (0 until 40).filter(_ % 11 == 3)
    allNullIdx.foreach { i =>
      shards("label").values.foreach(keys => assert(!keys.contains((i + 1).toLong),
        s"NULL-label row $i leaked into a posting list"))
    }
    // booleans: flag=true ⇔ even i
    assert(shards("flag")(true) === (0 until 40 by 2).map(i => (i + 1).toLong))
    // strings: each pk has exactly its own key
    assert(shards("id")("007") === Seq(8L))
    // doubles: score = i / 10.0
    assert(shards("score")(1.5) === Seq(16L))
  }

  /** decode64 wrapper for postings (single pass, asserts full consumption). */
  private def decode32Outer(bm: Array[Byte]): Seq[Long] = decode64(bm)

  // ---- experimental (CFLAT multi-vector) bucket export ----

  private def mvFixture(n: Int, dim: Int) =
    (0 until n).map { i =>
      val v0 = Array.tabulate(dim)(j => ((i * 31 + j * 7) % 13 - 6).toFloat / 6f)
      val v1 = Array.tabulate(dim)(j => ((i * 17 + j * 3) % 11 - 5).toFloat / 5f)
      (f"k$i%03d",
        if (i % 9 == 4) Option.empty[Long] else Some((i % 4).toLong),
        s"t${i % 3}", i % 2 == 0, v0.toSeq, v1.toSeq)
    }.toDF("id", "label", "tag", "flag", "v0", "v1")

  private def mvMeta(name: String, dim: Int, quant: String = "none") =
    CollectionMeta(name, dim = dim, distance = "euclidean", quantization = quant,
      fields = Seq(
        IndexField("id", "string", primaryKey = true),
        IndexField("label", "integer", enableNull = true),
        IndexField("tag", "string"),
        IndexField("flag", "boolean"),
        IndexField("v0", "vector"),
        IndexField("v1", "vector")))

  test("experimental (CFLAT) export → import round-trip: named vectors, " +
    "i64/string/boolean metadata, NULL-as-absent — none and f16 storage") {
    for (quant <- Seq("none", "f16")) {
      val name = s"mvrt$quant"
      val cat = newCatalog()
      cat.createCollection(mvMeta(name, 6, quant))
      cat.loadCollection(name)
      cat.insert(name, mvFixture(30, 6))
      cat.flush(name)
      val dest = Files.createTempDirectory("graft-cflat-out").toString
      assert(ColttExport.exportExperimentalCollection(spark, cat, name, dest) === 30)
      val cat2 = newCatalog()
      assert(ColttImport.importExperimentalSnapshot(spark, cat2, name, dest,
        pkName = "id") === 30)
      def canon(df: org.apache.spark.sql.DataFrame) = {
        def vec(c: String) = (quant match {
          case "none" => col(c)
          case q      => graft.functions.dequantize(col(c), q)
        }).cast("array<double>")
        df.select(col("id"), col("label"), col("tag"), col("flag"),
            vec("v0").as("w0"), vec("v1").as("w1"))
          .collect().map(r => (r.getString(0), Option(r.get(1)), r.getString(2),
            r.getBoolean(3), r.getSeq[Double](4), r.getSeq[Double](5))).sortBy(_._1)
      }
      val src = canon(cat.loadCollection(name))
      val got = canon(cat2.loadCollection(name))
      assert(got === src, s"$quant: CFLAT round-trip diverged")
      val m2 = cat2.getMeta(name)
      assert(m2.isMultiVector && m2.quantization === quant && m2.idColumn === "id")
    }
  }

  test("experimental export: ShardVertexV2 routing parity; blob sections follow it; " +
    "single-vector and float-field collections refuse") {
    def independentShard(s: String): Int = {
      var h = BigInt("cbf29ce484222325", 16)
      val mask = (BigInt(1) << 64) - 1
      s.getBytes("UTF-8").foreach { b =>
        h = ((h ^ BigInt(b & 0xFF)) * BigInt("100000001b3", 16)) & mask
      }
      (h mod BigInt(16)).toInt
    }
    val rnd = new scala.util.Random(17)
    (1 to 300).foreach { _ =>
      val s = rnd.alphanumeric.take(1 + rnd.nextInt(20)).mkString
      assert(ColttExport.shardOfKey(s) === independentShard(s), s"key '$s'")
    }
    val cat = newCatalog()
    cat.createCollection(mvMeta("mvsh", 6))
    cat.loadCollection("mvsh")
    cat.insert("mvsh", mvFixture(30, 6))
    cat.flush("mvsh")
    val dest = Files.createTempDirectory("graft-cflat-sh").toString
    ColttExport.exportExperimentalCollection(spark, cat, "mvsh", dest)
    // hand-walk the 16 sections: every key must sit in ITS FNV shard (the
    // reference loads sections as stored and looks up by this hash — a
    // mis-sharded entry is unreachable on a live node)
    val d = new DataInputStream(new ByteArrayInputStream(
      Files.readAllBytes(Paths.get(dest, "mvsh.vertex"))))
    def readStr(): String = {
      val b = new Array[Byte](d.readUnsignedShort()); d.readFully(b); new String(b, "UTF-8")
    }
    var seen = 0
    (0 until 16).foreach { s =>
      val count = d.readLong()
      (0L until count).foreach { _ =>
        val key = readStr()
        assert(ColttExport.shardOfKey(key) === s, s"key $key placed in shard $s")
        seen += 1
        (0 until d.readInt()).foreach { _ =>
          readStr(); val dim = d.readInt(); d.skipBytes(dim * 4)
        }
        (0 until d.readInt()).foreach { _ =>
          readStr()
          d.readByte() match {
            case 0 => d.skipBytes(8)
            case 1 => d.skipBytes(d.readUnsignedShort())
            case t => fail(s"unknown experimental meta tag $t")
          }
        }
      }
    }
    assert(seen === 30 && d.read() === -1)
    // contracts: a single-vector collection has no CFLAT representation …
    val sv = newCatalog()
    sv.createCollection(exMeta("plain", 8))
    sv.loadCollection("plain")
    sv.insert("plain", fixture(5, 8))
    sv.flush("plain")
    intercept[IllegalArgumentException](ColttExport.exportExperimentalCollection(
      spark, sv, "plain", Files.createTempDirectory("graft-cflat-e1").toString))
    // … and a float field has no experimental wire representation
    val fl = newCatalog()
    fl.createCollection(CollectionMeta("mvf", dim = 4, distance = "euclidean",
      fields = Seq(
        IndexField("id", "string", primaryKey = true),
        IndexField("score", "float"),
        IndexField("v0", "vector"),
        IndexField("v1", "vector"))))
    fl.loadCollection("mvf")
    fl.insert("mvf", Seq(("a", 1.5, Seq(1f, 0f, 0f, 0f), Seq(0f, 1f, 0f, 0f)))
      .toDF("id", "score", "v0", "v1"))
    fl.flush("mvf")
    intercept[IllegalArgumentException](ColttExport.exportExperimentalCollection(
      spark, fl, "mvf", Files.createTempDirectory("graft-cflat-e2").toString))
    // … and a per-field dim override cannot ride the single collection-level
    // dim of the experimental metadata JSON (a mixed-dim bucket would be
    // un-updatable on a reference node and un-importable back)
    val od = newCatalog()
    od.createCollection(CollectionMeta("mvod", dim = 4, distance = "euclidean",
      fields = Seq(
        IndexField("id", "string", primaryKey = true),
        IndexField("v0", "vector", dim = Some(2)),
        IndexField("v1", "vector"))))
    od.loadCollection("mvod")
    od.insert("mvod", Seq(("a", Seq(1f, 0f), Seq(0f, 1f, 0f, 0f))).toDF("id", "v0", "v1"))
    od.flush("mvod")
    intercept[IllegalArgumentException](ColttExport.exportExperimentalCollection(
      spark, od, "mvod", Files.createTempDirectory("graft-cflat-e3").toString))
  }

  test("contracts: multi-vector, schemaless, and dot-distance collections refuse loudly") {
    val cat = newCatalog()
    cat.createCollection(CollectionMeta("dot", dim = 4, distance = "dot",
      fields = Seq(IndexField("id", "string", primaryKey = true))))
    cat.loadCollection("dot")
    cat.insert("dot", Seq(("a", Seq(1f, 0f, 0f, 0f))).toDF("id", "vector"))
    cat.flush("dot")
    val dest = Files.createTempDirectory("graft-cexp-err").toString
    intercept[IllegalArgumentException](
      ColttExport.exportEdgeCollection(spark, cat, "dot", dest))
    cat.createCollection(CollectionMeta("sless", dim = 2, distance = "euclidean",
      schemaless = Some(true)))
    cat.loadCollection("sless")
    cat.insert("sless", Seq(("a", Seq(1f, 0f))).toDF("_id", "vector"))
    cat.flush("sless")
    intercept[IllegalArgumentException](
      ColttExport.exportEdgeCollection(spark, cat, "sless", dest))
    cat.createCollection(CollectionMeta("mv", dim = 2, distance = "euclidean",
      fields = Seq(
        IndexField("id", "string", primaryKey = true),
        IndexField("v0", "vector"),
        IndexField("v1", "vector"))))
    intercept[IllegalArgumentException](
      ColttExport.exportEdgeCollection(spark, cat, "mv", dest))
    // a destination already holding files refuses: a partial or previous
    // bucket must never mix with a fresh export
    val (catU, destU) = exportOf("used", "none")
    intercept[IllegalArgumentException](
      ColttExport.exportEdgeCollection(spark, catU, "used", destU))
  }
}
