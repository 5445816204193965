package graft

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.collection._
import graft.functions.QuantKernels
import graft.interop.ColttImport

/** Migration-path spec: write a synthetic blob in the reference's persisted
  * bucket format (meta.json + 16-shard type-tagged vertex blob,
  * edge/none_vectorstore.go:308-423 / edge_metadata.go:22-35), import it,
  * and require parity with a directly-ingested twin collection. */
class ColttImportSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 4

  /** Reference-format vertex-blob writer (the encoder mirror of
    * ColttImport.parseVertexBlob): 16 shard sections, big-endian throughout,
    * metadata as u16-len key + 1-byte type tag (0 i64, 1 string, 2 f64,
    * 3 bool). */
  private def writeBlob(shards: Seq[Seq[(Long, Array[Float], Seq[(String, Any)])]],
                        quantization: String = "none"): Array[Byte] = {
    require(shards.size == 16)
    val bos = new ByteArrayOutputStream()
    val d = new DataOutputStream(bos)
    shards.foreach { entries =>
      d.writeLong(entries.size.toLong)
      entries.foreach { case (key, vec, meta) =>
        d.writeLong(key)
        d.writeInt(vec.length)
        vec.foreach { f =>
          quantization match {
            case "none" => d.writeInt(java.lang.Float.floatToIntBits(f))
            case "f16"  => d.writeShort(QuantKernels.floatToF16(f))
            case "bf16" => d.writeShort(QuantKernels.floatToBf16(f))
            case "f8"   => d.writeByte(QuantKernels.floatToF8(f))
          }
        }
        d.writeInt(meta.size)
        meta.foreach { case (k, v) =>
          val kb = k.getBytes("UTF-8")
          d.writeShort(kb.length)
          d.write(kb)
          v match {
            case i: Long    => d.writeByte(0); d.writeLong(i)
            case s: String  => d.writeByte(1)
              val sb = s.getBytes("UTF-8"); d.writeShort(sb.length); d.write(sb)
            case x: Double  => d.writeByte(2); d.writeDouble(x)
            case b: Boolean => d.writeByte(3); d.writeByte(if (b) 1 else 0)
          }
        }
      }
    }
    d.flush()
    bos.toByteArray
  }

  private def metaJson(distance: Int, quantization: Int): String =
    s"""{"dim":$dim,"distance":$distance,"quantization":$quantization,
       |"index_type":{
       |  "doc_id":{"index_name":"doc_id","index_type":0,"enable_null":false,"primary_key":true},
       |  "rank":{"index_name":"rank","index_type":1,"enable_null":false,"primary_key":false},
       |  "weight":{"index_name":"weight","index_type":2,"enable_null":true,"primary_key":false},
       |  "flagged":{"index_name":"flagged","index_type":3,"enable_null":true,"primary_key":false}
       |},"versioning":false}""".stripMargin

  /** n deterministic vertices scattered over the 16 shards by key, the
    * reference's sharding rule being irrelevant to the parse (sections are
    * read in order regardless of how entries were distributed). */
  private def vertices(n: Int): Seq[(Long, Array[Float], Seq[(String, Any)])] = {
    val rnd = new scala.util.Random(11)
    (1 to n).map { i =>
      (1000L + i,
        Array.fill(dim)(rnd.nextFloat()),
        Seq[(String, Any)]("doc_id" -> s"doc-$i", "rank" -> i.toLong,
          "weight" -> (i * 0.25), "flagged" -> (i % 3 == 0)))
    }
  }

  private def toShards(vs: Seq[(Long, Array[Float], Seq[(String, Any)])]) =
    (0 until 16).map(s => vs.filter(_._1 % 16 == s))

  private def writeBucket(dir: java.nio.file.Path, name: String, distance: Int,
                          quantization: Int, vs: Seq[(Long, Array[Float], Seq[(String, Any)])],
                          quantName: String): Unit = {
    Files.write(dir.resolve(s"$name.meta.json"), metaJson(distance, quantization).getBytes("UTF-8"))
    Files.write(dir.resolve(s"$name.vertex"), writeBlob(toShards(vs), quantName))
  }

  test("metadata import: enums, field map, pk — reference meta.json → CollectionMeta") {
    val m = ColttImport.parseMetadata("mcol", metaJson(distance = 1, quantization = 3))
    assert(m.dim === dim && m.distance === "euclidean" && m.quantization === "bf16")
    assert(m.idColumn === "doc_id")
    assert(m.fields.map(f => f.name -> f.fieldType).toMap ===
      Map("doc_id" -> "string", "rank" -> "integer", "weight" -> "float", "flagged" -> "boolean"))
    assert(m.fields.find(_.name == "weight").get.enableNull)
  }

  test("f32 bucket import: search parity with direct ingest, all four value types survive") {
    val dir = Files.createTempDirectory("coltt-bucket")
    val vs = vertices(60)
    writeBucket(dir, "imp", distance = 1, quantization = 0, vs, "none")
    val cat = new GraftCatalog(spark, Files.createTempDirectory("graft-imp").toString)
    val n = ColttImport.importSnapshot(spark, cat, "imp", dir.toString)
    assert(n === 60L)

    // twin collection, ingested directly from the same logical rows
    val twin = new GraftCatalog(spark, Files.createTempDirectory("graft-twin").toString)
    twin.createCollection(ColttImport.parseMetadata("imp", metaJson(1, 0)))
    twin.loadCollection("imp")
    twin.insert("imp", vs.map { case (_, vec, meta) =>
      val m = meta.toMap
      (m("doc_id").asInstanceOf[String], m("rank").asInstanceOf[Long],
        m("weight").asInstanceOf[Double], m("flagged").asInstanceOf[Boolean], vec)
    }.toDF("doc_id", "rank", "weight", "flagged", "vector"))

    val q = Array(0.3f, 0.7f, 0.2f, 0.5f)
    val got = cat.search("imp", q, 10).collect().map(_.toString).toSeq
    val want = twin.search("imp", q, 10).collect().map(_.toString).toSeq
    assert(got === want)
    assert(got.nonEmpty)

    // typed metadata round-trip, including bool and float tags
    val row = cat.snapshot("imp").where(col("doc_id") === "doc-3")
      .select("rank", "weight", "flagged").head()
    assert(row.getLong(0) === 3L && row.getDouble(1) === 0.75 && row.getBoolean(2) === true)
  }

  test("f16 bucket import: quantized element decode matches the reference loader") {
    val dir = Files.createTempDirectory("coltt-bucket-f16")
    val vs = vertices(24)
    writeBucket(dir, "impq", distance = 0, quantization = 1, vs, "f16")
    val cat = new GraftCatalog(spark, Files.createTempDirectory("graft-impq").toString)
    assert(ColttImport.importSnapshot(spark, cat, "impq", dir.toString) === 24L)
    // stored vectors must equal f16ToFloat(floatToF16(x)) of the originals —
    // the import decodes the persisted f16 bits; a cosine search works
    val res = cat.search("impq", Array(0.5f, 0.5f, 0.5f, 0.5f), 5).collect()
    assert(res.length === 5)
  }

  test("distributed import: skip-scan section offsets + executor-side parse match " +
    "the sequential path exactly") {
    val dir = Files.createTempDirectory("coltt-bucket-dist")
    val vs = vertices(120)
    writeBucket(dir, "dimp", distance = 1, quantization = 0, vs, "none")
    // offsets found by the skip-scan must agree with a real parse: section i
    // starts where sections 0..i-1 ended
    val blob = Files.readAllBytes(dir.resolve("dimp.vertex"))
    val offs = ColttImport.sectionOffsets(new java.io.ByteArrayInputStream(blob), "none")
    assert(offs.length === 16 && offs.head === 0L && offs.sorted.sameElements(offs))
    assert(offs.last < blob.length)

    val cat = new GraftCatalog(spark, Files.createTempDirectory("graft-dimp").toString)
    assert(ColttImport.importSnapshotDistributed(spark, cat, "dimp", dir.toString) === 120L)
    val seqCat = new GraftCatalog(spark, Files.createTempDirectory("graft-dimp-seq").toString)
    ColttImport.importSnapshot(spark, seqCat, "dimp", dir.toString)
    val q = Array(0.3f, 0.7f, 0.2f, 0.5f)
    assert(cat.search("dimp", q, 10).collect().map(_.toString).toSeq ===
      seqCat.search("dimp", q, 10).collect().map(_.toString).toSeq)
    // full-state parity, not just top-10
    def all(c: GraftCatalog) = c.snapshot("dimp")
      .select("doc_id", "rank", "weight", "flagged").collect()
      .map(_.toString).toSet
    assert(all(cat) === all(seqCat))

    // quantized twin: the skip-scan's ONLY quantization-dependent logic is
    // the element width, so a 2-byte (f16) blob must also land mid-entry
    // nowhere — parity with the sequential f16 import proves the widths
    val dirQ = Files.createTempDirectory("coltt-bucket-dist-f16")
    writeBucket(dirQ, "dimpq", distance = 0, quantization = 1, vertices(64), "f16")
    val catQ = new GraftCatalog(spark, Files.createTempDirectory("graft-dimpq").toString)
    assert(ColttImport.importSnapshotDistributed(spark, catQ, "dimpq", dirQ.toString) === 64L)
    val seqQ = new GraftCatalog(spark, Files.createTempDirectory("graft-dimpq-seq").toString)
    ColttImport.importSnapshot(spark, seqQ, "dimpq", dirQ.toString)
    assert(catQ.search("dimpq", q, 8).collect().map(_.toString).toSeq ===
      seqQ.search("dimpq", q, 8).collect().map(_.toString).toSeq)
  }

  test("experimental (CFLAT) bucket import: string-keyed multi-vector entries, " +
    "weighted search parity with direct ingest") {
    val dir = Files.createTempDirectory("coltt-bucket-mv")
    val rnd = new scala.util.Random(5)
    val vs = (1 to 30).map { i =>
      ColttImport.ColttMvVertex(s"key-$i",
        Map("img" -> Array.fill(dim)(rnd.nextFloat()), "txt" -> Array.fill(dim)(rnd.nextFloat())),
        Map[String, Any]("rank" -> i.toLong, "src" -> s"s${i % 3}"))
    }
    val metaJson =
      s"""{"dim":$dim,"distance":1,"quantization":0,"index_type":{
         |"img":{"index_name":"img","index_type":4,"enable_null":false},
         |"txt":{"index_name":"txt","index_type":4,"enable_null":false},
         |"rank":{"index_name":"rank","index_type":1,"enable_null":false},
         |"src":{"index_name":"src","index_type":0,"enable_null":false}
         |},"versioning":false}""".stripMargin
    Files.write(dir.resolve("mvimp.meta.json"), metaJson.getBytes("UTF-8"))
    Files.write(dir.resolve("mvimp.vertex"), ColttImport.encodeMultiVectorBlob(vs))
    val cat = new GraftCatalog(spark, Files.createTempDirectory("graft-mvimp").toString)
    assert(ColttImport.importExperimentalSnapshot(spark, cat, "mvimp", dir.toString) === 30L)

    val m = cat.getMeta("mvimp")
    assert(m.idColumn === "_key")
    assert(m.vectorFields.map(_.name).toSet === Set("img", "txt"))

    val twin = new GraftCatalog(spark, Files.createTempDirectory("graft-mvtwin").toString)
    twin.createCollection(ColttImport.parseExperimentalMetadata("mvimp", metaJson))
    twin.loadCollection("mvimp")
    twin.insert("mvimp", vs.map { v =>
      (v.key, v.meta("rank").asInstanceOf[Long], v.meta("src").asInstanceOf[String],
        v.vectors("img"), v.vectors("txt"))
    }.toDF("_key", "rank", "src", "img", "txt"))

    val fq = Seq(
      graft.operators.MultiVectorSearch.FieldQuery("img", Array(0.4f, 0.6f, 0.2f, 0.8f), ratio = 60),
      graft.operators.MultiVectorSearch.FieldQuery("txt", Array(0.1f, 0.9f, 0.3f, 0.5f), ratio = 40))
    val got = cat.searchMulti("mvimp", fq, topK = 5).collect().map(_.toString).toSeq
    val want = twin.searchMulti("mvimp", fq, topK = 5).collect().map(_.toString).toSeq
    assert(got === want && got.nonEmpty)

    // metadata round trip
    val row = cat.snapshot("mvimp").where(col("_key") === "key-7")
      .select("rank", "src").head()
    assert(row.getLong(0) === 7L && row.getString(1) === "s1")
  }

  test("fuzz: random and corrupt blobs fail loudly, never hang or allocate wildly") {
    val rnd = new scala.util.Random(99)
    // pure random bytes: every seed must throw (EOF-mapped or corrupt-count),
    // never loop or OOM
    for (seed <- 1 to 50) {
      val r = new scala.util.Random(seed)
      val junk = Array.fill(r.nextInt(4096))(r.nextInt().toByte)
      intercept[IllegalArgumentException] {
        ColttImport.parseVertexBlob(new java.io.ByteArrayInputStream(junk), "none")
      }
      intercept[IllegalArgumentException] {
        ColttImport.parseMultiVectorBlob(new java.io.ByteArrayInputStream(junk))
      }
    }
    // targeted corruption: a hostile vecLen (1 << 30) must be rejected by
    // the sanity bound BEFORE the allocation, with a "corrupt" message
    val bos = new java.io.ByteArrayOutputStream()
    val d = new java.io.DataOutputStream(bos)
    d.writeLong(1L); d.writeLong(42L); d.writeInt(1 << 30)
    (0 until 64).foreach(_ => d.writeInt(rnd.nextInt()))
    val ex = intercept[IllegalArgumentException] {
      ColttImport.parseVertexBlob(new java.io.ByteArrayInputStream(bos.toByteArray), "none")
    }
    assert(ex.getMessage.contains("corrupt vector length"))
  }

  test("missing nullable fields stay importable; truncated blob fails loudly") {
    val dir = Files.createTempDirectory("coltt-bucket-bad")
    val vs = vertices(8).map { case (k, v, meta) =>
      (k, v, meta.filterNot(kv => kv._1 == "weight" || kv._1 == "flagged"))
    }
    writeBucket(dir, "sparse", distance = 1, quantization = 0, vs, "none")
    val cat = new GraftCatalog(spark, Files.createTempDirectory("graft-sparse").toString)
    assert(ColttImport.importSnapshot(spark, cat, "sparse", dir.toString) === 8L)
    assert(cat.snapshot("sparse").count() === 8L)

    val blob = writeBlob(toShards(vertices(4)), "none")
    Files.write(dir.resolve("trunc.meta.json"), metaJson(1, 0).getBytes("UTF-8"))
    Files.write(dir.resolve("trunc.vertex"), blob.take(blob.length - 7))
    val ex = intercept[IllegalArgumentException] {
      ColttImport.importSnapshot(spark, cat, "trunc", dir.toString)
    }
    assert(ex.getMessage.contains("truncated"))
  }
}
