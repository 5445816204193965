package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.collection._
import graft.operators.MultiVectorSearch.FieldQuery

/** Multi-vector (CFLAT) collections through the full catalog API —
  * create / validated ingest / flush / load / weighted search, with the
  * experimental engine's validation error parity
  * (/root/reference/experimental/experimental_analyzer.go). */
class MultiVectorCollectionSpec extends SparkSpec {
  import spark.implicits._

  private def newCat = new GraftCatalog(spark, Files.createTempDirectory("graft-mv").toString)

  private def mkMeta(quant: String = "none", distance: String = "euclidean") =
    CollectionMeta("mv", dim = 4, distance = distance, quantization = quant,
      fields = Seq(
        IndexField("id", "string", primaryKey = true),
        IndexField("tag", "integer", enableNull = true),
        IndexField("v0", "vector"),
        IndexField("v1", "vector")))

  private def rows = Seq(
    ("a", 1L, Seq(1f, 0f, 0f, 0f), Seq(0f, 1f, 0f, 0f)),
    ("b", 2L, Seq(0f, 1f, 0f, 0f), Seq(1f, 0f, 0f, 0f)),
    ("c", 3L, Seq(0f, 0f, 1f, 0f), Seq(0f, 0f, 0f, 1f))
  ).toDF("id", "tag", "v0", "v1")

  test("create/ingest/search round trip with two named vector fields") {
    val cat = newCat
    cat.createCollection(mkMeta())
    cat.loadCollection("mv")
    cat.insert("mv", rows)
    cat.flush("mv"); cat.releaseCollection("mv"); cat.loadCollection("mv")
    val out = cat.searchMulti("mv", Seq(
      FieldQuery("v0", Array(1f, 0f, 0f, 0f), ratio = 70),
      FieldQuery("v1", Array(0f, 1f, 0f, 0f), ratio = 30)), topK = 3).collect()
    assert(out.length === 3)
    assert(out.head.getAs[String]("id") === "a") // exact match on both fields
    assert(out.head.getAs[Double]("score") === 100.0)
  }

  test("meta round-trips through JSON with vector fields and per-field dim") {
    val meta = CollectionMeta("m", dim = 8, fields = Seq(
      IndexField("id", "string", primaryKey = true),
      IndexField("img", "vector", dim = Some(16)),
      IndexField("txt", "vector")))
    val back = CollectionMeta.fromJson(meta.toJson)
    assert(back === meta)
    assert(back.dimOf(back.vectorFields.head) === 16)
    assert(back.dimOf(back.vectorFields.last) === 8)
  }

  test("ratio sum != 100 is rejected (experimental_analyzer.go:143-154 parity)") {
    val cat = newCat
    cat.createCollection(mkMeta()); cat.loadCollection("mv"); cat.insert("mv", rows)
    val ex = intercept[IllegalArgumentException] {
      cat.searchMulti("mv", Seq(FieldQuery("v0", Array(1f, 0f, 0f, 0f), ratio = 60)), 3)
    }
    assert(ex.getMessage.contains("sum to 100"))
  }

  test("undeclared query field and wrong dimension are rejected") {
    val cat = newCat
    cat.createCollection(mkMeta()); cat.loadCollection("mv"); cat.insert("mv", rows)
    val exField = intercept[IllegalArgumentException] {
      cat.searchMulti("mv", Seq(FieldQuery("nope", Array(1f, 0f, 0f, 0f), 100)), 3)
    }
    assert(exField.getMessage.contains("not a declared vector field"))
    val exDim = intercept[IllegalArgumentException] {
      cat.searchMulti("mv", Seq(FieldQuery("v0", Array(1f, 0f), 100)), 3)
    }
    assert(exDim.getMessage.contains("dimension mismatch"))
  }

  test("ingest rejects a missing vector field and a wrong-dim vector") {
    val cat = newCat
    cat.createCollection(mkMeta()); cat.loadCollection("mv")
    val exMissing = intercept[IllegalArgumentException] {
      cat.insert("mv", rows.drop("v1"))
    }
    assert(exMissing.getMessage.contains("missing vector column 'v1'"))
    val badDim = Seq(("x", 1L, Seq(1f, 0f), Seq(0f, 1f, 0f, 0f))).toDF("id", "tag", "v0", "v1")
    val exDim = intercept[Exception] { cat.insert("mv", badDim); cat.count("mv") }
    assert(exDim.getMessage.contains("dimension mismatch"))
  }

  test("quantized multi-vector collection: search decodes stored fields (f16)") {
    val cat = newCat
    cat.createCollection(mkMeta(quant = "f16"))
    cat.loadCollection("mv"); cat.insert("mv", rows)
    val out = cat.searchMulti("mv", Seq(
      FieldQuery("v0", Array(1f, 0f, 0f, 0f), 50),
      FieldQuery("v1", Array(0f, 1f, 0f, 0f), 50)), topK = 1).collect()
    assert(out.head.getAs[String]("id") === "a")
    assert(out.head.getAs[Double]("score") === 100.0) // unit basis vectors are f16-exact
  }

  test("f16 searchMulti (fused kernel) equals decode-then-distance on random vectors") {
    val rnd = new scala.util.Random(41)
    def vec() = Seq.fill(4)(rnd.nextFloat() * 8f - 4f)
    val data = (0 until 64).map(i => (f"r$i%03d", i.toLong, vec(), vec()))
      .toDF("id", "tag", "v0", "v1")
    val cat = newCat
    cat.createCollection(mkMeta(quant = "f16"))
    cat.loadCollection("mv")
    cat.insert("mv", data)
    val q0 = Array.fill(4)(rnd.nextFloat() * 8f - 4f)
    val q1 = Array.fill(4)(rnd.nextFloat() * 8f - 4f)
    val fq = Seq(FieldQuery("v0", q0, ratio = 55), FieldQuery("v1", q1, ratio = 45))
    val got = cat.searchMulti("mv", fq, topK = 10).collect().map(_.toString).toSeq
    // reference arm: materialize dequantized columns and run the plain
    // (unfused) distance routing over them — the pre-r10 plan shape
    val meta = cat.getMeta("mv")
    val decoded = cat.resident("mv")
      .withColumn("d0", graft.functions.dequantize(col("v0"), "f16"))
      .withColumn("d1", graft.functions.dequantize(col("v1"), "f16"))
    val routed = fq.map(f => f.copy(
      vectorCol = if (f.vectorCol == "v0") "d0" else "d1",
      queryVector = GraftCatalog.prepareQueryVector(f.queryVector, meta)))
    val want = graft.operators.MultiVectorSearch.search(
      decoded, routed, topK = 10, metric = "euclidean", idCol = "id")
      .collect().map(_.toString).toSeq
    assert(got === want)
  }

  test("single-vector collections reject searchMulti and vice versa") {
    val cat = newCat
    cat.createCollection(mkMeta()); cat.loadCollection("mv")
    val ex = intercept[IllegalArgumentException] {
      cat.search("mv", Array(1f, 0f, 0f, 0f), topK = 1)
    }
    assert(ex.getMessage.contains("use searchMulti"))
  }
}
