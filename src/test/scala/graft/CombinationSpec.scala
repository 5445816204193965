package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.collection._
import graft.operators.MultiVectorSearch.FieldQuery

/** Feature-combination coverage: the catalog options compose — quantization
  * under IVF layouts, quantization under schema-less collections,
  * versioning under multi-vector collections. */
class CombinationSpec extends SparkSpec {
  import spark.implicits._

  private def newRoot = Files.createTempDirectory("graft-combo").toString

  test("quantized (f16) + IVF: cell-partitioned snapshot, probed search decodes fused") {
    val cat = new GraftCatalog(spark, newRoot)
    cat.createCollection(CollectionMeta("qivf", dim = 4, distance = "euclidean",
      quantization = "f16", ivfCells = Some(2),
      fields = Seq(IndexField("id", "string", primaryKey = true))))
    cat.loadCollection("qivf")
    // two separable clusters; centers named to be the pk-smallest rows
    val rows = Seq(("A0", Seq(0f, 0f, 8f, 0f)), ("A1", Seq(8f, 0f, 0f, 0f))) ++
      (1 to 20).map(i => (s"B0_$i", Seq(0f, 0f, 8f + (i % 3), 0f))) ++
      (1 to 20).map(i => (s"B1_$i", Seq(8f + (i % 3), 0f, 0f, 0f)))
    cat.insert("qivf", rows.toDF("id", "vector"))
    cat.flush("qivf")
    val q = Array(0f, 0f, 8f, 0f)
    val ivf = cat.searchIvf("qivf", q, topK = 5, nprobe = 1).collect()
    assert(ivf.head.getAs[String]("id") === "A0")
    assert(ivf.head.getAs[Double]("dist") === 0.0) // 8.0 and small ints are f16-exact
    assert(ivf.forall(r => r.getAs[String]("id").matches("A0|B0_.*"))) // pruned to cluster 0
    // full probe equals exact search over the loaded (decoded) collection
    val full = cat.searchIvf("qivf", q, topK = 10, nprobe = 2)
      .select("id").collect().map(_.getString(0)).toSeq
    val exact = cat.search("qivf", q, topK = 10)
      .select("id").collect().map(_.getString(0)).toSeq
    assert(full === exact)
    // the driver-local serving index decodes the same quantized snapshot
    val idx = cat.localIvfIndex("qivf")
    assert(idx.size === 42L)
    val local = idx.search(q, topK = 10, nprobe = 2).map(_._1.toString)
    assert(local === exact)
  }

  test("ivfCells on a multi-vector collection routes on the first vector field (r11)") {
    // round-2 ADVICE rejected this combination (it failed at search with an
    // opaque missing-sidecar error); r11 IMPLEMENTS it — the IVF layout
    // routes on routingField (default: the first declared vector field).
    // MultiIvfSpec drives the full lifecycle; here just the meta contract.
    val meta = CollectionMeta("mv", dim = 2, ivfCells = Some(4),
      fields = Seq(
        IndexField("id", "string", primaryKey = true),
        IndexField("v0", "vector"),
        IndexField("v1", "vector")))
    assert(meta.routingVector.map(_.name) === Some("v0"))
    // but a routingField naming a non-vector (or undeclared) field refuses
    val ex = intercept[IllegalArgumentException] {
      meta.copy(routingField = Some("id"))
    }
    assert(ex.getMessage.contains("vector field"))
  }

  test("schema-less + quantized (bf16): coerced map metadata over encoded vectors") {
    val cat = new GraftCatalog(spark, newRoot)
    cat.createCollection(CollectionMeta("sq", dim = 2, distance = "euclidean",
      quantization = "bf16", schemaless = Some(true)))
    cat.loadCollection("sq")
    cat.insert("sq", Seq(
      ("a", Seq(1f, 0f), 5L), ("b", Seq(2f, 0f), 10L)
    ).toDF("_id", "vector", "n"))
    cat.flush("sq"); cat.releaseCollection("sq"); cat.loadCollection("sq")
    // stored type is the quantized short array
    assert(cat.snapshot("sq").schema("__vector").dataType.simpleString === "array<smallint>")
    val hit = cat.search("sq", Array(1f, 0f), topK = 1,
      filter = Some(FilterExpr.Single("n", FilterExpr.Gte, 10))).head()
    assert(hit.getAs[String]("_id") === "b")
    // 1.0/2.0 are bf16-exact -> distances exact despite quantization
    assert(hit.getAs[Double]("dist") === 1.0)
  }

  test("multi-vector + versioning: time travel across flushed snapshots") {
    val cat = new GraftCatalog(spark, newRoot)
    cat.createCollection(CollectionMeta("mvv", dim = 2, distance = "euclidean",
      versioning = true, fields = Seq(
        IndexField("id", "string", primaryKey = true),
        IndexField("v0", "vector"), IndexField("v1", "vector"))))
    cat.loadCollection("mvv")
    cat.insert("mvv", Seq(("a", Seq(1f, 0f), Seq(0f, 1f))).toDF("id", "v0", "v1"))
    cat.flush("mvv")
    cat.insert("mvv", Seq(("b", Seq(2f, 0f), Seq(0f, 2f))).toDF("id", "v0", "v1"))
    cat.flush("mvv")
    assert(cat.timeTravel("mvv", 1).count() === 1)
    assert(cat.timeTravel("mvv", 2).count() === 2)
    val top = cat.searchMulti("mvv", Seq(
      FieldQuery("v0", Array(2f, 0f), 50), FieldQuery("v1", Array(0f, 2f), 50)), topK = 1)
    assert(top.head().getAs[String]("id") === "b")
    assert(cat.vacuum("mvv", keepLast = 1) === Seq(1))
  }
}
