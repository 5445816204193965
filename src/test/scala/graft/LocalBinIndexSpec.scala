package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ann.{Bin, LocalBinIndex}
import graft.collection.{CollectionMeta, GraftCatalog, IndexField}

/** Driver-local Hamming serving index: word packing, ranking agreement with
  * the distributed Hamming scan and with searchBinary's prefilter, stripe
  * fan-out invariance, and the catalog builder contract. */
class LocalBinIndexSpec extends SparkSpec {
  import spark.implicits._

  private def fixture(n: Int, dim: Int) = {
    val rnd = new scala.util.Random(29)
    (0 until n).map(i => (i.toLong, Array.fill(dim)(rnd.nextFloat() * 2 - 1)))
  }

  test("index ranking == distributed Hamming scan ranking (dim not multiple of 64)") {
    val dim = 75 // 10 bytes → 2 words, tail padding in both
    val rows = fixture(300, dim)
    val df = rows.toDF("vec_id", "embedding")
    val th = Bin.trainThresholds(df, "embedding")
    val codes = df.select(col("vec_id"), Bin.encode(col("embedding"), th).as("c"))
    val idx = LocalBinIndex.fromCodes(codes, "vec_id", "c", dim, th)
    assert(idx.size === 300L)
    for (qi <- Seq(0, 17, 299)) {
      val q = rows(qi)._2
      val got = idx.search(q, 12).map { case (id, d) => (id.asInstanceOf[Long], d.toLong) }
      val qc = Bin.encodeOne(q, th)
      val want = codes.select(col("vec_id"), Bin.hamming(col("c"), qc).as("h"))
        .orderBy(col("h").asc, col("vec_id").asc).limit(12)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(got === want, s"query $qi")
    }
  }

  test("stripe count does not change results") {
    val dim = 64
    val rows = fixture(500, dim)
    val df = rows.toDF("vec_id", "embedding")
    val th = Bin.trainThresholds(df, "embedding")
    val codes = df.select(col("vec_id"), Bin.encode(col("embedding"), th).as("c"))
    val q = rows(42)._2
    val results = Seq(1, 3, 16, 64).map { s =>
      LocalBinIndex.fromCodes(codes, "vec_id", "c", dim, th, stripes = s)
        .search(q, 10).map { case (id, d) => (id.asInstanceOf[Long], d) }
    }
    assert(results.distinct.size === 1, "fan-out must be a pure parallelization")
  }

  test("contract errors: topK, dim, code length, thresholds") {
    val dim = 16
    val df = fixture(20, dim).toDF("vec_id", "embedding")
    val th = Bin.trainThresholds(df, "embedding")
    val codes = df.select(col("vec_id"), Bin.encode(col("embedding"), th).as("c"))
    val idx = LocalBinIndex.fromCodes(codes, "vec_id", "c", dim, th)
    intercept[IllegalArgumentException] { idx.search(Array.fill(dim)(0f), 0) }
    intercept[IllegalArgumentException] { idx.search(Array.fill(dim + 1)(0f), 5) }
    intercept[IllegalArgumentException] {
      LocalBinIndex.fromCodes(codes, "vec_id", "c", dim, th.take(3))
    }
  }

  test("catalog builder serves the flushed layout; agrees with searchBinary's prefilter") {
    val cat = new GraftCatalog(spark, Files.createTempDirectory("graft-lbin").toString)
    cat.createCollection(CollectionMeta("lb", dim = 16, distance = "euclidean",
      fields = Seq(
        IndexField("id", "string", primaryKey = true),
        IndexField("label", "integer")),
      binaryIndex = Some(true)))
    cat.loadCollection("lb")
    val rows = (0 until 80).map { i =>
      val v = Array.tabulate(16)(j => ((i * 17 + j * 5) % 11 - 5).toFloat / 5f)
      (f"$i%03d", i, v.toSeq)
    }.toDF("id", "label", "vector")
    cat.insert("lb", rows)
    cat.flush("lb")
    val idx = cat.localBinIndex("lb")
    assert(idx.size === 80L)
    assert(idx.codeBytes === 80L * 8) // 16 dims → 2 bytes → one padded word
    val q = rows.where(col("id") === "033").select("vector").head().getSeq[Float](0).toArray
    // the searchBinary top-k at full over-fetch is the exact ranking of
    // everything the prefilter admits; the local index must agree with the
    // prefilter itself: its top-1 for a stored vector is Hamming 0
    val top = idx.search(q, 5)
    assert(top.head._2 === 0.0)
    assert(cat.searchBinary("lb", q, topK = 1).head().getDouble(1) === 0.0)
    // unflushed / non-binary collections are contract errors
    cat.createCollection(CollectionMeta("plain", dim = 16, distance = "euclidean",
      fields = Seq(IndexField("id", "string", primaryKey = true))))
    intercept[IllegalArgumentException] { cat.localBinIndex("plain") }
  }
}
