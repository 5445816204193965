package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.collection.{CollectionMeta, GraftCatalog, IndexField}

/** Collection-level PQ layout: flush writes the m-byte code column + the
  * codebook sidecar, the resident view stays clean, ADC search ranks like
  * the exact search after rerank, and the sidecar follows the version
  * lifecycle (vacuum, unversioned prune). */
class CatalogPqSpec extends SparkSpec {

  import spark.implicits._

  private def newCatalog() =
    new GraftCatalog(spark, Files.createTempDirectory("graft-pqcat").toString)

  private def fixtureRows(n: Int, dim: Int) =
    (0 until n).map { i =>
      val v = Array.tabulate(dim)(j => ((i * 31 + j * 7) % 13 - 6).toFloat / 6f)
      (f"$i%03d", i, v.toSeq)
    }.toDF("id", "label", "vector")

  private def pqMeta(name: String, dim: Int = 16, quant: String = "none",
                     ivf: Option[Int] = None) =
    CollectionMeta(name, dim = dim, distance = "euclidean", quantization = quant,
      fields = Seq(
        IndexField("id", "string", primaryKey = true),
        IndexField("label", "integer")),
      ivfCells = ivf,
      pqSubspaces = Some(4), pqCodewords = Some(8), pqTrainIterations = Some(1))

  test("flush writes codes + sidecar; resident view and search stay clean") {
    val cat = newCatalog()
    cat.createCollection(pqMeta("pqa"))
    cat.loadCollection("pqa")
    cat.insert("pqa", fixtureRows(60, 16))
    cat.flush("pqa")
    // snapshot carries the m-byte binary code column
    val snapCols = cat.snapshot("pqa").schema
    assert(snapCols.fieldNames.contains(GraftCatalog.PqCodeCol))
    assert(snapCols(GraftCatalog.PqCodeCol).dataType ===
      org.apache.spark.sql.types.BinaryType)
    val codeLens = cat.snapshot("pqa")
      .select(length(col(GraftCatalog.PqCodeCol))).distinct().collect().map(_.getInt(0))
    assert(codeLens.toSeq === Seq(4))
    // resident view (and thus search results / mutations) never sees it
    cat.releaseCollection("pqa"); cat.loadCollection("pqa")
    assert(!cat.resident("pqa").columns.contains(GraftCatalog.PqCodeCol))
    val q = fixtureRows(1, 16).select("vector").head().getSeq[Float](0).toArray
    assert(!cat.search("pqa", q, topK = 3).columns.contains(GraftCatalog.PqCodeCol))
  }

  test("ADC + rerank over the code layout equals the exact search top-k") {
    val cat = newCatalog()
    cat.createCollection(pqMeta("pqb"))
    cat.loadCollection("pqb")
    cat.insert("pqb", fixtureRows(60, 16))
    cat.flush("pqb")
    val q = fixtureRows(7, 16).where(col("label") === 6)
      .select("vector").head().getSeq[Float](0).toArray
    // overFetch=6 ⇒ 30 of 60 rows rerank-scored exactly — recovers the true
    // top-5 on this small fixture
    val pq = cat.searchPq("pqb", q, topK = 5, rerank = true, overFetch = 6)
      .select("id", "dist").collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    val exact = cat.search("pqb", q, topK = 5)
      .select("id", "dist").collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(pq === exact)
  }

  test("quantized (f16) PQ collection: codebook trains on decoded vectors, search works") {
    val cat = newCatalog()
    cat.createCollection(pqMeta("pqq", quant = "f16"))
    cat.loadCollection("pqq")
    cat.insert("pqq", fixtureRows(40, 16))
    cat.flush("pqq")
    val q = fixtureRows(3, 16).where(col("label") === 2)
      .select("vector").head().getSeq[Float](0).toArray
    val pq = cat.searchPq("pqq", q, topK = 5, rerank = true, overFetch = 8)
      .select("id", "dist").collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    val exact = cat.search("pqq", q, topK = 5)
      .select("id", "dist").collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    // both paths score the same f16-decoded stored vectors
    assert(pq === exact)
  }

  test("IVF + PQ compose: cell-partitioned snapshot with code columns") {
    val cat = newCatalog()
    cat.createCollection(pqMeta("pqivf", ivf = Some(4)))
    cat.loadCollection("pqivf")
    cat.insert("pqivf", fixtureRows(60, 16))
    cat.flush("pqivf")
    val snap = cat.snapshot("pqivf")
    assert(snap.columns.contains(GraftCatalog.CellCol))
    assert(snap.columns.contains(GraftCatalog.PqCodeCol))
    val q = fixtureRows(1, 16).select("vector").head().getSeq[Float](0).toArray
    // both index paths answer over the same layout
    assert(cat.searchIvf("pqivf", q, topK = 3, nprobe = 2).count() === 3)
    assert(cat.searchPq("pqivf", q, topK = 3).count() === 3)
    // cell-pruned ADC (IVF-PQ): probing ALL cells equals the unprobed scan;
    // a tight probe still answers from the query's own cells
    val all = cat.searchPq("pqivf", q, topK = 3, nprobe = Some(4))
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    val unprobed = cat.searchPq("pqivf", q, topK = 3)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(all === unprobed)
    assert(cat.searchPq("pqivf", q, topK = 3, nprobe = Some(1)).count() === 3)
    // residual codes + rerank recover the exact top-k through the full API
    val reranked = cat.searchPq("pqivf", q, topK = 5, rerank = true, overFetch = 8)
      .select("id", "dist").collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    val exact = cat.search("pqivf", q, topK = 5)
      .select("id", "dist").collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(reranked === exact)
    // nprobe without an IVF layout is a contract error
    val cat2 = newCatalog()
    cat2.createCollection(pqMeta("pqonly"))
    cat2.loadCollection("pqonly")
    cat2.insert("pqonly", fixtureRows(30, 16))
    cat2.flush("pqonly")
    val ex = intercept[IllegalArgumentException](
      cat2.searchPq("pqonly", q, topK = 3, nprobe = Some(2)))
    assert(ex.getMessage.contains("no IVF layout"))
  }

  test("sidecar follows the version lifecycle (unversioned prune + vacuum)") {
    val root = Files.createTempDirectory("graft-pqlc").toString
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def pqDirExists(name: String, v: Int) =
      fs.exists(new org.apache.hadoop.fs.Path(s"$root/$name/v${v}_pq"))
    // unversioned: flush prunes the previous version's sidecar
    val cat = new GraftCatalog(spark, root)
    cat.createCollection(pqMeta("pqu"))
    cat.loadCollection("pqu")
    cat.insert("pqu", fixtureRows(30, 16))
    cat.flush("pqu")
    assert(pqDirExists("pqu", 1))
    cat.insert("pqu", fixtureRows(31, 16).where(col("label") === 30))
    cat.flush("pqu")
    assert(pqDirExists("pqu", 2) && !pqDirExists("pqu", 1))
    // versioned: vacuum removes old sidecars with old versions
    cat.createCollection(pqMeta("pqv").copy(versioning = true))
    cat.loadCollection("pqv")
    cat.insert("pqv", fixtureRows(30, 16))
    cat.flush("pqv")
    cat.insert("pqv", fixtureRows(31, 16).where(col("label") === 30))
    cat.flush("pqv")
    assert(pqDirExists("pqv", 1) && pqDirExists("pqv", 2))
    assert(cat.vacuum("pqv", keepLast = 1) === Seq(1))
    assert(!pqDirExists("pqv", 1) && pqDirExists("pqv", 2))
  }

  test("contracts: no-PQ collection rejected, dot-metric rejected, empty flush degrades") {
    val cat = newCatalog()
    cat.createCollection(CollectionMeta("plain", dim = 16, distance = "euclidean",
      fields = Seq(IndexField("id", "string", primaryKey = true))))
    cat.loadCollection("plain")
    cat.insert("plain", fixtureRows(5, 16).select("id", "vector"))
    cat.flush("plain")
    val q = Array.fill(16)(0.1f)
    val ex = intercept[IllegalArgumentException](cat.searchPq("plain", q, topK = 3))
    assert(ex.getMessage.contains("no PQ layout"))
    intercept[IllegalArgumentException](
      CollectionMeta("bad", dim = 16, distance = "dot",
        fields = Seq(IndexField("id", "string", primaryKey = true)),
        pqSubspaces = Some(4), pqCodewords = Some(8)))
    // empty collection: flush writes no sidecar; searchPq returns empty
    cat.createCollection(pqMeta("pqe"))
    cat.loadCollection("pqe")
    cat.flush("pqe")
    assert(cat.searchPq("pqe", q, topK = 3).count() === 0)
  }
}
