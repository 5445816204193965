package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.collection._

/** IVF layout through the catalog: flush partitions the snapshot by cell,
  * probed searches prune partition directories, recall is high when the
  * data actually clusters. */
class IvfCatalogSpec extends SparkSpec {
  import spark.implicits._

  /** 4 well-separated clusters of 50 points each. Centroid seeds are the k
    * pk-smallest rows, so centers are named "A0".."A3" (sorting before every
    * member "B<i>_<j>") — one seed lands in each cluster. */
  private def clustered = {
    val centers = Seq(
      Array(0f, 0f, 100f, 0f), Array(100f, 0f, 0f, 0f),
      Array(0f, 100f, 0f, 0f), Array(0f, 0f, 0f, 100f))
    val rows = centers.zipWithIndex.flatMap { case (c, ci) =>
      (s"A$ci", c.toSeq) +: (1 until 50).map { j =>
        (s"B${ci}_$j", c.map(x => x + (j % 7) - 3f).toSeq)
      }
    }
    rows.toDF("id", "vector")
  }

  private def mkCat(cells: Int) = {
    val cat = new GraftCatalog(spark, Files.createTempDirectory("graft-ivf").toString)
    cat.createCollection(CollectionMeta("ivf", dim = 4, distance = "euclidean",
      fields = Seq(IndexField("id", "string", primaryKey = true)),
      ivfCells = Some(cells)))
    cat.loadCollection("ivf")
    cat.insert("ivf", clustered)
    cat.flush("ivf")
    cat
  }

  test("flush writes a cell-partitioned snapshot; load drops the layout column") {
    val cat = mkCat(4)
    assert(cat.count("ivf") === 200)
    // the resident view has no __cell column (layout, not data)
    assert(!cat.loadCollection("ivf").columns.contains(GraftCatalog.CellCol))
    // all 4 cells materialized as directories
    val all = cat.ivfProbedFiles("ivf", Array(0f, 0f, 100f, 0f), nprobe = 4)
    assert(all.forall(_.contains("__cell=")))
    assert(all.map(f => f.split("__cell=")(1).split("/")(0)).distinct.length === 4)
  }

  test("probing fewer cells reads strictly fewer files (directory pruning)") {
    val cat = mkCat(4)
    val q = Array(0f, 0f, 100f, 0f)
    val one = cat.ivfProbedFiles("ivf", q, nprobe = 1)
    val all = cat.ivfProbedFiles("ivf", q, nprobe = 4)
    assert(one.nonEmpty && all.nonEmpty)
    assert(one.length < all.length, s"${one.length} vs ${all.length}")
  }

  test("searchIvf at nprobe=1 on clustered data: recall 1.0 vs exact for an in-cluster query") {
    val cat = mkCat(4)
    val q = Array(1f, 0f, 99f, 0f) // near cluster 0's center
    val ivf = cat.searchIvf("ivf", q, topK = 10, nprobe = 1)
      .select("id").collect().map(_.getString(0)).toSet
    val exact = cat.search("ivf", q, topK = 10)
      .select("id").collect().map(_.getString(0)).toSet
    val recall = (ivf & exact).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall $recall < 0.9 on separable clusters")
  }

  test("searchIvf with nprobe=cells equals exact search (full probe = no pruning loss)") {
    val cat = mkCat(4)
    val q = Array(50f, 50f, 0f, 0f) // between clusters
    val ivf = cat.searchIvf("ivf", q, topK = 15, nprobe = 4)
      .select("id").collect().map(_.getString(0)).toSeq
    val exact = cat.search("ivf", q, topK = 15)
      .select("id").collect().map(_.getString(0)).toSeq
    assert(ivf === exact)
  }
}
