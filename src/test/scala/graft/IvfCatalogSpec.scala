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

  test("auditRecall: both arms the knnJoin path; all-cells probe certifies recall 1.0") {
    val cat = mkCat(4)
    val all = cat.auditRecall("ivf", sampleMod = 7, nprobe = 4, k = 5).collect()
    assert(all.nonEmpty, "the id-hash sample selected no queries")
    // nprobe = |cells| degenerates both arms to the same exact scan
    assert(all.forall(_.getAs[Double]("recall") === 1.0),
      s"exact-vs-exact recall must be 1.0: ${all.mkString(",")}")
    // the pruned probe audits the SAME sampled queries, recall ∈ [0, 1];
    // on 4 well-separated clusters a query's neighbors share its cell
    val one = cat.auditRecall("ivf", sampleMod = 7, nprobe = 1, k = 5).collect()
    assert(one.length === all.length)
    assert(one.forall { r =>
      val rec = r.getAs[Double]("recall"); rec >= 0.0 && rec <= 1.0 })
    assert(one.forall(_.getAs[Long]("hits") <= 5))
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

  test("rebalance write: one data file per cell directory, not one per (task, cell)") {
    // without the rebalance hint every write task emits a file into every
    // cell directory it touches — tasks×cells files, the small-file
    // explosion that kills 100 TB snapshot reads. The rebalance shuffle
    // co-locates each cell into one task → one file per cell dir.
    val root = Files.createTempDirectory("graft-ivfreb").toString
    val cat = new GraftCatalog(spark, root)
    cat.createCollection(CollectionMeta("ivfr", dim = 4, distance = "euclidean",
      fields = Seq(IndexField("id", "string", primaryKey = true)),
      ivfCells = Some(4)))
    cat.loadCollection("ivfr")
    cat.insert("ivfr", clustered.repartition(4)) // every task holds rows of every cell
    cat.flush("ivfr")
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val cellDirs = fs.listStatus(new org.apache.hadoop.fs.Path(s"$root/ivfr/v1"))
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("__cell="))
    assert(cellDirs.length === 4)
    cellDirs.foreach { d =>
      val files = fs.listStatus(d.getPath).filter(_.getPath.getName.endsWith(".parquet"))
      assert(files.length === 1, s"${d.getPath.getName}: ${files.length} files")
    }
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

  test("flushing an EMPTY ivf collection falls back to the unpartitioned layout and stays loadable") {
    val cat = new GraftCatalog(spark, Files.createTempDirectory("graft-ivf-empty").toString)
    cat.createCollection(CollectionMeta("e", dim = 4, distance = "euclidean",
      fields = Seq(IndexField("id", "string", primaryKey = true)),
      ivfCells = Some(4)))
    cat.loadCollection("e")
    val v = cat.flush("e") // round-2 bug: partitionBy over zero rows published an unreadable snapshot
    assert(v === 1)
    assert(cat.loadCollection("e").count() === 0L)
    assert(cat.searchIvf("e", Array(0f, 0f, 0f, 0f), topK = 5, nprobe = 2).count() === 0L)
    // delete-to-empty then flush again exercises the same path on a non-fresh collection
    cat.insert("e", Seq(("a", Seq(1f, 0f, 0f, 0f))).toDF("id", "vector"))
    cat.delete("e", FilterExpr.Single("id", FilterExpr.Eq, "a"))
    assert(cat.flush("e") === 2)
    assert(cat.loadCollection("e").count() === 0L)
  }

  test("a concurrently-claimed version slot makes flush fail cleanly: no orphan, meta unchanged") {
    val root = Files.createTempDirectory("graft-ivf-race").toString
    val cat2 = new GraftCatalog(spark, root)
    cat2.createCollection(CollectionMeta("r", dim = 2, distance = "euclidean",
      fields = Seq(IndexField("id", "string", primaryKey = true))))
    cat2.loadCollection("r")
    cat2.insert("r", Seq(("a", Seq(1f, 2f))).toDF("id", "vector"))
    // simulate another driver having claimed v1 between our meta read and commit
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    fs.create(new org.apache.hadoop.fs.Path(s"$root/r/v1.claim"), false).close()
    intercept[GraftCatalog.ConcurrentFlushException] { cat2.flush("r") }
    // loser cleaned up: no staging dirs, meta still at v0
    val children = fs.listStatus(new org.apache.hadoop.fs.Path(s"$root/r"))
      .map(_.getPath.getName).toSet
    assert(!children.exists(_.startsWith(".staging")), s"staging orphaned: $children")
    assert(cat2.getMeta("r").currentVersion === 0)
  }

  test("a STALE claim (crashed writer) is reclaimed; a fresh claim still blocks") {
    val root = Files.createTempDirectory("graft-ivf-stale").toString
    val cat2 = new GraftCatalog(spark, root)
    cat2.createCollection(CollectionMeta("s", dim = 2, distance = "euclidean",
      fields = Seq(IndexField("id", "string", primaryKey = true))))
    cat2.loadCollection("s")
    cat2.insert("s", Seq(("a", Seq(1f, 2f))).toDF("id", "vector"))
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    // a claim whose embedded timestamp is ancient = a writer that crashed
    // between claim and publish → reclaimed, flush succeeds
    val stale = new org.apache.hadoop.fs.Path(s"$root/s/v1.claim")
    val os = fs.create(stale, false)
    os.write("9999@deadhost 1000".getBytes("UTF-8")) // epoch 1970 — long stale
    os.close()
    assert(cat2.flush("s") === 1)
    assert(spark.read.parquet(s"$root/s/v1").count() === 1L)
    // a FRESH claim (live writer) still blocks the next flush
    cat2.insert("s", Seq(("b", Seq(3f, 4f))).toDF("id", "vector"))
    val fresh = fs.create(new org.apache.hadoop.fs.Path(s"$root/s/v2.claim"), false)
    fresh.write(s"1@livehost ${System.currentTimeMillis()}".getBytes("UTF-8"))
    fresh.close()
    intercept[GraftCatalog.ConcurrentFlushException] { cat2.flush("s") }
    assert(cat2.getMeta("s").currentVersion === 1)
  }

  test("two racing flush threads: exactly one version is published, the loser throws, no orphans") {
    val root = Files.createTempDirectory("graft-ivf-race2").toString
    val catA = new GraftCatalog(spark, root)
    catA.createCollection(CollectionMeta("t", dim = 2, distance = "euclidean",
      fields = Seq(IndexField("id", "string", primaryKey = true))))
    val catB = new GraftCatalog(spark, root)
    Seq(catA, catB).foreach { c =>
      c.loadCollection("t")
      c.insert("t", Seq(("a", Seq(1f, 2f)), ("b", Seq(3f, 4f))).toDF("id", "vector"))
    }
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration._
    val results = Await.result(Future.sequence(Seq(catA, catB).map(c =>
      Future(scala.util.Try(c.flush("t"))))), 120.seconds)
    val ok = results.collect { case scala.util.Success(v) => v }
    val failed = results.collect { case scala.util.Failure(e) => e }
    // both may serialize cleanly (v1 then v2) or one loses the claim — both
    // are correct; what must never happen is a lost/corrupt published version
    assert(ok.nonEmpty)
    failed.foreach(e => assert(e.isInstanceOf[GraftCatalog.ConcurrentFlushException], e.toString))
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val children = fs.listStatus(new org.apache.hadoop.fs.Path(s"$root/t"))
      .map(_.getPath.getName).toSet
    assert(!children.exists(_.startsWith(".staging")), s"staging orphaned: $children")
    val meta = catA.getMeta("t")
    assert(ok.contains(meta.currentVersion))
    assert(spark.read.parquet(s"$root/t/v${meta.currentVersion}").count() === 2L)
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

  test("searchBatch: every query's block equals its single-query searchIvf; " +
    "plan has the partial WindowGroupLimit and no cartesian") {
    val cat = mkCat(4)
    val qs = Seq(
      "qa" -> Array(0f, 0f, 99f, 1f),
      "qb" -> Array(99f, 1f, 0f, 0f),
      "qc" -> Array(1f, 99f, 0f, 0f))
    val batch = cat.searchBatch("ivf", qs, topK = 5, nprobe = 2)
    val rows = batch.collect()
    qs.foreach { case (qid, v) =>
      val got = rows.filter(_.getString(0) == qid).sortBy(_.getInt(3)).map(_.getString(1)).toSeq
      val want = cat.searchIvf("ivf", v, topK = 5, nprobe = 2)
        .select("id").collect().map(_.getString(0)).toSeq
      assert(got === want, s"$qid: batch $got vs single $want")
    }
    // scale contract, same pins as the knnJoin guard: the per-query bound
    // is a partition-local WindowGroupLimit BELOW the exchange; no
    // cartesian product anywhere in the plan
    val phys = batch.queryExecution.executedPlan.toString
    assert(phys.contains("WindowGroupLimit"), phys.take(2000))
    assert(!phys.contains("CartesianProduct"), phys.take(2000))
    // contract guards
    intercept[IllegalArgumentException](cat.searchBatch("ivf", Seq.empty, 5, 2))
    intercept[IllegalArgumentException](
      cat.searchBatch("ivf", Seq("bad" -> Array(1f, 2f)), 5, 2)) // wrong dim
    // duplicate qids would merge into one window partition and silently
    // bound the COMBINED candidate set — must be rejected at the primitive
    assert(intercept[IllegalArgumentException](
      cat.searchBatch("ivf", Seq("q" -> qs.head._2, "q" -> qs(1)._2), 5, 2))
      .getMessage.contains("unique"))
  }
}
