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

  test("warmCells pre-touches the layout: all cells = full row count, a cell " +
    "subset touches only its rows, byte columns really read (r13 verdict #7)") {
    val cat = mkCat(4)
    assert(cat.warmCells("ivf") === 200L)
    // one cell ⇒ exactly that cluster's 50 rows (partition-pruned read)
    val perCell = (0L until 4L).map(c => cat.warmCells("ivf", Seq(c)))
    assert(perCell.sum === 200L)
    assert(perCell.forall(_ === 50L))
    // warming composes with a delta chain (the folded state is what probes
    // read): 10 new rows land in their cells
    cat.insert("ivf", (0 until 10).map(i =>
      (s"C$i", Seq(100f, 0f, 0f, i.toFloat))).toDF("id", "vector"))
    cat.flushDelta("ivf")
    assert(cat.warmCells("ivf") === 210L)
    // never-flushed refuses
    cat.createCollection(CollectionMeta("w0", dim = 2, distance = "euclidean",
      fields = Seq(IndexField("id", "string", primaryKey = true)),
      ivfCells = Some(2)))
    val e = intercept[IllegalArgumentException](cat.warmCells("w0"))
    assert(e.getMessage.contains("never been flushed"))
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

  test("PREPARED probe: every swapped request re-prunes the scan's partitions " +
      "(r12 — the pruning guarantee survives plan-once/execute-many)") {
    val cat = mkCat(4)
    val q = Array(0f, 0f, 100f, 0f)
    // fewer probed cells → strictly fewer selected files, on the SWAPPED
    // plan of one compiled shape (same topK → same prepared entry)
    val one = cat.ivfPreparedProbedFiles("ivf", q, topK = 5, nprobe = 1)
    val all = cat.ivfPreparedProbedFiles("ivf", q, topK = 5, nprobe = 4)
    assert(one.nonEmpty && all.nonEmpty, "shape must compile (no fallback)")
    assert(one.length < all.length, s"${one.length} vs ${all.length}")
    assert(one.toSet.subsetOf(all.toSet))
    // a DIFFERENT query's swap prunes to DIFFERENT directories — pruning
    // follows each request, not the first swap's literal
    val q2 = Array(100f, 0f, 0f, 0f)
    val other = cat.ivfPreparedProbedFiles("ivf", q2, topK = 5, nprobe = 1)
    assert(other.nonEmpty && other.toSet != one.toSet,
      s"swap did not re-prune: ${other.toSeq} vs ${one.toSeq}")
    // and the served results agree with the plan-per-call path on both
    for (qq <- Seq(q, q2); np <- 1 to 4) {
      val (schema, rs) = cat.searchIvfPrepared("ivf", qq, 5, np)
      val want = cat.searchIvf("ivf", qq, 5, np).collect().toIndexedSeq
      assert(rs.map(_.toSeq) === want.map(_.toSeq), s"nprobe=$np")
    }
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

  // ---- filtered indexed search (S3 pre-filter semantics on the index rungs) ----

  /** [[clustered]] with a deterministic metadata label (crc32(id) % 3). */
  private def labeled =
    clustered.select(col("id"),
      (crc32(col("id")) % 3).cast("integer").as("label"), col("vector"))

  private def mkCatLabeled(cells: Int) = {
    val cat = new GraftCatalog(spark, Files.createTempDirectory("graft-ivfl").toString)
    cat.createCollection(CollectionMeta("ivfl", dim = 4, distance = "euclidean",
      fields = Seq(
        IndexField("id", "string", primaryKey = true),
        IndexField("label", "integer")),
      ivfCells = Some(cells)))
    cat.loadCollection("ivfl")
    cat.insert("ivfl", labeled)
    cat.flush("ivfl")
    cat
  }

  test("filtered searchIvf: full probe equals the exact filtered search; " +
    "the predicate pushes into the SAME pruned scan") {
    val cat = mkCatLabeled(4)
    val f = Some(FilterExpr.Single("label", FilterExpr.Lt, 2))
    val q = Array(1f, 0f, 99f, 0f)
    // full probe = no pruning loss → must equal the exact filtered search
    val got = cat.searchIvf("ivfl", q, topK = 12, nprobe = 4, filter = f)
      .collect().map(r => (r.getString(0), r.getDouble(2))).toSeq
    val want = cat.search("ivfl", q, topK = 12, filter = f)
      .select("id", "dist").collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(got === want)
    // pruned probe: the metadata comparison reaches the parquet scan as a
    // pushed filter AND nprobe=1 still prunes to one cell directory — the
    // pre-filter costs no pruning (the whole point of putting it on the
    // index rung instead of falling back to the flat resident scan)
    val pruned = cat.searchIvf("ivfl", q, topK = 12, nprobe = 1, filter = f)
    val scans = pruned.queryExecution.sparkPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s }
    assert(scans.nonEmpty)
    assert(scans.exists(_.metadata("PushedFilters").contains("LessThan(label,2)")),
      scans.map(_.metadata("PushedFilters")).mkString("; "))
    val cells = scans
      .flatMap(_.selectedPartitions.toPartitionArray.map(_.urlEncodedPath))
      .flatMap(p => "__cell=(\\d+)".r.findFirstMatchIn(p).map(_.group(1))).distinct
    assert(cells.length === 1, s"expected one probed cell dir, got $cells")
    // survivors only
    val labelOf = labeled.collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    val hits = pruned.collect()
    assert(hits.nonEmpty)
    hits.foreach(r => assert(labelOf(r.getString(0)) < 2, r.toString))
  }

  test("searchBatch honors the filter on both the IVF path and the flat fallback") {
    val cat = mkCatLabeled(4)
    val f = Some(FilterExpr.Single("label", FilterExpr.Gte, 1))
    val qs = Seq("qa" -> Array(0f, 0f, 99f, 1f), "qb" -> Array(99f, 1f, 0f, 0f))
    val rows = cat.searchBatch("ivfl", qs, topK = 5, nprobe = 2, filter = f).collect()
    qs.foreach { case (qid, v) =>
      val got = rows.filter(_.getString(0) == qid).sortBy(_.getInt(3)).map(_.getString(1)).toSeq
      val want = cat.searchIvf("ivfl", v, topK = 5, nprobe = 2, filter = f)
        .select("id").collect().map(_.getString(0)).toSeq
      assert(got === want, s"$qid: batch $got vs single $want")
    }
    // flat fallback (no IVF layout): the filter restricts the resident
    // corpus scan — per query, exactly the exact filtered search
    val flat = new GraftCatalog(spark, Files.createTempDirectory("graft-flatf").toString)
    flat.createCollection(CollectionMeta("fl", dim = 4, distance = "euclidean",
      fields = Seq(
        IndexField("id", "string", primaryKey = true),
        IndexField("label", "integer"))))
    flat.loadCollection("fl")
    flat.insert("fl", labeled)
    val frows = flat.searchBatch("fl", qs, topK = 5, nprobe = 1, filter = f).collect()
    qs.foreach { case (qid, v) =>
      val got = frows.filter(_.getString(0) == qid).sortBy(_.getInt(3)).map(_.getString(1)).toSeq
      val want = flat.search("fl", v, topK = 5, filter = f)
        .select("id").collect().map(_.getString(0)).toSeq
      assert(got === want, s"flat $qid: batch $got vs exact $want")
    }
  }

  test("15 random filter trees: searchIvf at full probe equals the exact filtered search") {
    val cat = mkCatLabeled(4)
    val r = new scala.util.Random(7)
    val ops = Seq(FilterExpr.Eq, FilterExpr.Neq, FilterExpr.Gt,
      FilterExpr.Gte, FilterExpr.Lt, FilterExpr.Lte)
    def tree(depth: Int): FilterExpr =
      if (depth == 0 || r.nextInt(3) == 0)
        FilterExpr.Single("label", ops(r.nextInt(ops.length)), r.nextInt(4).toLong)
      else {
        val kids = Seq.fill(1 + r.nextInt(2))(tree(depth - 1))
        if (r.nextBoolean()) FilterExpr.And(kids) else FilterExpr.Or(kids)
      }
    (0 until 15).foreach { i =>
      val f = Some(tree(2))
      val q = Array.fill(4)(r.nextFloat() * 100)
      // nprobe = |cells| removes the pruning variable: any disagreement is
      // a FILTER-semantics divergence between the indexed and flat paths
      val got = cat.searchIvf("ivfl", q, topK = 8, nprobe = 4, filter = f)
        .collect().map(r0 => (r0.getString(0), r0.getDouble(2))).toSeq
      val want = cat.search("ivfl", q, topK = 8, filter = f)
        .select("id", "dist").collect().map(r0 => (r0.getString(0), r0.getDouble(1))).toSeq
      assert(got === want, s"tree #$i: ${f.get}")
    }
  }

  test("auditRecall with a filter: both arms see the filtered corpus; " +
    "all-cells probe still certifies 1.0") {
    val cat = mkCatLabeled(4)
    val f = Some(FilterExpr.Single("label", FilterExpr.Lt, 2))
    val all = cat.auditRecall("ivfl", sampleMod = 7, nprobe = 4, k = 5, filter = f).collect()
    assert(all.nonEmpty, "the id-hash sample selected no filtered queries")
    assert(all.forall(_.getAs[Double]("recall") === 1.0),
      s"exact-vs-exact filtered recall must be 1.0: ${all.mkString(",")}")
    // every sampled query id is itself a filter survivor (the audit asks
    // about the queries that serving path answers)
    val labelOf = labeled.collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    all.foreach(r => assert(labelOf(r.getAs[String]("qid")) < 2, r.toString))
    // pruned filtered probe: recall ∈ [0, 1] over the same sample
    val one = cat.auditRecall("ivfl", sampleMod = 7, nprobe = 1, k = 5, filter = f).collect()
    assert(one.length === all.length)
    assert(one.forall { r =>
      val rec = r.getAs[Double]("recall"); rec >= 0.0 && rec <= 1.0 })
  }

  test("filtered searchIvf over a delta chain sees post-fold labels") {
    val cat = mkCatLabeled(4)
    val q = Array(1f, 0f, 99f, 0f)
    // flip the top in-cluster hit's label via a delta segment (same vector,
    // so it stays in its cell — only the metadata changes)
    val first = cat.searchIvf("ivfl", q, topK = 1, nprobe = 1).head().getString(0)
    val vec = labeled.where(col("id") === first).select("vector").head().getSeq[Float](0)
    cat.insert("ivfl", Seq((first, 99, vec)).toDF("id", "label", "vector"))
    cat.flushDelta("ivfl")
    // the new label is visible to the filtered probe (post-fold, not base)
    val eq99 = cat.searchIvf("ivfl", q, topK = 5, nprobe = 1,
      filter = Some(FilterExpr.Single("label", FilterExpr.Eq, 99)))
      .collect().map(_.getString(0)).toSeq
    assert(eq99 === Seq(first))
    // and the complementary filter no longer returns the row
    val rest = cat.searchIvf("ivfl", q, topK = 50, nprobe = 1,
      filter = Some(FilterExpr.Single("label", FilterExpr.Neq, 99)))
      .collect().map(_.getString(0)).toSeq
    assert(rest.nonEmpty && !rest.contains(first))
  }
}
