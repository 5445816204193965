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

  test("IVF-PQ rerank scan reads ONLY the candidates' cell directories (r10)") {
    // 4 well-separated 16-d clusters (seeds A0..A3 are the pk-smallest
    // rows → one centroid per cluster); a query at cluster 1's center
    // draws all its ADC candidates from that cluster, so the rerank scan
    // must open exactly ONE of the 4 cell directories — an id-only isin
    // opened all 4 dirs' footers (the pre-r10 serve_pq cost)
    val centers = Seq.tabulate(4)(c => Array.tabulate(16)(j =>
      if (j == c) 100f else 0f))
    val rows = centers.zipWithIndex.flatMap { case (cv, ci) =>
      (s"A$ci", ci, cv.toSeq) +: (1 until 30).map { j =>
        (s"B${ci}_$j", ci, cv.map(x => x + (j % 5) - 2f).toSeq)
      }
    }.toDF("id", "label", "vector")
    val cat = newCatalog()
    cat.createCollection(pqMeta("pqprune", ivf = Some(4)))
    cat.loadCollection("pqprune")
    cat.insert("pqprune", rows)
    cat.flush("pqprune")
    val q = centers(1)
    val res = cat.searchPq("pqprune", q, topK = 3, rerank = true, overFetch = 2)
    val scans = res.queryExecution.sparkPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s }
    assert(scans.nonEmpty)
    val cellsRead = scans.flatMap(_.selectedPartitions.toPartitionArray
      .map(_.urlEncodedPath).filter(_.contains("__cell="))
      .map(_.split("__cell=")(1).split("/")(0))).distinct
    assert(cellsRead.length === 1,
      s"rerank must read only the candidates' cell dir, read: $cellsRead")
    // and the reranked result equals the exact search
    val exact = cat.search("pqprune", q, topK = 3)
      .select("id").collect().map(_.getString(0)).toSeq
    assert(res.select("id").collect().map(_.getString(0)).toSeq === exact)
  }

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

  test("filtered searchPq: the predicate pre-filters the PASS-1 code scan; " +
    "draining over-fetch equals the exact filtered top-k") {
    val cat = newCatalog()
    cat.createCollection(pqMeta("pqfl"))
    cat.loadCollection("pqfl")
    cat.insert("pqfl", fixtureRows(60, 16))
    cat.flush("pqfl")
    val q = fixtureRows(7, 16).where(col("label") === 6)
      .select("vector").head().getSeq[Float](0).toArray
    val f = Some(FilterExpr.Single("label", FilterExpr.Gte, 10))
    // overFetch 12 ⇒ 60 candidates ≥ the 50 survivors: the rerank IS the
    // exact filtered scan, so agreement with search(filter) must be total
    val got = cat.searchPq("pqfl", q, topK = 5, rerank = true, overFetch = 12, filter = f)
      .select("id", "dist").collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    val want = cat.search("pqfl", q, topK = 5, filter = f)
      .select("id", "dist").collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(got === want)
    // raw ADC (rerank=false): every returned id is a filter survivor —
    // labels are the row index, so survivor ⇔ id ≥ "010" in the pk order
    val raw = cat.searchPq("pqfl", q, topK = 10, rerank = false, filter = f)
      .collect().map(_.getString(0)).toSeq
    assert(raw.nonEmpty && raw.forall(_ >= "010"), raw.mkString(","))
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

  test("sampled-training flush (the 100 TB path): searches stay green, rerank recovers exact") {
    // ivfTrainSampleMod/pqTrainSampleMod train the flush's Lloyd iterations
    // on the deterministic 1/mod id-hash subsample — the production route
    // to the sampled path the bench proves (ivf_train_sampled_1m 1.7 s vs
    // 7.3 s full). Cell ASSIGNMENT and encode remain full-corpus exact, so
    // every search contract holds unchanged.
    val cat = newCatalog()
    cat.createCollection(pqMeta("pqsamp", ivf = Some(4))
      .copy(ivfTrainSampleMod = Some(2L), pqTrainSampleMod = Some(2L)))
    cat.loadCollection("pqsamp")
    cat.insert("pqsamp", fixtureRows(60, 16))
    cat.flush("pqsamp")
    val snap = cat.snapshot("pqsamp")
    assert(snap.columns.contains(GraftCatalog.CellCol))
    assert(snap.columns.contains(GraftCatalog.PqCodeCol))
    val q = fixtureRows(8, 16).where(col("label") === 7)
      .select("vector").head().getSeq[Float](0).toArray
    assert(cat.searchIvf("pqsamp", q, topK = 3, nprobe = 4).count() === 3)
    assert(cat.searchPq("pqsamp", q, topK = 3, nprobe = Some(2)).count() === 3)
    val reranked = cat.searchPq("pqsamp", q, topK = 5, rerank = true, overFetch = 8)
      .select("id", "dist").collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    val exact = cat.search("pqsamp", q, topK = 5)
      .select("id", "dist").collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(reranked === exact)
    // an over-aggressive mod on a tiny collection degrades to full-corpus
    // training (never an empty sample / untrained codebook)
    cat.createCollection(pqMeta("pqsamp2", ivf = Some(2))
      .copy(ivfTrainSampleMod = Some(1000000L), pqTrainSampleMod = Some(1000000L)))
    cat.loadCollection("pqsamp2")
    cat.insert("pqsamp2", fixtureRows(20, 16))
    cat.flush("pqsamp2")
    assert(cat.searchPq("pqsamp2", q, topK = 3).count() === 3)
    // contract: sampling knobs require their layout
    intercept[IllegalArgumentException](
      CollectionMeta("bad", dim = 16, ivfTrainSampleMod = Some(2L),
        fields = Seq(IndexField("id", "string", primaryKey = true))))
    intercept[IllegalArgumentException](pqMeta("bad2").copy(pqTrainSampleMod = Some(1L)))
  }

  test("auditRecallPq: draining over-fetch certifies recall 1.0 on raw AND " +
    "residual (IVF-PQ) layouts; tight over-fetch stays in [0,1]") {
    val cat = newCatalog()
    // raw-code layout
    cat.createCollection(pqMeta("pqaud"))
    cat.loadCollection("pqaud")
    cat.insert("pqaud", fixtureRows(60, 16))
    cat.flush("pqaud")
    val all = cat.auditRecallPq("pqaud", sampleMod = 7, k = 5, overFetch = 12).collect()
    assert(all.nonEmpty, "the id-hash sample selected no queries")
    assert(all.forall(_.getAs[Double]("recall") === 1.0), all.mkString(","))
    val tight = cat.auditRecallPq("pqaud", sampleMod = 7, k = 5, overFetch = 1).collect()
    assert(tight.length === all.length)
    assert(tight.forall { r =>
      val x = r.getAs[Double]("recall"); x >= 0.0 && x <= 1.0 })
    // residual layout (IVF-PQ): the reconstruction adds the cell centroid back
    cat.createCollection(pqMeta("pqaudr", ivf = Some(4)))
    cat.loadCollection("pqaudr")
    cat.insert("pqaudr", fixtureRows(60, 16))
    cat.flush("pqaudr")
    val res = cat.auditRecallPq("pqaudr", sampleMod = 7, k = 5, overFetch = 12).collect()
    assert(res.nonEmpty && res.forall(_.getAs[Double]("recall") === 1.0), res.mkString(","))
    // filtered audit over the residual layout
    val f = Some(FilterExpr.Single("label", FilterExpr.Lt, 30))
    val filt = cat.auditRecallPq("pqaudr", sampleMod = 3, k = 5, overFetch = 12,
      filter = f).collect()
    assert(filt.nonEmpty && filt.forall(_.getAs[Double]("recall") === 1.0))
    filt.foreach(r => assert(r.getAs[String]("qid").toInt < 30, r.toString))
    // r11: nprobe audits the PROBED IVF-PQ serving shape. All cells probed
    // = the unprobed audit (the degeneration contract); a 1-cell probe
    // stays well-formed and can only lose recall vs the all-cells audit.
    val allCells = cat.auditRecallPq("pqaudr", sampleMod = 7, k = 5, overFetch = 12,
      nprobe = Some(4)).collect()
    assert(allCells.map(r => (r.getString(0), r.getAs[Double]("recall"))).toSeq ===
      res.map(r => (r.getString(0), r.getAs[Double]("recall"))).toSeq)
    val probed = cat.auditRecallPq("pqaudr", sampleMod = 7, k = 5, overFetch = 12,
      nprobe = Some(1)).collect()
    assert(probed.length === res.length)
    probed.zip(res).foreach { case (p, e) =>
      val pr = p.getAs[Double]("recall")
      assert(pr >= 0.0 && pr <= e.getAs[Double]("recall"), s"$p vs $e") }
    // a probed audit needs the IVF layout — the raw-code collection refuses
    val ex = intercept[IllegalArgumentException] {
      cat.auditRecallPq("pqaud", sampleMod = 7, k = 5, nprobe = Some(2))
    }
    assert(ex.getMessage.contains("IVF"))
  }

  test("pq sidecar records the residual layout flag; legacy flagless sidecars read as raw") {
    val root = Files.createTempDirectory("graft-pqflag").toString
    val cat = new GraftCatalog(spark, root)
    // IVF+PQ flush ⇒ residual codes, flag true
    cat.createCollection(pqMeta("rflag", ivf = Some(4)))
    cat.loadCollection("rflag")
    cat.insert("rflag", fixtureRows(60, 16))
    cat.flush("rflag")
    val sidecar = spark.read.parquet(s"$root/rflag/v1_pq")
    assert(sidecar.columns.contains("residual"))
    assert(sidecar.select("residual").distinct().collect().map(_.getBoolean(0)).toSeq === Seq(true))
    // cells-less PQ flush ⇒ raw codes, flag false
    cat.createCollection(pqMeta("rflat"))
    cat.loadCollection("rflat")
    cat.insert("rflat", fixtureRows(30, 16))
    cat.flush("rflat")
    val flatSidecar = spark.read.parquet(s"$root/rflat/v1_pq")
    assert(flatSidecar.select("residual").distinct().collect()
      .map(_.getBoolean(0)).toSeq === Seq(false))
    // Legacy (flagless) sidecars are ambiguous when the collection has an
    // IVF layout: residual encoding landed BEFORE the flag, so flagless
    // IVF+PQ snapshots exist holding raw codes AND holding residual codes,
    // and guessing either way silently mis-scores the other cohort — the
    // reader must refuse and demand a re-flush.
    val q = fixtureRows(1, 16).select("vector").head().getSeq[Float](0).toArray
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def stripFlag(name: String): org.apache.spark.sql.DataFrame = {
      val sc = spark.read.parquet(s"$root/$name/v1_pq")
      val rows = java.util.Arrays.asList(sc.drop("residual").collect(): _*)
      val schema = org.apache.spark.sql.types.StructType(
        sc.schema.filterNot(_.name == "residual"))
      val legacy = spark.createDataFrame(rows, schema)
      val tmp = s"$root/$name/v1_pq_legacy"
      legacy.coalesce(1).write.parquet(tmp)
      fs.delete(new org.apache.hadoop.fs.Path(s"$root/$name/v1_pq"), true)
      fs.rename(new org.apache.hadoop.fs.Path(tmp),
        new org.apache.hadoop.fs.Path(s"$root/$name/v1_pq"))
      legacy
    }
    stripFlag("rflag")
    val e1 = intercept[IllegalArgumentException](
      cat.searchPq("rflag", q, topK = 5, rerank = false))
    assert(e1.getMessage.contains("re-flush"))
    val e2 = intercept[IllegalArgumentException](cat.localPqIndex("rflag"))
    assert(e2.getMessage.contains("re-flush"))
    // without an IVF layout the flagless cohort is unambiguously RAW —
    // codes score against the plain single query LUT
    val legacyFlat = stripFlag("rflat")
    val after = cat.searchPq("rflat", q, topK = 5, rerank = false)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    // expected = the raw single-LUT ADC over the stored codes, computed
    // independently of the catalog's reader
    val byJ = legacyFlat.collect().groupBy(_.getAs[Int]("j"))
    val cb = graft.ann.PqCodebook((0 until 4).map { j =>
      byJ(j).sortBy(_.getAs[Int]("c")).map(_.getAs[Seq[Float]]("cvec").toArray)
    }.toArray)
    val want = spark.read.parquet(s"$root/rflat/v1")
      .select(col("id"),
        round(graft.ann.Pq.adcDist(col(GraftCatalog.PqCodeCol), cb, q), 6).as("dist"))
      .orderBy(col("dist").asc, col("id").asc).limit(5)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(after === want)
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

  test("PREPARED pass-1 equals searchPq bit-for-bit: rerank on/off × probed/full × " +
      "filters × delta chains on the residual layout; raw layouts fall back equal (r12)") {
    def cmp(cat: GraftCatalog, name: String, q: Array[Float], rerank: Boolean,
            nprobe: Option[Int], f: Option[FilterExpr], tag: String): Unit = {
      val want = cat.searchPq(name, q, topK = 8, rerank = rerank, overFetch = 3,
        nprobe = nprobe, filter = f).collect().map(_.toSeq).toSeq
      val (schema, rows) = cat.searchPqPrepared(name, q, topK = 8, rerank = rerank,
        overFetch = 3, nprobe = nprobe, filter = f)
      assert(schema.fieldNames.toSeq === Seq("id", "dist"), tag)
      assert(rows.map(_.toSeq) === want, tag)
    }
    // residual IVF-PQ layout — the prepared path proper
    val cat = newCatalog()
    cat.createCollection(pqMeta("pqprep", ivf = Some(4)))
    cat.loadCollection("pqprep")
    cat.insert("pqprep", fixtureRows(80, 16))
    cat.flush("pqprep")
    val rnd = new scala.util.Random(17)
    def rq() = Array.fill(16)(rnd.nextFloat() * 2 - 1)
    val f = Some(FilterExpr.Single("label", FilterExpr.Lt, 40L): FilterExpr)
    for (i <- 1 to 5; rerank <- Seq(true, false); np <- Seq(None, Some(2)); ff <- Seq(None, f))
      cmp(cat, "pqprep", rq(), rerank, np, ff, s"q$i rerank=$rerank np=$np f=$ff")
    // a delta fold publishes a new version → new anchor → recompile; the
    // put's residual code came from the base's persisted sidecars
    cat.insert("pqprep", fixtureRows(81, 16).where(col("id") === "080"))
    cat.flushDelta("pqprep")
    cmp(cat, "pqprep", rq(), rerank = true, nprobe = None, f = None, "post-fold")
    // raw (cells-less) layout: the single query LUT is a plan constant by
    // design — the prepared call must FALL BACK and still agree
    val cat2 = newCatalog()
    cat2.createCollection(pqMeta("pqraw"))
    cat2.loadCollection("pqraw")
    cat2.insert("pqraw", fixtureRows(60, 16))
    cat2.flush("pqraw")
    cmp(cat2, "pqraw", rq(), rerank = true, nprobe = None, f = None, "raw fallback")
    cmp(cat2, "pqraw", rq(), rerank = false, nprobe = None, f = None, "raw adc fallback")
  }
}
