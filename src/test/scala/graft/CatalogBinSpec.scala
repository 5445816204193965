package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.collection.{CollectionMeta, GraftCatalog, IndexField}

/** Collection-level binary (sign-bit) layout: flush writes the packed code
  * column + threshold sidecar, the resident view stays clean, the two-pass
  * searchBinary agrees with the exact search, the sidecar follows the
  * version lifecycle, and layout mismatches fail loudly. */
class CatalogBinSpec extends SparkSpec {

  import spark.implicits._

  private def newCatalog() =
    new GraftCatalog(spark, Files.createTempDirectory("graft-bincat").toString)

  private def fixtureRows(n: Int, dim: Int) =
    (0 until n).map { i =>
      val v = Array.tabulate(dim)(j => ((i * 31 + j * 7) % 13 - 6).toFloat / 6f)
      (f"$i%03d", i, v.toSeq)
    }.toDF("id", "label", "vector")

  private def binMeta(name: String, dim: Int = 16, quant: String = "none",
                      ivf: Option[Int] = None) =
    CollectionMeta(name, dim = dim, distance = "euclidean", quantization = quant,
      fields = Seq(
        IndexField("id", "string", primaryKey = true),
        IndexField("label", "integer")),
      ivfCells = ivf,
      binaryIndex = Some(true))

  test("flush writes packed codes + threshold sidecar; resident view stays clean") {
    val cat = newCatalog()
    cat.createCollection(binMeta("bina"))
    cat.loadCollection("bina")
    cat.insert("bina", fixtureRows(60, 16))
    cat.flush("bina")
    val snap = cat.snapshot("bina")
    assert(snap.schema.fieldNames.contains(GraftCatalog.BinCol))
    assert(snap.schema(GraftCatalog.BinCol).dataType ===
      org.apache.spark.sql.types.BinaryType)
    // 16 dims → 2 packed bytes
    val codeLens = snap.select(length(col(GraftCatalog.BinCol)))
      .distinct().collect().map(_.getInt(0))
    assert(codeLens.toSeq === Seq(2))
    // resident view / searches never see the layout column
    cat.releaseCollection("bina"); cat.loadCollection("bina")
    assert(!cat.resident("bina").columns.contains(GraftCatalog.BinCol))
    val q = fixtureRows(1, 16).select("vector").head().getSeq[Float](0).toArray
    assert(!cat.search("bina", q, topK = 3).columns.contains(GraftCatalog.BinCol))
  }

  test("two-pass searchBinary equals the exact search top-k at full over-fetch") {
    val cat = newCatalog()
    cat.createCollection(binMeta("binb"))
    cat.loadCollection("binb")
    cat.insert("binb", fixtureRows(60, 16))
    cat.flush("binb")
    val q = fixtureRows(60, 16).where(col("id") === "017")
      .select("vector").head().getSeq[Float](0).toArray
    // overFetch large enough to drain the whole collection → the rerank IS
    // the exact scan, so agreement must be total (the recall trade only
    // exists when candidates are dropped)
    val got = cat.searchBinary("binb", q, topK = 5, overFetch = 12)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    val want = cat.search("binb", q, topK = 5)
      .select("id", "dist").collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(got === want)
    // at the default over-fetch an exact duplicate of the query must
    // survive the Hamming prefilter (its code IS the query code) — the
    // periodic fixture makes 004 and 017 identical vectors, so the winner
    // is the smaller id at distance 0
    val top = cat.searchBinary("binb", q, topK = 1).collect()
    assert(top.head.getDouble(1) === 0.0)
    assert(top.head.getString(0) === want.head._1)
  }

  test("filtered searchBinary: the predicate pre-filters the Hamming pass; " +
    "full over-fetch equals the exact filtered top-k") {
    val cat = newCatalog()
    cat.createCollection(binMeta("binfl"))
    cat.loadCollection("binfl")
    cat.insert("binfl", fixtureRows(60, 16))
    cat.flush("binfl")
    val q = fixtureRows(60, 16).where(col("id") === "017")
      .select("vector").head().getSeq[Float](0).toArray
    // labels are the row index: label >= 10 drops 004 — the exact duplicate
    // of the 017 query — so the filtered winner must be 017 itself at
    // distance 0 (a filtered-OUT duplicate cannot shadow a survivor)
    val f = Some(FilterExpr.Single("label", FilterExpr.Gte, 10))
    val top = cat.searchBinary("binfl", q, topK = 1, filter = f).collect()
    assert(top.head.getString(0) === "017" && top.head.getDouble(1) === 0.0)
    // over-fetch big enough to drain the filtered set → the rerank IS the
    // exact filtered scan, so agreement with search(filter) must be total
    val got = cat.searchBinary("binfl", q, topK = 5, overFetch = 12, filter = f)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    val want = cat.search("binfl", q, topK = 5, filter = f)
      .select("id", "dist").collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(got === want)
  }

  test("binary layout composes with quantized storage and the IVF layout") {
    val cat = newCatalog()
    cat.createCollection(binMeta("binq", quant = "f16", ivf = Some(4)))
    cat.loadCollection("binq")
    cat.insert("binq", fixtureRows(60, 16))
    cat.flush("binq")
    val snap = cat.snapshot("binq")
    assert(snap.schema.fieldNames.contains(GraftCatalog.BinCol))
    val q = fixtureRows(60, 16).where(col("id") === "007")
      .select("vector").head().getSeq[Float](0).toArray
    val got = cat.searchBinary("binq", q, topK = 5, overFetch = 12)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    val want = cat.search("binq", q, topK = 5)
      .select("id", "dist").collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(got === want, "rerank on f16-decoded vectors must match the fused exact search")
  }

  test("auditRecallBin: draining over-fetch certifies recall 1.0; tight over-fetch " +
    "stays in [0,1]; a filter samples survivors only") {
    val cat = newCatalog()
    cat.createCollection(binMeta("binaud"))
    cat.loadCollection("binaud")
    cat.insert("binaud", fixtureRows(60, 16))
    cat.flush("binaud")
    // k·overFetch = 60 ≥ corpus: the rerank IS the exact scan → 1.0 everywhere
    val all = cat.auditRecallBin("binaud", sampleMod = 7, k = 5, overFetch = 12).collect()
    assert(all.nonEmpty, "the id-hash sample selected no queries")
    assert(all.forall(_.getAs[Double]("recall") === 1.0), all.mkString(","))
    // the tight dial audits the real sign-sketch trade on the SAME sample
    val tight = cat.auditRecallBin("binaud", sampleMod = 7, k = 5, overFetch = 1).collect()
    assert(tight.length === all.length)
    assert(tight.forall { r =>
      val x = r.getAs[Double]("recall"); x >= 0.0 && x <= 1.0 })
    // filtered audit: queries sampled from survivors, both arms filtered
    val f = Some(FilterExpr.Single("label", FilterExpr.Gte, 10))
    val filt = cat.auditRecallBin("binaud", sampleMod = 3, k = 5, overFetch = 12,
      filter = f).collect()
    assert(filt.nonEmpty && filt.forall(_.getAs[Double]("recall") === 1.0))
    filt.foreach(r => assert(r.getAs[String]("qid").toInt >= 10, r.toString))
    // contract: no binary layout → loud
    cat.createCollection(binMeta("nobin").copy(binaryIndex = None))
    intercept[IllegalArgumentException](cat.auditRecallBin("nobin", 7, 5, 3))
  }

  test("sidecar follows the version lifecycle; contract errors are loud") {
    val root = Files.createTempDirectory("graft-bincat").toString
    val cat = new GraftCatalog(spark, root)
    cat.createCollection(binMeta("binv").copy(versioning = true))
    cat.loadCollection("binv")
    cat.insert("binv", fixtureRows(30, 16))
    cat.flush("binv") // v1
    cat.insert("binv", fixtureRows(40, 16))
    cat.flush("binv") // v2
    val fsPath = new org.apache.hadoop.fs.Path(s"$root/binv/v1_bin")
    val fs = fsPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(fsPath), "v1 threshold sidecar must exist before vacuum")
    assert(cat.vacuum("binv", keepLast = 1) === Seq(1))
    assert(!fs.exists(fsPath), "vacuum must remove the bin sidecar with its version")

    // wrong dim / topK=0 / no layout are contract errors
    val q = Array.fill(16)(0.1f)
    intercept[IllegalArgumentException] { cat.searchBinary("binv", q.take(3), 5) }
    intercept[IllegalArgumentException] { cat.searchBinary("binv", q, 0) }
    cat.createCollection(binMeta("plain").copy(binaryIndex = None))
    cat.loadCollection("plain")
    cat.insert("plain", fixtureRows(10, 16))
    cat.flush("plain")
    val ex = intercept[IllegalArgumentException] { cat.searchBinary("plain", q, 5) }
    assert(ex.getMessage.contains("binary index"))
  }

  test("empty flush: searchBinary returns no rows instead of failing") {
    val cat = newCatalog()
    cat.createCollection(binMeta("bine"))
    cat.loadCollection("bine")
    cat.flush("bine")
    assert(cat.searchBinary("bine", Array.fill(16)(0.5f), topK = 3).count() === 0L)
  }

  test("PREPARED pass-1 equals searchBinary bit-for-bit: random queries × " +
      "filters × IVF composition × delta chains (r12 — the route's shape)") {
    for (ivf <- Seq(None, Some(4))) {
      val name = s"binp${ivf.fold("flat")(_.toString)}"
      val cat = newCatalog()
      cat.createCollection(binMeta(name, ivf = ivf))
      cat.loadCollection(name)
      cat.insert(name, fixtureRows(80, 16))
      cat.flush(name)
      val rnd = new scala.util.Random(13)
      def cmp(q: Array[Float], f: Option[FilterExpr], tag: String): Unit = {
        val want = cat.searchBinary(name, q, topK = 8, overFetch = 3, filter = f)
          .collect().map(_.toSeq).toSeq
        val (schema, rows) = cat.searchBinaryPrepared(name, q, topK = 8,
          overFetch = 3, filter = f)
        assert(schema.fieldNames.toSeq === Seq("id", "dist"), tag)
        assert(rows.map(_.toSeq) === want, tag)
      }
      val filters = Seq(None,
        Some(FilterExpr.Single("label", FilterExpr.Lt, 40L): FilterExpr))
      for (i <- 1 to 8; f <- filters)
        cmp(Array.fill(16)(rnd.nextFloat() * 2 - 1), f, s"ivf=$ivf query $i filter=$f")
      // a delta fold publishes a new version → new anchor → recompile (and
      // pass-1 codes for the put rows were encoded against the base's
      // persisted thresholds)
      cat.insert(name, Seq(("042", 42, Seq.fill(16)(0.9f))).toDF("id", "label", "vector"))
      cat.flushDelta(name)
      cmp(Array.fill(16)(0.9f), None, s"ivf=$ivf post-fold")
      val (_, top) = cat.searchBinaryPrepared(name, Array.fill(16)(0.9f), topK = 1)
      assert(top.head.getString(0) === "042", s"ivf=$ivf: the moved row must rank first")
    }
  }
}
