package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.collection._
import graft.operators.MultiVectorSearch.FieldQuery

/** Multi-vector (CFLAT) collections over the IVF layout: flush partitions
  * the snapshot by the ROUTING field's cell, probed weighted searches prune
  * partition directories, nprobe = |cells| degenerates to the exact
  * searchMulti ranking, delta segments compose, and auditRecallMulti
  * certifies the routing-probe/multi-score recall trade. */
class MultiIvfSpec extends SparkSpec {
  import spark.implicits._

  /** 4 well-separated clusters of 40 points each in the ROUTING field v0
    * (seed centroids = the 4 pk-smallest rows "A0".."A3", one per cluster);
    * v1 is the REVERSED cluster pattern (cluster ci of v0 pairs with
    * cluster 3-ci of v1) — the adversarial weighting case for the recall
    * audit. */
  private def clustered = {
    val centers = Seq(
      Array(0f, 0f, 100f, 0f), Array(100f, 0f, 0f, 0f),
      Array(0f, 100f, 0f, 0f), Array(0f, 0f, 0f, 100f))
    val rows = centers.zipWithIndex.flatMap { case (c, ci) =>
      val c1 = centers(3 - ci)
      (s"A$ci", c.toSeq, c1.toSeq) +: (1 until 40).map { j =>
        (s"B${ci}_$j",
          c.map(x => x + (j % 7) - 3f).toSeq,
          c1.map(x => x + (j % 5) - 2f).toSeq)
      }
    }
    rows.toDF("id", "v0", "v1")
  }

  private var lastRoot: String = _

  private def mkCat(cells: Int, quant: String = "none",
                    routing: Option[String] = None) = {
    lastRoot = Files.createTempDirectory("graft-mvivf").toString
    val cat = new GraftCatalog(spark, lastRoot)
    cat.createCollection(CollectionMeta("mvi", dim = 4, distance = "euclidean",
      quantization = quant,
      fields = Seq(
        IndexField("id", "string", primaryKey = true),
        IndexField("v0", "vector"),
        IndexField("v1", "vector")),
      ivfCells = Some(cells), routingField = routing))
    cat.loadCollection("mvi")
    cat.insert("mvi", clustered)
    cat.flush("mvi")
    cat
  }

  private def fq(q0: Array[Float], q1: Array[Float]) = Seq(
    FieldQuery("v0", q0, ratio = 60), FieldQuery("v1", q1, ratio = 40))

  test("flush partitions the multi-vector snapshot by the routing field's cell") {
    val cat = mkCat(4)
    val root = lastRoot
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val cellDirs = fs.listStatus(new org.apache.hadoop.fs.Path(s"$root/mvi/v1"))
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("__cell="))
    assert(cellDirs.length === 4)
    // the resident view has no layout column
    assert(!cat.loadCollection("mvi").columns.contains(GraftCatalog.CellCol))
  }

  test("nprobe = |cells| degenerates to the exact searchMulti ranking") {
    val cat = mkCat(4)
    val q0 = Array(100f, 1f, 0f, 0f)
    val q1 = Array(0f, 99f, 1f, 0f)
    val exact = cat.searchMulti("mvi", fq(q0, q1), topK = 10).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val probed = cat.searchMultiIvf("mvi", fq(q0, q1), topK = 10, nprobe = 4).collect()
      .map(r => (r.getAs[String]("id"), r.getAs[Double]("score")))
    assert(probed.toSeq === exact.toSeq)
  }

  test("probed search prunes partition directories (fewer scanned partitions)") {
    val cat = mkCat(4)
    val q0 = Array(100f, 1f, 0f, 0f)
    val q1 = Array(0f, 99f, 1f, 0f)
    def scannedParts(nprobe: Int): Int =
      cat.searchMultiIvf("mvi", fq(q0, q1), topK = 5, nprobe = nprobe)
        .queryExecution.executedPlan
        .collect { case s: org.apache.spark.sql.execution.FileSourceScanExec => s }
        .map(_.selectedPartitions.toPartitionArray.length).sum
    val one = scannedParts(1)
    val all = scannedParts(4)
    assert(one > 0 && all > 0)
    assert(one < all, s"$one vs $all — the cell predicate must prune directories")
    // and the nprobe=1 result only holds rows of the query's own cluster
    val rows = cat.searchMultiIvf("mvi", fq(q0, q1), topK = 5, nprobe = 1).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[String]("id").matches("A1|B1_.*")),
      rows.map(_.getAs[String]("id")).mkString(","))
  }

  test("delta segments compose: moved routing vectors land in their new cell") {
    val cat = mkCat(4)
    // move B0_1 from cluster 0 (v0 ≈ [0,0,100,0]) to cluster 1 ([100,0,0,0]);
    // its v1 moves with it
    cat.insert("mvi", Seq(("B0_1", Seq(99f, 1f, 0f, 0f), Seq(1f, 99f, 0f, 1f)))
      .toDF("id", "v0", "v1"))
    cat.flushDelta("mvi")
    val q0 = Array(100f, 0f, 0f, 0f)
    val q1 = Array(0f, 100f, 0f, 0f)
    // exact arm over the folded chain == resident searchMulti
    val exact = cat.searchMulti("mvi", fq(q0, q1), topK = 10).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val probedAll = cat.searchMultiIvf("mvi", fq(q0, q1), topK = 10, nprobe = 4).collect()
      .map(r => (r.getAs[String]("id"), r.getAs[Double]("score")))
    assert(probedAll.toSeq === exact.toSeq)
    // probing ONLY the destination cluster's cell finds the moved row
    val oneCell = cat.searchMultiIvf("mvi", fq(q0, q1), topK = 40, nprobe = 1).collect()
    assert(oneCell.exists(_.getAs[String]("id") == "B0_1"),
      "the delta put must have been assigned to the routing vector's NEW cell")
    // and the moved row's stale base copy is struck (exactly one output row)
    assert(oneCell.count(_.getAs[String]("id") == "B0_1") === 1)
  }

  test("f16 storage: probed search equals the exact ranking at nprobe = cells") {
    val cat = mkCat(4, quant = "f16")
    val q0 = Array(100f, 1f, 0f, 0f)
    val q1 = Array(0f, 99f, 1f, 0f)
    val exact = cat.searchMulti("mvi", fq(q0, q1), topK = 10).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val probed = cat.searchMultiIvf("mvi", fq(q0, q1), topK = 10, nprobe = 4).collect()
      .map(r => (r.getAs[String]("id"), r.getAs[Double]("score")))
    assert(probed.toSeq === exact.toSeq)
  }

  test("explicit routingField routes on the NAMED field, not the first one") {
    val cat = mkCat(4, routing = Some("v1"))
    // v1's clusters are the reversed pattern; probing with a v1 query that
    // sits in v1-cluster 3 (= v0-cluster 0's rows) must return those rows
    val q0 = Array(0f, 0f, 100f, 0f) // v0 cluster 0
    val q1 = Array(0f, 0f, 0f, 100f) // v1 of cluster 0's rows (centers(3))
    val rows = cat.searchMultiIvf("mvi", fq(q0, q1), topK = 5, nprobe = 1).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[String]("id").matches("A0|B0_.*")),
      rows.map(_.getAs[String]("id")).mkString(","))
  }

  test("auditRecallMulti: all-cells probe certifies 1.0; adversarial weighting bounded") {
    val cat = mkCat(4)
    val all = cat.auditRecallMulti("mvi", sampleMod = 7, nprobe = 4,
      fields = Seq("v0" -> 60.0, "v1" -> 40.0), k = 5).collect()
    assert(all.nonEmpty, "the id-hash sample selected no queries")
    assert(all.forall(_.getAs[Double]("recall") === 1.0),
      s"exact-vs-exact recall must be 1.0: ${all.mkString(",")}")
    // weighting the NON-routing field heavily: still a valid audit — recall
    // bounded, same sampled queries (v1 anti-correlates with v0's cells, so
    // this is exactly the trade the audit exists to expose)
    val adv = cat.auditRecallMulti("mvi", sampleMod = 7, nprobe = 1,
      fields = Seq("v0" -> 10.0, "v1" -> 90.0), k = 5).collect()
    assert(adv.length === all.length)
    assert(adv.forall { r =>
      val rec = r.getAs[Double]("recall"); rec >= 0.0 && rec <= 1.0 })
  }

  test("validation: routingField demands ivfCells + a declared vector field") {
    intercept[IllegalArgumentException] {
      CollectionMeta("x", dim = 4, fields = Seq(
        IndexField("id", "string", primaryKey = true),
        IndexField("v0", "vector")), routingField = Some("v0"))
    }
    intercept[IllegalArgumentException] {
      CollectionMeta("x", dim = 4, fields = Seq(
        IndexField("id", "string", primaryKey = true),
        IndexField("v0", "vector")), ivfCells = Some(4), routingField = Some("nope"))
    }
    // meta with routingField survives the JSON round trip
    val meta = CollectionMeta("x", dim = 4, fields = Seq(
      IndexField("id", "string", primaryKey = true),
      IndexField("v0", "vector")), ivfCells = Some(4), routingField = Some("v0"))
    assert(CollectionMeta.fromJson(meta.toJson) === meta)
    assert(meta.routingVector.map(_.name) === Some("v0"))
  }

  test("a probed search without a routing-field query refuses loudly") {
    val cat = mkCat(4)
    val ex = intercept[IllegalArgumentException] {
      cat.searchMultiIvf("mvi",
        Seq(FieldQuery("v1", Array(0f, 100f, 0f, 0f), ratio = 100)),
        topK = 5, nprobe = 1)
    }
    assert(ex.getMessage.contains("routing field"))
  }

  test("searchBatchMulti: every query's block equals its single-query searchMultiIvf") {
    val cat = mkCat(4)
    val queries = Seq(
      "q0" -> Map("v0" -> Array(100f, 1f, 0f, 0f), "v1" -> Array(0f, 99f, 1f, 0f)),
      "q1" -> Map("v0" -> Array(0f, 1f, 99f, 0f), "v1" -> Array(1f, 0f, 0f, 100f)))
    val weights = Seq("v0" -> 60.0, "v1" -> 40.0)
    val out = cat.searchBatchMulti("mvi", weights, queries, topK = 5, nprobe = 2)
    // plan shape: a partial WindowGroupLimit bounds each query below the
    // exchange; no cartesian product anywhere
    val plan = out.queryExecution.executedPlan
    assert(plan.toString.contains("WindowGroupLimit"), plan.toString.take(2000))
    assert(!plan.toString.contains("Cartesian"), "batch probe must never be all-pairs")
    val rows = out.collect()
    for ((qid, m) <- queries) {
      val single = cat.searchMultiIvf("mvi", fq(m("v0"), m("v1")), topK = 5, nprobe = 2)
        .collect().map(r => (r.getAs[String]("id"), r.getAs[Double]("score")))
      val block = rows.filter(_.getAs[String]("qid") == qid).sortBy(_.getAs[Int]("rn"))
        .map(r => (r.getAs[String]("id"), r.getAs[Double]("score")))
      assert(block.toSeq === single.toSeq, qid)
    }
    // refusals: a query missing the routing vector, bad ratios, dup qids
    assert(intercept[IllegalArgumentException] {
      cat.searchBatchMulti("mvi", weights,
        Seq("q" -> Map("v1" -> Array(1f, 0f, 0f, 0f))), 5, 1)
    }.getMessage.contains("routing field"))
    assert(intercept[IllegalArgumentException] {
      cat.searchBatchMulti("mvi", Seq("v0" -> 50.0), queries, 5, 1)
    }.getMessage.contains("sum to 100"))
    assert(intercept[IllegalArgumentException] {
      cat.searchBatchMulti("mvi", weights, queries ++ queries.take(1), 5, 1)
    }.getMessage.contains("unique"))
  }

  test("PREPARED probed search equals searchMultiIvf: random queries × nprobe, " +
      "quantized storage, delta chains (r12 — the route's plan-once shape)") {
    for (quant <- Seq("none", "f16")) {
      val cat = mkCat(4, quant = quant)
      val rnd = new scala.util.Random(19)
      def cmp(q0: Array[Float], q1: Array[Float], np: Int, tag: String): Unit = {
        val want = cat.searchMultiIvf("mvi", fq(q0, q1), topK = 8, nprobe = np)
          .collect().map(_.toSeq).toSeq
        val (schema, rows) = cat.searchMultiIvfPrepared("mvi", fq(q0, q1), topK = 8, nprobe = np)
        assert(schema.fieldNames.toSeq === Seq("id", "cell", "score"), tag)
        assert(rows.map(_.toSeq) === want, tag)
      }
      for (i <- 1 to 12) {
        val q0 = Array.fill(4)(rnd.nextFloat() * 200 - 50)
        val q1 = Array.fill(4)(rnd.nextFloat() * 200 - 50)
        cmp(q0, q1, 1 + rnd.nextInt(4), s"quant=$quant query $i")
      }
      // a delta fold publishes a new version → a new snapshot anchor → the
      // cached plan is stale-by-construction and recompiles
      cat.insert("mvi", Seq(("B0_1", Seq(99f, 1f, 0f, 0f), Seq(1f, 99f, 0f, 1f)))
        .toDF("id", "v0", "v1"))
      cat.flushDelta("mvi")
      val q0 = Array(100f, 0f, 0f, 0f)
      val q1 = Array(0f, 100f, 0f, 0f)
      cmp(q0, q1, 4, s"quant=$quant post-fold full probe")
      val (_, oneCell) = cat.searchMultiIvfPrepared("mvi", fq(q0, q1), topK = 40, nprobe = 1)
      assert(oneCell.count(_.getAs[String]("id") == "B0_1") === 1,
        s"quant=$quant: the moved row must serve from its NEW cell on the prepared path")
    }
  }

  test("single-vector rungs refuse multi-vector collections (and vice versa)") {
    val cat = mkCat(4)
    assert(intercept[IllegalArgumentException] {
      cat.searchIvf("mvi", Array(1f, 0f, 0f, 0f), topK = 5, nprobe = 1)
    }.getMessage.contains("searchMultiIvf"))
    assert(intercept[IllegalArgumentException] {
      cat.localIvfIndex("mvi")
    }.getMessage.contains("multi-vector"))
    assert(intercept[IllegalArgumentException] {
      cat.auditRecall("mvi", sampleMod = 7, nprobe = 1)
    }.getMessage.contains("auditRecallMulti"))
  }
}
