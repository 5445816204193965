package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** Pins Ann.knnJoin's scale claim "hot cells are ordinary join skew —
  * AQE's skew-join split applies" (Ann.scala; r12 VERDICT #6): a corpus
  * whose hottest cell holds ~30% of all rows — the deliberately skewed
  * 10M layout scaled to a unit fixture via the AQE thresholds — must (a)
  * actually fire the OptimizeSkewedJoin split on the shuffled cell join,
  * and (b) return exactly the rows the unsplit join returns. The query
  * side is large enough that it SHUFFLES (broadcast disabled — the big
  * retrieval-batch shape; small batches broadcast and have no shuffle to
  * skew in the first place). */
class KnnSkewSpec extends SparkSpec {

  private def withConf[A](kvs: Seq[(String, String)])(body: => A): A = {
    val prior = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prior.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  private def vec(seedSql: String): org.apache.spark.sql.Column =
    expr(s"transform(sequence(0,7), j -> cast((pmod(xxhash64($seedSql, j), 2001) - 1000) / 1000.0 as float))")

  test("hot-cell knnJoin (one cell ~30% of the corpus): the AQE skew split " +
    "fires on the shuffled cell join and the results equal the unsplit join") {
    // 64 well-separated unit centroids (axis-ish), used only for the
    // row-local top_cells probe — the SKEW lives in the corpus's assigned
    // cell column, which this fixture controls directly: cell 0 holds 30%.
    val centroids = (0 until 64).map { c =>
      (c.toLong, Array.tabulate(8)(j => if (j == c % 8) 1f + c / 8 else 0f))
    }
    val corpus = spark.range(60000).toDF("vec_id")
      .withColumn("vector", vec("vec_id"))
      .withColumn("cell",
        when(pmod(col("vec_id"), lit(10)) < 3, lit(0L))
          .otherwise(pmod(xxhash64(col("vec_id")), lit(63)) + 1))
    val queries = spark.range(500).toDF("qid")
      .withColumn("qvec", vec("qid + 1000000"))

    // the skew toggle lives in the surrounding withConf (the conf must be
    // set BEFORE the DataFrame's QueryExecution is created) — run itself
    // takes no flag so a caller cannot be misled into thinking it does
    def run(): (Seq[String], DataFrame) = {
      val df = graft.ann.Ann.knnJoin(corpus, queries, k = 3,
        "vec_id", "vector", "qid", "qvec", centroids, nprobe = 4)
      val rows = df.collect().map(_.toString).toSeq
      (rows, df)
    }

    val conf = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // scale the 10M thresholds down to the fixture: a ~MB hot partition
      // must count as skewed and split into advisory-sized chunks
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "16KB",
      "spark.sql.shuffle.partitions" -> "16",
      // the big-batch shape under test: both join sides shuffle
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")

    val (withSplit, df) = withConf(conf)(run())
    // plan assertion: the FINAL adaptive plan's shuffled join is marked
    // skew-split (OptimizeSkewedJoin fired)
    val fin = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    // the SMJ lives inside an already-materialized ShuffleQueryStage, which
    // TreeNode.collect does not descend into (stages are leaf wrappers) —
    // the final plan's STRING rendering does, and is how isSkewJoin prints
    val rendered = fin.toString
    assert(rendered.contains("skew=true"),
      s"expected an isSkewJoin=true shuffled join in the final adaptive plan:\n$rendered")
    assert(rendered.contains("AQEShuffleRead skewed"),
      s"expected a skew-split shuffle read on the hot-cell side:\n$rendered")

    // result parity: the split changes the schedule, never the rows
    val (withoutSplit, _) = withConf(
      conf.map { case ("spark.sql.adaptive.skewJoin.enabled", _) =>
        "spark.sql.adaptive.skewJoin.enabled" -> "false"
      case kv => kv })(run())
    assert(withSplit === withoutSplit)
    assert(withSplit.nonEmpty)
  }

  test("hot ROUTING cell on the multi-vector batch arm (searchBatchMulti / " +
    "multiProbedTopK): the AQE skew split fires and results match the " +
    "unsplit run") {
    // Same shape as knnJoin's cell join — probed queries equi-join the
    // cell-partitioned snapshot — but through the CFLAT catalog path, which
    // shares multiProbedTopK with searchMultiIvf. The skew lives in the
    // PERSISTED routing assignment: with ivfTrainIterations=0 the seed
    // centroids are the 8 pk-smallest rows' v0 vectors (distinct axes),
    // and 30% of the corpus sits on seed 0's axis → cell 0 holds ~30%.
    val cat = new graft.collection.GraftCatalog(spark,
      java.nio.file.Files.createTempDirectory("graft-knnskew-multi").toString)
    cat.createCollection(graft.collection.CollectionMeta("mb", dim = 8,
      distance = "euclidean",
      fields = Seq(
        graft.collection.IndexField("id", "string", primaryKey = true),
        graft.collection.IndexField("v0", "vector"),
        graft.collection.IndexField("v1", "vector")),
      ivfCells = Some(8), ivfTrainIterations = Some(0)))
    cat.loadCollection("mb")
    def onehot(cExpr: String) = expr(
      s"transform(sequence(0,7), j -> cast((CASE WHEN j = $cExpr THEN 10.0 ELSE 0.0 END)" +
        " + pmod(xxhash64(n, j), 100) / 1000.0 AS float))")
    val hotCell = "CASE WHEN n < 8 THEN n WHEN pmod(n, 10) < 3 THEN 0 " +
      "ELSE 1 + pmod(xxhash64(n), 7) END"
    cat.insert("mb", spark.range(60000).toDF("n").select(
      lpad(col("n").cast("string"), 6, "0").as("id"),
      onehot(hotCell).as("v0"),
      onehot(s"pmod(($hotCell) + 1, 8)").as("v1")))
    cat.flush("mb")
    val rnd = new scala.util.Random(5)
    def qv(c: Int) = Array.tabulate(8)(j => (if (j == c) 10f else 0f) + rnd.nextFloat() * 0.1f)
    val queries = (0 until 400).map { i =>
      val c = if (i % 3 == 0) 0 else i % 8
      (s"q$i", Map("v0" -> qv(c), "v1" -> qv((c + 1) % 8)))
    }
    def run(): (Seq[String], DataFrame) = {
      val df = cat.searchBatchMulti("mb", Seq("v0" -> 60.0, "v1" -> 40.0),
        queries, topK = 3, nprobe = 4)
      (df.collect().map(_.toString).toSeq, df)
    }
    val conf = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "16KB",
      "spark.sql.shuffle.partitions" -> "16",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val (withSplit, df) = withConf(conf)(run())
    val fin = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val rendered = fin.toString
    assert(rendered.contains("skew=true"),
      s"expected an isSkewJoin=true shuffled join in the final adaptive plan:\n$rendered")
    // the skew-split read renders "skewed" alone, or "coalesced and skewed"
    // when partition coalescing composed with the split
    assert("AQEShuffleRead (coalesced and )?skewed".r.findFirstIn(rendered).isDefined,
      s"expected a skew-split shuffle read on the hot-cell side:\n$rendered")
    val (withoutSplit, _) = withConf(
      conf.map { case ("spark.sql.adaptive.skewJoin.enabled", _) =>
        "spark.sql.adaptive.skewJoin.enabled" -> "false"
      case kv => kv })(run())
    assert(withSplit === withoutSplit)
    assert(withSplit.nonEmpty)
  }
}
