package graft

import org.apache.spark.sql.functions._

import graft.FilterExpr._
import graft.operators._

/** Semantics tests for search/mutation operators at sf0.001. */
class OperatorsSpec extends SparkSpec {

  private lazy val emb = spark.read.parquet(s"$sfDir/embeddings.parquet").cache()
  private lazy val q0 =
    emb.where(col("vec_id") === 0).head().getSeq[Float](1).toArray

  private def baseReq = SearchRequest(q0, topK = 10, idCol = "vec_id", vectorCol = "embedding")

  test("self-match: query vector's own row ranks first with dist 0 / score 100") {
    val top = VectorSearch.search(emb, baseReq).head()
    assert(top.getAs[Long]("vec_id") === 0L)
    assert(top.getAs[Double]("dist") === 0.0)
    assert(top.getAs[Double]("score") === 100.0)
  }

  test("filter excludes non-matching rows; all results satisfy the predicate") {
    val rows = VectorSearch.search(emb, baseReq.copy(filter = Some(Single("label", Gte, 5))))
      .collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Int]("label") >= 5))
  }

  test("offset drops exactly the first rows of the full ranking (T3 intent, not the reference bug)") {
    val all = VectorSearch.search(emb, baseReq.copy(topK = 15)).collect().map(_.getAs[Long]("vec_id"))
    val paged = VectorSearch.search(emb, baseReq.copy(topK = 10, offset = 5)).collect().map(_.getAs[Long]("vec_id"))
    assert(paged.toSeq === all.drop(5).toSeq)
  }

  test("minScore threshold applied (T4 intent)") {
    val rows = VectorSearch.search(emb, baseReq.copy(minScore = Some(55.0))).collect()
    assert(rows.forall(_.getAs[Double]("score") >= 55.0))
  }

  test("hybrid = intersection of over-fetched ANN ids and filter candidates") {
    val hybrid = VectorSearch.hybridSearch(emb, baseReq, Single("label", Gte, 5), overFetch = 3)
      .collect()
    val annIds = VectorSearch.search(emb, baseReq.copy(topK = 30)).collect()
      .map(_.getAs[Long]("vec_id")).toSet
    assert(hybrid.nonEmpty)
    assert(hybrid.forall(r => annIds.contains(r.getAs[Long]("vec_id"))))
    assert(hybrid.forall(_.getAs[Int]("label") >= 5))
  }

  test("multi-vector ratios must sum to 100") {
    val mv = emb.select(col("vec_id"), col("embedding").as("v0"))
    val ex = intercept[IllegalArgumentException] {
      MultiVectorSearch.search(mv, Seq(MultiVectorSearch.FieldQuery("v0", q0, ratio = 60)), 5, idCol = "vec_id")
    }
    assert(ex.getMessage.contains("sum to 100"))
  }

  test("excluded fields don't contribute; single included field at ratio 100 works") {
    val mv = emb.select(col("vec_id"), col("embedding").as("v0"), col("embedding").as("v1"))
    val out = MultiVectorSearch.search(mv, Seq(
      MultiVectorSearch.FieldQuery("v0", q0, ratio = 100),
      MultiVectorSearch.FieldQuery("v1", q0, ratio = 55, include = false)), 5, idCol = "vec_id")
    assert(out.head().getAs[Long]("vec_id") === 0L) // self-match wins at ratio 100
  }

  test("upsert: same pk replaces (count stable), new pk inserts") {
    val updates = emb.where(col("vec_id") < 10).withColumn("label", lit(999))
    val news = emb.limit(1).select(
      (col("vec_id") + 1000000).as("vec_id"), col("embedding"), col("label"))
    val merged = Mutations.upsert(emb, updates.unionByName(news), "vec_id")
    assert(merged.count() === emb.count() + 1)
    assert(merged.where(col("label") === 999).count() === 10)
  }

  test("deleteWhere removes exactly the conjunctive-EQ matches") {
    val victims = emb.where(col("label") === 5).count()
    val remaining = Mutations.deleteWhere(emb, Single("label", Eq, 5))
    assert(remaining.count() === emb.count() - victims)
    assert(remaining.where(col("label") === 5).count() === 0)
  }

  test("latestByKey keeps the highest-version row per key (LWW)") {
    import spark.implicits._
    val changes = Seq(
      (1L, 1L, "a"), (1L, 3L, "c"), (1L, 2L, "b"), (2L, 1L, "x")
    ).toDF("id", "version", "val")
    val latest = Mutations.latestByKey(changes, "id", "version")
      .orderBy("id").collect()
    assert(latest.map(r => (r.getLong(0), r.getString(2))).toSeq === Seq((1L, "c"), (2L, "x")))
  }

  test("AsOfJoin: latest prior snapshot per key, inclusive ties, null when none") {
    import spark.implicits._
    val left = Seq(
      (1L, 5L, "e1"),   // after snap@3 -> s3
      (1L, 10L, "e2"),  // ON snap@10 -> s10 (inclusive)
      (1L, 11L, "e3"),  // after snap@10 -> s10
      (1L, 2L, "e0"),   // before any snap -> null
      (2L, 100L, "f1")  // key with no snaps at all -> null
    ).toDF("k", "ts", "ev")
    val right = Seq((1L, 3L, "s3"), (1L, 10L, "s10"), (3L, 1L, "zz"))
      .toDF("k", "ts", "snap")
    val out = AsOfJoin.join(left, right, "k", "ts")
      .orderBy("k", "ts").collect()
      .map(r => (r.getAs[String]("ev"), Option(r.getAs[String]("snap"))))
    assert(out.toSeq === Seq(
      ("e0", None), ("e1", Some("s3")), ("e2", Some("s10")), ("e3", Some("s10")),
      ("f1", None)))
    // column collision between sides is rejected, not silently resolved
    intercept[IllegalArgumentException] {
      AsOfJoin.join(left, right.withColumnRenamed("snap", "ev"), "k", "ts")
    }
  }
}
