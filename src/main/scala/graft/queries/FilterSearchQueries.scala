package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.FilterExpr
import graft.FilterExpr._
import graft.operators.{MultiVectorSearch, Mutations, SearchRequest, VectorSearch}

/** Filtered / hybrid / multi-vector search + mutation operators over the
  * `embeddings` TESTDATA table (SURVEY.md §2.1 S3/S5, §2.2 P1/P2/P5, §2.3
  * J1/J3, §2.4 A1-A3, §2.6 T3/T4).
  *
  * The e2e filter corpus of the reference uses metadata columns
  * (type/size/volume — FIXTURES.md §1); TESTDATA's embeddings table only has
  * `label`, so the extra columns are derived deterministically from vec_id —
  * identically in Spark and the DuckDB oracle — to exercise the same
  * composite-filter shapes.
  */
object FilterSearchQueries {
  import Tables.tbl

  private def emb(s: SparkSession, dir: String): DataFrame = tbl(s, dir, "embeddings")

  /** Query vector = stored embedding of `id` (one-row driver-side fetch, as a
    * real client would supply it). */
  private def qvec(e: DataFrame, id: Long): Array[Float] =
    e.where(col("vec_id") === id).select("embedding").head().getSeq[Float](0).toArray

  private def req(e: DataFrame, k: Int = 10, metric: String = "cosine") =
    SearchRequest(qvec(e, 0), topK = k, metric = metric, idCol = "vec_id", vectorCol = "embedding")

  /** type/size/volume derived from vec_id (mirrored 1:1 in the oracle SQL). */
  private def withDerivedMeta(e: DataFrame): DataFrame = e
    .withColumn("type", col("vec_id") % 10 + 1)
    .withColumn("size", expr("((vec_id div 10) % 10) + 1"))
    .withColumn("volume", (col("vec_id") % 100) / lit(100.0))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // S3/P1: single-predicate filtered search
    "filtered_search_single" -> ((s, dir) => {
      val e = emb(s, dir)
      VectorSearch.search(e, req(e).copy(filter = Some(Single("label", Gte, 5))))
    }),
    // P2: arbitrary-depth AND/OR tree — the e2e depth_multi_filter shape
    "filtered_search_composite" -> ((s, dir) => {
      val e = withDerivedMeta(emb(s, dir))
      val f = Or(And(Single("type", Gte, 5L), Single("size", Lt, 4L)), Single("volume", Lt, 0.5))
      VectorSearch.search(e, req(e).copy(filter = Some(f)))
        .select("vec_id", "label", "dist", "score")
    }),
    // S5: point lookup by primary key
    "point_lookup" -> ((s, dir) =>
      emb(s, dir).where(col("vec_id") === 7).select("vec_id", "label")),
    // T3: real offset pagination (reference never drops offset rows — ⚠ T3)
    "search_offset" -> ((s, dir) => {
      val e = emb(s, dir)
      VectorSearch.search(e, req(e, metric = "euclidean").copy(offset = 5))
        .select("vec_id", "dist", "score")
    }),
    // T4: min-score threshold (declared-but-dead in the reference — ⚠ T4)
    "search_min_score" -> ((s, dir) => {
      val e = emb(s, dir)
      VectorSearch.search(e, req(e).copy(minScore = Some(55.0)))
    }),
    // J1: hybrid search — over-fetch ×3 then intersect with filter candidates
    "hybrid_search" -> ((s, dir) => {
      val e = emb(s, dir)
      VectorSearch.hybridSearch(e, req(e), Single("label", Gte, 5), overFetch = 3)
    }),
    // J1 edge: a selective filter leaves FEWER survivors than topK inside
    // the over-fetch window — the semi-join must drain and return the short
    // result (the reference's discarded-intersect bug would return
    // unfiltered rows here; we implement the documented intent, SURVEY J1 ⚠)
    "hybrid_search_drain" -> ((s, dir) => {
      val e = emb(s, dir)
      VectorSearch.hybridSearch(e, req(e), Single("label", Eq, 3), overFetch = 3)
    }),
    // A1: weighted multi-vector search (CFLAT) — two named vectors per row
    "multi_vector_search" -> ((s, dir) => {
      val e = emb(s, dir)
      val mv = e.select(col("vec_id"), col("embedding").as("v0"))
        .join(e.select((col("vec_id") - 1).as("vec_id"), col("embedding").as("v1")), "vec_id")
      MultiVectorSearch.search(mv,
        Seq(
          MultiVectorSearch.FieldQuery("v0", qvec(e, 0), ratio = 60),
          MultiVectorSearch.FieldQuery("v1", qvec(e, 1), ratio = 40)),
        topK = 10, idCol = "vec_id")
    }),
    // J3: MERGE-style upsert keyed by pk; distribution check of the result
    "upsert_merge" -> ((s, dir) => {
      val e = emb(s, dir)
      val updates = e.where(col("vec_id") < 50).withColumn("label", col("label") + 100)
      Mutations.upsert(e, updates, "vec_id")
        .groupBy("label")
        .agg(count(lit(1)).as("n"), sum("vec_id").as("sum_id"))
        .orderBy("label")
    }),
    // P5: delete-by-conjunctive-EQ-filter; survivors' distribution
    "delete_by_filter" -> ((s, dir) => {
      val d = withDerivedMeta(emb(s, dir))
      Mutations.deleteWhere(d, And(Single("label", Eq, 5), Single("size", Eq, 3L)))
        .groupBy("label")
        .agg(count(lit(1)).as("n"), sum("vec_id").as("sum_id"))
        .orderBy("label")
    }),
    // §1.2 core v3 compat: schema-less string-coerced map metadata with the
    // _id shim; conjunctive map-EQ filter (P4) + numeric-coerced comparison
    // ("5" >= 5 parses — pkg/inverted/bitmap_index.go:99-356 parity).
    "core_map_filter_search" -> ((s, dir) => {
      import graft.core.CoreMeta
      val e = emb(s, dir)
      val base = e.withColumn("grp", (col("vec_id") % 7).cast("string"))
      val m = CoreMeta.withMeta(base, col("vec_id"), Seq("label", "grp"))
      m.where(CoreMeta.pureFilter(col("meta"), Map("grp" -> "3")) &&
          CoreMeta.compare(col("meta"), "label", Gte, "5"))
        .select(
          element_at(col("meta"), CoreMeta.IdKey).as("id"),
          round(graft.functions.cosine_distance(col("embedding"), lit(qvec(e, 0))), 6).as("dist"))
        .orderBy(col("dist").asc, col("id").asc)
        .limit(10)
    }),
    // A2: collection count/size stats
    "count_stats" -> ((s, dir) =>
      emb(s, dir).agg(
        count(lit(1)).as("n_rows"),
        countDistinct(col("label")).as("n_labels"),
        min("vec_id").as("min_id"),
        max("vec_id").as("max_id"))),
    // A3: posting-list build — per (column,value) id-set stats
    "posting_list_stats" -> ((s, dir) =>
      emb(s, dir).groupBy("label")
        .agg(count(lit(1)).as("n"), min("vec_id").as("min_id"),
          max("vec_id").as("max_id"), sum("vec_id").as("sum_id"))
        .orderBy("label"))
  )

  /** DuckDB cosine-distance fragment matching VecCosineDistance exactly. */
  private def cosSql(a: String, b: String): String =
    s"ABS(1 - (list_inner_product($a::DOUBLE[], $b::DOUBLE[]) / " +
      s"(SQRT(list_inner_product($a::DOUBLE[], $a::DOUBLE[])) * " +
      s"SQRT(list_inner_product($b::DOUBLE[], $b::DOUBLE[])))))"

  private val qCte = "q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)"
  private def cosCols =
    s"ROUND(${cosSql("e.embedding", "q.qv")}, 6) AS dist, " +
      s"ROUND((2 - ${cosSql("e.embedding", "q.qv")}) / 2 * 100, 4) AS score"

  val oracles: Map[String, String] = Map(
    "filtered_search_single" ->
      s"""WITH $qCte
         |SELECT e.vec_id, e.label, $cosCols
         |FROM embeddings e, q WHERE e.label >= 5
         |ORDER BY dist, vec_id LIMIT 10""".stripMargin,
    "filtered_search_composite" ->
      s"""WITH $qCte,
         |d AS (SELECT *, vec_id % 10 + 1 AS type, ((vec_id // 10) % 10) + 1 AS size,
         |             (vec_id % 100) / 100.0 AS volume FROM embeddings)
         |SELECT e.vec_id, e.label, $cosCols
         |FROM d e, q
         |WHERE (e.type >= 5 AND e.size < 4) OR e.volume < 0.5
         |ORDER BY dist, vec_id LIMIT 10""".stripMargin,
    "point_lookup" ->
      "SELECT vec_id, label FROM embeddings WHERE vec_id = 7",
    "search_offset" ->
      s"""WITH $qCte
         |SELECT e.vec_id,
         |  ROUND(list_distance(e.embedding::DOUBLE[], q.qv::DOUBLE[]), 6) AS dist,
         |  ROUND(GREATEST(0, 100 - list_distance(e.embedding::DOUBLE[], q.qv::DOUBLE[])), 4) AS score
         |FROM embeddings e, q
         |ORDER BY dist, vec_id LIMIT 10 OFFSET 5""".stripMargin,
    "search_min_score" ->
      s"""WITH $qCte,
         |s AS (SELECT e.vec_id, e.label, $cosCols FROM embeddings e, q)
         |SELECT * FROM s WHERE score >= 55.0
         |ORDER BY dist, vec_id LIMIT 10""".stripMargin,
    "hybrid_search" ->
      s"""WITH $qCte,
         |scored AS (SELECT e.vec_id, e.label, $cosCols
         |           FROM embeddings e, q ORDER BY dist, vec_id LIMIT 30)
         |SELECT * FROM scored
         |WHERE vec_id IN (SELECT vec_id FROM embeddings WHERE label >= 5)
         |ORDER BY dist, vec_id LIMIT 10""".stripMargin,
    "hybrid_search_drain" ->
      s"""WITH $qCte,
         |scored AS (SELECT e.vec_id, e.label, $cosCols
         |           FROM embeddings e, q ORDER BY dist, vec_id LIMIT 30)
         |SELECT * FROM scored
         |WHERE vec_id IN (SELECT vec_id FROM embeddings WHERE label = 3)
         |ORDER BY dist, vec_id LIMIT 10""".stripMargin,
    "multi_vector_search" ->
      s"""WITH q0 AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
         |q1 AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 1),
         |mv AS (SELECT e1.vec_id, e1.embedding AS v0, e2.embedding AS v1
         |       FROM embeddings e1 JOIN embeddings e2 ON e2.vec_id = e1.vec_id + 1)
         |SELECT mv.vec_id,
         |  ROUND(((2 - ${cosSql("mv.v0", "q0.qv")}) / 2 * 100) * 0.6
         |      + ((2 - ${cosSql("mv.v1", "q1.qv")}) / 2 * 100) * 0.4, 4) AS score
         |FROM mv, q0, q1
         |ORDER BY ROUND(((2 - ${cosSql("mv.v0", "q0.qv")}) / 2 * 100) * 0.6
         |      + ((2 - ${cosSql("mv.v1", "q1.qv")}) / 2 * 100) * 0.4, 8) DESC, vec_id
         |LIMIT 10""".stripMargin,
    "upsert_merge" ->
      """WITH updates AS (
        |  SELECT vec_id, embedding, label + 100 AS label FROM embeddings WHERE vec_id < 50),
        |merged AS (
        |  SELECT * FROM embeddings WHERE vec_id NOT IN (SELECT vec_id FROM updates)
        |  UNION ALL SELECT * FROM updates)
        |SELECT label, COUNT(*) AS n, CAST(SUM(vec_id) AS BIGINT) AS sum_id
        |FROM merged GROUP BY label ORDER BY label""".stripMargin,
    "delete_by_filter" ->
      """WITH d AS (SELECT *, ((vec_id // 10) % 10) + 1 AS size FROM embeddings)
        |SELECT label, COUNT(*) AS n, CAST(SUM(vec_id) AS BIGINT) AS sum_id
        |FROM d WHERE NOT (label = 5 AND size = 3)
        |GROUP BY label ORDER BY label""".stripMargin,
    "core_map_filter_search" ->
      s"""WITH $qCte,
         |m AS (SELECT CAST(vec_id AS VARCHAR) AS id, label,
         |             CAST(vec_id % 7 AS VARCHAR) AS grp, embedding
         |      FROM embeddings)
         |SELECT m.id, ROUND(${cosSql("m.embedding", "q.qv")}, 6) AS dist
         |FROM m, q WHERE m.grp = '3' AND m.label >= 5
         |ORDER BY dist, id LIMIT 10""".stripMargin,
    "count_stats" ->
      """SELECT COUNT(*) AS n_rows, COUNT(DISTINCT label) AS n_labels,
        |MIN(vec_id) AS min_id, MAX(vec_id) AS max_id FROM embeddings""".stripMargin,
    "posting_list_stats" ->
      """SELECT label, COUNT(*) AS n, MIN(vec_id) AS min_id, MAX(vec_id) AS max_id,
        |CAST(SUM(vec_id) AS BIGINT) AS sum_id
        |FROM embeddings GROUP BY label ORDER BY label""".stripMargin
  )
}
