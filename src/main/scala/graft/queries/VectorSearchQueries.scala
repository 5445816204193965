package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions._

/** Flat (brute-force) vector scan — the reference's primary search operator
  * (SURVEY.md §2.1 S1/S2, /root/reference/edge/none_vectorstore.go:129-180).
  *
  * Spark shape: score every row with a codegen'd distance expression, then
  * `ORDER BY dist LIMIT k` — Catalyst plans this as TakeOrderedAndProject,
  * which keeps a bounded per-partition heap and merges on the driver: the
  * exact analog of the reference's per-shard top-K queues + merge, but it
  * scales with partition count instead of a fixed 16 shards.
  *
  * Determinism: distances are rounded to 6 dp and ties broken by vec_id so
  * the top-K set and order are engine-independent (DuckDB oracle parity).
  */
object VectorSearchQueries {
  import Tables.tbl

  /** All-pairs-free single-query scan: query vector = embedding of vec_id 0,
    * delivered as a 1-row broadcast cross join (no shuffle of the big side). */
  private def scan(s: SparkSession, dir: String, metric: String, k: Int = 10): DataFrame = {
    val e = tbl(s, dir, "embeddings")
    val q = e.where(col("vec_id") === 0).select(col("embedding").as("qv"))
    e.crossJoin(broadcast(q))
      .select(
        col("vec_id"),
        round(distance(col("embedding"), col("qv"), metric), 6).as("dist"))
      .orderBy(col("dist").asc, col("vec_id").asc)
      .limit(k)
  }

  private def oracleScan(distSql: String, k: Int = 10): String =
    s"""SELECT e.vec_id, ROUND($distSql, 6) AS dist
       |FROM embeddings e, (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0) q
       |ORDER BY dist, vec_id LIMIT $k""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "flat_scan_cosine" -> ((s, dir) => scan(s, dir, "cosine")),
    "flat_scan_euclidean" -> ((s, dir) => scan(s, dir, "euclidean")),
    "flat_scan_manhattan" -> ((s, dir) => scan(s, dir, "manhattan")),
    "flat_scan_dot" -> ((s, dir) => scan(s, dir, "dot")),
    // F4/A2: per-vector norm stats — exercises l2_norm and aggregation
    "vector_norm_stats" -> ((s, dir) => {
      val e = tbl(s, dir, "embeddings")
      e.groupBy(col("label"))
        .agg(
          count(lit(1)).as("n"),
          round(avg(l2_norm(col("embedding"))), 6).as("avg_norm"),
          round(max(l2_norm(col("embedding"))), 6).as("max_norm"))
        .orderBy(col("label"))
    }),
    // F9: CompareDist RPC — distance+score of two literal vectors
    // (/root/reference/core/core.go:841-867); no table in the plan.
    "compare_dist" -> ((s, dir) => {
      val e = tbl(s, dir, "embeddings")
      val em = Tables.embUpTo(e, 1) // both vectors in one job (r14)
      val va = em(0L)
      val vb = em(1L)
      graft.operators.CompareDist(s, va, vb, "cosine")
    }),
    // F5: display-score transform on top of the cosine scan
    "score_display_cosine" -> ((s, dir) => {
      val e = tbl(s, dir, "embeddings")
      val q = e.where(col("vec_id") === 0).select(col("embedding").as("qv"))
      e.crossJoin(broadcast(q))
        .select(
          col("vec_id"),
          round(score_from_distance(cosine_distance(col("embedding"), col("qv")), "cosine"), 4)
            .as("score"))
        .orderBy(col("score").desc, col("vec_id").asc)
        .limit(10)
    }),
    // §2.8 as PLAIN SQL: the kernels registered in the session's function
    // registry (graft.functions.registerSqlFunctions — the same codegen'd
    // Catalyst expressions as the Column API, no UDF indirection), the
    // whole flat scan driven from one spark.sql string. Gates the SQL
    // surface a warehouse user would actually type.
    "sql_surface_scan" -> ((s, dir) => {
      graft.functions.registerSqlFunctions(s)
      tbl(s, dir, "embeddings").createOrReplaceTempView("graft_sql_embeddings")
      s.sql("""
        SELECT e.vec_id,
               ROUND(cosine_distance(e.embedding, q.qv), 6) AS dist,
               ROUND(l2_norm(e.embedding), 6) AS norm
        FROM graft_sql_embeddings e,
             (SELECT embedding AS qv FROM graft_sql_embeddings WHERE vec_id = 0) q
        ORDER BY dist, vec_id LIMIT 10""")
    })
  )

  private val cosineDistSql =
    "ABS(1 - (list_inner_product(e.embedding::DOUBLE[], q.qv::DOUBLE[]) / " +
      "(SQRT(list_inner_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) * " +
      "SQRT(list_inner_product(q.qv::DOUBLE[], q.qv::DOUBLE[])))))"

  val oracles: Map[String, String] = Map(
    "flat_scan_cosine" -> oracleScan(cosineDistSql),
    "flat_scan_euclidean" ->
      oracleScan("list_distance(e.embedding::DOUBLE[], q.qv::DOUBLE[])"),
    "flat_scan_manhattan" ->
      oracleScan(
        "list_sum(list_transform(list_zip(e.embedding::DOUBLE[], q.qv::DOUBLE[]), x -> ABS(x[1] - x[2])))"),
    "flat_scan_dot" ->
      oracleScan("-list_inner_product(e.embedding::DOUBLE[], q.qv::DOUBLE[])"),
    "vector_norm_stats" ->
      """SELECT label, COUNT(*) AS n,
        |ROUND(AVG(SQRT(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[]))), 6) AS avg_norm,
        |ROUND(MAX(SQRT(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[]))), 6) AS max_norm
        |FROM embeddings GROUP BY label ORDER BY label""".stripMargin,
    "compare_dist" ->
      s"""SELECT ROUND($cosineDistSql, 6) AS dist,
         |  ROUND((2 - $cosineDistSql) / 2 * 100, 4) AS score
         |FROM (SELECT embedding FROM embeddings WHERE vec_id = 0) e,
         |     (SELECT embedding AS qv FROM embeddings WHERE vec_id = 1) q""".stripMargin,
    "score_display_cosine" ->
      s"""SELECT e.vec_id, ROUND((2 - $cosineDistSql) / 2 * 100, 4) AS score
         |FROM embeddings e, (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0) q
         |ORDER BY score DESC, vec_id LIMIT 10""".stripMargin,
    "sql_surface_scan" ->
      s"""SELECT e.vec_id, ROUND($cosineDistSql, 6) AS dist,
         |  ROUND(SQRT(list_inner_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])), 6) AS norm
         |FROM embeddings e, (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0) q
         |ORDER BY dist, vec_id LIMIT 10""".stripMargin
  )
}
