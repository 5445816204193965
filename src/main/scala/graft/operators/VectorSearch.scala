package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.FilterExpr
import graft.functions.{distance, score_from_distance}

/** Top-K similarity search request — the engine's version of the reference's
  * edge `SearchRequest` (/root/reference/idl/proto/v4/edge.proto:115-126):
  * query vector, topK, offset, metric, composite filter, min-score threshold.
  *
  * Deliberate divergences from observed reference bugs (SURVEY.md §7):
  *  - offset rows ARE dropped (T3 ⚠: reference fetches limit+offset but never
  *    skips);
  *  - `minScore` IS applied (T4 ⚠: declared but dead in the reference);
  *  - best-K polarity: smallest distance first (§2.6 ⚠ heap-polarity bug).
  *
  * Determinism contract: distances are rounded to `roundDp` decimals and ties
  * broken by the id column, so the result set is stable across engines,
  * partition counts and retries — required both for the DuckDB oracle gate
  * and for reproducible pipelines at scale.
  */
case class SearchRequest(
    queryVector: Array[Float],
    topK: Int,
    metric: String = "cosine",
    filter: Option[FilterExpr] = None,
    offset: Int = 0,
    minScore: Option[Double] = None,
    idCol: String = "id",
    vectorCol: String = "vector",
    roundDp: Int = 6,
    /** Override of the raw distance expression (e.g. a fused quantized
      * kernel) — must produce the same value as
      * `distance(col(vectorCol), lit(queryVector), metric)`. */
    customDistance: Option[Column] = None) {
  require(topK > 0, "topK must be positive")
  require(offset >= 0, "offset must be non-negative")
}

/** Flat (exact) vector scan + filtered variants (SURVEY.md §2.1 S1-S3, §2.3 J1).
  *
  * Spark shape: one codegen'd distance expression per row, then
  * `ORDER BY dist LIMIT k` → Catalyst's TakeOrderedAndProject (bounded
  * per-partition heap + driver merge — the §2.6 T1/T2 top-K operator, scaling
  * with partitions instead of the reference's fixed 16 shards). Filters go
  * through `where` BEFORE scoring so Parquet row-group pruning and column
  * pruning see them (§4 predicate pushdown — replaces the bitmap index).
  */
object VectorSearch {

  /** Score all (optionally filtered) rows, keep best `topK` after `offset`.
    * Output: all non-vector columns + `dist` + `score`, best-first. */
  def search(df: DataFrame, req: SearchRequest): DataFrame = {
    val base = req.filter.map(f => df.where(f.toColumn)).getOrElse(df)
    // score derives from the RAW distance, not the rounded one: rounding
    // twice (dist to 6dp, then a linear transform of it to 4dp) parks the
    // score exactly on .5 rounding boundaries, where engines disagree.
    val raw = req.customDistance.getOrElse(
      distance(col(req.vectorCol), lit(req.queryVector), req.metric))
    val scored = base
      .withColumn("dist", round(raw, req.roundDp))
      .withColumn("score", round(score_from_distance(raw, scoreMetric(req.metric)), 4))
      .drop(req.vectorCol)
    val thresholded = req.minScore.map(t => scored.where(col("score") >= t)).getOrElse(scored)
    val sorted = thresholded.orderBy(col("dist").asc, col(req.idCol).asc)
    if (req.offset > 0) sorted.offset(req.offset).limit(req.topK) else sorted.limit(req.topK)
  }

  /** Hybrid search (J1): over-fetch `overFetch`×topK by pure similarity,
    * intersect with the ids surviving the metadata filter, final top-K.
    * Implements the documented INTENT of the reference
    * (/root/reference/core/core.go:760-839 over-fetches ×3 then intersects —
    * its final loop drops the intersection, a recorded bug we don't copy). */
  def hybridSearch(df: DataFrame, req: SearchRequest, filter: FilterExpr, overFetch: Int = 3): DataFrame =
    hybridSearchWith(df, req, filter.toColumn, overFetch)

  /** [[hybridSearch]] with the candidate predicate as a raw Column — the
    * seam that lets schemaless (string-coerced map) collections route their
    * own filter semantics through the same over-fetch + intersect shape.
    *
    * ONE corpus pass (r11 — replacing the r10 two-scan broadcast-join
    * shape): the candidate predicate is evaluated as a carried boolean
    * column inside the SAME scan that scores the over-fetch window, so the
    * whole request is a single bounded TakeOrderedAndProject job; the
    * intersect + final top-K then operate on the ≤ overFetch·topK
    * surviving rows — output-sized, no join, no second scan. The semantics
    * are unchanged and exactly the reference's documented intent
    * (core/core.go:760-839 over-fetches by pure similarity, then keeps the
    * rows whose ids survive the metadata filter): membership of the
    * over-fetch window depends only on distance, so testing the predicate
    * per-row during the scan and filtering AFTER the window selection is
    * equal to intersecting the window with the filter-survivor id set. At
    * 100 TB this halves the request's I/O versus the join shape (which
    * re-scanned the corpus to materialize survivors) and removes its
    * broadcast exchange. Pinned by PlanShapeSpec ("one corpus scan, no
    * join").
    *
    * Duplicate-id frames: output is ONE row per id regardless of input
    * multiplicity — the dropDuplicates operates on the post-window
    * survivors (≤ overFetch·topK rows, output-bound), so well-definedness
    * costs a shuffle of a result-sized set, never of the corpus. */
  def hybridSearchWith(df: DataFrame, req: SearchRequest, candidatePred: Column,
                       overFetch: Int = 3): DataFrame = {
    require(overFetch >= 1, "overFetch must be >= 1")
    val keep = "__graft_cand"
    val over = search(df.withColumn(keep, candidatePred),
      req.copy(filter = None, topK = req.topK * overFetch, offset = 0))
    over.where(col(keep))
      .drop(keep)
      .dropDuplicates(req.idCol)
      .orderBy(col("dist").asc, col(req.idCol).asc)
      .limit(req.topK)
  }

  /** euclidean/manhattan share the euclidean display transform; cosine and
    * dot have their own (edge/edge_helper.go:143-148; dot is our extension —
    * the euclidean formula on a negated dot would exceed 100). */
  private def scoreMetric(metric: String): String = metric match {
    case "cosine" | "dot" => metric
    case _                => "euclidean"
  }
}

/** CompareDist RPC (SURVEY.md §2.8 F9, /root/reference/core/core.go:841-867):
  * standalone distance + display score between two literal vectors — the
  * distance expression evaluated on a one-row relation, no table involved. */
object CompareDist {
  def apply(spark: org.apache.spark.sql.SparkSession,
            a: Array[Float], b: Array[Float], metric: String = "cosine"): DataFrame = {
    require(a.length == b.length, s"dimension mismatch: ${a.length} vs ${b.length}")
    val d = distance(lit(a), lit(b), metric)
    spark.range(1).select(
      round(d, 6).as("dist"),
      round(score_from_distance(d,
        if (metric == "manhattan") "euclidean" else metric), 4).as("score"))
  }
}

/** Multi-vector weighted search (SURVEY.md §2.4 A1, experimental CFLAT engine,
  * /root/reference/experimental/multi_vector_vertex.go:111-124): one record
  * holds several named vectors; the query scores an included subset, each
  * weighted by ratio/100, ratios summing to 100
  * (experimental/experimental_analyzer.go:143-154).
  */
object MultiVectorSearch {
  /** One queried field: vector column name, query vector, weight ratio. */
  case class FieldQuery(vectorCol: String, queryVector: Array[Float], ratio: Double, include: Boolean = true)

  def search(
      df: DataFrame,
      fields: Seq[FieldQuery],
      topK: Int,
      metric: String = "cosine",
      idCol: String = "id",
      roundDp: Int = 6,
      distanceOf: Option[(FieldQuery, Column) => Column] = None,
      keepCols: Seq[String] = Nil): DataFrame = {
    val included = fields.filter(_.include)
    searchWith(df, fields, included.map(f => lit(f.queryVector)), topK, metric, idCol,
      distanceOf, keepCols)
  }

  /** [[search]] with the query vectors as raw Columns aligned with the
    * INCLUDED fields — the seam the prepared (plan-once/execute-many)
    * serving path uses to plant swappable placeholder literals.
    *
    * `distanceOf` overrides the per-field raw-distance expression — the
    * quantized-storage seam: the catalog routes each field through the
    * FUSED decode-in-loop kernel (`distance_quant`) instead of
    * materializing a dequantized array column per field per row (the same
    * single-pass discipline as the single-vector path; must equal
    * `distance(dequantize(field), query)` bit-for-bit). */
  def searchWith(
      df: DataFrame,
      fields: Seq[FieldQuery],
      queryCols: Seq[Column],
      topK: Int,
      metric: String = "cosine",
      idCol: String = "id",
      distanceOf: Option[(FieldQuery, Column) => Column] = None,
      /** Extra input columns carried into the output between the id and
        * the score (e.g. the IVF rung's `cell`). */
      keepCols: Seq[String] = Nil): DataFrame = {
    val included = fields.filter(_.include)
    require(included.nonEmpty, "at least one field must be included")
    require(queryCols.length == included.length,
      s"queryCols must align with the included fields: ${queryCols.length} vs ${included.length}")
    val ratioSum = included.map(_.ratio).sum
    require(math.abs(ratioSum - 100.0) < 1e-9,
      s"included ratios must sum to 100, got $ratioSum") // experimental_analyzer.go:143-154
    val weighted: Column = included.zip(queryCols).map { case (f, qc) =>
      val d = distanceOf.map(_(f, qc))
        .getOrElse(distance(col(f.vectorCol), qc, metric))
      score_from_distance(d, if (metric == "cosine") "cosine" else "euclidean") * lit(f.ratio / 100.0)
    }.reduce(_ + _)
    // Rank on an 8-dp rounding of the raw weighted score (finer than the
    // 4-dp display score, coarse enough to absorb summation-order ulps), so
    // rows whose display scores tie at 4 dp still order by true score —
    // engine-independently — before the id tiebreak.
    val carried = keepCols.map(col)
    df.select(col(idCol) +: carried :+ round(weighted, 4).as("score") :+
        round(weighted, 8).as("__rank"): _*)
      .orderBy(col("__rank").desc, col(idCol).asc) // higher-is-better polarity (multi_priority_queue.go:27-30)
      .limit(topK)
      .select(col(idCol) +: carried :+ col("score"): _*)
  }
}
