package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions._

/** Similarity search over embedding columns for training-data pipelines.
  *
  * Scale ladder:
  *  - [[bruteForceTopK]]: exact, broadcast the (small) query set over the
  *    corpus scan — one pass, per-partition partial top-K. The recall=1
  *    baseline.
  *  - [[signLshPairs]] / IVF: the 100 TB paths — candidate generation via
  *    bucket equi-joins (shuffle on bucket key), exact scoring only inside
  *    buckets/probed cells, never an unblocked all-pairs join.
  */
object Ann {

  /** Exact top-k neighbors for every query row. `queries` must be small
    * (broadcast side); the corpus is scanned once, ranked per query with a
    * bounded window. Output: (qid, id, dist, rn). */
  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String, vecCol: String, qidCol: String, qvecCol: String,
      metric: String = "cosine"): DataFrame = {
    val scored = corpus.crossJoin(broadcast(queries))
      .select(
        col(qidCol), col(idCol),
        round(distance(col(vecCol), col(qvecCol), metric), 6).as("dist"))
    val w = Window.partitionBy(col(qidCol)).orderBy(col("dist").asc, col(idCol).asc)
    scored.withColumn("rn", row_number().over(w)).where(col("rn") <= k)
      .orderBy(col(qidCol), col("rn"))
  }

  /** All pairs with cosine similarity ≥ threshold — exact near-duplicate
    * detection over embeddings. Quadratic BY CONSTRUCTION (an O(n²)
    * theta-join), so it refuses to run past `maxRows`: at corpus scale use
    * [[signLshPairs]] (bucketed equi-join) instead. The count() guard is one
    * cheap scan — negligible next to the join it gates. */
  def cosineSimPairs(df: DataFrame, idCol: String, vecCol: String, threshold: Double,
                     maxRows: Long = 100000L): DataFrame = {
    val n = df.count()
    require(n <= maxRows,
      s"cosineSimPairs is O(n²) and refuses n=$n > maxRows=$maxRows rows; " +
        "use signLshPairs for corpus-scale near-dup detection")
    val a = df.select(col(idCol).as("id_a"), col(vecCol).as("va"))
    val b = df.select(col(idCol).as("id_b"), col(vecCol).as("vb"))
    a.join(b, col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(lit(1.0) - cosine_distance(col("va"), col("vb")), 6).as("sim"))
      .where(col("sim") >= threshold)
      .orderBy("id_a", "id_b")
  }

  /** Random-hyperplane (sign) LSH bucket key: one bit per plane =
    * sign(dot(v, plane)). Planes are rows of `planes` (deterministic:
    * callers pass e.g. the first-n embeddings). */
  def signBucket(vecCol: Column, planes: Seq[Array[Float]]): Column =
    concat_ws("", planes.map(p => when(vec_dot(vecCol, lit(p)) > 0, "1").otherwise("0")): _*)

  /** LSH-bucketed near-dup pairs: bucket equi-join + exact verify. Misses
    * cross-bucket pairs by design (recall/cost trade dial = plane count). */
  def signLshPairs(
      df: DataFrame, idCol: String, vecCol: String,
      planes: Seq[Array[Float]], threshold: Double): DataFrame = {
    val bucketed = df.select(col(idCol), col(vecCol), signBucket(col(vecCol), planes).as("bucket"))
    val a = bucketed.select(col("bucket"), col(idCol).as("id_a"), col(vecCol).as("va"))
    val b = bucketed.select(col("bucket"), col(idCol).as("id_b"), col(vecCol).as("vb"))
    a.join(b, Seq("bucket")).where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(lit(1.0) - cosine_distance(col("va"), col("vb")), 6).as("sim"))
      .where(col("sim") >= threshold)
      .orderBy("id_a", "id_b")
  }

  /** IVF cell assignment: nearest centroid per row (centroids broadcast,
    * one scan, windowed argmin). Output: df columns + `cell`. */
  def ivfAssign(
      df: DataFrame, idCol: String, vecCol: String,
      centroids: Seq[(Long, Array[Float])], metric: String = "euclidean"): DataFrame = {
    val cellDist: Seq[Column] = centroids.map { case (cid, cvec) =>
      struct(round(distance(col(vecCol), lit(cvec), metric), 6).as("d"), lit(cid).as("cid"))
    }
    // array_min over (dist, cid) structs = argmin with deterministic cid tiebreak
    df.withColumn("cell", array_min(array(cellDist: _*)).getField("cid"))
  }

  /** IVF search: probe the `nprobe` centroids nearest to the query, scan
    * only rows assigned to those cells, exact top-k inside. At scale the
    * assignment is precomputed+partitioned by cell → probed cells are a
    * partition-pruned scan. */
  /** The `nprobe` centroid ids nearest the query (driver-side: centroid
    * lists are tiny and the result drives partition pruning). */
  def probeCells(centroids: Seq[(Long, Array[Float])], queryVec: Array[Float],
                 nprobe: Int, metric: String = "euclidean"): Seq[Long] =
    centroids
      .map { case (cid, cvec) => (cid, distLocal(cvec, queryVec, metric)) }
      .sortBy { case (cid, d) => (d, cid) }
      .take(nprobe).map(_._1)

  def ivfSearch(
      assigned: DataFrame, idCol: String, vecCol: String,
      centroids: Seq[(Long, Array[Float])], queryVec: Array[Float],
      nprobe: Int, k: Int, metric: String = "euclidean"): DataFrame = {
    val probed = probeCells(centroids, queryVec, nprobe, metric)
    assigned.where(col("cell").isin(probed: _*))
      .select(col(idCol), col("cell"),
        round(distance(col(vecCol), lit(queryVec), metric), 6).as("dist"))
      .orderBy(col("dist").asc, col(idCol).asc)
      .limit(k)
  }

  /** Driver-side distance mirror (double accumulation like the expressions). */
  private def distLocal(a: Array[Float], b: Array[Float], metric: String): Double = metric match {
    case "euclidean" =>
      math.sqrt(a.zip(b).map { case (x, y) => val d = x.toDouble - y.toDouble; d * d }.sum)
    case "manhattan" => a.zip(b).map { case (x, y) => math.abs(x.toDouble - y.toDouble) }.sum
    case "cosine" =>
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
      math.abs(1.0 - dot / (na * nb))
    case "dot" => -a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
  }
}
