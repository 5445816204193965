package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.collection._

/** Snapshot sink/source (SURVEY.md §2.1 S7/S8) driven through the full
  * Collection API: create → validated ingest → flush (parquet + meta sidecar)
  * → release → load → search. The oracle sees only the input table, so a
  * hash match proves the round trip was lossless end-to-end.
  * Distance is euclidean so stored vectors are byte-identical to the input
  * (no cosine pre-normalization) and the oracle can recompute distances. */
object PersistenceQueries {
  import Tables.tbl

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "snapshot_roundtrip" -> ((s, dir) => {
      val e = tbl(s, dir, "embeddings")
      val dim = e.select("embedding").head().getSeq[Float](0).length
      val cat = new GraftCatalog(s, Files.createTempDirectory("graft-snap").toString)
      val meta = CollectionMeta("snap", dim = dim, distance = "euclidean",
        fields = Seq(
          IndexField("id", "string", primaryKey = true),
          IndexField("label", "integer")))
      cat.createCollection(meta)
      cat.loadCollection("snap")
      cat.insert("snap", e.select(
        col("vec_id").cast("string").as("id"),
        col("label"),
        col("embedding").as("vector")))
      cat.flush("snap")
      cat.releaseCollection("snap")
      cat.loadCollection("snap")
      val qv = e.where(col("vec_id") === 0).select("embedding").head().getSeq[Float](0).toArray
      cat.search("snap", qv, topK = 10)
    })
  )

  val oracles: Map[String, String] = Map(
    "snapshot_roundtrip" ->
      """WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
        |SELECT CAST(e.vec_id AS VARCHAR) AS id, CAST(e.label AS BIGINT) AS label,
        |  ROUND(list_distance(e.embedding::DOUBLE[], q.qv::DOUBLE[]), 6) AS dist,
        |  ROUND(GREATEST(0, 100 - list_distance(e.embedding::DOUBLE[], q.qv::DOUBLE[])), 4) AS score
        |FROM embeddings e, q
        |ORDER BY dist, id LIMIT 10""".stripMargin
  )
}
