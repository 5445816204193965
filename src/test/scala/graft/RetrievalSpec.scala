package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** BM25 + MMR contracts: hand-computed BM25 on a micro corpus, MMR's
  * diversity-over-redundancy behavior on a planted pool, and shape/
  * determinism of both driver queries on the real sf tables. */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  test("bm25_topk: hand-computed single-term score on a micro corpus") {
    // 4 docs; doc 0 IS the query ("apple" — its only distinct token set).
    // tf=2 for doc 1, tf=1 for docs 0 and 2; doc 3 misses the term.
    val dir = Files.createTempDirectory("graft-bm25").toString
    Seq(
      (0L, "apple", "en", "a", 5L),
      (1L, "apple apple pear", "en", "a", 16L),
      (2L, "apple kiwi kiwi kiwi", "en", "a", 20L),
      (3L, "plum plum", "en", "a", 9L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(dir + "/documents.parquet")
    val got = graft.queries.RetrievalQueries.queries("bm25_topk")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // N=4, df(apple)=3 → idf = ln(1 + 1.5/3.5); avgdl = (1+3+4+2)/4 = 2.5
    val idf = math.log(1.0 + (4.0 - 3 + 0.5) / (3 + 0.5))
    def s(tf: Long, dl: Long): Double = {
      val raw = idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / 2.5))
      BigDecimal(raw).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(got.keySet === Set(0L, 1L, 2L))
    assert(got(0L) === s(1, 1) && got(1L) === s(2, 3) && got(2L) === s(1, 4))
    // higher tf at comparable length outranks; longer doc at equal tf is
    // penalized by the length norm
    assert(got(1L) > got(2L) && got(0L) > got(2L))
  }

  test("mmr_rerank: penalizes redundancy — picks the diverse axis over the near-dup") {
    // Geometry note: because the query vector itself sits in the pool at
    // rank 1, every candidate's max-sim starts at its sim-to-query — which
    // EQUALS its rel, so MMR only deviates from relevance order when two
    // candidates are closer to EACH OTHER than to the query. Plant exactly
    // that: vectors 1 and 2 are near-copies at ~26° from the query (mutual
    // sim 0.9996 > rel 0.9), vector 3 mirrors 1 across the query axis
    // (same rel 0.9, but sim(3,1) ≈ 0.62). Pure-relevance top-4 is
    // 0,1,2,3; MMR must demote near-dup 2 below mirror 3.
    val dir = Files.createTempDirectory("graft-mmr").toString
    Seq(
      (0L, Array(1f, 0f, 0f, 0f), 0),            // the query itself
      (1L, Array(0.9f, 0.4359f, 0f, 0f), 0),      // 26° off-axis
      (2L, Array(0.9f, 0.4349f, 0.03f, 0f), 0),   // near-dup of 1
      (3L, Array(0.9f, -0.4359f, 0f, 0f), 0),     // mirror of 1: same rel
      (4L, Array(0f, 0f, 1f, 0f), 0))             // orthogonal
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(dir + "/embeddings.parquet")
    val got = graft.queries.RetrievalQueries.queries("mmr_rerank")(spark, dir).collect()
    assert(got.length === 5)
    val order = got.map(_.getLong(1)).toSeq
    assert(order.head === 0L, "rank 1 is pure relevance = the query itself")
    assert(order(2) === 3L, s"diversity must demote the near-dup: $order")
    assert(order === Seq(0L, 1L, 3L, 2L, 4L), s"full greedy order: $order")
  }

  test("retrieval queries on sf0.001: shape, determinism, monotonic scores") {
    val bm = graft.queries.RetrievalQueries.queries("bm25_topk")(spark, sfDir).collect()
    assert(bm.length === 10)
    val scores = bm.map(_.getDouble(1)).toSeq
    assert(scores === scores.sortBy(-_), "bm25 scores descending")
    assert(scores.forall(_ > 0), "BM25+1 idf keeps scores positive")

    val mm = graft.queries.RetrievalQueries.queries("mmr_rerank")(spark, sfDir).collect()
    assert(mm.length === 5)
    assert(mm.map(_.getLong(1)).distinct.length === 5, "no repeated picks")
    assert(mm.head.getLong(1) === 0L, "rank 1 = the query vector itself")
    val ms = mm.map(_.getDouble(2)).toSeq
    // rank 1 is pure rel; each later step maximizes over a shrunk pool with
    // a grown penalty, so scores are non-increasing
    assert(ms === ms.sorted.reverse, s"MMR scores must be non-increasing: $ms")
    val mm2 = graft.queries.RetrievalQueries.queries("mmr_rerank")(spark, sfDir).collect()
    assert(mm.map(_.toSeq).toSeq === mm2.map(_.toSeq).toSeq, "deterministic")
  }
}
