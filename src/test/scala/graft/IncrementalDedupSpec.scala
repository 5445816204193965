package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.SketchExpressions

import graft.dedup.Dedup

/** Bloom-prefiltered incremental dedup: the sketch may say "maybe" too
  * often (false positives) but never "no" wrongly (false negatives) —
  * exactness must hold at ANY fpp because the anti-join backstop settles
  * every bloom-positive row. */
class IncrementalDedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val corpus = (0L until 300L)
    .map(i => (i, s"historical document number $i with stable content"))
    .toDF("doc_id", "text")

  // 40 exact re-crawls + 60 genuinely new docs
  private lazy val batch = (
    (0L until 40L).map(i => (1000L + i, s"historical document number ${i * 3} with stable content")) ++
    (0L until 60L).map(i => (2000L + i, s"fresh crawl document $i never seen before"))
  ).toDF("doc_id", "text")

  private def plainAntiJoin = batch.join(corpus.select("text"), Seq("text"), "left_anti")

  test("newAgainstCorpus equals the plain anti-join at default fpp") {
    val got = Dedup.newAgainstCorpus(batch, corpus, "text", expectedItems = 1000L)
      .select("doc_id").as[Long].collect().sorted.toSeq
    val want = plainAntiJoin.select("doc_id").as[Long].collect().sorted.toSeq
    assert(got === want)
    assert(got.length === 60)
    assert(got.forall(_ >= 2000L))
  }

  test("exactness survives a deliberately undersized, high-fpp sketch") {
    // 8 expected items for a 300-item corpus at fpp 0.5: the sketch is
    // saturated, nearly every probe is positive — the anti-join must
    // still produce the exact answer (just with less pruning).
    val got = Dedup.newAgainstCorpus(batch, corpus, "text",
        expectedItems = 8L, fpp = 0.5)
      .select("doc_id").as[Long].collect().sorted.toSeq
    val want = plainAntiJoin.select("doc_id").as[Long].collect().sorted.toSeq
    assert(got === want)
  }

  test("no false negatives: every corpus text probes bloom-positive") {
    val h = xxhash64(col("text"))
    val bloom = corpus.select(
      SketchExpressions.bloomFilterAgg(h, 1000L, 0.03).as("b")).head().getAs[Array[Byte]]("b")
    val negatives = corpus.where(!SketchExpressions.mightContain(lit(bloom), h)).count()
    assert(negatives === 0L)
  }

  test("bloom pruning is real: most genuinely-new rows skip the anti-join") {
    val h = xxhash64(col("text"))
    val bloom = corpus.select(
      SketchExpressions.bloomFilterAgg(h, 1000L, 0.03).as("b")).head().getAs[Array[Byte]]("b")
    // bloom-positive batch rows = 40 true dups + fp-sliver of the 60 new
    val maybe = batch.where(SketchExpressions.mightContain(lit(bloom), h)).count()
    assert(maybe >= 40L, s"lost true duplicates to the sketch: $maybe")
    assert(maybe <= 40L + 20L, s"fpp far above configured bound: ${maybe - 40} of 60 new rows flagged")
  }

  test("empty corpus: everything in the batch is new") {
    val empty = corpus.where(lit(false))
    val got = Dedup.newAgainstCorpus(batch, empty, "text", expectedItems = 10L)
      .count()
    assert(got === batch.count())
  }

  test("all-duplicate batch returns no rows") {
    val dupBatch = corpus.withColumn("doc_id", col("doc_id") + 5000L)
    assert(Dedup.newAgainstCorpus(dupBatch, corpus, "text", expectedItems = 1000L).count() === 0L)
  }

  test("within-batch duplicates are retained, not collapsed") {
    val twice = batch.unionByName(batch.withColumn("doc_id", col("doc_id") + 9000L))
    val got = Dedup.newAgainstCorpus(twice, corpus, "text", expectedItems = 1000L).count()
    assert(got === 120L) // 60 new texts, two carriers each
  }

  test("session bloom caps: loud oversized corpus sketch; reverse filter backs off then skips") {
    val want = plainAntiJoin.select("doc_id").as[Long].collect().sorted.toSeq
    try {
      // requested sizing past the items cap fails LOUDLY (BloomFilterAggregate
      // would silently clamp and degrade fpp)
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.maxNumItems", "50")
      val e = intercept[IllegalArgumentException] {
        Dedup.newAgainstCorpus(batch, corpus, "text", expectedItems = 1000L)
      }
      assert(e.getMessage.contains("maxNumItems"))
      spark.conf.unset("spark.sql.optimizer.runtime.bloomFilter.maxNumItems")
      // bits cap at 500: corpus sketch (60 items @ fpp .5 = 87 bits) fits,
      // the maybe-side 1e-4 target does not — fpp backs off to the floor,
      // result stays exact
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.maxNumBits", "500")
      val backedOff = Dedup.newAgainstCorpus(batch, corpus, "text",
          expectedItems = 60L, fpp = 0.5)
        .select("doc_id").as[Long].collect().sorted.toSeq
      assert(backedOff === want)
      // bits cap at 100: even fpp 0.5 can't fit the maybe set — the
      // reverse filter is SKIPPED (unpruned corpus side), still exact
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.maxNumBits", "100")
      val skipped = Dedup.newAgainstCorpus(batch, corpus, "text",
          expectedItems = 60L, fpp = 0.5)
        .select("doc_id").as[Long].collect().sorted.toSeq
      assert(skipped === want)
    } finally {
      spark.conf.unset("spark.sql.optimizer.runtime.bloomFilter.maxNumItems")
      spark.conf.unset("spark.sql.optimizer.runtime.bloomFilter.maxNumBits")
    }
  }

  test("contract errors: missing column, bad sketch parameters") {
    intercept[IllegalArgumentException] {
      Dedup.newAgainstCorpus(batch, corpus, "nope", expectedItems = 10L)
    }
    intercept[IllegalArgumentException] {
      SketchExpressions.bloomFilterAgg(col("x"), expectedItems = 0L, fpp = 0.03)
    }
    intercept[IllegalArgumentException] {
      SketchExpressions.bloomFilterAgg(col("x"), expectedItems = 10L, fpp = 1.5)
    }
  }

  // ---- incremental NEAR-dup (banded MinHash against the corpus) ----

  // near-recrawls: last token dropped (high Jaccard, invisible to the exact
  // screen); fresh docs: disjoint vocabulary (Jaccard 0 with everything)
  private lazy val nearBatch = (
    (0L until 30L).map { i =>
      val base = s"historical document number ${i * 7} with stable content"
      (3000L + i, base.split(' ').dropRight(1).mkString(" "))
    } ++
    (0L until 30L).map(i => (4000L + i, (0 until 12).map(j => s"zq${i}x$j").mkString(" ")))
  ).toDF("doc_id", "text")

  private def bruteCross(threshold: Double) = {
    val sa = nearBatch.select(col("doc_id").as("batch_id"),
      array_sort(array_distinct(Dedup.shingles("text"))).as("sa"))
    val sb = corpus.select(col("doc_id").as("corpus_id"),
      array_sort(array_distinct(Dedup.shingles("text"))).as("sb"))
    sa.crossJoin(sb)
      .select(col("batch_id"), col("corpus_id"), Dedup.jaccard(col("sa"), col("sb")).as("j"))
      .where(col("j") >= threshold)
      .select("batch_id", "corpus_id").as[(Long, Long)].collect().toSet
  }

  test("corpusNearDuplicates equals brute-force cross Jaccard (single-sig bands, both families)") {
    val want = bruteCross(0.5)
    assert(want.nonEmpty && want.forall(_._1 < 4000L), "fixture sanity: only near-recrawls match")
    for (family <- Seq("md5", "xx")) {
      val got = graft.dedup.MinHashLSH.corpusNearDuplicates(
          nearBatch, corpus, "doc_id", "text", bandSize = 1, family = family)
        .select("batch_id", "corpus_id").as[(Long, Long)].collect().toSet
      assert(got === want, s"family=$family")
    }
  }

  test("newNearAgainstCorpus returns exactly the fresh rows") {
    val got = graft.dedup.MinHashLSH.newNearAgainstCorpus(
        nearBatch, corpus, "doc_id", "text", bandSize = 1)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(got === (0L until 30L).map(4000L + _))
  }

  test("giant duplicate cluster still matches under a tight corpus-band probe cap") {
    // 80 corpus copies of one text land in the same bands; a batch recrawl
    // must match via SOME probed member even at cap 3 — any member of the
    // cluster verifies, which is exactly why the cap is sound
    val cluster = (0L until 80L).map(i => (i, "mass duplicated boilerplate page body"))
      .toDF("doc_id", "text")
    val b = Seq((9000L, "mass duplicated boilerplate page body")).toDF("doc_id", "text")
    val got = graft.dedup.MinHashLSH.corpusNearDuplicates(
      b, cluster, "doc_id", "text", bandSize = 1, maxCorpusBandProbes = 3)
    assert(got.count() >= 1)
    assert(got.agg(max("jaccard")).head().getDouble(0) === 1.0)
    assert(graft.dedup.MinHashLSH.newNearAgainstCorpus(
      b, cluster, "doc_id", "text", bandSize = 1, maxCorpusBandProbes = 3).isEmpty)
  }
}
