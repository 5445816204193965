package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ann.{Ann, Pq}
import graft.dedup.{Dedup, MinHashLSH, SimHashDedup}
import graft.functions.simhash64
import graft.multimodal.Multimodal
import graft.text.{LangId, TextAnalysis, Winnowing}

/** The LLM-training-data-pipeline operators over the `documents` /
  * `embeddings` TESTDATA tables: dedup (exact, blocked-Jaccard,
  * MinHash+LSH), fingerprinting (SimHash, md5), text quality + language ID,
  * ANN (brute-force top-k, sign-LSH pairs) and multimodal feature plumbing.
  *
  * Duplicate fixtures: the TESTDATA corpus has no exact duplicates by
  * construction, so the dedup queries union `documents` with a deterministic
  * "re-crawl" slice (same/near-same text under shifted doc_ids) — built
  * identically in the oracle SQL, so the dedup logic is exercised on real
  * duplicate groups.
  *
  * Oracle notes: the MinHash family `int64(first 15 hex digits of
  * md5(j|shingle))` and SimHash's FNV-1a are replicated bit-for-bit in
  * DuckDB (hex→int via list_reduce; FNV via HUGEINT mod-2^64 arithmetic), so
  * even the hash-driven pipelines get full rows+schema+hash checks.
  */
object PipelineQueries {
  import Tables.{tbl, embUpTo}

  private def docs(s: SparkSession, dir: String): DataFrame = tbl(s, dir, "documents")
  private def emb(s: SparkSession, dir: String): DataFrame = tbl(s, dir, "embeddings")

  private def withReplayPartitions[T](s: SparkSession, inputRows: Long)(
      body: SparkSession => T): T =
    Tables.withReplayPartitions(s, inputRows)(body)

  /** events.parquet carries a MICROSECOND `isAdjustedToUTC=false` timestamp
    * (TIMESTAMP_NTZ to Spark, naive `timestamp` to DuckDB) — the round-6
    * testdata regeneration; earlier rounds shipped int64 TIMESTAMP(NANOS)
    * behind the now-retired `nanosAsLong` session flag. The NTZ column is
    * cast to TimestampType under the UTC session (same wall instant both
    * engines see), keeping every downstream window/session/pivot shape and
    * oracle unchanged. */
  private def events(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "events").withColumn("ts", col("ts").cast("timestamp"))

  /** events with `ts` as the epoch-nanos long the range/as-of/z-order
    * arithmetic (and its DuckDB `epoch_ns` mirror) was written against —
    * reconstructed as unix_micros × 1000, exactly DuckDB's epoch_ns view
    * of the µs column. */
  private def eventsRaw(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "events")
      .withColumn("ts", unix_micros(col("ts").cast("timestamp")) * lit(1000L))

  /** documents ∪ exact re-crawl of every 3rd doc (ids shifted +10000). */
  private def dupCorpus(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select("doc_id", "text", "lang", "source")
    d.unionByName(d.where(col("doc_id") % 3 === 0)
      .withColumn("doc_id", col("doc_id") + 10000))
  }

  /** documents ∪ near-duplicate re-crawl of every 5th doc: last word
    * dropped, ids shifted +10000 — a one-shingle perturbation. */
  private def nearCorpus(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select("doc_id", "text", "lang", "source")
    val toks = split(col("text"), " ")
    d.unionByName(d.where(col("doc_id") % 5 === 0)
      .withColumn("doc_id", col("doc_id") + 10000)
      .withColumn("text", array_join(slice(toks, lit(1), size(toks) - 1), " ")))
  }

  /** documents re-shaped into multi-line pages: tokens chunked into 8-token
    * lines, plus injected boilerplate banners riding on id moduli — every
    * 7th doc opens with a newsletter banner (~72 docs at sf0.01, far over
    * any threshold), every 97th a consent banner (6 docs, just over the
    * query's minDocs=5), every 251st a footer shared by only 2 docs (under
    * threshold — MUST survive). doc 0 carries all three. */
  /** documents with an 8-token template phrase injected at a DIFFERENT
    * offset per doc — end of text for doc_id % 4 == 0, start for % 4 == 1
    * (the unaligned-repeat case line-granular boilerplate cannot see) —
    * plus an 8-token rare phrase on every 251st doc (2 docs at sf0.01,
    * under the query's minDocs=5 — MUST survive). Windows straddling the
    * injected phrase and the document body are unique per doc and never
    * reach threshold. */
  private def spanCorpus(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(col("doc_id"),
      concat(
        when(col("doc_id") % 4 === 1,
          lit("all rights reserved contact the site administrator today ")).otherwise(lit("")),
        col("text"),
        when(col("doc_id") % 4 === 0,
          lit(" all rights reserved contact the site administrator today")).otherwise(lit("")),
        when(col("doc_id") % 251 === 0,
          lit(" this rare disclaimer appears in just two documents")).otherwise(lit("")))
        .as("text"))

  private def lineCorpus(s: SparkSession, dir: String): DataFrame = {
    val body = Dedup.pageIntoLines(col("text"), 8)
    docs(s, dir).select(col("doc_id"),
      concat(
        when(col("doc_id") % 7 === 0, lit("subscribe to our newsletter\n")).otherwise(lit("")),
        when(col("doc_id") % 97 === 0, lit("cookie consent required\n")).otherwise(lit("")),
        when(col("doc_id") % 251 === 0, lit("rare footer line\n")).otherwise(lit("")),
        body).as("text"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Line-granular boilerplate removal (C4-family prep): lines appearing
    // in >= 5 distinct docs are struck from every doc, survivors
    // reassembled in order — 8-byte hash shuffles, anti-join strike,
    // never doc×doc. The 2-doc footer proves the threshold floor holds.
    "line_boilerplate" -> ((s, dir) =>
      Dedup.stripBoilerplateLines(lineCorpus(s, dir), "doc_id", "text", minDocs = 5)
        .orderBy("doc_id")),
    // Token-window repeated-span strike (ExactSubstr family): 8-token
    // windows repeated across >= 5 distinct docs are struck from every doc
    // at whatever offset they occur — the template phrase rides at the END
    // of %4==0 docs and the START of %4==1 docs and is struck from both;
    // the 2-doc rare phrase survives. 8-byte hash shuffles, semi-join
    // strike, O(tokens) row-local reassembly — never doc×doc.
    "dedup_spans" -> ((s, dir) =>
      Dedup.strikeRepeatedSpans(spanCorpus(s, dir), "doc_id", "text",
          n = 8, minDocs = 5)
        .orderBy("doc_id")),
    // Exact dedup: hash-groupBy on content — one shuffle, map-side combine.
    "dedup_exact" -> ((s, dir) =>
      Dedup.exactGroups(dupCorpus(s, dir), "doc_id", "text")
        .select("keep_id", "n_copies").orderBy("keep_id")),
    // Exact dedup applied: survivors (min-id per content) via semi-join.
    "dedup_drop_exact" -> ((s, dir) =>
      Dedup.dropExactDuplicates(dupCorpus(s, dir), "doc_id", "text")
        .groupBy("lang").agg(count(lit(1)).as("n"), sum("doc_id").as("sum_id"))
        .orderBy("lang")),
    // Incremental dedup: a "new crawl" batch (every 4th doc re-crawled
    // verbatim + every (4k+1)th doc with genuinely new content) against the
    // full corpus — bloom-negative rows skip the anti-join, bloom-positive
    // rows are settled exactly; output = the genuinely-new rows only.
    "dedup_incremental" -> ((s, dir) => {
      val corpus = docs(s, dir).select("doc_id", "text", "lang", "source")
      val batch = corpus.where(col("doc_id") % 4 === 0)
        .withColumn("doc_id", col("doc_id") + 20000)
        .unionByName(corpus.where(col("doc_id") % 4 === 1)
          .withColumn("doc_id", col("doc_id") + 30000)
          .withColumn("text", concat(col("text"), lit(" addendum"))))
      Dedup.newAgainstCorpus(batch, corpus, "text",
          expectedItems = 100000L, fpp = 0.03)
        .select("doc_id", "lang", "source").orderBy("doc_id")
    }),
    // Incremental NEAR-dup: a new crawl batch screened against the corpus
    // by banded MinHash — never batch×batch or corpus×corpus; candidates
    // are band co-occupants only, settled by exact Jaccard. The batch is
    // every 5th doc re-crawled MINUS its last token (a near-copy the exact
    // screen above cannot see) + every (5k+1)th doc with fresh
    // disjoint-vocab content. xx family + 8 single-sig bands make the LSH
    // recall-complete on this corpus (truth-set min J ≈ 0.8 ⇒ miss
    // ≤ 2.6e-6 — the dedup_minhash_xx argument), so the oracle is
    // BRUTE-FORCE TRUTH: every batch×corpus pair with exact Jaccard ≥ 0.5.
    "dedup_incremental_near" -> ((s, dir) => {
      val corpus = docs(s, dir).select("doc_id", "text")
      val toks = split(col("text"), " ")
      val batch = corpus.where(col("doc_id") % 5 === 0)
        .withColumn("doc_id", col("doc_id") + 20000)
        .withColumn("text", array_join(slice(toks, lit(1), size(toks) - 1), " "))
        .unionByName(corpus.where(col("doc_id") % 5 === 1)
          .withColumn("doc_id", col("doc_id") + 30000)
          .withColumn("text", array_join(
            transform(sequence(lit(0), lit(29)), j => concat(lit("zq"),
              substring(md5(concat(col("doc_id").cast("string"), lit(":"), j.cast("string"))), 1, 6))),
            " ")))
      MinHashLSH.corpusNearDuplicates(batch, corpus, "doc_id", "text",
          bandSize = 1, family = "xx", maxCorpusBandProbes = 1000000)
        .orderBy("batch_id", "corpus_id")
    }),
    // MinHash+LSH near-dup: shingle → 8 minhashes → 4 bands → bucket join →
    // exact-Jaccard verify. The only corpus-wide shuffles are the band
    // equi-join and the two candidate hydration joins.
    "dedup_minhash_lsh" -> ((s, dir) =>
      MinHashLSH.nearDuplicates(nearCorpus(s, dir), "doc_id", "text")
        .orderBy("id_a", "id_b")),
    // MinHash near-dup with the PRODUCTION hash family (xx: one xxhash64
    // pass per shingle + k remixes — ~3x cheaper than md5, engine-internal
    // hashes). The oracle is therefore BRUTE-FORCE TRUTH (all-pairs exact
    // Jaccard in DuckDB) instead of a hash replication: 8 single-sig bands
    // put the miss probability of a qualifying pair at (1-J)^8 <= 2.6e-6
    // (truth set's minimum J is 0.8 at sf0.01), and the exact-Jaccard
    // verify makes false positives impossible — so the LSH output equals
    // the truth set on this corpus.
    "dedup_minhash_xx" -> ((s, dir) =>
      MinHashLSH.nearDuplicates(nearCorpus(s, dir), "doc_id", "text",
          k = 8, bandSize = 1, family = "xx")
        .orderBy("id_a", "id_b")),
    // Streaming signature dedup REPLAYED against the oracle: a real 2-batch
    // file stream (originals, then near-dup re-crawls — write order pins
    // batch order) through dropSignatureDuplicates with the md5 family
    // (DuckDB replicates the signatures bit-for-bit). Batch-1 ties (the
    // base corpus has signature-colliding near-dups) are within-batch
    // nondeterministic, so batch 1 contributes only its survivor COUNT;
    // the re-crawl batch is collision-free at sf0.01, so its survivors are
    // exact rows: a re-crawl survives iff its signature is new.
    "streaming_dedup_replay" -> ((s, dir) => {
      import org.apache.spark.sql.SaveMode
      import org.apache.spark.sql.streaming.{OutputMode, Trigger}
      val tmp = graft.TempRoots.create("graft-sdr").toString
      val ckpt = graft.TempRoots.create("graft-sdr-ckpt").toString
      val base = docs(s, dir).select("doc_id", "text")
      val toks = split(col("text"), " ")
      val recrawl = base.where(col("doc_id") % 5 === 0)
        .withColumn("doc_id", col("doc_id") + 10000)
        .withColumn("text", array_join(slice(toks, lit(1), size(toks) - 1), " "))
      base.coalesce(1).write.mode(SaveMode.Overwrite).parquet(tmp + "/b1")
      recrawl.coalesce(1).write.mode(SaveMode.Overwrite).parquet(tmp + "/b2")
      val kept = withReplayPartitions(s, base.count()) { scoped =>
        val stream = scoped.readStream.schema(base.schema)
          .option("maxFilesPerTrigger", 1).parquet(tmp + "/*")
        val qn = "sdr_" + java.util.UUID.randomUUID().toString.replace("-", "")
        val q = graft.streaming.StreamingDedup
          .dropSignatureDuplicates(stream, "text", family = "md5")
          .writeStream.format("memory").queryName(qn)
          .option("checkpointLocation", ckpt)
          .outputMode(OutputMode.Append()).trigger(Trigger.AvailableNow()).start()
        q.awaitTermination(180000)
        scoped.table(qn)
      }
      kept.where(col("doc_id") >= 10000)
        .select(lit("recrawl_kept").as("src"), col("doc_id").as("val"))
        .unionByName(kept.where(col("doc_id") < 10000)
          .agg(count(lit(1)).as("val"))
          .select(lit("base_kept_count").as("src"), col("val")))
        .orderBy("src", "val")
    }),
    // Duplicate-cluster formation: connected components (min-label
    // propagation) over the MinHash near-dup pair graph — pair lists become
    // per-id cluster representatives, the actual keep/drop decision.
    "dedup_clusters" -> ((s, dir) => {
      val pairs = MinHashLSH.nearDuplicates(nearCorpus(s, dir), "doc_id", "text")
        .select("id_a", "id_b")
      Dedup.duplicateClusters(pairs).orderBy("id")
    }),
    // Blocked n-gram Jaccard: all-pairs only WITHIN (lang, source) blocks.
    // Every 7th doc is re-injected with lang = NULL (+20000 ids): missing
    // metadata must form its own block (NULL IS NOT DISTINCT FROM NULL),
    // not silently skip candidate generation — docs at % 35 == 0 carry
    // their trimmed twin into the NULL block, so real pairs live there.
    "dedup_blocked_jaccard" -> ((s, dir) => {
      val c = nearCorpus(s, dir)
      // Select each % 7 == 0 original AND its trimmed twin (twin id = d +
      // 10000), so the NULL block holds real near-dup pairs at d % 35 == 0.
      val nullBlock = c.where(
          col("doc_id") % 7 === 0 ||
            (col("doc_id") >= 10000 && (col("doc_id") - 10000) % 7 === 0))
        .withColumn("doc_id", col("doc_id") + 20000)
        .withColumn("lang", lit(null).cast("string"))
      Dedup.blockedJaccardPairs(c.unionByName(nullBlock),
          "doc_id", "text", Seq("lang", "source"), 0.5)
        .orderBy("id_a", "id_b")
    }),
    // SimHash64 fingerprints (codegen'd expression, row-local).
    "simhash_fingerprints" -> ((s, dir) =>
      docs(s, dir)
        .select(col("doc_id"), simhash64(split(col("text"), " ")).as("fingerprint"))
        .orderBy("doc_id")),
    // SimHash near-dup (the third dedup family): 4×16-bit bands — lossless
    // candidate generation for hamming ≤ 3 by pigeonhole — band equi-join,
    // exact bit_count(xor) verify. Same hot-band salt/cap as MinHash LSH.
    "dedup_simhash" -> ((s, dir) =>
      SimHashDedup.nearDuplicatePairs(dupCorpus(s, dir), "doc_id", "text")
        .orderBy("id_a", "id_b")),
    // Winnowing (MOSS) fingerprints: char-8-gram FNV hashes, window-4
    // minima, distinct — any ≥11-char shared substring guarantees a shared
    // fingerprint. Row-local projection; exploded for the full hash check.
    "winnow_fingerprints" -> ((s, dir) =>
      docs(s, dir).where(col("doc_id") < 200)
        .select(col("doc_id"),
          explode(Winnowing.fingerprints(col("text"), k = 8, w = 4)).as("fp"))
        .orderBy("doc_id", "fp")),
    // HLL++ distinct-count audit (the cardinality member of the sketch
    // family): exact distinct + approx_count_distinct on the same relation,
    // per (lang, source) group, flagged when the estimate strays past
    // 3·rsd. The production path at 100 TB is approx-only (one scan,
    // fixed-size register merges, no distinct-value shuffle); this audit is
    // the calibration run. The estimate itself is engine-specific, so the
    // oracle pins the exact counts and the REQUIRED hll_ok=true outcome —
    // an HLL regression past the bound hash-fails the row.
    "distinct_audit" -> ((s, dir) =>
      graft.operators.DistinctCount.audit(
          docs(s, dir), Seq(col("lang"), col("source")), col("text"))
        .select(col("lang"), col("source"), col("exact_distinct"), col("hll_ok"))
        .orderBy("lang", "source")),
    // Quality metrics: token counts, alpha/stopword ratios, composite
    // score, md5 content fingerprint — all single-pass row-local.
    "text_quality" -> ((s, dir) =>
      docs(s, dir).select(
        col("doc_id"),
        TextAnalysis.tokenCount(col("text")).as("n_tokens"),
        TextAnalysis.subwordCount("text").as("n_subwords"),
        round(TextAnalysis.alphaRatio(col("text")), 6).as("alpha_ratio"),
        round(TextAnalysis.stopwordRatio("text", TextAnalysis.defaultStopwords), 6)
          .as("stopword_ratio"),
        round(TextAnalysis.qualityScore("text"), 6).as("quality"),
        TextAnalysis.fingerprint(col("text")).as("fp"))
        .orderBy("doc_id")),
    // Gopher-style repetition metrics: top-bigram fraction per document.
    "text_repetition" -> ((s, dir) =>
      TextAnalysis.repetitionStats(docs(s, dir), "doc_id", "text").orderBy("doc_id")),
    // End-to-end curation pipeline — the composed shape a training-data
    // run actually executes: score quality → filter → exact-dedup the
    // survivors → per-language corpus stats. One row-local projection, one
    // content-hash shuffle (dedup), one agg shuffle; every stage is an
    // operator with its own oracle row elsewhere in this suite.
    "pipeline_curation" -> ((s, dir) => {
      val scored = dupCorpus(s, dir).select(
        col("doc_id"), col("text"), col("lang"),
        TextAnalysis.tokenCount(col("text")).as("n_tokens"),
        round(TextAnalysis.qualityScore("text"), 6).as("quality"))
      // 0.63 splits the sf corpus ~half/half (range is 0.606-0.669) and no
      // document sits exactly on the boundary — a real filter stage, not a
      // pass-through, with no rounding knife-edge
      val kept = scored.where(col("quality") >= 0.63)
      Dedup.dropExactDuplicates(kept, "doc_id", "text")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_tokens").as("sum_tokens"),
          round(avg("quality"), 6).as("avg_quality"))
        .orderBy("lang")
    }),
    // TF-IDF keyword extraction: per-doc term frequencies × corpus inverse
    // document frequency, top-3 terms per document — two keyed shuffles
    // (doc-term counts, term docfreq) + a bounded per-doc window.
    "tfidf_top_terms" -> ((s, dir) => {
      val d = docs(s, dir)
      val n = d.count()
      val tok = d.select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      val tf = tok.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
      val scored = tf.join(dfreq, "term")
        .withColumn("score", round(col("tf") * log(lit(n.toDouble) / col("df")), 6))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy(col("score").desc, col("term").asc)
      scored.where(col("doc_id") < 100)
        .withColumn("rn", row_number().over(w)).where(col("rn") <= 3)
        .select("doc_id", "term", "score", "rn")
        .orderBy("doc_id", "rn")
    }),
    // Rollup (grouping sets): per-(lang, source) corpus stats with
    // per-lang and grand totals in one pass — one shuffle, the multi-level
    // reporting shape of corpus curation dashboards.
    "corpus_rollup" -> ((s, dir) =>
      docs(s, dir)
        .rollup("lang", "source")
        .agg(count(lit(1)).as("n_docs"),
          sum(TextAnalysis.tokenCount(col("text"))).as("sum_tokens"))
        .orderBy(col("lang").asc_nulls_first, col("source").asc_nulls_first)),
    // JSON property extraction + aggregation over the events stream table —
    // the semi-structured column shape every ingest pipeline hits.
    "events_props_agg" -> ((s, dir) =>
      events(s, dir)
        .select(col("event_type"), col("value"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("k").as("sum_k"),
          round(sum("value"), 6).as("sum_value"))
        .orderBy("event_type")),
    // Language-ID confusion matrix: predicted (marker-argmax) vs labeled.
    "langid_confusion" -> ((s, dir) =>
      docs(s, dir).select(col("lang"), LangId.predict("text").as("predicted"))
        .groupBy("lang", "predicted").agg(count(lit(1)).as("n"))
        .orderBy("lang", "predicted")),
    // Exact ANN baseline: 3 query vectors broadcast over one corpus scan,
    // per-query bounded window rank.
    "ann_brute_topk" -> ((s, dir) => {
      val e = emb(s, dir)
      val qs = e.where(col("vec_id") < 3)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      Ann.bruteForceTopK(e, qs, k = 5, "vec_id", "embedding", "qid", "qvec", "cosine")
    }),
    // Cross-source contamination matrix: winnow fingerprints shared
    // between source pairs — the syndication/mirror map of a crawl.
    // Distinct (source, fp) projection then a fingerprint equi-join
    // (never doc×doc); at 100 TB a boilerplate-hot fp contributes at most
    // |sources|² pair rows, bounded by the source count, not the corpus.
    "source_overlap" -> ((s, dir) => {
      val sf = docs(s, dir)
        .select(col("source"), explode(Winnowing.fingerprints(col("text"))).as("fp"))
        .distinct()
      sf.as("a").join(sf.as("b"),
          col("a.fp") === col("b.fp") && col("a.source") < col("b.source"))
        .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
        .agg(count(lit(1)).as("shared_fps"))
        .orderBy("source_a", "source_b")
    }),
    // JL random projection: 64 → 16 dims through a deterministic
    // md5-Rademacher matrix (a plan constant), then top-5 cosine in the
    // PROJECTED space — the cheap candidate-generation rung of the ANN
    // ladder. Every fold is left-to-right, so the oracle matches the
    // doubles bit-for-bit, not just at the rounding digit.
    "rp_topk" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val p = graft.ann.RandomProjection.project(emb(s, dir), "embedding", 64, 16)
        .select(col("vec_id"), col("projected"))
      val q = p.where(col("vec_id") < 3)
        .select(col("vec_id").as("qid"), col("projected").as("qv"))
      def dot(a: Column, b: Column) =
        aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
      val scored = p.crossJoin(broadcast(q)).select(col("qid"), col("vec_id"),
        round(lit(1.0) - dot(col("projected"), col("qv")) /
          (sqrt(dot(col("projected"), col("projected"))) * sqrt(dot(col("qv"), col("qv")))), 6)
          .as("dist"))
      val w = Window.partitionBy(col("qid")).orderBy(col("dist").asc, col("vec_id").asc)
      scored.withColumn("rn", row_number().over(w)).where(col("rn") <= 5)
        .drop("rn").orderBy("qid", "dist", "vec_id")
    }),
    // Sign-LSH near-neighbor pairs: 2 hyperplanes → 4 buckets → equi-join +
    // exact verify (the corpus-scale alternative to all-pairs).
    "ann_lsh_pairs" -> ((s, dir) => {
      val e = emb(s, dir)
      val em = embUpTo(e, 1) // both hyperplanes in one job (r14, guide §1.2)
      val planes = (0 to 1).map(i => em(i.toLong))
      Ann.signLshPairs(e, "vec_id", "embedding", planes, threshold = 0.4)
    }),
    // Embedding-cosine near-dup as a full dedup family: sign-LSH bucketed
    // candidate pairs (never all-pairs) → exact cosine verify → connected
    // components → per-id cluster representatives. The embedding-space
    // analog of dedup_clusters.
    "dedup_embedding" -> ((s, dir) => {
      val e = emb(s, dir)
      val em = embUpTo(e, 1)
      val planes = (0 to 1).map(i => em(i.toLong))
      val pairs = Ann.signLshPairs(e, "vec_id", "embedding", planes, threshold = 0.4)
        .select("id_a", "id_b")
      Dedup.duplicateClusters(pairs).orderBy("id")
    }),
    // Incremental SEMANTIC screen — the embedding member of the
    // batch-vs-corpus family (bloom = exact content, banded MinHash =
    // lexical): sign-LSH buckets both sides, joins bucket co-occupants
    // only, verifies by exact cosine. Batch = exact re-embeds (vec_id%9==0,
    // sim 1.0) + reversed embeddings (vec_id%9==1 — a deterministic
    // "different content" vector both engines can construct). The oracle
    // replicates the bucketing, join, and verify bit-for-bit.
    "dedup_semantic_incremental" -> ((s, dir) => {
      val e = emb(s, dir)
      val em = embUpTo(e, 1)
      val planes = (0 to 1).map(i => em(i.toLong))
      val batch = e.where(col("vec_id") % 9 === 0)
        .select((col("vec_id") + 90000).as("vec_id"), col("embedding"))
        .unionByName(e.where(col("vec_id") % 9 === 1)
          .select((col("vec_id") + 95000).as("vec_id"), reverse(col("embedding")).as("embedding")))
      Ann.signLshAgainstCorpus(batch, e, "vec_id", "embedding", planes,
          threshold = 0.4, maxCorpusBucketProbes = 1000000)
        .orderBy("batch_id", "corpus_id")
    }),
    // IVF cell-probed search: deterministic centroids (first 8 rows),
    // broadcast argmin assignment, probe the 3 nearest cells, exact top-k
    // inside — the partition-prunable scale path for S4.
    "ivf_search" -> ((s, dir) => {
      val e = emb(s, dir)
      val em = embUpTo(e, 7) // 8 seed centroids + the query vector, ONE job
      val cents = (0 until 8).map(i => (i.toLong, em(i.toLong)))
      val assigned = Ann.ivfAssign(e, "vec_id", "embedding", cents, "euclidean")
      val q = em(0L)
      Ann.ivfSearch(assigned, "vec_id", "embedding", cents, q, nprobe = 3, k = 10, "euclidean")
    }),
    // Batch k-NN join: every query ROW (not one fixed vector) gets its
    // top-5 corpus neighbors, candidates from the query's 3 nearest of 8
    // deterministic cells — probe cells via one row-local top_cells kernel
    // call, ONE cell equi-join, exact distances only inside probed cells.
    // The retrieval-augmentation / cross-corpus-dedup primitive.
    "knn_join" -> ((s, dir) => {
      val e = emb(s, dir)
      val em = embUpTo(e, 7)
      val cents = (0 until 8).map(i => (i.toLong, em(i.toLong)))
      val assigned = Ann.ivfAssign(e, "vec_id", "embedding", cents, "euclidean")
      val q = e.where(col("vec_id") % 101 === 0)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      Ann.knnJoin(assigned, q, k = 5, "vec_id", "embedding", "qid", "qvec",
        cents, nprobe = 3, "euclidean")
    }),
    // Index-quality audit: recall@10 of the pruned IVF probe (nprobe 2/8)
    // against exact brute force, one row per query — the evaluation
    // operator an index rollout needs before trusting an approximate
    // serving path. Brute force IS knnJoin at nprobe = |cells| (spec-pinned
    // degeneration), so both arms share one audited code path; at 100 TB
    // the query set is a sample, and the whole audit is two bounded
    // cell-joins plus one (qid, id) equi-join — never corpus×corpus.
    "ann_recall" -> ((s, dir) => {
      val e = emb(s, dir)
      val em = embUpTo(e, 7)
      val cents = (0 until 8).map(i => (i.toLong, em(i.toLong)))
      val assigned = Ann.ivfAssign(e, "vec_id", "embedding", cents, "euclidean")
      val q = e.where(col("vec_id") % 101 === 0)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      def topk(nprobe: Int) =
        Ann.knnJoin(assigned, q, k = 10, "vec_id", "embedding", "qid", "qvec",
          cents, nprobe, "euclidean").select(col("qid"), col("vec_id"))
      topk(nprobe = 8)
        .join(topk(nprobe = 2).withColumn("__hit", lit(1)), Seq("qid", "vec_id"), "left")
        .groupBy(col("qid"))
        .agg(count(col("__hit")).as("hits"),
          (count(col("__hit")) / lit(10.0)).as("recall"))
        .orderBy("qid")
    }),
    // Product-quantization ADC search: 64-d vectors → 4 subspaces × 16
    // codewords → 4-byte codes (64× compression); top-10 by asymmetric
    // distance over a pure code scan. Deterministic seed codebook (the 16
    // id-smallest rows, sliced) = the oracle-checkable path; Lloyd-trained
    // codebooks are PqSpec's territory.
    "pq_adc_search" -> ((s, dir) => {
      val e = emb(s, dir)
      val cb = Pq.seedCodebook(e, "vec_id", "embedding", m = 4, ksub = 16)
      val q = e.where(col("vec_id") === 0).select("embedding").head().getSeq[Float](0).toArray
      Pq.adcSearch(Pq.encode(e, "embedding", cb), "vec_id", "pq_code", cb, q, k = 10)
    }),
    // As-of join: each event aligned to the newest PRIOR snapshot of its
    // user (snapshots = every 7th event) — the feature-store alignment
    // primitive. One key shuffle + window, never a range theta-join.
    "events_asof_join" -> ((s, dir) => {
      val ev = events(s, dir).select("user_id", "ts", "event_type", "value")
      val snaps = events(s, dir).where(col("event_id") % 7 === 0)
        .groupBy("user_id", "ts").agg(max("value").as("snap_value"))
      graft.operators.AsOfJoin.join(ev, snaps, "user_id", "ts")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          count("snap_value").as("n_matched"),
          round(sum("snap_value"), 6).as("sum_snap"))
        .orderBy("event_type")
    }),
    // Range (interval-containment) join: events paired with every same-user
    // 10-minute window opened by each 11th event — binned equi-join on
    // (user, time-bucket) + residual containment, never a theta-join. Raw
    // nanos longs on both sides (DuckDB: epoch_ns).
    "events_range_join" -> ((s, dir) => {
      // epoch-micros longs on both sides (ts div 1000 == DuckDB's µs
      // TIMESTAMP view of the nanos column — sub-µs digits truncate
      // identically; see the events() scaladoc)
      val raw = eventsRaw(s, dir).withColumn("t", expr("ts div 1000"))
      val p = raw.select(col("user_id"), col("event_type"), col("value"), col("t"))
      val iv = raw.where(col("event_id") % 11 === 0)
        .select(col("user_id"), col("t").as("win_start"),
          (col("t") + lit(600000000L)).as("win_end"))
      graft.operators.RangeJoin.join(p, iv, "user_id", "t", "win_start", "win_end",
          bucketWidth = 300000000L)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_pairs"), round(sum("value"), 6).as("sum_value"))
        .orderBy("event_type")
    }),
    // Pivot (§2.4 breadth): hour-of-day × event-type counts — conditional
    // aggregation with an explicit value list (one shuffle, no second pass
    // for value discovery); missing combos normalized to 0 like the
    // FILTER-count formulation.
    "events_pivot" -> ((s, dir) => {
      val types = Seq("click", "error", "purchase", "signup", "view")
      events(s, dir).select(hour(col("ts")).as("hr"), col("event_type"))
        .groupBy("hr").pivot("event_type", types).count()
        .select(col("hr") +: types.map(t => coalesce(col(t), lit(0L)).as(t)): _*)
        .orderBy("hr")
    }),
    // Exact interpolated percentiles per group (sort-based `percentile`,
    // the continuous-quantile definition DuckDB's quantile_cont shares).
    "events_percentiles" -> ((s, dir) =>
      events(s, dir).groupBy("event_type").agg(
          round(expr("percentile(value, 0.25)"), 6).as("p25"),
          round(expr("percentile(value, 0.5)"), 6).as("p50"),
          round(expr("percentile(value, 0.75)"), 6).as("p75"))
        .orderBy("event_type")),
    // Z-order (Morton) clustering audit: the exact-integer z-value over
    // (user_id, epoch-ns ts), aggregated per coarse z-cell — every cell's
    // min/max box shows the locality a z-clustered parquet layout gives
    // each row group on BOTH dimensions. Pure bit arithmetic, replicated
    // bit-exactly by the oracle; ZOrderSpec proves the row-group-skipping
    // payoff end to end.
    "zorder_locality" -> ((s, dir) => {
      // micros on both sides: DuckDB truncates the parquet ns timestamps
      val e = eventsRaw(s, dir).select(col("event_id"), col("user_id"),
        expr("ts div 1000").as("tsu"))
      val shifts = graft.operators.ZOrder.fitShifts(e, Seq("user_id", "tsu"), bits = 8)
      e.withColumn("z", graft.operators.ZOrder.zvalue(Seq("user_id", "tsu"), shifts, bits = 8))
        .groupBy(shiftright(col("z"), 10).as("z_cell"))
        .agg(count(lit(1)).as("n"),
          min("user_id").as("u_min"), max("user_id").as("u_max"),
          min("tsu").as("t_min"), max("tsu").as("t_max"))
        .orderBy("z_cell")
    }),
    // Exact heavy hitters over corpus-cardinality keys (3-word shingles),
    // CMS-candidate-pruned: the sketch pass drops rows whose key can't
    // reach the threshold BEFORE the groupBy shuffle; the exact count on
    // the surviving sliver makes the output bit-identical to the plain
    // groupBy-HAVING (which is what the oracle runs). RELATIVE support
    // (threshold = ⌈φ·N⌉, eps = φ/2) so slack = threshold/2 and the
    // pruning holds at every sf — the scale-stable parameterization the
    // operator documents.
    "heavy_hitters" -> ((s, dir) => {
      val phi = 2e-4
      val sh = dupCorpus(s, dir).select(explode(Dedup.shingles("text")).as("k"))
      val n = sh.count()
      graft.operators.HeavyHitters.frequentKeys(sh, col("k"),
          threshold = math.ceil(phi * n).toLong, eps = phi / 2)
        .orderBy(desc("n"), col("key"))
    }),
    // Bucketed co-located join: both tables hash-bucketed (and per-bucket
    // sorted) on the join key at WRITE time, so the sort-merge join plans
    // with zero Exchange — the pay-the-shuffle-once layout for keys every
    // downstream query joins on. The oracle is the plain join: the layout
    // must be invisible in the results. BucketingSpec pins the plan
    // properties (no Exchange, SelectedBucketsCount pruning).
    "bucketed_join" -> ((s, dir) => {
      val base = graft.TempRoots.create("graft-bkt").toString
      graft.operators.Bucketing.writeBucketed(
        docs(s, dir).select("doc_id", "lang", "source"),
        base + "/docs", "graft_bkt_docs", "doc_id", buckets = 8)
      graft.operators.Bucketing.writeBucketed(
        emb(s, dir).select("vec_id", "label"),
        base + "/emb", "graft_bkt_emb", "vec_id", buckets = 8)
      graft.operators.Bucketing.colocatedJoin(s,
          "graft_bkt_docs", "graft_bkt_emb", "doc_id", "vec_id")
        .select("doc_id", "lang", "source", "label").orderBy("doc_id")
    }),
    // Event-time tumbling-window aggregation over the events table
    // (§2.9 extension; same plan batch or streaming, one shuffle on
    // (window, type) with map-side partial aggregation).
    "events_windowed_agg" -> ((s, dir) =>
      graft.streaming.EventStream.windowedAgg(events(s, dir), "1 hour")
        .orderBy("window_start", "event_type")),
    // Watermarked windowed aggregation REPLAYED as a real 3-batch file
    // stream (the streaming_dedup_replay discipline): batches split at
    // Jan 10 / Jan 20; the LAST batch carries a poisoned copy of the
    // earliest event (value 999999) — a late arrival whose window was
    // EVICTED at the end of batch 2 (watermark = max(batch1) − 1 h passed
    // Jan 1 long before), so the row MUST be dropped; any leak shifts a
    // window sum and the oracle catches it. Three batches are the minimum
    // that proves the drop: eviction happens at batch END, so a late row
    // arriving in the same batch that evicts its window still merges —
    // measured, not assumed (PLANS.md round-6 cont. 5). Append mode emits
    // exactly the windows the final watermark (max ts − 1 h) closed; cuts
    // and delay keep every window end off the watermark boundaries.
    "streaming_window_replay" -> ((s, dir) => {
      import org.apache.spark.sql.SaveMode
      import org.apache.spark.sql.streaming.{OutputMode, Trigger}
      val tmp = graft.TempRoots.create("graft-swr").toString
      val ckpt = graft.TempRoots.create("graft-swr-ckpt").toString
      val ev = events(s, dir).select("event_id", "user_id", "event_type", "value", "ts")
      val cut1 = lit("2024-01-10 00:00:00").cast("timestamp")
      val cut2 = lit("2024-01-20 00:00:00").cast("timestamp")
      val late = ev.orderBy("ts", "event_id").limit(1)
        .withColumn("value", lit(999999.0)).withColumn("event_id", lit(-1L))
      ev.where(col("ts") < cut1).coalesce(1)
        .write.mode(SaveMode.Overwrite).parquet(tmp + "/b1")
      ev.where(col("ts") >= cut1 && col("ts") < cut2).coalesce(1)
        .write.mode(SaveMode.Overwrite).parquet(tmp + "/b2")
      ev.where(col("ts") >= cut2).unionByName(late).coalesce(1)
        .write.mode(SaveMode.Overwrite).parquet(tmp + "/b3")
      withReplayPartitions(s, ev.count()) { scoped =>
        val stream = scoped.readStream.schema(ev.schema)
          .option("maxFilesPerTrigger", 1).parquet(tmp + "/*")
        val qn = "swr_" + java.util.UUID.randomUUID().toString.replace("-", "")
        val q = graft.streaming.EventStream.windowedAgg(stream, "1 hour",
            watermarkDelay = "1 hour")
          .writeStream.format("memory").queryName(qn)
          .option("checkpointLocation", ckpt)
          .outputMode(OutputMode.Append()).trigger(Trigger.AvailableNow()).start()
        q.awaitTermination(180000)
        scoped.table(qn).orderBy("window_start", "event_type")
      }
    }),
    // Gap-based sessionization (session_window): per-user session/event
    // counts; DuckDB replicates via the lag-island formulation.
    "events_sessionize" -> ((s, dir) =>
      graft.streaming.EventStream.sessionStats(events(s, dir), "30 minutes")
        .orderBy("user_id")),
    // Multimodal plumbing: opaque binary payload + metadata, batched
    // per-partition feature extraction (unnormalized histogram variant so
    // the stub decode is engine-exact; see Multimodal.fakeDecode).
    "multimodal_features" -> ((s, dir) => {
      val pm = Multimodal.payloadMeta(Multimodal.withPayload(docs(s, dir), "text"))
      val feats = Multimodal.extractFeatures(pm, "doc_id", "payload", dim = 8, normalize = false)
      val fCols = (0 until 8).map(i => element_at(col("features"), i + 1).cast("long").as(s"f$i"))
      pm.select("doc_id", "n_bytes", "head_byte").join(feats, "doc_id")
        .select(col("doc_id") +: col("n_bytes") +: col("head_byte") +: fCols: _*)
        .orderBy("doc_id")
    }),
    // REAL image codec path: synthetic PNGs (pixel formula seeded by
    // doc_id) encoded and decoded through javax.imageio inside the
    // per-partition decoder seam; the oracle recomputes the pixel stats
    // analytically from the same formula — PNG is lossless, so a hash match
    // proves the actual encode→decode→featurize chain is exact.
    "image_features" -> ((s, dir) => {
      val d = docs(s, dir).select("doc_id").where(col("doc_id") < 200)
      val imgs = Multimodal.withSyntheticImages(d, "doc_id")
      val feats = Multimodal.extractWith(imgs, "doc_id", "payload",
        new Multimodal.ImageStatsDecoder)
      feats.where(col("decode_ok"))
        .select(col("doc_id"),
          element_at(col("features"), 1).cast("long").as("width"),
          element_at(col("features"), 2).cast("long").as("height"),
          round(element_at(col("features"), 3), 6).as("mean_r"),
          round(element_at(col("features"), 4), 6).as("mean_g"),
          round(element_at(col("features"), 5), 6).as("mean_b"))
        .orderBy("doc_id")
    }),
    // REAL audio codec path (javax.sound.sampled WAV/PCM): synthetic
    // formula-seeded PCM through the actual encode→decode chain; the
    // oracle recomputes amplitude stats analytically — lossless PCM makes
    // a hash match prove the codec chain exact, like image_features.
    "audio_features" -> ((s, dir) => {
      val d = docs(s, dir).select("doc_id").where(col("doc_id") < 200)
      val wavs = Multimodal.withSyntheticAudio(d, "doc_id")
      val feats = Multimodal.extractWith(wavs, "doc_id", "payload",
        new Multimodal.AudioStatsDecoder)
      feats.where(col("decode_ok"))
        .select(col("doc_id"),
          element_at(col("features"), 1).cast("long").as("n_samples"),
          round(element_at(col("features"), 3), 6).as("mean_abs"),
          round(element_at(col("features"), 4), 6).as("rms"),
          element_at(col("features"), 5).cast("long").as("zero_crossings"))
        .orderBy("doc_id")
    }),
    // REAL video container path: synthetic uncompressed-DIB AVIs (pixel
    // formula seeded by doc_id and frame index) through the actual RIFF
    // parse → frame-sample (every 2nd frame) → channel-stat chain; DIB is
    // lossless, so the oracle recomputes the sampled-frame means
    // analytically from the same formula, like image_features.
    "video_features" -> ((s, dir) => {
      val d = docs(s, dir).select("doc_id").where(col("doc_id") < 150)
      val avis = Multimodal.withSyntheticVideo(d, "doc_id")
      val feats = Multimodal.extractWith(avis, "doc_id", "payload",
        new Multimodal.VideoStatsDecoder(sampleStep = 2))
      feats.where(col("decode_ok"))
        .select(col("doc_id"),
          element_at(col("features"), 1).cast("long").as("n_frames"),
          element_at(col("features"), 2).cast("long").as("width"),
          element_at(col("features"), 3).cast("long").as("height"),
          element_at(col("features"), 5).cast("long").as("n_sampled"),
          round(element_at(col("features"), 6), 6).as("mean_r"),
          round(element_at(col("features"), 7), 6).as("mean_g"),
          round(element_at(col("features"), 8), 6).as("mean_b"))
        .orderBy("doc_id")
    }),
    // Deterministic dataset split: train/val/test membership is a pure
    // function of the id hash (no RNG, no partition sensitivity) — the
    // reproducible-holdout discipline; zero shuffles beyond the final agg.
    "dataset_split" -> ((s, dir) =>
      graft.operators.Sampling.assignSplit(docs(s, dir), "doc_id",
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .groupBy("split")
        .agg(count(lit(1)).as("n"), sum("doc_id").as("sum_id"),
          sum(TextAnalysis.tokenCount(col("text")).cast("long")).as("sum_tokens"))
        .orderBy("split")),
    // Token-window chunking with overlap — context packing / retrieval
    // units; row-local + explode, output rows are the only cost.
    "doc_chunks" -> ((s, dir) =>
      graft.text.Chunking.chunks(docs(s, dir).where(col("doc_id") < 200),
          "doc_id", "text", chunkTokens = 20, overlapTokens = 5)
        .orderBy("doc_id", "chunk_id")),
    // Sequence packing (GPT-style concat-and-split): every doc's first
    // token is placed in a context window of a shard-local packed stream —
    // one window shuffle partitioned BY SHARD (a global order would
    // serialize; shard streams pack independently at any scale).
    "pack_sequences" -> ((s, dir) => {
      val withTokens = docs(s, dir).select(col("doc_id"),
        TextAnalysis.tokenCount(col("text")).as("n_tokens"))
      graft.operators.Packing.packSequences(withTokens, "doc_id", "n_tokens",
          contextTokens = 512, shards = 8)
        .orderBy("doc_id")
    }),
    // packing-efficiency audit: docs started + token mass per (shard,
    // context window) — one agg shuffle over the packed assignment
    "pack_stats" -> ((s, dir) => {
      val withTokens = docs(s, dir).select(col("doc_id"),
        TextAnalysis.tokenCount(col("text")).as("n_tokens"))
      graft.operators.Packing.packStats(
          graft.operators.Packing.packSequences(withTokens, "doc_id", "n_tokens",
            contextTokens = 512, shards = 8), "n_tokens")
        .withColumn("n_tokens", col("n_tokens").cast("long"))
        .orderBy("shard", "seq_id")
    }),
    // Train/eval decontamination: eval docs sharing winnow fingerprints
    // with the train corpus are flagged (benchmark-leakage check). The
    // eval set mixes re-crawled train docs (last word dropped — still
    // substring-overlapping, so winnowing MUST catch them) with unseen
    // docs; the overlap is a fingerprint equi-join, never doc×doc.
    "decontaminate_eval" -> ((s, dir) => {
      val base = docs(s, dir).select("doc_id", "text")
      val train = base.where(col("doc_id") < 200)
      val toks = split(col("text"), " ")
      val leaked = train.where(col("doc_id") % 5 === 0)
        .withColumn("doc_id", col("doc_id") + 10000)
        .withColumn("text", array_join(slice(toks, lit(1), size(toks) - 1), " "))
      val fresh = base.where(col("doc_id") >= 200 && col("doc_id") < 250)
      val idx = graft.dedup.Decontaminate.fingerprintIndex(train, "text")
      graft.dedup.Decontaminate.overlap(leaked.unionByName(fresh), "doc_id", "text", idx)
        .orderBy("doc_id")
    }),
    // PII scrub audit: structured PII (emails, phones, IPv4, SSN shapes) is
    // injected by an id-seeded formula (the corpus is synthetic word soup),
    // detected and redacted by the codegen'd regex detectors, and audited
    // per source. Row-local expressions + one agg shuffle; the DuckDB
    // oracle rebuilds the same augmented text and re-runs the same RE2
    // patterns, so match semantics are pinned engine-to-engine.
    "pii_scrub" -> ((s, dir) => {
      val aug = withInjectedPii(docs(s, dir))
      val red = graft.text.Pii.redact(col("text"))
      aug.groupBy("source")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(graft.text.Pii.hasPii(col("text")).cast("long")).as("docs_with_pii"),
          sum(graft.text.Pii.countMatches(col("text"), "email").cast("long")).as("emails"),
          sum(graft.text.Pii.countMatches(col("text"), "phone").cast("long")).as("phones"),
          sum(graft.text.Pii.countMatches(col("text"), "ipv4").cast("long")).as("ipv4s"),
          sum(graft.text.Pii.countMatches(col("text"), "ssn").cast("long")).as("ssns"),
          sum((length(col("text")) - length(red)).cast("long")).as("chars_redacted"))
        .orderBy("source")
    }),
    // End-to-end training-data export: the whole prep pipeline composed —
    // dup-injected corpus → quality filter → exact dedup → stratified
    // language mix → GPT-style sequence packing → per-shard export stats.
    // Three shuffles total (dedup group, pack window, final agg); every
    // stage is an already-audited operator, and every stage's selectivity
    // shows up in the packed token mass, so a regression anywhere in the
    // chain moves this oracle.
    "training_export" -> ((s, dir) => {
      val scored = dupCorpus(s, dir).select(
        col("doc_id"), col("text"), col("lang"),
        TextAnalysis.tokenCount(col("text")).as("n_tokens"),
        round(TextAnalysis.qualityScore("text"), 6).as("quality"))
      val kept = scored.where(col("quality") >= 0.63)
      val deduped = Dedup.dropExactDuplicates(kept, "doc_id", "text")
      val mixed = graft.operators.Sampling.stratifiedSample(deduped, "doc_id", "lang",
        Seq("en" -> 0.35, "es" -> 0.6, "zh" -> 0.8), defaultRate = 1.0)
      graft.operators.Packing.packSequences(
          mixed.select(col("doc_id"), col("n_tokens").cast("long").as("n_tokens")),
          "doc_id", "n_tokens", contextTokens = 512, shards = 8)
        .groupBy("shard")
        .agg(count(lit(1)).as("n_docs"), countDistinct("seq_id").as("n_windows"),
          sum("n_tokens").as("n_tokens"))
        .orderBy("shard")
    }),
    // Bigram-LM quality scoring (the CCNet/KenLM discipline): model
    // trained on the first half of the corpus (capped at its 400 most
    // frequent bigrams — the cap binds: 912 distinct), every doc scored
    // by average bigram log-likelihood. Distributed top-K model build +
    // broadcast-join scoring; no content shuffle of the corpus.
    "lm_perplexity" -> ((s, dir) => {
      val d = docs(s, dir)
      val model = graft.text.NgramLm.train(
        d.where(col("doc_id") < 250), "text", maxBigrams = 400)
      graft.text.NgramLm.score(d, "doc_id", "text", model)
        .withColumn("avg_logp", round(col("avg_logp"), 6))
        .orderBy("doc_id")
    }),
    // Per-source cap: no single domain exceeds 15 docs — a deterministic
    // hash-ordered prefix per stratum (the prefix IS a uniform sample of
    // the stratum). One stratum-partitioned window shuffle.
    "source_cap" -> ((s, dir) =>
      graft.operators.Sampling.capPerStratum(docs(s, dir), "doc_id", "source", maxRows = 15)
        .groupBy("source")
        .agg(count(lit(1)).as("n"), sum("doc_id").as("sum_id"))
        .orderBy("source")),
    // Corpus mixing: per-language deterministic down-sampling (dominant
    // language kept at 35%, mid strata at 60/80%, rare strata in full) —
    // the data-mixing step of corpus prep. Membership is a pure id-hash
    // function: zero shuffles before the audit agg, reproducible at any
    // partitioning.
    "corpus_mix" -> ((s, dir) =>
      graft.operators.Sampling.stratifiedSample(docs(s, dir), "doc_id", "lang",
          Seq("en" -> 0.35, "es" -> 0.6, "zh" -> 0.8), defaultRate = 1.0)
        .groupBy("lang")
        .agg(count(lit(1)).as("n"), sum("doc_id").as("sum_id"),
          sum(TextAnalysis.tokenCount(col("text")).cast("long")).as("sum_tokens"))
        .orderBy("lang")),
    // Ingest-side text canonicalization: NFC + control strip + whitespace
    // collapse + trim as ONE codegen'd row-local kernel — zero shuffles;
    // the oracle recomputes the identical pipeline from DuckDB's own
    // nfc_normalize/regexp_replace (UAX#15 makes NFC engine-independent).
    "text_normalize" -> ((s, dir) =>
      docs(s, dir).select(
          col("doc_id"),
          graft.functions.normalize_text(col("text")).as("norm"),
          length(col("text")).cast("long").as("len_raw"),
          length(graft.functions.normalize_text(col("text"))).cast("long").as("len_norm"))
        .orderBy("doc_id")),
    // Fuzzy (edit-distance ≤ 1) title self-join via lossless
    // deletion-neighborhood blocking — the oracle is the brute-force
    // all-pairs truth, so the blocked path must find EVERY pair.
    "fuzzy_pairs" -> ((s, dir) =>
      graft.operators.FuzzyJoin.editPairs1(
          docs(s, dir).select(col("doc_id"), substring(col("text"), 1, 30).as("title")),
          "doc_id", "title")
        .orderBy("id_a", "id_b")),
    // Threshold-2 fuzzy self-join (r9 verdict #6 — real entity resolution
    // hits t=2 immediately): order-2 deletion neighborhoods (≤ 466
    // variants per 30-char key), one equi-join, exact levenshtein verify.
    // The oracle is the brute-force all-pairs distance — a hash match
    // proves the D2 blocking lost NO pair at t=2.
    "fuzzy_pairs_t2" -> ((s, dir) =>
      graft.operators.FuzzyJoin.editPairs2(
          docs(s, dir).select(col("doc_id"), substring(col("text"), 1, 30).as("title")),
          "doc_id", "title")
        .orderBy("id_a", "id_b"))
  )

  /** Id-seeded PII injection: a deterministic subset of docs gets an email
    * / phone / IPv4 / SSN-shaped suffix appended (formula mirrored in the
    * DuckDB oracle — same discipline as the media oracles' pixel/PCM
    * formulas). */
  private def withInjectedPii(df: DataFrame): DataFrame = {
    val id = col("doc_id")
    val t0 = col("text")
    val withEmail = when(id % 7 === 0,
      concat(t0, lit(" contact u"), id, lit("@ex"), id % 13, lit(".com"))).otherwise(t0)
    val withPhone = when(id % 11 === 0,
      concat(withEmail, lit(" call "), id % 900 + 100, lit("-"), (id * 3) % 900 + 100,
        lit("-"), id % 9000 + 1000)).otherwise(withEmail)
    val withIp = when(id % 5 === 0,
      concat(withPhone, lit(" from 10."), id % 256, lit("."), (id * 7) % 256,
        lit("."), (id * 13) % 256)).otherwise(withPhone)
    val withSsn = when(id % 13 === 0,
      concat(withIp, lit(" ssn "), id % 900 + 100, lit("-"), id % 90 + 10,
        lit("-"), (id * 7) % 9000 + 1000)).otherwise(withIp)
    df.withColumn("text", withSsn)
  }

  // ---- DuckDB oracle fragments ----

  /** int64(first 15 hex digits of md5(`j` || '|' || `s`)) — matches Spark's
    * conv(substr(md5(..),1,15),16,10) exactly (60 bits, no overflow). */
  private def h15(j: String, s: String): String =
    s"""list_reduce(list_transform(string_split_regex(substr(md5(concat(CAST($j AS VARCHAR), '|', $s)), 1, 15), ''),
       | c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)), (acc, v) -> acc * 16 + v)""".stripMargin

  /** The winnowing sketch (k=8, w=4) of `src(doc_id, text)` as CTEs
    * `<p>g/<p>h/<p>w/<p>fp`, ending in `<p>fp(doc_id, fp)` — the same
    * formulation the winnow_fingerprints oracle pins bit-exactly. */
  private def winnowCtes(p: String, src: String): String =
    s"""${p}g AS (SELECT doc_id, CASE WHEN length(text) >= 8
       |    THEN list_transform(range(0, length(text) - 7), i -> substr(text, i + 1, 8))
       |    ELSE [text] END AS grams FROM $src),
       |${p}h AS (SELECT doc_id, list_transform(list_transform(grams, t -> $fnvSql), hv ->
       |    CAST(CASE WHEN hv >= CAST('9223372036854775808' AS HUGEINT)
       |      THEN hv - CAST('18446744073709551616' AS HUGEINT) ELSE hv END AS BIGINT)) AS hs
       |  FROM ${p}g),
       |${p}w AS (SELECT doc_id, CASE WHEN len(hs) >= 4
       |    THEN list_transform(range(0, len(hs) - 3),
       |      j -> list_min(list_transform(range(0, 4), q -> hs[j + q + 1])))
       |    ELSE [list_min(hs)] END AS wins FROM ${p}h),
       |${p}fp AS (SELECT doc_id, unnest(list_distinct(wins)) AS fp FROM ${p}w)""".stripMargin

  /** 3-word shingles of column `t` (whole text if < 3 tokens). */
  private def shingleSql(t: String): String =
    s"""CASE WHEN len(string_split($t, ' ')) >= 3 THEN
       | list_transform(range(0, len(string_split($t, ' ')) - 2),
       |  i -> concat_ws(' ', string_split($t, ' ')[i+1], string_split($t, ' ')[i+2], string_split($t, ' ')[i+3]))
       |ELSE [$t] END""".stripMargin

  private def jaccardSql(a: String, b: String): String =
    s"""ROUND(len(list_distinct(list_intersect($a, $b))) * 1.0 /
       | (len(list_distinct($a)) + len(list_distinct($b))
       |  - len(list_distinct(list_intersect($a, $b)))), 6)""".stripMargin

  private val dupCorpusSql =
    """corpus AS (
      |  SELECT doc_id, text, lang, source FROM documents
      |  UNION ALL
      |  SELECT doc_id + 10000, text, lang, source FROM documents WHERE doc_id % 3 = 0)""".stripMargin

  private val nearCorpusSql =
    """corpus AS (
      |  SELECT doc_id, text, lang, source FROM documents
      |  UNION ALL
      |  SELECT doc_id + 10000,
      |    array_to_string(string_split(text, ' ')[1:len(string_split(text, ' ')) - 1], ' '),
      |    lang, source
      |  FROM documents WHERE doc_id % 5 = 0)""".stripMargin

  /** The full MinHash+LSH candidate/verify pipeline as reusable CTEs over
    * the near-dup corpus, ending in `verify(id_a, id_b, jaccard)` (shared
    * by dedup_minhash_lsh and dedup_clusters). */
  private lazy val minhashVerifyCtes: String =
    s"""$nearCorpusSql,
       |sh AS (SELECT doc_id, ${shingleSql("text")} AS shingles FROM corpus),
       |sig AS (SELECT doc_id, shingles,
       |  list_transform(range(0, 8), j -> list_min(list_transform(shingles, s -> ${h15("j", "s")}))) AS sigs
       |  FROM sh),
       |band AS (SELECT doc_id,
       |  unnest(list_transform(range(0, 4), b -> concat_ws(':', CAST(b AS VARCHAR),
       |    CAST(sigs[2*b+1] AS VARCHAR), CAST(sigs[2*b+2] AS VARCHAR)))) AS band
       |  FROM sig),
       |okband AS (SELECT band FROM band GROUP BY band HAVING COUNT(*) <= 10000),
       |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM band a JOIN band b USING (band)
       |  WHERE a.doc_id < b.doc_id AND a.band IN (SELECT band FROM okband)),
       |verify AS (SELECT c.id_a, c.id_b, ${jaccardSql("sa.shingles", "sb.shingles")} AS jaccard
       |  FROM cand c JOIN sh sa ON sa.doc_id = c.id_a JOIN sh sb ON sb.doc_id = c.id_b)""".stripMargin

  /** The SimHash64 computation as reusable CTEs over `src(doc_id, text)`:
    * per-token-occurrence FNV-1a bit votes, sign-aggregated into the
    * unsigned HUGEINT fingerprint `sim(doc_id, v)`. */
  private def simhashCtes(src: String): String =
    s"""tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM $src),
       |fnv AS (SELECT doc_id, $fnvSql AS h FROM tok),
       |votes AS (SELECT doc_id, bits.b,
       |    COUNT(*) FILTER (WHERE (h >> bits.b) & 1 = 1) AS ones, COUNT(*) AS n
       |  FROM fnv CROSS JOIN (SELECT unnest(range(0, 64)) AS b) bits
       |  GROUP BY doc_id, bits.b),
       |sim AS (SELECT doc_id,
       |    SUM(CASE WHEN 2 * ones > n THEN CAST(1 AS HUGEINT) << b ELSE CAST(0 AS HUGEINT) END) AS v
       |  FROM votes GROUP BY doc_id)""".stripMargin

  /** FNV-1a 64 of the UTF-8 bytes of `t`, in HUGEINT mod-2^64 arithmetic. */
  private val fnvSql =
    """list_reduce(
      | list_prepend(CAST('14695981039346656037' AS HUGEINT),
      |  list_transform(range(0, octet_length(CAST(t AS BLOB))),
      |   i -> CAST((strpos('0123456789ABCDEF', substr(hex(CAST(t AS BLOB)), 2*i+1, 1)) - 1) * 16
      |           + (strpos('0123456789ABCDEF', substr(hex(CAST(t AS BLOB)), 2*i+2, 1)) - 1) AS HUGEINT))),
      | (acc, b) -> (xor(acc, b) * 1099511628211) % CAST('18446744073709551616' AS HUGEINT))""".stripMargin

  private val stopList = TextAnalysis.defaultStopwords.map(w => s"'$w'").mkString("[", ", ", "]")

  /** The TextAnalysis quality-score formula over a `text` column, as DuckDB
    * SQL fragments (shared by text_quality and pipeline_curation). */
  private object QualitySql {
    val alpha = "length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))::DOUBLE / length(text)"
    // \s+ split in lockstep with TextAnalysis.tokens — the ONE token
    // definition all TextAnalysis operators share
    val stop = s"len(list_filter(string_split_regex(text, '\\s+'), t -> list_contains($stopList, t)))::DOUBLE" +
      " / len(string_split_regex(text, '\\s+'))"
    val lenBand = "CASE WHEN length(text)::DOUBLE / len(string_split_regex(text, '\\s+')) BETWEEN 3.0 AND 10.0" +
      " THEN 1.0 ELSE 0.0 END"
    val quality = s"ROUND(($alpha) * 0.5 + ($stop) * 0.3 + ($lenBand) * 0.2, 6)"
  }

  private def langHits: Seq[(String, String)] = LangId.profiles.map { case (lang, markers) =>
    val list = markers.map(w => s"'$w'").mkString("[", ", ", "]")
    lang -> s"len(list_filter(string_split(text, ' '), t -> list_contains($list, t)))"
  }

  private val cosSimSql =
    """list_inner_product(a.embedding::DOUBLE[], b2.embedding::DOUBLE[]) /
      | (sqrt(list_inner_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
      |  * sqrt(list_inner_product(b2.embedding::DOUBLE[], b2.embedding::DOUBLE[])))""".stripMargin

  /** Sign-LSH bucketed near-neighbor pairs over the embeddings table,
    * ending in `lshpairs(id_a, id_b, sim)` — shared by ann_lsh_pairs and
    * dedup_embedding. */
  private lazy val lshPairsCtes: String =
    s"""p0 AS (SELECT embedding AS v FROM embeddings WHERE vec_id = 0),
       |p1 AS (SELECT embedding AS v FROM embeddings WHERE vec_id = 1),
       |b AS (SELECT e.vec_id, e.embedding,
       |  concat(
       |   CASE WHEN list_inner_product(e.embedding::DOUBLE[], p0.v::DOUBLE[]) > 0 THEN '1' ELSE '0' END,
       |   CASE WHEN list_inner_product(e.embedding::DOUBLE[], p1.v::DOUBLE[]) > 0 THEN '1' ELSE '0' END) AS bucket
       |  FROM embeddings e, p0, p1),
       |lshpairs AS (SELECT a.vec_id AS id_a, b2.vec_id AS id_b, ROUND($cosSimSql, 6) AS sim
       |  FROM b a JOIN b b2 ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id
       |  WHERE ROUND($cosSimSql, 6) >= 0.4)""".stripMargin

  val oracles: Map[String, String] = Map(
    "line_boilerplate" ->
      s"""WITH src AS (
         |  SELECT doc_id,
         |    concat(
         |      CASE WHEN doc_id % 7 = 0 THEN 'subscribe to our newsletter' || chr(10) ELSE '' END,
         |      CASE WHEN doc_id % 97 = 0 THEN 'cookie consent required' || chr(10) ELSE '' END,
         |      CASE WHEN doc_id % 251 = 0 THEN 'rare footer line' || chr(10) ELSE '' END,
         |      array_to_string(
         |        list_transform(range(0, CAST(ceil(len(string_split(text, ' ')) / 8.0) AS INT)),
         |          i -> array_to_string(list_slice(string_split(text, ' '), i*8 + 1, i*8 + 8), ' ')),
         |        chr(10))) AS text
         |  FROM documents),
         |l AS (
         |  SELECT doc_id, generate_subscripts(ls, 1) AS pos, unnest(ls) AS line
         |  FROM (SELECT doc_id, string_split(text, chr(10)) AS ls FROM src)),
         |lh AS (
         |  SELECT doc_id, pos, line,
         |    list_transform([trim(line)], t -> $fnvSql)[1] AS h
         |  FROM l),
         |boiler AS (
         |  SELECT h FROM (SELECT DISTINCT doc_id, h FROM lh WHERE trim(line) <> '')
         |  GROUP BY h HAVING COUNT(*) >= 5),
         |kept AS (SELECT doc_id, pos, line FROM lh WHERE h NOT IN (SELECT h FROM boiler)),
         |agg AS (
         |  SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text_clean,
         |    COUNT(*) AS lines_kept
         |  FROM kept GROUP BY doc_id)
         |SELECT s.doc_id, COALESCE(a.text_clean, '') AS text_clean,
         |  COALESCE(a.lines_kept, 0) AS lines_kept,
         |  len(string_split(s.text, chr(10))) - COALESCE(a.lines_kept, 0) AS lines_dropped
         |FROM src s LEFT JOIN agg a USING (doc_id) ORDER BY s.doc_id""".stripMargin,
    "dedup_spans" ->
      s"""WITH src AS (
         |  SELECT doc_id,
         |    concat(
         |      CASE WHEN doc_id % 4 = 1
         |        THEN 'all rights reserved contact the site administrator today ' ELSE '' END,
         |      text,
         |      CASE WHEN doc_id % 4 = 0
         |        THEN ' all rights reserved contact the site administrator today' ELSE '' END,
         |      CASE WHEN doc_id % 251 = 0
         |        THEN ' this rare disclaimer appears in just two documents' ELSE '' END) AS text
         |  FROM documents),
         |toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM src),
         |wins AS (
         |  SELECT doc_id, i AS start,
         |    list_transform([array_to_string(list_slice(tk, i + 1, i + 8), ' ')],
         |      t -> $fnvSql)[1] AS wh
         |  FROM (SELECT doc_id, tk, unnest(range(0, len(tk) - 7)) AS i
         |        FROM toks WHERE len(tk) >= 8)),
         |rep AS (SELECT wh FROM (SELECT DISTINCT doc_id, wh FROM wins)
         |  GROUP BY wh HAVING COUNT(*) >= 5),
         |struck AS (SELECT DISTINCT doc_id, start FROM wins
         |  WHERE wh IN (SELECT wh FROM rep)),
         |covered AS (SELECT DISTINCT doc_id, start + o.off AS pos
         |  FROM struck, (SELECT unnest(range(0, 8)) AS off) o),
         |idx AS (SELECT doc_id, tk, unnest(range(0, len(tk))) AS pos FROM toks),
         |kept AS (
         |  SELECT i.doc_id, i.pos, i.tk[i.pos + 1] AS tok
         |  FROM idx i LEFT JOIN covered c ON i.doc_id = c.doc_id AND i.pos = c.pos
         |  WHERE c.pos IS NULL),
         |agg AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS text_clean,
         |    COUNT(*) AS kept
         |  FROM kept GROUP BY doc_id)
         |SELECT t.doc_id, COALESCE(a.text_clean, '') AS text_clean,
         |  COALESCE(a.kept, 0) AS tokens_kept,
         |  len(t.tk) - COALESCE(a.kept, 0) AS tokens_dropped
         |FROM toks t LEFT JOIN agg a USING (doc_id) ORDER BY t.doc_id""".stripMargin,
    "dedup_exact" ->
      s"""WITH $dupCorpusSql
         |SELECT MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
         |FROM corpus GROUP BY text ORDER BY keep_id""".stripMargin,
    "dedup_drop_exact" ->
      s"""WITH $dupCorpusSql,
         |keep AS (SELECT MIN(doc_id) AS doc_id FROM corpus GROUP BY text)
         |SELECT lang, COUNT(*) AS n, CAST(SUM(doc_id) AS BIGINT) AS sum_id
         |FROM corpus WHERE doc_id IN (SELECT doc_id FROM keep)
         |GROUP BY lang ORDER BY lang""".stripMargin,
    // ground truth for the bloom-prefiltered operator is the plain
    // anti-join: batch rows whose text is absent from the corpus
    "dedup_incremental" ->
      s"""WITH batch AS (
         |  SELECT doc_id + 20000 AS doc_id, text, lang, source
         |  FROM documents WHERE doc_id % 4 = 0
         |  UNION ALL
         |  SELECT doc_id + 30000 AS doc_id, text || ' addendum' AS text, lang, source
         |  FROM documents WHERE doc_id % 4 = 1)
         |SELECT doc_id, lang, source FROM batch
         |WHERE text NOT IN (SELECT text FROM documents)
         |ORDER BY doc_id""".stripMargin,
    // brute-force truth: every batch×corpus pair at exact Jaccard >= 0.5
    // (the banding is recall-complete on this corpus — see the query)
    "dedup_incremental_near" ->
      s"""WITH corpus AS (SELECT doc_id, text FROM documents),
         |batch AS (
         |  SELECT doc_id + 20000 AS doc_id,
         |    array_to_string(string_split(text, ' ')[1:len(string_split(text, ' ')) - 1], ' ') AS text
         |  FROM documents WHERE doc_id % 5 = 0
         |  UNION ALL
         |  SELECT doc_id + 30000 AS doc_id,
         |    array_to_string(list_transform(range(0, 30),
         |      j -> concat('zq', substr(md5(concat(CAST(doc_id + 30000 AS VARCHAR), ':', CAST(j AS VARCHAR))), 1, 6))),
         |      ' ') AS text
         |  FROM documents WHERE doc_id % 5 = 1),
         |sha AS (SELECT doc_id, ${shingleSql("text")} AS shingles FROM batch),
         |shb AS (SELECT doc_id, ${shingleSql("text")} AS shingles FROM corpus)
         |SELECT a.doc_id AS batch_id, b.doc_id AS corpus_id,
         |  ${jaccardSql("a.shingles", "b.shingles")} AS jaccard
         |FROM sha a, shb b
         |WHERE ${jaccardSql("a.shingles", "b.shingles")} >= 0.5
         |ORDER BY batch_id, corpus_id""".stripMargin,
    "dedup_minhash_lsh" ->
      s"""WITH $minhashVerifyCtes
         |SELECT id_a, id_b, jaccard FROM verify WHERE jaccard >= 0.5
         |ORDER BY id_a, id_b""".stripMargin,
    // brute-force truth: every pair with exact Jaccard >= 0.5 — the xx
    // pipeline's banding is recall-complete on this corpus (see the query)
    "dedup_minhash_xx" ->
      s"""WITH $nearCorpusSql,
         |sh AS (SELECT doc_id, ${shingleSql("text")} AS shingles FROM corpus)
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  ${jaccardSql("a.shingles", "b.shingles")} AS jaccard
         |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |WHERE ${jaccardSql("a.shingles", "b.shingles")} >= 0.5
         |ORDER BY id_a, id_b""".stripMargin,
    "streaming_dedup_replay" ->
      s"""WITH corpus AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 10000,
         |    array_to_string(string_split(text, ' ')[1:len(string_split(text, ' ')) - 1], ' ')
         |  FROM documents WHERE doc_id % 5 = 0),
         |sh AS (SELECT doc_id, ${shingleSql("text")} AS shingles FROM corpus),
         |sig AS (SELECT doc_id, array_to_string(list_transform(range(0, 8),
         |    j -> CAST(list_min(list_transform(shingles, s -> ${h15("j", "s")})) AS VARCHAR)), ':') AS sg
         |  FROM sh),
         |b1 AS (SELECT sg FROM sig WHERE doc_id < 10000),
         |kept2 AS (SELECT doc_id FROM sig
         |  WHERE doc_id >= 10000 AND sg NOT IN (SELECT sg FROM b1))
         |SELECT 'base_kept_count' AS src,
         |  CAST((SELECT COUNT(DISTINCT sg) FROM b1) AS BIGINT) AS val
         |UNION ALL
         |SELECT 'recrawl_kept', doc_id FROM kept2
         |ORDER BY src, val""".stripMargin,
    "dedup_clusters" ->
      s"""WITH RECURSIVE $minhashVerifyCtes,
         |pairs AS (SELECT id_a, id_b FROM verify WHERE jaccard >= 0.5),
         |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
         |  UNION SELECT id_b, id_a FROM pairs),
         |walk AS (
         |  SELECT src AS id, src AS reach FROM edges
         |  UNION
         |  SELECT w.id, e.dst FROM walk w JOIN edges e ON e.src = w.reach)
         |SELECT id, MIN(reach) AS cluster FROM walk GROUP BY id
         |ORDER BY id""".stripMargin,
    "dedup_blocked_jaccard" ->
      s"""WITH $nearCorpusSql,
         |corpus2 AS (SELECT * FROM corpus UNION ALL
         |  SELECT doc_id + 20000, text, NULL AS lang, source FROM corpus
         |  WHERE doc_id % 7 = 0 OR (doc_id >= 10000 AND (doc_id - 10000) % 7 = 0)),
         |okblock AS (SELECT lang, source FROM corpus2
         |  GROUP BY lang, source HAVING COUNT(*) <= 10000),
         |sh AS (SELECT doc_id, c.lang, c.source, ${shingleSql("c.text")} AS shingles
         |  FROM corpus2 c JOIN okblock ok
         |    ON c.lang IS NOT DISTINCT FROM ok.lang
         |   AND c.source IS NOT DISTINCT FROM ok.source),
         |pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |    ${jaccardSql("a.shingles", "b.shingles")} AS jaccard
         |  FROM sh a JOIN sh b
         |    ON a.lang IS NOT DISTINCT FROM b.lang
         |   AND a.source IS NOT DISTINCT FROM b.source
         |   AND a.doc_id < b.doc_id)
         |SELECT id_a, id_b, jaccard FROM pairs WHERE jaccard >= 0.5
         |ORDER BY id_a, id_b""".stripMargin,
    "simhash_fingerprints" ->
      s"""WITH ${simhashCtes("documents")}
         |SELECT doc_id, CAST(CASE WHEN v >= CAST('9223372036854775808' AS HUGEINT)
         |  THEN v - CAST('18446744073709551616' AS HUGEINT) ELSE v END AS BIGINT) AS fingerprint
         |FROM sim ORDER BY doc_id""".stripMargin,
    "dedup_simhash" ->
      s"""WITH $dupCorpusSql,
         |${simhashCtes("corpus")},
         |band AS (SELECT doc_id, bi.b AS b, CAST((v >> (16 * bi.b)) & 65535 AS BIGINT) AS bv
         |  FROM sim CROSS JOIN (SELECT unnest(range(0, 4)) AS b) bi),
         |okband AS (SELECT b, bv FROM band GROUP BY b, bv HAVING COUNT(*) <= 10000),
         |cand AS (SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b
         |  FROM band a JOIN band c ON a.b = c.b AND a.bv = c.bv AND a.doc_id < c.doc_id
         |  JOIN okband ok ON ok.b = a.b AND ok.bv = a.bv),
         |ham AS (SELECT id_a, id_b,
         |  CAST(len(list_filter(range(0, 64), i -> ((sa.v >> i) & 1) != ((sb.v >> i) & 1))) AS INTEGER) AS hamming
         |  FROM cand JOIN sim sa ON sa.doc_id = cand.id_a JOIN sim sb ON sb.doc_id = cand.id_b)
         |SELECT id_a, id_b, hamming FROM ham WHERE hamming <= 3
         |ORDER BY id_a, id_b""".stripMargin,
    "winnow_fingerprints" ->
      s"""WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < 200),
         |g AS (SELECT doc_id, CASE WHEN length(text) >= 8
         |    THEN list_transform(range(0, length(text) - 7), i -> substr(text, i + 1, 8))
         |    ELSE [text] END AS grams FROM d),
         |h AS (SELECT doc_id, list_transform(list_transform(grams, t -> $fnvSql), hv ->
         |    CAST(CASE WHEN hv >= CAST('9223372036854775808' AS HUGEINT)
         |      THEN hv - CAST('18446744073709551616' AS HUGEINT) ELSE hv END AS BIGINT)) AS hs
         |  FROM g),
         |w AS (SELECT doc_id, CASE WHEN len(hs) >= 4
         |    THEN list_transform(range(0, len(hs) - 3),
         |      j -> list_min(list_transform(range(0, 4), q -> hs[j + q + 1])))
         |    ELSE [list_min(hs)] END AS wins FROM h)
         |SELECT doc_id, unnest(list_distinct(wins)) AS fp FROM w
         |ORDER BY doc_id, fp""".stripMargin,
    "distinct_audit" ->
      """SELECT lang, source, COUNT(DISTINCT text) AS exact_distinct,
        |  TRUE AS hll_ok
        |FROM documents GROUP BY lang, source
        |ORDER BY lang, source""".stripMargin,
    "text_quality" -> {
      import QualitySql.{alpha, stop, lenBand}
      s"""SELECT doc_id,
         |  len(string_split_regex(text, '\\s+')) AS n_tokens,
         |  len(regexp_extract_all(text, '\\w+|[^\\w\\s]')) AS n_subwords,
         |  ROUND($alpha, 6) AS alpha_ratio,
         |  ROUND($stop, 6) AS stopword_ratio,
         |  ROUND(($alpha) * 0.5 + ($stop) * 0.3 + ($lenBand) * 0.2, 6) AS quality,
         |  md5(text) AS fp
         |FROM documents ORDER BY doc_id""".stripMargin
    },
    "pipeline_curation" ->
      s"""WITH $dupCorpusSql,
         |scored AS (SELECT doc_id, text, lang,
         |    len(string_split_regex(text, '\\s+')) AS n_tokens,
         |    ${QualitySql.quality} AS quality
         |  FROM corpus),
         |kept AS (SELECT * FROM scored WHERE quality >= 0.63),
         |keep AS (SELECT MIN(doc_id) AS doc_id FROM kept GROUP BY text)
         |SELECT lang, COUNT(*) AS n_docs,
         |  CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
         |  ROUND(AVG(quality), 6) AS avg_quality
         |FROM kept WHERE doc_id IN (SELECT doc_id FROM keep)
         |GROUP BY lang ORDER BY lang""".stripMargin,
    "langid_confusion" -> {
      val hitCols = langHits.map { case (l, sql) => s"$sql AS h_$l" }.mkString(", ")
      val best = "GREATEST(" + langHits.map(h => s"h_${h._1}").mkString(", ") + ")"
      val cases = langHits.map { case (l, _) => s"WHEN h_$l = $best THEN '$l'" }.mkString(" ")
      s"""WITH h AS (SELECT lang, $hitCols FROM documents)
         |SELECT lang,
         |  CASE WHEN $best = 0 THEN 'unknown' $cases END AS predicted,
         |  COUNT(*) AS n
         |FROM h GROUP BY lang, predicted ORDER BY lang, predicted""".stripMargin
    },
    "ann_brute_topk" -> {
      val cos = """ABS(1 - (list_inner_product(e.embedding::DOUBLE[], q.qvec::DOUBLE[]) /
                  | (sqrt(list_inner_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
                  |  * sqrt(list_inner_product(q.qvec::DOUBLE[], q.qvec::DOUBLE[])))))""".stripMargin
      s"""WITH q AS (SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id < 3),
         |s AS (SELECT q.qid, e.vec_id, ROUND($cos, 6) AS dist FROM embeddings e, q),
         |r AS (SELECT qid, vec_id, dist,
         |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY dist, vec_id) AS rn FROM s)
         |SELECT qid, vec_id, dist, rn FROM r WHERE rn <= 5 ORDER BY qid, rn""".stripMargin
    },
    "ann_lsh_pairs" ->
      s"""WITH $lshPairsCtes
         |SELECT id_a, id_b, sim FROM lshpairs
         |ORDER BY id_a, id_b""".stripMargin,
    "dedup_embedding" ->
      s"""WITH RECURSIVE $lshPairsCtes,
         |edges AS (SELECT id_a AS src, id_b AS dst FROM lshpairs
         |  UNION SELECT id_b, id_a FROM lshpairs),
         |walk AS (
         |  SELECT src AS id, src AS reach FROM edges
         |  UNION
         |  SELECT w.id, e.dst FROM walk w JOIN edges e ON e.src = w.reach)
         |SELECT id, MIN(reach) AS cluster FROM walk GROUP BY id
         |ORDER BY id""".stripMargin,
    "dedup_semantic_incremental" -> {
      val cross =
        """list_inner_product(a.embedding::DOUBLE[], c.embedding::DOUBLE[]) /
          | (sqrt(list_inner_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
          |  * sqrt(list_inner_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[])))""".stripMargin
      s"""WITH p0 AS (SELECT embedding AS v FROM embeddings WHERE vec_id = 0),
         |p1 AS (SELECT embedding AS v FROM embeddings WHERE vec_id = 1),
         |batch0 AS (
         |  SELECT vec_id + 90000 AS vec_id, embedding FROM embeddings WHERE vec_id % 9 = 0
         |  UNION ALL
         |  SELECT vec_id + 95000 AS vec_id, list_reverse(embedding) AS embedding
         |  FROM embeddings WHERE vec_id % 9 = 1),
         |bb AS (SELECT b.vec_id, b.embedding, concat(
         |   CASE WHEN list_inner_product(b.embedding::DOUBLE[], p0.v::DOUBLE[]) > 0 THEN '1' ELSE '0' END,
         |   CASE WHEN list_inner_product(b.embedding::DOUBLE[], p1.v::DOUBLE[]) > 0 THEN '1' ELSE '0' END) AS bucket
         |  FROM batch0 b, p0, p1),
         |cb0 AS (SELECT e.vec_id, e.embedding, concat(
         |   CASE WHEN list_inner_product(e.embedding::DOUBLE[], p0.v::DOUBLE[]) > 0 THEN '1' ELSE '0' END,
         |   CASE WHEN list_inner_product(e.embedding::DOUBLE[], p1.v::DOUBLE[]) > 0 THEN '1' ELSE '0' END) AS bucket
         |  FROM embeddings e, p0, p1),
         |-- replicate the Spark side's maxCorpusBucketProbes = 1000000 cap
         |-- (id-least members per bucket) so parity is structural, not an
         |-- accident of no bucket exceeding the cap
         |cb AS (SELECT vec_id, embedding, bucket FROM (
         |  SELECT vec_id, embedding, bucket,
         |    ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY vec_id) AS rn
         |  FROM cb0) WHERE rn <= 1000000)
         |SELECT a.vec_id AS batch_id, c.vec_id AS corpus_id, ROUND($cross, 6) AS sim
         |FROM bb a JOIN cb c ON a.bucket = c.bucket
         |WHERE ROUND($cross, 6) >= 0.4
         |ORDER BY batch_id, corpus_id""".stripMargin
    },
    "text_repetition" ->
      """WITH toks AS (SELECT doc_id, string_split_regex(text, '\s+') AS t FROM documents),
        |bg AS (SELECT doc_id, unnest(CASE WHEN len(t) >= 2
        |    THEN list_transform(range(0, len(t) - 1), i -> concat_ws(' ', t[i+1], t[i+2]))
        |    ELSE [] END) AS b FROM toks),
        |cnt AS (SELECT doc_id, b, COUNT(*) AS c FROM bg GROUP BY doc_id, b)
        |SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_bigrams,
        |  ROUND(MAX(c) * 1.0 / SUM(c), 6) AS top_bigram_frac
        |FROM cnt GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "tfidf_top_terms" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term),
        |dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
        |n AS (SELECT COUNT(*) AS n FROM documents),
        |scored AS (SELECT t.doc_id, t.term, ROUND(t.tf * ln(n.n * 1.0 / d.df), 6) AS score
        |  FROM tf t JOIN dfreq d USING (term), n),
        |r AS (SELECT doc_id, term, score,
        |    ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rn
        |  FROM scored WHERE doc_id < 100)
        |SELECT doc_id, term, score, CAST(rn AS INTEGER) AS rn
        |FROM r WHERE rn <= 3 ORDER BY doc_id, rn""".stripMargin,
    "corpus_rollup" ->
      """SELECT lang, source, COUNT(*) AS n_docs,
        |  CAST(SUM(len(string_split_regex(text, '\s+'))) AS BIGINT) AS sum_tokens
        |FROM documents GROUP BY ROLLUP(lang, source)
        |ORDER BY lang NULLS FIRST, source NULLS FIRST""".stripMargin,
    "events_props_agg" ->
      """SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  ROUND(SUM(value), 6) AS sum_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "events_asof_join" ->
      """WITH evus AS (SELECT user_id, event_id, event_type, value,
        |    epoch_ns(ts) // 1000 AS tsu
        |  FROM events),
        |snaps AS (SELECT user_id, tsu, MAX(value) AS snap_value
        |  FROM evus WHERE event_id % 7 = 0 GROUP BY user_id, tsu)
        |SELECT event_type, COUNT(*) AS n,
        |  COUNT(snap_value) AS n_matched,
        |  ROUND(SUM(snap_value), 6) AS sum_snap
        |FROM evus e ASOF LEFT JOIN snaps
        |  ON e.user_id = snaps.user_id AND e.tsu >= snaps.tsu
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "events_windowed_agg" ->
      """SELECT date_trunc('hour', ts) AS window_start, event_type,
        |  COUNT(*) AS n, ROUND(SUM(value), 6) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "streaming_window_replay" ->
      """WITH mx AS (SELECT max(ts) AS m FROM events)
        |SELECT date_trunc('hour', ts) AS window_start, event_type,
        |  COUNT(*) AS n, ROUND(SUM(value), 6) AS sum_value
        |FROM events, mx
        |WHERE date_trunc('hour', ts) + INTERVAL 1 HOUR <= mx.m - INTERVAL 1 HOUR
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "events_sessionize" ->
      """WITH o AS (SELECT user_id, ts,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pts
        |  FROM events),
        |m AS (SELECT user_id,
        |    CASE WHEN pts IS NULL OR ts - pts >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
        |  FROM o)
        |SELECT user_id, CAST(SUM(new_s) AS BIGINT) AS n_sessions, COUNT(*) AS n_events
        |FROM m GROUP BY user_id ORDER BY user_id""".stripMargin,
    "ivf_search" ->
      """WITH cents AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id < 8),
        |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
        |asg AS (SELECT vec_id, cid FROM (
        |  SELECT e.vec_id, c.cid,
        |    ROW_NUMBER() OVER (PARTITION BY e.vec_id
        |      ORDER BY ROUND(list_distance(e.embedding::DOUBLE[], c.cv::DOUBLE[]), 6), c.cid) AS rn
        |  FROM embeddings e, cents c) WHERE rn = 1),
        |probe AS (SELECT c.cid FROM cents c, q
        |  ORDER BY ROUND(list_distance(c.cv::DOUBLE[], q.qv::DOUBLE[]), 6), c.cid LIMIT 3)
        |SELECT e.vec_id, CAST(a.cid AS BIGINT) AS cell,
        |  ROUND(list_distance(e.embedding::DOUBLE[], q.qv::DOUBLE[]), 6) AS dist
        |FROM embeddings e JOIN asg a ON a.vec_id = e.vec_id, q
        |WHERE a.cid IN (SELECT cid FROM probe)
        |ORDER BY dist, e.vec_id LIMIT 10""".stripMargin,
    "knn_join" ->
      """WITH cents AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id < 8),
        |asg AS (SELECT vec_id, cid FROM (
        |  SELECT e.vec_id, c.cid,
        |    ROW_NUMBER() OVER (PARTITION BY e.vec_id
        |      ORDER BY ROUND(list_distance(e.embedding::DOUBLE[], c.cv::DOUBLE[]), 6), c.cid) AS rn
        |  FROM embeddings e, cents c) WHERE rn = 1),
        |q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id % 101 = 0),
        |probe AS (SELECT qid, cid FROM (
        |  SELECT q.qid, c.cid,
        |    ROW_NUMBER() OVER (PARTITION BY q.qid
        |      ORDER BY ROUND(list_distance(q.qv::DOUBLE[], c.cv::DOUBLE[]), 6), c.cid) AS rn
        |  FROM q, cents c) WHERE rn <= 3),
        |cand AS (SELECT q.qid, e.vec_id,
        |    ROUND(list_distance(e.embedding::DOUBLE[], q.qv::DOUBLE[]), 6) AS dist
        |  FROM q JOIN probe p ON p.qid = q.qid
        |    JOIN asg a ON a.cid = p.cid
        |    JOIN embeddings e ON e.vec_id = a.vec_id),
        |r AS (SELECT qid, vec_id, dist,
        |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY dist, vec_id) AS rn FROM cand)
        |SELECT qid, vec_id, dist, CAST(rn AS INTEGER) AS rn
        |FROM r WHERE rn <= 5 ORDER BY qid, rn""".stripMargin,
    "ann_recall" ->
      """WITH cents AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id < 8),
        |asg AS (SELECT vec_id, cid FROM (
        |  SELECT e.vec_id, c.cid,
        |    ROW_NUMBER() OVER (PARTITION BY e.vec_id
        |      ORDER BY ROUND(list_distance(e.embedding::DOUBLE[], c.cv::DOUBLE[]), 6), c.cid) AS rn
        |  FROM embeddings e, cents c) WHERE rn = 1),
        |q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id % 101 = 0),
        |exact10 AS (SELECT qid, vec_id FROM (
        |  SELECT q.qid, e.vec_id,
        |    ROW_NUMBER() OVER (PARTITION BY q.qid
        |      ORDER BY ROUND(list_distance(e.embedding::DOUBLE[], q.qv::DOUBLE[]), 6), e.vec_id) AS rn
        |  FROM q, embeddings e) WHERE rn <= 10),
        |probe AS (SELECT qid, cid FROM (
        |  SELECT q.qid, c.cid,
        |    ROW_NUMBER() OVER (PARTITION BY q.qid
        |      ORDER BY ROUND(list_distance(q.qv::DOUBLE[], c.cv::DOUBLE[]), 6), c.cid) AS rn
        |  FROM q, cents c) WHERE rn <= 2),
        |cand AS (SELECT q.qid, e.vec_id,
        |    ROUND(list_distance(e.embedding::DOUBLE[], q.qv::DOUBLE[]), 6) AS dist
        |  FROM q JOIN probe p ON p.qid = q.qid
        |    JOIN asg a ON a.cid = p.cid
        |    JOIN embeddings e ON e.vec_id = a.vec_id),
        |approx10 AS (SELECT qid, vec_id FROM (
        |  SELECT qid, vec_id,
        |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY dist, vec_id) AS rn FROM cand)
        |  WHERE rn <= 10)
        |SELECT e.qid, CAST(COUNT(a.vec_id) AS BIGINT) AS hits,
        |  COUNT(a.vec_id) / 10.0 AS recall
        |FROM exact10 e LEFT JOIN approx10 a
        |  ON a.qid = e.qid AND a.vec_id = e.vec_id
        |GROUP BY e.qid ORDER BY e.qid""".stripMargin,
    "source_overlap" ->
      s"""WITH src AS (SELECT doc_id, text FROM documents),
         |${winnowCtes("s", "src")},
         |sf AS (SELECT DISTINCT d.source, f.fp
         |  FROM sfp f JOIN documents d USING (doc_id))
         |SELECT a.source AS source_a, b.source AS source_b, COUNT(*) AS shared_fps
         |FROM sf a JOIN sf b ON a.fp = b.fp AND a.source < b.source
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "rp_topk" ->
      """WITH gm AS (SELECT i, list_transform(range(0, 64), j ->
        |      ((list_reduce(list_transform(string_split_regex(
        |          substr(md5('rp|' || CAST(i AS VARCHAR) || '|' || CAST(j AS VARCHAR)), 1, 15), ''),
        |        c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)),
        |        (acc, v) -> acc * 16 + v) % 2) * 2 - 1)::DOUBLE) AS gs
        |  FROM range(0, 16) t(i)),
        |pv AS (SELECT e.vec_id, g.i,
        |    list_reduce(list_transform(range(0, 64),
        |      j -> e.embedding[j + 1]::DOUBLE * g.gs[j + 1]), (a, b) -> a + b) / sqrt(16) AS c
        |  FROM embeddings e, gm g),
        |pvl AS (SELECT vec_id, list(c ORDER BY i) AS pvec FROM pv GROUP BY vec_id),
        |q AS (SELECT vec_id AS qid, pvec AS qv FROM pvl WHERE vec_id < 3),
        |s AS (SELECT q.qid, p.vec_id,
        |    -- + 0 normalizes -0.0 (DuckDB ROUND keeps the zero sign;
        |    -- Spark's BigDecimal round does not)
        |    ROUND(1 - list_reduce(list_transform(range(0, 16),
        |        ii -> p.pvec[ii + 1] * q.qv[ii + 1]), (a, b) -> a + b)
        |      / (sqrt(list_reduce(list_transform(range(0, 16),
        |           ii -> p.pvec[ii + 1] * p.pvec[ii + 1]), (a, b) -> a + b))
        |       * sqrt(list_reduce(list_transform(range(0, 16),
        |           ii -> q.qv[ii + 1] * q.qv[ii + 1]), (a, b) -> a + b))), 6) + 0 AS dist
        |  FROM pvl p, q),
        |r AS (SELECT qid, vec_id, dist,
        |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY dist, vec_id) AS rn FROM s)
        |SELECT qid, vec_id, dist FROM r WHERE rn <= 5 ORDER BY qid, dist, vec_id""".stripMargin,
    "zorder_locality" ->
      """WITH ev AS (SELECT event_id, user_id, epoch_ns(ts) // 1000 AS tsu FROM events),
        |st AS (SELECT MIN(user_id) AS mnu, MAX(user_id) - MIN(user_id) AS ru,
        |    MIN(tsu) AS mnt, MAX(tsu) - MIN(tsu) AS rt
        |  FROM ev),
        |sh AS (SELECT mnu, mnt,
        |    GREATEST(list_max(list_transform(range(0, 63),
        |      b -> CASE WHEN (ru >> b) > 0 THEN b + 1 ELSE 0 END)) - 8, 0) AS shu,
        |    GREATEST(list_max(list_transform(range(0, 63),
        |      b -> CASE WHEN (rt >> b) > 0 THEN b + 1 ELSE 0 END)) - 8, 0) AS sht
        |  FROM st),
        |z AS (SELECT event_id, user_id, tsu,
        |    list_reduce(list_transform(range(0, 8), b ->
        |      (((((user_id - mnu) >> shu) >> b) & 1) << (2 * b))
        |      | (((((tsu - mnt) >> sht) >> b) & 1) << (2 * b + 1))),
        |      (a, v) -> a | v) AS zv
        |  FROM ev, sh)
        |SELECT zv >> 10 AS z_cell, COUNT(*) AS n,
        |  MIN(user_id) AS u_min, MAX(user_id) AS u_max,
        |  MIN(tsu) AS t_min, MAX(tsu) AS t_max
        |FROM z GROUP BY 1 ORDER BY 1""".stripMargin,
    // the sketch must be invisible in the results: plain groupBy-HAVING
    // with the same relative-support threshold ceil(2e-4 * N)
    "heavy_hitters" ->
      s"""WITH $dupCorpusSql,
         |sh AS (SELECT unnest(${shingleSql("text")}) AS k FROM corpus)
         |SELECT k AS key, COUNT(*) AS n FROM sh GROUP BY k
         |HAVING COUNT(*) >= (SELECT CEIL(2e-4 * COUNT(*)) FROM sh)
         |ORDER BY n DESC, key""".stripMargin,
    // the bucketed layout must be invisible in the results: plain join
    "bucketed_join" ->
      """SELECT d.doc_id, d.lang, d.source, e.label
        |FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
        |ORDER BY d.doc_id""".stripMargin,
    "events_pivot" ->
      """SELECT hour(ts) AS hr,
        |  COUNT(*) FILTER (WHERE event_type = 'click') AS click,
        |  COUNT(*) FILTER (WHERE event_type = 'error') AS error,
        |  COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
        |  COUNT(*) FILTER (WHERE event_type = 'signup') AS signup,
        |  COUNT(*) FILTER (WHERE event_type = 'view') AS view
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "events_percentiles" ->
      """SELECT event_type,
        |  ROUND(quantile_cont(value, 0.25), 6) AS p25,
        |  ROUND(quantile_cont(value, 0.5), 6) AS p50,
        |  ROUND(quantile_cont(value, 0.75), 6) AS p75
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "events_range_join" ->
      """WITH iv AS (SELECT user_id, epoch_us(ts) AS s, epoch_us(ts) + 600000000 AS e
        |  FROM events WHERE event_id % 11 = 0),
        |p AS (SELECT user_id, event_type, value, epoch_us(ts) AS t FROM events)
        |SELECT p.event_type, COUNT(*) AS n_pairs, ROUND(SUM(p.value), 6) AS sum_value
        |FROM p JOIN iv ON iv.user_id = p.user_id AND p.t BETWEEN iv.s AND iv.e
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "pq_adc_search" ->
      """WITH sp AS (SELECT j FROM range(0, 4) r(j)),
        |cb AS (SELECT sp.j, e.vec_id AS cid, e.embedding[sp.j*16+1 : sp.j*16+16] AS cv
        |  FROM embeddings e, sp WHERE e.vec_id < 16),
        |q AS (SELECT sp.j, e.embedding[sp.j*16+1 : sp.j*16+16] AS qv
        |  FROM embeddings e, sp WHERE e.vec_id = 0),
        |asg AS (SELECT vec_id, j, cid FROM (
        |  SELECT e.vec_id, c.j, c.cid,
        |    ROW_NUMBER() OVER (PARTITION BY e.vec_id, c.j
        |      ORDER BY ROUND(list_distance(e.embedding[c.j*16+1 : c.j*16+16]::DOUBLE[],
        |                                   c.cv::DOUBLE[]), 6), c.cid) AS rn
        |  FROM embeddings e, cb c) WHERE rn = 1),
        |adc AS (SELECT a.vec_id,
        |    SQRT(SUM(POWER(list_distance(q.qv::DOUBLE[], c.cv::DOUBLE[]), 2))) AS d
        |  FROM asg a JOIN cb c ON c.j = a.j AND c.cid = a.cid JOIN q ON q.j = a.j
        |  GROUP BY a.vec_id)
        |SELECT vec_id, ROUND(d, 6) AS adc_dist FROM adc
        |ORDER BY adc_dist, vec_id LIMIT 10""".stripMargin,
    "multimodal_features" -> {
      val byteAt = (i: String) =>
        s"""(strpos('0123456789ABCDEF', substr(hex(CAST(text AS BLOB)), $i + 1, 1)) - 1) * 16
           | + (strpos('0123456789ABCDEF', substr(hex(CAST(text AS BLOB)), $i + 2, 1)) - 1)""".stripMargin
      val fCols = (0 until 8)
        .map(i => s"CAST(len(list_filter(bs, c -> c % 8 = $i)) AS BIGINT) AS f$i").mkString(",\n  ")
      s"""WITH bytes AS (SELECT doc_id,
         |  CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
         |  list_transform(range(0, octet_length(CAST(text AS BLOB))), i -> ${byteAt("2*i")}) AS bs
         |  FROM documents)
         |SELECT doc_id, n_bytes, CAST(bs[1] AS BIGINT) AS head_byte,
         |  $fCols
         |FROM bytes ORDER BY doc_id""".stripMargin
    },
    "image_features" ->
      """WITH d AS (SELECT doc_id, 8 + doc_id % 9 AS w, 8 + doc_id % 7 AS h
        |  FROM documents WHERE doc_id < 200),
        |px AS (SELECT doc_id, w, h, tx.x AS x, ty.y AS y
        |  FROM d, range(0, 16) tx(x), range(0, 14) ty(y)
        |  WHERE tx.x < w AND ty.y < h)
        |SELECT doc_id, CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
        |  ROUND(AVG((x*7 + y*13 + doc_id) % 256), 6) AS mean_r,
        |  ROUND(AVG((x*3 + y*5 + 2*doc_id) % 256), 6) AS mean_g,
        |  ROUND(AVG((x*11 + y + 3*doc_id) % 256), 6) AS mean_b
        |FROM px GROUP BY doc_id, w, h ORDER BY doc_id""".stripMargin,
    "audio_features" ->
      """WITH d AS (SELECT doc_id, 400 + doc_id % 100 AS n
        |  FROM documents WHERE doc_id < 200),
        |s AS (SELECT doc_id, n, t.i AS i,
        |    ((t.i * 7919 + doc_id * 104729) % 65536) - 32768 AS smp
        |  FROM d, range(0, 500) t(i) WHERE t.i < n),
        |w AS (SELECT doc_id, n, i, smp,
        |    LAG(smp) OVER (PARTITION BY doc_id ORDER BY i) AS prev
        |  FROM s)
        |SELECT doc_id, CAST(n AS BIGINT) AS n_samples,
        |  ROUND(AVG(ABS(smp)), 6) AS mean_abs,
        |  ROUND(SQRT(AVG(CAST(smp * smp AS DOUBLE))), 6) AS rms,
        |  CAST(COUNT(*) FILTER (WHERE prev IS NOT NULL AND (smp >= 0) != (prev >= 0)) AS BIGINT)
        |    AS zero_crossings
        |FROM w GROUP BY doc_id, n ORDER BY doc_id""".stripMargin,
    "video_features" ->
      """WITH d AS (SELECT doc_id, 8 + doc_id % 5 AS w, 6 + doc_id % 5 AS h,
        |    3 + doc_id % 4 AS nf
        |  FROM documents WHERE doc_id < 150),
        |px AS (SELECT doc_id, w, h, nf, tf.f AS f, tx.x AS x, ty.y AS y
        |  FROM d, range(0, 6) tf(f), range(0, 12) tx(x), range(0, 10) ty(y)
        |  WHERE tf.f < nf AND tf.f % 2 = 0 AND tx.x < w AND ty.y < h)
        |SELECT doc_id, CAST(nf AS BIGINT) AS n_frames,
        |  CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
        |  CAST(COUNT(DISTINCT f) AS BIGINT) AS n_sampled,
        |  ROUND(AVG((x*7 + y*13 + f*17 + doc_id) % 256), 6) AS mean_r,
        |  ROUND(AVG((x*3 + y*5 + f*11 + 2*doc_id) % 256), 6) AS mean_g,
        |  ROUND(AVG((x*11 + y + f*29 + 3*doc_id) % 256), 6) AS mean_b
        |FROM px GROUP BY doc_id, nf, w, h ORDER BY doc_id""".stripMargin,
    "dataset_split" -> {
      val bkt = h15("'split'", "CAST(doc_id AS VARCHAR)")
      s"""WITH b AS (SELECT doc_id, text, $bkt % 10000 AS bkt FROM documents)
         |SELECT CASE WHEN bkt < 8000 THEN 'train'
         |            WHEN bkt < 9000 THEN 'val' ELSE 'test' END AS split,
         |  COUNT(*) AS n, CAST(SUM(doc_id) AS BIGINT) AS sum_id,
         |  CAST(SUM(len(string_split_regex(text, '\\s+'))) AS BIGINT) AS sum_tokens
         |FROM b GROUP BY 1 ORDER BY 1""".stripMargin
    },
    "doc_chunks" ->
      """WITH t AS (SELECT doc_id, string_split_regex(text, '\s+') AS toks
        |  FROM documents WHERE doc_id < 200),
        |c AS (SELECT doc_id, toks,
        |    GREATEST(1, (len(toks) - 5 + 14) // 15) AS nc FROM t)
        |SELECT doc_id, g.i AS chunk_id,
        |  CAST(len(toks[g.i*15 + 1 : g.i*15 + 20]) AS BIGINT) AS n_chunk_tokens,
        |  array_to_string(toks[g.i*15 + 1 : g.i*15 + 20], ' ') AS chunk_text
        |FROM c, range(0, 4096) g(i) WHERE g.i < nc
        |ORDER BY doc_id, chunk_id""".stripMargin,
    "pack_sequences" -> {
      val shard = h15("'pack'", "CAST(doc_id AS VARCHAR)")
      val ord = h15("'pack-order'", "CAST(doc_id AS VARCHAR)")
      s"""WITH d AS (SELECT doc_id,
         |    len(string_split_regex(text, '\\s+')) AS n_tokens,
         |    $shard % 8 AS shard, $ord % 1073741824 AS ord
         |  FROM documents),
         |c AS (SELECT doc_id, shard, n_tokens,
         |    CAST(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY ord, doc_id) - n_tokens
         |      AS BIGINT) AS start
         |  FROM d)
         |SELECT doc_id, shard, CAST(start // 512 AS BIGINT) AS seq_id,
         |  CAST(start % 512 AS BIGINT) AS seq_offset,
         |  CAST(n_tokens AS BIGINT) AS n_tokens
         |FROM c ORDER BY doc_id""".stripMargin
    },
    "pack_stats" -> {
      val shard = h15("'pack'", "CAST(doc_id AS VARCHAR)")
      val ord = h15("'pack-order'", "CAST(doc_id AS VARCHAR)")
      s"""WITH d AS (SELECT doc_id,
         |    len(string_split_regex(text, '\\s+')) AS n_tokens,
         |    $shard % 8 AS shard, $ord % 1073741824 AS ord
         |  FROM documents),
         |c AS (SELECT doc_id, shard, n_tokens,
         |    CAST(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY ord, doc_id) - n_tokens
         |      AS BIGINT) AS start
         |  FROM d)
         |SELECT shard, CAST(start // 512 AS BIGINT) AS seq_id,
         |  COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
         |FROM c GROUP BY 1, 2 ORDER BY shard, seq_id""".stripMargin
    },
    "decontaminate_eval" ->
      s"""WITH tr AS (SELECT doc_id, text FROM documents WHERE doc_id < 200),
         |ev AS (
         |  SELECT doc_id + 10000 AS doc_id,
         |    array_to_string(string_split(text, ' ')[1:len(string_split(text, ' ')) - 1], ' ') AS text
         |  FROM documents WHERE doc_id < 200 AND doc_id % 5 = 0
         |  UNION ALL
         |  SELECT doc_id, text FROM documents WHERE doc_id >= 200 AND doc_id < 250),
         |${winnowCtes("t", "tr")},
         |${winnowCtes("e", "ev")},
         |idx AS (SELECT DISTINCT fp FROM tfp)
         |SELECT e.doc_id, COUNT(*) AS n_fp, COUNT(i.fp) AS n_shared,
         |  ROUND(COUNT(i.fp) * 1.0 / COUNT(*), 6) AS overlap_ratio,
         |  CAST(COUNT(i.fp) * 2 >= COUNT(*) AS BIGINT) AS contaminated
         |FROM efp e LEFT JOIN idx i ON i.fp = e.fp
         |GROUP BY e.doc_id ORDER BY e.doc_id""".stripMargin,
    "pii_scrub" ->
      """WITH aug AS (SELECT source,
        |    text
        |    || CASE WHEN doc_id % 7 = 0 THEN ' contact u' || doc_id || '@ex' || (doc_id % 13) || '.com' ELSE '' END
        |    || CASE WHEN doc_id % 11 = 0 THEN ' call ' || (doc_id % 900 + 100) || '-' || ((doc_id * 3) % 900 + 100) || '-' || (doc_id % 9000 + 1000) ELSE '' END
        |    || CASE WHEN doc_id % 5 = 0 THEN ' from 10.' || (doc_id % 256) || '.' || ((doc_id * 7) % 256) || '.' || ((doc_id * 13) % 256) ELSE '' END
        |    || CASE WHEN doc_id % 13 = 0 THEN ' ssn ' || (doc_id % 900 + 100) || '-' || (doc_id % 90 + 10) || '-' || ((doc_id * 7) % 9000 + 1000) ELSE '' END
        |    AS text
        |  FROM documents),
        |red AS (SELECT source, text,
        |    regexp_replace(regexp_replace(regexp_replace(regexp_replace(text,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
        |      '\b\d{3}-\d{2}-\d{4}\b', '[SSN]', 'g'),
        |      '\b\d{3}[- .]\d{3}[- .]\d{4}\b', '[PHONE]', 'g'),
        |      '\b(?:\d{1,3}\.){3}\d{1,3}\b', '[IP]', 'g') AS redacted
        |  FROM aug)
        |SELECT source, COUNT(*) AS n_docs,
        |  CAST(SUM(CASE WHEN regexp_matches(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')
        |        OR regexp_matches(text, '\b\d{3}-\d{2}-\d{4}\b')
        |        OR regexp_matches(text, '\b\d{3}[- .]\d{3}[- .]\d{4}\b')
        |        OR regexp_matches(text, '\b(?:\d{1,3}\.){3}\d{1,3}\b')
        |      THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_pii,
        |  CAST(SUM(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))) AS BIGINT) AS emails,
        |  CAST(SUM(len(regexp_extract_all(text, '\b\d{3}[- .]\d{3}[- .]\d{4}\b'))) AS BIGINT) AS phones,
        |  CAST(SUM(len(regexp_extract_all(text, '\b(?:\d{1,3}\.){3}\d{1,3}\b'))) AS BIGINT) AS ipv4s,
        |  CAST(SUM(len(regexp_extract_all(text, '\b\d{3}-\d{2}-\d{4}\b'))) AS BIGINT) AS ssns,
        |  CAST(SUM(len(text) - len(redacted)) AS BIGINT) AS chars_redacted
        |FROM red GROUP BY source ORDER BY source""".stripMargin,
    "training_export" -> {
      val mixBkt = h15("'mix'", "CAST(doc_id AS VARCHAR)")
      val shard = h15("'pack'", "CAST(doc_id AS VARCHAR)")
      val ord = h15("'pack-order'", "CAST(doc_id AS VARCHAR)")
      s"""WITH $dupCorpusSql,
         |scored AS (SELECT doc_id, text, lang,
         |    len(string_split_regex(text, '\\s+')) AS n_tokens,
         |    ${QualitySql.quality} AS quality
         |  FROM corpus),
         |kept AS (SELECT * FROM scored WHERE quality >= 0.63),
         |keep AS (SELECT MIN(doc_id) AS doc_id FROM kept GROUP BY text),
         |surv AS (SELECT * FROM kept WHERE doc_id IN (SELECT doc_id FROM keep)),
         |mixed AS (SELECT * FROM surv WHERE $mixBkt % 10000 <
         |    CASE lang WHEN 'en' THEN 3500 WHEN 'es' THEN 6000
         |         WHEN 'zh' THEN 8000 ELSE 10000 END),
         |d AS (SELECT doc_id, n_tokens,
         |    $shard % 8 AS shard, $ord % 1073741824 AS ord FROM mixed),
         |c AS (SELECT doc_id, shard, n_tokens,
         |    CAST(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY ord, doc_id) - n_tokens
         |      AS BIGINT) AS start
         |  FROM d)
         |SELECT shard, COUNT(*) AS n_docs,
         |  CAST(COUNT(DISTINCT start // 512) AS BIGINT) AS n_windows,
         |  CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
         |FROM c GROUP BY shard ORDER BY shard""".stripMargin
    },
    "lm_perplexity" ->
      """WITH tr AS (SELECT string_split(text, ' ') AS toks FROM documents WHERE doc_id < 250),
        |bgc AS (SELECT bigram, COUNT(*) AS c_bg FROM (
        |    SELECT unnest(list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])) AS bigram
        |    FROM tr)
        |  GROUP BY bigram ORDER BY c_bg DESC, bigram LIMIT 400),
        |hdc AS (SELECT w1, COUNT(*) AS c_head FROM (
        |    SELECT unnest(toks[1:len(toks)-1]) AS w1 FROM tr) GROUP BY w1),
        |v AS (SELECT COUNT(DISTINCT t) AS vocab FROM (SELECT unnest(toks) AS t FROM tr)),
        |sc AS (SELECT doc_id, unnest(list_transform(range(1, len(string_split(text, ' '))),
        |    i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1])) AS bigram
        |  FROM documents),
        |j AS (SELECT sc.doc_id,
        |    ln((COALESCE(b.c_bg, 0)::DOUBLE + 0.5) / (COALESCE(h.c_head, 0)::DOUBLE + 0.5 * v.vocab)) AS logp
        |  FROM sc
        |  LEFT JOIN bgc b USING (bigram)
        |  LEFT JOIN hdc h ON h.w1 = string_split(sc.bigram, ' ')[1]
        |  CROSS JOIN v)
        |SELECT doc_id, COUNT(*) AS n_bigrams, ROUND(AVG(logp), 6) AS avg_logp
        |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "source_cap" -> {
      val bkt = h15("'cap'", "CAST(doc_id AS VARCHAR)")
      s"""WITH r AS (SELECT source, doc_id,
         |    ROW_NUMBER() OVER (PARTITION BY source
         |      ORDER BY $bkt % 1073741824, doc_id) AS rk
         |  FROM documents)
         |SELECT source, COUNT(*) AS n, CAST(SUM(doc_id) AS BIGINT) AS sum_id
         |FROM r WHERE rk <= 15 GROUP BY source ORDER BY source""".stripMargin
    },
    "corpus_mix" -> {
      val bkt = h15("'mix'", "CAST(doc_id AS VARCHAR)")
      s"""WITH b AS (SELECT lang, doc_id, text, $bkt % 10000 AS bkt FROM documents)
         |SELECT lang, COUNT(*) AS n, CAST(SUM(doc_id) AS BIGINT) AS sum_id,
         |  CAST(SUM(len(string_split_regex(text, '\\s+'))) AS BIGINT) AS sum_tokens
         |FROM b
         |WHERE bkt < CASE lang WHEN 'en' THEN 3500 WHEN 'es' THEN 6000
         |            WHEN 'zh' THEN 8000 ELSE 10000 END
         |GROUP BY lang ORDER BY lang""".stripMargin
    },
    "text_normalize" ->
      """WITH n AS (SELECT doc_id, text,
        |    trim(regexp_replace(regexp_replace(nfc_normalize(text),
        |      '[\x00-\x08\x0E-\x1F\x7F]', '', 'g'), '\s+', ' ', 'g')) AS norm
        |  FROM documents)
        |SELECT doc_id, norm, length(text) AS len_raw, length(norm) AS len_norm
        |FROM n ORDER BY doc_id""".stripMargin,
    "fuzzy_pairs" ->
      """WITH t AS (SELECT doc_id, substr(text, 1, 30) AS title FROM documents)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(levenshtein(a.title, b.title) AS BIGINT) AS d
        |FROM t a, t b
        |WHERE a.doc_id < b.doc_id AND levenshtein(a.title, b.title) <= 1
        |ORDER BY id_a, id_b""".stripMargin,
    "fuzzy_pairs_t2" ->
      """WITH t AS (SELECT doc_id, substr(text, 1, 30) AS title FROM documents)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(levenshtein(a.title, b.title) AS BIGINT) AS d
        |FROM t a, t b
        |WHERE a.doc_id < b.doc_id AND levenshtein(a.title, b.title) <= 2
        |ORDER BY id_a, id_b""".stripMargin
  )
}
