package graft

import org.apache.spark.sql.functions._

import graft.dedup.Decontaminate
import graft.operators.{Packing, Sampling}
import graft.text.Chunking

/** Curation operators: token-window chunking, deterministic hash
  * splits/samples, train-eval decontamination — unit layer under the
  * oracle-checked queries (doc_chunks, dataset_split, decontaminate_eval). */
class CurationOpsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    .select("doc_id", "text").cache()

  test("chunks: stride windows reconstruct the token stream; bounds hold") {
    val out = Chunking.chunks(docs, "doc_id", "text", chunkTokens = 20, overlapTokens = 5)
    val byDoc = out.collect().groupBy(_.getLong(0))
    val tokens = docs.collect().map(r => r.getLong(0) -> r.getString(1).split("\\s+").toSeq).toMap
    byDoc.foreach { case (id, rows) =>
      val sorted = rows.sortBy(_.getLong(1))
      assert(sorted.map(_.getLong(1)).toSeq === sorted.indices.map(_.toLong), s"doc $id chunk ids")
      sorted.foreach { r =>
        assert(r.getLong(2) <= 20 && r.getLong(2) >= 1, s"doc $id chunk size ${r.getLong(2)}")
        assert(r.getString(3).split(" ", -1).length.toLong === r.getLong(2))
      }
      // stride-15 windows with 5-token overlap: dropping each chunk's first
      // 5 tokens (except chunk 0) re-concatenates to the original stream
      val rebuilt = sorted.zipWithIndex.flatMap { case (r, i) =>
        val t = r.getString(3).split(" ", -1).toSeq
        if (i == 0) t else t.drop(5)
      }
      assert(rebuilt === tokens(id), s"doc $id reconstruction")
      // consecutive chunks share their 5-token boundary
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          val at = a.getString(3).split(" ", -1).toSeq
          val bt = b.getString(3).split(" ", -1).toSeq
          assert(at.takeRight(math.min(5, bt.length)).startsWith(bt.take(5).take(at.length)) ||
            at.length < 20 // short last-but-one chunk can't overlap fully
            , s"doc $id overlap between ${a.getLong(1)} and ${b.getLong(1)}")
        case _ => ()
      }
    }
    // a doc shorter than one chunk yields exactly itself
    val short = Seq((1L, "only three tokens")).toDF("doc_id", "text")
    val one = Chunking.chunks(short, "doc_id", "text", 20, 5).collect()
    assert(one.length === 1 && one(0).getString(3) === "only three tokens")
    intercept[IllegalArgumentException](Chunking.chunks(short, "doc_id", "text", 5, 5))
  }

  test("assignSplit: splits partition the corpus, deterministically, near the weights") {
    val s1 = Sampling.assignSplit(docs, "doc_id", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val counts = s1.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = docs.count()
    assert(counts.values.sum === n) // exhaustive + disjoint (one row each)
    assert(counts.keySet === Set("train", "val", "test"))
    assert(math.abs(counts("train").toDouble / n - 0.8) < 0.06, counts.toString)
    // identical assignment on a re-run (pure function of the id)
    val s2 = Sampling.assignSplit(docs.repartition(7), "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    assert(s1.select("doc_id", "split").except(s2.select("doc_id", "split")).count() === 0)
    // a different family relabels independently of the sample family
    val sampled = Sampling.hashSample(docs, "doc_id", 0.5)
    assert(math.abs(sampled.count().toDouble / n - 0.5) < 0.06)
    assert(sampled.join(docs, Seq("doc_id"), "left_anti").count() === 0) // subset
    assert(Sampling.hashSample(docs, "doc_id", 0.5).count() === sampled.count())
    assert(Sampling.hashSample(docs, "doc_id", 1.0).count() === n)
    assert(Sampling.hashSample(docs, "doc_id", 0.0).count() === 0)
  }

  test("NULL ids fail loudly in every sampling operator (one contract, not three silent ones)") {
    // a null id used to DROP from hashSample/stratifiedSample but land in
    // the LAST split in assignSplit (holdout contamination)
    val withNull = Seq((java.lang.Long.valueOf(1L), "a"),
      (null.asInstanceOf[java.lang.Long], "b")).toDF("doc_id", "text")
    def msg(f: => Unit): String = {
      val e = intercept[Exception](f)
      val rc = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
        .toSeq.last
      rc.getMessage
    }
    assert(msg(Sampling.assignSplit(withNull, "doc_id",
      Seq("train" -> 0.9, "test" -> 0.1)).collect()).contains("id is NULL"))
    assert(msg(Sampling.hashSample(withNull, "doc_id", 0.5).collect())
      .contains("id is NULL"))
    assert(msg(Sampling.stratifiedSample(withNull, "doc_id", "text",
      Seq("a" -> 0.5)).collect()).contains("id is NULL"))
  }

  test("stratifiedSample: per-stratum rates hold, deterministic, default keeps all") {
    val langs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "lang").cache()
    val rates = Seq("en" -> 0.35, "es" -> 0.6, "zh" -> 0.8)
    val mixed = Sampling.stratifiedSample(langs, "doc_id", "lang", rates)
    val before = langs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val after = mixed.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rates.foreach { case (lang, rate) =>
      val realized = after(lang).toDouble / before(lang)
      assert(math.abs(realized - rate) < 0.15, s"$lang realized $realized vs $rate")
    }
    // strata without a rate keep every row (defaultRate = 1.0)
    (before.keySet -- rates.map(_._1)).foreach(l => assert(after(l) === before(l), l))
    // admission is a pure id function: partitioning cannot change the sample
    val mixed2 = Sampling.stratifiedSample(langs.repartition(11), "doc_id", "lang", rates)
    assert(mixed.except(mixed2).count() === 0 && mixed.count() === mixed2.count())
    // rate 0 removes the stratum; a subset relation always holds
    val drop = Sampling.stratifiedSample(langs, "doc_id", "lang", Seq("en" -> 0.0))
    assert(drop.where(col("lang") === "en").count() === 0)
    assert(mixed.join(langs, Seq("doc_id"), "left_anti").count() === 0)
    intercept[IllegalArgumentException](
      Sampling.stratifiedSample(langs, "doc_id", "lang", Seq("en" -> 1.5)))
  }

  test("capPerStratum: exact cap, deterministic prefix, small strata untouched") {
    val src = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "source").cache()
    val capped = Sampling.capPerStratum(src, "doc_id", "source", maxRows = 15)
    val before = src.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val after = capped.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    before.foreach { case (s, n) =>
      assert(after(s) === math.min(n, 15L), s"source $s")
    }
    // pure function of the ids: partitioning cannot change the kept set
    val capped2 = Sampling.capPerStratum(src.repartition(9), "doc_id", "source", 15)
    assert(capped.except(capped2).count() === 0 && capped.count() === capped2.count())
    // the helper column does not leak
    assert(capped.columns.toSeq === src.columns.toSeq)
    intercept[IllegalArgumentException](Sampling.capPerStratum(src, "doc_id", "source", 0))
    intercept[IllegalArgumentException](
      Sampling.capPerStratum(src.withColumn("_rk", lit(1)), "doc_id", "source", 5))
  }

  test("packSequences: gapless shard-local concat-and-split, deterministic across partitioning") {
    val withTokens = docs.select(col("doc_id"),
      graft.text.TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"))
    val packed = Packing.packSequences(withTokens, "doc_id", "n_tokens",
      contextTokens = 512, shards = 4)
    val rows = packed.collect()
    assert(rows.length.toLong === withTokens.count())
    rows.groupBy(_.getLong(1)).foreach { case (shard, rs) =>
      // the shard's token stream is gapless: the max doc end equals the
      // total token mass (concatenation leaves no holes)
      val streamLen = rs.map(_.getLong(4)).sum
      val maxEnd = rs.map(r => r.getLong(2) * 512 + r.getLong(3) + r.getLong(4)).max
      assert(maxEnd === streamLen, s"shard $shard stream not gapless")
      rs.foreach(r => assert(r.getLong(3) >= 0 && r.getLong(3) < 512, s"offset out of window"))
    }
    // packing is a pure function of content — partitioning cannot move a doc
    val packed2 = Packing.packSequences(withTokens.repartition(13), "doc_id", "n_tokens",
      contextTokens = 512, shards = 4)
    assert(packed.except(packed2).count() === 0)
    // every doc starts in exactly one window
    val stats = Packing.packStats(packed, "n_tokens").collect()
    assert(stats.map(_.getLong(2)).sum === rows.length.toLong)
  }

  test("curation ops are streaming-safe: quality filter + chunking on a file stream == batch") {
    // chunking and quality scoring are stateless column expressions, so the
    // same pipeline runs unchanged under Structured Streaming (continuous
    // ingest curation) — pin it so a stateful construct never creeps in
    import java.nio.file.Files
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    val dir = Files.createTempDirectory("graft-curstream").toString
    val ckpt = Files.createTempDirectory("graft-curstream-ckpt").toString
    docs.limit(50).coalesce(1).write.mode("overwrite").parquet(dir)
    def pipeline(df: org.apache.spark.sql.DataFrame) =
      Chunking.chunks(
        df.where(graft.text.TextAnalysis.qualityScore("text") > 0.3),
        "doc_id", "text", chunkTokens = 20, overlapTokens = 5)
    val schema = spark.read.parquet(dir).schema
    val q = pipeline(spark.readStream.schema(schema).parquet(dir))
      .writeStream.format("memory").queryName("cur_stream")
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append()).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("cur_stream")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(3))).toSet
    val batch = pipeline(spark.read.parquet(dir))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(3))).toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("decontaminate: substring copies are flagged, disjoint docs are not, clean() drops them") {
    // synthetic corpora with disjoint vocabularies so "clean" is provable
    val train = (0 until 20).map(i =>
      (i.toLong, (0 until 30).map(j => s"tw${i}_$j").mkString(" "))).toDF("doc_id", "text")
    // leaked: doc 100 copies train doc 3's middle (a long shared substring);
    // clean: docs 101-102 use a vocabulary no train gram can collide with
    val leakedText = (5 until 25).map(j => s"tw3_$j").mkString(" ")
    val eval = Seq(
      (100L, leakedText),
      (101L, (0 until 30).map(j => s"zq${j}_a").mkString(" ")),
      (102L, (0 until 30).map(j => s"zq${j}_b").mkString(" "))).toDF("doc_id", "text")
    val idx = Decontaminate.fingerprintIndex(train, "text")
    val flags = Decontaminate.overlap(eval, "doc_id", "text", idx)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(4)))).toMap
    val (nfp, shared, contaminated) = flags(100L)
    assert(shared > 0 && contaminated === 1L, s"leaked doc: $nfp fps, $shared shared")
    assert(flags(101L)._2 === 0L && flags(101L)._3 === 0L)
    assert(flags(102L)._2 === 0L && flags(102L)._3 === 0L)
    // zero-overlap docs survive the left join with n_shared=0 (not dropped)
    assert(flags.size === 3)
    val kept = Decontaminate.clean(eval, "doc_id", "text", idx)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(101L, 102L))
    // a doc with NULL text yields no fingerprints — no evidence either
    // way — and must SURVIVE clean() (the pre-fix left_semi silently
    // dropped it from the eval set)
    val withNull = eval.unionByName(
      Seq((103L, null.asInstanceOf[String])).toDF("doc_id", "text"))
    val keptNull = Decontaminate.clean(withNull, "doc_id", "text", idx)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(keptNull === Set(101L, 102L, 103L))
  }
}
