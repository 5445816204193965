package graft

import org.apache.spark.sql.functions._

import graft.functions.simhash64
import graft.text.{LangId, TextAnalysis}

/** Text-analysis module semantics: token counts, ratios, quality, language
  * ID, SimHash — unit layer under the oracle-checked PipelineQueries. */
class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("token and subword counts on known strings") {
    val df = Seq("hello world, foo!").toDF("text")
    val r = df.select(
      TextAnalysis.tokenCount(col("text")).as("t"),
      TextAnalysis.subwordCount("text").as("s")).head()
    assert(r.getInt(0) === 3)          // hello / world, / foo!
    assert(r.getInt(1) === 5)          // hello world , foo !
  }

  test("ONE token definition (\\s+) across every operator: multi-whitespace " +
    "text scores identically to its single-space normalization") {
    // "the  a\tand" has double spaces + a tab: under the \s+ definition it
    // must behave exactly like "the a and" in EVERY derived metric —
    // pre-r10, stopwordRatio/qualityScore/repetitionStats split on a
    // single space and silently counted phantom empty tokens
    val messy = "the  a\tand of\n to word"
    val clean = "the a and of to word"
    val df = Seq((0, messy), (1, clean)).toDF("doc_id", "text")
    val r = df.select(
      col("doc_id"),
      TextAnalysis.tokenCount(col("text")).as("n"),
      round(TextAnalysis.stopwordRatio("text", TextAnalysis.defaultStopwords), 6).as("sr"),
      round(TextAnalysis.qualityScore("text"), 6).as("q"))
      .collect().sortBy(_.getInt(0))
    assert(r(0).getInt(1) === 6 && r(1).getInt(1) === 6)
    assert(r(0).getDouble(2) === r(1).getDouble(2), "stopwordRatio must use tokens()")
    // quality differs only through length(text) (alpha + lenBand see the
    // raw string), never through phantom empty tokens: recompute both
    // scores from the \s+ token count and the raw lengths
    def expectQ(text: String): Double = {
      val toks = text.split("\\s+")
      val alpha = text.count(_.isLetter).toDouble / text.length
      val sr = toks.count(TextAnalysis.defaultStopwords.contains).toDouble / toks.length
      val band = if (text.length.toDouble / toks.length >= 3.0 &&
        text.length.toDouble / toks.length <= 10.0) 1.0 else 0.0
      BigDecimal(alpha * 0.5 + sr * 0.3 + band * 0.2)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(r(0).getDouble(3) === expectQ(messy))
    assert(r(1).getDouble(3) === expectQ(clean))
    // repetitionStats bigrams come from the same definition: the tab/double
    // spaces produce the identical bigram multiset
    val reps = TextAnalysis.repetitionStats(df, "doc_id", "text")
      .collect().sortBy(_.getInt(0))
    assert(reps(0).getLong(1) === reps(1).getLong(1))
    assert(reps(0).getDouble(2) === reps(1).getDouble(2))
  }

  test("alphaRatio counts only ascii letters") {
    val r = Seq("ab12").toDF("text")
      .select(TextAnalysis.alphaRatio(col("text"))).head().getDouble(0)
    assert(r === 0.5)
  }

  test("qualityScore stays within [0,1] on the documents table") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val mm = docs.select(
      min(TextAnalysis.qualityScore("text")).as("lo"),
      max(TextAnalysis.qualityScore("text")).as("hi")).head()
    assert(mm.getDouble(0) >= 0.0 && mm.getDouble(1) <= 1.0)
  }

  test("langid: marker-laden strings resolve to their language, zero evidence to unknown") {
    val df = Seq(
      ("the a and of to something", "en"),
      ("der die und das ist hier", "de"),
      ("el la que los una cosa", "es"),
      ("le les des est une chose", "fr"),
      ("的 是 在 了 和 什么", "zh"),
      ("zzz qqq xxx", "unknown")
    ).toDF("text", "expected")
    val rows = df.select(col("expected"), LangId.predict("text").as("got")).collect()
    rows.foreach(r => assert(r.getString(1) === r.getString(0), s"for expected=${r.getString(0)}"))
  }

  test("simhash64: identical token arrays agree; near texts are hamming-closer than far ones") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again today"),
      (2L, "the quick brown fox jumps over the lazy dog again tonight"),
      (3L, "entirely unrelated words appear inside this completely different sentence")
    ).toDF("id", "text")
    val fp = df.select(col("id"), simhash64(split(col("text"), " ")).as("f"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(fp(1L), fp(2L)) < hamming(fp(1L), fp(3L)))
    val again = df.where(col("id") === 1)
      .select(simhash64(split(col("text"), " "))).head().getLong(0)
    assert(again === fp(1L))
  }

  test("repetitionStats: repeated bigrams dominate; short texts yield no rows") {
    import spark.implicits._
    val df = Seq(
      (1L, "spam spam spam spam spam"),  // "spam spam" × 4 -> frac 1.0
      (2L, "all words here are unique"), // every bigram once -> 1/4
      (3L, "one")                        // no bigrams -> no row
    ).toDF("id", "text")
    val out = TextAnalysis.repetitionStats(df, "id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out(1L) === ((4L, 1.0)))
    assert(out(2L) === ((4L, 0.25)))
    assert(!out.contains(3L))
  }

  test("fingerprint is the md5 hex of the utf-8 text") {
    val got = Seq("abc").toDF("text")
      .select(TextAnalysis.fingerprint(col("text"))).head().getString(0)
    assert(got === "900150983cd24fb0d6963f7d28e17f72")
  }

  test("winnowing: shared ≥ w+k−1 substring guarantees a shared fingerprint") {
    import spark.implicits._
    import graft.text.Winnowing
    val shared = "quite a distinctive phrase indeed" // 33 chars ≥ 11 = w+k−1
    val df = Seq(
      (1L, s"first document begins then $shared and trails off here"),
      (2L, s"XXXX$shared!!!! unrelated remainder zzz"),
      (3L, "completely different content with no overlap at all whatsoever"),
      (4L, "tiny") // shorter than k → whole-text fallback
    ).toDF("id", "text")
    val fps = df.select(col("id"), Winnowing.fingerprints(col("text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    assert((fps(1L) & fps(2L)).nonEmpty, "winnowing guarantee violated")
    assert((fps(1L) & fps(3L)).isEmpty, "unrelated docs should not collide")
    assert(fps(4L).size === 1) // whole-text fallback fingerprint
    // determinism + density: distinct mins, ≤ one per window
    val n1 = df.where(col("id") === 1).select(length(col("text"))).head().getInt(0)
    assert(fps(1L).size <= n1 - 8 + 1 - 4 + 1)
    val again = df.where(col("id") === 1)
      .select(Winnowing.fingerprints(col("text"))).head().getSeq[Long](0).toSet
    assert(again === fps(1L))
  }

  test("winnow kernel equals the Column-combinator specification (as sets)") {
    import spark.implicits._
    import graft.text.Winnowing
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog repeatedly and often",
      "aaaaaaaaaaaaaaaaaaaaaa",            // all ties — deque tie handling
      "short",                              // < k -> whole-text fallback
      "exactly8",                           // == k -> one gram
      "ninechars",                          // k grams < w -> single window
      "",                                   // empty text
      "日本語のテキストと mixed ascii 混在", // multibyte char boundaries
      "ababababababababababababab"          // periodic — repeated window minima
    )
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val rows = df.select(col("id"),
        Winnowing.fingerprints(col("text")).as("kernel"),
        Winnowing.fingerprintsCombinator(col("text")).as("spec"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](1).toSet === r.getSeq[Long](2).toSet,
        s"id ${r.getLong(0)} diverged")
      // kernel output is sorted distinct
      val ks = r.getSeq[Long](1)
      assert(ks === ks.distinct.sorted, s"id ${r.getLong(0)} not sorted-distinct")
    }
  }

  test("winnowing: identical texts get identical fingerprint sets, copies detectable by equi-join") {
    import spark.implicits._
    import graft.text.Winnowing
    val base = "the winnowing algorithm selects minimum hashes from sliding windows"
    val df = Seq((1L, base), (2L, base), (3L, "nothing in common with those two documents"))
      .toDF("id", "text")
    val ex = df.select(col("id"), explode(Winnowing.fingerprints(col("text"))).as("fp"))
    val pairs = ex.as("a").join(ex.as("b"),
        col("a.fp") === col("b.fp") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b")).count()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((1L, 2L)))
  }
}
