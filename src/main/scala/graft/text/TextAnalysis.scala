package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * token counting, quality scoring, language ID, fingerprinting. All are
  * single-pass row-local Column expressions (no shuffle, codegen-friendly,
  * pushdown-transparent) — the shape that scales linearly to 100 TB.
  */
object TextAnalysis {

  /** Whitespace tokens (`\s+` runs collapse) — THE one token definition of
    * this module: tokenCount, stopwordRatio, qualityScore and
    * repetitionStats all derive from it (pinned by TextAnalysisSpec), so a
    * document with tabs/newlines/double spaces scores consistently across
    * every text operator. Oracle lockstep: DuckDB
    * `string_split_regex(text, '\s+')`. */
  def tokens(text: Column): Column = split(text, "\\s+")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword token count: word pieces + standalone punctuation
    * (`\w+|[^\w\s]`) — a cheap proxy for tokenizer cost estimation. */
  def subwordCount(text: Column): Column =
    size(regexp_extract_all(text, lit("\\w+|[^\\w\\s]"), lit(0)))

  /** Name-based convenience overload. */
  def subwordCount(textColName: String): Column = subwordCount(col(textColName))

  /** Alphabetic-character ratio ∈ [0,1]. */
  def alphaRatio(text: Column): Column =
    length(regexp_replace(text, "[^a-zA-Z]", "")).cast("double") / length(text)

  /** Stopword-hit ratio over [[tokens]]. Built from Column combinators
    * (typedlit + array_contains), not interpolated SQL text, so stopwords
    * containing quotes or SQL metacharacters are plain data. */
  def stopwordRatio(textColName: String, stopwords: Seq[String]): Column =
    hitCount(col(textColName), stopwords).cast("double") /
      size(tokens(col(textColName)))

  /** Count of [[tokens]] that appear in `words` (injection-safe: the word
    * list travels as an array literal, never as SQL text). */
  def hitCount(text: Column, words: Seq[String]): Column =
    size(filter(tokens(text), t => array_contains(typedlit(words), t)))

  val defaultStopwords: Seq[String] = Seq("the", "a", "and", "of", "to", "in", "is")

  /** Composite quality score ∈ [0,1]: alpha-ratio, stopword presence and a
    * mean-token-length band — the length/punct/stopword heuristic family used
    * by C4/Gopher-style corpus filters. */
  def qualityScore(textColName: String): Column = {
    val t = col(textColName)
    val meanTokLen = length(t).cast("double") / size(tokens(t))
    val lenBand = when(meanTokLen.between(3.0, 10.0), 1.0).otherwise(0.0)
    alphaRatio(t) * 0.5 + stopwordRatio(textColName, defaultStopwords) * 0.3 + lenBand * 0.2
  }

  /** Content fingerprint: md5 of the utf-8 text (hex string). */
  def fingerprint(text: Column): Column = md5(text.cast("binary"))

  /** Gopher-style repetition metrics: per document, the bigram count and
    * the fraction held by the most frequent word bigram — high values mark
    * boilerplate/spam for corpus filtering. Two aggregations keyed by
    * (id, bigram) then id: linear, map-side combined, no joins. */
  def repetitionStats(df: org.apache.spark.sql.DataFrame,
                      idCol: String, textColName: String): org.apache.spark.sql.DataFrame = {
    // token array lambda-bound once (see shingles note in Dedup.scala);
    // < 2 tokens → no bigrams (sequence(0,-1) would count DOWN, not empty)
    val bigrams = element_at(
      transform(array(tokens(col(textColName))), t =>
        when(size(t) >= 2,
          transform(sequence(lit(0), size(t) - 2),
            i => concat_ws(" ", get(t, i), get(t, i + 1))))
          .otherwise(array().cast("array<string>"))),
      1)
    df.select(col(idCol), explode(bigrams).as("__bg"))
      .groupBy(col(idCol), col("__bg")).agg(count(lit(1)).as("__c"))
      .groupBy(col(idCol))
      .agg(sum("__c").as("n_bigrams"),
        round(max(col("__c")).cast("double") / sum("__c"), 6).as("top_bigram_frac"))
  }
}

/** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03 —
  * the MOSS algorithm): hash every character k-gram (rolling-hash
  * semantics; the FNV-1a of each k-gram is position-independent, which is
  * all the rolling hash buys), then keep the MINIMUM hash of every window
  * of `w` consecutive k-grams, deduplicated. The winnowing guarantee: any
  * shared substring of length ≥ w + k − 1 between two documents yields at
  * least one shared fingerprint — so overlap detection needs only an
  * equi-join on fingerprints, never text comparison. Expected density is
  * 2/(w+1) fingerprints per character: a tunable sketch, not a full index.
  *
  * Row-local Column combinators throughout (one codegen'd projection, no
  * shuffle); every intermediate array is lambda-bound ONCE — Catalyst does
  * not CSE repeated references inside nested array expressions. */
object Winnowing {

  /** Distinct window-min fingerprints of `text` as a sorted array<long>.
    * Texts shorter than `k` fall back to one whole-text fingerprint.
    * Implemented as the single-pass monotonic-deque kernel
    * ([[graft.functions.winnow_fingerprints]]); the Column-combinator
    * formulation below pins its semantics. */
  def fingerprints(text: Column, k: Int = 8, w: Int = 4): Column =
    graft.functions.winnow_fingerprints(text, k, w)

  /** The same sketch from pure Column combinators (first-occurrence order,
    * not sorted) — the executable specification the kernel is tested
    * against (TextAnalysisSpec), and the form any SQL engine can replicate
    * (the DuckDB oracle mirrors it). */
  private[graft] def fingerprintsCombinator(text: Column, k: Int = 8, w: Int = 4): Column = {
    require(k >= 1 && w >= 1, "k and w must be positive")
    val grams = when(length(text) >= k,
        transform(sequence(lit(0), length(text) - k), i => text.substr(i + 1, lit(k))))
      .otherwise(array(text))
    element_at(transform(array(grams), g =>
      element_at(transform(array(transform(g, t => graft.functions.fnv64(t))), hs =>
        array_distinct(
          when(size(hs) >= w,
            transform(sequence(lit(0), size(hs) - w),
              j => array_min(slice(hs, j + 1, lit(w)))))
          .otherwise(array(array_min(hs))))), 1)), 1)
  }
}

/** Marker-word language ID — the n-gram-profile heuristic reduced to word
  * unigrams (character n-gram profiles are pointless on TESTDATA's shared-
  * charset synthetic text; real deployments swap in per-language profile
  * assets). Deterministic argmax with fixed tie order, 'unknown' on zero
  * evidence. */
object LangId {
  /** Profile order is the tie-break order. */
  val profiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "to"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "es" -> Seq("el", "la", "que", "los", "una"),
    "fr" -> Seq("le", "les", "des", "est", "une"),
    "zh" -> Seq("的", "是", "在", "了", "和"))

  def hitCount(textColName: String, markers: Seq[String]): Column =
    TextAnalysis.hitCount(col(textColName), markers)

  /** Predicted language column. */
  def predict(textColName: String): Column = {
    val hits = profiles.map { case (lang, markers) => lang -> hitCount(textColName, markers) }
    val best = greatest(hits.map(_._2): _*)
    hits.foldLeft(when(best === 0, lit("unknown"))) { case (acc, (lang, h)) =>
      acc.when(h === best, lit(lang))
    }
  }
}
