package graft

import org.apache.spark.sql.functions._

import graft.text.NgramLm

/** Bigram-LM training and scoring — unit layer under the oracle-checked
  * `lm_perplexity` query. */
class NgramLmSpec extends SparkSpec {
  import spark.implicits._

  private val train = Seq(
    (1L, "the cat sat"), (2L, "the cat ran"), (3L, "the dog sat")
  ).toDF("doc_id", "text")
  // bigrams: "the cat"×2, "the dog"×1, "cat sat"×1, "cat ran"×1, "dog sat"×1
  // heads: the×3, cat×2, dog×1 ; vocab = {the, cat, dog, sat, ran} = 5

  test("train counts bigrams, heads, and vocab exactly") {
    val m = NgramLm.train(train, "text")
    val bg = m.bigrams.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bg === Map("the cat" -> 2L, "the dog" -> 1L, "cat sat" -> 1L,
      "cat ran" -> 1L, "dog sat" -> 1L))
    val hd = m.heads.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(hd === Map("the" -> 3L, "cat" -> 2L, "dog" -> 1L))
    assert(m.vocabSize === 5L)
  }

  test("caps keep the most frequent entries under a deterministic total order") {
    val m = NgramLm.train(train, "text", maxBigrams = 2, maxUnigrams = 1)
    val bg = m.bigrams.collect().map(_.getString(0)).toSet
    // the bigram cap keeps "the cat" (c=2) then "cat ran" (c=1 tie broken
    // on text), but "cat ran"'s HEAD fell out of the 1-entry unigram cap —
    // an orphaned bigram would score P > 1, so it leaves the model with
    // its head and only "the cat" ships
    assert(bg === Set("the cat"))
    assert(m.heads.collect().map(_.getString(0)).toSet === Set("the"))
  }

  test("score matches hand-computed smoothed log-likelihoods, seen and unseen") {
    val m = NgramLm.train(train, "text")
    def p(cbg: Long, chead: Long) = (cbg + 0.5) / (chead + 0.5 * 5)
    val got = NgramLm.score(
        Seq((10L, "the cat sat"), (11L, "the emu flew")).toDF("doc_id", "text"),
        "doc_id", "text", m)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // doc 10: "the cat" (2|3), "cat sat" (1|2)
    val want10 = (math.log(p(2, 3)) + math.log(p(1, 2))) / 2
    // doc 11: "the emu" (0|3), "emu flew" (0|0 — unseen head → 1/V)
    val want11 = (math.log(p(0, 3)) + math.log(p(0, 0))) / 2
    assert(got(10L)._1 === 2L)
    assert(math.abs(got(10L)._2 - want10) < 1e-12)
    assert(math.abs(got(11L)._2 - want11) < 1e-12)
    // a higher-likelihood doc scores higher
    assert(got(10L)._2 > got(11L)._2)
  }

  test("single-token docs have no bigrams and drop out") {
    val m = NgramLm.train(train, "text")
    val out = NgramLm.score(Seq((20L, "the"), (21L, "the cat")).toDF("doc_id", "text"),
      "doc_id", "text", m)
    assert(out.select("doc_id").as[Long].collect().toSeq === Seq(21L))
  }

  test("model caps are a contract error when < 1") {
    intercept[IllegalArgumentException](NgramLm.train(train, "text", maxBigrams = 0))
  }

  test("a bigram whose head fell out of the unigram cap cannot push P above 1") {
    // head 'x' (30) dominates the 1-entry unigram cap; bigram 'a b' (20)
    // stays under the bigram cap — pre-fix it scored with c_head = 0 and
    // P = 20.5 / (0.5·4) ≈ 10 (logp ≈ +2.3), ranking junk as top quality;
    // the orphaned bigram must instead take the unseen-head path (< 1)
    val docs = (Seq.fill(30)("x y") ++ Seq.fill(20)("a b")).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val m = NgramLm.train(docs, "text", maxBigrams = 2, maxUnigrams = 1)
    val scores = NgramLm.score(docs, "doc_id", "text", m)
      .select("avg_logp").as[Double].collect()
    assert(scores.nonEmpty)
    assert(scores.forall(_ <= 0.0),
      s"positive log-likelihood leaked through the cap: max=${scores.max}")
  }
}
