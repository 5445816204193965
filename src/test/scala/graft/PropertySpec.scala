package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.FilterExpr._
import graft.dedup.Dedup
import graft.streaming.ChangeFeed

/** Randomized property tests (seeded, deterministic): the filter-AST
  * compiler agrees with direct evaluation on arbitrary AND/OR trees, and
  * the LWW fold is invariant under arbitrary re-batching/permutation —
  * the reference's own test style (randomized inputs, structural
  * invariants; hnsw_commit_test.go:104-125). */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  // --- FilterExpr compile ≡ direct evaluation ---

  private def randTree(r: Random, depth: Int): FilterExpr = {
    val ops = Seq(Eq, Neq, Gt, Gte, Lt, Lte)
    def single = Single(
      if (r.nextBoolean()) "vec_id" else "label",
      ops(r.nextInt(ops.length)),
      r.nextInt(600).toLong)
    if (depth == 0 || r.nextInt(3) == 0) single
    else {
      val kids = Seq.fill(1 + r.nextInt(3))(randTree(r, depth - 1))
      if (r.nextBoolean()) And(kids) else Or(kids)
    }
  }

  private def evalTree(f: FilterExpr, row: Map[String, Long]): Boolean = f match {
    case Single(c, op, v) =>
      val a = row(c); val b = v.asInstanceOf[Long]
      op match {
        case Eq => a == b; case Neq => a != b; case Gt => a > b
        case Gte => a >= b; case Lt => a < b; case Lte => a <= b
      }
    case And(cs) => cs.forall(evalTree(_, row))
    case Or(cs)  => cs.exists(evalTree(_, row))
  }

  test("100 random filter trees: compiled Column matches direct evaluation") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("label").cast("long").as("label")).cache()
    val rows = emb.collect()
      .map(r => Map("vec_id" -> r.getLong(0), "label" -> r.getLong(1)))
    val r = new Random(42)
    (1 to 100).foreach { i =>
      val tree = randTree(r, depth = 3)
      val sparkIds = emb.where(tree.toColumn)
        .select("vec_id").collect().map(_.getLong(0)).sorted.toSeq
      val directIds = rows.filter(evalTree(tree, _)).map(_("vec_id")).sorted.toSeq
      assert(sparkIds === directIds, s"tree #$i: $tree")
    }
    emb.unpersist()
  }

  // --- LWW fold: batching/permutation invariance ---

  test("LWW fold result is invariant under arbitrary re-batching and order") {
    val r = new Random(7)
    val keys = ('a' to 'j').map(_.toString)
    val ops = (1 to 120).map { i =>
      (if (r.nextInt(5) == 0) "del" else "put",
        keys(r.nextInt(keys.length)), i.toLong, s"p$i") // unique versions
    }
    def foldIn(batches: Seq[Seq[(String, String, Long, String)]]): Map[String, (String, Long)] = {
      val empty = Seq.empty[(String, String, Long, String)]
        .toDF("op", "id", "version", "payload")
      val folded = batches.foldLeft(empty) { (state, b) =>
        ChangeFeed.fold(state, b.toDF("op", "id", "version", "payload"), "id", "version")
      }
      folded.collect().map(x =>
        x.getAs[String]("id") -> ((x.getAs[String]("op"), x.getAs[Long]("version")))).toMap
    }
    def randomBatches(seed: Int): Seq[Seq[(String, String, Long, String)]] = {
      val rr = new Random(seed)
      val shuffled = rr.shuffle(ops)
      // split into 1..6 random batches
      val cuts = Seq.fill(rr.nextInt(5))(rr.nextInt(ops.length)).sorted.distinct
      (Seq(0) ++ cuts ++ Seq(ops.length)).sliding(2).map {
        case Seq(a, b) => shuffled.slice(a, b)
      }.filter(_.nonEmpty).toSeq
    }
    val reference = foldIn(Seq(ops))
    Seq(1, 2, 3).foreach { seed =>
      assert(foldIn(randomBatches(seed)) === reference, s"seed $seed diverged")
    }
  }

  // --- arg_min_distance ≡ struct-array argmin under adversarial near-ties ---

  test("mergeLeaders converges to the single-log LWW fixpoint on random gossip") {
    // any partition of a write set into origin-tagged leader logs merges to
    // the state a direct max over the same (version, op, origin) total
    // order computes — 20 random worlds. Writes are unique per
    // (key, version, op, origin) so the order is genuinely total.
    val r = new Random(1306)
    val origins = Seq("l1", "l2", "l3")
    (1 to 20).foreach { world =>
      val keys = Seq("a", "b", "c", "d", "e")
      val writes = Seq.fill(12 + r.nextInt(20))((
          if (r.nextInt(4) == 0) "del" else "put",
          keys(r.nextInt(keys.length)),
          (1 + r.nextInt(5)).toLong,
          s"p${r.nextInt(1000)}",
          origins(r.nextInt(3))))
        .groupBy(w => (w._1, w._2, w._3, w._5)).map(_._2.head).toSeq
      val logs = origins.map(o => o -> writes.filter(_._5 == o)
        .map(w => (w._1, w._2, w._3, w._4)).toDF("op", "id", "version", "payload"))
      val merged = ChangeFeed.view(ChangeFeed.mergeLeaders(logs, "id", "version"))
        .select("id", "payload").collect().map(x => x.getString(0) -> x.getString(1)).toMap
      val want = writes.groupBy(_._2).flatMap { case (k, ws) =>
        val (op, _, _, payload, _) = ws.maxBy(w => (w._3, w._1, w._5))
        if (op == "put") Some(k -> payload) else None
      }
      assert(merged === want, s"world $world diverged")
    }
  }

  test("z-values stay in range and respect per-dimension bucket monotonicity") {
    import graft.operators.ZOrder
    val r = new Random(1891)
    val rows = Seq.fill(400)((r.nextLong().abs % 100000L, r.nextLong().abs % 3000L))
      .zipWithIndex.map { case ((x, y), i) => (i.toLong, x, y) }
    val df = rows.toDF("id", "x", "y")
    val bits = 6
    val shifts = ZOrder.fitShifts(df, Seq("x", "y"), bits)
    val out = df.withColumn("z", ZOrder.zvalue(Seq("x", "y"), shifts, bits))
      .collect().map(x => (x.getLong(1), x.getLong(2), x.getLong(3)))
    out.foreach { case (_, _, z) =>
      assert(z >= 0 && z < (1L << (2 * bits)), s"z out of range: $z") }
    // equal buckets in both dims ⇒ equal z; larger value in one dim with the
    // other fixed ⇒ z never decreases below the other's bucket prefix
    def bucket(v: Long, mn: Long, sh: Int) = (v - mn) >> sh
    out.toSeq.combinations(2).take(20000).foreach { case Seq((x1, y1, z1), (x2, y2, z2)) =>
      val bx1 = bucket(x1, shifts(0)._1, shifts(0)._2); val bx2 = bucket(x2, shifts(0)._1, shifts(0)._2)
      val by1 = bucket(y1, shifts(1)._1, shifts(1)._2); val by2 = bucket(y2, shifts(1)._1, shifts(1)._2)
      if (bx1 == bx2 && by1 == by2) assert(z1 === z2)
      if (bx1 <= bx2 && by1 <= by2) assert(z1 <= z2, s"dominance violated: ($bx1,$by1,z=$z1) vs ($bx2,$by2,z=$z2)")
      case _ => ()
    }
  }

  test("z-order buckets equal BigInt reference arithmetic over the FULL long domain") {
    import graft.operators.ZOrder
    // the halved-operand unsigned form must match floor((v - min) / 2^sh)
    // computed in exact arithmetic, for ANY longs — including spans past
    // 2^63 where plain subtraction wraps AND trips ANSI overflow checks
    val r = new Random(4242)
    val extremes = Seq(Long.MinValue, Long.MinValue + 1, -1L, 0L, 1L,
      Long.MaxValue - 1, Long.MaxValue)
    for (trial <- 0 until 12) {
      val bits = 2 + r.nextInt(10)
      val vals = (Seq.fill(60)(r.nextLong()) ++ extremes).distinct
      val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "h")
      val shifts = ZOrder.fitShifts(df, Seq("h"), bits)
      val (mn, sh) = shifts.head
      val got = df.withColumn("z", ZOrder.zvalue(Seq("h"), shifts, bits))
        .collect().map(x => x.getLong(1) -> x.getLong(2)).toMap
      def u(v: Long) = BigInt(v) - BigInt(Long.MinValue) // order-preserving unsigned map
      vals.foreach { v =>
        val ref = ((u(v) - u(mn)) >> sh).toLong
        assert(got(v) === ref, s"trial $trial bits $bits v $v mn $mn sh $sh")
        assert(got(v) >= 0 && got(v) < (1L << bits), s"out of range: ${got(v)}")
      }
    }
  }

  test("blockedJaccardPairs with random NULL blocks equals the null-safe brute force") {
    // NULL forms its own block (IS NOT DISTINCT FROM semantics): compare
    // against a driver-side brute force that groups by Option[String]
    val r = new Random(7331)
    val vocab = Seq("alpha", "beta", "gamma", "delta", "eps", "zeta")
    def text() = Seq.fill(2 + r.nextInt(7))(vocab(r.nextInt(vocab.length))).mkString(" ")
    val rows = (0 until 50).map { i =>
      val blk = r.nextInt(4) match {
        case 0 => null
        case n => s"b$n"
      }
      (i.toLong, text(), blk)
    }
    val t = 0.4
    val got = Dedup.blockedJaccardPairs(rows.toDF("id", "text", "blk"),
        "id", "text", Seq("blk"), t)
      .select("id_a", "id_b").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    def sh(s: String): Set[String] = {
      val tk = s.split(" ")
      if (tk.length < 3) Set(s) else tk.sliding(3).map(_.mkString(" ")).toSet
    }
    val expect = (for {
      a <- rows; b <- rows if a._1 < b._1 && Option(a._3) == Option(b._3)
      ja = sh(a._2); jb = sh(b._2)
      j = ja.intersect(jb).size.toDouble / ja.union(jb).size
      if j >= t
    } yield (a._1, b._1)).toSet
    assert(got === expect)
  }

  test("redaction is idempotent and never leaks a detectable span on random PII soup") {
    import graft.text.Pii
    val r = new Random(77)
    def randPii(): String = r.nextInt(4) match {
      case 0 => s"u${r.nextInt(1000)}@ex${r.nextInt(100)}.org"
      case 1 => s"${100 + r.nextInt(900)}-${100 + r.nextInt(900)}-${1000 + r.nextInt(9000)}"
      case 2 => s"${r.nextInt(256)}.${r.nextInt(256)}.${r.nextInt(256)}.${r.nextInt(256)}"
      case _ => s"${100 + r.nextInt(900)}-${10 + r.nextInt(90)}-${1000 + r.nextInt(9000)}"
    }
    val words = Seq("alpha", "beta", "gamma", "delta", "x9", "v1.2")
    val texts = Seq.fill(60) {
      Seq.fill(3 + r.nextInt(8))(
        if (r.nextInt(3) == 0) randPii() else words(r.nextInt(words.length))
      ).mkString(" ")
    }
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val red = df.select(col("id"), Pii.redact(col("text")).as("text"))
    // nothing detectable survives one redaction pass…
    assert(red.where(Pii.hasPii(col("text"))).count() === 0)
    // …so a second pass is the identity
    val twice = red.select(col("id"), Pii.redact(col("text")).as("text"))
    assert(red.exceptAll(twice).count() === 0)
  }

  test("arg_min_distance matches the naive argmin on duplicate and sub-round6-perturbed centroids") {
    val r = new Random(1234)
    val dim = 8
    def vec() = Array.fill(dim)(r.nextFloat() * 2 - 1)
    val base = vec()
    // adversarial codebook: exact duplicates (rounded-distance ties → lowest
    // cid must win), perturbations below and around the 1e-6 rounding window,
    // and ordinary random centroids
    val cents: Seq[(Long, Array[Float])] = Seq(
      0L -> base.map(x => x + 2e-7f),
      1L -> base.clone(),
      2L -> base.clone(), // exact tie with 1 → 1 wins
      3L -> base.map(x => x + 5e-7f),
      4L -> base.map(x => x - 1e-6f)
    ) ++ (5L to 20L).map(c => c -> vec())
    // rows: the tie point itself, near-tie points, and random vectors
    val rows = (Seq.fill(40)(base.clone()) ++
      Seq.fill(200)(vec()) ++
      (1 to 200).map(_ => base.map(x => x + (r.nextFloat() - 0.5f) * 2e-6f)))
      .zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) }
    val df = rows.toDF("id", "v")
    Seq("euclidean", "cosine", "manhattan", "dot").foreach { metric =>
      checkAgainstNaive(df, cents, metric)
    }
  }

  test("arg_min_distance matches the naive argmin at large magnitudes (ulp-adaptive window)") {
    val r = new Random(99)
    val dim = 4
    // components ~1e9 → euclidean distances ~1e10, where ulp(d) > the fixed
    // 1e-6 window — the adaptive bound must keep rounding parity
    def bigVec() = Array.fill(dim)((r.nextFloat() * 2 - 1) * 1e9f)
    val base = bigVec()
    val cents: Seq[(Long, Array[Float])] =
      Seq(0L -> base.clone(), 1L -> base.clone(), 2L -> base.map(x => x + 1f)) ++
        (3L to 10L).map(c => c -> bigVec())
    val rows = (Seq.fill(20)(base.clone()) ++ Seq.fill(100)(bigVec()))
      .zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) }
    val df = rows.toDF("id", "v")
    Seq("euclidean", "manhattan", "dot").foreach { metric =>
      checkAgainstNaive(df, cents, metric)
    }
  }

  private def checkAgainstNaive(df: org.apache.spark.sql.DataFrame,
                                cents: Seq[(Long, Array[Float])], metric: String): Unit = {
    val naive = cents.map { case (cid, cvec) =>
      struct(round(graft.functions.distance(col("v"), lit(cvec), metric), 6).as("d"),
        lit(cid).as("cid"))
    }
    val diverged = df.select(
        array_min(array(naive: _*)).getField("cid").as("want"),
        graft.functions.arg_min_distance(col("v"), cents, metric).as("got"))
      .where(col("want") =!= col("got"))
    assert(diverged.count() === 0L, s"kernel diverges from naive argmin on $metric")
  }

  test("newAgainstCorpus equals set-difference semantics on random corpora at random fpp") {
    // the sketch is an optimization, never a semantic: whatever the fpp or
    // how badly the sketch is sized, the output must be exactly the batch
    // rows whose text is absent from the corpus — duplicates-within-batch
    // retained, empty strings and non-ASCII included
    val r = new Random(7)
    def randText(): String = {
      val n = r.nextInt(6)
      val base = Seq.fill(n)(s"t${r.nextInt(30)}").mkString(" ")
      if (r.nextBoolean()) base + " é✓" else base
    }
    for (round <- 1 to 5) {
      val corpusTexts = Seq.fill(30 + r.nextInt(100))(randText())
      val batchTexts = Seq.fill(20 + r.nextInt(60))(
        if (r.nextBoolean()) corpusTexts(r.nextInt(corpusTexts.length)) else randText())
      val corpus = corpusTexts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val batch = batchTexts.zipWithIndex.map { case (t, i) => (1000L + i, t) }
        .toDF("doc_id", "text")
      val fpp = Seq(0.01, 0.1, 0.5)(r.nextInt(3))
      val expectedItems = 1L + r.nextInt(200)
      val got = Dedup.newAgainstCorpus(batch, corpus, "text", expectedItems, fpp)
        .select("doc_id").as[Long].collect().sorted.toSeq
      val corpusSet = corpusTexts.toSet
      val want = batchTexts.zipWithIndex
        .collect { case (t, i) if !corpusSet(t) => 1000L + i }.sorted
      assert(got === want, s"round $round fpp $fpp expectedItems $expectedItems")
    }
  }
}
