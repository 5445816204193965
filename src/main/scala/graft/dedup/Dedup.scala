package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document deduplication for training-data pipelines.
  *
  * Scale design: every method is a bounded number of shuffles keyed by
  * content (hash/band/block keys), never an all-pairs cross join —
  * the only quadratic step (exact Jaccard verification) runs on LSH/block
  * candidates, whose size is controlled by the banding parameters.
  */
object Dedup {

  /** Exact duplicates by content hash-groupBy: per distinct `textCol`, the
    * surviving id (min) and the duplicate count. One shuffle on the text
    * hash; map-side partial aggregation halves traffic. */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(col(textCol))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Drop exact duplicates, keeping the min-id representative. */
  def dropExactDuplicates(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.join(
      exactGroups(df, idCol, textCol).select(col("keep_id").as(idCol)),
      Seq(idCol), "left_semi")

  /** Exact Jaccard similarity of distinct 3-word-shingle sets between two
    * shingle-array columns. The intersection is bound to a lambda variable
    * (single-element transform) so it is computed ONCE per row, not once per
    * reference — Catalyst does not hoist common subexpressions out of
    * complex array expressions. */
  def jaccard(a: Column, b: Column): Column =
    element_at(
      transform(array(array_intersect(a, b)), inter =>
        size(inter).cast("double") /
          (size(array_distinct(a)) + size(array_distinct(b)) - size(inter))),
      1)

  /** 3-word shingles of a text column (whitespace tokens); short texts fall
    * back to the whole text as a single shingle.
    *
    * The token array is bound once as a lambda variable: writing
    * `split(text)[i]` inside the per-shingle lambda would re-split the WHOLE
    * text for every element reference — O(len²) per document, the round-1
    * sf0.1 bench killer (55 s for the MinHash pipeline, now ~2 s).
    * Built from Column combinators (`get` is 0-based like SQL `t[i]`), not
    * interpolated SQL text, so any column expression is safe input. */
  def shingles(text: Column): Column =
    element_at(
      transform(array(split(text, " ")), t =>
        when(size(t) >= 3,
          transform(sequence(lit(0), size(t) - 3),
            i => concat_ws(" ", get(t, i), get(t, i + 1), get(t, i + 2))))
          .otherwise(array(text))),
      1)

  /** Name-based convenience overload. */
  def shingles(textColName: String): Column = shingles(col(textColName))

  /** Deterministic sub-bucket salt for hot-key splitting: 0 when the
    * bucket is within `cap`, else FNV-1a(bucketKey|id) (sign-masked) mod
    * ceil(√m) — engine-independent, so any oracle can replicate it. Seeding
    * with the bucket key makes each hot band/block bucket its members
    * DIFFERENTLY, so a doc landing in a thin sub-bucket of one band still
    * meets companions in the others. */
  private[dedup] def subBucketSalt(id: Column, bucketKey: Column,
                                   bucketN: Column, cap: Long): Column =
    when(bucketN <= cap, lit(0L))
      .otherwise(pmod(
        graft.functions.fnv64(concat_ws("|", bucketKey.cast("string"), id.cast("string")))
          .bitwiseAND(lit(Long.MaxValue)),
        ceil(sqrt(bucketN)).cast("long")))

  /** Pairwise n-gram Jaccard within blocking keys (e.g. same lang+source):
    * the classic blocked-comparison shape — cross product only inside each
    * block, which AQE keeps balanced; block choice bounds the quadratic
    * term. Inside a block the work is |block|², so one hot key — an
    * empty-string lang, a megasite source — would otherwise dominate the
    * whole job at corpus scale: blocks over `maxBlockSize` are split into
    * ceil(√m) deterministic sub-buckets (pairs form within a sub-bucket;
    * see [[subBucketSalt]]), and blocks past maxBlockSize² are dropped as
    * the final backstop. The count pre-pass shuffles on the same block key
    * the join needs, so it adds no new partitioning. Emits pairs with
    * jaccard ≥ threshold. */
  def blockedJaccardPairs(
      df: DataFrame, idCol: String, textColName: String,
      blockCols: Seq[String], threshold: Double,
      maxBlockSize: Long = 10000L): DataFrame = {
    val withSh0 = df.select(
      (col(idCol) +: blockCols.map(col)) :+ shingles(textColName).as("__sh"): _*)
    val counts = withSh0.groupBy(blockCols.map(col): _*).agg(count(lit(1)).as("__bn"))
    // Pre-distinct the shingle sets and their sizes ONCE PER ROW: the
    // pairwise evaluation then needs exactly one set operation (the
    // intersect) — semantics unchanged (intersect of distinct sets =
    // distinct intersect; sizes match the generic jaccard's denominators).
    val withSh = withSh0.join(counts, blockCols)
      .where(col("__bn") <= lit(maxBlockSize) * lit(maxBlockSize))
      .withColumn("__salt", subBucketSalt(col(idCol),
        concat_ws("|", blockCols.map(c => col(c).cast("string")): _*), col("__bn"), maxBlockSize))
      // sorted once per ROW so every pairwise verify is a zero-allocation
      // merge (sorted_intersect_count) instead of a per-pair hash set
      .withColumn("__shd", array_sort(array_distinct(col("__sh"))))
      .withColumn("__nd", size(col("__shd")))
    val a = withSh.select(col(idCol).as("id_a") +: col("__salt").as("salt_a") +:
      blockCols.map(c => col(c)) :+ col("__shd").as("shd_a") :+ col("__nd").as("nd_a"): _*)
    val b = withSh.select(col(idCol).as("id_b") +: col("__salt").as("salt_b") +:
      blockCols.map(c => col(c).as(s"${c}_b")) :+ col("__shd").as("shd_b") :+ col("__nd").as("nd_b"): _*)
    // Size prefilter (set-similarity-join standard): J(A,B) ≤ min/max of the
    // distinct-set sizes, so pairs whose size ratio is already below the
    // threshold are pruned BEFORE the expensive intersection — results are
    // provably unchanged (the bound is implied by jaccard ≥ threshold).
    val sizeOk = least(a("nd_a"), b("nd_b")).cast("double") >=
      lit(threshold) * greatest(a("nd_a"), b("nd_b"))
    val joinCond = blockCols.map(c => a(c) === b(s"${c}_b")).reduce(_ && _) &&
      (a("salt_a") === b("salt_b")) && (a("id_a") < b("id_b")) && sizeOk
    a.join(b, joinCond)
      .select(col("id_a"), col("id_b"),
        jaccardPreDistinct(col("shd_a"), col("shd_b"), col("nd_a"), col("nd_b")).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /** Jaccard over PRE-SORTED, PRE-DISTINCT sets with precomputed sizes:
    * one zero-allocation merge-intersect per pair, lambda-bound so it
    * evaluates once (Catalyst does not CSE across the two references). */
  private[dedup] def jaccardPreDistinct(da: Column, db: Column, na: Column, nb: Column): Column =
    element_at(
      transform(array(graft.functions.sorted_intersect_count(da, db)), inter =>
        round(inter.cast("double") / (na + nb - inter), 6)),
      1)
}

/** MinHash + LSH near-duplicate detection: shingle → k min-hashes → band →
  * bucket-join → exact-Jaccard verify. Hash family is
  * `int64(first 15 hex digits of md5(j || '|' || shingle))` — deterministic,
  * engine-independent (the DuckDB oracle reproduces it bit-for-bit), and
  * uniform enough for MinHash's collision-probability guarantee. */
object MinHashLSH {

  private def sigExpr(sh: Column, j: Int): Column =
    graft.functions.minhash_sig(sh, j)

  /** Add `sig_0 .. sig_{k-1}` min-hash signature columns. Row-local: the
    * shingle array is materialized once in its own projection (non-cheap
    * aliases referenced k times are not inlined by CollapseProject), then k
    * hash passes read it — one codegen'd stage, no shuffle. */
  def withSignatures(df: DataFrame, textColName: String, k: Int): DataFrame = {
    val withSh = df.withColumn("__mh_sh", Dedup.shingles(textColName))
    (0 until k).foldLeft(withSh)((d, j) => d.withColumn(s"sig_$j", sigExpr(col("__mh_sh"), j)))
      .drop("__mh_sh")
  }

  /** Candidate pairs: ids sharing at least one LSH band
    * (k/bandSize bands of `bandSize` signature values). One explode + one
    * equi-join shuffle on the band key.
    *
    * Hot-band salting: a band shared by m documents yields m² candidate
    * pairs — one mass-duplicated boilerplate string can turn a single
    * bucket quadratic at corpus scale, and at 100 TB that boilerplate is
    * exactly what dedup exists to remove, so dropping the band (the round-2
    * behavior) silently kept every copy. Bands over `maxBandSize` members
    * are instead split into ceil(√m) deterministic sub-buckets (FNV-1a of
    * the id — engine-independent) and pairs form only within a sub-bucket:
    * per-band work drops from m² to m^1.5 while every member still meets
    * ~√m of its fellow duplicates, which is what duplicate-group detection
    * needs. Bands past maxBandSize² (whose sub-buckets would again exceed
    * the cap) are dropped — the final backstop. The count pre-pass shuffles
    * on the band key the join already needs. */
  def candidatePairs(sigs: DataFrame, idCol: String, k: Int, bandSize: Int,
                     maxBandSize: Long = 10000L): DataFrame = {
    require(k % bandSize == 0, "k must be divisible by bandSize")
    val bandKeys = (0 until k / bandSize).map { b =>
      val parts = (0 until bandSize).map(i => col(s"sig_${b * bandSize + i}").cast("string"))
      concat_ws(":", lit(b.toString) +: parts: _*)
    }
    val exploded = sigs.select(col(idCol), explode(array(bandKeys: _*)).as("band"))
    val counts = exploded.groupBy("band").agg(count(lit(1)).as("__bn"))
    val salted = exploded.join(counts, Seq("band"))
      .where(col("__bn") <= lit(maxBandSize) * lit(maxBandSize))
      .withColumn("__salt",
        Dedup.subBucketSalt(col(idCol), col("band"), col("__bn"), maxBandSize))
    val l = salted.select(col(idCol).as("id_a"), col("band"), col("__salt"))
    val r = salted.select(col(idCol).as("id_b"), col("band"), col("__salt"))
    l.join(r, Seq("band", "__salt")).where(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  /** Full pipeline: LSH candidates verified by exact shingle Jaccard. */
  def nearDuplicates(
      df: DataFrame, idCol: String, textColName: String,
      k: Int = 8, bandSize: Int = 2, threshold: Double = 0.5,
      maxBandSize: Long = 10000L): DataFrame = {
    val sigs = withSignatures(df, textColName, k)
    val cands = candidatePairs(sigs, idCol, k, bandSize, maxBandSize)
    // hydrate candidates with pre-distinct shingle sets: one intersect per
    // verified pair (see jaccardPreDistinct)
    val sh = df.select(col(idCol), Dedup.shingles(textColName).as("__sh"))
      .select(col(idCol), array_sort(array_distinct(col("__sh"))).as("__shd"))
      .withColumn("__nd", size(col("__shd")))
    cands
      .join(sh.select(col(idCol).as("id_a"), col("__shd").as("shd_a"), col("__nd").as("nd_a")), Seq("id_a"))
      .join(sh.select(col(idCol).as("id_b"), col("__shd").as("shd_b"), col("__nd").as("nd_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        Dedup.jaccardPreDistinct(col("shd_a"), col("shd_b"), col("nd_a"), col("nd_b")).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }
}
