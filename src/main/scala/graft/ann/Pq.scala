package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions._

/** Trained product-quantization codebook: `cents(j)(c)` is sub-codeword `c`
  * of subspace `j`. Subspace widths may vary; ksub ≤ 256 (codes are bytes).
  * Like the IVF centroid sidecar, a trained codebook is a small immutable
  * artifact: train once on the cluster, persist, broadcast into every
  * encode/search job via codegen reference objects. */
case class PqCodebook(cents: Array[Array[Array[Float]]]) {
  require(cents.nonEmpty, "empty codebook")
  def m: Int = cents.length
  def ksub: Int = cents(0).length
  def dim: Int = cents.map(_(0).length).sum
  def offsets: Array[Int] = cents.scanLeft(0)((o, cb) => o + cb(0).length).init

  /** Driver-side decode of one code — the reconstruction (sub-codeword
    * concatenation). Spec/debug surface, not a data path. */
  def reconstruct(code: Array[Byte]): Array[Float] = {
    require(code.length == m, s"code length ${code.length} != m=$m")
    cents.zip(code).flatMap { case (cb, b) => cb(b & 0xFF) }
  }

  /** Flat (m·ksub) table of SQUARED euclidean distances from `query`'s
    * subvectors to every sub-codeword — the per-query ADC table. Double
    * accumulation in array order, mirroring the engine's distance kernels. */
  def adcLut(query: Array[Float]): Array[Double] = {
    require(query.length == dim, s"query dimension ${query.length} != $dim")
    val lut = new Array[Double](m * ksub)
    var j = 0
    while (j < m) {
      val cb = cents(j); val off = offsets(j)
      require(cb.length == ksub, s"subspace $j has ${cb.length} codewords, expected $ksub")
      var c = 0
      while (c < cb.length) {
        val cc = cb(c)
        var acc = 0.0; var i = 0
        while (i < cc.length) {
          val t = query(off + i).toDouble - cc(i).toDouble; acc += t * t; i += 1
        }
        lut(j * ksub + c) = acc
        c += 1
      }
      j += 1
    }
    lut
  }
}

/** Product quantization over embedding columns — the memory-scale rung of
  * the ANN ladder (SURVEY.md §2 extensions): exact scan (recall 1.0) →
  * IVF cell pruning (I/O scale) → PQ codes (memory scale, 32-64× smaller).
  * At 100 TB the float vectors do not fit anywhere; the m-byte codes do,
  * and an ADC scan reads only codes + one per-query LUT.
  *
  * All per-row work is single-pass codegen kernels ([[graft.functions.pq_encode]],
  * [[graft.functions.pq_adc_distance]]); training runs all m subspaces'
  * Lloyd update in one distributed job per iteration. Composes with IVF:
  * encode per-cell residuals ([[residual]]) and ADC-scan probed cells
  * against per-cell tables ([[residualLuts]]) — true IVF-PQ. */
object Pq {

  /** Deterministic untrained codebook: the `ksub` id-smallest vectors,
    * sliced into `m` equal subspaces — the engine-reproducible seed (same
    * convention as the IVF first-k seed), and the oracle-checkable path.
    * [[train]] refines it with Lloyd iterations. */
  def seedCodebook(df: DataFrame, idCol: String, vecCol: String, m: Int, ksub: Int): PqCodebook = {
    require(ksub >= 1 && ksub <= 256, s"ksub must be in 1..256, got $ksub")
    val rows = df.orderBy(col(idCol).asc).limit(ksub)
      .select(vecCol).collect().map(_.getSeq[Float](0).toArray)
    require(rows.length == ksub, s"need at least ksub=$ksub rows, got ${rows.length}")
    val dim = rows(0).length
    require(dim % m == 0, s"dimension $dim not divisible into m=$m subspaces")
    val dsub = dim / m
    PqCodebook(Array.tabulate(m)(j => rows.map(_.slice(j * dsub, (j + 1) * dsub))))
  }

  /** Distributed Lloyd training for all m subspaces in ONE scan per
    * iteration (standard PQ k-means, Jégou §II): seed = the ksub id-smallest
    * rows sliced (same deterministic convention as [[seedCodebook]] and the
    * IVF seed), then each iteration is a single job — per row, m slice +
    * argmin expressions (the exact per-subspace semantics of
    * [[graft.functions.pq_encode]], pinned in PqSpec) exploded into
    * (subspace, cell, pos) partial sums; shuffle traffic is m·ksub·dsub
    * rows, independent of corpus size. The round-4 form trained each
    * subspace through its own [[Ann.trainCentroids]] call, re-filtering and
    * re-persisting its own sample — m corpus reads where one suffices, the
    * 100 TB training-path killer (measured 11.1 s vs ~2 s at 1M×128).
    *
    * `sampleMod` trains the Lloyd iterations on the deterministic 1/mod
    * id-hash subsample, filtered and persisted ONCE (the 100 TB path —
    * centroid quality needs a uniform sample, not every row). Empty cells
    * keep their previous sub-codeword. Codebook VALUES inherit the usual
    * float-summation-order caveat: persist the artifact, don't re-derive. */
  def train(df: DataFrame, idCol: String, vecCol: String, m: Int, ksub: Int,
            iterations: Int = 2, sampleMod: Option[Long] = None): PqCodebook =
    trainOpt(df, idCol, vecCol, m, ksub, iterations, sampleMod).getOrElse(
      throw new IllegalArgumentException(
        "requirement failed: cannot train a PQ codebook on an empty corpus"))

  /** [[train]], with "empty corpus" reported as None instead of a throw —
    * the dim probe returning zero rows IS the emptiness check, so callers
    * that skip the PQ layout on an empty corpus (flush) need no separate
    * `df.isEmpty` job (r14, guide §1.2). */
  def trainOpt(df: DataFrame, idCol: String, vecCol: String, m: Int, ksub: Int,
               iterations: Int = 2, sampleMod: Option[Long] = None): Option[PqCodebook] = {
    require(ksub >= 1 && ksub <= 256, s"ksub must be in 1..256, got $ksub")
    val dimRows = df.select(size(col(vecCol))).limit(1).collect()
    if (dimRows.isEmpty) return None
    val dim = dimRows(0).getInt(0)
    require(dim % m == 0, s"dimension $dim not divisible into m=$m subspaces")
    val dsub = dim / m
    val sampled = sampleMod.collect { case md if md > 1 =>
      df.where(pmod(xxhash64(col(idCol)), lit(md)) === 0)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }
    val base = sampled.getOrElse(df)
    try {
      def seedFrom(d: DataFrame) = d.orderBy(col(idCol).asc).limit(ksub)
        .select(vecCol).collect().map(_.getSeq[Float](0).toArray)
      val seed0 = seedFrom(base)
      // an over-aggressive sampleMod on a small collection must not look
      // empty — and the Lloyd iterations must fall back WITH the seed, else
      // they aggregate the empty sample to zero rows and silently ship the
      // untrained seed as the "trained" codebook
      val sampleEmpty = seed0.isEmpty && sampled.isDefined
      val rows = if (sampleEmpty) seedFrom(df) else seed0
      val train = if (sampleEmpty) df else base
      if (rows.isEmpty) return None // raced to empty between dim probe and seed
      var cents: Array[Array[Array[Float]]] =
        Array.tabulate(m)(j => rows.map(_.slice(j * dsub, (j + 1) * dsub)))
      for (_ <- 0 until iterations) {
        // assignment = ONE pq_encode_cells kernel call per row (the same
        // single-loop codegen kernel the encode pass uses — a per-subspace
        // argmin/struct/array composition falls out of whole-stage codegen
        // and runs ~60× slower interpreted); then one posexplode + one
        // (subspace, cell, pos) aggregation. Output rows: m·ksub·dsub.
        // NB: the kernel is aliased in its OWN projection below the explode —
        // `select(kernel, posexplode(...))` would make ExtractGenerator hoist
        // the kernel above the Generate and re-evaluate it once per exploded
        // ELEMENT (dim× the work; measured 24 s/iteration vs 1 s at 1M/16)
        val jCol = (col("pos") / lit(dsub)).cast("int")
        val sums = train
          .select(col(vecCol), pq_encode_cells(col(vecCol), cents).as("__cells"))
          .select(col("__cells"),
            posexplode(col(vecCol).cast("array<double>")).as(Seq("pos", "x")))
          .select(jCol.as("j"), pmod(col("pos"), lit(dsub)).cast("int").as("pos"),
            element_at(col("__cells"), jCol + 1).as("cell"), col("x"))
          .groupBy("j", "cell", "pos")
          .agg(sum(col("x")).as("sv"), count(lit(1)).as("n"))
          .collect()
        val byKey = sums.groupBy(r => (r.getAs[Int]("j"), r.getAs[Int]("cell")))
        cents = Array.tabulate(m) { j =>
          cents(j).zipWithIndex.map { case (old, c) =>
            byKey.get((j, c)) match {
              case None => old // empty cell: keep previous sub-codeword
              case Some(rs) =>
                val mean = new Array[Float](old.length)
                rs.foreach { r =>
                  mean(r.getAs[Int]("pos")) =
                    (r.getAs[Double]("sv") / r.getAs[Long]("n")).toFloat
                }
                mean
            }
          }
        }
      }
      Some(PqCodebook(cents))
    } finally sampled.foreach(_.unpersist(false))
  }

  /** Add the m-byte PQ code column (one single-pass kernel per row). */
  def encode(df: DataFrame, vecCol: String, cb: PqCodebook, codeCol: String = "pq_code"): DataFrame =
    df.withColumn(codeCol, pq_encode(col(vecCol), cb.cents))

  /** Element-wise residual `vec − centroid(cell)` for IVF-PQ (Jégou,
    * "Product Quantization for Nearest Neighbor Search", §IV.A): quantizing
    * residuals instead of raw vectors concentrates the codebook's dynamic
    * range around the cell center, materially improving recall at the same
    * m/ksub (asserted in PqSpec). The centroid table rides the expression
    * as one array literal indexed by the row's cell — centroid ids must be
    * the trainer's dense 0..k−1. */
  def residual(vec: Column, cell: Column, centroids: Seq[(Long, Array[Float])]): Column = {
    val sorted = centroids.sortBy(_._1)
    require(sorted.zipWithIndex.forall { case ((cid, _), i) => cid == i.toLong },
      "centroid ids must be dense 0..k-1 (the trainer's convention)")
    val table = typedlit(sorted.map(_._2.toSeq))
    zip_with(vec, element_at(table, (cell + lit(1)).cast("int")), (x, c) => x - c)
  }

  /** Per-cell ADC lookup tables for an IVF-PQ (residual) layout: table i =
    * the squared sub-distances of `query − centroid(cellIds(i))` against
    * every sub-codeword. Feed [[graft.functions.pq_adc_distance_cells]]. */
  def residualLuts(cb: PqCodebook, query: Array[Float],
                   centroids: Seq[(Long, Array[Float])]): (Array[Long], Array[Array[Double]]) = {
    val sorted = centroids.sortBy(_._1)
    val ids = sorted.map(_._1).toArray
    val luts = sorted.map { case (_, cv) =>
      require(cv.length == query.length, s"centroid dim ${cv.length} != query dim ${query.length}")
      cb.adcLut(Array.tabulate(query.length)(i => query(i) - cv(i)))
    }.toArray
    (ids, luts)
  }

  /** The reconstruction x̂ of each code (concat of the selected
    * sub-codewords — [[graft.functions.pq_decode]]). euclidean(q, decode)
    * IS the ADC distance arithmetically, which is what a MULTI-query ADC
    * ranking uses (query side a table, so no per-query LUT constant);
    * single-query serving stays on the LUT kernels. */
  def decode(code: Column, cb: PqCodebook): Column = pq_decode(code, cb.cents)

  /** Inverse of [[residual]]: add the row's cell centroid back — turns a
    * residual-code reconstruction into the full-vector reconstruction.
    * Like [[residual]] (the flush-path encoder this inverts), the centroid
    * table rides the plan as a typedlit array literal — cells×dim floats,
    * e.g. 128 KB at the 256×128 serving config; a configuration big enough
    * for this to matter (4096×1024 ≈ 16 MB) should move BOTH functions to
    * an `addReferenceObj` kernel together. */
  def addCentroid(vec: Column, cell: Column, centroids: Seq[(Long, Array[Float])]): Column = {
    val sorted = centroids.sortBy(_._1)
    require(sorted.zipWithIndex.forall { case ((cid, _), i) => cid == i.toLong },
      "centroid ids must be dense 0..k-1 (the trainer's convention)")
    val table = typedlit(sorted.map(_._2.toSeq))
    zip_with(vec, element_at(table, (cell + lit(1)).cast("int")), (x, c) => x + c)
  }

  /** ADC distance of every code against `query` (LUT built driver-side). */
  def adcDist(code: Column, cb: PqCodebook, query: Array[Float]): Column =
    pq_adc_distance(code, cb.adcLut(query), cb.ksub)

  /** Approximate top-k by ADC distance over an encoded corpus: one
    * code-column scan + partial top-k per partition (TakeOrderedAndProject)
    * — no float vectors touched. Output: (id, adc_dist). */
  def adcSearch(encoded: DataFrame, idCol: String, codeCol: String,
                cb: PqCodebook, query: Array[Float], k: Int): DataFrame =
    encoded
      .select(col(idCol), round(adcDist(col(codeCol), cb, query), 6).as("adc_dist"))
      .orderBy(col("adc_dist").asc, col(idCol).asc)
      .limit(k)

  /** ADC candidates re-ranked by exact distance: over-fetch `k·overFetch`
    * by ADC on the code scan, then score only those rows' float vectors —
    * the standard PQ recall repair, touching k·overFetch vectors instead of
    * the corpus. Input df needs both the code and the vector column. */
  def adcSearchRerank(df: DataFrame, idCol: String, codeCol: String, vecCol: String,
                      cb: PqCodebook, query: Array[Float], k: Int,
                      overFetch: Int = 4, metric: String = "euclidean"): DataFrame = {
    val cand = df
      .select(col(idCol), col(vecCol),
        adcDist(col(codeCol), cb, query).as("__adc"))
      .orderBy(col("__adc").asc, col(idCol).asc)
      .limit(k * overFetch)
    cand
      .select(col(idCol), round(distance(col(vecCol), lit(query), metric), 6).as("dist"))
      .orderBy(col("dist").asc, col(idCol).asc)
      .limit(k)
  }
}
