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
  * [[graft.functions.pq_adc_distance]]); training reuses the distributed
  * Lloyd machinery of [[Ann.trainCentroids]] per subspace. Composes with IVF:
  * encode the residual-free codes per cell and ADC-scan only probed cells. */
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

  /** Distributed per-subspace Lloyd training (standard PQ k-means): each
    * subspace trains independently on the sliced column via
    * [[Ann.trainCentroids]] — m small trainings, each one assignment scan +
    * one (cell, dim) aggregation per iteration. `sampleMod` trains on the
    * deterministic 1/mod id-hash subsample (the 100 TB path; see
    * trainCentroids). Codebook VALUES inherit trainCentroids'
    * summation-order caveat: persist the artifact, don't re-derive. */
  def train(df: DataFrame, idCol: String, vecCol: String, m: Int, ksub: Int,
            iterations: Int = 2, sampleMod: Option[Long] = None): PqCodebook = {
    require(ksub >= 1 && ksub <= 256, s"ksub must be in 1..256, got $ksub")
    val dim = df.select(size(col(vecCol))).head().getInt(0)
    require(dim % m == 0, s"dimension $dim not divisible into m=$m subspaces")
    val dsub = dim / m
    val cents = Array.tabulate(m) { j =>
      val sub = df.select(col(idCol), slice(col(vecCol), j * dsub + 1, dsub).as("__sub"))
      Ann.trainCentroids(sub, idCol, "__sub", ksub, "euclidean", iterations, sampleMod)
        .sortBy(_._1).map(_._2).toArray
    }
    PqCodebook(cents)
  }

  /** Add the m-byte PQ code column (one single-pass kernel per row). */
  def encode(df: DataFrame, vecCol: String, cb: PqCodebook, codeCol: String = "pq_code"): DataFrame =
    df.withColumn(codeCol, pq_encode(col(vecCol), cb.cents))

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
