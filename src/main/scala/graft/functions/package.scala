package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft._
import org.apache.spark.sql.{functions => F}

/** Column-level API over the graft Catalyst expressions — the user-facing
  * scalar-function surface (SURVEY.md §2.8). Mirrors the naming of the
  * reference's distance kernels; everything returns codegen-friendly Columns.
  */
package object functions {
  import GraftBridge.{column, expression}

  /** Make the graft kernels callable from plain `spark.sql(...)`:
    * cosine/euclidean/manhattan distance, vec_dot, l2_norm, l2_normalize,
    * simhash64, fnv64, sorted_intersect_count — the same codegen'd
    * Catalyst expressions as this Column API, registered in the session's
    * function registry (session-scoped, no UDF indirection). */
  def registerSqlFunctions(spark: org.apache.spark.sql.SparkSession): Unit =
    GraftBridge.registerSqlFunctions(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession])

  def vec_dot(a: Column, b: Column): Column =
    column(VecDotProduct(expression(a), expression(b)))

  def cosine_distance(a: Column, b: Column): Column =
    column(VecCosineDistance(expression(a), expression(b)))

  def euclidean_distance(a: Column, b: Column): Column =
    column(VecEuclideanDistance(expression(a), expression(b)))

  def manhattan_distance(a: Column, b: Column): Column =
    column(VecManhattanDistance(expression(a), expression(b)))

  def l2_norm(v: Column): Column = column(VecL2Norm(expression(v)))

  /** IVF assignment kernel: cid of the nearest centroid (rounded-distance
    * argmin, lowest cid on ties). One constant-size codegen loop over the
    * embedded codebook — stays in whole-stage codegen at k=4096 where the
    * per-centroid expression expansion would fall back to interpreted eval. */
  def arg_min_distance(v: Column, centroids: Seq[(Long, Array[Float])], metric: String): Column = {
    val sorted = centroids.sortBy(_._1)
    column(VecArgMinDistance(expression(v),
      sorted.map(_._1).toArray, sorted.map(_._2).toArray, metric))
  }

  /** Probe-cell kernel: the `nprobe` nearest centroid cids, best-first,
    * under the (round(dist,6), cid) total order — `arg_min_distance`
    * generalized to top-n, same constant-size codegen loop. Feeds
    * [[graft.ann.Ann.knnJoin]]'s per-query cell fan-out. */
  def top_cells(v: Column, centroids: Seq[(Long, Array[Float])], metric: String,
                nprobe: Int): Column = {
    val sorted = centroids.sortBy(_._1)
    column(VecTopCells(expression(v),
      sorted.map(_._1).toArray, sorted.map(_._2).toArray, metric, nprobe))
  }

  /** 64-bit SimHash fingerprint of a token array (near-dup detection). */
  def simhash64(tokens: Column): Column = column(SimHash64(expression(tokens)))

  /** Ingest-side text canonicalization: NFC → control-char strip →
    * whitespace collapse → trim (TextKernels.normalizeText). */
  def normalize_text(text: Column): Column = column(NormalizeText(expression(text)))

  /** |a ∩ b| of two SORTED, DISTINCT string arrays — zero-allocation merge
    * (the dedup-verify kernel; `array_intersect` hashes per evaluation). */
  def sorted_intersect_count(a: Column, b: Column): Column =
    column(SortedIntersectCount(expression(a), expression(b)))

  /** One MinHash signature component over a shingle array (md5-family,
    * seed-prefixed) — the allocation-free form of
    * `array_min(transform(sh, s -> conv(substr(md5(seed|s),1,15),16,10)))`. */
  def minhash_sig(shingles: Column, seed: Int): Column =
    column(MinHashSig(expression(shingles), seed))

  /** All `k` MinHash signature components (seeds 0..k−1) as one
    * array<long> — bit-identical to k [[minhash_sig]] columns, one pass. */
  def minhash_sigs(shingles: Column, k: Int): Column =
    column(MinHashSigs(expression(shingles), k))

  /** FNV-1a-style shard routing (reference pkg/sharding — F11): stable
    * bucket in [0, n). Murmur3 via Spark's hash(): same contract, codegen'd. */
  def shard_hash(c: Column, n: Int): Column = F.pmod(F.hash(c), F.lit(n))

  /** FNV-1a 64 of a string column — the reference's exact hash family
    * (pkg/sharding/shard.go:34-41); engine-independent, oracle-replicable. */
  def fnv64(c: Column): Column = column(Fnv64(expression(c)))

  /** Winnowing (MOSS) fingerprint sketch of a text column: sorted distinct
    * window-`w` minima of the char-`k`-gram FNV hashes, as array<long>. */
  def winnow_fingerprints(text: Column, k: Int, w: Int): Column =
    column(WinnowFingerprints(expression(text), k, w))

  /** Reference-parity shard routing: FNV-1a-64 mod `shards`
    * (ShardVertexV2, pkg/sharding/shard.go:43-48). `shards` must be a power
    * of two (the reference uses EDGE_MAP_SHARD_COUNT=16) so the unsigned mod
    * is a low-bit mask — identical on the signed representation in any
    * engine. */
  def fnv_shard(c: Column, shards: Int): Column = {
    require(shards > 0 && (shards & (shards - 1)) == 0, "shards must be a power of two")
    fnv64(c).bitwiseAND(F.lit((shards - 1).toLong))
  }

  /** F10: commit-id generation (reference edge/id_generator.go +
    * pkg/snowflake — timestamp|node|sequence uint64). Spark's
    * monotonically_increasing_id IS the snowflake shape (partition id in
    * the high bits, per-partition sequence low) minus the wall clock —
    * unique within a job, NOT stable across runs. */
  def snowflake_id(): Column = F.monotonically_increasing_id()

  /** Deterministic alternative for pipelines that need replayable ids
    * (SURVEY.md §2.8 F10 note): 64-bit hash of the primary key — stable
    * across runs/engines; collision odds ~n²/2⁶⁵ (≈3·10⁻⁸ at 1M rows),
    * acceptable for commit ids, not for pk replacement. */
  def stable_id(pk: Column): Column = F.xxhash64(pk)

  /** Product-quantization encode: the m-byte PQ code of a float32 vector
    * (per-subspace nearest sub-codeword, euclidean, round-6 tie-to-lowest).
    * `codebook(j)(c)` = sub-codeword c of subspace j; one constant-size
    * codegen loop regardless of m·ksub. See [[graft.ann.Pq]]. */
  def pq_encode(v: Column, codebook: Array[Array[Array[Float]]]): Column =
    column(PqEncode(expression(v), codebook))

  /** [[pq_encode]] with `array<int>` output (one cell id per subspace) —
    * the Lloyd trainer's form: the per-element aggregation needs
    * `element_at` over the assignments, which SQL has for arrays but not
    * for binary. Same kernel, same argmin semantics. */
  def pq_encode_cells(v: Column, codebook: Array[Array[Array[Float]]]): Column =
    column(PqEncode(expression(v), codebook, asInts = true))

  /** pq_decode(code): the reconstruction (concat of selected sub-codewords)
    * — euclidean(query, pq_decode(code)) equals the ADC distance, the shape
    * multi-query ADC rankings use (see PqExpressions.PqDecode). */
  def pq_decode(code: Column, codebook: Array[Array[Array[Float]]]): Column =
    column(PqDecode(expression(code), codebook))

  /** Asymmetric PQ distance: `sqrt(Σⱼ lutSq[j·ksub + code[j]])` over an
    * m-byte code column — `lutSq` holds per-query SQUARED sub-distances
    * (built by [[graft.ann.PqCodebook.adcLut]]). */
  def pq_adc_distance(code: Column, lutSq: Array[Double], ksub: Int): Column =
    column(PqAdcDistance(expression(code), lutSq, ksub))

  /** Residual (IVF-PQ) ADC distance: per-cell lookup tables — row `cell`
    * selects its table via binary search over the sorted `cellIds`.
    * `lutsSq(i)` = squared sub-distances of `query − centroid(cellIds(i))`
    * against every sub-codeword. */
  def pq_adc_distance_cells(code: Column, cell: Column, cellIds: Array[Long],
                            lutsSq: Array[Array[Double]], ksub: Int): Column =
    column(PqAdcDistanceCells(expression(code), expression(cell), cellIds, lutsSq, ksub))

  /** Residual ADC with EXECUTOR-BUILT tables from a per-version broadcast
    * sidecar — ships the query (dim floats) instead of cells·m·ksub
    * doubles per request; tables bit-identical to
    * [[pq_adc_distance_cells]]'s (PqSpec pins it). `query` must be a
    * plan constant (literal / prepared placeholder). */
  def pq_adc_distance_cells_bc(code: Column, cell: Column, query: Column,
      bc: org.apache.spark.broadcast.Broadcast[
        org.apache.spark.sql.graft.PqBcSidecar]): Column =
    column(PqAdcDistanceCellsBc(expression(code), expression(cell),
      expression(query), bc))

  /** F6-F8: encode a float32 vector column as f16 / bf16 / f8. */
  def quantize(v: Column, format: String): Column =
    column(QuantizeVector(expression(v), format))

  /** Decode a quantized vector column back to float32. */
  def dequantize(v: Column, format: String): Column =
    column(DequantizeVector(expression(v), format))

  /** Fused distance over a quantized stored vector and a float32 query:
    * decodes inside the scan loop — bit-identical to
    * `distance(dequantize(v), q, metric)` without the per-row intermediate
    * array (the quantized-scan hot path at scale). */
  def distance_quant(quantized: Column, query: Column, format: String, metric: String): Column =
    column(VecDistanceQuant(expression(quantized), expression(query), format, metric))

  def cosine_distance_quant(quantized: Column, query: Column, format: String): Column =
    distance_quant(quantized, query, format, "cosine")

  def l2_normalize(v: Column): Column = column(VecL2Normalize(expression(v)))

  /** Display-score transform (F5): cosine → ((2−d)/2)·100, euclidean →
    * max(0, 100−d). Exact formulas from
    * /root/reference/edge/edge_helper.go:143-148.
    * `dot` is our extension (the reference has no dot metric, so it also has
    * no display formula): dist = −dot, and we define
    * score = 50·(1 − dist/(1+|dist|)) ∈ (0,100) — monotone in the dot
    * product, keeps the 0-100 display contract, 50 = orthogonal. */
  def score_from_distance(dist: Column, metric: String): Column = metric match {
    case "cosine"    => (F.lit(2.0) - dist) / F.lit(2.0) * F.lit(100.0)
    case "euclidean" => F.greatest(F.lit(0.0), F.lit(100.0) - dist)
    case "dot"       => F.lit(50.0) - F.lit(50.0) * dist / (F.lit(1.0) + F.abs(dist))
    case other       => throw new IllegalArgumentException(s"unknown metric: $other")
  }

  /** Distance column for a configured metric name. */
  def distance(a: Column, b: Column, metric: String): Column = metric match {
    case "cosine"    => cosine_distance(a, b)
    case "euclidean" => euclidean_distance(a, b)
    case "manhattan" => manhattan_distance(a, b)
    case "dot"       => -vec_dot(a, b) // higher dot = closer; negate so lower = better
    case other       => throw new IllegalArgumentException(s"unknown metric: $other")
  }
}
