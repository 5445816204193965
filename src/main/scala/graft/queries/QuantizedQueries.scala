package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions._

/** Quantized flat scans — the e2e scenario family {f16, bf16, f8}_search
  * (FIXTURES.md §1). Both stored and query vectors are quantized, similarity
  * is computed on the dequantized values, mirroring
  * /root/reference/edge/f16_quantization.go:35-53.
  *
  * Oracle: the bit-level round trip dequantize(quantize(x)) is replicated
  * NUMERICALLY in DuckDB — for a float32-exact double, rounding |x| to the
  * format's mantissa step (2^(clamped_exponent − mbits)) with round-half-to-
  * even IS the bit algorithm: the division by a power of two is exact in
  * doubles, so floor/ties/evenness decisions match the kernel bit-for-bit
  * (verified against QuantKernels over random + subnormal + tie inputs).
  * Formats: f16 = (10 mantissa bits, min exp −14), bf16 = (7, −126),
  * f8 1-5-2 = (2, −14). This upgrades the three scans from rows-only checks
  * to full rows+schema+hash oracle rows.
  *
  * In a real collection the quantized column is materialized at ingest
  * (2-4× smaller parquet + scan); here it's computed on the fly because
  * TESTDATA is float32.
  */
object QuantizedQueries {
  import Tables.tbl

  /** Upper bound on [[binaryRecall]]'s broadcast query set (r15): the audit
    * samples every 101st vec_id, which grows with the corpus — this caps the
    * broadcast at a fixed sample (1024 queries ≈ 0.5 MB of vectors+codes)
    * while leaving every driver-SF result bit-identical (the cap only bites
    * past 101*1024 ids). */
  private[queries] val MaxRecallQueries = 1024L

  private def scan(s: SparkSession, dir: String, format: String): DataFrame = {
    val e = tbl(s, dir, "embeddings")
    val qv = e.where(col("vec_id") === 0).select("embedding").head().getSeq[Float](0).toArray
    // query round-tripped driver-side; stored side decoded INSIDE the fused
    // kernel (bit-identical to cosine_distance(dequantize(…)) — spec-pinned)
    val qDec = qv.map { x =>
      import graft.functions.QuantKernels._
      format match {
        case "f16"  => f16ToFloat(floatToF16(x))
        case "bf16" => bf16ToFloat(floatToBf16(x))
        case "f8"   => f8ToFloat(floatToF8(x))
      }
    }
    e.select(
        col("vec_id"),
        round(cosine_distance_quant(quantize(col("embedding"), format), lit(qDec), format), 6)
          .as("dist"))
      .orderBy(col("dist").asc, col("vec_id").asc)
      .limit(10)
  }

  /** SQ8 scan: per-dimension affine ranges trained from THIS corpus in one
    * aggregation, both sides quantized, distance fused over the 1-byte/dim
    * codes. The oracle re-trains the identical stats in SQL, so codes,
    * decodes, and distances replicate bit-for-bit (SqExpressions.scala). */
  private def scanSq8(s: SparkSession, dir: String): DataFrame = {
    val e = tbl(s, dir, "embeddings")
    val (mins, scales) = graft.ann.Sq.trainStats(e, "embedding")
    val qv = e.where(col("vec_id") === 0).select("embedding").head().getSeq[Float](0).toArray
    val qDec = graft.ann.Sq.roundTrip(qv, mins, scales)
    e.select(
        col("vec_id"),
        round(graft.ann.Sq.distance(
          graft.ann.Sq.encode(col("embedding"), mins, scales),
          qDec, mins, scales, "cosine"), 6).as("dist"))
      .orderBy(col("dist").asc, col("vec_id").asc)
      .limit(10)
  }

  /** Binary (1-bit/dim) scan: per-dimension midrange thresholds trained
    * from THIS corpus in one aggregation, sign bits packed to ceil(dim/8)
    * bytes, distance = Hamming (XOR + popcount) against the encoded query.
    * The oracle re-trains the identical thresholds in SQL and counts bit
    * mismatches dim-wise — packing order cancels out of the comparison, so
    * only the (exact, order-independent) bit decisions must agree. */
  private def scanBinary(s: SparkSession, dir: String): DataFrame = {
    val e = tbl(s, dir, "embeddings")
    val th = graft.ann.Bin.trainThresholds(e, "embedding")
    val qv = e.where(col("vec_id") === 0).select("embedding").head().getSeq[Float](0).toArray
    val qc = graft.ann.Bin.encodeOne(qv, th)
    e.select(
        col("vec_id"),
        graft.ann.Bin.hamming(graft.ann.Bin.encode(col("embedding"), th), qc).as("dist"))
      .orderBy(col("dist").asc, col("vec_id").asc)
      .limit(10)
  }

  /** The 100 TB two-pass retrieval shape: binary Hamming prefilter to a
    * 3× candidate set (the first pass scans 1/32 of the f32 bytes,
    * integer-only), then EXACT float cosine re-rank of the candidates.
    * Both passes are top-K bounded (TakeOrderedAndProject), so the second
    * pass touches 30 rows regardless of corpus size. */
  private def binaryRerank(s: SparkSession, dir: String): DataFrame = {
    val e = tbl(s, dir, "embeddings")
    val th = graft.ann.Bin.trainThresholds(e, "embedding")
    val qv = e.where(col("vec_id") === 0).select("embedding").head().getSeq[Float](0).toArray
    val qc = graft.ann.Bin.encodeOne(qv, th)
    val cands = e.select(col("vec_id"), col("embedding"),
        graft.ann.Bin.hamming(graft.ann.Bin.encode(col("embedding"), th), qc).as("h"))
      .orderBy(col("h").asc, col("vec_id").asc)
      .limit(30)
    cands.select(
        col("vec_id"),
        round(cosine_distance(col("embedding"), lit(qv)), 6).as("dist"))
      .orderBy(col("dist").asc, col("vec_id").asc)
      .limit(10)
  }

  /** Recall audit of the Hamming prefilter (the `ann_recall` discipline
    * applied to the binary rung): per query, |exact-euclidean top-10 ∩
    * Hamming top-30| / 10 — the number that justifies (or forbids) an
    * over-fetch setting before rollout.
    *
    * r14 shape (guide §1.2): formerly a driver loop building 2 TakeOrdered
    * subtrees PER QUERY unioned into one ~2·|queries|-branch plan —
    * Catalyst planning alone dominated the row. Now one batched pass per
    * arm: broadcast the (bounded, ≤ corpus/101) query set, score
    * corpus×queries row-locally, bound per-qid via a rank window that
    * Spark 4 executes as WindowGroupLimit (partial per-partition top-K
    * BEFORE the shuffle, the repo's plan-pinned T2 pattern) — so the
    * shuffle carries ≤ K rows per (qid, partition), never corpus×queries.
    * Order and tiebreak (h/d asc, vec_id asc) are identical to the former
    * per-query TakeOrdered loops, so the rows are bit-identical. */
  private def binaryRecall(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = tbl(s, dir, "embeddings")
    val th = graft.ann.Bin.trainThresholds(e, "embedding")
    // r15 (r14 VERDICT #4): the broadcast query set was corpus/101 rows —
    // unbounded in the corpus, so at 100 TB the audit would broadcast
    // millions of query vectors to every task. Cap it at the FIRST
    // MaxRecallQueries multiples of 101 — a deterministic bound (an
    // unordered limit() could pick different rows per run), identical to
    // the uncapped predicate whenever max(vec_id) < 101*MaxRecallQueries
    // (every driver SF: max vec_id 1999 at sf0.1), and mirrored in the
    // oracle SQL so the two stay semantically equal at ANY scale.
    val q = e.where(col("vec_id") % 101 === 0 &&
        col("vec_id") < lit(101L * MaxRecallQueries))
      .select(col("vec_id").as("qid"), col("embedding").as("qemb"),
        graft.ann.Bin.encode(col("embedding"), th).as("qc"))
    val wH = Window.partitionBy("qid").orderBy(col("h").asc, col("vec_id").asc)
    val cand = e.select(col("vec_id"), graft.ann.Bin.encode(col("embedding"), th).as("c"))
      .crossJoin(broadcast(q.select("qid", "qc")))
      .select(col("qid"), col("vec_id"),
        graft.ann.Bin.hammingCols(col("c"), col("qc")).as("h"))
      .withColumn("rn", row_number().over(wH)).where(col("rn") <= 30)
      .select(col("qid"), col("vec_id"), lit(1).as("__hit"))
    val wD = Window.partitionBy("qid").orderBy(col("d").asc, col("vec_id").asc)
    val exact = e.crossJoin(broadcast(q.select("qid", "qemb")))
      .select(col("qid"), col("vec_id"),
        round(euclidean_distance(col("embedding"), col("qemb")), 6).as("d"))
      .withColumn("rn", row_number().over(wD)).where(col("rn") <= 10)
      .select("qid", "vec_id")
    exact.join(cand, Seq("qid", "vec_id"), "left")
      .groupBy("qid")
      .agg(count(col("__hit")).as("hits"),
        (count(col("__hit")) / lit(10.0)).as("recall"))
      .orderBy("qid")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "flat_scan_f16" -> ((s, dir) => scan(s, dir, "f16")),
    "flat_scan_bf16" -> ((s, dir) => scan(s, dir, "bf16")),
    "flat_scan_f8" -> ((s, dir) => scan(s, dir, "f8")),
    "flat_scan_sq8" -> ((s, dir) => scanSq8(s, dir)),
    "flat_scan_binary" -> ((s, dir) => scanBinary(s, dir)),
    "binary_rerank" -> ((s, dir) => binaryRerank(s, dir)),
    "binary_recall" -> ((s, dir) => binaryRecall(s, dir))
  )

  /** dequantize(quantize(x)) as arithmetic on a float32-exact double:
    * round |x|/2^(max(e,emin)−mbits) half-to-even, scale back. The
    * exponent from log2 is correction-stepped to be exact at powers of 2. */
  private def qqSql(x: String, mbits: Int, emin: Int): String = {
    val ax = s"abs($x)"
    val e0 = s"CAST(floor(log2($ax)) AS BIGINT)"
    val e = s"""(CASE WHEN $ax < power(2.0, $e0) THEN $e0 - 1
               | WHEN $ax >= power(2.0, $e0 + 1) THEN $e0 + 1 ELSE $e0 END)""".stripMargin
    val step = s"power(2.0, greatest($e, $emin) - $mbits)"
    val r = s"($ax / $step)"
    val fl = s"floor($r)"
    val rne = s"""(CASE WHEN $r - $fl > 0.5 THEN $fl + 1
                 | WHEN $r - $fl < 0.5 THEN $fl
                 | ELSE $fl + CAST(CAST($fl AS BIGINT) % 2 AS DOUBLE) END)""".stripMargin
    s"(CASE WHEN $x = 0 THEN 0.0 ELSE sign($x) * $rne * $step END)"
  }

  /** The f16 round trip of a float list, as DOUBLE[] SQL — shared with the
    * multi-vector f16 oracle (PersistenceQueries.multi_vector_search_f16). */
  private[queries] def f16ListSql(c: String): String =
    s"list_transform($c::DOUBLE[], x -> ${qqSql("x", mbits = 10, emin = -14)})"

  private def oracleScan(mbits: Int, emin: Int): String = {
    val qq = qqSql("x", mbits, emin)
    s"""WITH q AS (SELECT list_transform(embedding::DOUBLE[], x -> $qq) AS qv
       |           FROM embeddings WHERE vec_id = 0),
       |s AS (SELECT vec_id, list_transform(embedding::DOUBLE[], x -> $qq) AS ev
       |      FROM embeddings)
       |SELECT s.vec_id, ROUND(ABS(1 - (list_inner_product(s.ev, q.qv) /
       |  (SQRT(list_inner_product(s.ev, s.ev)) * SQRT(list_inner_product(q.qv, q.qv))))), 6) AS dist
       |FROM s, q ORDER BY dist, vec_id LIMIT 10""".stripMargin
  }

  /** SQ8 oracle: train the identical per-dim (min, scale) stats in SQL,
    * quantize both sides with clamp(round((x−mn)/sc)) (round-half-up on a
    * non-negative operand — DuckDB's half-away == Java's Math.round there),
    * decode as mn + c·sc in doubles, cosine over the decodes. */
  private val sq8Oracle = {
    val dec = """CASE WHEN st.scs[i] <= 0 THEN st.mins[i]
                |      ELSE st.mins[i] + least(255, greatest(0,
                |        round((v[i] - st.mins[i]) / st.scs[i]))) * st.scs[i] END""".stripMargin
    s"""WITH s AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |d AS (SELECT generate_subscripts(v, 1) AS dim, unnest(v) AS x FROM s),
       |st0 AS (SELECT dim, min(x) AS mn, (max(x) - min(x)) / 255.0 AS sc
       |        FROM d GROUP BY dim),
       |st AS (SELECT list(mn ORDER BY dim) AS mins, list(sc ORDER BY dim) AS scs FROM st0),
       |dec AS (SELECT vec_id,
       |    list_transform(range(1, len(v) + 1), i -> $dec) AS ev
       |  FROM s, st),
       |q AS (SELECT ev AS qv FROM dec WHERE vec_id = 0)
       |SELECT dec.vec_id, ROUND(ABS(1 - (list_inner_product(dec.ev, q.qv) /
       |  (SQRT(list_inner_product(dec.ev, dec.ev)) * SQRT(list_inner_product(q.qv, q.qv))))), 6) AS dist
       |FROM dec, q ORDER BY dist, vec_id LIMIT 10""".stripMargin
  }

  /** Shared oracle prelude: re-train the midrange thresholds in SQL
    * ((min+max)/2 per dim — exact, order-independent doubles) and derive
    * per-vector bit lists; Hamming = dim-wise mismatch count. */
  private val binBitsCte =
    """WITH s AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |d AS (SELECT generate_subscripts(v, 1) AS dim, unnest(v) AS x FROM s),
      |th0 AS (SELECT dim, (min(x) + max(x)) / 2.0 AS t FROM d GROUP BY dim),
      |th AS (SELECT list(t ORDER BY dim) AS ts FROM th0),
      |b AS (SELECT vec_id, v, list_transform(range(1, len(v) + 1),
      |        i -> CASE WHEN v[i] > th.ts[i] THEN 1 ELSE 0 END) AS bits
      |      FROM s, th),
      |q AS (SELECT bits AS qb, v AS qv FROM b WHERE vec_id = 0)""".stripMargin

  private val binOracle =
    s"""$binBitsCte
       |SELECT b.vec_id, CAST(list_sum(list_transform(range(1, len(b.bits) + 1),
       |    i -> CASE WHEN b.bits[i] <> q.qb[i] THEN 1 ELSE 0 END)) AS BIGINT) AS dist
       |FROM b, q ORDER BY dist, vec_id LIMIT 10""".stripMargin

  private val binRerankOracle =
    s"""$binBitsCte,
       |c AS (SELECT b.vec_id, b.v,
       |        list_sum(list_transform(range(1, len(b.bits) + 1),
       |          i -> CASE WHEN b.bits[i] <> q.qb[i] THEN 1 ELSE 0 END)) AS h
       |      FROM b, q ORDER BY h, vec_id LIMIT 30)
       |SELECT c.vec_id, ROUND(ABS(1 - (list_inner_product(c.v, q.qv) /
       |  (SQRT(list_inner_product(c.v, c.v)) * SQRT(list_inner_product(q.qv, q.qv))))), 6) AS dist
       |FROM c, q ORDER BY dist, vec_id LIMIT 10""".stripMargin

  private val binRecallOracle =
    s"""$binBitsCte,
       |qs AS (SELECT vec_id AS qid, v AS qv, bits AS qb FROM b
       |       WHERE vec_id % 101 = 0 AND vec_id < ${101L * MaxRecallQueries}),
       |cand AS (SELECT qid, vec_id FROM (
       |  SELECT qs.qid, b.vec_id, ROW_NUMBER() OVER (PARTITION BY qs.qid ORDER BY
       |      list_sum(list_transform(range(1, len(b.bits) + 1),
       |        i -> CASE WHEN b.bits[i] <> qs.qb[i] THEN 1 ELSE 0 END)), b.vec_id) AS rn
       |  FROM qs, b) WHERE rn <= 30),
       |exact AS (SELECT qid, vec_id FROM (
       |  SELECT qs.qid, s.vec_id, ROW_NUMBER() OVER (PARTITION BY qs.qid ORDER BY
       |      ROUND(list_distance(s.v, qs.qv), 6), s.vec_id) AS rn
       |  FROM qs, s) WHERE rn <= 10)
       |SELECT e.qid, CAST(COUNT(c.vec_id) AS BIGINT) AS hits,
       |  COUNT(c.vec_id) / 10.0 AS recall
       |FROM exact e LEFT JOIN cand c ON c.qid = e.qid AND c.vec_id = e.vec_id
       |GROUP BY e.qid ORDER BY e.qid""".stripMargin

  val oracles: Map[String, String] = Map(
    "flat_scan_f16" -> oracleScan(mbits = 10, emin = -14),
    "flat_scan_bf16" -> oracleScan(mbits = 7, emin = -126),
    "flat_scan_f8" -> oracleScan(mbits = 2, emin = -14),
    "flat_scan_sq8" -> sq8Oracle,
    "flat_scan_binary" -> binOracle,
    "binary_rerank" -> binRerankOracle,
    "binary_recall" -> binRecallOracle
  )
}
