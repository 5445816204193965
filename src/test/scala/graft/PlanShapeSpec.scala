package graft

/** Physical-plan regression guards: the scale-critical properties PLANS.md
  * documents — filters at the scan, bounded shuffle counts, no stray
  * cartesian products — pinned so a future refactor cannot silently
  * reintroduce a shuffle or lose pushdown. Counting is on the pre-execution
  * plan text: `Exchange hashpartitioning` = a real shuffle (broadcast and
  * the final orderBy's range partitioning are counted separately). */
class PlanShapeSpec extends SparkSpec {

  private def plan(name: String): String = {
    // earlier suites may have cached the parquet tables (shared session) —
    // a substituted InMemoryRelation would hide the FileScan/PushedFilters
    // this suite asserts on
    spark.catalog.clearCache()
    SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan.toString
  }

  private def shuffles(p: String): Int = "Exchange hashpartitioning".r.findAllIn(p).length

  test("flat scans: zero shuffles of the corpus; top-K via TakeOrderedAndProject") {
    for (q <- Seq("flat_scan_cosine", "flat_scan_euclidean", "flat_scan_f16",
        "flat_scan_sq8", "flat_scan_f8", "flat_scan_bf16")) {
      val p = plan(q)
      assert(shuffles(p) === 0, s"$q shuffles the corpus:\n$p")
      assert(p.contains("TakeOrderedAndProject"), s"$q lost the bounded top-K:\n$p")
    }
  }

  test("filtered search: predicate reaches the parquet scan (PushedFilters)") {
    val p = plan("filtered_search_single")
    assert(shuffles(p) === 0)
    assert("PushedFilters: \\[[^\\]]*GreaterThanOrEqual".r.findFirstIn(p).isDefined,
      s"filter not pushed to the scan:\n$p")
  }

  test("hybrid search: ONE corpus scan — predicate carried in-scan, no join") {
    val p = plan("hybrid_search")
    // r11 shape: the candidate predicate is a boolean column evaluated in
    // the SAME scan that scores the over-fetch window, so the request is a
    // single bounded TakeOrderedAndProject pass over the corpus plus a
    // result-sized dedup. The pre-r11 shape re-scanned the corpus to
    // materialize filter survivors and broadcast-joined them — exactly the
    // regression this pins out: any join operator or second corpus scan
    // here doubles the request's I/O at 100 TB.
    assert(!p.contains("Join"), s"hybrid must not join — one-scan shape:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"hybrid lost the bounded top-K:\n$p")
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans === 1, s"hybrid must read the corpus exactly once, saw $scans scans:\n$p")
  }

  test("aggregation queries: one data shuffle with map-side partial aggregation") {
    // dedup_exact: groupBy(text) — partial + final around exactly one exchange
    val pd = plan("dedup_exact")
    assert(shuffles(pd) === 1, s"dedup_exact shuffle count:\n$pd")
    assert("partial".r.findFirstIn(pd.toLowerCase).isDefined, "no map-side partial agg")
    // lww_change_feed: the LWW fold is ONE shuffle on the key
    val pl = plan("lww_change_feed")
    assert(shuffles(pl) === 1, s"LWW fold must be a single keyed shuffle:\n$pl")
  }

  test("stable_ids: the distinct-aggregate double shuffle, nothing more") {
    val p = plan("stable_ids")
    assert(shuffles(p) <= 2, s"count-distinct needs at most 2 hash exchanges:\n$p")
  }

  test("winnow_fingerprints: row-local projection, zero data shuffles") {
    val p = plan("winnow_fingerprints")
    assert(shuffles(p) === 0, s"winnowing is per-row; a shuffle crept in:\n$p")
  }

  test("dedup_simhash: banded equi-join only — no shuffle beyond band join + distinct + hydration") {
    val p = plan("dedup_simhash")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"simhash dedup must pair via band equi-joins:\n$p")
  }

  test("doc_chunks: row-local chunk explode — zero data shuffles before the output sort") {
    val p = plan("doc_chunks")
    assert(shuffles(p) === 0, s"chunking is per-row; a shuffle crept in:\n$p")
  }

  test("dataset_split: pure projection + one aggregation shuffle") {
    val p = plan("dataset_split")
    assert(shuffles(p) === 1, s"split assignment must be row-local, agg one shuffle:\n$p")
  }

  test("decontaminate_eval: fingerprint equi-join, never doc-x-doc") {
    val p = plan("decontaminate_eval")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"decontamination must join on the fingerprint key:\n$p")
  }

  test("dedup_incremental: bloom probes on BOTH join sides, anti-join settles") {
    val p = plan("dedup_incremental")
    assert(p.contains("might_contain"), s"bloom prefilter missing:\n$p")
    assert(p.contains("LeftAnti"), s"exactness backstop join missing:\n$p")
    // the corpus relation must be probed (reverse filter) before the join:
    // both sides carry a might_contain, so it appears at least twice
    assert("might_contain".r.findAllIn(p).length >= 2,
      s"symmetric (corpus-side) bloom prune missing:\n$p")
  }

  test("heavy_hitters: codegen'd sketch prefilter, then ONE aggregation shuffle") {
    val p = plan("heavy_hitters")
    assert(shuffles(p) === 1, s"expected exactly the exact-count shuffle:\n$p")
    assert(p.contains("cms_estimate"), s"CMS prefilter missing from the plan:\n$p")
  }

  test("bucketed_join: the write-time layout eliminates the join shuffle") {
    // only the final orderBy's range partitioning remains; the join itself
    // must ride the bucket spec (zero hash exchanges)
    val p = plan("bucketed_join")
    assert(shuffles(p) === 0, s"bucketed join still shuffles:\n$p")
    assert(p.contains("SortMergeJoin"), s"merge hint lost:\n$p")
  }

  test("knn_join: probe cells via row-local kernel explode + ONE cell equi-join, never all-pairs") {
    val p = plan("knn_join")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"knn_join must pair via the cell equi-join, not all-pairs:\n$p")
    assert(p.contains("top_cells"), s"probe-cell kernel fell out of the plan:\n$p")
    assert(p.contains("Generate"), s"probe fan-out must be a row-local explode:\n$p")
    // the per-query ranking must carry Catalyst's partition-local group
    // limit (InferWindowGroupLimit): a bounded per-partition top-k heap
    // BELOW the qid exchange, so the window task receives <= partitions×k
    // rows per query instead of the raw nprobe×|cell| candidate set — the
    // 100× scale guard. If a refactor swaps row_number() for an expression
    // the rule cannot match, this assertion fails loudly.
    assert("WindowGroupLimit .*Partial".r.findFirstIn(p).isDefined,
      s"per-partition window group limit (the partition-local top-k pre-prune) missing:\n$p")
  }

  test("bm25: query-term restriction broadcasts; posting shuffles stay keyed") {
    val p = plan("bm25_topk")
    assert(!p.contains("CartesianProduct"), s"bm25 plans a cartesian:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"the 5-term query set must broadcast, never shuffle the tokens:\n$p")
    assert(!p.contains("SortMergeJoin") || shuffles(p) <= 4,
      s"bm25 shuffle budget exceeded (tf + dl + df + score join):\n$p")
  }

  test("flat_scan_binary / binary_rerank: zero corpus shuffles, bounded top-K") {
    for (q <- Seq("flat_scan_binary", "binary_rerank")) {
      val p = plan(q)
      assert(shuffles(p) === 0, s"$q shuffles the corpus:\n$p")
      assert(p.contains("TakeOrderedAndProject"), s"$q lost the bounded top-K:\n$p")
    }
  }

  test("fuzzy_pairs: deletion-variant equi-join, never all-pairs") {
    val p = plan("fuzzy_pairs")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"fuzzy join must pair via the variant equi-join:\n$p")
    assert(p.contains("Generate"), s"variant fan-out must be a row-local explode:\n$p")
  }

  test("text_normalize: row-local kernel, zero data shuffles before the output sort") {
    val p = plan("text_normalize")
    assert(shuffles(p) === 0, s"normalization is per-row; a shuffle crept in:\n$p")
    assert(p.contains("normalize_text"), s"kernel fell out of the plan:\n$p")
  }

  test("no query plans a CartesianProduct") {
    // the only legitimate unbounded pairing is blocked/banded equi-joins;
    // a cartesian in any registered query is a scale bug
    for ((name, _) <- SparkEntry.queries.toSeq.sortBy(_._1)
         if name.startsWith("dedup") || name.startsWith("ann") ||
            name.startsWith("flat") || name.startsWith("winnow") ||
            name.startsWith("pipeline")) {
      val p = plan(name)
      assert(!p.contains("CartesianProduct"), s"$name plans a cartesian:\n$p")
    }
  }
}
