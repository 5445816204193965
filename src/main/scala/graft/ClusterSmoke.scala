package graft

import org.apache.spark.sql.{Row, SparkSession}

/** Multi-JVM smoke (r8 verdict task #2): everything to date ran local[*],
  * where driver and executors share one JVM — closure serialization of the
  * codegen kernels (their `addReferenceObj` payloads: codebooks, LUTs,
  * interned tables), per-JVM lazy caches (Sq8LutCache and friends), and the
  * broadcast path are never actually exercised across process boundaries.
  * `local-cluster[2,8,mem]` launches two REAL executor JVMs via the
  * standalone Worker, which falsifies all three.
  *
  * Protocol: run a representative query subset (one per kernel family +
  * catalog searches + lifecycle roundtrips + joins + streaming + the
  * multimodal mapPartitions seam) under plain local[16], then re-run the
  * same subset under local-cluster[2,8,3072] (same total cores, same
  * shuffle partitions), canonicalize both result sets row-by-row, and fail
  * loudly on any diff. Exit code 0 = green; nonzero lists the mismatches.
  *
  * Run: SPARK_HOME=/opt/spark sbt 'runMain graft.ClusterSmoke /root/testdata/sf0.01'
  * (SPARK_HOME is required — the Worker builds the executor JVM command
  * from the distribution's launcher classpath.)
  */
object ClusterSmoke {

  /** One representative per serialization-relevant family; the full 104-row
    * oracle harness stays on local[*] (this main is the cross-JVM lens, not
    * the correctness gate). */
  val subset: Seq[String] = Seq(
    // kernel rungs — codegen references (codebooks, quant tables) must
    // serialize into executor JVMs and LUT caches must rebuild per JVM
    "flat_scan_cosine", "flat_scan_f16", "flat_scan_sq8", "flat_scan_f8",
    "flat_scan_bf16", "flat_scan_binary", "flat_scan_dot",
    // filter + hybrid + multi-vector (broadcast semi-joins, composite trees)
    "filtered_search_composite", "hybrid_search", "multi_vector_search",
    // ANN ladder + batch API (IVF probe join, ADC LUT, WindowGroupLimit)
    "ivf_search", "pq_adc_search", "catalog_pq_search", "catalog_bin_search",
    "search_batch_flat", "knn_join", "ann_recall",
    // lifecycle: flush/claim/publish/fold with executors in other JVMs
    "snapshot_roundtrip", "delta_flush_roundtrip", "wal_replay",
    "upsert_merge",
    // r9 serving paths: the prepared plan's swapped literal must reach
    // executor JVMs per execution; the batch join runs over the flushed
    // cell-partitioned layout
    "prepared_search", "catalog_batch_ivf",
    // dedup family (banded LSH joins, bloom sketch as plan constant,
    // sign-LSH corpus screen)
    "dedup_minhash_lsh", "dedup_incremental", "dedup_semantic_incremental",
    // multimodal mapPartitions seam + single-pass text kernel
    "multimodal_features", "winnow_fingerprints",
    // structured-streaming ingest (state store + per-batch segments live
    // executor-side under local-cluster)
    "streaming_ingest_replay",
    // r10: pre-filter on the index rungs (pushed predicate + partition
    // pruning must compose in executor JVMs), the delta chain over an
    // indexed layout, and the export→import round trips (toLocalIterator
    // pulls partitions from executor JVMs; the importer's section scan
    // runs IN executors)
    "ivf_search_filtered", "pq_search_filtered", "bin_search_filtered",
    "delta_flush_ivf",
    // r11: the multi-vector IVF chain — routing-field cell assignment at
    // segment-encode time + the weighted probe both run in executor JVMs —
    // and the batch shape (top_cells explode + cell equi-join + window)
    "multi_vector_ivf", "multi_batch_ivf",
    "coltt_export_roundtrip", "coltt_export_mv_roundtrip",
  )

  private def canon(v: Any): String = v match {
    case null => "∅"
    case b: Array[Byte] => b.map(x => f"$x%02x").mkString
    case a: Array[_] => a.map(canon).mkString("[", ",", "]")
    case s: scala.collection.Seq[_] => s.map(canon).mkString("[", ",", "]")
    case m: scala.collection.Map[_, _] =>
      m.map { case (k, x) => canon(k) + "→" + canon(x) }.toSeq.sorted.mkString("{", ",", "}")
    case r: Row => r.toSeq.map(canon).mkString("(", ",", ")")
    case d: java.lang.Double => java.lang.Double.toHexString(d) // bit-exact
    case f: java.lang.Float => java.lang.Float.toHexString(f)
    case x => x.toString
  }

  private def session(master: String, extraCp: String): SparkSession = {
    val b = SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.default.parallelism", 16)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    if (master.startsWith("local-cluster")) {
      // executor JVMs need the graft classes (codegen kernels live here)
      // and the same JDK17 --add-opens set spark-submit would inject
      b.config("spark.executor.extraClassPath", extraCp)
        .config("spark.executor.memory", "2g")
        .config("spark.executor.extraJavaOptions",
          org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions())
    }
    val s = b.getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def runAll(spark: SparkSession, sfDir: String): Map[String, Either[String, Seq[String]]] =
    subset.map { name =>
      val r = try {
        val rows = SparkEntry.queries(name)(spark, sfDir).collect()
        Right(rows.map(r => canon(r)).sorted.toSeq)
      } catch {
        case scala.util.control.NonFatal(e) =>
          Left(s"${e.getClass.getSimpleName}: ${e.getMessage}")
      }
      name -> r
    }.toMap

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    require(sys.env.contains("SPARK_HOME"),
      "SPARK_HOME must point at the Spark distribution (local-cluster workers launch executors from it)")
    val extraCp = Seq(
      new java.io.File("target/scala-2.13/classes").getAbsolutePath,
      // generated resources land next to classes in this build; harmless if absent
    ).mkString(java.io.File.pathSeparator)

    println(s"[cluster-smoke] pass 1: local[16] over $sfDir (${subset.size} queries)")
    val local = {
      val s = session("local[16]", extraCp)
      try runAll(s, sfDir) finally s.stop()
    }
    val localErrs = local.collect { case (n, Left(e)) => s"  $n: $e" }
    if (localErrs.nonEmpty) {
      System.err.println("[cluster-smoke] BASELINE FAILURES (local[16]):\n" + localErrs.mkString("\n"))
      sys.exit(2)
    }

    println("[cluster-smoke] pass 2: local-cluster[2,8,3072] (2 executor JVMs)")
    val cluster = {
      val s = session("local-cluster[2,8,3072]", extraCp)
      try runAll(s, sfDir) finally s.stop()
    }

    var bad = 0
    subset.foreach { name =>
      (local(name), cluster(name)) match {
        case (Right(a), Right(b)) if a == b =>
          println(f"[cluster-smoke] PASS  $name%-28s (${a.size} rows)")
        case (Right(a), Right(b)) =>
          bad += 1
          val firstDiff = a.zip(b).indexWhere { case (x, y) => x != y }
          System.err.println(
            s"[cluster-smoke] DIFF  $name: local ${a.size} rows vs cluster ${b.size} rows" +
              (if (firstDiff >= 0)
                 s"\n  local  [$firstDiff]: ${a(firstDiff).take(300)}\n  cluster[$firstDiff]: ${b(firstDiff).take(300)}"
               else ""))
        case (_, Left(e)) =>
          bad += 1
          System.err.println(s"[cluster-smoke] FAIL  $name (cluster): $e")
        case (Left(e), _) => // unreachable: baseline errors exit above
          bad += 1
          System.err.println(s"[cluster-smoke] FAIL  $name (local): $e")
      }
    }
    println(s"[cluster-smoke] ${subset.size - bad}/${subset.size} queries identical across JVM boundaries")
    if (bad > 0) sys.exit(1)
  }
}
