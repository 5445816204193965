package graft

import org.apache.spark.sql.functions._

import graft.ann.Ann

/** ANN module semantics: brute-force top-k, sign-LSH pairs, IVF assign +
  * probe — unit layer under the oracle-checked PipelineQueries. */
class AnnSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read.parquet(s"$sfDir/embeddings.parquet").cache()

  test("bruteForceTopK: each query's own row ranks first at dist 0; k respected") {
    val qs = emb.where(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val out = Ann.bruteForceTopK(emb, qs, k = 4, "vec_id", "embedding", "qid", "qvec")
    val rows = out.collect()
    assert(rows.length === 12)
    (0 until 3).foreach { q =>
      val first = rows.filter(_.getAs[Long]("qid") == q.toLong).minBy(_.getAs[Int]("rn"))
      assert(first.getAs[Long]("vec_id") === q.toLong)
      assert(first.getAs[Double]("dist") === 0.0)
    }
  }

  test("signBucket: identical vectors share a bucket, negated vectors do not") {
    val planes = Seq(Array(1.0f, 0.0f), Array(0.5f, 0.5f))
    val df = Seq(
      (1L, Seq(1.0f, 2.0f)), (2L, Seq(1.0f, 2.0f)), (3L, Seq(-1.0f, -2.0f))
    ).toDF("id", "v")
    val b = df.select(col("id"), Ann.signBucket(col("v"), planes).as("bucket"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(b(1L) === b(2L))
    assert(b(1L) !== b(3L))
  }

  test("signLshPairs finds same-bucket near-identical pairs with exact sim verify") {
    val df = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f)), (2L, Seq(0.99f, 0.01f, 0.0f)), // near-dup
      (3L, Seq(-1.0f, 0.0f, 0.0f))                                // opposite
    ).toDF("id", "v")
    val planes = Seq(Array(1.0f, 0.0f, 0.0f))
    val pairs = Ann.signLshPairs(df, "id", "v", planes, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq === Seq((1L, 2L)))
  }

  test("ivfAssign picks the nearest centroid with deterministic tiebreak") {
    val centroids = Seq((0L, Array(0.0f, 0.0f)), (1L, Array(10.0f, 10.0f)))
    val df = Seq((1L, Seq(1.0f, 1.0f)), (2L, Seq(9.0f, 9.0f))).toDF("id", "v")
    val cells = Ann.ivfAssign(df, "id", "v", centroids)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("cell")).toMap
    assert(cells(1L) === 0L)
    assert(cells(2L) === 1L)
  }

  test("ivfSearch with nprobe = all cells equals the exact scan top-k") {
    val centroids = (0 until 4).map(i =>
      (i.toLong, emb.where(col("vec_id") === i * 7).head().getSeq[Float](1).toArray)).toSeq
    val assigned = Ann.ivfAssign(emb, "vec_id", "embedding", centroids)
    val q = emb.where(col("vec_id") === 5).head().getSeq[Float](1).toArray
    val ivfAll = Ann.ivfSearch(assigned, "vec_id", "embedding", centroids, q,
        nprobe = 4, k = 10).select("vec_id").collect().map(_.getLong(0)).toSeq
    val exact = emb.select(col("vec_id"),
        round(graft.functions.euclidean_distance(col("embedding"), lit(q)), 6).as("d"))
      .orderBy(col("d").asc, col("vec_id").asc).limit(10)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(ivfAll === exact)
  }

  test("arg_min_distance kernel matches the per-centroid struct-array argmin (all metrics)") {
    val centroids = (0 until 8).map(i =>
      (i.toLong, emb.where(col("vec_id") === i * 3).head().getSeq[Float](1).toArray)).toSeq
    Seq("euclidean", "cosine", "manhattan", "dot").foreach { metric =>
      // the naive formulation the kernel replaces — kept here as the semantic pin
      val naive = centroids.map { case (cid, cvec) =>
        struct(round(graft.functions.distance(col("embedding"), lit(cvec), metric), 6).as("d"),
          lit(cid).as("cid"))
      }
      val both = emb.select(col("vec_id"),
          array_min(array(naive: _*)).getField("cid").as("naive_cell"),
          graft.functions.arg_min_distance(col("embedding"), centroids, metric).as("kernel_cell"))
        .where(col("naive_cell") =!= col("kernel_cell"))
      assert(both.count() === 0L, s"kernel diverges from struct-array argmin on $metric")
    }
  }

  test("trainCentroids: Lloyd iterations never increase assignment cost; clustered data improves") {
    val centers = Seq(Array(0f, 0f, 50f), Array(50f, 0f, 0f), Array(0f, 50f, 0f))
    val rows = centers.zipWithIndex.flatMap { case (c, ci) =>
      (0 until 40).map(j => (ci * 40L + j, c.map(x => x + (j % 5) - 2f).toSeq))
    }
    val df = rows.toDF("id", "v")
    def cost(cents: Seq[(Long, Array[Float])]): Double = {
      val byCid = cents.toMap
      Ann.ivfAssign(df, "id", "v", cents)
        .select(col("cell"), col("v")).collect().map { r =>
          val c = byCid(r.getLong(0)); val v = r.getSeq[Float](1)
          math.sqrt(v.zip(c).map { case (x, y) => val d = (x - y).toDouble; d * d }.sum)
        }.sum
    }
    val seed = df.orderBy(col("id").asc).limit(3)
      .select("v").collect().zipWithIndex.map { case (r, i) => (i.toLong, r.getSeq[Float](0).toArray) }.toSeq
    val trained = Ann.trainCentroids(df, "id", "v", 3, "euclidean", iterations = 2)
    assert(trained.length === 3)
    assert(cost(trained) <= cost(seed) + 1e-6)
  }

  test("over-aggressive sampleMod trains on the FULL corpus, never an empty sample") {
    // a mod that filters out every row must fall the Lloyd iterations back
    // to the full df along with the seed — the pre-fix behavior aggregated
    // the empty persisted sample to zero rows and silently shipped the
    // untrained seed as the trained centroids
    val df = emb.where(col("vec_id") < 40).select(col("vec_id"), col("embedding"))
    val full = Ann.trainCentroids(df, "vec_id", "embedding", 4, "euclidean", iterations = 2)
    val sampled = Ann.trainCentroids(df, "vec_id", "embedding", 4, "euclidean",
      iterations = 2, sampleMod = Some(1000000000L))
    assert(sampled.length === full.length)
    full.zip(sampled).foreach { case ((cidF, cvF), (cidS, cvS)) =>
      assert(cidF === cidS)
      cvF.zip(cvS).foreach { case (a, b) => assert(math.abs(a - b) < 1e-6f) }
    }
  }

  test("ivfSearch with nprobe < cells keeps high recall vs exact (pruned scan)") {
    val centroids = (0 until 8).map(i =>
      (i.toLong, emb.where(col("vec_id") === i * 3).head().getSeq[Float](1).toArray)).toSeq
    val assigned = Ann.ivfAssign(emb, "vec_id", "embedding", centroids).cache()
    val q = emb.where(col("vec_id") === 5).head().getSeq[Float](1).toArray
    val ivf = Ann.ivfSearch(assigned, "vec_id", "embedding", centroids, q, nprobe = 4, k = 10)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val exact = emb.select(col("vec_id"),
        round(graft.functions.euclidean_distance(col("embedding"), lit(q)), 6).as("d"))
      .orderBy(col("d").asc, col("vec_id").asc).limit(10)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val recall = (ivf & exact).size.toDouble / exact.size
    assert(recall >= 0.5, s"recall $recall too low for nprobe=4/8 on random data")
    assigned.unpersist()
  }

  test("top_cells kernel: best-first under (round6, cid), nprobe=1 == arg_min_distance, full probe = all cells sorted") {
    val centroids = (0 until 8).map(i =>
      (i.toLong, emb.where(col("vec_id") === i * 3).head().getSeq[Float](1).toArray)).toSeq
    Seq("euclidean", "cosine", "manhattan", "dot").foreach { metric =>
      val rows = emb.limit(50).select(
        graft.functions.arg_min_distance(col("embedding"), centroids, metric).as("am"),
        graft.functions.top_cells(col("embedding"), centroids, metric, 1).as("t1"),
        graft.functions.top_cells(col("embedding"), centroids, metric, 3).as("t3"),
        graft.functions.top_cells(col("embedding"), centroids, metric, 8).as("t8"),
        // the naive formulation: per-centroid (round6 dist, cid) structs,
        // array_sort'd — the semantic pin top_cells must reproduce
        slice(array_sort(array(centroids.map { case (cid, cvec) =>
          struct(round(graft.functions.distance(col("embedding"), lit(cvec), metric), 6).as("d"),
            lit(cid).as("cid"))
        }: _*)), 1, 8).as("naive")).collect()
      rows.foreach { r =>
        val naive = r.getSeq[org.apache.spark.sql.Row](4).map(_.getLong(1))
        assert(r.getSeq[Long](1) === Seq(r.getLong(0)), s"$metric: t1 != arg_min")
        assert(r.getSeq[Long](2) === naive.take(3), s"$metric: t3 != naive prefix")
        assert(r.getSeq[Long](3) === naive, s"$metric: t8 != full sorted order")
      }
    }
  }

  test("NaN query admits NO cells on every probe path: top_cells kernel, " +
      "probeCells, and a knnJoin row (r12 — one contract, matching selectCells)") {
    import spark.implicits._
    val cents = Seq((0L, Array(1.0f, 0.0f)), (1L, Array(0.0f, 1.0f)))
    // kernel (codegen): empty array — pre-r12 this THREW inside
    // BigDecimal.valueOf(NaN) on the codegen path and returned the
    // id-smallest filler cells on the interpreted one
    val out = Seq(Tuple1(Seq(Float.NaN, 0.0f))).toDF("v")
      .select(graft.functions.top_cells(col("v"), cents, "euclidean", 2))
      .head().getSeq[Long](0)
    assert(out === Seq.empty)
    // driver-side probe
    assert(Ann.probeCells(cents, Array(Float.NaN, 0f), 2, "euclidean") === Seq.empty)
    // a corrupt query ROW in a knnJoin probes nothing → contributes no
    // output rows, instead of crashing the whole batch job
    val corpus = Seq((10L, Seq(1.0f, 0.0f)), (11L, Seq(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val assigned = Ann.ivfAssign(corpus, "vec_id", "embedding", cents)
    val qs = Seq((100L, Seq(Float.NaN, 0.0f)), (101L, Seq(1.0f, 0.1f)))
      .toDF("qid", "qvec")
    val got = Ann.knnJoin(assigned, qs, k = 2, "vec_id", "embedding", "qid", "qvec",
        cents, nprobe = 2).collect().map(_.getAs[Long]("qid")).toSet
    assert(got === Set(101L), s"only the sane query may produce rows: $got")
  }

  test("top_cells: exact rounded ties resolve to the lower cid") {
    import spark.implicits._
    // two IDENTICAL centroids under different cids: every distance ties
    // bit-exactly, so the kernel's insertion order alone decides — lower
    // cid must come first at every position
    val cents = Seq((7L, Array(1.0f, 0.0f)), (3L, Array(1.0f, 0.0f)), (5L, Array(0.0f, 1.0f)))
    val out = Seq(Tuple1(Seq(1.0f, 0.0f))).toDF("v")
      .select(graft.functions.top_cells(col("v"), cents, "euclidean", 3))
      .head().getSeq[Long](0)
    assert(out === Seq(3L, 7L, 5L))
  }

  test("knnJoin with nprobe = all cells equals bruteForceTopK on every query row") {
    val centroids = (0 until 6).map(i =>
      (i.toLong, emb.where(col("vec_id") === i * 5).head().getSeq[Float](1).toArray)).toSeq
    val assigned = Ann.ivfAssign(emb, "vec_id", "embedding", centroids).cache()
    val qs = emb.where(col("vec_id") % 29 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val knn = Ann.knnJoin(assigned, qs, k = 4, "vec_id", "embedding", "qid", "qvec",
        centroids, nprobe = centroids.size)
      .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("vec_id"), r.getAs[Int]("rn")))
    val brute = Ann.bruteForceTopK(emb, qs, k = 4, "vec_id", "embedding", "qid", "qvec",
        metric = "euclidean")
      .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("vec_id"), r.getAs[Int]("rn")))
    assert(knn.nonEmpty)
    assert(knn.toSeq === brute.toSeq)
    assigned.unpersist()
  }

  test("knnJoin pruned probe: each query still finds itself first; k and alias contracts hold") {
    val centroids = (0 until 8).map(i =>
      (i.toLong, emb.where(col("vec_id") === i * 3).head().getSeq[Float](1).toArray)).toSeq
    val assigned = Ann.ivfAssign(emb, "vec_id", "embedding", centroids).cache()
    val qs = emb.where(col("vec_id") % 41 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val out = Ann.knnJoin(assigned, qs, k = 3, "vec_id", "embedding", "qid", "qvec",
      centroids, nprobe = 2).collect()
    val nq = qs.count()
    assert(out.length === 3 * nq)
    // a query's own cell is always its nearest centroid (ivfAssign and
    // top_cells share the (round6, cid) argmin), so rn=1 is the query
    // itself at dist 0 whenever the query is in the corpus
    out.filter(_.getAs[Int]("rn") == 1).foreach { r =>
      assert(r.getAs[Long]("vec_id") === r.getAs[Long]("qid"))
      assert(r.getAs[Double]("dist") === 0.0)
    }
    intercept[IllegalArgumentException](
      Ann.knnJoin(assigned, qs, k = 0, "vec_id", "embedding", "qid", "qvec", centroids, 1))
    intercept[IllegalArgumentException](
      Ann.knnJoin(assigned, qs, k = 3, "vec_id", "embedding", "vec_id", "qvec", centroids, 1))
    // cross-collisions and internal names are contract errors too, not
    // deep AnalysisExceptions: qvec colliding with the CORPUS vector
    // column, and query columns shadowing cell/dist/rn
    intercept[IllegalArgumentException](
      Ann.knnJoin(assigned, qs, k = 3, "vec_id", "embedding", "qid", "embedding", centroids, 1))
    intercept[IllegalArgumentException](
      Ann.knnJoin(assigned, qs, k = 3, "vec_id", "embedding", "cell", "qvec", centroids, 1))
    intercept[IllegalArgumentException](
      Ann.knnJoin(assigned, qs, k = 3, "vec_id", "embedding", "qid", "rn", centroids, 1))
    assigned.unpersist()
  }

  test("signLshAgainstCorpus: exact re-embeds match, opposite vectors never join, cap still verifies") {
    val planes = Seq(Array(1f, 0.1f, 0f, 0f), Array(0.1f, 1f, 0f, 0f))
    val corpus = ((0L until 50L).map(i => (i, Array(1f, 0.05f, 0f, 0f))) :+ // a 50-copy cluster
      (100L, Array(0f, 1f, 0.05f, 0f))).toDF("vec_id", "embedding")
    val batch = Seq(
      (900L, Array(1f, 0.05f, 0f, 0f)),   // exact re-embed of the cluster
      (901L, Array(-1f, -0.05f, 0f, 0f))  // opposite sign: different bucket, never joined
    ).toDF("vec_id", "embedding")
    // tight probe cap: the giant bucket IS a near-dup cluster — any probed
    // member verifies at sim 1.0
    val got = Ann.signLshAgainstCorpus(batch, corpus, "vec_id", "embedding",
      planes, threshold = 0.9, maxCorpusBucketProbes = 3).collect()
    assert(got.nonEmpty && got.forall(_.getLong(0) == 900L))
    assert(got.length <= 3) // the cap bounded the fan-out
    assert(got.forall(_.getDouble(2) === 1.0))
    val survivors = Ann.newSemanticAgainstCorpus(batch, corpus, "vec_id", "embedding",
      planes, threshold = 0.9, maxCorpusBucketProbes = 3)
      .select("vec_id").as[Long].collect().toSeq
    assert(survivors === Seq(901L))
  }
}
