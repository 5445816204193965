package graft

import org.apache.spark.sql.functions._

import graft.functions._

/** Property tests of the distance expressions against plain-Scala reference
  * implementations of the formulas in SURVEY.md §2.8
  * (/root/reference/pkg/distance/native_impl.go:24-53). Exercises both the
  * interpreted path (direct eval) and codegen (through a DataFrame plan). */
class VectorFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def refDot(a: Array[Float], b: Array[Float]): Double =
    a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
  private def refEuclid(a: Array[Float], b: Array[Float]): Double =
    math.sqrt(a.zip(b).map { case (x, y) => val d = x.toDouble - y.toDouble; d * d }.sum)
  private def refManhattan(a: Array[Float], b: Array[Float]): Double =
    a.zip(b).map { case (x, y) => math.abs(x.toDouble - y.toDouble) }.sum
  private def refCosine(a: Array[Float], b: Array[Float]): Double = {
    val na = math.sqrt(refDot(a, a)); val nb = math.sqrt(refDot(b, b))
    math.abs(1.0 - refDot(a, b) / (na * nb))
  }

  test("distances match scalar reference implementations (codegen path)") {
    val rnd = new scala.util.Random(42)
    val pairs = (1 to 30).map { _ =>
      val n = 1 + rnd.nextInt(64)
      (Array.fill(n)(rnd.nextFloat() * 20 - 10), Array.fill(n)(rnd.nextFloat() * 20 - 10))
    }
    // one plan for all pairs: exercises whole-stage codegen once, cheaply
    val df = pairs.toDF("a", "b")
    val rows = df.select(
      vec_dot(col("a"), col("b")).as("dot"),
      euclidean_distance(col("a"), col("b")).as("euc"),
      manhattan_distance(col("a"), col("b")).as("man"),
      cosine_distance(col("a"), col("b")).as("cos")).collect()
    pairs.zip(rows).foreach { case ((a, b), r) =>
      assert(r.getDouble(0) === refDot(a, b))
      assert(r.getDouble(1) === refEuclid(a, b))
      assert(r.getDouble(2) === refManhattan(a, b))
      assert(math.abs(r.getDouble(3) - refCosine(a, b)) < 1e-12)
    }
  }

  test("l2_norm and l2_normalize: unit norm after normalize; zero vector stays zero") {
    val df = Seq(
      (1L, Array(3.0f, 4.0f)),
      (2L, Array(0.0f, 0.0f))
    ).toDF("id", "v")
    val out = df.select(col("id"), l2_norm(l2_normalize(col("v"))).as("n"))
      .orderBy("id").collect()
    assert(math.abs(out(0).getDouble(1) - 1.0) < 1e-6)
    assert(out(1).getDouble(1) === 0.0) // zero-norm → zero vector (edge/vectorstore.go:178-181)
  }

  test("dimension mismatch throws") {
    val df = Seq((Array(1.0f), Array(1.0f, 2.0f))).toDF("a", "b")
    val ex = intercept[Exception] {
      df.select(euclidean_distance(col("a"), col("b"))).collect()
    }
    assert(ex.getMessage != null)
  }

  test("registerSqlFunctions: the kernels are plain SQL functions, identical to the Column API") {
    graft.functions.registerSqlFunctions(spark)
    val r = spark.sql(
      """SELECT
        |  cosine_distance(cast(array(1, 0) as array<float>), cast(array(0, 1) as array<float>)) AS cd,
        |  euclidean_distance(cast(array(3, 0) as array<float>), cast(array(0, 4) as array<float>)) AS ed,
        |  l2_norm(cast(array(3, 4) as array<float>)) AS n,
        |  l2_normalize(cast(array(3, 4) as array<float>)) AS nv,
        |  fnv64('abc') AS h,
        |  sorted_intersect_count(array('a','b','c'), array('b','c','d')) AS ic,
        |  winnow_fingerprints('the quick brown fox jumps', 8, 4) AS wf,
        |  normalize_text('  a\tb  ') AS nt
        |""".stripMargin).head()
    assert(r.getAs[String]("nt") === "a b")
    assert(r.getAs[Double]("cd") === 1.0)
    assert(r.getAs[Double]("ed") === 5.0)
    assert(r.getAs[Double]("n") === 5.0)
    assert(r.getAs[Seq[Float]]("nv") === Seq(0.6f, 0.8f))
    assert(r.getAs[Long]("h") ===
      graft.functions.TextKernels.fnv1a64("abc".getBytes("UTF-8")))
    assert(r.getAs[Int]("ic") === 2)
    val wfCol = Seq(Tuple1("the quick brown fox jumps")).toDF("t")
      .select(graft.text.Winnowing.fingerprints(col("t"))).head().getSeq[Long](0)
    assert(r.getAs[Seq[Long]]("wf") === wfCol)
    // identical to the Column API (same Expression class underneath)
    val viaSql = spark.sql(
      "SELECT cosine_distance(cast(array(1, 2, 3) as array<float>), cast(array(3, 2, 1) as array<float>)) AS d")
      .head().getDouble(0)
    val viaCol = Seq((Seq(1f, 2f, 3f), Seq(3f, 2f, 1f))).toDF("a", "b")
      .select(cosine_distance(col("a"), col("b"))).head().getDouble(0)
    assert(viaSql === viaCol)
  }

  test("SQL array literals (array<double>) implicitly cast to float vectors") {
    graft.functions.registerSqlFunctions(spark)
    Seq((1L, Array(1.0f, 0.0f))).toDF("id", "v").createOrReplaceTempView("vt_cast")
    // array(0.0, 1.0) is array<double> — the analyzer must insert the cast
    val d = spark.sql("SELECT cosine_distance(v, array(0.0D, 1.0D)) AS d FROM vt_cast")
      .head().getDouble(0)
    assert(math.abs(d - 1.0) < 1e-6)
    val n = spark.sql("SELECT l2_norm(array(3.0D, 4.0D)) AS n").head().getDouble(0)
    assert(math.abs(n - 5.0) < 1e-6)
  }

  test("FilterExpr: a column whose NAME contains a dot is a literal reference, not a path") {
    val df = Seq((1L, "x"), (2L, "y")).toDF("id", "meta.lang")
    val got = df.where(FilterExpr.Single("meta.lang", FilterExpr.Eq, "x").toColumn)
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(got === Seq(1L))
    // embedded backtick cannot break out of the quoting
    val df2 = df.withColumnRenamed("meta.lang", "a`b")
    val got2 = df2.where(FilterExpr.Single("a`b", FilterExpr.Eq, "y").toColumn)
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(got2 === Seq(2L))
  }

  test("score_from_distance formulas (edge/edge_helper.go:143-148)") {
    val df = Seq((0.5, 30.0)).toDF("dc", "de")
    val r = df.select(
      score_from_distance(col("dc"), "cosine").as("sc"),
      score_from_distance(col("de"), "euclidean").as("se")).head()
    assert(r.getDouble(0) === 75.0) // ((2-0.5)/2)*100
    assert(r.getDouble(1) === 70.0) // max(0, 100-30)
    val r2 = df.select(score_from_distance(lit(150.0), "euclidean")).head()
    assert(r2.getDouble(0) === 0.0)
  }
}
