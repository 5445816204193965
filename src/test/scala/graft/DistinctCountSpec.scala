package graft

import org.apache.spark.sql.functions._

import graft.operators.DistinctCount

/** HLL++ distinct counting: estimate quality within the advertised rsd
  * bound, and the merge properties that make it the 100 TB path. */
class DistinctCountSpec extends SparkSpec {
  import spark.implicits._

  test("audit holds the 3-sigma bound from sparse-exact to dense sizes") {
    // groups of very different cardinalities: g0 → 10 distinct (sparse mode,
    // exact), g1 → 1000, g2 → 50000 (dense estimation)
    val df = spark.range(0, 100000).toDF("i").select(
      (col("i") % 3).as("g"),
      concat(lit("v"), when(col("i") % 3 === 0, pmod(col("i"), lit(10)))
        .when(col("i") % 3 === 1, pmod(col("i"), lit(1000)))
        .otherwise(col("i"))).as("v"))
    val rows = DistinctCount.audit(df, Seq(col("g")), col("v")).collect()
    assert(rows.length === 3)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("hll_ok"),
        s"group ${r.get(0)}: approx ${r.getAs[Long]("approx_distinct")} vs " +
          s"exact ${r.getAs[Long]("exact_distinct")} outside 3*rsd")
    }
    val sparse = rows.find(_.getLong(0) == 0L).get
    assert(sparse.getAs[Long]("approx_distinct") === sparse.getAs[Long]("exact_distinct"),
      "small cardinalities sit in HLL++ sparse mode and must be exact")
  }

  test("estimate is partition-order independent (register max-merge)") {
    val base = spark.range(0, 20000).toDF("i")
      .select(lit(0L).as("g"), concat(lit("x"), col("i")).as("v"))
    def est(df: org.apache.spark.sql.DataFrame): Long =
      DistinctCount.approxDistinct(df, Seq(col("g")), col("v"))
        .head().getAs[Long]("approx_distinct")
    val a = est(base.repartition(1))
    val b = est(base.repartition(32))
    val c = est(base.orderBy(desc("v")).repartition(7))
    assert(a === b && b === c, s"HLL merge must be layout-independent: $a $b $c")
  }

  test("contract errors: rsd and tolSds out of range") {
    val df = Seq((1L, "a")).toDF("g", "v")
    intercept[IllegalArgumentException](
      DistinctCount.audit(df, Seq(col("g")), col("v"), rsd = 0.0))
    intercept[IllegalArgumentException](
      DistinctCount.audit(df, Seq(col("g")), col("v"), tolSds = 0.0))
    intercept[IllegalArgumentException](
      DistinctCount.approxDistinct(df, Seq(col("g")), col("v"), rsd = 1.0))
  }
}
