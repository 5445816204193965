package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.ZOrder

/** Z-order clustering — unit layer under the oracle-checked
  * `zorder_locality` query, plus the end-to-end row-group-skipping proof
  * that justifies the layout at scale. */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  // 2-D points with independent uniform dims (decorrelated from id order)
  private def points(n: Int): DataFrame = {
    def dim(family: String) =
      pmod(conv(substring(md5(concat(lit(family), lit("|"), col("id").cast("string"))), 1, 15), 16, 10)
        .cast("long"), lit(4096L))
    spark.range(n).select(col("id"), dim("x").as("x"), dim("y").as("y"))
  }

  test("zvalue: exact interleave, deterministic, constant column degrades to 0 bits") {
    val df = Seq((0L, 0L, 0L), (1L, 1L, 0L), (2L, 0L, 1L), (3L, 3L, 3L))
      .toDF("id", "x", "y")
    val shifts = ZOrder.fitShifts(df, Seq("x", "y"), bits = 2)
    assert(shifts === Seq((0L, 0), (0L, 0))) // ranges 3 → bitLen 2 → no shift
    val z = df.withColumn("z", ZOrder.zvalue(Seq("x", "y"), shifts, 2))
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    // x bits at even positions, y bits at odd: (x=1,y=0)→1, (x=0,y=1)→2, (3,3)→15
    assert(z === Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 15L))
    // constant column: range 0, every bucket 0 — z depends on the other dim only
    val cshifts = ZOrder.fitShifts(df.withColumn("y", lit(7L)), Seq("x", "y"), 2)
    assert(cshifts(1) === ((7L, 0)))
    intercept[IllegalArgumentException](ZOrder.fitShifts(df, Seq("x", "y"), 32))
    intercept[IllegalArgumentException](
      ZOrder.fitShifts(df.where(lit(false)), Seq("x", "y"), 2)) // empty input
    // a LATER all-null column must be the same loud contract error (not an
    // NPE from the null min/max), and the message must name the column
    val eNull = intercept[IllegalArgumentException](
      ZOrder.fitShifts(df.withColumn("y", lit(null).cast("long")), Seq("x", "y"), 2))
    assert(eNull.getMessage.contains("'y'"))
  }

  test("full-long-range columns (hash ids): buckets stay in [0, 2^bits), no sign flood") {
    // min near Long.MinValue, max near Long.MaxValue: max - min wraps
    // negative in signed math; an arithmetic shift would sign-extend the
    // wrapped offsets so every high row collides at the all-ones bucket
    val df = Seq(
      (0L, Long.MinValue + 1), (1L, -1L), (2L, 0L),
      (3L, 1L << 40), (4L, Long.MaxValue - 1), (5L, Long.MaxValue)
    ).toDF("id", "h")
    val bits = 4
    val shifts = ZOrder.fitShifts(df, Seq("h"), bits)
    assert(shifts.head._2 === 60) // unsigned bitLen 64 → shift 64 - 4
    val buckets = df.select(ZOrder.zvalue(Seq("h"), shifts, bits).as("z"))
      .collect().map(_.getLong(0))
    assert(buckets.forall(b => b >= 0 && b < (1L << bits)),
      s"buckets out of range: ${buckets.mkString(",")}")
    // monotone: larger values land in >= buckets, and the span is used
    assert(buckets.distinct.length > 1)
    assert(buckets.zip(buckets.tail).forall { case (a, b) => a <= b })
  }

  test("cluster: content-preserving, partitions cover disjoint tight z-ranges") {
    val df = points(20000)
    val clustered = ZOrder.cluster(df, Seq("x", "y"), bits = 10, numPartitions = 8)
    assert(clustered.columns.toSeq === df.columns.toSeq)
    assert(clustered.unionByName(df).groupBy("id", "x", "y").count()
      .where(col("count") =!= 2).count() === 0) // same multiset
    // per-partition boxes: every partition's (x, y) spans are a fraction of
    // the global span — the locality row groups inherit
    val spans = clustered
      .withColumn("p", spark_partition_id())
      .groupBy("p").agg((max("x") - min("x")).as("xs"), (max("y") - min("y")).as("ys"))
      .collect()
    assert(spans.length === 8)
    val avgArea = spans.map(r => r.getLong(1).toDouble * r.getLong(2)).sum / spans.length
    assert(avgArea < 4096.0 * 4096 / 4, s"avg partition box area $avgArea")
  }

  test("z-clustered parquet prunes row groups on a 2-D box filter; unsorted does not") {
    val n = 200000
    val df = points(n).cache()
    val base = Files.createTempDirectory("graft-zorder").toString
    // unsorted baseline: id order decorrelates both dims from file position
    df.orderBy("id").coalesce(1).write
      .option("parquet.block.size", 64 * 1024)
      .mode("overwrite").parquet(s"$base/linear")
    ZOrder.cluster(df, Seq("x", "y"), bits = 12, numPartitions = 1).write
      .option("parquet.block.size", 64 * 1024)
      .mode("overwrite").parquet(s"$base/zorder")

    def matched(path: String): Long = spark.read.parquet(path)
      .where(col("x").between(1000, 1500) && col("y").between(2000, 2500)).count()
    assert(matched(s"$base/linear") === matched(s"$base/zorder")) // layout never changes answers

    // measure rows surviving row-group skipping via the scan metric
    def scannedRows(path: String): Long = {
      val q = spark.read.parquet(path)
        .where(col("x").between(1000, 1500) && col("y").between(2000, 2500))
      q.collect()
      q.queryExecution.executedPlan.collectLeaves().head
        .metrics("numOutputRows").value
    }
    val linScanned = scannedRows(s"$base/linear")
    val zScanned = scannedRows(s"$base/zorder")
    // ~1.5% of the area is selected; the z layout must skip most row
    // groups while the unsorted layout reads essentially everything
    assert(linScanned > n / 2, s"linear layout unexpectedly pruned: $linScanned")
    assert(zScanned < linScanned / 3,
      s"z layout did not prune: $zScanned vs $linScanned")
  }
}
