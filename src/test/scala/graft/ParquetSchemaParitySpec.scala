package graft

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.parquet.GraftParquetSchemas
import org.apache.spark.sql.functions._

import graft.FilterExpr._
import graft.collection._

/** r15: the catalog resolves version/sidecar schemas from parquet footers
  * on the driver (GraftParquetSchemas) instead of dispatching
  * `spark.read.parquet(dir)`'s one-task inference job. The whole change is
  * safe iff the two resolutions are BIT-IDENTICAL per directory — this
  * spec pins that, dir by dir, over every parquet directory a real
  * catalog lifecycle produces (full snapshots, decorated delta segments,
  * centroid/PQ/bin sidecars, schemaless map columns) plus the testdata
  * tables (the widest type surface the engine reads). */
class ParquetSchemaParitySpec extends SparkSpec {
  import spark.implicits._

  private def newRoot() = Files.createTempDirectory("graft-parity").toString

  private def assertParity(dir: String): Unit = {
    val inferred = spark.read.parquet(dir).schema
    val footer = GraftParquetSchemas.fromFooter(spark, dir)
    assert(footer === inferred, s"footer/inference schema mismatch for $dir")
    // === on StructType ignores per-field nullability? It does not — but be
    // explicit: the serialized forms must match too (metadata + nullability)
    assert(footer.toDDL === inferred.toDDL, s"DDL mismatch for $dir")
    assert(footer.json === inferred.json, s"json (nullability/metadata) mismatch for $dir")
  }

  private def parquetDirsUnder(root: String): Seq[String] = {
    val f = new File(root)
    val kids = Option(f.listFiles()).getOrElse(Array.empty)
    // a parquet dir either holds data files directly or is an IVF cell
    // layout (one `__cell=<int>` directory level — the only partitioned
    // shape the catalog writes)
    val here =
      if (kids.exists(c => c.isFile &&
            (c.getName.endsWith(".parquet") || c.getName.startsWith("part-"))) ||
          kids.exists(c => c.isDirectory && c.getName.matches("__cell=\\d+")))
        Seq(root)
      else Seq.empty
    here ++ kids.filter(_.isDirectory).flatMap(d => parquetDirsUnder(d.getPath)).toSeq
  }

  private def vecRows(ids: Seq[Int]): DataFrame =
    ids.map { i =>
      val rnd = new scala.util.Random(i)
      (s"id-$i", i.toLong % 7, Array.fill(8)(rnd.nextFloat()))
    }.toDF("id", "label", "vector")

  test("footer schema == inference schema for every dir of an indexed lifecycle") {
    val root = newRoot()
    val cat = new GraftCatalog(spark, root)
    cat.createCollection(CollectionMeta("p1", dim = 8, distance = "euclidean",
      versioning = true,
      fields = Seq(IndexField("id", "string", primaryKey = true),
        IndexField("label", "integer")),
      ivfCells = Some(2), pqSubspaces = Some(2), pqCodewords = Some(4),
      binaryIndex = Some(true)))
    cat.loadCollection("p1")
    cat.insert("p1", vecRows(1 to 60))
    cat.flush("p1") // v1 full snapshot + centroid/pq/bin sidecars
    cat.insert("p1", vecRows(1 to 5)) // updates
    cat.delete("p1", Single("label", FilterExpr.Eq, 3L))
    cat.flushDelta("p1") // v2 decorated delta segment (__op/__seq + layout cols)
    val dirs = parquetDirsUnder(root)
    assert(dirs.exists(_.endsWith("v1")) && dirs.exists(_.endsWith("v2")) &&
      dirs.exists(_.contains("_centroids")) && dirs.exists(_.contains("_pq")) &&
      dirs.exists(_.contains("_bin")),
      s"lifecycle did not produce the expected dirs: $dirs")
    dirs.foreach(assertParity)
  }

  test("footer schema == inference schema for a schemaless collection") {
    val root = newRoot()
    val cat = new GraftCatalog(spark, root)
    cat.createCollection(CollectionMeta("core", dim = 4, schemaless = Some(true)))
    cat.loadCollection("core")
    cat.insert("core", Seq(
      ("a", Array(1f, 2f, 3f, 4f), 1L),
      ("b", Array(2f, 2f, 3f, 4f), 2L)).toDF("_id", "vector", "label"))
    cat.flush("core")
    parquetDirsUnder(root).foreach(assertParity)
  }

  test("footer schema == inference schema for the testdata tables") {
    val sf = "/root/testdata/sf0.001"
    Seq("embeddings", "lineitem", "orders", "events", "documents", "part")
      .foreach(t => assertParity(s"$sf/$t.parquet"))
  }

  test("fromFooter refuses a dir without data files (callers fall back)") {
    val empty = Files.createTempDirectory("graft-parity-empty").toString
    intercept[IllegalArgumentException](GraftParquetSchemas.fromFooter(spark, empty))
  }
}
