package graft

import org.apache.spark.sql.functions._

import graft.FilterExpr._
import graft.core.CoreMeta

/** Core-v3 schema-less metadata compat: _id shim, string coercion, and the
  * numeric-coercion comparison flag — including the documented divergence
  * between lexicographic and parse-compare semantics. */
class CoreMetaSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = CoreMeta.withMeta(
    Seq((1L, 5L, "x"), (2L, 10L, "y"), (3L, 9L, "it's")).toDF("id", "n", "s"),
    col("id"), Seq("n", "s"))

  test("withMeta coerces values to strings and injects _id") {
    val m = df.where(col("id") === 2)
      .select(element_at(col("meta"), "_id"), element_at(col("meta"), "n"),
        element_at(col("meta"), "s")).head()
    assert(m.getString(0) === "2")
    assert(m.getString(1) === "10")
  }

  test("pureFilter is conjunctive equality over map entries (P4)") {
    val ids = df.where(CoreMeta.pureFilter(col("meta"), Map("n" -> "10", "s" -> "y")))
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(ids === Seq(2L))
    // empty filter matches everything
    assert(df.where(CoreMeta.pureFilter(col("meta"), Map.empty)).count() === 3)
  }

  test("numeric coercion ON: \"10\" > \"9\" numerically (reference parse-compare parity)") {
    val ids = df.where(CoreMeta.compare(col("meta"), "n", Gt, "9"))
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(ids === Seq(2L)) // only 10 > 9; "5" and "9" are not
  }

  test("numeric coercion OFF: \"10\" < \"9\" lexicographically (documented divergence)") {
    val ids = df.where(CoreMeta.compare(col("meta"), "n", Lt, "9", numericCoercion = false))
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids === Seq(1L, 2L)) // "10" < "9" and "5" < "9" as strings
  }

  test("non-numeric values fall back to string compare even with coercion on") {
    val ids = df.where(CoreMeta.compare(col("meta"), "s", Eq, "it's"))
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(ids === Seq(3L)) // quote in value is data, not SQL
    val gt = df.where(CoreMeta.compare(col("meta"), "s", Gt, "x"))
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(gt === Seq(2L)) // "y" > "x" lexicographic
  }

  test("missing keys never match (absent key = empty posting list)") {
    assert(df.where(CoreMeta.compare(col("meta"), "absent", Gte, "0")).count() === 0)
  }

  test("schemaless + ivfCells: filtered searchIvf routes the AST through the " +
    "coerced map (full probe == exact filtered search, numeric coercion intact)") {
    import graft.collection._
    val cat = new GraftCatalog(spark,
      java.nio.file.Files.createTempDirectory("graft-core-ivf").toString)
    cat.createCollection(CollectionMeta("ci", dim = 2, distance = "euclidean",
      schemaless = Some(true), ivfCells = Some(2)))
    cat.loadCollection("ci")
    cat.insert("ci", (0 until 40).map(i =>
      (s"r$i", Seq(i.toFloat, (i % 5).toFloat), i.toLong)).toDF("_id", "vector", "n"))
    cat.flush("ci")
    // n > 9 must compare NUMERICALLY through the coerced map ("10" > "9"
    // numerically, but "10" < "9" lexicographically) on the INDEXED path
    val f = Some(Single("n", Gt, 9))
    val got = cat.searchIvf("ci", Array(9f, 4f), topK = 6, nprobe = 2, filter = f)
      .select("_id", "dist").collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    val want = cat.search("ci", Array(9f, 4f), topK = 6, filter = f)
      .select("_id", "dist").collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(got.nonEmpty && got === want)
    assert(got.forall { case (id, _) => id.drop(1).toInt > 9 })
  }

  test("schema-less collection lifecycle: ingest, filtered search, delete, _id filter") {
    import graft.collection._
    val cat = new GraftCatalog(spark,
      java.nio.file.Files.createTempDirectory("graft-core-spec").toString)
    cat.createCollection(CollectionMeta("c", dim = 2, distance = "euclidean",
      schemaless = Some(true)))
    cat.loadCollection("c")
    cat.insert("c", Seq(
      ("a", Seq(1f, 0f), 5L, "x"), ("b", Seq(2f, 0f), 10L, "y"), ("c", Seq(3f, 0f), 9L, "z")
    ).toDF("_id", "vector", "n", "tag"))
    cat.flush("c"); cat.releaseCollection("c"); cat.loadCollection("c")
    // numeric coercion through the catalog: "10" > "9" numerically
    val gt9 = cat.search("c", Array(0f, 0f), topK = 10,
        filter = Some(Single("n", Gt, 9)))
      .select("_id").collect().map(_.getString(0)).toSeq
    assert(gt9 === Seq("b"))
    // _id filter hits the id column
    val byId = cat.search("c", Array(0f, 0f), topK = 10,
        filter = Some(Single("_id", Eq, "c"))).select("_id").collect().map(_.getString(0))
    assert(byId.toSeq === Seq("c"))
    // delete through the coerced-map path
    cat.delete("c", Single("tag", Eq, "y"))
    assert(cat.count("c") === 2)
    // delete on a key ABSENT from every surviving row: the predicate is NULL
    // there, and NULL-matched rows must SURVIVE (absent key = no postings =
    // not matched) — the round-2 bug deleted them
    cat.delete("c", Single("no_such_key", Gte, 0))
    assert(cat.count("c") === 2, "rows lacking the filtered key must survive a delete")
    // mixed presence: add a row carrying the key, delete on it — only that row goes
    cat.insert("c", Seq(("d", Seq(4f, 0f), 1L)).toDF("_id", "vector", "no_such_key"))
    cat.delete("c", Single("no_such_key", Gte, 0))
    assert(cat.count("c") === 2, "only the row carrying the key matches the delete")
    // declared fields on a schemaless collection are rejected
    intercept[IllegalArgumentException] {
      CollectionMeta("bad", dim = 2, schemaless = Some(true),
        fields = Seq(IndexField("id", "string", primaryKey = true)))
    }
    cat.dropCollection("c")
  }
}
