package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.FilterExpr._
import graft.collection._

/** Collection lifecycle + analyzer parity tests (FIXTURES.md §3, §6, §7). */
class CollectionSpec extends SparkSpec {
  import spark.implicits._

  private def newCatalog() =
    new GraftCatalog(spark, Files.createTempDirectory("graft-col").toString)

  private val fields = Seq(
    IndexField("id", "string", primaryKey = true),
    IndexField("type", "integer"),
    IndexField("size", "integer", enableNull = true),
    IndexField("expand", "boolean", enableNull = true))

  private def meta(name: String, q: String = "none", versioning: Boolean = false) =
    CollectionMeta(name, dim = 4, distance = "cosine", quantization = q,
      fields = fields, versioning = versioning)

  private def rows(n: Int): DataFrame = {
    val rnd = new scala.util.Random(7)
    (1 to n).map { i =>
      (s"id-$i", i.toLong % 10, i.toLong % 5, i % 2 == 0, Array.fill(4)(rnd.nextFloat()))
    }.toDF("id", "type", "size", "expand", "vector")
  }

  test("create/exists/drop lifecycle; double-create fails") {
    val cat = newCatalog()
    cat.createCollection(meta("c1"))
    assert(cat.exists("c1"))
    val ex = intercept[IllegalArgumentException](cat.createCollection(meta("c1")))
    assert(ex.getMessage.contains("already exists"))
    cat.dropCollection("c1")
    assert(!cat.exists("c1"))
  }

  test("collection names: traversal rejected EVERYWHERE, charset policy at create") {
    val cat = newCatalog()
    // SAFETY level — can escape the root as a path: refused on every
    // operation (create, drop, even exists), since all paths derive from
    // the validated colDir
    for (bad <- Seq("..", ".", "", "a/b", "a\\b", null.asInstanceOf[String])) {
      val ex = intercept[IllegalArgumentException] {
        cat.createCollection(meta("ok").copy(name = bad))
      }
      assert(ex.getMessage.contains("invalid collection name"), s"name '$bad'")
      intercept[IllegalArgumentException](cat.dropCollection(bad))
      intercept[IllegalArgumentException](cat.exists(bad))
    }
    // POLICY level — safe as a segment but outside the create charset:
    // refused at CREATE, yet still manageable (a legacy collection with
    // such a name must not become undroppable after an upgrade)
    for (odd <- Seq("__internal", "a b", "a:b", "x" * 200)) {
      val ex = intercept[IllegalArgumentException] {
        cat.createCollection(meta("ok").copy(name = odd))
      }
      assert(ex.getMessage.contains("invalid collection name"), s"name '$odd'")
      assert(!cat.exists(odd))   // no throw: manageable
      cat.dropCollection(odd)    // no throw: a no-op delete of nothing
    }
    // legal names still work, including dots inside a segment
    cat.createCollection(meta("ok").copy(name = "v1.2_data-set"))
    assert(cat.exists("v1.2_data-set"))
  }

  test("re-load releases the previous resident copy (no cache leak across re-anchors)") {
    val cat = newCatalog()
    cat.createCollection(meta("c-reload"))
    val first = cat.loadCollection("c-reload")
    cat.insert("c-reload", rows(8))
    first.count() // materialize the first anchor's cache
    val second = cat.loadCollection("c-reload")
    assert(first.storageLevel == org.apache.spark.storage.StorageLevel.NONE,
      "previous load's persisted copy must be unpersisted on re-anchor")
    assert(second.storageLevel != org.apache.spark.storage.StorageLevel.NONE)
    // NO-MUTATION re-load (idempotent retry): the rebuilt plan is
    // sameResult as the cached one, so persist-then-unpersist would drop
    // the single shared cache entry and leave the collection silently
    // non-resident — the unpersist must happen BEFORE the new persist
    cat.flush("c-reload")
    cat.loadCollection("c-reload").count()
    val retry = cat.loadCollection("c-reload")
    retry.count()
    assert(retry.storageLevel != org.apache.spark.storage.StorageLevel.NONE,
      "re-load without intervening mutations must leave the collection resident")
    cat.dropCollection("c-reload")
  }

  test("operations on unloaded collection fail with not-loaded error (state machine)") {
    val cat = newCatalog()
    cat.createCollection(meta("c2"))
    val ex = intercept[IllegalStateException](cat.search("c2", Array.fill(4)(1.0f), 5))
    assert(ex.getMessage.contains("not loaded in memory")) // edge/constants.go:30 parity
  }

  test("insert → flush → release → load → identical search results (round-trip property)") {
    val cat = newCatalog()
    cat.createCollection(meta("c3"))
    cat.loadCollection("c3")
    cat.insert("c3", rows(100))
    // interleave deletes like hnsw_commit_test.go's tombstone exercise
    cat.delete("c3", Single("type", FilterExpr.Eq, 3L))
    val qv = Array(0.3f, 0.5f, 0.1f, 0.9f)
    val before = cat.search("c3", qv, 10).collect().map(_.toString).toSeq
    cat.flush("c3")
    cat.releaseCollection("c3")
    cat.loadCollection("c3")
    val after = cat.search("c3", qv, 10).collect().map(_.toString).toSeq
    assert(before === after)
    assert(before.nonEmpty)
    assert(cat.count("c3") === 100 - 10) // type==3 for i%10==3 → 10 victims
  }

  test("delete on a nullable column: NULL rows survive (predicate not strictly true)") {
    val cat = newCatalog()
    cat.createCollection(meta("cnull"))
    cat.loadCollection("cnull")
    // two rows with size set, one with size NULL (enableNull column, explicit null)
    val df = Seq(
      ("a", 1L, Some(5L), true, Seq(1f, 0f, 0f, 0f)),
      ("b", 2L, Some(1L), true, Seq(0f, 1f, 0f, 0f)),
      ("c", 3L, None: Option[Long], true, Seq(0f, 0f, 1f, 0f))
    ).toDF("id", "type", "size", "expand", "vector")
    cat.insert("cnull", df)
    cat.delete("cnull", Single("size", FilterExpr.Gte, 2L))
    val left = cat.search("cnull", Array(1f, 1f, 1f, 1f), 10)
      .select("id").collect().map(_.getString(0)).toSet
    // a (size=5) deleted; b (size=1) survives; c (size=NULL) must survive too —
    // the round-2 where(!pred) dropped NULL rows
    assert(left === Set("b", "c"))
  }

  test("upsert by pk keeps count stable and replaces metadata") {
    val cat = newCatalog()
    cat.createCollection(meta("c4"))
    cat.loadCollection("c4")
    cat.insert("c4", rows(50))
    cat.insert("c4", rows(50).withColumn("type", lit(99L))) // same pks
    assert(cat.count("c4") === 50)
    val all = cat.search("c4", Array.fill(4)(1.0f), 50)
    assert(all.where(col("type") === 99L).count() === 50)
  }

  test("analyzer: missing non-nullable column rejected with reference message") {
    val cat = newCatalog()
    cat.createCollection(meta("c5"))
    cat.loadCollection("c5")
    val bad = Seq(("a", Array.fill(4)(1.0f))).toDF("id", "vector") // no `type`
    val ex = intercept[IllegalArgumentException](cat.insert("c5", bad))
    assert(ex.getMessage === "index: type is null, but index design not allowed null value")
  }

  test("analyzer: missing nullable column gets typed default") {
    val cat = newCatalog()
    cat.createCollection(meta("c6"))
    cat.loadCollection("c6")
    cat.insert("c6", Seq(("a", 1L, Array.fill(4)(1.0f))).toDF("id", "type", "vector"))
    val r = cat.search("c6", Array.fill(4)(1.0f), 1).head()
    assert(r.getAs[Long]("size") === 0L)      // default integer
    assert(r.getAs[Boolean]("expand") === false) // default boolean
  }

  test("analyzer: integral float accepted as integer, non-integral rejected (runtime)") {
    val cat = newCatalog()
    cat.createCollection(meta("c7"))
    cat.loadCollection("c7")
    cat.insert("c7", Seq(("a", 5.0, Array.fill(4)(1.0f))).toDF("id", "type", "vector"))
    assert(cat.search("c7", Array.fill(4)(1.0f), 1).head().getAs[Long]("type") === 5L)
    val ex = intercept[Exception] {
      cat.insert("c7", Seq(("b", 5.5, Array.fill(4)(1.0f))).toDF("id", "type", "vector"))
      cat.count("c7")
    }
    assert(ex.getMessage.contains("non-integral"))
  }

  test("analyzer: wrong vector dimension rejected at runtime") {
    val cat = newCatalog()
    cat.createCollection(meta("c8"))
    cat.loadCollection("c8")
    val ex = intercept[Exception] {
      cat.insert("c8", Seq(("a", 1L, Array.fill(3)(1.0f))).toDF("id", "type", "vector"))
      cat.count("c8")
    }
    assert(ex.getMessage.contains("dimension mismatch"))
  }

  test("search dimension check mirrors the reference") {
    val cat = newCatalog()
    cat.createCollection(meta("c9"))
    cat.loadCollection("c9")
    val ex = intercept[IllegalArgumentException](cat.search("c9", Array.fill(3)(1.0f), 5))
    assert(ex.getMessage.contains("dimension mismatch"))
  }

  test("quantized collection: search works, self-match top-1, storage type is short array") {
    val cat = newCatalog()
    cat.createCollection(meta("cq", q = "f16"))
    cat.loadCollection("cq")
    cat.insert("cq", rows(50))
    val q = rows(50).where(col("id") === "id-7").head().getSeq[Float](4).toArray
    val top = cat.search("cq", q, 3).head()
    assert(top.getAs[String]("id") === "id-7")
    assert(top.getAs[Double]("dist") === 0.0)
    cat.flush("cq")
    val onDisk = cat.snapshot("cq")
    assert(onDisk.schema(CollectionMeta.VectorCol).dataType.simpleString === "array<smallint>")
  }

  test("versioning: time travel reads old snapshots; vacuum-on-flush when disabled") {
    val cat = newCatalog()
    cat.createCollection(meta("cv", versioning = true))
    cat.loadCollection("cv")
    cat.insert("cv", rows(10))
    cat.flush("cv")
    cat.insert("cv", rows(20)) // 10 upserts + 10 new
    cat.flush("cv")
    assert(cat.timeTravel("cv", 1).count() === 10)
    assert(cat.timeTravel("cv", 2).count() === 20)
  }

  test("searchBatch flat fallback: every query's block equals its single-query " +
    "search; quantized collection round-trips the query the same way") {
    for (q <- Seq("none", "f16")) {
      val cat = newCatalog()
      val name = s"sb-$q"
      cat.createCollection(meta(name, q = q))
      cat.loadCollection(name)
      cat.insert(name, rows(60))
      val rnd = new scala.util.Random(11)
      val qs = (0 until 3).map(i => s"q$i" -> Array.fill(4)(rnd.nextFloat())).toSeq
      val batch = cat.searchBatch(name, qs, topK = 5, nprobe = 1)
      val got = batch.collect()
      qs.foreach { case (qid, v) =>
        val block = got.filter(_.getString(0) == qid).sortBy(_.getInt(3)).map(_.getString(1)).toSeq
        val want = cat.search(name, v, topK = 5).select("id")
          .collect().map(_.getString(0)).toSeq
        assert(block === want, s"$q/$qid: batch $block vs single $want")
      }
      // scale contract: queries broadcast, per-qid bound is the partial
      // WindowGroupLimit below the exchange, no cartesian product
      val phys = batch.queryExecution.executedPlan.toString
      assert(phys.contains("WindowGroupLimit"), phys.take(2000))
      assert(!phys.contains("CartesianProduct"), phys.take(2000))
    }
  }
}
