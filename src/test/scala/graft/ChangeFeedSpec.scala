package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

import graft.streaming.ChangeFeed

/** S11: streamed LWW fold over an append log converges to the batch
  * latestByKey result, independent of batching/arrival order, with delete
  * tombstones blocking resurrection by late lower-version puts. */
class ChangeFeedSpec extends SparkSpec {
  import spark.implicits._

  private def changes(rows: Seq[(String, String, Long, String)]): DataFrame =
    rows.toDF("op", "id", "version", "payload")

  // three "arrivals": out-of-order versions, a delete, a late stale put
  private val batch1 = Seq(
    ("put", "a", 1L, "a-v1"), ("put", "b", 2L, "b-v2"), ("put", "c", 1L, "c-v1"))
  private val batch2 = Seq(
    ("put", "a", 3L, "a-v3"), ("del", "c", 5L, ""), ("put", "d", 1L, "d-v1"))
  private val batch3 = Seq(
    ("put", "a", 2L, "a-v2-stale"), // stale: must NOT beat a-v3
    ("put", "c", 3L, "c-v3-late"))  // stale vs the v5 tombstone: stays deleted

  private def expected = Map("a" -> "a-v3", "b" -> "b-v2", "d" -> "d-v1")

  private def collectView(df: DataFrame): Map[String, String] =
    df.select("id", "payload").collect().map(r => r.getString(0) -> r.getString(1)).toMap

  test("streamed fold over the append log equals batch LWW; tombstones hold") {
    val logDir = Files.createTempDirectory("graft-log").toString
    val ckpt = Files.createTempDirectory("graft-ckpt").toString
    Seq(batch1, batch2, batch3).foreach(b =>
      changes(b).write.mode(SaveMode.Append).parquet(logDir))

    val schema = changes(batch1).schema
    @volatile var last: Map[String, String] = Map.empty
    val q = ChangeFeed.run(spark, logDir, schema, "id", "version", ckpt) { v =>
      last = collectView(v)
    }
    q.awaitTermination(120000)
    assert(last === expected)

    // batch reference semantics over the full log
    val batchResult = collectView(
      ChangeFeed.batchApply(spark.read.parquet(logDir), "id", "version"))
    assert(batchResult === expected)
  }

  test("convergence is arrival-order independent (commutative merge)") {
    val logDir = Files.createTempDirectory("graft-log2").toString
    val ckpt = Files.createTempDirectory("graft-ckpt2").toString
    // reversed arrival order
    Seq(batch3, batch2, batch1).foreach(b =>
      changes(b).write.mode(SaveMode.Append).parquet(logDir))
    val schema = changes(batch1).schema
    @volatile var last: Map[String, String] = Map.empty
    val q = ChangeFeed.run(spark, logDir, schema, "id", "version", ckpt) { v =>
      last = collectView(v)
    }
    q.awaitTermination(120000)
    assert(last === expected)
  }

  test("mergeLeaders: total (version, op, origin) order makes the merge a CRDT join") {
    // three leaders writing concurrently, with every conflict class:
    // same-version put/put (k2@2: b vs c), same-version put/del (k3@2:
    // put(a) vs del(c) — put wins), plain version dominance (k1)
    val la = changes(Seq(("put", "k1", 1L, "k1-a1"), ("put", "k3", 2L, "k3-a2"),
      ("del", "k4", 9L, "")))
    val lb = changes(Seq(("put", "k1", 3L, "k1-b3"), ("put", "k2", 2L, "k2-b2")))
    val lc = changes(Seq(("put", "k2", 2L, "k2-c2"), ("del", "k3", 2L, ""),
      ("put", "k4", 1L, "k4-c1")))
    val want = Map("k1" -> "k1-b3", "k2" -> "k2-c2", "k3" -> "k3-a2")

    def merged(logs: Seq[(String, DataFrame)]) =
      collectView(ChangeFeed.view(ChangeFeed.mergeLeaders(logs, "id", "version")))

    val base = merged(Seq("a" -> la, "b" -> lb, "c" -> lc))
    assert(base === want)
    // commutative: any delivery order converges identically
    assert(merged(Seq("c" -> lc, "a" -> la, "b" -> lb)) === want)
    assert(merged(Seq("b" -> lb, "c" -> lc, "a" -> la)) === want)
    // idempotent: re-delivering a whole log changes nothing (same origin,
    // same rows — union then LWW collapses the duplicates)
    assert(merged(Seq("a" -> la.unionByName(la), "b" -> lb, "c" -> lc)) === want)
    // associative: gossiping pairwise then folding the third — the merged
    // state keeps its origin column, so a later log folds in with the same
    // total order
    val ab = ChangeFeed.mergeLeaders(Seq("a" -> la, "b" -> lb), "id", "version")
    val abc = graft.operators.Mutations.latestByKey(
      ab.unionByName(lc.withColumn("origin", lit("c"))),
      "id", "version", Seq("op", "origin"))
    assert(collectView(ChangeFeed.view(abc)) === want)
    // distinct-origin contract
    intercept[IllegalArgumentException](
      ChangeFeed.mergeLeaders(Seq("a" -> la, "a" -> lb), "id", "version"))
    intercept[IllegalArgumentException](
      ChangeFeed.mergeLeaders(Seq.empty, "id", "version"))
    // pre-tagged state must fold via latestByKey, not re-tag through merge
    intercept[IllegalArgumentException](
      ChangeFeed.mergeLeaders(Seq("d" -> ab), "id", "version"))
  }

  test("fold is idempotent: re-applying a batch changes nothing") {
    val b = changes(batch2)
    val once = ChangeFeed.fold(changes(batch1), b, "id", "version")
    val twice = ChangeFeed.fold(once, b, "id", "version")
    assert(collectView(ChangeFeed.view(once)) === collectView(ChangeFeed.view(twice)))
  }

  test("equal-version put/del ties resolve to the put, identically in batch and stateful paths") {
    val tied = changes(Seq(("del", "k", 7L, ""), ("put", "k", 7L, "k-kept")))
    val batchWinner = ChangeFeed.batchApply(tied, "id", "version")
    assert(collectView(batchWinner) === Map("k" -> "k-kept"))
    // stateful formulation converges to the same winner
    import graft.streaming.EventStream
    import spark.implicits._
    val ds = Seq(
      EventStream.ChangeRow("del", "k", 7L, ""),
      EventStream.ChangeRow("put", "k", 7L, "k-kept")).toDS()
    val stateful = EventStream.statefulLww(ds).collect().map(_._2)
    assert(stateful.last === EventStream.KeyState("put", 7L, "k-kept"))
  }

  test("runIntoCollection: streamed log replay lands in a catalog collection (S11 feeds S9)") {
    import graft.collection._
    val logDir = Files.createTempDirectory("graft-log4").toString
    val ckpt = Files.createTempDirectory("graft-ckpt4").toString
    val cat = new GraftCatalog(spark, Files.createTempDirectory("graft-feed").toString)
    cat.createCollection(CollectionMeta("feed", dim = 2, distance = "euclidean",
      fields = Seq(
        IndexField("id", "string", primaryKey = true),
        IndexField("payload", "string"))))
    cat.loadCollection("feed")
    // change rows need the collection columns: add a vector per put
    def log(rows: Seq[(String, String, Long, String)]): DataFrame = {
      import org.apache.spark.sql.functions._
      changes(rows).withColumn("vector",
        org.apache.spark.sql.functions.array(lit(1.0f), lit(2.0f)))
    }
    // a VERSION-ORDERED (single-writer WAL) log — runIntoCollection's
    // documented contract; out-of-order logs go through ChangeFeed.run
    val wal1 = Seq(("put", "a", 1L, "a-v1"), ("put", "b", 1L, "b-v1"))
    val wal2 = Seq(("put", "a", 2L, "a-v2"), ("del", "b", 2L, ""), ("put", "c", 1L, "c-v1"))
    Seq(wal1, wal2).foreach(b => log(b).write.mode(SaveMode.Append).parquet(logDir))
    val schema = log(wal1).schema
    val q = ChangeFeed.runIntoCollection(cat, "feed", spark, logDir, schema, "version", ckpt)
    q.awaitTermination(120000)
    val got = cat.resident("feed").select("id", "payload").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got === Map("a" -> "a-v2", "c" -> "c-v1"),
      "collection state must equal the ordered-log replay")
    // deletes are anti-joined out, not tombstoned, in the collection shape
    assert(cat.count("feed") === 2)
  }

  test("restart against an existing checkpoint resumes from persisted state (initialState)") {
    val logDir = Files.createTempDirectory("graft-log3").toString
    val ckpt = Files.createTempDirectory("graft-ckpt3").toString
    val stateDir = Files.createTempDirectory("graft-state3").toString
    val schema = changes(batch1).schema

    // run 1 consumes batches 1+2, persisting the raw state each batch
    Seq(batch1, batch2).foreach(b => changes(b).write.mode(SaveMode.Append).parquet(logDir))
    val q1 = ChangeFeed.run(spark, logDir, schema, "id", "version", ckpt,
      onState = st => st.write.mode(SaveMode.Overwrite).parquet(stateDir))(_ => ())
    q1.awaitTermination(120000)

    // new changes arrive after the stop — c's tombstone (v5) must survive the restart
    Seq(batch3).foreach(b => changes(b).write.mode(SaveMode.Append).parquet(logDir))

    // run 2: same checkpoint (batches 1+2 are skipped) + persisted state
    @volatile var last: Map[String, String] = Map.empty
    val q2 = ChangeFeed.run(spark, logDir, schema, "id", "version", ckpt,
      initialState = Some(spark.read.parquet(stateDir)),
      onState = st => st.write.mode(SaveMode.Overwrite).parquet(stateDir))(v => last = collectView(v))
    q2.awaitTermination(120000)
    assert(last === expected, "restart with initialState must not lose prior history")
  }
}
