package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.FilterExpr._
import graft.collection._

/** Delta-flush lifecycle: O(changes) segments, chain fold on load,
  * compaction, vacuum safety, and the index-layout refusal contract. */
class CatalogDeltaSpec extends SparkSpec {
  import spark.implicits._

  private def newRoot() = Files.createTempDirectory("graft-delta").toString

  private def newCatalog(root: String = newRoot()) = new GraftCatalog(spark, root)

  private val fields = Seq(
    IndexField("id", "string", primaryKey = true),
    IndexField("label", "integer"))

  private def meta(name: String, versioning: Boolean = false,
                   quantization: String = "none") =
    CollectionMeta(name, dim = 4, distance = "euclidean",
      quantization = quantization, fields = fields, versioning = versioning)

  private def rows(ids: Seq[Int], labelOf: Int => Long = _ % 10): DataFrame = {
    ids.map { i =>
      val rnd = new scala.util.Random(i) // per-id vectors: stable across batches
      (s"id-$i", labelOf(i), Array.fill(4)(rnd.nextFloat()))
    }.toDF("id", "label", "vector")
  }

  private def state(df: DataFrame): Set[String] =
    df.select("id", "label").collect().map(r => s"${r.getString(0)}:${r.getLong(1)}").toSet

  test("delta flush persists only the ledger; load folds base + segment back") {
    val root = newRoot()
    val cat = newCatalog(root)
    cat.createCollection(meta("d1"))
    cat.loadCollection("d1")
    cat.insert("d1", rows(1 to 100))
    cat.flush("d1") // v1 base
    // update 10 rows, delete by predicate, insert 5 new — three ledger batches
    cat.insert("d1", rows(1 to 10, _ => 77L))
    cat.delete("d1", Single("label", FilterExpr.Eq, 5L)) // ids with i%10==5
    cat.insert("d1", rows(101 to 105))
    val expected = state(cat.resident("d1"))
    val v = cat.flushDelta("d1")
    assert(v === 2)
    // the segment holds the LEDGER (O(changes) rows), not the corpus
    val seg = spark.read.parquet(s"$root/d1/v2")
    assert(seg.columns.contains(GraftCatalog.DeltaOpCol))
    // puts + del markers (label==5 at delete time: ids 15,25,…,95 — id-5
    // was just relabeled to 77) + new puts
    assert(seg.count() === 10 + 9 + 5)
    // marker recorded, base untouched
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new Path(s"$root/d1/v2/${GraftCatalog.DeltaMarkerFile}")))
    assert(fs.exists(new Path(s"$root/d1/v1")))
    // cold load folds chain to the exact pre-flush resident state
    cat.releaseCollection("d1")
    cat.loadCollection("d1")
    assert(state(cat.resident("d1")) === expected)
    assert(expected.count(_.endsWith(":77")) === 10)
    assert(!expected.contains("id-15:5")) // struck by the predicate delete
    assert(expected.contains("id-105:5")) // inserted AFTER the delete — survives
  }

  test("a mutation stream past the eager-cut cadence folds exactly (bounded physical lineage)") {
    // the ledger's cadence checkpoint is lazy (logical-plan cut only); every
    // EagerCutEvery-th mutation materializes for real so flushDelta never
    // walks an unboundedly deep union RDD chain. 70 batches crosses the
    // 64-boundary; LWW re-puts straddle it so the fold is order-sensitive.
    val cat = newCatalog()
    cat.createCollection(meta("dcut"))
    cat.loadCollection("dcut")
    cat.insert("dcut", rows(1 to 20))
    cat.flush("dcut") // v1 base — ledger tracking starts after it
    (1 to 70).foreach { k =>
      // each batch re-puts one rolling id with label=k: id-(k%20+1) is
      // written multiple times across the stream, last write must win
      cat.insert("dcut", rows(Seq(k % 20 + 1), _ => k.toLong))
    }
    val expected = state(cat.resident("dcut"))
    // ids 51%20+1 .. 70%20+1 carry their LAST batch's label
    assert(expected.contains(s"id-${70 % 20 + 1}:70"))
    cat.flushDelta("dcut")
    cat.releaseCollection("dcut")
    cat.loadCollection("dcut")
    assert(state(cat.resident("dcut")) === expected)
  }

  test("put-then-delete and delete-then-reinsert across segments resolve LWW") {
    val cat = newCatalog()
    cat.createCollection(meta("d2"))
    cat.loadCollection("d2")
    cat.insert("d2", rows(1 to 10))
    cat.flush("d2")
    cat.insert("d2", rows(Seq(3), _ => 50L)) // put id-3
    cat.delete("d2", Single("id", FilterExpr.Eq, "id-3")) // then delete it
    cat.flushDelta("d2") // v2
    cat.insert("d2", rows(Seq(3), _ => 60L)) // reinsert in a LATER segment
    cat.flushDelta("d2") // v3
    cat.releaseCollection("d2")
    cat.loadCollection("d2")
    val got = state(cat.resident("d2"))
    assert(got.contains("id-3:60")) // v3 put beats v2 delete
    assert(got.size === 10)
    // time travel mid-chain: at v2 the delete is the winner
    val cat2 = new GraftCatalog(spark, newRoot())
    cat2.createCollection(meta("d2v", versioning = true))
    cat2.loadCollection("d2v")
    cat2.insert("d2v", rows(1 to 10))
    cat2.flush("d2v")
    cat2.delete("d2v", Single("id", FilterExpr.Eq, "id-3"))
    cat2.flushDelta("d2v")
    cat2.insert("d2v", rows(Seq(3), _ => 60L))
    cat2.flushDelta("d2v")
    assert(!state(cat2.timeTravel("d2v", 2)).exists(_.startsWith("id-3:")))
    assert(state(cat2.timeTravel("d2v", 3)).contains("id-3:60"))
  }

  test("full flush compacts the chain; unversioned prune removes every segment") {
    val root = newRoot()
    val cat = newCatalog(root)
    cat.createCollection(meta("d3"))
    cat.loadCollection("d3")
    cat.insert("d3", rows(1 to 50))
    cat.flush("d3") // v1
    cat.insert("d3", rows(Seq(1), _ => 99L)); cat.flushDelta("d3") // v2
    cat.insert("d3", rows(Seq(2), _ => 98L)); cat.flushDelta("d3") // v3
    val expected = state(cat.resident("d3"))
    assert(cat.flush("d3") === 4) // compaction
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    (1 to 3).foreach(w => assert(!fs.exists(new Path(s"$root/d3/v$w")),
      s"v$w should be pruned by the compacting flush"))
    assert(!fs.exists(new Path(s"$root/d3/v4/${GraftCatalog.DeltaMarkerFile}")))
    cat.releaseCollection("d3")
    cat.loadCollection("d3")
    assert(state(cat.resident("d3")) === expected)
  }

  test("vacuum never cuts the live chain; info sums chain bytes") {
    val root = newRoot()
    val cat = newCatalog(root)
    cat.createCollection(meta("d4", versioning = true))
    cat.loadCollection("d4")
    cat.insert("d4", rows(1 to 20))
    cat.flush("d4") // v1
    cat.flush("d4") // v2 (an older, superseded base)
    cat.insert("d4", rows(Seq(1), _ => 99L)); cat.flushDelta("d4") // v3
    cat.insert("d4", rows(Seq(2), _ => 98L)); cat.flushDelta("d4") // v4
    // keepLast=1 would cut to v3 — but the chain base is v2, so only v1 goes
    assert(cat.vacuum("d4", keepLast = 1) === Seq(1))
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new Path(s"$root/d4/v2")))
    val info = cat.info("d4")
    assert(info.version === 4)
    val dirBytes = (2 to 4).map(w =>
      fs.getContentSummary(new Path(s"$root/d4/v$w")).getLength).sum
    assert(info.sizeBytes === dirBytes)
    // cold load still folds correctly after the vacuum
    cat.releaseCollection("d4")
    cat.loadCollection("d4")
    assert(state(cat.resident("d4")).contains("id-1:99"))
  }

  test("empty indexed base, missing base, and empty ledger all refuse loudly") {
    val cat = newCatalog()
    // an indexed base flushed EMPTY has no sidecars to encode against —
    // the delta path demands a full flush instead (populated indexed bases
    // take deltas: CatalogDeltaIndexedSpec)
    cat.createCollection(CollectionMeta("ivfd", dim = 4, distance = "euclidean",
      fields = fields, ivfCells = Some(4)))
    cat.loadCollection("ivfd")
    cat.flush("ivfd") // v1: empty — no centroid sidecar
    cat.insert("ivfd", rows(1 to 10))
    val e1 = intercept[IllegalStateException](cat.flushDelta("ivfd"))
    assert(e1.getMessage.contains("sidecar missing"))
    // no base snapshot yet
    cat.createCollection(meta("nob"))
    cat.loadCollection("nob")
    cat.insert("nob", rows(1 to 5))
    val e2 = intercept[Exception](cat.flushDelta("nob"))
    assert(e2.getMessage.contains("pending") || e2.getMessage.contains("base"))
    // base exists but nothing pending
    cat.createCollection(meta("emp"))
    cat.loadCollection("emp")
    cat.insert("emp", rows(1 to 5))
    cat.flush("emp")
    val e3 = intercept[IllegalStateException](cat.flushDelta("emp"))
    assert(e3.getMessage.contains("no pending changes"))
  }

  test("quantized storage (f16) composes with delta segments") {
    val cat = newCatalog()
    cat.createCollection(meta("dq", quantization = "f16"))
    cat.loadCollection("dq")
    cat.insert("dq", rows(1 to 30))
    cat.flush("dq")
    cat.insert("dq", rows(Seq(7), _ => 42L))
    val expected = state(cat.resident("dq"))
    val qv = Array(0.3f, 0.5f, 0.1f, 0.9f)
    val before = cat.search("dq", qv, 5).collect().map(_.toString).toSeq
    cat.flushDelta("dq")
    cat.releaseCollection("dq")
    cat.loadCollection("dq")
    assert(state(cat.resident("dq")) === expected)
    assert(cat.search("dq", qv, 5).collect().map(_.toString).toSeq === before)
  }

  test("re-load discards unflushed mutations AND their ledger entries") {
    val root = newRoot()
    val cat = newCatalog(root)
    cat.createCollection(meta("d5"))
    cat.loadCollection("d5")
    cat.insert("d5", rows(1 to 10))
    cat.flush("d5") // v1
    cat.insert("d5", rows(Seq(1), _ => 99L)) // tracked…
    cat.loadCollection("d5") // …then DISCARDED by the re-anchor
    cat.insert("d5", rows(Seq(2), _ => 88L))
    cat.flushDelta("d5")
    // the segment holds only the post-reload batch — a flushDelta must not
    // resurrect changes the re-load threw away
    assert(spark.read.parquet(s"$root/d5/v2").count() === 1)
    cat.releaseCollection("d5")
    cat.loadCollection("d5")
    val got = state(cat.resident("d5"))
    assert(got.contains("id-2:88"))
    assert(got.contains("id-1:1")) // original label — the discarded put never lands
  }

  test("vacuum keeps bases that RETAINED historical delta versions depend on") {
    val root = newRoot()
    val cat = newCatalog(root)
    cat.createCollection(meta("d6", versioning = true))
    cat.loadCollection("d6")
    cat.insert("d6", rows(1 to 10))
    cat.flush("d6") // v1 base
    cat.insert("d6", rows(Seq(1), _ => 99L)); cat.flushDelta("d6") // v2 delta on v1
    cat.flush("d6") // v3 base
    cat.flush("d6") // v4 base
    // keepLast=3 retains {v2,v3,v4}; v2 reads through its base v1 — v1 must stay
    assert(cat.vacuum("d6", keepLast = 3) === Seq.empty)
    assert(state(cat.timeTravel("d6", 2)).contains("id-1:99"))
    // keepLast=1 retains only v4 (a base): v1-v3 may now go
    assert(cat.vacuum("d6", keepLast = 1) === Seq(1, 2, 3))
    cat.releaseCollection("d6")
    cat.loadCollection("d6")
    assert(state(cat.resident("d6")).contains("id-1:99"))
  }

  test("streaming ingest lands one delta segment per micro-batch; cold fold converges") {
    val root = newRoot()
    val cat = newCatalog(root)
    cat.createCollection(meta("ds"))
    cat.loadCollection("ds")
    cat.insert("ds", rows(1 to 20))
    cat.flush("ds") // v1 base
    val tmp = Files.createTempDirectory("graft-ds-log").toString
    val ckpt = Files.createTempDirectory("graft-ds-ckpt").toString
    def put(ids: Seq[Int], label: Long, ver: Long): DataFrame =
      rows(ids, _ => label).select(lit("put").as("op"), col("id"),
        col("label"), col("vector"), lit(ver).as("ver"))
    def del(ids: Seq[Int], ver: Long): DataFrame =
      ids.map(i => s"id-$i").toDF("id").select(lit("del").as("op"), col("id"),
        lit(null).cast("long").as("label"),
        lit(null).cast("array<float>").as("vector"), lit(ver).as("ver"))
    put(Seq(1), 99L, 1L).unionByName(del(Seq(2), 2L))
      .coalesce(1).write.parquet(tmp + "/b1")
    put(Seq(2), 88L, 3L) // batch 2 resurrects the key batch 1 tombstoned
      .coalesce(1).write.parquet(tmp + "/b2")
    val schema = spark.read.parquet(tmp + "/b1").schema
    val q = graft.streaming.ChangeFeed.runIntoCollection(cat, "ds", spark,
      tmp + "/*", schema, versionCol = "ver", checkpointDir = ckpt,
      deltaFlushEachBatch = true, maxFilesPerTrigger = Some(1))
    q.awaitTermination(120000)
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(cat.getMeta("ds").currentVersion === 3) // one segment per batch
    (2 to 3).foreach(v => assert(
      fs.exists(new Path(s"$root/ds/v$v/${GraftCatalog.DeltaMarkerFile}")),
      s"v$v should be a delta segment"))
    cat.releaseCollection("ds")
    cat.loadCollection("ds")
    val got = state(cat.resident("ds"))
    assert(got.contains("id-1:99"))
    assert(got.contains("id-2:88")) // later segment's put beats the tombstone
    assert(got.size === 20)
  }

  test("changeLogBetween (O(changes) CDC) equals stateDiff on a delta window; loud across compaction") {
    val cat = newCatalog()
    cat.createCollection(meta("d7", versioning = true))
    cat.loadCollection("d7")
    cat.insert("d7", rows(1 to 20))
    cat.flush("d7") // v1
    cat.insert("d7", rows(Seq(1, 2), _ => 99L))
    cat.delete("d7", Single("id", FilterExpr.Eq, "id-3"))
    cat.flushDelta("d7") // v2
    cat.insert("d7", rows(Seq(21), _ => 77L)) // fresh key
    cat.insert("d7", rows(Seq(3), _ => 55L)) // resurrect the tombstoned key
    cat.flushDelta("d7") // v3
    def shape(df: DataFrame): Set[(String, String, Any)] =
      df.select("op", "id", "label").collect()
        .map(r => (r.getString(0), r.getString(1), r.get(2))).toSet
    val log = shape(cat.changeLogBetween("d7", 1, 3))
    val diff = shape(cat.stateDiff("d7", 1, 3))
    assert(log === diff) // clean mutations: the ledger fold IS the state diff
    assert(log.contains(("put", "id-3", 55L))) // net op for the del→put key
    assert(log.contains(("put", "id-21", 77L)))
    assert(!log.exists { case (op, id, _) => op == "del" && id == "id-3" })
    // sub-window: only v3's changes
    assert(shape(cat.changeLogBetween("d7", 2, 3)) ===
      Set(("put", "id-21", 77L), ("put", "id-3", 55L)))
    // compaction closes the ledger window
    cat.flush("d7") // v4 full
    val e = intercept[IllegalArgumentException](cat.changeLogBetween("d7", 1, 4))
    assert(e.getMessage.contains("stateDiff"))
    // …but stateDiff crosses it fine, and unchanged rows stay silent
    val d14 = shape(cat.stateDiff("d7", 1, 4))
    assert(d14 === log)
    // diff against empty: every current row is a put
    assert(cat.stateDiff("d7", 0, 4).where(col("op") =!= "put").isEmpty)
    assert(cat.stateDiff("d7", 0, 4).count() === 21) // 20 - 1 del + 1 new + resurrection
  }

  test("CDC edges: empty window, vacuumed window, schemaless map diff") {
    val cat = newCatalog()
    cat.createCollection(meta("d11", versioning = true))
    cat.loadCollection("d11")
    cat.insert("d11", rows(1 to 10))
    cat.flush("d11") // v1
    // "changes since head" is a legal empty answer, not an error
    assert(cat.changeLogBetween("d11", 1, 1).isEmpty)
    assert(cat.stateDiff("d11", 1, 1).isEmpty)
    cat.insert("d11", rows(Seq(1), _ => 99L)); cat.flushDelta("d11") // v2
    cat.flush("d11") // v3
    cat.flush("d11") // v4
    cat.vacuum("d11", keepLast = 1) // v1-v3 gone
    val e = intercept[IllegalStateException](cat.changeLogBetween("d11", 1, 2))
    assert(e.getMessage.contains("vacuumed"), e.getMessage) // not "full snapshot"
    assert(cat.stateDiff("d11", 0, 4).count() === 10) // the re-baseline path
    // both CDC readers emit op FIRST — one documented shape, either path
    assert(cat.stateDiff("d11", 0, 4).columns.head === "op")
    cat.insert("d11", rows(Seq(1), _ => 77L)); cat.flushDelta("d11") // v5
    assert(cat.changeLogBetween("d11", 4, 5).columns.head === "op")
    assert(cat.changeLogBetween("d11", 5, 5).columns.head === "op")
    // a user field named `op` collides with the CDC output — refused loudly
    val cop = newCatalog()
    cop.createCollection(CollectionMeta("opc", dim = 4, distance = "euclidean",
      fields = Seq(IndexField("id", "string", primaryKey = true),
        IndexField("op", "string"))))
    cop.loadCollection("opc")
    cop.insert("opc", Seq(("a", "x", Array(1f, 0f, 0f, 0f))).toDF("id", "op", "vector"))
    cop.flush("opc")
    val eo = intercept[IllegalArgumentException](cop.stateDiff("opc", 0, 1))
    assert(eo.getMessage.contains("collides"), eo.getMessage)
    // schemaless: the metadata MAP column must diff (canonicalized entries)
    val cs = newCatalog()
    cs.createCollection(CollectionMeta("sdm", dim = 4, distance = "euclidean",
      schemaless = Some(true)))
    cs.loadCollection("sdm")
    val mkRows = (ids: Seq[Int], tag: String) => ids.map { i =>
      (s"id-$i", tag, Array.fill(4)(new scala.util.Random(i).nextFloat()))
    }.toDF("_id", "tag", "vector")
    cs.insert("sdm", mkRows(1 to 5, "a"))
    cs.flush("sdm")
    cs.insert("sdm", mkRows(Seq(2), "b")) // map content change only
    cs.flushDelta("sdm")
    val d = cs.stateDiff("sdm", 1, 2).collect()
    assert(d.length === 1)
    assert(d.head.getAs[String]("op") === "put")
    assert(d.head.getAs[String]("_id") === "id-2")
  }

  test("segmentCount + compactIfNeeded bound the chain at the LSM cadence") {
    val cat = newCatalog()
    cat.createCollection(meta("d8"))
    cat.loadCollection("d8")
    cat.insert("d8", rows(1 to 10))
    cat.flush("d8") // v1
    assert(cat.segmentCount("d8") === 0)
    cat.insert("d8", rows(Seq(1), _ => 91L)); cat.flushDelta("d8")
    assert(cat.segmentCount("d8") === 1)
    assert(cat.compactIfNeeded("d8", maxSegments = 3) === None) // below the bound
    cat.insert("d8", rows(Seq(2), _ => 92L)); cat.flushDelta("d8")
    cat.insert("d8", rows(Seq(3), _ => 93L)); cat.flushDelta("d8")
    assert(cat.segmentCount("d8") === 3)
    val expected = state(cat.resident("d8"))
    assert(cat.compactIfNeeded("d8", maxSegments = 3) === Some(5)) // v5 base
    assert(cat.segmentCount("d8") === 0)
    cat.releaseCollection("d8")
    cat.loadCollection("d8")
    assert(state(cat.resident("d8")) === expected)
  }

  test("a concurrently-claimed slot fails flushDelta cleanly; the ledger survives for retry") {
    val root = newRoot()
    val cat = newCatalog(root)
    cat.createCollection(meta("d9"))
    cat.loadCollection("d9")
    cat.insert("d9", rows(1 to 10))
    cat.flush("d9") // v1
    cat.insert("d9", rows(Seq(1), _ => 99L))
    // simulate another driver holding the v2 claim (fresh timestamp)
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val claim = fs.create(new Path(s"$root/d9/v2.claim"), false)
    claim.write(s"other@host ${System.currentTimeMillis()}".getBytes("UTF-8")); claim.close()
    intercept[GraftCatalog.ConcurrentFlushException](cat.flushDelta("d9"))
    assert(!fs.exists(new Path(s"$root/d9/v2"))) // no orphan segment
    assert(cat.getMeta("d9").currentVersion === 1) // meta unchanged
    // the lost race must NOT lose the ledger: clearing the claim, the retry lands
    fs.delete(new Path(s"$root/d9/v2.claim"), false)
    assert(cat.flushDelta("d9") === 2)
    cat.releaseCollection("d9")
    cat.loadCollection("d9")
    assert(state(cat.resident("d9")).contains("id-1:99"))
  }

  test("fold plan shape: winners broadcast to the anti-join; the base is never shuffled") {
    val root = newRoot()
    val cat = newCatalog(root)
    cat.createCollection(meta("d10"))
    cat.loadCollection("d10")
    cat.insert("d10", rows(1 to 500))
    cat.flush("d10")
    cat.insert("d10", rows(Seq(1), _ => 99L))
    cat.flushDelta("d10")
    val p = cat.snapshot("d10").queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"),
      s"delta winner keys must broadcast into the base anti-join:\n$p")
    assert(!p.contains("SortMergeJoin"), s"base-side shuffle join crept into the fold:\n$p")
    // the only hash exchanges belong to the (small) winners aggregation
    val shuffles = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(shuffles <= 2, s"fold shuffled more than the delta log ($shuffles):\n$p")
  }

  test("crashed delta writer: stale claim + orphan staging do not block the next flushDelta") {
    val root = newRoot()
    val cat = new GraftCatalog(spark, root, staleClaimMs = 50L)
    cat.createCollection(meta("d12"))
    cat.loadCollection("d12")
    cat.insert("d12", rows(1 to 10))
    cat.flush("d12") // v1
    cat.insert("d12", rows(Seq(1), _ => 99L))
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // simulate a writer that died between claim and publish: an old claim
    // plus its abandoned staging dir
    val stale = fs.create(new Path(s"$root/d12/v2.claim"), false)
    stale.write(s"dead@host ${System.currentTimeMillis() - 10000}".getBytes("UTF-8")); stale.close()
    fs.mkdirs(new Path(s"$root/d12/.staging-v2-deadbeef/data"))
    Thread.sleep(60) // cross the staleness horizon
    assert(cat.flushDelta("d12") === 2) // reclaims the slot, publishes cleanly
    cat.releaseCollection("d12")
    cat.loadCollection("d12")
    assert(state(cat.resident("d12")).contains("id-1:99"))
    // vacuum sweeps the dead writer's orphaned staging bytes
    assert(fs.exists(new Path(s"$root/d12/.staging-v2-deadbeef")))
    cat.vacuum("d12")
    assert(!fs.exists(new Path(s"$root/d12/.staging-v2-deadbeef")))
  }

  test("exportCollection: chain + sidecars travel; the copy loads and folds identically") {
    val cat = newCatalog()
    cat.createCollection(meta("exp"))
    cat.loadCollection("exp")
    cat.insert("exp", rows(1 to 50))
    cat.flush("exp") // v1
    cat.insert("exp", rows(Seq(1), _ => 99L))
    cat.delete("exp", Single("id", FilterExpr.Eq, "id-2"))
    cat.flushDelta("exp") // v2 — the delta segment must travel with its marker
    val expected = state(cat.resident("exp"))
    val destRoot = newRoot()
    cat.exportCollection("exp", destRoot)
    val dst = newCatalog(destRoot)
    assert(dst.exists("exp"))
    dst.loadCollection("exp")
    assert(state(dst.resident("exp")) === expected)
    // re-export refuses: ANY non-empty destination (a published copy or a
    // half-failed one) — retrying into leftovers would nest version dirs
    val e = intercept[IllegalArgumentException](cat.exportCollection("exp", destRoot))
    assert(e.getMessage.contains("not empty"))
    // an indexed collection's sidecars travel too: searches agree
    val catIvf = newCatalog()
    catIvf.createCollection(CollectionMeta("expq", dim = 4, distance = "euclidean",
      fields = fields, ivfCells = Some(4), pqSubspaces = Some(2), pqCodewords = Some(8),
      pqTrainIterations = Some(0)))
    catIvf.loadCollection("expq")
    catIvf.insert("expq", rows(1 to 64))
    catIvf.flush("expq")
    val qv = Array(0.3f, 0.5f, 0.1f, 0.9f)
    val want = catIvf.searchPq("expq", qv, topK = 5, rerank = false)
      .collect().map(_.toString).toSeq
    val destRoot2 = newRoot()
    catIvf.exportCollection("expq", destRoot2)
    val dst2 = newCatalog(destRoot2)
    assert(dst2.searchPq("expq", qv, topK = 5, rerank = false)
      .collect().map(_.toString).toSeq === want)
  }

  test("applyChanges batches ride the ledger") {
    val cat = newCatalog()
    cat.createCollection(meta("dc"))
    cat.loadCollection("dc")
    cat.insert("dc", rows(1 to 10))
    cat.flush("dc")
    val changes = Seq(
      ("id-1", 70L, Array(0.1f, 0.2f, 0.3f, 0.4f), "put", 1L),
      ("id-2", 0L, null.asInstanceOf[Array[Float]], "del", 2L),
      ("id-11", 71L, Array(0.5f, 0.6f, 0.7f, 0.8f), "put", 3L)
    ).toDF("id", "label", "vector", "op", "ver")
    cat.applyChanges("dc", changes, versionCol = "ver")
    val expected = state(cat.resident("dc"))
    cat.flushDelta("dc")
    cat.releaseCollection("dc")
    cat.loadCollection("dc")
    val got = state(cat.resident("dc"))
    assert(got === expected)
    assert(got.contains("id-1:70") && got.contains("id-11:71"))
    assert(!got.exists(_.startsWith("id-2:")))
  }

  test("flushDelta skips an ALL-EMPTY ledger without publishing a version (r15: " +
      "the footer-count guard that replaced the streaming per-batch isEmpty probe)") {
    val root = newRoot()
    val cat = newCatalog(root)
    cat.createCollection(meta("de"))
    cat.loadCollection("de")
    cat.insert("de", rows(1 to 10))
    assert(cat.flush("de") === 1)
    // an empty applyChanges batch (what an empty streaming micro-batch now
    // forwards unconditionally) tracks an empty ledger entry
    val empty = Seq.empty[(String, Long, Array[Float], String, Long)]
      .toDF("id", "label", "vector", "op", "ver")
    cat.applyChanges("de", empty, versionCol = "ver")
    val before = state(cat.resident("de"))
    assert(cat.flushDelta("de") === 1, "no version bump for an all-empty ledger")
    assert(cat.getMeta("de").currentVersion === 1)
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new Path(s"$root/de/v2")), "no v2 dir published")
    assert(stagingOrphans(root, "de").isEmpty, "staging cleaned up on the skip")
    // the skip cleared the (empty) ledger: flushDelta now reports no pending
    intercept[IllegalStateException](cat.flushDelta("de"))
    // and a REAL batch afterwards flushes normally
    cat.applyChanges("de", Seq(("id-1", 70L, Array(0.1f, 0.2f, 0.3f, 0.4f), "put", 1L))
      .toDF("id", "label", "vector", "op", "ver"), versionCol = "ver")
    assert(cat.flushDelta("de") === 2)
    cat.releaseCollection("de")
    cat.loadCollection("de")
    assert(state(cat.resident("de")) === before - "id-1:1" + "id-1:70")
  }

  /** No staging leftovers under the collection dir (claims may remain for
    * the published versions — they are the slot's tombstone). */
  private def stagingOrphans(root: String, name: String): Seq[String] = {
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(new Path(s"$root/$name")).toSeq.map(_.getPath.getName)
      .filter(_.startsWith(".staging-"))
  }

  test("LIVE two-writer race on one version slot: exactly one winner, loser aborts " +
    "cleanly, no staging orphans") {
    val root = newRoot()
    // two catalogs over the SAME root = two drivers sharing a warehouse
    val catA = newCatalog(root)
    val catB = newCatalog(root)
    catA.createCollection(meta("race"))
    catA.loadCollection("race")
    catA.insert("race", rows(1 to 20))
    catA.flush("race") // v1
    catB.loadCollection("race")
    catA.insert("race", rows(Seq(1), _ => 71L))
    catB.insert("race", rows(Seq(2), _ => 72L))
    // both writers target v2 (each read currentVersion=1 at entry); start
    // them together so the claim CAS — not entry timing — decides
    val start = new java.util.concurrent.CountDownLatch(1)
    import scala.util.Try
    def racer(f: () => Int): java.util.concurrent.FutureTask[Try[Int]] =
      new java.util.concurrent.FutureTask(() => { start.await(); Try(f()) })
    val ta = racer(() => catA.flushDelta("race"))
    val tb = racer(() => catB.flushDelta("race"))
    new Thread(ta).start(); new Thread(tb).start()
    start.countDown()
    val (ra, rb) = (ta.get(), tb.get())
    val outcomes = Seq(ra, rb)
    val wins = outcomes.collect { case scala.util.Success(v) => v }
    val losses = outcomes.collect { case scala.util.Failure(e) => e }
    // the near-certain outcome is one winner + one ConcurrentFlushException;
    // if the loser happened to enter after the winner PUBLISHED, it
    // legitimately serialized onto the next slot instead — accept both, but
    // never two claims of the same slot
    assert(wins.nonEmpty, s"no writer succeeded: $losses")
    assert(wins.distinct.size === wins.size, s"two writers claimed one slot: $wins")
    losses.foreach(e => assert(e.isInstanceOf[GraftCatalog.ConcurrentFlushException],
      s"loser must abort with ConcurrentFlushException, got: $e"))
    assert(stagingOrphans(root, "race").isEmpty,
      s"staging dirs left behind: ${stagingOrphans(root, "race")}")
    // the published chain reads cleanly and holds every winner's change
    val reader = newCatalog(root)
    reader.loadCollection("race")
    val got = state(reader.resident("race"))
    if (losses.isEmpty) { // both serialized: both changes landed
      assert(got.contains("id-1:71") && got.contains("id-2:72"))
    } else { // one aborted: exactly one change landed, the other's ledger survives
      assert(got.contains("id-1:71") ^ got.contains("id-2:72"),
        s"expected exactly one winning change, got $got")
    }
    assert(reader.getMeta("race").currentVersion === 1 + wins.size)
  }

  test("LIVE flush-vs-flushDelta race on one slot: claim CAS serializes, no orphans") {
    val root = newRoot()
    val catA = newCatalog(root)
    val catB = newCatalog(root)
    catA.createCollection(meta("race2"))
    catA.loadCollection("race2")
    catA.insert("race2", rows(1 to 20))
    catA.flush("race2") // v1
    catB.loadCollection("race2")
    catA.insert("race2", rows(Seq(3), _ => 73L)) // full-flush side
    catB.insert("race2", rows(Seq(4), _ => 74L)) // delta side
    val start = new java.util.concurrent.CountDownLatch(1)
    import scala.util.Try
    def racer(f: () => Int): java.util.concurrent.FutureTask[Try[Int]] =
      new java.util.concurrent.FutureTask(() => { start.await(); Try(f()) })
    val ta = racer(() => catA.flush("race2"))
    val tb = racer(() => catB.flushDelta("race2"))
    new Thread(ta).start(); new Thread(tb).start()
    start.countDown()
    val outcomes = Seq(ta.get(), tb.get())
    val wins = outcomes.collect { case scala.util.Success(v) => v }
    val losses = outcomes.collect { case scala.util.Failure(e) => e }
    assert(wins.nonEmpty, s"no writer succeeded: $losses")
    assert(wins.distinct.size === wins.size, s"two writers claimed one slot: $wins")
    losses.foreach(e => assert(e.isInstanceOf[GraftCatalog.ConcurrentFlushException],
      s"loser must abort with ConcurrentFlushException, got: $e"))
    assert(stagingOrphans(root, "race2").isEmpty)
    val reader = newCatalog(root)
    reader.loadCollection("race2") // the head (full or delta chain) must fold cleanly
    assert(reader.resident("race2").count() >= 20)
  }

  test("LIVE two-reclaimer race on one STALE claim: the rename CAS admits exactly one " +
    "winner (delete-then-recreate admitted both, and the loser deleted the winner's data)") {
    val root = newRoot()
    val catA = new GraftCatalog(spark, root, staleClaimMs = 50L)
    val catB = new GraftCatalog(spark, root, staleClaimMs = 50L)
    catA.createCollection(meta("rrace"))
    catA.loadCollection("rrace")
    catA.insert("rrace", rows(1 to 20))
    catA.flush("rrace") // v1
    catB.loadCollection("rrace")
    catA.insert("rrace", rows(Seq(5), _ => 75L))
    catB.insert("rrace", rows(Seq(6), _ => 76L))
    // the contested stale claim both writers will try to reclaim
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stale = fs.create(new Path(s"$root/rrace/v2.claim"), false)
    stale.write(s"dead@host ${System.currentTimeMillis() - 10000}".getBytes("UTF-8")); stale.close()
    Thread.sleep(60)
    val start = new java.util.concurrent.CountDownLatch(1)
    import scala.util.Try
    def racer(f: () => Int): java.util.concurrent.FutureTask[Try[Int]] =
      new java.util.concurrent.FutureTask(() => { start.await(); Try(f()) })
    val ta = racer(() => catA.flushDelta("rrace"))
    val tb = racer(() => catB.flushDelta("rrace"))
    new Thread(ta).start(); new Thread(tb).start()
    start.countDown()
    val outcomes = Seq(ta.get(), tb.get())
    val wins = outcomes.collect { case scala.util.Success(v) => v }
    val losses = outcomes.collect { case scala.util.Failure(e) => e }
    assert(wins.nonEmpty, s"no reclaimer succeeded: $losses")
    assert(wins.distinct.size === wins.size, s"two writers claimed one slot: $wins")
    losses.foreach(e => assert(e.isInstanceOf[GraftCatalog.ConcurrentFlushException],
      s"loser must abort with ConcurrentFlushException, got: $e"))
    assert(stagingOrphans(root, "rrace").isEmpty)
    // every winning segment must still be READABLE — under delete-then-
    // recreate the losing reclaimer deleted the winner's fresh data
    val reader = newCatalog(root)
    reader.loadCollection("rrace")
    val got = state(reader.resident("rrace"))
    if (losses.isEmpty) assert(got.contains("id-5:75") && got.contains("id-6:76"))
    else assert(got.contains("id-5:75") ^ got.contains("id-6:76"),
      s"expected exactly one winning change, got $got")
  }

  test("reclaimed stale claim with a dead writer's ORPHAN version dir: the orphan is " +
    "deleted, never published (rename-into nesting would lose the live ledger)") {
    val root = newRoot()
    val cat = new GraftCatalog(spark, root, staleClaimMs = 50L)
    cat.createCollection(meta("d13"))
    cat.loadCollection("d13")
    cat.insert("d13", rows(1 to 10))
    cat.flush("d13") // v1
    cat.insert("d13", rows(Seq(1), _ => 55L)) // the LIVE pending change
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a dead writer crashed AFTER renaming its staging onto v2 but BEFORE
    // writeMeta: orphan segment dir (with delta marker) + stale claim, meta
    // still at v1
    val deadSeg = Seq(("id-99", 666L, Array(0.1f, 0.2f, 0.3f, 0.4f), "put", 1L))
      .toDF("id", "label", "vector", GraftCatalog.DeltaOpCol, GraftCatalog.DeltaSeqCol)
    deadSeg.write.parquet(s"$root/d13/v2")
    fs.create(new Path(s"$root/d13/v2/${GraftCatalog.DeltaMarkerFile}"), true).close()
    val stale = fs.create(new Path(s"$root/d13/v2.claim"), false)
    stale.write(s"dead@host ${System.currentTimeMillis() - 10000}".getBytes("UTF-8")); stale.close()
    Thread.sleep(60)
    assert(cat.flushDelta("d13") === 2) // reclaims the slot
    cat.releaseCollection("d13")
    cat.loadCollection("d13")
    val got = state(cat.resident("d13"))
    // the LIVE ledger was published — not the dead writer's segment, and not
    // a nested v2/data hybrid
    assert(got.contains("id-1:55"), s"live change lost: $got")
    assert(!got.exists(_.startsWith("id-99:")), s"dead writer's data published: $got")
    assert(!fs.exists(new Path(s"$root/d13/v2/data")), "rename nested into the orphan dir")
  }

  test("validateParquetDir: driver-side footer check matches inference semantics (r14)") {
    // flushDelta's post-rename readability gate runs footer reads on the
    // driver instead of a spark.read.parquet schema-inference JOB — same
    // accept/reject behavior, one less dispatch floor per delta flush
    val root = newRoot()
    val cat = newCatalog(root)
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a real segment dir passes (and the whole delta lifecycle still works)
    cat.createCollection(meta("vp"))
    cat.loadCollection("vp")
    cat.insert("vp", rows(1 to 8))
    cat.flush("vp")
    cat.insert("vp", rows(Seq(9)))
    assert(cat.flushDelta("vp") === 2)
    cat.validateParquetDir(new Path(s"$root/vp/v2"))
    // marker / _-prefixed sidecars are ignored, like parquet readers do
    assert(fs.exists(new Path(s"$root/vp/v2/${GraftCatalog.DeltaMarkerFile}")))
    // a dir whose data file is garbage refuses — exactly what inference did
    val bad = new Path(s"$root/garbage-seg")
    fs.mkdirs(bad)
    val out = fs.create(new Path(bad, "part-00000.parquet"), true)
    out.write("this is not a parquet file".getBytes("UTF-8")); out.close()
    intercept[Exception](cat.validateParquetDir(bad))
    // an empty dir (no data files at all) refuses too
    val none = new Path(s"$root/empty-seg")
    fs.mkdirs(none)
    intercept[IllegalArgumentException](cat.validateParquetDir(none))
  }
}
