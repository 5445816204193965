package graft

import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets
import java.nio.file.Files
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import graft.collection._
import graft.serve.GraftServer

/** Serve-stale-during-refresh for the driver-local rungs (r13 verdict #1).
  *
  * Before r14, a stale searchLocal* request folded — or after a compaction,
  * fully REBUILT, 16.5 s at 1M — under the per-collection build lock while
  * every concurrent request for that collection queued behind it. The
  * reference's HNSW answers queries during inserts (per-shard RWMutex,
  * core/vectorindex/hnsw.go:104-167); the batch-first analog is
  * build-beside-and-swap: the builder folds/rebuilds the new index outside
  * any path a reader needs, swaps it in with one cache write, and every
  * request that finds the build lock HELD serves the resident previous
  * version immediately — consistent with the meta-last publish contract's
  * "a reader sees the old head bit-for-bit" promise.
  *
  * The spec drives REAL concurrent HTTP requests through a forced slow
  * rebuild (the test hook holds the builder inside its critical section)
  * and asserts (a) no concurrent request blocks — bounded milliseconds,
  * not O(rebuild); (b) every response is one of the two adjacent versions'
  * answers; (c) after the swap, requests serve the new head. */
class ServeDuringRefreshSpec extends SparkSpec {
  import spark.implicits._

  private val root = Files.createTempDirectory("graft-servestale").toString

  // "the other driver": publishes v1 and later the cross-driver delta the
  // server's resident rung has not seen
  private lazy val cat = {
    val c = new GraftCatalog(spark, root)
    c.createCollection(CollectionMeta("sd", dim = 4, distance = "euclidean",
      fields = Seq(IndexField("id", "string", primaryKey = true)),
      ivfCells = Some(4), ivfTrainIterations = Some(0)))
    c.loadCollection("sd")
    val rows = (0 until 4).flatMap { ci =>
      (0 until 30).map { j =>
        (s"v${ci}_$j", Seq.tabulate(4)(k => if (k == ci) 100f + j else j * 0.5f))
      }
    }
    c.insert("sd", rows.toDF("id", "vector"))
    c.flush("sd") // v1
    c
  }

  private lazy val server = {
    val s = new GraftServer(spark, root)
    s.start()
    s
  }
  private def base = s"http://127.0.0.1:${server.boundPort}"

  private def http(method: String, path: String, body: String = ""): (Int, String) = {
    val conn = URI.create(base + path).toURL.openConnection().asInstanceOf[HttpURLConnection]
    conn.setRequestMethod(method)
    conn.setConnectTimeout(10000)
    conn.setReadTimeout(60000)
    if (body.nonEmpty) {
      conn.setDoOutput(true)
      conn.getOutputStream.write(body.getBytes(StandardCharsets.UTF_8))
    }
    val code = conn.getResponseCode
    val in = if (code < 400) conn.getInputStream else conn.getErrorStream
    val resp = new String(in.readAllBytes(), StandardCharsets.UTF_8)
    conn.disconnect()
    (code, resp)
  }

  private val probe = """{"vector":[100,0,0,0],"topK":3,"nprobe":4}"""
  private def searchLocal(): (Int, String) =
    http("POST", "/collections/sd/searchLocal", probe)

  test("concurrent probes serve the resident previous version while a forced " +
    "slow rebuild holds the build lock; the swap publishes the new head") {
    cat: Unit // publish v1 before the server's first probe
    // warm the rung at v1
    val (c1, v1Answer) = searchLocal()
    assert(c1 === 200, v1Answer)
    assert(v1Answer.contains("\"v0_0\""), v1Answer) // nearest to [100,0,0,0]

    // cross-driver delta: the current top hit moves far away, so v2's
    // answer is DISTINGUISHABLE from v1's
    cat.insert("sd", Seq(("v0_0", Seq(0f, 0f, 0f, 500f))).toDF("id", "vector"))
    cat.flushDelta("sd") // v2 — published by the other driver; this
    // server's resident rung still serves v1 until a request folds it

    // hold the next builder inside its critical section
    val entered = new CountDownLatch(1)
    val gate = new CountDownLatch(1)
    server.localBuildHook = () => {
      entered.countDown()
      gate.await(60, TimeUnit.SECONDS): Unit
    }
    val pool = Executors.newSingleThreadExecutor()
    try {
      val builder = pool.submit(() => searchLocal())
      assert(entered.await(30, TimeUnit.SECONDS), "builder never reached the fold")

      // concurrent requests during the held build: each must answer in
      // bounded milliseconds (generous 5 s CI allowance vs the 60 s hold)
      // with the ADJACENT PREVIOUS version's exact answer
      (1 to 5).foreach { i =>
        val t0 = System.nanoTime()
        val (code, resp) = searchLocal()
        val ms = (System.nanoTime() - t0) / 1e6
        assert(code === 200)
        assert(resp === v1Answer, s"probe $i served neither adjacent version: $resp")
        assert(ms < 5000, s"probe $i blocked ${ms}ms behind the builder")
      }

      gate.countDown()
      server.localBuildHook = () => ()
      val (bc, builderAnswer) = builder.get(60, TimeUnit.SECONDS)
      assert(bc === 200)
      // the builder's own answer is the new head's: v0_0 moved away
      assert(!builderAnswer.contains("\"v0_0\","), builderAnswer)
      assert(builderAnswer !== v1Answer)
      // and the swap is visible to every later request
      val (ac, after) = searchLocal()
      assert(ac === 200)
      assert(after === builderAnswer)
    } finally {
      server.localBuildHook = () => ()
      gate.countDown()
      pool.shutdownNow()
    }
  }

  test("the flushDelta route's eager fold runs after the write lock " +
    "downgrades: the flushDelta client is not blocked by the fold, and " +
    "probes serve the previous version until the swap") {
    cat.createCollection(CollectionMeta("sd4", dim = 4, distance = "euclidean",
      fields = Seq(IndexField("id", "string", primaryKey = true)),
      ivfCells = Some(2), ivfTrainIterations = Some(0)))
    cat.loadCollection("sd4")
    cat.insert("sd4", (0 until 40).map(i =>
      (s"u$i", Seq(i.toFloat, 1f, 2f, 3f))).toDF("id", "vector"))
    cat.flush("sd4") // v1
    def probe(): (Int, String) =
      http("POST", "/collections/sd4/searchLocal",
        """{"vector":[0,1,2,3],"topK":3,"nprobe":2}""")
    val (wc, v1Answer) = probe() // warm the rung at v1
    assert(wc === 200, v1Answer)
    assert(v1Answer.contains("\"u0\""), v1Answer)
    // mutate THROUGH the server: u0 moves far from the query
    assert(http("POST", "/collections/sd4/load")._1 === 200)
    assert(http("POST", "/collections/sd4/insert",
      """{"rows":[{"id":"u0","vector":[500,500,500,500]}]}""")._1 === 200)
    val entered = new CountDownLatch(1)
    val gate = new CountDownLatch(1)
    server.localBuildHook = () => {
      entered.countDown()
      gate.await(60, TimeUnit.SECONDS): Unit
    }
    val pool = Executors.newSingleThreadExecutor()
    try {
      val t0 = System.nanoTime()
      val flush = pool.submit(() => http("POST", "/collections/sd4/flushDelta"))
      // the publish + response must complete while the FOLD is still held
      // at the hook — the client never waits on the cache refresh
      val (fc, fr) = flush.get(60, TimeUnit.SECONDS)
      val flushMs = (System.nanoTime() - t0) / 1e6
      assert(fc === 200, fr)
      assert(entered.await(30, TimeUnit.SECONDS), "eager fold never started")
      assert(gate.getCount === 1, s"flushDelta returned in ${flushMs}ms but the fold had already run")
      // probes during the held fold: the previous version, no blocking
      (1 to 3).foreach { i =>
        val p0 = System.nanoTime()
        val (code, resp) = probe()
        val ms = (System.nanoTime() - p0) / 1e6
        assert(code === 200)
        assert(resp === v1Answer, s"probe $i: $resp")
        assert(ms < 5000, s"probe $i blocked ${ms}ms behind the eager fold")
      }
      gate.countDown()
      server.localBuildHook = () => ()
      // the fold swaps in the folded rung; u0 is no longer the nearest
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      var last = ""
      while ({ last = probe()._2; last == v1Answer && System.nanoTime() < deadline })
        Thread.sleep(50)
      assert(!last.contains("\"u0\""), last)
    } finally {
      server.localBuildHook = () => ()
      gate.countDown()
      pool.shutdownNow()
    }
  }

  test("a cold cache has no adjacent version to serve — the request waits for " +
    "the builder and gets the fresh index") {
    // a second collection the server has never probed: truly cold cache
    cat.createCollection(CollectionMeta("sd2", dim = 4, distance = "euclidean",
      fields = Seq(IndexField("id", "string", primaryKey = true)),
      ivfCells = Some(2), ivfTrainIterations = Some(0)))
    cat.loadCollection("sd2")
    cat.insert("sd2", (0 until 40).map(i =>
      (s"w$i", Seq(i.toFloat, 1f, 2f, 3f))).toDF("id", "vector"))
    cat.flush("sd2")
    def searchLocal(): (Int, String) =
      http("POST", "/collections/sd2/searchLocal",
        """{"vector":[5,1,2,3],"topK":3,"nprobe":2}""")
    val entered = new CountDownLatch(1)
    val gate = new CountDownLatch(1)
    server.localBuildHook = () => {
      entered.countDown()
      gate.await(30, TimeUnit.SECONDS): Unit
    }
    val pool = Executors.newFixedThreadPool(2)
    try {
      val a = pool.submit(() => searchLocal())
      assert(entered.await(30, TimeUnit.SECONDS))
      server.localBuildHook = () => () // the waiter must not re-trip the hook
      val b = pool.submit(() => searchLocal()) // nothing resident: must wait
      Thread.sleep(200)
      assert(!b.isDone, "cold-cache request should wait for the builder, not race it")
      gate.countDown()
      val (ca, ra) = a.get(60, TimeUnit.SECONDS)
      val (cb, rb) = b.get(60, TimeUnit.SECONDS)
      assert(ca === 200 && cb === 200)
      assert(ra === rb, "both requests must serve the one built index")
    } finally {
      server.localBuildHook = () => ()
      gate.countDown()
      pool.shutdownNow()
    }
  }
}
