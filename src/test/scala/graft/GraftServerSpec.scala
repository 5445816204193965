package graft

import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets
import java.nio.file.Files

import graft.serve.GraftServer

/** The HTTP serving shim end-to-end over a real socket: the reference's
  * EdgeRpc lifecycle (create → load → insert → search → delete → flush →
  * release → drop) plus the state-machine and validation error contracts. */
class GraftServerSpec extends SparkSpec {

  private lazy val server = {
    val s = new GraftServer(spark, Files.createTempDirectory("graft-serve").toString)
    s.start()
    s
  }
  private def base = s"http://127.0.0.1:${server.boundPort}"

  private def http(method: String, path: String, body: String = ""): (Int, String) = {
    val conn = URI.create(base + path).toURL.openConnection().asInstanceOf[HttpURLConnection]
    conn.setRequestMethod(method)
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

  test("full EdgeRpc lifecycle over HTTP: create, load, insert, search, filter, delete, flush, info") {
    assert(http("GET", "/ping") === ((200, """{"ok":true}""")))

    val meta = """{"name":"web","dim":3,"distance":"euclidean","fields":[
      {"name":"id","fieldType":"string","primaryKey":true},
      {"name":"type","fieldType":"integer"}]}"""
    assert(http("POST", "/collections", meta)._1 === 200)
    assert(http("GET", "/collections")._2.contains("\"web\""))

    assert(http("POST", "/collections/web/load")._1 === 200)
    val ins = http("POST", "/collections/web/insert",
      """{"rows":[
        {"id":"a","type":1,"vector":[1,0,0]},
        {"id":"b","type":2,"vector":[0,1,0]},
        {"id":"c","type":5,"vector":[0,0,1]}]}""")
    assert(ins === ((200, """{"inserted":3}""")))

    val (sc, sr) = http("POST", "/collections/web/search",
      """{"vector":[1,0.1,0],"topK":2}""")
    assert(sc === 200)
    assert(sr.indexOf("\"id\":\"a\"") >= 0, sr)
    assert(sr.indexOf("\"id\":\"a\"") < sr.indexOf("\"id\":\"b\""), s"nearest first: $sr")

    // composite filter tree routed through the same AST as library callers
    val (fc, fr) = http("POST", "/collections/web/search",
      """{"vector":[1,0,0],"topK":10,
         "filter":{"or":[{"col":"type","op":"gte","value":5},{"col":"id","op":"eq","value":"b"}]}}""")
    assert(fc === 200)
    assert(fr.contains("\"id\":\"b\"") && fr.contains("\"id\":\"c\"") && !fr.contains("\"id\":\"a\""), fr)

    assert(http("POST", "/collections/web/delete",
      """{"filter":{"col":"type","op":"eq","value":2}}""")._1 === 200)
    val (_, info0) = http("GET", "/collections/web")
    assert(info0.contains("\"rows\":2"), info0)

    val (_, flushed) = http("POST", "/collections/web/flush")
    assert(flushed === """{"version":1}""")
    assert(http("POST", "/collections/web/release")._1 === 200)
    // snapshot survives release: reload and re-search
    assert(http("POST", "/collections/web/load")._1 === 200)
    val (_, again) = http("POST", "/collections/web/search", """{"vector":[0,0,1],"topK":1}""")
    assert(again.contains("\"id\":\"c\""), again)
    assert(http("DELETE", "/collections/web")._1 === 200)
    assert(!http("GET", "/collections")._2.contains("\"web\""))
  }

  test("flushDelta route: segment append + fold-on-reload over HTTP") {
    val meta = """{"name":"dlt","dim":3,"distance":"euclidean","fields":[
      {"name":"id","fieldType":"string","primaryKey":true},
      {"name":"type","fieldType":"integer"}]}"""
    assert(http("POST", "/collections", meta)._1 === 200)
    assert(http("POST", "/collections/dlt/load")._1 === 200)
    assert(http("POST", "/collections/dlt/insert",
      """{"rows":[
        {"id":"a","type":1,"vector":[1,0,0]},
        {"id":"b","type":2,"vector":[0,1,0]}]}""")._1 === 200)
    assert(http("POST", "/collections/dlt/flush")._2 === """{"version":1}""")
    // mutate, delta-flush the ledger, cold-reload the folded chain
    assert(http("POST", "/collections/dlt/insert",
      """{"rows":[{"id":"c","type":3,"vector":[0,0,1]}]}""")._1 === 200)
    assert(http("POST", "/collections/dlt/delete",
      """{"filter":{"col":"type","op":"eq","value":2}}""")._1 === 200)
    assert(http("POST", "/collections/dlt/flushDelta")._2 === """{"version":2}""")
    assert(http("POST", "/collections/dlt/release")._1 === 200)
    assert(http("POST", "/collections/dlt/load")._1 === 200)
    val (_, got) = http("POST", "/collections/dlt/search", """{"vector":[0,0.5,0.5],"topK":5}""")
    assert(got.contains("\"id\":\"c\"") && !got.contains("\"id\":\"b\""), got)
    // empty ledger refuses loudly (400, not 500)
    val (ec, eb) = http("POST", "/collections/dlt/flushDelta")
    assert(ec === 400 && eb.contains("no pending changes"), s"$ec $eb")
    assert(http("DELETE", "/collections/dlt")._1 === 200)
  }

  test("changes route: ledger CDC, state diff, and the auto fallback over HTTP") {
    val meta = """{"name":"cdc","dim":3,"distance":"euclidean","versioning":true,"fields":[
      {"name":"id","fieldType":"string","primaryKey":true},
      {"name":"type","fieldType":"integer"}]}"""
    assert(http("POST", "/collections", meta)._1 === 200)
    assert(http("POST", "/collections/cdc/load")._1 === 200)
    assert(http("POST", "/collections/cdc/insert",
      """{"rows":[
        {"id":"a","type":1,"vector":[1,0,0]},
        {"id":"b","type":2,"vector":[0,1,0]}]}""")._1 === 200)
    assert(http("POST", "/collections/cdc/flush")._2 === """{"version":1}""")
    assert(http("POST", "/collections/cdc/insert",
      """{"rows":[{"id":"c","type":3,"vector":[0,0,1]}]}""")._1 === 200)
    assert(http("POST", "/collections/cdc/delete",
      """{"filter":{"col":"id","op":"eq","value":"a"}}""")._1 === 200)
    assert(http("POST", "/collections/cdc/flushDelta")._2 === """{"version":2}""")
    // auto → ledger fold: del a + put c, nothing for untouched b
    val (lc, lb) = http("POST", "/collections/cdc/changes", """{"from":1}""")
    assert(lc === 200, lb)
    assert(lb.contains(""""op":"del"""") && lb.contains(""""id":"a""""), lb)
    assert(lb.contains(""""op":"put"""") && lb.contains(""""id":"c""""), lb)
    assert(!lb.contains(""""id":"b""""), lb)
    // compaction closes the ledger window: explicit log mode turns 400…
    assert(http("POST", "/collections/cdc/flush")._2 === """{"version":3}""")
    val (mc, mb) = http("POST", "/collections/cdc/changes", """{"from":1,"mode":"log"}""")
    assert(mc === 400 && mb.contains("stateDiff"), s"$mc $mb")
    // …while auto falls back to the exact diff with the same net content
    val (dc, db) = http("POST", "/collections/cdc/changes", """{"from":1,"to":3}""")
    assert(dc === 200 && db.contains(""""id":"a"""") && db.contains(""""id":"c""""), db)
    assert(!db.contains(""""id":"b""""), db)
    assert(http("DELETE", "/collections/cdc")._1 === 200)
  }

  test("error contracts: not-loaded, duplicate create, validation reject, unknown route") {
    val meta = """{"name":"err1","dim":2,"fields":[{"name":"id","fieldType":"string","primaryKey":true}]}"""
    assert(http("POST", "/collections", meta)._1 === 200)
    // search before load → the reference's ErrCollectionNotLoad (edge/constants.go:30)
    val (nc, nb) = http("POST", "/collections/err1/search", """{"vector":[1,0]}""")
    assert(nc === 400 && nb.contains("not loaded"), s"$nc $nb")
    // duplicate create
    val (dc, db) = http("POST", "/collections", meta)
    assert(dc === 400 && db.contains("already exists"))
    // per-row validation: wrong dimension rejected with the analyzer message
    assert(http("POST", "/collections/err1/load")._1 === 200)
    val (vc, vb) = http("POST", "/collections/err1/insert",
      """{"rows":[{"id":"x","vector":[1,2,3]}]}""")
    assert(vc === 400 && vb.contains("dimension mismatch"), s"$vc $vb")
    // non-integral value for an integer field (edge_analyzer.go:63-67 parity)
    val meta2 = """{"name":"err2","dim":2,"fields":[
      {"name":"id","fieldType":"string","primaryKey":true},
      {"name":"n","fieldType":"integer"}]}"""
    assert(http("POST", "/collections", meta2)._1 === 200)
    assert(http("POST", "/collections/err2/load")._1 === 200)
    val (ic, ib) = http("POST", "/collections/err2/insert",
      """{"rows":[{"id":"x","n":5.5,"vector":[1,0]}]}""")
    assert(ic === 400 && ib.contains("integer"), s"$ic $ib")
    // integral float accepted (5.0 → 5)
    assert(http("POST", "/collections/err2/insert",
      """{"rows":[{"id":"x","n":5.0,"vector":[1,0]}]}""")._1 === 200)
    assert(http("GET", "/nope")._1 === 404)
    // malformed JSON bodies are client errors, not 500s
    val (mc, mb) = http("POST", "/collections", """{"name": "x", dim: !!!""")
    assert(mc === 400, s"$mc $mb")
    assert(http("POST", "/collections/err2/search", "not json at all")._1 === 400)
  }

  test("hybrid search over HTTP: ANN over-fetch intersected with filter candidates") {
    val meta = """{"name":"hyb","dim":3,"distance":"euclidean","fields":[
      {"name":"id","fieldType":"string","primaryKey":true},
      {"name":"grade","fieldType":"integer"}]}"""
    assert(http("POST", "/collections", meta)._1 === 200)
    assert(http("POST", "/collections/hyb/load")._1 === 200)
    assert(http("POST", "/collections/hyb/insert",
      """{"rows":[
        {"id":"a","grade":1,"vector":[1,0,0]},
        {"id":"b","grade":5,"vector":[0.9,0.1,0]},
        {"id":"c","grade":5,"vector":[0,1,0]},
        {"id":"d","grade":1,"vector":[0.95,0,0.05]}]}""")._1 === 200)
    // nearest to [1,0,0] are a, d — but only grade>=5 survives the filter:
    // the intersected answer is b then c, never a/d
    val (hc, hr) = http("POST", "/collections/hyb/searchHybrid",
      """{"vector":[1,0,0],"topK":2,
         "filter":{"col":"grade","op":"gte","value":5}}""")
    assert(hc === 200)
    assert(hr.contains("\"id\":\"b\"") && hr.contains("\"id\":\"c\"") &&
      !hr.contains("\"id\":\"a\"") && !hr.contains("\"id\":\"d\""), hr)
    assert(hr.indexOf("\"id\":\"b\"") < hr.indexOf("\"id\":\"c\""), s"nearest survivor first: $hr")
    // filter is mandatory on this route (pure similarity = /search)
    assert(http("POST", "/collections/hyb/searchHybrid",
      """{"vector":[1,0,0],"topK":2}""")._1 === 400)
    assert(http("DELETE", "/collections/hyb")._1 === 200)
  }

  test("path-traversal collection names are 400s at the HTTP layer, and nothing " +
       "escapes the catalog root") {
    // create with a traversal name: refused before any filesystem write
    val (cc, cb) = http("POST", "/collections",
      """{"name":"..","dim":3,"distance":"euclidean","fields":[
        {"name":"id","fieldType":"string","primaryKey":true}]}""")
    assert(cc === 400, cb)
    assert(cb.contains("invalid collection name"), cb)
    // delete with a traversal name: refused before fs.delete can run
    // (URI normalization would collapse /collections/../, so exercise the
    // catalog-reachable spellings)
    for (bad <- Seq("%2e%2e", "a%20b", "__x")) {
      val (dc, db) = http("DELETE", s"/collections/$bad")
      assert(dc === 400, s"$bad -> $dc $db")
    }
  }

  test("fuzz: malformed request bodies are client errors (400), never 500s, " +
       "and the server keeps serving") {
    val paths = Seq(
      "/collections", "/collections/fz/load", "/collections/fz/insert",
      "/collections/fz/delete", "/collections/fz/search",
      "/collections/fz/searchHybrid", "/collections/fz/searchIvf",
      "/collections/fz/searchBatch", "/collections/fz/searchPq",
      "/collections/fz/searchBinary", "/collections/fz/searchMulti",
      "/collections/fz/changes", "/collections/fz/export",
      "/collections/fz/flush", "/collections/fz/flushDelta")
    val bodies = Seq("", "{", "[1", "null", "123", "\"s\"", "{}",
      """{"vector":"notanarray"}""", """{"vector":[1,"x"]}""",
      """{"queries":42}""", """{"rows":{}}""", " ÿ",
      """{"filter":{"op":"???"}}""")
    for (p <- paths; b <- bodies) {
      val (code, resp) = http("POST", p, b)
      assert(code == 400 || code == 404, s"POST $p body=${b.take(20)} -> $code $resp")
    }
    // the server survived the barrage
    assert(http("GET", "/ping")._1 === 200)
  }

  test("multi-vector (CFLAT) search and CompareDist over HTTP") {
    val meta = """{"name":"mv","dim":2,"distance":"euclidean","fields":[
      {"name":"id","fieldType":"string","primaryKey":true},
      {"name":"v0","fieldType":"vector"},
      {"name":"v1","fieldType":"vector"}]}"""
    assert(http("POST", "/collections", meta)._1 === 200)
    assert(http("POST", "/collections/mv/load")._1 === 200)
    assert(http("POST", "/collections/mv/insert",
      """{"rows":[
        {"id":"a","v0":[1,0],"v1":[0,1]},
        {"id":"b","v0":[0,1],"v1":[1,0]}]}""")._1 === 200)
    val (mc, mb) = http("POST", "/collections/mv/searchMulti",
      """{"topK":2,"fields":[
        {"vectorCol":"v0","vector":[1,0],"ratio":70},
        {"vectorCol":"v1","vector":[0,1],"ratio":30}]}""")
    assert(mc === 200)
    assert(mb.indexOf("\"id\":\"a\"") >= 0 && mb.indexOf("\"id\":\"a\"") < mb.indexOf("\"id\":\"b\""), mb)
    // fractional ratios parse as Double (FieldQuery.ratio) — 60.5/39.5 must
    // not truncate to 60/39 and then refuse with "sum to 100"
    val (fc, fb) = http("POST", "/collections/mv/searchMulti",
      """{"topK":2,"fields":[
        {"vectorCol":"v0","vector":[1,0],"ratio":60.5},
        {"vectorCol":"v1","vector":[0,1],"ratio":39.5}]}""")
    assert(fc === 200, s"$fc $fb")
    // ratios must sum to 100 (experimental_analyzer.go:143-154)
    val (rc, rb) = http("POST", "/collections/mv/searchMulti",
      """{"fields":[{"vectorCol":"v0","vector":[1,0],"ratio":50}]}""")
    assert(rc === 400 && rb.contains("100"), s"$rc $rb")

    // CompareDist: identical vectors → dist 0, cosine score 100
    val (cc, cb) = http("POST", "/compare", """{"a":[1,2,3],"b":[1,2,3],"metric":"cosine"}""")
    assert(cc === 200 && cb.contains("\"dist\":0.0") && cb.contains("\"score\":100.0"), s"$cc $cb")
    val (dc2, db2) = http("POST", "/compare", """{"a":[1,0],"b":[0,1],"metric":"euclidean"}""")
    assert(dc2 === 200 && db2.contains("\"dist\":1.414214"), db2)
  }

  test("multi-vector IVF over HTTP: probed search + the multi audit rung") {
    val meta = """{"name":"mvp","dim":2,"distance":"euclidean","ivfCells":2,"fields":[
      {"name":"id","fieldType":"string","primaryKey":true},
      {"name":"v0","fieldType":"vector"},
      {"name":"v1","fieldType":"vector"}]}"""
    assert(http("POST", "/collections", meta)._1 === 200)
    assert(http("POST", "/collections/mvp/load")._1 === 200)
    // two well-separated v0 clusters (seed centroids = the 2 id-smallest
    // rows, one per cluster); v1 is the reversed pattern
    assert(http("POST", "/collections/mvp/insert",
      """{"rows":[
        {"id":"a1","v0":[10,0],"v1":[0,10]},
        {"id":"b1","v0":[0,10],"v1":[10,0]},
        {"id":"a2","v0":[11,0],"v1":[0,11]},
        {"id":"b2","v0":[0,11],"v1":[11,0]}]}""")._1 === 200)
    assert(http("POST", "/collections/mvp/flush")._2 === """{"version":1}""")
    val q = """"fields":[
      {"vectorCol":"v0","vector":[10,0],"ratio":60},
      {"vectorCol":"v1","vector":[0,10],"ratio":40}]"""
    // nprobe=1 probes only the a-cluster's cell
    val (pc, pb) = http("POST", "/collections/mvp/searchMultiIvf",
      s"""{"topK":4,"nprobe":1,$q}""")
    assert(pc === 200, s"$pc $pb")
    val ids = "\"id\":\"(\\w+)\"".r.findAllMatchIn(pb).map(_.group(1)).toSet
    assert(ids === Set("a1", "a2"), pb)
    // nprobe=2 covers both cells
    val (ac, ab) = http("POST", "/collections/mvp/searchMultiIvf",
      s"""{"topK":4,"nprobe":2,$q}""")
    assert(ac === 200 && "\"id\"".r.findAllIn(ab).size === 4, s"$ac $ab")
    // no filter semantics on the CFLAT rungs
    assert(http("POST", "/collections/mvp/searchMultiIvf",
      s"""{"topK":2,"nprobe":1,$q,"filter":{"column":"id","op":"eq","value":"a1"}}""")._1 === 400)
    // the multi audit rung: all-cells probe certifies recall 1.0
    val (rc, rb) = http("POST", "/collections/mvp/audit",
      """{"rung":"multi","sampleMod":1,"nprobe":2,"k":2,
         "weights":[{"field":"v0","ratio":60},{"field":"v1","ratio":40}]}""")
    assert(rc === 200 && rb.contains("\"recall\""), s"$rc $rb")
    val recalls = "\"recall\":([0-9.]+)".r.findAllMatchIn(rb).map(_.group(1).toDouble).toSeq
    assert(recalls.length === 4 && recalls.forall(_ === 1.0), rb)
    // rung-irrelevant dials are rejected, not ignored
    assert(http("POST", "/collections/mvp/audit",
      """{"rung":"multi","overFetch":3,"weights":[{"field":"v0","ratio":100}]}""")._1 === 400)
    assert(http("POST", "/collections/mvp/audit",
      """{"rung":"multi","weights":[{"field":"v0","ratio":100}],
         "filter":{"column":"id","op":"eq","value":"a1"}}""")._1 === 400)
    // missing weights refuses loudly
    assert(http("POST", "/collections/mvp/audit", """{"rung":"multi"}""")._1 === 400)
    // driver-local rung: same ids in the same order as the distributed
    // probe at the same nprobe (scores ride as "score", not "dist")
    val (lc, lb) = http("POST", "/collections/mvp/searchLocalMulti",
      s"""{"topK":4,"nprobe":2,$q}""")
    assert(lc === 200 && lb.contains("\"score\""), s"$lc $lb")
    def idSeq(s: String) = "\"id\":\"(\\w+)\"".r.findAllMatchIn(s).map(_.group(1)).toSeq
    assert(idSeq(lb) === idSeq(ab), s"local ${idSeq(lb)} vs distributed ${idSeq(ab)}")
    // batch route: each query's block matches the single-query probe ids
    val (bc, bb) = http("POST", "/collections/mvp/searchBatchMulti",
      """{"topK":4,"nprobe":1,
         "weights":[{"field":"v0","ratio":60},{"field":"v1","ratio":40}],
         "queries":[
           {"id":"qa","vectors":{"v0":[10,0],"v1":[0,10]}},
           {"id":"qb","vectors":{"v0":[0,10],"v1":[10,0]}}]}""")
    assert(bc === 200, s"$bc $bb")
    assert("\"qid\":\"qa\"".r.findAllIn(bb).size === 2 &&
      "\"qid\":\"qb\"".r.findAllIn(bb).size === 2, bb)
    // a query missing the routing vector refuses loudly
    assert(http("POST", "/collections/mvp/searchBatchMulti",
      """{"weights":[{"field":"v0","ratio":100}],
         "queries":[{"id":"q","vectors":{"v1":[1,0]}}]}""")._1 === 400)
    // a new flush supersedes the cached local index
    assert(http("POST", "/collections/mvp/insert",
      """{"rows":[{"id":"a3","v0":[10,1],"v1":[1,10]}]}""")._1 === 200)
    assert(http("POST", "/collections/mvp/flush")._2 === """{"version":2}""")
    val (_, after) = http("POST", "/collections/mvp/searchLocalMulti",
      s"""{"topK":5,"nprobe":2,$q}""")
    assert(after.contains("\"a3\""), s"stale local multi index after flush: $after")
  }

  test("IVF probes over HTTP: distributed searchIvf and the driver-local index agree") {
    val meta = """{"name":"ivfh","dim":3,"distance":"euclidean","ivfCells":2,"fields":[
      {"name":"id","fieldType":"string","primaryKey":true}]}"""
    assert(http("POST", "/collections", meta)._1 === 200)
    assert(http("POST", "/collections/ivfh/load")._1 === 200)
    val rows = (0 until 30).map(i => s"""{"id":"d$i","vector":[$i,${i % 5},1]}""").mkString(",")
    assert(http("POST", "/collections/ivfh/insert", s"""{"rows":[$rows]}""")._1 === 200)
    assert(http("POST", "/collections/ivfh/flush")._2 === """{"version":1}""")
    val q = """{"vector":[7,2,1],"topK":3,"nprobe":2}"""
    val (dc, db) = http("POST", "/collections/ivfh/searchIvf", q)
    assert(dc === 200 && db.contains("\"d7\""), s"$dc $db")
    val (lc, lb) = http("POST", "/collections/ivfh/searchLocal", q)
    assert(lc === 200 && lb.contains("\"d7\""), s"$lc $lb")
    // same ids in the same order from both probe paths
    val dIds = "\"id\":\"(d\\d+)\"".r.findAllMatchIn(db).map(_.group(1)).toSeq
    val lIds = "\"id\":\"(d\\d+)\"".r.findAllMatchIn(lb).map(_.group(1)).toSeq
    assert(dIds === lIds, s"distributed $dIds vs local $lIds")
    // after a new flush the cached local index is invalidated (serves v2)
    assert(http("POST", "/collections/ivfh/insert",
      """{"rows":[{"id":"fresh","vector":[7,2,1]}]}""")._1 === 200)
    assert(http("POST", "/collections/ivfh/flush")._2 === """{"version":2}""")
    val (_, after) = http("POST", "/collections/ivfh/searchLocal", q)
    assert(after.contains("\"fresh\""), s"stale local index after flush: $after")
    // warm route: all cells = full row count; one cell = a strict subset
    assert(http("POST", "/collections/ivfh/warm")._2 === """{"warmedRows":31}""")
    val one = http("POST", "/collections/ivfh/warm", """{"cells":[0]}""")._2
    val n = "\\d+".r.findFirstIn(one).get.toInt
    assert(n > 0 && n < 31, s"one-cell warm should touch a strict subset: $one")
  }

  test("filtered search on the index rungs over HTTP: searchIvf/searchPq/searchBinary " +
    "honor the filter body field") {
    val meta = """{"name":"fidx","dim":4,"distance":"euclidean","ivfCells":2,
      "pqSubspaces":2,"pqCodewords":8,"pqTrainIterations":1,"binaryIndex":true,
      "fields":[
        {"name":"id","fieldType":"string","primaryKey":true},
        {"name":"label","fieldType":"integer"}]}"""
    assert(http("POST", "/collections", meta)._1 === 200)
    assert(http("POST", "/collections/fidx/load")._1 === 200)
    val rows = (0 until 30).map(i =>
      s"""{"id":"d$i","label":${i % 3},"vector":[$i,${i % 5},1,2]}""").mkString(",")
    assert(http("POST", "/collections/fidx/insert", s"""{"rows":[$rows]}""")._1 === 200)
    assert(http("POST", "/collections/fidx/flush")._2 === """{"version":1}""")
    val filterJson = """{"col":"label","op":"eq","value":1}"""
    def ids(body: String): Seq[String] =
      "\"id\":\"(d\\d+)\"".r.findAllMatchIn(body).map(_.group(1)).toSeq
    val survivors = (0 until 30).filter(_ % 3 == 1).map(i => s"d$i").toSet
    for (route <- Seq("searchIvf", "searchPq", "searchBinary")) {
      val (c, b) = http("POST", s"/collections/fidx/$route",
        s"""{"vector":[7,2,1,2],"topK":5,"nprobe":2,"filter":$filterJson}""")
      assert(c === 200, s"$route: $c $b")
      val got = ids(b)
      assert(got.nonEmpty && got.forall(survivors), s"$route returned non-survivors: $got ($b)")
      // nearest survivor to [7,2,1,2] is d7 itself (label 1)
      assert(got.head === "d7", s"$route top hit: $got")
    }
    // searchBatch carries one filter for the whole batch
    val (bc, bb) = http("POST", "/collections/fidx/searchBatch",
      s"""{"queries":[{"id":"qA","vector":[7,2,1,2]}],"topK":4,"nprobe":2,"filter":$filterJson}""")
    assert(bc === 200 && ids(bb).nonEmpty && ids(bb).forall(survivors), s"$bc $bb")
    // the audit route carries the filter too (recall of the FILTERED probe)
    val (ac, ab) = http("POST", "/collections/fidx/audit",
      s"""{"sampleMod":3,"nprobe":2,"k":3,"filter":$filterJson}""")
    assert(ac === 200 && ab.contains("\"recall\""), s"$ac $ab")
    // rung selection: the PQ (residual IVF-PQ layout here) and binary rungs
    // audit through the same route; draining over-fetch certifies 1.0
    for (rung <- Seq("pq", "bin")) {
      val (rc, rb) = http("POST", "/collections/fidx/audit",
        s"""{"sampleMod":3,"k":3,"overFetch":16,"rung":"$rung"}""")
      assert(rc === 200 && rb.contains("\"recall\""), s"$rung: $rc $rb")
      val recalls = "\"recall\":([0-9.]+)".r.findAllMatchIn(rb).map(_.group(1).toDouble).toSeq
      assert(recalls.nonEmpty && recalls.forall(_ === 1.0), s"$rung drain recalls: $recalls")
    }
    assert(http("POST", "/collections/fidx/audit", """{"rung":"hnsw"}""")._1 === 400)
    // r11: a dial the selected rung never reads is REJECTED, not silently
    // ignored (the requireNoFilter loud-refusal discipline) — a caller
    // auditing with a dead dial would trust a number certifying another path
    assert(http("POST", "/collections/fidx/audit",
      """{"rung":"ivf","overFetch":4}""")._1 === 400)
    assert(http("POST", "/collections/fidx/audit",
      """{"rung":"bin","nprobe":2}""")._1 === 400)
    // r11: the PQ rung reads nprobe — the audit of the PROBED IVF-PQ shape
    // (searchPq with nprobe); draining both dials still certifies 1.0 here
    val (pc, pb) = http("POST", "/collections/fidx/audit",
      """{"sampleMod":3,"k":3,"overFetch":16,"rung":"pq","nprobe":4}""")
    assert(pc === 200 && pb.contains("\"recall\""), s"$pc $pb")
    // multi has no reference filter semantics: a filter there would be
    // SILENTLY ignored — it must refuse loudly instead
    locally {
      val (lc, lb) = http("POST", "/collections/fidx/searchMulti",
        s"""{"vector":[7,2,1,2],"topK":5,"nprobe":2,"filter":$filterJson}""")
      assert(lc === 400 && lb.contains("searchIvf"), s"searchMulti: $lc $lb")
    }
    // r11/r12: the IVF, binary, and PQ local rungs serve conjunctive-EQ
    // filters from their typed store — survivors only, at local-rung
    // latency (the reference's inverted-index EQ fast path)
    for (route <- Seq("searchLocal", "searchLocalBin", "searchLocalPq")) {
      val (lc, lb) = http("POST", s"/collections/fidx/$route",
        s"""{"vector":[7,2,1,2],"topK":5,"nprobe":2,"filter":$filterJson}""")
      assert(lc === 200, s"$route: $lc $lb")
      val got = ids(lb)
      assert(got.nonEmpty && got.forall(survivors), s"$route returned non-survivors: $got ($lb)")
    }
    // the IVF local rung is exact inside probed cells → nearest survivor first
    // (the binary rung ranks by raw Hamming, where a 4-bit code ties heavily —
    // survivors-only is its contract; exact order comes from the rerank rungs)
    val (lc7, lb7) = http("POST", "/collections/fidx/searchLocal",
      s"""{"vector":[7,2,1,2],"topK":5,"nprobe":2,"filter":$filterJson}""")
    assert(lc7 === 200 && ids(lb7).head === "d7", s"searchLocal top hit: $lb7")
    // …but any non-EQ shape still refuses loudly on the local rungs
    val rangeJson = """{"col":"label","op":"gte","value":1}"""
    for (route <- Seq("searchLocal", "searchLocalBin", "searchLocalPq")) {
      val (lc, lb) = http("POST", s"/collections/fidx/$route",
        s"""{"vector":[7,2,1,2],"topK":5,"nprobe":2,"filter":$rangeJson}""")
      assert(lc === 400 && lb.contains("searchIvf"), s"$route: $lc $lb")
    }
  }

  test("exportColtt route writes the three native edge-bucket files") {
    val meta = """{"name":"xb","dim":3,"distance":"euclidean","fields":[
      {"name":"id","fieldType":"string","primaryKey":true}]}"""
    assert(http("POST", "/collections", meta)._1 === 200)
    assert(http("POST", "/collections/xb/load")._1 === 200)
    val rows = (0 until 12).map(i => s"""{"id":"d$i","vector":[$i,1,2]}""").mkString(",")
    assert(http("POST", "/collections/xb/insert", s"""{"rows":[$rows]}""")._1 === 200)
    assert(http("POST", "/collections/xb/flush", "")._1 === 200)
    val dest = Files.createTempDirectory("graft-cexp-http-out").toString
    val (c, b) = http("POST", "/collections/xb/exportColtt", s"""{"destDir":"$dest"}""")
    assert(c === 200 && b.contains("\"rows\":12"), s"$c $b")
    for (f <- Seq("xb.meta.json", "xb.vertex", "xb.inverted.raw"))
      assert(Files.exists(java.nio.file.Paths.get(dest, f)), s"missing $f")
    assert(http("POST", "/collections/xb/exportColtt", "{}")._1 === 400)
  }

  test("audit route: recall audit of the IVF probe; all-cells probe certifies 1.0") {
    val meta = """{"name":"aud","dim":3,"distance":"euclidean","ivfCells":2,"fields":[
      {"name":"id","fieldType":"string","primaryKey":true}]}"""
    assert(http("POST", "/collections", meta)._1 === 200)
    assert(http("POST", "/collections/aud/load")._1 === 200)
    val rows = (0 until 40).map(i => s"""{"id":"d$i","vector":[$i,${i % 5},1]}""").mkString(",")
    assert(http("POST", "/collections/aud/insert", s"""{"rows":[$rows]}""")._1 === 200)
    assert(http("POST", "/collections/aud/flush")._1 === 200)
    // nprobe = all cells → both arms identical → recall 1.0 on every row
    val (c1, b1) = http("POST", "/collections/aud/audit",
      """{"sampleMod":3,"nprobe":2,"k":5}""")
    assert(c1 === 200 && b1.contains("\"recall\""), s"$c1 $b1")
    val recalls = "\"recall\":([0-9.]+)".r.findAllMatchIn(b1).map(_.group(1).toDouble).toSeq
    assert(recalls.nonEmpty && recalls.forall(_ === 1.0), s"recalls $recalls")
    // a pruned probe reports recall in [0, 1] for the same sampled queries
    val (c2, b2) = http("POST", "/collections/aud/audit",
      """{"sampleMod":3,"nprobe":1,"k":5}""")
    val pruned = "\"recall\":([0-9.]+)".r.findAllMatchIn(b2).map(_.group(1).toDouble).toSeq
    assert(c2 === 200 && pruned.length === recalls.length)
    assert(pruned.forall(r => r >= 0.0 && r <= 1.0))
    // invalid parameters are client errors, not 500s
    assert(http("POST", "/collections/aud/audit", """{"nprobe":0}""")._1 === 400)
  }

  test("batch retrieval over HTTP: searchBatch returns per-query top-k agreeing " +
    "with single-query searchIvf") {
    val meta = """{"name":"batch","dim":3,"distance":"euclidean","ivfCells":2,"fields":[
      {"name":"id","fieldType":"string","primaryKey":true}]}"""
    assert(http("POST", "/collections", meta)._1 === 200)
    assert(http("POST", "/collections/batch/load")._1 === 200)
    val rows = (0 until 30).map(i => s"""{"id":"d$i","vector":[$i,${i % 5},1]}""").mkString(",")
    assert(http("POST", "/collections/batch/insert", s"""{"rows":[$rows]}""")._1 === 200)
    assert(http("POST", "/collections/batch/flush")._2 === """{"version":1}""")
    val (bc, bb) = http("POST", "/collections/batch/searchBatch",
      """{"queries":[{"id":"qA","vector":[7,2,1]},{"id":"qB","vector":[23,3,1]}],
         "topK":3,"nprobe":2}""")
    assert(bc === 200, s"$bc $bb")
    // each query's block must agree with the single-query probe, in order
    for ((qid, vec) <- Seq("qA" -> "[7,2,1]", "qB" -> "[23,3,1]")) {
      val (_, single) = http("POST", "/collections/batch/searchIvf",
        s"""{"vector":$vec,"topK":3,"nprobe":2}""")
      val want = "\"id\":\"(d\\d+)\"".r.findAllMatchIn(single).map(_.group(1)).toSeq
      val got = s"""\\{"qid":"$qid","id":"(d\\d+)"""".r.findAllMatchIn(bb).map(_.group(1)).toSeq
      assert(got === want, s"$qid: batch $got vs single $want ($bb)")
    }
    // error contracts: duplicate ids, empty batch, over-cap
    assert(http("POST", "/collections/batch/searchBatch",
      """{"queries":[{"id":"x","vector":[1,1,1]},{"id":"x","vector":[2,2,2]}]}""")._1 === 400)
    assert(http("POST", "/collections/batch/searchBatch", """{"queries":[]}""")._1 === 400)
  }

  test("QUANTIZED collection: searchLocal applies the same query prep as searchIvf") {
    // f16-inexact coordinates: without the prepareQueryVector round-trip on
    // the local path, the two probes score against different query vectors
    val meta = """{"name":"ivfq","dim":3,"distance":"euclidean","quantization":"f16","ivfCells":2,"fields":[
      {"name":"id","fieldType":"string","primaryKey":true}]}"""
    assert(http("POST", "/collections", meta)._1 === 200)
    assert(http("POST", "/collections/ivfq/load")._1 === 200)
    val rows = (0 until 30).map(i =>
      s"""{"id":"q$i","vector":[${i * 0.1003}, ${(i % 5) * 0.2007}, 1.0001]}""").mkString(",")
    assert(http("POST", "/collections/ivfq/insert", s"""{"rows":[$rows]}""")._1 === 200)
    assert(http("POST", "/collections/ivfq/flush")._2 === """{"version":1}""")
    val q = """{"vector":[0.7021,0.4014,1.0001],"topK":5,"nprobe":2}"""
    val (dc, db) = http("POST", "/collections/ivfq/searchIvf", q)
    val (lc, lb) = http("POST", "/collections/ivfq/searchLocal", q)
    assert(dc === 200 && lc === 200, s"$db / $lb")
    val dIds = "\"id\":\"(q\\d+)\"".r.findAllMatchIn(db).map(_.group(1)).toSeq
    val lIds = "\"id\":\"(q\\d+)\"".r.findAllMatchIn(lb).map(_.group(1)).toSeq
    assert(dIds === lIds, s"distributed $dIds vs local $lIds")
    val num = "\"dist\":([-0-9.Ee]+)".r
    val dDists = num.findAllMatchIn(db).map(_.group(1).toDouble).toSeq
    val lDists = num.findAllMatchIn(lb).map(_.group(1).toDouble).toSeq
    assert(dDists === lDists, s"distributed $dDists vs local $lDists")
  }

  test("PQ collection over HTTP: searchPq reranked agrees with exact search") {
    val meta = """{"name":"pqh","dim":4,"distance":"euclidean","pqSubspaces":2,"pqCodewords":8,"fields":[
      {"name":"id","fieldType":"string","primaryKey":true}]}"""
    assert(http("POST", "/collections", meta)._1 === 200)
    assert(http("POST", "/collections/pqh/load")._1 === 200)
    val rows = (0 until 30).map(i =>
      s"""{"id":"p${"%02d".format(i)}","vector":[${i * 0.3}, ${(i % 7) * 0.5}, ${(i % 3) * 0.9}, 1]}""").mkString(",")
    assert(http("POST", "/collections/pqh/insert", s"""{"rows":[$rows]}""")._1 === 200)
    assert(http("POST", "/collections/pqh/flush")._2 === """{"version":1}""")
    val q = """{"vector":[2.1,1.5,0.9,1],"topK":3,"overFetch":10}"""
    val (pc, pb) = http("POST", "/collections/pqh/searchPq", q)
    val (ec, eb) = http("POST", "/collections/pqh/search", """{"vector":[2.1,1.5,0.9,1],"topK":3}""")
    assert(pc === 200 && ec === 200, s"$pb / $eb")
    val idRe = "\"id\":\"(p\\d+)\"".r
    assert(idRe.findAllMatchIn(pb).map(_.group(1)).toSeq ===
      idRe.findAllMatchIn(eb).map(_.group(1)).toSeq, s"pq $pb vs exact $eb")
    // probing an index layout the collection doesn't have is a client error
    assert(http("POST", "/collections/pqh/searchIvf", q)._1 === 400)
  }

  test("IVF-PQ over HTTP: searchLocalPq (driver-local ADC) matches searchPq(rerank=false)") {
    val meta = """{"name":"lpqh","dim":4,"distance":"euclidean","ivfCells":2,"pqSubspaces":2,"pqCodewords":8,"fields":[
      {"name":"id","fieldType":"string","primaryKey":true}]}"""
    assert(http("POST", "/collections", meta)._1 === 200)
    assert(http("POST", "/collections/lpqh/load")._1 === 200)
    val rows = (0 until 30).map(i =>
      s"""{"id":"r${"%02d".format(i)}","vector":[${i * 0.3}, ${(i % 7) * 0.5}, ${(i % 3) * 0.9}, 1]}""").mkString(",")
    assert(http("POST", "/collections/lpqh/insert", s"""{"rows":[$rows]}""")._1 === 200)
    assert(http("POST", "/collections/lpqh/flush")._2 === """{"version":1}""")
    val q = """{"vector":[2.1,1.5,0.9,1],"topK":5,"nprobe":2}"""
    val (lc, lb) = http("POST", "/collections/lpqh/searchLocalPq", q)
    val (dc, db) = http("POST", "/collections/lpqh/searchPq",
      """{"vector":[2.1,1.5,0.9,1],"topK":5,"rerank":false,"nprobe":2}""")
    assert(lc === 200 && dc === 200, s"$lb / $db")
    val idRe = "\"id\":\"(r\\d+)\"".r
    assert(idRe.findAllMatchIn(lb).map(_.group(1)).toSeq ===
      idRe.findAllMatchIn(db).map(_.group(1)).toSeq, s"local $lb vs distributed $db")
    val num = "\"dist\":([-0-9.Ee]+)".r
    assert(num.findAllMatchIn(lb).map(_.group(1).toDouble).toSeq ===
      num.findAllMatchIn(db).map(_.group(1).toDouble).toSeq, s"local $lb vs distributed $db")
  }

  test("binary layout over HTTP: searchBinary (two-pass) + searchLocalBin (driver-local Hamming)") {
    val meta = """{"name":"binh","dim":4,"distance":"euclidean","binaryIndex":true,"fields":[
      {"name":"id","fieldType":"string","primaryKey":true}]}"""
    assert(http("POST", "/collections", meta)._1 === 200)
    assert(http("POST", "/collections/binh/load")._1 === 200)
    val rows = (0 until 30).map(i =>
      s"""{"id":"r${"%02d".format(i)}","vector":[${i * 0.3}, ${(i % 7) * 0.5}, ${(i % 3) * 0.9}, 1]}""").mkString(",")
    assert(http("POST", "/collections/binh/insert", s"""{"rows":[$rows]}""")._1 === 200)
    assert(http("POST", "/collections/binh/flush")._2 === """{"version":1}""")
    // the exact-rerank route at drain-everything over-fetch == the plain search
    val (bc, bb) = http("POST", "/collections/binh/searchBinary",
      """{"vector":[2.1,1.5,0.9,1],"topK":5,"overFetch":6}""")
    val (ec, eb) = http("POST", "/collections/binh/search",
      """{"vector":[2.1,1.5,0.9,1],"topK":5}""")
    assert(bc === 200 && ec === 200, s"$bb / $eb")
    val idRe = "\"id\":\"(r\\d+)\"".r
    assert(idRe.findAllMatchIn(bb).map(_.group(1)).toSeq ===
      idRe.findAllMatchIn(eb).map(_.group(1)).toSeq, s"binary $bb vs exact $eb")
    // the driver-local Hamming probe answers without a Spark job; its top
    // hit for a stored vector is that vector at Hamming 0
    val (lc, lb) = http("POST", "/collections/binh/searchLocalBin",
      """{"vector":[0.9,1.5,0.0,1],"topK":3}""")
    assert(lc === 200, lb)
    assert(lb.contains("\"id\":\"r03\"") && lb.contains("\"dist\":0.0"), lb)
    // probing a layout the collection doesn't have is a client error
    val plain = """{"name":"nobin","dim":4,"distance":"euclidean","fields":[
      {"name":"id","fieldType":"string","primaryKey":true}]}"""
    assert(http("POST", "/collections", plain)._1 === 200)
    assert(http("POST", "/collections/nobin/searchBinary",
      """{"vector":[2.1,1.5,0.9,1],"topK":5}""")._1 === 400)
  }

  test("schemaless (core v3) collection over HTTP: string-coerced map + parse-compare filter") {
    val meta = """{"name":"corev3","dim":2,"distance":"euclidean","schemaless":true}"""
    assert(http("POST", "/collections", meta)._1 === 200)
    assert(http("POST", "/collections/corev3/load")._1 === 200)
    assert(http("POST", "/collections/corev3/insert",
      """{"rows":[
        {"_id":"a","n":9,"vector":[1,0]},
        {"_id":"b","n":10,"vector":[0,1]}]}""")._1 === 200)
    // numeric coercion: "10" > "9" numerically (parse-compare parity)
    val (c, b) = http("POST", "/collections/corev3/search",
      """{"vector":[0,0],"topK":10,"filter":{"col":"n","op":"gt","value":9}}""")
    assert(c === 200)
    assert(b.contains("\"_id\":\"b\"") && !b.contains("\"_id\":\"a\""), b)
  }

  test("non-finite values serve as Jackson-quoted strings, not a 500 " +
    "(cosine zero-norm vector yields a NaN distance)") {
    val meta = """{"name":"nanv","dim":3,"distance":"cosine","fields":[
      {"name":"id","fieldType":"string","primaryKey":true}]}"""
    assert(http("POST", "/collections", meta)._1 === 200)
    assert(http("POST", "/collections/nanv/load")._1 === 200)
    assert(http("POST", "/collections/nanv/insert",
      """{"rows":[
        {"id":"z","vector":[0,0,0]},
        {"id":"a","vector":[1,0,0]},
        {"id":"b","vector":[0,1,0]}]}""")._1 === 200)
    val (code, resp) = http("POST", "/collections/nanv/search",
      """{"vector":[1,0,0],"topK":3}""")
    assert(code === 200, resp)
    // finite hits first; the zero-norm row's NaN distance rides along as
    // the quoted string Jackson (df.toJSON) would emit, keeping the wire
    // shape identical between the prepared and plan-per-call paths
    assert(resp.contains("\"id\":\"a\""), resp)
    assert(resp.contains("\"NaN\""), resp)
    assert(http("DELETE", "/collections/nanv")._1 === 200)
  }

  test("search during cross-driver vacuum: the serving path re-anchors ONCE on " +
    "the published head and answers; a dead head surfaces the original failure") {
    import org.apache.spark.sql.functions._
    val sp = spark
    import sp.implicits._
    val root = Files.createTempDirectory("graft-serve-vac").toString
    val s2 = new GraftServer(spark, root)
    s2.start()
    try {
      val b2 = s"http://127.0.0.1:${s2.boundPort}"
      def h(method: String, path: String, body: String = ""): (Int, String) = {
        val conn = URI.create(b2 + path).toURL.openConnection().asInstanceOf[HttpURLConnection]
        conn.setRequestMethod(method)
        if (body.nonEmpty) { conn.setDoOutput(true)
          conn.getOutputStream.write(body.getBytes(StandardCharsets.UTF_8)) }
        val code = conn.getResponseCode
        val in = if (code < 400) conn.getInputStream else conn.getErrorStream
        val resp = new String(in.readAllBytes(), StandardCharsets.UTF_8)
        conn.disconnect(); (code, resp)
      }
      assert(h("POST", "/collections",
        """{"name":"vac","dim":4,"distance":"euclidean","versioning":true,"fields":[
           {"name":"id","fieldType":"string","primaryKey":true}]}""")._1 === 200)
      assert(h("POST", "/collections/vac/load")._1 === 200)
      assert(h("POST", "/collections/vac/insert",
        """{"rows":[""" + (1 to 10).map(i =>
          s"""{"id":"r$i","vector":[$i,0,0,0]}""").mkString(",") + "]}")._1 === 200)
      assert(h("POST", "/collections/vac/flush")._2 === """{"version":1}""")
      // re-anchor the server resident on v1 LAZILY (release+load, no search
      // yet): the cache must not be materialized, or evaluation would never
      // touch the files the vacuum deletes
      assert(h("POST", "/collections/vac/release")._1 === 200)
      assert(h("POST", "/collections/vac/load")._1 === 200)

      // another "driver" on the same root: advance to v2 and vacuum v1 away
      val cat2 = new graft.collection.GraftCatalog(spark, root)
      cat2.loadCollection("vac")
      cat2.insert("vac", Seq(("zz", Seq(100f, 0f, 0f, 0f))).toDF("id", "vector"))
      cat2.flush("vac")
      assert(cat2.vacuum("vac", keepLast = 1) === Seq(1), "v1 must actually be removed")
      // a REAL cross-driver reader shares no CacheManager with the vacuuming
      // driver — in this single-JVM fixture the resident cache (materialized
      // by the load route's info count) must be dropped explicitly so the
      // search actually evaluates against the deleted files
      spark.catalog.clearCache()

      // the server's resident plan is anchored on the vacuumed v1 — without
      // recovery this request dies with FileNotFoundException; with it, the
      // path re-loads the published head and the answer even contains the
      // v2-only row (proof it re-anchored rather than retried a stale plan)
      val (code, resp) = h("POST", "/collections/vac/search",
        """{"vector":[100,0,0,0],"topK":1}""")
      assert(code === 200, resp)
      assert(resp.contains("\"id\":\"zz\""), resp)

      // bounded: ONE retry, and a re-load that cannot succeed surfaces the
      // failure loudly. Re-anchor lazily on v2, then delete v2 out from
      // under the server WITHOUT updating meta (a dead head — nothing to
      // recover onto).
      assert(h("POST", "/collections/vac/release")._1 === 200)
      assert(h("POST", "/collections/vac/load")._1 === 200)
      val fs = org.apache.hadoop.fs.FileSystem.get(
        new java.net.URI("file:///"), spark.sparkContext.hadoopConfiguration)
      assert(fs.delete(new org.apache.hadoop.fs.Path(root, "vac/v2"), true))
      spark.catalog.clearCache() // same cross-driver simulation as above
      val (code2, resp2) = h("POST", "/collections/vac/search",
        """{"vector":[100,0,0,0],"topK":1}""")
      assert(code2 >= 400, s"dead head must fail loudly, got $code2: $resp2")
      assert(resp2.contains("error"), resp2)
    } finally s2.stop()
  }

  test("a PREPARED probed plan never serves a vacuumed version: the next request " +
    "re-anchors on the published head; a dead head fails loudly (r12 verdict #8)") {
    import org.apache.spark.sql.functions._
    val sp = spark
    import sp.implicits._
    val root = Files.createTempDirectory("graft-serve-pvac").toString
    val s2 = new GraftServer(spark, root)
    s2.start()
    try {
      val b2 = s"http://127.0.0.1:${s2.boundPort}"
      def h(method: String, path: String, body: String = ""): (Int, String) = {
        val conn = URI.create(b2 + path).toURL.openConnection().asInstanceOf[HttpURLConnection]
        conn.setRequestMethod(method)
        if (body.nonEmpty) { conn.setDoOutput(true)
          conn.getOutputStream.write(body.getBytes(StandardCharsets.UTF_8)) }
        val code = conn.getResponseCode
        val in = if (code < 400) conn.getInputStream else conn.getErrorStream
        val resp = new String(in.readAllBytes(), StandardCharsets.UTF_8)
        conn.disconnect(); (code, resp)
      }
      assert(h("POST", "/collections",
        """{"name":"pvac","dim":4,"distance":"euclidean","versioning":true,"ivfCells":2,
           "fields":[{"name":"id","fieldType":"string","primaryKey":true}]}""")._1 === 200)
      assert(h("POST", "/collections/pvac/load")._1 === 200)
      assert(h("POST", "/collections/pvac/insert",
        """{"rows":[""" + (1 to 10).map(i =>
          s"""{"id":"r$i","vector":[$i,0,0,0]}""").mkString(",") + "]}")._1 === 200)
      assert(h("POST", "/collections/pvac/flush")._2 === """{"version":1}""")
      // compile + cache the PREPARED probed plan, anchored on v1's
      // indexed state (the /searchIvf route is plan-once/execute-many)
      assert(h("POST", "/collections/pvac/searchIvf",
        """{"vector":[5,0,0,0],"topK":1,"nprobe":2}""")._1 === 200)

      // another "driver": advance to v2 (with a distinctive row) and
      // vacuum v1 — the version the server's prepared plan is anchored on
      val cat2 = new graft.collection.GraftCatalog(spark, root)
      cat2.loadCollection("pvac")
      cat2.insert("pvac", Seq(("zz", Seq(100f, 0f, 0f, 0f))).toDF("id", "vector"))
      cat2.flush("pvac")
      assert(cat2.vacuum("pvac", keepLast = 1) === Seq(1), "v1 must actually be removed")
      spark.catalog.clearCache() // cross-driver: no shared CacheManager

      // The contract: the prepared cache keys on the per-version indexed
      // state, and the route re-reads meta per request — so this request
      // must RECOMPILE against v2 and answer (the v2-only row proves it),
      // never execute the stale v1-anchored plan into deleted files.
      val (code, resp) = h("POST", "/collections/pvac/searchIvf",
        """{"vector":[100,0,0,0],"topK":1,"nprobe":2}""")
      assert(code === 200, resp)
      assert(resp.contains("\"id\":\"zz\""), resp)

      // Dead head: v2's files deleted WITHOUT a meta update (what a
      // mis-raced external sweep would do). The prepared plan for v2 is
      // cached and warm — the request must surface the failure loudly,
      // never return stale or empty rows silently.
      val fs = org.apache.hadoop.fs.FileSystem.get(
        new java.net.URI("file:///"), spark.sparkContext.hadoopConfiguration)
      assert(fs.delete(new org.apache.hadoop.fs.Path(root, "pvac/v2"), true))
      spark.catalog.clearCache()
      val (code2, resp2) = h("POST", "/collections/pvac/searchIvf",
        """{"vector":[100,0,0,0],"topK":1,"nprobe":2}""")
      assert(code2 >= 400, s"dead head must fail loudly, got $code2: $resp2")
      assert(resp2.contains("error"), resp2)
    } finally s2.stop()
  }

  test("local rungs serve the published head: a cross-driver flushDelta is " +
    "folded into the resident rung at the next request (r13)") {
    val sp = spark
    import sp.implicits._
    import graft.collection.{CollectionMeta, GraftCatalog, IndexField}
    val root = Files.createTempDirectory("graft-serve-fresh").toString
    val s2 = new GraftServer(spark, root)
    s2.start()
    try {
      val b2 = s"http://127.0.0.1:${s2.boundPort}"
      def h(method: String, path: String, body: String = ""): (Int, String) = {
        val conn = URI.create(b2 + path).toURL.openConnection().asInstanceOf[HttpURLConnection]
        conn.setRequestMethod(method)
        if (body.nonEmpty) { conn.setDoOutput(true)
          conn.getOutputStream.write(body.getBytes(StandardCharsets.UTF_8)) }
        val code = conn.getResponseCode
        val in = if (code < 400) conn.getInputStream else conn.getErrorStream
        val resp = new String(in.readAllBytes(), StandardCharsets.UTF_8)
        conn.disconnect(); (code, resp)
      }
      // the "other driver": a separate catalog instance on the same root
      val cat = new GraftCatalog(spark, root)
      cat.createCollection(CollectionMeta("fr", dim = 4, distance = "euclidean",
        fields = Seq(IndexField("id", "string", primaryKey = true),
          IndexField("grp", "integer")),
        ivfCells = Some(2), ivfTrainIterations = Some(0)))
      cat.loadCollection("fr")
      cat.insert("fr", Seq(("a", 1L, Seq(1f, 0f, 0f, 0f)),
        ("b", 2L, Seq(0f, 1f, 0f, 0f)),
        ("c", 3L, Seq(0f, 0f, 1f, 0f))).toDF("id", "grp", "vector"))
      cat.flush("fr") // v1

      // materialize the server's local rung at v1
      val (c0, r0) = h("POST", "/collections/fr/searchLocal",
        """{"vector":[1,0,0,0],"topK":1,"nprobe":2}""")
      assert(c0 === 200, r0)
      assert(r0.contains("\"id\":\"a\"") && !r0.contains("zz"), r0)

      // cross-driver delta: a new row lands, an old row dies — the server
      // never sees a flush/flushDelta route call for either
      cat.insert("fr", Seq(("zz", 9L, Seq(0f, 0f, 0f, 100f))).toDF("id", "grp", "vector"))
      cat.delete("fr", FilterExpr.Single("id", FilterExpr.Eq, "a"))
      cat.flushDelta("fr") // v2, same chain base -> the rung FOLDS, not rebuilds

      // next request answers the published head: the new row is findable...
      val (c1, r1) = h("POST", "/collections/fr/searchLocal",
        """{"vector":[0,0,0,100],"topK":1,"nprobe":2}""")
      assert(c1 === 200, r1)
      assert(r1.contains("\"id\":\"zz\""), s"cross-driver put must be visible: $r1")
      // ...and the deleted row is gone even at full fan-out
      val (c2, r2) = h("POST", "/collections/fr/searchLocal",
        """{"vector":[1,0,0,0],"topK":10,"nprobe":2}""")
      assert(c2 === 200, r2)
      assert(!r2.contains("\"id\":\"a\""), s"cross-driver delete must strike: $r2")
      // the EQ-filtered store folded with it
      val (c3, r3) = h("POST", "/collections/fr/searchLocal",
        """{"vector":[0,0,0,100],"topK":5,"nprobe":2,
            "filter":{"col":"grp","op":"eq","value":9}}""")
      assert(c3 === 200, r3)
      assert(r3.contains("\"id\":\"zz\""), r3)

      // a cross-driver FLUSH moves the chain base (new sidecars): the
      // refresh seam cannot fold across it — the fallback is a full
      // rebuild, and the next request must still serve the new head
      cat.insert("fr", Seq(("yy", 4L, Seq(0f, 100f, 0f, 0f))).toDF("id", "grp", "vector"))
      cat.flush("fr") // v3, new chain base
      val (c4, r4) = h("POST", "/collections/fr/searchLocal",
        """{"vector":[0,100,0,0],"topK":1,"nprobe":2}""")
      assert(c4 === 200, r4)
      assert(r4.contains("\"id\":\"yy\""), s"cross-driver flush must rebuild: $r4")

      // the CFLAT rung follows the same discipline through its own route
      cat.createCollection(CollectionMeta("frm", dim = 4, distance = "euclidean",
        fields = Seq(IndexField("id", "string", primaryKey = true),
          IndexField("v0", "vector"), IndexField("v1", "vector")),
        ivfCells = Some(2), ivfTrainIterations = Some(0)))
      cat.loadCollection("frm")
      cat.insert("frm", Seq(
        ("a", Seq(1f, 0f, 0f, 0f), Seq(0f, 1f, 0f, 0f)),
        ("b", Seq(0f, 0f, 1f, 0f), Seq(0f, 0f, 0f, 1f))).toDF("id", "v0", "v1"))
      cat.flush("frm") // v1
      val mq = """{"fields":[{"vectorCol":"v0","vector":[0,0,0,100],"ratio":60},
                             {"vectorCol":"v1","vector":[100,0,0,0],"ratio":40}],
                   "topK":1,"nprobe":2}"""
      val (m0, mr0) = h("POST", "/collections/frm/searchLocalMulti", mq)
      assert(m0 === 200, mr0)
      assert(!mr0.contains("zz"), mr0)
      cat.insert("frm", Seq(("zz", Seq(0f, 0f, 0f, 100f), Seq(100f, 0f, 0f, 0f)))
        .toDF("id", "v0", "v1"))
      cat.flushDelta("frm") // v2
      val (m1, mr1) = h("POST", "/collections/frm/searchLocalMulti", mq)
      assert(m1 === 200, mr1)
      assert(mr1.contains("\"id\":\"zz\""), s"multi rung must fold the delta: $mr1")
    } finally s2.stop()
  }
}
