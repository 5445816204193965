package graft.collection

import java.net.{HttpURLConnection, URI}

import org.apache.hadoop.fs.{FileSystem, Path}

/** A deployable [[GraftCatalog.ClaimProtocol]] for S3-compatible object
  * stores (r13 verdict #3): atomic create-if-absent as an HTTP conditional
  * PUT with `If-None-Match: *` — the primitive S3 (and MinIO, the
  * reference's own store, edge/edge.go:36), Azure Blob, and any
  * S3-compatible gateway expose. 2xx ⇒ this call created the object (won
  * the claim); 412 Precondition Failed ⇒ the object already exists (lost);
  * anything else is a FAULT, never a silent verdict.
  *
  * Design constraints, in claim-CAS order of importance:
  *
  *  - **Never two winners.** `true` is returned ONLY on a 2xx to our own
  *    conditional PUT, or on positive proof of ownership (see recovery
  *    below) — there is no code path that infers a win from absence.
  *  - **An ambiguous network fault must not wedge the slot.** If the
  *    connection dies after the request may have committed (an
  *    `IOException` mid-exchange), the store's state is unknown: our object
  *    may or may not exist. The claim CONTENT is the catalog's per-attempt
  *    fencing token (unique per call — `pid@host-uuid8 epochMillis`), so a
  *    GET of the object answers ownership exactly: our bytes ⇒ our PUT
  *    landed (win), other bytes ⇒ another writer's object (loss), absent ⇒
  *    nothing committed (retry the PUT). This mirrors
  *    [[GraftCatalog.HadoopAtomicCreate]]'s torn-write cleanup — without
  *    it, a crashed exchange could leave an unobserved claim wedging the
  *    version slot until the stale-claim reclaim (30 min).
  *  - **409 is "retry", not a verdict.** S3 answers 409
  *    (`ConditionalRequestConflict`) when concurrent conditional writes on
  *    one key collide mid-flight; the documented client behavior is to
  *    retry, upon which the request resolves to 2xx (we won) or 412 (the
  *    other writer's object landed). 5xx retries the same bounded loop.
  *
  * Auth is a seam, not a baked-in signer: `sign` runs on the prepared
  * connection before the body is sent — install a SigV4 signer, a bearer
  * token, or nothing (pre-signed URLs from `endpointFor`, or an
  * unauthenticated dev MinIO). The protocol itself only speaks the
  * conditional-create semantics.
  *
  * @param endpointFor maps the Hadoop claim path (e.g.
  *   `s3a://bucket/root/col/v3.claim`) to the object URL the store serves
  *   it at (e.g. `https://minio:9000/bucket/root/col/v3.claim`)
  * @param sign        per-request auth hook (headers only; the body is
  *   fixed-length streamed after it runs)
  */
final class HttpConditionalPutClaim(
    endpointFor: Path => URI,
    sign: HttpURLConnection => Unit = _ => (),
    timeoutMs: Int = 10000,
    maxRetries: Int = 4) extends GraftCatalog.ClaimProtocol {

  def tryExclusiveCreate(fs: FileSystem, path: Path, content: Array[Byte]): Boolean = {
    val uri = endpointFor(path)
    var attempt = 0
    while (true) {
      val outcome =
        try Some(putIfAbsent(uri, content))
        catch {
          case _: java.io.IOException =>
            // ambiguous: the PUT may or may not have committed — resolve by
            // ownership probe (the content is a per-attempt-unique token)
            probe(uri) match {
              case Some(body) => return java.util.Arrays.equals(body, content)
              case None       => None // nothing committed: retry the PUT
            }
        }
      outcome match {
        case Some(v) => return v
        case None    => ()
      }
      attempt += 1
      if (attempt > maxRetries) throw new java.io.IOException(
        s"conditional PUT of $uri: no definite verdict after $maxRetries retries " +
          "(connection faults or 409/5xx on every attempt)")
      Thread.sleep(50L * attempt)
    }
    false // unreachable
  }

  /** One conditional PUT: true=won (2xx), false=lost (412). Retryable
    * statuses (409, 5xx) and connection faults throw IOException — the
    * caller's bounded loop resolves them; a deployment fault (403/404/…)
    * throws [[GraftCatalog.ClaimProtocolFault]], which propagates. */
  private def putIfAbsent(uri: URI, content: Array[Byte]): Boolean = {
    val conn = uri.toURL.openConnection().asInstanceOf[HttpURLConnection]
    try {
      conn.setRequestMethod("PUT")
      conn.setConnectTimeout(timeoutMs)
      conn.setReadTimeout(timeoutMs)
      conn.setRequestProperty("If-None-Match", "*")
      conn.setRequestProperty("Content-Type", "application/octet-stream")
      conn.setFixedLengthStreamingMode(content.length)
      sign(conn)
      conn.setDoOutput(true)
      conn.getOutputStream.write(content)
      conn.getResponseCode match {
        case c if c >= 200 && c < 300 => true
        // the object exists: lost the race (S3/MinIO/Azure answer 412 for
        // a failed If-None-Match: *)
        case 412 => false
        // concurrent conditional writes collided mid-flight (S3
        // ConditionalRequestConflict) or a transient server fault: retry —
        // the retried PUT resolves to 2xx or 412
        case 409 => throw new java.io.IOException(s"409 conflict on $uri (retryable)")
        case c if c >= 500 => throw new java.io.IOException(s"HTTP $c on $uri (retryable)")
        case c =>
          // 4xx other than the contract codes is a deployment fault (403
          // bad credentials, 404 no such bucket…) — surface it, never a
          // phantom verdict
          throw new GraftCatalog.ClaimProtocolFault(
            s"conditional PUT of $uri → HTTP $c: ${errorBody(conn)}")
      }
    } finally conn.disconnect()
  }

  /** GET the object: Some(bytes) if it exists, None on 404. Used only for
    * post-fault ownership resolution. */
  private def probe(uri: URI): Option[Array[Byte]] = {
    val conn = uri.toURL.openConnection().asInstanceOf[HttpURLConnection]
    try {
      conn.setRequestMethod("GET")
      conn.setConnectTimeout(timeoutMs)
      conn.setReadTimeout(timeoutMs)
      sign(conn)
      conn.getResponseCode match {
        case c if c >= 200 && c < 300 => Some(conn.getInputStream.readAllBytes())
        case 404 => None
        case c => throw new GraftCatalog.ClaimProtocolFault(
          s"ownership probe GET $uri → HTTP $c: ${errorBody(conn)}")
      }
    } finally conn.disconnect()
  }

  private def errorBody(conn: HttpURLConnection): String = {
    val es = conn.getErrorStream
    if (es == null) "" else {
      val b = try new String(es.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
      finally es.close()
      b.linesIterator.take(1).mkString.take(200)
    }
  }
}
