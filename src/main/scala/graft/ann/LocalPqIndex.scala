package graft.ann

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Driver-local ADC serving index — the MEMORY-scale rung of the serving
  * ladder that [[LocalIvfIndex]] starts: that index holds raw floats
  * (4·dim bytes/vector — 512 MB per 1M×128), this one holds the flushed PQ
  * CODE layout (m bytes/vector — 16 MB per 1M at m=16, 32× smaller), so a
  * serving node can keep far larger collections resident and answer probes
  * in-process with no Spark job. The trade is the PQ approximation: probes
  * rank by asymmetric distance (per-query lookup tables); exact top-k needs
  * the rerank repair over the candidates' stored floats, which stays a
  * (bounded, id-pruned) snapshot read — [[graft.collection.GraftCatalog.searchPq]]'s
  * rerank path, or a [[LocalIvfIndex]] kept beside this one when memory
  * allows.
  *
  * Layout awareness: built from an IVF-PQ snapshot the codes are RESIDUALS
  * (vec − cellCentroid, see GraftCatalog.flush) and each probed cell scans
  * against its own table (`adcLut(q − centroid)`); built from a cells-less
  * PQ snapshot everything lives in one implicit cell with the plain
  * query LUT. Ranking matches the distributed ADC scan's
  * `(round6(adc), id)` order — pinned against `searchPq(rerank = false)`
  * in LocalPqIndexSpec.
  */
final class LocalPqIndex private (
    centroids: Array[(Long, Array[Float])], // empty for a cells-less layout
    cellIds: java.util.HashMap[Long, Array[AnyRef]],
    cellCodes: java.util.HashMap[Long, Array[Byte]],
    cb: PqCodebook,
    val dim: Int,
    metric: String,
    residual: Boolean) extends Serializable {

  def cellCount: Int = cellIds.size()
  def size: Long = {
    var n = 0L; cellIds.values.forEach(a => n += a.length); n
  }
  /** Resident bytes of the code payload (the memory-scale claim). */
  def codeBytes: Long = {
    var n = 0L; cellCodes.values.forEach(a => n += a.length); n
  }

  /** ADC top-k: probe the `nprobe` nearest cells (all, when the layout has
    * no cells), build each probed cell's lookup table once, scan its m-byte
    * codes with a bounded heap. Returns (id, adcDistance) best-first —
    * candidates for an exact rerank, or directly the approximate answer. */
  def search(q: Array[Float], topK: Int, nprobe: Int): Seq[(AnyRef, Double)] = {
    require(q.length == dim, s"vector dimension mismatch: expected $dim, got ${q.length}")
    val m = cb.m
    val probed: Seq[Long] =
      if (centroids.isEmpty) Seq(LocalPqIndex.NoCell)
      else centroids
        .map { case (cid, cv) => (cid, LocalIvfIndex.dist(cv, 0, q, metric)) }
        .sortBy { case (cid, d) => (d, cid) }
        .take(nprobe).map(_._1).toSeq
    val heap = LocalPqIndex.newHeap(topK)
    probed.foreach { cid =>
      val ids = cellIds.get(cid)
      if (ids != null) {
        val codes = cellCodes.get(cid)
        val lut = lutFor(cid, q)
        var i = 0
        while (i < ids.length) {
          var acc = 0.0; var j = 0; val base = i * m
          while (j < m) { acc += lut(j * cb.ksub + (codes(base + j) & 0xFF)); j += 1 }
          val e = (ids(i), math.sqrt(acc))
          if (heap.size < topK) heap.add(e)
          else if (LocalPqIndex.cmp(e, heap.peek()) < 0) { heap.poll(); heap.add(e) }
          i += 1
        }
      }
    }
    val out = new Array[(AnyRef, Double)](heap.size)
    var i = out.length - 1
    while (i >= 0) { out(i) = heap.poll(); i -= 1 }
    out.toSeq
  }

  private def lutFor(cid: Long, q: Array[Float]): Array[Double] =
    if (!residual) cb.adcLut(q)
    else {
      val cv = centroids.find(_._1 == cid).get._2
      cb.adcLut(Array.tabulate(q.length)(i => q(i) - cv(i)))
    }
}

object LocalPqIndex {

  /** Cell key used when the layout has no IVF cells. */
  private val NoCell = -1L

  /** Same (round6(dist), id) total order as the distributed ADC scan
    * (`searchPq` orders by round(adc, 6) asc, id asc) — see
    * [[LocalIvfIndex.round6]] for the fast-path rationale. */
  private def cmp(a: (AnyRef, Double), b: (AnyRef, Double)): Int = {
    val c =
      if (math.abs(a._2 - b._2) > 2e-6) java.lang.Double.compare(a._2, b._2)
      else java.lang.Double.compare(LocalIvfIndex.round6(a._2), LocalIvfIndex.round6(b._2))
    if (c != 0) c
    else a._1 match {
      case x: Comparable[_] => x.asInstanceOf[Comparable[AnyRef]].compareTo(b._1)
      case _ => 0
    }
  }

  /** Bounded max-heap on (dist, id) (worst of the best k at the head). */
  private def newHeap(topK: Int) = new java.util.PriorityQueue[(AnyRef, Double)](
    math.max(topK, 1),
    (a: (AnyRef, Double), b: (AnyRef, Double)) => cmp(b, a))

  /** Build from a flushed PQ snapshot's (id, code[, cell]) columns + the
    * codebook sidecar — streamed via toLocalIterator so the transient
    * footprint is one partition. `centroids` empty ⇒ cells-less layout;
    * nonempty ⇒ IVF-PQ residual layout (codes are residuals, probes use
    * per-cell tables). */
  def fromCodes(snapshot: DataFrame, idCol: String, codeCol: String,
                cb: PqCodebook, centroids: Seq[(Long, Array[Float])],
                metric: String, cellCol: Option[String]): LocalPqIndex = {
    val m = cb.m
    val rows = cellCol match {
      case Some(cc) => snapshot.select(col(idCol), col(codeCol), col(cc).cast("long"))
      case None     => snapshot.select(col(idCol), col(codeCol), lit(NoCell))
    }
    val idsB = new java.util.HashMap[Long, scala.collection.mutable.ArrayBuilder[AnyRef]]()
    val codesB = new java.util.HashMap[Long, scala.collection.mutable.ArrayBuilder.ofByte]()
    val it = rows.toLocalIterator()
    while (it.hasNext) {
      val r = it.next()
      val code = r.getAs[Array[Byte]](1)
      require(code.length == m, s"code length ${code.length} != m=$m")
      val cell = r.getLong(2)
      var ib = idsB.get(cell)
      if (ib == null) {
        ib = scala.collection.mutable.ArrayBuilder.make[AnyRef]
        idsB.put(cell, ib)
        codesB.put(cell, new scala.collection.mutable.ArrayBuilder.ofByte)
      }
      ib += r.get(0).asInstanceOf[AnyRef]
      val vb = codesB.get(cell)
      code.foreach(vb += _)
    }
    val ids = new java.util.HashMap[Long, Array[AnyRef]]()
    val codes = new java.util.HashMap[Long, Array[Byte]]()
    idsB.forEach((k, b) => ids.put(k, b.result()))
    codesB.forEach((k, b) => codes.put(k, b.result()))
    val dim = cb.dim
    new LocalPqIndex(centroids.sortBy(_._1).toArray, ids, codes, cb, dim, metric,
      residual = centroids.nonEmpty)
  }
}
