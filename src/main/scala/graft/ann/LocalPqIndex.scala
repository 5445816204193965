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
    cellMeta: java.util.HashMap[Long, LocalMeta],
    /** Zero-row store carrying the BUILT column spec — the validation
      * authority, so an unknown filter column refuses even when every cell
      * is empty ([[LocalIvfIndex]]'s discipline). */
    specMeta: LocalMeta,
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
  /** Columns available to [[search]]'s EQ filter (empty unless the index
    * was built with `metaCols`). */
  def filterableColumns: Set[String] = specMeta.columns

  /** O(1) centroid lookup for per-cell residual tables (the linear
    * `centroids.find` was O(k) per probed cell). */
  private val centroidByCid: java.util.HashMap[Long, Array[Float]] = {
    val h = new java.util.HashMap[Long, Array[Float]]()
    centroids.foreach { case (cid, cv) => h.put(cid, cv) }
    h
  }

  /** ADC top-k: probe the `nprobe` nearest cells (all, when the layout has
    * no cells), build each probed cell's lookup table once, scan its m-byte
    * codes with a bounded heap. Probed cells scan in parallel on the common
    * pool (one task per cell, local top-k, merged on the caller — the same
    * fan-out as [[LocalIvfIndex.search]]); inside the scan loop a
    * squared-ADC admission gate rejects codes that cannot make the heap
    * BEFORE the sqrt + tuple allocation — the hot loop allocates nothing
    * for the overwhelming majority of scanned codes. Returns
    * (id, adcDistance) best-first — candidates for an exact rerank, or
    * directly the approximate answer.
    *
    * `eqFilter` is the conjunctive-EQ pre-filter ([[LocalIvfIndex.search]]'s
    * contract, the reference's inverted-index fast path): rows failing any
    * (column = value) term skip BEFORE the ADC loop, so the result equals
    * the distributed `searchPq(rerank = false, filter)` over the same
    * snapshot at the same nprobe (the filter never changes WHICH cells are
    * probed). Needs the index built with the named columns
    * ([[LocalPqIndex.fromCodes]]'s `metaCols`) — unknown columns refuse
    * loudly, never scan unfiltered. */
  def search(q: Array[Float], topK: Int, nprobe: Int,
             eqFilter: Seq[(String, Any)] = Nil): Seq[(AnyRef, Double)] = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    require(q.length == dim, s"vector dimension mismatch: expected $dim, got ${q.length}")
    // validate ONCE, synchronously, against the BUILT spec (refusals must
    // not surface wrapped in CompletionException from the pool fan-out)
    if (eqFilter.nonEmpty) specMeta.predicate(eqFilter)
    val m = cb.m
    val ksub = cb.ksub
    val probed: Seq[Long] =
      if (centroids.isEmpty) Seq(LocalPqIndex.NoCell)
      else LocalIvfIndex.selectCells(centroids, q, nprobe, metric)
    def scanCell(cid: Long): Array[(AnyRef, Double)] = {
      val ids = cellIds.get(cid)
      if (ids == null) return Array.empty
      val codes = cellCodes.get(cid)
      val lut = lutFor(cid, q)
      // compiled once per probed cell; null = unfiltered
      val pred: Int => Boolean =
        if (eqFilter.isEmpty) null
        else {
          val mm = cellMeta.get(cid)
          (if (mm == null) LocalMeta.Empty else mm).predicate(eqFilter)
        }
      val heap = LocalTopK.newHeap(topK)
      // Admission bound in the SQUARED domain: an element can only displace
      // the heap head if dist <= head + 2e-6 (beyond that, cmp resolves on
      // the raw doubles — see cmp's fast path), so acc > (head + 2e-6)²
      // can be skipped without sqrt, tuple, or comparator work.
      var gate = Double.MaxValue
      var i = 0
      while (i < ids.length) {
        if (pred == null || pred(i)) {
          var acc = 0.0; var j = 0; val base = i * m; var lutOff = 0
          while (j < m) {
            acc += lut(lutOff + (codes(base + j) & 0xFF)); lutOff += ksub; j += 1
          }
          if (acc <= gate) {
            val e = (ids(i), math.sqrt(acc))
            if (heap.size < topK) {
              heap.add(e)
              if (heap.size == topK) { val w = heap.peek()._2 + 2e-6; gate = w * w }
            } else if (LocalTopK.cmp(e, heap.peek()) < 0) {
              heap.poll(); heap.add(e)
              val w = heap.peek()._2 + 2e-6; gate = w * w
            }
          }
        }
        i += 1
      }
      heap.toArray(new Array[(AnyRef, Double)](0))
    }
    LocalTopK.scanAndMerge(probed, scanCell, topK)
  }

  private def lutFor(cid: Long, q: Array[Float]): Array[Double] =
    if (!residual) cb.adcLut(q)
    else {
      val cv = centroidByCid.get(cid)
      cb.adcLut(Array.tabulate(q.length)(i => q(i) - cv(i)))
    }

  /** O(changes) refresh — [[LocalIvfIndex.applyChanges]]'s contract on the
    * code rung: `struck` = every winner pk, `puts` = put winners with their
    * segment-encoded m-byte code (already raw/residual per THIS layout —
    * decorateSegment encodes against the chain base's codebook, the same
    * sidecar this index holds) and cell (ignored on a cells-less layout).
    * Touched cells copy-filter-append; untouched cells share arrays. */
  def applyChanges(struck: java.util.Set[AnyRef],
                   puts: Seq[LocalPqIndex.Put]): LocalPqIndex = {
    val specs = specMeta.specs
    val m = cb.m
    puts.foreach { p =>
      require(p.code != null && p.code.length == m,
        s"put ${p.id}: code is ${if (p.code == null) "null" else s"${p.code.length} B"}, layout m=$m")
      require(p.metaValues.length == specs.length,
        s"put ${p.id}: expected ${specs.length} meta values, got ${p.metaValues.length}")
    }
    val putsByCell = puts.groupBy(p =>
      if (centroids.isEmpty) LocalPqIndex.NoCell else p.cell)
    val touched = scala.collection.mutable.LinkedHashSet.empty[Long]
    if (!struck.isEmpty) cellIds.forEach { (cid, ids) =>
      if (ids.exists(struck.contains)) touched += cid: Unit
    }
    touched ++= putsByCell.keys
    if (touched.isEmpty) return this
    val newIds = new java.util.HashMap[Long, Array[AnyRef]](cellIds)
    val newCodes = new java.util.HashMap[Long, Array[Byte]](cellCodes)
    val newMeta = new java.util.HashMap[Long, LocalMeta](cellMeta)
    touched.foreach { cid =>
      val oldIds = Option(cellIds.get(cid)).getOrElse(Array.empty[AnyRef])
      val oldCodes = Option(cellCodes.get(cid)).getOrElse(Array.empty[Byte])
      val oldMeta = cellMeta.get(cid)
      val keep = Array.newBuilder[Int]
      var i = 0
      while (i < oldIds.length) {
        if (!struck.contains(oldIds(i))) keep += i
        i += 1
      }
      val kept = keep.result()
      val cellPuts = putsByCell.getOrElse(cid, Seq.empty)
      val n = kept.length + cellPuts.length
      if (n == 0) { newIds.remove(cid); newCodes.remove(cid); newMeta.remove(cid) }
      else {
        val ids2 = new Array[AnyRef](n)
        val codes2 = new Array[Byte](n * m)
        var r = 0
        while (r < kept.length) {
          ids2(r) = oldIds(kept(r))
          System.arraycopy(oldCodes, kept(r) * m, codes2, r * m, m)
          r += 1
        }
        cellPuts.zipWithIndex.foreach { case (p, k) =>
          ids2(kept.length + k) = p.id
          System.arraycopy(p.code, 0, codes2, (kept.length + k) * m, m)
        }
        newIds.put(cid, ids2)
        newCodes.put(cid, codes2)
        if (specs.nonEmpty) {
          val mb = new LocalMeta.Builder(specs)
          val src = if (oldMeta == null) LocalMeta.Empty else oldMeta
          kept.foreach(r2 => mb.add(src.valuesAt(r2)))
          cellPuts.foreach(p => mb.add(p.metaValues))
          newMeta.put(cid, mb.result())
        }
      }
    }
    new LocalPqIndex(centroids, newIds, newCodes, newMeta, specMeta,
      cb, dim, metric, residual)
  }
}

object LocalPqIndex {

  /** Cell key used when the layout has no IVF cells. */
  private val NoCell = -1L

  /** One put winner for [[LocalPqIndex.applyChanges]]: pk, segment cell
    * (any value on a cells-less layout), the m-byte code in THIS layout's
    * encoding, and filter-column values aligned with the index's
    * name-sorted [[LocalMeta.specs]]. */
  case class Put(id: AnyRef, cell: Long, code: Array[Byte], metaValues: Seq[Any])

  // ordering + heap + fan-out live in [[LocalTopK]], shared with
  // LocalIvfIndex so the two serving rungs cannot drift apart

  /** Build from a flushed PQ snapshot's (id, code[, cell]) columns + the
    * codebook sidecar — via [[LocalLoad.boundedIterator]] (small inputs
    * collect in one parallel job; large ones stream so the transient
    * footprint is one partition). `centroids` empty ⇒ cells-less layout.
    * `residual` is the SNAPSHOT'S recorded code layout (the pq sidecar's
    * flag — see GraftCatalog.flush): true ⇒ codes quantize
    * vec − cellCentroid and probes use per-cell tables; false ⇒ raw codes,
    * one plain query LUT (cells, when present, still direct probing).
    * Defaults to the flush convention (cells ⇒ residual) for callers
    * outside the catalog.
    *
    * `metaCols` = (columnName, declared fieldType) pairs loaded as typed
    * per-cell arrays ([[LocalMeta]]) for [[LocalPqIndex.search]]'s
    * conjunctive-EQ filter — ~9 bytes/row/column next to the m bytes the
    * codes cost. */
  def fromCodes(snapshot: DataFrame, idCol: String, codeCol: String,
                cb: PqCodebook, centroids: Seq[(Long, Array[Float])],
                metric: String, cellCol: Option[String],
                residual: Boolean = true,
                metaCols: Seq[(String, String)] = Nil): LocalPqIndex = {
    val m = cb.m
    val baseCols = cellCol match {
      case Some(cc) => Seq(col(idCol), col(codeCol), col(cc).cast("long"))
      case None     => Seq(col(idCol), col(codeCol), lit(NoCell))
    }
    val rows = snapshot.select(baseCols ++ metaCols.map { case (n, _) => col(n) }: _*)
    val idsB = new java.util.HashMap[Long, scala.collection.mutable.ArrayBuilder[AnyRef]]()
    val codesB = new java.util.HashMap[Long, scala.collection.mutable.ArrayBuilder.ofByte]()
    val metaB = new java.util.HashMap[Long, LocalMeta.Builder]()
    val it = LocalLoad.boundedIterator(rows)
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
        if (metaCols.nonEmpty) metaB.put(cell, new LocalMeta.Builder(metaCols))
      }
      ib += r.get(0).asInstanceOf[AnyRef]
      val vb = codesB.get(cell)
      vb.addAll(code, 0, code.length)
      if (metaCols.nonEmpty)
        metaB.get(cell).add(metaCols.indices.map(j => r.get(3 + j)))
    }
    val ids = new java.util.HashMap[Long, Array[AnyRef]]()
    val codes = new java.util.HashMap[Long, Array[Byte]]()
    val metas = new java.util.HashMap[Long, LocalMeta]()
    idsB.forEach((k, b) => ids.put(k, b.result()))
    codesB.forEach((k, b) => codes.put(k, b.result()))
    metaB.forEach((k, b) => metas.put(k, b.result()))
    val dim = cb.dim
    val specMeta =
      if (metaCols.nonEmpty) new LocalMeta.Builder(metaCols).result()
      else LocalMeta.Empty
    // residual tables need centroids; a cells-less layout is always raw
    new LocalPqIndex(centroids.sortBy(_._1).toArray, ids, codes, metas, specMeta,
      cb, dim, metric, residual = residual && centroids.nonEmpty)
  }
}
