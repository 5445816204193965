package graft.ann

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Driver-local IVF serving index — the point-latency answer to the
  * reference's in-process HNSW (core/vectorindex/hnsw.go:243-278, ~0.87 ms
  * per 1M-vector search, UPDATE-LOG.md:142). The Spark-first split: the
  * CLUSTER builds the index (k-means centroids + cell-partitioned snapshot,
  * `GraftCatalog.flush` with `ivfCells`), and this class loads that batch
  * artifact into flat primitive arrays for in-process probes — no Spark job,
  * no ~40-60 ms dispatch floor, sub-millisecond at 1M×128 with nprobe=8
  * (measured in LocalIvfIndexSpec / BENCH `ivf_local_search_1m`).
  *
  * Memory: vectors stay resident in their STORED form — one flat array per
  * cell: float[] (4 B/dim — 512 MB per 1M×128) for unquantized collections,
  * short[] (2 B/dim) for f16/bf16 storage, byte[] (1 B/dim) for f8 — so the
  * serving node holds exactly what disk holds, like [[LocalMultiIndex]].
  * Quantized rows decode per probe into a per-scan scratch buffer before the
  * shared distance kernel (loop fission, the fused kernel's discipline);
  * decode-to-float is exact, so results are bit-identical to the
  * decoded-resident form (LocalIvfIndexSpec pins all three modes). Beyond
  * what a serving node holds, shard cells across serving replicas or fall
  * back to the distributed probe (`GraftCatalog.searchIvf`).
  *
  * Exactness contract: inside the probed cells the scan is exact (same
  * double-accumulation distance as the engine expressions); recall vs the
  * full exact scan is the IVF nprobe/k trade, identical to the distributed
  * probe over the same layout.
  */
final class LocalIvfIndex private (
    centroids: Array[(Long, Array[Float])],
    cellIds: java.util.HashMap[Long, Array[AnyRef]],
    /** Per cell: one stored-form flat array (float[] | short[] | byte[],
      * by `quant`). */
    cellVecs: java.util.HashMap[Long, AnyRef],
    cellMeta: java.util.HashMap[Long, LocalMeta],
    /** Zero-row store carrying the BUILT column spec — the validation
      * authority, so an unknown filter column refuses even when every cell
      * is empty (a delta chain can delete the whole collection; the typo
      * must not hide until data returns). */
    specMeta: LocalMeta,
    val dim: Int,
    metric: String,
    quant: String) extends Serializable {

  def cellCount: Int = cellIds.size()
  def size: Long = {
    var n = 0L; cellIds.values.forEach(a => n += a.length); n
  }
  /** Columns available to [[search]]'s EQ filter (empty unless the index
    * was built with `metaCols`). */
  def filterableColumns: Set[String] = specMeta.columns

  /** Probe the `nprobe` nearest cells, exact top-k inside — all in-process.
    * Probed cells scan in parallel on the common pool (one task per cell,
    * local top-k, merged on the caller) — the in-process analog of the
    * reference's per-shard goroutine fan-out
    * (edge/none_vectorstore.go:148-178).
    *
    * `eqFilter` is the conjunctive-EQ pre-filter (S3 semantics, the
    * reference's inverted-index fast path, pkg/inverted/search.go:32-46):
    * rows failing any (column = value) term are skipped BEFORE scoring, so
    * the result equals the distributed `searchIvf(filter)` over the same
    * snapshot at the same nprobe (probed cells depend only on the query —
    * the filter never changes WHICH cells are probed, exactly like the
    * distributed pre-filter conjunct). Requires the index to have been
    * built with the named columns ([[LocalIvfIndex.fromAssigned]]'s
    * `metaCols`) — an unknown column refuses loudly, never scans
    * unfiltered. */
  def search(q: Array[Float], topK: Int, nprobe: Int,
             eqFilter: Seq[(String, Any)] = Nil): Seq[(AnyRef, Double)] = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    require(q.length == dim, s"vector dimension mismatch: expected $dim, got ${q.length}")
    // validate ONCE, synchronously, against the BUILT spec — refuses
    // unknown columns/bad value types even on a fully-empty store (a
    // refusal raised inside the pool fan-out would surface wrapped in
    // CompletionException)
    if (eqFilter.nonEmpty) specMeta.predicate(eqFilter)
    val probed = LocalIvfIndex.selectCells(centroids, q, nprobe, metric)
    // 0 = float-resident, 1 = f16 shorts, 2 = bf16 shorts, 3 = f8 bytes
    val qmode = quant match {
      case "none" => 0; case "f16" => 1; case "bf16" => 2; case "f8" => 3
    }
    def scanCell(cid: Long): Array[(AnyRef, Double)] = {
      val ids = cellIds.get(cid)
      if (ids == null) return Array.empty
      // typed view + scratch resolved ONCE per cell: the unquantized hot
      // path indexes a plain float array with no per-row dispatch or cast;
      // quantized rows decode into the scratch before the shared float
      // kernel (loop fission — decode-to-float is exact, so the result is
      // bit-identical to the decoded-resident form)
      val raw = cellVecs.get(cid)
      val fvecs: Array[Float] = if (qmode == 0) raw.asInstanceOf[Array[Float]] else null
      val svecs: Array[Short] =
        if (qmode == 1 || qmode == 2) raw.asInstanceOf[Array[Short]] else null
      val bvecs: Array[Byte] = if (qmode == 3) raw.asInstanceOf[Array[Byte]] else null
      val scratch: Array[Float] = if (qmode == 0) null else new Array[Float](dim)
      import graft.functions.QuantKernels
      def rowDist(i: Int): Double =
        if (qmode == 0) LocalIvfIndex.dist(fvecs, i * dim, q, metric)
        else {
          val off = i * dim
          var j = 0
          qmode match {
            case 1 =>
              while (j < dim) { scratch(j) = QuantKernels.f16ToFloat(svecs(off + j)); j += 1 }
            case 2 =>
              while (j < dim) { scratch(j) = QuantKernels.bf16ToFloat(svecs(off + j)); j += 1 }
            case _ =>
              while (j < dim) { scratch(j) = QuantKernels.f8ToFloat(bvecs(off + j)); j += 1 }
          }
          LocalIvfIndex.dist(scratch, 0, q, metric)
        }
      // compiled once per probed cell; null = unfiltered (zero per-row cost
      // beyond one perfectly-predicted branch)
      val pred: Int => Boolean =
        if (eqFilter.isEmpty) null
        else {
          val m = cellMeta.get(cid)
          (if (m == null) LocalMeta.Empty else m).predicate(eqFilter)
        }
      val heap = LocalTopK.newHeap(topK)
      // Admission gate: once the heap is full, a vector can only displace
      // the head if d <= head + 2e-6 (beyond that, cmp resolves on the raw
      // doubles — see cmp's fast path), so the overwhelming majority of
      // scanned vectors skip the tuple allocation and comparator call.
      var gate = Double.MaxValue
      var i = 0
      while (i < ids.length) {
        if (pred == null || pred(i)) {
          val d = rowDist(i)
          if (d <= gate) {
            val e = (ids(i), d)
            if (heap.size < topK) {
              heap.add(e)
              if (heap.size == topK) gate = heap.peek()._2 + 2e-6
            } else if (LocalTopK.cmp(e, heap.peek()) < 0) {
              heap.poll(); heap.add(e)
              gate = heap.peek()._2 + 2e-6
            }
          }
        }
        i += 1
      }
      heap.toArray(new Array[(AnyRef, Double)](0))
    }
    LocalTopK.scanAndMerge(probed, scanCell, topK)
  }

  /** O(changes) refresh (r13, r12 VERDICT #2): fold one delta window's LWW
    * winners into the resident index instead of re-streaming the corpus —
    * the in-process analog of the reference HNSW's online inserts
    * (core/vectorindex/hnsw.go:104-167), rebuilt-index-identical
    * (LocalRefreshSpec pins parity per storage mode).
    *
    * `struck` = EVERY winner pk of the window (dels AND puts — a put
    * strikes its stale copy wherever it lives, including another cell when
    * the row moved); `puts` = the put winners with their segment-decorated
    * cell and STORED-form vector, meta values aligned with the name-sorted
    * [[LocalMeta.specs]] of the built filter columns. Only cells holding a
    * struck pk or receiving a put rebuild (copy-filter-append of flat
    * arrays); untouched cells SHARE their arrays with the old index, so
    * cost is O(corpus) hash probes + O(touched cells) copy — no Spark
    * read, no decode. The centroids are the chain base's, which is exactly
    * why the caller must only fold windows within one chain
    * ([[graft.collection.GraftCatalog]]'s refresh seam enforces it). */
  def applyChanges(struck: java.util.Set[AnyRef],
                   puts: Seq[LocalIvfIndex.Put]): LocalIvfIndex = {
    val specs = specMeta.specs
    val qm = quant match {
      case "none" => 0; case "f16" => 1; case "bf16" => 2; case "f8" => 3
    }
    puts.foreach { p =>
      val len = p.vec match {
        case a: Array[Float] if qm == 0            => a.length
        case a: Array[Short] if qm == 1 || qm == 2 => a.length
        case a: Array[Byte] if qm == 3             => a.length
        case other => throw new IllegalArgumentException(
          s"put ${p.id}: stored form ${if (other == null) "null" else other.getClass.getSimpleName} " +
            s"does not match index quantization '$quant'")
      }
      require(len == dim, s"put ${p.id}: vector is $len-dim, index dim is $dim")
      require(p.metaValues.length == specs.length,
        s"put ${p.id}: expected ${specs.length} meta values (${specs.map(_._1).mkString(", ")}), " +
          s"got ${p.metaValues.length}")
    }
    val putsByCell = puts.groupBy(_.cell)
    val touched = scala.collection.mutable.LinkedHashSet.empty[Long]
    if (!struck.isEmpty) cellIds.forEach { (cid, ids) =>
      if (ids.exists(struck.contains)) touched += cid: Unit
    }
    touched ++= putsByCell.keys
    if (touched.isEmpty) return this
    val newIds = new java.util.HashMap[Long, Array[AnyRef]](cellIds)
    val newVecs = new java.util.HashMap[Long, AnyRef](cellVecs)
    val newMeta = new java.util.HashMap[Long, LocalMeta](cellMeta)
    touched.foreach { cid =>
      val oldIds = Option(cellIds.get(cid)).getOrElse(Array.empty[AnyRef])
      val oldVecs = cellVecs.get(cid)
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
      if (n == 0) { newIds.remove(cid); newVecs.remove(cid); newMeta.remove(cid) }
      else {
        val ids2 = new Array[AnyRef](n)
        var j = 0
        while (j < kept.length) { ids2(j) = oldIds(kept(j)); j += 1 }
        cellPuts.zipWithIndex.foreach { case (p, k) => ids2(kept.length + k) = p.id }
        // generic is erasure-safe here: rows move only via System.arraycopy
        // (no element reads), so no boxing on the primitive arrays
        def copyRows[T](
            old: Array[T], out: Array[T], putVec: Int => Array[T]): AnyRef = {
          var r = 0
          while (r < kept.length) {
            System.arraycopy(old, kept(r) * dim, out, r * dim, dim); r += 1
          }
          var k = 0
          while (k < cellPuts.length) {
            System.arraycopy(putVec(k), 0, out, (kept.length + k) * dim, dim); k += 1
          }
          out.asInstanceOf[AnyRef]
        }
        val vecs2: AnyRef = qm match {
          case 0 => copyRows(
            if (oldVecs == null) Array.empty[Float] else oldVecs.asInstanceOf[Array[Float]],
            new Array[Float](n * dim), k => cellPuts(k).vec.asInstanceOf[Array[Float]])
          case 1 | 2 => copyRows(
            if (oldVecs == null) Array.empty[Short] else oldVecs.asInstanceOf[Array[Short]],
            new Array[Short](n * dim), k => cellPuts(k).vec.asInstanceOf[Array[Short]])
          case _ => copyRows(
            if (oldVecs == null) Array.empty[Byte] else oldVecs.asInstanceOf[Array[Byte]],
            new Array[Byte](n * dim), k => cellPuts(k).vec.asInstanceOf[Array[Byte]])
        }
        newIds.put(cid, ids2)
        newVecs.put(cid, vecs2)
        if (specs.nonEmpty) {
          val mb = new LocalMeta.Builder(specs)
          val src = if (oldMeta == null) LocalMeta.Empty else oldMeta
          kept.foreach(r => mb.add(src.valuesAt(r)))
          cellPuts.foreach(p => mb.add(p.metaValues))
          newMeta.put(cid, mb.result())
        }
      }
    }
    new LocalIvfIndex(centroids, newIds, newVecs, newMeta, specMeta, dim, metric, quant)
  }
}

object LocalIvfIndex {

  /** One put winner for [[LocalIvfIndex.applyChanges]]: pk, its
    * segment-assigned cell, the STORED-form vector (float[]/short[]/byte[]
    * matching the index quantization), and filter-column values aligned
    * with the index's name-sorted [[LocalMeta.specs]]. */
  case class Put(id: AnyRef, cell: Long, vec: AnyRef, metaValues: Seq[Any])

  /** The `nprobe` nearest cell ids by insertion into primitive parallel
    * arrays — no tuple boxing, no full sort of k cells; the
    * `(round(dist, 6), cid)` order, matching [[graft.ann.Ann.probeCells]]
    * and the `top_cells` kernel (the ONE probe contract). */
  private[ann] def selectCells(centroids: Array[(Long, Array[Float])],
                               q: Array[Float], nprobe: Int, metric: String): Seq[Long] = {
    val np = math.min(nprobe, centroids.length)
    if (np <= 0) return Seq.empty
    val bestIds = new Array[Long](np)
    val bestD = Array.fill(np)(Double.MaxValue)
    var filled = 0 // slots holding a real admission (a NaN-distance query
                   // admits nothing — return the empty prefix, never the
                   // zero-initialized filler cids as duplicate "cells")
    var ci = 0
    while (ci < centroids.length) {
      val (cid, cv) = centroids(ci)
      val d = round6(dist(cv, 0, q, metric))
      if (d < bestD(np - 1) || (d == bestD(np - 1) && cid < bestIds(np - 1))) {
        var ins = np - 1
        while (ins > 0 && (d < bestD(ins - 1) || (d == bestD(ins - 1) && cid < bestIds(ins - 1)))) {
          bestD(ins) = bestD(ins - 1); bestIds(ins) = bestIds(ins - 1); ins -= 1
        }
        bestD(ins) = d; bestIds(ins) = cid
        if (filled < np) filled += 1
      }
      ci += 1
    }
    bestIds.take(filled).toSeq
  }

  /** Spark's `round(d, 6)` — BigDecimal HALF_UP on the exact binary value,
    * matching the `round(dist, 6)` the distributed probe orders by. */
  def round6(d: Double): Double =
    if (d.isNaN || d.isInfinite) d
    else new java.math.BigDecimal(d).setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  // ordering + heap + fan-out live in [[LocalTopK]], shared with
  // LocalPqIndex so the two serving rungs cannot drift apart

  /** Build from an assigned DataFrame (columns: id, vector in its STORED
    * form — array<float>, f16/bf16 shorts, or f8 bytes per `quant` —, cell)
    * + the trained centroids — brought to the driver via
    * [[LocalLoad.boundedIterator]] (one parallel collect job for provably
    * small inputs; partition-streamed above the threshold so the transient
    * footprint stays one partition, not the whole collection).
    *
    * `metaCols` = (columnName, declared fieldType) pairs to load as typed
    * per-cell arrays ([[LocalMeta]]) so [[LocalIvfIndex.search]]'s
    * conjunctive-EQ filter can serve in-process — ~9 bytes/row/column next
    * to the ≤4·dim the vectors cost. Quantized loads take PRE-PREPARED
    * query vectors at search time like every local rung. */
  def fromAssigned(assigned: DataFrame, idCol: String, vecCol: String,
                   centroids: Seq[(Long, Array[Float])], metric: String,
                   metaCols: Seq[(String, String)] = Nil,
                   quant: String = "none"): LocalIvfIndex = {
    require(Set("none", "f16", "bf16", "f8").contains(quant), s"unknown quantization: $quant")
    val storedCol = quant match {
      case "none"         => col(vecCol).cast("array<float>")
      case "f16" | "bf16" => col(vecCol).cast("array<short>")
      case "f8"           => col(vecCol) // binary
    }
    // `cell` comes back as Int when read from a partitionBy directory —
    // normalize to long
    val rows = assigned.select(col(idCol) +: storedCol +:
      col("cell").cast("long") +: metaCols.map { case (n, _) => col(n) }: _*)
    // dim comes from the trained centroids, not the first data row — an
    // empty (or fully-filtered) assigned set must build a searchable empty
    // index, not one whose every probe fails with "expected -1".
    require(centroids.nonEmpty, "fromAssigned requires at least one centroid")
    val dim = centroids.head._2.length
    // 0 = floats, 1/2 = shorts, 3 = bytes — hoisted above the row loop
    val qm = quant match {
      case "none" => 0; case "f16" => 1; case "bf16" => 2; case "f8" => 3
    }
    val idsB = new java.util.HashMap[Long, scala.collection.mutable.ArrayBuilder[AnyRef]]()
    val vecsB = new java.util.HashMap[Long, scala.collection.mutable.ArrayBuilder[_]]()
    def newVecBuilder(): scala.collection.mutable.ArrayBuilder[_] = qm match {
      case 0     => new scala.collection.mutable.ArrayBuilder.ofFloat
      case 1 | 2 => new scala.collection.mutable.ArrayBuilder.ofShort
      case _     => new scala.collection.mutable.ArrayBuilder.ofByte
    }
    val metaB = new java.util.HashMap[Long, LocalMeta.Builder]()
    val it = LocalLoad.boundedIterator(rows)
    while (it.hasNext) {
      val r = it.next()
      val cell = r.getLong(2)
      var ib = idsB.get(cell)
      if (ib == null) {
        ib = scala.collection.mutable.ArrayBuilder.make[AnyRef]
        idsB.put(cell, ib)
        vecsB.put(cell, newVecBuilder())
        if (metaCols.nonEmpty) metaB.put(cell, new LocalMeta.Builder(metaCols))
      }
      def badDim(len: Any): Nothing = throw new IllegalArgumentException(
        s"row ${r.get(0)}: vector is $len, index dim is $dim")
      qm match {
        case 3 =>
          val v = r.getAs[Array[Byte]](1)
          if (v == null || v.length != dim)
            badDim(if (v == null) "null" else s"${v.length}-dim")
          val b = vecsB.get(cell).asInstanceOf[scala.collection.mutable.ArrayBuilder.ofByte]
          b.addAll(v, 0, v.length)
        case 1 | 2 =>
          val v = r.getSeq[Short](1)
          if (v == null || v.length != dim)
            badDim(if (v == null) "null" else s"${v.length}-dim")
          val b = vecsB.get(cell).asInstanceOf[scala.collection.mutable.ArrayBuilder.ofShort]
          RowArrays.appendShorts(v, b)
        case _ =>
          val v = r.getSeq[Float](1)
          if (v == null || v.length != dim)
            badDim(if (v == null) "null" else s"${v.length}-dim")
          val b = vecsB.get(cell).asInstanceOf[scala.collection.mutable.ArrayBuilder.ofFloat]
          RowArrays.appendFloats(v, b)
      }
      ib += r.get(0).asInstanceOf[AnyRef]
      if (metaCols.nonEmpty)
        metaB.get(cell).add(metaCols.indices.map(j => r.get(3 + j)))
    }
    val ids = new java.util.HashMap[Long, Array[AnyRef]]()
    val vecs = new java.util.HashMap[Long, AnyRef]()
    val metas = new java.util.HashMap[Long, LocalMeta]()
    idsB.forEach((k, b) => ids.put(k, b.result()))
    vecsB.forEach((k, b) => vecs.put(k, b.result().asInstanceOf[AnyRef]))
    metaB.forEach((k, b) => metas.put(k, b.result()))
    val sorted = centroids.sortBy(_._1).toArray
    val specMeta =
      if (metaCols.nonEmpty) new LocalMeta.Builder(metaCols).result()
      else LocalMeta.Empty
    new LocalIvfIndex(sorted, ids, vecs, metas, specMeta, dim, metric, quant)
  }

  /** Exact scalar distance over a flat array slice — double accumulation in
    * the same order as the engine's codegen kernels. */
  private[ann] def dist(vecs: Array[Float], off: Int, q: Array[Float], metric: String): Double =
    metric match {
      case "euclidean" =>
        var acc = 0.0; var j = 0
        while (j < q.length) { val d = vecs(off + j).toDouble - q(j).toDouble; acc += d * d; j += 1 }
        math.sqrt(acc)
      case "manhattan" =>
        var acc = 0.0; var j = 0
        while (j < q.length) { acc += math.abs(vecs(off + j).toDouble - q(j).toDouble); j += 1 }
        acc
      case "cosine" =>
        var dot = 0.0; var na = 0.0; var nb = 0.0; var j = 0
        while (j < q.length) {
          val x = vecs(off + j).toDouble; val y = q(j).toDouble
          dot += x * y; na += x * x; nb += y * y; j += 1
        }
        math.abs(1.0 - dot / (math.sqrt(na) * math.sqrt(nb)))
      case "dot" =>
        var acc = 0.0; var j = 0
        while (j < q.length) { acc += vecs(off + j).toDouble * q(j).toDouble; j += 1 }
        -acc
      case other => throw new IllegalArgumentException(s"unknown metric: $other")
    }
}
