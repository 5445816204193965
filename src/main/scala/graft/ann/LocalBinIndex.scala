package graft.ann

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Driver-local binary serving index — the DENSITY-scale rung below
  * [[LocalPqIndex]] on the serving ladder: that index holds m-byte PQ codes
  * (16 MB per 1M at m=16), this one holds the packed SIGN-BIT layout
  * (ceil(dim/8) bytes — 8 MB per 1M at 64 d, 16 MB at 128 d) and the scan
  * is pure integer work: per vector, `w` XOR+POPCNT word operations and one
  * compare, no FP pipeline, no lookup tables, no allocation. The trade is
  * the coarsest approximation on the ladder: Hamming over sign bits ranks
  * candidates for an exact rerank ([[graft.collection.GraftCatalog.searchBinary]]'s
  * second pass), it is not a distance estimate like ADC.
  *
  * Concurrency: the contiguous code array splits into fixed stripes that
  * scan on the common pool through the shared [[LocalTopK]] fan-out/merge —
  * the same order contract as every other serving rung, so `(round6(dist),
  * id)` ranking cannot drift from the distributed Hamming scan (Hamming
  * distances are exact small integers, so round6 is the identity and ties
  * resolve purely on id).
  */
final class LocalBinIndex private (
    ids: Array[AnyRef],
    words: Array[Long], // n·w packed code words, vector i at [i·w, i·w+w)
    meta: LocalMeta,
    val dim: Int,
    thresholds: Array[Double],
    stripes: Int) extends Serializable {

  private val w = LocalBinIndex.wordsPerVec(dim)

  def size: Long = ids.length.toLong
  /** Resident bytes of the code payload (the density-scale claim). */
  def codeBytes: Long = words.length.toLong * 8
  /** Columns available to [[search]]'s EQ filter (empty unless the index
    * was built with `metaCols`). */
  def filterableColumns: Set[String] = meta.columns

  /** Hamming top-k over all vectors (no cells — the whole scan is cheaper
    * than one ADC cell probe). Returns (id, hammingDistance) best-first:
    * candidates for an exact rerank, or the approximate answer. The query
    * is a FLOAT vector — encoded here against the trained thresholds, the
    * same both-sides-quantized contract as the distributed scan.
    *
    * `eqFilter` is the conjunctive-EQ pre-filter ([[LocalIvfIndex.search]]'s
    * contract): failing rows skip BEFORE the XOR+POPCNT loop, so the result
    * equals the distributed `searchBinary(filter)`'s pass 1 over the same
    * snapshot. Needs the index built with the named columns — unknown
    * columns refuse loudly. */
  def search(q: Array[Float], topK: Int,
             eqFilter: Seq[(String, Any)] = Nil): Seq[(AnyRef, Double)] = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    require(q.length == dim, s"vector dimension mismatch: expected $dim, got ${q.length}")
    val qw = LocalBinIndex.toWords(
      org.apache.spark.sql.graft.BinEncode.pack(q, thresholds))
    val n = ids.length
    // the predicate compiles (and an unknown column REFUSES) even when the
    // store is empty — never a silently-unfiltered answer
    val pred: Int => Boolean = if (eqFilter.isEmpty) null else meta.predicate(eqFilter)
    if (n == 0) return Seq.empty
    val per = math.max(1, (n + stripes - 1) / stripes)
    def scanStripe(s: Long): Array[(AnyRef, Double)] = {
      val start = s.toInt * per
      val end = math.min(n, start + per)
      val heap = LocalTopK.newHeap(topK)
      // integer admission gate: Hamming values are exact ints, so a code
      // can only displace the heap head when acc <= head (ties resolve on
      // id) — no sqrt/rounding window needed
      var gate = Long.MaxValue
      var i = start
      while (i < end) {
        if (pred == null || pred(i)) {
          var acc = 0L; var j = 0; val base = i * w
          while (j < w) {
            acc += java.lang.Long.bitCount(words(base + j) ^ qw(j)); j += 1
          }
          if (acc <= gate) {
            val e = (ids(i), acc.toDouble)
            if (heap.size < topK) {
              heap.add(e)
              if (heap.size == topK) gate = heap.peek()._2.toLong
            } else if (LocalTopK.cmp(e, heap.peek()) < 0) {
              heap.poll(); heap.add(e)
              gate = heap.peek()._2.toLong
            }
          }
        }
        i += 1
      }
      heap.toArray(new Array[(AnyRef, Double)](0))
    }
    val nStripes = math.min(stripes, ((n + per - 1) / per))
    LocalTopK.scanAndMerge((0 until nStripes).map(_.toLong), scanStripe, topK)
  }

  /** O(changes) refresh — [[LocalIvfIndex.applyChanges]]'s contract on the
    * flat Hamming rung (no cells: one filter-append compaction of the id /
    * packed-word / meta arrays). `struck` = every winner pk; `puts` carry
    * the segment-encoded packed byte code (ceil(dim/8) B, the chain base's
    * thresholds — the sidecar this index already holds). Cost is one
    * O(corpus) pass with no Spark read or re-encode, vs the full reload's
    * snapshot stream. */
  def applyChanges(struck: java.util.Set[AnyRef],
                   puts: Seq[LocalBinIndex.Put]): LocalBinIndex = {
    val specs = meta.specs
    val nb = (dim + 7) >> 3
    puts.foreach { p =>
      require(p.code != null && p.code.length == nb,
        s"put ${p.id}: code is ${if (p.code == null) "null" else s"${p.code.length} B"}, " +
          s"layout needs ceil($dim/8)=$nb")
      require(p.metaValues.length == specs.length,
        s"put ${p.id}: expected ${specs.length} meta values, got ${p.metaValues.length}")
    }
    if (struck.isEmpty && puts.isEmpty) return this
    val keep = Array.newBuilder[Int]
    var i = 0
    while (i < ids.length) {
      if (!struck.contains(ids(i))) keep += i
      i += 1
    }
    val kept = keep.result()
    if (kept.length == ids.length && puts.isEmpty) return this
    val n = kept.length + puts.length
    val ids2 = new Array[AnyRef](n)
    val words2 = new Array[Long](n * w)
    var r = 0
    while (r < kept.length) {
      ids2(r) = ids(kept(r))
      System.arraycopy(words, kept(r) * w, words2, r * w, w)
      r += 1
    }
    puts.zipWithIndex.foreach { case (p, k) =>
      ids2(kept.length + k) = p.id
      System.arraycopy(LocalBinIndex.toWords(p.code), 0,
        words2, (kept.length + k) * w, w)
    }
    val meta2 =
      if (specs.isEmpty) meta
      else {
        val mb = new LocalMeta.Builder(specs)
        kept.foreach(r2 => mb.add(meta.valuesAt(r2)))
        puts.foreach(p => mb.add(p.metaValues))
        mb.result()
      }
    new LocalBinIndex(ids2, words2, meta2, dim, thresholds, stripes)
  }
}

object LocalBinIndex {

  /** One put winner for [[LocalBinIndex.applyChanges]]: pk, the packed
    * ceil(dim/8)-byte sign code in THIS layout's thresholds, and
    * filter-column values aligned with the index's name-sorted
    * [[LocalMeta.specs]]. */
  case class Put(id: AnyRef, code: Array[Byte], metaValues: Seq[Any])

  private[ann] def wordsPerVec(dim: Int): Int = (((dim + 7) >> 3) + 7) >> 3

  /** Byte codes (MSB-first, BinEncode layout) → big-endian long words,
    * zero-padded — identical padding both sides, so tail bits never
    * contribute to the XOR. */
  private[ann] def toWords(code: Array[Byte]): Array[Long] = {
    val w = (code.length + 7) >> 3
    val out = new Array[Long](w)
    var i = 0
    while (i < code.length) {
      out(i >> 3) |= (code(i) & 0xFFL) << ((7 - (i & 7)) << 3)
      i += 1
    }
    out
  }

  /** Build from a flushed binary snapshot's (id, packedCode) columns + the
    * threshold sidecar — via [[LocalLoad.boundedIterator]] (small inputs
    * collect in one parallel job; large ones stream so the transient
    * footprint is one partition). `stripes` bounds the scan fan-out
    * (default: the common-pool parallelism). `metaCols` = (columnName,
    * declared fieldType) pairs loaded as typed arrays ([[LocalMeta]]) for
    * [[LocalBinIndex.search]]'s conjunctive-EQ filter. */
  def fromCodes(snapshot: DataFrame, idCol: String, codeCol: String,
                dim: Int, thresholds: Array[Double],
                stripes: Int = Runtime.getRuntime.availableProcessors(),
                metaCols: Seq[(String, String)] = Nil): LocalBinIndex = {
    require(thresholds.length == dim,
      s"thresholds dimension mismatch: ${thresholds.length} vs $dim")
    require(stripes >= 1, "stripes must be >= 1")
    val nb = (dim + 7) >> 3
    val w = wordsPerVec(dim)
    val idsB = scala.collection.mutable.ArrayBuilder.make[AnyRef]
    val wordsB = scala.collection.mutable.ArrayBuilder.make[Long]
    val metaB = new LocalMeta.Builder(metaCols)
    val it = LocalLoad.boundedIterator(snapshot.select(col(idCol) +: col(codeCol) +:
      metaCols.map { case (n, _) => col(n) }: _*))
    while (it.hasNext) {
      val r = it.next()
      val code = r.getAs[Array[Byte]](1)
      require(code.length == nb, s"code length ${code.length} != ceil($dim/8)=$nb")
      idsB += r.get(0).asInstanceOf[AnyRef]
      val cw = toWords(code)
      var j = 0
      while (j < w) { wordsB += cw(j); j += 1 }
      if (metaCols.nonEmpty) metaB.add(metaCols.indices.map(j2 => r.get(2 + j2)))
    }
    new LocalBinIndex(idsB.result(), wordsB.result(), metaB.result(), dim,
      thresholds, stripes)
  }
}
