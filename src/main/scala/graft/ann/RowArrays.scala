package graft.ann

import scala.collection.mutable.ArrayBuilder

/** r14: bulk-copy Spark Row array columns into primitive builders.
  *
  * Dataset rows surface `array<float>` / `array<short>` as an ArraySeq
  * (mutable or immutable, per converter path) over a primitive array; the
  * element-wise `v.foreach(b += _)` decode boxed every element
  * (`Function1` is not specialized for Short/Byte, and ArraySeq's generic
  * `foreach` boxes even Float) — the dominant cost of the driver-local
  * rung loads (multi_local_load_1m streams 1M rows × 2×128 values through
  * it). The wrapped primitive array is copied with one System.arraycopy
  * instead; any other Seq shape (defensive) keeps the element loop. */
private[ann] object RowArrays {
  def appendFloats(v: scala.collection.Seq[Float], b: ArrayBuilder.ofFloat): Unit = v match {
    case w: scala.collection.mutable.ArraySeq.ofFloat =>
      b.addAll(w.array, 0, w.array.length)
    case w: scala.collection.immutable.ArraySeq.ofFloat =>
      b.addAll(w.unsafeArray, 0, w.unsafeArray.length)
    case _ => v.foreach(b += _)
  }
  def appendShorts(v: scala.collection.Seq[Short], b: ArrayBuilder.ofShort): Unit = v match {
    case w: scala.collection.mutable.ArraySeq.ofShort =>
      b.addAll(w.array, 0, w.array.length)
    case w: scala.collection.immutable.ArraySeq.ofShort =>
      b.addAll(w.unsafeArray, 0, w.unsafeArray.length)
    case _ => v.foreach(b += _)
  }
}
