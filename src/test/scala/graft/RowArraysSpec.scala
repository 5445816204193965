package graft.ann

import scala.collection.mutable.ArrayBuilder

import org.scalatest.funsuite.AnyFunSuite

/** r14: the local-rung loaders bulk-copy Row array columns into primitive
  * builders (one arraycopy instead of a boxed per-element foreach). Pin the
  * copy against the element loop for every Seq shape the Row converters
  * produce — the wrapped-primitive fast paths and the generic fallback. */
class RowArraysSpec extends AnyFunSuite {

  private def viaLoop[T](v: scala.collection.Seq[Float]): Array[Float] = {
    val b = new ArrayBuilder.ofFloat; v.foreach(b += _); b.result()
  }
  private def viaLoopS(v: scala.collection.Seq[Short]): Array[Short] = {
    val b = new ArrayBuilder.ofShort; v.foreach(b += _); b.result()
  }

  private val floats = Array.tabulate(257)(i => i * 0.5f - 3f)
  private val shorts = Array.tabulate(257)(i => (i * 7 - 300).toShort)

  test("appendFloats: every Seq shape equals the element loop, appends after existing content") {
    val shapes: Seq[scala.collection.Seq[Float]] = Seq(
      scala.collection.mutable.ArraySeq.make(floats),
      scala.collection.immutable.ArraySeq.unsafeWrapArray(floats),
      floats.toVector, // generic fallback
      scala.collection.mutable.ArraySeq.make(Array.empty[Float]))
    shapes.foreach { v =>
      val b = new ArrayBuilder.ofFloat
      b += -99f // pre-existing content must survive the bulk append
      RowArrays.appendFloats(v, b)
      assert(b.result().toSeq === (-99f +: viaLoop(v).toSeq))
    }
  }

  test("appendShorts: every Seq shape equals the element loop") {
    val shapes: Seq[scala.collection.Seq[Short]] = Seq(
      scala.collection.mutable.ArraySeq.make(shorts),
      scala.collection.immutable.ArraySeq.unsafeWrapArray(shorts),
      shorts.toVector,
      scala.collection.mutable.ArraySeq.make(Array.empty[Short]))
    shapes.foreach { v =>
      val b = new ArrayBuilder.ofShort
      RowArrays.appendShorts(v, b)
      assert(b.result().toSeq === viaLoopS(v).toSeq)
    }
  }
}
