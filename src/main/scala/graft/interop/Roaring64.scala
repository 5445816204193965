package graft.interop

import java.io.ByteArrayOutputStream

import scala.collection.mutable

/** Minimal ENCODER for the public Roaring bitmap interchange format
  * (RoaringFormatSpec, github.com/RoaringBitmap/RoaringFormatSpec — the
  * format the reference's inverted index persists through roaring64
  * `ToBytes`, pkg/inverted/save.go:165): the 64-bit portable layout is a
  * little-endian u64 bucket count, then per ascending high-32-bit bucket a
  * u32 key and a standard 32-bit portable bitmap of the low words.
  *
  * The 32-bit portable layout written here is the no-run-container form:
  * u32 cookie 12346 (SERIAL_COOKIE_NO_RUNCONTAINER), u32 container count,
  * a descriptive header (u16 high-16 key + u16 cardinality−1 per
  * container), an offset header (u32 byte position of each container from
  * the start of this bitmap's serialization — mandatory with this cookie),
  * then the containers: sorted u16 arrays at cardinality ≤ 4096, 1024-word
  * u64 bitsets above. Run containers are an encoder OPTIMIZATION the spec
  * never requires a writer to emit, so omitting them keeps every reader
  * compatible. Everything little-endian except nothing — this format is LE
  * throughout (the surrounding inverted-index framing mixes in BE value
  * payloads, but that is [[ColttExport]]'s layer).
  *
  * Decoding is deliberately NOT here: the spec-conformance check lives in
  * the test suite as an independently written decoder, so the two sides
  * cannot share a mistaken reading of the spec. */
private[graft] object Roaring64 {

  private val NoRunCookie = 12346

  /** Serialize ascending-unsigned-sorted distinct u64 values. */
  def serialize(sorted: Array[Long]): Array[Byte] = {
    var i = 1
    while (i < sorted.length) {
      require(java.lang.Long.compareUnsigned(sorted(i - 1), sorted(i)) < 0,
        "values must be strictly ascending (unsigned)")
      i += 1
    }
    val out = new ByteArrayOutputStream()
    // bucket by high 32 bits (input sorted → buckets contiguous, ascending)
    val buckets = mutable.ArrayBuffer.empty[(Int, Array[Int])]
    var s = 0
    while (s < sorted.length) {
      val high = (sorted(s) >>> 32).toInt
      var e = s
      while (e < sorted.length && (sorted(e) >>> 32).toInt == high) e += 1
      buckets += ((high, sorted.slice(s, e).map(v => (v & 0xFFFFFFFFL).toInt)))
      s = e
    }
    writeLongLE(out, buckets.length.toLong)
    buckets.foreach { case (high, lows) =>
      writeIntLE(out, high)
      out.write(serialize32(lows))
    }
    out.toByteArray
  }

  /** Serialize ascending-unsigned-sorted distinct u32 values (as Ints). */
  def serialize32(sorted: Array[Int]): Array[Byte] = {
    // containers by high 16 bits, ascending; values are each container's low u16s
    val containers = mutable.ArrayBuffer.empty[(Int, Array[Int])]
    var s = 0
    while (s < sorted.length) {
      val key = sorted(s) >>> 16
      var e = s
      while (e < sorted.length && (sorted(e) >>> 16) == key) e += 1
      containers += ((key, sorted.slice(s, e).map(_ & 0xFFFF)))
      s = e
    }
    val out = new ByteArrayOutputStream()
    writeIntLE(out, NoRunCookie)
    writeIntLE(out, containers.length)
    containers.foreach { case (key, vals) =>
      writeShortLE(out, key)
      writeShortLE(out, vals.length - 1) // cardinality − 1
    }
    // offset header: container byte positions from the start of this bitmap
    var pos = 4 + 4 + 4 * containers.length + 4 * containers.length
    containers.foreach { case (_, vals) =>
      writeIntLE(out, pos)
      pos += (if (vals.length <= 4096) 2 * vals.length else 8192)
    }
    containers.foreach { case (_, vals) =>
      if (vals.length <= 4096) vals.foreach(writeShortLE(out, _))
      else {
        val words = new Array[Long](1024)
        vals.foreach(v => words(v >>> 6) |= 1L << (v & 63))
        words.foreach(writeLongLE(out, _))
      }
    }
    out.toByteArray
  }

  private def writeShortLE(out: ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xFF); out.write((v >>> 8) & 0xFF)
  }
  private def writeIntLE(out: ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xFF); out.write((v >>> 8) & 0xFF)
    out.write((v >>> 16) & 0xFF); out.write((v >>> 24) & 0xFF)
  }
  private def writeLongLE(out: ByteArrayOutputStream, v: Long): Unit = {
    var i = 0
    while (i < 8) { out.write(((v >>> (8 * i)) & 0xFF).toInt); i += 1 }
  }
}
