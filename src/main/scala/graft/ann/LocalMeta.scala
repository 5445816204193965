package graft.ann

/** Typed, driver-resident metadata columns for the local serving rungs'
  * conjunctive-EQ filter fast path — the reference's most common filtered
  * search shape (/root/reference/pkg/inverted/search.go:32-46: the EQ
  * branch short-circuits into a direct posting-list lookup; everything
  * else walks the comparator path). On this side the local rungs hold the
  * declared columns as PRIMITIVE parallel arrays (long/double/boolean
  * values + a null mask; strings as an object array, null-as-absent), so
  * an EQ probe compiles to one primitive comparison per scanned row — no
  * boxing, no per-row dispatch beyond a monomorphic lambda call.
  *
  * Memory: 8-9 bytes/row per numeric column, ~1 bit-per-flag rounded to a
  * byte — at 1M rows with two filterable columns that is ~18 MB next to
  * the 512 MB the float vectors already cost, so declaring every scalar
  * column filterable is the sane default for a serving node.
  *
  * Semantics contract (must match the distributed pre-filter,
  * `FilterExpr.Single(c, Eq, v).toColumn` under SQL null rules): a NULL
  * metadata value never satisfies an EQ, numeric comparisons widen to the
  * column's type (a Double probe on a long column matches only integral
  * values), and a probe whose TYPE cannot compare to the column refuses
  * loudly — a silently-false (or silently-unfiltered) answer is the one
  * outcome a serving rung must never produce.
  */
final class LocalMeta private (cols: Map[String, LocalMeta.Col]) extends Serializable {

  def columns: Set[String] = cols.keySet
  def isEmpty: Boolean = cols.isEmpty

  @transient private lazy val sortedCols: Seq[(String, LocalMeta.Col)] =
    cols.toSeq.sortBy(_._1)

  /** The built (column, fieldType) spec in a DETERMINISTIC (name-sorted)
    * order — the contract for [[valuesAt]] and for the value order an
    * incremental refresh must supply puts in ([[Builder]] built with this
    * spec accepts exactly [[valuesAt]]'s row shape). */
  private[ann] def specs: Seq[(String, String)] =
    sortedCols.map { case (n, c) => (n, c.kind) }

  /** Row `i`'s values aligned with [[specs]] (null for a null slot) — the
    * read-back seam the incremental cell rebuild uses to re-feed a
    * [[Builder]] without keeping the source rows around. */
  private[ann] def valuesAt(i: Int): Seq[Any] =
    sortedCols.map(_._2.valueAt(i))

  /** Compile a conjunctive-EQ filter into a row predicate over this store.
    * Unknown column or incomparable probe type → IllegalArgumentException
    * at compile time (once per request), never a wrong scan. */
  def predicate(eq: Seq[(String, Any)]): Int => Boolean = {
    require(eq.nonEmpty, "empty EQ filter — call the unfiltered path")
    val tests: Array[Int => Boolean] = eq.map { case (name, v) =>
      cols.getOrElse(name, throw new IllegalArgumentException(
        s"column '$name' is not loaded in this local index — filterable " +
          s"columns: ${if (cols.isEmpty) "(none; rebuild the index with filterColumns)"
          else cols.keys.toSeq.sorted.mkString(", ")}")).eqTest(name, v)
    }.toArray
    if (tests.length == 1) tests(0)
    else i => { var j = 0; var ok = true
      while (ok && j < tests.length) { ok = tests(j)(i); j += 1 }; ok }
  }
}

object LocalMeta {

  val Empty = new LocalMeta(Map.empty)

  private def badProbe(name: String, v: Any, colKind: String): Nothing =
    throw new IllegalArgumentException(
      s"EQ probe on column '$name' ($colKind): value " +
        s"${if (v == null) "NULL" else s"'$v' (${v.getClass.getSimpleName})"} " +
        "cannot compare to this column type")

  sealed trait Col extends Serializable {
    /** A per-row EQ test for probe value `v`; throws on incomparable types. */
    def eqTest(name: String, v: Any): Int => Boolean
    /** Declared field type this column was built as ([[LocalMeta.specs]]). */
    def kind: String
    /** Row `i`'s value (null when the slot is null) — [[LocalMeta.valuesAt]]. */
    def valueAt(i: Int): Any
  }

  private final class LongCol(vals: Array[Long], nulls: Array[Boolean]) extends Col {
    def kind = "integer"
    def valueAt(i: Int): Any = if (nulls(i)) null else vals(i)
    def eqTest(name: String, v: Any): Int => Boolean = v match {
      case n: Long    => i => !nulls(i) && vals(i) == n
      case n: Int     => val x = n.toLong; i => !nulls(i) && vals(i) == x
      case n: Short   => val x = n.toLong; i => !nulls(i) && vals(i) == x
      case n: Double  => i => !nulls(i) && vals(i).toDouble == n
      case n: Float   => val x = n.toDouble; i => !nulls(i) && vals(i).toDouble == x
      case other      => badProbe(name, other, "integer")
    }
  }

  private final class DoubleCol(vals: Array[Double], nulls: Array[Boolean]) extends Col {
    def kind = "float"
    def valueAt(i: Int): Any = if (nulls(i)) null else vals(i)
    // Spark SQL's EqualTo on doubles: NaN = NaN is TRUE (and -0.0 = 0.0 is
    // TRUE, which IEEE == already gives) — `eqD` mirrors both so a NaN
    // metadata row filters identically on the local and distributed rungs
    private def eqD(a: Double, b: Double): Boolean =
      a == b || (a != a && b != b)
    def eqTest(name: String, v: Any): Int => Boolean = v match {
      case n: Double  => i => !nulls(i) && eqD(vals(i), n)
      case n: Float   => val x = n.toDouble; i => !nulls(i) && eqD(vals(i), x)
      case n: Long    => val x = n.toDouble; i => !nulls(i) && vals(i) == x
      case n: Int     => val x = n.toDouble; i => !nulls(i) && vals(i) == x
      case other      => badProbe(name, other, "float")
    }
  }

  private final class BoolCol(vals: Array[Boolean], nulls: Array[Boolean]) extends Col {
    def kind = "boolean"
    def valueAt(i: Int): Any = if (nulls(i)) null else vals(i)
    def eqTest(name: String, v: Any): Int => Boolean = v match {
      case b: Boolean => i => !nulls(i) && vals(i) == b
      case other      => badProbe(name, other, "boolean")
    }
  }

  private final class StrCol(vals: Array[String]) extends Col {
    def kind = "string"
    def valueAt(i: Int): Any = vals(i)
    def eqTest(name: String, v: Any): Int => Boolean = v match {
      case s: String => i => s.equals(vals(i)) // null slot → false
      case other     => badProbe(name, other, "string")
    }
  }

  /** Streaming builder: `specs` are (columnName, declared fieldType) in the
    * exact order the values arrive per row ([[add]]). */
  final class Builder(specs: Seq[(String, String)]) {
    specs.foreach { case (n, t) =>
      require(Set("integer", "float", "string", "boolean")(t),
        s"column '$n': field type '$t' has no local-EQ representation") }
    private val longs = Array.fill(specs.count(_._2 == "integer"))(
      new scala.collection.mutable.ArrayBuilder.ofLong)
    private val doubles = Array.fill(specs.count(_._2 == "float"))(
      new scala.collection.mutable.ArrayBuilder.ofDouble)
    private val bools = Array.fill(specs.count(_._2 == "boolean"))(
      new scala.collection.mutable.ArrayBuilder.ofBoolean)
    private val strs = Array.fill(specs.count(_._2 == "string"))(
      scala.collection.mutable.ArrayBuilder.make[String])
    private val nullMasks = specs.map { case (_, t) =>
      if (t == "string") null else new scala.collection.mutable.ArrayBuilder.ofBoolean }
    // per-spec slot inside its typed pool
    private val slot: Array[Int] = {
      var li = 0; var di = 0; var bi = 0; var si = 0
      specs.map {
        case (_, "integer") => val s = li; li += 1; s
        case (_, "float")   => val s = di; di += 1; s
        case (_, "boolean") => val s = bi; bi += 1; s
        case (_, _)         => val s = si; si += 1; s
      }.toArray
    }

    /** Append one row's values, aligned with `specs` (nulls allowed). */
    def add(values: Seq[Any]): Unit = {
      require(values.length == specs.length,
        s"expected ${specs.length} values, got ${values.length}")
      var j = 0
      while (j < specs.length) {
        val v = values(j)
        specs(j)._2 match {
          case "integer" =>
            longs(slot(j)) += (v match {
              case null => 0L
              case n: Long => n case n: Int => n.toLong case n: Short => n.toLong
              case other => throw new IllegalArgumentException(
                s"column '${specs(j)._1}': expected integer, got $other") })
            nullMasks(j) += (v == null)
          case "float" =>
            doubles(slot(j)) += (v match {
              case null => 0.0
              case n: Double => n case n: Float => n.toDouble
              case other => throw new IllegalArgumentException(
                s"column '${specs(j)._1}': expected float, got $other") })
            nullMasks(j) += (v == null)
          case "boolean" =>
            bools(slot(j)) += (v match {
              case null => false
              case b: Boolean => b
              case other => throw new IllegalArgumentException(
                s"column '${specs(j)._1}': expected boolean, got $other") })
            nullMasks(j) += (v == null)
          case _ =>
            strs(slot(j)) += (v match {
              case null => null
              case s: String => s
              case other => throw new IllegalArgumentException(
                s"column '${specs(j)._1}': expected string, got $other") })
        }
        j += 1
      }
    }

    def result(): LocalMeta =
      if (specs.isEmpty) Empty
      else new LocalMeta(specs.zipWithIndex.map { case ((n, t), j) =>
        val c: Col = t match {
          case "integer" => new LongCol(longs(slot(j)).result(), nullMasks(j).result())
          case "float"   => new DoubleCol(doubles(slot(j)).result(), nullMasks(j).result())
          case "boolean" => new BoolCol(bools(slot(j)).result(), nullMasks(j).result())
          case _         => new StrCol(strs(slot(j)).result())
        }
        n -> c
      }.toMap)
  }
}
