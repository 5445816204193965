package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{col, lit}

/** Composite metadata-filter AST — the engine's equivalent of the reference's
  * `FilterExpression{Single|Composite}` tree (SURVEY.md §2.2 P1/P2,
  * /root/reference/pkg/inverted/filter.go:24-96). Compiles to a Catalyst
  * `Column` so predicate pushdown / parquet row-group pruning replace the
  * reference's roaring-bitmap inverted index (§4: index selection is
  * built-in via dictionary + min/max stats — no custom rule needed).
  */
sealed trait FilterExpr {
  def toColumn: Column
}

object FilterExpr {
  sealed abstract class Op(val sym: String)
  case object Eq extends Op("=")
  case object Neq extends Op("!=")
  case object Gt extends Op(">")
  case object Gte extends Op(">=")
  case object Lt extends Op("<")
  case object Lte extends Op("<=")

  /** One comparison over a typed metadata column (string/long/double/bool —
    * the reference's four value types, §1.3). */
  final case class Single(column: String, op: Op, value: Any) extends FilterExpr {
    // Field names arrive from HTTP clients verbatim: backtick-quote so a
    // dot in a field name stays a LITERAL column reference (bare
    // col("a.b") parses as nested-field access) and an embedded backtick
    // can't break out of the quoting.
    private def c: Column = col(s"`${column.replace("`", "``")}`")
    def toColumn: Column = op match {
      case Eq  => c === lit(value)
      case Neq => c =!= lit(value)
      case Gt  => c > lit(value)
      case Gte => c >= lit(value)
      case Lt  => c < lit(value)
      case Lte => c <= lit(value)
    }
  }

  final case class And(children: Seq[FilterExpr]) extends FilterExpr {
    require(children.nonEmpty, "AND requires at least one child")
    def toColumn: Column = children.map(_.toColumn).reduce(_ && _)
  }
  object And { def apply(cs: FilterExpr*)(implicit d: DummyImplicit): And = And(cs) }

  final case class Or(children: Seq[FilterExpr]) extends FilterExpr {
    require(children.nonEmpty, "OR requires at least one child")
    def toColumn: Column = children.map(_.toColumn).reduce(_ || _)
  }
  object Or { def apply(cs: FilterExpr*)(implicit d: DummyImplicit): Or = Or(cs) }

  /** Flatten `f` into its conjunctive-EQ form — (column, value) terms —
    * when the tree is ANDs of Eq Singles and nothing else; None otherwise.
    * This is the shape the driver-local serving rungs can answer from
    * their typed-array EQ store ([[graft.ann.LocalMeta]]), mirroring the
    * reference's inverted-index EQ fast path
    * (pkg/inverted/search.go:32-46). */
  def conjunctiveEq(f: FilterExpr): Option[Seq[(String, Any)]] = f match {
    case Single(c, Eq, v) => Some(Seq(c -> v))
    case And(cs) =>
      val parts = cs.map(conjunctiveEq)
      if (parts.forall(_.isDefined)) Some(parts.flatMap(_.get)) else None
    case _ => None
  }
}
