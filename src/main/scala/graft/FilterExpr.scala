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
    def toColumn: Column = op match {
      case Eq  => col(column) === lit(value)
      case Neq => col(column) =!= lit(value)
      case Gt  => col(column) > lit(value)
      case Gte => col(column) >= lit(value)
      case Lt  => col(column) < lit(value)
      case Lte => col(column) <= lit(value)
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
}
