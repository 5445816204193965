package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.FilterExpr

/** Schema-less (core v3) metadata compatibility.
  *
  * The reference's core engine takes arbitrary `google.protobuf.Struct`
  * metadata and coerces every value to a string before indexing
  * (`forcedStringTypeChanger`, /root/reference/pkg/index/bitmap_index.go:48-63);
  * the user id travels under the magic `_id` key
  * (/root/reference/core/core.go:506,601,677). The Spark mapping (SURVEY.md
  * §1.2/§1.4) is a `map<string,string>` column — this object provides the
  * ingest shim and the two filter shapes of the v3 API:
  *
  *  - [[pureFilter]]: conjunctive equality over map entries — the v3
  *    `map<string,string>` filter (P4, pkg/index/search.go:48-72).
  *  - [[compare]]: single-key comparison with OPTIONAL numeric coercion.
  *    The reference compares `"5" < 7` by parsing strings into numbers
  *    (cross-type matrix, pkg/inverted/bitmap_index.go:99-356). That
  *    behavior is deliberately behind `numericCoercion` (default ON for
  *    parity): with it off, comparisons are plain lexicographic — the
  *    documented divergence choice is that we implement the parse-compare
  *    matrix but make it switchable, because lexicographic `"10" < "9"`
  *    vs numeric `10 > 9` silently flip results (CoreMetaSpec pins both).
  *
  * Scale: everything here is row-local map/expression logic — filters
  * compile to Columns, so Catalyst still pushes the enclosing scan's
  * pruning; no shuffle is introduced.
  */
object CoreMeta {
  /** Magic user-id key (core/core.go:506). */
  val IdKey = "_id"

  private val NumPattern = "^[+-]?((\\d+(\\.\\d*)?)|(\\.\\d+))([eE][+-]?\\d+)?$"

  /** Ingest shim: fold typed columns into a string-coerced
    * `map<string,string>` metadata column (with `_id` from `idCol`),
    * mirroring forcedStringTypeChanger. Booleans become "true"/"false",
    * numbers their canonical string rendering. */
  def withMeta(df: DataFrame, idCol: Column, keys: Seq[String],
               metaCol: String = "meta"): DataFrame = {
    val entries: Seq[Column] =
      Seq(lit(IdKey), idCol.cast("string")) ++
        keys.flatMap(k => Seq(lit(k), col(k).cast("string")))
    df.withColumn(metaCol, map(entries: _*))
  }

  /** v3 PureSearch filter: conjunctive equality over map entries (P4). */
  def pureFilter(meta: Column, filters: Map[String, String]): Column =
    filters.map { case (k, v) => element_at(meta, k) === lit(v) }
      .reduceOption(_ && _).getOrElse(lit(true))

  /** Single-key comparison over string-coerced metadata. With
    * `numericCoercion` both sides that parse as numbers compare
    * numerically (reference parity); otherwise, and for non-numeric
    * values, comparison is lexicographic. Missing keys yield null →
    * filtered out, matching the bitmap index (absent key = no postings). */
  def compare(meta: Column, key: String, op: FilterExpr.Op, value: String,
              numericCoercion: Boolean = true): Column = {
    val v = element_at(meta, key)
    val strCmp = applyOp(v, lit(value), op)
    val litNum = value.matches(NumPattern)
    if (!numericCoercion || !litNum) strCmp
    else {
      // rlike-gated cast: never throws under ANSI, null when non-numeric
      val vd = when(v.rlike(NumPattern), v.cast("double"))
      when(vd.isNotNull, applyOp(vd, lit(value.toDouble), op)).otherwise(strCmp)
    }
  }

  /** Compile a composite [[FilterExpr]] tree against schema-less storage:
    * `_id` comparisons hit the dedicated id column, everything else goes
    * through the string-coerced map with [[compare]] semantics. This is how
    * a core-mode collection evaluates the same filter AST the typed (edge)
    * collections use. */
  def filterColumn(meta: Column, idCol: Column, f: FilterExpr,
                   numericCoercion: Boolean = true): Column = f match {
    case FilterExpr.Single(c, op, v) if c == IdKey => applyOp(idCol, lit(v.toString), op)
    case FilterExpr.Single(c, op, v) => compare(meta, c, op, v.toString, numericCoercion)
    case FilterExpr.And(cs) => cs.map(filterColumn(meta, idCol, _, numericCoercion)).reduce(_ && _)
    case FilterExpr.Or(cs)  => cs.map(filterColumn(meta, idCol, _, numericCoercion)).reduce(_ || _)
  }

  private def applyOp(a: Column, b: Column, op: FilterExpr.Op): Column = {
    import FilterExpr._
    op match {
      case Eq  => a === b
      case Neq => a =!= b
      case Gt  => a > b
      case Gte => a >= b
      case Lt  => a < b
      case Lte => a <= b
    }
  }
}
