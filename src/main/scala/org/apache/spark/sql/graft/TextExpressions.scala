// Same private[sql]-visibility rationale as VectorExpressions.scala.
package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

import graft.functions.TextKernels

/** simhash64(tokens): 64-bit SimHash document fingerprint over a token array
  * — near-duplicate detection via Hamming distance on the output. Row-local,
  * codegen'd: one pass over tokens per row, no shuffle. */
case class SimHash64(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def prettyName: String = "simhash64"
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any =
    TextKernels.simhash64(v.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.TextKernels.simhash64($a);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}
