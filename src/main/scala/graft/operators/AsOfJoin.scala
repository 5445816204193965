package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: attach to each left row the LATEST right row with the same
  * key whose timestamp is ≤ the left row's timestamp — the feature-store /
  * training-pipeline alignment primitive (join events to the newest prior
  * profile, model, or dictionary snapshot). Inclusive on equal timestamps,
  * matching DuckDB's `ASOF JOIN` (the oracle for `events_asof_join`).
  *
  * Spark-first shape: NOT a (key = key AND ts ≥ ts) theta-join — that
  * either explodes the range or degenerates to per-key nested loops.
  * Instead both sides are tagged and unioned, shuffled ONCE on the key,
  * and a running `last(right payload, ignoreNulls)` window over
  * (ts asc, right-before-left on ties) hands every left row its most
  * recent right payload. One hash shuffle + one in-partition sort —
  * linear in total rows, skew-bounded by the key's own cardinality, and
  * it survives a 100× scale-up exactly like any windowed aggregation.
  *
  * Contract: `right`'s payload column names (everything except
  * `keyCol`/`tsCol`) must not collide with left column names; right rows
  * must be unique per (key, ts) — pre-aggregate if not (the query does).
  * Left rows with no prior right row get null payload columns (left join
  * semantics).
  */
object AsOfJoin {

  def join(left: DataFrame, right: DataFrame,
           keyCol: String, tsCol: String): DataFrame = {
    val rightPayload = right.columns.filterNot(c => c == keyCol || c == tsCol).toSeq
    require(rightPayload.nonEmpty, "right side has no payload columns")
    val collisions = rightPayload.toSet & left.columns.toSet
    require(collisions.isEmpty, s"column collision between sides: $collisions")
    val leftPayload = left.columns.filterNot(c => c == keyCol || c == tsCol).toSeq

    val lSide = left.select(
      col(keyCol), col(tsCol), lit(1).as("__side"),
      struct(leftPayload.map(col): _*).as("__lp"),
      lit(null).cast(org.apache.spark.sql.types.StructType(
        right.select(rightPayload.map(col): _*).schema.fields)).as("__rp"))
    val rSide = right.select(
      col(keyCol), col(tsCol), lit(0).as("__side"),
      lit(null).cast(lSide.schema("__lp").dataType).as("__lp"),
      struct(rightPayload.map(col): _*).as("__rp"))

    // rights sort before lefts on equal ts (side 0 < 1) → inclusive ≤
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lSide.unionByName(rSide)
      .withColumn("__rlast", last(col("__rp"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select(col(keyCol) +: col(tsCol) +:
        leftPayload.map(c => col(s"__lp.$c").as(c)) ++:
        rightPayload.map(c => col(s"__rlast.$c").as(c)): _*)
  }
}
