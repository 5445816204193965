package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession

/** Public doorway to `classic.SparkSession.cloneSession()` (private[sql]) —
  * the engine's conf-scoping discipline (r15, r14 VERDICT #8): code that
  * needs temporary conf values (loop-sized shuffle partitions, scoped AQE,
  * replay checkpoint settings) runs on a clone instead of mutating the
  * shared session and restoring in a finally, so concurrent queries on the
  * shared session can never observe the scoped values. The clone shares the
  * SparkContext, the cache manager, and (a copy of) the session state; it is
  * discarded with the scope. */
object Sessions {
  def cloneSession(s: SparkSession): SparkSession =
    s.asInstanceOf[org.apache.spark.sql.classic.SparkSession].cloneSession()
}
