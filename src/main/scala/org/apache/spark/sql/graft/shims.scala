package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge into `private[sql]` surface — the standard pattern Spark
  * extension libraries use to wrap a custom Catalyst [[Expression]] in a
  * public [[Column]] (Spark 4 moved Column onto ColumnNode; the classic
  * converter lives behind `private[sql]`). This is the ONLY file outside
  * the `graft` namespace; it contains no logic.
  */
object shims {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
  /** Stable per-session id (`private[sql]` on classic SparkSession) — a
    * memo key that, unlike `System.identityHashCode`, is never reused
    * after the session is collected. */
  def sessionUUID(s: SparkSession): String =
    s.asInstanceOf[org.apache.spark.sql.classic.SparkSession].sessionUUID
  /** Number of plans the CacheManager currently holds — the bench's
    * between-query audit that every live persist has an owner (the field
    * is `private`, so this one read goes through reflection). Returns -1
    * when the reflective read fails (a Spark minor bump renaming the
    * private member must degrade the DIAGNOSTIC, not crash the bench —
    * r12 advisor finding); callers treat -1 as "audit unavailable". */
  def cachedPlanCount(s: SparkSession): Int =
    try {
      val cm = s.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
        .sharedState.cacheManager
      val m = cm.getClass.getDeclaredMethod("cachedData")
      m.setAccessible(true)
      m.invoke(cm).asInstanceOf[scala.collection.Seq[_]].size
    } catch { case _: Throwable => -1 }
}
