package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSession

/** q85 pinned against a sequential replay over raw token counts, plus
  * the plan contract its scale story rests on: the top-50 must plan as
  * TakeOrdered (distributed heaps), never a vocab-sized Window.
  */
class DriftSpec extends AnyFunSuite {
  import TestSession.spark

  test("q85 equals a sequential replay over raw token counts") {
    val toks = graft.Tables.documents(spark, TestSession.sf)
      .select((col("doc_id") % 2).as("half"),
        explode(split(col("text"), " ")).as("tok"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val tot = toks.groupBy(_._1).map { case (h, ts) => h -> ts.length.toLong }
    val cnt = toks.groupBy(identity).map { case ((h, t), occ) => (h, t) -> occ.length.toLong }
    val vocab = cnt.keys.map(_._2).toSeq.distinct

    val expected = vocab.map { t =>
      val co = cnt.getOrElse((0L, t), 0L); val cn = cnt.getOrElse((1L, t), 0L)
      val po = if (co == 0) 0L else 1000000L * co / tot(0L)
      val pn = if (cn == 0) 0L else 1000000L * cn / tot(1L)
      (t, co, cn, po, pn, pn - po)
    }.filter { case (_, co, cn, _, _, _) => co + cn >= Drift.MinCount }
      .sortBy { case (t, _, _, _, _, d) => (-math.abs(d), t) }
      .take(Drift.TopK)

    val got = Drift.q85DriftReport(spark, TestSession.sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(got == expected.toSeq)
  }

  test("q85 plans TakeOrdered, not a global Window") {
    val plan = Drift.q85DriftReport(spark, TestSession.sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrdered"), "top-k must plan as TakeOrdered")
    assert(!plan.contains("Window"), "no window belongs in this plan")
  }
}
