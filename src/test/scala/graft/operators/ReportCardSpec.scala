package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.TestSession

/** q76 pinned against a driver-side sequential recomputation: sort each
  * source's token counts and take the nearest-rank elements directly —
  * the histogram formulation must select exactly the same values. */
class ReportCardSpec extends AnyFunSuite {
  import TestSession.spark

  test("q76 histogram percentiles equal the sorted nearest-rank") {
    val out = ReportCard.q76SourceReport(spark, TestSession.sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getInt(2), r.getInt(3), r.getLong(4))).toMap
    val docs = graft.Tables.documents(spark, TestSession.sf)
      .select(col("source"), size(split(col("text"), " ")).as("nt"))
      .collect().map(r => (r.getString(0), r.getInt(1)))
    assert(out.nonEmpty && docs.nonEmpty)
    docs.groupBy(_._1).foreach { case (src, rows) =>
      val sorted = rows.map(_._2).sorted
      val n = sorted.length
      def nearest(p: Int): Int = sorted(((p * n + 99) / 100) - 1)
      val (nDocs, p50, p90, qpct) = out(src)
      assert(nDocs == n.toLong, s"$src n_docs")
      assert(p50 == nearest(50), s"$src p50: $p50 vs ${nearest(50)}")
      assert(p90 == nearest(90), s"$src p90: $p90 vs ${nearest(90)}")
      assert(qpct >= 0 && qpct <= 100)
    }
  }
}
