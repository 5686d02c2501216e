package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.TestSession

/** q77/q78 pinned against driver-side sequential replays of the same
  * event log: the funnel's per-user first-occurrence chain and the
  * retention distinct-week sets are both recomputed in plain Scala and
  * must match the distributed plans exactly. */
class FunnelSpec extends AnyFunSuite {
  import TestSession.spark

  private def events: Array[(Long, String, Long)] =
    graft.Tables.events(spark, TestSession.sf)
      .select(col("user_id"), col("event_type"), expr("unix_millis(ts)").as("ms"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))

  test("q77 equals the sequential first-occurrence chain; steps shrink") {
    val out = Funnel.q77Funnel(spark, TestSession.sf).collect()
      .map(r => r.getInt(0) -> r.getLong(2)).toMap
    val byUser = events.groupBy(_._1)
    var (nv, nc, np) = (0L, 0L, 0L)
    byUser.values.foreach { evs =>
      def firstAfter(tpe: String, lo: Long, hi: Long): Option[Long] =
        evs.filter(e => e._2 == tpe && e._3 > lo && e._3 <= hi)
          .map(_._3).sorted.headOption
      val tv = evs.filter(_._2 == "view").map(_._3).sorted.headOption
      tv.foreach { v =>
        nv += 1
        firstAfter("click", v, v + Funnel.StepWindowMs).foreach { c =>
          nc += 1
          firstAfter("purchase", c, c + Funnel.StepWindowMs).foreach(_ => np += 1)
        }
      }
    }
    assert(out(1) == nv && out(2) == nc && out(3) == np,
      s"got ${out.toSeq.sorted}, sequential says ($nv, $nc, $np)")
    assert(out(1) >= out(2) && out(2) >= out(3) && out(3) > 0)
  }

  test("q78 equals the sequential distinct-week replay; week 0 is everyone") {
    val out = Funnel.q78Retention(spark, TestSession.sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byUser = events.groupBy(_._1).view.mapValues(_.map(_._3 / 86400000L))
    val want = byUser.toSeq.flatMap { case (u, days) =>
      val d0 = days.min
      days.map(d => (u, (d - d0) / 7)).distinct
    }.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    assert(out.map(r => r._1 -> r._2).toMap == want)
    val total = byUser.size.toLong
    assert(out.find(_._1 == 0L).get._2 == total, "week 0 must contain every user")
    out.foreach { case (_, n, pct) => assert(pct == 100 * n / total) }
  }
}
