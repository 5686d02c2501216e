package graft.operators

import java.nio.file.Files
import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSession

/** The two-phase median is hand-rolled rank machinery (range partitioning,
  * per-partition offsets, broadcast targets) — pin it against a driver-side
  * sort across adversarial shapes: single-row groups, even/odd sizes,
  * all-equal values, heavy duplicates, and group counts far above and below
  * the partition count. */
class MedianPropertySpec extends AnyFunSuite {
  import TestSession.spark
  import spark.implicits._

  /** Write rows as an events.parquet fixture dir (q42 reads the table). */
  private def writeEvents(rows: Seq[(Long, String, Double)]): String = {
    val dir = Files.createTempDirectory("median-prop-").toString
    rows.map { case (id, t, v) =>
      (id, new Timestamp(1735689600000L + id), id % 7, t, v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .repartition(8)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def driverMedians(rows: Seq[(Long, String, Double)]): Map[String, (Double, Long)] =
    rows.groupBy(_._2).map { case (g, rs) =>
      val sorted = rs.sortBy(r => (r._3, r._1)).map(_._3)
      val n = sorted.length
      val lo = (n + 1) / 2 - 1
      val hi = (n + 2) / 2 - 1
      g -> ((sorted(lo) + sorted(hi)) / 2, n.toLong)
    }

  test("q42 construction triggers no job beyond opening the table") {
    val rows = (0 until 4).flatMap(g =>
      (0 until 50).map(i => ((g * 1000 + i).toLong, s"t$g", i.toDouble)))
    val dir = writeEvents(rows)
    @volatile var jobs = 0
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = jobs += 1
    }
    // opening a parquet table costs metadata jobs (footer/schema inference)
    // for EVERY query; the lazy contract is that q42 construction adds no
    // DATA job on top — so measure against a trivially-lazy baseline read.
    def constructionJobs(f: => Unit): Int = {
      jobs = 0; f
      // construction-time jobs are driver-synchronous; the wait is only for
      // the async listener bus to deliver what already happened
      Thread.sleep(500); jobs
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val base = constructionJobs {
        graft.Tables.events(spark, dir).select("event_id"); ()
      }
      var df: org.apache.spark.sql.DataFrame = null
      val mine = constructionJobs { df = Sessions.q42Median(spark, dir) }
      assert(mine <= base,
        s"q42 construction ran $mine job(s), table-open baseline $base — not lazy")
      jobs = 0
      assert(df.collect().nonEmpty)
      var waited = 0
      while (jobs == 0 && waited < 50) { Thread.sleep(100); waited += 1 }
      assert(jobs > 0)
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("two-phase median equals driver-side sort on adversarial group shapes") {
    val rnd = new scala.util.Random(13)
    (0 until 7).foreach { round =>
      val nGroups = Seq(1, 2, 5, 40, 7, 3, 4)(round)
      val rows = (0 until nGroups).flatMap { g =>
        val size = 1 + rnd.nextInt(300)
        val mode = rnd.nextInt(3)
        (0 until size).map { i =>
          val v = mode match {
            case 0 => rnd.nextDouble() * 100       // continuous
            case 1 => 42.0                          // all equal (total ties)
            case 2 => rnd.nextInt(5).toDouble       // heavy duplicates
          }
          // last round: one group is NULL-typed (sorts first — the rank
          // walker must still load its offsets)
          val t = if (round == 6 && g == 0) null else s"type_$g"
          ((g * 100000 + i).toLong, t, math.round(v * 100) / 100.0)
        }
      }
      val dir = writeEvents(rows)
      val got = Sessions.q42Median(spark, dir).collect()
        .map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
      val want = driverMedians(rows)
      assert(got.keySet == want.keySet, s"round $round group set")
      want.foreach { case (g, (med, n)) =>
        assert(got(g)._2 == n, s"round $round $g count")
        assert(got(g)._1 == med, s"round $round $g median")
      }
    }
  }
}
