package graft.operators

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSession

/** The union-merge as-of join is hand-rolled window machinery — pin it
  * against a driver-side reference over adversarial shapes: left rows
  * before any right row (null match), exact timestamp ties (equal ts DOES
  * match), multiple right rows at one ts (greatest id wins), interleaved
  * keys, and right rows with null attributes (carried as-is, never
  * skipped backwards). */
class AsOfSpec extends AnyFunSuite {
  import TestSession.spark
  import spark.implicits._

  private def ts(ms: Long) = new Timestamp(ms)

  test("asofJoin equals a driver-side reference on adversarial shapes") {
    val rnd = new scala.util.Random(41)
    val keys = (0 until 6).map(_.toLong)
    val right = keys.flatMap { k =>
      (0 until 8).map { i =>
        // duplicate timestamps on purpose (i/2): two right rows per ts
        val t = (i / 2) * 100L + k
        (k, ts(t), (k * 1000 + i), if (i % 3 == 0) null else s"v$i")
      }
    }
    val left = keys.flatMap { k =>
      (0 until 12).map { i =>
        val t = rnd.nextInt(500).toLong - 50 // some before every right row
        (k, ts(t), k * 100000 + i)
      }
    }
    val got = AsOf.asofJoin(
        left.toDF("k", "ts", "lid"),
        right.toDF("k", "ts", "rid", "attr"),
        "k", "ts", Seq("rid", "attr"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(2)) ->
        (Option(r.get(3)).map(_.asInstanceOf[Long]), Option(r.getString(4))))
      .toMap
    // driver-side reference: for each left row, the right row with the
    // greatest (ts, rid) among ts <= left.ts
    left.foreach { case (k, lts, lid) =>
      val want = right.filter(r => r._1 == k && !r._2.after(lts))
        .sortBy(r => (r._2.getTime, r._3)).lastOption
      val (gRid, gAttr) = got((k, lid))
      assert(gRid == want.map(_._3), s"k=$k lid=$lid rid")
      assert(gAttr == want.flatMap(r => Option(r._4)), s"k=$k lid=$lid attr")
    }
    assert(got.size == left.size)
  }
}
