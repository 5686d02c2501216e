package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSession}

/** Stream-stream inner join with watermark-bounded state: signups joined to
  * the same user's purchases within 7 days, fed out of order over two
  * micro-batches — must equal the batch join on the same rows. Watermarks
  * on BOTH sides let Spark evict join state (the unbounded-state trap of
  * stream-stream joins); inner-join matches emit as soon as both sides are
  * present, so processAllAvailable sees the complete result. */
class StreamJoinSpec extends AnyFunSuite {
  import TestSession.spark
  import spark.implicits._

  test("watermarked stream-stream join equals the batch join") {
    val events = Tables.events(spark, TestSession.sf)
      .select($"event_id", $"ts", $"user_id", $"event_type")
      .as[(Long, Timestamp, Long, String)].collect().toSeq

    implicit val sqlCtx = spark.sqlContext
    val signupsIn = MemoryStream[(Long, Timestamp, Long, String)]
    val purchasesIn = MemoryStream[(Long, Timestamp, Long, String)]
    val signups = signupsIn.toDF().toDF("s_id", "s_ts", "s_user", "s_type")
      .filter($"s_type" === "signup").withWatermark("s_ts", "1 hour")
    val purchases = purchasesIn.toDF().toDF("p_id", "p_ts", "p_user", "p_type")
      .filter($"p_type" === "purchase").withWatermark("p_ts", "1 hour")

    val joined = signups.join(purchases,
      $"s_user" === $"p_user" &&
        $"p_ts" >= $"s_ts" && $"p_ts" <= $"s_ts" + expr("INTERVAL 7 DAYS"))
      .select($"s_id", $"p_id")

    val query = joined.writeStream.outputMode("append")
      .format("memory").queryName("ss_join").start()

    // Two time-ordered installments, shuffled WITHIN each: the watermark
    // contract tolerates arbitrary disorder inside a batch but drops rows
    // older than (max ts seen − 1h) across batches — feeding fully
    // shuffled halves would (correctly!) evict the late ones and the
    // stream would diverge from batch. Both sides receive ALL events; the
    // type filters split the roles.
    val rnd = new scala.util.Random(11)
    val sorted = events.sortBy(_._2.getTime)
    val (early, late) = sorted.splitAt(sorted.size / 2)
    signupsIn.addData(rnd.shuffle(early)); purchasesIn.addData(rnd.shuffle(early))
    query.processAllAvailable()
    signupsIn.addData(rnd.shuffle(late)); purchasesIn.addData(rnd.shuffle(late))
    query.processAllAvailable()
    val streamed = spark.table("ss_join").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    query.stop()

    val ev = events.toDF("id", "ts", "user", "typ")
    val batch = ev.as("s").filter($"s.typ" === "signup")
      .join(ev.as("p").filter($"p.typ" === "purchase"),
        $"s.user" === $"p.user" &&
          $"p.ts" >= $"s.ts" && $"p.ts" <= $"s.ts" + expr("INTERVAL 7 DAYS"))
      .select($"s.id", $"p.id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed == batch && batch.nonEmpty)
  }
}
