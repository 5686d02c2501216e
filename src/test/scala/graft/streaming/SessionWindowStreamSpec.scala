package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSession
import graft.operators.Sessions

/** T5 extension surface — streaming gap sessionization: Structured
  * Streaming's `session_window($"ts", "2 hours")` must produce the same
  * sessions as the batch window-plan form ([[Sessions.sessionize]]) on the
  * same rows. Append mode only finalizes a session once the watermark
  * passes its close, so a sentinel user pushes event time forward to flush
  * the real sessions (and is filtered from the comparison).
  */
class SessionWindowStreamSpec extends AnyFunSuite {
  import TestSession.spark
  import spark.implicits._

  private val H = 3600 * 1000L
  private def ts(hours: Double) = new Timestamp((hours * H).toLong + 1735689600000L)

  test("streaming session_window equals batch gap sessionization") {
    // gaps strictly below / above 2 h only — exactly-2h is the documented
    // semantic seam between `> gap` (batch) and window-overlap (stream).
    val rows = Seq(
      (1L, 1L, ts(0.0), 10.0), (1L, 2L, ts(0.5), 20.0), (1L, 3L, ts(1.0), 30.0),
      (1L, 4L, ts(4.0), 40.0), (1L, 5L, ts(5.0), 50.0),
      (1L, 6L, ts(9.5), 60.0),
      (2L, 7L, ts(0.1), 5.0), (2L, 8L, ts(3.0), 7.0))
    val sentinel = (99L, 999L, ts(100.0), 0.0)

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, Timestamp, Double)]
    val agg = input.toDF().toDF("user_id", "event_id", "ts", "value")
      .withWatermark("ts", "0 seconds")
      .groupBy(session_window($"ts", "2 hours"), $"user_id")
      .agg(count(lit(1)).as("n_events"),
        sum($"value".cast(DecimalType(18, 2))).cast("double").as("sum_value"))
      .select($"user_id", unix_millis($"session_window.start").as("start_ms"),
        $"n_events", $"sum_value")

    val query = agg.writeStream.outputMode("append")
      .format("memory").queryName("sess_stream").start()
    // out-of-order within the batch: watermark 0s only bites between batches
    input.addData(new scala.util.Random(11).shuffle(rows))
    query.processAllAvailable()
    // two sentinel batches: the first advances the watermark, the second's
    // batch evicts the now-closed sessions into the append output
    input.addData(Seq(sentinel)); query.processAllAvailable()
    input.addData(Seq(sentinel.copy(_2 = 1000L))); query.processAllAvailable()
    val streamed = spark.table("sess_stream")
      .filter($"user_id" =!= 99L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    query.stop()

    val batch = Sessions.sessionize(rows.toDF("user_id", "event_id", "ts", "value"))
      .select($"user_id", $"start_ms", $"n_events", $"sum_value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet

    assert(batch.size == 5) // u1: 3 sessions, u2: 2
    assert(streamed == batch)
  }
}
