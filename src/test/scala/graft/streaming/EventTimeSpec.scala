package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSession}
import graft.operators.Catalog

/** T5 — event-time windows + watermark: the streaming aggregation over an
  * out-of-order replay of `events` must equal the batch q25 answer on the
  * same data (same plan, Structured Streaming incremental execution). */
class EventTimeSpec extends AnyFunSuite {
  import TestSession.spark
  import spark.implicits._

  test("streaming watermark+window agg equals batch q25 on out-of-order replay") {
    val rows = Tables.events(spark, TestSession.sf)
      .select($"ts", $"event_type", $"value")
      .as[(Timestamp, String, Double)].collect().toSeq

    // replay shuffled (event-time disorder) across two micro-batches.
    val rnd = new scala.util.Random(7)
    val shuffled = rnd.shuffle(rows)
    val (first, second) = shuffled.splitAt(shuffled.size / 2)

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val agg = input.toDF().toDF("ts", "event_type", "value")
      .withWatermark("ts", "10 minutes")
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n"),
        sum($"value".cast(DecimalType(18, 2))).cast("double").as("sum_value"))
      .select(unix_millis($"window.start").as("win_start_ms"),
        $"event_type", $"n", $"sum_value")

    val query = agg.writeStream.outputMode("complete")
      .format("memory").queryName("evt_windows").start()
    input.addData(first)
    query.processAllAvailable()
    input.addData(second)
    query.processAllAvailable()
    val streamed = spark.table("evt_windows").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    query.stop()

    val batch = Catalog.q25TimeWindows(spark, TestSession.sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }
}
