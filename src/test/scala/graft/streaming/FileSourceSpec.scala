package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSession}
import graft.operators.Catalog

/** S1 — real streaming source (file source standing in for Kafka: same
  * incremental-discovery semantics, offsets = seen files). Events land as
  * parquet files in two installments; the windowed aggregation over the
  * stream must equal batch q25 over the same rows. */
class FileSourceSpec extends AnyFunSuite {
  import TestSession.spark
  import spark.implicits._

  test("file-source stream of events equals batch q25") {
    val srcDir = Files.createTempDirectory("graft-src-").toString
    // deterministic split — limit() without ordering may pick different
    // rows per evaluation, silently dropping/duplicating events.
    val events = Tables.events(spark, TestSession.sf)
      .select($"event_id", $"ts", $"event_type", $"value")
    val firstHalf = events.filter($"event_id" % 2 === 0).drop("event_id")
    val secondHalf = events.filter($"event_id" % 2 =!= 0).drop("event_id")

    firstHalf.write.mode("append").parquet(srcDir)

    val stream = spark.readStream
      .schema(firstHalf.schema)
      .parquet(srcDir)
      .withWatermark("ts", "10 minutes")
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n"),
        sum($"value".cast(DecimalType(18, 2))).cast("double").as("sum_value"))
      .select(unix_millis($"window.start").as("win_start_ms"),
        $"event_type", $"n", $"sum_value")

    val query = stream.writeStream.outputMode("complete")
      .format("memory").queryName("file_evt_windows").start()
    query.processAllAvailable()
    // second installment arrives later — the source discovers the new files.
    secondHalf.write.mode("append").parquet(srcDir)
    query.processAllAvailable()

    val streamed = spark.table("file_evt_windows").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    query.stop()

    val batch = Catalog.q25TimeWindows(spark, TestSession.sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(streamed == batch && batch.nonEmpty)
  }
}
