package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSession

/** Exact dedup in a stream with BOUNDED state — the streaming twin of the
  * q19 batch operator: `dropDuplicatesWithinWatermark` keeps a fingerprint
  * only until the watermark passes it, so state is O(events in the
  * watermark horizon), not O(corpus) — the property that lets exact dedup
  * run forever at ingest. (The unbounded-horizon alternative is
  * [[DedupStream]]'s persisted signature state.) */
class WatermarkDedupSpec extends AnyFunSuite {
  import TestSession.spark
  import spark.implicits._

  private def ts(min: Long) = new Timestamp(min * 60000L)

  test("duplicates within the watermark horizon are dropped; state stays bounded") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, String)] // (doc_id, minute, text)
    val deduped = input.toDF().toDF("doc_id", "min", "text")
      .withColumn("ts", timestamp_millis(col("min") * 60000))
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("doc_id")
    val q = deduped.writeStream.format("memory").queryName("wm_dedup")
      .outputMode("append").start()
    try {
      // batch 1: a duplicate within the batch collapses
      input.addData((1L, 0L, "a"), (1L, 1L, "a dup"), (2L, 2L, "b"))
      q.processAllAvailable()
      // batch 2: re-delivery inside the horizon still drops; new doc passes
      input.addData((1L, 5L, "a dup again"), (3L, 6L, "c"))
      q.processAllAvailable()
      // advance event time far past the horizon: doc 1's fingerprint has
      // been evicted, so a late re-arrival is treated as NEW (the bounded-
      // state contract, stated and pinned rather than hidden)
      input.addData((4L, 60L, "d"))
      q.processAllAvailable()
      input.addData((1L, 61L, "a returns after eviction"))
      q.processAllAvailable()
      val ids = spark.table("wm_dedup").select("doc_id", "min").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      // exactly ONE of the intra-batch duplicates survives (which one is
      // task-order-dependent and not part of the contract)...
      assert(Seq((1L, 0L), (1L, 1L)).count(ids.contains) == 1)
      // ...and the cross-batch re-delivery inside the horizon is dropped
      assert(!ids.contains((1L, 5L)))
      assert(ids.contains((2L, 2L)) && ids.contains((3L, 6L)) && ids.contains((4L, 60L)))
      assert(ids.contains((1L, 61L)), "post-eviction re-arrival should pass (bounded state)")
    } finally q.stop()
  }
}
