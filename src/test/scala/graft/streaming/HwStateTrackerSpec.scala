package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSession
import graft.operators.HighWaterMark

/** The typed-state tracker must agree, per image and per batch, with the
  * batch-mode per-key HW (q35's certified operator) over everything fed so
  * far — many interleaved images, out-of-order arrival, duplicate replay. */
class HwStateTrackerSpec extends AnyFunSuite {
  import TestSession.spark
  import spark.implicits._

  private def batchHw(fed: Seq[ChunkEvent]): Map[String, Long] = {
    val df = fed.toDF()
    HighWaterMark.perKeyHighWaterMark(df, "image", "sequence", "size")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  private def trackerHw(table: String): Map[String, Long] =
    // hw is monotonic per image, so max == latest (last() over an unordered
    // groupBy would be shuffle-order-nondeterministic).
    spark.table(table).groupBy("image").agg(
      org.apache.spark.sql.functions.max("hw"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("per-image incremental HW equals batch per-key HW across batches") {
    val a = (0 to 9).map(i => ChunkEvent("imgA", i, (i + 1) * 10L))
    val b = (0 to 5).map(i => ChunkEvent("imgB", i, 100L + i))

    // batch 1 leaves gaps in both; batch 2 closes A's, batch 3 closes B's
    // and replays duplicates (must no-op).
    val batch1 = Seq(a(0), b(1), a(2), a(1), b(4), a(5))
    val batch2 = Seq(a(4), a(3), b(0), a(6))
    val batch3 = Seq(b(2), b(3), a(0), b(1), a(7), a(8), a(9), b(5))

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[ChunkEvent]
    val query = HwStateTracker.start(input.toDS(), "hw_updates")

    var fed = Seq.empty[ChunkEvent]
    for (batch <- Seq(batch1, batch2, batch3)) {
      input.addData(batch)
      query.processAllAvailable()
      fed = fed ++ batch
      val expected = batchHw(fed).filter(_._2 > 0) // batch op emits hw>0 keys
      val got = trackerHw("hw_updates").filter(_._2 > 0)
      assert(got == expected, s"after feeding ${fed.size} chunks")
    }
    // final: everything contiguous — full sums.
    val fin = trackerHw("hw_updates")
    assert(fin("imgA") == (1 to 10).map(_ * 10L).sum)
    assert(fin("imgB") == (0 to 5).map(100L + _).sum)
    query.stop()
  }

  test("completed images are evicted from the state store; stray replays restart cold") {
    val totalA = (1 to 3).map(_ * 10L).sum
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[ChunkEvent]
    val query = HwStateTracker.start(input.toDS(), "hw_evict",
      totalSizes = Map("imgA" -> totalA))

    input.addData(Seq(ChunkEvent("imgA", 0, 10), ChunkEvent("imgA", 2, 30)))
    query.processAllAvailable()
    input.addData(Seq(ChunkEvent("imgA", 1, 20)))
    query.processAllAvailable()
    val rows = spark.table("hw_evict").collect()
      .map(r => (r.getLong(1), r.getBoolean(4))).toSet
    assert(rows.contains((totalA, true)), "final update flags completion")

    // a stray duplicate AFTER eviction starts a cold state — visible as a
    // non-complete, partial-hw update (documented semantics). Select it by
    // content, not collect-order (memory-sink row order across batches is
    // not contractual).
    input.addData(Seq(ChunkEvent("imgA", 2, 30)))
    query.processAllAvailable()
    val cold = spark.table("hw_evict").collect()
      .filter(r => !r.getBoolean(4) && r.getLong(1) == 0L && r.getInt(3) == 1)
    assert(cold.nonEmpty, "cold-state update from the post-eviction stray")
    query.stop()
  }

  test("updateImage is idempotent under duplicate delivery") {
    // pure-function check, no stream: drive the transition directly.
    import org.apache.spark.sql.streaming.GroupStateTimeout
    val s0 = ImageState(0, 0L, Map.empty)
    var st = s0
    def feed(evts: ChunkEvent*): Unit = {
      evts.foreach { c =>
        if (c.sequence >= st.nextSeq && !st.pending.contains(c.sequence))
          st = st.copy(pending = st.pending + (c.sequence -> c.size))
      }
      while (st.pending.contains(st.nextSeq))
        st = ImageState(st.nextSeq + 1, st.hw + st.pending(st.nextSeq), st.pending - st.nextSeq)
    }
    feed(ChunkEvent("x", 1, 5), ChunkEvent("x", 1, 5))
    assert(st.hw == 0 && st.pending.size == 1)
    feed(ChunkEvent("x", 0, 3), ChunkEvent("x", 0, 3))
    assert(st.hw == 8 && st.nextSeq == 2 && st.pending.isEmpty)
  }
}
