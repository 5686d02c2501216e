package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSession
import graft.streaming.{ChunkIngest, StateDir, WorkQueue}

/** q110's law, pinned in-suite (the gate pins it against DuckDB): the
  * released-file queue produced by the q108 chunk ingest drains through
  * the worker state machine to a fully-stamped status-3 end state, the
  * ledger holds each file exactly once, and the declared rollup actually
  * CATCHES the failure modes it claims to (lost claim here; replay
  * double-fire in JdbcIOSpec's appendOnceLocal test; double claim is
  * structurally impossible under deterministic assignment and would
  * surface as n_ledger > n_ledger_files). */
class WorkerQueueGateSpec extends AnyFunSuite {
  import TestSession.spark

  test("q110 end state matches the state-machine law at sf0.001") {
    val row = ChunkState.q110WorkerQueue(spark, TestSession.sf).collect().head
    val n = graft.Tables.events(spark, TestSession.sf).count()
    val released = n - 1 // the tiling [-1, total) misses the last extent end
    assert(row.getAs[Long]("n_queued") == released)
    assert(row.getAs[Long]("n_done") == released, "every released file finished")
    assert(row.getAs[Long]("n_unfinished") == 0L)
    val expectedErr = graft.Tables.events(spark, TestSession.sf)
      .filter(col("event_id") % 7 === 3 && col("event_id") < n - 1).count()
    assert(row.getAs[Long]("n_err") == expectedErr, "failure law count")
    assert(row.getAs[Long]("n_ordered") == released,
      "removed <= started <= finished on every row")
    assert(row.getAs[Long]("n_window_ok") == released,
      "each stored HW window contains its file's extent end")
    assert(row.getAs[Long]("n_ledger") == released)
    assert(row.getAs[Long]("n_ledger_files") == released,
      "each file ledgered exactly once (no double claim)")
  }

  test("a lost claim (claimed, never finished) is visible in the rollup") {
    val root = java.nio.file.Files.createTempDirectory("graft-wq-lost-").toString
    val st = new StateDir(spark, s"$root/state")
    val seed = spark.range(0, 20)
      .select(col("id").as("file_id"), lit(0).as("resident"),
        lit(0).as("status"), current_timestamp().as("added"),
        lit(0L).as("hw_before"), lit(100L).as("hw_after"),
        lit(null).cast("timestamp").as("removed"),
        lit(null).cast("timestamp").as("started"),
        lit(null).cast("timestamp").as("finished"),
        lit(0).as("error_status"))
    st.write(ChunkIngest.QueueTable, seed)
    val wq = new WorkQueue(spark, st)
    // worker 0 claims its share and then dies before start/finish
    val lost = wq.claim(0, 2)
    assert(lost.nonEmpty)
    // worker 1 drains its share properly
    wq.pollOnce(1, 2)(_ => true)
    val rollup = wq.snapshot.agg(
      count(when(col("status") =!= 3, 1)).as("n_unfinished"),
      count(when(col("removed").isNotNull && col("finished").isNull, 1))
        .as("n_lost")).collect().head
    assert(rollup.getAs[Long]("n_unfinished") == lost.size.toLong,
      "lost claims surface as unfinished rows")
    assert(rollup.getAs[Long]("n_lost") == lost.size.toLong)
  }
}
