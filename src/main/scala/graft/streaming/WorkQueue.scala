package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.ChunkIngest.{QueueSchema, QueueTable}

/** Worker side of the work queue (SURVEY.md §2.9 T8/T9; reference
  * `FileWorkerApp.scala:139-160,207-227,315-334`).
  *
  * Status machine (reference semantics):
  *   0 queued → 1 claimed (`removed` stamped) → 2 started (`started`
  *   stamped) → 3 finished (`finished` stamped); `error_status = 1` is an
  *   orthogonal flag, reset to status 0 for resident files by the ingest
  *   side's threshold action.
  *
  * The reference claims with a row lock (`setAutoCommit(false)` … `limit 1`
  * … `commit`). Spark has no row locks; the scalable replacement (SURVEY
  * §7.4, semantic delta) is deterministic assignment — each queued row hashes
  * to exactly one worker via `pmod(hash(file_id), nWorkers)`, so claims are
  * disjoint by construction, shuffle-free, and idempotent under replay.
  * Exactly-once = determinism + the versioned state swap in [[StateDir]].
  */
final class WorkQueue(spark: SparkSession, state: StateDir) {

  def snapshot: DataFrame = state.read(QueueTable, QueueSchema)

  /** Deterministic worker assignment over claimable rows (P7 filter). */
  def assignments(nWorkers: Int): DataFrame =
    snapshot.filter(col("status") === 0)
      .withColumn("worker", pmod(hash(col("file_id")), lit(nWorkers)))

  /** T9 claim: this worker's rows move 0 → 1 with `removed` stamped.
    * Returns the claimed file ids (driver-side list — a work claim is by
    * nature a small driver decision, not a data-scale collect). */
  def claim(workerId: Int, nWorkers: Int,
      now: Timestamp = new Timestamp(System.currentTimeMillis())): Seq[Long] =
    state.locked {
      val mine = pmod(hash(col("file_id")), lit(nWorkers)) === workerId &&
        col("status") === 0
      val claimed = snapshot.filter(mine).select("file_id")
        .collect().map(_.getLong(0)).toSeq
      if (claimed.nonEmpty)
        transition(col("file_id").isin(claimed: _*) && col("status") === 0,
          toStatus = 1, stamp = "removed", now)
      claimed
    }

  /** 1 → 2: processing begins (`started`). */
  def markStarted(fileIds: Seq[Long],
      now: Timestamp = new Timestamp(System.currentTimeMillis())): Unit =
    state.locked {
      transition(col("file_id").isin(fileIds: _*) && col("status") === 1,
        toStatus = 2, stamp = "started", now)
    }

  /** 2 → 3: processing done (`finished`); failures additionally raise
    * `error_status` (reference `error_status_update`,
    * `FileWorkerApp.scala:117`). */
  def markFinished(fileIds: Seq[Long], error: Boolean = false,
      now: Timestamp = new Timestamp(System.currentTimeMillis())): Unit =
    state.locked {
      val hit = col("file_id").isin(fileIds: _*) && col("status") === 2
      val q = snapshot
        .withColumn("finished", when(hit, lit(now)).otherwise(col("finished")))
        // success CLEARS a stale error flag from an earlier attempt —
        // otherwise the ingest side's threshold reset would re-queue a
        // file that already finished cleanly on retry.
        .withColumn("error_status",
          when(hit, if (error) lit(1) else lit(0)).otherwise(col("error_status")))
        .withColumn("status", when(hit, 3).otherwise(col("status")))
      state.write(QueueTable, q)
    }

  /** T8 polling loop body: claim → start → finish in one poll, like the
    * reference's `while(run){ getNextFiles; processFiles }`. `process`
    * returns true on success per file. */
  def pollOnce(workerId: Int, nWorkers: Int)(process: Long => Boolean): Seq[Long] = {
    val ids = claim(workerId, nWorkers)
    if (ids.nonEmpty) {
      markStarted(ids)
      val (ok, bad) = ids.partition(process)
      if (ok.nonEmpty) markFinished(ok)
      if (bad.nonEmpty) markFinished(bad, error = true)
    }
    ids
  }

  private def transition(hit: org.apache.spark.sql.Column, toStatus: Int,
      stamp: String, now: Timestamp): Unit = {
    val q = snapshot
      .withColumn(stamp, when(hit, lit(now)).otherwise(col(stamp)))
      .withColumn("status", when(hit, toStatus).otherwise(col("status")))
    state.write(QueueTable, q)
  }
}
