package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.{AnnIndex, IvfIndex}

/** ANN-index maintenance at INGEST — the streaming wiring around
  * [[graft.operators.AnnIndex.addBatch]], completing the index's
  * lifecycle the way [[DedupStream]] completes dedup's: the quantizers
  * are trained ONCE in batch (`build`), and as embedding rows stream in,
  * each micro-batch is assigned/encoded against the fixed quantizers and
  * appended to the persisted serving tables as tagged [[StateDir]]
  * deltas — O(batch) write I/O, broadcast-bounded joins per batch, zero
  * retraining. Serving (`index.query` — q86's plan over [[IvfIndex]],
  * q93's over [[graft.operators.PqIndex]]) sees every ingested vector
  * immediately. The wiring is index-agnostic: one stream state machine
  * maintains whichever [[AnnIndex]] it is given.
  *
  * Replay safety: deltas carry the writing batch id; a re-driven batch
  * (foreachBatch may re-run after failure) is detected by its surviving
  * rows and skipped — the [[DedupStream]] idempotent-foreachBatch
  * pattern. The guard is two-level: [[AnnIndex.hasBatch]] skips a batch
  * every serving table already carries, and `addBatch` itself commits
  * per table at most once — so a batch torn by a crash between a
  * multi-table index's appends ([[graft.operators.PqIndex]]: assignment
  * landed, codes missing) is COMPLETED by the re-drive, not skipped
  * (dropping codes) or re-run whole (duplicating assignment). Serving
  * reads project the tag away, so the guard costs the query path
  * nothing.
  */
final class IndexStream(spark: SparkSession, state: StateDir,
    val index: AnnIndex) {

  /** The original single-table wiring: maintain an [[IvfIndex]]. */
  def this(spark: SparkSession, state: StateDir) =
    this(spark, state, new IvfIndex(spark, state))

  def ingest(emb: DataFrame): StreamingQuery =
    emb.writeStream
      .outputMode("append")
      .foreachBatch(processBatch _)
      .start()

  /** One batch: assign/encode against the fixed quantizers, append the
    * tagged deltas the index does not already carry. Public so a batch
    * driver (or spec) can drive the same code path. */
  def processBatch(batch: Dataset[Row], batchId: Long): Unit = state.locked {
    require(index.isBuilt,
      "index not built — train in batch before streaming ingest")
    if (!index.hasBatch(batchId) && !batch.isEmpty)
      index.addBatch(batch.toDF(), Some(batchId))
  }
}
