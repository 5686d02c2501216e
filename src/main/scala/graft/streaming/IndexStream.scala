package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.{AnnIndex, IvfIndex}

/** Index maintenance at INGEST — the streaming wiring around
  * [[graft.operators.AnnIndex.addBatch]], completing the index's
  * lifecycle the way [[DedupStream]] completes dedup's: the quantizers/
  * statistics are trained ONCE in batch (`build`), and as rows stream
  * in, each micro-batch is assigned/encoded against the fixed trained
  * state and appended to the persisted serving tables as tagged
  * [[StateDir]] deltas — O(batch) write I/O, broadcast-bounded joins
  * per batch, zero retraining. Serving (`index.query` — q86's plan over
  * [[IvfIndex]], q93's over [[graft.operators.PqIndex]], q96's over
  * [[graft.operators.LexIndex]]) sees every ingested row immediately.
  * The wiring is content-agnostic: ONE stream state machine maintains
  * whichever [[AnnIndex]] it is given — embedding rows into the ANN
  * legs, (doc_id, text) rows into the lexical leg.
  *
  * Replay safety lives IN the index ([[AnnIndex.addBatch]]'s batch
  * ledger + per-table guards + state lock), so this wiring is a thin
  * adapter: a re-driven batch (foreachBatch may re-run after failure)
  * is a no-op once its ledger row landed, and a batch torn mid-append
  * is completed by the re-drive. The stream locks `index.state` — the
  * same root the index writes to by construction. */
final class IndexStream(spark: SparkSession, val index: AnnIndex) {

  /** The original single-table wiring: maintain an [[IvfIndex]]. */
  def this(spark: SparkSession, state: StateDir) =
    this(spark, new IvfIndex(spark, state))

  def ingest(rows: DataFrame): StreamingQuery =
    rows.writeStream
      .outputMode("append")
      .foreachBatch(processBatch _)
      .start()

  /** One batch: delegate to the index's idempotent, crash-completing
    * append (the lock is reentrant — addBatch re-acquires it). Empty
    * batches flow through too: their deltas are vacuous but the ledger
    * row still commits, so [[AnnIndex.hasBatch]] answers true for every
    * processed batch id — owner logic polling the ledger for completion
    * sees no permanent hole. Public so a batch driver (or spec) can
    * drive the same code path. */
  def processBatch(batch: Dataset[Row], batchId: Long): Unit =
    index.state.locked {
      require(index.isBuilt,
        "index not built — train in batch before streaming ingest")
      index.addBatch(batch.toDF(), Some(batchId))
    }
}
