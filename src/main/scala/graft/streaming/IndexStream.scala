package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.{IvfIndex => Index, IvfIndex}

/** ANN-index maintenance at INGEST — the streaming wiring around
  * [[graft.operators.IvfIndex.addBatch]], completing the index's
  * lifecycle the way [[DedupStream]] completes dedup's: the quantizer is
  * trained ONCE in batch (`build`), and as embedding rows stream in,
  * each micro-batch is assigned to the fixed centroids and appended to
  * the persisted assignment as a tagged [[StateDir]] delta — O(batch)
  * write I/O, one broadcast join per batch (the K-row centroid table),
  * zero retraining. Serving (`index.query`, q86's plan) sees every
  * ingested vector immediately.
  *
  * Replay safety: deltas carry the writing batch id; a re-driven batch
  * (foreachBatch may re-run after failure) is detected by its surviving
  * rows and skipped — the [[DedupStream]] idempotent-foreachBatch
  * pattern. Serving reads project the tag away, so the guard costs the
  * query path nothing.
  */
final class IndexStream(spark: SparkSession, state: StateDir) {

  val index = new Index(spark, state)

  def ingest(emb: DataFrame): StreamingQuery =
    emb.writeStream
      .outputMode("append")
      .foreachBatch(processBatch _)
      .start()

  /** One batch: assign to the fixed quantizer, append the tagged delta.
    * Public so a batch driver (or spec) can drive the same code path. */
  def processBatch(batch: Dataset[Row], batchId: Long): Unit = state.locked {
    require(index.isBuilt,
      "index not built — train in batch before streaming ingest")
    val replayed = !state
      .read(IvfIndex.AssignTable, IvfIndex.TaggedAssignSchema)
      .filter(col("batch_id") === batchId).isEmpty
    if (!replayed && !batch.isEmpty)
      index.addBatch(batch.toDF(), Some(batchId))
  }
}
