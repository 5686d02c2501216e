package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

import graft.operators.Telemetry

/** Incremental corpus telemetry — [[graft.operators.Telemetry]]'s
  * "append a batch sketch, union on read" claim made real through
  * [[StateDir]]: each micro-batch sketches ONLY its own documents (a
  * |sources|-row delta: exact doc/token counts + the batch's HLL token
  * sketch) and appends it; serving estimates at any moment is a
  * register-max union over the appended sketches. Because the union is
  * associative and partition-invariant, the delta rows ARE the state —
  * no read-modify-write of existing rows, per-batch write I/O O(sources),
  * and [[StateDir]]'s compaction cadence bounds read fan-in exactly as it
  * does for the dedup tables.
  *
  * Replay safety: rows are tagged with the writing batch id; a re-driven
  * batch (restart mid-commit) is detected by its surviving rows and
  * skipped — the [[DedupStream]] idempotent-foreachBatch pattern.
  */
final class TelemetryStream(spark: SparkSession, state: StateDir) {

  import TelemetryStream._

  def ingest(docs: DataFrame): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .foreachBatch(processBatch _)
      .start()

  /** One batch: sketch the batch's docs, append the delta. Public so a
    * batch driver (or spec) can drive the same code path directly. */
  def processBatch(batch: Dataset[Row], batchId: Long): Unit = state.locked {
    val replayed = state.exists(Table) &&
      !state.read(Table, Schema).filter(col("batch_id") === batchId).isEmpty
    if (!replayed && !batch.isEmpty) {
      state.append(Table,
        Telemetry.sourceSketches(batch.toDF())
          .withColumn("batch_id", lit(batchId)))
    }
  }

  /** Served estimates over everything ingested so far — one union over
    * the appended sketch rows, no document ever re-read. */
  def snapshot: DataFrame =
    Telemetry.estimates(
      Telemetry.mergeSketches(state.read(Table, Schema).drop("batch_id")))
}

object TelemetryStream {
  val Table = "telemetry"
  val Schema: StructType = StructType(Seq(
    StructField("source", StringType),
    StructField("n_docs", LongType),
    StructField("n_tokens", LongType),
    StructField("tok_sketch", BinaryType),
    StructField("batch_id", LongType)))
}
