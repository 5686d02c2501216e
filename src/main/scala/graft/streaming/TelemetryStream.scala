package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

import graft.operators.{Sketch, Telemetry}

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
  * r14 adds the KMV VOCABULARY leg — q112's streaming twin: each batch
  * also appends a per-language `graft_kmin` array over its hashed 3-gram
  * shingles (k longs per language per batch), and [[vocabSnapshot]]
  * serves distinct-shingle estimates by the q112 merge law (flatten →
  * dedup → sort → trim — already oracle-pinned by q112's `kth_rolled`
  * column). Same algebra, so the served estimate is IDENTICAL to the
  * one-shot batch sketch under any arrival order — a vocabulary-growth /
  * novelty curve maintained in O(|langs|·k) state, where the exact
  * answer would keep the corpus-wide distinct set.
  *
  * Replay safety: rows are tagged with the writing batch id; a re-driven
  * batch (restart mid-commit) is detected by its surviving rows and
  * skipped — the [[DedupStream]] idempotent-foreachBatch pattern. The two
  * tables are checked INDEPENDENTLY, so a crash between the two appends
  * heals on replay (the missing half is appended, the surviving half is
  * not duplicated).
  */
final class TelemetryStream(spark: SparkSession, state: StateDir) {

  import TelemetryStream._

  def ingest(docs: DataFrame): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .foreachBatch(processBatch _)
      .start()

  /** One batch: sketch the batch's docs, append the deltas. Public so a
    * batch driver (or spec) can drive the same code path directly. */
  def processBatch(batch: Dataset[Row], batchId: Long): Unit = state.locked {
    if (!batch.isEmpty) {
      val b = batch.toDF()
      if (!committed(Table, Schema, batchId)) {
        state.append(Table,
          Telemetry.sourceSketches(b).withColumn("batch_id", lit(batchId)))
      }
      // the vocab leg is per-LANGUAGE state: a feed that doesn't carry
      // `lang` (q107's chunk-forensics fixture ingests (doc_id, source,
      // text)) simply doesn't maintain it — the HLL leg is unaffected
      if (b.columns.contains("lang") &&
          !committed(KmvTable, KmvSchema, batchId)) {
        state.append(KmvTable,
          Sketch.langKmins(b).withColumn("batch_id", lit(batchId)))
      }
    }
  }

  private def committed(table: String, schema: StructType, batchId: Long): Boolean =
    state.exists(table) &&
      !state.read(table, schema).filter(col("batch_id") === batchId).isEmpty

  /** Served estimates over everything ingested so far — one union over
    * the appended sketch rows, no document ever re-read. */
  def snapshot: DataFrame =
    Telemetry.estimates(
      Telemetry.mergeSketches(state.read(Table, Schema).drop("batch_id")))

  /** Served per-language distinct-shingle estimates (kth_min, n_mins,
    * kmv_est) over everything ingested so far — the q112 merge law over
    * the appended k-min arrays; O(|langs|·k) rows read, no document
    * re-scanned. */
  def vocabSnapshot: DataFrame =
    Sketch.kmvServe(
      state.read(KmvTable, KmvSchema).groupBy(col("lang"))
        .agg(Sketch.mergedMins(col("mins")).as("mins")))
}

object TelemetryStream {
  val Table = "telemetry"
  val Schema: StructType = StructType(Seq(
    StructField("source", StringType),
    StructField("n_docs", LongType),
    StructField("n_tokens", LongType),
    StructField("tok_sketch", BinaryType),
    StructField("batch_id", LongType)))

  val KmvTable = "telemetry_kmv"
  val KmvSchema: StructType = StructType(Seq(
    StructField("lang", StringType),
    StructField("mins", ArrayType(LongType, containsNull = false)),
    StructField("batch_id", LongType)))
}
