package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

/** Incremental drift monitoring — the q85 report served from ingest
  * state, closing the monitoring loop the way [[BloomGate]] closed
  * decontamination→dedup: documents stream in, each micro-batch appends a
  * per-(half, token) COUNT DELTA (vocab-of-batch-sized — O(batch) write
  * I/O, never O(corpus)), and serving the drift report is a sum-merge of
  * the deltas fed into the SAME report tail the batch q85 runs
  * ([[graft.operators.Drift.reportFrom]]). Exact token counts are
  * associative sums, so the composition is lossless: DriftStreamSpec pins
  * served ≡ one-shot q85 on the same corpus, any batch split.
  *
  * The fixture's two "snapshots" are q85's doc_id-parity halves;
  * production tags `half` by snapshot/epoch id instead — the state and
  * serve path are unchanged (StateDir compaction bounds read fan-in, and
  * the [[DedupStream]] batch-id guard makes replay a no-op).
  */
final class DriftStream(spark: SparkSession, state: StateDir) {

  import DriftStream._

  def ingest(docs: DataFrame): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .foreachBatch(processBatch _)
      .start()

  /** One batch: count the batch's tokens per (half, token), append the
    * delta. Public so a batch driver (or spec) can drive the path. */
  def processBatch(batch: Dataset[Row], batchId: Long): Unit = state.locked {
    val replayed = state.exists(Table) &&
      !state.read(Table, Schema).filter(col("batch_id") === batchId).isEmpty
    if (!replayed && !batch.isEmpty) {
      state.append(Table,
        batch.toDF()
          .select((col("doc_id") % 2).as("half"),
            explode(graft.Tok.toksText).as("tok"))
          .groupBy(col("half"), col("tok"))
          .agg(count(lit(1)).as("cnt"))
          .withColumn("batch_id", lit(batchId)))
    }
  }

  /** The q85 drift report over everything ingested so far — delta rows
    * sum-merged by (half, token), then the shared batch report tail. No
    * document is ever re-read. */
  def report: DataFrame =
    graft.operators.Drift.reportFrom(
      state.read(Table, Schema)
        .groupBy(col("half"), col("tok"))
        .agg(sum(col("cnt")).as("cnt")))

  /** The retrain TRIGGER — the policy the scaladocs call "retrain when
    * DriftStream says so", as code: true when the served report's largest
    * |Δppm| reaches `thresholdPpm`. The report is already ordered by
    * |Δppm| descending, so this reads exactly one row; nothing is
    * recomputed beyond the O(state) report merge. DriftRetrainSpec pins
    * the full loop: threshold crossing → [[graft.operators.IvfIndex
    * .build]] → serving ≡ a fresh index. */
  def shouldRetrain(thresholdPpm: Long,
      minTokens: Long = DriftStream.MinSignalTokens): Boolean =
    state.exists(Table) && {
      // volume gate: right after a [[resetBaseline]] the state holds only
      // a batch or two, and per-token rates over a tiny sample swing by
      // construction (one doc flips a rare token's half-rate from 0 to
      // thousands of ppm) — a retrain signal read off that noise would
      // re-fire immediately after every retrain. The ppm comparison only
      // counts once the new epoch has accumulated a meaningful corpus.
      val vol = state.read(Table, Schema)
        .agg(coalesce(sum(col("cnt")), lit(0L))).collect()(0).getLong(0)
      vol >= minTokens && report.limit(1).collect()
        .headOption.exists(r => math.abs(r.getAs[Long]("delta_ppm")) >= thresholdPpm)
    }

  /** Start a new drift-measurement epoch: truncate the token state. The
    * owner calls this AFTER acting on [[shouldRetrain]] (retraining
    * absorbs the drift measured so far into the new index generation —
    * without the reset the crossed threshold would re-fire on every
    * subsequent batch and retrain forever). Under the state lock so a
    * concurrent `processBatch` can't interleave between read and
    * truncate. */
  def resetBaseline(): Unit = state.locked {
    if (state.exists(Table))
      state.write(Table, spark.createDataFrame(
        java.util.Collections.emptyList[Row](), Schema))
  }
}

object DriftStream {
  val Table = "drift_tokens"

  /** Default [[DriftStream.shouldRetrain]] volume gate: the token count
    * a new measurement epoch must accumulate before its ppm deltas are
    * trusted. Fixture-sized (the sf0.001 corpus carries ~20k tokens, a
    * post-reset micro-batch ~1k); at scale, size to the volume where a
    * one-doc rate swing is below the declared ppm budget
    * (≈ 1e6·max_doc_tokens / thresholdPpm). */
  val MinSignalTokens = 5000L
  val Schema: StructType = StructType(Seq(
    StructField("half", LongType),
    StructField("tok", StringType),
    StructField("cnt", LongType),
    StructField("batch_id", LongType)))
}
