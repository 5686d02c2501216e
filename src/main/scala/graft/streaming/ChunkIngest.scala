package graft.streaming

import java.io.{File, FileOutputStream}
import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

import graft.operators.{Forensics, HighWaterMark}

/** Structured Streaming re-expression of the reference's ingest job
  * (SURVEY.md §2.9 T1-T7; reference dataflow `StreamingApp.scala:309-493`).
  *
  * Per micro-batch (`foreachBatch` — the reference emulated "run once per
  * batch on one task" with `repartition(1).foreachRDD`, T3/O3):
  *
  *  1. decode Avro chunks → per-chunk metadata: sequence from the trailing
  *     `.N` of the filename (F2), size, md5 (F1) verified against the
  *     producer hash (the reference's commented-out TODO at
  *     `StreamingApp.scala:322-324` — here it is real);
  *  2. optionally persist chunk bytes to a directory (S3,
  *     `StreamingApp.scala:358-366`) and append chunk metadata to the
  *     chunks state table (S4, `:370-373`), deduped on (name, sequence) so
  *     batch replay is idempotent (T9 — the reference double-writes);
  *  3. recompute the contiguous-prefix high-water mark over ALL chunks seen
  *     (W1+W2+A3 — the `get_highwater_mark` cursor loop,
  *     `StreamingApp.scala:238-246`, as the window-plan rewrite in
  *     [[graft.operators.HighWaterMark]]);
  *  4. compare-and-set the cross-batch HW state (W3/T4,
  *     `StreamingApp.scala:247-252`): advance only if the mark strictly
  *     grows AND the MFT is fully ingested (a missing MFT accepts);
  *  5. on advance: log the transition, release files whose max extent end
  *     falls in [previous, current) (J4/A2) and enqueue them (S5 — Spark's
  *     writers batch natively; the reference hand-batched 1000 rows,
  *     `StreamingApp.scala:452-471`);
  *  6. threshold side effects (T6/P8/F8, `StreamingApp.scala:424-445`):
  *     at ¼ image size populate resident files (J3); at ½ and at completion
  *     reset errored resident files to status 0; at completion flag the HW
  *     state done and request a graceful stop (T7 — the caller observes
  *     [[isDone]] and calls `query.stop()`, instead of the reference's
  *     fragile stop-from-inside-a-task at `StreamingApp.scala:483`).
  *
  * Scale notes: the per-batch chunk-metadata path is fully distributed; the
  * HW recompute is per-image sequential by nature (bounded by chunk count,
  * not data size — SURVEY §7.5) and would partition by image key for
  * many-image ingest ([[HighWaterMark.perKeyHighWaterMark]]). State tables
  * are tiny (one row, or one row per file) next to the chunk data.
  */
final class ChunkIngest(
    spark: SparkSession,
    state: StateDir,
    imageSize: Long,
    files: DataFrame,
    layout: DataFrame,
    fsInfo: DataFrame,
    chunkSink: Option[String] = None) extends Serializable {

  import ChunkIngest._

  // Recover completion from persisted state: after a restart the completing
  // batch replays as a no-op (batch-id guard), so a process-local-only flag
  // would leave the graceful-stop poller hanging on a finished image.
  @volatile private var doneFlag =
    state.exists(HwTable) && currentHw().status == 1

  /** T7: set when the image is fully ingested; caller stops the query. */
  def isDone: Boolean = doneFlag

  def queueSnapshot: DataFrame = state.read(QueueTable, QueueSchema)
  def hwSnapshot: DataFrame = state.read(HwTable, HwSchema)
  def hwLogSnapshot: DataFrame = state.read(HwLogTable, HwLogSchema)
  def chunksSnapshot: DataFrame = state.read(ChunksTable, ChunksSchema)
  def badChunksSnapshot: DataFrame = state.read(BadChunksTable, ChunksSchema)

  /** T1: attach to a chunk stream with a micro-batch trigger. The stream is
    * instrumented with `observe` metrics (A6 — the reference's `Clock`
    * aggregate-group timings, `Clock.scala:58-100`, recast as Spark's
    * native per-batch metrics): chunk and byte counts appear in every
    * `StreamingQueryProgress.observedMetrics("ingest")`. */
  def start(blocks: Dataset[ImageBlock], trigger: Trigger,
      checkpoint: String): StreamingQuery = {
    val batchFn: (Dataset[ImageBlock], Long) => Unit =
      (ds, id) => processBatch(ds, id)
    blocks
      .observe("ingest",
        count(lit(1)).as("n_chunks"),
        coalesce(sum(length(col("data"))), lit(0L)).as("n_bytes"))
      .writeStream
      .trigger(trigger)
      .option("checkpointLocation", checkpoint)
      .foreachBatch(batchFn)
      .start()
  }

  /** T2+T3: the per-batch body. Public so batch-mode tests drive it directly
    * — same code path streaming and batch. */
  def processBatch(rawBlocks: Dataset[ImageBlock], batchId: Long): Unit = {
    // T9: foreachBatch may replay a batch after failure; the state writes
    // below are idempotent, and the batch-id guard skips exact re-runs.
    val lastBatch = if (state.exists(MetaTable))
      state.read(MetaTable, MetaSchema).first().getLong(0) else -1L
    if (batchId <= lastBatch) return

    // The batch feeds two actions (metadata write + binary sink); cache so
    // the source executes once per batch (also keeps the A6 observe
    // metrics single-counted — accumulators don't re-fire on cache hits).
    val blocks = rawBlocks.persist()
    try processCachedBatch(blocks, batchId) finally blocks.unpersist()
  }

  private def processCachedBatch(blocks: Dataset[ImageBlock], batchId: Long): Unit = {

    // (1) decode → chunk metadata. length(binary) and md5 are codegen'd
    // built-ins; the whole projection pipelines inside one codegen stage.
    val meta = blocks.toDF()
      .select(
        col("filename").as("name"),
        substring_index(col("filename"), ".", -1).cast("int").as("sequence"),
        length(col("data")).cast("long").as("size"),
        md5(col("data")).as("hash"),
        (md5(col("data")) === col("localHash")).as("hash_ok"))

    // (2) S3: side-effecting binary sink, cleanly separated from the pure
    // transforms (SURVEY §7.5) — executor-side, one file per chunk.
    // VERIFIED chunks only: a corrupt payload must not overwrite good bytes
    // (or sit unmarked on disk) while the metadata path quarantines it.
    chunkSink.foreach { dir =>
      new File(dir).mkdirs()
      blocks.foreachPartition { it: Iterator[ImageBlock] =>
        val digest = java.security.MessageDigest.getInstance("MD5")
        it.foreach { b =>
          digest.reset()
          val ok = digest.digest(b.data).map("%02x".format(_)).mkString == b.localHash
          if (ok) {
            val out = new FileOutputStream(new File(dir, b.filename))
            try out.write(b.data) finally out.close()
          }
        }
      }
    }

    // Hash verification ENFORCED (the reference's TODO at
    // StreamingApp.scala:322-324): chunks whose md5 mismatches the
    // producer hash are quarantined, not ingested — a corrupt chunk reads
    // as MISSING, so the HW holds at the gap and the image cannot be
    // declared complete until a good copy arrives (re-delivery still lands
    // because the anti-join checks the VERIFIED table only).
    //
    // Both chunk tables GROW with the corpus, so they publish via
    // StateDir.append — per-batch write I/O is O(batch): only the rows not
    // already in state (natural-key anti-join, which also makes replay a
    // no-op delta) hit disk. The queue table below stays on full write —
    // it is UPDATED in place (status transitions), the MERGE shape, not
    // the append shape.
    val existingBad = state.read(BadChunksTable, ChunksSchema)
    state.append(BadChunksTable,
      meta.filter(!col("hash_ok"))
        .dropDuplicates("name", "sequence")
        .join(existingBad.select("name", "sequence"),
          Seq("name", "sequence"), "left_anti"))

    // S4: append verified chunk metadata, idempotent on (name, sequence).
    val existingChunks = state.read(ChunksTable, ChunksSchema)
    state.append(ChunksTable,
      meta.filter(col("hash_ok"))
        .dropDuplicates("name", "sequence")
        .join(existingChunks.select("name", "sequence"),
          Seq("name", "sequence"), "left_anti"))

    // (3) candidate HW over the full chunk set: contiguous-prefix sum plus
    // the seq/name of the last contiguous chunk. The window partitions by
    // image name (filename minus the trailing ".N") — one partition for
    // this machine's single image, so the result is identical to the global
    // form, but the streaming default carries no unpartitioned window and
    // the same plan holds when a coordinator fans chunks across images
    // ([[MultiImageIngest]]).
    val contig = HighWaterMark.contiguousPrefixPerKey(
      state.read(ChunksTable, ChunksSchema)
        .withColumn("img", regexp_replace(col("name"), "\\.[0-9]+$", "")),
      "img", "sequence")
    val hwRow = contig.agg(
      coalesce(sum(col("size")), lit(0L)).as("hw"),
      coalesce(max(col("sequence")), lit(-1)).cast("long").as("hw_seq"),
      coalesce(max_by(col("name"), col("sequence")), lit("")).as("hw_name"))
      .first()
    val (candidate, candSeq, candName) =
      (hwRow.getLong(0), hwRow.getLong(1), hwRow.getString(2))

    // (4) W3/T4 compare-and-set against persisted state (init -1, matching
    // the reference's seed row `insert into highwatermark values (-1,-1,...)`).
    val prev = currentHw()
    val (_, _, advanced) =
      HighWaterMark.advance(prev.current, candidate,
        Forensics.mftHighWater(files, layout))

    val (hwBefore, hwAfter) =
      if (advanced) {
        // Log BEFORE the state swap: a crash between the two writes then
        // leaves a log row whose advance replays (idempotent — deduped on
        // (previous, current)), whereas the reverse order would lose the
        // advance from the audit trail forever (the replay sees the new
        // mark and never re-logs).
        val logRow = spark.createDataFrame(Seq(
          (prev.current, candidate, candSeq, candName)))
          .toDF("previous", "current", "current_seq", "current_name")
        val existing = state.read(HwLogTable, HwLogSchema)
        // audit log: grows per advance → append-mode (anti-join keeps a
        // crash-replayed advance single in the trail)
        state.append(HwLogTable,
          logRow.join(existing.select("previous", "current"),
            Seq("previous", "current"), "left_anti"))
        writeHw(HwState(prev.current, candidate, candSeq, candName, prev.status))
        (prev.current, candidate)
      } else (prev.previous, prev.current)

    // (5) release + enqueue. Not conditioned on `advanced`: the reference
    // always runs the release query with the state-table window, so a
    // non-advancing batch re-selects the previous window — harmless here
    // because enqueueing dedupes on file_id (idempotent upsert, T9).
    val released = Forensics.releasedBetween(files, layout, fsInfo, hwBefore, hwAfter)
    enqueue(released, resident = 0, Some((hwBefore, hwAfter)))

    // (6) T6 threshold side effects, faithful band semantics
    // (threshold ∈ [hw_before, hw_after) fires exactly on the crossing
    // batch; idempotent writes make the reference's re-fire bug harmless).
    if (imageSize / 4 >= hwBefore && imageSize / 4 < hwAfter)
      enqueue(Forensics.residentFiles(files, layout), resident = 1, None)

    // NOTE deliberate deviation: the reference guards these as if/else-if
    // (`StreamingApp.scala:430-441`), so a single batch that crosses BOTH
    // the half and the end thresholds takes the half branch and never flags
    // done — with 60 s micro-batches the crossings always separated in
    // practice, but a large replay batch hangs the job. Independent checks
    // close that hole; the observable side effects are otherwise identical.
    var resetErrors = false
    if (imageSize / 2 >= hwBefore && imageSize / 2 < hwAfter)
      resetErrors = true
    if (imageSize <= hwAfter && !doneFlag) {
      resetErrors = true
      val cur = currentHw()
      if (cur.status == 0) writeHw(cur.copy(status = 1))
      doneFlag = true
    }
    // Deviation from the reference's unconditional reset (`set status = 0
    // where error_status = 1 and resident = 1`, StreamingApp.scala:443):
    // only FINISHED-with-error rows (status 3) re-queue. The reference's
    // form also resets rows a worker is actively retrying (status 1/2) —
    // the worker's finish transition then matches nothing and the file is
    // claimed again, every non-advancing batch, forever.
    if (resetErrors) state.locked {
      val q = state.read(QueueTable, QueueSchema)
      state.write(QueueTable, q.withColumn("status",
        when(col("error_status") === 1 && col("resident") === 1
          && col("status") === 3, 0)
          .otherwise(col("status"))))
    }

    state.write(MetaTable, spark.createDataFrame(Seq(Tuple1(batchId))).toDF("last_batch"))
  }

  private def currentHw(): HwState =
    if (state.exists(HwTable) && !state.read(HwTable, HwSchema).isEmpty) {
      val r = state.read(HwTable, HwSchema).first()
      HwState(r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getInt(4))
    } else HwState(-1L, -1L, -1L, "", 0)

  private def writeHw(h: HwState): Unit =
    state.write(HwTable, spark.createDataFrame(Seq(
      (h.previous, h.current, h.currentSeq, h.currentName, h.status)))
      .toDF("previous", "current", "current_seq", "current_name", "status"))

  /** S5: enqueue newly released/resident files — idempotent on file_id,
    * serialized against concurrent worker claims. */
  private def enqueue(objIds: DataFrame, resident: Int,
      window: Option[(Long, Long)]): Unit = state.locked {
    val now = new Timestamp(System.currentTimeMillis())
    val existing = state.read(QueueTable, QueueSchema)
    val fresh = objIds.select(col("obj_id").as("file_id"))
      .join(existing.select("file_id"), Seq("file_id"), "left_anti")
      .withColumn("resident", lit(resident))
      .withColumn("status", lit(0))
      .withColumn("added", lit(now))
      .withColumn("hw_before", window.map(w => lit(w._1)).getOrElse(lit(null).cast("long")))
      .withColumn("hw_after", window.map(w => lit(w._2)).getOrElse(lit(null).cast("long")))
      .withColumn("removed", lit(null).cast("timestamp"))
      .withColumn("started", lit(null).cast("timestamp"))
      .withColumn("finished", lit(null).cast("timestamp"))
      .withColumn("error_status", lit(0))
    state.write(QueueTable, existing.unionByName(fresh))
  }
}

object ChunkIngest {
  final case class HwState(previous: Long, current: Long, currentSeq: Long,
      currentName: String, status: Int)

  val ChunksTable = "chunks"
  val BadChunksTable = "bad_chunks"
  val HwTable = "hw"
  val HwLogTable = "hw_log"
  val QueueTable = "queue"
  val MetaTable = "meta"

  val ChunksSchema: StructType = StructType(Seq(
    StructField("name", StringType), StructField("sequence", IntegerType),
    StructField("size", LongType), StructField("hash", StringType),
    StructField("hash_ok", BooleanType)))

  val HwSchema: StructType = StructType(Seq(
    StructField("previous", LongType), StructField("current", LongType),
    StructField("current_seq", LongType), StructField("current_name", StringType),
    StructField("status", IntegerType)))

  val HwLogSchema: StructType = StructType(Seq(
    StructField("previous", LongType), StructField("current", LongType),
    StructField("current_seq", LongType), StructField("current_name", StringType)))

  /** `desh_files` (reference DDL `StreamingApp.scala:201`). */
  val QueueSchema: StructType = StructType(Seq(
    StructField("file_id", LongType), StructField("resident", IntegerType),
    StructField("status", IntegerType), StructField("added", TimestampType),
    StructField("hw_before", LongType), StructField("hw_after", LongType),
    StructField("removed", TimestampType), StructField("started", TimestampType),
    StructField("finished", TimestampType), StructField("error_status", IntegerType)))

  val MetaSchema: StructType = StructType(Seq(StructField("last_batch", LongType)))
}
