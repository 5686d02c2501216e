package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Per-image chunk arrival event (the many-image generalization of the
  * single-image stream — SURVEY.md §7.5 "partition by image/device id and
  * keep per-key sequences"). */
final case class ChunkEvent(image: String, sequence: Int, size: Long)

/** Per-image incremental HW state: the first missing sequence, the bytes of
  * the contiguous prefix, and the out-of-order chunks waiting for the gap
  * to close. Replay-safe: duplicates (< nextSeq or already pending) no-op. */
final case class ImageState(nextSeq: Int, hw: Long, pending: Map[Int, Long])

/** Per-image HW after a batch: `hwSeq` = last contiguous sequence (-1 none);
  * `complete` = the image reached its declared total size and its state was
  * evicted from the store. */
final case class HwUpdate(image: String, hw: Long, hwSeq: Int, nPending: Int,
    complete: Boolean)

/** Cross-batch high-water-mark state via `mapGroupsWithState` (T4's typed
  * alternative to the [[ChunkIngest]] foreachBatch design; reference
  * semantics `StreamingApp.scala:238-252`).
  *
  * Where [[ChunkIngest]] recomputes the prefix from the full chunk table
  * each batch (exact reference behavior, one image), this tracker is the
  * 1000-executor shape: state is KEYED BY IMAGE and lives in the state
  * store (sharded across executors by key — thousands of concurrent images
  * scale horizontally), and each batch does O(batch) incremental work:
  * buffer out-of-order chunks, then advance the mark while the next
  * expected sequence is present. Late chunks only ever close gaps — the
  * reference's no-drop late policy (T5), not a watermark eviction.
  */
object HwStateTracker {

  /** State lifecycle at scale: with millions of images over a job's life,
    * completed images must LEAVE the state store or it grows without
    * bound. When the per-image total size is known (`totalSizes`), a state
    * whose HW reaches it is evicted after emitting its final update —
    * safe because a complete gap-free prefix admits no further chunks.
    * Caveat (deliberate): eviction assumes the source does not redeliver a
    * completed image's chunks — true in the intended wiring (Structured
    * Streaming checkpoints state atomically with source offsets, so batch
    * replay cannot resurrect an evicted key; only duplicates INSIDE the
    * input data can). Such a stray duplicate starts a cold state,
    * distinguishable by `complete=false` and hw < total — consumers
    * treating HW as monotonic per image ignore it; if the input is known
    * dirty, run without `totalSizes` and evict administratively. */
  private[streaming] def updateImage(totalSizes: Map[String, Long])(
      image: String,
      chunks: Iterator[ChunkEvent],
      state: GroupState[ImageState]): HwUpdate = {
    var st = state.getOption.getOrElse(ImageState(0, 0L, Map.empty))
    chunks.foreach { c =>
      if (c.sequence >= st.nextSeq && !st.pending.contains(c.sequence))
        st = st.copy(pending = st.pending + (c.sequence -> c.size))
    }
    while (st.pending.contains(st.nextSeq)) {
      st = ImageState(st.nextSeq + 1, st.hw + st.pending(st.nextSeq),
        st.pending - st.nextSeq)
    }
    val complete = totalSizes.get(image).exists(st.hw >= _)
    if (complete) state.remove() else state.update(st)
    HwUpdate(image, st.hw, st.nextSeq - 1, st.pending.size, complete)
  }

  /** Attach: chunk stream → per-image HW updates (one row per image per
    * batch that touched it). `totalSizes`: known image sizes for state
    * eviction on completion (empty ⇒ states live for the job's duration). */
  def track(chunks: Dataset[ChunkEvent],
      totalSizes: Map[String, Long] = Map.empty): Dataset[HwUpdate] = {
    import chunks.sparkSession.implicits._
    chunks.groupByKey(_.image)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(updateImage(totalSizes))
  }

  /** The streaming query: Update mode (each batch re-emits touched keys). */
  def start(chunks: Dataset[ChunkEvent], queryName: String,
      totalSizes: Map[String, Long] = Map.empty) =
    track(chunks, totalSizes).writeStream
      .outputMode(OutputMode.Update())
      .format("memory")
      .queryName(queryName)
      .start()
}
