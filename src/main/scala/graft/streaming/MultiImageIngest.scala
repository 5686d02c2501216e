package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Per-image ingest inputs: declared total size, the image's TSK tables
  * (files/layout/fsinfo — the reference loads these per image,
  * `StreamingApp.scala:117-143`), and an optional chunk-bytes sink dir. */
final case class ImageSpec(imageSize: Long, files: DataFrame, layout: DataFrame,
    fsInfo: DataFrame, chunkSink: Option[String] = None)

/** Many-image ingest coordinator (SURVEY.md §7.5 "partition by image key").
  *
  * The reference runs ONE StreamingApp per disk image; a fleet of images
  * means a fleet of apps sharing a Kafka topic. This coordinator is that
  * fleet inside one streaming query: each declared image gets its own
  * [[ChunkIngest]] state machine over its own [[StateDir]] subdirectory
  * (state isolation = the reference's per-app Postgres schema), and every
  * micro-batch routes chunks to machines by image key — the filename minus
  * its trailing `.N` sequence suffix. HW advance, release windows,
  * thresholds, and completion all run per image, independently.
  *
  * Chunks for undeclared images are counted in the per-batch `unrouted`
  * metric rather than silently dropped. Scale: the per-batch driver loop is
  * O(|declared images|); each machine's chunk-metadata work is distributed,
  * and its HW window partitions by image name ([[graft.operators
  * .HighWaterMark.contiguousPrefixPerKey]]) — no global-sort stage anywhere.
  */
final class MultiImageIngest(
    spark: SparkSession,
    stateRoot: String,
    images: Map[String, ImageSpec]) extends Serializable {

  import MultiImageIngest.imageOf

  val machines: Map[String, ChunkIngest] = images.map { case (img, spec) =>
    img -> new ChunkIngest(spark, new StateDir(spark, s"$stateRoot/$img"),
      spec.imageSize, spec.files, spec.layout, spec.fsInfo, spec.chunkSink)
  }

  def machine(img: String): ChunkIngest = machines(img)

  /** Cumulative count of chunks whose image nobody declared — the
    * streaming path's record that drops happened (the scaladoc's
    * "counted, not silently dropped" contract). Replay-guarded: a
    * re-delivered batch id does not double-count. */
  @volatile var unroutedTotal: Long = 0L
  @volatile private var lastUnroutedBatch: Long = -1L

  /** T7 fleet-wide: every declared image fully ingested. */
  def isDone: Boolean = machines.values.forall(_.isDone)

  def doneFor(img: String): Boolean = machines(img).isDone

  /** Route one micro-batch: each machine sees only its image's chunks.
    * Returns the count of chunks whose image nobody declared. */
  def processBatch(rawBlocks: Dataset[ImageBlock], batchId: Long): Long = {
    import rawBlocks.sparkSession.implicits._
    val blocks = rawBlocks.persist()
    try {
      val present = blocks.map(b => imageOf(b.filename)).distinct()
        .collect().toSet
      machines.foreach { case (img, m) =>
        if (present(img))
          m.processBatch(blocks.filter(b => imageOf(b.filename) == img), batchId)
      }
      val unknown = present.diff(images.keySet)
      val unrouted =
        if (unknown.isEmpty) 0L
        else blocks.filter(b => unknown(imageOf(b.filename))).count()
      if (unrouted > 0 && batchId > lastUnroutedBatch) {
        lastUnroutedBatch = batchId
        unroutedTotal += unrouted
        Console.err.println(s"MultiImageIngest: batch $batchId dropped " +
          s"$unrouted chunk(s) for undeclared image(s) ${unknown.mkString(", ")}")
      }
      unrouted
    } finally blocks.unpersist()
  }

  /** One streaming query for the whole fleet. */
  def start(blocks: Dataset[ImageBlock], trigger: Trigger,
      checkpoint: String): StreamingQuery = {
    val batchFn: (Dataset[ImageBlock], Long) => Unit =
      (ds, id) => { processBatch(ds, id); () }
    blocks
      .observe("ingest_fleet",
        count(lit(1)).as("n_chunks"),
        coalesce(sum(length(col("data"))), lit(0L)).as("n_bytes"))
      .writeStream
      .trigger(trigger)
      .option("checkpointLocation", checkpoint)
      .foreachBatch(batchFn)
      .start()
  }
}

object MultiImageIngest {
  /** Image key: filename minus the trailing `.N` chunk-sequence suffix
    * (reference filename shape `StreamingDiskUtil.scala:31,38`). */
  def imageOf(filename: String): String =
    filename.replaceAll("\\.[0-9]+$", "")
}
