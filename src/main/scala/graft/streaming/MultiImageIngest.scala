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
  * metric rather than silently dropped.
  *
  * Routing is SINGLE-PASS: each micro-batch is tagged with its image key
  * and written once, partitioned by that key, into a staging dir — one job
  * scans the raw batch however many images are declared. Every machine
  * then reads ONLY its own `img=` subdirectory (true partition pruning, no
  * per-image filter pass over the whole batch), so a thousand-image fleet
  * costs one routing job plus each machine's own work over its own slice.
  * Each machine's chunk-metadata work is distributed, and its HW window
  * partitions by image name ([[graft.operators.HighWaterMark
  * .contiguousPrefixPerKey]]) — no global-sort stage anywhere.
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

  /** Route one micro-batch: ONE job writes the batch partitioned by image
    * key into the staging dir; each machine reads only its own partition.
    * Returns the count of chunks whose image nobody declared. Replay-safe:
    * staging is overwritten per batch and every machine carries its own
    * batch-id guard. */
  def processBatch(rawBlocks: Dataset[ImageBlock], batchId: Long): Long = {
    val s = rawBlocks.sparkSession
    import s.implicits._
    val staging = s"$stateRoot/_staging"
    // the single pass over the raw batch: tag + partitioned write
    rawBlocks.toDF()
      .withColumn("img",
        org.apache.spark.sql.functions.regexp_replace(
          org.apache.spark.sql.functions.col("filename"), "\\.[0-9]+$", ""))
      .write.mode("overwrite").partitionBy("img").parquet(staging)
    // present images = directory listing (no job); partition values are
    // URL-escaped by the writer, so decode for the declared-name match
    val dirs = Option(new java.io.File(staging).listFiles())
      .getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("img="))
      .map(f => java.net.URLDecoder.decode(f.getName.drop(4), "UTF-8") -> f.getPath)
      .toMap
    val blockSchema = implicitly[org.apache.spark.sql.Encoder[ImageBlock]].schema
    machines.foreach { case (img, m) =>
      dirs.get(img).foreach { path =>
        m.processBatch(
          s.read.schema(blockSchema).parquet(path).as[ImageBlock], batchId)
      }
    }
    val unknown = dirs.view.filterKeys(!images.keySet.contains(_)).toMap
    val unrouted =
      if (unknown.isEmpty) 0L
      else s.read.schema(blockSchema)
        .parquet(unknown.values.toSeq: _*).count()
    if (unrouted > 0 && batchId > lastUnroutedBatch) {
      lastUnroutedBatch = batchId
      unroutedTotal += unrouted
      Console.err.println(s"MultiImageIngest: batch $batchId dropped " +
        s"$unrouted chunk(s) for undeclared image(s) ${unknown.keys.mkString(", ")}")
    }
    unrouted
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
