package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}

/** Multimodal column plumbing (north-star surface): image/audio/video as
  * opaque binary columns with typed metadata, processed in PARTITION-SIZED
  * BATCHES via `mapPartitions` — the Scala analog of a Pandas-UDF
  * `mapInPandas` stage: one iterator per partition, the decoder amortizes
  * its setup (model load, codec init) across the whole batch instead of
  * paying it per row.
  *
  * The decode itself is a clearly-marked deterministic STUB — the image and
  * audio libraries are not in this environment, so [[decodeStub]] fakes
  * width/height from the payload's bytes. Everything around it is real and
  * tested: the binary schema, the typed Encoder boundary, the batch shape,
  * and the shuffle-free plan (a pure per-partition projection).
  */
object Multimodal {

  /** Typed record for decoded media metadata. */
  final case class MediaMeta(docId: Long, nBytes: Long, width: Int, height: Int)

  /** STUB decoder — stands in for a real `ImageIO.read`/ffmpeg call.
    * Deterministic: dimensions derive from payload content so tests can
    * assert exact values. A production build swaps ONLY this function. */
  def decodeStub(payload: Array[Byte]): (Int, Int) = {
    val a = if (payload.length > 0) payload(0) & 0xff else 0
    val b = if (payload.length > 1) payload(1) & 0xff else 0
    (256 + (a * 7 + b) % 1024, 256 + (b * 7 + a) % 768)
  }

  /** Batch decode: (doc_id, payload binary) rows → typed [[MediaMeta]].
    * The per-partition setup slot (where a real decoder would init) runs
    * once per batch, then streams the iterator — no materialization. */
  def extractMeta(rows: DataFrame): Dataset[MediaMeta] = {
    import rows.sparkSession.implicits._
    rows.select("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-batch decoder init happens HERE (once per partition)
        it.map { case (id, payload) =>
          val (w, h) = decodeStub(payload)
          MediaMeta(id, payload.length.toLong, w, h)
        }
      }
  }
}
