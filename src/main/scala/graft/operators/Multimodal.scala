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

  /** Decoded-and-resized media row: payload re-encoded at target size. */
  final case class ResizedMedia(docId: Long, width: Int, height: Int,
      payload: Array[Byte])

  /** STUB resize kernel — stands in for a real scaler. Deterministic:
    * output bytes sample the input at a fixed stride so the payload
    * genuinely shrinks with the target size. Swap ONLY this function. */
  def resizeStub(payload: Array[Byte], w: Int, h: Int): Array[Byte] = {
    if (payload.isEmpty) return payload // zero-byte blob: nothing to sample
    val outLen = math.max(1, math.min(payload.length, w * h / 64))
    val stride = math.max(1, payload.length / outLen)
    Array.tabulate(outLen)(i => payload(math.min(i * stride, payload.length - 1)))
  }

  /** Batch resize: the transform-shaped multimodal stage (binary in →
    * binary out, same row count). Like [[extractMeta]], a per-partition
    * batch so a real scaler inits once per batch. */
  def resize(rows: DataFrame, w: Int, h: Int): Dataset[ResizedMedia] = {
    import rows.sparkSession.implicits._
    rows.select("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions(it => it.map { case (id, payload) =>
        ResizedMedia(id, w, h, resizeStub(payload, w, h))
      })
  }

  /** One sampled frame of a (fake) video payload. */
  final case class Frame(docId: Long, frameNo: Int, tsMs: Long,
      payload: Array[Byte])

  /** Batch frame sampling: the GENERATOR-shaped multimodal stage — one
    * binary video row explodes into every Nth frame. The stub treats the
    * payload as fixed-size frame slices; a real build swaps the slicer for
    * a demuxer, the `flatMap`/iterator plumbing is the operator. Row
    * explosion happens streamingly (Iterator, never a per-row buffer), so
    * a long video never materializes all frames in executor memory. */
  def sampleFrames(rows: DataFrame, frameBytes: Int,
      everyNth: Int, fps: Double = 30.0): Dataset[Frame] = {
    import rows.sparkSession.implicits._
    require(frameBytes > 0 && everyNth > 0)
    rows.select("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions(it => it.flatMap { case (id, payload) =>
        val nFrames = payload.length / frameBytes
        Iterator.range(0, nFrames, everyNth).map { f =>
          Frame(id, f, (f * 1000L / fps).toLong,
            java.util.Arrays.copyOfRange(payload, f * frameBytes, (f + 1) * frameBytes))
        }
      })
  }

  /** STUB feature extractor — stands in for an embedding model forward
    * pass: a 16-bin byte histogram, L1-normalized. Deterministic, and the
    * output column type (`array<float>`) matches the `embeddings` table, so
    * downstream ANN/near-dup (q21/q28/q40/q46) consume it unchanged. */
  def featureStub(payload: Array[Byte]): Array[Float] = {
    val hist = new Array[Float](16)
    payload.foreach(b => hist((b & 0xff) / 16) += 1.0f)
    val n = math.max(1, payload.length).toFloat
    hist.map(_ / n)
  }

  /** Batch feature extraction: binary → embedding vector. The per-batch
    * init slot is where a real model loads ONCE per partition (the whole
    * point of the mapInPandas/mapPartitions batch shape — never per row). */
  def extractFeatures(rows: DataFrame): DataFrame = {
    import rows.sparkSession.implicits._
    rows.select("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // model load happens HERE (once per partition)
        it.map { case (id, payload) => (id, featureStub(payload)) }
      }
      .toDF("doc_id", "embedding")
  }
}
