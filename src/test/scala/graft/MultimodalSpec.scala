package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

/** Binary-column plumbing: typed mapPartitions batch decode over opaque
  * payloads (the mapInPandas-shaped stage with the stub decoder). */
class MultimodalSpec extends AnyFunSuite {
  import TestSession.spark

  test("extractMeta decodes every payload with exact stub semantics") {
    val docs = Tables.documents(spark, TestSession.sf)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
    val metas = Multimodal.extractMeta(docs).collect()
    assert(metas.length == docs.count())

    // exact per-row check against a driver-side recompute on a sample.
    val sample = docs.orderBy("doc_id").limit(5).collect()
    val byId = metas.map(m => m.docId -> m).toMap
    sample.foreach { r =>
      val payload = r.getAs[Array[Byte]]("payload")
      val (w, h) = Multimodal.decodeStub(payload)
      val m = byId(r.getLong(0))
      assert(m.nBytes == payload.length.toLong)
      assert(m.width == w && m.height == h)
    }
    assert(metas.forall(m => m.width >= 256 && m.width < 1280))
    assert(metas.forall(m => m.height >= 256 && m.height < 1024))
  }

  private def payloads = Tables.documents(spark, TestSession.sf)
    .select(col("doc_id"), col("text").cast("binary").as("payload"))

  test("resize keeps row count and shrinks payloads to the target budget") {
    val out = Multimodal.resize(payloads, 64, 64).collect()
    assert(out.length == payloads.count())
    assert(out.forall(r => r.width == 64 && r.height == 64))
    assert(out.forall(r => r.payload.length <= 64 * 64 / 64))
    val one = payloads.orderBy("doc_id").limit(1).collect().head
    val expect = Multimodal.resizeStub(one.getAs[Array[Byte]]("payload"), 64, 64)
    assert(out.find(_.docId == one.getLong(0)).get.payload.toSeq == expect.toSeq)
  }

  test("sampleFrames explodes every Nth fixed-size slice with timestamps") {
    import TestSession.spark.implicits._
    val video = Seq((7L, Array.tabulate(100)(_.toByte))).toDF("doc_id", "payload")
    val frames = Multimodal.sampleFrames(video, frameBytes = 10, everyNth = 3)
      .collect().sortBy(_.frameNo)
    // 10 full frames, every 3rd → frames 0,3,6,9
    assert(frames.map(_.frameNo).toSeq == Seq(0, 3, 6, 9))
    assert(frames.map(_.tsMs).toSeq == Seq(0L, 100L, 200L, 300L))
    assert(frames.forall(_.payload.length == 10))
    assert(frames(1).payload.toSeq == (30 until 40).map(_.toByte).toSeq)
  }

  /** Render a deterministic PNG (horizontal red→blue gradient) in-test —
    * a REAL image payload for the production codec path. */
  private def pngBytes(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val r = (x * 255) / math.max(1, w - 1)
      img.setRGB(x, y, (r << 16) | (255 - r))
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  test("JdkImageDecoders runs the production stages over real PNG payloads") {
    import TestSession.spark.implicits._
    val imgs = Seq((1L, pngBytes(64, 48)), (2L, pngBytes(128, 32)))
      .toDF("doc_id", "payload")
    // true dimensions through the SAME extractMeta stage q47 uses
    val metas = Multimodal.extractMeta(imgs, Multimodal.JdkImageDecoders)
      .collect().map(m => m.docId -> m).toMap
    assert(metas(1L).width == 64 && metas(1L).height == 48)
    assert(metas(2L).width == 128 && metas(2L).height == 32)
    assert(metas(1L).nBytes == pngBytes(64, 48).length.toLong)

    // resize re-encodes a real raster: decoding the output yields the
    // target dimensions (stub payloads can't do that — they aren't images)
    val resized = Multimodal.resize(imgs, 32, 24, Multimodal.JdkImageDecoders)
      .collect().map(r => r.docId -> r.payload).toMap
    assert(Multimodal.JdkImageDecoders.decode(resized(1L)) == (32, 24))
    assert(Multimodal.JdkImageDecoders.decode(resized(2L)) == (32, 24))

    // features: 16-dim, deterministic, ANN-compatible
    val feats = Multimodal.extractFeatures(imgs, Multimodal.JdkImageDecoders)
    assert(feats.schema("embedding").dataType ==
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType, false))
    val v = feats.filter(col("doc_id") === 1L).collect()
      .head.getAs[scala.collection.Seq[Float]](1)
    assert(v.length == 16)
    // gradient: B = 255 - R per pixel, G identically 0, luma hist sums to 1
    assert(math.abs(v(0) + v(2) - 255.0) < 0.01 && v(1) == 0.0f)
    assert(math.abs(v.drop(6).map(_.toDouble).sum - 1.0) < 1e-3)
    // distributed and driver-side kernels agree bit-exactly
    val local = Multimodal.JdkImageDecoders.features(pngBytes(64, 48))
    assert(v.toSeq == local.toSeq)
    // a non-image payload fails loudly, not silently
    intercept[Exception] {
      Multimodal.JdkImageDecoders.decode("not an image".getBytes)
    }
  }

  test("extractMetaTolerant quarantines corrupt payloads, conserves rows, observes the volume") {
    import TestSession.spark.implicits._
    val mixed = Seq(
      (1L, pngBytes(64, 48)),
      (2L, "definitely not an image".getBytes("UTF-8")),
      (3L, pngBytes(16, 16)),
      (4L, Array.emptyByteArray))
      .toDF("doc_id", "payload")
    val out = Multimodal.extractMetaTolerant(mixed, Multimodal.JdkImageDecoders)
    val rows = out.collect().map(r => (r.getLong(0),
      if (r.isNullAt(2)) None else Some(r.getInt(2)),
      if (r.isNullAt(4)) None else Some(r.getString(4)))).sortBy(_._1)
    assert(rows.length == 4, "row conservation violated")
    assert(rows(0)._2.contains(64) && rows(0)._3.isEmpty)
    assert(rows(2)._2.contains(16) && rows(2)._3.isEmpty)
    assert(rows(1)._2.isEmpty && rows(1)._3.nonEmpty, "garbage payload not quarantined")
    assert(rows(3)._2.isEmpty && rows(3)._3.nonEmpty, "empty payload not quarantined")
    val m = out.queryExecution.observedMetrics("graft_media_quarantine")
    assert(m.getAs[Long]("quarantined") == 2L && m.getAs[Long]("total") == 4L)
  }

  test("extractFeatures emits array<float> embeddings compatible with the ANN ops") {
    val feats = Multimodal.extractFeatures(payloads)
    assert(feats.schema("embedding").dataType ==
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType, false))
    val rows = feats.collect()
    assert(rows.length == payloads.count())
    // L1-normalized histogram: sums to ~1 for non-empty payloads
    rows.foreach { r =>
      val v = r.getAs[scala.collection.Seq[Float]](1)
      assert(v.length == 16 && math.abs(v.map(_.toDouble).sum - 1.0) < 1e-3)
    }
    // and the ANN hot path accepts it: graft_dot over the derived vectors
    val d = feats.select(graft.functions.Vectors.dot(col("embedding"), col("embedding")).as("d"))
      .agg(min("d")).collect().head.getDouble(0)
    assert(d > 0.0)
  }
}
