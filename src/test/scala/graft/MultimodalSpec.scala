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
}
