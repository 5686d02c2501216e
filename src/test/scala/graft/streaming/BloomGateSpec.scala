package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSession
import graft.operators.Decontamination

/** The at-ingest decontamination gate's contract, pinned on the fixture:
  *
  *  1. ZERO false negatives — no document q57 reports as contaminated
  *     ever passes the gate (the property that protects the eval).
  *  2. The false-positive trickle is bitmap-rate — clean documents
  *     wrongly dropped stay under 1% on the fixture.
  *  3. Stream ≡ batch: driving the same docs through a MemoryStream in
  *     micro-batches admits exactly the rows the static filter admits
  *     (the predicate is row-local, so arrival order is irrelevant).
  */
class BloomGateSpec extends AnyFunSuite {
  import TestSession.spark
  import spark.implicits._

  private lazy val docs = graft.Tables.documents(spark, TestSession.sf)
  private lazy val bench =
    docs.filter(col("doc_id") < Decontamination.BenchDocs)
  private lazy val corpus =
    docs.filter(col("doc_id") >= Decontamination.BenchDocs)
  private lazy val bloom = BloomGate.build(bench)

  test("no contaminated doc ever passes; false-positive drops under 1%") {
    val contaminated = Decontamination.q57Decontaminate(spark, TestSession.sf)
      .collect().map(_.getLong(0)).toSet
    val admitted = BloomGate.gate(corpus, bloom)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert((admitted & contaminated).isEmpty, "a contaminated doc passed the gate")
    val clean = corpus.select("doc_id").collect().map(_.getLong(0)).toSet -- contaminated
    val wronglyDropped = clean -- admitted
    assert(wronglyDropped.size <= math.max(1, clean.size / 100),
      s"${wronglyDropped.size} of ${clean.size} clean docs bloom-dropped")
  }

  test("null-text and shingle-less rows are admitted, matching batch q81") {
    // split(null) propagates null through the predicate; without the
    // coalesce the gate silently DROPPED null-text rows while the batch
    // gate admits them (no shingles → nothing to collide).
    val edge = Seq((900001L, null: String), (900002L, ""), (900003L, "one two"))
      .toDF("doc_id", "text")
    val admitted = BloomGate.gate(edge, bloom)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(admitted == Set(900001L, 900002L, 900003L),
      s"edge rows dropped by the gate: ${Set(900001L, 900002L, 900003L) -- admitted}")
  }

  test("stream through the gate == static filter, any batch split") {
    val rows = corpus.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expected = BloomGate.gate(corpus, bloom)
      .select("doc_id").collect().map(_.getLong(0)).toSet

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val q = BloomGate.gate(input.toDF().toDF("doc_id", "text"), bloom)
      .writeStream.format("memory").queryName("bloom_gate")
      .outputMode("append").start()
    try {
      rows.grouped(math.max(1, rows.length / 3)).foreach { b =>
        input.addData(b.toSeq)
        q.processAllAvailable()
      }
      val got = spark.table("bloom_gate").select("doc_id").collect()
        .map(_.getLong(0)).toSet
      assert(got == expected)
    } finally q.stop()
  }
}
