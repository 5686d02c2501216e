package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSession
import graft.operators.{Decontamination, Dedup}

/** The production ingest composition: BloomGate (decontaminate) UPSTREAM
  * of DedupStream (near-dup state) in one streaming pipeline. Pinned:
  * the composed stream's pair state equals the one-shot batch pipeline
  * over the gate-surviving corpus, and no contaminated doc ever enters
  * the dedup state. The gate is a row-local filter, so it composes with
  * any downstream stage without touching its state machinery — that
  * composability IS the property under test.
  */
class GatedIngestSpec extends AnyFunSuite {
  import TestSession.spark
  import spark.implicits._

  test("BloomGate -> DedupStream == batch pipeline over the gated corpus") {
    val docs = graft.Tables.documents(spark, TestSession.sf)
    val bench = docs.filter(col("doc_id") < Decontamination.BenchDocs)
    val bloom = BloomGate.build(bench)

    val corpus = docs.filter(col("doc_id") >= Decontamination.BenchDocs)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq

    // one-shot expectation: gate in batch, then the q20 pair pipeline
    val gated = BloomGate.gate(corpus.toDF("doc_id", "text"), bloom)
    val expectedPairs = Dedup.minhashPairsOf(gated)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val gatedIds = gated.select("doc_id").collect().map(_.getLong(0)).toSet

    // streamed: the same gate inside the stream, feeding the dedup state
    val st = new StateDir(spark, Files.createTempDirectory("gated-").toString)
    val ds = new DedupStream(spark, st)
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val query = ds.start(
      BloomGate.gate(input.toDF().toDF("doc_id", "text"), bloom),
      org.apache.spark.sql.streaming.Trigger.ProcessingTime(0),
      Files.createTempDirectory("gated-ckpt-").toString)
    corpus.grouped(math.max(1, corpus.length / 3)).foreach { b =>
      input.addData(b)
      query.processAllAvailable()
    }
    query.stop()

    val gotPairs = ds.pairsSnapshot.select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(gotPairs == expectedPairs)

    val signedIds = ds.sigSnapshot.select("doc_id").collect()
      .map(_.getLong(0)).toSet
    assert(signedIds == gatedIds, "dedup state holds a doc the gate dropped")
  }
}
