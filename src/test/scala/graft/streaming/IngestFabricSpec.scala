package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSession
import graft.operators.{Decontamination, Drift, Telemetry}

/** The full ingest FABRIC in one pass: BloomGate (decontaminate) feeding
  * THREE independent per-batch consumers of the same gated arrivals —
  * DedupStream (near-dup state), TelemetryStream (volume sketches), and
  * DriftStream (token-distribution deltas) — each writing its own
  * StateDir. Pinned: every served surface equals its one-shot batch twin
  * over the gate-surviving corpus. GatedIngestSpec pins the gate→dedup
  * composition in a real StreamingQuery; this spec drives the batch
  * hooks directly (the same code path foreachBatch runs) to pin that the
  * MONITORING stages compose with the gate exactly like the state stages
  * do: the gate is row-local, each consumer is batch-id-guarded and
  * split-invariant, so one arriving corpus can fan out to all of them
  * with no cross-talk.
  */
class IngestFabricSpec extends AnyFunSuite {
  import TestSession.spark
  import spark.implicits._

  test("gate -> {dedup, telemetry, drift} == the batch twins over the gated corpus") {
    val docs = graft.Tables.documents(spark, TestSession.sf)
    val bench = docs.filter(col("doc_id") < Decontamination.BenchDocs)
    val bloom = BloomGate.build(bench)
    val corpus = docs.filter(col("doc_id") >= Decontamination.BenchDocs)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq

    val gated = BloomGate.gate(
      corpus.toDF("doc_id", "source", "text"), bloom)

    // one-shot batch twins over the gated corpus
    val expectedPairs = graft.operators.Dedup.minhashPairsOf(
        gated.select("doc_id", "text"))
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val expectedTelemetry = Telemetry.estimates(
        Telemetry.mergeSketches(Telemetry.sourceSketches(gated)))
      .select("source", "n_docs", "n_tokens").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val expectedDrift = Drift.reportFrom(
        gated.select((col("doc_id") % 2).as("half"),
            explode(split(col("text"), " ")).as("tok"))
          .groupBy("half", "tok").agg(count(lit(1)).as("cnt")))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq

    // the fabric: one gated arrival sequence, three per-batch consumers
    def dir(p: String) = Files.createTempDirectory(p).toString
    val ds = new DedupStream(spark, new StateDir(spark, dir("fab-dedup")))
    val ts = new TelemetryStream(spark, new StateDir(spark, dir("fab-telem")))
    val dr = new DriftStream(spark, new StateDir(spark, dir("fab-drift")))
    corpus.grouped(math.max(1, corpus.length / 4)).zipWithIndex.foreach {
      case (b, i) =>
        val batch = BloomGate.gate(b.toDF("doc_id", "source", "text"), bloom)
        ds.processBatch(batch.select("doc_id", "text"), i.toLong)
        ts.processBatch(batch, i.toLong)
        dr.processBatch(batch.select("doc_id", "text"), i.toLong)
    }

    val gotPairs = ds.pairsSnapshot.select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(gotPairs == expectedPairs, "fabric dedup state != batch twin")

    val gotTelemetry = ts.snapshot.select("source", "n_docs", "n_tokens")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(gotTelemetry == expectedTelemetry, "fabric telemetry != batch twin")

    val gotDrift = dr.report.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(gotDrift == expectedDrift, "fabric drift report != batch twin")
  }
}
