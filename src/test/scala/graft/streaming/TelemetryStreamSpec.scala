package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSession
import graft.operators.Telemetry

/** The incremental-telemetry contract: exact companions exactly match the
  * one-shot batch run whatever the batch split, estimates stay inside the
  * HLL envelope, the served numbers are SPLIT-INVARIANT (union algebra
  * through the StateDir path), and a replayed batch changes nothing.
  */
class TelemetryStreamSpec extends AnyFunSuite {
  import TestSession.spark

  // full batch schema: the stream's two legs need source (HLL telemetry)
  // AND lang (KMV vocab) — a production micro-batch carries both
  private lazy val docs = graft.Tables.documents(spark, TestSession.sf)
    .select("doc_id", "source", "lang", "text")

  private def drive(mod: Int, root: String): Map[String, (Long, Long, Long)] = {
    val ts = new TelemetryStream(spark, new StateDir(spark, root))
    (0 until mod).foreach { i =>
      ts.processBatch(docs.filter(col("doc_id") % mod === i), i.toLong)
    }
    ts.snapshot.select("source", "n_docs", "n_tokens", "distinct_tokens_est")
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
  }

  test("stream state == one-shot batch; split-invariant; replay is a no-op") {
    val exact = docs
      .select(col("source"), col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .groupBy("source")
      .agg(count_distinct(col("doc_id")).as("nd"), count(lit(1)).as("nt"),
        count_distinct(col("tok")).as("dx"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap

    val root3 = Files.createTempDirectory("telem3").toString
    val got3 = drive(3, root3)
    val got5 = drive(5, Files.createTempDirectory("telem5").toString)
    assert(got3 == got5, "served telemetry depends on the batch split")
    got3.foreach { case (src, (nd, nt, est)) =>
      val (end, ent, ex) = exact(src)
      assert(nd == end && nt == ent, s"$src exact companions drifted")
      assert(math.abs(est - ex).toDouble / ex <= 0.05,
        s"$src estimate $est outside 5% of exact $ex")
    }

    // replay: re-drive an already-committed batch — snapshot unchanged
    val ts = new TelemetryStream(spark, new StateDir(spark, root3))
    ts.processBatch(docs.filter(col("doc_id") % 3 === 1), 1L)
    val replayed = ts.snapshot
      .select("source", "n_docs", "n_tokens", "distinct_tokens_est").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(replayed == got3, "replayed batch mutated the served state")
  }

  private lazy val langDocs = docs

  private def driveVocab(mod: Int): Map[String, (Long, Int, Long)] = {
    val ts = new TelemetryStream(spark,
      new StateDir(spark, Files.createTempDirectory(s"telemkmv$mod").toString))
    // deliberately scrambled arrival: highest residue first
    (mod - 1 to 0 by -1).foreach { i =>
      ts.processBatch(langDocs.filter(col("doc_id") % mod === i), i.toLong)
    }
    ts.vocabSnapshot.select("lang", "kth_min", "n_mins", "kmv_est")
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getInt(2), r.getLong(3)))
      .toMap
  }

  test("KMV vocab leg: stream == one-shot batch sketch under any " +
    "arrival order (q112's merge law through the StateDir path)") {
    // the one-shot batch twin: q112's per-lang sketch served sketch-only
    val batch = graft.operators.Sketch.kmvServe(
      graft.operators.Sketch.langKmins(langDocs))
      .select("lang", "kth_min", "n_mins", "kmv_est")
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getInt(2), r.getLong(3)))
      .toMap
    val got3 = driveVocab(3)
    val got5 = driveVocab(5)
    assert(got3 == batch, "3-batch stream state != one-shot batch sketch")
    assert(got5 == batch, "5-batch stream state != one-shot batch sketch")
  }

  test("KMV vocab leg: replay is a no-op and heals a torn write") {
    val root = Files.createTempDirectory("telemkmvheal").toString
    val state = new StateDir(spark, root)
    val ts = new TelemetryStream(spark, state)
    ts.processBatch(langDocs.filter(col("doc_id") % 2 === 0), 0L)
    // tear batch 1: commit ONLY the HLL half (simulates a crash between
    // the two appends), then replay — the KMV half must be healed, the
    // HLL half must not duplicate
    state.locked {
      state.append(TelemetryStream.Table,
        graft.operators.Telemetry.sourceSketches(
          langDocs.filter(col("doc_id") % 2 === 1))
          .withColumn("batch_id", lit(1L)))
    }
    ts.processBatch(langDocs.filter(col("doc_id") % 2 === 1), 1L)
    val vocab = ts.vocabSnapshot.select("lang", "kth_min", "n_mins", "kmv_est")
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getInt(2), r.getLong(3)))
      .toMap
    val batch = graft.operators.Sketch.kmvServe(
      graft.operators.Sketch.langKmins(langDocs))
      .select("lang", "kth_min", "n_mins", "kmv_est")
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getInt(2), r.getLong(3)))
      .toMap
    assert(vocab == batch, "healed stream state != one-shot batch sketch")
    // full replay of both committed batches: nothing changes
    ts.processBatch(langDocs.filter(col("doc_id") % 2 === 0), 0L)
    val again = ts.vocabSnapshot.select("lang", "kth_min", "n_mins", "kmv_est")
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getInt(2), r.getLong(3)))
      .toMap
    assert(again == vocab, "replayed batch mutated the vocab state")
  }
}
