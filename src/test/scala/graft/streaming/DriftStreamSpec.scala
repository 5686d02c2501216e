package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSession
import graft.operators.Drift

/** The incremental-drift contract: the report served from StateDir count
  * deltas is IDENTICAL to the one-shot batch q85 on the same corpus —
  * whatever the batch split (counts are associative sums) — and a
  * replayed batch changes nothing. This closes the monitoring loop:
  * TelemetryStream watches per-source volume; DriftStream watches the
  * token distribution itself.
  */
class DriftStreamSpec extends AnyFunSuite {
  import TestSession.spark

  private lazy val docs = graft.Tables.documents(spark, TestSession.sf)
    .select("doc_id", "text")

  private def reportRows(df: org.apache.spark.sql.DataFrame) =
    df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq

  private def drive(mod: Int): (Seq[(String, Long, Long, Long, Long, Long)], String) = {
    val root = Files.createTempDirectory(s"drift$mod").toString
    val ds = new DriftStream(spark, new StateDir(spark, root))
    (0 until mod).foreach { i =>
      ds.processBatch(docs.filter(col("doc_id") % mod === i), i.toLong)
    }
    (reportRows(ds.report), root)
  }

  test("served drift report == one-shot q85; split-invariant; replay is a no-op") {
    val batch = reportRows(Drift.q85DriftReport(spark, TestSession.sf))
    val (got3, root3) = drive(3)
    val (got5, _) = drive(5)
    assert(got3 == batch, "served report diverged from the batch q85")
    assert(got5 == batch, "served report depends on the batch split")

    // replay an already-committed batch — the served report is unchanged
    val ds = new DriftStream(spark, new StateDir(spark, root3))
    ds.processBatch(docs.filter(col("doc_id") % 3 === 1), 1L)
    assert(reportRows(ds.report) == batch, "replayed batch mutated the report")
  }

  test("count deltas across a compaction boundary: report and guard survive") {
    val st = new StateDir(spark,
      Files.createTempDirectory("driftc").toString, compactEvery = 2)
    val ds = new DriftStream(spark, st)
    (0 until 5).foreach { i => // 5 deltas at compactEvery=2: folds twice
      ds.processBatch(docs.filter(col("doc_id") % 5 === i), i.toLong)
    }
    val batch = reportRows(Drift.q85DriftReport(spark, TestSession.sf))
    assert(reportRows(ds.report) == batch, "compaction changed the report")
    // replay of a batch folded into a compacted version — tag must survive
    ds.processBatch(docs.filter(col("doc_id") % 5 === 0), 0L)
    assert(reportRows(ds.report) == batch, "replay after compaction double-counted")
  }
}
