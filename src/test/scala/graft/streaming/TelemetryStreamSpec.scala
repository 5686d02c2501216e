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

  private lazy val docs = graft.Tables.documents(spark, TestSession.sf)
    .select("doc_id", "source", "text")

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
}
