package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSession
import graft.operators.IvfIndex

/** The at-ingest index-maintenance contract: streaming new vectors
  * through [[IndexStream]] serves exactly what one batch `addBatch` of
  * the same vectors serves — whatever the batch split — and a replayed
  * batch changes nothing. Together with IvfIndexSpec (build/serve/q86)
  * this closes the ANN lifecycle: train once, serve many, ingest
  * incrementally, retrain when DriftStream says so.
  */
class IndexStreamSpec extends AnyFunSuite {
  import TestSession.spark

  private val sf = "/root/testdata/sf0.001"

  // new vectors: clones of 490..499 under ids 10000..10009 (rank-1
  // neighbors known by construction)
  private lazy val clones = graft.Tables.embeddings(spark, sf)
    .filter(col("vec_id").between(490L, 499L))
    .select((col("vec_id") + 9510L).as("vec_id"), col("embedding"))

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getInt(4))).toSeq

  private def streamed(mod: Int): (Seq[(Long, Long, Long, Double, Int)], IndexStream) = {
    val is = new IndexStream(spark,
      new StateDir(spark, Files.createTempDirectory(s"ixs$mod").toString))
    is.index.build(sf)
    (0 until mod).foreach { i =>
      is.processBatch(clones.filter(col("vec_id") % mod === i), i.toLong)
    }
    (rows(is.index.query(10000L, 10L)), is)
  }

  test("streamed ingest == one-shot addBatch; split-invariant; replay no-op") {
    val oneShot = new IvfIndex(spark,
      new StateDir(spark, Files.createTempDirectory("ixb").toString))
    oneShot.build(sf)
    oneShot.addBatch(clones)
    val expected = rows(oneShot.query(10000L, 10L))
    assert(expected.nonEmpty)

    val (got2, is2) = streamed(2)
    val (got3, _) = streamed(3)
    assert(got2 == expected, "streamed index diverged from batch addBatch")
    assert(got3 == expected, "served rows depend on the batch split")

    // replay an already-committed batch — served rows unchanged
    is2.processBatch(clones.filter(col("vec_id") % 2 === 1), 1L)
    assert(rows(is2.index.query(10000L, 10L)) == expected,
      "replayed batch mutated the index")
  }

  test("an EMPTY batch still commits its ledger row (hasBatch answers true)") {
    // owner logic polling the ledger for completion must see every
    // processed batch id — an empty micro-batch skipped before addBatch
    // would leave a permanent hole.
    val is = new IndexStream(spark,
      new StateDir(spark, Files.createTempDirectory("ixe").toString))
    is.index.build(sf)
    val before = rows(is.index.query(490L, 10L))
    is.processBatch(clones.filter(col("vec_id") < 0L), 5L)
    assert(is.index.hasBatch(5L), "empty batch left no ledger row")
    assert(rows(is.index.query(490L, 10L)) == before,
      "empty batch mutated the served rows")
  }

  test("ingest across a compaction boundary: serve and replay guard survive") {
    // the subtle path: the build-time base version has NO batch_id
    // column; compaction unions tagged deltas with null-tagged base rows
    // into one full version. Both the serving projection and the guard's
    // tagged read must come through it unchanged.
    val st = new StateDir(spark,
      Files.createTempDirectory("ixc").toString, compactEvery = 2)
    val is = new IndexStream(spark, st)
    is.index.build(sf)
    (0 until 5).foreach { i => // 5 deltas at compactEvery=2: folds twice
      is.processBatch(clones.filter(col("vec_id") % 5 === i), i.toLong)
    }
    val oneShot = new IvfIndex(spark,
      new StateDir(spark, Files.createTempDirectory("ixc1").toString))
    oneShot.build(sf)
    oneShot.addBatch(clones)
    val expected = rows(oneShot.query(10000L, 10L))
    assert(rows(is.index.query(10000L, 10L)) == expected,
      "compaction changed the served rows")
    // replay of a batch whose rows were folded into a compacted full
    // version — the tag must survive compaction for the guard to hold
    is.processBatch(clones.filter(col("vec_id") % 5 === 0), 0L)
    assert(rows(is.index.query(10000L, 10L)) == expected,
      "replay after compaction duplicated rows")
  }
}
