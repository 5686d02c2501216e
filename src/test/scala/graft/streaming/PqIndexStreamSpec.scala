package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSession
import graft.operators.{IvfIndex, PqIndex}

/** [[IndexStream]] over the multi-table index: streaming new vectors
  * into a [[PqIndex]] serves exactly what one batch `addBatch` of the
  * same vectors serves — whatever the batch split — a replayed batch
  * changes nothing, and (the reason the replay guard lives in the index,
  * not the stream) a batch TORN between the assignment and codes appends
  * is completed by its re-drive: exactly the missing table commits, no
  * duplicate assignment rows, no code-less candidates vanishing from the
  * ADC stage. */
class PqIndexStreamSpec extends AnyFunSuite {
  import TestSession.spark

  private val sf = "/root/testdata/sf0.001"

  // new vectors: clones of 490..499 under ids 10000..10009 (rank-1
  // neighbors known by construction — the IndexStreamSpec fixture)
  private lazy val clones = graft.Tables.embeddings(spark, sf)
    .filter(col("vec_id").between(490L, 499L))
    .select((col("vec_id") + 9510L).as("vec_id"), col("embedding"))

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getInt(4))).toSeq

  private def pqStream(root: String): IndexStream = {
    val st = new StateDir(spark, root)
    new IndexStream(spark, new PqIndex(spark, st))
  }

  private lazy val expected = {
    val oneShot = new PqIndex(spark,
      new StateDir(spark, Files.createTempDirectory("pqb").toString))
    oneShot.build(sf)
    oneShot.addBatch(clones)
    val got = rows(oneShot.query(10000L, 10L))
    assert(got.nonEmpty)
    got
  }

  test("streamed PQ ingest == one-shot addBatch; split-invariant; replay no-op") {
    def streamed(mod: Int): (Seq[(Long, Long, Double, Double, Int)], IndexStream) = {
      val is = pqStream(Files.createTempDirectory(s"pqs$mod").toString)
      is.index.build(sf)
      (0 until mod).foreach { i =>
        is.processBatch(clones.filter(col("vec_id") % mod === i), i.toLong)
      }
      (rows(is.index.query(10000L, 10L)), is)
    }
    val (got2, is2) = streamed(2)
    val (got3, _) = streamed(3)
    assert(got2 == expected, "streamed PQ index diverged from batch addBatch")
    assert(got3 == expected, "served rows depend on the batch split")

    // replay an already-committed batch — served rows unchanged
    is2.processBatch(clones.filter(col("vec_id") % 2 === 1), 1L)
    assert(rows(is2.index.query(10000L, 10L)) == expected,
      "replayed batch mutated the index")
  }

  test("ingest across a compaction boundary: both tables' tags survive the fold") {
    // build-time base versions of BOTH pq_assign and pq_codes have no
    // batch_id column; compaction folds tagged deltas with null-tagged
    // base rows in whichever table hits the cadence first. Serving and
    // the per-table guard must come through unchanged.
    val st = new StateDir(spark,
      Files.createTempDirectory("pqc").toString, compactEvery = 2)
    val is = new IndexStream(spark, new PqIndex(spark, st))
    is.index.build(sf)
    (0 until 5).foreach { i =>
      is.processBatch(clones.filter(col("vec_id") % 5 === i), i.toLong)
    }
    assert(rows(is.index.query(10000L, 10L)) == expected,
      "compaction changed the served rows")
    (0 until 5).foreach { i =>
      assert(is.index.hasBatch(i.toLong), s"fold dropped batch $i's tags")
    }
  }

  test("a torn batch (assignment landed, codes missing) is completed, not duplicated") {
    // manufacture the crash state with public API only: a donor index
    // commits batch 7 fully; the torn index receives just the donor's
    // pq_assign delta — exactly what a crash between addBatch's two
    // appends leaves behind.
    val donorState = new StateDir(spark,
      Files.createTempDirectory("pqd").toString)
    val donor = new PqIndex(spark, donorState)
    donor.build(sf)
    donor.addBatch(clones, Some(7L))
    assert(donor.hasBatch(7L))

    val tornState = new StateDir(spark,
      Files.createTempDirectory("pqt").toString)
    val is = new IndexStream(spark, new PqIndex(spark, tornState))
    is.index.build(sf)
    val assignDelta = donorState
      .read(PqIndex.AssignTable, IvfIndex.TaggedAssignSchema)
      .filter(col("batch_id") === 7L)
    val nAssign = assignDelta.count()
    tornState.append(PqIndex.AssignTable, assignDelta)
    assert(!is.index.hasBatch(7L), "half-present batch must read as absent")

    // the re-driven micro-batch: the stream-level skip must NOT fire
    // (codes are missing), and addBatch must append exactly them
    is.processBatch(clones, 7L)
    assert(is.index.hasBatch(7L))
    assert(tornState.read(PqIndex.AssignTable, IvfIndex.TaggedAssignSchema)
      .filter(col("batch_id") === 7L).count() == nAssign,
      "re-drive duplicated the assignment delta")
    assert(rows(is.index.query(10000L, 10L)) == rows(donor.query(10000L, 10L)),
      "completed torn batch serves differently from a clean commit")
  }
}
