package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Pq, PqIndex}
import graft.streaming.StateDir

/** Train-once / serve-many IVF-PQ: build publishes coarse quantizer,
  * codebooks AND the code table to StateDir; queries serve purely from
  * the four persisted tables — bit-identical to the inline q92, with no
  * training stage in the serving plan, and the assignment/code pair
  * moving together through addBatch (a candidate without a code would
  * silently vanish from the ADC stage). */
class PqIndexSpec extends AnyFunSuite {
  import TestSession.spark

  private val sf = "/root/testdata/sf0.001"

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getInt(4))).toSeq

  test("persisted index serves q92 bit-identically, without retraining") {
    val root = Files.createTempDirectory("pq-index-").toString
    val idx = new PqIndex(spark, new StateDir(spark, root))
    assert(!idx.isBuilt)
    idx.build(sf)
    assert(idx.isBuilt)
    val expected = rows(Pq.q92IvfPqAnn(spark, sf))
    assert(rows(idx.query(490L, 10L)) == expected)
    // a FRESH handle on the same state dir serves without ever building —
    // the index (all four tables) is genuinely on disk, not session cache
    val reopened = new PqIndex(spark, new StateDir(spark, root))
    assert(reopened.isBuilt)
    val served = reopened.query(490L, 10L)
    assert(rows(served) == expected)
    // and the serving plan contains no training stage: neither the coarse
    // nor the per-subspace Lloyd update's ordered-fold aggregate appears
    val plan = served.queryExecution.optimizedPlan.toString
    assert(!plan.contains("collect_list") && !plan.contains("zip_with"),
      "serving plan retrains the quantizer/codebooks")
    assert(expected.nonEmpty)
  }

  test("build leaves no persisted RDD behind (cache hygiene)") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val root = Files.createTempDirectory("pq-hygiene-").toString
    new PqIndex(spark, new StateDir(spark, root)).build(sf)
    val added = spark.sparkContext.getPersistentRDDs.filter {
      case (id, _) => !before.contains(id)
    }
    assert(added.isEmpty,
      s"build persisted RDDs survive: ${added.values.map(_.toString).mkString(",")}")
  }

  test("addBatch appends assignment AND codes together; clones re-rank to their originals") {
    val root = Files.createTempDirectory("pq-add-").toString
    val idx = new PqIndex(spark, new StateDir(spark, root))
    idx.build(sf)
    val baseline = rows(idx.query(490L, 10L))
    // new batch: exact clones of vectors 490..499 under ids 10000..10009
    val clones = graft.Tables.embeddings(spark, sf)
      .filter(org.apache.spark.sql.functions.col("vec_id").between(490L, 499L))
      .select(
        (org.apache.spark.sql.functions.col("vec_id") + 9510L).as("vec_id"),
        org.apache.spark.sql.functions.col("embedding"))
    idx.addBatch(clones)
    val served = idx.query(10000L, 10L)
    val plan = served.queryExecution.optimizedPlan.toString
    assert(!plan.contains("collect_list") && !plan.contains("zip_with"),
      "addBatch-serving plan retrains the quantizer/codebooks")
    // every clone probe answers with a full top-3 — its candidates all
    // carry codes (the pair moved together), and its rank-1 neighbor is
    // its original at exact-L2 ~ 0 after the re-rank
    val got = served.collect()
    assert(got.count(_.getInt(4) == 1) == 10)
    assert(got.length == 30, s"expected 10 probes x top-3, got ${got.length}")
    got.filter(_.getInt(4) == 1).foreach { r =>
      val (probe, hit, l2) = (r.getLong(0), r.getLong(1), r.getDouble(3))
      assert(hit == probe - 9510L, s"clone $probe rank-1 is $hit, not its original")
      assert(math.abs(l2) < 1e-9, s"clone exact-L2 $l2 != 0")
    }
    // and the originals now see their clones at rank 1 too — BOTH deltas
    // (assignment + codes) are live for every probe, not just the new ids
    val back = rows(idx.query(490L, 10L))
    assert(back != baseline)
    back.filter(_._5 == 1).foreach { case (probe, hit, _, l2, _) =>
      assert(hit == probe + 9510L && math.abs(l2) < 1e-9)
    }
  }

  test("a torn REBUILD reads as not-built and serving refuses; a re-drive recovers") {
    // the mixed-generation hazard: a crash mid-rebuild of a multi-table
    // index would leave new codebooks over old codes (ADC garbage) or
    // new tf over old df (wrong BM25) with nothing signaling the tear.
    // The build-epoch bracket makes the tear LOUD: the tombstone lands
    // before any table writes, the commit after all of them.
    val root = Files.createTempDirectory("pq-torn-build-").toString
    val st = new StateDir(spark, root)
    val idx = new PqIndex(spark, st)
    idx.build(sf)
    assert(idx.isBuilt)
    val healthy = rows(idx.query(490L, 10L))
    // simulate the crash: the rebuild's tombstone landed (and, say, one
    // table of the new generation), then the process died
    st.write("pq_build", spark.createDataFrame(
      java.util.Collections.singletonList(
        org.apache.spark.sql.Row(Boolean.box(false))),
      graft.operators.AnnIndex.BuildMetaSchema))
    assert(!idx.isBuilt, "torn rebuild must read as not-built")
    intercept[IllegalArgumentException](idx.query(490L, 10L))
    intercept[IllegalArgumentException](idx.addBatch(
      graft.Tables.embeddings(spark, sf).limit(1)))
    // the owner's recovery: re-drive the build — full generation, serves
    idx.build(sf)
    assert(idx.isBuilt)
    assert(rows(idx.query(490L, 10L)) == healthy)
  }

  test("a committed-but-EMPTY batch stays committed (no re-drive livelock)") {
    // presence-by-tagged-rows cannot represent "committed but empty";
    // the ledger can. A batch whose rows yield an empty delta in every
    // table (zero input rows here) must still read as committed, or the
    // stream re-drives it on every restart forever.
    val root = Files.createTempDirectory("pq-empty-batch-").toString
    val idx = new PqIndex(spark, new StateDir(spark, root))
    idx.build(sf)
    val empty = graft.Tables.embeddings(spark, sf)
      .filter(org.apache.spark.sql.functions.col("vec_id") < 0L)
      .select(org.apache.spark.sql.functions.col("vec_id"),
        org.apache.spark.sql.functions.col("embedding"))
    idx.addBatch(empty, Some(11L))
    assert(idx.hasBatch(11L), "empty batch must commit via the ledger")
    val before = rows(idx.query(490L, 10L))
    idx.addBatch(empty, Some(11L)) // replay: ledger short-circuits
    assert(rows(idx.query(490L, 10L)) == before)
  }

  test("rebuild clears the batch ledger — batch ids are scoped to one generation") {
    // publishTables rewrites the serving tables (wiping the per-table tag
    // guards), so a ledger surviving the rebuild would permanently skip a
    // batch id committed under the PREVIOUS generation — the fresh-
    // checkpoint restart (batch ids from 0) against retained state.
    val root = Files.createTempDirectory("pq-ledger-gen-").toString
    val idx = new PqIndex(spark, new StateDir(spark, root))
    idx.build(sf)
    val clones = graft.Tables.embeddings(spark, sf)
      .filter(org.apache.spark.sql.functions.col("vec_id").between(490L, 499L))
      .select((org.apache.spark.sql.functions.col("vec_id") + 9510L).as("vec_id"),
        org.apache.spark.sql.functions.col("embedding"))
    idx.addBatch(clones, Some(0L))
    assert(idx.hasBatch(0L))
    assert(rows(idx.query(10000L, 10L)).nonEmpty)
    idx.build(sf) // the retrain path: new generation, serving tables rewritten
    assert(!idx.hasBatch(0L), "stale ledger row survived the rebuild")
    assert(rows(idx.query(10000L, 10L)).isEmpty) // new generation: no clones yet
    idx.addBatch(clones, Some(0L)) // same id, new generation — must LAND
    assert(idx.hasBatch(0L))
    assert(rows(idx.query(10000L, 10L)).nonEmpty,
      "first batches of the new generation were silently dropped")
  }

  test("q93 serves q92's answer from persisted state, no Lloyd subtree in the plan") {
    val served = Pq.q93ServedPqAnn(spark, sf)
    assert(rows(served) == rows(Pq.q92IvfPqAnn(spark, sf)))
    val plan = served.queryExecution.optimizedPlan.toString
    assert(!plan.contains("collect_list") && !plan.contains("zip_with"),
      "q93's declared plan retrains the quantizer/codebooks")
    // second call serves the memoized index — still the same answer
    assert(rows(Pq.q93ServedPqAnn(spark, sf)) == rows(served))
  }
}
