package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Ivf, IvfIndex}
import graft.streaming.StateDir

/** Train-once / serve-many IVF: build publishes the index to StateDir;
  * queries serve purely from the persisted tables — bit-identical to the
  * inline q40, surviving a fresh handle on the same state, with no
  * training stage in the serving plan. */
class IvfIndexSpec extends AnyFunSuite {
  import TestSession.spark

  private val sf = "/root/testdata/sf0.001"

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getInt(4))).toSeq

  test("persisted index serves q40 bit-identically, without retraining") {
    val root = Files.createTempDirectory("ivf-index-").toString
    val idx = new IvfIndex(spark, new StateDir(spark, root))
    assert(!idx.isBuilt)
    idx.build(sf)
    assert(idx.isBuilt)
    val expected = rows(Ivf.q40IvfAnn(spark, sf))
    assert(rows(idx.query(490L, 10L)) == expected)
    // a FRESH handle on the same state dir serves without ever building —
    // the index is genuinely on disk, not in this session's cache
    val reopened = new IvfIndex(spark, new StateDir(spark, root))
    assert(reopened.isBuilt)
    val served = reopened.query(490L, 10L)
    assert(rows(served) == expected)
    // and the serving plan contains no training stage: the Lloyd update's
    // distinctive ordered-fold aggregate never appears
    val plan = served.queryExecution.optimizedPlan.toString
    assert(!plan.contains("collect_list") && !plan.contains("zip_with"),
      "serving plan retrains the quantizer")
    assert(expected.nonEmpty)
  }

  test("build leaves no persisted RDD behind (cache hygiene)") {
    // differential: other machinery (memoized CC labels' localCheckpoints)
    // legitimately holds persisted RDDs across suites — build must add NONE
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val root = Files.createTempDirectory("ivf-hygiene-").toString
    new IvfIndex(spark, new StateDir(spark, root)).build(sf)
    val added = spark.sparkContext.getPersistentRDDs.filter {
      case (id, _) => !before.contains(id)
    }
    assert(added.isEmpty,
      s"build persisted RDDs survive: ${added.values.map(_.toString).mkString(",")}")
  }

  test("addBatch serves new vectors from the fixed quantizer, no retrain") {
    val root = Files.createTempDirectory("ivf-add-").toString
    val idx = new IvfIndex(spark, new StateDir(spark, root))
    idx.build(sf)
    val baseline = rows(idx.query(490L, 10L))
    // new batch: exact clones of vectors 490..499 under ids 10000..10009
    val clones = graft.Tables.embeddings(spark, sf)
      .filter(org.apache.spark.sql.functions.col("vec_id").between(490L, 499L))
      .select(
        (org.apache.spark.sql.functions.col("vec_id") + 9510L).as("vec_id"),
        org.apache.spark.sql.functions.col("embedding"))
    idx.addBatch(clones)
    // each clone probe's rank-1 neighbor is its original, cosine ~ 1
    val served = idx.query(10000L, 10L)
    val plan = served.queryExecution.optimizedPlan.toString
    assert(!plan.contains("collect_list") && !plan.contains("zip_with"),
      "addBatch-serving plan retrains the quantizer")
    val top1 = served.collect().filter(_.getInt(4) == 1)
      .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    assert(top1.length == 10)
    top1.foreach { case (probe, hit, cos) =>
      assert(hit == probe - 9510L, s"clone $probe rank-1 is $hit, not its original")
      assert(math.abs(cos - 1.0) < 1e-9, s"clone cosine $cos != 1")
    }
    // and the originals now see their clones at rank 1 too — the appended
    // delta is live for EVERY probe, not just the new ids
    val back = rows(idx.query(490L, 10L))
    assert(back != baseline)
    back.filter(_._5 == 1).foreach { case (probe, _, hit, cos, _) =>
      assert(hit == probe + 9510L && math.abs(cos - 1.0) < 1e-9)
    }
  }

  test("q86 serves q40's answer from persisted state, no Lloyd subtree in the plan") {
    val served = Ivf.q86ServedAnn(spark, sf)
    assert(rows(served) == rows(Ivf.q40IvfAnn(spark, sf)))
    val plan = served.queryExecution.optimizedPlan.toString
    assert(!plan.contains("collect_list") && !plan.contains("zip_with"),
      "q86's declared plan retrains the quantizer")
    // second call serves the memoized index — still the same answer
    assert(rows(Ivf.q86ServedAnn(spark, sf)) == rows(served))
  }
}
