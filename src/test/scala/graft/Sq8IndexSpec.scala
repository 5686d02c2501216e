package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Ivf, Sq, Sq8Index}
import graft.streaming.StateDir

/** Train-once / serve-many SQ8 (the fourth [[graft.operators.AnnIndex]]
  * family): build publishes bounds + floats + byte codes to StateDir;
  * queries serve purely from the persisted tables — bit-identical to the
  * inline q102, surviving a fresh handle on the same state, with no
  * bounds aggregate or corpus encode in the serving plan. */
class Sq8IndexSpec extends AnyFunSuite {
  import TestSession.spark

  private val sf = "/root/testdata/sf0.001"

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getInt(4))).toSeq

  test("persisted index serves q102 bit-identically, without re-encoding") {
    val root = Files.createTempDirectory("sq-index-").toString
    val idx = new Sq8Index(spark, new StateDir(spark, root))
    assert(!idx.isBuilt)
    idx.build(sf)
    assert(idx.isBuilt)
    val expected = rows(Sq.q102Sq8Ann(spark, sf))
    assert(rows(idx.query(Ivf.ProbeFrom, Ivf.NProbes)) == expected)
    // a FRESH handle on the same state dir serves without ever building
    val reopened = new Sq8Index(spark, new StateDir(spark, root))
    assert(reopened.isBuilt)
    val served = reopened.query(Ivf.ProbeFrom, Ivf.NProbes)
    assert(rows(served) == expected)
    // the serving plan never derives bounds (no per-dim min/max
    // aggregate — posexplode is the dim-stats build's signature) and
    // never encodes the corpus (graft_sq8 appears nowhere: codes are
    // READ, not recomputed)
    val plan = served.queryExecution.optimizedPlan.toString
    assert(!plan.contains("posexplode"), "serving plan rebuilds dim stats")
    assert(!plan.contains("graft_sq8"), "serving plan re-encodes the corpus")
    assert(expected.nonEmpty)
  }

  test("build leaves no persisted RDD behind (cache hygiene)") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val root = Files.createTempDirectory("sq-hygiene-").toString
    new Sq8Index(spark, new StateDir(spark, root)).build(sf)
    val added = spark.sparkContext.getPersistentRDDs.filter {
      case (id, _) => !before.contains(id)
    }
    assert(added.isEmpty,
      s"build persisted RDDs survive: ${added.values.map(_.toString).mkString(",")}")
  }

  test("addBatch encodes against the FIXED persisted bounds") {
    val root = Files.createTempDirectory("sq-add-").toString
    val idx = new Sq8Index(spark, new StateDir(spark, root))
    idx.build(sf)
    // new batch: exact clones of vectors 490..499 under ids 10000..10009 —
    // encoded against the persisted bounds they produce the identical
    // codes, so each clone probe's rank-1 neighbor is its original at
    // cosine ~ 1 (and max integer score)
    val clones = graft.Tables.embeddings(spark, sf)
      .filter(org.apache.spark.sql.functions.col("vec_id").between(490L, 499L))
      .select(
        (org.apache.spark.sql.functions.col("vec_id") + 9510L).as("vec_id"),
        org.apache.spark.sql.functions.col("embedding"))
    idx.addBatch(clones)
    val served = idx.query(10000L, 10L)
    val plan = served.queryExecution.optimizedPlan.toString
    assert(!plan.contains("posexplode"), "addBatch-serving plan rebuilds dim stats")
    val top1 = served.collect().filter(_.getAs[Int]("rn") == 1)
      .map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("vec_id"),
        r.getAs[Double]("cosine")))
    assert(top1.length == 10)
    top1.foreach { case (probe, hit, cos) =>
      assert(hit == probe - 9510L, s"clone $probe rank-1 is $hit, not its original")
      assert(math.abs(cos - 1.0) < 1e-9, s"clone cosine $cos != 1")
    }
  }

  test("torn batch is completed, not skipped or doubled (ledger contract)") {
    // floats landed, codes missing — the PqIndex torn-pair scenario for
    // the SQ8 pair: re-driving the same batch id must append ONLY the
    // missing codes half, then commit the ledger
    val root = Files.createTempDirectory("sq-torn-").toString
    val idx = new Sq8Index(spark, new StateDir(spark, root))
    idx.build(sf)
    val st = new StateDir(spark, root)
    val batch = graft.Tables.embeddings(spark, sf)
      .filter(org.apache.spark.sql.functions.col("vec_id") < 5L)
      .select(
        (org.apache.spark.sql.functions.col("vec_id") + 20000L).as("vec_id"),
        org.apache.spark.sql.functions.col("embedding"))
    // simulate the tear: append the floats half tagged with batch 7,
    // leave codes untouched, ledger uncommitted
    val emb = batch.select(
      org.apache.spark.sql.functions.col("vec_id"),
      org.apache.spark.sql.functions.col("embedding"),
      graft.functions.Vectors.dot(
        org.apache.spark.sql.functions.col("embedding"),
        org.apache.spark.sql.functions.col("embedding")).as("n2"))
    st.append(Sq8Index.FloatsTable,
      emb.withColumn("batch_id", org.apache.spark.sql.functions.lit(7L)))
    assert(!idx.hasBatch(7L))
    idx.addBatch(batch, batchId = Some(7L))
    assert(idx.hasBatch(7L))
    val floats = st.read(Sq8Index.FloatsTable, Sq8Index.FloatsSchema)
      .filter(org.apache.spark.sql.functions.col("vec_id") >= 20000L)
    val codes = st.read(Sq8Index.CodesTable, Sq8Index.CodesSchema)
      .filter(org.apache.spark.sql.functions.col("vec_id") >= 20000L)
    assert(floats.count() == 5L, "torn floats half was doubled or dropped")
    assert(codes.count() == 5L, "codes half was not completed")
  }

  test("streamed SQ8 ingest == one-shot addBatch; split-invariant; replay no-op") {
    import org.apache.spark.sql.functions.col
    val clones = graft.Tables.embeddings(spark, sf)
      .filter(col("vec_id").between(490L, 499L))
      .select((col("vec_id") + 9510L).as("vec_id"), col("embedding"))
    val oneShot = new Sq8Index(spark,
      new StateDir(spark, Files.createTempDirectory("sqb").toString))
    oneShot.build(sf)
    oneShot.addBatch(clones)
    val expected = rows(oneShot.query(10000L, 10L))
    assert(expected.nonEmpty)
    def streamed(mod: Int) = {
      val is = new graft.streaming.IndexStream(spark, new Sq8Index(spark,
        new StateDir(spark, Files.createTempDirectory(s"sqs$mod").toString)))
      is.index.build(sf)
      (0 until mod).foreach { i =>
        is.processBatch(clones.filter(col("vec_id") % mod === i), i.toLong)
      }
      (rows(is.index.query(10000L, 10L)), is)
    }
    val (got2, is2) = streamed(2)
    val (got3, _) = streamed(3)
    assert(got2 == expected, "streamed SQ8 index diverged from batch addBatch")
    assert(got3 == expected, "batch split changed the served answer")
    // foreachBatch re-drive of an already-committed batch id: no-op
    is2.processBatch(clones.filter(col("vec_id") % 2 === 0), 0L)
    assert(rows(is2.index.query(10000L, 10L)) == expected,
      "replayed batch double-appended")
  }
}
