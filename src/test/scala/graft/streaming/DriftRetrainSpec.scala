package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSession
import graft.operators.{AnnIndex, IvfIndex, PqIndex}

/** The drift→retrain loop, CLOSED IN A PINNED TEST instead of prose:
  * [[DriftStream]] is documented as "the retrain monitor" and
  * [[graft.operators.AnnIndex.addBatch]] fixes the quantizers "until the
  * owner rebuilds" — this spec is the owner, once per index family.
  * Documents stream into the drift monitor while embeddings stream into
  * the live index; while the report's largest |Δppm| stays under the
  * declared threshold nothing is rebuilt, and the batch that drags the
  * token distribution across the threshold triggers `build()` — after
  * which serving is bit-identical to a freshly trained index on the
  * authoritative corpus. The loop is index-agnostic by construction
  * (the monitor watches the CORPUS, not the index), so the same
  * sequence must close over [[IvfIndex]] and [[PqIndex]] alike.
  */
class DriftRetrainSpec extends AnyFunSuite {
  import TestSession.spark
  import spark.implicits._

  private val sf = TestSession.sf

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).toSeq

  private def retrainLoop(mkIndex: StateDir => AnnIndex): Unit = {
    val drift = new DriftStream(spark,
      new StateDir(spark, Files.createTempDirectory("drift-rt").toString))
    val ixState = new StateDir(spark,
      Files.createTempDirectory("ix-rt").toString)
    val is = new IndexStream(spark, mkIndex(ixState))
    is.index.build(sf)

    // epoch 0: the full fixture corpus. Its parity halves are drawn from
    // the same distribution, so its max |Δppm| is the AMBIENT drift — the
    // declared threshold sits just above it (a real deployment declares
    // an absolute ppm budget the same way; the fixture derives it so the
    // test stays exact at any sf).
    val docs = graft.Tables.documents(spark, sf).select("doc_id", "text")
    drift.processBatch(docs, 0L)
    val ambient = drift.report.limit(1).collect()
      .headOption.map(r => math.abs(r.getAs[Long]("delta_ppm"))).getOrElse(0L)
    val thresholdPpm = ambient + 1
    assert(!drift.shouldRetrain(thresholdPpm),
      "threshold just above ambient drift must not trigger a retrain")

    // live ingest meanwhile: new vectors enter the SERVING index through
    // the fixed quantizers (the between-retrains path)
    val clones = graft.Tables.embeddings(spark, sf)
      .filter(col("vec_id").between(490L, 499L))
      .select((col("vec_id") + 9510L).as("vec_id"), col("embedding"))
    is.processBatch(clones, 0L)
    assert(is.index.query(10000L, 10L).count() > 0)

    // epoch 1: a skewed snapshot — odd-parity docs hammering one token
    // drag its new-half rate far past the budget
    val skewed = (0 until 50)
      .map(i => (1001L + 2 * i, Seq.fill(40)("driftTokenXq").mkString(" ")))
      .toDF("doc_id", "text")
    drift.processBatch(skewed, 1L)
    assert(drift.shouldRetrain(thresholdPpm),
      "skewed snapshot must cross the declared Δppm threshold")

    // the owner's move on the signal: retrain the quantizers from the
    // authoritative corpus (versioned-swap into the SAME serving state)
    if (drift.shouldRetrain(thresholdPpm)) is.index.build(sf)

    val fresh = mkIndex(new StateDir(spark,
      Files.createTempDirectory("ix-fresh").toString))
    fresh.build(sf)
    assert(rows(is.index.query(0L, 10L)) == rows(fresh.query(0L, 10L)),
      "post-retrain serving diverged from a freshly trained index")
    // the rebuild re-trained from the corpus: the incremental clones are
    // gone until re-ingested (the documented rebuild-from-authoritative-
    // corpus semantics; their ids serve zero rows, not stale vectors)
    assert(rows(is.index.query(10000L, 10L)).isEmpty)
  }

  test("IVF: report crossing the declared Δppm threshold triggers build(); serve == fresh index") {
    retrainLoop(st => new IvfIndex(spark, st))
  }

  test("IVF-PQ: the same drift signal retrains quantizer AND codebooks; serve == fresh index") {
    retrainLoop(st => new PqIndex(spark, st))
  }
}
