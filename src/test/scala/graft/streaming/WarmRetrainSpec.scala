package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSession
import graft.functions.Vectors
import graft.operators.{AnnIndex, Ivf, IvfIndex, Pq, PqIndex}

/** Warm-start retrain — the production rebuild path at 1e9 vectors:
  * [[AnnIndex.rebuildWarm]] seeds each family's Lloyd trainer from the
  * PREVIOUS generation's trained state (coarse centroids; for PQ also
  * the codebooks) instead of the cold first-K-rows seed, falling back
  * to cold when nothing is built or the snapshot no longer fits the
  * family's geometry. What this spec pins:
  *
  *  - the SERVE CONTRACT survives a warm rebuild identically to a cold
  *    one: built epoch committed, exactly top-3 ranked rows per probe,
  *    scores monotone in rank, candidates drawn from the authoritative
  *    corpus (incremental rows dropped — the same
  *    rebuild-from-authoritative-corpus semantics as build());
  *  - recall does not regress below the family's PINNED floor
  *    (AnnRecallSpec's 0.6 / PqSpec's 0.6): the warm quantizer is a
  *    DIFFERENT (further-trained) solution, so per-probe recall is not
  *    pointwise comparable to the cold measurement — nprobe recall is
  *    not monotone in training rounds on a near-random corpus — but it
  *    must clear the same serving-quality bar every build must;
  *  - iteration budget is unchanged (fewer/equal iterations: the warm
  *    path runs the same fixed round count from a better start);
  *  - the geometry gate: a snapshot with the wrong dimensionality or
  *    cardinality cold-seeds instead of training in a mismatched space.
  */
class WarmRetrainSpec extends AnyFunSuite {
  import TestSession.spark
  import spark.implicits._

  private val sf = TestSession.sf

  private def tmpState(tag: String) =
    new StateDir(spark, Files.createTempDirectory(tag).toString)

  /** Brute-force exact cosine top-3 per probe — AnnRecallSpec's ground
    * truth, locally. */
  private def truthTop3(lo: Long, hi: Long): Map[Long, Set[Long]] = {
    val emb = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"),
        Vectors.dot(col("embedding"), col("embedding")).as("n2"))
    val probes = emb.filter(col("vec_id") >= lo && col("vec_id") < hi)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pe"),
        col("n2").as("pn2"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    emb.crossJoin(broadcast(probes))
      .filter(col("vec_id") =!= col("probe_id"))
      .withColumn("cosine",
        Vectors.dot(col("pe"), col("embedding")) / sqrt(col("pn2") * col("n2")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .collect()
      .groupBy(_.getAs[Long]("probe_id"))
      .map { case (p, rs) => p -> rs.map(_.getAs[Long]("vec_id")).toSet }
  }

  private def recallOf(got: Map[Long, Set[Long]]): Double = {
    val want = truthTop3(Ivf.ProbeFrom, Ivf.ProbeFrom + Ivf.NProbes)
    val hits = want.iterator.map { case (p, t) =>
      (got.getOrElse(p, Set.empty) & t).size
    }.sum
    hits.toDouble / want.valuesIterator.map(_.size).sum
  }

  private def topByProbe(df: org.apache.spark.sql.DataFrame) =
    df.collect().groupBy(_.getAs[Long]("probe_id"))
      .map { case (p, rs) => p -> rs.map(_.getAs[Long]("vec_id")).toSet }

  /** Shared warm-loop body: cold build, live ingest, warm rebuild —
    * then the serve-contract assertions. Returns the served frame. */
  private def warmLoop(ix: AnnIndex): org.apache.spark.sql.DataFrame = {
    ix.build(sf)
    // live ingest between retrains (the fixed-quantizer path)
    val clones = graft.Tables.embeddings(spark, sf)
      .filter(col("vec_id").between(490L, 499L))
      .select((col("vec_id") + 9510L).as("vec_id"), col("embedding"))
    ix.addBatch(clones, Some(0L))
    assert(ix.query(10000L, 10L).count() > 0, "pre-rebuild ingest must serve")

    ix.rebuildWarm(sf)
    assert(ix.isBuilt, "warm rebuild must commit the build epoch")
    // rebuild-from-authoritative-corpus: the incremental rows are gone
    assert(ix.query(10000L, 10L).isEmpty,
      "warm rebuild must retrain from the corpus, dropping live-ingested rows")

    val served = ix.query(Ivf.ProbeFrom, Ivf.NProbes)
    val perProbe = served.groupBy(col("probe_id"))
      .agg(count(lit(1)).as("n"), max(col("rn")).as("maxrn")).collect()
    assert(perProbe.length == Ivf.NProbes.toInt)
    perProbe.foreach { r =>
      assert(r.getAs[Long]("n") == 3 && r.getAs[Int]("maxrn") == 3,
        "warm-rebuilt index must serve exactly top-3 ranked rows per probe")
    }
    served
  }

  test("IVF: warm rebuild keeps the serve contract and the recall floor") {
    val ix = new IvfIndex(spark, tmpState("warm-ivf"))
    val served = warmLoop(ix)
    // scores monotone in rank per probe
    served.collect().groupBy(_.getAs[Long]("probe_id")).foreach { case (_, rs) =>
      val byRank = rs.sortBy(_.getAs[Int]("rn")).map(_.getAs[Double]("cosine"))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    }
    val recall = recallOf(topByProbe(served))
    info(f"warm-rebuilt IVF recall@3 = $recall%.3f")
    assert(recall >= 0.6, // the family's pinned floor (AnnRecallSpec)
      f"warm IVF recall@3 $recall%.3f under the pinned floor 0.6")
  }

  test("IVF-PQ: warm rebuild (centroids AND codebooks) keeps contract + floor") {
    val ix = new PqIndex(spark, tmpState("warm-pq"))
    val served = warmLoop(ix)
    served.collect().groupBy(_.getAs[Long]("probe_id")).foreach { case (_, rs) =>
      val byRank = rs.sortBy(_.getAs[Int]("rn")).map(_.getAs[Double]("l2"))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a <= b })
    }
    val recall = recallOf(topByProbe(served))
    info(f"warm-rebuilt IVF-PQ recall@3 = $recall%.3f")
    assert(recall >= 0.6, // the family's pinned floor (PqSpec)
      f"warm PQ recall@3 $recall%.3f under the pinned floor 0.6")
  }

  test("geometry gate: mismatched snapshots cold-seed instead of training in the wrong space") {
    // wrong dimensionality → None (an embedding-dim change is a new space)
    val badDim = Seq((0L, Array.fill(3)(0.5f), 0.75)).toDF("cid", "ce", "cn2")
    assert(Ivf.warmSeed(badDim).isEmpty)
    val badSub = Seq((0, 0L, Array.fill(3)(0.5f), 0.75)).toDF("m", "cid", "ce", "cn2")
    assert(Pq.warmSeed(badSub).isEmpty)
    // over-provisioned (K dial shrank) → None
    val tooMany = (0 until 1000)
      .map(i => (i.toLong, Array.fill(graft.Dials.EmbeddingDim)(0.1f), 0.64))
      .toDF("cid", "ce", "cn2")
    assert(Ivf.warmSeed(tooMany).isEmpty)
    // empty → None (first build / truncated table)
    assert(Ivf.warmSeed(badDim.limit(0)).isEmpty)
    // a REAL previous-generation snapshot validates
    val st = tmpState("warm-gate")
    val ix = new IvfIndex(spark, st)
    ix.build(sf)
    val snap = st.read(IvfIndex.CentroidsTable, IvfIndex.CentroidsSchema)
    assert(Ivf.warmSeed(snap).isDefined,
      "a trained centroid table must validate as a warm seed")
  }

  test("rebuildWarm on a never-built index is a cold build") {
    val ix = new IvfIndex(spark, tmpState("warm-cold"))
    ix.rebuildWarm(sf)
    assert(ix.isBuilt)
    // identical to a cold build: no previous generation existed, so the
    // seed path is the cold one and the tables must match a fresh build
    val fresh = new IvfIndex(spark, tmpState("warm-cold-fresh"))
    fresh.build(sf)
    assert(ix.query(Ivf.ProbeFrom, Ivf.NProbes).collect().map(_.toSeq).toSeq ==
      fresh.query(Ivf.ProbeFrom, Ivf.NProbes).collect().map(_.toSeq).toSeq)
  }
}
