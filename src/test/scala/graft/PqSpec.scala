package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Vectors
import graft.operators.{Ivf, Pq}

/** q92 IVF-PQ quality + structure gate.
  *
  * q92 is algorithm-exact vs its DuckDB oracle by construction (the
  * driver's CORRECTNESS row); what this spec pins is (a) what the
  * quantization COSTS — ADC recall@3 against brute-force exact-L2
  * ground truth on the sf0.01 fixture, floor below the measurement like
  * AnnRecallSpec — and (b) the structural claims the 100 TB memory
  * story rests on: a complete M-codes-per-vector table with ids inside
  * the codebook range, and an encode path that stays HOF-free once the
  * codebook is a materialized table (production: a persisted artifact,
  * like IvfIndex's centroid table).
  */
class PqSpec extends AnyFunSuite {
  import TestSession.spark

  private val sf = "/root/testdata/sf0.01"
  private val M = Dials.PqSubspaces
  private val Ks = Dials.PqCodebook

  private def emb = Tables.embeddings(spark, sf)
    .select(col("vec_id"), col("embedding"))

  /** Brute-force exact squared-L2 top-3 per probe in [lo, hi) — the
    * metric PQ approximates (same fixed expression as the operator). */
  private def truthTop3L2(lo: Long, hi: Long): Map[Long, Set[Long]] = {
    val normed = emb.withColumn("n2",
      Vectors.dot(col("embedding"), col("embedding")))
    val probes = normed.filter(col("vec_id") >= lo && col("vec_id") < hi)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pe"),
        col("n2").as("pn2"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("l2").asc, col("vec_id"))
    normed.crossJoin(broadcast(probes))
      .filter(col("vec_id") =!= col("probe_id"))
      .withColumn("l2",
        col("pn2") - lit(2.0) * Vectors.dot(col("pe"), col("embedding")) + col("n2"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .collect()
      .groupBy(_.getAs[Long]("probe_id"))
      .map { case (p, rs) => p -> rs.map(_.getAs[Long]("vec_id")).toSet }
  }

  test("q92 ADC recall@3 vs exact-L2 ground truth stays above the floor") {
    val got = Pq.q92IvfPqAnn(spark, sf).collect()
      .groupBy(_.getAs[Long]("probe_id"))
      .map { case (p, rs) => p -> rs.map(_.getAs[Long]("vec_id")).toSet }
    val want = truthTop3L2(Ivf.ProbeFrom, Ivf.ProbeFrom + Ivf.NProbes)
    val hits = want.iterator.map { case (p, t) =>
      (got.getOrElse(p, Set.empty) & t).size
    }.sum
    val recall = hits.toDouble / want.valuesIterator.map(_.size).sum
    info(f"q92 IVF-PQ recall@3 = $recall%.3f")
    // measured 0.867 on the fixture (r9: residual codes per IVFADC §III
    // + M=16 subspaces + nprobe=4 — up from 0.500 with raw-subvector
    // codes at M=8/nprobe=3). The loss decomposes as: coarse stage
    // ceiling 0.867 at nprobe=4 (the true top-3 outside every probed
    // cell is unrecoverable downstream), ADC+re-rank at M=16 reaching
    // that ceiling exactly — so the remaining loss is ALL nprobe, the
    // dial a deployment turns without re-indexing. Floor sits below
    // measurement so a codebook/ADC/re-rank regression fails, fixture
    // noise does not.
    assert(recall >= 0.6, f"q92 recall@3 $recall%.3f under the 0.6 floor")
  }

  test("codes form a complete M-per-vector table with ids inside [0, Ks)") {
    val sub = Pq.subVectors(emb)
    val codes = Pq.assignSub(sub, Pq.trainCodebooks(sub))
      .select(col("vec_id"), col("m"), col("code"))
    val n = emb.count()
    assert(codes.count() == n * M, "one code per (vector, subspace)")
    val agg = codes.agg(
      countDistinct(col("m")).as("ms"),
      min(col("code")).as("lo"), max(col("code")).as("hi"),
      countDistinct(col("vec_id"), col("m")).as("pairs")).collect()(0)
    assert(agg.getAs[Long]("ms") == M)
    assert(agg.getAs[Long]("lo") >= 0 && agg.getAs[Long]("hi") < Ks,
      s"codes must index the Ks=$Ks codebook, got [${agg.get(1)}, ${agg.get(2)}]")
    assert(agg.getAs[Long]("pairs") == n * M, "no duplicate (vec_id, m)")
  }

  test("encode path is HOF-free once the codebook is a materialized table") {
    // Training's ordered fold is the allowlisted HOF site; ENCODE must
    // not inherit it. With the codebook as a literal table (production:
    // a persisted parquet artifact) the whole encode plan — slice,
    // posexplode, graft_dot, min_by — must carry no interpreted
    // HigherOrderFunction.
    import org.apache.spark.sql.catalyst.expressions.HigherOrderFunction
    val sub = Pq.subVectors(emb)
    val cbLocal = spark.createDataFrame(
      spark.sparkContext.parallelize(
        Pq.trainCodebooks(sub).collect().toSeq, 1),
      Pq.trainCodebooks(sub).schema)
    val hofs = Pq.assignSub(sub, cbLocal)
      .queryExecution.optimizedPlan
      .collect { case p => p.expressions.flatMap(_.collect {
        case h: HigherOrderFunction => h.prettyName }) }
      .flatten
    assert(hofs.isEmpty, s"interpreted HOFs in the PQ encode path: $hofs")
  }

  test("adaptive re-rank rule: floor below the knee, N/(K·4) above it") {
    // The in-plan dial mirrors Dials.pqRerankFor (the serve plan
    // computes the same greatest/ceil over the assignment count; the
    // oracle mirrors it with a scalar subquery — all three share one
    // formula, this pins the Scala twin's values at the corners).
    assert(Dials.pqRerankFor(200L) == 64L)     // sf0.01: rule inactive
    assert(Dials.pqRerankFor(2048L) == 64L)    // exactly at the knee
    assert(Dials.pqRerankFor(2049L) == 65L)    // first step above it
    assert(Dials.pqRerankFor(20000L) == 625L)  // sf1: 10× the floor
    // shortlist coverage of the average cell stays >= 1/4 at any N
    Seq(1000L, 100000L, 1000000000L).foreach { n =>
      assert(Dials.pqRerankFor(n).toDouble / (n.toDouble / Dials.IvfCells) >= 0.25 - 1e-9
        || Dials.pqRerankFor(n) == Dials.PqRerank.toLong)
    }
  }
}
