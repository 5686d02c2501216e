package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSession}
import graft.functions.Vectors

/** q101 filtered-ANN contract gate.
  *
  * The oracle row proves plan-vs-SQL agreement; what this spec pins is
  * the SEMANTICS a user of filtered search relies on: (a) the
  * constraint actually holds (every returned neighbor shares the
  * probe's label — a post-filter bug that slips an off-label row in
  * would still hash-match a symmetrically-buggy oracle), (b) recall
  * against the brute-force LABEL-CONSTRAINED ground truth stays above
  * a floor at the widened nprobe (the dial exists precisely to absorb
  * the filter's selectivity — if the widening regressed, this is the
  * test that notices), and (c) the filter lands pre-top-k: every probe
  * with ≥ 3 same-label vectors in its probed cells returns exactly 3
  * rows, never fewer because off-label rows burned rank slots.
  */
class FilteredAnnSpec extends AnyFunSuite {
  import TestSession.spark

  private val sf = "/root/testdata/sf0.01"

  private def labeled = Tables.embeddings(spark, sf)
    .select(col("vec_id"), col("embedding"), col("label"),
      Vectors.dot(col("embedding"), col("embedding")).as("n2"))

  /** Brute-force exact cosine top-3 among SAME-LABEL vectors only. */
  private def truthTop3(lo: Long, hi: Long): Map[Long, Set[Long]] = {
    val probes = labeled.filter(col("vec_id") >= lo && col("vec_id") < hi)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pe"),
        col("n2").as("pn2"), col("label").as("plabel"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    labeled.crossJoin(broadcast(probes))
      .filter(col("vec_id") =!= col("probe_id") &&
        col("label") === col("plabel"))
      .withColumn("cosine",
        Vectors.dot(col("pe"), col("embedding")) / sqrt(col("pn2") * col("n2")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .collect()
      .groupBy(_.getAs[Long]("probe_id"))
      .map { case (p, rs) => p -> rs.map(_.getAs[Long]("vec_id")).toSet }
  }

  test("every returned neighbor shares the probe's label") {
    val rows = Ivf.q101FilteredAnn(spark, sf).collect()
    assert(rows.nonEmpty)
    val lbl = labeled.select(col("vec_id"), col("label")).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("label")).toMap
    rows.foreach { r =>
      val probe = r.getAs[Long]("probe_id")
      val v = r.getAs[Long]("vec_id")
      assert(r.getAs[Int]("label") == lbl(probe),
        s"row label column disagrees with probe $probe's label")
      assert(lbl(v) == lbl(probe),
        s"off-label neighbor $v returned for probe $probe")
    }
  }

  test("recall@3 vs label-constrained brute truth stays above the floor") {
    val got = Ivf.q101FilteredAnn(spark, sf).collect()
      .groupBy(_.getAs[Long]("probe_id"))
      .map { case (p, rs) => p -> rs.map(_.getAs[Long]("vec_id")).toSet }
    val want = truthTop3(Ivf.ProbeFrom, Ivf.ProbeFrom + Ivf.NProbes)
    val hits = want.iterator.map { case (p, t) =>
      (got.getOrElse(p, Set.empty) & t).size
    }.sum
    val denom = want.valuesIterator.map(_.size).sum
    val recall = hits.toDouble / denom
    info(f"recall@3  q101_filtered=$recall%.3f  (nprobe=${Ivf.FilteredNProbeCells})")
    assert(recall >= 0.6,
      f"filtered-ANN recall collapsed: $recall%.3f < 0.6")
  }

  test("filter is pre-top-k: full result sets wherever candidates exist") {
    // per probe: count same-label candidates inside its probed cells;
    // expect min(3, that) result rows — a post-top-k filter would return
    // fewer whenever off-label rows out-rank same-label ones.
    val got = Ivf.q101FilteredAnn(spark, sf).collect()
      .groupBy(_.getAs[Long]("probe_id")).view.mapValues(_.length).toMap
    assert(got.valuesIterator.forall(n => n >= 1 && n <= 3))
    // the fixture's label fan is coarse enough that every probe keeps a
    // full top-3 at the widened nprobe — pin that so selectivity drift
    // (e.g. a fixture regeneration with 100 labels) is loud
    assert(got.valuesIterator.forall(_ == 3),
      s"some probe returned < 3 same-label neighbors: $got")
  }
}
