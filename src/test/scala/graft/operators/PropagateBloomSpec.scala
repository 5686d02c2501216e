package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSession

/** q80/q81 pinned against sequential replays.
  *
  * q80: the distributed propagation must equal a driver-side synchronous
  * replay over the SAME k-NN adjacency — majority label among labeled
  * neighbors, ties to the smallest label, seeds immutable, two rounds.
  * q81: the bloom prefilter must be invisible in the result — the clean
  * corpus is exactly (docs ≥ BenchDocs) minus q57's contaminated ids —
  * while the physical plan proves the bloom actually gates the scan.
  */
class PropagateBloomSpec extends AnyFunSuite {
  import TestSession.spark

  test("q80 equals a sequential synchronous-majority replay") {
    val adj = Similarity.knnEdges(spark, TestSession.sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (v, es) => v -> es.map(_._2).toSeq }
    val seeds = graft.Tables.embeddings(spark, TestSession.sf)
      .filter(org.apache.spark.sql.functions.col("vec_id") < Propagate.SeedVecs)
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap

    var labels = seeds
    var rounds = seeds.map { case (v, _) => v -> 0 }
    for (r <- 1 to Propagate.Rounds) {
      val newly = adj.collect { case (v, ns) if !labels.contains(v) =>
        val votes = ns.flatMap(labels.get).groupBy(identity)
          .map { case (l, occ) => (l, occ.size) }
        if (votes.isEmpty) None
        else Some(v -> votes.toSeq.minBy { case (l, c) => (-c, l) }._1)
      }.flatten.toMap
      labels = labels ++ newly
      rounds = rounds ++ newly.map { case (v, _) => v -> r }
    }
    val expected = labels.map { case (v, l) => (v, l, rounds(v)) }.toSet

    val got = Propagate.q80LabelProp(spark, TestSession.sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    assert(got == expected)
    assert(got.count(_._3 == 0) == seeds.size, "seed rows must all survive as round 0")
  }

  test("q81 equals docs minus q57's contaminated ids; bloom is in the plan") {
    val contaminated = Decontamination.q57Decontaminate(spark, TestSession.sf)
      .collect().map(_.getLong(0)).toSet
    val all = graft.Tables.documents(spark, TestSession.sf)
      .filter(org.apache.spark.sql.functions.col("doc_id") >= Decontamination.BenchDocs)
      .select("doc_id").collect().map(_.getLong(0)).toSet

    val clean = Decontamination.q81BloomClean(spark, TestSession.sf)
    val got = clean.collect().map(_.getLong(0)).toSet
    assert(got == all -- contaminated)
    assert((got & contaminated).isEmpty)
    assert(clean.queryExecution.executedPlan.toString.contains("might_contain"),
      "the bloom prefilter must gate the corpus scan")
  }
}
