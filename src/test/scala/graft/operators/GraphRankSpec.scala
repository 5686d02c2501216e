package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSession

/** q82 pinned against a driver-side power-iteration replay with the same
  * integer arithmetic, plus the structural invariants: every rank holds
  * the base floor, and a vertex nobody links to sits EXACTLY at the
  * floor.
  */
class GraphRankSpec extends AnyFunSuite {
  import TestSession.spark

  private val Start = 1000000L
  private val Base = 150000L
  private val Damp = 850L

  test("q82 equals a sequential integer power-iteration replay") {
    val edges = Similarity.knnEdges(spark, TestSession.sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val verts = graft.Tables.embeddings(spark, TestSession.sf)
      .select("vec_id").collect().map(_.getLong(0))
    val outdeg = edges.groupBy(_._1).map { case (v, es) => v -> es.length.toLong }

    var rank = verts.map(_ -> Start).toMap
    for (_ <- 1 to GraphRank.Rounds) {
      val inflow = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _) => rank(src) / outdeg(src) }.sum
      }
      rank = verts.map(v => v -> (Base + Damp * inflow.getOrElse(v, 0L) / 1000)).toMap
    }

    val got = GraphRank.q82GraphRank(spark, TestSession.sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == rank)
  }

  test("q82 invariants: floor everywhere; exactly the floor with no in-links") {
    val targets = Similarity.knnEdges(spark, TestSession.sf).collect()
      .map(_.getLong(1)).toSet
    val got = GraphRank.q82GraphRank(spark, TestSession.sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    assert(got.nonEmpty)
    got.foreach { case (v, r) =>
      assert(r >= Base, s"vec $v below the damping floor")
      if (!targets.contains(v)) assert(r == Base, s"unlinked vec $v above the floor")
    }
    assert(got.exists(_._2 > Base), "some vector must accumulate inflow")
  }
}
