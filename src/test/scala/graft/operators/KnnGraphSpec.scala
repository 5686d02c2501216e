package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.TestSession

/** q74 invariants: the k-NN graph must be a well-formed ranked adjacency
  * list (dense ranks, non-increasing cosine, no self-loops, ≤ K rows per
  * vector) and must agree with q46 where they overlap — every q46
  * over-threshold pair whose endpoints each keep ≤ K candidates appears
  * in the graph from both ends or was outranked by a strictly better
  * neighbor. */
class KnnGraphSpec extends AnyFunSuite {
  import TestSession.spark

  test("q74 is a well-formed ranked adjacency list") {
    val rows = Similarity.q74KnnGraph(spark, TestSession.sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (v, ns) =>
      val sorted = ns.sortBy(_._4)
      assert(sorted.map(_._4).toSeq == (1 to ns.length), s"ranks not dense for $v")
      assert(sorted.length <= Similarity.KnnK)
      assert(sorted.sliding(2).forall {
        case Array(a, b) => a._3 >= b._3
        case _ => true
      }, s"cosine not non-increasing for $v")
      assert(ns.forall(_._2 != v), s"self-loop at $v")
    }
  }

  test("q74 rank-1 edges dominate: no candidate beats the chosen neighbor") {
    // the rank-1 neighbor of v must have cosine >= every q46 pair partner
    // of v (q46 pairs are a subset of v's candidate set)
    val best = Similarity.q74KnnGraph(spark, TestSession.sf).collect()
      .filter(_.getInt(3) == 1)
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val pairs = Similarity.q46CosineNeardup(spark, TestSession.sf).collect()
      .flatMap(r => Seq(r.getLong(0) -> r.getDouble(2), r.getLong(1) -> r.getDouble(2)))
    pairs.foreach { case (v, c) =>
      assert(best.contains(v) && best(v) >= c,
        s"vec $v: rank-1 ${best.get(v)} beaten by a q46 partner at $c")
    }
  }
}
