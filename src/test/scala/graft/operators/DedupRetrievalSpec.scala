package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSession}

/** q103 search-result-dedup contract gate.
  *
  * The oracle row proves plan-vs-SQL agreement; this spec pins the
  * invariants the composition exists for: (a) no two returned hits of
  * one query share a near-dup cluster, (b) each surviving hit is its
  * cluster's BEST-ranked member from the deep list (dedup keeps the
  * representative, never a random member), (c) ranks re-pack to
  * 1..k in original-rank order, and (d) the operator is LOAD-BEARING
  * on the fixture — q95's raw top-5 actually contains intra-cluster
  * dups that q103 removes (if the fixture ever stops planting dup
  * chains into the ranked lists, this goes loud rather than the row
  * silently testing nothing).
  */
class DedupRetrievalSpec extends AnyFunSuite {
  import TestSession.spark

  private val sf = "/root/testdata/sf0.01"

  private def labelOf: Map[Long, Long] =
    Dedup.clusterLabels(spark, sf).collect()
      .map(r => r.getAs[Long]("v") -> r.getAs[Long]("lbl")).toMap

  test("no two hits of one query share a cluster; ranks re-pack 1..k") {
    val lbl = labelOf
    val rows = Retrieval.q103DedupRetrieval(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("qid")).foreach { case (qid, rs) =>
      val clusters = rs.map(_.getAs[Long]("cluster"))
      assert(clusters.distinct.length == clusters.length,
        s"qid $qid returned two hits of one cluster")
      // cluster column is consistent with the solved labels
      rs.foreach { r =>
        val d = r.getAs[Long]("doc_id")
        assert(r.getAs[Long]("cluster") == lbl.getOrElse(d, d))
      }
      val rns = rs.map(_.getAs[Int]("rn")).sorted.toList
      assert(rns == (1 to rs.length).toList,
        s"qid $qid ranks not contiguous: $rns")
    }
  }

  test("each hit is its cluster's best-ranked deep-list member") {
    val lbl = labelOf
    val docs = Tables.documents(spark, sf)
    val tf = Retrieval.tfOf(docs).localCheckpoint(false)
    val dl = Retrieval.dlOf(tf)
    val deep = Retrieval.serve(tf, dl, Retrieval.dfOf(tf),
      Retrieval.statsOf(dl), Retrieval.queriesOf(docs),
      0L, Retrieval.NQueries, Retrieval.PreDedupK).collect()
    val bestPerCluster = deep
      .groupBy(r => (r.getAs[Long]("qid"), {
        val d = r.getAs[Long]("doc_id"); lbl.getOrElse(d, d)
      }))
      .map { case (k, rs) => k -> rs.minBy(_.getAs[Int]("rn")).getAs[Long]("doc_id") }
    Retrieval.q103DedupRetrieval(spark, sf).collect().foreach { r =>
      val k = (r.getAs[Long]("qid"), r.getAs[Long]("cluster"))
      assert(bestPerCluster(k) == r.getAs[Long]("doc_id"),
        s"$k kept a non-representative member")
    }
  }

  test("load-bearing: q95's raw top-5 contains intra-cluster dups") {
    val lbl = labelOf
    val raw = Retrieval.q95Bm25TopK(spark, sf).collect()
    val dupSlots = raw.groupBy(_.getAs[Long]("qid")).valuesIterator.map { rs =>
      val cs = rs.map { r =>
        val d = r.getAs[Long]("doc_id"); lbl.getOrElse(d, d)
      }
      cs.length - cs.distinct.length
    }.sum
    info(s"intra-cluster dup slots in q95's raw top-5: $dupSlots / ${raw.length}")
    assert(dupSlots > 0,
      "fixture no longer plants near-dups into the ranked lists — q103 is untested")
  }
}
