package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSession

/** q83 pinned against a driver-side brute-force replay (same left-fold
  * double arithmetic, same tie rule); q84 pinned on its REASON TO EXIST:
  * every near-dup cluster lands in exactly one split, while the naive
  * per-doc hash split demonstrably straddles at least one cluster on the
  * same fixture — the leakage q84 removes.
  */
class ContrastiveSplitSpec extends AnyFunSuite {
  import TestSession.spark

  test("q83 equals a sequential brute-force replay") {
    val rows = graft.Tables.embeddings(spark, TestSession.sf)
      .select("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Float](2).toArray))
    def dot(a: Array[Float], b: Array[Float]): Double =
      a.indices.foldLeft(0.0)((acc, i) => acc + a(i).toDouble * b(i).toDouble)
    val n2 = rows.map { case (id, _, e) => id -> dot(e, e) }.toMap

    val expected = rows.filter(_._1 < Contrastive.NAnchors).flatMap {
      case (aid, albl, ae) =>
        rows.filter(_._2 != albl)
          .map { case (vid, _, ve) =>
            (vid, dot(ae, ve) / math.sqrt(n2(aid) * n2(vid)))
          }
          .sortBy { case (vid, c) => (-c, vid) }
          .take(Contrastive.KNeg)
          .zipWithIndex
          .map { case ((vid, _), i) => (aid, vid, i + 1) }
    }.toSet

    val got = Contrastive.q83HardNegatives(spark, TestSession.sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(4))).toSet
    assert(got == expected)
  }

  test("q84: no near-dup cluster straddles a split; the naive split would leak") {
    val labels = Dedup.clusterLabels(spark, TestSession.sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(labels.nonEmpty, "fixture must have near-dup clusters")

    def split(rep: Long): String = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"spl_$rep".getBytes("UTF-8"))
        .take(6).map("%02x".format(_)).mkString
      val b = java.lang.Long.parseLong(hex, 16) % 100
      if (b < 80) "train" else if (b < 90) "val" else "test"
    }

    // the guarantee: members inherit the REP's split, so per cluster there
    // is exactly one split — and the rollup q84 serves must agree with the
    // driver-side recount
    val docs = graft.Tables.documents(spark, TestSession.sf)
      .select("doc_id").collect().map(_.getLong(0))
    val repOf = labels.toMap
    val bySplit = docs.groupBy(d => split(repOf.getOrElse(d, d)))
    val groups = docs.map(d => repOf.getOrElse(d, d)).distinct
      .groupBy(split).map { case (k, v) => k -> v.length.toLong }
    val got = Sampling.q84LeakFreeSplit(spark, TestSession.sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    bySplit.foreach { case (sp, ds) =>
      assert(got(sp) == (ds.length.toLong, groups(sp)), s"rollup mismatch for $sp")
    }

    // the naive per-doc split (q50's rule) puts at least one cluster on
    // both sides of a boundary on this fixture — the leak q84 exists for
    val straddling = labels.groupBy(_._2).values
      .filter(_.length >= 2)
      .count(members => members.map { case (v, _) => split(v) }.distinct.length > 1)
    assert(straddling > 0, "fixture has no straddling cluster — spec is vacuous")
  }
}
