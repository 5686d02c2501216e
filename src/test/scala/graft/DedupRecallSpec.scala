package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** Retrieval-quality gate for the TEXT dedup banding, the q46 recall
  * gate's counterpart for MinHash: how many of the truly-similar pairs
  * (exact 2-shingle Jaccard >= 0.5, computed all-pairs via a shingle
  * self-join — a pair over the threshold must share shingles, so the join
  * is a complete ground truth) does the 4x3 banded pipeline surface?
  * q27 verifies candidates exactly, so its precision is 1.0 by
  * construction and its recall IS the banding recall; q20's MinHash
  * estimate adds estimation error on top. Floors sit below the measured
  * fixture values (BASELINE.md §recall) so parameter regressions fail the
  * suite. */
class DedupRecallSpec extends AnyFunSuite {
  import TestSession.spark

  private val sf = "/root/testdata/sf0.01"

  /** All pairs with exact 2-shingle Jaccard >= 0.5 — no banding. */
  private def truePairs: Set[(Long, Long)] = {
    val sh = Dedup.shingles(Tables.documents(spark, sf))
      .localCheckpoint()
    val counts = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    sh.as("a").join(sh.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_int"))
      .join(counts.select(col("doc_id").as("doc_a"), col("n_sh").as("na")), "doc_a")
      .join(counts.select(col("doc_id").as("doc_b"), col("n_sh").as("nb")), "doc_b")
      .filter(col("n_int") / (col("na") + col("nb") - col("n_int")).cast("double") >= 0.5)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("q27 banded+verified recall vs exact all-pairs Jaccard stays above the floor") {
    val want = truePairs
    assert(want.nonEmpty)
    val q27 = Dedup.q27NgramJaccard(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // precision 1.0 by construction — banded candidates are verified with
    // the same exact Jaccard the ground truth uses
    assert(q27.subsetOf(want))
    val r27 = (q27 & want).size.toDouble / want.size
    val q20 = Dedup.q20MinhashNeardup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val r20 = (q20 & want).size.toDouble / want.size
    info(f"pair recall  q27_verified=$r27%.3f  q20_estimated=$r20%.3f  (|true|=${want.size})")
    println(f"RECALL q27=$r27%.3f q20=$r20%.3f ntrue=${want.size}")
    assert(r27 >= 0.8, f"q27 banding recall $r27%.3f under floor 0.8")
    assert(r20 >= 0.6, f"q20 estimated recall $r20%.3f under floor 0.6")
  }
}
