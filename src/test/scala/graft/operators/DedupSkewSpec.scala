package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSession

/** The LSH hot-bucket guard (VERDICT r2 #1): a pathological duplicate
  * cluster — millions of identical spam docs in one band bucket — must not
  * expand quadratically. Buckets over the cap emit linear hub pairs; below
  * the cap the guard is a no-op; coverage (every duplicate linked into its
  * component) survives capping.
  */
class DedupSkewSpec extends AnyFunSuite {
  import TestSession.spark
  import spark.implicits._

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("10k-clone cluster stays linear: hub pairs, not 50M all-pairs") {
    val clones = (0 until 10000).map(i =>
      (i.toLong, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val pairs = Dedup.candidatePairs(clones, cap = Dedup.HotBucketCap)
    val rows = pairs.collect()
    // every member links to the hub (min doc_id), exactly once
    assert(rows.length == 9999)
    assert(rows.forall(_.getLong(0) == 0L))
    assert(rows.map(_.getLong(1)).toSet == (1L until 10000L).toSet)
    // the cap is not silent: the observe metrics report the engagement
    val m = pairs.queryExecution.observedMetrics("graft_lsh_capped")
    assert(m.getAs[Long]("max_bucket") == 10000L)
    assert(m.getAs[Long]("capped_rows") == 4L * 9999L) // per band, pre-distinct
  }

  private def clustered = (0 until 30).flatMap { g =>
    (0 until 5).map(i =>
      ((g * 5 + i).toLong, s"group$g alpha$g beta$g gamma$g delta$g"))
  }.toDF("doc_id", "text")

  test("below the cap the guard is transparent: identical pair set") {
    val capped = pairSet(Dedup.candidatePairs(clustered, cap = Dedup.HotBucketCap))
    val uncapped = pairSet(Dedup.candidatePairs(clustered, cap = Int.MaxValue))
    assert(capped == uncapped && capped.nonEmpty)
  }

  test("attach modes (packed/plain/inline) are bit-identical, hub path included") {
    // The r16 inline attach (signatures ride the band rows, no attach
    // join) must produce the exact pair graph of the r12 packed default
    // and the plain m-column form — including through the hot-bucket hub
    // branch, where inline reads the hub's signature off the broadcast
    // aggregate instead of a join.
    def run(mode: String, docs: org.apache.spark.sql.DataFrame, cap: Int) = {
      spark.conf.set(Dedup.SigAttachConf, mode)
      try Dedup.minhashPairsWith(docs, cap).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      finally spark.conf.unset(Dedup.SigAttachConf)
    }
    val fixture = graft.Tables.documents(spark, TestSession.sf)
    val base = run("packed", fixture, Dedup.HotBucketCap)
    assert(base.nonEmpty)
    assert(run("plain", fixture, Dedup.HotBucketCap) == base)
    assert(run("inline", fixture, Dedup.HotBucketCap) == base)
    // a clone cluster under cap=2 forces every mode through the hub branch
    val clones = (0 until 50).map(i =>
      (i.toLong, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val hubBase = run("packed", clones, 2)
    assert(hubBase.nonEmpty)
    assert(run("plain", clones, 2) == hubBase)
    assert(run("inline", clones, 2) == hubBase)
    // band-sharded inline composes to the same graph
    spark.conf.set(Dedup.BandShardsConf, "2")
    try assert(run("inline", fixture, Dedup.HotBucketCap) == base)
    finally spark.conf.unset(Dedup.BandShardsConf)
  }

  test("q27 reports its collected-bucket heap bound, matching a replay") {
    import org.apache.spark.sql.functions._
    // the r12-verdict demand: the cap²-bounded group heap must be
    // observable, so a HotBucketCap increase shows up in telemetry
    val out = Dedup.q27NgramJaccard(spark, graft.TestSession.sf)
    out.collect()
    val m = out.queryExecution.observedMetrics("graft_q27_bucket_bytes")
    val got = m.getAs[Long]("max_bucket_bytes")
    // replay: largest (band,key) bucket in collected fingerprint bytes
    // (8 B each; sf0.001 has no over-cap buckets, so every bucket counts)
    val docs = graft.Tables.documents(spark, graft.TestSession.sf)
    val perDoc = Dedup.shingles(docs)
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val expected = Dedup.bandKeys(Dedup.signature(docs))
      .join(perDoc, "doc_id")
      .groupBy(col("band"), col("key")).agg((sum(col("n")) * 8L).as("b"))
      .agg(max(col("b"))).head().getLong(0)
    assert(got == expected, s"metric $got != replay $expected")
    assert(got > 0L)
  }

  test("capping preserves duplicate coverage: same docs linked, fewer edges") {
    val tight = pairSet(Dedup.candidatePairs(clustered, cap = 3))
    val full = pairSet(Dedup.candidatePairs(clustered, cap = Int.MaxValue))
    def covered(s: Set[(Long, Long)]) = s.flatMap(p => Set(p._1, p._2))
    assert(covered(tight) == covered(full))
    assert(tight.subsetOf(full))
    assert(tight.size < full.size) // 5-clone buckets: 4 hub edges vs 10 pairs
  }
}
