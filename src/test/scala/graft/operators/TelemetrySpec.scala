package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSession

/** The sketch-telemetry contract (no cross-engine oracle can exist for
  * sketch binaries, so everything is pinned here):
  *
  *  - estimates land inside the published HLL error envelope of the
  *    exact distinct counts (lgK=12 → ~1.6% RSE; we assert 5% ≈ 3σ);
  *  - exact companions (n_docs, n_tokens) are exactly right;
  *  - the merged estimate is IDENTICAL under any sharding of the corpus
  *    (register-max union is partition-invariant — the property that
  *    makes the sketch column safe for incremental maintenance);
  *  - merging shard sketches agrees with sketching the whole corpus.
  */
class TelemetrySpec extends AnyFunSuite {
  import TestSession.spark

  private lazy val docs = graft.Tables.documents(spark, TestSession.sf)

  private lazy val exact = docs
    .select(col("source"), col("doc_id"), explode(split(col("text"), " ")).as("tok"))
    .groupBy("source")
    .agg(count_distinct(col("doc_id")).as("n_docs"),
      count(lit(1)).as("n_tokens"),
      count_distinct(col("tok")).as("exact_distinct"))
    .collect()
    .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
    .toMap

  test("per-source estimates inside the HLL error envelope; exact companions exact") {
    val got = Telemetry.estimates(Telemetry.sourceSketches(docs))
      .select("source", "n_docs", "n_tokens", "distinct_tokens_est").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got.keySet == exact.keySet)
    got.foreach { case (src, (nd, nt, est)) =>
      val (end, ent, ex) = exact(src)
      assert(nd == end && nt == ent, s"$src exact companions drifted")
      assert(math.abs(est - ex).toDouble / ex <= 0.05,
        s"$src estimate $est outside 5% of exact $ex")
    }
  }

  test("merged estimate is shard-invariant and agrees with the one-shot sketch") {
    val oneShot = Telemetry.estimates(Telemetry.sourceSketches(docs))
      .select("source", "distinct_tokens_est").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

    def viaShards(mod: Int): Map[String, Long] = {
      val shards = (0 until mod).map { i =>
        Telemetry.sourceSketches(docs.filter(col("doc_id") % mod === i))
      }.reduce(_ unionByName _)
      Telemetry.estimates(Telemetry.mergeSketches(shards))
        .select("source", "distinct_tokens_est").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    }

    val bySplit3 = viaShards(3)
    val bySplit7 = viaShards(7)
    assert(bySplit3 == bySplit7, "merged estimate depends on the sharding")
    // union drops HIP to the composite estimator, so merged vs one-shot
    // may differ slightly — but both must sit inside the envelope, and
    // the union of a PARTITION of the corpus must stay within 5% of the
    // one-shot number itself
    bySplit3.foreach { case (src, est) =>
      assert(math.abs(est - oneShot(src)).toDouble / oneShot(src) <= 0.05,
        s"$src merged $est vs one-shot ${oneShot(src)}")
      val ex = exact(src)._3
      assert(math.abs(est - ex).toDouble / ex <= 0.05,
        s"$src merged $est outside 5% of exact $ex")
    }
  }

  test("q115 roots: primary stays exactly-once-clean, re-delivery probe is KMV-inert") {
    // The r15 advisor's trap: the content re-delivery leg re-appends
    // slice 0 to the HLL telemetry table, whose n_docs/n_tokens are
    // delivery-counted SUMS — so the q115 build runs that leg on a state
    // CLONE. Pin both halves of the contract:
    //  1. the PRIMARY root's snapshot equals the one-shot corpus sketch
    //     (every serve from it is valid — no double count anywhere);
    //  2. the PROBE root's snapshot is visibly over-counted (the reason
    //     `snapshot` must never be served from it), while its
    //     vocabSnapshot is IDENTICAL to the primary's (re-delivery is
    //     inert on the KMV law — the fact q115's hash pins).
    val d = TestSession.sf
    val root = Sketch.ensureVocabBuilt(spark, d)
    def ts(sub: String) = new graft.streaming.TelemetryStream(spark,
      new graft.streaming.StateDir(spark, s"$root/$sub"))
    val primary = ts("telemetry")
    val probe = ts(Sketch.RedeliverProbe)

    val capped = docs.filter(col("doc_id") < StreamState.GateDocCap)
    def counts(df: org.apache.spark.sql.DataFrame) =
      df.select("source", "n_docs", "n_tokens").collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val oneShot = counts(Telemetry.estimates(Telemetry.sourceSketches(capped)))
    assert(counts(primary.snapshot) == oneShot,
      "primary root's delivery-counted sums drifted from the one-shot corpus")
    val probeCounts = counts(probe.snapshot)
    assert(probeCounts.values.map(_._1).sum > oneShot.values.map(_._1).sum,
      "probe root should over-count docs (else the clone is pointless)")

    def vocab(t: graft.streaming.TelemetryStream) =
      t.vocabSnapshot.orderBy(col("lang")).collect().toSeq
    assert(vocab(probe) == vocab(primary),
      "re-delivery must be inert on the KMV merge law")
  }

  test("corpus rollup serves totals from sketches alone") {
    val row = Telemetry.corpusRollup(Telemetry.sourceSketches(docs)).head
    val exDocs = exact.values.map(_._1).sum
    val exToks = exact.values.map(_._2).sum
    assert(row.getLong(0) == exDocs && row.getLong(1) == exToks)
    val exactAll = docs
      .select(explode(split(col("text"), " ")).as("tok"))
      .agg(count_distinct(col("tok"))).head.getLong(0)
    assert(math.abs(row.getLong(2) - exactAll).toDouble / exactAll <= 0.05)
  }
}
