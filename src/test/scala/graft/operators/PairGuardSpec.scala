package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSession

/** The pair-graph pre-flight guard (r12 verdict item 3): the bucket-stat
  * forecast must equal the materialized slot volume EXACTLY (it is the
  * same law, Σ b(b−1)/2 + Σ_hot (b−1), evaluated before any pair exists),
  * the configurable ceiling must fail fast with sizing advice, and the
  * band-sharded two-pass escape hatch must produce the identical pair
  * graph. */
class PairGuardSpec extends AnyFunSuite {
  import TestSession.spark

  private lazy val sig = Dedup.signature(
    graft.Tables.documents(spark, TestSession.sf))

  test("forecast equals materialized slot volume (small-bucket and hub regimes)") {
    for (cap <- Seq(Dedup.HotBucketCap, 2)) {
      val bk = Dedup.bandKeys(sig)
      val forecast = Dedup.pairSlotForecast(bk, cap)
      val actual = Dedup.pairSlots(bk, cap).count()
      assert(forecast == actual, s"cap=$cap: forecast $forecast != $actual")
      assert(forecast > 0, "fixture must exercise the law")
    }
  }

  test("ceiling breach fails fast with the sizing rule in the message") {
    spark.conf.set(Dedup.MaxPairsConf, "1")
    try {
      val e = intercept[IllegalStateException](
        Dedup.q20MinhashNeardup(spark, TestSession.sf).count())
      assert(e.getMessage.contains("scratch")
        && e.getMessage.contains(Dedup.BandShardsConf),
        s"message must carry sizing advice, got: ${e.getMessage}")
    } finally spark.conf.unset(Dedup.MaxPairsConf)
  }

  test("a generous ceiling passes (the forecast is a guard, not a tax)") {
    spark.conf.set(Dedup.MaxPairsConf, Long.MaxValue.toString)
    try assert(Dedup.q20MinhashNeardup(spark, TestSession.sf).count() > 0)
    finally spark.conf.unset(Dedup.MaxPairsConf)
  }

  test("band-sharded two-pass mode yields the identical pair graph") {
    val base = Dedup.q20MinhashNeardup(spark, TestSession.sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    spark.conf.set(Dedup.BandShardsConf, "2")
    try {
      val sharded = Dedup.q20MinhashNeardup(spark, TestSession.sf)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(sharded == base, "sharded pair graph must be bit-identical")
    } finally spark.conf.unset(Dedup.BandShardsConf)
  }

  test("fixture-scale corpora emit no ceiling (dial engages above 16 GiB only)") {
    assert(graft.Tables.pairsCeilingFor(TestSession.sf).isEmpty)
    assert(graft.Tables.pairsCeilingFor("/root/testdata/sf0.01").isEmpty)
  }
}
