package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins for the corpus-adaptive session dials (`Tables.corpusConfigs`):
  * they must engage ONLY above their size thresholds, because every
  * recorded sf0.1–sf30 number was taken at the defaults — a threshold
  * slip would silently re-price history (scan splits) or re-shape every
  * exchange (shuffle partitions). The fixture dirs double as the
  * below-threshold witnesses. */
class DialsSpec extends AnyFunSuite {

  test("fixture-scale corpora keep default scan splits and core-count shuffle") {
    val cfg = Tables.corpusConfigs("/root/testdata/sf0.01", "32").toMap
    assert(cfg(Tables.ScanSplitKey) == (128L << 20).toString)
    assert(cfg("spark.sql.shuffle.partitions") == "32")
    // the recorded fixture plans are single-pass: no shard dial emitted
    assert(!cfg.contains(graft.operators.Dedup.BandShardsConf))
    assert(!cfg.contains(graft.operators.Dedup.MaxPairsConf))
  }

  test("shufflePartsFor quadruples above 16 GiB and honors cpus below") {
    assert(Tables.shufflePartsFor("/root/testdata/sf0.001", "8") == "8")
    // a >16 GiB dir: synthesize by probing the real sf100 dir when present,
    // else skip (the arithmetic is the contract, the dir is the witness)
    val sf100 = new java.io.File("testdata/sf100")
    assume(sf100.isDirectory, "sf100 fixtures absent on this box")
    assert(Tables.shufflePartsFor("testdata/sf100", "32") == "128")
  }

  test("band-shard dial engages above 4 GiB (bit-identity measured, BASELINE r13)") {
    val sf100 = new java.io.File("testdata/sf100")
    assume(sf100.isDirectory, "sf100 fixtures absent on this box")
    val cfg = Tables.corpusConfigs("testdata/sf100", "32").toMap
    assert(cfg(graft.operators.Dedup.BandShardsConf) == "2")
    assert(cfg.contains(graft.operators.Dedup.MaxPairsConf))
  }
}
