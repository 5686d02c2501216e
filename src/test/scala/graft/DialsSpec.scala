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

  test("shufflePartsFor quadruples above 4 GiB and honors cpus below") {
    assert(Tables.shufflePartsFor("/root/testdata/sf0.001", "8") == "8")
    // threshold lowered 16 GiB -> 4 GiB in r14: the sf30 attach sorts were
    // a coin-flip OOM at core-count parts (BASELINE r14). Witness: any
    // >4 GiB local corpus dir (sf30 preferred, sf100 legacy)
    val big = Seq("testdata/sf30", "testdata/sf100")
      .find(d => new java.io.File(d).isDirectory)
    assume(big.isDefined, "no >4 GiB fixture dir on this box")
    assert(Tables.shufflePartsFor(big.get, "32") == "128")
  }

  test("band-shard dial engages above 4 GiB (bit-identity measured, BASELINE r13)") {
    val big = Seq("testdata/sf30", "testdata/sf100")
      .find(d => new java.io.File(d).isDirectory)
    assume(big.isDefined, "no >4 GiB fixture dir on this box")
    val cfg = Tables.corpusConfigs(big.get, "32").toMap
    assert(cfg(graft.operators.Dedup.BandShardsConf) == "2")
    // the pairs ceiling stays a >16 GiB dial: present for the sf100-class
    // witness, absent for sf30 (6.2 GiB)
    assert(cfg.contains(graft.operators.Dedup.MaxPairsConf) ==
      big.get.endsWith("sf100"))
  }
}
