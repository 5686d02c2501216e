package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.HighWaterMark

/** Unit + property coverage for the contiguous-prefix HW operator and the
  * monotonic advance guard (reference semantics at
  * /root/reference/src/main/scala/StreamingApp.scala:238-252). */
class HighWaterMarkSpec extends AnyFunSuite {
  import TestSession.spark
  import spark.implicits._

  private def hwOf(seqs: Seq[(Int, Long)]): Long = {
    if (seqs.isEmpty) return 0L
    val chunks = seqs.toDF("seq", "size")
    HighWaterMark.contiguousPrefix(chunks, "seq")
      .agg(coalesce(sum($"size"), lit(0L)))
      .head().getLong(0)
  }

  /** Oracle: sum of sizes over the longest gap-free prefix 0..k. */
  private def prefixSum(seqs: Seq[(Int, Long)]): Long = {
    val m = seqs.toMap
    Iterator.from(0).takeWhile(m.contains).map(i => m(i)).sum
  }

  test("empty set -> HW 0") { assert(hwOf(Nil) == 0L) }

  test("gap at head -> HW 0") {
    assert(hwOf(Seq(1 -> 10L, 2 -> 10L)) == 0L)
  }

  test("gap in middle stops the mark") {
    assert(hwOf(Seq(0 -> 5L, 1 -> 7L, 3 -> 100L)) == 12L)
  }

  test("no gaps -> HW = total") {
    assert(hwOf(Seq(0 -> 1L, 1 -> 2L, 2 -> 3L)) == 6L)
  }

  test("property: HW equals longest gap-free prefix sum under any arrival permutation") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 25) {
      val n = rnd.nextInt(41)
      val seqs = (0 until n).collect {
        case i if rnd.nextDouble() < 0.8 => (i, (i + 1) * 3L)
      }
      val shuffled = rnd.shuffle(seqs.toVector)
      assert(hwOf(shuffled) == prefixSum(seqs), s"n=$n seqs=$seqs")
    }
  }

  test("property: two-phase prefix stats equal the window form on any shape") {
    import org.apache.spark.sql.types.DecimalType
    val rnd = new scala.util.Random(99)
    for (round <- 1 to 12) {
      val n = rnd.nextInt(2000)
      val seqs = (0 until n).collect {
        case i if rnd.nextDouble() < 0.9 => (i.toLong, (rnd.nextInt(10000) + 1) / 100.0)
      }
      // duplicates injected: replayed chunks must no-op in both forms
      val withDups = seqs ++ seqs.take(rnd.nextInt(5))
      val chunks = rnd.shuffle(withDups.toVector)
        .toDF("seq", "size")
        .withColumn("size", $"size".cast(DecimalType(18, 2)))
        .repartition(7)
      val twoLevel = HighWaterMark.contiguousPrefixAgg(chunks).head()
      val windowed = HighWaterMark.contiguousPrefix(chunks, "seq")
        .agg(coalesce(sum($"size"), lit(0).cast(DecimalType(28, 2))).cast("double"),
          count(lit(1)))
        .head()
      assert(twoLevel.getDouble(0) == windowed.getDouble(0), s"round $round hw")
      assert(twoLevel.getLong(1) == windowed.getLong(1), s"round $round n")
    }
  }

  test("advance: strict monotonic accept") {
    assert(HighWaterMark.advance(10, 20, Some(5L)) == ((10, 20, true)))
  }
  test("advance: no regression / no equal") {
    assert(HighWaterMark.advance(10, 10, Some(5L)) == ((10, 10, false)))
    assert(HighWaterMark.advance(10, 7, Some(5L)) == ((10, 10, false)))
  }
  test("advance: MFT not fully ingested blocks") {
    assert(HighWaterMark.advance(10, 20, Some(25L)) == ((10, 10, false)))
  }
  test("advance: missing MFT entry accepts (mft_entry is null branch)") {
    assert(HighWaterMark.advance(10, 20, None) == ((10, 20, true)))
  }
}
