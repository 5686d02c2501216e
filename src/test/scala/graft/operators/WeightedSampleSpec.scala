package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSession

/** q113's two-phase (kmin-threshold → bounded rank) selection pinned
  * against the naive single-window formulation it must equal bit-for-bit,
  * plus the laws that make it WEIGHTED sampling: heavier docs win more
  * slots than a uniform draw would give them, a maximally-heavy doc is
  * effectively always drawn, and the selection is layout-invariant.
  */
class WeightedSampleSpec extends AnyFunSuite {
  import TestSession.spark
  import spark.implicits._

  private def writeDocs(rows: Seq[(Long, String, Long)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("wsmp-").toString
    rows.toDF("doc_id", "lang", "n_chars")
      .withColumn("text", lit("t")).withColumn("source", lit("s"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def naive(d: String) = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("lang")).orderBy(col("pri"), col("doc_id"))
    graft.Tables.documents(spark, d)
      .withColumn("hv",
        Dedup.hex12(concat(lit("wgt_"), col("doc_id").cast("string"))))
      .withColumn("pri", expr("hv DIV greatest(coalesce(n_chars, 1L), 1L)"))
      .withColumn("rn", row_number().over(w).cast("int"))
      .filter(col("rn") <= Sampling.WeightedN)
      .select(col("doc_id"), col("lang"), col("pri"), col("rn"))
  }

  private def asSet(df: org.apache.spark.sql.DataFrame): Set[(Long, String, Long, Int)] =
    df.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getLong(2), r.getInt(3))).toSet

  test("two-phase selection == naive single window on the fixture corpus") {
    val d = graft.TestSession.sf
    assert(asSet(Sampling.q113WeightedSample(spark, d)) == asSet(naive(d)))
  }

  test("weighting law: heavy stratum overrepresented, giant doc always in") {
    // 500 docs weight 1, 100 docs weight 1000, one doc weight 2^40
    val rows = (0L until 500L).map(i => (i, "xx", 1L)) ++
      (1000L until 1100L).map(i => (i, "xx", 1000L)) :+ ((9999L, "xx", 1L << 40))
    val d = writeDocs(rows)
    val got = Sampling.q113WeightedSample(spark, d)
      .collect().map(_.getLong(0)).toSet
    assert(got.size == Sampling.WeightedN)
    assert(got.contains(9999L), "the 2^40-weight doc must be drawn")
    val heavy = got.count(id => id >= 1000L && id < 1100L)
    val light = got.count(_ < 500L)
    // uniform draw would give heavy ≈ 60·(100/601) ≈ 10; 1000× weights
    // push nearly every slot to the heavy stratum
    assert(heavy > light, s"heavy=$heavy light=$light — weights not biasing")
    assert(heavy >= 40, s"heavy stratum got only $heavy of ${Sampling.WeightedN}")
  }

  test("under-K stratum: +inf threshold keeps every doc, ranks exact") {
    val d = writeDocs(Seq((1L, "yy", 10L), (2L, "yy", 20L), (3L, "yy", 30L)))
    val got = Sampling.q113WeightedSample(spark, d).collect()
    assert(got.length == 3)
    assert(got.map(_.getInt(3)).sorted.toSeq == Seq(1, 2, 3))
  }

  test("layout-invariant: same selection through a 7-partition rewrite") {
    val d = graft.TestSession.sf
    val base = asSet(Sampling.q113WeightedSample(spark, d))
    val dir = java.nio.file.Files.createTempDirectory("wsmp-copy-").toString
    graft.Tables.documents(spark, d).repartition(7)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    assert(asSet(Sampling.q113WeightedSample(spark, dir)) == base)
  }

  // ---------------------------------------------------------------- q114

  test("q114 budget law: K_lang = alloc_tokens DIV avg_doc_tokens " +
    "(floor 1) and the draw fills exactly K_lang where the corpus allows") {
    val d = graft.TestSession.sf
    val rows = Sampling.q114BudgetSample(spark, d).collect()
    assert(rows.nonEmpty)
    val docsPerLang = graft.Tables.documents(spark, d)
      .groupBy(col("lang")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val (lang, alloc, avg, k, drawn) =
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(k == math.max(alloc / avg, 1L), s"$lang: k=$k != law")
      assert(drawn == math.min(k, docsPerLang(lang)),
        s"$lang: drawn=$drawn, k=$k, docs=${docsPerLang(lang)}")
    }
    // Hamilton: per-lang allocations sum to within |groups| of budget/16
    // (exactness at (lang, source) grain is q63's own oracle-pinned law)
    val allocSum = rows.map(_.getLong(1)).sum
    assert(allocSum > 0)
  }

  test("q114 regime equality: the over-cap histogram cascade selects the " +
    "same rows as the kmin-threshold path") {
    val d = graft.TestSession.sf
    def summary(kminCap: Int) =
      Sampling.q114Draw(spark, d, kminCap).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getLong(6))).toSet
    // kminCap=0 forces every language over the cap → cascade path
    assert(summary(0) == summary(Sampling.KminCap),
      "cascade path diverged from the kmin-threshold path")
  }
}
