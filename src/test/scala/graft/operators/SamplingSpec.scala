package graft.operators

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSession

/** The selection operators' headline claim — the SAME rows are chosen no
  * matter how the data is laid out — pinned by running q49/q50 over the
  * same corpus written at two very different partition layouts. A
  * random-sampling implementation (rand(), per-partition RNG) fails this
  * the moment the file count changes; the hash selection cannot. */
class SamplingSpec extends AnyFunSuite {
  import TestSession.spark
  import spark.implicits._

  private def corpus = (0 until 400).map { i =>
    (i.toLong, s"doc $i body ${"x " * (i % 7)}", if (i % 3 == 0) "en" else s"l${i % 5}")
  }

  private def writeDocs(parts: Int): String = {
    val dir = Files.createTempDirectory(s"sampling-$parts-").toString
    corpus.toDF("doc_id", "text", "lang").repartition(parts)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq

  test("q49/q50 select identical rows across partition layouts") {
    val a = writeDocs(1)
    val b = writeDocs(13)
    assert(rows(Sampling.q49StratifiedSample(spark, a))
      == rows(Sampling.q49StratifiedSample(spark, b)))
    assert(rows(Sampling.q50HashSplit(spark, a))
      == rows(Sampling.q50HashSplit(spark, b)))
    // and the split genuinely partitions: every doc in exactly one split
    val total = Sampling.q50HashSplit(spark, a)
      .agg(org.apache.spark.sql.functions.sum("n_docs")).first().getLong(0)
    assert(total == corpus.size)
  }

  test("q60 quota selection is exact, balanced, and layout-independent") {
    val a = writeDocs(1)
    val b = writeDocs(13)
    val selA = rows(Sampling.q60QuotaSample(spark, a))
    assert(selA == rows(Sampling.q60QuotaSample(spark, b)))
    // exactly quota per language where the stratum is big enough, the whole
    // stratum where it is not (corpus: en≈134+l3-stratum overlap, l1/l2/l4≈67+)
    val perLang = Sampling.q60QuotaSample(spark, a)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val strata = corpus.groupBy(_._3).view.mapValues(_.size).toMap
    strata.foreach { case (lang, n) =>
      assert(perLang(lang) == math.min(n, Sampling.QuotaN).toLong,
        s"lang $lang: ${perLang.get(lang)} of $n")
    }
    // ranks are 1..K dense per language
    val ranks = Sampling.q60QuotaSample(spark, a).collect()
      .groupBy(_.getString(1)).view.mapValues(_.map(_.getInt(2)).sorted.toSeq)
    ranks.foreach { case (lang, rs) =>
      assert(rs == (1 to rs.size), s"lang $lang ranks not dense: $rs")
    }
  }
}
