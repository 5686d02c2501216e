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
}
