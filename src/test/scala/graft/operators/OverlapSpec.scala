package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSession

/** The corpus-overlap diagnostics replayed sequentially on the driver:
  * q87's duplicated-shingle fraction and q88's cross-snapshot novelty
  * must equal a plain in-memory computation over the same shingle sets —
  * pinning the distributed df/semi-join formulations against the
  * definition, independent of the DuckDB oracles. Plus planted-edge
  * cases: a fully-duplicated doc scores 1000 permille duplication and
  * 0 novelty; an all-unique doc scores 0 and 1000.
  */
class OverlapSpec extends AnyFunSuite {
  import TestSession.spark
  import spark.implicits._

  private val K = Decontamination.ShingleK

  /** Driver-side distinct K-shingle set per doc. */
  private def shingleSets(rows: Seq[(Long, String)]): Map[Long, Set[String]] =
    rows.flatMap { case (id, text) =>
      val t = text.split(" ")
      if (t.length < K) None
      else Some(id -> t.sliding(K).map(_.mkString(" ")).toSet)
    }.toMap

  private def writeDocs(rows: Seq[(Long, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("overlap-").toString
    rows.toDF("doc_id", "text").withColumn("lang", lit("en"))
      .withColumn("source", lit("s")).withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  // doc 0/1: identical (every shingle duplicated; 0 even = old, 1 odd = new)
  // doc 2 (even): unique text
  // doc 3 (odd): half borrowed from doc 2, half unique
  // doc 5 (odd): fully unique — total novelty
  private val docs = Seq(
    0L -> "alpha beta gamma delta epsilon zeta eta theta",
    1L -> "alpha beta gamma delta epsilon zeta eta theta",
    2L -> "uno dos tres cuatro cinco seis siete ocho nueve",
    3L -> "uno dos tres cuatro cinco mixa mixb mixc mixd mixe",
    5L -> "nova novb novc novd nove novf")

  test("q87 == sequential duplicated-shingle replay; planted edges exact") {
    val d = writeDocs(docs)
    val sets = shingleSets(docs)
    val expected = sets.map { case (id, ss) =>
      val nDup = ss.count(sh => sets.exists { case (o, os) => o != id && os(sh) })
      (id, ss.size.toLong, nDup.toLong, 1000L * nDup / ss.size)
    }.toSeq.sortBy(_._1)
    val got = Overlap.q87DupNgramProfile(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected)
    val byId = got.map(t => t._1 -> t).toMap
    assert(byId(0L)._4 == 1000L && byId(1L)._4 == 1000L, "identical docs fully duplicated")
    assert(byId(5L)._4 == 0L, "unique doc has zero duplication")
    assert(byId(3L)._4 > 0L && byId(3L)._4 < 1000L, "mixed doc strictly between")
  }

  test("q88 == sequential cross-snapshot novelty replay; planted edges exact") {
    val d = writeDocs(docs)
    val sets = shingleSets(docs)
    val oldSet = sets.collect { case (id, ss) if id % 2 == 0 => ss }
      .foldLeft(Set.empty[String])(_ ++ _)
    val expected = sets.collect { case (id, ss) if id % 2 == 1 =>
      val seen = ss.count(oldSet)
      (id, ss.size.toLong, seen.toLong, 1000L * (ss.size - seen) / ss.size)
    }.toSeq.sortBy(_._1)
    val got = Overlap.q88SnapshotNovelty(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected)
    val byId = got.map(t => t._1 -> t).toMap
    assert(byId(1L)._4 == 0L, "copy of an old doc has zero novelty")
    assert(byId(5L)._4 == 1000L, "fully-new doc is all novel")
  }

  test("hot shingle: a 5k-doc boilerplate shingle stays linear and exact") {
    // unlike the pair operators (q20/q70), the profile has NO quadratic
    // term to cap: the df aggregate collapses the hot bucket map-side and
    // the join probe streams — so a boilerplate storm needs no FpCap here,
    // it just scores every doc as duplicated. Pin the exact values.
    val header = (0 until K).map(i => s"h$i").mkString(" ")
    val storm = (0L until 5000L).map(i => i -> s"$header u${i}a u${i}b u${i}c")
    val d = writeDocs(storm)
    val got = Overlap.q87DupNgramProfile(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.length == 5000)
    // each doc: 4 distinct shingles (h0..h3, then 3 unique-suffix ones);
    // only the header shingle is shared → 250 permille for every doc
    assert(got.forall { case (_, n, dup, pm) => n == 4L && dup == 1L && pm == 250L },
      s"unexpected profile rows: ${got.filterNot(t => t._2 == 4L && t._3 == 1L && t._4 == 250L).take(3).toSeq}")
  }

  test("q87/q88 plans: no FORCED broadcast of a corpus-proportional side") {
    // both join sides are corpus-scale BY DESIGN — the plans carry no
    // broadcast hint (AQE may still broadcast at fixture scale, where the
    // sides genuinely fit; the q56 doctrine is that nothing FORCES it at
    // 100x the data) and no cartesian
    Seq(Overlap.q87DupNgramProfile(spark, TestSession.sf),
      Overlap.q88SnapshotNovelty(spark, TestSession.sf)).foreach { df =>
      val plan = df.queryExecution.optimizedPlan.toString
      assert(!plan.contains("strategy=broadcast"), s"forced broadcast:\n$plan")
      assert(!df.queryExecution.executedPlan.toString.contains("CartesianProduct"))
    }
  }
}
