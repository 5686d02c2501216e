package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSession

/** The exact-span contract: q89's longest_run equals a driver-side
  * longest-common-substring (over tokens) for every reported pair — and
  * planted cases pin the edges: the planted passage's exact length comes
  * back, a pair sharing the same word at MANY non-adjacent positions
  * reports run 1 for those cells (diagonals don't merge), and every
  * q70 pair gets exactly one row.
  */
class SpansSpec extends AnyFunSuite {
  import TestSession.spark
  import spark.implicits._

  private def writeDocs(rows: Seq[(Long, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("spans-").toString
    rows.toDF("doc_id", "text").withColumn("lang", lit("en"))
      .withColumn("source", lit("s")).withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  /** Driver-side longest common token run (O(n·m) DP). */
  private def lcr(a: Seq[String], b: Seq[String]): Int = {
    val prev = new Array[Int](b.length + 1)
    var best = 0
    a.foreach { ta =>
      var diagOld = 0
      var j = 1
      while (j <= b.length) {
        val keep = prev(j)
        prev(j) = if (b(j - 1) == ta) diagOld + 1 else 0
        if (prev(j) > best) best = prev(j)
        diagOld = keep
        j += 1
      }
    }
    best
  }

  test("planted passage length comes back exactly; one row per q70 pair") {
    val passLen = 2 * (Winnow.W + Winnow.K - 1) // long enough for >= MinShared fps
    val passage = (0 until passLen).map(i => s"p$i").mkString(" ")
    val docs = Seq(
      1L -> s"alpha beta gamma delta $passage zz0 zz1 zz2 zz3",
      2L -> s"uno dos tres cuatro cinco seis $passage yy0 yy1",
      3L -> "completely unrelated text with enough tokens to stay out of every pair")
    val d = writeDocs(docs)
    val expectedPairs = Winnow.q70WinnowPairs(spark, d)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = Spans.q89DupSpans(spark, d).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(3))).toMap
    assert(got.keySet == expectedPairs, "one row per q70 pair violated")
    assert(got((1L, 2L)) == passLen.toLong,
      s"planted $passLen-token passage measured as ${got((1L, 2L))}")
  }

  test("q89 plans the pair semi-join UPSTREAM of the position explode") {
    // the ~len× posexplode amplification must be paid only on docs that
    // appear in a q70 pair (<1% of the corpus), never corpus-wide: the
    // position subplan must show a LeftSemi join feeding every Generate.
    // Asserted on [[Spans.pairedPositions]] — the exact subtree q89 pins
    // (the r16 lazy localCheckpoint truncates q89's own visible plan at a
    // LogicalRDD, so the shape is checked where it is still a plan).
    import org.apache.spark.sql.catalyst.plans.LeftSemi
    import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join}
    val pairIds = Winnow.q70WinnowPairs(spark, TestSession.sf)
      .select(col("doc_a").as("doc_id"))
    val plan = Spans.pairedPositions(spark, TestSession.sf, pairIds)
      .queryExecution.optimizedPlan
    val gens = plan.collect { case g: Generate => g }
    assert(gens.nonEmpty, "expected posexplode Generate nodes in q89")
    gens.foreach { g =>
      val semis = g.collect { case j: Join if j.joinType == LeftSemi => j }
      assert(semis.nonEmpty,
        "position explode runs corpus-wide — pair semi-join missing below Generate")
    }
    // and the declared q89 actually consumes a pinned (LogicalRDD) form
    // of that subtree rather than re-deriving it per match-join side
    val q89 = Spans.q89DupSpans(spark, TestSession.sf)
      .queryExecution.optimizedPlan
    assert(q89.collectLeaves().exists(
      _.nodeName.toLowerCase.contains("logicalrdd")),
      "q89 no longer pins the position table — expected a LogicalRDD leaf")
  }

  test("q89 == driver-side LCS over tokens on the fixture corpus") {
    val sf = TestSession.sf
    val texts = graft.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").toSeq).toMap
    val got = Spans.q89DupSpans(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(3)))
    assert(got.nonEmpty, "fixture produced no q70 pairs to span-check")
    got.foreach { case ((a, b), run) =>
      assert(run == lcr(texts(a), texts(b)).toLong,
        s"pair ($a,$b): q89 run $run != LCS ${lcr(texts(a), texts(b))}")
    }
  }
}
