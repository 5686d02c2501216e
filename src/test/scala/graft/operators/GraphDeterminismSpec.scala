package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSession

/** Layout-independence of the graph stack: the k-NN edge list and both
  * of its iterative consumers must produce IDENTICAL rows whatever the
  * partitioning — the distributed-determinism property every downstream
  * split/curation decision silently relies on. The guts under test: the
  * per-row fold dot product (partition-independent by construction,
  * unlike a distributed float sum), total tie-breaks in the top-k
  * window, and the integer vote/rank arithmetic.
  */
class GraphDeterminismSpec extends AnyFunSuite {
  import TestSession.spark

  private def withShuffle(n: Int)(f: => Set[String]): Set[String] = {
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", n.toString)
    try f finally spark.conf.set("spark.sql.shuffle.partitions", before)
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  test("q74/q80/q82 rows are identical across shuffle layouts") {
    for (
      (name, q) <- Seq[(String, () => org.apache.spark.sql.DataFrame)](
        ("q74", () => Similarity.q74KnnGraph(spark, TestSession.sf)),
        ("q80", () => Propagate.q80LabelProp(spark, TestSession.sf)),
        ("q82", () => GraphRank.q82GraphRank(spark, TestSession.sf)))
    ) {
      val a = withShuffle(2)(rows(q()))
      val b = withShuffle(17)(rows(q()))
      assert(a == b, s"$name output depends on the shuffle layout")
      assert(a.nonEmpty)
    }
  }
}
