package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.TestSession

/** q75 pinned against a sequential re-computation: collect the fixture
  * embeddings plus the query's own cell assignment and replay the
  * SemDeDup rule exactly (drop v iff a lower-id cell-mate has cosine ≥
  * threshold) — every keep/drop decision must match, the per-cell
  * minimum must always survive, and the table must conserve vectors. */
class SemanticDedupSpec extends AnyFunSuite {
  import TestSession.spark

  test("q75 decisions equal the sequential SemDeDup rule") {
    val out = Ivf.q75SemanticDedup(spark, TestSession.sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val emb = graft.Tables.embeddings(spark, TestSession.sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    assert(out.length == emb.size, "vectors not conserved")

    def cos(a: Array[Float], b: Array[Float]): Double = {
      var (d, na, nb, i) = (0.0, 0.0, 0.0, 0)
      while (i < a.length) {
        d += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      d / math.sqrt(na * nb)
    }

    out.groupBy(_._2).foreach { case (cell, members) =>
      val ids = members.map(_._1).sorted
      members.foreach { case (v, _, keep) =>
        val expectDrop = ids.takeWhile(_ < v)
          .exists(u => cos(emb(u), emb(v)) >= Ivf.SemThreshold)
        assert(keep == (if (expectDrop) 0 else 1),
          s"vec $v in cell $cell: keep=$keep, sequential rule says drop=$expectDrop")
      }
      assert(members.find(_._1 == ids.head).get._3 == 1,
        s"cell $cell minimum ${ids.head} must always survive")
    }
  }
}
