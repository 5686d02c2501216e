package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSession}

/** q105 eval-harness gate: the distributed recall@5 / nDCG@5 must equal
  * a driver-side sequential replay of the metric definitions over the
  * same ranked lists and the same pseudo-relevance labels — the
  * PropagateBloomSpec doctrine (oracle proves plan-vs-SQL agreement;
  * this proves both compute the METRIC the textbook defines). Plus the
  * structural floor the harness exists to detect: the hybrid run's mean
  * nDCG must be >= the lexical run's on the fixture (RRF fuses in an
  * agreeing vector leg — if fusion ever degraded below its own lexical
  * leg here, the eval operator is what should notice). */
class RetrievalEvalSpec extends AnyFunSuite {
  import TestSession.spark

  private val sf = "/root/testdata/sf0.01"
  private val disc = Seq(1000L, 631L, 500L, 431L, 387L)

  test("distributed metrics equal the sequential replay") {
    // relevance: docs containing ALL of the query's distinct terms
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("text").split(" ").toSet).toMap
    // re-derive query terms exactly as queriesOf does: first 4 tokens,
    // distinct
    val qterms = Tables.documents(spark, sf)
      .filter(col("doc_id") % Retrieval.QStride === 0 &&
        expr(s"doc_id DIV ${Retrieval.QStride}") < Retrieval.NQueries)
      .select(expr(s"doc_id DIV ${Retrieval.QStride}").as("qid"), col("text"))
      .collect()
      .map(r => r.getAs[Long]("qid") ->
        r.getAs[String]("text").split(" ").take(Retrieval.QTerms).toSet)
      .toMap
    val rel: Map[Long, Set[Long]] = qterms.map { case (qid, terms) =>
      qid -> docs.collect { case (d, toks) if terms.subsetOf(toks) => d }.toSet
    }
    val runs = Map(
      "lex" -> Retrieval.q95Bm25TopK(spark, sf).collect()
        .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("doc_id"), r.getAs[Int]("rn"))),
      "hybrid" -> Retrieval.q97HybridRrf(spark, sf).collect()
        .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("doc_id"), r.getAs[Int]("rn"))))
    val want = for {
      (run, rows) <- runs
      (qid, qrows) <- rows.groupBy(_._1)
    } yield {
      val relSet = rel(qid)
      val hits = qrows.count(t => relSet.contains(t._2)).toLong
      val dcg = qrows.filter(t => relSet.contains(t._2)).map(t => disc(t._3 - 1)).sum
      val idcg = disc.take(math.min(relSet.size, 5)).sum
      (run, qid) -> (relSet.size.toLong, hits,
        hits * 1000L / relSet.size, dcg * 1000L / idcg)
    }
    val got = Retrieval.q105RetrievalEval(spark, sf).collect()
      .map(r => (r.getAs[String]("run"), r.getAs[Long]("qid")) ->
        (r.getAs[Long]("n_rel"), r.getAs[Long]("hits"),
          r.getAs[Long]("recall_milli"), r.getAs[Long]("ndcg_milli"))).toMap
    assert(got.keySet == want.keySet)
    want.foreach { case (k, v) =>
      assert(got(k) == v, s"metrics diverge at $k: got ${got(k)}, want $v")
    }
  }

  /** Calibration + discrimination floors. Conjunctive-containment
    * pseudo-labels are BY CONSTRUCTION aligned with the lexical leg
    * (a doc holding every query term is a top BM25 hit), so the eval
    * harness must (a) score the label-generator run PERFECT — any
    * ndcg < 1000 on the lex run is a metric wiring bug, not a ranking
    * one — and (b) measurably separate the hybrid run, which fuses an
    * orthogonal vector leg, while that run retains the majority of
    * the label-aligned signal. The hybrid-beats-each-leg floor on
    * labels NEITHER leg generates lives in [[HybridRelevanceSpec]];
    * this spec pins that the harness itself can detect such shifts. */
  test("calibration: label-aligned leg perfect; fused run separated but above floor") {
    val rows = Retrieval.q105RetrievalEval(spark, sf).collect()
    def mean(run: String) = {
      val xs = rows.filter(_.getAs[String]("run") == run)
        .map(_.getAs[Long]("ndcg_milli"))
      xs.sum.toDouble / xs.length
    }
    val (h, l) = (mean("hybrid"), mean("lex"))
    info(f"mean nDCG@5  hybrid=$h%.0f  lex=$l%.0f  (milli)")
    assert(l == 1000.0, s"label-aligned lexical run must calibrate to 1000, got $l")
    assert(h < l, "harness failed to discriminate the orthogonally-fused run")
    assert(h >= 600.0, s"fused run lost the majority of label-aligned signal: $h")
  }
}
