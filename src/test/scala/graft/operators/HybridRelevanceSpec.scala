package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSession

/** End-to-end RELEVANCE floor for the hybrid retrieval family — the
  * quality pin [[RetrievalSpec]]'s fusion mechanics don't give:
  * RetrievalSpec proves q97 == RRF(its own legs) (exactness), but a
  * fusion of two broken legs would pass that tautologically. This spec
  * plants a LABELED relevance fixture (query → relevant doc set, known
  * by construction) and pins recall@5 the way AnnRecallSpec pins ANN
  * recall: each leg alone recovers only PART of the labeled set, and
  * the hybrid must recover strictly more than either leg.
  *
  * The planted structure per query (the complementarity hybrid
  * retrieval exists to exploit):
  *  - r0, r1: keyword-matching relevants — carry the query terms, but
  *    their embeddings are orthogonal to the probe (paraphrase-blind
  *    lexical hits). Only the LEXICAL leg can see them.
  *  - r3, r4: paraphrase relevants — near the probe in embedding space,
  *    but share no token with the query. Only the VECTOR leg can see
  *    them.
  *  - r2: visible to BOTH legs (terms + nearby embedding).
  *  - d1: a lexical distractor (query terms, orthogonal embedding, NOT
  *    relevant) that enters the lexical top-5 below the relevants;
  *    v1, v2: vector distractors (cosine just under the paraphrase
  *    relevants) that enter the vector top-5.
  * So each leg's top-5 holds 3 of the 5 labeled docs, and RRF's
  * both-legs dominance (pinned in RetrievalSpec) lifts r2 while the
  * rank-1/2 singles from BOTH legs — which include r0/r3 — fill the
  * rest: the fused list recovers ≥4 of 5. The floors sit AT the
  * constructed values (they are deterministic, not noisy measurements):
  * each leg exactly 0.6, hybrid ≥ 0.8 and strictly above both legs.
  */
class HybridRelevanceSpec extends AnyFunSuite {
  import TestSession.spark
  import spark.implicits._

  private val Q = Retrieval.NQueries // 10
  private val Stride = Retrieval.QStride // 17
  private val Dim = graft.Dials.EmbeddingDim

  /** The labeled fixture, written once as a corpus dir (documents +
    * embeddings parquet) so the REAL queries run on it unmodified. */
  private lazy val dir: String = {
    val d = Files.createTempDirectory("hybrid-rel").toString
    val docs = Seq.newBuilder[(Long, String)]
    val embs = Seq.newBuilder[(Long, Array[Float])]

    def unit(axis: Int, cos: Double): Array[Float] = {
      val a = Array.fill(Dim)(0.0f)
      a(axis) = cos.toFloat
      a(axis + 1) = math.sqrt(1.0 - cos * cos).toFloat
      a
    }

    for (q <- 0 until Q) {
      val Seq(t1, t2, t3, t4) = (1 to 4).map(i => s"q${q}t$i")
      val base = 1000L + 100L * q
      val axis = 2 * q // per-query axis pair: cross-query cosine is 0
      // the query source: its first 4 tokens ARE the query; its
      // embedding IS the probe
      docs += ((Stride * q.toLong, s"$t1 $t2 $t3 $t4"))
      embs += ((Stride * q.toLong, unit(axis, 1.0)))
      // keyword relevants (lexical-only): all 4 terms, increasing doc
      // length so BM25 orders r0 > r1; embeddings orthogonal to probe
      docs += ((base + 0, s"$t1 $t2 $t3 $t4 fill fill"))
      docs += ((base + 1, s"$t1 $t2 $t3 $t4 fill fill fill fill"))
      embs += ((base + 0, unit(axis, 0.0)))
      embs += ((base + 1, unit(axis, 0.0)))
      // the both-legs relevant: 3 terms (below r0/r1 lexically) AND
      // third-nearest embedding
      docs += ((base + 2, s"$t1 $t2 $t3 fill fill"))
      embs += ((base + 2, unit(axis, 0.93)))
      // paraphrase relevants (vector-only): nearest embeddings, no terms
      docs += ((base + 3, "para fill fill"))
      docs += ((base + 4, "para fill fill"))
      embs += ((base + 3, unit(axis, 0.95)))
      embs += ((base + 4, unit(axis, 0.94)))
      // lexical distractor: 2 terms — enters lex top-5 at the bottom
      docs += ((base + 10, s"$t1 $t2"))
      embs += ((base + 10, unit(axis, 0.0)))
      // vector distractors: cosine just under the paraphrase relevants
      docs += ((base + 20, "junk fill"))
      docs += ((base + 21, "junk fill"))
      embs += ((base + 20, unit(axis, 0.92)))
      embs += ((base + 21, unit(axis, 0.91)))
    }
    docs.result().toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    embs.result().toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  /** query → the 5 labeled relevant docs. */
  private def relevant(q: Int): Set[Long] =
    (0L to 4L).map(1000L + 100L * q + _).toSet

  private def topByQid(df: DataFrame): Map[Long, Set[Long]] =
    df.collect().groupBy(_.getAs[Long]("qid"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("doc_id")).toSet }

  /** Total labeled hits across the Q queries (integer — the metric is
    * deterministic by construction, so float averaging would only add
    * representation noise); recall@5 = hits / (5·Q). */
  private def hitsAt5(got: Map[Long, Set[Long]]): Int =
    (0 until Q).map { q =>
      (got.getOrElse(q.toLong, Set.empty) & relevant(q)).size
    }.sum

  test("hybrid recall@5 beats each leg on the labeled fixture") {
    val total = 5 * Q
    val lex = hitsAt5(topByQid(
      Retrieval.q95Bm25TopK(spark, dir)))
    val vec = hitsAt5(topByQid(
      Retrieval.vectorLeg(spark, dir)
        .withColumnRenamed("vrn", "rn")))
    val hybrid = hitsAt5(topByQid(
      Retrieval.q97HybridRrf(spark, dir)))
    info(s"hits@5 of $total:  lexical=$lex  vector=$vec  hybrid=$hybrid")
    // each leg sees exactly its 3 of 5 per query (deterministic)
    assert(lex == 3 * Q, s"lexical leg hits $lex != constructed ${3 * Q}")
    assert(vec == 3 * Q, s"vector leg hits $vec != constructed ${3 * Q}")
    // the hybrid must be STRICTLY better than both legs, and clear 0.8
    assert(hybrid > lex && hybrid > vec,
      s"hybrid $hybrid must beat both legs ($lex / $vec)")
    assert(hybrid >= 4 * Q, s"hybrid recall@5 ${hybrid.toDouble / total} under 0.8")
  }

  test("the ANN-leg hybrid (q98 shape) also clears both legs on the fixture") {
    // same fusion, vector leg through the trained-IVF candidate rule —
    // the production shape; on this fixture every planted neighbor
    // shares the probe's axis pair, so coarse cells keep them findable
    val hybrid = hitsAt5(topByQid(Retrieval.q98HybridAnnRrf(spark, dir)))
    info(s"hits@5 of ${5 * Q}:  hybrid-ann=$hybrid")
    assert(hybrid > 3 * Q, s"ANN hybrid $hybrid must beat the single legs (${3 * Q})")
  }
}
