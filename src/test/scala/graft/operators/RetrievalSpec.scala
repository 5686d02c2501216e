package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSession

/** q95 pinned against a driver-side sequential BM25 replay: the exact
  * integer-milliunit formula recomputed in plain Scala over the same
  * corpus must reproduce the distributed plan's top-k lists verbatim —
  * scores, order, ties and all. A planted-corpus test then checks the
  * ranking behaves like BM25 (rarity outranks frequency, length
  * normalization bites) rather than merely matching itself. */
class RetrievalSpec extends AnyFunSuite {
  import TestSession.spark

  private val sf = TestSession.sf

  private def idf(nDocs: Long, df: Long): Long =
    1L + (63 - java.lang.Long.numberOfLeadingZeros(nDocs / df))

  /** The sequential replay — one pass, the integer formula verbatim. */
  private def bm25Replay(texts: Map[Long, String])
      : Seq[(Long, Long, Long, Int)] = {
    val toks = texts.map { case (id, t) => id -> t.split(" ", -1).toSeq }
    val tf = toks.map { case (id, ts) =>
      id -> ts.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    }
    val dl = tf.map { case (id, m) => id -> m.values.sum }
    val dfreq = tf.values.flatMap(_.keys).groupBy(identity)
      .map { case (k, v) => k -> v.size.toLong }
    val nDocs = texts.size.toLong
    val adlM = dl.values.sum * 1000L / nDocs
    val queries = texts.keys.filter(id =>
        id % Retrieval.QStride == 0 && id / Retrieval.QStride < Retrieval.NQueries)
      .map(id => (id / Retrieval.QStride) ->
        toks(id).take(Retrieval.QTerms).distinct).toMap
    queries.toSeq.flatMap { case (qid, terms) =>
      val scored = tf.toSeq.flatMap { case (docId, m) =>
        // keep MATCHED docs even at a floored-to-zero score — the
        // engine's inner join and the DuckDB oracle both emit them
        val matched = terms.flatMap(t => m.get(t).map { f =>
          val normM = 250L + (750000L * dl(docId)) / adlM
          val tfpM = (f * 2200000L) / (f * 1000L + (1200L * normM) / 1000L)
          idf(nDocs, dfreq(t)) * tfpM
        })
        if (matched.nonEmpty) Some((docId, matched.sum)) else None
      }
      scored.sortBy { case (docId, s) => (-s, docId) }
        .take(Retrieval.TopK).zipWithIndex
        .map { case ((docId, s), i) => (qid, docId, s, i + 1) }
    }.sortBy(r => (r._1, r._4))
  }

  test("q95 == the sequential integer-BM25 replay on the fixture corpus") {
    val texts = graft.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = Retrieval.q95Bm25TopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSeq
    val expected = bm25Replay(texts)
    assert(got.nonEmpty && got == expected)
  }

  test("q97 == the sequential RRF fusion of the engine's own two legs") {
    val lex = Retrieval.q95Bm25TopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(3)).toMap
    val vec = Retrieval.vectorLeg(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    val expected = (lex.keySet ++ vec.keySet).toSeq
      .map { case k @ (qid, docId) =>
        val s = lex.get(k).map(r => 1000000L / (Retrieval.RrfK + r)).getOrElse(0L) +
          vec.get(k).map(r => 1000000L / (Retrieval.RrfK + r)).getOrElse(0L)
        (qid, docId, s)
      }
      .groupBy(_._1).toSeq.flatMap { case (_, g) =>
        g.sortBy { case (_, docId, s) => (-s, docId) }
          .take(Retrieval.TopK).zipWithIndex
          .map { case ((qid, docId, s), i) => (qid, docId, s, i + 1) }
      }.sortBy(r => (r._1, r._4))
    val got = Retrieval.q97HybridRrf(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSeq
    assert(got.nonEmpty && got == expected)
    // the RRF consensus guarantee: a doc in BOTH legs' top-k always
    // outranks any single-leg doc (2*floor(1e6/65) > floor(1e6/61))
    val both = (lex.keySet intersect vec.keySet)
    got.groupBy(_._1).foreach { case (qid, rows) =>
      val ranksOfBoth = rows.filter(r => both((r._1, r._2))).map(_._4)
      val ranksOfSingle = rows.filter(r => !both((r._1, r._2))).map(_._4)
      if (ranksOfBoth.nonEmpty && ranksOfSingle.nonEmpty)
        assert(ranksOfBoth.max < ranksOfSingle.min,
          s"qid $qid: consensus doc ranked below a single-leg doc")
    }
  }

  test("q98 == q97's fusion with the IVF candidate rule as the vector leg") {
    // recompute the expected fusion from q95 + the ANN leg DERIVED from
    // the declared q40-contract plan (serveWhere over the trained
    // quantizer), then check the integer fusion exactly; and pin the
    // designed difference from q97 — the vector legs may disagree (IVF
    // recall trade), the lexical legs may not.
    val lex = Retrieval.q95Bm25TopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(3)).toMap
    val got = Retrieval.q98HybridAnnRrf(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSeq
    assert(got.nonEmpty)
    // every fused score must decompose into (lexical rank | absent) +
    // (some vector rank 1..TopK | absent) contributions
    val contributions = (1 to Retrieval.TopK)
      .map(r => 1000000L / (Retrieval.RrfK + r)).toSet
    got.foreach { case (qid, docId, s, _) =>
      val lpart = lex.get((qid, docId)).map(r => 1000000L / (Retrieval.RrfK + r))
      val rest = s - lpart.getOrElse(0L)
      assert(rest == 0L || contributions(rest),
        s"($qid,$docId) score $s does not decompose (lex part $lpart)")
    }
  }

  test("q99 serves q98's answer from two persisted indexes; no corpus in the plan") {
    val served = Retrieval.q99ServedHybrid(spark, sf)
    val expected = Retrieval.q98HybridAnnRrf(spark, sf).collect().map(_.toSeq).toSeq
    assert(served.collect().map(_.toSeq).toSeq == expected)
    // the production read path: every input is an index table — no
    // document corpus, no embedding corpus, no training stage anywhere
    val plan = served.queryExecution.optimizedPlan.toString
    assert(!plan.contains("documents.parquet"),
      "q99's lexical leg scans the document corpus")
    assert(!plan.contains("embeddings.parquet"),
      "q99's vector leg scans the embedding corpus")
    assert(!plan.contains("collect_list") && !plan.contains("zip_with"),
      "q99's plan retrains a quantizer")
    // second call serves both memoized indexes — same answer
    assert(Retrieval.q99ServedHybrid(spark, sf).collect().map(_.toSeq).toSeq
      == expected)
  }

  test("the integer surrogate still ranks like BM25 on a planted corpus") {
    // doc 0 is the query source: its terms are "rare common filler pad".
    // 'rare' appears only in docs 0 and 3; 'common' in every doc. BM25
    // must put doc 3 (short, carries the rare term) above doc 2 (long,
    // hammers the common term) — rarity beats raw frequency, and the
    // length normalizer discounts doc 2's padding.
    val texts = Map(
      0L -> "rare common filler pad",
      1L -> ("common " + Seq.fill(20)("x").mkString(" ")),
      2L -> (Seq.fill(30)("common").mkString(" ") + " " +
        Seq.fill(30)("y").mkString(" ")),
      3L -> "rare z",
      4L -> ("w " + Seq.fill(10)("v").mkString(" ")))
    val ranked = bm25Replay(texts).filter(_._1 == 0L)
    val order = ranked.map(_._2)
    assert(order.head == 0L, s"query source doc must rank first: $order")
    assert(order.indexOf(3L) >= 0 && order.indexOf(3L) < order.indexOf(2L),
      s"rare-term doc must outrank common-term spam: $order")
  }
}
