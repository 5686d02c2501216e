package graft.operators

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.TestSession

/** Invariants for the round-6 retrieval/fingerprint/quantization trio:
  *
  *  - q69: an inverted index is only correct if df equals the posting list
  *    length, postings are strictly ascending, and the df band genuinely
  *    gates — a stopword must never get a posting list.
  *  - q70: the winnowing GUARANTEE (Schleimer et al. §2: any shared run of
  *    ≥ W+K−1 tokens contributes ≥ 1 common fingerprint) — checked on two
  *    documents sharing one passage and nothing else; plus the plan
  *    regression that motivated explode_outer (no inferred Filter may
  *    re-evaluate the md5 shingle chain — that inlining cost 109 s at
  *    sf0.1).
  *  - q71: the 8-bit affine error bound — |m − recon| can never exceed
  *    range/255 rounded up twice (one floor in the code, one in the
  *    reconstruction), so max_err_milli ≤ max_dim(rng) DIV 255 · 2 + 2.
  */
class IndexWinnowQuantSpec extends AnyFunSuite {
  import TestSession.spark
  import spark.implicits._

  private def writeDocs(rows: Seq[(Long, String)]): String = {
    val dir = Files.createTempDirectory("iwq-").toString
    rows.toDF("doc_id", "text").withColumn("lang", lit("en"))
      .withColumn("source", lit("s")).withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q69: df = |postings|, ascending, band gates both tails") {
    // term "mid" in 10 docs (inside the 5..60 band), "rare" in 2 (below),
    // "the" in all 70 (above)
    val docs = (0L until 70L).map { i =>
      val mid = if (i < 10) " mid" else ""
      val rare = if (i >= 20 && i < 22) " rare" else ""
      (i, s"the w$i body$mid$rare filler${i % 7}")
    }
    // postings export as a canonical comma-joined string (the q45/q69
    // doctrine: no non-atomic top-level columns in declared outputs)
    val out = Index.q69InvertedIndex(spark, writeDocs(docs))
      .collect()
      .map(r => (r.getString(0), r.getLong(1),
        r.getString(2).split(",").map(_.toLong).toSeq)).toSeq
    val byTerm = out.map(t => t._1 -> t).toMap
    assert(byTerm.contains("mid") && !byTerm.contains("rare") && !byTerm.contains("the"))
    assert(byTerm("mid")._2 == 10L && byTerm("mid")._3 == (0L until 10L))
    out.foreach { case (term, df, postings) =>
      assert(df == postings.size, s"$term df != |postings|")
      assert(postings == postings.sorted && postings.distinct == postings,
        s"$term postings not strictly ascending")
      assert(df >= Index.DfLo && df <= Index.DfHi, s"$term df $df out of band")
    }
  }

  test("q70: shared passage of W+K-1 tokens guarantees a shared fingerprint") {
    val passage = (0 until Winnow.W + Winnow.K - 1).map(i => s"p$i").mkString(" ")
    val a = s"alpha beta gamma delta $passage zz0 zz1 zz2 zz3"
    val b = s"uno dos tres cuatro cinco seis $passage yy0 yy1"
    val c = "completely unrelated text with enough tokens to fingerprint fine"
    val d = writeDocs(Seq((1L, a), (2L, b), (3L, c)))
    val fps = Winnow.fingerprints(
        graft.Tables.documents(spark, d).select(col("doc_id"), col("text")))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byDoc = fps.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    assert((byDoc(1L) & byDoc(2L)).nonEmpty, "winnowing guarantee violated")
    assert((byDoc(1L) & byDoc(3L)).isEmpty && (byDoc(2L) & byDoc(3L)).isEmpty)
  }

  test("q70: boilerplate fingerprints (df > FpCap) are dropped before pairing") {
    // the same header passage in FpCap+88 docs (each otherwise unique) —
    // its fingerprints are boilerplate and must produce NO pairs; two docs
    // sharing a rarer passage must still pair
    val header = (0 until Winnow.W + Winnow.K - 1).map(i => s"hdr$i").mkString(" ")
    // long enough that winnowing keeps ≥ MinShared distinct mins from it
    // (one W+K−1 run guarantees only ONE full window → one shared fp)
    val rare = (0 until 4 * (Winnow.W + Winnow.K - 1)).map(i => s"rare$i").mkString(" ")
    val docs = (0L until (Winnow.FpCap + 88).toLong).map { i =>
      val tail = if (i < 2) s" $rare" else ""
      (i, s"$header u${i}a u${i}b u${i}c$tail")
    }
    val pairs = Winnow.q70WinnowPairs(spark, writeDocs(docs))
    val out = pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((0L, 1L)),
      s"only the rare-passage pair should survive the boilerplate drop: $out")
    // the drop is not silent: the observe forecasts the pair volume the
    // kept buckets will expand to, and counts the boilerplate casualties
    val m = pairs.queryExecution.observedMetrics("graft_winnow_buckets")
    assert(m.getAs[Long]("dropped_fps") >= 1L, "boilerplate drop went unobserved")
    assert(m.getAs[Long]("max_kept_bucket") == 2L) // the rare passage's df
    assert(m.getAs[Long]("kept_pairs") >= 1L)
  }

  test("q70: no inferred filter re-evaluates the shingle hash chain") {
    import org.apache.spark.sql.catalyst.plans.logical.{Filter => LFilter}
    val plan = Winnow.q70WinnowPairs(spark, TestSession.sf)
      .queryExecution.optimizedPlan
    val offenders = plan.collect {
      case f: LFilter if f.condition.toString.contains("md5") => f
    }
    assert(offenders.isEmpty,
      s"md5 chain inlined into a Filter (InferFiltersFromGenerate regression):\n$offenders")
  }

  test("q71: per-label error envelope respects the 8-bit affine bound") {
    val rep = Quantize.q71QuantError(spark, TestSession.sf).collect()
    assert(rep.nonEmpty)
    // worst-case per-dim range at milli scale, from the fixture itself
    val maxRng = graft.Tables.embeddings(spark, TestSession.sf)
      .select(posexplode(col("embedding")).as(Seq("idx", "v")))
      .withColumn("m", expr("CAST(round(CAST(v AS DOUBLE) * 1000, 0) AS BIGINT)"))
      .groupBy("idx").agg((max("m") - min("m")).as("rng"))
      .agg(max("rng")).first().getLong(0)
    val bound = 2 * (maxRng / 255) + 2
    rep.foreach { r =>
      val (n, sum, mx) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(mx <= bound, s"max_err ${mx} exceeds affine bound $bound")
      assert(sum <= n * bound && sum >= 0 && mx >= 0)
    }
  }
}
