package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Corpus drift report — the distribution-shift check a pipeline runs
  * before admitting a new crawl/snapshot into the mix: which tokens'
  * frequencies moved most between the reference corpus and the candidate?
  * A top-drift list catches template storms, spam bursts, language mix
  * shifts, and scraper regressions long before a trained model does.
  * The fixture stand-in for the two snapshots is the deterministic
  * doc_id-parity split (old = even, new = odd — the q57 bounded-probe
  * convention's sibling); production swaps in the two real snapshots.
  *
  * Semantics (integer-exact): per-half token rates in parts-per-million
  * (`(1000000·cnt) DIV half_total`), full-outer-joined so tokens that
  * APPEAR or VANISH are scored (missing side = 0 — those are exactly the
  * template-storm signatures), a ≥ 5 combined-count floor to kill
  * hapax noise, and the top 50 by |Δppm| (ties by token) — every number
  * int64, the q71/q73 doctrine.
  *
  * Scale shape: tokens stream through ONE exploded scan into a
  * map-side-combinable (half, token) count; totals are a 2-row broadcast;
  * the full-outer join is vocab-sized and keyed on token; the top-50 is
  * ORDER BY + LIMIT — Spark plans TakeOrdered (per-partition heaps + one
  * 50-row merge), NOT a global window, so no vocab-sized single
  * partition exists anywhere.
  */
object Drift {

  private[operators] val TopK = 50
  private[operators] val MinCount = 5L
  private val Ppm = 1000000L

  /** The report tail over a (half, tok, cnt) token-count table: ppm
    * rates (totals derived from the counts themselves — vocab-sized
    * input, strictly cheaper than re-scanning the corpus), full-outer
    * join, hapax floor, top-K. Factored out so the incremental
    * [[graft.streaming.DriftStream]] serves the SAME report from
    * StateDir-merged count deltas (DriftStreamSpec pins stream ≡ batch —
    * exact counts are associative sums, so the composition is lossless). */
  private[graft] def reportFrom(cnt: DataFrame): DataFrame = {
    // Single-pass pivot (r12): one hash aggregate folds both halves into
    // one row per token — the previous form split the count table into
    // old/new branches and FULL-OUTER-joined them back (plus a totals
    // join), which leaned on ReuseExchange to dedupe three consumers of
    // the same exchange and still paid a vocab-sized join. Appearing /
    // vanishing tokens fall out of the conditional sums as zeros — the
    // exact na.fill(0) semantics of the join form.
    val flat = cnt.groupBy(col("tok")).agg(
      coalesce(sum(when(col("half") === 0, col("cnt"))), lit(0L)).as("cnt_old"),
      coalesce(sum(when(col("half") === 1, col("cnt"))), lit(0L)).as("cnt_new"))
    val tot = cnt.agg(
      coalesce(sum(when(col("half") === 0, col("cnt"))), lit(0L)).as("tot_old"),
      coalesce(sum(when(col("half") === 1, col("cnt"))), lit(0L)).as("tot_new"))
    flat.crossJoin(broadcast(tot))
      // An EMPTY half has tot=0 and every cnt=0; under ANSI mode (Spark 4
      // default) x DIV 0 THROWS — AppSmokeSpec's first drift tick hit it —
      // so the zero-half case short-circuits to the join form's filled 0
      // before the division is ever evaluated.
      .withColumn("old_ppm", when(col("tot_old") === 0, lit(0L))
        .otherwise(expr(s"($Ppm * cnt_old) DIV tot_old")))
      .withColumn("new_ppm", when(col("tot_new") === 0, lit(0L))
        .otherwise(expr(s"($Ppm * cnt_new) DIV tot_new")))
      .filter(col("cnt_old") + col("cnt_new") >= MinCount)
      .withColumn("delta_ppm", col("new_ppm") - col("old_ppm"))
      .orderBy(abs(col("delta_ppm")).desc, col("tok"))
      .limit(TopK)
      .select(col("tok"), col("cnt_old"), col("cnt_new"),
        col("old_ppm"), col("new_ppm"), col("delta_ppm"))
  }

  /** Top-[[TopK]] tokens by |rate shift| between the corpus halves. */
  def q85DriftReport(s: SparkSession, d: String): DataFrame =
    reportFrom(
      Tables.documents(s, d)
        .select((col("doc_id") % 2).as("half"),
          explode(graft.Tok.toksText).as("tok"))
        .groupBy(col("half"), col("tok"))
        .agg(count(lit(1)).as("cnt")))

  def q85Sql: String = driftSql("documents")

  // ------------------------------------------------------------------
  // q116 — the DRIFT-REPORT SERVE, driver-gated (r15 verdict #6): the
  // [[graft.streaming.DriftStream]] served report was spec-only
  // (DriftStreamSpec pins stream ≡ batch), but it GUARDS the retrain
  // trigger ([[graft.streaming.DriftStream.shouldRetrain]]), so a silent
  // divergence there has production consequences — put it under the
  // DuckDB hash gate per round, the q107/q108/q110/q115 doctrine. As a
  // one-time build it drives the PRODUCTION DriftStream batch path over
  // a bounded corpus slice (doc_id < [[StreamState.GateDocCap]], the
  // gated law is corpus-size-invariant) split into five deterministic
  // micro-batches, then exercises the crash-REPLAY leg in-build: batch 0
  // re-driven under its own id — here the batch-id guard is LOAD-BEARING
  // (exact token counts are delivery-counted sums; a double-append
  // would shift every ppm rate, unlike q115's content-idempotent KMV).
  // The split itself is the other leg: the oracle computes the report
  // one-shot, so the hash is green iff count-delta appends, the
  // sum-merge, and the replay guard compose to the one-shot answer
  // under this (or ANY) arrival split. Pricing follows the served-index
  // doctrine: build once per (session, corpus stamp); repeats serve the
  // persisted state.
  // ------------------------------------------------------------------

  private val DriftSlices = 5
  private val driftMemo = new BuildMemo(4, "graft-drift-serve-")

  private[graft] def ensureDriftBuilt(s: SparkSession, d: String): String = {
    val key = org.apache.spark.sql.graft.shims.sessionUUID(s) + ":" + d
    driftMemo.get(key, BuildMemo.stampOf(d, "documents.parquet")) { root =>
      val ds = new graft.streaming.DriftStream(s,
        new graft.streaming.StateDir(s, s"$root/drift"))
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("text"))
        .filter(col("doc_id") < StreamState.GateDocCap)
      def slice(i: Int) = docs.filter(col("doc_id") % DriftSlices === i)
      (0 until DriftSlices).foreach(i => ds.processBatch(slice(i), i.toLong))
      ds.processBatch(slice(0), 0L) // crash replay: the guard MUST skip it
    }
  }

  /** The served drift report the stream left behind —
    * [[graft.streaming.DriftStream.report]] (q85's law through StateDir
    * count deltas) in the driver's declared shape. */
  def q116DriftServe(s: SparkSession, d: String): DataFrame = {
    val root = ensureDriftBuilt(s, d)
    new graft.streaming.DriftStream(s,
      new graft.streaming.StateDir(s, s"$root/drift")).report
  }

  /** Oracle: the one-shot DIRECT q85 report over the bounded corpus —
    * valid precisely because exact counts are associative sums under any
    * batch split, and the replay guard keeps them delivery-exact. */
  def q116Sql: String =
    driftSql(s"(SELECT * FROM documents WHERE doc_id < ${StreamState.GateDocCap})")

  /** The q85 report law over an arbitrary docs relation — shared by the
    * full-corpus q85 and the bounded served twin q116. */
  private def driftSql(docsRel: String): String =
    s"""WITH toks AS (
       |  SELECT doc_id % 2 AS half, unnest(${graft.Tok.sqlText}) AS tok
       |  FROM $docsRel
       |), cnt AS (
       |  SELECT half, tok, count(*) AS cnt FROM toks GROUP BY half, tok
       |), tot AS (
       |  SELECT half, count(*) AS tot FROM toks GROUP BY half
       |), rates AS (
       |  SELECT tok, half, cnt, ($Ppm * cnt) // tot AS ppm
       |  FROM cnt JOIN tot USING (half)
       |), old AS (
       |  SELECT tok, cnt AS cnt_old, ppm AS old_ppm FROM rates WHERE half = 0
       |), neu AS (
       |  SELECT tok, cnt AS cnt_new, ppm AS new_ppm FROM rates WHERE half = 1
       |), joined AS (
       |  SELECT coalesce(o.tok, n.tok) AS tok,
       |    coalesce(cnt_old, 0) AS cnt_old, coalesce(cnt_new, 0) AS cnt_new,
       |    coalesce(old_ppm, 0) AS old_ppm, coalesce(new_ppm, 0) AS new_ppm
       |  FROM old o FULL JOIN neu n ON o.tok = n.tok
       |)
       |SELECT tok, cnt_old, cnt_new, old_ppm, new_ppm,
       |  new_ppm - old_ppm AS delta_ppm
       |FROM joined
       |WHERE cnt_old + cnt_new >= $MinCount
       |ORDER BY abs(new_ppm - old_ppm) DESC, tok LIMIT $TopK""".stripMargin
}
