package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Deterministic sampling and dataset splitting — the two selection
  * operators every training-data pipeline runs before anything else:
  * "sample X‰ per stratum" and "assign every record to train/val/test,
  * stably". Both are pure per-row hash arithmetic (the shared 48-bit md5
  * prefix primitive, [[Dedup.hex12]]): no RNG, no state, no shuffle until
  * the terminal aggregate — at 100 TB they pipeline inside the scan's
  * codegen stage and the only exchange carries the per-stratum summary
  * rows. Determinism is the point: re-running the pipeline, on any
  * cluster, at any parallelism, selects the SAME rows (the salt string
  * namespaces each use so sampling and splitting are independent draws).
  */
object Sampling {

  /** Per-mille sampling rate by language — the stratification knob: keep
    * more of the rare strata, thin the dominant one. */
  private def rateCol = when(col("lang") === "en", lit(200)).otherwise(lit(500))

  // ---------------------------------------------------------------- q49

  /** Stratified deterministic sample: keep a doc iff the 48-bit hash of
    * its salted id falls under the stratum's per-mille rate; summarize
    * per stratum. The filter is a pure projection over the scan;
    * `sample_rate_pm` makes the contract visible in the output. */
  def q49StratifiedSample(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("h",
        Dedup.hex12(concat(lit("smp_"), col("doc_id").cast("string"))) % 1000)
      .filter(col("h") < rateCol)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_sampled"),
        min(col("doc_id")).as("min_id"),
        max(col("doc_id")).as("max_id"),
        sum(length(col("text")).cast("long")).as("sampled_chars"))
      .withColumn("sample_rate_pm", rateCol.cast("int"))
      .orderBy(col("lang"))

  def q49Sql: String =
    """WITH h AS (
      |  SELECT doc_id, lang, text,
      |    ('0x' || substr(md5('smp_' || doc_id), 1, 12))::BIGINT % 1000 AS h,
      |    CASE WHEN lang = 'en' THEN 200 ELSE 500 END AS rate
      |  FROM documents
      |)
      |SELECT lang, count(*) AS n_sampled,
      |  min(doc_id) AS min_id, max(doc_id) AS max_id,
      |  CAST(sum(len(text)) AS BIGINT) AS sampled_chars,
      |  CAST(CASE WHEN lang = 'en' THEN 200 ELSE 500 END AS INT) AS sample_rate_pm
      |FROM h WHERE h < rate
      |GROUP BY lang ORDER BY lang""".stripMargin

  // ---------------------------------------------------------------- q50

  /** Deterministic train/val/test split (80/10/10 by hash bucket): every
    * doc lands in exactly one split, stable across runs and clusters —
    * the property random splits lose the moment data is re-partitioned.
    * Output: per (lang, split) counts + char volume. */
  def q50HashSplit(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("b",
        Dedup.hex12(concat(lit("spl_"), col("doc_id").cast("string"))) % 100)
      .withColumn("split",
        when(col("b") < 80, "train").when(col("b") < 90, "val").otherwise("test"))
      .groupBy(col("lang"), col("split"))
      .agg(count(lit(1)).as("n_docs"),
        sum(length(col("text")).cast("long")).as("n_chars"))
      .orderBy(col("lang"), col("split"))

  def q50Sql: String =
    """WITH b AS (
      |  SELECT doc_id, lang, text,
      |    ('0x' || substr(md5('spl_' || doc_id), 1, 12))::BIGINT % 100 AS b
      |  FROM documents
      |)
      |SELECT lang,
      |  CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split,
      |  count(*) AS n_docs, CAST(sum(len(text)) AS BIGINT) AS n_chars
      |FROM b
      |GROUP BY 1, 2 ORDER BY lang, split""".stripMargin

  // ---------------------------------------------------------------- q84

  /** Leakage-proof train/val/test split — q50's hash split with the one
    * correction serious pipelines need: near-duplicate documents must
    * NEVER straddle a split boundary, or the val/test sets silently
    * contain paraphrases of training documents and every held-out metric
    * inflates. The fix: hash the doc's DEDUP-GROUP REPRESENTATIVE (its
    * q54 component minimum; its own id when unclustered) instead of the
    * doc id — whole near-dup clusters then move between splits as one
    * atomic unit, with q50's exact 80/10/10 bucket rule otherwise
    * unchanged.
    *
    * Labels come from [[Dedup.clusterLabels]] — the shared serve path
    * (ingest state when a `trackClusters` stream owns the corpus, else
    * the memoized q54 solve), so the split decision is consistent with
    * q56/q65/q67/q68 by construction.
    *
    * Scale shape: one corpus ⋈ labels left join keyed on doc_id (labels
    * are dup-proportional), a per-row hash, and one map-side-combinable
    * rollup; `n_groups` prices the distinct over (split, rep) — keyed
    * exchange, no window. */
  def q84LeakFreeSplit(s: SparkSession, d: String): DataFrame = {
    val labels = Dedup.clusterLabels(s, d)
      .select(col("v").as("doc_id"), col("lbl"))
    Tables.documents(s, d).select(col("doc_id"))
      .join(labels, Seq("doc_id"), "left")
      .withColumn("rep", coalesce(col("lbl"), col("doc_id")))
      .withColumn("b",
        Dedup.hex12(concat(lit("spl_"), col("rep").cast("string"))) % 100)
      .withColumn("split",
        when(col("b") < 80, "train").when(col("b") < 90, "val").otherwise("test"))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("rep")).as("n_groups"))
      .orderBy(col("split"))
  }

  def q84Sql: String =
    s"""${Dedup.lshCtes.replaceFirst("WITH ", "WITH RECURSIVE ")}${Dedup.ccCtes}, rep AS (
       |  SELECT d.doc_id, coalesce(c.lbl, d.doc_id) AS rep
       |  FROM documents d LEFT JOIN comp c ON c.v = d.doc_id
       |), sp AS (
       |  SELECT doc_id, rep,
       |    ('0x' || substr(md5('spl_' || rep), 1, 12))::BIGINT % 100 AS b
       |  FROM rep
       |)
       |SELECT CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split,
       |  count(*) AS n_docs, count(DISTINCT rep) AS n_groups
       |FROM sp GROUP BY 1 ORDER BY split""".stripMargin

  // ---------------------------------------------------------------- q60

  private[operators] val QuotaN = 60
  private val BucketShift = 36L // 48-bit hash → 4096 prefix buckets

  /** Language-BALANCED quota sampling: exactly [[QuotaN]] documents per
    * language (or every document of a smaller stratum), selected by hash
    * rank — the rebalancing step that keeps a dominant language from
    * swamping the mixture, deterministic like q49/q50.
    *
    * "Exactly K per group by hash order" is a per-group TOP-K — which the
    * naive plan writes as `row_number() OVER (PARTITION BY lang ORDER BY
    * hash)`: every language's ENTIRE corpus through one window task, the
    * q58 anti-pattern again. This operator computes the SAME exact
    * selection in three bounded steps:
    *
    *   1. histogram — per (lang, 12-bit hash prefix) counts: one
    *      map-side-combined groupBy, ≤ 4096 rows per language;
    *   2. candidate buckets — running count over the histogram (tiny
    *      window) keeps only prefix buckets whose cumulative start is
    *      below the quota: every possible selectee lives in one of them;
    *   3. bounded rank — global rank = bucket's cumulative start + local
    *      `row_number` inside the (lang, bucket) partition (≈ corpus/4096
    *      rows each), filter rank ≤ quota.
    *
    * Bit-identical to the single-window formulation (the prefix bucket
    * order IS the hash order), which is exactly what the DuckDB oracle
    * runs. */
  def q60QuotaSample(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .withColumn("hv", Dedup.hex12(concat(lit("bal_"), col("doc_id").cast("string"))))
      .withColumn("hb", shiftright(col("hv"), BucketShift.toInt))
    val hist = docs.groupBy(col("lang"), col("hb"))
      .agg(count(lit(1)).as("cnt"))
    val wB = Window.partitionBy(col("lang")).orderBy(col("hb"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val cand = hist
      .withColumn("cum_before", coalesce(sum(col("cnt")).over(wB), lit(0L)))
      .filter(col("cum_before") < QuotaN)
      .select(col("lang"), col("hb"), col("cum_before"))
    val wL = Window.partitionBy(col("lang"), col("hb"))
      .orderBy(col("hv"), col("doc_id"))
    docs.join(broadcast(cand), Seq("lang", "hb"))
      .withColumn("rn", (col("cum_before") + row_number().over(wL)).cast("int"))
      .filter(col("rn") <= QuotaN)
      .select(col("doc_id"), col("lang"), col("rn"))
      .orderBy(col("lang"), col("rn"))
  }

  def q60Sql: String =
    s"""WITH h AS (
       |  SELECT doc_id, lang,
       |    ('0x' || substr(md5('bal_' || doc_id), 1, 12))::BIGINT AS hv
       |  FROM documents
       |), r AS (
       |  SELECT doc_id, lang,
       |    CAST(row_number() OVER (PARTITION BY lang ORDER BY hv, doc_id) AS INT) AS rn
       |  FROM h
       |)
       |SELECT doc_id, lang, rn FROM r WHERE rn <= $QuotaN
       |ORDER BY lang, rn""".stripMargin

  // ---------------------------------------------------------------- q113

  private[operators] val WeightedN = 60

  /** WEIGHTED sampling without replacement, K per language: selection
    * priority = hash DIV weight (weight = n_chars), smallest-K win — the
    * integer-exact deterministic analogue of Efraimidis–Spirakis A-ES
    * keys (u^(1/w) order ≈ u/w order at these stakes): doubling a doc's
    * weight halves its priority, so long documents are proportionally
    * likelier to be drawn, which is how a token-budget-aware mixture
    * samples (q63 sets the budget; this operator implements the draw).
    * Deterministic like q49/q50/q60 — same rows on any cluster at any
    * parallelism; the `wgt_` salt keeps it an independent draw.
    *
    * "Exactly K per group by priority order" is the q60 problem again,
    * but solved here with the engine's OWN sketch aggregate instead of
    * the histogram cascade: phase 1 computes each language's K-th
    * smallest DISTINCT priority with [[graft.functions.KMinLongs]]
    * (k longs of state per group, one |langs|-row broadcast); phase 2
    * filters the corpus to `pri <= threshold` — at least K rows, at most
    * K plus priority-collision slack — and ranks ONLY those survivors in
    * a window whose partitions are ~K rows, corpus-independent. The
    * two-phase sketch-then-verify shape is the standard distributed
    * top-K; the naive single-window formulation is what the DuckDB twin
    * runs (bit-identical by the threshold law: every rank-≤K row has
    * pri ≤ the K-th distinct priority).
    *
    * A language with under K distinct priorities broadcasts a +∞
    * threshold (keep all, let the rank trim) — the sketch's under-k
    * regime, exercised at sf0.001. */
  def q113WeightedSample(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .withColumn("w", greatest(coalesce(col("n_chars"), lit(1L)), lit(1L)))
      .withColumn("hv",
        Dedup.hex12(concat(lit("wgt_"), col("doc_id").cast("string"))))
      .withColumn("pri", expr("hv DIV w"))
    val thr = docs.groupBy(col("lang"))
      .agg(graft.functions.Sketches.kmin(col("pri"), WeightedN).as("mins"))
      .select(col("lang"),
        coalesce(get(col("mins"), lit(WeightedN - 1)), lit(Long.MaxValue))
          .as("thr"))
    val wL = Window.partitionBy(col("lang")).orderBy(col("pri"), col("doc_id"))
    docs.join(broadcast(thr), Seq("lang"))
      .filter(col("pri") <= col("thr"))
      .withColumn("rn", row_number().over(wL).cast("int"))
      .filter(col("rn") <= WeightedN)
      .select(col("doc_id"), col("lang"), col("pri"), col("rn"))
      .orderBy(col("lang"), col("rn"))
  }

  def q113Sql: String =
    s"""WITH p AS (
       |  SELECT doc_id, lang,
       |    ('0x' || substr(md5('wgt_' || doc_id), 1, 12))::BIGINT
       |      // greatest(coalesce(n_chars, 1), 1) AS pri
       |  FROM documents
       |), r AS (
       |  SELECT doc_id, lang, pri,
       |    CAST(row_number() OVER (PARTITION BY lang ORDER BY pri, doc_id) AS INT) AS rn
       |  FROM p
       |)
       |SELECT doc_id, lang, pri, rn FROM r WHERE rn <= $WeightedN
       |ORDER BY lang, rn""".stripMargin
}
