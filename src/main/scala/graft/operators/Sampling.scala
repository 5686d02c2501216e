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
    // pinned (lazy localCheckpoint): the bucket histogram and the rank
    // join below each consume this projection — un-pinned, the corpus
    // scan + md5 hash ran once per consumer (guide §1.2). Narrow
    // fixed-width rows (ids + two longs + lang).
    val docs = Tables.documents(s, d)
      .withColumn("hv", Dedup.hex12(concat(lit("bal_"), col("doc_id").cast("string"))))
      .withColumn("hb", shiftright(col("hv"), BucketShift.toInt))
      .select(col("doc_id"), col("lang"), col("hv"), col("hb"))
      .localCheckpoint(eager = false)
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
    // lang IS NOT NULL: symmetric with the twin's WHERE — without it the
    // engine's inner threshold join would drop NULL-lang docs while the
    // twin's window kept a NULL partition (latent divergence; fixtures are
    // non-null today but the operator shouldn't depend on that)
    val docs = Tables.documents(s, d)
      .filter(col("lang").isNotNull)
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
       |  FROM documents WHERE lang IS NOT NULL
       |), r AS (
       |  SELECT doc_id, lang, pri,
       |    CAST(row_number() OVER (PARTITION BY lang ORDER BY pri, doc_id) AS INT) AS rn
       |  FROM p
       |)
       |SELECT doc_id, lang, pri, rn FROM r WHERE rn <= $WeightedN
       |ORDER BY lang, rn""".stripMargin

  // ---------------------------------------------------------------- q114

  /** [[graft.functions.KMinLongs]]'s hard buffer cap — above this
    * per-language K the sketch cannot hold the K-th smallest priority and
    * [[q114BudgetSample]] switches to the q60 histogram cascade (same
    * exact selection, bounded state at ANY K). */
  private[operators] val KminCap = 65536

  /** q114's token-budget divisor: the draw targets c_total/16 tokens
    * (a 6.25% curation sample — production passes a real token target;
    * the apportionment rule is budget-invariant). */
  private[operators] val BudgetDiv = 16

  /** BUDGET-AWARE weighted sampling — the q63 ⇄ q113 composition: q63's
    * Hamilton apportionment turns a global token budget into per-language
    * token allocations, and this operator converts each allocation into a
    * document draw count `K_lang = alloc_tokens DIV avg_doc_tokens`
    * (floor 1) and runs the q113 A-ES draw with THAT K instead of a
    * fixture constant. Deterministic end-to-end: the allocation is
    * integer apportionment, the draw is the salted-hash priority order.
    *
    * Declared row: one summary row per language carrying the budget law
    * (`alloc_tokens`, `avg_doc_tokens`, `k_lang`) and the draw's witness
    * (`n_drawn`, `drawn_chars`, an order-insensitive `id_checksum` of the
    * drawn doc ids, folded mod 1000003 like q111's corpus checksum) — a
    * single mis-drawn document moves the checksum, and the output stays
    * |langs| rows at any corpus size.
    *
    * Mechanism (two regimes, identical output):
    *   - K ≤ [[KminCap]] (the common path): per-language K-th-smallest
    *     distinct priority from ONE `graft_kmin(pri, kmax)` aggregate —
    *     kmax longs of state per language — broadcast as a |langs|-row
    *     threshold table; phase 2 ranks only the `pri <= thr` survivors
    *     (≈ K rows per language + collision slack, corpus-independent
    *     given the budget).
    *   - K > [[KminCap]] (a budget so large the sketch cannot hold the
    *     K-th min): the q60 histogram cascade generalized to per-language
    *     quotas — 4096-bucket priority histogram, cumulative counts pick
    *     the candidate buckets, global rank = bucket prefix + bounded
    *     local row_number. Bounded state at any K; bucket occupancy
    *     follows the weight distribution (heavy-doc corpora bunch in low
    *     buckets), which is the documented skew caveat.
    * The spec pins both paths bit-identical by forcing the cascade on the
    * fixture corpus ([[q114Draw]]'s `kminCap` knob).
    */
  def q114BudgetSample(s: SparkSession, d: String): DataFrame =
    q114Draw(s, d, KminCap)

  private[operators] def q114Draw(
      s: SparkSession, d: String, kminCap: Int): DataFrame = {
    val perLang = Mixing.apportion(
        Mixing.tokenGroups(s, d), BudgetDiv)
      .groupBy(col("lang"))
      .agg(sum(col("alloc")).as("alloc_tokens"),
        sum(col("n_tokens")).as("tok_lang"),
        sum(col("n_docs")).as("docs_lang"))
      .withColumn("avg_doc_tokens",
        greatest(expr("tok_lang DIV docs_lang"), lit(1L)))
      .withColumn("k_lang",
        greatest(expr("alloc_tokens DIV avg_doc_tokens"), lit(1L)))
      .filter(col("lang").isNotNull)
      .select(col("lang"), col("alloc_tokens"), col("avg_doc_tokens"),
        col("k_lang"))
    val docs = Tables.documents(s, d)
      .filter(col("lang").isNotNull)
      .withColumn("w", greatest(coalesce(col("n_chars"), lit(1L)), lit(1L)))
      .withColumn("hv",
        Dedup.hex12(concat(lit("wgt_"), col("doc_id").cast("string"))))
      .withColumn("pri", expr("hv DIV w"))
      // pinned (lazy localCheckpoint): the k-min threshold aggregate and
      // the draw join below each consume this projection — un-pinned, the
      // corpus scan + md5 priority hash ran once per consumer (guide
      // §1.2). Narrow fixed-width rows (ids + three longs + lang).
      .select(col("doc_id"), col("lang"), col("w"), col("hv"), col("pri"))
      .localCheckpoint(eager = false)
    // bounded driver probe: one long over |langs| rows (the apportionment
    // input is the staged mix_token_groups build, so the corpus agg is not
    // re-run by the plan)
    val kmax = {
      val r = perLang.agg(max(col("k_lang"))).first()
      if (r.isNullAt(0)) 1L else r.getLong(0)
    }
    val drawn =
      if (kmax <= kminCap) {
        val thr = docs.groupBy(col("lang"))
          .agg(graft.functions.Sketches.kmin(col("pri"), kmax.toInt).as("mins"))
          .join(perLang, Seq("lang"))
          .select(col("lang"), col("alloc_tokens"), col("avg_doc_tokens"),
            col("k_lang"),
            // under-K language: +inf threshold keeps all, the rank trims
            coalesce(expr("try_element_at(mins, cast(k_lang AS int))"),
              lit(Long.MaxValue)).as("thr"))
        val wL = Window.partitionBy(col("lang"))
          .orderBy(col("pri"), col("doc_id"))
        docs.join(broadcast(thr), Seq("lang"))
          .filter(col("pri") <= col("thr"))
          .withColumn("rn", row_number().over(wL))
          .filter(col("rn") <= col("k_lang"))
      } else {
        val dB = docs.withColumn("hb", shiftright(col("pri"), 36))
        val wB = Window.partitionBy(col("lang")).orderBy(col("hb"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val cand = dB.groupBy(col("lang"), col("hb"))
          .agg(count(lit(1)).as("cnt"))
          .withColumn("cum_before", coalesce(sum(col("cnt")).over(wB), lit(0L)))
          .join(perLang.select(col("lang"), col("k_lang")), Seq("lang"))
          .filter(col("cum_before") < col("k_lang"))
          .select(col("lang"), col("hb"), col("cum_before"))
        val wL = Window.partitionBy(col("lang"), col("hb"))
          .orderBy(col("pri"), col("doc_id"))
        dB.join(broadcast(cand), Seq("lang", "hb"))
          .join(broadcast(perLang), Seq("lang"))
          .withColumn("rn", col("cum_before") + row_number().over(wL))
          .filter(col("rn") <= col("k_lang"))
      }
    drawn
      .groupBy(col("lang"), col("alloc_tokens"), col("avg_doc_tokens"),
        col("k_lang"))
      .agg(count(lit(1)).as("n_drawn"),
        sum(col("w")).as("drawn_chars"),
        sum(Dedup.hex12(concat(lit("q114_"), col("doc_id").cast("string")))
          % 1000003L).as("id_checksum"))
      .orderBy(col("lang"))
  }

  def q114Sql: String =
    s"""WITH g AS (
       |  SELECT lang, source,
       |    CAST(sum(len(${graft.Tok.sqlText})) AS BIGINT) AS n_tokens,
       |    CAST(count(*) AS BIGINT) AS n_docs
       |  FROM documents GROUP BY lang, source
       |), tot AS (
       |  SELECT CAST(sum(n_tokens) AS BIGINT) AS c_total FROM g
       |), p AS (
       |  SELECT lang, source, n_tokens, n_docs,
       |    c_total // $BudgetDiv AS budget,
       |    (n_tokens * (c_total // $BudgetDiv)) // c_total AS floor_alloc,
       |    (n_tokens * (c_total // $BudgetDiv)) % c_total AS rem
       |  FROM g, tot
       |), r AS (
       |  SELECT *, CAST(row_number() OVER (ORDER BY rem DESC, lang, source) AS INT) AS rn,
       |    CAST(sum(floor_alloc) OVER () AS BIGINT) AS f_total
       |  FROM p
       |), a AS (
       |  SELECT lang,
       |    CAST(sum(floor_alloc +
       |      CASE WHEN rn <= budget - f_total THEN 1 ELSE 0 END) AS BIGINT)
       |      AS alloc_tokens,
       |    CAST(sum(n_tokens) AS BIGINT) AS tok_lang,
       |    CAST(sum(n_docs) AS BIGINT) AS docs_lang
       |  FROM r GROUP BY lang
       |), k AS (
       |  SELECT lang, alloc_tokens,
       |    greatest(tok_lang // docs_lang, 1) AS avg_doc_tokens,
       |    greatest(alloc_tokens // greatest(tok_lang // docs_lang, 1), 1)
       |      AS k_lang
       |  FROM a WHERE lang IS NOT NULL
       |), dd AS (
       |  SELECT doc_id, lang,
       |    greatest(coalesce(n_chars, 1), 1) AS w,
       |    ('0x' || substr(md5('wgt_' || doc_id), 1, 12))::BIGINT
       |      // greatest(coalesce(n_chars, 1), 1) AS pri
       |  FROM documents WHERE lang IS NOT NULL
       |), rk AS (
       |  SELECT dd.doc_id, dd.lang, dd.w,
       |    k.alloc_tokens, k.avg_doc_tokens, k.k_lang,
       |    row_number() OVER (PARTITION BY dd.lang ORDER BY pri, doc_id) AS rn
       |  FROM dd JOIN k USING (lang)
       |)
       |SELECT lang, alloc_tokens, avg_doc_tokens, k_lang,
       |  CAST(count(*) AS BIGINT) AS n_drawn,
       |  CAST(sum(w) AS BIGINT) AS drawn_chars,
       |  CAST(sum(('0x' || substr(md5('q114_' || doc_id), 1, 12))::BIGINT
       |    % 1000003) AS BIGINT) AS id_checksum
       |FROM rk WHERE rn <= k_lang
       |GROUP BY lang, alloc_tokens, avg_doc_tokens, k_lang
       |ORDER BY lang""".stripMargin
}
