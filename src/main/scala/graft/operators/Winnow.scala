package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Winnowing passage fingerprints (Schleimer, Wilkerson & Aiken, SIGMOD
  * 2003 — the MOSS algorithm): hash every K-token shingle, slide a
  * W-shingle window, keep the minimum hash per window, dedupe. Any shared
  * passage of at least W+K−1 tokens is GUARANTEED to contribute at least
  * one common fingerprint — so unlike whole-document MinHash/SimHash
  * (q20/q53), this finds documents that share a paragraph while
  * disagreeing everywhere else: quote-chains, boilerplate headers,
  * mirrored sections. Pairs sharing ≥ [[MinShared]] fingerprints are the
  * passage-overlap report.
  *
  * Fingerprints more common than [[FpCap]] docs are dropped BEFORE
  * pairing — this is declared semantics, not a silent cap (the oracle
  * applies the same filter): a fingerprint present in thousands of
  * documents is boilerplate whose all-pairs expansion is quadratic noise,
  * the same "too common shingle" rule CCNet and the C4 dedup apply.
  *
  * Scale shape: fingerprinting is a zero-shuffle per-row scan (array
  * lambdas in whole-stage codegen, ~2·n/W fingerprints per n-token doc);
  * the hot list is a map-side-combinable count whose survivors (df >
  * FpCap) are tiny by construction and broadcast into a left_anti; the
  * pair self-join shuffles once on fingerprint with every bucket ≤ FpCap
  * rows, so the worst bucket costs FpCap² pairs — bounded, observable,
  * and independent of corpus size. All hashing is the 48-bit md5 prefix
  * in exact int64 (the q29 portability doctrine).
  */
object Winnow {

  private[graft] val K = 4   // shingle tokens
  private[graft] val W = 8   // winnowing window (shingles)
  private[graft] val MinShared = 2
  private[graft] val FpCap = graft.Dials.WinnowFpCap

  /** (doc_id, fps array<long>) — the distinct winnowed fingerprint SET per
    * document, one row per doc (the signature shape the incremental
    * [[graft.streaming.DedupStream]] Winnow method stores). Documents
    * shorter than K tokens carry no row (runt rule); documents with fewer
    * than W shingles contribute their single global minimum (the window
    * clamps to the shingle list). */
  private[graft] def fingerprintArrays(docs: DataFrame): DataFrame =
    docs
      .withColumn("toks", graft.Tok.toksText)
      .filter(size(col("toks")) >= K)
      .withColumn("ghash",
        graft.functions.Text.hash48Map(
          graft.functions.Text.shingles(col("toks"), K)))
      .withColumn("fps",
        array_distinct(graft.functions.Text.windowMin(col("ghash"), W)))
      .select(col("doc_id"), col("fps"))

  /** (doc_id, fingerprint) — [[fingerprintArrays]] exploded. */
  private[graft] def fingerprints(docs: DataFrame): DataFrame =
    fingerprintArrays(docs)
      // explode_OUTER on purpose (fps is provably non-empty: ≥ K tokens →
      // ≥ 1 shingle → ≥ 1 window): plain explode makes
      // InferFiltersFromGenerate push a `size(fps) > 0` guard to the scan
      // with the WHOLE chain inlined — and inside that single filter
      // expression the lambda-captured ghash subtree re-evaluates per
      // window, turning the scan into O(shingles · windows) interpreted
      // md5 calls per row (measured 109 s vs 0.4 s at sf0.1).
      .select(col("doc_id"), explode_outer(col("fps")).as("fp"))

  /** Document pairs sharing ≥ MinShared winnowed fingerprints, with the
    * shared count — the passage-overlap report. */
  def q70WinnowPairs(s: SparkSession, d: String): DataFrame =
    stagedPairs(s, d).orderBy(col("doc_a"), col("doc_b"))

  /** The q70 pair table WITHOUT the presentation sort, staged in the
    * session-owned [[StagedCache]] (the q40/q27 pattern) rather than a
    * per-invocation localCheckpoint: CacheManager dedupes persists by
    * analyzed plan, so q89 — which consumes the SAME surviving pair set —
    * reuses the pairs q70 computed in this session instead of re-deriving
    * the whole fingerprint + self-join chain (measured at sf10: the
    * re-derivation was ~2/3 of q89's cost). The fps stage is persisted
    * too: it feeds three consumers inside one build (df counts + both
    * arms of the self-join), which is what the localCheckpoint was for —
    * the owned columnar cache gives the same compute-once with
    * compression and LRU eviction. */
  private[operators] def stagedPairs(s: SparkSession, d: String): DataFrame = {
    val fps = graft.operators.StagedCache.stage(d, "winnow_fps",
      fingerprints(
        Tables.documents(s, d).select(col("doc_id"), col("text"))))
    // boilerplate filter: fingerprints in > FpCap docs are dropped — the
    // surviving hot list is ≤ |fps|/FpCap rows, broadcasts by size.
    // The df-cap bounds the worst BUCKET at FpCap² pairs but total pair
    // volume is Σ df·(df−1)/2 over kept buckets — a cap-1 fingerprint
    // still yields ~130k pairs. The observe() forecasts that volume per
    // execution (q20's not-silent doctrine) so a production run sees the
    // expansion coming BEFORE the self-join pays it; the subtree feeding
    // `hot` runs once, so the node is never duplicated by the pair join.
    val dfs = fps.groupBy(col("fp"))
      .agg(count(lit(1)).as("df"))
      .observe("graft_winnow_buckets",
        coalesce(sum(when(col("df") <= FpCap,
          expr("df * (df - 1) DIV 2")).otherwise(0L)), lit(0L))
          .as("kept_pairs"),
        coalesce(max(when(col("df") <= FpCap, col("df"))), lit(0L))
          .as("max_kept_bucket"),
        count(when(col("df") > FpCap, lit(1))).as("dropped_fps"))
    val hot = dfs
      .filter(col("df") > FpCap)
      .select(col("fp"))
    val kept = fps.join(hot, Seq("fp"), "left_anti")
    graft.operators.StagedCache.stage(d, "winnow_pairs",
      kept.as("a").join(kept.as("b"),
          col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .agg(count(lit(1)).as("n_shared"))
        .filter(col("n_shared") >= MinShared))
  }

  /** q70's oracle CTE chain up to `kept` (doc_id, fp) — shared with q89,
    * which consumes the same surviving pair set. Callers append their own
    * final SELECT (and any further CTEs via a leading comma). */
  private[operators] def winnowCtes: String =
    s"""WITH g AS (
       |  SELECT doc_id, ${graft.Tok.sqlText} AS toks,
       |    len(${graft.Tok.sqlText}) AS nt
       |  FROM documents WHERE len(${graft.Tok.sqlText}) >= $K
       |), h AS (
       |  SELECT doc_id,
       |    list_transform(range(1, nt - ${K - 1} + 1),
       |      i -> ('0x' || substr(md5(array_to_string(
       |        list_slice(toks, i, i + ${K - 1}), ' ')), 1, 12))::BIGINT) AS ghash
       |  FROM g
       |), f AS (
       |  SELECT DISTINCT doc_id, fp FROM (
       |    SELECT doc_id,
       |      unnest(list_transform(range(1, greatest(len(ghash) - ${W - 1}, 1) + 1),
       |        j -> list_min(list_slice(ghash, j, j + ${W - 1})))) AS fp
       |    FROM h)
       |), hot AS (
       |  SELECT fp FROM f GROUP BY fp HAVING count(*) > $FpCap
       |), kept AS (
       |  SELECT f.* FROM f ANTI JOIN hot USING (fp)
       |)""".stripMargin

  def q70Sql: String =
    s"""$winnowCtes
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  CAST(count(*) AS BIGINT) AS n_shared
       |FROM kept a JOIN kept b ON a.fp = b.fp AND a.doc_id < b.doc_id
       |GROUP BY 1, 2 HAVING count(*) >= $MinShared
       |ORDER BY doc_a, doc_b""".stripMargin
}
