package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{Sketches, Text, Vectors}

/** q112 — KMV distinct-count sketch over the corpus 3-gram space, the
  * constant-memory answer to "how many distinct n-grams / users / urls
  * does this 100 TB corpus have per group" when an exact count(DISTINCT)
  * is too expensive to ship (n-gram LM sizing, vocabulary growth curves,
  * dedup-rate forecasting all start from this number).
  *
  * Estimator (Bar-Yossef et al. 2002): hash every element uniformly into
  * [0, 2^48) (the engine-wide 48-bit md5), keep only the k smallest
  * DISTINCT hashes per group ([[graft.functions.KMinLongs]], the engine's
  * first custom AGGREGATE expression — k longs of state per group
  * everywhere in the plan), then ndv ≈ (k−1)·2^48 / h₍k₎. A group with
  * fewer than k distinct hashes holds its whole distinct set and the
  * estimate is exact.
  *
  * Declared rows at TWO grains so both regimes sit under the oracle at
  * every fixture scale: per (lang, source) the small groups stay under k
  * (exact regime) while per lang the 3-gram space is thousands-strong
  * (estimator regime). The per-lang rows additionally pin the sketch's
  * MERGE law in-plan: `kth_rolled` re-derives the per-lang k-th min by
  * folding the per-(lang, source) k-min ARRAYS (flatten → distinct → sort
  * → trim — the k smallest of a union are contained in the union of
  * per-part k-smallest), and the oracle emits the directly-computed value
  * for both columns — a buffer/merge/trim bug in the aggregate moves one
  * of them and breaks the hash.
  *
  * Columns (eval-row doctrine, like q106's recall): exact ndv over the
  * same hashes (collisions cancel), the k-th min witness, the integer
  * estimate, error in permille — all integer arithmetic, no libm.
  *
  * Scale shape: shingles explode inside the scan stage (native
  * `graft_shingles`, no corpus-wide intermediate), and the KMV half
  * shuffles k longs per (map partition, group) — CONSTANT in corpus size.
  * The exact-ndv columns (eval-only — a production user drops them and
  * keeps the sketch) are the usual two-level count-distinct. The two
  * grains are two aggregates over one derivation; the per-source k-min
  * arrays feeding the roll-up are |lang|·|source| rows of k longs.
  */
object Sketch {

  /** Sketch size: 256 keeps the expected KMV error ≈ 1/√(k−2) ≈ 6.3%
    * while the buffer stays 2 KB per group. */
  private[graft] val K = 256

  /** (K−1)·2^48 — the estimator's numerator, exact in int64. */
  private val Num: Long = (K - 1).toLong << 48

  /** Hashed 3-gram shingles: (lang, source, h ∈ [0, 2^48)). */
  private def hashedShingles(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .filter(col("text").isNotNull)
      .select(col("lang"), col("source"),
        explode(Text.shingles(graft.Tok.toksText, 3)).as("sh"))
      .select(col("lang"), col("source"), Vectors.md5Prefix48(col("sh")).as("h"))

  /** Per-language hashed-shingle relation of an in-memory docs frame —
    * the derivation [[hashedShingles]] runs per-corpus, reusable by a
    * stream micro-batch (which sketches ONLY its own documents). */
  private[graft] def langShingles(docs: DataFrame): DataFrame =
    docs.filter(col("text").isNotNull)
      .select(col("lang"), explode(Text.shingles(graft.Tok.toksText, 3)).as("sh"))
      .select(col("lang"), Vectors.md5Prefix48(col("sh")).as("h"))

  /** Per-language batch KMV state: one row per lang, k longs. This is the
    * APPEND unit of the streaming twin ([[graft.streaming.TelemetryStream]]):
    * because "k smallest distinct of a union" is associative and
    * order-free, per-batch k-min arrays ARE mergeable state. */
  private[graft] def langKmins(docs: DataFrame): DataFrame =
    langShingles(docs).groupBy(col("lang"))
      .agg(Sketches.kmin(col("h"), K).as("mins"))

  /** Merge-law roll-up of k-min ARRAYS (the q112 `kth_rolled` law): the k
    * smallest of a union are contained in the union of per-part
    * k-smallest — flatten, dedup, sort, trim. */
  private[graft] def mergedMins(mins: Column): Column =
    slice(sort_array(array_distinct(flatten(collect_list(mins)))), 1, K)

  /** Serve (kth_min, n_mins, kmv_est) from a `mins` array column — the
    * sketch-only read path (no exact companion: that's the production
    * shape; q112's eval row keeps ndv_exact for the oracle). */
  private[graft] def kmvServe(df: DataFrame): DataFrame =
    df.withColumn("kth_min", coalesce(get(col("mins"), lit(K - 1)), lit(0L)))
      .withColumn("n_mins", size(col("mins")))
      .withColumn("kmv_est",
        when(col("n_mins") < K, col("n_mins").cast("long"))
          .otherwise(expr(s"$Num DIV kth_min")))
      .drop("mins")

  /** est / err columns from (ndv_exact, kth_min, n_mins). */
  private def estimator(df: DataFrame): DataFrame =
    df.withColumn("kmv_est",
        when(col("n_mins") < K, col("n_mins").cast("long"))
          .otherwise(expr(s"$Num DIV kth_min")))
      .withColumn("err_permille",
        expr("abs(kmv_est - ndv_exact) * 1000 DIV ndv_exact"))

  def q112KmvVocab(s: SparkSession, d: String): DataFrame = {
    // One corpus scan, not three: the explode+md5 shingle derivation is
    // the dominant cost, so dedup it ONCE at the finest grain
    // (lang, source, h) and stage the result — perSrc aggregates it
    // directly and perLang re-aggregates the same staged rows (KMinLongs
    // keeps distinct hashes, so kmin over source-deduped rows equals kmin
    // over the raw stream; countDistinct likewise). The staged relation
    // is the per-source distinct shingle space — vocabulary-sized, far
    // smaller than the raw shingle stream it replaces.
    val hs = StagedCache.stage(d, "q112_hs", hashedShingles(s, d).distinct())
    val perSrc = hs.groupBy(col("lang"), col("source"))
      .agg(countDistinct(col("h")).as("ndv_exact"),
        Sketches.kmin(col("h"), K).as("mins"))
      .withColumn("kth_min", coalesce(get(col("mins"), lit(K - 1)), lit(0L)))
      .withColumn("n_mins", size(col("mins")))
    val srcRows = estimator(perSrc)
      .select(concat(col("lang"), lit("/"), col("source")).as("grp"),
        col("ndv_exact"), col("kth_min"), col("kth_min").as("kth_rolled"),
        col("kmv_est"), col("err_permille"))
    // per-lang: direct aggregate over the hashes + the merge-law roll-up
    // of the per-source k-min arrays (must agree with the direct k-th min)
    val rolled = perSrc.groupBy(col("lang"))
      .agg(flatten(collect_list(col("mins"))).as("all_mins"))
      .select(col("lang"), coalesce(
        get(sort_array(array_distinct(col("all_mins"))), lit(K - 1)),
        lit(0L)).as("kth_rolled"))
    val perLang = hs.groupBy(col("lang"))
      .agg(countDistinct(col("h")).as("ndv_exact"),
        Sketches.kmin(col("h"), K).as("mins"))
      .withColumn("kth_min", coalesce(get(col("mins"), lit(K - 1)), lit(0L)))
      .withColumn("n_mins", size(col("mins")))
      .join(rolled, "lang")
    val langRows = estimator(perLang)
      .select(col("lang").as("grp"), col("ndv_exact"), col("kth_min"),
        col("kth_rolled"), col("kmv_est"), col("err_permille"))
    langRows.unionByName(srcRows).orderBy(col("grp"))
  }

  // ------------------------------------------------------------------
  // q115 — the KMV TELEMETRY SERVE, driver-gated (r14 verdict #6): the
  // [[graft.streaming.TelemetryStream.vocabSnapshot]] merge-law serve was
  // spec-only; this row puts the stream ≡ q112 law under the DuckDB hash
  // gate per round, the q107/q108/q110 doctrine. As a one-time build it
  // drives the PRODUCTION TelemetryStream batch path over a bounded
  // corpus slice (doc_id < [[StreamState.GateDocCap]], same cap doctrine
  // as q107/q108 — the gated law is corpus-size-invariant, the build
  // constant-size at any sf; vacuous at the sf0.01 driver gate) split
  // into five deterministic micro-batches, then exercises BOTH
  // idempotence contracts invisible-iff-correct in the declared hash:
  //  - crash REPLAY: batch 0 re-driven under its own id — the committed()
  //    guard must skip it (a double-append duplicates no k-min content
  //    but would double HLL registers; the guard is the contract);
  //  - content RE-DELIVERY: slice 0 arrives again as a NEW batch id —
  //    appended rows change nothing because "k smallest distinct of a
  //    union" is content-idempotent algebra.
  // The declared row is the SERVE: per-language (kth_min, n_mins,
  // kmv_est) from the persisted per-batch k-min arrays — O(|langs|·k)
  // rows read, no document re-scanned. The oracle computes the same
  // values DIRECTLY over the bounded corpus, so the hash is green iff
  // the per-batch sketches, the merge law, and the replay guards all
  // compose to the one-shot answer under this (or ANY) arrival split.
  // Pricing follows the served-index doctrine: build once per (session,
  // corpus stamp); repeats serve the persisted state.
  // ------------------------------------------------------------------

  private val VocabSlices = 5
  private val vocabMemo = new BuildMemo(4, "graft-vocab-serve-")

  private def cappedLangDocs(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), col("source"), col("text"))
      .filter(col("doc_id") < StreamState.GateDocCap)

  private[graft] def ensureVocabBuilt(s: SparkSession, d: String): String = {
    val key = org.apache.spark.sql.graft.shims.sessionUUID(s) + ":" + d
    vocabMemo.get(key, BuildMemo.stampOf(d, "documents.parquet")) { root =>
      val ts = new graft.streaming.TelemetryStream(s,
        new graft.streaming.StateDir(s, s"$root/telemetry"))
      val docs = cappedLangDocs(s, d)
      def slice(i: Int) = docs.filter(col("doc_id") % VocabSlices === i)
      (0 until VocabSlices).foreach(i => ts.processBatch(slice(i), i.toLong))
      ts.processBatch(slice(0), 0L)               // crash replay: skipped
      // Content RE-DELIVERY (slice 0 arrives again as a NEW batch id)
      // pins KMV's content-idempotence — but it also re-appends slice 0
      // to the HLL telemetry table, whose n_docs/n_tokens are
      // delivery-counted SUMS, so a root that absorbed a re-delivery can
      // never serve `snapshot` without double-counting the slice (r15
      // advisor). The probe therefore runs on a state CLONE: the primary
      // root stays exactly-once-clean (EVERY serve from it is valid,
      // snapshot included — TelemetrySketchSpec pins its n_docs against
      // the one-shot corpus), while the declared row serves vocabSnapshot
      // from the probe root, keeping re-delivery inertness under the
      // driver's hash.
      copyStateTree(s"$root/telemetry", s"$root/$RedeliverProbe")
      new graft.streaming.TelemetryStream(s,
        new graft.streaming.StateDir(s, s"$root/$RedeliverProbe"))
        .processBatch(slice(0), VocabSlices.toLong) // re-delivery: inert
    }
  }

  private[operators] val RedeliverProbe = "telemetry_redeliver"

  /** Recursive copy of a StateDir tree (parquet version dirs + `latest`
    * pointer) — a state snapshot for the re-delivery probe. Safe here:
    * both roots live under one memo build, no concurrent writer. */
  private def copyStateTree(from: String, to: String): Unit = {
    import java.nio.file.{Files, Path, Paths, StandardCopyOption}
    val src = Paths.get(from)
    val walk = Files.walk(src)
    try walk.forEach { p: Path =>
      val dst = Paths.get(to).resolve(src.relativize(p))
      if (Files.isDirectory(p)) Files.createDirectories(dst)
      else Files.copy(p, dst, StandardCopyOption.REPLACE_EXISTING)
    } finally walk.close()
  }

  /** The served per-language vocabulary estimates the stream left behind
    * — [[graft.streaming.TelemetryStream.vocabSnapshot]] in the driver's
    * declared shape, read from the re-delivery probe root (see
    * [[ensureVocabBuilt]]: KMV columns are content-idempotent under the
    * re-delivered slice, which is exactly the law the hash pins). */
  def q115VocabServe(s: SparkSession, d: String): DataFrame = {
    val root = ensureVocabBuilt(s, d)
    val ts = new graft.streaming.TelemetryStream(s,
      new graft.streaming.StateDir(s, s"$root/$RedeliverProbe"))
    ts.vocabSnapshot
      .select(col("lang"), col("kth_min"), col("n_mins").cast("long").as("n_mins"),
        col("kmv_est"))
      .orderBy(col("lang"))
  }

  /** Oracle: the one-shot DIRECT computation of the same per-language
    * sketch values over the bounded corpus — valid precisely because the
    * KMV merge is exact algebra under any split (q112's `kth_rolled`
    * already pins the law batch-side; this row pins the STREAM's use of
    * it). */
  def q115Sql: String = {
    val kth = s"coalesce(max(CASE WHEN rn = $K THEN h END), 0)"
    val nm = s"least(max(ndv), $K)"
    s"""WITH toks AS (
       |  SELECT lang, ${graft.Tok.sqlText} AS t
       |  FROM documents
       |  WHERE text IS NOT NULL AND doc_id < ${StreamState.GateDocCap}
       |), sh AS (
       |  SELECT lang,
       |    unnest(list_transform(range(1, len(t) - 1),
       |      i -> concat_ws(' ', t[i], t[i+1], t[i+2]))) AS sh
       |  FROM toks WHERE len(t) >= 3
       |), hx AS (
       |  SELECT DISTINCT lang, ('0x' || substr(md5(sh), 1, 12))::BIGINT AS h
       |  FROM sh
       |), g AS (
       |  SELECT lang, h,
       |    row_number() OVER (PARTITION BY lang ORDER BY h) AS rn,
       |    count(*) OVER (PARTITION BY lang) AS ndv
       |  FROM hx
       |)
       |SELECT lang, $kth AS kth_min, $nm AS n_mins,
       |  CASE WHEN $nm < $K THEN $nm ELSE $Num // $kth END AS kmv_est
       |FROM g GROUP BY lang ORDER BY lang""".stripMargin
  }

  /** Oracle k-th-min/ndv block over per-grain-DISTINCT hashes `rel`
    * grouped by `keys` (the grain must dedup h at ITS OWN grain — a
    * shingle shared by two sources is one element of the lang space). */
  private def grainSql(rel: String, keys: String, grp: String): String =
    s"""  SELECT $grp AS grp, max(ndv) AS ndv_exact,
       |    coalesce(max(CASE WHEN rn = $K THEN h END), 0) AS kth_min,
       |    least(max(ndv), $K) AS n_mins
       |  FROM (
       |    SELECT $keys, h,
       |      row_number() OVER (PARTITION BY $keys ORDER BY h) AS rn,
       |      count(*) OVER (PARTITION BY $keys) AS ndv
       |    FROM $rel
       |  ) GROUP BY $keys""".stripMargin

  def q112Sql: String =
    s"""WITH toks AS (
       |  SELECT lang, source, ${graft.Tok.sqlText} AS t
       |  FROM documents WHERE text IS NOT NULL
       |), sh AS (
       |  SELECT lang, source,
       |    unnest(list_transform(range(1, len(t) - 1),
       |      i -> concat_ws(' ', t[i], t[i+1], t[i+2]))) AS sh
       |  FROM toks WHERE len(t) >= 3
       |), hx AS MATERIALIZED (
       |  SELECT lang, source, ('0x' || substr(md5(sh), 1, 12))::BIGINT AS h
       |  FROM sh
       |), hl AS (
       |  SELECT DISTINCT lang, h FROM hx
       |), hs AS (
       |  SELECT DISTINCT lang, source, h FROM hx
       |), g AS (
       |${grainSql("hl", "lang", "lang")}
       |  UNION ALL
       |${grainSql("hs", "lang, source", "lang || '/' || source")}
       |)
       |SELECT grp, ndv_exact, kth_min, kth_min AS kth_rolled,
       |  CASE WHEN n_mins < $K THEN n_mins
       |       ELSE $Num // kth_min END AS kmv_est,
       |  abs((CASE WHEN n_mins < $K THEN n_mins
       |            ELSE $Num // kth_min END) - ndv_exact) * 1000 // ndv_exact
       |    AS err_permille
       |FROM g ORDER BY grp""".stripMargin
}
