package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** BM25 top-k retrieval (q95 inline, q96 served) — the ranked-retrieval
  * leg of the text family (q22 raw TF → q55 TF-IDF term importance →
  * q95 query-time document ranking), and the lexical complement of the
  * ANN legs (q40/q86 float, q92/q93 PQ): a training-data pipeline hunts
  * "which documents match this probe" by embedding OR by keyword, and
  * this is the keyword half. Reference scope: the reference ships no
  * retrieval (nearest analog is the substring matcher,
  * `StreamingApp.scala:415`); north-star surface like the ANN family.
  *
  * Scoring is Robertson BM25 (k1 = 1.2, b = 0.75) re-expressed in EXACT
  * INTEGER MILLIUNITS — the q66/q71 doctrine — because the standard
  * smooth IDF's `ln` is not correctly rounded and differs across libm
  * implementations (the q55 lesson), and per-(query, doc) float term
  * sums would additionally hash-diverge on aggregation order:
  *  - idf       = 1 + ⌊log₂(N DIV df)⌋ (q55's bin-length form);
  *  - adl_m     = (Σdl · 1000) DIV N             (avg doc len, milli);
  *  - norm_m    = 250 + (750000·dl) DIV adl_m    ((1−b) + b·dl/adl);
  *  - tfp_m     = (tf·2200000) DIV (tf·1000 + (1200·norm_m) DIV 1000)
  *                (tf·(k1+1) / (tf + k1·norm), milli);
  *  - score     = Σ_terms idf·tfp_m — an INTEGER sum, order-free.
  * Every DIV is floor division of non-negatives, so both engines
  * compute bit-identical BIGINTs end to end — and the same exactness is
  * what makes the SERVED index's delta-folded statistics (sums of
  * per-batch integer deltas) bit-identical to the inline aggregates.
  *
  * Queries are derived from the corpus so the surface needs no second
  * fixture: query `qid` (0..9) is the deduplicated first four tokens of
  * document 17·qid — both engines re-derive them with the same slice.
  *
  * Scale shape: tf is the one corpus-scale build (explode → partial
  * count, map-side combine) and is staged once, feeding dl (per-doc
  * lengths), df (term frequencies) and the scoring join; the ≤40-row
  * (qid, term, idf) table folds df + corpus stats BEFORE broadcasting,
  * so the corpus-side scan joins against a broadcast literal and only
  * rows containing a query term survive into the doc-keyed dl join and
  * the per-qid top-k window (10 bounded partitions). Nothing
  * corpus-scale ever broadcasts; the one shuffle set is tf's own
  * groupBy reused by every consumer. */
object Retrieval {

  /** Query fan: queries 0..9 from every 17th document's first 4 tokens. */
  val NQueries = 10
  val QStride = 17
  val QTerms = 4
  val TopK = 5

  /** The one corpus-scale build: per-(doc, term) counts. */
  private[operators] def tfOf(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), explode(graft.Tok.toksText).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))

  private[operators] def dlOf(tf: DataFrame): DataFrame =
    tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))

  /** Per-term document frequency — as a DELTA-shaped table (one new doc
    * containing the term adds 1), which is why the served index can
    * append per-batch df rows and fold them with the same sum. */
  private[operators] def dfOf(tf: DataFrame): DataFrame =
    tf.groupBy(col("term")).agg(count(lit(1)).as("df"))

  private[operators] def statsOf(dl: DataFrame): DataFrame =
    dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("total_dl"))

  private[operators] def queriesOf(docs: DataFrame): DataFrame =
    docs
      .filter(col("doc_id") % QStride === 0 &&
        expr(s"doc_id DIV $QStride") < NQueries)
      .select(expr(s"doc_id DIV $QStride").as("qid"),
        explode(slice(graft.Tok.toksText, 1, QTerms)).as("term"))
      .distinct()

  /** The q95 scoring plan over EXISTING tf/dl/df/stats/query tables —
    * shared by the inline q95 (which derives all five from the corpus)
    * and the persisted [[LexIndex]] (which reads them from a StateDir,
    * folding the delta-shaped df/stats with the same integer sums) so
    * both are bit-identical. df + corpus stats fold into the tiny
    * query-term table BEFORE the broadcast: the corpus side then needs
    * no df join at all. */
  private[operators] def serve(tf: DataFrame, dl: DataFrame, df: DataFrame,
      stats: DataFrame, queries: DataFrame,
      qidFrom: Long, nQids: Long, depth: Int = TopK): DataFrame = {
    val qsel = queries.filter(col("qid") >= qidFrom &&
      col("qid") < qidFrom + nQids)
    val qt = df.join(broadcast(qsel), Seq("term"))
      .crossJoin(broadcast(stats))
      .withColumn("idf", lit(1) + (length(bin(expr("n_docs DIV df"))) - 1))
      .select(col("qid"), col("term"), col("idf"),
        expr("total_dl * 1000 DIV n_docs").as("adl_m"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("score_milli").desc, col("doc_id"))
    tf.join(broadcast(qt), Seq("term"))
      .join(dl, Seq("doc_id"))
      .withColumn("norm_m", expr("250 + (750000 * dl) DIV adl_m"))
      .withColumn("tfp_m",
        expr("(tf * 2200000) DIV (tf * 1000 + (1200 * norm_m) DIV 1000)"))
      .groupBy(col("qid"), col("doc_id"))
      .agg(sum(col("idf") * col("tfp_m")).as("score_milli"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= depth)
      .select(col("qid"), col("doc_id"), col("score_milli"), col("rn"))
      .orderBy(col("qid"), col("rn"))
  }

  /** The corpus-scale (doc_id, term, tf) table, staged in the
    * session-owned [[StagedCache]] (the q70/q89 pattern): CacheManager
    * dedupes persists by analyzed plan, so the whole retrieval family
    * (q95/q97/q98/q103/q105) prices ONE tf build per session+corpus —
    * it feeds multiple consumers inside each query anyway (df, dl, and
    * the scoring join), which is what the per-invocation
    * localCheckpoint was for, minus the cross-query reuse. */
  private[operators] def stagedTf(s: SparkSession, d: String): DataFrame =
    StagedCache.stage(d, "bm25_tf", tfOf(Tables.documents(s, d)))

  /** The ≤ NQueries·len query-term table, staged for the same reason
    * (tiny, but its derivation scans the corpus). */
  private def stagedQueries(s: SparkSession, d: String): DataFrame =
    StagedCache.stage(d, "bm25_queries",
      queriesOf(Tables.documents(s, d)))

  def q95Bm25TopK(s: SparkSession, d: String): DataFrame = {
    val tf = stagedTf(s, d)
    val dl = dlOf(tf)
    // the ranked result itself is staged: q97/q98/q105 consume q95's
    // exact lexical leg, and the result is NQueries·TopK rows — the
    // cheapest possible thing to keep hot.
    StagedCache.stage(d, "q95_ranked",
      serve(tf, dl, dfOf(tf), statsOf(dl), stagedQueries(s, d),
        0L, NQueries))
  }

  // ---------------------------------------------------------------- q96

  /** Per-(session, corpus) persisted-index memo backing [[q96ServedBm25]]
    * — the same [[ServedMemo]] machinery as q86's/q93's, over
    * [[LexIndex]]. */
  private val lexMemo = new ServedMemo[LexIndex](
    maxEntries = 8,
    mk = (s, state) => new LexIndex(s, state),
    built = _.isBuilt,
    build = _.build(_))

  /** Served BM25 — q95's exact contract (same queries, same scores, same
    * top-k, same oracle) answered from a PERSISTED [[LexIndex]]: the
    * posting statistics build once per session+corpus as setup; the
    * declared plan is the SERVE path only — five state-table scans,
    * delta folds, query broadcast, scoring join. q96 is to q95 what
    * q86 is to q40 and q93 to q92: the retrieval index's production
    * read path priced in the open. [[LexIndexSpec]] pins serve ≡
    * inline-q95 bit-identically and that the serving plan reads no
    * document corpus. */
  def q96ServedBm25(s: SparkSession, d: String): DataFrame =
    lexMemo.get(s, d, "documents.parquet").query(0L, NQueries)

  /** Same answer, same oracle: the index serves q95's results verbatim. */
  def q96Sql: String = q95Sql

  def q95Sql: String =
    s"""WITH $bm25Ctes
       |SELECT qid, doc_id, score_milli, rn FROM ranked WHERE rn <= $TopK
       |ORDER BY qid, rn""".stripMargin

  /** The q95 CTE chain up to `ranked` — shared verbatim by the q97
    * hybrid oracle so the lexical leg cannot drift from q95's. */
  private def bm25Ctes: String =
    s"""tf AS (
       |  SELECT doc_id, term, count(*) AS tf
       |  FROM (SELECT doc_id, unnest(${graft.Tok.sqlText}) AS term
       |        FROM documents) t
       |  GROUP BY doc_id, term
       |), dl AS (
       |  SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY doc_id
       |), dfreq AS (
       |  SELECT term, count(*) AS df FROM tf GROUP BY term
       |), stats AS (
       |  SELECT count(*) AS n_docs, sum(dl) AS total_dl FROM dl
       |), queries AS (
       |  SELECT DISTINCT doc_id // $QStride AS qid,
       |    unnest((${graft.Tok.sqlText})[1:$QTerms]) AS term
       |  FROM documents
       |  WHERE doc_id % $QStride = 0 AND doc_id // $QStride < $NQueries
       |), qt AS (
       |  SELECT q.qid, q.term,
       |    1 + (length(bin(n_docs // df)) - 1) AS idf,
       |    total_dl * 1000 // n_docs AS adl_m
       |  FROM dfreq d JOIN queries q USING (term), stats
       |), scored AS (
       |  SELECT qid, t.doc_id,
       |    CAST(sum(idf * ((t.tf * 2200000) //
       |      (t.tf * 1000 +
       |        (1200 * (250 + (750000 * l.dl) // adl_m)) // 1000))) AS BIGINT)
       |      AS score_milli
       |  FROM tf t JOIN qt USING (term) JOIN dl l ON t.doc_id = l.doc_id
       |  GROUP BY qid, t.doc_id
       |), ranked AS (
       |  SELECT qid, doc_id, score_milli,
       |    CAST(row_number() OVER (PARTITION BY qid
       |      ORDER BY score_milli DESC, doc_id) AS INT) AS rn
       |  FROM scored
       |)""".stripMargin

  // ---------------------------------------------------------------- q97

  /** RRF dampener (Cormack, Clarke & Buettcher 2009's k = 60). */
  val RrfK = 60

  /** The vector leg of q97: brute exact-cosine top-k per query, probe =
    * the embedding of the query's SOURCE document (vec_id 17·qid — the
    * same derivation as the lexical queries, so the two legs rank
    * against the same information need). q21's plan shape verbatim
    * (probe broadcast over one corpus scan, native fold dot, sqrt is
    * IEEE-correctly-rounded so cosine ordering is engine-stable); the
    * trivial self-match is excluded. Swapping this leg for q40/q92
    * candidates gives the ANN-accelerated hybrid with the same fusion. */
  private[operators] def vectorLeg(s: SparkSession, d: String): DataFrame = {
    val dot = graft.functions.Vectors.dot _
    val emb = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding"),
        dot(col("embedding"), col("embedding")).as("n2"))
    val probes = emb
      .filter(col("vec_id") % QStride === 0 &&
        expr(s"vec_id DIV $QStride") < NQueries)
      .select(expr(s"vec_id DIV $QStride").as("qid"),
        col("vec_id").as("probe_vec"),
        col("embedding").as("pe"), col("n2").as("pn2"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cosine").desc, col("vec_id"))
    emb.crossJoin(broadcast(probes))
      .filter(col("vec_id") =!= col("probe_vec"))
      .withColumn("cosine",
        dot(col("pe"), col("embedding")) / sqrt(col("pn2") * col("n2")))
      .withColumn("vrn", row_number().over(w))
      .filter(col("vrn") <= TopK)
      .select(col("qid"), col("vec_id").as("doc_id"), col("vrn"))
  }

  /** q97: hybrid retrieval — reciprocal-rank fusion of the lexical
    * (q95 BM25) and vector (exact-cosine) top-k lists per query, the
    * standard keyword+embedding hybrid a training-data pipeline runs
    * when neither leg alone is trusted. RRF works on RANKS only, so the
    * fusion is EXACT INTEGER arithmetic by construction:
    * `rrf_milli = Σ_legs 1000000 DIV (60 + rank)` — no score
    * normalization across incomparable scales (BM25 milliunits vs
    * cosine), which is RRF's whole point. A document in both legs'
    * top-k always outranks any single-leg document (min both-legs
    * contribution 2·⌊1e6/65⌋ > max single ⌊1e6/61⌋ — pinned in
    * [[RetrievalSpec]]). Plan: the two leg plans (each already
    * scale-shaped), a ≤2k-row full-outer fusion join, a 10-partition
    * top-k window. */
  /** The RRF fusion stage shared by q97 (brute leg) and q98 (ANN leg):
    * full-outer join of the two (qid, doc_id, rank) lists, integer RRF
    * sum, top-k. */
  private def fuseRrf(lex: DataFrame, vec: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("rrf_milli").desc, col("doc_id"))
    lex.join(vec, Seq("qid", "doc_id"), "full_outer")
      .withColumn("rrf_milli",
        expr(s"coalesce(1000000 DIV ($RrfK + lrn), 0) + " +
          s"coalesce(1000000 DIV ($RrfK + vrn), 0)"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= TopK)
      .select(col("qid"), col("doc_id"), col("rrf_milli"), col("rn"))
      .orderBy(col("qid"), col("rn"))
  }

  /** The fused q97 list, staged: q105 evaluates the SAME declared hybrid
    * run, so the brute vector leg (a full embeddings scan per execution)
    * and the fusion are priced once per session+corpus — the q95_ranked
    * pattern one level up. NQueries·TopK = 50 rows. */
  def q97HybridRrf(s: SparkSession, d: String): DataFrame =
    StagedCache.stage(d, "q97_fused", fuseRrf(
      q95Bm25TopK(s, d).select(col("qid"), col("doc_id"), col("rn").as("lrn")),
      vectorLeg(s, d)))

  // ---------------------------------------------------------------- q98

  /** q98: the ANN-ACCELERATED hybrid — q97's fusion with the vector leg
    * swapped from the brute corpus scan to q40's trained-IVF candidate
    * generation (the claim q97's scaladoc makes, now behind a row): the
    * probe meets only its nprobe nearest cells' members, so the vector
    * leg's per-probe work is |nprobe·N/K| candidates instead of N — the
    * leg a 1e9-vector deployment actually runs. Recall is the IVF trade
    * (the leg may surface fewer/different neighbors than q97's exact
    * scan; the oracle mirrors the SAME candidate rule, so the row is
    * exact about what the ANN leg returns). Lexical leg, fusion, and
    * dampener are q97's verbatim. */
  def q98HybridAnnRrf(s: SparkSession, d: String): DataFrame = {
    val (emb, trained) = Ivf.train(s, d)
    val tagged = StagedCache.stage(d, "q98_tagged", Ivf.assignTo(emb, trained))
    val probePred = col("vec_id") % QStride === 0 &&
      expr(s"vec_id DIV $QStride") < NQueries
    val vec = Ivf.serveWhere(tagged, trained, probePred, TopK)
      .select(expr(s"probe_id DIV $QStride").as("qid"),
        col("vec_id").as("doc_id"), col("rn").as("vrn"))
    fuseRrf(
      q95Bm25TopK(s, d).select(col("qid"), col("doc_id"), col("rn").as("lrn")),
      vec)
  }

  // ---------------------------------------------------------------- q99

  /** q99: the SERVED hybrid — q98's exact contract (same legs, same
    * candidate rules, same fusion, same oracle) answered from TWO
    * persisted indexes: the lexical leg from the [[LexIndex]] q96
    * serves, the vector leg from the [[IvfIndex]] q86 serves
    * ([[IvfIndex.queryWhere]] — the strided-probe form of the same
    * serve plan). This is the production hybrid READ PATH priced in the
    * open: no corpus scan, no tokenization, no training anywhere in the
    * declared plan — every input is an index table, which is how a
    * retrieval deployment actually answers a query. Train-once pricing
    * rides the session memos q86/q96 already built. */
  def q99ServedHybrid(s: SparkSession, d: String): DataFrame = {
    val lexIdx = lexMemo.get(s, d, "documents.parquet")
    val ivfIdx = Ivf.indexMemo.get(s, d, "embeddings.parquet")
    val probePred = col("vec_id") % QStride === 0 &&
      expr(s"vec_id DIV $QStride") < NQueries
    val vec = ivfIdx.queryWhere(probePred, TopK)
      .select(expr(s"probe_id DIV $QStride").as("qid"),
        col("vec_id").as("doc_id"), col("rn").as("vrn"))
    fuseRrf(
      lexIdx.query(0L, NQueries)
        .select(col("qid"), col("doc_id"), col("rn").as("lrn")),
      vec)
  }

  /** Same answer, same oracle: the served legs are deterministic twins
    * of q98's inline ones. */
  def q99Sql: String = q98Sql

  def q98Sql: String =
    s"""${Ivf.trainedCtes}, $bm25Ctes, lex AS (
       |  SELECT qid, doc_id, rn AS lrn FROM ranked WHERE rn <= $TopK
       |), aprobes AS (
       |  SELECT vec_id AS probe_id, embedding AS pe, n2 AS pn2
       |  FROM tagged WHERE vec_id % $QStride = 0 AND vec_id // $QStride < $NQueries
       |), apcells AS (
       |  SELECT vec_id AS probe_id, cid AS cell FROM (
       |    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
       |      ORDER BY ccos DESC, cid) AS crn
       |    FROM sf WHERE vec_id % $QStride = 0 AND vec_id // $QStride < $NQueries) t
       |  WHERE crn <= ${graft.Dials.IvfNProbeCells}
       |), acand AS (
       |  SELECT pc.probe_id, t.vec_id,
       |    ${Similarity.duckDotSql("pe", "embedding")} / sqrt(pn2 * n2) AS cosine
       |  FROM tagged t
       |  JOIN apcells pc ON t.cell = pc.cell
       |  JOIN aprobes p ON p.probe_id = pc.probe_id AND t.vec_id <> p.probe_id
       |), avranked AS (
       |  SELECT probe_id // $QStride AS qid, vec_id AS doc_id,
       |    CAST(row_number() OVER (PARTITION BY probe_id
       |      ORDER BY cosine DESC, vec_id) AS INT) AS vrn
       |  FROM acand
       |), vec AS (
       |  SELECT qid, doc_id, vrn FROM avranked WHERE vrn <= $TopK
       |), fused AS (
       |  SELECT COALESCE(l.qid, v.qid) AS qid,
       |    COALESCE(l.doc_id, v.doc_id) AS doc_id,
       |    CAST(COALESCE(1000000 // ($RrfK + lrn), 0) +
       |      COALESCE(1000000 // ($RrfK + vrn), 0) AS BIGINT) AS rrf_milli
       |  FROM lex l FULL JOIN vec v ON l.qid = v.qid AND l.doc_id = v.doc_id
       |), franked AS (
       |  SELECT qid, doc_id, rrf_milli,
       |    CAST(row_number() OVER (PARTITION BY qid
       |      ORDER BY rrf_milli DESC, doc_id) AS INT) AS rn
       |  FROM fused
       |)
       |SELECT qid, doc_id, rrf_milli, rn FROM franked WHERE rn <= $TopK
       |ORDER BY qid, rn""".stripMargin

  /** The q97 hybrid CTE chain (lexical top-k → brute vector leg → RRF
    * fusion → `franked`) — shared verbatim by the q105 eval oracle so
    * the evaluated run cannot drift from the declared q97. Callers
    * prepend `WITH $bm25Ctes, `. */
  private def hybridCtes: String =
    s"""lex AS (
       |  SELECT qid, doc_id, rn AS lrn FROM ranked WHERE rn <= $TopK
       |), vemb AS (
       |  SELECT vec_id, embedding,
       |    ${Similarity.duckDotSql("embedding", "embedding")} AS n2
       |  FROM embeddings
       |), vprobes AS (
       |  SELECT vec_id // $QStride AS qid, vec_id AS probe_vec,
       |    embedding AS pe, n2 AS pn2
       |  FROM vemb WHERE vec_id % $QStride = 0 AND vec_id // $QStride < $NQueries
       |), vscored AS (
       |  SELECT qid, e.vec_id,
       |    ${Similarity.duckDotSql("pe", "embedding")} / sqrt(pn2 * n2) AS cosine
       |  FROM vemb e, vprobes WHERE e.vec_id <> probe_vec
       |), vranked AS (
       |  SELECT qid, vec_id AS doc_id,
       |    CAST(row_number() OVER (PARTITION BY qid
       |      ORDER BY cosine DESC, vec_id) AS INT) AS vrn
       |  FROM vscored
       |), vec AS (
       |  SELECT qid, doc_id, vrn FROM vranked WHERE vrn <= $TopK
       |), fused AS (
       |  SELECT COALESCE(l.qid, v.qid) AS qid,
       |    COALESCE(l.doc_id, v.doc_id) AS doc_id,
       |    CAST(COALESCE(1000000 // ($RrfK + lrn), 0) +
       |      COALESCE(1000000 // ($RrfK + vrn), 0) AS BIGINT) AS rrf_milli
       |  FROM lex l FULL JOIN vec v ON l.qid = v.qid AND l.doc_id = v.doc_id
       |), franked AS (
       |  SELECT qid, doc_id, rrf_milli,
       |    CAST(row_number() OVER (PARTITION BY qid
       |      ORDER BY rrf_milli DESC, doc_id) AS INT) AS rn
       |  FROM fused
       |)""".stripMargin

  def q97Sql: String =
    s"""WITH $bm25Ctes, $hybridCtes
       |SELECT qid, doc_id, rrf_milli, rn FROM franked WHERE rn <= $TopK
       |ORDER BY qid, rn""".stripMargin

  // --------------------------------------------------------------- q103

  /** Pre-dedup retrieval depth: the ranked list is taken 4× deeper than
    * the answer so collapsing a near-dup cluster to its best member
    * still leaves ≥ [[TopK]] distinct clusters to return. */
  val PreDedupK = 20

  /** q103: SEARCH-RESULT DEDUP — BM25 retrieval composed with the
    * near-dup cluster map (q54's connected components): the ranked list
    * is fetched [[PreDedupK]] deep, every hit is tagged with its
    * cluster (unclustered docs are their own cluster), each (query,
    * cluster) keeps only its best-ranked member, and the survivors
    * re-rank to the final top-[[TopK]]. This is the production search
    * page over a crawled corpus — without it a near-dup family eats
    * result slots (the fixture's planted dup chains reach q95's top-5
    * for real: DedupRetrievalSpec measures and pins > 0 intra-cluster
    * dup slots there). Cluster labels ride [[Dedup.clusterLabels]] — the memoized
    * serve path (or the live ingest snapshot when a
    * [[graft.streaming.DedupStream]] owns the corpus); q54 remains the
    * solver that prices the fixpoint. Scale shape of the dedup join:
    * the label table is corpus-scale, so it is never shuffled or
    * broadcast whole — a broadcast SEMI-join against the ≤
    * NQueries·PreDedupK result ids prunes it to result-sized in one
    * scan, and only that pruned table broadcasts into the left join. */
  def q103DedupRetrieval(s: SparkSession, d: String): DataFrame = {
    val tf = stagedTf(s, d)
    val dl = dlOf(tf)
    val deep = serve(tf, dl, dfOf(tf), statsOf(dl), stagedQueries(s, d),
      0L, NQueries, PreDedupK)
      .localCheckpoint(false) // feeds the semi filter AND the outer join
    val labels = Dedup.clusterLabels(s, d)
      .select(col("v").as("doc_id"), col("lbl"))
    val hitLabels = labels.join(
      broadcast(deep.select(col("doc_id")).distinct()),
      Seq("doc_id"), "left_semi")
    val wC = Window.partitionBy(col("qid"), col("cluster"))
      .orderBy(col("rn"))
    val wR = Window.partitionBy(col("qid")).orderBy(col("rn"))
    deep
      .join(broadcast(hitLabels).as("lb"), Seq("doc_id"), "left")
      .withColumn("cluster", coalesce(col("lbl"), col("doc_id")))
      .withColumn("crn", row_number().over(wC))
      .filter(col("crn") === 1)
      .withColumn("drn", row_number().over(wR))
      .filter(col("drn") <= TopK)
      .select(col("qid"), col("doc_id"), col("cluster"), col("score_milli"),
        col("drn").as("rn"))
      .orderBy(col("qid"), col("rn"))
  }

  def q103Sql: String =
    s"""${Dedup.lshCtes.replaceFirst("WITH ", "WITH RECURSIVE ")}${Dedup.ccCtes}, $bm25Ctes, deep AS (
       |  SELECT qid, doc_id, score_milli, rn FROM ranked WHERE rn <= $PreDedupK
       |), clustered AS (
       |  SELECT d.qid, d.doc_id, d.score_milli, d.rn,
       |    coalesce(c.lbl, d.doc_id) AS cluster
       |  FROM deep d LEFT JOIN comp c ON c.v = d.doc_id
       |), best AS (
       |  SELECT qid, doc_id, cluster, score_milli, rn AS orn FROM (
       |    SELECT *, row_number() OVER (PARTITION BY qid, cluster
       |      ORDER BY rn) AS crn
       |    FROM clustered) t
       |  WHERE crn = 1
       |)
       |SELECT qid, doc_id, cluster, score_milli, rn FROM (
       |  SELECT qid, doc_id, cluster, score_milli,
       |    CAST(row_number() OVER (PARTITION BY qid ORDER BY orn) AS INT) AS rn
       |  FROM best) t
       |WHERE rn <= $TopK ORDER BY qid, rn""".stripMargin

  // --------------------------------------------------------------- q105

  /** nDCG@5 rank discounts in exact integer milliunits — round(1000 /
    * log₂(rank+1)) precomputed as LITERALS, so neither engine evaluates
    * a transcendental at runtime (the q55/q95 no-libm doctrine applied
    * to the metric itself). Ideal-DCG prefix sums follow. */
  private val Disc = Seq(1000L, 631L, 500L, 431L, 387L)
  private val Idcg = Disc.scanLeft(0L)(_ + _).tail // 1000,1631,2131,2562,2949

  /** q105: the OFFLINE RETRIEVAL EVAL HARNESS — recall@5 and nDCG@5 per
    * (run, query) for two declared runs (`lex` = q95 BM25, `hybrid` =
    * q97 RRF), computed distributed over the whole corpus. Every
    * retrieval deployment runs exactly this job offline after an index
    * or ranker change; at 100 TB the eval set joins against the corpus,
    * so the metric computation itself has to be an engine operator, not
    * a notebook loop. Relevance labels are PSEUDO-relevance, derived
    * deterministically on both engines: a document is relevant to a
    * query iff it contains ALL of the query's distinct terms (the
    * conjunctive-containment rule — label derivation is corpus-only, so
    * the oracle can recompute it; the labeled-fixture complement with
    * known ground truth lives in HybridRelevanceSpec). All metric
    * arithmetic is exact integers: hits and n_rel are counts,
    * recall_milli = hits·1000 DIV n_rel, dcg uses the [[Disc]] literal
    * discounts and ndcg_milli = dcg·1000 DIV idcg(min(n_rel, 5)).
    *
    * Scale shape: the relevance join reuses the staged tf table (the
    * one corpus-scale build, shared with the scoring legs); the ranked
    * lists are ≤ runs·NQueries·TopK = 100 rows; rel is
    * candidate-generated (docs sharing ≥1 query term) and collapses
    * map-side before the n_terms equality check. */
  def q105RetrievalEval(s: SparkSession, d: String): DataFrame = {
    val tf = stagedTf(s, d)
    val queries = stagedQueries(s, d)
    // pseudo-relevance: matched distinct terms == the query's term count
    val qsize = queries.groupBy(col("qid")).agg(count(lit(1)).as("n_terms"))
    val rel = tf.join(broadcast(queries), Seq("term"))
      .groupBy(col("qid"), col("doc_id"))
      .agg(count(lit(1)).as("matched"))
      .join(broadcast(qsize), Seq("qid"))
      .filter(col("matched") === col("n_terms"))
      .select(col("qid"), col("doc_id"))
      .localCheckpoint(false) // feeds n_rel AND both runs' hit joins
    val nrel = rel.groupBy(col("qid")).agg(count(lit(1)).as("n_rel"))
    // both evaluated runs consume q95's staged ranked list — the eval
    // cannot drift from the declared query, and pays it once.
    val lexRun = q95Bm25TopK(s, d)
      .select(lit("lex").as("run"), col("qid"), col("doc_id"), col("rn"))
    // the declared q97 run verbatim (staged there): the eval consumes the
    // exact fused list, and pays the vector leg zero times here
    val hybRun = q97HybridRrf(s, d)
      .select(lit("hybrid").as("run"), col("qid"), col("doc_id"), col("rn"))
    val disc = (2 to 5).foldLeft(when(col("rn") === 1, lit(Disc.head))) {
      (acc, r) => acc.when(col("rn") === r, lit(Disc(r - 1)))
    }
    val idcg = (2 to 5).foldLeft(when(col("n_rel") === 1, lit(Idcg.head))) {
      (acc, m) => if (m < 5) acc.when(col("n_rel") === m, lit(Idcg(m - 1)))
        else acc.otherwise(lit(Idcg(4)))
    }
    lexRun.unionByName(hybRun)
      .join(rel.withColumn("isrel", lit(1L)), Seq("qid", "doc_id"), "left")
      .groupBy(col("run"), col("qid"))
      .agg(sum(coalesce(col("isrel"), lit(0L))).as("hits"),
        sum(when(col("isrel") === 1L, disc).otherwise(lit(0L))).as("dcg_milli"))
      .join(broadcast(nrel), Seq("qid"))
      .withColumn("recall_milli", expr("hits * 1000 DIV n_rel"))
      .withColumn("idcg_milli", idcg)
      .withColumn("ndcg_milli", expr("dcg_milli * 1000 DIV idcg_milli"))
      .select(col("run"), col("qid"), col("n_rel"), col("hits"),
        col("recall_milli"), col("ndcg_milli"))
      .orderBy(col("run"), col("qid"))
  }

  def q105Sql: String =
    s"""WITH $bm25Ctes, $hybridCtes, qsize AS (
       |  SELECT qid, count(*) AS n_terms FROM queries GROUP BY qid
       |), relm AS (
       |  SELECT q.qid, t.doc_id, count(*) AS matched
       |  FROM tf t JOIN queries q USING (term)
       |  GROUP BY q.qid, t.doc_id
       |), rel AS MATERIALIZED (
       |  SELECT r.qid, r.doc_id
       |  FROM relm r JOIN qsize s ON r.qid = s.qid AND r.matched = s.n_terms
       |), nrel AS (
       |  SELECT qid, count(*) AS n_rel FROM rel GROUP BY qid
       |), runs AS (
       |  SELECT 'lex' AS run, qid, doc_id, rn FROM ranked WHERE rn <= $TopK
       |  UNION ALL
       |  SELECT 'hybrid' AS run, qid, doc_id, rn FROM franked WHERE rn <= $TopK
       |), ev AS (
       |  SELECT s.run, s.qid,
       |    CAST(sum(CASE WHEN r.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS hits,
       |    CAST(sum(CASE WHEN r.doc_id IS NOT NULL THEN
       |      CASE s.rn WHEN 1 THEN ${Disc(0)} WHEN 2 THEN ${Disc(1)}
       |        WHEN 3 THEN ${Disc(2)} WHEN 4 THEN ${Disc(3)}
       |        ELSE ${Disc(4)} END
       |      ELSE 0 END) AS BIGINT) AS dcg_milli
       |  FROM runs s LEFT JOIN rel r ON r.qid = s.qid AND r.doc_id = s.doc_id
       |  GROUP BY s.run, s.qid
       |)
       |SELECT e.run, e.qid, n.n_rel, e.hits,
       |  CAST(e.hits * 1000 // n.n_rel AS BIGINT) AS recall_milli,
       |  CAST(e.dcg_milli * 1000 // (CASE WHEN n.n_rel >= 5 THEN ${Idcg(4)}
       |    WHEN n.n_rel = 4 THEN ${Idcg(3)} WHEN n.n_rel = 3 THEN ${Idcg(2)}
       |    WHEN n.n_rel = 2 THEN ${Idcg(1)} ELSE ${Idcg(0)} END) AS BIGINT)
       |    AS ndcg_milli
       |FROM ev e JOIN nrel n ON n.qid = e.qid
       |ORDER BY e.run, e.qid""".stripMargin
}

/** Train-once / serve-many BM25 — the LEXICAL index behind the same
  * [[AnnIndex]] lifecycle as the float ([[IvfIndex]]) and PQ
  * ([[PqIndex]]) ANN legs, making the at-ingest index state machine
  * ([[graft.streaming.IndexStream]]) content-agnostic: what streams in
  * here is (doc_id, text) rows, and what persists is the posting
  * statistics — tf (the posting list weights), dl (per-doc lengths),
  * df and corpus stats as DELTA-shaped tables (a batch of new docs
  * appends its own term df counts and one (n_docs, total_dl) row;
  * serving folds the deltas with integer sums, so the merged statistics
  * are BIT-IDENTICAL to a from-scratch build — BM25's global statistics
  * are all additive, which is the whole reason a lexical index can
  * ingest incrementally at all). The fixture-derived query table is
  * written once at build (queries are part of the declared contract,
  * not of the corpus statistics).
  *
  * `query(qidFrom, nQids)` maps the [[AnnIndex]] probe-range signature
  * onto query ids. `addBatch` expects NEW doc_ids (the same
  * append-only contract as the ANN legs; re-ingesting an existing doc
  * would double its postings — replays are what the per-table batch
  * guard absorbs). */
final class LexIndex(val spark: SparkSession,
    val state: graft.streaming.StateDir) extends AnnIndex {
  import LexIndex._
  import Retrieval.{tfOf, dlOf, dfOf, statsOf, queriesOf}

  protected def prefix: String = "lex"

  /** `warm` unused: BM25 statistics are exact corpus functions with no
    * fitted state, so a warm rebuild IS a cold rebuild (the trait's
    * default [[warmStartTables]] = none snapshots nothing). */
  protected def publishTables(d: String,
      warm: Map[String, DataFrame]): Unit = {
    val docs = Tables.documents(spark, d)
    state.write(TfTable, tfOf(docs))
    // derive the downstream tables from the PUBLISHED tf (a re-read, not
    // a recompute): dl/df/stats are guaranteed consistent with the exact
    // postings serving reads
    val tf = state.read(TfTable, TfSchema)
    val dl = dlOf(tf)
    state.write(DlTable, dl)
    state.write(DfTable, dfOf(tf))
    state.write(StatsTable, statsOf(dl))
    state.write(QueriesTable, queriesOf(docs))
  }

  /** Incremental maintenance — [[AnnIndex]]'s contract for the lexical
    * index: the batch's OWN tf/dl/df/stats deltas append to all four
    * statistic tables (per-table at-most-once under a batchId — four
    * tables make the torn-batch window wider than [[PqIndex]]'s two,
    * and the completion semantics matter more, not less). The query
    * table is deliberately untouched: it pins the declared contract. */
  protected def appendDeltas(newDocs: DataFrame, batchId: Option[Long],
      tag: org.apache.spark.sql.Column): Unit = {
    val tf = tfOf(newDocs.select(col("doc_id"), col("text")))
      .localCheckpoint(false) // four consumers of one batch-scale build
    val dl = dlOf(tf)
    if (tableFresh(TfTable, TfSchema, batchId))
      state.append(TfTable, tf.withColumn("batch_id", tag))
    if (tableFresh(DlTable, DlSchema, batchId))
      state.append(DlTable, dl.withColumn("batch_id", tag))
    if (tableFresh(DfTable, DfSchema, batchId))
      state.append(DfTable, dfOf(tf).withColumn("batch_id", tag))
    if (tableFresh(StatsTable, StatsSchema, batchId))
      state.append(StatsTable, statsOf(dl).withColumn("batch_id", tag))
  }

  /** q95-shaped BM25 over the persisted statistics: delta-shaped df and
    * stats fold with integer sums (bit-identical to inline aggregates),
    * then the shared scoring plan. The probe range selects query ids. */
  protected def serveTables(qidFrom: Long, nQids: Long): DataFrame = {
    val df = state.read(DfTable, DfSchema)
      .groupBy(col("term")).agg(sum(col("df")).as("df"))
    val stats = state.read(StatsTable, StatsSchema)
      .agg(sum(col("n_docs")).as("n_docs"), sum(col("total_dl")).as("total_dl"))
    Retrieval.serve(
      state.read(TfTable, TfSchema),
      state.read(DlTable, DlSchema),
      df, stats,
      state.read(QueriesTable, QueriesSchema),
      qidFrom, nQids)
  }
}

object LexIndex {
  import org.apache.spark.sql.types._

  val TfTable = "lex_tf"
  val DlTable = "lex_dl"
  val DfTable = "lex_df"
  val StatsTable = "lex_stats"
  val QueriesTable = "lex_queries"

  val TfSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("term", StringType),
    StructField("tf", LongType)))

  val DlSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("dl", LongType)))

  val DfSchema: StructType = StructType(Seq(
    StructField("term", StringType),
    StructField("df", LongType)))

  val StatsSchema: StructType = StructType(Seq(
    StructField("n_docs", LongType),
    StructField("total_dl", LongType)))

  val QueriesSchema: StructType = StructType(Seq(
    StructField("qid", LongType),
    StructField("term", StringType)))

  /** Schema plus the ingest batch tag — the replay-guard read shape;
    * untagged (build-time) rows surface a null tag. */
  def tagged(s: StructType): StructType =
    StructType(s.fields :+ StructField("batch_id", LongType))
}
