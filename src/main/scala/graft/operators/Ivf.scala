package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Vectors

/** IVF (inverted-file) ANN — the coarse-quantizer counterpart to q28's LSH
  * (the brief asks for "an IVF or LSH-bucketed variant as the scale path";
  * the engine ships both, same plan skeleton, different cell function).
  *
  * Cells come from a TRAINED coarse quantizer: k-means seeded from the
  * first K vectors, refined for [[Iters]] deterministic Lloyd iterations
  * entirely in DataFrame ops (assign to nearest centroid by exact cosine,
  * recompute each centroid as the element-wise mean of its cell). Every
  * vector is assigned to its nearest trained centroid; a probe searches
  * ONLY its own cell. Training is one broadcast join per iteration (K
  * centroid rows) + per-vector argmax — the 100 TB shape: cells are
  * shuffle keys, |cell| ≈ N/K bounds the re-rank, and a production build
  * trains once, persists the centroid table, and reuses it as an index.
  *
  * Bit-exactness contract (same as q21/q28): the per-dimension centroid
  * mean folds its double sum in vec_id order — Spark sorts the collected
  * (vec_id, v) pairs and left-folds from 0.0, DuckDB `list(v ORDER BY
  * vec_id)` + `list_reduce` left-folds from the first element, and IEEE
  * `0.0 + x == x` makes the sums identical; each mean then rounds to
  * FLOAT once (both engines round-to-nearest-even), so centroid arrays
  * stay type-identical to the embeddings. The per-cell ordered
  * collect_list is bounded by |cell| and exists to pin the oracle — a
  * production trainer uses a plain associative sum and tolerates fp
  * reorder.
  *
  * Cost shape: training inline makes q40 a build-the-index-AND-serve
  * query — the cold run pays ~6 extra broadcast/aggregate stages of
  * scheduling + codegen latency (dominant at bench scale, where the data
  * itself is tiny); warm steady-state is ~2.5 s at sf0.1 and a production
  * deployment trains once and persists the centroid table.
  */
object Ivf {

  private val K = graft.Dials.IvfCells
  private val Dim = graft.Dials.EmbeddingDim // set by the corpus (TESTDATA.md)
  private val Iters = 2    // deterministic Lloyd iterations
  private[graft] val ProbeFrom = 490L
  private[graft] val NProbes = 10L // probes: vec_id in [490, 500) at EVERY sf —
                            // an unbounded >= filter would quietly turn
                            // larger fixtures into thousands of probes
  /** IVF nprobe: each probe searches its [[NProbeCells]] nearest cells, the
    * standard IVF recall dial (candidates stay one cell-equi-join away —
    * a candidate lives in exactly one cell, so no dedup is needed).
    * nprobe=1 measured 0.30 recall@3 on the fixture (AnnRecallSpec);
    * 4 of 8 cells measures 0.867 while the re-rank still touches
    * ~4N/K vectors, not N (see [[graft.Dials.IvfNProbeCells]] for the
    * r9 3→4 rationale). */
  private val NProbeCells = graft.Dials.IvfNProbeCells

  /** Nearest-centroid assignment: (vec_id, embedding, n2, cell). A
    * `max_by` aggregate, not a window — partial aggregation collapses the
    * K scored rows per vector MAP-SIDE (the scored rows are co-located:
    * broadcast join preserves the scan partitioning), so no N×K window
    * sort/shuffle ever materializes. Ties break on the smaller cid
    * (lexicographic struct order on (ccos, -cid)), identical to the
    * oracle's `row_number() ... ORDER BY ccos DESC, cid`. */
  private[graft] def assignTo(emb: DataFrame, centroids: DataFrame): DataFrame =
    emb.crossJoin(broadcast(centroids))
      .withColumn("ccos",
        Vectors.dot(col("embedding"), col("ce")) / sqrt(col("n2") * col("cn2")))
      .groupBy(col("vec_id"))
      .agg(max_by(
        struct(col("embedding"), col("n2"), col("cid").as("cell")),
        struct(col("ccos"), (-col("cid")).as("nc"))).as("best"))
      .select(col("vec_id"), col("best.embedding").as("embedding"),
        col("best.n2").as("n2"), col("best.cell").as("cell"))

  /** Per-vector centroid ranking, `keep` nearest kept — the window form,
    * used only over the tiny probe subset (nprobe cells per probe). */
  private[graft] def rankCells(emb: DataFrame, centroids: DataFrame,
      keep: Int): DataFrame = {
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("ccos").desc, col("cid"))
    emb.crossJoin(broadcast(centroids))
      .withColumn("ccos",
        Vectors.dot(col("embedding"), col("ce")) / sqrt(col("n2") * col("cn2")))
      .withColumn("crn", row_number().over(w))
      .filter(col("crn") <= keep)
      .select(col("vec_id"), col("cid").as("cell"), col("crn"))
  }

  /** One Lloyd update: element-wise mean of each cell's vectors (ordered
    * fold, FLOAT rounding — see the object scaladoc), re-emitted as a
    * (cid, ce, cn2) centroid table. One groupBy per update: the vectors of
    * a cell fold element-wise in vec_id order via zip_with — the per-
    * dimension addition sequence is identical to a per-dim ordered fold,
    * so the unrolled per-dimension oracle reproduces it bit-for-bit.
    * Cells that captured no vectors drop out (standard k-means;
    * deterministic on both engines). */
  private def centroidsOf(assigned: DataFrame): DataFrame =
    assigned
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("cnt"),
        expr("aggregate(array_sort(collect_list(struct(vec_id, embedding))), " +
          s"array_repeat(CAST(0 AS DOUBLE), $Dim), " +
          "(acc, x) -> zip_with(acc, x.embedding, (a, e) -> a + double(e)))")
          .as("sums"))
      .select(col("cell").as("cid"),
        expr("transform(sums, s -> CAST(s / cnt AS FLOAT))").as("ce"))
      .withColumn("cn2", Vectors.dot(col("ce"), col("ce")))

  /** Lloyd rounds a WARM-seeded build runs: the previous generation's
    * centroids are already a converged solution for a nearby
    * distribution, so one refinement round suffices where the cold
    * first-K seed needs [[Iters]] — the whole point of warm restart at
    * 1e9 vectors, where each round is a full corpus pass. */
  private[operators] val WarmIters = 1

  /** Training: seed = first K vectors (or `seed0` — a warm-start
    * centroid table from a previous generation, [[IvfIndex]]'s retrain
    * path), `rounds` Lloyd rounds ([[Iters]] cold, [[WarmIters]] warm).
    * Returns the (persisted) embedding base and the trained centroid
    * table. `k` defaults to the production dial; only the
    * [[graft.tools.AnnDialSweep]] measurement harness passes another
    * value (every declared query trains at [[graft.Dials.IvfCells]]). */
  private[graft] def train(s: SparkSession, d: String,
      seed0: Option[DataFrame] = None,
      rounds: Int = Iters, k: Int = K): (DataFrame, DataFrame) = {
    val emb = StagedCache.stage(d, "ivf_train_emb", Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding"),
        Vectors.dot(col("embedding"), col("embedding")).as("n2")))
      // staged: scanned by every training round + the final assignment
    val seed = seed0.getOrElse(emb.filter(col("vec_id") < k)
      .select(col("vec_id").as("cid"), col("embedding").as("ce"), col("n2").as("cn2")))
    val trained = (0 until rounds).foldLeft(seed) { (c, _) =>
      centroidsOf(assignTo(emb, c))
    }
    // Stage the trained centroid table for the declared (cold-seed,
    // default-dial) shape: K rows, but its lineage is the whole Lloyd
    // chain, and the serving plans reference it several times (probe
    // ranking, probe residuals, candidate cells). Un-staged, every
    // reference re-expands — and re-EXECUTES — the full training subtree
    // (q92's physical plan carried 160 parquet scans / 280 sort
    // aggregates from exactly this duplication), and each of the six
    // inline ANN queries re-trained the same quantizer per reference.
    // One persisted K-row table truncates all of it; warm/measurement
    // shapes (seed0/k/rounds overrides) pass through unstaged since
    // their results differ per seed.
    if (seed0.isEmpty && rounds == Iters && k == K)
      (emb, StagedCache.stage(d, "ivf_trained", trained))
    else (emb, trained)
  }

  /** Validate a previous generation's (localized) centroid snapshot as a
    * warm-start seed: non-empty, at most K rows (a K dial shrink makes
    * the old generation over-provisioned — cold-seed instead), every
    * centroid exactly [[Dim]] floats (an embedding-dimension change is a
    * different space). Returns None → the caller cold-seeds. */
  private[graft] def warmSeed(df: DataFrame): Option[DataFrame] = {
    val rows = df.collect()
    val ok = rows.nonEmpty && rows.length <= K && rows.forall { r =>
      val ce = r.getAs[scala.collection.Seq[Float]]("ce")
      ce != null && ce.length == Dim
    }
    if (ok) Some(df) else None
  }

  // ---------------------------------------------------------------- q40

  /** IVF ANN: 10 probes, candidates from each probe's [[NProbeCells]]
    * nearest cells, exact cosine re-rank, top-3 (vec_id tiebreak). Same
    * bit-exact arithmetic contract as q21/q28. */
  def q40IvfAnn(s: SparkSession, d: String): DataFrame = {
    val (emb, trained) = train(s, d)
    // Stage the assignment once (lazily): it feeds BOTH the probe
    // broadcast and the candidate scan, and the N×K scoring + argmax
    // window is the expensive stage — without this it executes twice.
    // ([[IvfIndex]] is the production shape: the same assignment persisted
    // once, served many times.)
    serve(StagedCache.stage(d, "ivf_q40_tagged", assignTo(emb, trained)),
      trained, ProbeFrom, NProbes)
  }

  /** The q40 serving plan over an EXISTING assignment + centroid table:
    * probe rows, nprobe nearest cells per probe, cell-equi-join
    * candidates, exact cosine top-3. Shared by the inline q40 and the
    * persisted [[IvfIndex]] so both are bit-identical. */
  private[operators] def serve(tagged: DataFrame, trained: DataFrame,
      probeFrom: Long, nProbes: Long): DataFrame =
    serveWhere(tagged, trained,
      col("vec_id") >= probeFrom && col("vec_id") < probeFrom + nProbes, 3)

  /** [[serve]] with an arbitrary probe predicate and top-k — the same
    * plan expression-for-expression (q40/q86's pins ride the delegating
    * overload); q98's hybrid vector leg probes a strided id set. */
  private[graft] def serveWhere(tagged: DataFrame, trained: DataFrame,
      probePred: org.apache.spark.sql.Column, topK: Int,
      nCells: Int = NProbeCells): DataFrame = {
    val probes = tagged.filter(probePred)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pe"),
        col("n2").as("pn2"))
    // each probe's nprobe nearest cells — ranked against the SAME trained
    // centroids, over the probe subset only (tiny)
    val pcells = rankCells(tagged.filter(probePred), trained, nCells)
      .select(col("vec_id").as("probe_id"), col("cell"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    tagged.join(broadcast(pcells), Seq("cell"))
      .join(broadcast(probes), Seq("probe_id"))
      .filter(col("vec_id") =!= col("probe_id"))
      .withColumn("cosine",
        Vectors.dot(col("pe"), col("embedding")) / sqrt(col("pn2") * col("n2")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= topK)
      .select(col("probe_id"), col("cell"), col("vec_id"), col("cosine"), col("rn"))
      .orderBy(col("probe_id"), col("rn"))
  }

  // ---------------------------------------------------------------- q86

  /** Per-(session, corpus) persisted-index memo backing [[q86ServedAnn]] —
    * the q54/q56 train-once/serve-many split applied to ANN (the shared
    * [[ServedMemo]] machinery; [[PqIndex]] reuses it for q93). */
  private[operators] val indexMemo = new ServedMemo[IvfIndex](
    maxEntries = 8,
    mk = (s, state) => new IvfIndex(s, state),
    built = _.isBuilt,
    build = _.build(_))

  /** Served-index ANN — q40's exact contract (same probes, same nprobe,
    * same top-3, same oracle) answered from a PERSISTED [[IvfIndex]]:
    * training happens once per session+corpus as setup; the declared plan
    * is the SERVE path only — two state-table scans, probe broadcast,
    * cell-equi-join, exact-cosine top-k. This prices the production serve
    * path in the open the way q56/q84 price CC serve, while q40 stays the
    * trainer (its bench cost honestly prices build-AND-serve). Retrain
    * policy is the deployment's: a new session (or a fresh StateDir)
    * rebuilds; [[IvfIndexSpec]] pins serve ≡ inline-q40 bit-identically
    * and that the serving plan carries no Lloyd subtree. */
  def q86ServedAnn(s: SparkSession, d: String): DataFrame =
    indexMemo.get(s, d, "embeddings.parquet").query(ProbeFrom, NProbes)

  /** Same answer, same oracle: the index serves q40's results verbatim. */
  def q86Sql: String = q40Sql

  // ---------------------------------------------------------------- q101

  /** Filtered-search nprobe: the attribute filter discards ~(1 − 1/|labels|)
    * of every probed cell, so the probe searches 2× the cells to hold the
    * post-filter candidate count — the standard filtered-ANN recall dial
    * (probe wider, not scan more). With the fixture's label fan this keeps
    * ≥ R candidates per probe at the same per-probe cost ORDER; at scale
    * the multiplier follows the filter's selectivity (a 1% filter wants
    * nprobe ≈ 100× or a partitioned per-attribute index — see the
    * scaladoc below). */
  private[graft] val FilteredNProbeCells = 2 * NProbeCells

  /** q101: FILTERED ANN — q40's IVF search constrained to candidates
    * sharing the probe's `label` (the production "vector search WHERE
    * metadata = x" shape: same-language neighbors, same-source dedup,
    * per-tenant retrieval). The attribute is joined into the assignment
    * at BUILD time (one co-partitioned equi-join, amortized across every
    * serve — the attribute-in-index design: a production [[IvfIndex]]
    * stores the label as one extra column of the persisted assignment
    * table and serves this plan with NO corpus access), so the serve
    * path filters candidates with a codegen'd predicate instead of a
    * corpus join, and the filter lands BEFORE the top-k window — wrong
    * answers (post-filtering top-k then discarding) never enter the
    * plan. North-star surface; no reference analog (the reference's
    * nearest filter-join is `StreamingApp.scala:253`'s banded release).
    * Output carries the label so the constraint is visible in the row. */
  def q101FilteredAnn(s: SparkSession, d: String): DataFrame = {
    val (emb, trained) = train(s, d)
    val labels = Tables.embeddings(s, d).select(col("vec_id"), col("label"))
    val tagged = StagedCache.stage(d, "ivf_q101_ltagged",
      assignTo(emb, trained).join(labels, Seq("vec_id")))
    // staged: feeds the probe broadcast AND the candidate scan
    val probeRange = col("vec_id") >= ProbeFrom &&
      col("vec_id") < ProbeFrom + NProbes
    val probes = tagged.filter(probeRange)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pe"),
        col("n2").as("pn2"), col("label").as("plabel"))
    val pcells = rankCells(tagged.filter(probeRange), trained,
      FilteredNProbeCells)
      .select(col("vec_id").as("probe_id"), col("cell"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    tagged.join(broadcast(pcells), Seq("cell"))
      .join(broadcast(probes), Seq("probe_id"))
      .filter(col("vec_id") =!= col("probe_id") &&
        col("label") === col("plabel"))
      .withColumn("cosine",
        Vectors.dot(col("pe"), col("embedding")) / sqrt(col("pn2") * col("n2")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("probe_id"), col("plabel").as("label"), col("vec_id"),
        col("cosine"), col("rn"))
      .orderBy(col("probe_id"), col("rn"))
  }

  def q101Sql: String =
    s"""$trainedCtes, ltagged AS (
       |  SELECT t.vec_id, t.embedding, t.n2, t.cell, l.label
       |  FROM tagged t JOIN embeddings l USING (vec_id)
       |), fprobes AS (
       |  SELECT vec_id AS probe_id, embedding AS pe, n2 AS pn2, label AS plabel
       |  FROM ltagged WHERE vec_id >= $ProbeFrom AND vec_id < ${ProbeFrom + NProbes}
       |), fpcells AS (
       |  SELECT vec_id AS probe_id, cid AS cell FROM (
       |    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) AS crn
       |    FROM sf WHERE vec_id >= $ProbeFrom AND vec_id < ${ProbeFrom + NProbes}) t
       |  WHERE crn <= $FilteredNProbeCells
       |), fcand AS (
       |  SELECT pc.probe_id, p.plabel, t.vec_id,
       |    ${duckDot("pe", "embedding")} / sqrt(pn2 * n2) AS cosine
       |  FROM ltagged t
       |  JOIN fpcells pc ON t.cell = pc.cell
       |  JOIN fprobes p ON p.probe_id = pc.probe_id AND t.vec_id <> p.probe_id
       |    AND t.label = p.plabel
       |), franked AS (
       |  SELECT probe_id, plabel, vec_id, cosine,
       |    CAST(row_number() OVER (PARTITION BY probe_id ORDER BY cosine DESC, vec_id) AS INT) AS rn
       |  FROM fcand
       |)
       |SELECT probe_id, plabel AS label, vec_id, cosine, rn FROM franked
       |WHERE rn <= 3 ORDER BY probe_id, rn""".stripMargin

  // ---------------------------------------------------------------- q106

  /** Recall@k of an IVF-served answer against the exact brute-force
    * ground truth over the SAME assignment table — per probe, in exact
    * integer milliunits (hits·1000 DIV k; hits and k are counts, so no
    * float enters the metric). The shared core behind the q106 row and
    * [[graft.streaming.EvalStream]]'s per-tick quality samples.
    *
    * Scale shape: the served leg is the production nprobe plan; the
    * exact leg is ONE corpus scan against a broadcast probe set — the
    * honest price of ground truth, which is why a deployment runs it
    * over a small fixed canary probe set on an eval CADENCE (per
    * retrain, per N batches) rather than per query. The intersection
    * joins two ≤|probes|·k row sides. */
  private[graft] def recallOf(tagged: DataFrame, trained: DataFrame,
      probePred: org.apache.spark.sql.Column, topK: Int): DataFrame =
    Recall.againstExact(
      tagged.select(col("vec_id"), col("embedding"), col("n2")),
      serveWhere(tagged, trained, probePred, topK)
        .select(col("probe_id"), col("vec_id")),
      probePred, topK, Recall.CosineDesc)

  /** q106: the ANN QUALITY row — recall@3 of the q40/q86 IVF serve
    * against exact brute force, per probe. AnnRecallSpec
    * measured this number for two rounds ("0.867 at nprobe 4"); q106
    * turns the measurement into a DECLARED, oracle-checked query — the
    * offline eval job every ANN deployment runs after a dial or index
    * change, and the batch twin of [[graft.streaming.EvalStream]]'s
    * continuous monitoring ticks. Reuses q40's staged assignment, so in
    * a bench session the training cost is q40's to pay. */
  def q106AnnRecall(s: SparkSession, d: String): DataFrame = {
    val (emb, trained) = train(s, d)
    val tagged = StagedCache.stage(d, "ivf_q40_tagged", assignTo(emb, trained))
    recallOf(tagged, trained,
      col("vec_id") >= ProbeFrom && col("vec_id") < ProbeFrom + NProbes, 3)
  }

  def q106Sql: String =
    s"""$trainedCtes, probes AS (
       |  SELECT vec_id AS probe_id, embedding AS pe, n2 AS pn2
       |  FROM tagged WHERE vec_id >= $ProbeFrom AND vec_id < ${ProbeFrom + NProbes}
       |), pcells AS (
       |  SELECT vec_id AS probe_id, cid AS cell FROM (
       |    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) AS crn
       |    FROM sf WHERE vec_id >= $ProbeFrom AND vec_id < ${ProbeFrom + NProbes}) t
       |  WHERE crn <= $NProbeCells
       |), served AS (
       |  SELECT probe_id, vec_id FROM (
       |    SELECT pc.probe_id, t.vec_id,
       |      row_number() OVER (PARTITION BY pc.probe_id
       |        ORDER BY ${duckDot("pe", "embedding")} / sqrt(pn2 * n2) DESC, t.vec_id) AS rn
       |    FROM tagged t
       |    JOIN pcells pc ON t.cell = pc.cell
       |    JOIN probes p ON p.probe_id = pc.probe_id AND t.vec_id <> p.probe_id) t
       |  WHERE rn <= 3
       |), exact AS (
       |  SELECT probe_id, vec_id FROM (
       |    SELECT p.probe_id, t.vec_id,
       |      row_number() OVER (PARTITION BY p.probe_id
       |        ORDER BY ${duckDot("pe", "embedding")} / sqrt(pn2 * n2) DESC, t.vec_id) AS rn
       |    FROM tagged t, probes p WHERE t.vec_id <> p.probe_id) t
       |  WHERE rn <= 3
       |), hits AS (
       |  SELECT e.probe_id,
       |    CAST(sum(CASE WHEN s.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS hits
       |  FROM exact e LEFT JOIN served s
       |    ON s.probe_id = e.probe_id AND s.vec_id = e.vec_id
       |  GROUP BY e.probe_id
       |)
       |SELECT probe_id, hits, CAST(hits * 1000 // 3 AS BIGINT) AS recall_milli
       |FROM hits ORDER BY probe_id""".stripMargin

  private def duckDot(a: String, b: String): String = Similarity.duckDotSql(a, b)

  /** One unrolled Lloyd iteration in DuckDB SQL: score against c`t`,
    * argmax-assign, per-(cell, dim) ordered-fold mean, rebuild c`t+1`. */
  private def iterSql(t: Int): String =
    s""", s$t AS MATERIALIZED (
       |  SELECT e.vec_id, e.embedding, e.n2, c.cid,
       |    ${duckDot("e.embedding", "c.ce")} / sqrt(e.n2 * c.cn2) AS ccos
       |  FROM emb e, c$t c
       |), a$t AS MATERIALIZED (
       |  SELECT vec_id, embedding, n2, cid AS cell FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) AS crn
       |    FROM s$t) t WHERE crn = 1
       |), d$t AS MATERIALIZED (
       |  SELECT cell, dim,
       |    CAST(list_reduce(list(embedding[dim]::DOUBLE ORDER BY vec_id), (acc, x) -> acc + x) / count(*) AS REAL) AS cv
       |  FROM a$t, (SELECT unnest(range(1, ${Dim + 1})) AS dim) dims
       |  GROUP BY cell, dim
       |), c${t + 1} AS MATERIALIZED (
       |  SELECT cid, ce, ${duckDot("ce", "ce")} AS cn2 FROM (
       |    SELECT cell AS cid, list(cv ORDER BY dim) AS ce FROM d$t GROUP BY cell) t
       |)""".stripMargin

  /** Name of the final trained-centroid CTE inside [[trainedCtes]] —
    * q92's residual chain joins it to re-derive each vector's coarse
    * centroid. */
  private[operators] def finalCentroidCte: String = s"c$Iters"

  /** Shared oracle CTE chain: seed → unrolled Lloyd rounds → final scores
    * (`sf`) → trained cell assignment (`tagged`), plus the normed `emb`
    * view. Used by q40 (ANN serve), q75 (semantic dedup) and q92
    * (IVF-PQ, which appends its own product-quantizer chain). */
  private[operators] def trainedCtes: String =
    s"""WITH emb AS MATERIALIZED (
       |  SELECT vec_id, embedding, ${duckDot("embedding", "embedding")} AS n2 FROM embeddings
       |), c0 AS MATERIALIZED (
       |  SELECT vec_id AS cid, embedding AS ce, n2 AS cn2 FROM emb WHERE vec_id < $K
       |)${(0 until Iters).map(iterSql).mkString}, sf AS MATERIALIZED (
       |  SELECT e.vec_id, e.embedding, e.n2, c.cid,
       |    ${duckDot("e.embedding", "c.ce")} / sqrt(e.n2 * c.cn2) AS ccos
       |  FROM emb e, c$Iters c
       |), tagged AS MATERIALIZED (
       |  SELECT vec_id, embedding, n2, cid AS cell FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) AS crn
       |    FROM sf) t WHERE crn = 1
       |)""".stripMargin

  def q40Sql: String =
    s"""$trainedCtes, probes AS (
       |  SELECT vec_id AS probe_id, embedding AS pe, n2 AS pn2
       |  FROM tagged WHERE vec_id >= $ProbeFrom AND vec_id < ${ProbeFrom + NProbes}
       |), pcells AS (
       |  SELECT vec_id AS probe_id, cid AS cell FROM (
       |    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) AS crn
       |    FROM sf WHERE vec_id >= $ProbeFrom AND vec_id < ${ProbeFrom + NProbes}) t
       |  WHERE crn <= $NProbeCells
       |), cand AS (
       |  SELECT pc.probe_id, t.cell, t.vec_id,
       |    ${duckDot("pe", "embedding")} / sqrt(pn2 * n2) AS cosine
       |  FROM tagged t
       |  JOIN pcells pc ON t.cell = pc.cell
       |  JOIN probes p ON p.probe_id = pc.probe_id AND t.vec_id <> p.probe_id
       |), ranked AS (
       |  SELECT probe_id, cell, vec_id, cosine,
       |    CAST(row_number() OVER (PARTITION BY probe_id ORDER BY cosine DESC, vec_id) AS INT) AS rn
       |  FROM cand
       |)
       |SELECT probe_id, cell, vec_id, cosine, rn FROM ranked
       |WHERE rn <= 3 ORDER BY probe_id, rn""".stripMargin

  // ---------------------------------------------------------------- q75

  private[operators] val SemThreshold = 0.4

  /** Semantic dedup (SemDeDup, Abbas et al. 2023): cluster with the
    * trained coarse quantizer, score cosine ONLY within a cell, and drop
    * every vector that has a more-canonical (lower-id) cell-mate above
    * the similarity threshold — the embedding-space twin of the q19/q20
    * keep-min rule, catching paraphrases and re-encodings that share no
    * n-grams. Output is the full per-vector decision table (vec_id,
    * cell, keep) a curation gate consumes.
    *
    * Scale shape: the quadratic term is confined within cells and runs
    * through the SAME guarded pairing as every LSH family member
    * ([[Dedup.guardedBandPairs]] with cell-as-band-key — oversized cells
    * hub-link instead of exploding; the oracle mirrors the guard exactly,
    * like q46). SemDeDup at production scale grows K with the corpus
    * (√N cells), which shrinks cells — the guard is the backstop, not
    * the plan. Training amortizes across q40/q75 the way a persisted
    * [[IvfIndex]] would. */
  def q75SemanticDedup(s: SparkSession, d: String): DataFrame = {
    val (emb, trained) = train(s, d)
    val tagged = assignTo(emb, trained)
    val bands = tagged.select(col("vec_id").as("doc_id"),
      lit(0).as("band"), col("cell").cast("string").as("key"))
    val dup = Dedup.guardedBandPairs(bands)
      .join(emb.select(col("vec_id"), col("embedding").as("ea"), col("n2").as("na")),
        col("doc_a") === col("vec_id")).drop("vec_id")
      .join(emb.select(col("vec_id"), col("embedding").as("eb"), col("n2").as("nb")),
        col("doc_b") === col("vec_id")).drop("vec_id")
      .filter(Vectors.dot(col("ea"), col("eb")) / sqrt(col("na") * col("nb"))
        >= SemThreshold)
      .select(col("doc_b").as("vec_id")).distinct()
    tagged
      .join(dup.withColumn("dropped", lit(1)), Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell"),
        when(col("dropped").isNull, 1).otherwise(0).cast("int").as("keep"))
      .orderBy(col("vec_id"))
  }

  def q75Sql: String =
    s"""$trainedCtes, sized AS (
       |  SELECT cell, count(*) AS bsize, min(vec_id) AS hub
       |  FROM tagged GROUP BY cell
       |), tg AS (
       |  SELECT t.vec_id, t.cell, s.bsize, s.hub
       |  FROM tagged t JOIN sized s USING (cell)
       |), cand AS (
       |  SELECT DISTINCT vec_a, vec_b FROM (
       |    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
       |    FROM tg a JOIN tg b
       |      ON a.cell = b.cell AND a.vec_id < b.vec_id
       |    WHERE a.bsize <= ${Dedup.HotBucketCap}
       |    UNION ALL
       |    SELECT hub AS vec_a, vec_id AS vec_b
       |    FROM tg WHERE bsize > ${Dedup.HotBucketCap} AND vec_id <> hub
       |  ) u
       |), dup AS (
       |  SELECT DISTINCT c.vec_b AS vec_id FROM cand c
       |  JOIN emb ea ON ea.vec_id = c.vec_a
       |  JOIN emb eb ON eb.vec_id = c.vec_b
       |  WHERE ${duckDot("ea.embedding", "eb.embedding")} / sqrt(ea.n2 * eb.n2) >= $SemThreshold
       |)
       |SELECT t.vec_id, t.cell,
       |  CAST(CASE WHEN d.vec_id IS NULL THEN 1 ELSE 0 END AS INT) AS keep
       |FROM tagged t LEFT JOIN dup d USING (vec_id)
       |ORDER BY t.vec_id""".stripMargin
}

/** Train-once / serve-many IVF — the deployment shape q40's inline
  * training stands in for. [[build]] runs the identical deterministic
  * training and PUBLISHES the centroid table and the cell assignment as
  * [[graft.streaming.StateDir]] tables (the persisted index); [[query]]
  * serves ANN lookups purely from those tables — no training stage, no
  * embedding-table scan, bit-identical results to the inline q40
  * (IvfIndexSpec pins both). On a cluster the two state tables are the
  * IVF index files: rebuilt on retrain, read by every query. */
final class IvfIndex(val spark: SparkSession,
    val state: graft.streaming.StateDir) extends AnnIndex with RecallEvaluable {
  import IvfIndex._

  protected def prefix: String = "ivf"

  /** Warm rebuilds snapshot the previous centroids and seed Lloyd from
    * them (geometry validated by [[Ivf.warmSeed]]; cold fallback). */
  override protected def warmStartTables: Seq[(String, org.apache.spark.sql.types.StructType)] =
    Seq(CentroidsTable -> CentroidsSchema)

  protected def publishTables(d: String,
      warm: Map[String, org.apache.spark.sql.DataFrame]): Unit = {
    val seed = warm.get(CentroidsTable).flatMap(Ivf.warmSeed)
    val (emb, trained) =
      if (seed.isDefined) Ivf.train(spark, d, seed, Ivf.WarmIters)
      else Ivf.train(spark, d)
    try {
      state.write(CentroidsTable, trained)
      state.write(AssignTable, Ivf.assignTo(emb, trained))
    } finally emb.unpersist() // cache hygiene: once the index tables are
                              // published, nothing build persisted survives
  }

  /** Incremental maintenance — the live-index path between retrains:
    * assign a batch of NEW vectors (vec_id, embedding) to the EXISTING
    * trained centroids and APPEND them to the persisted assignment (a
    * [[graft.streaming.StateDir]] delta — O(batch) write I/O, compaction
    * folds the chain on the StateDir cadence). No retraining happens:
    * the quantizer stays fixed until the owner rebuilds, the standard
    * IVF deployment contract (cell balance degrades slowly as the
    * distribution drifts; [[graft.streaming.DriftStream]] is the monitor
    * that tells you when to retrain). The batch_id column is ALWAYS
    * written (null for batch callers): StateDir compaction folds the
    * chain with the INCOMING delta's schema, so an untagged append that
    * lands on a compaction boundary would fold the chain without
    * batch_id and silently drop the replay-guard tags. Serving reads
    * project the tag away regardless. */
  protected def appendDeltas(newEmb: org.apache.spark.sql.DataFrame,
      batchId: Option[Long], tag: org.apache.spark.sql.Column): Unit =
    if (tableFresh(AssignTable, AssignSchema, batchId)) {
      val trained = state.read(CentroidsTable, CentroidsSchema)
      val emb = newEmb.select(
        org.apache.spark.sql.functions.col("vec_id"),
        org.apache.spark.sql.functions.col("embedding"),
        graft.functions.Vectors.dot(
          org.apache.spark.sql.functions.col("embedding"),
          org.apache.spark.sql.functions.col("embedding")).as("n2"))
      state.append(AssignTable,
        Ivf.assignTo(emb, trained).withColumn("batch_id", tag))
    }

  /** q40-shaped ANN over the persisted index: top-3 per probe from the
    * probe's nprobe nearest cells. */
  protected def serveTables(probeFrom: Long, nProbes: Long): DataFrame =
    Ivf.serve(
      state.read(AssignTable, AssignSchema),
      state.read(CentroidsTable, CentroidsSchema),
      probeFrom, nProbes)

  /** [[Ivf.serveWhere]] over the persisted tables — the arbitrary-probe
    * form of `query` (q99's served hybrid probes a strided id set);
    * same epoch refusal as the trait's range form. */
  def queryWhere(probePred: org.apache.spark.sql.Column,
      topK: Int): DataFrame = {
    require(isBuilt,
      "ivf index not built (or a rebuild was torn) — build() required")
    Ivf.serveWhere(
      state.read(AssignTable, AssignSchema),
      state.read(CentroidsTable, CentroidsSchema),
      probePred, topK)
  }

  /** [[RecallEvaluable]]: exact truth comes from the same assignment
    * table serving scans; this family ranks by cosine. */
  def floatBase: DataFrame =
    state.read(AssignTable, AssignSchema)
      .select(org.apache.spark.sql.functions.col("vec_id"),
        org.apache.spark.sql.functions.col("embedding"),
        org.apache.spark.sql.functions.col("n2"))
  def metric: Recall.Metric = Recall.CosineDesc
}

object IvfIndex {
  import org.apache.spark.sql.types._

  val CentroidsTable = "ivf_centroids"
  val AssignTable = "ivf_assign"

  val CentroidsSchema: StructType = StructType(Seq(
    StructField("cid", LongType),
    StructField("ce", ArrayType(FloatType, containsNull = true)),
    StructField("cn2", DoubleType)))

  val AssignSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType, containsNull = true)),
    StructField("n2", DoubleType),
    StructField("cell", LongType)))

  /** [[AssignSchema]] plus the ingest batch tag — the replay-guard read
    * shape ([[graft.streaming.IndexStream]]); rows from untagged
    * (build-time / batch addBatch) versions surface a null tag. */
  val TaggedAssignSchema: StructType =
    StructType(AssignSchema.fields :+ StructField("batch_id", LongType))
}
