package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Vectors

/** IVF-PQ ANN (q92) — product quantization over the trained IVF cells:
  * the 100 TB ANN MEMORY path. Reference scope: the reference ships no
  * ANN at all (its nearest analog is the hash-equality file matcher,
  * `StreamingApp.scala:415-447`); this family is north-star scope, and
  * PQ is its memory leg the way [[Ivf]] is its compute leg.
  *
  * The shape (Jégou, Douze, Schmid, "Product Quantization for Nearest
  * Neighbor Search", TPAMI 2011 — the IVFADC system, §III's residual
  * formulation): quantize each vector's RESIDUAL against its coarse
  * centroid, `r(y) = y − c(cell(y))` — residuals have far less energy
  * than raw vectors, so the same codebook budget spends its centroids on
  * a tighter distribution (recall at fixed M/Ks rises; PqSpec pins the
  * lift). Split each residual into [[graft.Dials.PqSubspaces]]
  * sub-vectors; k-means each subspace independently into
  * [[graft.Dials.PqCodebook]] centroids; a vector's CODE is its M argmin
  * centroid ids — M small ints instead of dim floats (fixture: 16×4-bit
  * codes = 8 B/vector vs 256 float bytes = 32× smaller; the production
  * 8×8-bit shape is the same 8 B, see Dials). Serving never touches the
  * float
  * corpus: a probe precomputes, PER PROBED CELL, an M×Ks lookup table of
  * per-subspace squared-L2 terms between its own residual w.r.t. that
  * cell's centroid and the codebooks, and each candidate's asymmetric
  * distance (ADC) is M table lookups summed — here a broadcast-join +
  * fixed 8-term sum over the code table (the LUT is nprobe×M×Ks rows
  * per probe, still trivially broadcastable).
  *
  * Candidates come from the SAME trained coarse quantizer as q40
  * ([[Ivf.train]]), nprobe nearest cells per probe — so the expensive
  * per-probe work is |3N/K| codes, not N, and the window top-k is
  * cell-bounded exactly like q40's. What PQ adds to q40 is the memory
  * story: at 1e9+ vectors the assignment table's float embeddings
  * dominate storage and serve I/O; the PQ code table is M bytes/vector
  * (8 GB where floats are 256 GB), small enough to pin hot.
  *
  * Bit-exactness contract (oracle = the same computation unrolled in
  * DuckDB SQL):
  *  - residuals are `graft_vsub` (one float32 subtraction per element,
  *    codegen'd) ↔ DuckDB `CAST(embedding[i] - ce[i] AS REAL)` — both
  *    round the exact difference to float once, so the arrays are
  *    bit-identical;
  *  - sub-vector slices are literal `slice` calls (1-based, SubDim
  *    long) ↔ DuckDB `remb[a:b]` — no HOF in the encode path;
  *  - every dot product is `graft_dot` (double left-fold from 0.0) ↔
  *    `list_reduce(list_transform(...))` (left-fold from the first
  *    element; IEEE `0.0 + x == x` makes them identical);
  *  - per-subspace Lloyd means reuse q40's ordered-fold doctrine
  *    (collect_list sorted by vec_id, left-fold, one FLOAT rounding)
  *    — the one allowlisted HOF site, grouped rows only;
  *  - squared L2 is the fixed expression `(sn2 - 2·dot) + cn2` on both
  *    engines (left-assoc in both parsers);
  *  - argmin ties break on the smaller centroid id (`min_by` struct
  *    order ↔ `ORDER BY d2, cid`);
  *  - the ADC sum is NOT a float aggregation: the M per-subspace terms
  *    pivot to fixed columns (`max(when)` over singletons) and sum as
  *    the literal expression t0+t1+...+t7 — the same left-to-right
  *    order on both engines, so no summation-order divergence exists.
  */
object Pq {

  private val M = graft.Dials.PqSubspaces
  private val Dim = graft.Dials.EmbeddingDim
  private val SubDim = graft.Dials.EmbeddingDim / M
  private val Ks = graft.Dials.PqCodebook
  private val Iters = 2 // deterministic Lloyd rounds, same as the coarse quantizer
  private val NProbeCells = graft.Dials.IvfNProbeCells

  require(graft.Dials.EmbeddingDim % M == 0,
    s"PqSubspaces ($M) must divide EmbeddingDim (${graft.Dials.EmbeddingDim})")

  /** (keys..., m, sv, sn2): `vec` exploded into M sub-vectors per row.
    * The slice list is a literal array of M codegen'd `slice` calls —
    * posexplode_outer keeps InferFiltersFromGenerate from re-deriving
    * the computed array into the scan filters. */
  private[graft] def subVectorsKeyed(df: DataFrame, keys: Seq[String],
      vec: String): DataFrame =
    df.select(keys.map(col) :+ posexplode_outer(array((0 until M).map { m =>
        slice(col(vec), m * SubDim + 1, SubDim)
      }: _*)): _*)
      .select(keys.map(col) :+ col("pos").as("m") :+ col("col").as("sv"): _*)
      .withColumn("sn2", Vectors.dot(col("sv"), col("sv")))

  /** (vec_id, m, sv, sn2): per-vector sub-vectors of a raw embedding —
    * the non-residual form (kept for [[PqSpec]]'s structural gates and
    * any caller quantizing an un-centered space). */
  private[graft] def subVectors(emb: DataFrame): DataFrame =
    subVectorsKeyed(emb, Seq("vec_id"), "embedding")

  /** (vec_id, m, sv, sn2): each assigned vector's RESIDUAL against its
    * own cell's coarse centroid, exploded into sub-vectors — the IVFADC
    * encode input. One broadcast join (K centroid rows) + one codegen'd
    * float subtraction per element; no HOF. */
  private[graft] def residualSubVectors(tagged: DataFrame,
      trained: DataFrame): DataFrame =
    subVectorsKeyed(
      tagged.join(broadcast(trained.select(col("cid").as("cell"), col("ce"))),
          Seq("cell"))
        .select(col("vec_id"), Vectors.sub(col("embedding"), col("ce")).as("remb")),
      Seq("vec_id"), "remb")

  /** Nearest-codebook-entry assignment for every (vector, subspace) —
    * same map-side `min_by` collapse as [[Ivf.assignTo]] (the broadcast
    * join preserves scan partitioning, so the Ks scored rows per
    * (vec_id, m) combine before any shuffle). Squared L2, ties to the
    * smaller cid. */
  private[graft] def assignSub(sub: DataFrame, cb: DataFrame): DataFrame =
    sub.join(broadcast(cb), Seq("m"))
      .withColumn("d2",
        col("sn2") - lit(2.0) * Vectors.dot(col("sv"), col("ce")) + col("cn2"))
      .groupBy(col("vec_id"), col("m"))
      .agg(min_by(
        struct(col("sv"), col("sn2"), col("cid").as("code")),
        struct(col("d2"), col("cid"))).as("best"))
      .select(col("vec_id"), col("m"), col("best.sv").as("sv"),
        col("best.sn2").as("sn2"), col("best.code").as("code"))

  /** One per-subspace Lloyd update — [[Ivf.centroidsOf]] with (m, code)
    * as the group key and SubDim-long arrays: ordered fold in vec_id
    * order, one FLOAT rounding per dimension. Grouped rows only (the
    * allowlisted HOF site; see EntrySmokeSpec). */
  private def codebooksOf(assigned: DataFrame): DataFrame =
    assigned
      .groupBy(col("m"), col("code"))
      .agg(count(lit(1)).as("cnt"),
        expr("aggregate(array_sort(collect_list(struct(vec_id, sv))), " +
          s"array_repeat(CAST(0 AS DOUBLE), $SubDim), " +
          "(acc, x) -> zip_with(acc, x.sv, (a, e) -> a + double(e)))")
          .as("sums"))
      .select(col("m"), col("code").as("cid"),
        expr("transform(sums, s -> CAST(s / cnt AS FLOAT))").as("ce"))
      .withColumn("cn2", Vectors.dot(col("ce"), col("ce")))

  /** Codebook training: seed = the first Ks vectors' sub-vectors (one
    * seed table serves all M subspaces — subspace is a column, so the M
    * independent k-means runs are ONE job per round, not M), or `seed0`
    * — a previous generation's codebook table on [[PqIndex]]'s warm
    * retrain path. */
  /** Lloyd rounds a WARM-seeded codebook build runs — [[Ivf.WarmIters]]'s
    * rationale at the subspace level. */
  private[operators] val WarmIters = 1

  private[graft] def trainCodebooks(sub: DataFrame,
      seed0: Option[DataFrame] = None,
      rounds: Int = Iters): DataFrame = {
    val seed = seed0.getOrElse(sub.filter(col("vec_id") < Ks)
      .select(col("m"), col("vec_id").as("cid"), col("sv").as("ce"),
        col("sn2").as("cn2")))
    (0 until rounds).foldLeft(seed) { (c, _) => codebooksOf(assignSub(sub, c)) }
  }

  /** Validate a previous generation's (localized) codebook snapshot as a
    * warm-start seed — [[Ivf.warmSeed]]'s contract for the subspace
    * geometry: non-empty, at most M·Ks rows, every entry exactly
    * [[SubDim]] floats. None → cold seed. */
  private[graft] def warmSeed(df: DataFrame): Option[DataFrame] = {
    val rows = df.collect()
    val ok = rows.nonEmpty && rows.length <= M * Ks && rows.forall { r =>
      val ce = r.getAs[scala.collection.Seq[Float]]("ce")
      ce != null && ce.length == SubDim
    }
    if (ok) Some(df) else None
  }

  // ---------------------------------------------------------------- q92

  private val R = graft.Dials.PqRerank

  /** IVF-PQ ANN with exact re-rank (IVFADC+R): q40's probes and coarse
    * cells; PQ-ADC scores every candidate CODE (no float access), keeps
    * the R best per probe, and only that shortlist fetches float vectors
    * for an exact squared-L2 re-rank to top-3. Output (probe_id,
    * vec_id, adc, l2, rn) — both stages' scores in the open.
    *
    * Why the re-rank stage is load-bearing: raw ADC systematically
    * under-scores badly-quantized vectors (it measures probe→centroid,
    * dropping the ‖x−c(x)‖² residual), and on a weakly-clustered corpus
    * the top-3 by ADC alone is noise (measured 0.03 recall@3 on the
    * fixture — the synthetic embeddings are near-random unit vectors,
    * PQ's hardest case). The shortlist absorbs that noise: recall@3
    * jumps to 0.67 at R=64 while the float fetch stays R rows per
    * probe. [[PqSpec]] pins the floor. */
  def q92IvfPqAnn(s: SparkSession, d: String): DataFrame = {
    val (emb, trained) = Ivf.train(s, d)
    val tagged = StagedCache.stage(d, "q92_tagged", Ivf.assignTo(emb, trained))
    val sub = StagedCache.stage(d, "q92_rsub",
      residualSubVectors(tagged, trained))
      // staged: scanned per Lloyd round + encode
    // Stage the trained codebook (M·Ks = 256 rows): `codes` and the serve
    // LUT both reference it, and un-staged each reference re-expands (and
    // re-executes) the two subspace-Lloyd rounds over `sub` — the same
    // duplication the staged coarse centroids close in [[Ivf.train]].
    val cb = StagedCache.stage(d, "q92_cb", trainCodebooks(sub))
    val codes = assignSub(sub, cb).select(col("vec_id"), col("m"), col("code"))
    serve(tagged, trained, cb, codes, Ivf.ProbeFrom, Ivf.NProbes)
  }

  /** The q92 serving plan over EXISTING coarse-assignment, coarse-centroid,
    * codebook and code tables: coarse candidates from the probe's nprobe
    * nearest cells, broadcast ADC lookup table, pivoted M-term ADC sum,
    * R-row shortlist, exact float re-rank to top-3. Shared by the inline
    * q92 (which trains everything first) and the persisted [[PqIndex]]
    * (which reads all four tables from a StateDir) so both are
    * bit-identical; probe residuals are re-derived from the probe rows'
    * floats and the centroid table — the identical literal
    * `graft_vsub`/`slice`/`graft_dot` chain over the identical arrays,
    * and only nProbes·nprobe rows of it. */
  private[operators] def serve(tagged: DataFrame, trained: DataFrame,
      cb: DataFrame, codes: DataFrame, probeFrom: Long, nProbes: Long): DataFrame =
    serveWhere(tagged, trained, cb, codes,
      col("vec_id") >= probeFrom && col("vec_id") < probeFrom + nProbes)

  /** [[serve]] with an arbitrary probe predicate — the same plan
    * expression-for-expression (the range form delegates, so the
    * q92/q93 pins ride this body); [[graft.streaming.EvalStream]]'s
    * canary probes are a strided id set. */
  private[graft] def serveWhere(tagged: DataFrame, trained: DataFrame,
      cb: DataFrame, codes: DataFrame,
      probePred: org.apache.spark.sql.Column, topK: Int = 3): DataFrame = {
    val probeRange = probePred
    // coarse candidates: each probe's nprobe nearest cells, exactly q40
    val pcells = Ivf.rankCells(tagged.filter(probeRange), trained, NProbeCells)
      .select(col("vec_id").as("probe_id"), col("cell"))
    val cand = tagged.select(col("vec_id"), col("cell"))
      .join(broadcast(pcells), Seq("cell"))
      .filter(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("cell"), col("vec_id"))

    // probe ADC lookup table, PER PROBED CELL: the probe's residual
    // w.r.t. that cell's centroid, sub-sliced, scored against the
    // codebooks — (probe, cell, subspace, code) → squared-L2 term
    // (pn2m - 2·dot(pv, ce)) + cn2. nprobe·M·Ks rows per probe, broadcast.
    val pres = tagged.filter(probeRange)
      .select(col("vec_id").as("probe_id"), col("embedding"))
      .join(broadcast(pcells), Seq("probe_id"))
      .join(broadcast(trained.select(col("cid").as("cell"), col("ce"))),
        Seq("cell"))
      .select(col("probe_id"), col("cell"),
        Vectors.sub(col("embedding"), col("ce")).as("remb"))
    val lut = subVectorsKeyed(pres, Seq("probe_id", "cell"), "remb")
      .select(col("probe_id"), col("cell"), col("m"),
        col("sv").as("pv"), col("sn2").as("pn2m"))
      .join(broadcast(cb), Seq("m"))
      .select(col("probe_id"), col("cell"), col("m"), col("cid").as("code"),
        (col("pn2m") - lit(2.0) * Vectors.dot(col("pv"), col("ce")) + col("cn2"))
          .as("t"))

    // ADC: M lookups per candidate against ITS cell's probe LUT, pivoted
    // to fixed columns so the sum is the literal left-to-right expression
    // t0+...+t{M-1} (map-side partial agg collapses the M rows per
    // (probe, candidate); a candidate lives in exactly one cell, so the
    // cell key adds no fan-out)
    val pivoted = cand.join(codes, Seq("vec_id"))
      .join(broadcast(lut), Seq("probe_id", "cell", "m", "code"))
      .groupBy(col("probe_id"), col("vec_id"))
      .agg(max(when(col("m") === 0, col("t"))).as("t0"),
        (1 until M).map(j =>
          max(when(col("m") === j, col("t"))).as(s"t$j")): _*)
    val adcExpr = (1 until M).foldLeft(col("t0")) { (acc, j) => acc + col(s"t$j") }

    // shortlist: R(N) best codes per probe — the only rows that ever
    // read a float vector again. R is the ADAPTIVE dial computed
    // in-plan from the corpus size (Dials.pqRerankFor's rule as a
    // one-row broadcast scalar): ⌈N/32.0⌉ is exact in double (power-of-
    // two divisor), so the dial itself can never hash-diverge.
    val rdial = tagged
      .agg(greatest(lit(R.toLong),
        ceil(count(lit(1)) / lit(graft.Dials.PqRerankDiv.toDouble)))
        .as("rdial"))
    val wAdc = Window.partitionBy(col("probe_id"))
      .orderBy(col("adc").asc, col("vec_id"))
    val shortlist = pivoted
      .withColumn("adc", adcExpr)
      .withColumn("arn", row_number().over(wAdc))
      .crossJoin(broadcast(rdial))
      .filter(col("arn") <= col("rdial"))
      .select(col("probe_id"), col("vec_id"), col("adc"))

    // exact re-rank: squared L2 over the R-row float gather per probe
    val pfloats = tagged.filter(probeRange)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pe"),
        col("n2").as("pn2"))
    val wL2 = Window.partitionBy(col("probe_id"))
      .orderBy(col("l2").asc, col("vec_id"))
    shortlist
      .join(tagged.select(col("vec_id"), col("embedding"), col("n2")), Seq("vec_id"))
      .join(broadcast(pfloats), Seq("probe_id"))
      .withColumn("l2",
        col("pn2") - lit(2.0) * Vectors.dot(col("pe"), col("embedding")) + col("n2"))
      .withColumn("rn", row_number().over(wL2))
      .filter(col("rn") <= topK)
      .select(col("probe_id"), col("vec_id"), col("adc"), col("l2"), col("rn"))
      .orderBy(col("probe_id"), col("rn"))
  }

  // ---------------------------------------------------------------- q93

  /** Per-(session, corpus) persisted-index memo backing [[q93ServedPqAnn]]
    * — the same [[ServedMemo]] machinery as q86's, over [[PqIndex]]. */
  private val pqMemo = new ServedMemo[PqIndex](
    maxEntries = 8,
    mk = (s, state) => new PqIndex(s, state),
    built = _.isBuilt,
    build = _.build(_))

  /** Served IVF-PQ ANN — q92's exact contract (same probes, same coarse
    * cells, same codes, same top-3, same oracle) answered from a
    * PERSISTED [[PqIndex]]: coarse quantizer + codebooks train once per
    * session+corpus as setup; the declared plan is the SERVE path only —
    * four state-table scans, probe broadcast, ADC over the code table,
    * R-row float re-rank. q93 is to q92 what q86 is to q40: the
    * production read path priced in the open while the inline row keeps
    * pricing build-AND-serve. [[PqIndexSpec]] pins serve ≡ inline-q92
    * bit-identically and that the serving plan carries no Lloyd
    * subtree. */
  def q93ServedPqAnn(s: SparkSession, d: String): DataFrame =
    pqMemo.get(s, d, "embeddings.parquet").query(Ivf.ProbeFrom, Ivf.NProbes)

  /** Same answer, same oracle: the index serves q92's results verbatim. */
  def q93Sql: String = q92Sql

  // ------------------------------------------------------------- oracle

  private def duckDot(a: String, b: String): String = Similarity.duckDotSql(a, b)

  private def msTable: String = s"(SELECT unnest(range(0, $M)) AS m) ms"

  /** One unrolled per-subspace Lloyd round: score against pc`t`,
    * argmin-assign per (vec_id, m), ordered-fold mean per
    * (m, code, dim), rebuild pc`t+1`. The coarse chain's twin
    * ([[Ivf.iterSql]]) with the subspace as a data column. */
  private def pqIterSql(t: Int): String =
    s""", pqs$t AS MATERIALIZED (
       |  SELECT e.vec_id, e.m, e.sv, e.sn2, c.cid,
       |    e.sn2 - 2 * ${duckDot("e.sv", "c.ce")} + c.cn2 AS d2
       |  FROM psub e JOIN pc$t c ON e.m = c.m
       |), pqa$t AS MATERIALIZED (
       |  SELECT vec_id, m, sv, sn2, cid AS code FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id, m ORDER BY d2, cid) AS crn
       |    FROM pqs$t) t WHERE crn = 1
       |), pqd$t AS MATERIALIZED (
       |  SELECT m, code, dim,
       |    CAST(list_reduce(list(sv[dim]::DOUBLE ORDER BY vec_id), (acc, x) -> acc + x) / count(*) AS REAL) AS cv
       |  FROM pqa$t, (SELECT unnest(range(1, ${SubDim + 1})) AS dim) dims
       |  GROUP BY m, code, dim
       |), pc${t + 1} AS MATERIALIZED (
       |  SELECT m, cid, ce, ${duckDot("ce", "ce")} AS cn2 FROM (
       |    SELECT m, code AS cid, list(cv ORDER BY dim) AS ce FROM pqd$t GROUP BY m, code) t
       |)""".stripMargin

  def q92Sql: String = {
    val resid = s"list_transform(range(1, ${Dim + 1}), " +
      "i -> CAST(t.embedding[i] - c.ce[i] AS REAL))"
    val slice = s"remb[m*$SubDim+1 : m*$SubDim+$SubDim]"
    val pivots = (0 until M).map(j =>
      s"max(CASE WHEN k.m = $j THEN l.t END) AS t$j").mkString(", ")
    val adcSum = (0 until M).map(j => s"t$j").mkString(" + ")
    s"""${Ivf.trainedCtes}, rsub AS MATERIALIZED (
       |  SELECT t.vec_id, $resid AS remb
       |  FROM tagged t JOIN ${Ivf.finalCentroidCte} c ON t.cell = c.cid
       |), psub AS MATERIALIZED (
       |  SELECT vec_id, m, sv, ${duckDot("sv", "sv")} AS sn2 FROM (
       |    SELECT vec_id, m, $slice AS sv FROM rsub, $msTable) t
       |), pc0 AS MATERIALIZED (
       |  SELECT m, vec_id AS cid, sv AS ce, sn2 AS cn2 FROM psub WHERE vec_id < $Ks
       |)${(0 until Iters).map(pqIterSql).mkString}, pqsf AS MATERIALIZED (
       |  SELECT e.vec_id, e.m, c.cid,
       |    e.sn2 - 2 * ${duckDot("e.sv", "c.ce")} + c.cn2 AS d2
       |  FROM psub e JOIN pc$Iters c ON e.m = c.m
       |), codes AS MATERIALIZED (
       |  SELECT vec_id, m, cid AS code FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id, m ORDER BY d2, cid) AS crn
       |    FROM pqsf) t WHERE crn = 1
       |), pcells AS MATERIALIZED (
       |  SELECT vec_id AS probe_id, cid AS cell FROM (
       |    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) AS crn
       |    FROM sf WHERE vec_id >= ${Ivf.ProbeFrom} AND vec_id < ${Ivf.ProbeFrom + Ivf.NProbes}) t
       |  WHERE crn <= $NProbeCells
       |), cand AS MATERIALIZED (
       |  SELECT pc.probe_id, t.cell, t.vec_id
       |  FROM tagged t JOIN pcells pc ON t.cell = pc.cell
       |  WHERE t.vec_id <> pc.probe_id
       |), prr AS MATERIALIZED (
       |  SELECT pc.probe_id, pc.cell, $resid AS remb
       |  FROM pcells pc
       |  JOIN tagged t ON t.vec_id = pc.probe_id
       |  JOIN ${Ivf.finalCentroidCte} c ON c.cid = pc.cell
       |), prsub AS MATERIALIZED (
       |  SELECT probe_id, cell, m, sv, ${duckDot("sv", "sv")} AS pn2m FROM (
       |    SELECT probe_id, cell, m, $slice AS sv FROM prr, $msTable) t
       |), lut AS MATERIALIZED (
       |  SELECT p.probe_id, p.cell, c.m, c.cid AS code,
       |    p.pn2m - 2 * ${duckDot("p.sv", "c.ce")} + c.cn2 AS t
       |  FROM prsub p JOIN pc$Iters c ON p.m = c.m
       |), sc AS MATERIALIZED (
       |  SELECT cd.probe_id, cd.vec_id,
       |    $pivots
       |  FROM cand cd
       |  JOIN codes k ON k.vec_id = cd.vec_id
       |  JOIN lut l ON l.probe_id = cd.probe_id AND l.cell = cd.cell AND l.m = k.m AND l.code = k.code
       |  GROUP BY cd.probe_id, cd.vec_id
       |), rd AS (
       |  SELECT greatest($R, CAST(ceil(count(*) / ${graft.Dials.PqRerankDiv}.0) AS BIGINT)) AS rdial
       |  FROM tagged
       |), shortlist AS MATERIALIZED (
       |  SELECT probe_id, vec_id, adc FROM (
       |    SELECT probe_id, vec_id, $adcSum AS adc,
       |      row_number() OVER (PARTITION BY probe_id ORDER BY $adcSum, vec_id) AS arn
       |    FROM sc) t WHERE arn <= (SELECT rdial FROM rd)
       |), rr AS MATERIALIZED (
       |  SELECT s.probe_id, s.vec_id, s.adc,
       |    p.n2 - 2 * ${duckDot("p.embedding", "e.embedding")} + e.n2 AS l2
       |  FROM shortlist s
       |  JOIN emb e ON e.vec_id = s.vec_id
       |  JOIN emb p ON p.vec_id = s.probe_id
       |), ranked AS MATERIALIZED (
       |  SELECT probe_id, vec_id, adc, l2,
       |    CAST(row_number() OVER (PARTITION BY probe_id ORDER BY l2, vec_id) AS INT) AS rn
       |  FROM rr
       |)
       |SELECT probe_id, vec_id, adc, l2, rn FROM ranked
       |WHERE rn <= 3 ORDER BY probe_id, rn""".stripMargin
  }
}

/** Train-once / serve-many IVF-PQ — [[IvfIndex]]'s shape with the PQ
  * memory leg persisted alongside: [[build]] runs q92's identical
  * deterministic training (coarse Lloyd + per-subspace codebooks) and
  * PUBLISHES four [[graft.streaming.StateDir]] tables — coarse
  * centroids, coarse assignment (candidate cells + the floats the
  * re-rank gathers), PQ codebooks, and the PQ code table (M small ints
  * per vector: the table a 1e9-vector deployment pins hot while the
  * float assignment stays cold/columnar — serving reads it only for the
  * R-row shortlist gather). [[query]] serves purely from those tables,
  * bit-identical to the inline q92 ([[PqIndexSpec]] pins both).
  *
  * The index owns its four table names (no sharing with a co-located
  * [[IvfIndex]]): the coarse tables are trained identically, but an
  * IvfIndex handle appending to a shared assignment table would leave
  * the code table behind — candidates without codes silently vanish
  * from the ADC stage. Distinct names make the pair impossible to
  * half-update. */
final class PqIndex(val spark: SparkSession,
    val state: graft.streaming.StateDir) extends AnnIndex with RecallEvaluable {
  import PqIndex._

  protected def prefix: String = "pq"

  /** Warm rebuilds seed BOTH trainers from the previous generation —
    * coarse Lloyd from the old centroids, subspace Lloyd from the old
    * codebooks (each independently geometry-validated, cold fallback). */
  override protected def warmStartTables: Seq[(String, org.apache.spark.sql.types.StructType)] =
    Seq(CentroidsTable -> CentroidsSchema, CodebooksTable -> CodebooksSchema)

  protected def publishTables(d: String,
      warm: Map[String, org.apache.spark.sql.DataFrame]): Unit = {
    val coarseSeed = warm.get(CentroidsTable).flatMap(Ivf.warmSeed)
    val (emb, trained) =
      if (coarseSeed.isDefined) Ivf.train(spark, d, coarseSeed, Ivf.WarmIters)
      else Ivf.train(spark, d)
    try {
      state.write(CentroidsTable, trained)
      state.write(AssignTable, Ivf.assignTo(emb, trained))
      // residuals come from the PUBLISHED assignment + centroid tables
      // (a re-read, not the training plan): codes are guaranteed
      // consistent with the exact tables serving reads
      val sub = Pq.residualSubVectors(
          state.read(AssignTable, IvfIndex.AssignSchema),
          state.read(CentroidsTable, CentroidsSchema))
        .persist() // scanned per codebook Lloyd round + the final encode
      try {
        val cbSeed = warm.get(CodebooksTable).flatMap(Pq.warmSeed)
        state.write(CodebooksTable,
          if (cbSeed.isDefined) Pq.trainCodebooks(sub, cbSeed, Pq.WarmIters)
          else Pq.trainCodebooks(sub))
        state.write(CodesTable,
          Pq.assignSub(sub, state.read(CodebooksTable, CodebooksSchema))
            .select(col("vec_id"), col("m"), col("code")))
      } finally { sub.unpersist(); () }
    } finally { emb.unpersist(); () } // cache hygiene: nothing build
                                      // persisted survives publication
  }

  /** Incremental maintenance — [[IvfIndex]]'s contract for the PQ pair:
    * assign NEW vectors (vec_id, embedding) to the EXISTING coarse
    * centroids AND encode them against the EXISTING codebooks, appending
    * BOTH deltas (assignment + codes) — the two tables move together, so
    * serving never sees a candidate without a code. No retraining:
    * quantizer and codebooks stay fixed until the owner rebuilds
    * ([[graft.streaming.DriftStream]] is the retrain monitor). The
    * appends are two separate atomic publishes, so a crash between them
    * leaves the batch torn — assignment landed, codes missing — which is
    * exactly what the [[AnnIndex]] per-table guards + batch ledger
    * absorb: the re-drive appends the codes half only, then commits.
    * [[graft.streaming.PqIndexStreamSpec]] pins the torn path
    * end-to-end. */
  protected def appendDeltas(newEmb: DataFrame, batchId: Option[Long],
      tag: org.apache.spark.sql.Column): Unit = {
    if (tableFresh(AssignTable, IvfIndex.AssignSchema, batchId)) {
      val trained = state.read(CentroidsTable, CentroidsSchema)
      val emb = newEmb.select(col("vec_id"), col("embedding"),
        Vectors.dot(col("embedding"), col("embedding")).as("n2"))
      state.append(AssignTable,
        Ivf.assignTo(emb, trained).withColumn("batch_id", tag))
    }
    if (tableFresh(CodesTable, CodesSchema, batchId)) {
      val trained = state.read(CentroidsTable, CentroidsSchema)
      val cb = state.read(CodebooksTable, CodebooksSchema)
      // re-derive the batch's cell assignment (deterministic — identical
      // to the assignment half's rows) so codes quantize the residual
      // against the same centroid serving will subtract
      val emb = newEmb.select(col("vec_id"), col("embedding"),
        Vectors.dot(col("embedding"), col("embedding")).as("n2"))
      state.append(CodesTable,
        Pq.assignSub(
            Pq.residualSubVectors(Ivf.assignTo(emb, trained), trained), cb)
          .select(col("vec_id"), col("m"), col("code"))
          .withColumn("batch_id", tag))
    }
  }

  /** q92-shaped ANN over the persisted index: ADC shortlist + exact
    * re-rank, top-3 per probe. */
  protected def serveTables(probeFrom: Long, nProbes: Long): DataFrame =
    Pq.serve(
      state.read(AssignTable, IvfIndex.AssignSchema),
      state.read(CentroidsTable, IvfIndex.CentroidsSchema),
      state.read(CodebooksTable, CodebooksSchema),
      state.read(CodesTable, CodesSchema),
      probeFrom, nProbes)

  /** [[Pq.serveWhere]] over the persisted tables — the arbitrary-probe
    * form of `query`; same epoch refusal as the trait's range form. */
  def queryWhere(probePred: org.apache.spark.sql.Column,
      topK: Int): DataFrame = {
    require(isBuilt,
      "pq index not built (or a rebuild was torn) — build() required")
    Pq.serveWhere(
      state.read(AssignTable, IvfIndex.AssignSchema),
      state.read(CentroidsTable, IvfIndex.CentroidsSchema),
      state.read(CodebooksTable, CodebooksSchema),
      state.read(CodesTable, CodesSchema),
      probePred, topK)
  }

  /** [[RecallEvaluable]]: exact truth from the assignment floats; this
    * family ranks (ADC and re-rank alike) by squared L2. */
  def floatBase: org.apache.spark.sql.DataFrame =
    state.read(AssignTable, IvfIndex.AssignSchema)
      .select(col("vec_id"), col("embedding"), col("n2"))
  def metric: Recall.Metric = Recall.L2Asc
}

object PqIndex {
  import org.apache.spark.sql.types._

  val CentroidsTable = "pq_centroids"
  val AssignTable = "pq_assign"
  val CodebooksTable = "pq_codebooks"
  val CodesTable = "pq_codes"

  /** Coarse tables share [[IvfIndex]]'s shapes. */
  val CentroidsSchema: StructType = IvfIndex.CentroidsSchema

  val CodebooksSchema: StructType = StructType(Seq(
    StructField("m", IntegerType),
    StructField("cid", LongType),
    StructField("ce", ArrayType(FloatType, containsNull = true)),
    StructField("cn2", DoubleType)))

  val CodesSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("m", IntegerType),
    StructField("code", LongType)))

  /** [[CodesSchema]] plus the ingest batch tag — the replay-guard read
    * shape; untagged (build-time) rows surface a null tag. */
  val TaggedCodesSchema: StructType =
    StructType(CodesSchema.fields :+ StructField("batch_id", LongType))
}
