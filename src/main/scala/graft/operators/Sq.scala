package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Vectors

/** SQ8 scalar-quantized ANN (q102) — the middle rung of the embedding
  * memory ladder the engine now ships end to end:
  *
  *   float32 (256 B/vec, exact)      → q21 brute / q40/q86 IVF
  *   SQ8     ( 64 B/vec, 8 bit/dim)  → q102 (this file)
  *   IVF-PQ  (  8 B/vec, 1 bit/dim)  → q92/q93
  *
  * North-star surface (the reference ships no vector search; nearest
  * analog is the substring matcher, `StreamingApp.scala:415-421`).
  * Formulation: per-dimension corpus min/max bounds, symmetric centered
  * codes (`graft_sq8` emits q−128 as a signed byte — see
  * [[graft.functions.Sq8Encode]] for why centering matters under a raw
  * integer-dot scorer), an integer-code brute shortlist of the R best
  * candidates per probe (`graft_doti` — order-free int64 sums, so the
  * shortlist is cross-engine exact with NO float-fold contract), and an
  * exact float cosine re-rank of only those R rows (the IVFADC+R shape
  * q92 uses, minus the coarse quantizer: SQ8's scan IS its index).
  *
  * Scale shape: the hot loop reads 64 B/vector codes — 4× less I/O than
  * the float scan of q21 at 4× the fidelity headroom of PQ; the probe
  * table broadcasts (10 rows), the code scan never shuffles (window
  * top-R partial-aggregates per probe... row_number over a broadcast-
  * keyed partition set of 10), and the float fetch is R rows per probe,
  * not a corpus scan. The dim-stats build is one posexplode + 64-group
  * aggregate, map-side combined; a production build persists codes +
  * bounds the way [[IvfIndex]] persists cells.
  *
  * Exactness: codes are deterministic (each step a correctly-rounded
  * IEEE double op in a pinned order, mirrored literally in the oracle);
  * iscore is an integer sum (order-free); the re-rank cosine rides
  * graft_dot's pinned left-fold. Measured recall@3 on the near-random
  * fixture corpus: 1.0 at R=64 (Sq8Spec pins 0.9 — above PQ's 0.867
  * ceiling at the same R, the 8×-memory fidelity trade in numbers). */
object Sq {

  private val Dim = graft.Dials.EmbeddingDim
  private val R = graft.Dials.SqRerank
  private val TopKOut = 3

  /** Per-dimension corpus bounds, pivoted to two Dim-length arrays on a
    * single broadcastable row. The struct sort keys on `dim` (distinct),
    * and the array-of-struct field extraction (`a.mn`) is a native
    * GetArrayStructFields — no interpreted HOF anywhere. */
  private[operators] def dimStats(emb: DataFrame): DataFrame =
    emb.select(posexplode(col("embedding")).as(Seq("dim", "v")))
      .groupBy(col("dim"))
      .agg(min(col("v")).as("mn"), max(col("v")).as("mx"))
      .agg(array_sort(collect_list(struct(col("dim"), col("mn"), col("mx"))))
        .as("a"))
      .select(col("a.mn").as("mins"), col("a.mx").as("maxs"))

  /** Encode a float table against an EXISTING bounds row — the serve/
    * maintenance half ([[Sq8Index]] appends batches encoded against the
    * PERSISTED bounds; the quantizer stays fixed until retrain, the
    * [[IvfIndex]] centroid contract). Out-of-bounds values clamp — the
    * designed behavior for post-build drift, and the drift monitor is
    * what says when clamping means retrain. */
  private[operators] def encodeAgainst(emb: DataFrame,
      bounds: DataFrame): DataFrame =
    emb.crossJoin(broadcast(bounds))
      .select(col("vec_id"),
        Vectors.sq8(col("embedding"), col("mins"), col("maxs")).as("codes"))

  /** The corpus code table: (vec_id, codes binary). One scan, one
    * broadcast of the 1-row bounds table, one native encode per row. */
  private[operators] def codesOf(emb: DataFrame): DataFrame =
    encodeAgainst(emb, dimStats(emb))

  def q102Sq8Ann(s: SparkSession, d: String): DataFrame = {
    val emb = StagedCache.stage(d, "sq_emb", Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding"),
        Vectors.dot(col("embedding"), col("embedding")).as("n2")))
    // staged: feeds the bounds aggregate, the encode, and the re-rank
    val coded = StagedCache.stage(d, "sq_codes", codesOf(emb))
    // staged: feeds the probe broadcast and the brute code scan
    serve(emb, coded, Ivf.ProbeFrom, Ivf.NProbes)
  }

  /** The q102 serving plan over EXISTING float + code tables: probe
    * codes broadcast, integer-dot brute scan, R-row shortlist, exact
    * cosine re-rank to top-3. Output (probe_id, vec_id, iscore, cosine,
    * rn) — both stages' scores in the open, like q92. */
  private[operators] def serve(emb: DataFrame, coded: DataFrame,
      probeFrom: Long, nProbes: Long): DataFrame =
    serveWhere(emb, coded,
      col("vec_id") >= probeFrom && col("vec_id") < probeFrom + nProbes)

  /** [[serve]] with an arbitrary probe predicate — the same plan
    * expression-for-expression (the range form delegates, so the
    * q102/q104 pins ride this body); [[graft.streaming.EvalStream]]'s
    * canary probes are a strided id set. */
  private[graft] def serveWhere(emb: DataFrame, coded: DataFrame,
      probePred: org.apache.spark.sql.Column, topK: Int = TopKOut): DataFrame = {
    val probeRange = probePred
    val probes = coded.filter(probeRange)
      .select(col("vec_id").as("probe_id"), col("codes").as("pcodes"))
    val wI = Window.partitionBy(col("probe_id"))
      .orderBy(col("iscore").desc, col("vec_id"))
    val short = coded.crossJoin(broadcast(probes))
      .filter(col("vec_id") =!= col("probe_id"))
      .withColumn("iscore", Vectors.doti(col("pcodes"), col("codes")))
      .withColumn("srn", row_number().over(wI))
      .filter(col("srn") <= R)
      .select(col("probe_id"), col("vec_id"), col("iscore"))
    val pflt = emb.filter(probeRange)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pe"),
        col("n2").as("pn2"))
    val wC = Window.partitionBy(col("probe_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    short.join(emb, Seq("vec_id"))
      .join(broadcast(pflt), Seq("probe_id"))
      .withColumn("cosine",
        Vectors.dot(col("pe"), col("embedding")) / sqrt(col("pn2") * col("n2")))
      .withColumn("rn", row_number().over(wC))
      .filter(col("rn") <= topK)
      .select(col("probe_id"), col("vec_id"), col("iscore"), col("cosine"),
        col("rn"))
      .orderBy(col("probe_id"), col("rn"))
  }

  // ---------------------------------------------------------------- q104

  /** Per-(session, corpus) persisted-index memo backing [[q104ServedSq8]]
    * — the same [[ServedMemo]] machinery as q86's/q93's/q96's. */
  private[operators] val sqMemo = new ServedMemo[Sq8Index](
    maxEntries = 8,
    mk = (s, state) => new Sq8Index(s, state),
    built = _.isBuilt,
    build = _.build(_))

  /** Served SQ8 ANN — q102's exact contract (same probes, same codes,
    * same shortlist, same top-3, same oracle) answered from a PERSISTED
    * [[Sq8Index]]: bounds + codes build once per session+corpus as
    * setup; the declared plan is the SERVE path only — three state-table
    * scans, probe broadcast, integer-code scan, R-row float re-rank. No
    * dim-stats aggregate, no encode of the corpus anywhere in the plan
    * ([[graft.Sq8IndexSpec]] pins both and serve ≡ inline
    * bit-identically). q104 is to q102 what q86 is to q40, q93 to q92,
    * q96 to q95 — with this row every approximate leg the engine ships
    * (float IVF, SQ8, IVF-PQ, BM25) has both its trainer and its
    * production read path priced in the open. */
  def q104ServedSq8(s: SparkSession, d: String): DataFrame =
    sqMemo.get(s, d, "embeddings.parquet").query(Ivf.ProbeFrom, Ivf.NProbes)

  /** Same answer, same oracle: the index serves q102's results verbatim. */
  def q104Sql: String = q102Sql

  private def duckDot(a: String, b: String): String =
    Similarity.duckDotSql(a, b)

  /** Oracle: the identical chain in DuckDB — REAL min/max bounds, the
    * literal centered-floor code formula, BIGINT list dot, exact cosine
    * re-rank. The engine's BYTES and the oracle's BIGINT list hold the
    * same integers; only (probe_id, vec_id, iscore, cosine, rn) is
    * compared. */
  def q102Sql: String = {
    val pf = Ivf.ProbeFrom
    val pt = Ivf.ProbeFrom + Ivf.NProbes
    s"""WITH emb AS MATERIALIZED (
       |  SELECT vec_id, embedding, ${duckDot("embedding", "embedding")} AS n2
       |  FROM embeddings
       |), dimstats AS MATERIALIZED (
       |  SELECT dim, min(embedding[dim]) AS mn, max(embedding[dim]) AS mx
       |  FROM emb, (SELECT unnest(range(1, ${Dim + 1})) AS dim) dims
       |  GROUP BY dim
       |), codes AS MATERIALIZED (
       |  SELECT vec_id,
       |    list(CASE WHEN mx = mn THEN -128 ELSE
       |      least(255, greatest(0, floor(CASE WHEN isnan(((embedding[dim]::DOUBLE - mn::DOUBLE) * 255.0)
       |        / (mx::DOUBLE - mn::DOUBLE)) THEN 0 ELSE ((embedding[dim]::DOUBLE - mn::DOUBLE) * 255.0)
       |        / (mx::DOUBLE - mn::DOUBLE) END)))::BIGINT - 128 END
       |      ORDER BY dim) AS c
       |  FROM emb, dimstats
       |  GROUP BY vec_id
       |), probes AS (
       |  SELECT vec_id AS probe_id, c AS pc FROM codes
       |  WHERE vec_id >= $pf AND vec_id < $pt
       |), iscored AS (
       |  SELECT p.probe_id, t.vec_id,
       |    list_reduce(list_transform(range(1, ${Dim + 1}), i -> pc[i] * t.c[i]),
       |      (acc, x) -> acc + x) AS iscore
       |  FROM codes t, probes p WHERE t.vec_id <> p.probe_id
       |), short AS (
       |  SELECT probe_id, vec_id, iscore FROM (
       |    SELECT *, row_number() OVER (PARTITION BY probe_id
       |      ORDER BY iscore DESC, vec_id) AS srn
       |    FROM iscored) s
       |  WHERE srn <= $R
       |), reranked AS (
       |  SELECT s.probe_id, s.vec_id, s.iscore,
       |    ${duckDot("pe.embedding", "ce.embedding")} / sqrt(pe.n2 * ce.n2) AS cosine
       |  FROM short s
       |  JOIN emb pe ON pe.vec_id = s.probe_id
       |  JOIN emb ce ON ce.vec_id = s.vec_id
       |)
       |SELECT probe_id, vec_id, iscore, cosine, rn FROM (
       |  SELECT *, CAST(row_number() OVER (PARTITION BY probe_id
       |    ORDER BY cosine DESC, vec_id) AS INT) AS rn
       |  FROM reranked) t
       |WHERE rn <= $TopKOut ORDER BY probe_id, rn""".stripMargin
  }
}

/** Train-once / serve-many SQ8 — the FOURTH index family behind the
  * [[AnnIndex]] lifecycle (after [[IvfIndex]] float, [[PqIndex]] code,
  * [[Retrieval.LexIndex]] lexical): [[build]] derives the per-dimension
  * bounds from the corpus and PUBLISHES three
  * [[graft.streaming.StateDir]] tables — the one-row bounds, the float
  * table (probe source + re-rank gather), and the byte code table (the
  * 64 B/vector scan a deployment pins hot — 4× smaller than floats at
  * near-exact recall, the middle rung of the memory ladder). [[query]]
  * serves purely from those tables, bit-identical to the inline q102
  * ([[graft.Sq8IndexSpec]] pins both).
  *
  * Incremental maintenance encodes NEW vectors against the PERSISTED
  * bounds (the quantizer stays fixed until the owner rebuilds —
  * [[IvfIndex]]'s centroid contract; out-of-bounds drift clamps, and
  * [[graft.streaming.DriftStream]] is the monitor that says when
  * clamping means retrain). Floats and codes append as two per-table-
  * guarded deltas, so a torn batch is COMPLETED on re-drive, never
  * skipped or doubled — the trait's ledger protocol, inherited
  * verbatim. No [[AnnIndex.warmStartTables]]: the bounds "trainer" is
  * one min/max pass with no iterative refinement to warm-start (the
  * [[Retrieval.LexIndex]] case, not the Lloyd case). */
final class Sq8Index(val spark: SparkSession,
    val state: graft.streaming.StateDir) extends AnnIndex with RecallEvaluable {
  import Sq8Index._
  import org.apache.spark.sql.functions.col

  protected def prefix: String = "sq"

  protected def publishTables(d: String,
      warm: Map[String, DataFrame]): Unit = {
    val emb = Tables.embeddings(spark, d)
      .select(col("vec_id"), col("embedding"),
        graft.functions.Vectors.dot(col("embedding"), col("embedding")).as("n2"))
      .persist() // scanned by the bounds aggregate + floats publish
    try {
      state.write(BoundsTable, Sq.dimStats(emb))
      state.write(FloatsTable, emb)
      // codes from the PUBLISHED tables (a re-read, not the build plan):
      // guaranteed consistent with the exact tables serving reads
      state.write(CodesTable, Sq.encodeAgainst(
        state.read(FloatsTable, FloatsSchema),
        state.read(BoundsTable, BoundsSchema)))
    } finally { emb.unpersist(); () }
  }

  protected def appendDeltas(newEmb: DataFrame, batchId: Option[Long],
      tag: org.apache.spark.sql.Column): Unit = {
    val emb = newEmb.select(col("vec_id"), col("embedding"),
      graft.functions.Vectors.dot(col("embedding"), col("embedding")).as("n2"))
    if (tableFresh(FloatsTable, FloatsSchema, batchId))
      state.append(FloatsTable, emb.withColumn("batch_id", tag))
    if (tableFresh(CodesTable, CodesSchema, batchId))
      state.append(CodesTable,
        Sq.encodeAgainst(emb, state.read(BoundsTable, BoundsSchema))
          .withColumn("batch_id", tag))
  }

  /** q102-shaped ANN over the persisted index: integer-code shortlist +
    * exact re-rank, top-3 per probe. */
  protected def serveTables(probeFrom: Long, nProbes: Long): DataFrame =
    Sq.serve(
      state.read(FloatsTable, FloatsSchema),
      state.read(CodesTable, CodesSchema),
      probeFrom, nProbes)

  /** [[Sq.serveWhere]] over the persisted tables — the arbitrary-probe
    * form of `query`; same epoch refusal as the trait's range form. */
  def queryWhere(probePred: org.apache.spark.sql.Column,
      topK: Int): DataFrame = {
    require(isBuilt,
      "sq8 index not built (or a rebuild was torn) — build() required")
    Sq.serveWhere(
      state.read(FloatsTable, FloatsSchema),
      state.read(CodesTable, CodesSchema),
      probePred, topK)
  }

  /** [[RecallEvaluable]]: exact truth from the floats table the re-rank
    * reads; this family ranks by cosine. */
  def floatBase: DataFrame =
    state.read(FloatsTable, FloatsSchema)
      .select(col("vec_id"), col("embedding"), col("n2"))
  def metric: Recall.Metric = Recall.CosineDesc
}

object Sq8Index {
  import org.apache.spark.sql.types._

  val BoundsTable = "sq_bounds"
  val FloatsTable = "sq_floats"
  val CodesTable = "sq_codes"

  val BoundsSchema: StructType = StructType(Seq(
    StructField("mins", ArrayType(FloatType, containsNull = true)),
    StructField("maxs", ArrayType(FloatType, containsNull = true))))

  val FloatsSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType, containsNull = true)),
    StructField("n2", DoubleType)))

  val CodesSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("codes", BinaryType)))
}
