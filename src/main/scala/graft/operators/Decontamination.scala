package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Benchmark decontamination — the training-data gate every serious
  * pipeline runs before the curation decision: documents sharing an
  * n-gram with an evaluation benchmark must be flagged (and usually
  * dropped), or the benchmark is contaminated and its scores are fiction.
  *
  * The operator is the canonical n-gram collision join: shingle the
  * corpus, shingle the benchmark, equi-join on the shingle, count
  * distinct collisions per document. The fixture stand-in for the
  * benchmark is `doc_id < BenchDocs` (a bounded probe set, the q21/q48
  * convention); production swaps in the real benchmark table.
  *
  * Scale shape (100 TB): the corpus side is a shuffle-FREE scan —
  * per-document shingling and deduplication happen inside codegen
  * (`transform` + `array_distinct` BEFORE the explode, so no corpus-wide
  * distinct), and the benchmark side is bounded by construction (a
  * benchmark suite is thousands of documents, not corpus-proportional) →
  * `broadcast` is justified, the join never shuffles the corpus
  * shingles. The only exchange carries the collision HITS (tiny) into
  * the per-doc count. 4-token shingles are the standard
  * contamination granularity (long enough to beat chance on real text,
  * short enough to catch paraphrase-adjacent reuse).
  */
object Decontamination {

  private[graft] val ShingleK = 4
  private[graft] val BenchDocs = 50

  /** The corpus shingle table all three decon queries derive — staged
    * once per session in the owned [[StagedCache]] (the cross-query
    * shared-build pattern: q57 pays the shingling scan, q64/q81 read
    * the columnar cache; consumers are plain relational readers —
    * broadcast joins + grouped counts — exactly the shape the r10
    * A/B measurements showed sharing pays for). */
  private def shingled(s: SparkSession, d: String): DataFrame =
    StagedCache.stage(d, "decon_shingles", Tables.documents(s, d)
      .withColumn("t", graft.Tok.toksText)
      .filter(size(col("t")) >= ShingleK) // sequence(1, 0) DESCENDS — guard
      .select(col("doc_id"), explode(array_distinct(
        graft.functions.Text.shingles(col("t"), ShingleK))).as("s")))

  /** Distinct benchmark-shingle collisions per corpus document. */
  def q57Decontaminate(s: SparkSession, d: String): DataFrame = {
    val sh = shingled(s, d)
    val bench = sh.filter(col("doc_id") < BenchDocs).select(col("s")).distinct()
    sh.filter(col("doc_id") >= BenchDocs)
      .join(broadcast(bench), Seq("s"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_collisions"))
      .orderBy(col("doc_id"))
  }

  // ---------------------------------------------------------------- q64

  /** Flag a (doc, benchmark-item) pair when the doc contains ≥ this
    * percentage of the item's distinct shingles. */
  private[operators] val MinContainmentPct = 50L

  /** Containment-ratio decontamination — the per-ITEM refinement of q57:
    * instead of pooling the benchmark's shingles and counting collisions,
    * score each (corpus doc, benchmark item) pair by how much of THAT
    * item the doc contains (|shared shingles| / |item shingles|) and
    * report the pairs over the containment threshold. This is the
    * published contamination rule (an eval item is burned when some
    * training doc contains most of it — a handful of incidental shingle
    * collisions is noise), and it names WHICH items to retire, which the
    * pooled count cannot.
    *
    * Containment is served as exact integer percent ((100·shared) DIV
    * |item|) — shingle sets are per-doc distinct by construction, so the
    * join-group count IS the set intersection, and everything stays
    * hash-exact across engines.
    *
    * Scale shape: identical to q57 — corpus shingles never shuffle (the
    * per-doc dedup happens in codegen before the explode), the benchmark
    * side is bounded → broadcast on both the shingle join and the
    * per-item-size join; the only exchange carries collision hits into
    * the (doc, item) count. */
  def q64ContainmentDecon(s: SparkSession, d: String): DataFrame = {
    val sh = shingled(s, d)
    val bench = sh.filter(col("doc_id") < BenchDocs)
      .select(col("doc_id").as("bench_id"), col("s"))
    val bsize = bench.groupBy(col("bench_id"))
      .agg(count(lit(1)).as("n_bench"))
    sh.filter(col("doc_id") >= BenchDocs)
      .join(broadcast(bench), Seq("s"))
      .groupBy(col("doc_id"), col("bench_id"))
      .agg(count(lit(1)).as("n_shared"))
      .join(broadcast(bsize), Seq("bench_id"))
      .withColumn("containment_pct", expr("(100 * n_shared) DIV n_bench"))
      .filter(col("containment_pct") >= MinContainmentPct)
      .select(col("doc_id"), col("bench_id"), col("n_shared"),
        col("n_bench"), col("containment_pct"))
      .orderBy(col("doc_id"), col("bench_id"))
  }

  def q64Sql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, ${graft.Tok.sqlText} AS t FROM documents
       |  WHERE len(${graft.Tok.sqlText}) >= $ShingleK
       |), sh AS (
       |  SELECT doc_id, unnest(list_distinct(list_transform(
       |    range(1, len(t) - ${ShingleK - 2}),
       |    i -> array_to_string(list_slice(t, CAST(i AS INT), CAST(i AS INT) + ${ShingleK - 1}), ' ')))) AS s
       |  FROM toks
       |), bench AS (
       |  SELECT doc_id AS bench_id, s FROM sh WHERE doc_id < $BenchDocs
       |), bsize AS (
       |  SELECT bench_id, count(*) AS n_bench FROM bench GROUP BY bench_id
       |), hits AS (
       |  SELECT c.doc_id, b.bench_id, count(*) AS n_shared
       |  FROM sh c JOIN bench b USING (s)
       |  WHERE c.doc_id >= $BenchDocs
       |  GROUP BY c.doc_id, b.bench_id
       |)
       |SELECT doc_id, bench_id, n_shared, n_bench,
       |  (100 * n_shared) // n_bench AS containment_pct
       |FROM hits JOIN bsize USING (bench_id)
       |WHERE (100 * n_shared) // n_bench >= $MinContainmentPct
       |ORDER BY doc_id, bench_id""".stripMargin

  // ---------------------------------------------------------------- q81

  /** Bloom bitmap size in bits (512 KiB serialized) — a CONFIG bound, never
    * data-proportional: this is what ships to every task instead of the raw
    * benchmark shingle strings. */
  private[graft] val BloomBits = graft.Dials.BloomBits
  private[graft] val BloomItems = graft.Dials.BloomItems

  /** Bloom-gated clean-corpus export — the ACTION q57's report implies
    * (drop every contaminated doc), built the way a 100 TB run has to be:
    * a Bloom filter over the benchmark shingles is aggregated once
    * (Spark's own `BloomFilterAggregate` — the engine's runtime-filter
    * sketch, built distributed with one bounded bitmap merge), embedded as
    * a literal, and applied INSIDE the corpus scan's codegen as a
    * might-contain prefilter. Only the bloom HITS (true collisions + the
    * bitmap's false-positive trickle) reach the exact shingle join that
    * verifies them — so the verify join's input is hit-proportional, not
    * corpus-proportional, and the benchmark side needs no broadcast hint
    * at all (AQE decides; scale-safety rule). Results are EXACT: blooms
    * have no false negatives, and the verify join kills false positives —
    * the oracle is plain relational SQL with no bloom anywhere.
    *
    * Docs with fewer than [[ShingleK]] tokens carry no shingle and are
    * clean by definition (they pass through the anti-join untouched).
    */
  def q81BloomClean(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal => CatLit}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.graft.shims
    val docs = Tables.documents(s, d)
    val sh = shingled(s, d)
    val bench = sh.filter(col("doc_id") < BenchDocs).select(col("s")).distinct()
    val bloomAgg = new BloomFilterAggregate(
      shims.expression(xxhash64(col("s"))),
      CatLit(BloomItems), CatLit(BloomBits)).toAggregateExpression()
    // one bounded driver row: the bitmap (BloomBits/8 bytes by config)
    val bf = bench.agg(shims.column(bloomAgg).as("bf")).head.getAs[Array[Byte]](0)
    val mightHit = shims.column(new BloomFilterMightContain(
      CatLit(bf), shims.expression(xxhash64(col("s")))))
    val contaminated = sh
      .filter(col("doc_id") >= BenchDocs)
      .filter(mightHit)
      .join(bench, Seq("s"))
      .select(col("doc_id")).distinct()
    docs.filter(col("doc_id") >= BenchDocs)
      .join(contaminated, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
      .orderBy(col("doc_id"))
  }

  def q81Sql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, ${graft.Tok.sqlText} AS t FROM documents
       |  WHERE len(${graft.Tok.sqlText}) >= $ShingleK
       |), sh AS (
       |  SELECT doc_id, unnest(list_distinct(list_transform(
       |    range(1, len(t) - ${ShingleK - 2}),
       |    i -> array_to_string(list_slice(t, CAST(i AS INT), CAST(i AS INT) + ${ShingleK - 1}), ' ')))) AS s
       |  FROM toks
       |), bench AS (
       |  SELECT DISTINCT s FROM sh WHERE doc_id < $BenchDocs
       |), contaminated AS (
       |  SELECT DISTINCT doc_id FROM sh JOIN bench USING (s)
       |  WHERE doc_id >= $BenchDocs
       |)
       |SELECT d.doc_id, d.lang, d.source, d.n_chars
       |FROM documents d
       |WHERE d.doc_id >= $BenchDocs
       |  AND NOT EXISTS (SELECT 1 FROM contaminated c WHERE c.doc_id = d.doc_id)
       |ORDER BY d.doc_id""".stripMargin

  def q57Sql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, ${graft.Tok.sqlText} AS t FROM documents
       |  WHERE len(${graft.Tok.sqlText}) >= $ShingleK
       |), sh AS (
       |  SELECT doc_id, unnest(list_distinct(list_transform(
       |    range(1, len(t) - ${ShingleK - 2}),
       |    i -> array_to_string(list_slice(t, CAST(i AS INT), CAST(i AS INT) + ${ShingleK - 1}), ' ')))) AS s
       |  FROM toks
       |), bench AS (
       |  SELECT DISTINCT s FROM sh WHERE doc_id < $BenchDocs
       |)
       |SELECT doc_id, count(*) AS n_collisions
       |FROM sh JOIN bench USING (s)
       |WHERE doc_id >= $BenchDocs
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin
}
