package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Corpus-overlap diagnostics — the two per-document duplication reports
  * a training-data pipeline runs AROUND the dedup operators:
  *
  *  - q87, the duplicated-n-gram profile (Lee et al. 2022,
  *    "Deduplicating Training Data Makes Language Models Better"): for
  *    each document, what fraction of its distinct shingles also occurs
  *    in at least one OTHER document? q19/q20/q70 report pairs, groups,
  *    and passages; this reports the per-document contamination fraction
  *    that decides cut-vs-keep policies and measures how dirty a corpus
  *    is BEFORE committing to a dedup pass.
  *  - q88, snapshot novelty: dedup-a-new-crawl-against-the-corpus — for
  *    each document of the new snapshot, what fraction of its shingles
  *    is ALREADY in the old snapshot? The fixture stand-in for the two
  *    snapshots is the q85 doc_id-parity split; production swaps the two
  *    real crawls.
  *
  * Both use the q57 shingle machinery (native `graft_shingles`,
  * [[Decontamination.ShingleK]]-token shingles, per-doc distinct inside
  * codegen) and integer-permille ratios (exact DIV — the portability
  * doctrine).
  *
  * Scale shape — the deliberate difference from q57/q64/q81: there is NO
  * bounded benchmark side here. Both join sides are corpus-scale, so the
  * plan must survive WITHOUT a broadcast or bloom shortcut: everything
  * is keyed on the shingle. q87 shuffles the (doc, shingle) pairs once
  * on shingle; the df aggregate and the dup-set probe both read THAT
  * exchange (same subtree — ReuseExchange computes it once), and the
  * per-doc rollup is a second keyed aggregate. q88 is one
  * shuffle-on-shingle left-semi-count between the new half's pairs and
  * the old half's distinct-shingle set. At 100 TB these are the honest
  * shapes: shingle-keyed exchanges with map-side-combined partials on
  * both flanks, no collect, no broadcast of anything corpus-proportional.
  */
object Overlap {

  private val K = Decontamination.ShingleK

  /** (doc_id, sh) — distinct shingles per doc, the shared scan stage. */
  private def docShingles(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("t", split(col("text"), " "))
      .filter(size(col("t")) >= K) // sequence(1, 0) DESCENDS — guard
      .select(col("doc_id"), explode(array_distinct(
        graft.functions.Text.shingles(col("t"), K))).as("sh"))

  private def shinglesSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, string_split(text,' ') AS t FROM documents
       |  WHERE len(string_split(text,' ')) >= $K
       |), sh AS (
       |  SELECT doc_id, unnest(list_distinct(list_transform(
       |    range(1, len(t) - ${K - 2}),
       |    i -> array_to_string(list_slice(t, CAST(i AS INT), CAST(i AS INT) + ${K - 1}), ' ')))) AS sh
       |  FROM toks
       |)""".stripMargin

  // ---------------------------------------------------------------- q87

  /** Per-document duplication profile: distinct shingle count, how many
    * of them appear in ≥ 1 other document, and the duplicated fraction
    * in permille. */
  def q87DupNgramProfile(s: SparkSession, d: String): DataFrame = {
    val sh = docShingles(s, d)
    // shingles present in >= 2 distinct docs (per-doc distinct upstream
    // makes count == distinct-doc count); the aggregate and the probe
    // below share the shingle-keyed exchange
    val dup = sh.groupBy(col("sh"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") >= 2)
      .select(col("sh"))
    val perDoc = sh.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"))
    val dupPerDoc = sh.join(dup, Seq("sh"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_dup"))
    perDoc.join(dupPerDoc, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_dup"))
      .withColumn("dup_permille", expr("(1000 * n_dup) DIV n_shingles"))
      .select(col("doc_id"), col("n_shingles"), col("n_dup"), col("dup_permille"))
      .orderBy(col("doc_id"))
  }

  def q87Sql: String =
    s"""$shinglesSql, dup AS (
       |  SELECT sh FROM sh GROUP BY sh HAVING count(*) >= 2
       |), per_doc AS (
       |  SELECT doc_id, count(*) AS n_shingles FROM sh GROUP BY doc_id
       |), dup_per_doc AS (
       |  SELECT s.doc_id, count(*) AS n_dup
       |  FROM sh s JOIN dup USING (sh) GROUP BY s.doc_id
       |)
       |SELECT p.doc_id, p.n_shingles,
       |  coalesce(d.n_dup, 0) AS n_dup,
       |  (1000 * coalesce(d.n_dup, 0)) // p.n_shingles AS dup_permille
       |FROM per_doc p LEFT JOIN dup_per_doc d USING (doc_id)
       |ORDER BY p.doc_id""".stripMargin

  // ---------------------------------------------------------------- q88

  /** Novelty of the new snapshot (odd doc_ids) against the old (even):
    * per new doc, distinct shingles, how many the old snapshot already
    * contains, and the NOVEL fraction in permille. */
  def q88SnapshotNovelty(s: SparkSession, d: String): DataFrame = {
    val sh = docShingles(s, d)
    val oldSet = sh.filter(col("doc_id") % 2 === 0)
      .select(col("sh")).distinct()
    val newSh = sh.filter(col("doc_id") % 2 === 1)
    val seen = newSh.join(oldSet, Seq("sh"), "left_semi")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_seen"))
    newSh.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"))
      .join(seen, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_seen"))
      .withColumn("novel_permille",
        expr("(1000 * (n_shingles - n_seen)) DIV n_shingles"))
      .select(col("doc_id"), col("n_shingles"), col("n_seen"), col("novel_permille"))
      .orderBy(col("doc_id"))
  }

  def q88Sql: String =
    s"""$shinglesSql, old_set AS (
       |  SELECT DISTINCT sh FROM sh WHERE doc_id % 2 = 0
       |), new_sh AS (
       |  SELECT doc_id, sh FROM sh WHERE doc_id % 2 = 1
       |), seen AS (
       |  SELECT n.doc_id, count(*) AS n_seen
       |  FROM new_sh n SEMI JOIN old_set o USING (sh)
       |  GROUP BY n.doc_id
       |)
       |SELECT t.doc_id, t.n_shingles,
       |  coalesce(s.n_seen, 0) AS n_seen,
       |  (1000 * (t.n_shingles - coalesce(s.n_seen, 0))) // t.n_shingles AS novel_permille
       |FROM (SELECT doc_id, count(*) AS n_shingles FROM new_sh GROUP BY doc_id) t
       |LEFT JOIN seen s USING (doc_id)
       |ORDER BY t.doc_id""".stripMargin
}
