package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** End-to-end training-data curation: the composition the LLM-pipeline
  * families exist FOR. One declarative pipeline selects the documents that
  * survive both gates:
  *
  *   1. quality — length and stopword-density floors (the q29 metric
  *      family: too-short or stopword-free word soup is dropped);
  *   2. dedup — near-dup cluster members other than the canonical keep-min
  *      doc are dropped (the q20 pair graph closed into components by the
  *      q54 operator).
  *
  * Scale shape: the quality side is a single shuffle-free scan of
  * `documents` (all metrics are array lambdas inside whole-stage codegen).
  * The drop list is |cluster members − clusters| rows — small on this
  * fixture, but corpus-PROPORTIONAL at real dup rates (web-scale dedup
  * routinely deletes 30-80% of a corpus), so the anti-join carries no
  * broadcast hint: AQE picks broadcast when the list is actually small and
  * a shuffled left_anti on doc_id (one well-partitioned exchange) when it
  * isn't. The expensive part (banded LSH + connected components) touches
  * only signature/band/pair tables, never the full text again.
  */
object Curation {

  private[operators] val MinTokens = 30
  private[operators] val MinStopRatio = 0.05

  /** Surviving documents with the metrics that admitted them. */
  def q56Curation(s: SparkSession, d: String): DataFrame = {
    // non-canonical members of near-dup clusters — the deletion list,
    // served from the shared memoized label table (one CC solve per
    // session+corpus across q54/q56)
    val drop = Dedup.clusterLabels(s, d)
      .filter(col("v") =!= col("lbl"))
      .select(col("v").as("doc_id"))
    Tables.documents(s, d)
      .withColumn("toks", graft.Tok.toksText)
      .withColumn("n_tokens", size(col("toks")))
      .withColumn("stop_hits", graft.functions.Text.countIn(col("toks"),
        Seq("the", "a", "of", "and", "to", "in")))
      .withColumn("stop_ratio", col("stop_hits").cast("double") / col("n_tokens"))
      .filter(col("n_tokens") >= MinTokens && col("stop_ratio") >= MinStopRatio)
      .join(drop, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("lang"), col("n_tokens"), col("stop_ratio"))
      .orderBy(col("doc_id"))
  }

  // ---------------------------------------------------------------- q68

  /** Quality-aware canonical selection — the keeper POLICY refinement of
    * the keep-min rule: real pipelines keep the best member of a near-dup
    * cluster, not the lowest id (C4 keeps the longest; others keep the
    * highest quality score). One row per cluster: the keeper under
    * (longest, then lowest id) and the member count, ready to replace the
    * keep-min survivors in a q56-style gate.
    *
    * Scale shape: the members join carries (doc_id, n_tokens) — never
    * text; the selection window partitions BY CLUSTER (thousands of
    * bounded partitions in parallel, the q08 top-k shape — skew bounded by
    * the largest cluster, which the hot-bucket guard upstream already
    * caps). Labels come from the shared CC memo / ingest state. */
  def q68ClusterKeeper(s: SparkSession, d: String): DataFrame = {
    val labels = Dedup.clusterLabels(s, d)
      .select(col("v").as("doc_id"), col("lbl").as("cluster_id"))
    val w = Window.partitionBy(col("cluster_id"))
      .orderBy(col("n_tokens").desc, col("doc_id"))
    Tables.documents(s, d)
      .select(col("doc_id"), size(graft.Tok.toksText).as("n_tokens"))
      .join(labels, Seq("doc_id"))
      .withColumn("rn", row_number().over(w))
      .withColumn("n_members",
        count(lit(1)).over(Window.partitionBy(col("cluster_id"))))
      .filter(col("rn") === 1)
      .select(col("cluster_id"), col("doc_id").as("keeper"),
        col("n_tokens").as("keeper_tokens"), col("n_members"))
      .orderBy(col("cluster_id"))
  }

  def q68Sql: String =
    s"""${Dedup.lshCtes.replaceFirst("WITH ", "WITH RECURSIVE ")}${Dedup.ccCtes}, m AS (
       |  SELECT c.lbl AS cluster_id, d.doc_id,
       |    CAST(len(${graft.Tok.sql("d.text")}) AS INT) AS n_tokens
       |  FROM comp c JOIN documents d ON d.doc_id = c.v
       |), r AS (
       |  SELECT cluster_id, doc_id, n_tokens,
       |    CAST(row_number() OVER (PARTITION BY cluster_id
       |      ORDER BY n_tokens DESC, doc_id) AS INT) AS rn,
       |    CAST(count(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS n_members
       |  FROM m
       |)
       |SELECT cluster_id, doc_id AS keeper, n_tokens AS keeper_tokens, n_members
       |FROM r WHERE rn = 1 ORDER BY cluster_id""".stripMargin

  // ---------------------------------------------------------------- q67

  /** Dup-rate by source — the dedup ANALYTICS rollup: for every source,
    * how many docs it contributed and what fraction the near-dup gate
    * deletes (cluster members other than the keep-min canonical). This is
    * the report that catches a spammy feed before it trains: a source
    * whose dup_pct spikes is mirroring content the corpus already has.
    *
    * Integer percent ((100·dupes) DIV docs — both non-negative, so
    * truncating and flooring division agree across engines). The label
    * table is served from the shared memoized CC solve (one solve per
    * session+corpus across q54/q56/q67, or from ingest state when a
    * `trackClusters` stream owns the corpus).
    *
    * Scale shape: the drop list joins LEFT (no broadcast hint — same
    * corpus-proportionality argument as q56's anti-join, AQE decides)
    * and collapses immediately into a per-source count — the exchange
    * after the join carries |sources| partial rows. */
  def q67DupRateBySource(s: SparkSession, d: String): DataFrame = {
    val drop = Dedup.clusterLabels(s, d)
      .filter(col("v") =!= col("lbl"))
      .select(col("v").as("doc_id"), lit(1L).as("dropped"))
    Tables.documents(s, d)
      .select(col("doc_id"), col("source"))
      .join(drop, Seq("doc_id"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(coalesce(col("dropped"), lit(0L))).as("n_dupes"))
      .withColumn("dup_pct", expr("(100 * n_dupes) DIV n_docs"))
      .orderBy(col("source"))
  }

  def q67Sql: String =
    s"""${Dedup.lshCtes.replaceFirst("WITH ", "WITH RECURSIVE ")}${Dedup.ccCtes}, dropids AS (
       |  SELECT v AS doc_id FROM comp WHERE v <> lbl
       |), m AS (
       |  SELECT d.source, count(*) AS n_docs,
       |    CAST(sum(CASE WHEN dr.doc_id IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS n_dupes
       |  FROM documents d LEFT JOIN dropids dr USING (doc_id)
       |  GROUP BY d.source
       |)
       |SELECT source, n_docs, n_dupes, (100 * n_dupes) // n_docs AS dup_pct
       |FROM m ORDER BY source""".stripMargin

  def q56Sql: String =
    s"""${Dedup.lshCtes.replaceFirst("WITH ", "WITH RECURSIVE ")}${Dedup.ccCtes}, dropids AS (
       |  SELECT v AS doc_id FROM comp WHERE v <> lbl
       |), m AS (
       |  SELECT doc_id, lang,
       |    CAST(len(${graft.Tok.sqlText}) AS INT) AS n_tokens,
       |    len(list_filter(${graft.Tok.sqlText}, x -> x IN ('the','a','of','and','to','in')))::DOUBLE
       |      / len(${graft.Tok.sqlText}) AS stop_ratio
       |  FROM documents
       |)
       |SELECT doc_id, lang, n_tokens, stop_ratio FROM m
       |WHERE n_tokens >= $MinTokens AND stop_ratio >= $MinStopRatio
       |  AND doc_id NOT IN (SELECT doc_id FROM dropids)
       |ORDER BY doc_id""".stripMargin
}
