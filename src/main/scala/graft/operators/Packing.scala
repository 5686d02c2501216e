package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Sequence packing — the step between curation and the trainer: concat
  * documents in a deterministic order and cut the stream into
  * fixed-token-budget shards ("concat-and-chunk"). A document's shard is
  * `floor(start_offset / budget)` where start_offset is the exact prefix
  * sum of token counts before it — so packing is a DISTRIBUTED PREFIX SUM,
  * the one aggregation shape Spark's built-in windows only give you as a
  * single data-scale partition.
  *
  * Scale shape (100 TB): the naive plan (`Window.partitionBy(lang)
  * .orderBy(doc_id)` over every document) serializes each language's
  * entire corpus through one task — the unpartitioned-window anti-pattern.
  * This operator computes the SAME exact prefix sum in two levels:
  *
  *   1. bucket partials — one map-side-combined groupBy on
  *      (lang, doc_id DIV bucketSize);
  *   2. bucket offsets — a running sum over the per-bucket totals (the
  *      window input is |corpus| / bucketSize rows, and the pattern
  *      recurses to three levels if even that is too large);
  *   3. local windows — per-(lang, bucket) cumulative sums (≤ bucketSize
  *      rows per partition, thousands of partitions in parallel) plus the
  *      bucket's offset.
  *
  * The result is bit-identical to the single-window plan (integer sums,
  * same (lang, doc_id) order) — the DuckDB oracle runs the global-window
  * formulation and the hashes must agree. Same two-level idea as
  * HighWaterMark.contiguousPrefixAgg, applied to the scan primitive.
  */
object Packing {

  private[operators] val Budget = 512L
  private[operators] val BucketSize = 64L

  /** The two-level exact prefix sum over (doc_id, lang, n_tokens) rows:
    * adds `cum`, the INCLUSIVE running token total per lang in doc_id
    * order. Bit-equal to a single global `Window.partitionBy(lang)
    * .orderBy(doc_id)` sum by construction (integer sums, same order) —
    * and property-pinned at adversarial shapes (random counts, gapped
    * doc_ids, empty buckets) by PackingPrefixProps, so the bucket-offset
    * arithmetic stays pinned under refactors. */
  private[operators] def prefixSum(docs: DataFrame): DataFrame = {
    val bucketed = docs.withColumn("bucket", expr(s"doc_id DIV $BucketSize"))
    val bucketTotals = bucketed.groupBy(col("lang"), col("bucket"))
      .agg(sum(col("n_tokens")).as("btoks"))
    // running offset across buckets: |corpus|/bucketSize input rows
    val wB = Window.partitionBy(col("lang")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bucketTotals
      .withColumn("offset", coalesce(sum(col("btoks")).over(wB), lit(0L)))
      .select(col("lang"), col("bucket"), col("offset"))
    // local cumulative sum inside each bounded (lang, bucket) partition
    val wL = Window.partitionBy(col("lang"), col("bucket")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bucketed.join(offsets, Seq("lang", "bucket"))
      .withColumn("cum", col("offset") + sum(col("n_tokens")).over(wL))
  }

  /** Per-(lang, shard) packing manifest: how many docs landed in each
    * token-budget shard, their token total, and the doc-id span. */
  def q58SequencePacking(s: SparkSession, d: String): DataFrame = {
    // pinned (lazy localCheckpoint): [[prefixSum]] references its input
    // TWICE — the bucket-totals aggregate and the final offsets join — so
    // un-pinned the corpus scan + tokenize ran twice per execution (guide
    // §1.2). The pinned table is three fixed-width columns per doc; at
    // warehouse scale this is the persisted per-doc stats table a packing
    // job reads instead of re-tokenizing.
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"),
        size(graft.Tok.toksText).cast("long").as("n_tokens"))
      .localCheckpoint(eager = false)
    prefixSum(docs)
      .withColumn("shard", expr(s"CAST((cum - n_tokens) DIV $Budget AS INT)"))
      .groupBy(col("lang"), col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("tokens"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
      .orderBy(col("lang"), col("shard"))
  }

  def q58Sql: String =
    s"""WITH d AS (
       |  SELECT doc_id, lang,
       |    CAST(len(${graft.Tok.sqlText}) AS BIGINT) AS n_tokens
       |  FROM documents
       |), c AS (
       |  SELECT doc_id, lang, n_tokens,
       |    CAST(sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
       |  FROM d
       |)
       |SELECT lang, CAST((cum - n_tokens) // $Budget AS INT) AS shard,
       |  count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS tokens,
       |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
       |FROM c GROUP BY 1, 2 ORDER BY lang, shard""".stripMargin
}
