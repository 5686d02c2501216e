package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Training-set export — the flagship composition: everything between a
  * raw corpus and the trainer's shard manifest in ONE declarative plan.
  *
  *   raw documents
  *     → quality floors (q29/q56 metrics)
  *     → near-dup survivors (q20 pairs → q54 components, keep-min)
  *     → context-window chunks (q61 semantics: 32-token windows,
  *       stride 24, contained-runt rule)
  *     → token-budget shards (q58's two-level distributed prefix sum
  *       over (doc_id, chunk_idx) order)
  *     → per-(lang, shard) manifest.
  *
  * Scale shape is inherited piecewise from the operators it composes:
  * the quality gate is a shuffle-free codegen scan; the drop-list
  * anti-join carries no broadcast hint (corpus-proportional at real dup
  * rates — AQE chooses); chunking is a zero-shuffle per-row explode that
  * never materializes chunk TEXT (the manifest needs counts, so the
  * window size is `least(n − start, chunk)` — no slice, no string
  * amplification); the prefix sum is two-level (bucket partials →
  * |corpus|/64-row offset window → bounded per-bucket windows), never a
  * data-scale window partition. The chunk table is staged once for the
  * bucket-totals pass and the packing join. Bit-identical to the
  * single-global-window formulation the oracle runs.
  */
object Export {

  /** tokens per training shard (chunks never split across shards) */
  private[operators] val ShardBudget = 256L

  // ---------------------------------------------------------------- q65

  /** Per-(lang, shard) manifest of the packed training set. */
  def q65TrainingExport(s: SparkSession, d: String): DataFrame = {
    val drop = Dedup.clusterLabels(s, d)
      .filter(col("v") =!= col("lbl"))
      .select(col("v").as("doc_id"))
    val survivors = Tables.documents(s, d)
      .withColumn("toks", graft.Tok.toksText)
      .withColumn("n_tokens", size(col("toks")))
      .withColumn("stop_hits", graft.functions.Text.countIn(col("toks"),
        Seq("the", "a", "of", "and", "to", "in")))
      .filter(col("n_tokens") >= Curation.MinTokens &&
        col("stop_hits").cast("double") / col("n_tokens") >= Curation.MinStopRatio)
      .join(drop, Seq("doc_id"), "left_anti")
    val chunks = survivors
      .withColumn("start",
        explode(expr(s"sequence(0, size(toks) - 1, ${Chunking.Stride})")))
      .withColumn("chunk_idx", expr(s"start DIV ${Chunking.Stride}").cast("int"))
      .withColumn("n_chunk_tokens",
        least(col("n_tokens") - col("start"), lit(Chunking.Chunk)).cast("long"))
      .filter(col("chunk_idx") === 0 ||
        col("n_chunk_tokens") > Chunking.Chunk - Chunking.Stride)
      .select(col("doc_id"), col("lang"), col("chunk_idx"),
        col("n_chunk_tokens"),
        expr(s"doc_id DIV ${Packing.BucketSize}").as("bucket"))
      // feeds the bucket totals AND the packing join: staged once, and
      // narrow by construction (ids + counts, no chunk text)
      .localCheckpoint(false)
    val bucketTotals = chunks.groupBy(col("lang"), col("bucket"))
      .agg(sum(col("n_chunk_tokens")).as("btoks"))
    val wB = Window.partitionBy(col("lang")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bucketTotals
      .withColumn("offset", coalesce(sum(col("btoks")).over(wB), lit(0L)))
      .select(col("lang"), col("bucket"), col("offset"))
    val wL = Window.partitionBy(col("lang"), col("bucket"))
      .orderBy(col("doc_id"), col("chunk_idx"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    chunks.join(offsets, Seq("lang", "bucket"))
      .withColumn("cum", col("offset") + sum(col("n_chunk_tokens")).over(wL))
      .withColumn("shard", expr(s"CAST((cum - n_chunk_tokens) DIV $ShardBudget AS INT)"))
      .groupBy(col("lang"), col("shard"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(col("n_chunk_tokens")).as("tokens"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
      .orderBy(col("lang"), col("shard"))
  }

  def q65Sql: String =
    s"""${Dedup.lshCtes.replaceFirst("WITH ", "WITH RECURSIVE ")}${Dedup.ccCtes}, dropids AS (
       |  SELECT v AS doc_id FROM comp WHERE v <> lbl
       |), surv AS (
       |  SELECT doc_id, lang, ${graft.Tok.sqlText} AS toks,
       |    CAST(len(${graft.Tok.sqlText}) AS INT) AS n_tokens
       |  FROM documents
       |  WHERE len(${graft.Tok.sqlText}) >= ${Curation.MinTokens}
       |    AND len(list_filter(${graft.Tok.sqlText},
       |          x -> x IN ('the','a','of','and','to','in')))::DOUBLE
       |        / len(${graft.Tok.sqlText}) >= ${Curation.MinStopRatio}
       |    AND doc_id NOT IN (SELECT doc_id FROM dropids)
       |), ch AS (
       |  SELECT doc_id, lang, CAST(s // ${Chunking.Stride} AS INT) AS chunk_idx,
       |    CAST(least(n_tokens - s, ${Chunking.Chunk}) AS BIGINT) AS n_chunk_tokens
       |  FROM surv, unnest(generate_series(0, len(toks) - 1, ${Chunking.Stride})) AS g(s)
       |), chf AS (
       |  SELECT * FROM ch
       |  WHERE chunk_idx = 0 OR n_chunk_tokens > ${Chunking.Chunk - Chunking.Stride}
       |), c AS (
       |  SELECT doc_id, lang, chunk_idx, n_chunk_tokens,
       |    CAST(sum(n_chunk_tokens) OVER (PARTITION BY lang ORDER BY doc_id, chunk_idx
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
       |  FROM chf
       |)
       |SELECT lang, CAST((cum - n_chunk_tokens) // $ShardBudget AS INT) AS shard,
       |  count(*) AS n_chunks, CAST(sum(n_chunk_tokens) AS BIGINT) AS tokens,
       |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
       |FROM c GROUP BY 1, 2 ORDER BY lang, shard""".stripMargin
}
