package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
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
      .withColumn("toks", split(col("text"), " "))
      .withColumn("n_tokens", size(col("toks")))
      .withColumn("stop_hits", size(expr(
        "filter(toks, x -> x IN ('the', 'a', 'of', 'and', 'to', 'in'))")))
      .withColumn("stop_ratio", col("stop_hits").cast("double") / col("n_tokens"))
      .filter(col("n_tokens") >= MinTokens && col("stop_ratio") >= MinStopRatio)
      .join(drop, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("lang"), col("n_tokens"), col("stop_ratio"))
      .orderBy(col("doc_id"))
  }

  def q56Sql: String =
    s"""${Dedup.lshCtes.replaceFirst("WITH ", "WITH RECURSIVE ")}${Dedup.ccCtes}, dropids AS (
       |  SELECT v AS doc_id FROM comp WHERE v <> lbl
       |), m AS (
       |  SELECT doc_id, lang,
       |    CAST(len(string_split(text,' ')) AS INT) AS n_tokens,
       |    len(list_filter(string_split(text,' '), x -> x IN ('the','a','of','and','to','in')))::DOUBLE
       |      / len(string_split(text,' ')) AS stop_ratio
       |  FROM documents
       |)
       |SELECT doc_id, lang, n_tokens, stop_ratio FROM m
       |WHERE n_tokens >= $MinTokens AND stop_ratio >= $MinStopRatio
       |  AND doc_id NOT IN (SELECT doc_id FROM dropids)
       |ORDER BY doc_id""".stripMargin
}
