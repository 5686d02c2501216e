package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Per-source corpus report card — the one-page answer to "which feeds
  * are healthy": document count, exact token-length percentiles, and the
  * q56 quality-floor pass rate, per source. This is the table a curation
  * run is judged by and the first place a degraded feed shows up (p50
  * collapses, quality_pct drops).
  *
  * The percentiles are exact nearest-rank over a VALUE HISTOGRAM: token
  * counts are small integers, so the corpus collapses to (source,
  * n_tokens) count rows first — the cumulative window then runs over
  * |sources|·|distinct lengths| rows, bounded by the max document length
  * and independent of corpus size (where q42/q52's rank-selection
  * machinery handles unbounded value domains, the histogram is the
  * cheaper exact path for a bounded one). All selection arithmetic is
  * integer (ceil via (p·n+99) DIV 100); the quality predicate is the q56
  * floor pair verbatim.
  *
  * Scale shape: two map-side-combinable aggregates over one scan shape,
  * a stats-row window, and a stats-row join — no corpus-sized window or
  * join side anywhere.
  */
object ReportCard {

  /** One row per source: n_docs, p50/p90 token length, quality pass %. */
  def q76SourceReport(s: SparkSession, d: String): DataFrame = {
    val m = Tables.documents(s, d)
      .withColumn("toks", graft.Tok.toksText)
      .withColumn("nt", size(col("toks")))
      .withColumn("stop_hits", graft.functions.Text.countIn(col("toks"),
        Seq("the", "a", "of", "and", "to", "in")))
      .withColumn("pass",
        when(col("nt") >= Curation.MinTokens &&
          col("stop_hits").cast("double") / col("nt") >= Curation.MinStopRatio, 1L)
          .otherwise(0L))
      .select(col("source"), col("nt"), col("pass"))
    // ONE corpus aggregation serves both consumers: the histogram and the
    // per-source totals both derive from the (source, nt, pass) count
    // table — previously each ran its own corpus scan + tokenize +
    // stopword count (guide §1.2: don't compute things twice). The pinned
    // base is |sources × distinct lengths × 2| rows, corpus-independent;
    // n = Σc and np = Σ pass·c are exactly the old count(*) / sum(pass).
    val base = m.groupBy(col("source"), col("nt"), col("pass"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint(eager = false)
    val hist = base.groupBy(col("source"), col("nt")).agg(sum(col("c")).as("c"))
    val cum = hist.withColumn("cum",
      sum(col("c")).over(Window.partitionBy(col("source")).orderBy(col("nt"))))
    val tot = base.groupBy(col("source"))
      .agg(sum(col("c")).as("n"), sum(col("pass") * col("c")).as("np"))
    cum.join(tot, Seq("source"))
      .groupBy(col("source"), col("n"), col("np"))
      .agg(
        min(when(col("cum") >= expr("(50 * n + 99) DIV 100"), col("nt")))
          .as("p50_tokens"),
        min(when(col("cum") >= expr("(90 * n + 99) DIV 100"), col("nt")))
          .as("p90_tokens"))
      .select(col("source"), col("n").as("n_docs"),
        col("p50_tokens"), col("p90_tokens"),
        expr("(100 * np) DIV n").as("quality_pct"))
      .orderBy(col("source"))
  }

  def q76Sql: String =
    s"""WITH m AS (
       |  SELECT source,
       |    CAST(len(${graft.Tok.sqlText}) AS INT) AS nt,
       |    CASE WHEN len(${graft.Tok.sqlText}) >= ${Curation.MinTokens}
       |      AND len(list_filter(${graft.Tok.sqlText},
       |            x -> x IN ('the', 'a', 'of', 'and', 'to', 'in')))::DOUBLE
       |          / len(${graft.Tok.sqlText}) >= ${Curation.MinStopRatio}
       |      THEN 1 ELSE 0 END AS pass
       |  FROM documents
       |), h AS (
       |  SELECT source, nt, count(*) AS c FROM m GROUP BY source, nt
       |), cum AS (
       |  SELECT source, nt,
       |    sum(c) OVER (PARTITION BY source ORDER BY nt) AS cum
       |  FROM h
       |), tot AS (
       |  SELECT source, count(*) AS n, CAST(sum(pass) AS BIGINT) AS np
       |  FROM m GROUP BY source
       |)
       |SELECT t.source, t.n AS n_docs,
       |  CAST(min(CASE WHEN cum >= (50 * t.n + 99) // 100 THEN nt END) AS INT) AS p50_tokens,
       |  CAST(min(CASE WHEN cum >= (90 * t.n + 99) // 100 THEN nt END) AS INT) AS p90_tokens,
       |  (100 * t.np) // t.n AS quality_pct
       |FROM cum JOIN tot t USING (source)
       |GROUP BY t.source, t.n, t.np ORDER BY t.source""".stripMargin
}
