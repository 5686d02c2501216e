package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Embedding quantization report — the compression decision every
  * vector-store deployment makes: per-dimension min/max (asymmetric
  * affine) 8-bit codes, and the reconstruction error that quantization
  * costs each label. The serving question is "can this corpus drop to
  * int8 at 4× less memory?"; the answer is the per-label error envelope
  * this operator emits.
  *
  * Everything is exact integer arithmetic end-to-end (the q66 milliunit
  * doctrine): components quantize to int64 milliunits first, the code is
  * ((m − mn)·255) DIV range, the reconstruction is mn + (code·range) DIV
  * 255 — every operand non-negative; Spark's DIV and DuckDB's // both
  * truncate toward zero (so they agree on ALL signs, and trivially
  * here), and the distributed error sums are
  * associative and hash-exact against a serial oracle.
  *
  * Scale shape: pass 1 collapses the exploded components into |dims|
  * (min, max) rows via a map-side-combinable aggregate; the ranges table
  * is dimension-bounded (never corpus-proportional), so its broadcast
  * hint is legitimate; pass 2 re-scans, quantizes inside whole-stage
  * codegen, and collapses straight into |labels| error rows. No window,
  * no data-scale join side, two column-pruned parquet scans.
  */
object Quantize {

  private def components(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .select(col("label"), posexplode(col("embedding")).as(Seq("idx", "v")))
      .withColumn("m", expr("CAST(round(CAST(v AS DOUBLE) * 1000, 0) AS BIGINT)"))

  /** Per label: component count, total and max absolute reconstruction
    * error in milliunits under per-dim 8-bit affine quantization. */
  def q71QuantError(s: SparkSession, d: String): DataFrame = {
    val ranges = components(s, d)
      .groupBy(col("idx"))
      .agg(min(col("m")).as("mn"), max(col("m")).as("mx"))
    components(s, d)
      .join(broadcast(ranges), Seq("idx"))
      .withColumn("rng", col("mx") - col("mn"))
      .withColumn("code", expr(
        "CASE WHEN rng = 0 THEN CAST(0 AS BIGINT) " +
          "ELSE ((m - mn) * 255) DIV rng END"))
      .withColumn("recon", expr(
        "mn + CASE WHEN rng = 0 THEN CAST(0 AS BIGINT) " +
          "ELSE (code * rng) DIV 255 END"))
      .withColumn("err", abs(col("m") - col("recon")))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_comps"),
        sum(col("err")).as("sum_err_milli"),
        max(col("err")).as("max_err_milli"))
      .orderBy(col("label"))
  }

  def q71Sql: String =
    """WITH e AS (
      |  SELECT label, CAST(i - 1 AS INT) AS idx,
      |    CAST(round(CAST(embedding[CAST(i AS INT)] AS DOUBLE) * 1000) AS BIGINT) AS m
      |  FROM embeddings, unnest(generate_series(1, len(embedding))) AS g(i)
      |), r AS (
      |  SELECT idx, min(m) AS mn, max(m) AS mx FROM e GROUP BY idx
      |), q AS (
      |  SELECT e.label, e.m, r.mn, r.mx - r.mn AS rng,
      |    CASE WHEN r.mx - r.mn = 0 THEN 0
      |         ELSE ((e.m - r.mn) * 255) // (r.mx - r.mn) END AS code
      |  FROM e JOIN r USING (idx)
      |), x AS (
      |  SELECT label,
      |    abs(m - (mn + CASE WHEN rng = 0 THEN 0
      |                       ELSE (code * rng) // 255 END)) AS err
      |  FROM q
      |)
      |SELECT label, CAST(count(*) AS BIGINT) AS n_comps,
      |  CAST(sum(err) AS BIGINT) AS sum_err_milli,
      |  CAST(max(err) AS BIGINT) AS max_err_milli
      |FROM x GROUP BY label ORDER BY label""".stripMargin
}
