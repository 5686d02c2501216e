package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Deterministic sampling and dataset splitting — the two selection
  * operators every training-data pipeline runs before anything else:
  * "sample X‰ per stratum" and "assign every record to train/val/test,
  * stably". Both are pure per-row hash arithmetic (the shared 48-bit md5
  * prefix primitive, [[Dedup.hex12]]): no RNG, no state, no shuffle until
  * the terminal aggregate — at 100 TB they pipeline inside the scan's
  * codegen stage and the only exchange carries the per-stratum summary
  * rows. Determinism is the point: re-running the pipeline, on any
  * cluster, at any parallelism, selects the SAME rows (the salt string
  * namespaces each use so sampling and splitting are independent draws).
  */
object Sampling {

  /** Per-mille sampling rate by language — the stratification knob: keep
    * more of the rare strata, thin the dominant one. */
  private def rateCol = when(col("lang") === "en", lit(200)).otherwise(lit(500))

  // ---------------------------------------------------------------- q49

  /** Stratified deterministic sample: keep a doc iff the 48-bit hash of
    * its salted id falls under the stratum's per-mille rate; summarize
    * per stratum. The filter is a pure projection over the scan;
    * `sample_rate_pm` makes the contract visible in the output. */
  def q49StratifiedSample(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("h",
        Dedup.hex12(concat(lit("smp_"), col("doc_id").cast("string"))) % 1000)
      .filter(col("h") < rateCol)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_sampled"),
        min(col("doc_id")).as("min_id"),
        max(col("doc_id")).as("max_id"),
        sum(length(col("text")).cast("long")).as("sampled_chars"))
      .withColumn("sample_rate_pm", rateCol.cast("int"))
      .orderBy(col("lang"))

  def q49Sql: String =
    """WITH h AS (
      |  SELECT doc_id, lang, text,
      |    ('0x' || substr(md5('smp_' || doc_id), 1, 12))::BIGINT % 1000 AS h,
      |    CASE WHEN lang = 'en' THEN 200 ELSE 500 END AS rate
      |  FROM documents
      |)
      |SELECT lang, count(*) AS n_sampled,
      |  min(doc_id) AS min_id, max(doc_id) AS max_id,
      |  CAST(sum(len(text)) AS BIGINT) AS sampled_chars,
      |  CAST(CASE WHEN lang = 'en' THEN 200 ELSE 500 END AS INT) AS sample_rate_pm
      |FROM h WHERE h < rate
      |GROUP BY lang ORDER BY lang""".stripMargin

  // ---------------------------------------------------------------- q50

  /** Deterministic train/val/test split (80/10/10 by hash bucket): every
    * doc lands in exactly one split, stable across runs and clusters —
    * the property random splits lose the moment data is re-partitioned.
    * Output: per (lang, split) counts + char volume. */
  def q50HashSplit(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("b",
        Dedup.hex12(concat(lit("spl_"), col("doc_id").cast("string"))) % 100)
      .withColumn("split",
        when(col("b") < 80, "train").when(col("b") < 90, "val").otherwise("test"))
      .groupBy(col("lang"), col("split"))
      .agg(count(lit(1)).as("n_docs"),
        sum(length(col("text")).cast("long")).as("n_chars"))
      .orderBy(col("lang"), col("split"))

  def q50Sql: String =
    """WITH b AS (
      |  SELECT doc_id, lang, text,
      |    ('0x' || substr(md5('spl_' || doc_id), 1, 12))::BIGINT % 100 AS b
      |  FROM documents
      |)
      |SELECT lang,
      |  CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split,
      |  count(*) AS n_docs, CAST(sum(len(text)) AS BIGINT) AS n_chars
      |FROM b
      |GROUP BY 1, 2 ORDER BY lang, split""".stripMargin
}
