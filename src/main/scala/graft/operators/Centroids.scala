package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Per-label embedding centroids — class prototypes over the embeddings
  * table (the reduction the ANN family's IVF training does per cell,
  * exposed as a declared operator per label: nearest-centroid
  * classification, cluster summaries, drift reports all start here).
  *
  * Components are QUANTIZED to integer MILLIUNITS before summing
  * (round(v·1000) in exact int64) — float summation is
  * order-dependent, so a distributed sum of raw floats cannot
  * hash-match a single-threaded oracle; the integer sum is associative
  * and exact, and the served mean (int64 ÷ small count in IEEE double)
  * is bit-identical on both engines. Same portability doctrine as
  * q55/q62's quantized logs.
  *
  * Scale shape: explode ×dims → ONE map-side-combinable groupBy on
  * (label, idx) — partial sums collapse before the shuffle, so the
  * exchange carries |labels|·dims rows regardless of corpus size. No
  * window, no join, no driver-side vectors.
  */
object Centroids {

  // ---------------------------------------------------------------- q66

  /** One row per (label, dimension): member count, exact milliunit sum,
    * and the centroid component. */
  def q66LabelCentroids(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .select(col("label"), posexplode(col("embedding")).as(Seq("idx", "v")))
      .groupBy(col("label"), col("idx"))
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(round(CAST(v AS DOUBLE) * 1000, 0) AS BIGINT)"))
          .as("sum_milli"))
      .withColumn("centroid_milli",
        col("sum_milli").cast("double") / col("n"))
      .select(col("label"), col("idx"), col("n"), col("sum_milli"),
        col("centroid_milli"))
      .orderBy(col("label"), col("idx"))

  def q66Sql: String =
    """WITH e AS (
      |  SELECT label, CAST(i - 1 AS INT) AS idx,
      |    CAST(round(CAST(embedding[CAST(i AS INT)] AS DOUBLE) * 1000) AS BIGINT) AS m
      |  FROM embeddings, unnest(generate_series(1, len(embedding))) AS g(i)
      |)
      |SELECT label, idx, count(*) AS n, CAST(sum(m) AS BIGINT) AS sum_milli,
      |  CAST(sum(m) AS BIGINT)::DOUBLE / count(*) AS centroid_milli
      |FROM e GROUP BY label, idx ORDER BY label, idx""".stripMargin
}
