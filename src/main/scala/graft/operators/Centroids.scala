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

  // ---------------------------------------------------------------- q72

  /** Nearest-centroid confusion matrix — the label-quality audit: assign
    * every embedding to its nearest integer-milliunit class centroid and
    * cross-tabulate true label × predicted label. Off-diagonal mass names
    * the classes whose embedding clouds overlap — the signal that a
    * labeling pipeline (or the embedding model) is confusing two sources.
    *
    * Exactness: centroids are TRUNCATED integer milliunits (sum DIV n —
    * Spark's DIV and DuckDB's // both truncate toward zero, so the same
    * centroid on both engines even for negative sums); distances are
    * integer Σ(m−c)² computed by the EXACT decomposition Σm² − 2Σmc +
    * Σc² (integer adds associate — no summation-order contract needed),
    * and the argmin is a pure-integer min over d2·1000 + label
    * (labels < 1000) — no float compare, no tie ambiguity: equal
    * distances resolve to the lower label on both engines. The
    * milliunit quantization is the native [[graft.functions.Vectors
    * .milli]] (bit-equal to the `round(v·1000)` chain — pinned by
    * VectorExpressionsSpec) and the dots are native integer loops
    * ([[graft.functions.Vectors.dotl]]).
    *
    * Scale shape (r10 rewrite — measured 51.4 → 12.7 s cold / 9.6 warm
    * at sf10, ~4×; at sf0.1 both forms sit at the same sub-second
    * scheduling floor): the corpus streams as
    * |corpus| ROWS carrying milli-vectors, not |corpus|·dims exploded
    * rows — the distance stage is |corpus|·|labels| rows each doing one
    * codegen'd O(dims) integer dot, where the exploded form pushed
    * |corpus|·dims·|labels| rows through the row machinery for the
    * same flops. Only the centroid build explodes (map-side combined
    * to a bounded |labels|·dims exchange, then grouped to |labels|
    * array rows — the array_sort/transform HOFs run over that bounded
    * group only, the q40-Lloyd allowlist rationale). The centroid table
    * broadcast is |labels| rows; the per-vector argmin collapses to
    * |corpus|, the confusion rollup to |labels|². No window, no
    * data-scale join side. */
  def q72CentroidConfusion(s: SparkSession, d: String): DataFrame = {
    import graft.functions.Vectors
    val comp = Tables.embeddings(s, d)
      .select(col("vec_id"), col("label"), Vectors.milli(col("embedding")).as("marr"))
      .withColumn("sm2", Vectors.dotl(col("marr"), col("marr")))
    // exact per-dim truncated means: explode ONLY here (bounded output),
    // then regroup each label's dims into an ordered centroid vector
    val cent = Tables.embeddings(s, d)
      .select(col("label"), posexplode(Vectors.milli(col("embedding"))).as(Seq("idx", "m")))
      .groupBy(col("label").as("pred"), col("idx"))
      .agg(expr("CAST(sum(m) DIV count(*) AS BIGINT)").as("c"))
      .groupBy(col("pred"))
      .agg(expr("transform(array_sort(collect_list(struct(idx, c))), x -> x.c)")
        .as("carr"))
      .withColumn("sc2", Vectors.dotl(col("carr"), col("carr")))
    comp.crossJoin(broadcast(cent))
      .select(col("vec_id"), col("label"), col("pred"),
        (col("sm2") - lit(2L) * Vectors.dotl(col("marr"), col("carr")) + col("sc2"))
          .as("d2"))
      .groupBy(col("vec_id"), col("label"))
      .agg(min(col("d2") * 1000 + col("pred")).as("best"))
      .groupBy(col("label"), (col("best") % 1000).cast("int").as("pred"))
      .agg(count(lit(1)).as("n_vecs"),
        sum(expr("best DIV 1000")).as("sum_d2"))
      .orderBy(col("label"), col("pred"))
  }

  def q72Sql: String =
    """WITH e AS (
      |  SELECT vec_id, label, CAST(i - 1 AS INT) AS idx,
      |    CAST(round(CAST(embedding[CAST(i AS INT)] AS DOUBLE) * 1000) AS BIGINT) AS m
      |  FROM embeddings, unnest(generate_series(1, len(embedding))) AS g(i)
      |), cent AS (
      |  SELECT label AS pred, idx, CAST(sum(m) // count(*) AS BIGINT) AS c
      |  FROM e GROUP BY label, idx
      |), d AS (
      |  SELECT e.vec_id, e.label, cent.pred,
      |    CAST(sum((e.m - cent.c) * (e.m - cent.c)) AS BIGINT) AS d2
      |  FROM e JOIN cent USING (idx)
      |  GROUP BY e.vec_id, e.label, cent.pred
      |), a AS (
      |  SELECT vec_id, label, min(d2 * 1000 + pred) AS best
      |  FROM d GROUP BY vec_id, label
      |)
      |SELECT label, CAST(best % 1000 AS INT) AS pred,
      |  CAST(count(*) AS BIGINT) AS n_vecs,
      |  CAST(sum(best // 1000) AS BIGINT) AS sum_d2
      |FROM a GROUP BY label, best % 1000 ORDER BY label, pred""".stripMargin
}
