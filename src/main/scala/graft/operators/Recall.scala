package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Vectors

/** Family-neutral recall@k against exact brute-force ground truth — the
  * one definition of "recall" shared by the q106 row and every
  * [[graft.streaming.EvalStream]] monitor tick, parameterized ONLY by
  * the ranking metric the family actually serves under (cosine for
  * float-IVF/SQ8, squared-L2 for IVF-PQ — recall measured in a metric
  * the family doesn't rank by would under- or over-credit it whenever
  * vectors aren't unit-norm). Metric arithmetic is exact integers:
  * hits is a count, recall_milli = hits·1000 DIV k.
  */
object Recall {

  /** The exact-leg ordering a family is graded against — expression-
    * for-expression the SAME score its own serve plan re-ranks with
    * (cosine: q40/q102's `dot/sqrt(n2·n2)` descending; squared L2:
    * q92's `pn2 − 2·dot + n2` ascending), vec_id tie-break. */
  sealed trait Metric
  case object CosineDesc extends Metric
  case object L2Asc extends Metric

  /** Per-probe `(probe_id, hits, recall_milli)` of `served` (probe_id,
    * vec_id rows, ≤ k per probe) against the exact top-k of `base`
    * (vec_id, embedding, n2) under `metric`, probes = base rows
    * matching `probePred`, self excluded on both sides.
    *
    * Scale shape: ONE scan of the float base against a broadcast probe
    * set (|probes|·N scores) — the honest price of ground truth, paid
    * on an eval cadence; the intersection joins two ≤|probes|·k row
    * sides. */
  private[graft] def againstExact(base: DataFrame, served: DataFrame,
      probePred: Column, topK: Int, metric: Metric): DataFrame = {
    val probes = base.filter(probePred)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pe"),
        col("n2").as("pn2"))
    val scored = base.crossJoin(broadcast(probes))
      .filter(col("vec_id") =!= col("probe_id"))
    val (scoredCol, ord) = metric match {
      case CosineDesc =>
        (Vectors.dot(col("pe"), col("embedding")) /
          sqrt(col("pn2") * col("n2")), col("score").desc)
      case L2Asc =>
        (col("pn2") - lit(2.0) * Vectors.dot(col("pe"), col("embedding")) +
          col("n2"), col("score").asc)
    }
    val w = Window.partitionBy(col("probe_id")).orderBy(ord, col("vec_id"))
    val exact = scored
      .withColumn("score", scoredCol)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= topK)
      .select(col("probe_id"), col("vec_id"))
    exact.join(
        served.select(col("probe_id"), col("vec_id"), lit(1L).as("hit")),
        Seq("probe_id", "vec_id"), "left")
      .groupBy(col("probe_id"))
      .agg(sum(coalesce(col("hit"), lit(0L))).as("hits"))
      .withColumn("recall_milli", expr(s"hits * 1000 DIV $topK"))
      .orderBy(col("probe_id"))
  }
}

/** An [[AnnIndex]] family whose served answers can be recall-graded
  * against its own retained float base — the capability
  * [[graft.streaming.EvalStream]] monitors through. All four tables it
  * needs already exist in every family (each keeps exact floats for
  * its re-rank stage); the trait only exposes them uniformly. */
trait RecallEvaluable { this: AnnIndex =>

  /** Served top-k for an ARBITRARY probe predicate — the family's
    * production serve plan with the probe filter swapped (each family's
    * range-form `query` delegates to the same plan, so family specs'
    * serve ≡ inline pins cover this form too). Must emit at least
    * (probe_id, vec_id) with ≤ `topK` rows per probe. */
  def queryWhere(probePred: Column, topK: Int): DataFrame

  /** The exact float base serving re-ranks against:
    * (vec_id, embedding, n2) — assignment table for the IVF families,
    * floats table for SQ8. */
  def floatBase: DataFrame

  /** The metric this family ranks by (see [[Recall.Metric]]). */
  def metric: Recall.Metric
}
