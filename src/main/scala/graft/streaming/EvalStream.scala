package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.{AnnIndex, Recall, RecallEvaluable}

/** Continuous INDEX-QUALITY monitoring — the metric-side complement of
  * [[DriftStream]]: where drift watches the corpus DISTRIBUTION (a
  * leading proxy — "the data changed, the quantizer is probably stale"),
  * EvalStream measures the consequence a retrieval deployment actually
  * cares about: the recall@k of the SERVED index against exact brute
  * force, sampled on an eval cadence over a fixed canary probe set. Each
  * [[evalTick]] appends one `(tick_id, n_vectors, n_probes, hits,
  * recall_milli)` row — a time series an operator alarms on the way
  * [[DriftStream.shouldRetrain]] thresholds Δppm.
  *
  * FAMILY-GENERIC, like the ingest fabric it monitors: any
  * [[graft.operators.AnnIndex]] mixing in
  * [[graft.operators.RecallEvaluable]] (all three ANN families — float
  * IVF, IVF-PQ, SQ8) gets the identical monitor, graded in the metric
  * the family actually ranks by (cosine / squared-L2 — see
  * [[Recall.Metric]]), through [[Recall.againstExact]] — the SAME core
  * behind the declared q106 row, so the monitor and the query can never
  * disagree about what "recall" means.
  *
  * Metric arithmetic is exact integers end-to-end: hits is a count,
  * corpus recall_milli = hits·1000 DIV (n_probes·k) — the micro-mean
  * over probes (ties every probe's weight to its own hit count, so the
  * tick is reproducible from the ledger row alone).
  *
  * Scale shape: the served leg is the family's production probe plan
  * over the persisted tables; the exact leg is ONE scan of the float
  * base against a broadcast canary set (|probes| is fixed by the
  * stride dial, so the scan does |probes|·N scores). That linear cost
  * is the honest price of ground truth — which is why it runs per TICK
  * (per retrain, per N ingest batches), not per query, and why the
  * probe set is a stride sample rather than the full corpus. Replay is
  * a no-op (tick_id guard, same contract as every ingest ledger); the
  * ledger lives in the MONITORED index's own StateDir, so each family's
  * quality series rides the family's state lifecycle.
  */
final class EvalStream(spark: SparkSession,
    val index: AnnIndex with RecallEvaluable,
    probeStride: Long = EvalStream.ProbeStride, topK: Int = EvalStream.TopK) {

  import EvalStream._

  require(probeStride > 0,
    s"probeStride must be positive (got $probeStride): vec_id % 0 is null " +
      "for every row, so each tick would record n_probes=0 / recall_milli=0 " +
      "and an --eval-floor would force a warm rebuild on every cadence")
  require(topK > 0, s"topK must be positive (got $topK)")

  private def state = index.state

  /** Measure the served index's recall NOW and append one ledger row.
    * Idempotent on `tickId`; refuses a torn/unbuilt index the same way
    * every serve path does. */
  def evalTick(tickId: Long): Unit = state.locked {
    require(index.isBuilt,
      "index not built (or a rebuild was torn) — nothing to evaluate")
    val replayed = state.exists(Table) &&
      !state.read(Table, Schema).filter(col("tick_id") === tickId).isEmpty
    if (!replayed) {
      val base = index.floatBase
      // refuse a corrupted base LOUDLY: AnnIndex.addBatch's contract is
      // NEW ids only — a re-ingested id duplicates its row here, and
      // recall over a double-counted corpus silently inflates past 1000
      // (each duplicate probe doubles its exact list and its hit
      // credit). One column-pruned pass; the ids never leave executors.
      val counts = base.agg(count(lit(1)).as("n"),
        count_distinct(col("vec_id")).as("nd")).collect()(0)
      require(counts.getLong(0) == counts.getLong(1),
        s"float base carries duplicate vec_ids (${counts.getLong(0)} rows, " +
          s"${counts.getLong(1)} distinct) — an ingest re-added existing " +
          "ids; recall over a double-counted corpus would be meaningless")
      val probePred = col("vec_id") % probeStride === 0
      val per = Recall.againstExact(base,
        index.queryWhere(probePred, topK)
          .select(col("probe_id"), col("vec_id")),
        probePred, topK, index.metric)
      val row = per.agg(
          count(lit(1)).as("n_probes"),
          coalesce(sum(col("hits")), lit(0L)).as("hits"))
        .select(lit(tickId).as("tick_id"),
          lit(counts.getLong(0)).as("n_vectors"),
          col("n_probes"), col("hits"),
          when(col("n_probes") > 0,
              expr(s"hits * 1000 DIV (n_probes * $topK)"))
            .otherwise(lit(0L)).as("recall_milli"))
      state.append(Table, row)
    }
  }

  /** The quality time series, one row per tick, oldest first (empty
    * before the first tick). */
  def report: DataFrame =
    (if (state.exists(Table)) state.read(Table, Schema)
     else spark.createDataFrame(
       java.util.Collections.emptyList[org.apache.spark.sql.Row](), Schema))
      .orderBy(col("tick_id"))

  /** The measured retrain trigger — true when the LATEST tick's corpus
    * recall fell below `floorMilli`. The lagging twin of
    * [[DriftStream.shouldRetrain]]: drift says "the data moved", this
    * says "and quality actually suffered". */
  def degraded(floorMilli: Long): Boolean =
    state.exists(Table) && report.orderBy(col("tick_id").desc).limit(1)
      .collect().headOption.exists(_.getAs[Long]("recall_milli") < floorMilli)
}

object EvalStream {
  /** Canary probes: every `ProbeStride`-th vec_id present in the index
    * (capacity dial — scale guidance at [[graft.Dials.EvalProbeStride]]). */
  val ProbeStride: Long = graft.Dials.EvalProbeStride
  val TopK = 3

  val Table = "eval_ticks"
  val Schema: StructType = StructType(Seq(
    StructField("tick_id", LongType),
    StructField("n_vectors", LongType),
    StructField("n_probes", LongType),
    StructField("hits", LongType),
    StructField("recall_milli", LongType)))
}
