package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sketch-based corpus telemetry — the mergeable-summary layer a 100 TB
  * corpus is actually monitored with. Exact per-source distinct-token
  * counts need a corpus-wide `(source, token)` distinct (one giant
  * exchange per report); the sketch form computes a fixed-size
  * DataSketches HLL per source ONCE, and every later consumer — daily
  * rollups, shard-level reports, cross-source unions, trend deltas —
  * works from kilobyte sketches instead of re-scanning text. Union is
  * register-wise max: associative, commutative, partition-invariant —
  * the same algebra [[graft.streaming.StateDir]] exploits for its
  * delta tables, which is what makes the sketch column SAFE to maintain
  * incrementally (append a batch sketch, union on read).
  *
  * No DuckDB oracle can exist (engines disagree on sketch internals), so
  * the contract is spec-pinned instead: estimates within the published
  * HLL error envelope of exact, and the merged estimate IDENTICAL under
  * any sharding of the input (TelemetrySpec).
  */
object Telemetry {

  /** log2 of HLL registers — 2^12 registers ≈ 1.6% relative standard
    * error, ~2.5 KiB dense: the standard telemetry operating point. */
  private[operators] val LgK = 12

  /** One row per source: doc count, token count, and the HLL sketch of
    * the distinct token set (binary, mergeable). One map-side-combinable
    * aggregation — the corpus streams through once, the exchange carries
    * |sources| sketch rows. */
  def sourceSketches(docs: DataFrame): DataFrame =
    docs
      .select(col("source"), col("doc_id"),
        explode(graft.Tok.toksText).as("tok"))
      .groupBy(col("source"))
      .agg(
        count_distinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_tokens"),
        hll_sketch_agg(col("tok"), lit(LgK)).as("tok_sketch"))

  /** Serve estimates from a sketch table — no text re-scan. */
  def estimates(sketches: DataFrame): DataFrame =
    sketches.withColumn("distinct_tokens_est",
      hll_sketch_estimate(col("tok_sketch")))

  /** Merge per-shard sketch tables (same grouping) into one — the
    * incremental-maintenance read path: daily shards, stream batches, or
    * cluster partitions union into the corpus-level sketch without
    * touching a document. */
  def mergeSketches(shards: DataFrame): DataFrame =
    shards.groupBy(col("source"))
      .agg(
        sum(col("n_docs")).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        hll_union_agg(col("tok_sketch"), lit(false)).as("tok_sketch"))

  /** Corpus-wide rollup across ALL sources from sketches alone. */
  def corpusRollup(sketches: DataFrame): DataFrame =
    sketches.agg(
      sum(col("n_docs")).as("n_docs"),
      sum(col("n_tokens")).as("n_tokens"),
      hll_sketch_estimate(
        hll_union_agg(col("tok_sketch"), lit(true))).as("distinct_tokens_est"))
}
