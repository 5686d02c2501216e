package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the driver-generated parquet fixture tables (TESTDATA.md).
  *
  * All engine queries take the scale-factor directory as a parameter so the
  * same plan runs at sf0.001 (smoke), sf0.01 (correctness) and sf0.1 (bench)
  * — and, unchanged, against a cluster-scale warehouse path: the reads are
  * plain parquet scans, so Catalyst pushes filters/projections into the scan
  * and partition pruning applies when the tables are written partitioned.
  */
object Tables {
  def read(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Session settings every graft entry point applies. The nanos flag makes
    * Spark read parquet TIMESTAMP(NANOS) columns (events.ts) as LongType
    * instead of failing; [[events]] rebuilds a microsecond TimestampType
    * from it with exact integer arithmetic. The NTZ flag makes naive
    * (no-timezone) parquet timestamps read as TIMESTAMP (LTZ) rather than
    * TIMESTAMP_NTZ: with the session timezone pinned to UTC the epoch values
    * are identical, every epoch-based function (unix_millis, window,
    * session_window) stays applicable, and the semantics match the DuckDB
    * oracle, which treats naive timestamps as-written. */
  val sessionConfigs: Seq[(String, String)] = Seq(
    "spark.sql.legacy.parquet.nanosAsLong" -> "true",
    "spark.sql.parquet.inferTimestampNTZ.enabled" -> "false",
    "spark.sql.session.timeZone" -> "UTC",
    "spark.sql.adaptive.enabled" -> "true",
    // Big shuffles START fine-grained and AQE coalesces the small ones
    // back down (target spark.sql.shuffle.partitions stays the core
    // count): at 100× fixture scale a 32-way shuffle stage hands each
    // task GBs, which under a bounded heap degenerates into hundreds of
    // tiny sorter spills per task — and the spill-MERGE phase then OOMs
    // on its per-file read-ahead buffers (the r9 sf10 q27 wall: Java
    // heap exhausted in "read-ahead" threads, not in the sort itself).
    // 512 initial partitions keep per-task shuffle input bounded at any
    // measured sf while AQE keeps fixture-scale plans as coarse as
    // before — measured: sf10 q27 completes at the default 8 GB heap
    // with this dial, OOMs without it (BASELINE §sf10).
    "spark.sql.adaptive.coalescePartitions.initialPartitionNum" -> "512")

  def region(s: SparkSession, d: String): DataFrame   = read(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = read(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = read(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = read(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = read(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = read(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = read(s, d, "lineitem")
  /** events.ts is parquet timestamp[ns]; with nanosAsLong it arrives as a
    * Long. Rebuild a µs TimestampType via integer division (ns values are
    * ~1.7e18 — double arithmetic would lose precision, so DIV not "/"). */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = read(s, d, "events")
    if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts DIV 1000")))
    else raw
  }
  def documents(s: SparkSession, d: String): DataFrame = read(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = read(s, d, "embeddings")
}
