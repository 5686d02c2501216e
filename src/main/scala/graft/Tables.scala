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
    // Spill readers need no read-ahead double-buffer: the r9 sf10 q27
    // wall OOM'd the 8 GB heap in exactly those threads (a spill MERGE
    // opens every spill file at once — 32 tasks × hundreds of files ×
    // 2 MB each), and disabling read-ahead halves that constant at zero
    // cost to spill-free fixture runs. The other half of the fix is
    // [[initPartsFor]]: fewer spill files per task in the first place.
    "spark.unsafe.sorter.spill.read.ahead.enabled" -> "false",
    // localCheckpoint blocks (the iterative solvers' per-round pins, the
    // minhash/simhash signature stages) are freed only when the driver GCs
    // the superseded RDD object and the ContextCleaner then drops its
    // blocks — catalog.clearCache() cannot touch them. Spark's safety net
    // for exactly this lag is a periodic driver GC, but its default period
    // is 30 min: a long session accumulates every pin it ever made before
    // the first sweep (the r10 sf10 refresh bench heap-OOM'd in q54 at
    // minute 30, on code whose quiet-box twin had just passed). 5 min
    // bounds the accumulation window at no measurable steady-state cost.
    "spark.cleaner.periodicGC.interval" -> "5min")

  /** Shuffle start-granularity for a corpus dir — the scale half of the
    * sf10 spill-merge fix. Fixture-scale inputs keep core-count
    * partitioning (32: AQE coalescing from anything finer taxes every
    * multi-stage query ~30% in stage overhead — measured on the r10
    * bench); at GB+ inputs shuffles START at 512 AQE partitions so a
    * bounded heap sees bounded per-task shuffle input and the spill
    * merge opens dozens of files, not hundreds (AQE still coalesces
    * small stages back to size). Every main that knows its corpus dir
    * passes this through; SPARK_GRAFT_INIT_PARTS overrides for
    * measurement. On a real cluster the same dial is per-job
    * configuration — this is the single-box automation of it. */
  def initPartsFor(dir: String): String =
    sys.env.getOrElse("SPARK_GRAFT_INIT_PARTS", {
      val sz =
        try {
          val p = java.nio.file.Paths.get(dir)
          if (!java.nio.file.Files.isDirectory(p)) 0L
          else {
            val s = java.nio.file.Files.list(p)
            try s.mapToLong { f =>
              try java.nio.file.Files.size(f) catch { case _: Throwable => 0L }
            }.sum
            finally s.close()
          }
        } catch { case _: Throwable => 0L }
      if (sz > (1L << 30)) "512" else "32"
    })

  /** The config key [[initPartsFor]] feeds. */
  val InitPartsKey = "spark.sql.adaptive.coalescePartitions.initialPartitionNum"

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
