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

  /** Cluster master for the entry-point mains. `SPARK_GRAFT_MASTER`
    * overrides the default `local[cpus]` — the multi-JVM evidence dial:
    * `local-cluster[2,16,4096]` runs the IDENTICAL gate/bench with two
    * separate executor processes, real serialization of every closure and
    * `graft_*` expression, real network shuffle and broadcast. When the
    * override is a local-cluster master the executors are fresh JVMs with
    * no sbt classpath, so this also wires `spark.executor.extraClassPath`
    * to wherever THIS class was loaded from (classes dir or jar — works
    * under sbt runMain and plain `java -cp` alike) and sizes
    * `spark.executor.memory` to the per-worker MiB from the master string
    * (executors default to 1g otherwise, no matter what the worker owns).
    * Requires `SPARK_HOME` in the environment (the in-process Worker
    * shells out to it to launch executor JVMs). */
  def configureMaster(b: SparkSession.Builder, cpus: String): SparkSession.Builder = {
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]")
    b.master(master)
    if (master.startsWith("local-cluster")) {
      val classesHere =
        new java.io.File(getClass.getProtectionDomain.getCodeSource
          .getLocation.toURI).getAbsolutePath
      b.config("spark.executor.extraClassPath", classesHere)
      val memMiB = master.stripPrefix("local-cluster[").stripSuffix("]")
        .split(",")(2).trim
      b.config("spark.executor.memory", s"${memMiB}m")
    }
    b
  }

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
    // AQE rewrites a sort-merge join to a shuffled-hash join when every
    // post-shuffle partition of the build side is at or below this bound
    // (guide §3.1) — the bound is per-partition, so the hash map a task
    // builds is ≤64 MB by construction at ANY corpus size (the OOM risk
    // that makes blanket preferSortMergeJoin=false dangerous does not
    // apply; partitions above the bound keep the spilling sort-merge).
    // Default 0 = off. A/B-measured this round: see OPTIMIZATION_r16.md.
    "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold" -> "64m",
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
    sys.env.getOrElse("SPARK_GRAFT_INIT_PARTS",
      if (dirBytes(dir) > (1L << 30)) "512" else "32")

  /** Total bytes under `dir`, depth 2: Spark-written tables are
    * DIRECTORIES of part files — a flat listing would size them at 0 and
    * a multi-GB corpus would silently keep the fixture dials. */
  private def dirBytes(dir: String): Long =
    try {
      val p = java.nio.file.Paths.get(dir)
      if (!java.nio.file.Files.isDirectory(p)) 0L
      else {
        // FOLLOW_LINKS: corpora often arrive as symlinks to a mounted
        // volume; without it a symlinked dir sizes as 0 and every
        // corpus-adaptive dial silently stays at fixture defaults.
        // walkFileTree (not Files.walk): walk() surfaces a detected
        // symlink CYCLE as a thrown FileSystemLoopException, which an
        // outer catch would turn into 0 for the WHOLE directory — the
        // exact silent-fixture-default failure this sizing exists to
        // prevent. The visitor instead skips the one bad entry
        // (visitFileFailed → CONTINUE) and keeps summing siblings.
        import java.nio.file.{FileVisitResult, Files, Path, SimpleFileVisitor}
        import java.nio.file.attribute.BasicFileAttributes
        var total = 0L
        Files.walkFileTree(
          p,
          java.util.EnumSet.of(java.nio.file.FileVisitOption.FOLLOW_LINKS),
          2,
          new SimpleFileVisitor[Path] {
            override def visitFile(f: Path, a: BasicFileAttributes) = {
              if (a.isRegularFile) total += a.size()
              FileVisitResult.CONTINUE
            }
            override def visitFileFailed(f: Path, e: java.io.IOException) =
              FileVisitResult.CONTINUE // loop/IO error: skip entry, not dir
            override def postVisitDirectory(d: Path, e: java.io.IOException) =
              FileVisitResult.CONTINUE
          })
        total
      }
    } catch { case _: Throwable => 0L }

  /** The config key [[initPartsFor]] feeds. */
  val InitPartsKey = "spark.sql.adaptive.coalescePartitions.initialPartitionNum"

  /** Scan-split granularity for a corpus dir — the SCAN-side sibling of
    * [[initPartsFor]]'s shuffle dial, added when sf30 found the next
    * single-box wall: a >4 GiB corpus at the default 128 MB splits gives
    * each of 32 concurrent scan tasks a ~0.5 GB sort input, and the big
    * equi-join's pre-SMJ sorts exhaust the 8 GB heap's execution pool
    * faster than they can spill (q34 at sf30:
    * `UNABLE_TO_ACQUIRE_MEMORY ... got 0` in UnsafeExternalSorter).
    * 32 MB splits bound per-task sort input 4× lower — measured: q34 at
    * sf30 FAILS at 128 MB and runs 21.7 s at 32 MB, same heap. Fixture
    * and sf10-scale dirs keep Spark's default (sf10 passes at 128 MB;
    * finer splits only add scheduler overhead there). On a real cluster
    * this is per-executor sizing — split bytes × task slots must fit the
    * executor's execution pool; this constant automates the 32-core/8 GB
    * single-box shape. SPARK_GRAFT_SCAN_MB overrides for measurement. */
  def scanSplitFor(dir: String): String = {
    val mb = sys.env.get("SPARK_GRAFT_SCAN_MB").map(_.toLong).getOrElse {
      if (dirBytes(dir) > (4L << 30)) 32L else 128L
    }
    (mb << 20).toString
  }

  /** The config key [[scanSplitFor]] feeds. */
  val ScanSplitKey = "spark.sql.files.maxPartitionBytes"

  /** Corpus-adaptive SHUFFLE parallelism — the sf100 wall's dial, same
    * doctrine as [[scanSplitFor]]: per-task execution memory is what a
    * single box runs out of first, and at fixed parallelism the per-task
    * sort input grows with the corpus (the near-dup pair graph grows
    * ~N^1.39 on the synthetic generator — at sf100 its attach-join sorts
    * exceed 32 tasks × the 16 GB pool: `UNABLE_TO_ACQUIRE_MEMORY, got
    * 0`). >4 GiB corpora shuffle at 4× the core count so each sort task
    * holds ~¼ the rows; AQE coalesces the small stages' post-shuffle
    * partitions back down, so fixture-scale plans and recorded sf0.1–sf10
    * numbers are untouched (those dirs stay at the core count). The
    * threshold was 16 GiB through r13; r14 aligned it with the other two
    * at-scale dials after the sf30 pair-graph attach sorts proved
    * BORDERLINE at 32 parts — 3 of 5 cold `CcDecompose` runs died in the
    * attach stage with `UNABLE_TO_ACQUIRE_MEMORY` on an otherwise-quiet
    * box, while 128 parts ran clean at parity-to-faster (pairs 92.9 s vs
    * the 32-part best 91.0; CC rounds 138.4 vs 142.2 — BASELINE §r14). A
    * coin-flip OOM is a wall, not a price. On a real cluster this is the
    * standard partitions ≈ bytes/128 MB sizing; the constant automates
    * the single-box shape. SPARK_GRAFT_SHUFFLE_PARTS overrides for
    * measurement. */
  def shufflePartsFor(dir: String, cpus: String): String =
    sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTS",
      if (dirBytes(dir) > (4L << 30)) (cpus.toInt * 4).toString else cpus)

  /** Pair-graph pre-flight ceiling (fourth corpus dial, r13): for >16 GiB
    * corpora — the scale at which the sf100 probe watched q20 fill 49 GB
    * of sort scratch and die at 98 % disk (BASELINE §r12) — set
    * [[graft.operators.Dedup.MaxPairsConf]] from the local scratch
    * volume's free space at ~200 B per candidate pair slot, so the
    * pair-graph queries forecast their volume from the bucket stats and
    * fail in seconds with sizing advice instead of after an hour of
    * shuffle. Fixture and sf30-scale dirs (≤16 GiB) emit nothing: no
    * pre-flight job, recorded numbers untouched. SPARK_GRAFT_MAX_PAIRS
    * overrides the ceiling for measurement. */
  def pairsCeilingFor(dir: String): Seq[(String, String)] = {
    val ceil: Option[String] = sys.env.get("SPARK_GRAFT_MAX_PAIRS")
      .orElse {
        if (dirBytes(dir) > (16L << 30)) {
          val scratch = sys.env.get("SPARK_LOCAL_DIRS")
            .orElse(sys.env.get("SPARK_GRAFT_SCRATCH"))
            .getOrElse(System.getProperty("java.io.tmpdir"))
            .split(",").head
          Some((new java.io.File(scratch).getUsableSpace / 200L).toString)
        } else None
      }
    ceil.map(graft.operators.Dedup.MaxPairsConf -> _).toSeq
  }

  /** Pair-graph band sharding (fifth corpus dial, r13): >4 GiB corpora
    * run [[graft.operators.Dedup.BandShardsConf]]=2 — the sf30 A/B
    * (BASELINE §r13) measured the two-pass form ~10 % FASTER on q20
    * (half-size attach sorts spill less than one big pass) and neutral on
    * q54, with bit-identical output in every run, while bounding peak
    * sort scratch at ~1/2 (the sf100 disk wall's biggest addend).
    * Fixture and sf10-scale dirs keep the recorded single-pass plan.
    * SPARK_GRAFT_BAND_SHARDS overrides for measurement. */
  def bandShardsFor(dir: String): Seq[(String, String)] = {
    val v = sys.env.get("SPARK_GRAFT_BAND_SHARDS")
      .orElse {
        // The sharding bounds the PACKED attach's pair-proportional sort
        // scratch (BASELINE §r13). The r16 inline attach has no such
        // sort — its only pair-grain exchange carries post-threshold
        // survivors — and the sf30 sweep measured one-pass inline
        // fastest (pairs_solve 42.6 s at shards=1 vs 47–54 s at 2,
        // 48.7 s at 4), so the dial engages only for the packed/plain
        // A/B arms.
        if (graft.operators.Dedup.defaultSigAttach != "inline" &&
            dirBytes(dir) > (4L << 30)) Some("2") else None
      }
    v.map(graft.operators.Dedup.BandShardsConf -> _).toSeq
  }

  /** All corpus-adaptive session dials, ready for `builder.config`.
    * `cpus` seeds the shuffle-partition floor (the session default) — no
    * default value on purpose: a caller that sets its own partition count
    * and then applies these configs would have it silently overridden by
    * a hardcoded 32 (the r12 advisor found six tools doing exactly that). */
  def corpusConfigs(dir: String, cpus: String): Seq[(String, String)] = Seq(
    InitPartsKey -> initPartsFor(dir),
    ScanSplitKey -> scanSplitFor(dir),
    "spark.sql.shuffle.partitions" -> shufflePartsFor(dir, cpus)) ++
    pairsCeilingFor(dir) ++ bandShardsFor(dir)

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
  def documents(s: SparkSession, d: String): DataFrame =
    spreadIfNarrow(s, d, "documents", "doc_id")
  def embeddings(s: SparkSession, d: String): DataFrame =
    spreadIfNarrow(s, d, "embeddings", "vec_id")

  /** CPU-follows-cores for the corpus tables. documents/embeddings are
    * byte-light but feed the engine's CPU-dense kernels (codec synth +
    * decode, shingling, minhash, vector math) — and a parquet ROW GROUP
    * is the scan atom: a single-file export written as one row group
    * (pyarrow's default up to 1Mi rows — exactly the fixture shape) caps
    * every head stage at ONE task no matter how maxPartitionBytes or AQE
    * are set. Measured at sf10: q94's decode kernel ran 500k docs on one
    * core (72 s) while 31 sat idle.
    *
    * The trigger is the real constraint, read from the parquet footers:
    * total row groups < defaultParallelism ⇒ the scan cannot fill the
    * machine ⇒ repartition on the table's key (hash, not round-robin:
    * deterministic placement, no sort-before-repartition pass, and
    * downstream per-key stages see a co-partitioned input) to 2× cores.
    * A warehouse-scale table (many files / row groups — the 100 TB
    * layout) fails the trigger and reads exactly as before: this is a
    * rescue for degenerate layouts, not a tax on good ones. The decision
    * caches per (dir, table): footers are read once per session, and
    * every query in a session sees the SAME analyzed plan — which the
    * StagedCache shared builds require to dedupe. */
  private def spreadIfNarrow(s: SparkSession, d: String, name: String,
      key: String): DataFrame =
    rescueNarrowScan(s, s"$d/$name.parquet", key)

  /** The general form of the corpus-reader rescue, for any parquet path
    * holding a CPU-kernel input (e.g. the q100 stored-media table): scan,
    * and repartition on `key` iff the layout cannot fill the machine. */
  def rescueNarrowScan(s: SparkSession, path: String, key: String): DataFrame = {
    val df = s.read.parquet(path)
    val cores = s.sparkContext.defaultParallelism
    val narrow = spreadCache.computeIfAbsent(path,
      p => java.lang.Boolean.valueOf(narrowLayout(p, cores)))
    if (narrow)
      df.repartition(cores * 2, org.apache.spark.sql.functions.col(key))
    else df
  }

  private val spreadCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()

  /** True iff the table's layout cannot fill the machine AND the table
    * is big enough for the rescue to pay: fewer than `limit` row groups
    * in total (early exit at the limit — a warehouse table with
    * thousands of files never reads more than a handful of footers) and
    * at least [[Dials.SpreadMinRows]] rows (below it the exchange costs
    * more scheduler time than the kernel it parallelizes — smoke/gate
    * fixtures keep their plans). Footers are read with the
    * parquet-hadoop classes Spark itself scans with; any read failure
    * degrades to false (no spread, plan as-is). */
  private def narrowLayout(path: String, limit: Int): Boolean =
    try {
      val conf = new org.apache.hadoop.conf.Configuration()
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(conf)
      val files: Seq[org.apache.hadoop.fs.FileStatus] =
        if (fs.isFile(p)) Seq(fs.getFileStatus(p))
        else fs.listStatus(p).toSeq
          .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      var groups = 0
      var rows = 0L
      val it = files.iterator
      while (groups < limit && it.hasNext) {
        val in = org.apache.parquet.hadoop.util.HadoopInputFile
          .fromStatus(it.next(), conf)
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try { groups += r.getFooter.getBlocks.size(); rows += r.getRecordCount }
        finally r.close()
      }
      groups < limit && rows >= Dials.SpreadMinRows
    } catch { case scala.util.control.NonFatal(_) => false }
}
