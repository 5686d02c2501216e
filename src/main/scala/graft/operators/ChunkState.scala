package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.Tables
import graft.streaming.{ChunkIngest, ImageBlock, ImageBlockCodec, JdbcIO, Sources, StateDir}

/** q108 — the DECLARED streaming row for the FORENSICS fabric: the
  * high-water-mark state a real [[graft.streaming.ChunkIngest]] run leaves
  * behind, under the driver's DuckDB hash gate. q107 gated the docs/dedup
  * pipeline; this row gates the reference's semantic heart — contiguous-
  * prefix HW advance, hash quarantine, batch replay, threshold/done
  * side effects (`StreamingApp.scala:223-256,395-489`) — which until r12
  * was suite-pinned only.
  *
  * Fixture (derived deterministically from `events`, so the oracle is pure
  * SQL over the fixture tables): every event below [[GateChunkCap]] is one
  * chunk — sequence = event_id (0-based contiguous), size = floor(value)+1
  * bytes (strictly
  * positive, so every arrival slice strictly advances the mark), payload =
  * that many 'a' bytes, producer hash = its real md5. Chunks arrive
  * OUT OF ORDER as four files (sequence % 4 → slice, delivered in slice
  * order via explicit mtimes), `maxFilesPerTrigger=1` → four micro-batches
  * through the production `ChunkIngest.start` stream; slice 0 additionally
  * carries a CORRUPT copy of chunk 2 (wrong producer hash — its good copy
  * only arrives in slice 2, so the mark must hold at the gap and the bad
  * row must quarantine, not ingest). A fifth file RE-DELIVERS slice 0
  * (corrupt extra included) in a second run over the same checkpoint: the
  * replay must change nothing.
  *
  * Declared result: the HW state row (previous, current, current_seq,
  * current_name, status) plus the chunk/quarantine counts. Every field is
  * load-bearing:
  *  - `current`/`current_seq`/`current_name`: the full contiguous prefix —
  *    wrong contiguity, a lost chunk, or a double-ingested replay moves it;
  *  - `previous`: the mark BEFORE the final advance = the prefix over
  *    slices {0,1,2} (sizes are strictly positive, so each of the first
  *    three batches advances and the fourth is the last advance — the
  *    TRAJECTORY is pinned, not just the endpoint);
  *  - `status = 1`: the completion threshold fired exactly once
  *    (imageSize = Σ sizes — reachable only if every chunk ingested);
  *  - `n_bad = 1`: the corrupt copy quarantined once, replay added nothing.
  */
object ChunkState {

  private val Slices = 4
  private val CorruptSeq = 2
  private val memo = new BuildMemo(4, "graft-chunk-state-")

  /** Gate-fixture bound: the chunk law takes the first `GateChunkCap`
    * events only. The laws this fixture gates (contiguity, quarantine,
    * replay, thresholds, the worker state machine) are scale-invariant —
    * 65 536 chunks exercise every one — while an UNCAPPED fixture made the
    * q108 one-time build the heaviest bench line at scale (422 s at sf30:
    * a full arrivals copy of a 30 M-chunk corpus through the production
    * ingest; r12 verdict item 7). The oracle mirrors the cap as a plain
    * `WHERE event_id < 65536`, so Spark and DuckDB derive the same corpus
    * at every sf; at the driver's sf0.01 gate (10 000 events) the cap is
    * vacuous and the declared values are unchanged. */
  private[operators] val GateChunkCap = 65536L

  /** Worker-drain dials (q110): four workers drain the released-file
    * queue; processing deterministically fails for file_id % 7 == 3, so
    * the error leg is exercised and SQL-derivable. */
  private val Workers = 4
  private val FailMod = 7L
  private val FailRem = 3L
  private val LedgerTable = "worker_ledger"

  /** The chunk law over events: (seq, size) with strictly positive sizes.
    * floor() — not a double→int cast — because Spark truncates and DuckDB
    * rounds; floor is exact in both. */
  private def chunkRows(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .filter(col("event_id") < GateChunkCap)
      .select(
        col("event_id").cast("long").as("seq"),
        (floor(col("value")) + 1).cast("int").as("size"))

  /** One avro-encoded-chunk parquet file per arrival slice, mtime-spaced
    * so the file source delivers slices in order. `extraCorrupt` appends
    * the wrong-hash copy of chunk [[CorruptSeq]]. */
  private def writeArrival(s: SparkSession, d: String, root: String,
      slice: Int, name: String, extraCorrupt: Boolean, mtimeMs: Long): Unit = {
    import java.nio.file.{Files, Paths}
    import s.implicits._
    val base = chunkRows(s, d).filter(col("seq") % Slices === slice)
      .select(concat(lit("img."), col("seq")).as("filename"),
        expr("cast(repeat('a', size) as binary)").as("data"))
      .withColumn("local_hash", md5(col("data")))
    val rows = if (extraCorrupt)
      base.unionByName(chunkRows(s, d).filter(col("seq") === CorruptSeq)
        .select(concat(lit("img."), col("seq")).as("filename"),
          expr("cast(repeat('a', size) as binary)").as("data"))
        .withColumn("local_hash", md5(concat(col("data"), lit("x")))))
    else base
    val stage = s"$root/stage"
    rows.select(col("filename"), col("local_hash"), col("data"))
      .as[(String, String, Array[Byte])]
      .map { case (f, h, bytes) => ImageBlockCodec.encode(ImageBlock(f, h, bytes)) }
      .toDF("value")
      .coalesce(1).write.mode("overwrite").parquet(stage)
    val part = Files.list(Paths.get(stage))
      .filter(p => p.getFileName.toString.startsWith("part-")
        && p.getFileName.toString.endsWith(".parquet"))
      .findFirst().orElseThrow()
    Files.createDirectories(Paths.get(s"$root/arrivals"))
    val dest = Paths.get(s"$root/arrivals/$name")
    Files.move(part, dest)
    Files.setLastModifiedTime(dest,
      java.nio.file.attribute.FileTime.fromMillis(mtimeMs))
  }

  /** Forensic side tables derived from the chunk law (FIXTURES.md §2
    * schemas): one regular file per chunk, whose single extent IS the
    * chunk's byte range — so the ingest's release query
    * ([[graft.streaming.ChunkIngest]] step 5, `Forensics.releasedBetween`)
    * enqueues file i in exactly the micro-batch whose HW window covers its
    * extent end, and the queue contents are a pure function of the chunk
    * law (q110's oracle). No `$MFT` row (the advance guard accepts on HW
    * growth alone, as before — q108's trajectory is untouched) and every
    * file has an extent (so the ¼-threshold resident enqueue stays empty).
    * The extent cumsum runs over one window partition, bounded by
    * [[GateChunkCap]]. */
  private def forensicTables(s: SparkSession, d: String):
      (DataFrame, DataFrame, DataFrame) = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(1)).orderBy(col("seq"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val layout = chunkRows(s, d).select(
      col("seq").as("obj_id"),
      (sum(col("size").cast("long")).over(w) - col("size")).as("byte_start"),
      col("size").cast("long").as("byte_len"))
    val files = chunkRows(s, d).select(
      col("seq").as("obj_id"), lit(0L).as("fs_obj_id"),
      concat(lit("f."), col("seq")).as("name"),
      lit("/").as("parent_path"), lit(5).as("dir_type"))
    val fsInfo = s.createDataFrame(Seq((0L, 0L))).toDF("obj_id", "img_offset")
    (files, layout, fsInfo)
  }

  /** One catch-up run of the production ingest stream: file source →
    * avro decode → ChunkIngest.start, AvailableNow + maxFilesPerTrigger=1
    * (one file per micro-batch), shared checkpoint across runs so the
    * second run processes exactly the newly-delivered files. Since r13 the
    * forensic side tables are REAL (one file per chunk — see
    * [[forensicTables]]), so each advancing batch releases + enqueues the
    * files its HW window covers: the queue q110 drains is produced by the
    * production release path, not seeded by the fixture. */
  private def runIngest(s: SparkSession, root: String, imageSize: Long,
      files: DataFrame, layout: DataFrame, fsInfo: DataFrame): Unit = {
    val raw = s.readStream
      .schema("value binary")
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$root/arrivals")
    val ingest = new ChunkIngest(s, new StateDir(s, s"$root/state"), imageSize,
      files = files, layout = layout, fsInfo = fsInfo)
    val q = ingest.start(Sources.decodeBlocks(raw), Trigger.AvailableNow(),
      s"$root/ckpt")
    q.awaitTermination()
  }

  /** q110's drain: four workers run the T8 poll loop over the released
    * queue — claim (0→1, `removed`), start (1→2, `started`), finish (2→3,
    * `finished`, error flag from the deterministic failure law) — and each
    * worker ledgers its claim batch through the single-transaction JDBC
    * protocol. Replay legs INSIDE the build: every ledger append is
    * immediately replayed (must no-op — double-fire detection), and a
    * second full poll round must claim nothing (lost-claim / reset
    * detection). The declared row then reads the end state, so a
    * double-claim, lost claim, or replayed double-fire lands in the
    * hash-compared counts. */
  private def drainQueue(s: SparkSession, root: String): Unit = {
    val wq = new graft.streaming.WorkQueue(s, new StateDir(s, s"$root/state"))
    val url = s"jdbc:derby:$root/ledger;create=true"
    (0 until Workers).foreach { w =>
      val ids = wq.pollOnce(w, Workers)(id => id % FailMod != FailRem)
      if (ids.nonEmpty) {
        require(JdbcIO.appendOnceLocal(ids, url, LedgerTable, w.toLong),
          s"worker $w: ledger append did not write")
        require(!JdbcIO.appendOnceLocal(ids, url, LedgerTable, w.toLong),
          s"worker $w: ledger replay double-fired")
      }
    }
    (0 until Workers).foreach { w =>
      require(wq.pollOnce(w, Workers)(_ => true).isEmpty,
        s"worker $w: drained queue re-claimed on replay")
    }
  }

  private def ensureBuilt(s: SparkSession, d: String): String = {
    val key = org.apache.spark.sql.graft.shims.sessionUUID(s) + ":" + d
    memo.get(key, BuildMemo.stampOf(d, "events.parquet")) { root =>
      val imageSize = chunkRows(s, d)
        .agg(sum(col("size").cast("long"))).first().getLong(0)
      val (files, layout, fsInfo) = forensicTables(s, d)
      // persist the extent table: q110's serve re-derives each file's
      // extent end from here (no re-cumsum in the declared plan)
      layout.write.mode("overwrite").parquet(s"$root/layout")
      val t0 = System.currentTimeMillis()
      (0 until Slices).foreach(i => writeArrival(s, d, root, i,
        f"arrival-$i%02d.parquet", extraCorrupt = i == 0, t0 + i * 2000L))
      runIngest(s, root, imageSize, files, layout, fsInfo) // four micro-batches
      // replay leg: slice 0 (corrupt extra included) re-delivered as a new
      // file; the fifth batch must be a state no-op
      writeArrival(s, d, root, 0, "arrival-redelivered.parquet",
        extraCorrupt = true, t0 + Slices * 2000L)
      runIngest(s, root, imageSize, files, layout, fsInfo)
      drainQueue(s, root) // q110: claim→process→finish + JDBC ledger
    }
  }

  /** The streamed HW state + chunk/quarantine counts (see class doc). */
  def q108ChunkHw(s: SparkSession, d: String): DataFrame = {
    val root = ensureBuilt(s, d)
    val st = new StateDir(s, s"$root/state")
    val hw = st.read(ChunkIngest.HwTable, ChunkIngest.HwSchema)
    val nChunks = st.read(ChunkIngest.ChunksTable, ChunkIngest.ChunksSchema)
      .agg(count(lit(1)).as("n_chunks"))
    val nBad = st.read(ChunkIngest.BadChunksTable, ChunkIngest.ChunksSchema)
      .agg(count(lit(1)).as("n_bad"))
    hw.crossJoin(nChunks).crossJoin(nBad)
      .select(col("previous"), col("current"), col("current_seq"),
        col("current_name"), col("status"), col("n_chunks"), col("n_bad"))
  }

  /** Oracle: the batch twin of the final state. `current` is the q10
    * contiguity law over ALL chunks (everything arrives), `previous` the
    * same law over slices {0,1,2} — the arrived set just before the final
    * advancing batch. */
  def q108Sql: String =
    """WITH c AS (
      |  SELECT event_id AS seq,
      |    CAST(floor(value) + 1 AS BIGINT) AS size
      |  FROM events WHERE event_id < 65536
      |), r AS (
      |  SELECT seq, size, row_number() OVER (ORDER BY seq) AS rn FROM c
      |), p AS (
      |  SELECT seq, size, row_number() OVER (ORDER BY seq) AS rn FROM c
      |  WHERE seq % 4 <= 2
      |)
      |SELECT
      |  CAST((SELECT coalesce(sum(size), 0) FROM p WHERE seq = rn - 1) AS BIGINT) AS previous,
      |  CAST((SELECT coalesce(sum(size), 0) FROM r WHERE seq = rn - 1) AS BIGINT) AS current,
      |  CAST((SELECT coalesce(max(seq), -1) FROM r WHERE seq = rn - 1) AS BIGINT) AS current_seq,
      |  'img.' || CAST((SELECT max(seq) FROM r WHERE seq = rn - 1) AS VARCHAR) AS current_name,
      |  CAST(1 AS INT) AS status,
      |  (SELECT count(*) FROM c) AS n_chunks,
      |  CAST(1 AS BIGINT) AS n_bad""".stripMargin

  /** q110 — the DECLARED row for the WORK-QUEUE STATE MACHINE, the
    * reference's second executable (`FileWorkerApp.scala:114-160,207-227`)
    * and the last suite-only fabric piece before r13. The build drives the
    * production pipeline end-to-end: the q108 chunk ingest RELEASES files
    * into the queue (each advancing batch enqueues the files whose extent
    * end falls in its HW window), then four [[graft.streaming.WorkQueue]]
    * workers drain it — claim 0→1 (`removed`), start 1→2 (`started`),
    * finish 2→3 (`finished`), error_status=1 for the deterministic failure
    * law file_id % 7 == 3 — each ledgering its claim batch through
    * [[graft.streaming.JdbcIO.appendOnceLocal]] (real embedded-Derby SQL,
    * the reference's driver-side prepared-statement shape), with replay
    * legs for both the poll loop and the ledger inside the build.
    *
    * Declared result (one wide row; every column kills a failure mode):
    *  - `n_queued` = released files (all but the last chunk — the tiling
    *    [-1,hw0)∪[hw0,hw1)∪[hw1,hw2)∪[hw2,hw3) covers every extent end but
    *    the image total). Wrong release windows or a lost enqueue move it.
    *  - `n_done` / `n_unfinished`: every row must END at status 3 — a lost
    *    claim (claimed, never finished) or a stuck transition shows here.
    *  - `n_err`: the failure law's exact count — an error flag lost in the
    *    finish transition (or a spurious one) moves it.
    *  - `n_ordered`: rows whose stamps exist and satisfy removed ≤ started
    *    ≤ finished — a transition that skipped a stamp breaks it.
    *  - `n_window_ok`: rows whose stored HW window actually contains the
    *    file's extent end (queue ⋈ persisted layout) — wrong windows from
    *    the release path show here even when counts survive.
    *  - `hw_last`: max enqueued window top = the image size (Σ sizes).
    *  - `n_ledger` / `n_ledger_files`: Derby ledger totals — a double
    *    claim puts one file in two workers' batches (`n_ledger` >
    *    `n_ledger_files`); a replayed double-fire doubles `n_ledger`.
    * The ledger counts are read driver-side (two scalars over one
    * connection — embedded Derby is single-JVM, and a claim ledger is
    * driver-scale by nature, like [[graft.streaming.WorkQueue]].claim). */
  def q110WorkerQueue(s: SparkSession, d: String): DataFrame = {
    val root = ensureBuilt(s, d)
    val queue = new StateDir(s, s"$root/state")
      .read(ChunkIngest.QueueTable, ChunkIngest.QueueSchema)
    val ends = s.read.parquet(s"$root/layout")
      .select(col("obj_id").as("file_id"),
        (col("byte_start") + col("byte_len")).as("extent_end"))
    val (nLedger, nLedgerFiles) = ledgerCounts(root)
    queue.join(ends, Seq("file_id"))
      .agg(
        count(lit(1)).as("n_queued"),
        count(when(col("status") === 3, 1)).as("n_done"),
        count(when(col("status") =!= 3, 1)).as("n_unfinished"),
        count(when(col("error_status") === 1, 1)).as("n_err"),
        count(when(col("removed") <= col("started")
          && col("started") <= col("finished"), 1)).as("n_ordered"),
        count(when(col("hw_before") <= col("extent_end")
          && col("extent_end") < col("hw_after"), 1)).as("n_window_ok"),
        max(col("hw_after")).as("hw_last"))
      .withColumn("n_ledger", lit(nLedger))
      .withColumn("n_ledger_files", lit(nLedgerFiles))
  }

  private def ledgerCounts(root: String): (Long, Long) = {
    val conn = java.sql.DriverManager.getConnection(
      s"jdbc:derby:$root/ledger", JdbcIO.derbyProps())
    try {
      val rs = conn.createStatement().executeQuery(
        s"""SELECT count(*), count(DISTINCT "file_id") FROM $LedgerTable""")
      rs.next()
      (rs.getLong(1), rs.getLong(2))
    } finally conn.close()
  }

  /** Oracle: the state-machine law in pure SQL. Released = every chunk but
    * the last (see [[q110WorkerQueue]]); all released rows end fully
    * stamped at status 3; errors follow the failure law; the ledger holds
    * each released file exactly once; the last window top is the image
    * size. */
  def q110Sql: String =
    """WITH c AS (
      |  SELECT event_id AS seq,
      |    CAST(floor(value) + 1 AS BIGINT) AS size
      |  FROM events WHERE event_id < 65536
      |), rel AS (
      |  SELECT seq FROM c WHERE seq < (SELECT max(seq) FROM c)
      |)
      |SELECT
      |  (SELECT count(*) FROM rel) AS n_queued,
      |  (SELECT count(*) FROM rel) AS n_done,
      |  CAST(0 AS BIGINT) AS n_unfinished,
      |  (SELECT count(*) FROM rel WHERE seq % 7 = 3) AS n_err,
      |  (SELECT count(*) FROM rel) AS n_ordered,
      |  (SELECT count(*) FROM rel) AS n_window_ok,
      |  CAST((SELECT sum(size) FROM c) AS BIGINT) AS hw_last,
      |  (SELECT count(*) FROM rel) AS n_ledger,
      |  (SELECT count(*) FROM rel) AS n_ledger_files""".stripMargin
}
