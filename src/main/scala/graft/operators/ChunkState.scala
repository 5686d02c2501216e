package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.Tables
import graft.streaming.{ChunkIngest, ImageBlock, ImageBlockCodec, Sources, StateDir}

/** q108 — the DECLARED streaming row for the FORENSICS fabric: the
  * high-water-mark state a real [[graft.streaming.ChunkIngest]] run leaves
  * behind, under the driver's DuckDB hash gate. q107 gated the docs/dedup
  * pipeline; this row gates the reference's semantic heart — contiguous-
  * prefix HW advance, hash quarantine, batch replay, threshold/done
  * side effects (`StreamingApp.scala:223-256,395-489`) — which until r12
  * was suite-pinned only.
  *
  * Fixture (derived deterministically from `events`, so the oracle is pure
  * SQL over the fixture tables): every event is one chunk — sequence =
  * event_id (0-based contiguous), size = floor(value)+1 bytes (strictly
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

  /** The chunk law over events: (seq, size) with strictly positive sizes.
    * floor() — not a double→int cast — because Spark truncates and DuckDB
    * rounds; floor is exact in both. */
  private def chunkRows(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d).select(
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

  private def emptyFrame(s: SparkSession, ddl: String): DataFrame =
    s.createDataFrame(s.sparkContext.emptyRDD[Row],
      org.apache.spark.sql.types.StructType.fromDDL(ddl))

  /** One catch-up run of the production ingest stream: file source →
    * avro decode → ChunkIngest.start, AvailableNow + maxFilesPerTrigger=1
    * (one file per micro-batch), shared checkpoint across runs so the
    * second run processes exactly the newly-delivered files. The forensic
    * side tables are empty — no MFT mark (advance accepts on HW growth
    * alone) and no release/queue rows; that half is q34's oracle-certified
    * batch path and the WorkQueue suite. */
  private def runIngest(s: SparkSession, root: String, imageSize: Long): Unit = {
    val raw = s.readStream
      .schema("value binary")
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$root/arrivals")
    val ingest = new ChunkIngest(s, new StateDir(s, s"$root/state"), imageSize,
      files = emptyFrame(s,
        "obj_id long, fs_obj_id long, name string, parent_path string, dir_type int"),
      layout = emptyFrame(s, "obj_id long, byte_start long, byte_len long"),
      fsInfo = emptyFrame(s, "obj_id long, img_offset long"))
    val q = ingest.start(Sources.decodeBlocks(raw), Trigger.AvailableNow(),
      s"$root/ckpt")
    q.awaitTermination()
  }

  private def ensureBuilt(s: SparkSession, d: String): String = {
    val key = org.apache.spark.sql.graft.shims.sessionUUID(s) + ":" + d
    memo.get(key, BuildMemo.stampOf(d, "events.parquet")) { root =>
      val imageSize = chunkRows(s, d)
        .agg(sum(col("size").cast("long"))).first().getLong(0)
      val t0 = System.currentTimeMillis()
      (0 until Slices).foreach(i => writeArrival(s, d, root, i,
        f"arrival-$i%02d.parquet", extraCorrupt = i == 0, t0 + i * 2000L))
      runIngest(s, root, imageSize) // four micro-batches, state from empty
      // replay leg: slice 0 (corrupt extra included) re-delivered as a new
      // file; the fifth batch must be a state no-op
      writeArrival(s, d, root, 0, "arrival-redelivered.parquet",
        extraCorrupt = true, t0 + Slices * 2000L)
      runIngest(s, root, imageSize)
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
      |  FROM events
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
}
