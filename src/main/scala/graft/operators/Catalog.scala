package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Scalar-function catalog, queue state machine, event-time windows and
  * binary/multimodal metadata — SURVEY.md §2.8 F1-F9, §2.2 P9, §2.9 T5/T9.
  */
object Catalog {

  // ---------------------------------------------------------------- q23

  /** The reference's scalar functions (F1-F9 + P9) in ONE shuffle-free pass
    * over events (the lag window for F7 partitions by user — scales):
    *  F1 md5 (`HashUtil.scala:27`), F2 trailing-int chunk sequence
    *  (`StreamingDiskUtil.scala:38`), F3 topic→case prefix/suffix strip
    *  (`StreamingApp.scala:274-275`), F4 path concat (`:276-285`),
    *  F5 TSK error-offset regex capture (`AutopsyWrapper.scala:64-71`),
    *  F7 elapsed-ms lag arithmetic (`Clock.scala:74`), F8 integer-division
    *  thresholds (`StreamingApp.scala:424,430`), F9 extent-end arithmetic
    *  (`:237,253`), P9 substring containment (`AutopsyWrapper.scala:62`).
    * (F6 current_timestamp is exercised by the streaming queue lifecycle —
    *  wall-clock is not oracle-comparable.) */
  def q23ScalarFuncs(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
    Tables.events(s, d)
      .withColumn("chunk_name", concat(lit("img.dd."), (col("event_id") % 50).cast("int")))
      .withColumn("chunk_seq", substring_index(col("chunk_name"), ".", -1).cast("int"))
      .withColumn("md5_props", md5(col("props")))
      .withColumn("case_name",
        regexp_replace(concat(lit("topic_case_"), col("event_type")), "^topic_case_", ""))
      .withColumn("trimmed", expr("substring(event_type, 1, length(event_type)-2)"))
      .withColumn("path", concat_ws("/", lit("cases"), col("event_type"), col("chunk_name")))
      .withColumn("err_msg",
        concat(lit("ext2fs_dinode_load: Inode "), col("event_id"),
          lit(" from "), col("user_id") * 512))
      .withColumn("err_offset",
        regexp_extract(col("err_msg"), "from ([0-9]+)", 1).cast("long"))
      .withColumn("has_error", instr(col("event_type"), "error") > 0)
      .withColumn("elapsed_ms",
        coalesce(unix_millis(col("ts")) - lag(unix_millis(col("ts")), 1).over(w), lit(0L)))
      .withColumn("quarter", expr("event_id DIV 4"))
      .withColumn("extent_end", col("event_id") * 1000 + col("user_id") * 100 + 512)
      .select(col("event_id"), col("chunk_name"), col("chunk_seq"), col("md5_props"),
        col("case_name"), col("trimmed"), col("path"), col("err_offset"),
        col("has_error"), col("elapsed_ms"), col("quarter"), col("extent_end"))
      .orderBy(col("event_id"))
  }

  def q23Sql: String =
    """SELECT event_id,
      |  'img.dd.' || CAST(event_id % 50 AS INT) AS chunk_name,
      |  CAST(split_part('img.dd.' || CAST(event_id % 50 AS INT), '.', -1) AS INT) AS chunk_seq,
      |  md5(props) AS md5_props,
      |  regexp_replace('topic_case_' || event_type, '^topic_case_', '') AS case_name,
      |  substring(event_type, 1, length(event_type)-2) AS trimmed,
      |  concat_ws('/', 'cases', event_type, 'img.dd.' || CAST(event_id % 50 AS INT)) AS path,
      |  CAST(regexp_extract('ext2fs_dinode_load: Inode ' || event_id || ' from ' || (user_id*512),
      |       'from ([0-9]+)', 1) AS BIGINT) AS err_offset,
      |  instr(event_type, 'error') > 0 AS has_error,
      |  coalesce(epoch_ms(ts) - lag(epoch_ms(ts), 1) OVER (PARTITION BY user_id ORDER BY event_id), 0) AS elapsed_ms,
      |  event_id // 4 AS quarter,
      |  event_id*1000 + user_id*100 + 512 AS extent_end
      |FROM events ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------------- q24

  /** Work-queue status machine 0→1→2→3 as a batch transition matrix
    * (reference transitions: claim `FileWorkerApp.scala:211`, start `:115`,
    * finish `:114`, error-reset `StreamingApp.scala:443`). A synthetic
    * queue snapshot derives per-row state from event_id; one conditional
    * projection applies the next transition to every row at once
    * (set-oriented — the 100 TB version of row-at-a-time UPDATEs), then a
    * tiny aggregation summarizes the matrix. */
  def q24QueueTransitions(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("event_id").as("file_id"),
        (col("event_id") % 4).cast("int").as("status"),
        (col("event_id") % 2).cast("int").as("resident"),
        when(col("event_id") % 7 === 0, 1).otherwise(0).as("error_status"))
      .withColumn("new_status",
        when(col("error_status") === 1 && col("resident") === 1, 0)
          .when(col("status") === 0, 1)
          .when(col("status") === 1, 2)
          .when(col("status") === 2, 3)
          .otherwise(col("status")))
      .groupBy(col("status").as("old_status"), col("new_status"))
      .agg(count(lit(1)).as("n"),
        min(col("file_id")).as("min_fid"), max(col("file_id")).as("max_fid"))
      .orderBy(col("old_status"), col("new_status"))

  def q24Sql: String =
    """WITH q AS (
      |  SELECT event_id AS file_id,
      |    CAST(event_id % 4 AS INT) AS status,
      |    CAST(event_id % 2 AS INT) AS resident,
      |    CASE WHEN event_id % 7 = 0 THEN 1 ELSE 0 END AS error_status
      |  FROM events
      |), t AS (
      |  SELECT file_id, status,
      |    CASE WHEN error_status = 1 AND resident = 1 THEN 0
      |         WHEN status = 0 THEN 1
      |         WHEN status = 1 THEN 2
      |         WHEN status = 2 THEN 3
      |         ELSE status END AS new_status
      |  FROM q
      |)
      |SELECT status AS old_status, new_status, count(*) AS n,
      |  min(file_id) AS min_fid, max(file_id) AS max_fid
      |FROM t GROUP BY 1, 2 ORDER BY old_status, new_status""".stripMargin

  // ---------------------------------------------------------------- q25

  /** Event-time tumbling windows (T5's event-time surface): 1-hour buckets
    * of event counts/sums per type. Batch twin of the streaming
    * watermark+window aggregation (EventTimeSpec asserts stream==batch).
    * Window start exported as epoch ms — engine-neutral, no timestamp
    * precision skew (parquet ns vs Spark µs). */
  def q25TimeWindows(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("sum_value"))
      .select(unix_millis(col("window.start")).as("win_start_ms"),
        col("event_type"), col("n"), col("sum_value"))
      .orderBy(col("win_start_ms"), col("event_type"))

  def q25Sql: String =
    """SELECT epoch_ms(time_bucket(INTERVAL '1 hour', ts::TIMESTAMP)) AS win_start_ms,
      |  event_type, count(*) AS n,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY win_start_ms, event_type""".stripMargin

  // ---------------------------------------------------------------- q30

  /** Multimodal/binary metadata: documents' text re-encoded as an opaque
    * binary payload (stand-in for image/audio bytes), then per-blob
    * metadata: octet length, content md5, and a clearly-marked DETERMINISTIC
    * STUB decode (fake width/height from hash bytes, frame count/stride
    * arithmetic) — the real decoder would replace [[Multimodal.decodeStub]];
    * the Spark-side schema/plumbing (binary column, per-row metadata
    * projection, shuffle-free) is the part under test. */
  def q30BinaryMeta(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("payload", col("text").cast("binary"))
      .withColumn("n_bytes", expr("octet_length(payload)").cast("long"))
      .withColumn("content_hash", md5(col("payload")))
      .withColumn("width",
        (lit(256) + (ascii(substring(col("content_hash"), 1, 1)) * 7
          + ascii(substring(col("content_hash"), 2, 1))) % 1024).cast("int"))
      .withColumn("height",
        (lit(256) + (ascii(substring(col("content_hash"), 3, 1)) * 7
          + ascii(substring(col("content_hash"), 4, 1))) % 768).cast("int"))
      .withColumn("frames", (col("n_bytes") % 30 + 1).cast("int"))
      .withColumn("frame_stride", expr("n_bytes DIV frames"))
      .withColumn("mid_frame_offset", expr("(frames DIV 2) * frame_stride"))
      .select(col("doc_id"), col("n_bytes"), col("content_hash"), col("width"),
        col("height"), col("frames"), col("frame_stride"), col("mid_frame_offset"))
      .orderBy(col("doc_id"))

  def q30Sql: String =
    """WITH b AS (
      |  SELECT doc_id, octet_length(text::BLOB) AS n_bytes, md5(text) AS content_hash
      |  FROM documents
      |)
      |SELECT doc_id, n_bytes, content_hash,
      |  CAST(256 + (ascii(substring(content_hash,1,1))*7 + ascii(substring(content_hash,2,1))) % 1024 AS INT) AS width,
      |  CAST(256 + (ascii(substring(content_hash,3,1))*7 + ascii(substring(content_hash,4,1))) % 768 AS INT) AS height,
      |  CAST(n_bytes % 30 + 1 AS INT) AS frames,
      |  n_bytes // (n_bytes % 30 + 1) AS frame_stride,
      |  ((n_bytes % 30 + 1) // 2) * (n_bytes // (n_bytes % 30 + 1)) AS mid_frame_offset
      |FROM b ORDER BY doc_id""".stripMargin
}
