package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's forensic relational shapes as pure DataFrame transforms,
  * shared between the batch query surface (q34) and the streaming layer
  * (`graft.streaming.ChunkIngest`) — same code both paths, so batch-mode
  * correctness (DuckDB oracle) certifies the streaming results.
  *
  * Schemas per FIXTURES.md §2:
  *   files  (obj_id long, fs_obj_id long, name string, parent_path string, dir_type int)
  *   layout (obj_id long, byte_start long, byte_len long)
  *   fs_info(obj_id long, img_offset long)
  */
object Forensics {

  /** A1 — MFT high-water: `max(byte_start + byte_len)` over the `$MFT` row
    * at the filesystem root (reference SQL at `StreamingApp.scala:237`).
    * None ⇔ no MFT row located yet (the aggregate is NULL) — the advance
    * guard treats that as "accept" (`StreamingApp.scala:247`). */
  def mftHighWater(files: DataFrame, layout: DataFrame): Option[Long] = {
    val row = files
      .filter(col("name") === "$MFT" && col("parent_path") === "/")
      .join(layout, Seq("obj_id"))
      .agg(max(col("byte_start") + col("byte_len")).as("mft_hw"))
      .first()
    if (row.isNullAt(0)) None else Some(row.getLong(0))
  }

  /** J2+A2+P4+P5 — the release query (reference `StreamingApp.scala:253`):
    * extents ⋈ files ⋈ fs_info, drop directories and `$`-metafiles, per-file
    * max extent end banded against the HW advance window [lo, hi).
    *
    * Scale shape: fs_info is per-filesystem (tiny) → broadcast; the
    * layout⋈files equi-join shuffles on obj_id with partial max map-side —
    * the same plan q34 certifies against the oracle. */
  def releasedBetween(files: DataFrame, layout: DataFrame, fsInfo: DataFrame,
      lo: Long, hi: Long): DataFrame =
    layout
      .join(files.filter(col("dir_type") =!= 3 && !col("name").like("$%")),
        Seq("obj_id"))
      .join(broadcast(fsInfo.select(col("obj_id").as("fs_obj_id"), col("img_offset"))),
        Seq("fs_obj_id"))
      .groupBy(col("obj_id"))
      .agg(max(col("byte_start") + col("byte_len") + col("img_offset")).as("extent_end"))
      .filter(col("extent_end") >= lo && col("extent_end") < hi)
      .select(col("obj_id"))

  /** J3 — resident files: rows with no layout extent (content inline in the
    * MFT), minus directories (reference `prepareResidentFileTable`,
    * `StreamingApp.scala:186-190`). left_anti ⇒ broadcast hash anti-join
    * when layout's distinct keys are small; never duplicates rows. */
  def residentFiles(files: DataFrame, layout: DataFrame): DataFrame =
    files.filter(col("dir_type") =!= 3)
      .join(layout.select("obj_id"), Seq("obj_id"), "left_anti")
      .select(col("obj_id"))
}
