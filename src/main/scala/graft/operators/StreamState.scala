package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.streaming.{DedupStream, StateDir, StreamMain}

/** q107 — the DECLARED streaming-correctness row: the near-dup pair STATE
  * a real Structured Streaming ingest leaves behind, under the driver's
  * DuckDB hash gate.
  *
  * Until r11 every declared row was batch; streaming correctness rested on
  * stream≡batch suite pins alone. This row puts the streaming half under
  * the same oracle: as setup it writes the corpus as a deterministic
  * 4-file arrivals fixture (doc_id % 4, one parquet file per slice, in
  * slice order), drives it through the PRODUCTION docs pipeline
  * ([[graft.streaming.StreamMain.run]] `--once --max-files-per-batch 1`
  * — the exact wiring of the runnable main: file source → foreachBatch →
  * [[graft.streaming.DedupStream]]/Telemetry/Drift state machines, four
  * micro-batches), then RE-DELIVERS the first slice as a fifth file and
  * runs the main again. The declared result is the dedup-pair state table.
  *
  * The oracle is the ONE-SHOT batch twin, q20's exact SQL: the row is
  * hash-green iff (a) the incremental per-batch union equals the batch
  * pipeline (split-invariance), and (b) the re-delivered batch changed
  * NOTHING (replay idempotence — a double-counted signature or duplicated
  * pair diverges the hash). Exactly the two streaming contracts the suite
  * pins, now enforced per-round by the driver.
  *
  * Pricing follows the served-index doctrine (q86/q93/q96): the stream
  * runs once per (session, corpus stamp) — the first invocation prices
  * arrivals + five micro-batches; repeats serve the persisted state
  * (bench's min-of-3 therefore prices the serve; the build cost is this
  * row's run-1 spread, disclosed here). Build memo/locking/cleanup live
  * in [[BuildMemo]] (per-slot build locks since r12 — an unrelated
  * corpus's q107 no longer waits on this one's build).
  */
object StreamState {

  private val Slices = 4
  private val memo = new BuildMemo(4, "graft-stream-state-")

  /** One parquet FILE per arrival slice, moved into the flat dir the file
    * source watches, in slice order (the file source batches by listing
    * order; the result is arrival-order-invariant regardless — suite-pinned
    * split-invariance — so listing ties cost nothing). */
  private def writeArrival(s: SparkSession, d: String, root: String,
      slice: Int, name: String): Unit = {
    import java.nio.file.{Files, Paths}
    val stage = s"$root/stage"
    Tables.documents(s, d).select(col("doc_id"), col("source"), col("text"))
      .filter(col("doc_id") % Slices === slice)
      .coalesce(1).write.mode("overwrite").parquet(stage)
    val part = Files.list(Paths.get(stage))
      .filter(p => p.getFileName.toString.startsWith("part-")
        && p.getFileName.toString.endsWith(".parquet"))
      .findFirst().orElseThrow()
    Files.createDirectories(Paths.get(s"$root/arrivals"))
    Files.move(part, Paths.get(s"$root/arrivals/$name"))
  }

  private def runOnce(s: SparkSession, root: String): Unit = {
    StreamMain.run(s, StreamMain.Config("docs", s"$root/arrivals",
      s"$root/state", intervalMs = 20L, once = true, maxFilesPerBatch = 1))
    ()
  }

  private def ensureBuilt(s: SparkSession, d: String): String = {
    val key = org.apache.spark.sql.graft.shims.sessionUUID(s) + ":" + d
    memo.get(key, BuildMemo.stampOf(d, "documents.parquet")) { root =>
      (0 until Slices).foreach(i =>
        writeArrival(s, d, root, i, f"arrival-$i%02d.parquet"))
      runOnce(s, root) // four micro-batches, state from empty
      // re-delivery: slice 0 arrives again as a NEW file — one more
      // batch of already-seen docs; idempotence says state unchanged
      writeArrival(s, d, root, 0, "arrival-redelivered.parquet")
      runOnce(s, root)
    }
  }

  /** The streamed dedup-pair state, in q20's exact output shape. */
  def q107StreamState(s: SparkSession, d: String): DataFrame = {
    val root = ensureBuilt(s, d)
    new DedupStream(s, new StateDir(s, s"$root/state/dedup")).pairsSnapshot
      .select(col("doc_a"), col("doc_b"), col("score").as("est_jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Oracle: the one-shot batch twin — q20's SQL verbatim. Split-invariance
    * and replay idempotence are exactly the claims that make it valid. */
  def q107Sql: String = Dedup.q20Sql
}
