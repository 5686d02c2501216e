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

  /** Gate-fixture bound (r13, found by the first 110-query sf1 oracle
    * sweep): the streamed corpus takes doc_id < 8192 only. The q107
    * oracle is q20's BATCH law, and stream ≡ batch holds exactly on the
    * precondition that NO band bucket crosses [[Dedup.HotBucketCap]] —
    * the incremental guard is order-dependent by documented construction
    * (pairs emitted before a bucket crossed the cap are kept, and
    * arrival-time hubs differ from the final min hub), so at sf1 the
    * uncapped corpus (4 hot buckets, max 2907) diverged 606 305 vs
    * 350 994 rows. 8 192 docs keep the max bucket ≈ 500 at sf1 AND sf30
    * (2× margin, measured), the precondition is VERIFIED loudly in every
    * build ([[ensureBuilt]]), and the laws the row gates
    * (split-invariance, replay idempotence) are corpus-size-invariant.
    * Vacuous at the sf0.01 driver gate (5 000 docs — hashes unchanged).
    * Same doctrine as [[ChunkState.GateChunkCap]]; also cuts the q107
    * one-time build from corpus-proportional to constant (it was 376 s
    * at sf30). The oracle mirrors the filter via [[Dedup.q20SqlOver]]. */
  private[operators] val GateDocCap = 8192L

  private def cappedDocs(s: SparkSession, d: String) =
    Tables.documents(s, d).select(col("doc_id"), col("source"), col("text"))
      .filter(col("doc_id") < GateDocCap)

  /** One parquet FILE per arrival slice, moved into the flat dir the file
    * source watches, in slice order (the file source batches by listing
    * order; the result is arrival-order-invariant regardless — suite-pinned
    * split-invariance — so listing ties cost nothing). */
  private def writeArrival(s: SparkSession, d: String, root: String,
      slice: Int, name: String): Unit = {
    import java.nio.file.{Files, Paths}
    val stage = s"$root/stage"
    cappedDocs(s, d)
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
      // Oracle-validity precondition, verified BEFORE the expensive build:
      // stream ≡ batch only while no band bucket crosses the hot cap (the
      // incremental guard is order-dependent past it — see [[GateDocCap]]).
      // One LSH pass over ≤ 8 192 docs; fails loudly instead of shipping a
      // row whose oracle law silently stopped applying.
      val maxBucket = Dedup.bandKeys(Dedup.signature(cappedDocs(s, d)))
        .groupBy(col("band"), col("key")).agg(count(lit(1)).as("b"))
        .agg(coalesce(max(col("b")), lit(0L))).first().getLong(0)
      require(maxBucket <= Dedup.HotBucketCap,
        s"q107 fixture precondition violated: max band bucket $maxBucket > " +
          s"cap ${Dedup.HotBucketCap} within doc_id < $GateDocCap — the " +
          "stream's incremental hot-bucket guard is order-dependent past " +
          "the cap, so the q20 batch oracle no longer applies. Lower " +
          "StreamState.GateDocCap for this corpus density.")
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

  /** Oracle: the one-shot batch twin — q20's law over the capped corpus
    * (see [[GateDocCap]]: the law and the stream agree exactly on the
    * verified no-hot-bucket precondition). Split-invariance and replay
    * idempotence are exactly the claims that make it valid. */
  def q107Sql: String = Dedup.q20SqlOver(
    s"(SELECT * FROM documents WHERE doc_id < $GateDocCap) documents")
}
