package graft.streaming

import java.nio.file.Files
import java.security.MessageDigest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSession
import graft.operators.Forensics

/** End-to-end Structured Streaming coverage (SURVEY.md §2.9 T1-T9 + §2.1
  * S2-S7): Avro-encoded chunks arrive out of order over three micro-batches;
  * per-batch assertions pin the cross-batch HW state machine, release
  * windows, threshold side effects, graceful stop, and queue lifecycle to
  * the reference semantics (StreamingApp.scala:309-493,
  * FileWorkerApp.scala:207-227). Final state must equal the batch-mode
  * release query over the full range — streaming and batch share the same
  * `Forensics` code, so this is the batch↔stream equivalence check. */
class ChunkIngestSpec extends AnyFunSuite {
  import TestSession.spark
  import spark.implicits._

  private def md5hex(b: Array[Byte]): String =
    MessageDigest.getInstance("MD5").digest(b).map("%02x".format(_)).mkString

  /** 8 chunks, sizes 10..80 (total 360 = imageSize). */
  private val sizes = (1 to 8).map(_ * 10)
  private def chunk(seq: Int, corruptHash: Boolean = false): ImageBlock = {
    val data = Array.fill(sizes(seq))(seq.toByte)
    ImageBlock(s"img.dd.$seq", if (corruptHash) "bogus" else md5hex(data), data)
  }

  /** FIXTURES.md §2 synthetic TSK tables. MFT extent ends at 30, so the HW
    * may only advance once chunks 0..2 (sum 60 > 30) are contiguous. */
  private def filesDf: DataFrame = Seq(
    (1L, 100L, "$MFT", "/", 5),       // the MFT itself — excluded by '$%'
    (2L, 100L, "fileA", "/", 5),      // extent end 59  → batch-1 release
    (3L, 100L, "fileB", "/", 5),      // extent end 150 → batch-2 release
    (4L, 100L, "fileC", "/", 5),      // extent end 300 → batch-3 release
    (5L, 100L, "fileD", "/", 5),      // extent end 355 → batch-3 release
    (6L, 100L, "$Boot", "/", 5),      // metafile — excluded by '$%'
    (7L, 100L, "somedir", "/", 3),    // directory — excluded by dir_type
    (8L, 100L, "resident1", "/", 5),  // no extent → resident
    (9L, 100L, "residentdir", "/", 3) // no extent but a dir → not resident
  ).toDF("obj_id", "fs_obj_id", "name", "parent_path", "dir_type")

  private def layoutDf: DataFrame = Seq(
    (1L, 0L, 30L), (2L, 30L, 29L), (3L, 60L, 90L),
    (4L, 150L, 150L), (5L, 300L, 55L), (6L, 0L, 10L), (7L, 0L, 5L)
  ).toDF("obj_id", "byte_start", "byte_len")

  private def fsInfoDf: DataFrame =
    Seq((100L, 0L)).toDF("obj_id", "img_offset")

  private def newIngest(chunkSink: Option[String] = None): (ChunkIngest, StateDir) = {
    val dir = Files.createTempDirectory("graft-state-").toString
    val st = new StateDir(spark, dir)
    (new ChunkIngest(spark, st, imageSize = 360, filesDf, layoutDf, fsInfoDf,
      chunkSink), st)
  }

  private def queueIds(st: StateDir, resident: Int): Set[Long] =
    new WorkQueue(spark, st).snapshot
      .filter($"resident" === resident).select("file_id")
      .collect().map(_.getLong(0)).toSet

  test("avro codec roundtrip (S2)") {
    val b = chunk(3)
    val back = ImageBlockCodec.decode(ImageBlockCodec.encode(b))
    assert(back.filename == b.filename && back.localHash == b.localHash)
    assert(back.data.toSeq == b.data.toSeq)
  }

  test("stream end-to-end: out-of-order arrival, HW advance, thresholds, graceful stop") {
    val sinkDir = Files.createTempDirectory("graft-chunks-").toString
    val (ingest, st) = newIngest(Some(sinkDir))
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Array[Byte]]
    // S1 stand-in + S2/P2 decode: bytes stream → typed ImageBlock Dataset.
    val blocks = input.toDS().map(ImageBlockCodec.decode)
    val ckpt = Files.createTempDirectory("graft-ckpt-").toString
    val query = ingest.start(blocks,
      org.apache.spark.sql.streaming.Trigger.ProcessingTime(0), ckpt)

    // batch 1: 0,1,2 contiguous + 5,6 early (held back by the gap at 3).
    input.addData(Seq(0, 5, 1, 6, 2).map(s => ImageBlockCodec.encode(chunk(s))))
    query.processAllAvailable()
    var hw = ingest.hwSnapshot.collect().head
    assert(hw.getLong(1) == 60, "HW = sum of contiguous prefix 0..2")
    assert(queueIds(st, 0) == Set(2L), "only fileA (end 59) in [-1, 60)")
    assert(queueIds(st, 1).isEmpty, "quarter threshold (90) not crossed yet")
    assert(!ingest.isDone)

    // batch 2: gap closes through 6 → HW 280; quarter+half both inside
    // [60, 280) → resident populate + error reset both fire.
    input.addData(Seq(4, 3).map(s => ImageBlockCodec.encode(chunk(s))))
    query.processAllAvailable()
    hw = ingest.hwSnapshot.collect().head
    assert(hw.getLong(0) == 60 && hw.getLong(1) == 280)
    assert(queueIds(st, 0) == Set(2L, 3L), "fileB (end 150) in [60, 280)")
    assert(queueIds(st, 1) == Set(8L), "resident populated at quarter; dirs excluded")
    assert(!ingest.isDone)

    // batch 3: the final chunk arrives CORRUPTED — verification quarantines
    // it, the HW holds at the gap, the image must NOT complete.
    input.addData(Seq(ImageBlockCodec.encode(chunk(7, corruptHash = true))))
    query.processAllAvailable()
    hw = ingest.hwSnapshot.collect().head
    assert(hw.getLong(1) == 280 && !ingest.isDone,
      "corrupt chunk reads as missing; no completion")
    val badSeqs = ingest.badChunksSnapshot.select("sequence")
      .collect().map(_.getInt(0)).toSeq
    assert(badSeqs == Seq(7), "quarantined, not ingested")

    // batch 4: a good re-delivery closes the gap → HW 360 = imageSize →
    // done + graceful stop.
    input.addData(Seq(ImageBlockCodec.encode(chunk(7))))
    query.processAllAvailable()
    hw = ingest.hwSnapshot.collect().head
    assert(hw.getLong(1) == 360 && hw.getInt(4) == 1, "HW complete, status=1")
    assert(queueIds(st, 0) == Set(2L, 3L, 4L, 5L), "fileC/fileD in [280, 360)")
    assert(ingest.isDone, "T7: done flag raised for graceful stop")
    query.stop()

    // S3: every chunk's bytes landed as a file.
    val written = new java.io.File(sinkDir).list().toSet
    assert(written == (0 to 7).map(s => s"img.dd.$s").toSet)

    // ingested chunk set holds only verified rows (the reference's
    // verification TODO, enforced for real).
    assert(ingest.chunksSnapshot.filter(!$"hash_ok").isEmpty)

    // batch↔stream equivalence: the union of per-batch release windows
    // equals one batch-mode release over the full range [-1, 360) — no file
    // released twice (idempotent enqueue), none skipped.
    val batchReleased = Forensics
      .releasedBetween(filesDf, layoutDf, fsInfoDf, -1L, 360L)
      .collect().map(_.getLong(0)).toSet
    assert(queueIds(st, 0) == batchReleased)

    // HW log recorded each advance exactly once (T4 audit trail).
    val log = ingest.hwLogSnapshot.orderBy("current").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(log == Seq((-1L, 60L), (60L, 280L), (280L, 360L)))

    // A6 observe metrics: per-batch chunk/byte counts cover every DELIVERY
    // (9 = 8 chunks + the corrupted copy of 7; 440 = 360 + its 80 bytes).
    val observed = query.recentProgress.toSeq
      .flatMap(p => Option(p.observedMetrics.get("ingest")))
    val totChunks = observed.map(_.getLong(0)).sum
    val totBytes = observed.map(_.getLong(1)).sum
    assert(totChunks == 9 && totBytes == 440)
  }

  test("MFT gate blocks advance until the MFT is fully ingested (W3)") {
    val (ingest, _) = newIngest()
    // chunks 0,1 → candidate 30; MFT hw = 30; 30 < 30 fails → blocked.
    ingest.processBatch(Seq(chunk(0), chunk(1)).toDS(), 0L)
    assert(ingest.hwSnapshot.isEmpty, "no advance recorded while MFT incomplete")
    // chunk 2 closes the MFT → candidate 60 > 30 → advance.
    ingest.processBatch(Seq(chunk(2)).toDS(), 1L)
    assert(ingest.hwSnapshot.collect().head.getLong(1) == 60)
  }

  test("batch replay is idempotent (T9): same batch id re-applied changes nothing") {
    val (ingest, st) = newIngest()
    ingest.processBatch(Seq(chunk(0), chunk(1), chunk(2)).toDS(), 0L)
    val before = new WorkQueue(spark, st).snapshot.collect().toSeq
    ingest.processBatch(Seq(chunk(0), chunk(1), chunk(2)).toDS(), 0L)
    val after = new WorkQueue(spark, st).snapshot.collect().toSeq
    assert(before == after)
    assert(ingest.chunksSnapshot.count() == 3)
  }

  test("work queue lifecycle: deterministic claim, status 0→1→2→3, error flag (T8/T9)") {
    val (ingest, st) = newIngest()
    (0 to 7).grouped(3).zipWithIndex.foreach { case (seqs, i) =>
      ingest.processBatch(seqs.map(chunk(_)).toDS(), i.toLong)
    }
    val wq = new WorkQueue(spark, st)
    val all = wq.snapshot.select("file_id").collect().map(_.getLong(0)).toSet
    assert(all == Set(2L, 3L, 4L, 5L, 8L))

    // deterministic assignment partitions the queue across workers.
    val byWorker = wq.assignments(nWorkers = 2)
      .select("file_id", "worker").collect()
      .groupBy(_.getInt(1)).view.mapValues(_.map(_.getLong(0)).toSet).toMap
    assert(byWorker.values.foldLeft(0)(_ + _.size) == all.size, "disjoint + complete")

    // two workers drain their shares; file 3 fails.
    (0 to 1).foreach { w => wq.pollOnce(w, 2)(id => id != 3L) }
    val fin = wq.snapshot.collect()
      .map(r => r.getLong(0) -> (r.getInt(2), r.getInt(9))).toMap
    assert(fin.values.forall(_._1 == 3), "all rows reached finished")
    assert(fin(3L)._2 == 1 && fin(2L)._2 == 0, "error flag only on the failure")
    val stamps = wq.snapshot.filter(
      $"removed".isNull || $"started".isNull || $"finished".isNull).count()
    assert(stamps == 0, "lifecycle timestamps all stamped (F6)")
  }

  test("chunks state appends deltas: newest version holds only the batch's new rows") {
    val (ingest, st) = newIngest()
    ingest.processBatch(Seq(chunk(0), chunk(1), chunk(2)).toDS(), 0L)
    ingest.processBatch(Seq(chunk(3), chunk(4), chunk(2)).toDS(), 1L) // one replayed chunk
    val root = st.path(ChunkIngest.ChunksTable)
    val latest = new String(Files.readAllBytes(java.nio.file.Paths.get(
      root.stripSuffix("/" + ChunkIngest.ChunksTable) +
        s"/${ChunkIngest.ChunksTable}.latest"))).trim.toInt
    // write I/O O(batch): the newest version dir carries ONLY batch 1's
    // two genuinely-new chunks, not the accumulated five
    assert(spark.read.parquet(s"$root/v$latest").count() == 2)
    assert(ingest.chunksSnapshot.count() == 5)
    assert(new java.io.File(s"$root/v$latest/_DELTA").exists())
  }

  test("error reset (T6): errored resident rows return to status 0 on the next trigger") {
    val (ingest, st) = newIngest()
    // drive past the quarter threshold so the resident row (8) is enqueued.
    ingest.processBatch((0 to 4).map(chunk(_)).toDS(), 0L)
    val wq = new WorkQueue(spark, st)
    assert(queueIds(st, 1) == Set(8L))
    // the worker claims, starts, and fails the resident file.
    (0 to 1).foreach { w => wq.pollOnce(w, 2)(id => id != 8L) }
    assert(wq.snapshot.filter($"file_id" === 8L).collect().head.getInt(9) == 1)
    // next batch crosses the half threshold → reset fires (StreamingApp
    // .scala:430-445): errored resident rows drop back to claimable.
    ingest.processBatch(Seq(chunk(5)).toDS(), 1L)
    val row = wq.snapshot.filter($"file_id" === 8L).collect().head
    assert(row.getInt(2) == 0 && row.getInt(9) == 1,
      "status reset to 0, error flag preserved")
  }
}
