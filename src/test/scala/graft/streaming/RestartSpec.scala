package graft.streaming

import java.nio.file.Files
import java.security.MessageDigest

import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSession

/** Exactly-once across restart (T9 — SURVEY §7.5 hard part): a checkpointed
  * ingest query is STOPPED mid-image and a fresh query object resumes from
  * the same checkpoint + state dir. The resumed run must pick up the
  * unprocessed files only (source offsets from the checkpoint), and the
  * final state must be byte-identical to an uninterrupted run — no chunk
  * double-counted, no release duplicated, HW log linear. */
class RestartSpec extends AnyFunSuite {
  import TestSession.spark
  import spark.implicits._

  private def md5hex(b: Array[Byte]): String =
    MessageDigest.getInstance("MD5").digest(b).map("%02x".format(_)).mkString

  private val sizes = (1 to 8).map(_ * 10)
  private def chunk(seq: Int): ImageBlock = {
    val data = Array.fill(sizes(seq))(seq.toByte)
    ImageBlock(s"img.dd.$seq", md5hex(data), data)
  }

  private def filesDf = Seq(
    (1L, 100L, "$MFT", "/", 5), (2L, 100L, "fileA", "/", 5),
    (3L, 100L, "fileB", "/", 5), (4L, 100L, "fileC", "/", 5)
  ).toDF("obj_id", "fs_obj_id", "name", "parent_path", "dir_type")
  private def layoutDf = Seq(
    (1L, 0L, 30L), (2L, 30L, 29L), (3L, 60L, 90L), (4L, 150L, 150L)
  ).toDF("obj_id", "byte_start", "byte_len")
  private def fsDf = Seq((100L, 0L)).toDF("obj_id", "img_offset")

  test("checkpointed ingest resumes exactly-once after a stop/restart") {
    val srcDir = Files.createTempDirectory("graft-rsrc-").toString
    val ckpt = Files.createTempDirectory("graft-rckpt-").toString
    val stateRoot = Files.createTempDirectory("graft-rstate-").toString
    val state = new StateDir(spark, stateRoot)

    def newIngest() = new ChunkIngest(spark, state, imageSize = 360,
      filesDf, layoutDf, fsDf)
    // S1: the chunk stream arrives as parquet files of avro payloads.
    def writeBatch(seqs: Seq[Int]): Unit =
      seqs.map(s => Tuple1(ImageBlockCodec.encode(chunk(s))))
        .toDF("payload").coalesce(1).write.mode("append").parquet(srcDir)
    def stream() = spark.readStream
      .schema("payload BINARY").parquet(srcDir)
      .as[Array[Byte]].map(ImageBlockCodec.decode)

    // run 1: two installments, then stop (simulated failure/redeploy).
    writeBatch(Seq(0, 1, 2))
    val ingest1 = newIngest()
    val q1 = ingest1.start(stream(), Trigger.ProcessingTime(0), ckpt)
    q1.processAllAvailable()
    writeBatch(Seq(5, 3))
    q1.processAllAvailable()
    q1.stop()
    val hwAfterStop = ingest1.hwSnapshot.collect().head.getLong(1)
    assert(hwAfterStop == 100, "prefix 0..3 = 10+20+30+40 before restart")

    // run 2: fresh query object, same checkpoint + state — delivers ONLY
    // the new files.
    writeBatch(Seq(4, 6, 7))
    val ingest2 = newIngest()
    val q2 = ingest2.start(stream(), Trigger.ProcessingTime(0), ckpt)
    q2.processAllAvailable()
    q2.stop()

    // chunks state: exactly 8 rows, each sequence once (no double count).
    val seqs = ingest2.chunksSnapshot.select("sequence")
      .collect().map(_.getInt(0)).sorted.toSeq
    assert(seqs == (0 to 7))
    val hw = ingest2.hwSnapshot.collect().head
    assert(hw.getLong(1) == 360 && hw.getInt(4) == 1)
    assert(ingest2.isDone)

    // queue: the three releasable files exactly once each.
    val q = new WorkQueue(spark, state).snapshot
      .select("file_id").collect().map(_.getLong(0)).toSeq
    assert(q.sorted == Seq(2L, 3L, 4L) && q.distinct.size == q.size)

    // HW log is a linear chain: each advance's previous == prior current.
    val log = ingest2.hwLogSnapshot.orderBy("current").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(log.head._1 == -1L && log.last._2 == 360L)
    assert(log.zip(log.tail).forall { case ((_, cur), (prev, _)) => cur == prev })
  }
}
