package graft.streaming

import java.nio.file.Files
import java.security.MessageDigest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSession

/** Many-image ingest (VERDICT r2 #6): one stream interleaving chunks of two
  * disk images must drive two independent HW machines — separate advances,
  * separate release windows, separate completion — with no q10-shape global
  * window anywhere in the streaming path. */
class MultiImageIngestSpec extends AnyFunSuite {
  import TestSession.spark
  import spark.implicits._

  private def md5hex(b: Array[Byte]): String =
    MessageDigest.getInstance("MD5").digest(b).map("%02x".format(_)).mkString

  private val sizes1 = (1 to 8).map(_ * 10) // img.dd: total 360
  private val sizes2 = (1 to 4).map(_ * 10) // disk2.raw: total 100

  private def chunk(img: String, sizes: Seq[Int], seq: Int): Array[Byte] = {
    val data = Array.fill(sizes(seq))(seq.toByte)
    ImageBlockCodec.encode(ImageBlock(s"$img.$seq", md5hex(data), data))
  }
  private def c1(seq: Int) = chunk("img.dd", sizes1, seq)
  private def c2(seq: Int) = chunk("disk2.raw", sizes2, seq)

  // same TSK shape as ChunkIngestSpec: MFT extent ends at 30; extent ends
  // 59 / 150 / 300 / 355; obj 8 resident.
  private def filesDf: DataFrame = Seq(
    (1L, 100L, "$MFT", "/", 5), (2L, 100L, "fileA", "/", 5),
    (3L, 100L, "fileB", "/", 5), (4L, 100L, "fileC", "/", 5),
    (5L, 100L, "fileD", "/", 5), (8L, 100L, "resident1", "/", 5)
  ).toDF("obj_id", "fs_obj_id", "name", "parent_path", "dir_type")
  private def layoutDf: DataFrame = Seq(
    (1L, 0L, 30L), (2L, 30L, 29L), (3L, 60L, 90L),
    (4L, 150L, 150L), (5L, 300L, 55L)
  ).toDF("obj_id", "byte_start", "byte_len")
  private def fsInfoDf: DataFrame = Seq((100L, 0L)).toDF("obj_id", "img_offset")

  private def newFleet(): MultiImageIngest =
    new MultiImageIngest(spark,
      Files.createTempDirectory("graft-fleet-").toString,
      Map(
        "img.dd" -> ImageSpec(360, filesDf, layoutDf, fsInfoDf),
        "disk2.raw" -> ImageSpec(100, filesDf, layoutDf, fsInfoDf)))

  private def queue(m: ChunkIngest, resident: Int): Set[Long] =
    m.queueSnapshot.filter($"resident" === resident)
      .select("file_id").collect().map(_.getLong(0)).toSet

  test("two interleaved images advance, release, and complete independently") {
    val fleet = newFleet()
    val m1 = fleet.machine("img.dd")
    val m2 = fleet.machine("disk2.raw")
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Array[Byte]]
    val query = fleet.start(input.toDS().map(ImageBlockCodec.decode),
      org.apache.spark.sql.streaming.Trigger.ProcessingTime(0),
      Files.createTempDirectory("graft-fleet-ckpt-").toString)

    // batch 1: img1 reaches HW 60; img2 has a gap at seq 0 → MFT-blocked
    input.addData(Seq(c1(0), c2(1), c1(5), c2(2), c1(1), c1(2)))
    query.processAllAvailable()
    assert(m1.hwSnapshot.collect().head.getLong(1) == 60)
    assert(m2.hwSnapshot.isEmpty, "img2 blocked: no contiguous prefix yet")
    assert(queue(m1, 0) == Set(2L) && queue(m2, 0).isEmpty)

    // batch 2: img2's gap closes → ITS release fires; img1 advances too
    input.addData(Seq(c2(0), c1(6), c1(3)))
    query.processAllAvailable()
    assert(m1.hwSnapshot.collect().head.getLong(1) == 100)
    assert(m2.hwSnapshot.collect().head.getLong(1) == 60)
    assert(queue(m2, 0) == Set(2L), "img2 releases fileA on its own window")
    assert(queue(m2, 1) == Set(8L), "img2 quarter (25) crossed")
    assert(queue(m1, 1) == Set(8L), "img1 quarter (90) crossed in [60,100)")

    // batch 3: img2 completes at its own 100-byte size; img1 keeps going
    input.addData(Seq(c2(3)))
    query.processAllAvailable()
    assert(fleet.doneFor("disk2.raw") && !fleet.doneFor("img.dd"))
    assert(m2.hwSnapshot.collect().head.getInt(4) == 1, "img2 status=1")
    assert(!fleet.isDone)

    // batch 4: img1 finishes independently → fleet done
    input.addData(Seq(c1(4), c1(7)))
    query.processAllAvailable()
    query.stop()
    assert(fleet.doneFor("img.dd") && fleet.isDone)
    assert(m1.hwSnapshot.collect().head.getLong(1) == 360)
    assert(queue(m1, 0) == Set(2L, 3L, 4L, 5L))
    assert(queue(m2, 0) == Set(2L), "img2's queue untouched by img1's finish")
    // audit trails stayed separate
    assert(m1.hwLogSnapshot.count() == 3 && m2.hwLogSnapshot.count() == 2)
  }

  test("fleet routing is single-pass: 50 images, raw batch scanned once") {
    val n = 50
    val fleet = new MultiImageIngest(spark,
      Files.createTempDirectory("graft-fleet50-").toString,
      (0 until n).map(i =>
        s"img$i.dd" -> ImageSpec(10, filesDf, layoutDf, fsInfoDf)).toMap)
    // the accumulator counts row visits of the RAW batch: a per-image
    // filter pass would visit each row once per present image (~50x)
    val evals = spark.sparkContext.longAccumulator("raw-evals")
    val ds = (0 until n).map { i =>
      val data = Array.fill(10)(0.toByte)
      ImageBlock(s"img$i.dd.0", md5hex(data), data)
    }.toDS().map { b => evals.add(1); b }
    val unrouted = fleet.processBatch(ds, 0L)
    assert(unrouted == 0L)
    assert(evals.value == n,
      s"raw batch visited ${evals.value} rows for $n inputs — routing is not single-pass")
    (0 until n).foreach { i =>
      assert(fleet.machine(s"img$i.dd").chunksSnapshot.count() == 1,
        s"img$i.dd got no chunk")
    }
  }

  test("chunks for undeclared images are counted, not silently dropped") {
    val fleet = newFleet()
    val ghost = ImageBlockCodec.decode(chunk("ghost.dd", Seq(5), 0))
    val known = ImageBlockCodec.decode(c1(0))
    val unrouted = fleet.processBatch(Seq(known, ghost).toDS(), 0L)
    assert(unrouted == 1L)
    assert(fleet.machine("img.dd").chunksSnapshot.count() == 1)
  }
}
