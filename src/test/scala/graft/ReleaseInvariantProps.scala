package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.operators.Forensics

/** FIXTURES.md §2 property: over any ladder of HW advances, the per-window
  * release sets PARTITION the full-range release set — no file released
  * twice, none skipped (the exactly-once contract of the release query
  * driving the work queue; reference `StreamingApp.scala:253`).
  */
object ReleaseInvariantProps extends Properties("ReleaseInvariant") {

  // Spark jobs per case are ~100ms; keep the case count bounded.
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(12).withWorkers(1)

  private val genCase = for {
    nFiles <- Gen.choose(1, 25)
    files <- Gen.sequence[Vector[(Long, Long, String, String, Int)], (Long, Long, String, String, Int)](
      (1 to nFiles).map { id =>
        for {
          dirType <- Gen.frequency(4 -> Gen.const(5), 1 -> Gen.const(3))
          meta <- Gen.frequency(5 -> Gen.const(s"f$id"), 1 -> Gen.const(s"$$meta$id"))
        } yield (id.toLong, 100L, meta, "/", dirType)
      })
    extents <- Gen.sequence[Vector[Vector[(Long, Long, Long)]], Vector[(Long, Long, Long)]](
      (1 to nFiles).map { id =>
        for {
          n <- Gen.choose(0, 3)
          ex <- Gen.listOfN(n, for {
            start <- Gen.choose(0L, 1000L)
            len <- Gen.choose(1L, 200L)
          } yield (id.toLong, start, len))
        } yield ex.toVector
      })
    marks <- Gen.listOfN(5, Gen.choose(0L, 1500L))
  } yield (files, extents.flatten, (-1L +: marks.distinct.sorted).distinct)

  property("per-window releases partition the full-range release set") =
    forAll(genCase) { case (files, layout, ladder) =>
      val spark = TestSession.spark
      import spark.implicits._
      val filesDf = files.toDF("obj_id", "fs_obj_id", "name", "parent_path", "dir_type")
      val layoutDf =
        if (layout.isEmpty) Seq((0L, 0L, 0L)).toDF("obj_id", "byte_start", "byte_len").limit(0)
        else layout.toDF("obj_id", "byte_start", "byte_len")
      val fsDf = Seq((100L, 7L)).toDF("obj_id", "img_offset")

      val windows = ladder.zip(ladder.tail)
      val perWindow = windows.map { case (lo, hi) =>
        Forensics.releasedBetween(filesDf, layoutDf, fsDf, lo, hi)
          .collect().map(_.getLong(0)).toSet
      }
      val full = Forensics
        .releasedBetween(filesDf, layoutDf, fsDf, ladder.head, ladder.last)
        .collect().map(_.getLong(0)).toSet

      val disjoint = perWindow.map(_.size).sum == perWindow.foldLeft(Set.empty[Long])(_ ++ _).size
      val complete = perWindow.foldLeft(Set.empty[Long])(_ ++ _) == full
      disjoint && complete
    }
}
