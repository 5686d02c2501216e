package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Ivf, Similarity}

/** ANN under adversarial skew (VERDICT r2 #8): when ONE LSH bucket / IVF
  * cell holds essentially every vector, the probe join must stay linear —
  * |probes| × |bucket| scored rows, never a cartesian between data-scale
  * sides — and still return a full top-k per probe.
  */
class AnnSkewSpec extends AnyFunSuite {
  import TestSession.spark
  import spark.implicits._

  private val Dim = 64
  private val N = 20000

  private def writeEmb(rows: Seq[(Long, Seq[Float])]): String = {
    val dir = Files.createTempDirectory("ann-skew-").toString
    rows.toDF("vec_id", "embedding").repartition(8)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  private def baseVec(seed: Int): Seq[Float] = {
    val rnd = new scala.util.Random(seed)
    (0 until Dim).map(_ => (rnd.nextDouble() * 2 - 1).toFloat)
  }

  test("q28 LSH: 20k vectors in ONE bucket stays linear and returns top-3 per probe") {
    // every vector is a positive scaling of one direction — identical sign
    // pattern on all hyperplanes, so the entire set lands in one bucket
    val v0 = baseVec(42)
    val dir = writeEmb((0 until N).map { i =>
      val c = 1.0f + i.toFloat / N
      (i.toLong, v0.map(_ * c))
    })
    val out = Similarity.q28LshAnn(spark, dir)
    assert(!out.queryExecution.executedPlan.toString.contains("CartesianProduct"))
    val rows = out.collect()
    assert(rows.length == 10 * 3) // 10 probes x full top-3 from the hot bucket
    assert(rows.map(_.getAs[Int]("bucket")).toSet.size == 1)
    assert(rows.forall(r => math.abs(r.getAs[Double]("cosine") - 1.0) < 1e-6))
  }

  test("q40 IVF: 20k vectors in ONE cell stays linear and returns top-3 per probe") {
    // 8 well-separated centroids; every other vector sits tight around
    // centroid 3, so the re-rank faces |cell| ~ N (the hot-cell worst case)
    val cents = (0 until 8).map(baseVec)
    val rnd = new scala.util.Random(7)
    val dir = writeEmb((0 until 8).map(i => (i.toLong, cents(i))) ++
      (8 until N).map { i =>
        (i.toLong, cents(3).map(x => x + (rnd.nextDouble() * 0.02 - 0.01).toFloat))
      })
    val out = Ivf.q40IvfAnn(spark, dir)
    assert(!out.queryExecution.executedPlan.toString.contains("CartesianProduct"))
    val rows = out.collect()
    assert(rows.length == 10 * 3) // probes 490-499 live in the hot cell too
    assert(rows.map(_.getAs[Long]("cell")).toSet == Set(3L))
    assert(rows.forall(_.getAs[Int]("rn") <= 3))
  }
}
