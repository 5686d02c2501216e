package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSession
import graft.operators.Similarity

/** Incremental embedding near-dup at ingest: the q46 sign-LSH banding
  * driven through the [[DedupStream]] state machine with the Cosine
  * method. The union of per-batch pairs over any arrival order must equal
  * the one-shot q46 pipeline on the same vectors. */
class CosineStreamSpec extends AnyFunSuite {
  import TestSession.spark

  private val sf = "/root/testdata/sf0.001"

  private def vectors: Seq[org.apache.spark.sql.Row] =
    graft.Tables.embeddings(spark, sf)
      .select(col("vec_id").as("doc_id"), col("embedding"))
      .collect().toSeq

  private def expected: Set[(Long, Long, Double)] =
    Similarity.q46CosineNeardup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  private def stream(batches: Seq[Seq[org.apache.spark.sql.Row]]): Set[(Long, Long, Double)] = {
    val st = new StateDir(spark, Files.createTempDirectory("cos-stream-").toString)
    val ds = new DedupStream(spark, st,
      threshold = Similarity.CosineThreshold, method = DedupStream.Cosine)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("embedding",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType, containsNull = true))))
    batches.zipWithIndex.foreach { case (rows, i) =>
      import scala.jdk.CollectionConverters._
      ds.processBatch(spark.createDataFrame(rows.asJava, schema), i.toLong)
    }
    ds.pairsSnapshot.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
  }

  test("streamed cosine near-dup equals one-shot q46 across arrival orders") {
    val want = expected
    assert(want.nonEmpty)
    val vs = vectors
    // sequential split
    assert(stream(vs.grouped((vs.size + 2) / 3).toSeq) == want)
    // shuffled split (different batch boundaries and order)
    val rnd = new scala.util.Random(17)
    val shuffled = rnd.shuffle(vs.toVector)
    assert(stream(shuffled.grouped((vs.size + 3) / 4).toSeq) == want)
  }

  test("trackClusters with the Cosine method equals one-shot q46 pairs + CC") {
    // expected clusters: sequential union-find over the one-shot q46 pair
    // graph — the same oracle shape as DedupClustersSpec, method-shifted
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    expected.foreach { case (a, b, _) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val want = parent.keys.map(k => k -> find(k)).toList.groupBy(_._2)
      .map { case (root, ms) => (root, ms.size.toLong, ms.map(_._1).max) }.toSet
    assert(want.nonEmpty)

    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("embedding",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType, containsNull = true))))
    val rnd = new scala.util.Random(31)
    (0 until 2).foreach { round =>
      val st = new StateDir(spark,
        Files.createTempDirectory(s"cos-cluster-$round-").toString)
      val ds = new DedupStream(spark, st,
        threshold = Similarity.CosineThreshold, method = DedupStream.Cosine,
        trackClusters = true)
      val shuffled = rnd.shuffle(vectors.toVector)
      val k = 3 + round
      import scala.jdk.CollectionConverters._
      shuffled.grouped((shuffled.size + k - 1) / k).zipWithIndex.foreach {
        case (rows, i) =>
          ds.processBatch(spark.createDataFrame(rows.asJava, schema), i.toLong)
      }
      val got = ds.clusterStats.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == want, s"round $round k=$k")
    }
  }

  test("replay of a committed batch id is a no-op for the cosine method") {
    val st = new StateDir(spark, Files.createTempDirectory("cos-replay-").toString)
    val ds = new DedupStream(spark, st,
      threshold = Similarity.CosineThreshold, method = DedupStream.Cosine)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("embedding",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType, containsNull = true))))
    import scala.jdk.CollectionConverters._
    val vs = vectors
    val (b0, b1) = vs.splitAt(vs.size / 2)
    ds.processBatch(spark.createDataFrame(b0.asJava, schema), 0L)
    ds.processBatch(spark.createDataFrame(b1.asJava, schema), 1L)
    val before = ds.pairsSnapshot.collect().map(_.toString).sorted.toSeq
    ds.processBatch(spark.createDataFrame(b1.asJava, schema), 1L)
    assert(ds.pairsSnapshot.collect().map(_.toString).sorted.toSeq == before)
    assert(before.nonEmpty)
  }
}
