package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSession

/** Incremental passage-level dedup at ingest: q70's winnowing
  * fingerprints driven through the [[DedupStream]] state machine with the
  * Winnow method. The union of per-batch pairs over any arrival order
  * must equal the one-shot q70 pipeline on the same corpus (scores are
  * the shared-fingerprint counts), and trackClusters must close the same
  * components a sequential union-find closes over the one-shot pairs. */
class WinnowStreamSpec extends AnyFunSuite {
  import TestSession.spark

  private val sf = "/root/testdata/sf0.001"

  private val docSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("doc_id",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("text",
      org.apache.spark.sql.types.StringType)))

  private def docs: Seq[org.apache.spark.sql.Row] =
    graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect().toSeq

  private def expected: Set[(Long, Long, Long)] =
    graft.operators.Winnow.q70WinnowPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  private def stream(batches: Seq[Seq[org.apache.spark.sql.Row]],
      track: Boolean = false): DedupStream = {
    val st = new StateDir(spark, Files.createTempDirectory("win-stream-").toString)
    val ds = new DedupStream(spark, st,
      threshold = graft.operators.Winnow.MinShared.toDouble,
      method = DedupStream.Winnow, trackClusters = track)
    import scala.jdk.CollectionConverters._
    batches.zipWithIndex.foreach { case (rows, i) =>
      ds.processBatch(spark.createDataFrame(rows.asJava, docSchema), i.toLong)
    }
    ds
  }

  private def pairs(ds: DedupStream): Set[(Long, Long, Long)] =
    ds.pairsSnapshot.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2).toLong)).toSet

  test("streamed winnow pairs equal one-shot q70 across arrival orders") {
    val want = expected
    assert(want.nonEmpty)
    val vs = docs
    assert(pairs(stream(vs.grouped((vs.size + 2) / 3).toSeq)) == want)
    val shuffled = new scala.util.Random(23).shuffle(vs.toVector)
    assert(pairs(stream(shuffled.grouped((vs.size + 3) / 4).toSeq)) == want)
  }

  test("trackClusters with the Winnow method equals one-shot q70 pairs + CC") {
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
    val shuffled = new scala.util.Random(41).shuffle(docs.toVector)
    val ds = stream(shuffled.grouped((shuffled.size + 3) / 4).toSeq, track = true)
    val got = ds.clusterStats.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want)
  }
}
