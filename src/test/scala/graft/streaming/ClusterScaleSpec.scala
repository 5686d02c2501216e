package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSession

/** Root-indirection scale contract of incremental clustering: a batch
  * touching a GIANT cluster must feed the connected-components solve
  * O(batch + touched roots) rows, never O(component members) — the spam-
  * cluster case where the pre-round-6 implementation re-starred the whole
  * component (one new member of a 10⁸-doc cluster cost 10⁸ solve rows per
  * batch).
  *
  * The corpus is one ever-growing clone cluster with a SMALL hot-bucket
  * cap (at real scale a 10⁸-member cluster's bucket is always hot), ids
  * descending so every batch's minimum is new — the adversarial order that
  * extends the root chain on every merge. The spec measures, via
  * [[DedupStream.contractPairs]] (the exact graph-builder the batch path
  * uses), how many solve-input rows a one-doc batch generates, and how
  * many label rows it appends.
  */
class ClusterScaleSpec extends AnyFunSuite {
  import TestSession.spark
  import spark.implicits._

  private val text = (0 until 8).map(t => s"w$t").mkString(" ")

  private def grow(ds: DedupStream, next: () => Long, n: Int, batch: Long): Unit = {
    val rows = (0 until n).map(_ => (next(), text))
    ds.processBatch(rows.toDF("doc_id", "text"), batch)
  }
  private def counter(start: Long): () => Long = {
    var v = start
    () => { v -= 1; v }
  }

  test("one new member of a giant cluster contracts to O(1) solve edges") {
    val st = new StateDir(spark, Files.createTempDirectory("cluster-scale-").toString)
    val ds = new DedupStream(spark, st, cap = 8, trackClusters = true)
    val next = counter(1000L)
    val sizes = Seq(60, 40, 30, 20)
    sizes.zipWithIndex.foreach { case (n, i) => grow(ds, next, n, i.toLong) }
    val members = ds.clustersSnapshot.count()
    assert(members == sizes.sum.toLong, s"cluster should hold all docs, got $members")
    val curMin = 1000L - sizes.sum

    // the next batch introduces ONE new doc pairing into the giant cluster
    val oneHop = st.read(DedupStream.ClustersTable, DedupStream.ClustersSchema)
      .groupBy(col("v")).agg(min(col("lbl")).as("lbl"))
      .localCheckpoint()
    val newPairs = Seq((curMin - 1, curMin, 1.0)).toDF("doc_a", "doc_b", "score")
    val (resolved, trail, rootEdges) = ds.contractPairs(newPairs, oneHop)
    assert(rootEdges.count() <= 1L, "solve input must be O(batch) for 1 pair")
    assert(resolved.count() == 2L, "only the endpoints resolve")
    // chain walk touches at most the root chain, never the member list
    val trailRows = trail.count()
    assert(trailRows < 10L,
      s"trail must be O(chain), got $trailRows rows for a $members-member cluster")

    // and the full batch path stays correct: labels = component min
    grow(ds, next, 1, sizes.size.toLong)
    val lbls = ds.clustersSnapshot.select(col("lbl")).distinct().as[Long].collect()
    assert(lbls.toSeq == Seq(curMin - 1),
      s"all members must carry the new minimum ${curMin - 1}, got ${lbls.toSeq}")
  }

  test("after compactClusters every stored pointer is terminal: walks end in one hop") {
    val st = new StateDir(spark, Files.createTempDirectory("cluster-scale-cp-").toString)
    val ds = new DedupStream(spark, st, cap = 8, trackClusters = true)
    val next = counter(1000L)
    // descending ids: every batch's min is new → each merge extends the chain
    (0 until 6).foreach(i => grow(ds, next, 10, i.toLong))
    ds.compactClusters()
    val oneHop = st.read(DedupStream.ClustersTable, DedupStream.ClustersSchema)
      .groupBy(col("v")).agg(min(col("lbl")).as("lbl"))
      .localCheckpoint()
    // every pointer's target is a root (lbl(lbl) = lbl): a probe of ANY
    // two members contracts with an empty trail — nothing left to walk
    val curMin = 1000L - 60L
    val probe = Seq((curMin, 999L, 1.0)).toDF("doc_a", "doc_b", "score")
    val (_, trail, rootEdges) = ds.contractPairs(probe, oneHop)
    assert(trail.count() == 0L,
      "compaction must leave zero-hop chains (no compression rows on a fresh walk)")
    assert(rootEdges.count() == 0L, "both endpoints already share the root")
  }

  test("write I/O per batch is O(batch), not O(component)") {
    val st = new StateDir(spark, Files.createTempDirectory("cluster-scale-io-").toString)
    val ds = new DedupStream(spark, st, cap = 8, trackClusters = true)
    val next = counter(1000L)
    grow(ds, next, 80, 0L)
    def labelRows: Long =
      st.read(DedupStream.ClustersTable, DedupStream.ClustersSchema).count()
    val before = labelRows
    grow(ds, next, 1, 1L)
    // delta rows: the new vertex's self-or-merge row, the relabeled old
    // root, and the handful of compression rows from the chain walk
    assert(labelRows - before <= 6L,
      s"a 1-doc batch must append O(1) label rows, appended ${labelRows - before}")
    grow(ds, next, 1, 2L)
    val after2 = labelRows
    grow(ds, next, 1, 3L)
    assert(labelRows - after2 <= 6L, "…and stays O(1) as the cluster keeps growing")
  }
}
