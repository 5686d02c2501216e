package graft.streaming

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSession
import graft.operators.Dedup

/** Incremental clustering at ingest (trackClusters): after any batch split
  * and arrival order, the streamed label state must equal the one-shot q54
  * connected components of the same corpus — including splits where two
  * multi-doc clusters exist mid-stream and a later bridge doc merges them.
  *
  * The corpus is a sliding window over a token chain, so near-dup pairs
  * form PATHS, not cliques: components contain member pairs that were
  * never directly emitted, which is exactly the closure the label state
  * has to maintain (and a random split makes chain segments arrive as
  * separate clusters that later merge).
  */
class ClusterStreamSpec extends AnyFunSuite {
  import TestSession.spark
  import spark.implicits._

  // doc i = 8-token window at offset 2i over a shared chain, two docs per
  // offset (the clone guarantees multi-doc clusters even where the chain
  // links are below the est-jaccard threshold)
  private def corpus: Seq[(Long, String)] = (0 until 40).flatMap { i =>
    val text = (0 until 8).map(t => s"w${2 * (i / 2) + t}").mkString(" ")
    Seq((i.toLong, text))
  }

  private def oneShotClusters(rows: Seq[(Long, String)]): Set[(Long, Long, Long)] = {
    val dir = Files.createTempDirectory("cluster-exp-").toString
    rows.toDF("doc_id", "text").withColumn("lang",
      org.apache.spark.sql.functions.lit("en"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    Dedup.q54DedupClusters(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
  }

  private def statsSet(ds: DedupStream): Set[(Long, Long, Long)] =
    ds.clusterStats.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("streamed clusters equal one-shot q54; replay and re-delivery no-op") {
    val expected = oneShotClusters(corpus)
    assert(expected.nonEmpty)
    // transitivity is actually exercised: some component is larger than a
    // single direct-pair clique (chain shape)
    assert(expected.exists(_._2 > 2), s"corpus must produce chained clusters: $expected")
    val st = new StateDir(spark, Files.createTempDirectory("cluster-st-").toString)
    val ds = new DedupStream(spark, st, trackClusters = true)
    val batches = corpus.groupBy(_._1 % 3).toSeq.sortBy(_._1).map(_._2)
    batches.zipWithIndex.foreach { case (rows, i) =>
      ds.processBatch(rows.toDF("doc_id", "text"), i.toLong)
    }
    assert(statsSet(ds) == expected)
    // replayed batch id: meta guard no-ops
    ds.processBatch(batches.last.toDF("doc_id", "text"), (batches.size - 1).toLong)
    assert(statsSet(ds) == expected)
    // re-delivered docs under a new batch id: signature dedup no-ops
    ds.processBatch(batches.head.toDF("doc_id", "text"), batches.size.toLong)
    assert(statsSet(ds) == expected)
  }

  test("property: any arrival order and batch split converges to the same clusters") {
    val expected = oneShotClusters(corpus)
    val rnd = new scala.util.Random(47)
    (0 until 2).foreach { round =>
      val st = new StateDir(spark,
        Files.createTempDirectory(s"cluster-perm-$round-").toString)
      val ds = new DedupStream(spark, st, trackClusters = true)
      val shuffled = rnd.shuffle(corpus.toVector)
      val k = 3 + rnd.nextInt(3)
      val batches = shuffled.grouped((shuffled.size + k - 1) / k).toSeq
      batches.zipWithIndex.foreach { case (rows, i) =>
        ds.processBatch(rows.toDF("doc_id", "text"), i.toLong)
      }
      assert(statsSet(ds) == expected, s"round $round k=$k")
    }
  }

  test("compactClusters flattens chains without changing the clusters") {
    val expected = oneShotClusters(corpus)
    val st = new StateDir(spark, Files.createTempDirectory("cluster-compact-").toString)
    val ds = new DedupStream(spark, st, trackClusters = true)
    // reverse order maximizes merges (new minima arrive late) → real chains
    val batches = corpus.reverse.grouped(20).toSeq
    batches.zipWithIndex.foreach { case (rows, i) =>
      ds.processBatch(rows.toDF("doc_id", "text"), i.toLong)
    }
    assert(statsSet(ds) == expected)
    val snapBefore = ds.clustersSnapshot.collect().map(_.toString).toSet
    val rowsBefore = st.read(DedupStream.ClustersTable, DedupStream.ClustersSchema).count()
    ds.compactClusters()
    // same resolved labels, but the stored table is now flat: one row per
    // doc, every pointer terminal
    assert(ds.clustersSnapshot.collect().map(_.toString).toSet == snapBefore)
    val stored = st.read(DedupStream.ClustersTable, DedupStream.ClustersSchema)
    assert(stored.count() == snapBefore.size.toLong, "compaction must leave one row per doc")
    assert(stored.count() <= rowsBefore)
    assert(stored.select("v", "lbl").collect().map(_.toString).toSet
      == snapBefore, "stored pointers must be terminal after compaction")
    // the stream keeps working on the compacted base: a clone of
    // corpus.head joins its cluster (same canonical ids, one larger)
    ds.processBatch(Seq((9000L, corpus.head._2)).toDF("doc_id", "text"),
      batches.size.toLong)
    val stats = ds.clusterStats.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(stats.map(_._1) == expected.map(_._1), "cluster ids unchanged")
    assert(stats.exists(_._3 == 9000L), "post-compaction batch joined a cluster")
    assert(stats.toSeq.map(_._2).sum == expected.toSeq.map(_._2).sum + 1)
  }

  test("compactEvery cadence: stream self-compacts and still equals one-shot") {
    val expected = oneShotClusters(corpus)
    val st = new StateDir(spark, Files.createTempDirectory("cluster-cad-").toString)
    val ds = new DedupStream(spark, st, trackClusters = true, compactEvery = 2)
    val batches = corpus.reverse.grouped(10).toSeq
    batches.zipWithIndex.foreach { case (rows, i) =>
      ds.processBatch(rows.toDF("doc_id", "text"), i.toLong)
    }
    assert(statsSet(ds) == expected)
    // last batch id 3 → cadence fired after batch 3: stored table is flat
    val stored = st.read(DedupStream.ClustersTable, DedupStream.ClustersSchema)
    assert(stored.count() == ds.clustersSnapshot.count(),
      "cadence compaction must leave one terminal row per doc")
  }

  test("partial-crash replay heals the clusters table bit-identically") {
    import DedupStream._
    val stClean = new StateDir(spark, Files.createTempDirectory("cluster-clean-").toString)
    val dsClean = new DedupStream(spark, stClean, trackClusters = true)
    val stCrash = new StateDir(spark, Files.createTempDirectory("cluster-crash-").toString)
    val dsCrash = new DedupStream(spark, stCrash, trackClusters = true)
    val (b0, b1) = corpus.splitAt(50)

    dsClean.processBatch(b0.toDF("doc_id", "text"), 0L)
    dsClean.processBatch(b1.toDF("doc_id", "text"), 1L)

    dsCrash.processBatch(b0.toDF("doc_id", "text"), 0L)
    // crash mid-batch-1: pairs + CLUSTERS landed (the cluster append is the
    // write right after pairs), sig/bands/stats/meta did not — the replay
    // must regenerate the missing appends and SKIP the cluster rows that
    // survived (root-indirection deltas recompute bit-identically because
    // every read-base excludes this batch's rows)
    stCrash.write(PairsTable, stClean.read(PairsTable, PairsSchema))
    stCrash.write(ClustersTable, stClean.read(ClustersTable, ClustersSchema))
    dsCrash.processBatch(b1.toDF("doc_id", "text"), 1L)

    def rows(st: StateDir) =
      st.read(ClustersTable, ClustersSchema).collect().map(_.toString).toSet
    assert(rows(stCrash) == rows(stClean), "clusters table diverged after replay")
    assert(statsSet(dsCrash) == statsSet(dsClean))

    // and the mirror-image crash: clusters did NOT land but everything else
    // did — replay regenerates only the cluster delta
    val stCrash2 = new StateDir(spark, Files.createTempDirectory("cluster-crash2-").toString)
    val dsCrash2 = new DedupStream(spark, stCrash2, trackClusters = true)
    dsCrash2.processBatch(b0.toDF("doc_id", "text"), 0L)
    for ((t, s) <- Seq((PairsTable, PairsSchema), (SigTable, SigSchema),
        (BandsTable, BandsSchema), (StatsTable, StatsSchema)))
      stCrash2.write(t, stClean.read(t, s))
    dsCrash2.processBatch(b1.toDF("doc_id", "text"), 1L)
    assert(rows(stCrash2) == rows(stClean), "clusters-only replay diverged")
  }

  test("labels only decrease across batches (min-merge-on-read is exact)") {
    val st = new StateDir(spark, Files.createTempDirectory("cluster-mono-").toString)
    val ds = new DedupStream(spark, st, trackClusters = true)
    val batches = corpus.reverse.grouped(30).toSeq
    var prev = Map.empty[Long, Long]
    batches.zipWithIndex.foreach { case (rows, i) =>
      ds.processBatch(rows.toDF("doc_id", "text"), i.toLong)
      val now = ds.clustersSnapshot.collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      prev.foreach { case (v, l) =>
        assert(now.getOrElse(v, Long.MaxValue) <= l, s"label of $v rose after batch $i")
      }
      prev = now
    }
  }
}
