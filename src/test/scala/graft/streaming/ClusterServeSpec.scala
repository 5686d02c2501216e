package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSession
import graft.operators.{Curation, Dedup}

/** Stream/batch cluster-state unification: after an ingest pipeline with
  * `trackClusters` owns a corpus and publishes its labels, the batch
  * consumers (q54's rollup shape, q56's drop list) serve from the
  * incrementally-maintained state — and get exactly what the one-shot
  * solver computes.
  */
class ClusterServeSpec extends AnyFunSuite {
  import TestSession.spark
  import spark.implicits._

  // the ClusterStreamSpec chain corpus: paths, not cliques, so the served
  // labels must carry genuine transitive closure
  private def corpus: Seq[(Long, String)] = (0 until 40).flatMap { i =>
    val text = (0 until 8).map(t => s"w${2 * (i / 2) + t}").mkString(" ")
    Seq((i.toLong, text))
  }

  test("batch consumers serve from published ingest state, solver-identical") {
    val dir = Files.createTempDirectory("cluster-serve-").toString
    corpus.toDF("doc_id", "text").withColumn("lang", lit("en"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    // one-shot truths first (memo path, no source wired)
    val solverClusters = Dedup.q54DedupClusters(spark, dir).collect().toSeq.map(_.toString).sorted
    val solverCuration = Curation.q56Curation(spark, dir).collect().toSeq.map(_.toString).sorted

    // ingest the same corpus through the stream in batches
    val st = new StateDir(spark, Files.createTempDirectory("cluster-serve-st-").toString)
    val ds = new DedupStream(spark, st, trackClusters = true)
    corpus.grouped(15).zipWithIndex.foreach { case (rows, i) =>
      ds.processBatch(rows.toDF("doc_id", "text"), i.toLong)
    }
    ds.publishClusters(dir)
    try {
      // the q54 rollup over the SERVED labels equals the solver's output
      val served = Dedup.clusterLabels(spark, dir)
        .groupBy(col("lbl").as("cluster_id"))
        .agg(count(lit(1)).as("n_docs"), max(col("v")).as("max_doc"))
        .orderBy(col("cluster_id"))
        .collect().toSeq.map(_.toString).sorted
      assert(served == solverClusters)
      // ...and q56 end-to-end serves the same curation decision
      val curated = Curation.q56Curation(spark, dir).collect().toSeq.map(_.toString).sorted
      assert(curated == solverCuration)
    } finally Dedup.stopServingClusters(spark, dir)
    // unwired again: the memo/solve path is back and still agrees
    val after = Curation.q56Curation(spark, dir).collect().toSeq.map(_.toString).sorted
    assert(after == solverCuration)
  }

  test("publishClusters refuses a stream without trackClusters") {
    val st = new StateDir(spark, Files.createTempDirectory("cluster-serve-no-").toString)
    val ds = new DedupStream(spark, st)
    intercept[IllegalArgumentException] { ds.publishClusters("/nowhere") }
  }
}
