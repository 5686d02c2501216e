package graft.streaming

import java.io.File
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSession
import graft.operators.Dedup

/** The append-mode contract: DedupStream's per-batch WRITE I/O is O(batch),
  * not O(corpus) — bytes newly written per micro-batch stay ~flat while the
  * accumulated corpus grows across batches — and periodic compaction keeps
  * the result identical to the one-shot batch pipeline. */
class DedupStreamDeltaSpec extends AnyFunSuite {
  import TestSession.spark
  import spark.implicits._

  private def docs(from: Int, n: Int): Seq[(Long, String)] =
    (from until from + n).map(i =>
      (i.toLong, s"group$i alpha$i beta$i gamma$i delta$i"))

  private def versionDirs(root: String): Set[String] = {
    def walk(f: File): Seq[File] =
      if (f.isDirectory) f :: Option(f.listFiles()).getOrElse(Array.empty).toList.flatMap(walk)
      else Nil
    walk(new File(root))
      .filter(d => d.getName.startsWith("v") && d.getParentFile.getParentFile.getPath == root)
      .map(_.getPath).toSet
  }

  private def dirBytes(path: String): Long = {
    def walk(f: File): Long =
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).map(walk).sum
      else f.length()
    walk(new File(path))
  }

  test("bytes written per batch stay ~flat while the corpus grows 8x") {
    val root = Files.createTempDirectory("dedup-delta-").toString
    // compaction disabled: this test isolates the append path (the next
    // test covers compaction); every publish must be delta-sized.
    val st = new StateDir(spark, root, compactEvery = 1000)
    val ds = new DedupStream(spark, st)
    val perBatch = 40
    val written = (0 until 8).map { b =>
      val before = versionDirs(root)
      ds.processBatch(docs(b * perBatch, perBatch).toDF("doc_id", "text"), b.toLong)
      val fresh = versionDirs(root).diff(before)
      fresh.toSeq.map(dirBytes).sum
    }
    // batch 0 seeds the chain bases; compare steady-state appends: the last
    // batch writes against an 8x corpus but must cost ~the same as batch 1
    // (parquet framing noise allows 2x, never the 8x a full rewrite shows)
    assert(written.last < 2 * written(1),
      s"per-batch write I/O grew with the corpus: $written")
    // and the newest sig version dir holds ONLY the last batch's rows —
    // the direct O(batch)-rows-on-disk proof (a rewrite would hold 8x)
    val latest = new String(Files.readAllBytes(
      java.nio.file.Paths.get(s"$root/${DedupStream.SigTable}.latest"))).trim.toInt
    val lastDir = s"$root/${DedupStream.SigTable}/v$latest"
    assert(spark.read.parquet(lastDir).count() == perBatch)
    assert(ds.sigSnapshot.count() == 8L * perBatch)
  }

  test("compaction across batches preserves stream == one-shot q20") {
    val root = Files.createTempDirectory("dedup-compact-").toString
    val st = new StateDir(spark, root, compactEvery = 3) // compact aggressively
    val ds = new DedupStream(spark, st)
    // clone clusters split across 10 batches so pairs span compactions
    val corpus = (0 until 20).flatMap { g =>
      (0 until 5).map(i => ((g * 5 + i).toLong, s"g$g a$g b$g c$g d$g"))
    }
    val batches = corpus.groupBy(_._1 % 10).toSeq.sortBy(_._1).map(_._2)
    batches.zipWithIndex.foreach { case (rows, i) =>
      ds.processBatch(rows.toDF("doc_id", "text"), i.toLong)
    }
    val dir = Files.createTempDirectory("dedup-compact-exp-").toString
    corpus.toDF("doc_id", "text")
      .withColumn("lang", org.apache.spark.sql.functions.lit("en"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val expected = Dedup.q20MinhashNeardup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val streamed = ds.pairsSnapshot.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(streamed == expected)
    assert(streamed.nonEmpty)
    // compaction actually engaged: no table's LIVE chain exceeds the cap
    for (t <- Seq(DedupStream.SigTable, DedupStream.BandsTable,
        DedupStream.StatsTable, DedupStream.PairsTable)) {
      val latest = new String(Files.readAllBytes(
        java.nio.file.Paths.get(s"$root/$t.latest"))).trim.toInt
      val deltas = Iterator.iterate(latest)(_ - 1)
        .takeWhile(v => new File(s"$root/$t/v$v/_DELTA").exists()).size
      assert(deltas < 3, s"table $t live chain too long after 10 batches")
    }
  }
}
