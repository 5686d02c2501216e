package graft.operators

import java.io.File
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSession
import graft.streaming.StateDir

/** The append-mode contract for the lexical index: per-batch WRITE I/O
  * is O(batch tokens), not O(corpus) — ingesting against an 8× corpus
  * costs the same bytes as batch 1 across ALL FOUR statistic tables
  * (a from-scratch statistics rebuild would rewrite corpus-sized tf/df
  * every batch; the delta shape is what makes streamed lexical-index
  * maintenance viable). */
class LexIndexDeltaSpec extends AnyFunSuite {
  import TestSession.spark
  import spark.implicits._

  private def docs(from: Int, n: Int): Seq[(Long, String)] =
    (from until from + n).map(i =>
      (i.toLong, s"tok${i}a tok${i}b tok${i}c common shared tok${i}d"))

  private def versionDirs(root: String): Set[String] = {
    def walk(f: File): Seq[File] =
      if (f.isDirectory)
        f :: Option(f.listFiles()).getOrElse(Array.empty).toList.flatMap(walk)
      else Nil
    walk(new File(root))
      .filter(d => d.getName.startsWith("v") &&
        d.getParentFile.getParentFile.getPath == root)
      .map(_.getPath).toSet
  }

  private def dirBytes(path: String): Long = {
    def walk(f: File): Long =
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).map(walk).sum
      else f.length()
    walk(new File(path))
  }

  test("bytes written per ingest batch stay ~flat while the corpus grows 8x") {
    val root = Files.createTempDirectory("lex-delta-").toString
    // compaction disabled: isolate the append path (LexIndexSpec covers
    // correctness across folds); every publish must be delta-sized.
    val st = new StateDir(spark, root, compactEvery = 1000)
    val idx = new LexIndex(spark, st)
    val tmpDir = Files.createTempDirectory("lex-delta-base").toString
    docs(0, 40).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmpDir/documents.parquet")
    idx.build(tmpDir)
    val perBatch = 40
    val written = (1 until 9).map { b =>
      val before = versionDirs(root)
      idx.addBatch(docs(b * perBatch, perBatch).toDF("doc_id", "text"),
        Some(b.toLong))
      versionDirs(root).diff(before).toSeq.map(dirBytes).sum
    }
    assert(written.last < 2 * written.head,
      s"per-batch write I/O grew with the corpus: $written")
  }
}
