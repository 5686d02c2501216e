package graft.operators

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.TestSession

/** q72/q73 invariants.
  *
  *  - q72: the confusion matrix must CONSERVE (every vector lands in
  *    exactly one (label, pred) cell) and the argmin must be right —
  *    pinned with planted well-separated clusters, where confusion is
  *    provably diagonal.
  *  - q73: a planted always-adjacent pair must surface with high lift;
  *    two words that are individually frequent but never adjacent must
  *    not appear at all.
  */
class CentroidCollocateSpec extends AnyFunSuite {
  import TestSession.spark
  import spark.implicits._

  test("q72: conserves vectors; planted separated clusters are diagonal") {
    // three tight clusters at (10,0), (0,10), (-10,-10) with ±0.1 jitter
    val centers = Map(0 -> (10f, 0f), 1 -> (0f, 10f), 2 -> (-10f, -10f))
    val vecs = (0 until 90).map { i =>
      val lbl = i % 3
      val (cx, cy) = centers(lbl)
      val j = (i / 3) % 5 * 0.05f - 0.1f
      (i.toLong, Array(cx + j, cy - j), lbl)
    }
    val dir = Files.createTempDirectory("conf-").toString
    vecs.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = Centroids.q72CentroidConfusion(spark, dir).collect()
    assert(out.map(_.getLong(2)).sum == vecs.size, "vectors not conserved")
    out.foreach { r =>
      assert(r.getInt(0) == r.getInt(1),
        s"separated clusters confused: ${r.getInt(0)} -> ${r.getInt(1)}")
    }
    // and on the fixture: conservation against the table size
    val fix = Centroids.q72CentroidConfusion(spark, TestSession.sf)
    val total = fix.agg(sum("n_vecs")).first().getLong(0)
    assert(total == graft.Tables.embeddings(spark, TestSession.sf).count())
  }

  test("q73: planted adjacent pair surfaces; independent pair does not") {
    // "aa bb" always adjacent (20 docs); "xx" and "yy" each frequent but
    // never adjacent; filler varies so other pairs stay under the floor
    val docs = (0L until 40L).map { i =>
      if (i < 20) (i, s"aa bb f${i} g${i} xx h${i} yy")
      else (i, s"xx k${i} yy m${i} n${i}")
    }
    val dir = Files.createTempDirectory("pmi-").toString
    docs.toDF("doc_id", "text").withColumn("lang", lit("en"))
      .withColumn("source", lit("s")).withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Collocate.q73PmiBigrams(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val planted = out.filter(p => p._1 == "aa" && p._2 == "bb")
    assert(planted.length == 1 && planted.head._3 == 20L, s"planted pair missing: ${out.toSeq}")
    assert(planted.head._4 > 5000L, "planted pair lift should be far above chance")
    assert(!out.exists(p => p._1 == "xx" && p._2 == "yy"),
      "never-adjacent pair must not collocate")
  }
}
