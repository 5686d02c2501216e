package graft.operators

import java.security.MessageDigest

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.TestSession

/** q79 pinned against a driver-side replay: re-hash every token with the
  * same 48-bit md5 prefix and accumulate the signed buckets sequentially
  * — every sparse (doc, idx, val) row must match, and zero buckets must
  * be absent. */
class FeaturizeSpec extends AnyFunSuite {
  import TestSession.spark

  private def hash48(t: String): Long = {
    val hex = MessageDigest.getInstance("MD5")
      .digest(t.getBytes("UTF-8"))
      .take(6).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex, 16)
  }

  test("q79 equals the sequential signed-bucket replay") {
    val out = Featurize.q79HashEmbed(spark, TestSession.sf).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    val docs = graft.Tables.documents(spark, TestSession.sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(out.nonEmpty && docs.nonEmpty)
    val want = scala.collection.mutable.Map[(Long, Int), Long]()
    docs.foreach { case (id, text) =>
      text.split(" ", -1).foreach { t =>
        val h = hash48(t)
        val idx = (h % Featurize.Dims).toInt
        val sgn = if ((h / Featurize.Dims) % 2 == 0) 1L else -1L
        val k = (id, idx)
        want(k) = want.getOrElse(k, 0L) + sgn
      }
    }
    val wantNz = want.filter(_._2 != 0).toMap
    assert(out == wantNz,
      s"mismatch: ${out.size} rows vs ${wantNz.size} expected")
  }
}
