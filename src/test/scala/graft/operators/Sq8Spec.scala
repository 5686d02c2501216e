package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Dials, Tables, TestSession}
import graft.functions.Vectors

/** q102 SQ8 quality + structure gate.
  *
  * q102 is algorithm-exact vs its DuckDB oracle by construction (the
  * driver's CORRECTNESS row); this spec pins (a) what 8-bit scalar
  * quantization COSTS — shortlist recall@3 against brute-force exact
  * cosine ground truth, the PqSpec doctrine — and (b) the structural
  * claims of the memory story: the code table is BYTES (BinaryType,
  * exactly Dim bytes per vector — the 4× compression is real, not an
  * int array wearing a binary name), and codes are centered (both
  * signs occur; an all-positive byte table would mean the centering
  * that makes the raw integer dot rank-faithful silently regressed).
  */
class Sq8Spec extends AnyFunSuite {
  import TestSession.spark

  private val sf = "/root/testdata/sf0.01"
  private val Dim = Dials.EmbeddingDim

  /** Brute-force exact cosine top-3 per probe — what q102 approximates
    * then re-ranks toward. */
  private def truthTop3(lo: Long, hi: Long): Map[Long, Set[Long]] = {
    val normed = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"),
        Vectors.dot(col("embedding"), col("embedding")).as("n2"))
    val probes = normed.filter(col("vec_id") >= lo && col("vec_id") < hi)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pe"),
        col("n2").as("pn2"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    normed.crossJoin(broadcast(probes))
      .filter(col("vec_id") =!= col("probe_id"))
      .withColumn("cosine",
        Vectors.dot(col("pe"), col("embedding")) / sqrt(col("pn2") * col("n2")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .collect()
      .groupBy(_.getAs[Long]("probe_id"))
      .map { case (p, rs) => p -> rs.map(_.getAs[Long]("vec_id")).toSet }
  }

  test("q102 recall@3 vs exact-cosine ground truth stays above the floor") {
    val got = Sq.q102Sq8Ann(spark, sf).collect()
      .groupBy(_.getAs[Long]("probe_id"))
      .map { case (p, rs) => p -> rs.map(_.getAs[Long]("vec_id")).toSet }
    val want = truthTop3(Ivf.ProbeFrom, Ivf.ProbeFrom + Ivf.NProbes)
    val hits = want.iterator.map { case (p, t) =>
      (got.getOrElse(p, Set.empty) & t).size
    }.sum
    val recall = hits.toDouble / (want.size * 3)
    info(f"recall@3  q102_sq8=$recall%.3f  (R=${Dials.SqRerank})")
    assert(recall >= 0.9,
      f"SQ8 shortlist recall collapsed: $recall%.3f < 0.9")
  }

  test("code table is Dim signed bytes per vector, centered") {
    val emb = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"),
        Vectors.dot(col("embedding"), col("embedding")).as("n2"))
    val coded = Sq.codesOf(emb)
    assert(coded.schema("codes").dataType ==
      org.apache.spark.sql.types.BinaryType)
    val rows = coded.select(col("codes")).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Array[Byte]]("codes").length == Dim),
      "a code vector is not exactly Dim bytes")
    val all = rows.flatMap(_.getAs[Array[Byte]]("codes"))
    assert(all.exists(_ < 0) && all.exists(_ > 0),
      "codes are not centered (one sign missing over the whole corpus)")
  }
}
