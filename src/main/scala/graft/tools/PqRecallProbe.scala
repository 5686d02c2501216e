package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Vectors
import graft.operators.{Ivf, Pq}

/** Recall@3 of the PRODUCTION ANN plans (q40 IVF exact-rerank, q92
  * IVF-PQ ADC+rerank) at the fixture dials, against brute-force ground
  * truth — [[AnnDialSweep]]'s companion for the approximate legs: the
  * sweep prices the coarse stage per (K, nprobe); this prices the two
  * declared plans as shipped, so a corpus swap (near-random vs planted
  * clusters, `gensf.py --clusters`) shows what the DIALS deliver on
  * each. One JSON line.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.tools.PqRecallProbe
  */
object PqRecallProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    Tables.sessionConfigs.foreach { case (k, v) => builder.config(k, v) }
    Tables.corpusConfigs(sfDir, cpus).foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"),
        Vectors.dot(col("embedding"), col("embedding")).as("n2"))
      .persist()
    val probePred = col("vec_id") >= Ivf.ProbeFrom &&
      col("vec_id") < Ivf.ProbeFrom + Ivf.NProbes
    val probes = emb.filter(probePred)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pe"),
        col("n2").as("pn2"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    val gtSet = emb.crossJoin(broadcast(probes))
      .filter(col("vec_id") =!= col("probe_id"))
      .withColumn("cosine",
        Vectors.dot(col("pe"), col("embedding")) / sqrt(col("pn2") * col("n2")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("probe_id"), col("vec_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.select(col("probe_id"), col("vec_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      got.count(gtSet.contains).toDouble / gtSet.size
    }
    val ivf = recallOf(Ivf.q40IvfAnn(spark, sfDir))
    val pq = recallOf(Pq.q92IvfPqAnn(spark, sfDir))
    println(f"""{"metric":"ann_recall_probe","sf":"$sfDir",""" +
      f""""q40_ivf_recall_at3":$ivf%.3f,"q92_pq_recall_at3":$pq%.3f}""")
    spark.stop()
  }
}
