package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Vectors
import graft.operators.Ivf

/** IVF dial sweep — measures recall@3 and candidate fraction for
  * (cells, nprobe) combinations on a given embeddings corpus, against
  * brute-force ground truth. This is the measurement `Dials.IvfCells`'
  * guidance tells a deployment to run first on ITS corpus: the fixture
  * default (near-random unit vectors) is the pathological floor for a
  * coarse quantizer, and `tools/gensf.py --clusters K` generates the
  * clusterable counterpart where the √N-cells sizing is supposed to
  * earn its keep. Results land in BASELINE §sf1.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.tools.AnnDialSweep 8:4,141:4,141:8
  * (each combo is cells:nprobe; probes are the q40 contract's ids.)
  * One JSON line per combo + a trailing summary line.
  */
object AnnDialSweep {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val combos = args.headOption.getOrElse("8:4,141:4,141:8,141:16")
      .split(",").toSeq.map { c =>
        val Array(k, np) = c.split(":"); (k.toInt, np.toInt)
      }
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
    val n = emb.count()
    val probePred = col("vec_id") >= Ivf.ProbeFrom &&
      col("vec_id") < Ivf.ProbeFrom + Ivf.NProbes

    // brute-force ground truth: exact cosine top-3 per probe
    val probes = emb.filter(probePred)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pe"),
        col("n2").as("pn2"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    val gt = emb.crossJoin(broadcast(probes))
      .filter(col("vec_id") =!= col("probe_id"))
      .withColumn("cosine",
        Vectors.dot(col("pe"), col("embedding")) / sqrt(col("pn2") * col("n2")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("probe_id"), col("vec_id"))
    val gtSet = gt.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    def pct(d: Double): String = f"$d%.3f"
    val rows = combos.map { case (k, np) =>
      val (base, trained) = Ivf.train(spark, sfDir, rounds = 2, k = k)
      val tagged = Ivf.assignTo(base, trained).persist()
      val nCells = trained.count() // cells that kept vectors
      val pcells = Ivf.rankCells(tagged.filter(probePred), trained, np)
        .select(col("vec_id").as("probe_id"), col("cell"))
      val candN = tagged.join(broadcast(pcells), Seq("cell"))
        .filter(col("vec_id") =!= col("probe_id")).count()
      val got = Ivf.serveWhere(tagged, trained, probePred, 3, nCells = np)
        .select(col("probe_id"), col("vec_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      tagged.unpersist()
      val recall = got.count(gtSet.contains).toDouble / gtSet.size
      val frac = candN.toDouble / (Ivf.NProbes * n)
      val line = s"""{"cells":$k,"kept_cells":$nCells,"nprobe":$np,""" +
        s""""recall_at3":${pct(recall)},"cand_fraction":${pct(frac)}}"""
      println(line)
      line
    }
    println(s"""{"metric":"ann_dial_sweep","sf":"$sfDir","n_vectors":$n,""" +
      s""""combos":[${rows.mkString(",")}]}""")
    spark.stop()
  }
}
