package graft.tools

import org.apache.spark.sql.SparkSession

import graft.Tables
import graft.operators.{IvfIndex, PqIndex}

/** Cold vs warm rebuild timing for the trainable index families —
  * BASELINE's §warm-start row: build() cold, then rebuildWarm() seeded
  * from that generation, wall-clock each (the serve contract itself is
  * WarmRetrainSpec's job; this prices it). One JSON line.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.tools.RebuildBench
  */
object RebuildBench {
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

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def ms(d: Double): String = f"$d%.3f"

    val out = Seq("ivf", "pq").map { fam =>
      val state = new graft.streaming.StateDir(spark,
        java.nio.file.Files.createTempDirectory(s"rebuild-$fam").toString)
      val ix = if (fam == "ivf") new IvfIndex(spark, state)
               else new PqIndex(spark, state)
      val warmup = time(ix.build(sfDir)) // JIT/codegen absorb
      val cold = time(ix.build(sfDir))
      val warm = time(ix.rebuildWarm(sfDir))
      s""""$fam":{"warmup":${ms(warmup)},"cold":${ms(cold)},"warm":${ms(warm)}}"""
    }
    println(s"""{"metric":"rebuild","sf":"$sfDir",${out.mkString(",")}}""")
    spark.stop()
  }
}
