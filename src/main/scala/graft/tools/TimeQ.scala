package graft.tools
import org.apache.spark.sql.SparkSession
import graft.{SparkEntry, Tables}

/** Dev tool: time named queries (count action) after a warmup. */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    Tables.sessionConfigs.foreach { case (k, v) => builder.config(k, v) }
    Tables.corpusConfigs(sfDir, cpus).foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    // SPARK_GRAFT_LOG=INFO surfaces DAGScheduler stage names when
    // chasing a stage-numbered failure at scale
    spark.sparkContext.setLogLevel(sys.env.getOrElse("SPARK_GRAFT_LOG", "ERROR"))
    SparkEntry.entry(spark).count() // warmup: JIT + codegen + parquet path
    args.foreach { name =>
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      println(f"TIMEQ $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    spark.stop()
  }
}
