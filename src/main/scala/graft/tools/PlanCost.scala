package graft.tools
import org.apache.spark.sql.SparkSession
import graft.{SparkEntry, Tables}

/** Dev tool: split a named query's per-invocation cost into plan-build
  * (construct the DataFrame + force executedPlan, no job) vs execution
  * (count), each repeated — names how much of a bench row is driver-side
  * Catalyst work that re-runs every attempt. */
object PlanCost {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = Tables.configureMaster(SparkSession.builder(), cpus)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    Tables.sessionConfigs.foreach { case (k, v) => builder.config(k, v) }
    Tables.corpusConfigs(sfDir, cpus).foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.entry(spark).count()
    args.foreach { name =>
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(name)(spark, sfDir)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan // analyze + optimize + plan, no job
        val t2 = System.nanoTime()
        df.count()
        val t3 = System.nanoTime()
        println(f"PLANCOST $name%-24s r$i build=${(t1 - t0) / 1e9}%6.2f plan=${(t2 - t1) / 1e9}%6.2f exec=${(t3 - t2) / 1e9}%6.2f")
      }
    }
    spark.stop()
  }
}
