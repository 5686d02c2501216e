package graft.tools
import org.apache.spark.sql.SparkSession
import graft.{SparkEntry, Tables}

/** Dev tool: run the bench-ordered queries up to (and including) the
  * named query, then print every CacheManager entry's plan head — the
  * audit's "UNOWNED persists" counter names a number; this names the
  * plans, so an unowned persist can be traced to its owner. */
object CacheAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val upTo = args.headOption.getOrElse("q46_cosine_neardup")
    val builder = Tables.configureMaster(SparkSession.builder(), cpus)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    Tables.sessionConfigs.foreach { case (k, v) => builder.config(k, v) }
    Tables.corpusConfigs(sfDir, cpus).foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = SparkEntry.queries.keys.toSeq
    val cut = names.indexOf(upTo)
    names.take(cut + 1).foreach { n =>
      SparkEntry.queries(n)(spark, sfDir).count()
      val cached = org.apache.spark.sql.graft.shims.cachedPlanCount(spark)
      val owned = graft.operators.StagedCache.ownedCount
      if (cached != owned) println(s"[audit] after $n: cached=$cached owned=$owned")
    }
    val cm = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sharedState.cacheManager
    val m = cm.getClass.getDeclaredMethod("cachedData")
    m.setAccessible(true)
    m.invoke(cm).asInstanceOf[scala.collection.Seq[_]].foreach { cd =>
      val pf = cd.getClass.getDeclaredMethod("plan")
      val plan = pf.invoke(cd)
      val line = plan.toString.linesIterator
        .filter(_.nonEmpty).take(3).mkString(" | ").take(300)
      println(s"[cached] $line")
    }
    spark.stop()
  }
}
