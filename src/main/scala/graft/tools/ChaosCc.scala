package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables

/** Executor-loss chaos probe for the iterative CC solver — the measured
  * half of the [[graft.operators.Dedup.ReliableCcConf]] claim. Until r11
  * the reliable-checkpoint mode was spec'd only under local
  * checkpointing in a single JVM; this tool runs the REAL failure: a
  * `local-cluster` session (separate executor processes), the solver
  * mid-fixpoint, and `kill -9` on one executor.
  *
  * Phases:
  *  1. stage the near-dup pair graph to parquet (so the solve under test
  *     reads fault-tolerant storage — the production shape, where pairs
  *     come from a persisted StateDir table; the in-query staged
  *     localCheckpoints are DOCUMENTED as executor-loss-fragile speed
  *     defaults and are not what ReliableCcConf protects);
  *  2. solve uninterrupted → reference labels;
  *  3. solve again with `ReliableCcConf=true` + a shared checkpoint dir,
  *     killing one executor process partway through — the standalone
  *     worker relaunches it, lost tasks retry, lost shuffle data
  *     recomputes from the reliable per-round checkpoints;
  *  4. assert label-for-label equality with the reference and that the
  *     kill really landed (pid gone, replacement executor registered).
  *
  * Run: `SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13
  * SPARK_GRAFT_MASTER=local-cluster[2,8,2048] java -cp ... ChaosCc`.
  * Emits one JSON line: {"chaos":"cc","killed":<pid>,"match":true,...}.
  */
object ChaosCc {

  /** Executor processes of THIS session only: matched on both the backend
    * class and `--app-id <applicationId>` in the command line, so a chaos
    * probe on a shared box (concurrent benches are a known pattern here)
    * can never SIGKILL an executor belonging to an unrelated Spark job. */
  private def executorPids(appId: String): Seq[Long] = {
    val self = ProcessHandle.current().pid()
    import scala.jdk.CollectionConverters._
    ProcessHandle.allProcesses().iterator().asScala
      .filter(p => p.pid() != self)
      .filter(_.info().commandLine().map[Boolean](cl =>
        cl.contains("CoarseGrainedExecutorBackend")
          && cl.contains(appId)).orElse(false))
      .map(_.pid()).toSeq
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    require(sys.env.getOrElse("SPARK_GRAFT_MASTER", "")
        .startsWith("local-cluster"),
      "ChaosCc needs SPARK_GRAFT_MASTER=local-cluster[...] — killing an " +
        "executor thread inside local[*] would just kill the JVM")
    val builder = Tables.configureMaster(SparkSession.builder(), "8")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      // the whole point is killing executors mid-FIXPOINT: force the
      // distributed solver even on a fixture-sized pair graph
      .config(graft.operators.Dedup.LocalCcMaxConf, "0")
    Tables.sessionConfigs.foreach { case (k, v) => builder.config(k, v) }
    Tables.corpusConfigs(sfDir, "8").foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val work = java.nio.file.Files.createTempDirectory("graft-chaos-").toString
    spark.sparkContext.setCheckpointDir(s"$work/ckpt")

    // phase 1: pairs to fault-tolerant storage (the production feed shape)
    graft.operators.Dedup.minhashPairsOf(
      Tables.documents(spark, sfDir))
      .write.mode("overwrite").parquet(s"$work/pairs")
    val pairs = () => spark.read.parquet(s"$work/pairs")

    // phase 2: uninterrupted reference solve
    val expect = graft.operators.Dedup.connectedComponents(pairs())
      .orderBy(col("v")).collect().map(r => (r.getLong(0), r.getLong(1)))

    // phase 3: chaos solve — reliable checkpoints, one executor SIGKILLed
    spark.conf.set(graft.operators.Dedup.ReliableCcConf, "true")
    val appId = spark.sparkContext.applicationId
    val before = executorPids(appId).toSet
    require(before.nonEmpty, "no executor processes visible — not local-cluster?")
    @volatile var killed = -1L
    val killer = new Thread(() => {
      Thread.sleep(1500) // land mid-fixpoint (the solve runs for seconds)
      val victim = executorPids(appId).headOption.getOrElse(-1L)
      if (victim > 0) {
        new ProcessBuilder("kill", "-9", victim.toString).start().waitFor()
        killed = victim
      }
    })
    killer.setDaemon(true)
    killer.start()
    val got = graft.operators.Dedup.connectedComponents(pairs())
      .orderBy(col("v")).collect().map(r => (r.getLong(0), r.getLong(1)))
    killer.join(10000)

    val victimDead = killed > 0 && !executorPids(appId).contains(killed)
    val matches = got.sameElements(expect)
    println(s"""{"chaos":"cc","killed":$killed,"victim_dead":$victimDead,""" +
      s""""labels":${got.length},"match":$matches}""")
    spark.stop()
    if (!matches || killed <= 0) sys.exit(1)
  }
}
