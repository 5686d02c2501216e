package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.streaming.{DedupStream, StateDir, StreamMain}

/** Executor-loss chaos probe for the STREAMING ingest fabric — the
  * companion of [[ChaosCc]] (which kills the batch CC solver): run the
  * production `StreamMain` docs pipeline over a multi-file arrivals drop
  * in a `local-cluster` session, SIGKILL one executor process while the
  * micro-batches are flowing, and assert the dedup-pair STATE the run
  * leaves behind is exactly the one-shot batch twin (q20's pair set) —
  * i.e. the T9 batch-id ledger + delta-append protocol survives real
  * process death, not just the single-JVM crash/replay the suite pins.
  *
  * Task-level story: an executor dying mid-batch fails its tasks; Spark
  * retries them on the survivor (and the relaunched executor); a batch
  * that dies between its five state-table appends replays and
  * self-heals by the batch-id guards. Either way the final state is
  * bit-equal to the uninterrupted run's.
  *
  * Run: `SPARK_HOME=... SPARK_SCALA_VERSION=2.13
  * SPARK_GRAFT_MASTER=local-cluster[2,8,2048] ... ChaosStream`.
  * Emits {"chaos":"stream","killed":<pid>,...,"match":true}.
  */
object ChaosStream {

  /** Executor processes of THIS session only (matched on backend class +
    * `--app-id`), so a probe on a shared box never kills an executor of
    * an unrelated Spark job. */
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
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    require(sys.env.getOrElse("SPARK_GRAFT_MASTER", "")
        .startsWith("local-cluster"),
      "ChaosStream needs SPARK_GRAFT_MASTER=local-cluster[...]")
    val builder = Tables.configureMaster(SparkSession.builder(), "8")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
    Tables.sessionConfigs.foreach { case (k, v) => builder.config(k, v) }
    Tables.corpusConfigs(sfDir, "8").foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val work = java.nio.file.Files.createTempDirectory("graft-chaos-").toString

    // arrivals fixture: 8 slices, one parquet file each, in slice order
    val slices = 8
    (0 until slices).foreach { i =>
      val stage = s"$work/stage"
      Tables.documents(spark, sfDir)
        .select(col("doc_id"), col("source"), col("text"))
        .filter(col("doc_id") % slices === i)
        .coalesce(1).write.mode("overwrite").parquet(stage)
      val part = java.nio.file.Files.list(java.nio.file.Paths.get(stage))
        .filter(p => p.getFileName.toString.startsWith("part-")
          && p.getFileName.toString.endsWith(".parquet"))
        .findFirst().orElseThrow()
      java.nio.file.Files.createDirectories(
        java.nio.file.Paths.get(s"$work/arrivals"))
      java.nio.file.Files.move(part,
        java.nio.file.Paths.get(f"$work/arrivals/arrival-$i%02d.parquet"))
    }

    val appId = spark.sparkContext.applicationId
    @volatile var killed = -1L
    val killer = new Thread(() => {
      Thread.sleep(4000) // land while micro-batches are flowing
      val victim = executorPids(appId).headOption.getOrElse(-1L)
      if (victim > 0) {
        new ProcessBuilder("kill", "-9", victim.toString).start().waitFor()
        killed = victim
      }
    })
    killer.setDaemon(true)
    killer.start()
    // If the kill is violent enough to fail the streaming QUERY (not just
    // its tasks), the production contract is restart-and-replay: the
    // checkpoint resumes at the failed batch and the batch-id ledger makes
    // the replay exact. Either path must end in the same state.
    val cfg = StreamMain.Config("docs", s"$work/arrivals",
      s"$work/state", intervalMs = 20L, once = true, maxFilesPerBatch = 1)
    var restarted = false
    try StreamMain.run(spark, cfg)
    catch { case _: Throwable => restarted = true; StreamMain.run(spark, cfg) }
    killer.join(15000)

    val streamed = new DedupStream(spark, new StateDir(spark, s"$work/state/dedup"))
      .pairsSnapshot.select(col("doc_a"), col("doc_b"), col("score"))
      .orderBy(col("doc_a"), col("doc_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val batch = graft.operators.Dedup.q20MinhashNeardup(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val victimDead = killed > 0 && !executorPids(appId).contains(killed)
    val matches = streamed.sameElements(batch)
    println(s"""{"chaos":"stream","killed":$killed,"victim_dead":$victimDead,""" +
      s""""restarted":$restarted,"pairs":${streamed.length},"match":$matches}""")
    spark.stop()
    if (!matches || killed <= 0) sys.exit(1)
  }
}
