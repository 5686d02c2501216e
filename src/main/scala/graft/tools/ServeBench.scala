package graft.tools

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import org.apache.spark.sql.SparkSession

import graft.{SparkEntry, Tables}

/** Serve-path latency under CONCURRENCY — the deployment question the
  * one-at-a-time bench rows (q86/q93/q96/q99) don't answer: a retrieval
  * deployment runs concurrent probes against one shared session, so the
  * per-probe latency under N parallel callers (scheduler contention,
  * ServedMemo lock, shared shuffle service) is the number that matters.
  *
  * Method: warm once (builds the session memos — the priced serve paths
  * never retrain), run `iters` sequential calls for the solo baseline,
  * then `threads`×`iters` calls from a fixed thread pool against the
  * SAME session, all callers released together. Reports per-probe
  * p50/p95 for both, one JSON line (BASELINE.md records it).
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.tools.ServeBench
  *          [queryName] [threads] [iters]
  */
object ServeBench {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q99_served_hybrid")
    val threads = args.lift(1).map(_.toInt).getOrElse(8)
    val iters = args.lift(2).map(_.toInt).getOrElse(5)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      // FAIR pools: N concurrent probes should share executor slots
      // instead of queuing whole-job FIFO behind each other
      .config("spark.scheduler.mode", "FAIR")
    Tables.sessionConfigs.foreach { case (k, v) => builder.config(k, v) }
    Tables.corpusConfigs(sfDir, cpus).foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = SparkEntry.queries(name)

    def once(): Double = {
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      (System.nanoTime() - t0) / 1e9
    }
    def pct(xs: Seq[Double], p: Double): Double = {
      val s = xs.sorted
      s(math.min(s.size - 1, math.ceil(p * s.size).toInt - 1))
    }
    def ms(d: Double): String = f"$d%.3f"

    once(); once() // warm: memo build + JIT + codegen

    val solo = Seq.fill(iters)(once())

    val pool = Executors.newFixedThreadPool(threads)
    val start = new CountDownLatch(1)
    val results = (0 until threads).map { _ =>
      pool.submit(new java.util.concurrent.Callable[Seq[Double]] {
        def call(): Seq[Double] = { start.await(); Seq.fill(iters)(once()) }
      })
    }
    val t0 = System.nanoTime()
    start.countDown()
    val concurrent = results.flatMap(_.get())
    val wall = (System.nanoTime() - t0) / 1e9
    pool.shutdown(); pool.awaitTermination(1, TimeUnit.MINUTES)

    println(s"""{"metric":"serve_concurrency","query":"$name"""" +
      s""","threads":$threads,"iters":$iters""" +
      s""","solo_p50":${ms(pct(solo, 0.5))},"solo_p95":${ms(pct(solo, 0.95))}""" +
      s""","conc_p50":${ms(pct(concurrent, 0.5))},"conc_p95":${ms(pct(concurrent, 0.95))}""" +
      s""","wall":${ms(wall)},"throughput_qps":${ms(concurrent.size / wall)}""" +
      s""","sf":"$sfDir"}""")
    spark.stop()
  }
}
