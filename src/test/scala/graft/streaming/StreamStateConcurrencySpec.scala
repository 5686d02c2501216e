package graft.streaming

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSession
import graft.operators.StreamState

/** Two sessions drive q107 builds over two corpora CONCURRENTLY in one
  * JVM — the multi-tenant shape the r12 per-slot locking exists for. The
  * deterministic lock-granularity pin lives in
  * [[graft.operators.BuildMemoSpec]] (wall-clock ordering of two real
  * streaming builds on one shared local context is scheduler-noise — the
  * small build can starve for cores behind the big one; observed 1.1 s);
  * here the pin is that concurrent real builds are SAFE: both complete
  * and both serve the same state a solo build produces. */
class StreamStateConcurrencySpec extends AnyFunSuite {
  import TestSession.spark

  test("two sessions build q107 over different corpora concurrently") {
    val sBig = spark.newSession()
    val sSmall = spark.newSession()
    val big = "/root/testdata/sf0.01"
    val small = "/root/testdata/sf0.001"

    @volatile var nBig = -1L
    @volatile var nSmall = -1L
    @volatile var err: Throwable = null
    def runner(s: SparkSession, d: String, done: Long => Unit) = new Thread(() =>
      try {
        SparkSession.setActiveSession(s)
        done(StreamState.q107StreamState(s, d).count())
      } catch { case t: Throwable => err = t })

    val a = runner(sBig, big, nBig = _)
    val b = runner(sSmall, small, nSmall = _)
    a.start()
    Thread.sleep(1000) // let the big build take ITS slot lock first
    b.start()
    a.join(300000); b.join(300000)
    if (err != null) throw err
    assert(nBig > 0 && nSmall > 0, "both concurrent builds must complete")
    // each session's state equals the solo batch twin (split-invariance
    // already driver-gated; this pins it under concurrency)
    assert(nSmall ==
      graft.operators.Dedup.q20MinhashNeardup(spark, small).count())
    assert(nBig ==
      graft.operators.Dedup.q20MinhashNeardup(spark, big).count())
  }
}
