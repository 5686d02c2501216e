package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session for all suites (one JVM, local mode). */
object TestSession {
  lazy val spark: SparkSession = {
    val b = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
    Tables.sessionConfigs.foreach { case (k, v) => b.config(k, v) }
    val s = b.getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf = "/root/testdata/sf0.001"
}

class EntrySmokeSpec extends AnyFunSuite {
  test("entry flagship returns rows on sf0.001") {
    assert(SparkEntry.entry(TestSession.spark).count() > 0)
  }
  test("every declared query runs on sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(TestSession.spark, TestSession.sf).count()
      assert(n >= 0, s"$name failed")
    }
  }
  test("every oracle key has a query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("plan contract: no CartesianProduct in any declared query") {
    // the 100 TB line in the sand: every join must be keyed or broadcast —
    // a cartesian between data-scale sides never survives a scale-up.
    // (crossJoin against a broadcast-bounded side plans as
    // BroadcastNestedLoopJoin, which this permits by design.)
    SparkEntry.queries.foreach { case (name, fn) =>
      val plan = fn(TestSession.spark, TestSession.sf)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), s"$name plans a cartesian")
    }
  }
}
