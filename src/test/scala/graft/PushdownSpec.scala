package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Relational

/** Optimizer contracts the scale design relies on, pinned as tests: filters
  * must reach the parquet scan (PushedFilters) and projection must prune
  * the read schema (ReadSchema) — if a refactor breaks pushdown, this
  * fails, not a 100 TB bill. */
class PushdownSpec extends AnyFunSuite {
  import TestSession.spark

  test("q02's predicates land in PushedFilters and its projection prunes ReadSchema") {
    val plan = Relational.q02SelectiveFilter(spark, TestSession.sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters:"), plan)
    assert(plan.contains("IsNotNull(l_returnflag)") || plan.contains("EqualTo(l_returnflag,R)"),
      s"equality filter not pushed:\n$plan")
    // 11-column table, 7-column read (4 output + 3 filter-only).
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema:")).getOrElse("")
    assert(!readSchema.contains("l_shipdate") && !readSchema.contains("l_partkey"),
      s"unused columns not pruned:\n$readSchema")
  }

  test("aggregates use map-side partial aggregation (two HashAggregates around the exchange)") {
    val plan = Relational.q03JoinAgg(spark, TestSession.sf)
      .queryExecution.executedPlan.toString
    assert("HashAggregate".r.findAllIn(plan).size >= 2, plan)
    assert(plan.contains("partial_"), s"no partial aggregation:\n$plan")
  }

  test("dimension joins broadcast (no shuffle of the fact side for q03)") {
    val plan = Relational.q03JoinAgg(spark, TestSession.sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("q111 prunes the documents read to its three columns, pushes IsNotNull") {
    val plan = graft.operators.PiiScan.q111PiiScan(spark, TestSession.sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("IsNotNull(text)"), s"text filter not pushed:\n$plan")
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema:")).getOrElse("")
    assert(!readSchema.contains("lang") && !readSchema.contains("n_chars"),
      s"unused columns not pruned:\n$readSchema")
  }

  test("q112's sketch aggregate runs partial-then-final (ObjectHashAggregate pair)") {
    val plan = graft.operators.Sketch.q112KmvVocab(spark, TestSession.sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(plan.contains("partial_graft_kmin"),
      s"no map-side partial k-min (full rows would reach the exchange):\n$plan")
  }

  test("q113's threshold side broadcasts; the corpus never shuffles for the join") {
    val plan = graft.operators.Sampling.q113WeightedSample(spark, TestSession.sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"threshold join not broadcast:\n$plan")
  }
}
