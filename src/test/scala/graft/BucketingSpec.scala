package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The 100 TB join strategy made concrete: lineitem and orders bucketed by
  * the join key into the same bucket count join WITHOUT any exchange — the
  * shuffle the q04 scaladoc promises to eliminate. This is the physical
  * design the engine prescribes for fact-fact joins at scale (bucket
  * pruning + per-bucket sort-merge); the spec pins the plan property so a
  * regression (bucketing metadata lost, bucket counts drifting) fails CI. */
class BucketingSpec extends AnyFunSuite {
  import TestSession.spark

  test("bucketed fact-fact join plans with zero Exchange and matches unbucketed result") {
    val warehouse = Files.createTempDirectory("graft-wh-").toString
    val conf = spark.conf
    val oldThreshold = conf.get("spark.sql.autoBroadcastJoinThreshold")
    val oldAqe = conf.get("spark.sql.adaptive.enabled")
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      conf.set("spark.sql.adaptive.enabled", "false")        // static plan

      Tables.lineitem(spark, TestSession.sf)
        .write.mode("overwrite")
        .option("path", s"$warehouse/li")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("graft_li_bucketed")
      Tables.orders(spark, TestSession.sf)
        .write.mode("overwrite")
        .option("path", s"$warehouse/ord")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("graft_ord_bucketed")

      val joinOnly = spark.table("graft_li_bucketed")
        .join(spark.table("graft_ord_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
      // the JOIN subtree must carry no shuffle at all — bucket layout
      // satisfies SMJ's distribution requirement on both sides. (The
      // group-by below legitimately reshuffles on its own key.)
      val joinPlan = joinOnly.queryExecution.executedPlan.toString
      assert(joinPlan.contains("SortMergeJoin"), s"expected SMJ, got:\n$joinPlan")
      assert(!joinPlan.contains("Exchange"),
        s"bucketed join must not shuffle:\n$joinPlan")
      assert(joinPlan.contains("SelectedBucketsCount"), s"bucketed scan expected:\n$joinPlan")

      val joined = joinOnly
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
      val bucketed = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val plain = Tables.lineitem(spark, TestSession.sf)
        .join(Tables.orders(spark, TestSession.sf),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(bucketed == plain)
    } finally {
      conf.set("spark.sql.autoBroadcastJoinThreshold", oldThreshold)
      conf.set("spark.sql.adaptive.enabled", oldAqe)
      spark.sql("DROP TABLE IF EXISTS graft_li_bucketed")
      spark.sql("DROP TABLE IF EXISTS graft_ord_bucketed")
    }
  }
}
