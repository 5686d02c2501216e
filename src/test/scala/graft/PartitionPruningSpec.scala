package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Partition layout + pruning — the third leg of the physical-design trio
  * (predicate pushdown: PushdownSpec; bucketing: BucketingSpec). A
  * date-partitioned fact write must let a partition-key predicate prune at
  * PLANNING time: the scan's PartitionFilters carry the predicate and only
  * matching directories are read. This is what replaces the reference's
  * driver-side indexes at 100 TB (SURVEY §4). */
class PartitionPruningSpec extends AnyFunSuite {
  import TestSession.spark

  test("partition-key predicate prunes the scan to matching partitions only") {
    val dir = Files.createTempDirectory("graft-part-").toString
    Tables.orders(spark, TestSession.sf)
      .withColumn("order_year", year(col("o_orderdate")))
      .write.mode("overwrite").partitionBy("order_year").parquet(dir)

    val years = Tables.orders(spark, TestSession.sf)
      .select(year(col("o_orderdate"))).distinct().count()
    assert(years > 1, "fixture must span multiple years for the test to bite")

    val pruned = spark.read.parquet(dir).filter(col("order_year") === 1995)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters:") &&
      plan.contains("order_year"), s"partition filter missing:\n$plan")

    // physical proof: only the matching directory is actually scanned.
    val scanned = pruned.select(input_file_name()).distinct()
      .collect().map(_.getString(0))
    assert(scanned.nonEmpty && scanned.forall(_.contains("order_year=1995")),
      s"scan touched non-matching partitions: ${scanned.toSeq}")

    // correctness: pruned result equals the unpartitioned filter.
    val expected = Tables.orders(spark, TestSession.sf)
      .filter(year(col("o_orderdate")) === 1995).count()
    assert(pruned.count() == expected)
  }
}
