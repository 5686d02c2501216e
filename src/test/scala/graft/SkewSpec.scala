package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Skew

/** Salting must never change results — only the intermediate key space. */
class SkewSpec extends AnyFunSuite {
  import TestSession.spark
  import spark.implicits._

  test("saltedSum == plain groupBy sum on a skewed distribution") {
    // 90% of rows share one key — the classic straggler shape.
    val skewed = spark.range(0, 10000)
      .select(when($"id" % 10 === 0, concat(lit("k"), $"id" % 7))
        .otherwise(lit("HOT")).as("key"),
        ($"id" % 100).cast("long").as("v"), $"id")
    val salted = Skew.saltedSum(skewed, $"key", $"v", $"id", salts = 8)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val plain = skewed.groupBy("key")
      .agg(sum("v").as("s"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(salted == plain)
  }

  test("saltedJoin == plain join on a hot-keyed table") {
    val big = spark.range(0, 5000)
      .select((when($"id" % 5 === 0, $"id" % 25).otherwise(lit(1L))).as("k"),
        $"id".as("payload"))
    val dim = spark.range(0, 25).select($"id".as("k"), concat(lit("d"), $"id").as("label"))
    val salted = Skew.saltedJoin(big, dim, "k", $"payload", salts = 8)
      .groupBy("label").agg(count(lit(1)).as("n"), sum("payload").as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val plain = big.join(dim, Seq("k"))
      .groupBy("label").agg(count(lit(1)).as("n"), sum("payload").as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted == plain)
  }
}
