package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Scalable point-in-interval joins (J4 generalized — SURVEY.md §2.3,
  * §4 item 2: "avoid O(n·m) BroadcastNestedLoopJoin" when the interval
  * table is NOT broadcast-small).
  *
  * q18 handles the broadcast-small case. When intervals number in the
  * millions, the standard rewrite is BINNING: pick a bin width, explode
  * each interval into the bins it covers, tag each point with its bin, and
  * equi-join on the bin before an exact containment post-filter. The plan
  * becomes a plain shuffled hash join — O(points + Σ interval-bins) moved,
  * fully parallel, no nested loop anywhere. Bin width trades replication
  * (wide intervals → more bins) against selectivity; a production engine
  * derives it from interval-length quantiles. The same composition of
  * built-ins (sequence → explode → equi-join → filter) is exactly what a
  * custom range-join SparkStrategy would emit, without leaving Catalyst's
  * optimizer behind.
  */
object RangeJoin {

  /** points(pointCol) ⋈ intervals[lo, hi) via bins of `binWidth`.
    * Returns the joined frame with all columns of both inputs. */
  def binnedPointInterval(points: DataFrame, pointCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      binWidth: Long): DataFrame = {
    val binnedPoints = points
      .withColumn("_bin", (col(pointCol) / binWidth).cast("long"))
    val binnedIntervals = intervals
      .withColumn("_bin", explode(sequence(
        (col(loCol) / binWidth).cast("long"),
        // hi inclusive at the bin level even though the interval is
        // half-open: for non-integer bounds the last covered bin is
        // floor(hi/w) (one spurious bin when hi sits exactly on an edge —
        // the exact containment post-filter discards it).
        (col(hiCol) / binWidth).cast("long"))))
    binnedPoints.join(binnedIntervals, Seq("_bin"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("_bin")
  }

  // ---------------------------------------------------------------- q39

  /** Binned range join at non-broadcast scale: every lineitem's extended
    * price banded against an interval PER ORDER (|intervals| = |orders| —
    * far beyond broadcast at real scale). Each order defines the band
    * [totalprice/10, totalprice/10 + 5000); output: per-order count/sum of
    * price-compatible lineitems. The oracle runs the naive range join —
    * hash equality proves the binned rewrite exact. */
  def q39BinnedRangeJoin(s: SparkSession, d: String): DataFrame = {
    val points = Tables.lineitem(s, d)
      .select(col("l_extendedprice").as("price"))
    val intervals = Tables.orders(s, d)
      .select(col("o_orderkey"),
        (col("o_totalprice") / 10).as("lo"),
        (col("o_totalprice") / 10 + 5000).as("hi"))
    binnedPointInterval(points, "price", intervals, "lo", "hi", binWidth = 1000L)
      .groupBy(col("o_orderkey"))
      .agg(count(lit(1)).as("n"),
        sum(col("price").cast(DecimalType(18, 2))).cast("double").as("sum_price"))
      .orderBy(col("o_orderkey"))
  }

  def q39Sql: String =
    """SELECT o_orderkey, count(*) AS n,
      |  CAST(sum(CAST(price AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      |FROM (SELECT l_extendedprice AS price FROM lineitem) p
      |JOIN (SELECT o_orderkey, o_totalprice/10 AS lo, o_totalprice/10 + 5000 AS hi
      |      FROM orders) i
      |  ON price >= lo AND price < hi
      |GROUP BY o_orderkey ORDER BY o_orderkey""".stripMargin
}
