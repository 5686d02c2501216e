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

  /** Binned range join at non-broadcast scale: low-quantity lineitem prices
    * banded against a NARROW interval per part ([retailprice·10,
    * +200) — |intervals| = |part|, beyond broadcast at real scale). Band
    * width matters: a wide band makes the RESULT quadratic in sf no matter
    * the algorithm (the first cut of this query used a 5000-wide band per
    * order and produced billions of pairs at sf0.1 — the bench caught it);
    * a selective band keeps the matched-pair count linear-ish (~7k at
    * sf0.01, ~920k at sf0.1). The oracle runs the naive range join — hash
    * equality proves the binned rewrite exact. */
  def q39BinnedRangeJoin(s: SparkSession, d: String): DataFrame = {
    val points = Tables.lineitem(s, d)
      .filter(col("l_quantity") < 3)
      .select(col("l_extendedprice").as("price"))
    val intervals = Tables.part(s, d)
      .select(col("p_partkey"),
        (col("p_retailprice") * 10).as("lo"),
        (col("p_retailprice") * 10 + 200).as("hi"))
    binnedPointInterval(points, "price", intervals, "lo", "hi", binWidth = 200L)
      .groupBy(col("p_partkey"))
      .agg(count(lit(1)).as("n"),
        sum(col("price").cast(DecimalType(18, 2))).cast("double").as("sum_price"))
      .orderBy(col("p_partkey"))
  }

  def q39Sql: String =
    """SELECT p_partkey, count(*) AS n,
      |  CAST(sum(CAST(price AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      |FROM (SELECT l_extendedprice AS price FROM lineitem WHERE l_quantity < 3) p
      |JOIN (SELECT p_partkey, p_retailprice*10 AS lo, p_retailprice*10 + 200 AS hi
      |      FROM part) i
      |  ON price >= lo AND price < hi
      |GROUP BY p_partkey ORDER BY p_partkey""".stripMargin
}
