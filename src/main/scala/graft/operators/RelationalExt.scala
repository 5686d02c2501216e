package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Relational surface beyond the reference's own inventory — outer joins,
  * correlated subqueries, the full window-function zoo, exact moment
  * statistics and pivot — declared so a user of the engine has the standard
  * analytic SQL toolbox (SURVEY.md §2.4 "not present" list, closed here).
  * Same scale rules as [[Relational]]: decimal-exact money sums, broadcast
  * dims, per-key windows, deterministic ORDER BY tails.
  */
object RelationalExt {

  private def dec(c: org.apache.spark.sql.Column) = c.cast(DecimalType(18, 2))

  // ---------------------------------------------------------------- q13

  /** LEFT OUTER join with null-side aggregation: every customer, with
    * count/sum of their big orders, 0 when none (the classic left-join +
    * coalesce shape; preserves rows the inner join would drop). */
  def q13OuterJoin(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(Tables.orders(s, d).filter(col("o_totalprice") > 150000),
        col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"), col("c_mktsegment"))
      .agg(count(col("o_orderkey")).as("n_big"),
        coalesce(sum(dec(col("o_totalprice"))).cast("double"), lit(0.0)).as("sum_big"))
      .orderBy(col("c_custkey"))

  def q13Sql: String =
    """SELECT c_custkey, c_mktsegment, count(o_orderkey) AS n_big,
      |  coalesce(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 0.0) AS sum_big
      |FROM customer LEFT OUTER JOIN orders
      |  ON c_custkey = o_custkey AND o_totalprice > 150000
      |GROUP BY c_custkey, c_mktsegment ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------- q31

  /** Correlated aggregate subquery (TPC-H Q17 shape): lineitems whose
    * quantity is below 20% of their part's average — the per-part average
    * as an unbounded window, one corpus exchange total (see the in-body
    * comment for the measured A/B against the decorrelated-join form). */
  def q31SubqueryAgg(s: SparkSession, d: String): DataFrame = {
    // Window form, not decorrelated-join form (r11 rewrite): the per-part
    // average as an unbounded window over l_partkey computes in the SAME
    // exchange+sort that a join formulation would pay just for its SMJ
    // probe side — the join form ALSO shuffles the groupBy (map-side
    // partials barely reduce at |parts| ≈ |rows|/30, so that exchange
    // carries near-corpus rows too) and then sorts both join inputs.
    // One corpus exchange instead of two, one sort instead of two.
    // Measured at sf30 (180M lineitem, interleaved A/B): 22-27 s vs
    // 40-47 s for the join form; equal at fixture scale; identical
    // values (same decimal sum / count arithmetic), oracle unchanged.
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("l_partkey"))
    Tables.lineitem(s, d)
      .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
      .withColumn("avg_qty",
        sum(dec(col("l_quantity"))).over(w).cast("double") / count(lit(1)).over(w))
      .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
      .agg((sum(dec(col("l_extendedprice"))).cast("double") / 7.0).as("avg_yearly"),
        count(lit(1)).as("n_items"))
  }

  def q31Sql: String =
    """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly,
      |  count(*) AS n_items
      |FROM lineitem l
      |JOIN (SELECT l_partkey AS pk,
      |        CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty
      |      FROM lineitem GROUP BY l_partkey) p
      |  ON l.l_partkey = p.pk
      |WHERE l_quantity < 0.2 * avg_qty""".stripMargin

  // ---------------------------------------------------------------- q32

  /** Window-function zoo per customer order history: lag/lead, dense_rank,
    * ntile quartiles, first_value — one window spec, partitioned by key
    * (scales), fully deterministic tiebreaks. */
  def q32WindowZoo(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val wp = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, d)
      .withColumn("prev_price", lag(col("o_totalprice"), 1).over(w))
      .withColumn("next_price", lead(col("o_totalprice"), 1).over(w))
      .withColumn("first_price", first(col("o_totalprice")).over(w))
      .withColumn("drank", dense_rank().over(wp))
      .withColumn("quartile", ntile(4).over(wp))
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        col("prev_price"), col("next_price"), col("first_price"),
        col("drank"), col("quartile"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  def q32Sql: String =
    """SELECT o_custkey, o_orderkey, o_totalprice,
      |  lag(o_totalprice, 1) OVER w AS prev_price,
      |  lead(o_totalprice, 1) OVER w AS next_price,
      |  first_value(o_totalprice) OVER w AS first_price,
      |  CAST(dense_rank() OVER wp AS INT) AS drank,
      |  CAST(ntile(4) OVER wp AS INT) AS quartile
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      |       wp AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  // ---------------------------------------------------------------- q36

  /** Exact moment statistics per group: mean and sample variance computed
    * from DECIMAL-exact Σx and Σx² (2dp inputs ⇒ 4dp squares, both exact),
    * with the double arithmetic in the SAME expression order as the oracle
    * — deterministic to the bit, unlike builtin stddev (Welford order
    * varies with partitioning). */
  def q36VarStats(s: SparkSession, d: String): DataFrame = {
    val x = dec(col("l_quantity"))
    val sq = (x * x).cast(DecimalType(38, 4))
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(x).cast("double").as("sum_x"),
        sum(sq).cast("double").as("sum_x2"),
        min(col("l_quantity")).as("min_q"),
        max(col("l_quantity")).as("max_q"))
      .withColumn("mean", col("sum_x") / col("n"))
      .withColumn("var_samp",
        (col("sum_x2") - col("sum_x") * col("sum_x") / col("n")) / (col("n") - 1))
      .select(col("l_returnflag"), col("n"), col("mean"), col("var_samp"),
        col("min_q"), col("max_q"))
      .orderBy(col("l_returnflag"))
  }

  def q36Sql: String =
    """WITH a AS (
      |  SELECT l_returnflag, count(*) AS n,
      |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_x,
      |    CAST(sum(CAST(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2)) AS DECIMAL(38,4))) AS DOUBLE) AS sum_x2,
      |    min(l_quantity) AS min_q, max(l_quantity) AS max_q
      |  FROM lineitem GROUP BY l_returnflag
      |)
      |SELECT l_returnflag, n, sum_x / n AS mean,
      |  (sum_x2 - sum_x * sum_x / n) / (n - 1) AS var_samp,
      |  min_q, max_q
      |FROM a ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------- q37

  /** Pivot: return-flag columns per linestatus (sum(CASE …) form — the
    * portable pivot; Spark's .pivot() sugar compiles to the same plan). */
  def q37Pivot(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_linestatus"))
      .agg(
        sum(when(col("l_returnflag") === "A", dec(col("l_quantity")))).cast("double").as("qty_a"),
        sum(when(col("l_returnflag") === "N", dec(col("l_quantity")))).cast("double").as("qty_n"),
        sum(when(col("l_returnflag") === "R", dec(col("l_quantity")))).cast("double").as("qty_r"),
        count(lit(1)).as("n"))
      .orderBy(col("l_linestatus"))

  def q37Sql: String =
    """SELECT l_linestatus,
      |  CAST(sum(CASE WHEN l_returnflag = 'A' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_a,
      |  CAST(sum(CASE WHEN l_returnflag = 'N' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_n,
      |  CAST(sum(CASE WHEN l_returnflag = 'R' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_r,
      |  count(*) AS n
      |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin
}
