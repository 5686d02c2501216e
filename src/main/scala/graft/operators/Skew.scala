package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Skew-mitigation patterns for the 100 TB contract (builder brief:
  * "skewed keys → salting or AQE skew-join"). AQE's runtime skew-join
  * handles sort-merge joins automatically; these are the MANUAL forms for
  * the two shapes AQE does not cover: hot-key aggregation fan-in and
  * broadcast-infeasible hot-key joins.
  *
  * Salting is pure plumbing: it changes the INTERMEDIATE key space, never
  * the result — which is why q38 can still be oracle-checked exactly.
  */
object Skew {

  /** Two-phase salted aggregation. Phase 1 groups on (key, salt) — a hot
    * key's rows split across `salts` reducers instead of one straggler;
    * phase 2 merges the partials per key. The salt derives from a hash of a
    * high-cardinality column (deterministic, no rand()), spreading rows
    * uniformly. sum/count are mergeable, so phase2(phase1(x)) == agg(x).
    */
  def saltedSum(df: DataFrame, key: Column, value: Column, saltFrom: Column,
      salts: Int): DataFrame =
    df.groupBy(key.as("k"), pmod(hash(saltFrom), lit(salts)).as("_salt"))
      .agg(sum(value).as("_partial"), count(lit(1)).as("_n"))
      .groupBy(col("k"))
      .agg(sum(col("_partial")).as("sum_value"), sum(col("_n")).as("n"))

  /** Salted-replicated join for a hot-keyed big table against a small-but-
    * not-broadcastable dim: the big side gets a random-ish (but
    * deterministic) salt in [0, salts); the dim side is exploded `salts`
    * times so every (key, salt) bucket finds its match. The hot key's rows
    * land in `salts` parallel tasks instead of one. */
  def saltedJoin(big: DataFrame, dim: DataFrame, key: String, saltFrom: Column,
      salts: Int): DataFrame = {
    val saltedBig = big.withColumn("_salt", pmod(hash(saltFrom), lit(salts)))
    val explodedDim = dim.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedBig.join(explodedDim, Seq(key, "_salt")).drop("_salt")
  }

  // ---------------------------------------------------------------- q38

  /** Salted two-phase revenue aggregation, oracle-checked: the salt splits
    * each l_returnflag's rows across 16 intermediate groups (hot-key
    * defense), the merge reproduces the plain aggregate EXACTLY (decimal
    * sums are order/partition-independent). The oracle runs the unsalted
    * SQL — passing proves salting is result-invariant. */
  def q38SaltedAgg(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    saltedSum(li,
      col("l_returnflag"),
      col("l_extendedprice").cast(DecimalType(18, 2)),
      col("l_orderkey"), salts = 16)
      .select(col("k").as("l_returnflag"),
        col("sum_value").cast("double").as("sum_price"), col("n"))
      .orderBy(col("l_returnflag"))
  }

  def q38Sql: String =
    """SELECT l_returnflag,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
      |  count(*) AS n
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
}
