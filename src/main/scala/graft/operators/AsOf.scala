package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** AS-OF join — the point-in-time lookup Spark has no native operator for
  * (the canonical "custom operator" case): for every left row, the single
  * right row of the same key with the greatest timestamp at-or-before the
  * left row's timestamp. The training-data shape: join features/labels
  * "as of" the observation time without leaking the future.
  *
  * Scale design — the union-merge form, NOT a range join: tag both sides,
  * union, and run ONE window per key ordered by (ts, side): a running
  * `last(non-null right-struct)` carries the most recent right row forward
  * to every left row. Cost is a single shuffle of |L| + |R| rows on the
  * key and a linear in-partition scan — no per-row range probe, no
  * interval explosion, and skew follows the key distribution exactly like
  * any keyed window. (A broadcast-able right side could instead use a
  * range join; the union-merge form is the one that survives both sides
  * being large.)
  *
  * The right side is deduplicated to one row per (key, ts) — greatest
  * event_id wins — so ties are deterministic on both engines (DuckDB's
  * ASOF JOIN picks an arbitrary row among equal timestamps otherwise).
  * The carried value is a STRUCT, so a NULL attribute inside a matched
  * right row is preserved (a bare `last(value, ignoreNulls)` would skip
  * backwards to an older row — wrong).
  */
object AsOf {

  /** Generic as-of join: left (key, ts, ...) picks up the latest right
    * (key, ts, attrs...) with right.ts <= left.ts. `rightAttrs` are the
    * columns carried over (null when no right row precedes). */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
      rightAttrs: Seq[String]): DataFrame = {
    val dedupW = Window.partitionBy(col(key), col(ts))
      .orderBy(col(rightAttrs.head).desc)
    val r = right
      .withColumn("_rrn", row_number().over(dedupW)).filter(col("_rrn") === 1)
      .drop("_rrn")
    val rStruct = struct(rightAttrs.map(col): _*)
    val rType = org.apache.spark.sql.types.StructType(rightAttrs.map(a =>
      org.apache.spark.sql.types.StructField(a, r.schema(a).dataType, nullable = true)))
    val lCols = left.columns
    val othersL = lCols.filterNot(c => c == key || c == ts)
    val leftSide = left.select(
      (Seq(col(key), col(ts), lit(1).as("_side"),
        lit(null).cast(rType).as("_r")) ++ othersL.map(col)): _*)
    val rightSide = r.select(
      (Seq(col(key), col(ts), lit(0).as("_side"), rStruct.as("_r")) ++
        othersL.map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)
    val tagged = leftSide.unionByName(rightSide)
    // right rows (side 0) sort before left rows at the same ts — an equal
    // timestamp matches, per as-of semantics
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("_asof", last(when(col("_side") === 0, col("_r")), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(lCols.map(col) ++
        rightAttrs.map(a => col(s"_asof.$a").as(s"r_$a")): _*)
  }

  // ---------------------------------------------------------------- q51

  /** q51: for every click, the user's most recent purchase at-or-before
    * the click — id, time, value, and the elapsed ms since it. */
  def q51AsofJoin(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"),
        col("event_id").as("p_id"), col("value").as("p_value"))
    asofJoin(clicks, purchases, "user_id", "ts", Seq("p_id", "p_value"))
      .select(col("event_id"), col("user_id"),
        unix_millis(col("ts")).as("ts_ms"), col("value"),
        col("r_p_id").as("p_id"), col("r_p_value").as("p_value"))
      .orderBy(col("event_id"))
  }

  def q51Sql: String =
    """WITH p AS (
      |  SELECT user_id, ts, event_id AS p_id, value AS p_value FROM (
      |    SELECT *, row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rrn
      |    FROM events WHERE event_type = 'purchase') t
      |  WHERE rrn = 1
      |), c AS (
      |  SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'click'
      |)
      |SELECT c.event_id, c.user_id, epoch_ms(c.ts::TIMESTAMP) AS ts_ms, c.value,
      |  p.p_id, p.p_value
      |FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND p.ts <= c.ts
      |ORDER BY c.event_id""".stripMargin
}
