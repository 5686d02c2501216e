package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Sessionization and order-statistics — the remaining analytic shapes a
  * pipeline user expects (gap-based sessions are the batch twin of
  * `session_window` in Structured Streaming; the exact median avoids
  * engine-specific percentile interpolation entirely).
  */
object Sessions {

  private val GapMs = 2 * 60 * 60 * 1000L // 2h inactivity ends a session

  // ---------------------------------------------------------------- q41

  /** Gap-based sessionization per user: a session breaks where the gap to
    * the previous event exceeds 2 h; session ids from a running sum of
    * break flags. All windows partition by user — scales horizontally. */
  def q41Sessionize(s: SparkSession, d: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val run = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, d)
      .withColumn("ms", unix_millis(col("ts")))
      .withColumn("brk",
        when(col("ms") - lag(col("ms"), 1).over(byUser) > GapMs, 1)
          .when(lag(col("ms"), 1).over(byUser).isNull, 1)
          .otherwise(0))
      .withColumn("session_id", sum(col("brk")).over(run))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ms")).as("start_ms"),
        max(col("ms")).as("end_ms"),
        (max(col("ms")) - min(col("ms"))).as("duration_ms"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("sum_value"))
      .orderBy(col("user_id"), col("session_id"))
  }

  def q41Sql: String =
    s"""WITH e AS (
       |  SELECT user_id, event_id, epoch_ms(ts) AS ms, value FROM events
       |), flagged AS (
       |  SELECT user_id, event_id, ms, value,
       |    CASE WHEN lag(ms, 1) OVER w IS NULL THEN 1
       |         WHEN ms - lag(ms, 1) OVER w > $GapMs THEN 1
       |         ELSE 0 END AS brk
       |  FROM e
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id)
       |), sess AS (
       |  SELECT user_id, ms, value,
       |    CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ms, event_id
       |                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
       |  FROM flagged
       |)
       |SELECT user_id, session_id, count(*) AS n_events,
       |  min(ms) AS start_ms, max(ms) AS end_ms,
       |  max(ms) - min(ms) AS duration_ms,
       |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
       |FROM sess GROUP BY user_id, session_id
       |ORDER BY user_id, session_id""".stripMargin

  // ---------------------------------------------------------------- q42

  /** Exact median per group via rank arithmetic (row_number against the
    * partition count picks the middle one-or-two rows; their mean is the
    * median). No percentile built-in ⇒ no engine-specific interpolation —
    * deterministic to the bit on both engines. */
  def q42Median(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("value"), col("event_id"))
    val cw = Window.partitionBy(col("event_type"))
    Tables.events(s, d)
      .withColumn("rn", row_number().over(w))
      .withColumn("cnt", count(lit(1)).over(cw))
      // DIV, not "/": Spark's / on integers is double division — an even
      // group's (cnt+1)/2 = k.5 would match nothing and the median would
      // silently collapse to a single row.
      .filter(col("rn") === expr("(cnt + 1) DIV 2") || col("rn") === expr("(cnt + 2) DIV 2"))
      .groupBy(col("event_type"))
      .agg((sum(col("value")) / count(lit(1))).as("median"),
        max(col("cnt")).as("n"))
      .orderBy(col("event_type"))
  }

  def q42Sql: String =
    """WITH r AS (
      |  SELECT event_type, value,
      |    row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
      |    count(*) OVER (PARTITION BY event_type) AS cnt
      |  FROM events
      |)
      |SELECT event_type, sum(value) / count(*) AS median, max(cnt) AS n
      |FROM r WHERE rn = (cnt + 1) // 2 OR rn = (cnt + 2) // 2
      |GROUP BY event_type ORDER BY event_type""".stripMargin
}
