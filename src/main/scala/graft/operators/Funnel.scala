package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Event-journey analytics over the `events` stream — the two reports
  * every product/telemetry warehouse serves daily, completing the
  * event-time family (q25 windows, q41 sessions) with user-journey
  * shapes:
  *
  *  - q77 ordered funnel: how many users progressed view → click →
  *    purchase IN ORDER (each step's first occurrence must follow the
  *    previous step's first occurrence — a purchase before any click
  *    does not count).
  *  - q78 retention: of the users ever seen, how many are active k weeks
  *    after their own first event.
  *
  * Scale shape: both are chains of user-keyed map-side-combinable
  * aggregates — the funnel is three conditional-min aggs stitched by
  * user-keyed joins (each side collapses to ≤ |users| rows before
  * joining, and every shuffle shares the user_id key, so the exchanges
  * line up); retention is one distinct over (user, week-offset) rows.
  * No window anywhere; timestamps compare in integer epoch-ms (the q41
  * idiom, exact on both engines).
  */
object Funnel {

  private def ms(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d).select(col("user_id"), col("event_type"),
      expr("unix_millis(ts)").as("ms"))

  /** Conversion window: each step must follow the previous step's first
    * occurrence within a day, or the journey does not convert. */
  private[operators] val StepWindowMs = 86400000L

  /** One row per funnel step: step number, name, users reaching it.
    *
    * Each step table is pinned (lazy localCheckpoint): the step chain
    * references v twice (c's join + step 1's count) and c twice (p's join
    * + step 2's count), so un-pinned each union branch re-ran the events
    * scan chain of every step below it — six scans for three steps (guide
    * §1.2). Pinned, the scan count is one per step: v/c/p are ≤ |users|
    * rows, the cheapest possible pins, and ev itself is pinned so the
    * three type-filters read one narrow (user, type, ms) materialization
    * instead of three corpus scans. */
  def q77Funnel(s: SparkSession, d: String): DataFrame = {
    val ev = ms(s, d).localCheckpoint(eager = false)
    val v = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ms")).as("tv"))
      .localCheckpoint(eager = false)
    val c = ev.filter(col("event_type") === "click")
      .join(v, Seq("user_id"))
      .filter(col("ms") > col("tv") && col("ms") <= col("tv") + StepWindowMs)
      .groupBy(col("user_id")).agg(min(col("ms")).as("tc"))
      .localCheckpoint(eager = false)
    val p = ev.filter(col("event_type") === "purchase")
      .join(c, Seq("user_id"))
      .filter(col("ms") > col("tc") && col("ms") <= col("tc") + StepWindowMs)
      .groupBy(col("user_id")).agg(min(col("ms")).as("tp"))
    def step(df: DataFrame, n: Int, name: String): DataFrame =
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(n).as("step"), lit(name).as("name"), col("n_users"))
    step(v, 1, "view")
      .unionByName(step(c, 2, "click"))
      .unionByName(step(p, 3, "purchase"))
      .orderBy(col("step"))
  }

  def q77Sql: String =
    s"""WITH e AS (
      |  SELECT user_id, event_type, epoch_ms(ts) AS ms FROM events
      |), v AS (
      |  SELECT user_id, min(ms) AS tv FROM e WHERE event_type = 'view' GROUP BY user_id
      |), c AS (
      |  SELECT e.user_id, min(ms) AS tc FROM e JOIN v USING (user_id)
      |  WHERE event_type = 'click' AND ms > tv AND ms <= tv + $StepWindowMs
      |  GROUP BY e.user_id
      |), p AS (
      |  SELECT e.user_id, min(ms) AS tp FROM e JOIN c USING (user_id)
      |  WHERE event_type = 'purchase' AND ms > tc AND ms <= tc + $StepWindowMs
      |  GROUP BY e.user_id
      |)
      |SELECT step, name, n_users FROM (
      |  SELECT 1 AS step, 'view' AS name, CAST((SELECT count(*) FROM v) AS BIGINT) AS n_users
      |  UNION ALL
      |  SELECT 2, 'click', CAST((SELECT count(*) FROM c) AS BIGINT)
      |  UNION ALL
      |  SELECT 3, 'purchase', CAST((SELECT count(*) FROM p) AS BIGINT)
      |) ORDER BY step""".stripMargin

  // ---------------------------------------------------------------- q78

  /** One row per week-offset since each user's own first event: active
    * users and integer retention percent of the full user base. */
  def q78Retention(s: SparkSession, d: String): DataFrame = {
    // day feeds first AND the join; first feeds total AND the join — both
    // pinned (lazy localCheckpoint, the q77 rationale): one events scan
    // per execution instead of three, with day a two-long-column row and
    // first ≤ |users| rows.
    val day = Tables.events(s, d).select(col("user_id"),
      expr("unix_millis(ts) DIV 86400000").as("day"))
      .localCheckpoint(eager = false)
    val first = day.groupBy(col("user_id")).agg(min(col("day")).as("d0"))
      .localCheckpoint(eager = false)
    val total = first.agg(count(lit(1)).as("n_total"))
    day.join(first, Seq("user_id"))
      .select(col("user_id"), expr("(day - d0) DIV 7").as("week"))
      .distinct()
      .groupBy(col("week")).agg(count(lit(1)).as("n_users"))
      .crossJoin(broadcast(total))
      .withColumn("retained_pct", expr("(100 * n_users) DIV n_total"))
      .select(col("week"), col("n_users"), col("retained_pct"))
      .orderBy(col("week"))
  }

  def q78Sql: String =
    """WITH e AS (
      |  SELECT user_id, epoch_ms(ts) // 86400000 AS day FROM events
      |), f AS (
      |  SELECT user_id, min(day) AS d0 FROM e GROUP BY user_id
      |), tot AS (
      |  SELECT count(*) AS n_total FROM f
      |), uw AS (
      |  SELECT DISTINCT e.user_id, (e.day - f.d0) // 7 AS week
      |  FROM e JOIN f USING (user_id)
      |)
      |SELECT week, CAST(count(*) AS BIGINT) AS n_users,
      |  (100 * CAST(count(*) AS BIGINT)) // tot.n_total AS retained_pct
      |FROM uw, tot GROUP BY week, tot.n_total ORDER BY week""".stripMargin
}
