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
    * break flags. All windows partition by user — scales horizontally.
    * The streaming twin is `session_window($"ts", "2 hours")`
    * (SessionWindowStreamSpec pins batch ≡ stream on the same rows; the
    * only semantic seam is a gap of EXACTLY 2 h — batch merges on `> gap`,
    * session_window splits on window-overlap, i.e. `>= gap`). */
  def sessionize(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val run = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
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

  def q41Sessionize(s: SparkSession, d: String): DataFrame =
    sessionize(Tables.events(s, d))

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

  /** Exact median per group — two-phase rank selection, no low-cardinality
    * window (the r2 verdict's scale-killer: `partitionBy(event_type)` over
    * ~5 types funnels every row of a type into ONE task's sort at scale)
    * and, since round 4, FULLY LAZY: no job runs before the action
    * (MedianPropertySpec pins it with a listener), and Explain shows the
    * whole pipeline — the q10 pattern ([[HighWaterMark.contiguousPrefixAgg]])
    * applied to order statistics.
    *
    * `repartitionByRange(event_type, value, event_id)` lays the global
    * per-group sort order ACROSS many partitions (a group spans partitions
    * instead of owning one task); a lazy persist() pins the sampled range
    * boundaries so both consumers see the identical partitioning,
    * materialized once at action time as one disk-spillable staging pass
    * (localCheckpoint/.rdd would force AQE stage materialization at
    * CONSTRUCTION — 2 eager jobs; persist is the lazy staging primitive).
    * From it, three small lazy stages:
    *  - slice counts: groupBy(spark_partition_id, group) — O(P × groups)
    *    rows after map-side partial agg — carrying min(mid) per slice,
    *    where mid = monotonically_increasing_id() (partition-local row
    *    counter in its low bits, so over the pinned sorted partitions
    *    `mid − min(mid of the slice)` IS the 0-based rank of a row within
    *    its (partition, group) slice — no second sort, no window, no
    *    row-by-row pass);
    *  - per-slice offsets + totals: a window/agg over those stat rows fixes
    *    each partition's starting rank and the middle target ranks
    *    ((n+1) DIV 2, (n+2) DIV 2 — integer DIV; "/" on integers is double
    *    division in Spark and an even group's k.5 would match nothing);
    *  - selection: a BROADCAST join of the data against the tiny bounds
    *    table filters to the one-or-two middle rows per group — fully
    *    codegen, the data-scale side is never shuffled again.
    * The selected rows average to the exact median — no percentile
    * interpolation, deterministic to the bit on both engines. */
  /** The shared rank-selection base over events(event_type, value):
    * (ranged rows with (pid, mid), bounds rows (pid, g, mid0, off, n)).
    * See the q42 scaladoc for the mechanics; q52's exact percentiles ride
    * the same two structures with different target ranks. */
  private def rankBase(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    // NON-NULL values, explicitly (standard order-statistic semantics, and
    // null ordering differs between engines anyway)
    val ev = Tables.events(s, d)
      .filter(col("value").isNotNull)
      .select(col("event_type"), col("value"), col("event_id"))
    val ranged = StagedCache.stage(d, "rank_base", ev
      .repartitionByRange(col("event_type"), col("value"), col("event_id"))
      .sortWithinPartitions(col("event_type"), col("value"), col("event_id"))
      .select(col("event_type"), col("value")))
      // staged: pins partition layout AND row order for the mid ranks
      .withColumn("pid", spark_partition_id())
      .withColumn("mid", monotonically_increasing_id())
    // per-(partition, group) slice counts + the slice's first mid: partial
    // aggregation collapses each slice map-side, so the shuffle carries
    // O(P × groups) rows
    val slices = ranged
      .groupBy(col("pid"), col("event_type"))
      .agg(count(lit(1)).as("c"), min(col("mid")).as("mid0"))
    // starting rank of each slice + per-group totals — windows and joins
    // over stat rows only, never the data
    val wPrev = Window.partitionBy(col("event_type")).orderBy(col("pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // null-safe joins throughout the stat chain: a NULL event_type group is
    // a legal group and must keep its total/offset rows
    val totals = slices.groupBy(col("event_type")).agg(sum(col("c")).as("n"))
      .withColumnRenamed("event_type", "tg")
    val bounds = slices
      .withColumn("off", coalesce(sum(col("c")).over(wPrev), lit(0L)))
      .join(totals, col("event_type") <=> col("tg"))
      .drop("tg")
      .select(col("pid"), col("event_type").as("g"), col("mid0"), col("off"),
        col("n"))
    (ranged, bounds)
  }

  /** Global rank of a ranged row = its slice's starting rank + its
    * position in the slice (mid − mid0 + 1). */
  private def rk = col("off") + (col("mid") - col("mid0")) + 1

  def q42Median(s: SparkSession, d: String): DataFrame = {
    val (ranged, base) = rankBase(s, d)
    val bounds = base
      .withColumn("t1", expr("(n + 1) DIV 2"))
      .withColumn("t2", expr("(n + 2) DIV 2"))
    // Null-safe group match: a NULL event_type group must still find its
    // bounds row. The bounds side is tiny — broadcast, no data shuffle,
    // and the whole selection is codegen.
    ranged.join(broadcast(bounds),
        ranged("pid") === bounds("pid") && ranged("event_type") <=> bounds("g"))
      .filter(rk === col("t1") || rk === col("t2"))
      .groupBy(col("event_type"))
      .agg((sum(col("value")) / count(lit(1))).as("median"), max(col("n")).as("n"))
      .select(col("event_type"), col("median"), col("n"))
      .orderBy(col("event_type"))
  }

  def q42Sql: String =
    """WITH r AS (
      |  SELECT event_type, value,
      |    row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
      |    count(*) OVER (PARTITION BY event_type) AS cnt
      |  FROM events WHERE value IS NOT NULL
      |)
      |SELECT event_type, sum(value) / count(*) AS median, max(cnt) AS n
      |FROM r WHERE rn = (cnt + 1) // 2 OR rn = (cnt + 2) // 2
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------- q52

  private val Percentiles = Seq(25, 50, 75, 90, 99)

  /** Exact nearest-rank percentiles per group, one pass: the q42 machinery
    * with a small percentile table crossed into the bounds — target rank
    * for p = ceil(p·n/100) = (p·n + 99) DIV 100, exactly one row per
    * (group, p), integer arithmetic on both engines (no interpolation, no
    * fp percentile semantics to reconcile). The data-scale side is still
    * touched once: one broadcast join serves ALL percentiles. */
  def q52Percentiles(s: SparkSession, d: String): DataFrame = {
    val (ranged, base) = rankBase(s, d)
    val pcts = s.createDataFrame(Percentiles.map(Tuple1(_))).toDF("p")
    val bounds = base.crossJoin(broadcast(pcts))
      .withColumn("target", expr("(p * n + 99) DIV 100"))
    ranged.join(broadcast(bounds),
        ranged("pid") === bounds("pid") && ranged("event_type") <=> bounds("g"))
      .filter(rk === col("target"))
      .select(col("event_type"), col("p"), col("value").as("pvalue"), col("n"))
      .orderBy(col("event_type"), col("p"))
  }

  def q52Sql: String =
    s"""WITH r AS (
       |  SELECT event_type, value,
       |    row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
       |    count(*) OVER (PARTITION BY event_type) AS cnt
       |  FROM events WHERE value IS NOT NULL
       |), p(p) AS (VALUES ${Percentiles.map(p => s"($p)").mkString(", ")})
       |SELECT event_type, p, value AS pvalue, cnt AS n
       |FROM r, p WHERE rn = (p * cnt + 99) // 100
       |ORDER BY event_type, p""".stripMargin
}
