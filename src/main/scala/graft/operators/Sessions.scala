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
    * ~5 types funnels every row of a type into ONE task's sort at scale).
    *
    * Phase A: per-group counts (|types| rows) fix the middle ranks
    * ((n+1) DIV 2 and (n+2) DIV 2 — integer DIV; "/" on integers is double
    * division in Spark and an even group's k.5 would match nothing).
    * Phase B: `repartitionByRange(event_type, value, event_id)` lays the
    * global per-group sort order ACROSS many partitions (a group spans
    * partitions instead of owning one task); a tiny per-(partition, group)
    * count aggregate then tells every partition its starting rank, and one
    * narrow scan picks the middle rows. Driver-side state is
    * O(partitions × groups), never data-scale. The selected one-or-two rows
    * per group average to the exact median — no percentile interpolation,
    * deterministic to the bit on both engines. */
  def q42Median(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // median over NON-NULL values, explicitly (standard median semantics;
    // also: a null value would crash the (String, Double) tuple encoder,
    // and null ordering differs between engines anyway)
    val ev = Tables.events(s, d)
      .filter(col("value").isNotNull)
      .select(col("event_type"), col("value"), col("event_id"))
    // localCheckpoint pins the sampled range boundaries: the offset pass and
    // the selection pass MUST see the identical partitioning (lazy: the
    // slice-count job below materializes it — one pass, not two).
    val ranged = ev
      .repartitionByRange(col("event_type"), col("value"), col("event_id"))
      .sortWithinPartitions(col("event_type"), col("value"), col("event_id"))
      .select(col("event_type"), col("value"))
      .localCheckpoint(eager = false)
      .as[(String, Double)].rdd
    // per-(partition, group) counts: a plain RDD pass (rows arrive grouped —
    // each partition is sorted with event_type leading), tiny driver result
    val slices: Array[(Int, String, Long)] = ranged
      .mapPartitionsWithIndex { (pid, it) =>
        val counts = scala.collection.mutable.LinkedHashMap[String, Long]()
        it.foreach { case (g, _) => counts(g) = counts.getOrElse(g, 0L) + 1 }
        counts.iterator.map { case (g, c) => (pid, g, c) }
      }.collect()
    // group totals fall out of the slice counts — no separate count job
    val totals: Map[String, Long] =
      slices.groupBy(_._2).map { case (g, sl) => g -> sl.map(_._3).sum }
    val targets: Map[String, Set[Long]] = totals.map { case (g, n) =>
      g -> Set((n + 1) / 2, (n + 2) / 2)
    }
    val offsets: Map[(Int, String), Long] = slices.groupBy(_._2).flatMap {
      case (g, sl) =>
        var acc = 0L
        sl.sortBy(_._1).map { case (pid, _, c) =>
          val o = acc; acc += c; ((pid, g), o)
        }
    }
    val bcTargets = s.sparkContext.broadcast(targets)
    val bcOffsets = s.sparkContext.broadcast(offsets)
    val picked = ranged.mapPartitionsWithIndex { (pid, it) =>
      // `started` flag, not a null sentinel: a NULL event_type group sorts
      // first, and initializing g=null would skip its offset load (null ==
      // null), restarting its rank at 1 in every partition — wrong median.
      var started = false
      var g: String = null
      var rank = 0L
      it.flatMap { case (et, v) =>
        if (!started || et != g) {
          started = true; g = et
          rank = bcOffsets.value.getOrElse((pid, g), 0L)
        }
        rank += 1
        if (bcTargets.value(g).contains(rank)) Iterator((et, v))
        else Iterator.empty
      }
    }
    // n comes from the already-collected totals — no join back. eqNullSafe:
    // a NULL event_type group must still find its count.
    val nCol = totals.foldLeft(lit(null).cast("long")) { case (acc, (g, n)) =>
      when(col("event_type").eqNullSafe(g), lit(n)).otherwise(acc)
    }
    picked.toDF("event_type", "value")
      .groupBy(col("event_type"))
      .agg((sum(col("value")) / count(lit(1))).as("median"))
      .withColumn("n", nCol)
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
}
