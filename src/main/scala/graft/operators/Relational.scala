package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Relational operator surface (SURVEY.md §2.2-§2.8) re-expressed as
  * declarative DataFrame plans over the TPC-H-ish fixtures.
  *
  * Design rules (scale-first):
  *  - every monetary aggregate is summed as DECIMAL(18,2) and cast to
  *    double only at the output boundary — exact, order-independent, and
  *    bit-identical to the DuckDB oracle regardless of partitioning;
  *  - filters/projections stay at the leaves so Catalyst pushes them into
  *    the parquet scan (verified via .explain: PushedFilters / ReadSchema);
  *  - dimension tables (region/nation/supplier/customer) get broadcast
  *    hints: at 100 TB the fact tables shuffle, the dims never should;
  *  - each query ends in a deterministic ORDER BY (Catalyst's
  *    EliminateSorts removes it under the bench's count() action, so it
  *    costs nothing when the output ordering is not consumed).
  */
object Relational {

  /** Exact 2-decimal money type: fixture doubles are all 2dp. */
  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  /** TPC-H Q1 style pricing summary: scan → filter → partial+final hash agg.
    * Reference analog: grouped aggregation A2/A6 (StreamingApp.scala:253,
    * Clock.scala:58-100). Map-side combine makes this shuffle tiny at scale:
    * only |groups| × partial rows move. */
  def q01PricingSummary(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        // scale-4 sum: unscaled crosses 2^53 near sf30 — micro-exact like
        // sum_charge below. The scale-2 sums (sum_qty/sum_base_price)
        // stay double: their unscaled values are 2^53-safe past sf1000.
        (sum(dec(col("l_extendedprice")) * (lit(1).cast(DecimalType(18, 2)) - dec(col("l_discount"))))
          * lit(1000000)).cast("long").as("sum_disc_price_micro"),
        // sum_charge in exact integer MICRO-units (the q66/q95 integer
        // doctrine): the scale-6 decimal sum's unscaled value crosses
        // 2^53 at sf1 (~2.8e16), where DuckDB's decimal→double cast
        // (unscaled-int ÷ 10^6, two roundings) diverges from Spark's
        // once-rounded BigDecimal.doubleValue by one ulp — caught by the
        // sf1 oracle compare. The decimal sum itself is exact on both
        // engines at any sf, and ×10^6 → BIGINT carries it losslessly
        // (to ~sf300k); no float rounding exists on this column at all.
        (sum(dec(col("l_extendedprice")) * (lit(1).cast(DecimalType(18, 2)) - dec(col("l_discount")))
          * (lit(1).cast(DecimalType(18, 2)) + dec(col("l_tax")))) * lit(1000000))
          .cast("long").as("sum_charge_micro"),
        (sum(dec(col("l_quantity"))).cast("double") / count(lit(1))).as("avg_qty"),
        (sum(dec(col("l_extendedprice"))).cast("double") / count(lit(1))).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  def q01Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) * 1000000 AS BIGINT) AS sum_disc_price_micro,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) * (CAST(1 AS DECIMAL(18,2)) + CAST(l_tax AS DECIMAL(18,2)))) * 1000000 AS BIGINT) AS sum_charge_micro,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price,
      |  count(*) AS count_order
      |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Predicate zoo (P3-P5,P7): equality, inequality, range band, LIKE /
    * NOT LIKE — all land in PushedFilters on the parquet scan; projection
    * is 4 of 11 columns so ReadSchema prunes the rest. */
  def q02SelectiveFilter(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_returnflag") === "R" && col("l_linestatus") =!= "F"
        && col("l_discount").between(0.05, 0.07)
        && col("l_quantity") < 25
        && !col("l_returnflag").like("X%"))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_extendedprice"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  def q02Sql: String =
    """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
      |FROM lineitem
      |WHERE l_returnflag = 'R' AND l_linestatus <> 'F'
      |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 25
      |  AND l_returnflag NOT LIKE 'X%'
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** Inner equi-join J1 (orders ⋈ customer) + grouped agg. Customer is the
    * smaller side but SF-PROPORTIONAL (it grows with the corpus, unlike
    * nation/region), so no forced broadcast: AQE broadcasts it while it
    * fits and falls back to a shuffled hash join on custkey when it
    * doesn't — a forced hint would OOM at 100 TB. */
  def q03JoinAgg(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"),
        sum(dec(col("o_totalprice"))).cast("double").as("sum_price"))
      .orderBy(col("c_mktsegment"))

  def q03Sql: String =
    """SELECT c_mktsegment, count(*) AS n_orders,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** 4-way star join J2 generalization: fact lineitem ⋈ orders, then the
    * dimension chain customer → nation → region. Nation (25 rows) and
    * region (5) are genuinely bounded → broadcast hints; customer is
    * SF-proportional → no hint (AQE broadcasts while it fits, shuffles on
    * custkey when it doesn't — see q03). At 100 TB the shuffles are
    * lineitem⋈orders on the (clustered) order key — gone if both sides are
    * bucketed by orderkey — and the customer join. */
  def q04StarJoin(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(sum(dec(col("l_extendedprice")) * (lit(1).cast(DecimalType(18, 2)) - dec(col("l_discount"))))
        .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("r_name"), col("n_name"))

  def q04Sql: String =
    """SELECT r_name, n_name,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
      |  count(*) AS n_items
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin

  /** Anti-join J3 — the reference's resident-file detection
    * (left outer + IS NULL at StreamingApp.scala:186-190) folded into a
    * native left_anti, which Catalyst executes as a broadcast hash
    * anti-join when the right side is small. */
  def q05AntiJoin(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(Tables.orders(s, d).filter(col("o_totalprice") > 150000),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))

  def q05Sql: String =
    """SELECT c_custkey, c_name FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 150000)
      |ORDER BY c_custkey""".stripMargin

  /** Semi-join (EXISTS): customers holding at least one big open order.
    * left_semi stops probing at first match — no row duplication, no
    * post-join dedup shuffle. */
  def q06SemiJoin(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(Tables.orders(s, d).filter(col("o_totalprice") > 100000),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))

  def q06Sql: String =
    """SELECT c_custkey, c_mktsegment FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 100000)
      |ORDER BY c_custkey""".stripMargin

  /** GROUP BY + MAX + HAVING band — the reference's high-water-mark release
    * predicate shape (J4/A2, StreamingApp.scala:253): which groups' max
    * "extent end" lands inside a band. Partial max is computed map-side,
    * so the shuffle carries one row per group. */
  def q07BandHaving(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_orderkey"))
      .agg((max(dec(col("l_extendedprice")) * (lit(1).cast(DecimalType(18, 2)) + dec(col("l_tax")))))
        .cast("double").as("hi"))
      .filter(col("hi") >= 100000 && col("hi") < 120000)
      .orderBy(col("l_orderkey"))

  def q07Sql: String =
    """SELECT l_orderkey,
      |  CAST(max(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS hi
      |FROM lineitem GROUP BY l_orderkey
      |HAVING CAST(max(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) >= 100000
      |   AND CAST(max(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) < 120000
      |ORDER BY l_orderkey""".stripMargin

  /** W1 generalized: row_number per group (top-2 orders per customer).
    * Window is partitioned by the group key — scales horizontally, unlike
    * the reference's global ORDER BY window. Deterministic tiebreak on the
    * key makes the result oracle-stable. */
  def q08WindowTopkPerGroup(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
      .orderBy(col("o_custkey"), col("rn"))
  }

  def q08Sql: String =
    """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rn
      |  FROM orders) t
      |WHERE rn <= 2 ORDER BY o_custkey, rn""".stripMargin

  /** A3 — ordered running sum, the reference's cumulative chunk-size prefix
    * (StreamingApp.scala:238-246) — partitioned per user so no global
    * single-task window at scale. */
  def q09RunningSum(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, d)
      .withColumn("running_value", sum(dec(col("value"))).over(w).cast("double"))
      .select(col("event_id"), col("user_id"), col("running_value"))
      .orderBy(col("event_id"))
  }

  def q09Sql: String =
    """SELECT event_id, user_id,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) OVER (PARTITION BY user_id ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value
      |FROM events ORDER BY event_id""".stripMargin

  /** O1+O2 — global top-k: ORDER BY … LIMIT k. Spark plans TakeOrderedAndProject:
    * per-partition heaps, only k rows reach the driver — the scalable topk. */
  def q11TopK(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))

  def q11Sql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin

  /** §2.7 set operations: INTERSECT / EXCEPT / UNION (distinct semantics). */
  def q12SetOps(s: SparkSession, d: String): DataFrame = {
    // pinned (lazy localCheckpoint): the intersect and the except both
    // consume the customer projection — un-pinned, the scan ran twice
    // (guide §1.2); the pin is a single int column per row.
    val custNations = Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
      .localCheckpoint(eager = false)
    val suppNations = Tables.supplier(s, d).select(col("s_nationkey").as("nationkey"))
    val allNations = Tables.nation(s, d).select(col("n_nationkey").as("nationkey"))
    custNations.intersect(suppNations)
      .union(allNations.except(custNations))
      .distinct()
      .orderBy(col("nationkey"))
  }

  def q12Sql: String =
    """SELECT DISTINCT nationkey FROM (
      |  SELECT c_nationkey AS nationkey FROM customer INTERSECT SELECT s_nationkey FROM supplier
      |  UNION
      |  (SELECT n_nationkey FROM nation EXCEPT SELECT c_nationkey FROM customer)
      |) t ORDER BY nationkey""".stripMargin

  /** Distinct aggregation (absent from the reference, declared here as part
    * of the engine surface): exact count-distinct per group. Spark expands
    * this to a two-phase agg — partial distinct then merge. */
  def q14DistinctAgg(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_users"),
        count(lit(1)).as("n_events"),
        sum(dec(col("value"))).cast("double").as("sum_value"))
      .orderBy(col("event_type"))

  def q14Sql: String =
    """SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n_events,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** ROLLUP grouping sets; NULL grouping keys are folded to 'ALL' so the
    * oracle comparison is total-order stable across engines. */
  def q15Rollup(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("n"), col("sum_qty"))
      .orderBy(col("returnflag"), col("linestatus"))

  def q15Sql: String =
    """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
      |       coalesce(l_linestatus, 'ALL') AS linestatus,
      |       count(*) AS n,
      |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY returnflag, linestatus""".stripMargin

  /** JSON prop extraction over events.props (north-star surface): parse →
    * filter → aggregate. get_json_object is codegen'd; the filter on the
    * extracted value happens before the shuffle. */
  def q16JsonExtract(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      .filter(col("k") >= 50)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("k").cast("long")).as("sum_k"))
      .orderBy(col("event_type"))

  def q16Sql: String =
    """SELECT event_type, count(*) AS n,
      |  CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k
      |FROM events
      |WHERE CAST(json_extract_string(props, '$.k') AS INT) >= 50
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Calendar bucketing: year/month rollup of order volume. */
  def q17DateBuckets(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(year(col("o_orderdate")).as("yr"), month(col("o_orderdate")).as("mo"))
      .agg(count(lit(1)).as("n_orders"),
        sum(dec(col("o_totalprice"))).cast("double").as("sum_price"))
      .orderBy(col("yr"), col("mo"))

  def q17Sql: String =
    """SELECT CAST(year(o_orderdate) AS INT) AS yr, CAST(month(o_orderdate) AS INT) AS mo,
      |  count(*) AS n_orders,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      |FROM orders GROUP BY 1, 2 ORDER BY yr, mo""".stripMargin

  /** Range/interval join (J4 generalized): events banded against an interval
    * dimension. The bands table is tiny → broadcast nested-loop is the right
    * plan and stays O(|events| × |bands|) with |bands| constant; at scale
    * the same shape handles time-range and IP-range dimension joins. */
  def q18RangeJoin(s: SparkSession, d: String): DataFrame = {
    val bands = s.createDataFrame(
      (0 until 10).map(i => (i * 50.0, (i + 1) * 50.0, i))
    ).toDF("lo", "hi", "band")
    Tables.events(s, d)
      .join(broadcast(bands), col("value") >= col("lo") && col("value") < col("hi"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n"), sum(dec(col("value"))).cast("double").as("sum_value"))
      .orderBy(col("band"))
  }

  def q18Sql: String =
    """SELECT band, count(*) AS n,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events
      |JOIN (SELECT (i*50)::DOUBLE AS lo, ((i+1)*50)::DOUBLE AS hi, CAST(i AS INT) AS band
      |      FROM range(0,10) t(i)) b
      |  ON value >= lo AND value < hi
      |GROUP BY band ORDER BY band""".stripMargin

  /** Work-queue claim semantics (reference O2/T9, FileWorkerApp.scala:207-227):
    * the row-lock claim becomes deterministic, shuffle-free assignment —
    * each claimable row hashes to a worker via key arithmetic, no global
    * ranking, no single-task window. Exactly-once at scale comes from
    * determinism + idempotent writes, not locks. */
  def q33WorkQueueClaim(s: SparkSession, d: String): DataFrame = {
    val queue = Tables.events(s, d).select(
      col("event_id").as("file_id"),
      (col("event_id") % 4).cast("int").as("status"),
      (col("event_id") % 2).cast("int").as("resident"))
    queue.filter(col("status") === 0)
      .withColumn("worker", pmod(col("file_id"), lit(8L)).cast("int"))
      .select(col("file_id"), col("resident"), col("worker"))
      .orderBy(col("file_id"))
  }

  def q33Sql: String =
    """SELECT file_id, resident, CAST(file_id % 8 AS INT) AS worker
      |FROM (SELECT event_id AS file_id, CAST(event_id % 4 AS INT) AS status,
      |             CAST(event_id % 2 AS INT) AS resident FROM events) q
      |WHERE status = 0 ORDER BY file_id""".stripMargin

  /** The reference's release query re-expressed end-to-end (J2+P4+P5+A2,
    * StreamingApp.scala:253): extents ⋈ files ⋈ fs_info, metafile filters,
    * per-file max extent end banded against the HW advance window. Fixture
    * stand-ins: lineitem rows as layout extents, orders as the file table. */
  def q34ReleaseBand(s: SparkSession, d: String): DataFrame = {
    val layout = Tables.lineitem(s, d).select(
      col("l_orderkey").as("obj_id"),
      (col("l_partkey") * 1000).as("byte_start"),
      (col("l_suppkey") * 100).as("byte_len"))
    val files = Tables.orders(s, d).select(
      col("o_orderkey").as("obj_id"),
      (col("o_orderkey") % 5).cast("int").as("dir_type"),
      col("o_orderpriority").as("name"),
      (col("o_custkey") % 3).as("fs_obj_id"))
    val fsInfo = s.createDataFrame(Seq((0L, 0L), (1L, 512L), (2L, 1024L)))
      .toDF("fs_id", "img_offset")
    layout
      .join(files, Seq("obj_id"))
      .join(broadcast(fsInfo), files("fs_obj_id") === fsInfo("fs_id"))
      .filter(col("dir_type") =!= 3 && !col("name").like("5%"))
      .groupBy(col("obj_id"))
      .agg(max(col("byte_start") + col("byte_len") + col("img_offset")).as("extent_end"))
      .filter(col("extent_end") >= 100000L && col("extent_end") < 1500000L)
      .orderBy(col("obj_id"))
  }

  def q34Sql: String =
    """SELECT obj_id, max(byte_start + byte_len + img_offset) AS extent_end
      |FROM (SELECT l_orderkey AS obj_id, l_partkey*1000 AS byte_start, l_suppkey*100 AS byte_len FROM lineitem) layout
      |JOIN (SELECT o_orderkey AS obj_id, CAST(o_orderkey % 5 AS INT) AS dir_type,
      |             o_orderpriority AS name, o_custkey % 3 AS fs_obj_id FROM orders) files USING (obj_id)
      |JOIN (SELECT CAST(i AS BIGINT) AS fs_id, CAST(i*512 AS BIGINT) AS img_offset FROM range(0,3) t(i)) fs
      |  ON files.fs_obj_id = fs.fs_id
      |WHERE dir_type <> 3 AND name NOT LIKE '5%'
      |GROUP BY obj_id
      |HAVING max(byte_start + byte_len + img_offset) >= 100000 AND max(byte_start + byte_len + img_offset) < 1500000
      |ORDER BY obj_id""".stripMargin
}
