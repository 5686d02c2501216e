package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Multiset set-operations, CUBE grouping sets, and deterministic array
  * aggregation — closing the remaining standard-SQL surface (q12 covers
  * the DISTINCT set ops; these are the bag-semantics and grouping-set
  * complements). */
object SetsExt {

  // ---------------------------------------------------------------- q43

  /** Bag semantics: UNION ALL / INTERSECT ALL / EXCEPT ALL over nation-key
    * multisets (duplicates preserved — counts matter). Spark's
    * unionAll/intersectAll/exceptAll map 1:1 onto the SQL ALL variants. */
  def q43MultisetOps(s: SparkSession, d: String): DataFrame = {
    // pinned (lazy localCheckpoint): intersectAll and exceptAll each
    // consume both projections — un-pinned, each table scanned twice
    // (guide §1.2); the pins are a single int column per row.
    val cust = Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
      .localCheckpoint(eager = false)
    val supp = Tables.supplier(s, d).select(col("s_nationkey").as("nationkey"))
      .localCheckpoint(eager = false)
    cust.intersectAll(supp)
      .unionAll(cust.exceptAll(supp))
      .groupBy(col("nationkey"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("nationkey"))
  }

  def q43Sql: String =
    """SELECT nationkey, count(*) AS n FROM (
      |  SELECT c_nationkey AS nationkey FROM customer
      |  INTERSECT ALL
      |  SELECT s_nationkey FROM supplier
      |  UNION ALL
      |  (SELECT c_nationkey FROM customer EXCEPT ALL SELECT s_nationkey FROM supplier)
      |) t GROUP BY nationkey ORDER BY nationkey""".stripMargin

  // ---------------------------------------------------------------- q44

  /** CUBE: all four grouping sets of (returnflag, linestatus) in one pass
    * (rollup's full-lattice sibling; NULL keys folded for oracle-stable
    * ordering, grouping_id exported to disambiguate). */
  def q44Cube(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
        grouping_id().cast("int").as("gid"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("gid"), col("n"), col("sum_qty"))
      .orderBy(col("gid"), col("returnflag"), col("linestatus"))

  def q44Sql: String =
    """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
      |       coalesce(l_linestatus, 'ALL') AS linestatus,
      |       CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS INT) AS gid,
      |       count(*) AS n,
      |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
      |ORDER BY gid, returnflag, linestatus""".stripMargin

  // ---------------------------------------------------------------- q45

  /** Deterministic array aggregation: per-language sorted distinct token
    * vocabulary, exported as a joined string (array columns hash
    * differently across engines' dataframe bridges; a canonical string
    * form is engine-neutral). collect_set order is nondeterministic —
    * sort_array makes it canonical BEFORE the join (sort_array, not
    * array_sort: same ascending order on a null-free collect_set result,
    * but no interpreted HOF comparator — array_sort's default lambda
    * dispatches per comparison). */
  def q45ArrayAgg(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("lang"), explode(graft.Tok.toksText).as("token"))
      .groupBy(col("lang"))
      .agg(
        array_join(sort_array(collect_set(col("token"))), ",").as("vocab"),
        countDistinct(col("token")).as("n_distinct"))
      .orderBy(col("lang"))

  def q45Sql: String =
    s"""SELECT lang,
      |  array_to_string(list_sort(list(DISTINCT token)), ',') AS vocab,
      |  count(DISTINCT token) AS n_distinct
      |FROM (SELECT lang, unnest(${graft.Tok.sqlText}) AS token FROM documents) t
      |GROUP BY lang ORDER BY lang""".stripMargin

  private def dec(c: org.apache.spark.sql.Column) = c.cast(DecimalType(18, 2))
}
