package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Training-mix allocation — the step that turns curated corpora into a
  * training recipe: given per-(lang, source) token counts and a global
  * token budget, apportion the budget proportionally so every group gets
  * ⌊budget·share⌋ and the leftover units go to the largest remainders
  * (Hamilton's method). The result sums to the budget EXACTLY — integer
  * apportionment, no floating weights — which is what a sampler
  * downstream needs (draw alloc_i tokens per group, done).
  *
  * The budget here is half the corpus (a fixture constant expressed
  * scale-free, `c_total DIV 2`); production passes a real token target.
  *
  * Scale shape: the corpus collapses to |lang × source| partial-summed
  * rows in ONE map-side-combinable aggregation — everything after that
  * (the one-row total, the remainder ranks, the leftover distribution)
  * operates on group-count-many rows, corpus-independent. The unbounded
  * window is over GROUPS, not data: its input is bounded by the mix
  * cardinality (dozens), so the single-partition sort is O(groups) at
  * any corpus size. n_tokens·budget stays in int64 up to ~3·10⁹ tokens
  * per group at a 3·10⁹-token budget; past that, express the budget in
  * megatokens (both sides DIV 1e6 — the apportionment rule is
  * scale-invariant).
  */
object Mixing {

  // ---------------------------------------------------------------- q63

  /** Per-(lang, source) token + doc counts from the corpus, the
    * apportionment's input relation — staged in the session-owned
    * [[StagedCache]] (the bm25_tf / decon_shingles pattern): it feeds the
    * one-row total AND the apportionment WITHIN each query, and the q63 /
    * q114 pair derive from the identical corpus aggregate, so one
    * tokenize pass per session+corpus serves both (previously each query
    * re-ran it behind a per-invocation localCheckpoint). `n_docs` is part
    * of the canonical build so both callers share one analyzed plan —
    * q63 simply never reads it; the staged table is |lang × source| rows
    * (dozens), the cheapest possible thing to keep hot. */
  private[operators] def tokenGroups(s: SparkSession, d: String): DataFrame =
    StagedCache.stage(d, "mix_token_groups",
      Tables.documents(s, d)
        .select(col("lang"), col("source"),
          size(graft.Tok.toksText).as("n"))
        .groupBy(col("lang"), col("source"))
        .agg(sum(col("n")).as("n_tokens"), count(lit(1)).as("n_docs")))

  /** Hamilton's largest-remainder apportionment of `budget = c_total DIV
    * divisor` over a (lang, source, n_tokens, ...) relation: every group
    * gets ⌊budget·share⌋ and the leftover units go to the largest
    * remainders; Σ alloc == budget exactly. Input columns are preserved so
    * composing queries can keep their own stats alongside `alloc`. */
  private[operators] def apportion(g: DataFrame, divisor: Int): DataFrame = {
    val tot = g.agg(sum(col("n_tokens")).as("c_total"))
    val wRank = Window.orderBy(col("rem").desc, col("lang"), col("source"))
    val wAll = Window.partitionBy()
    g.crossJoin(broadcast(tot))
      .withColumn("budget", expr(s"c_total DIV $divisor"))
      .withColumn("floor_alloc", expr("(n_tokens * budget) DIV c_total"))
      .withColumn("rem", expr("(n_tokens * budget) % c_total"))
      .withColumn("rn", row_number().over(wRank))
      .withColumn("f_total", sum(col("floor_alloc")).over(wAll))
      // Σ(budget·cᵢ mod C) < |groups|·C ⟹ leftover < |groups|: one unit
      // per top remainder always suffices
      .withColumn("alloc", col("floor_alloc") +
        when(col("rn") <= col("budget") - col("f_total"), 1).otherwise(0))
  }

  /** Per-(lang, source) largest-remainder apportionment of a half-corpus
    * token budget. */
  def q63MixAllocation(s: SparkSession, d: String): DataFrame =
    apportion(tokenGroups(s, d), 2)
      .select(col("lang"), col("source"), col("n_tokens"),
        col("floor_alloc"), col("alloc"))
      .orderBy(col("lang"), col("source"))

  def q63Sql: String =
    s"""WITH g AS (
      |  SELECT lang, source, CAST(sum(len(${graft.Tok.sqlText})) AS BIGINT) AS n_tokens
      |  FROM documents GROUP BY lang, source
      |), tot AS (
      |  SELECT CAST(sum(n_tokens) AS BIGINT) AS c_total FROM g
      |), p AS (
      |  SELECT lang, source, n_tokens,
      |    c_total // 2 AS budget,
      |    (n_tokens * (c_total // 2)) // c_total AS floor_alloc,
      |    (n_tokens * (c_total // 2)) % c_total AS rem
      |  FROM g, tot
      |), r AS (
      |  SELECT *, CAST(row_number() OVER (ORDER BY rem DESC, lang, source) AS INT) AS rn,
      |    CAST(sum(floor_alloc) OVER () AS BIGINT) AS f_total
      |  FROM p
      |)
      |SELECT lang, source, n_tokens, floor_alloc,
      |  floor_alloc + CASE WHEN rn <= budget - f_total THEN 1 ELSE 0 END AS alloc
      |FROM r ORDER BY lang, source""".stripMargin
}
