package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Duplicate-span measurement — the EXACT complement of q70's winnowed
  * report (the ExactSubstr criterion of Lee et al. 2022: cut duplicated
  * substrings above a length threshold): for every surviving q70 pair,
  * the exact length of the LONGEST shared contiguous token run. q70's
  * fingerprints prove "these two share ≥ 2 winnowed fingerprints"; q89
  * answers the policy question that follows — HOW LONG is the shared
  * passage, the number an ExactSubstr-style cut thresholds on.
  *
  * Semantics (pure integer, windowed gaps-and-islands): join the two
  * documents' token-position lists on token equality, group matches by
  * DIAGONAL (i − j: a shared run advances both positions in lockstep, so
  * its cells share a diagonal), and inside each diagonal the classic
  * island key `i − row_number()` is constant exactly on consecutive-i
  * runs; the longest run is the max island size. Both engines run the
  * same relational formulation — all int64, hash-exact (the position
  * bases differ by a constant per pair — Spark's posexplode is 0-based,
  * the oracle's range 1-based — which cancels in both the diagonal
  * grouping and the island arithmetic).
  *
  * Scale shape: the quadratic term is PER-PAIR and bounded by document
  * length squared (documents are context-bounded in a training corpus),
  * over a pair set already bounded by q70's banded + df-capped candidate
  * machinery — total work O(|pairs| · len²) with no corpus-scale blowup
  * anywhere. The match join is keyed on (doc, token); the island window
  * partitions by (pair, diagonal) — tens of thousands of TINY partitions
  * (the q08 shape), never a data-scale one. Reuses q70's staged
  * fingerprint plan for the pair list (same operator family, same
  * candidates, zero re-derivation).
  */
object Spans {

  /** The (doc_id, i, tok) position table of pair-member docs — the
    * semi filter runs BEFORE the posexplode, so the ~len× position
    * amplification is paid only on the paired subset (spec-pinned
    * shape; q89 pins the result for its two match-join consumers). */
  private[operators] def pairedPositions(s: SparkSession, d: String,
      pairIds: DataFrame): DataFrame =
    Tables.documents(s, d)
      .join(pairIds, Seq("doc_id"), "left_semi")
      .select(col("doc_id"), posexplode(graft.Tok.toksText).as(Seq("i", "tok")))

  /** (doc_a, doc_b, n_shared, longest_run) for every q70 pair. */
  def q89DupSpans(s: SparkSession, d: String): DataFrame = {
    // staged via Winnow's session-owned pair cache: one plan feeds both
    // the pair join and the doc-id semi-join below, AND — because
    // CacheManager dedupes by analyzed plan — a q70 run earlier in the
    // session already materialized it, so this query pays only the
    // span arithmetic, not a re-derivation of the fingerprint chain.
    val pairs = Winnow.stagedPairs(s, d)
      .select(col("doc_a"), col("doc_b"), col("n_shared"))
    // Only docs appearing in a surviving pair can match the doc_id
    // equi-joins — semi-join BEFORE posexplode so the ~len× position
    // amplification is paid on the <1% paired set, not 100% of the corpus.
    // The id list is ≤ 2·|pairs| rows → broadcasts.
    val pairIds = pairs.select(col("doc_a").as("doc_id"))
      .union(pairs.select(col("doc_b").as("doc_id")))
      .distinct()
    // pinned (lazy localCheckpoint): the a/b match joins below each
    // consume this position table — un-pinned, the corpus scan + semi
    // filter + posexplode ran once per side (guide §1.2). Rows are
    // paired-set-proportional (the semi filter ran first), so the pin is
    // small by construction. SpansSpec asserts the semi-before-explode
    // shape on [[pairedPositions]] directly (the pin truncates the
    // visible plan at a LogicalRDD).
    val toks = pairedPositions(s, d, pairIds).localCheckpoint(eager = false)
    val matches = pairs
      .join(toks.as("a"), col("doc_a") === col("a.doc_id"))
      .join(toks.as("b"),
        col("doc_b") === col("b.doc_id") && col("a.tok") === col("b.tok"))
      .select(col("doc_a"), col("doc_b"), col("n_shared"),
        col("a.i").as("i"), (col("a.i") - col("b.i")).as("diag"))
    val w = Window.partitionBy(col("doc_a"), col("doc_b"), col("diag"))
      .orderBy(col("i"))
    matches
      .withColumn("isl", col("i") - row_number().over(w))
      .groupBy(col("doc_a"), col("doc_b"), col("n_shared"),
        col("diag"), col("isl"))
      .agg(count(lit(1)).as("run"))
      .groupBy(col("doc_a"), col("doc_b"), col("n_shared"))
      .agg(max(col("run")).as("longest_run"))
      .select(col("doc_a"), col("doc_b"), col("n_shared"), col("longest_run"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  def q89Sql: String =
    s"""${Winnow.winnowCtes}, pairs AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |    CAST(count(*) AS BIGINT) AS n_shared
       |  FROM kept a JOIN kept b ON a.fp = b.fp AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2 HAVING count(*) >= ${Winnow.MinShared}
       |), tp AS (
       |  SELECT doc_id, t, unnest(range(1, len(t) + 1)) AS i
       |  FROM (SELECT doc_id, ${graft.Tok.sqlText} AS t FROM documents)
       |), pos AS (
       |  SELECT doc_id, i, t[i] AS tok FROM tp
       |), m AS (
       |  SELECT p.doc_a, p.doc_b, p.n_shared, a.i, a.i - b.i AS diag
       |  FROM pairs p
       |  JOIN pos a ON a.doc_id = p.doc_a
       |  JOIN pos b ON b.doc_id = p.doc_b AND a.tok = b.tok
       |), runs AS (
       |  SELECT doc_a, doc_b, n_shared, diag,
       |    i - row_number() OVER (PARTITION BY doc_a, doc_b, diag ORDER BY i) AS isl
       |  FROM m
       |), sized AS (
       |  SELECT doc_a, doc_b, n_shared, diag, isl, count(*) AS run
       |  FROM runs GROUP BY ALL
       |)
       |SELECT doc_a, doc_b, n_shared,
       |  CAST(max(run) AS BIGINT) AS longest_run
       |FROM sized GROUP BY doc_a, doc_b, n_shared
       |ORDER BY doc_a, doc_b""".stripMargin
}
