package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Inverted-index export — term → (document frequency, sorted posting
  * list), the retrieval side of a training-data platform: BM25 search,
  * contamination lookups, and "which docs contain this phrase" forensics
  * all start from posting lists. Terms are banded by document frequency
  * ([[DfLo]], [[DfHi]]): below the floor is hapax noise, above the cap is
  * a stopword whose posting list is corpus-sized and belongs in a
  * frequency table (q22/q62), not an index.
  *
  * Scale shape — the df band is decided BEFORE any posting list is
  * gathered: pass 1 is a map-side-combinable count per term (the exchange
  * carries vocab-bounded partial rows, never postings); only terms inside
  * the band join back (AQE broadcasts the banded vocab — it is bounded by
  * the band, not the corpus), so the `collect_list` gather shuffles just
  * the banded slice of the postings. The stopword lists — the ones that
  * would be corpus-sized — are never materialized anywhere in the plan.
  */
object Index {

  // The band is ABSOLUTE document counts — declared semantics, mirrored
  // by the oracle. Consequence at growing sf (measured): the fixture's
  // 30-word vocab pushes every term's df past DfHi at sf >= 1, so the
  // index is legitimately EMPTY there (0 rows, both engines agree). A
  // production deployment sizes the band relative to corpus cardinality
  // (e.g. df in [0.01%, 1%] of |docs|) — the plan shape is unchanged;
  // only these two constants move.
  private[operators] val DfLo = 5
  private[operators] val DfHi = 60

  /** One row per banded term: df and the ascending posting list. */
  def q69InvertedIndex(s: SparkSession, d: String): DataFrame = {
    val tok = Tables.documents(s, d)
      .select(col("doc_id"),
        explode(array_distinct(graft.Tok.toksText)).as("term"))
    val banded = tok.groupBy(col("term"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df").between(DfLo, DfHi))
    tok.join(banded, Seq("term"))
      .groupBy(col("term"), col("df"))
      // Canonical string form, not a raw array<long>: array columns hash
      // differently across engines' dataframe bridges (the q45 doctrine,
      // SetsExt.scala), and generic comparators cannot sort array cells.
      .agg(array_join(sort_array(collect_list(col("doc_id"))), ",")
        .as("postings"))
      .orderBy(col("term"))
  }

  def q69Sql: String =
    s"""WITH tok AS (
       |  SELECT doc_id, unnest(list_distinct(${graft.Tok.sqlText})) AS term
       |  FROM documents
       |), banded AS (
       |  SELECT term, count(*) AS df FROM tok
       |  GROUP BY term HAVING count(*) BETWEEN $DfLo AND $DfHi
       |)
       |SELECT t.term, b.df,
       |       array_to_string(list_sort(list(t.doc_id)), ',') AS postings
       |FROM tok t JOIN banded b USING (term)
       |GROUP BY t.term, b.df ORDER BY t.term""".stripMargin
}
