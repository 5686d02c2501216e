package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** q109 — the Unicode tokenizer under the DRIVER's oracle hash.
  *
  * The r11 verdict's gate-visibility gap: the synthetic fixtures are
  * single-space lowercase ASCII, so every declared text row is hash-green
  * under EITHER tokenizer — the gate would stay green if [[graft.functions.UniTokens]]
  * regressed to space-splitting; only a unit spec guarded it. This row
  * closes that: it derives a punctuated / mixed-case / non-ASCII corpus
  * from `documents` with engine-exact string ops and computes token
  * frequencies over it, so the Spark side exercises the native tokenizer
  * on exactly the inputs where modes DIVERGE while the DuckDB twin runs
  * the independent regexp formulation — if UniTokens drops punctuation
  * handling, casefolding, accents, CJK, or mixed alphanumerics, the hash
  * breaks.
  *
  * Corpus derivation (identical strings in both engines, by construction):
  *  - every inter-word space becomes ", " (comma+space — a ws-split would
  *    keep the commas attached to tokens);
  *  - docs with doc_id % 3 = 0 are UPPERCASED (ASCII-only input, so
  *    upper() agrees across engines — non-ASCII case mapping is never
  *    applied by a transform, only baked into literals);
  *  - a prefix `Étude №<doc_id%7>:` (accented casefold target + a
  *    symbol-category separator) and a suffix `— 北京<doc_id%5> v2.0`
  *    (dash separator, CJK letter run, mixed alphanumeric + dotted
  *    version) wrap every doc.
  *
  * Output: per-token totals and doc frequencies — the TF shape, one
  * explode + one hash aggregate, scale-invariant.
  */
object UniCorpus {

  /** The decorated corpus: (doc_id, text) with the derivation above. */
  private[graft] def decorated(docs: DataFrame): DataFrame =
    docs.filter(col("text").isNotNull)
      .select(col("doc_id"), concat(
        lit("Étude №"), (col("doc_id") % 7).cast("string"), lit(": "),
        when(col("doc_id") % 3 === 0,
          upper(regexp_replace(col("text"), " ", ", ")))
          .otherwise(regexp_replace(col("text"), " ", ", ")),
        lit(" — 北京"), (col("doc_id") % 5).cast("string"), lit(" v2.0")
      ).as("text"))

  /** DuckDB twin of [[decorated]]'s text expression. */
  private def decoratedSql: String =
    """SELECT doc_id,
      |    'Étude №' || CAST(doc_id % 7 AS VARCHAR) || ': ' ||
      |    CASE WHEN doc_id % 3 = 0 THEN upper(replace(text, ' ', ', '))
      |         ELSE replace(text, ' ', ', ') END ||
      |    ' — 北京' || CAST(doc_id % 5 AS VARCHAR) || ' v2.0' AS text
      |  FROM documents WHERE text IS NOT NULL""".stripMargin

  def q109UniTokens(s: SparkSession, d: String): DataFrame =
    decorated(Tables.documents(s, d))
      .select(col("doc_id"), explode(graft.Tok.toks(col("text"))).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("doc_id")).as("n_docs"))
      .orderBy(col("token"))

  def q109Sql: String =
    s"""WITH deco AS (
       |  $decoratedSql
       |), tok AS (
       |  SELECT doc_id, unnest(${graft.Tok.sql("text")}) AS token FROM deco
       |)
       |SELECT token, count(*) AS n, count(DISTINCT doc_id) AS n_docs
       |FROM tok GROUP BY token ORDER BY token""".stripMargin
}
