package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Bigram collocations by pointwise mutual information (Church & Hanks
  * 1990): adjacent token pairs that co-occur more often than their
  * unigram frequencies predict are names, idioms, and multi-word terms —
  * a tokenizer-vocabulary builder and a boilerplate auditor both start
  * from this table.
  *
  * The score is the PMI ratio at MILLI resolution (the q66 quantization
  * doctrine applied to a ratio): lift_milli = (1000·N·c_xy) DIV
  * (c_x·c_y) where N is total token instances — exact int64, so it
  * hash-matches across engines where float log-PMI cannot; 1000 means
  * "exactly as often as chance", [[MinLiftMilli]] keeps pairs ≥ 10% over
  * chance. (An integer-⌊log₂⌋ score is useless here: natural-corpus lift
  * lives between 1× and 2× chance for most real pairs, all of which
  * floor to 0 bits.) Declared floors: c_xy ≥ [[MinPair]], lift_milli ≥
  * MinLiftMilli. The 1000·N·c_xy product overflows int64 past ~10¹⁵
  * token-occurrence products — at that corpus scale the numerator moves
  * to DECIMAL(38,0), same remedy as the q55 note.
  *
  * Scale shape: bigram counting is one map-side-combinable groupBy
  * (explode_outer, so no inferred-filter re-evaluation of the pair
  * array — the q70 lesson); the unigram table is vocab-sized, so both
  * frequency joins are keyed exchanges AQE broadcasts while vocab fits;
  * the one-row total joins via the broadcast crossJoin the TF-IDF plan
  * established. No window anywhere.
  */
object Collocate {

  private[operators] val MinPair = 5
  private[operators] val MinLiftMilli = 1100L

  /** Bigrams ≥ MinPair occurrences, ≥ 10% over chance co-occurrence. */
  def q73PmiBigrams(s: SparkSession, d: String): DataFrame = {
    val toks = Tables.documents(s, d)
      .select(graft.Tok.toksText.as("toks"))
      .filter(size(col("toks")) >= 2)
    // unigram counts pinned once (lazy localCheckpoint, vocab-sized): they
    // feed BOTH frequency joins and the total below — un-pinned, each
    // reference re-ran the corpus tokenize+explode+aggregate (guide §1.2:
    // don't compute things twice). n_total = Σ c is the same count the old
    // third corpus pass aggregated (every token instance counts exactly
    // once in its term's c), folded over |vocab| rows instead.
    val uni = Tables.documents(s, d)
      .select(explode(graft.Tok.toksText).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("c"))
      .localCheckpoint(eager = false)
    val total = uni.agg(sum(col("c")).as("n_total"))
    // Bigram enumeration rides the native 2-shingler ("w1 w2" strings,
    // codegen — the struct-building transform HOF it replaced was
    // interpreted); the split-back is exact because tokens from
    // split(text, ' ') can never themselves contain a space.
    // explode_OUTER on purpose: plain explode over a computed array lets
    // InferFiltersFromGenerate re-evaluate the shingler inside a pushed
    // filter (size(…) > 0) — the q70 lesson.
    val pairs = toks
      .select(explode_outer(
        graft.functions.Text.shingles(col("toks"), 2)).as("bg"))
      .select(substring_index(col("bg"), " ", 1).as("w1"),
        substring_index(col("bg"), " ", -1).as("w2"))
      .groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c_xy"))
      .filter(col("c_xy") >= MinPair)
    pairs
      .join(uni.withColumnRenamed("term", "w1").withColumnRenamed("c", "c_x"), "w1")
      .join(uni.withColumnRenamed("term", "w2").withColumnRenamed("c", "c_y"), "w2")
      .crossJoin(broadcast(total))
      .withColumn("lift_milli", expr("(1000 * n_total * c_xy) DIV (c_x * c_y)"))
      .filter(col("lift_milli") >= MinLiftMilli)
      .select(col("w1"), col("w2"), col("c_xy"), col("lift_milli"))
      .orderBy(col("w1"), col("w2"))
  }

  def q73Sql: String =
    s"""WITH t AS (
       |  SELECT ${graft.Tok.sqlText} AS toks FROM documents
       |  WHERE len(${graft.Tok.sqlText}) >= 2
       |), uni AS (
       |  SELECT unnest(${graft.Tok.sqlText}) AS term FROM documents
       |), ucnt AS (
       |  SELECT term, count(*) AS c FROM uni GROUP BY term
       |), tot AS (
       |  SELECT count(*) AS n_total FROM uni
       |), bcnt AS (
       |  SELECT w1, w2, count(*) AS c_xy FROM (
       |    SELECT toks[CAST(i AS INT)] AS w1, toks[CAST(i AS INT) + 1] AS w2
       |    FROM t, unnest(generate_series(1, len(toks) - 1)) AS g(i))
       |  GROUP BY w1, w2 HAVING count(*) >= $MinPair
       |)
       |SELECT b.w1, b.w2, b.c_xy,
       |  CAST((1000 * tot.n_total * b.c_xy) // (x.c * y.c) AS BIGINT) AS lift_milli
       |FROM bcnt b, tot, ucnt x, ucnt y
       |WHERE x.term = b.w1 AND y.term = b.w2
       |  AND (1000 * tot.n_total * b.c_xy) // (x.c * y.c) >= $MinLiftMilli
       |ORDER BY b.w1, b.w2""".stripMargin
}
