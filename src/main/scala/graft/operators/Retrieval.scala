package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** BM25 top-k retrieval (q95) — the ranked-retrieval leg of the text
  * family (q22 raw TF → q55 TF-IDF term importance → q95 query-time
  * document ranking), and the lexical complement of the ANN legs
  * (q40/q86 float, q92/q93 PQ): a training-data pipeline hunts "which
  * documents match this probe" by embedding OR by keyword, and this is
  * the keyword half. Reference scope: the reference ships no retrieval
  * (nearest analog is the substring matcher, `StreamingApp.scala:415`);
  * north-star surface like the ANN family.
  *
  * Scoring is Robertson BM25 (k1 = 1.2, b = 0.75) re-expressed in EXACT
  * INTEGER MILLIUNITS — the q66/q71 doctrine — because the standard
  * smooth IDF's `ln` is not correctly rounded and differs across libm
  * implementations (the q55 lesson), and per-(query, doc) float term
  * sums would additionally hash-diverge on aggregation order:
  *  - idf       = 1 + ⌊log₂(N DIV df)⌋ (q55's bin-length form);
  *  - adl_m     = (Σdl · 1000) DIV N             (avg doc len, milli);
  *  - norm_m    = 250 + (750000·dl) DIV adl_m    ((1−b) + b·dl/adl);
  *  - tfp_m     = (tf·2200000) DIV (tf·1000 + (1200·norm_m) DIV 1000)
  *                (tf·(k1+1) / (tf + k1·norm), milli);
  *  - score     = Σ_terms idf·tfp_m — an INTEGER sum, order-free.
  * Every DIV is floor division of non-negatives, so both engines
  * compute bit-identical BIGINTs end to end.
  *
  * Queries are derived from the corpus so the surface needs no second
  * fixture: query `qid` (0..9) is the deduplicated first four tokens of
  * document 17·qid — both engines re-derive them with the same slice.
  *
  * Scale shape: tf is the one corpus-scale build (explode → partial
  * count, map-side combine) and is staged once, feeding dl (per-doc
  * lengths), df (term frequencies) and the scoring join; the ≤40-row
  * (qid, term, idf) table folds df + corpus stats BEFORE broadcasting,
  * so the corpus-side scan joins against a broadcast literal and only
  * rows containing a query term survive into the doc-keyed dl join and
  * the per-qid top-k window (10 bounded partitions). Nothing
  * corpus-scale ever broadcasts; the one shuffle set is tf's own
  * groupBy reused by every consumer. */
object Retrieval {

  /** Query fan: queries 0..9 from every 17th document's first 4 tokens. */
  val NQueries = 10
  val QStride = 17
  val QTerms = 4
  val TopK = 5

  def q95Bm25TopK(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val tf = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .localCheckpoint(false) // one corpus-scale build, three consumers
    val dl = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("total_dl"))
    val queries = docs
      .filter(col("doc_id") % QStride === 0 &&
        expr(s"doc_id DIV $QStride") < NQueries)
      .select(expr(s"doc_id DIV $QStride").as("qid"),
        explode(slice(split(col("text"), " "), 1, QTerms)).as("term"))
      .distinct()
    // fold df + corpus stats into the tiny query-term table BEFORE the
    // broadcast: the corpus side then needs no df join at all
    val qt = dfreq.join(broadcast(queries), Seq("term"))
      .crossJoin(broadcast(stats))
      .withColumn("idf", lit(1) + (length(bin(expr("n_docs DIV df"))) - 1))
      .select(col("qid"), col("term"), col("idf"),
        expr("total_dl * 1000 DIV n_docs").as("adl_m"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("score_milli").desc, col("doc_id"))
    tf.join(broadcast(qt), Seq("term"))
      .join(dl, Seq("doc_id"))
      .withColumn("norm_m", expr("250 + (750000 * dl) DIV adl_m"))
      .withColumn("tfp_m",
        expr("(tf * 2200000) DIV (tf * 1000 + (1200 * norm_m) DIV 1000)"))
      .groupBy(col("qid"), col("doc_id"))
      .agg(sum(col("idf") * col("tfp_m")).as("score_milli"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= TopK)
      .select(col("qid"), col("doc_id"), col("score_milli"), col("rn"))
      .orderBy(col("qid"), col("rn"))
  }

  def q95Sql: String =
    s"""WITH tf AS (
       |  SELECT doc_id, term, count(*) AS tf
       |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
       |        FROM documents) t
       |  GROUP BY doc_id, term
       |), dl AS (
       |  SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY doc_id
       |), dfreq AS (
       |  SELECT term, count(*) AS df FROM tf GROUP BY term
       |), stats AS (
       |  SELECT count(*) AS n_docs, sum(dl) AS total_dl FROM dl
       |), queries AS (
       |  SELECT DISTINCT doc_id // $QStride AS qid,
       |    unnest((string_split(text, ' '))[1:$QTerms]) AS term
       |  FROM documents
       |  WHERE doc_id % $QStride = 0 AND doc_id // $QStride < $NQueries
       |), qt AS (
       |  SELECT q.qid, q.term,
       |    1 + (length(bin(n_docs // df)) - 1) AS idf,
       |    total_dl * 1000 // n_docs AS adl_m
       |  FROM dfreq d JOIN queries q USING (term), stats
       |), scored AS (
       |  SELECT qid, t.doc_id,
       |    CAST(sum(idf * ((t.tf * 2200000) //
       |      (t.tf * 1000 +
       |        (1200 * (250 + (750000 * l.dl) // adl_m)) // 1000))) AS BIGINT)
       |      AS score_milli
       |  FROM tf t JOIN qt USING (term) JOIN dl l ON t.doc_id = l.doc_id
       |  GROUP BY qid, t.doc_id
       |), ranked AS (
       |  SELECT qid, doc_id, score_milli,
       |    CAST(row_number() OVER (PARTITION BY qid
       |      ORDER BY score_milli DESC, doc_id) AS INT) AS rn
       |  FROM scored
       |)
       |SELECT qid, doc_id, score_milli, rn FROM ranked WHERE rn <= $TopK
       |ORDER BY qid, rn""".stripMargin
}
