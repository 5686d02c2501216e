package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Text-analysis family over `documents` (north-star surface): term
  * frequencies, language-ID heuristic, quality scoring, token counting and
  * order-sensitive document fingerprinting — all built-in expressions
  * (split/explode/HOF lambdas), zero UDFs, so the whole pipeline stays
  * inside whole-stage codegen and every metric has an exact DuckDB twin.
  *
  * Scale notes: q22 is explode → two-level agg — the shuffle carries
  * (lang, token) partial counts, not raw tokens (map-side combine), and the
  * top-N window partitions by lang. q29 is a single narrow projection per
  * document — no explode at all (the per-token arithmetic happens inside
  * array lambdas), so it scans 100 TB of documents with zero shuffles.
  */
object TextAnalysis {

  private val P = 1000000007L

  // ---------------------------------------------------------------- q22

  /** Token TF: per-(lang, token) counts, top-5 tokens per lang
    * (count desc, token asc tiebreak — the q08 window shape). */
  def q22TokenTf(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("cnt").desc, col("token"))
    Tables.documents(s, d)
      .select(col("lang"), explode(graft.Tok.toksText).as("token"))
      .groupBy(col("lang"), col("token"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select(col("lang"), col("token"), col("cnt"), col("rn"))
      .orderBy(col("lang"), col("rn"))
  }

  def q22Sql: String =
    s"""WITH tf AS (
      |  SELECT lang, unnest(${graft.Tok.sqlText}) AS token FROM documents
      |), counts AS (
      |  SELECT lang, token, count(*) AS cnt FROM tf GROUP BY lang, token
      |), ranked AS (
      |  SELECT lang, token, cnt,
      |    CAST(row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, token) AS INT) AS rn
      |  FROM counts
      |)
      |SELECT lang, token, cnt, rn FROM ranked WHERE rn <= 5
      |ORDER BY lang, rn""".stripMargin

  // ---------------------------------------------------------------- q29

  /** Per-document text metrics in ONE shuffle-free pass:
    *  - n_tokens: whitespace tokenizer count; n_words: BPE-ish regex token
    *    count (`[a-z0-9]+`) — the two token-counting flavors;
    *  - avg_token_len, stop_ratio: quality-score inputs (length shape,
    *    stopword density);
    *  - pred_lang: marker-stopword language-ID heuristic (en/es/de markers,
    *    deterministic argmax with fixed precedence, 'und' when no marker
    *    hits — fixture text is synthetic word soup, so the interesting part
    *    is the operator shape, not linguistic accuracy);
    *  - fingerprint: order-sensitive rolling fingerprint
    *    Σ_p hash48(token_p)·((p-1) mod 64 + 1) mod P — position-weighted so
    *    permuted documents fingerprint differently (unlike bag-of-words
    *    hashes); exact 64-bit arithmetic both engines.
    */
  def q29TextMetrics(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("toks", graft.Tok.toksText)
      .withColumn("n_tokens", size(col("toks")))
      .withColumn("n_words", size(expr("regexp_extract_all(text, '[a-z0-9]+', 0)")))
      .withColumn("avg_token_len",
        length(regexp_replace(col("text"), " ", "")).cast("double") / col("n_tokens"))
      .withColumn("stop_hits", graft.functions.Text.countIn(col("toks"),
        Seq("the", "a", "of", "and", "to", "in")))
      .withColumn("stop_ratio", col("stop_hits").cast("double") / col("n_tokens"))
      .withColumn("en_hits", graft.functions.Text.countIn(col("toks"),
        Seq("the", "a", "of", "and")))
      .withColumn("es_hits", graft.functions.Text.countIn(col("toks"),
        Seq("el", "la", "de", "y")))
      .withColumn("de_hits", graft.functions.Text.countIn(col("toks"),
        Seq("der", "die", "das", "und")))
      .withColumn("pred_lang",
        when(col("en_hits") >= col("es_hits") && col("en_hits") >= col("de_hits")
          && col("en_hits") > 0, "en")
          .when(col("es_hits") >= col("de_hits") && col("es_hits") > 0, "es")
          .when(col("de_hits") > 0, "de")
          .otherwise("und"))
      // running (acc + v) % P keeps acc < P ≈ 1e9 against terms ≤ 2^48·64
      // ≈ 1.8e16 — no Long overflow at ANY document length (an unmodded
      // running sum wraps silently in Spark past ~500 tokens while DuckDB
      // raises, breaking the oracle contract; the native one-pass
      // expression runs the same running-mod int64 arithmetic).
      .withColumn("fingerprint", graft.functions.Text.fingerprint48(col("toks"), P))
      .select(col("doc_id"), col("lang"), col("pred_lang"), col("n_tokens"),
        col("n_words"), col("avg_token_len"), col("stop_ratio"), col("fingerprint"))
      .orderBy(col("doc_id"))

  // ---------------------------------------------------------------- q55

  /** TF-IDF top terms per document — the classic rarity-weighted term
    * importance, completing the text family (q22 raw TF → q55 corpus-
    * weighted). IDF is QUANTIZED to exact integers: idf = 1 + ⌊log₂(N DIV
    * df)⌋, computed as length(bin(q))−1 — floating ln/log2 are not
    * correctly-rounded and differ across libm implementations, so the
    * standard smooth IDF cannot hash-match bit-for-bit across engines;
    * the log₂ floor preserves the rarity ordering at integer exactness.
    *
    * Scale shape: explode → (doc, term) partial counts combine map-side;
    * df is a second agg over the (already narrow) tf table; N arrives as a
    * broadcast single-row cross join (no window, no collect); the top-3
    * window partitions by doc_id. The tf table feeds df AND the join, so
    * it is staged once. */
  def q55Tfidf(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    // the identical (doc, term, tf) derivation BM25 stages — ride the
    // session-owned cache so the text family and the retrieval family
    // price ONE corpus-scale tf build between them (the q70/q89 pattern)
    val tf = Retrieval.stagedTf(s, d)
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val total = docs.agg(count(lit(1)).as("n_total"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("weight").desc, col("term"))
    tf.join(df, "term")
      .crossJoin(broadcast(total))
      .withColumn("weight",
        col("tf") * (lit(1) + (length(bin(expr("n_total DIV df"))) - 1)))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("doc_id"), col("term"), col("tf"), col("df"),
        col("weight"), col("rn"))
      .orderBy(col("doc_id"), col("rn"))
  }

  def q55Sql: String =
    s"""WITH tf AS (
      |  SELECT doc_id, term, count(*) AS tf
      |  FROM (SELECT doc_id, unnest(${graft.Tok.sqlText}) AS term FROM documents) t
      |  GROUP BY doc_id, term
      |), dfreq AS (
      |  SELECT term, count(*) AS df FROM tf GROUP BY term
      |), tot AS (
      |  SELECT count(*) AS n_total FROM documents
      |), w AS (
      |  SELECT doc_id, term, tf, df,
      |    tf * (1 + (length(bin(n_total // df)) - 1)) AS weight
      |  FROM tf JOIN dfreq USING (term), tot
      |), ranked AS (
      |  SELECT doc_id, term, tf, df, weight,
      |    CAST(row_number() OVER (PARTITION BY doc_id ORDER BY weight DESC, term) AS INT) AS rn
      |  FROM w
      |)
      |SELECT doc_id, term, tf, df, weight, rn FROM ranked WHERE rn <= 3
      |ORDER BY doc_id, rn""".stripMargin

  // ---------------------------------------------------------------- q59

  /** Within-document repetition ratio — the quality signal the q29 floors
    * miss: boilerplate and degenerate generations repeat n-grams INSIDE a
    * document (the across-document case is the dedup family's job).
    * rep_ratio = (n_grams − n_distinct) / n_grams over 3-grams; 0 = no
    * internal repetition. Like q29, a single shuffle-free scan: the
    * 3-grams are built and deduplicated per document inside array lambdas
    * (`transform` + `array_distinct`), never exploded, so this reads
    * 100 TB of documents with zero exchanges. */
  def q59RepetitionRatio(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("t", graft.Tok.toksText)
      .filter(size(col("t")) >= 3) // sequence(1, 0) DESCENDS — guard
      .withColumn("n_grams", size(col("t")) - 2)
      .withColumn("n_distinct",
        size(array_distinct(graft.functions.Text.shingles(col("t"), 3))))
      .withColumn("rep_ratio",
        (col("n_grams") - col("n_distinct")).cast("double") / col("n_grams"))
      .select(col("doc_id"), col("lang"), col("n_grams"), col("n_distinct"),
        col("rep_ratio"))
      .orderBy(col("doc_id"))

  def q59Sql: String =
    s"""WITH g AS (
      |  SELECT doc_id, lang,
      |    CAST(len(t) - 2 AS INT) AS n_grams,
      |    CAST(len(list_distinct(list_transform(range(1, len(t) - 1),
      |      i -> array_to_string(list_slice(t, CAST(i AS INT), CAST(i AS INT) + 2), ' ')))) AS INT) AS n_distinct
      |  FROM (SELECT doc_id, lang, ${graft.Tok.sqlText} AS t FROM documents) s
      |  WHERE len(t) >= 3
      |)
      |SELECT doc_id, lang, n_grams, n_distinct,
      |  CAST(n_grams - n_distinct AS DOUBLE) / n_grams AS rep_ratio
      |FROM g ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q62

  /** Keep docs at or below this mean surprisal (centibits/token). */
  val LmKeepCentibits = 405L

  /** Corpus-LM quality score — the perplexity filter of the standard
    * curation pipeline (CCNet-style): fit a unigram LM on the corpus
    * itself, score every document by its mean per-token surprisal, and
    * flag the high-surprisal tail for drop. Degenerate/rare-token soup
    * scores high; ordinary prose scores low. Surprisal is QUANTIZED to
    * exact integers the way q55's IDF is — bits(tok) = ⌊log₂(T DIV
    * cnt(tok))⌋ via length(bin(q))−1 — so the score hash-matches across
    * engines where floating ln cannot, and the mean is served as integer
    * centibits ((100·Σbits) DIV n).
    *
    * Scale shape: the corpus-sized token stream collapses to the narrow
    * (doc, term, tf) table ONCE (map-side combine) and is staged for both
    * consumers; the vocab (distinct terms — sublinear in corpus size) and
    * its one-row total are the only other inputs, joined back with AQE
    * free to broadcast the vocab side. No window at all — the per-doc
    * score is a second map-side-combinable aggregation. Two shuffles
    * total at any scale (tf groupBy, per-doc groupBy) plus the vocab agg
    * over the already-narrow tf table. */
  def q62LmQuality(s: SparkSession, d: String): DataFrame = {
    // same staged tf as q55/q95 — the rename projects ON TOP of the
    // cached subtree, so CacheManager still dedupes to the one build
    val tf = Retrieval.stagedTf(s, d)
      .withColumnRenamed("term", "token")
    val vocab = tf.groupBy(col("token")).agg(sum(col("tf")).as("cnt"))
    val total = vocab.agg(sum(col("cnt")).as("t_total"))
    tf.join(vocab, "token")
      .crossJoin(broadcast(total))
      .withColumn("bits", length(bin(expr("t_total DIV cnt"))) - 1)
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("n_tokens"),
        sum(col("tf") * col("bits")).as("sum_bits"))
      .withColumn("mean_centibits", expr("(100 * sum_bits) DIV n_tokens"))
      .withColumn("keep",
        (col("mean_centibits") <= LmKeepCentibits).cast("int"))
      .select(col("doc_id"), col("n_tokens"), col("sum_bits"),
        col("mean_centibits"), col("keep"))
      .orderBy(col("doc_id"))
  }

  def q62Sql: String =
    s"""WITH tf AS (
       |  SELECT doc_id, token, count(*) AS tf
       |  FROM (SELECT doc_id, unnest(${graft.Tok.sqlText}) AS token FROM documents) t
       |  GROUP BY doc_id, token
       |), vocab AS (
       |  SELECT token, CAST(sum(tf) AS BIGINT) AS cnt FROM tf GROUP BY token
       |), tot AS (
       |  SELECT CAST(sum(cnt) AS BIGINT) AS t_total FROM vocab
       |), d AS (
       |  SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,
       |    CAST(sum(tf * (length(bin(t_total // cnt)) - 1)) AS BIGINT) AS sum_bits
       |  FROM tf JOIN vocab USING (token), tot
       |  GROUP BY doc_id
       |)
       |SELECT doc_id, n_tokens, sum_bits,
       |  (100 * sum_bits) // n_tokens AS mean_centibits,
       |  CAST((100 * sum_bits) // n_tokens <= $LmKeepCentibits AS INT) AS keep
       |FROM d ORDER BY doc_id""".stripMargin

  def q29Sql: String =
    s"""WITH m AS (
       |  SELECT doc_id, lang, ${graft.Tok.sqlText} AS toks,
       |    CAST(len(${graft.Tok.sqlText}) AS INT) AS n_tokens,
       |    CAST(len(regexp_extract_all(text, '[a-z0-9]+')) AS INT) AS n_words,
       |    length(replace(text, ' ', ''))::DOUBLE / len(${graft.Tok.sqlText}) AS avg_token_len,
       |    CAST(len(list_filter(${graft.Tok.sqlText}, x -> x IN ('the','a','of','and','to','in'))) AS INT) AS stop_hits,
       |    CAST(len(list_filter(${graft.Tok.sqlText}, x -> x IN ('the','a','of','and'))) AS INT) AS en_hits,
       |    CAST(len(list_filter(${graft.Tok.sqlText}, x -> x IN ('el','la','de','y'))) AS INT) AS es_hits,
       |    CAST(len(list_filter(${graft.Tok.sqlText}, x -> x IN ('der','die','das','und'))) AS INT) AS de_hits,
       |    list_reduce(list_transform(range(1, len(${graft.Tok.sqlText})+1),
       |      i -> ('0x' || substr(md5(${graft.Tok.sqlText}[i]),1,12))::BIGINT * (((i-1) % 64) + 1)),
       |      (acc, v) -> (acc + v) % $P) % $P AS fingerprint
       |  FROM documents
       |)
       |SELECT doc_id, lang,
       |  CASE WHEN en_hits >= es_hits AND en_hits >= de_hits AND en_hits > 0 THEN 'en'
       |       WHEN es_hits >= de_hits AND es_hits > 0 THEN 'es'
       |       WHEN de_hits > 0 THEN 'de'
       |       ELSE 'und' END AS pred_lang,
       |  n_tokens, n_words, avg_token_len,
       |  stop_hits::DOUBLE / n_tokens AS stop_ratio, fingerprint
       |FROM m ORDER BY doc_id""".stripMargin
}
