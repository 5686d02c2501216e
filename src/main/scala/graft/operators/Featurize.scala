package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Feature-hashing document vectors (the hashing trick — Weinberger et
  * al. 2009): every token folds into one of [[Dims]] buckets by hash,
  * signed by a second hash bit so collisions cancel in expectation, and
  * the document becomes an integer vector of signed token counts. This is
  * the model-free featurizer: it gives the similarity family (q21/q28/
  * q74-style consumers) a vector for corpora that have no learned
  * embeddings, at zero vocabulary state (no dictionary to build, ship, or
  * version — the hash IS the vocabulary).
  *
  * Output is the SPARSE form — one (doc_id, idx, val) row per non-zero
  * bucket, the exchange-friendly shape (≤ Dims rows per doc, exact int64
  * everywhere; the q29 48-bit md5 token hash keeps the bucket and sign
  * identical on both engines).
  *
  * Scale shape: one explode + one map-side-combinable groupBy on
  * (doc_id, idx) — partial sums collapse each doc's tokens to ≤ Dims
  * rows before the shuffle. No window, no join.
  */
object Featurize {

  private[operators] val Dims = 64

  /** Sparse hashed vectors: (doc_id, idx, val), val ≠ 0. The dense vector
    * is ONE per-row pass (native [[graft.functions.FeatureHash]] — no
    * token explode, no hash-aggregate exchange; the relational
    * explode → groupBy formulation it replaced lives on in the oracle);
    * sparsification is a `posexplode` of a [[Dims]]-element array plus a
    * non-zero filter, all inside the scan stage. */
  def q79HashEmbed(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .filter(col("text").isNotNull)
      .select(col("doc_id"),
        posexplode(graft.functions.Text.featureHash(graft.Tok.toksText, Dims)))
      .withColumnRenamed("pos", "idx")
      .withColumnRenamed("col", "val")
      .filter(col("val") =!= 0)
      .orderBy(col("doc_id"), col("idx"))

  def q79Sql: String =
    s"""WITH tok AS (
       |  SELECT doc_id, unnest(${graft.Tok.sqlText}) AS t FROM documents
       |), h AS (
       |  SELECT doc_id,
       |    ('0x' || substr(md5(t), 1, 12))::BIGINT AS h
       |  FROM tok
       |), v AS (
       |  SELECT doc_id, CAST(h % $Dims AS INT) AS idx,
       |    CASE WHEN (h // $Dims) % 2 = 0 THEN 1 ELSE -1 END AS sgn
       |  FROM h
       |)
       |SELECT doc_id, idx, CAST(sum(sgn) AS BIGINT) AS val
       |FROM v GROUP BY doc_id, idx
       |HAVING sum(sgn) <> 0
       |ORDER BY doc_id, idx""".stripMargin
}
