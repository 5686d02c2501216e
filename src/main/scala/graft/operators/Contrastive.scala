package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Hard-negative mining for contrastive training (the in-batch-negatives
  * upgrade every embedding-model pipeline runs): for each anchor, the
  * top-k most-similar vectors with a DIFFERENT label — maximally
  * confusable examples, the negatives that actually move a contrastive
  * loss. (Positives are the same query with the filter flipped — q21's
  * shape restricted to the anchor's own label.)
  *
  * Scale shape: identical to q21's honest brute-force baseline — the
  * anchor set is bounded by definition (a mining batch, not the corpus)
  * and broadcasts; the corpus streams through ONE scan; the label
  * disqualifier is a codegen row filter BEFORE any scoring; the top-k
  * window partitions per anchor. Swapping the scan for the q28/q40
  * bucketed candidate set turns this into the ANN-accelerated variant
  * with the same output contract — the plan slot is the point.
  * Cosine is the repo's left-fold dot ([[graft.functions.Vectors.dot]]),
  * bit-identical to the oracle's `list_reduce` fold.
  */
object Contrastive {

  private[operators] val NAnchors = 10
  private[operators] val KNeg = 5

  /** (anchor_id, vec_id, label, cosine, rn ≤ [[KNeg]]) — the hardest
    * differently-labeled neighbors of each anchor. */
  def q83HardNegatives(s: SparkSession, d: String): DataFrame = {
    import graft.functions.Vectors
    val emb = Tables.embeddings(s, d)
      .select(col("vec_id"), col("label"), col("embedding"),
        Vectors.dot(col("embedding"), col("embedding")).as("n2"))
    val anchors = emb.filter(col("vec_id") < NAnchors)
      .select(col("vec_id").as("anchor_id"), col("label").as("a_label"),
        col("embedding").as("pe"), col("n2").as("pn2"))
    val w = Window.partitionBy(col("anchor_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    emb.crossJoin(broadcast(anchors))
      .filter(col("label") =!= col("a_label"))
      .withColumn("cosine",
        Vectors.dot(col("pe"), col("embedding")) / sqrt(col("pn2") * col("n2")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= KNeg)
      .select(col("anchor_id"), col("vec_id"), col("label"), col("cosine"), col("rn"))
      .orderBy(col("anchor_id"), col("rn"))
  }

  def q83Sql: String = {
    def dot(a: String, b: String) = Similarity.duckDotSql(a, b)
    s"""WITH emb AS (
       |  SELECT vec_id, label, embedding, ${dot("embedding", "embedding")} AS n2 FROM embeddings
       |), anchors AS (
       |  SELECT vec_id AS anchor_id, label AS a_label, embedding AS pe, n2 AS pn2
       |  FROM emb WHERE vec_id < $NAnchors
       |), scored AS (
       |  SELECT anchor_id, vec_id, label,
       |    ${dot("pe", "embedding")} / sqrt(pn2 * n2) AS cosine
       |  FROM emb, anchors WHERE label <> a_label
       |), ranked AS (
       |  SELECT anchor_id, vec_id, label, cosine,
       |    CAST(row_number() OVER (PARTITION BY anchor_id ORDER BY cosine DESC, vec_id) AS INT) AS rn
       |  FROM scored
       |)
       |SELECT anchor_id, vec_id, label, cosine, rn FROM ranked
       |WHERE rn <= $KNeg ORDER BY anchor_id, rn""".stripMargin
  }
}
