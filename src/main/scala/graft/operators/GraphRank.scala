package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Random-surfer importance over the k-NN graph (PageRank, Brin & Page,
  * damped power iteration) — the third graph-analytics consumer of the
  * q74 edge list after components (q54) and label propagation (q80).
  * Curation use: a centrality score separates well-connected "core"
  * documents from isolated outliers, the upweight/downweight signal for
  * importance sampling and for prioritizing human review.
  *
  * Semantics (deterministic, integer-exact): ranks live in integer
  * MICRO-units. Every vector starts at 1 000 000; each of [[Rounds]]
  * fixed rounds, a vertex's rank becomes `150000 + (850 · Σ inflow) DIV
  * 1000` where each out-edge of `u` carries `rank(u) DIV outdeg(u)` —
  * the 0.15/0.85 damped update with every division a truncating integer
  * DIV, so both engines agree bit-for-bit (the q71/q72 quantization
  * doctrine). Dangling mass (vectors with no out-edges) evaporates —
  * declared semantics, mirrored by the oracle.
  *
  * Scale shape (100 TB): the edge list is staged once (lazy
  * localCheckpoint, the q80 idiom); each round is one keyed join
  * edges ⋈ ranks (both hash-partitioned on the source id), a map-side-
  * combinable inflow sum keyed by destination, and a left join back to
  * the corpus-bounded vertex table — no window, no driver-side state,
  * static plan depth. Out-degree is bounded by [[Similarity.KnnK]] by
  * construction, so no vertex fans its rank out more than K ways and
  * there is no hub-explosion term anywhere.
  */
object GraphRank {

  /** Fixed damped-power-iteration rounds — static plan depth. */
  private[operators] val Rounds = 3

  private val UnitMicro = 1000000L
  private val BaseMicro = 150000L // (1 − 0.85) in micro-units
  private val DampMilli = 850L    // 0.85 in milli-units

  /** (vec_id, rank_micro) after [[Rounds]] damped iterations. */
  def q82GraphRank(s: SparkSession, d: String): DataFrame = {
    val verts = Tables.embeddings(s, d).select(col("vec_id"))
    val knn = Similarity.knnEdges(s, d)
      .select(col("vec_id").as("src"), col("neighbor").as("dst"))
      .localCheckpoint(eager = false)
    // pinned: referenced once per round — un-pinned, each round re-ran the
    // full-edge-list aggregate (lazy localCheckpoint, the knn idiom above)
    val outdeg = knn.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
      .localCheckpoint(eager = false)
    var rank = verts.withColumn("rank_micro", lit(UnitMicro))
    for (_ <- 1 to Rounds) {
      val inflow = knn
        .join(rank.select(col("vec_id").as("src"), col("rank_micro")), Seq("src"))
        .join(outdeg, Seq("src"))
        .select(col("dst"), expr("rank_micro DIV outdeg").as("share"))
        .groupBy(col("dst"))
        .agg(sum(col("share")).as("inflow"))
      rank = verts
        .join(inflow.select(col("dst").as("vec_id"), col("inflow")),
          Seq("vec_id"), "left")
        .select(col("vec_id"), expr(
          s"$BaseMicro + ($DampMilli * coalesce(inflow, 0)) DIV 1000")
          .as("rank_micro"))
    }
    rank.orderBy(col("vec_id"))
  }

  def q82Sql: String = {
    val rounds = (1 to Rounds).map { r =>
      s"""c$r AS (
         |  SELECT k.neighbor AS vec_id,
         |    CAST(sum(r.rank_micro // d.outdeg) AS BIGINT) AS inflow
         |  FROM knn k
         |  JOIN r${r - 1} r ON r.vec_id = k.vec_id
         |  JOIN deg d ON d.src = k.vec_id
         |  GROUP BY k.neighbor
         |), r$r AS (
         |  SELECT e.vec_id,
         |    CAST($BaseMicro + ($DampMilli * coalesce(c.inflow, 0)) // 1000 AS BIGINT) AS rank_micro
         |  FROM r${r - 1} e LEFT JOIN c$r c ON c.vec_id = e.vec_id
         |)""".stripMargin
    }.mkString(", ")
    s"""${Similarity.knnSqlCtes}, deg AS (
       |  SELECT vec_id AS src, count(*) AS outdeg FROM knn GROUP BY vec_id
       |), r0 AS (
       |  SELECT vec_id, CAST($UnitMicro AS BIGINT) AS rank_micro FROM embeddings
       |), $rounds
       |SELECT vec_id, rank_micro FROM r$Rounds ORDER BY vec_id""".stripMargin
  }
}
