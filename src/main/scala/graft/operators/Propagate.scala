package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** k-NN label propagation (Zhu & Ghahramani's semi-supervised scheme,
  * hard-label majority variant) — the curation consumer the q74 graph was
  * built for: a handful of human-labeled seed documents push their labels
  * out across the embedding neighborhood graph, labeling the corpus
  * without a trained classifier. Real pipelines run exactly this to
  * bootstrap domain/topic/quality labels from a small audited set.
  *
  * Semantics (deterministic, integer-exact): seeds (`vec_id <`
  * [[SeedVecs]]) keep their fixture label forever; each round, every
  * still-unlabeled vector whose q74 neighbors include ≥ 1 labeled vector
  * takes the MAJORITY label among its labeled neighbors, ties broken by
  * the SMALLEST label; [[Rounds]] fixed rounds. The argmax is served as a
  * pure-integer `min` encoding — `(8 − cnt)·1024 + label` (counts ≤ the
  * k-NN fan-out [[Similarity.KnnK]], labels < 1024) — the q72 idiom: no
  * float compare, no window, deterministic across engines.
  *
  * Scale shape (100 TB): each round is two keyed equi-joins (edges ⋈
  * labels on `neighbor`, anti ⋈ on `vec_id`) plus one map-side-combinable
  * count — all exchanges hash-partitioned on vector id, no window, no
  * driver-side state; the label table starts seed-sized and grows only by
  * newly reached vectors, so AQE broadcasts it while small and shuffles
  * when the frontier widens. Round count is a fixed constant (plan depth
  * is static — no iterative fixpoint, no checkpoint needed at this
  * depth).
  *
  * Reference basis: the corpus-labeling stage of a training-data
  * pipeline; graph from q74 (`Similarity.knnEdges`), seeds from the
  * `embeddings` fixture's `label` column.
  */
object Propagate {

  /** Vectors below this id are the labeled seed set (the q21/q48 bounded
    * probe-set convention). */
  private[operators] val SeedVecs = 50

  /** Fixed propagation rounds — static plan depth, no fixpoint. */
  private[operators] val Rounds = 2

  // argmax(count, tie min label) as one integer min: (Big − cnt)·Radix +
  // label. Big bounds the vote count (≤ KnnK neighbors), Radix the label
  // alphabet.
  private val Big = 8L
  private val Radix = 1024L

  /** (vec_id, label, round) — round 0 = seed, r ≥ 1 = assigned in round r;
    * vectors never reached stay absent. */
  def q80LabelProp(s: SparkSession, d: String): DataFrame = {
    // the graph subtree feeds two joins per round — stage it once
    // (lazy localCheckpoint: blocks reclaimed by the ContextCleaner, the
    // q53 idiom) instead of re-deriving bands→pairs→cosine→top-k 2·Rounds
    // times in the final plan
    val knn = Similarity.knnEdges(s, d).select(col("vec_id"), col("neighbor"))
      .localCheckpoint(eager = false)
    var labels = Tables.embeddings(s, d)
      .filter(col("vec_id") < SeedVecs)
      .select(col("vec_id"), col("label"), lit(0).as("round"))
    for (r <- 1 to Rounds) {
      val known = labels
      val assigned = knn
        .join(known.select(col("vec_id").as("neighbor"), col("label")),
          Seq("neighbor"))
        .join(known.select(col("vec_id")), Seq("vec_id"), "left_anti")
        .groupBy(col("vec_id"), col("label"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy(col("vec_id"))
        .agg(min((lit(Big) - col("cnt")) * Radix + col("label")).as("enc"))
        .select(col("vec_id"), (col("enc") % Radix).cast("int").as("label"),
          lit(r).as("round"))
      // pin each round's newly-assigned frontier: round r+1 references the
      // running label table TWICE (vote join + anti join), so un-pinned the
      // round-r subtree re-executed once per reference (plan size — and
      // work — doubling per round); the pin computes each frontier once
      // (lazy localCheckpoint, blocks reclaimed by the ContextCleaner)
      labels = labels.unionByName(assigned.localCheckpoint(eager = false))
    }
    labels.orderBy(col("vec_id"))
  }

  def q80Sql: String = {
    val rounds = (1 to Rounds).map { r =>
      s"""v$r AS (
         |  SELECT k.vec_id, l.label, count(*) AS cnt
         |  FROM knn k JOIN l${r - 1} l ON l.vec_id = k.neighbor
         |  WHERE NOT EXISTS (SELECT 1 FROM l${r - 1} x WHERE x.vec_id = k.vec_id)
         |  GROUP BY k.vec_id, l.label
         |), a$r AS (
         |  SELECT vec_id,
         |    CAST(min(($Big - cnt) * $Radix + label) % $Radix AS INT) AS label,
         |    $r AS round
         |  FROM v$r GROUP BY vec_id
         |), l$r AS (
         |  SELECT * FROM l${r - 1} UNION ALL SELECT * FROM a$r
         |)""".stripMargin
    }.mkString(", ")
    s"""${Similarity.knnSqlCtes}, l0 AS (
       |  SELECT vec_id, label, 0 AS round FROM embeddings WHERE vec_id < $SeedVecs
       |), $rounds
       |SELECT vec_id, label, round FROM l$Rounds ORDER BY vec_id""".stripMargin
  }
}
