package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Similarity search over `embeddings` (north-star surface): brute-force
  * cosine top-k as the correctness baseline, and a random-hyperplane
  * LSH-bucketed variant as the scale path.
  *
  * Precision contract with the oracle: every dot product is an explicit
  * LEFT fold over per-element double products — Spark's `aggregate` folds
  * left from an explicit zero, DuckDB's `list_reduce` folds left from the
  * first element, and IEEE `0.0 + x == x`, so the sums are bit-identical.
  * float→double casts are exact; sqrt/division are IEEE-determined. No
  * rounding or tolerance needed anywhere.
  *
  * Scale design:
  *  - q21 (brute force) broadcasts the PROBE set — a top-k query batch is
  *    small by definition; the candidate scan streams once, the per-probe
  *    window partitions by probe. Honest baseline, linear in |candidates|.
  *  - q28 (LSH) joins probe→candidate on a hyperplane sign bucket — the
  *    cross join disappears; the quadratic term is within-bucket only
  *    (|bucket| ≈ N / 2^planes, tunable). This is the 100 TB shape: bucket
  *    is a shuffle key, and an IVF/coarse-quantizer variant would swap the
  *    bucket function, not the plan.
  */
object Similarity {

  private val K = 5       // neighbors per probe (q21)
  private val NProbes = 10
  private val Planes = 4  // LSH hyperplanes → 16 buckets (q28)
  private val Dim = graft.Dials.EmbeddingDim
  /** q28 multi-probe radius: a probe searches every bucket within this
    * Hamming distance of its own sign pattern — the standard multi-probe
    * LSH recall dial. Radius 2 over 4 planes probes 11 of 16 buckets;
    * AnnRecallSpec measures the resulting recall@3 against brute force
    * (BASELINE.md §recall) and pins the floor. At warehouse scale more
    * planes + the same radius keeps the probed fraction small; the plan
    * (bucket equi-join, never a cross join) is unchanged by the dial. */
  private val ProbeRadius = 2
  private[graft] def probeMasks: Seq[Int] =
    (0 until (1 << Planes)).filter(Integer.bitCount(_) <= ProbeRadius)

  /** Deterministic ±1 hyperplane weights from md5 — reproducible anywhere,
    * no RNG. w(j,i) = +1 iff the 48-bit md5 int of "plane_j_i" is even.
    * Float so the arrays type-match the embeddings for [[graft.functions
    * .Vectors.dot]] (±1.0 is exact in float). */
  private[operators] def planeWeights(n: Int): Seq[(Int, Seq[Float])] =
    (0 until n).map { j =>
      j -> (0 until Dim).map { i =>
        val hex = MessageDigest.getInstance("MD5")
          .digest(s"plane_${j}_$i".getBytes("UTF-8"))
          .take(6).map("%02x".format(_)).mkString
        if (java.lang.Long.parseLong(hex, 16) % 2 == 0) 1.0f else -1.0f
      }
    }


  /** Left-fold dot product of two array columns, all-double — the native
    * codegen expression (bit-identical to the HOF
    * `aggregate(zip_with(...))` fold it replaced; the equivalence is
    * pinned by VectorExpressionsSpec and every similarity oracle hash). */
  private def dot(a: String, b: String): Column =
    graft.functions.Vectors.dot(col(a), col(b))

  /** The oracle-side left-fold dot product — the single source of the
    * bit-exactness contract (Ivf reuses it; keep the folds in one place). */
  private[operators] def duckDotSql(a: String, b: String): String =
    s"list_reduce(list_transform(range(1, len($a)+1), i -> $a[i]::DOUBLE * $b[i]::DOUBLE), (acc, x) -> acc + x)"

  private def duckDot(a: String, b: String): String = duckDotSql(a, b)

  // ---------------------------------------------------------------- q21

  /** Brute-force cosine top-k: 10 probes (vec_id < 10) against all vectors.
    * Probe set broadcast; cosine = dot / sqrt(|a|²·|b|²); k=5 per probe
    * with vec_id tiebreak. */
  def q21CosineTopk(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding"), dot("embedding", "embedding").as("n2"))
    val probes = emb.filter(col("vec_id") < NProbes)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pe"), col("n2").as("pn2"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    emb.crossJoin(broadcast(probes))
      .filter(col("vec_id") =!= col("probe_id"))
      .withColumn("cosine", dot("pe", "embedding") / sqrt(col("pn2") * col("n2")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= K)
      .select(col("probe_id"), col("vec_id"), col("cosine"), col("rn"))
      .orderBy(col("probe_id"), col("rn"))
  }

  def q21Sql: String =
    s"""WITH emb AS (
       |  SELECT vec_id, embedding, ${duckDot("embedding", "embedding")} AS n2 FROM embeddings
       |), probes AS (
       |  SELECT vec_id AS probe_id, embedding AS pe, n2 AS pn2 FROM emb WHERE vec_id < $NProbes
       |), scored AS (
       |  SELECT probe_id, vec_id,
       |    ${duckDot("pe", "embedding")} / sqrt(pn2 * n2) AS cosine
       |  FROM emb, probes WHERE vec_id <> probe_id
       |), ranked AS (
       |  SELECT probe_id, vec_id, cosine,
       |    CAST(row_number() OVER (PARTITION BY probe_id ORDER BY cosine DESC, vec_id) AS INT) AS rn
       |  FROM scored
       |)
       |SELECT probe_id, vec_id, cosine, rn FROM ranked
       |WHERE rn <= $K ORDER BY probe_id, rn""".stripMargin

  // ---------------------------------------------------------------- q28

  /** LSH-bucketed ANN: bucket = sign bits of 4 fixed random hyperplanes;
    * probes meet candidates ONLY inside probed buckets (equi-join on the
    * bucket key — no cross join in the plan), exact cosine re-rank, top-3.
    * Multi-probe: each probe fans out to the buckets within
    * [[ProbeRadius]] sign flips of its own (probe rows × masks — the
    * candidate side never duplicates, each candidate bucket matches
    * exactly one mask). Fewer than 3 neighbors in the probed buckets ⇒
    * fewer rows — the recall/cost trade LSH makes by design, now measured
    * (AnnRecallSpec) instead of implied.
    *
    * The dots here go through the native codegen expression
    * [[graft.functions.Vectors.dot]] (bit-identical to q21's higher-order
    * form — same left fold — but a primitive loop in generated code). */
  def q28LshAnn(s: SparkSession, d: String): DataFrame = {
    import graft.functions.Vectors
    val planes = s.createDataFrame(planeWeights(Planes))
      .toDF("plane_id", "w")
    // emb feeds the bucket aggregate AND the tagged join; tagged feeds the
    // probe side AND the candidate side — both pinned (lazy
    // localCheckpoint, guide §1.2): un-pinned, the scan + 16-plane dot
    // chain executed four times per run. At warehouse scale `tagged` is
    // the persisted LSH index table this inline row stands in for.
    val emb = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding"),
        Vectors.dot(col("embedding"), col("embedding")).as("n2"))
      .localCheckpoint(eager = false)
    val buckets = emb.crossJoin(broadcast(planes))
      .withColumn("bit",
        when(Vectors.dot(col("w"), col("embedding")) > 0,
          expr("shiftleft(1, plane_id)")).otherwise(0))
      .groupBy(col("vec_id")).agg(sum(col("bit")).cast("int").as("bucket"))
    val tagged = emb.join(buckets, Seq("vec_id"))
      .localCheckpoint(eager = false)
    val masks = s.createDataFrame(probeMasks.map(Tuple1(_))).toDF("mask")
    val probes = tagged.filter(col("vec_id") < NProbes)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pe"),
        col("n2").as("pn2"), col("bucket").as("pbucket"))
      .crossJoin(broadcast(masks))
      .withColumn("bucket", expr("int(pbucket ^ mask)"))
      .drop("pbucket", "mask")
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    tagged.join(broadcast(probes), Seq("bucket"))
      .filter(col("vec_id") =!= col("probe_id"))
      .withColumn("cosine",
        Vectors.dot(col("pe"), col("embedding")) / sqrt(col("pn2") * col("n2")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("probe_id"), col("bucket"), col("vec_id"), col("cosine"), col("rn"))
      .orderBy(col("probe_id"), col("rn"))
  }

  def q28Sql: String = {
    val planeRows = planeWeights(Planes).map { case (j, ws) =>
      s"($j, [${ws.mkString(", ")}])"
    }.mkString(",\n    ")
    val maskRows = probeMasks.map(m => s"($m)").mkString(", ")
    s"""WITH planes(plane_id, w) AS (VALUES
       |    $planeRows
       |), masks(m) AS (VALUES $maskRows
       |), emb AS (
       |  SELECT vec_id, embedding, ${duckDot("embedding", "embedding")} AS n2 FROM embeddings
       |), bits AS (
       |  SELECT vec_id,
       |    CASE WHEN ${duckDot("w", "embedding")} > 0 THEN (1 << plane_id) ELSE 0 END AS bit
       |  FROM emb, planes
       |), buckets AS (
       |  SELECT vec_id, CAST(sum(bit) AS INT) AS bucket FROM bits GROUP BY vec_id
       |), tagged AS (
       |  SELECT emb.vec_id, embedding, n2, bucket FROM emb JOIN buckets ON emb.vec_id = buckets.vec_id
       |), probes AS (
       |  SELECT vec_id AS probe_id, pe, pn2, CAST(xor(bucket, m) AS INT) AS bucket FROM (
       |    SELECT vec_id, embedding AS pe, n2 AS pn2, bucket FROM tagged WHERE vec_id < $NProbes) t, masks
       |), scored AS (
       |  SELECT probe_id, t.bucket, t.vec_id,
       |    ${duckDot("pe", "embedding")} / sqrt(pn2 * n2) AS cosine
       |  FROM tagged t JOIN probes p ON t.bucket = p.bucket AND t.vec_id <> p.probe_id
       |), ranked AS (
       |  SELECT probe_id, bucket, vec_id, cosine,
       |    CAST(row_number() OVER (PARTITION BY probe_id ORDER BY cosine DESC, vec_id) AS INT) AS rn
       |  FROM scored
       |)
       |SELECT probe_id, bucket, vec_id, cosine, rn FROM ranked
       |WHERE rn <= 3 ORDER BY probe_id, rn""".stripMargin
  }

  // ---------------------------------------------------------------- q46

  private val NdPlanes = 32   // 8 bands × 4 sign bits
  private val NdBands = 8     // more bands = higher recall at the same
                              // band width: a pair is a candidate if ANY
                              // band's 4 sign bits agree. 4 bands measured
                              // 0.49 pair recall at threshold cosine 0.4
                              // (AnnRecallSpec); 8 bands clear the floor.
  private val NdThreshold = 0.4

  /** Embedding-cosine near-dup PAIRS (the dedup-family member the ANN
    * queries don't cover: all pairs over threshold, not top-k per probe).
    * Banded sign-LSH, the minhash banding recast for vectors: 16 fixed
    * hyperplanes → 4 bands of 4 sign bits; vectors sharing any band key
    * become candidates ([[Dedup.guardedBandPairs]] — same hot-bucket guard,
    * never all-pairs); exact cosine verifies ≥ 0.4. Banding trades recall
    * for never scanning N² — the oracle runs the SAME banding, so the
    * contract is algorithm-exactness, not retrieval recall. */
  /** Banded sign-LSH keys over a (doc_id, embedding) set: [[NdBands]] rows
    * per doc, key = the band's sign-bit slice of the [[NdPlanes]] fixed
    * hyperplanes, as a string (uniform with the minhash band-key state so
    * [[graft.streaming.DedupStream]] runs either method through one state
    * machine). */
  private[graft] def signBands(emb: DataFrame): DataFrame = {
    import graft.functions.Vectors
    val planes = emb.sparkSession
      .createDataFrame(planeWeights(NdPlanes)).toDF("plane_id", "w")
    emb.crossJoin(broadcast(planes))
      .withColumn("bit",
        when(Vectors.dot(col("w"), col("embedding")) > 0,
          expr(s"shiftleft(1, plane_id % ${NdPlanes / NdBands})")).otherwise(0))
      .groupBy(col("doc_id"),
        expr(s"plane_id DIV ${NdPlanes / NdBands}").cast("int").as("band"))
      .agg(sum(col("bit")).cast("int").cast("string").as("key"))
  }

  /** The exact-cosine score the banded candidates verify against — shared
    * by q46 and the incremental stream so both paths are bit-identical. */
  private[graft] val CosineThreshold: Double = NdThreshold

  // Sharing note (r16 optimization round): an interrupted-build commit
  // briefly staged the sign-banded pair chain (and the knn edge list
  // below) in StagedCache so q46/q74/q80/q82 would price one build.
  // REJECTED by measurement — three interleaved TimeQ JVMs at sf0.1, with
  // the untouched q53 as ambient control, put the staged arm 0.5–0.9 s
  // SLOWER per graph query (q74 2.95 vs 2.12/2.33 warm, q82 2.86 vs
  // 1.97/2.37, q80 3.17 vs 2.67/2.58) while the control favored the
  // staged arm's JVM (benchlogs/r16_timeq_graph_{A1,B1,C1}.log): serving
  // the pair table from the columnar cache hands every consumer the
  // producer's partitioning and an InMemoryTableScan where the rebuilt
  // chain runs fused codegen — the same effect the r10 sf10 A/B measured
  // when q54's pair graph was cached (Dedup.minhashPairs scaladoc). The
  // per-query derivation stays; within-query reuse rides the
  // localCheckpoint in guardedBandPairs.

  def q46CosineNeardup(s: SparkSession, d: String): DataFrame = {
    import graft.functions.Vectors
    val emb = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding"),
        Vectors.dot(col("embedding"), col("embedding")).as("n2"))
    val bands = signBands(emb.select(col("vec_id").as("doc_id"), col("embedding")))
    val pairs = Dedup.guardedBandPairs(bands)
      .select(col("doc_a").as("vec_a"), col("doc_b").as("vec_b"))
    pairs
      .join(emb.select(col("vec_id"), col("embedding").as("ea"), col("n2").as("na")),
        col("vec_a") === col("vec_id")).drop("vec_id")
      .join(emb.select(col("vec_id"), col("embedding").as("eb"), col("n2").as("nb")),
        col("vec_b") === col("vec_id")).drop("vec_id")
      .withColumn("cosine", Vectors.dot(col("ea"), col("eb")) / sqrt(col("na") * col("nb")))
      .filter(col("cosine") >= NdThreshold)
      .select(col("vec_a"), col("vec_b"), col("cosine"))
      .orderBy(col("vec_a"), col("vec_b"))
  }

  /** Shared oracle CTE chain: sign-banded candidate pairs over the
    * embeddings table — planes → band keys → hot-guard → `cand`, plus the
    * normed `emb` view. Used by q46 (threshold pairs) and q74 (k-NN
    * graph). */
  private def ndCandCtes: String = {
    val planeRows = planeWeights(NdPlanes).map { case (j, ws) =>
      s"($j, [${ws.mkString(", ")}])"
    }.mkString(",\n    ")
    val bitsPerBand = NdPlanes / NdBands
    s"""WITH planes(plane_id, w) AS (VALUES
       |    $planeRows
       |), emb AS MATERIALIZED (
       |  SELECT vec_id, embedding, ${duckDot("embedding", "embedding")} AS n2 FROM embeddings
       |), bits AS (
       |  SELECT vec_id, plane_id,
       |    CASE WHEN ${duckDot("w", "embedding")} > 0 THEN (1 << (plane_id % $bitsPerBand)) ELSE 0 END AS bit
       |  FROM emb, planes
       |), keys AS (
       |  SELECT vec_id, plane_id // $bitsPerBand AS band, CAST(sum(bit) AS INT) AS key
       |  FROM bits GROUP BY vec_id, plane_id // $bitsPerBand
       |), sized AS (
       |  SELECT band, key, count(*) AS bsize, min(vec_id) AS hub
       |  FROM keys GROUP BY band, key
       |), tagged AS (
       |  SELECT k.vec_id, k.band, k.key, s.bsize, s.hub
       |  FROM keys k JOIN sized s USING (band, key)
       |), cand AS MATERIALIZED (
       |  -- same guard as guardedBandPairs: with only 2^$bitsPerBand keys
       |  -- per band, buckets WILL cross the cap at moderate scale
       |  SELECT DISTINCT vec_a, vec_b FROM (
       |    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
       |    FROM tagged a JOIN tagged b
       |      ON a.band = b.band AND a.key = b.key AND a.vec_id < b.vec_id
       |    WHERE a.bsize <= ${Dedup.HotBucketCap}
       |    UNION ALL
       |    SELECT hub AS vec_a, vec_id AS vec_b
       |    FROM tagged WHERE bsize > ${Dedup.HotBucketCap} AND vec_id <> hub
       |  ) u
       |)""".stripMargin
  }

  def q46Sql: String =
    s"""$ndCandCtes
       |SELECT vec_a, vec_b,
       |  ${duckDot("ea.embedding", "eb.embedding")} / sqrt(ea.n2 * eb.n2) AS cosine
       |FROM cand
       |JOIN emb ea ON ea.vec_id = vec_a
       |JOIN emb eb ON eb.vec_id = vec_b
       |WHERE ${duckDot("ea.embedding", "eb.embedding")} / sqrt(ea.n2 * eb.n2) >= $NdThreshold
       |ORDER BY vec_a, vec_b""".stripMargin

  // ---------------------------------------------------------------- q74

  private[operators] val KnnK = 3

  /** Approximate k-NN GRAPH — each vector's top-[[KnnK]] neighbors among
    * its sign-band candidates, by exact cosine. The graph is the primitive
    * graph-based curation starts from: semantic dedup sharpening (an edge
    * list for the q54 component solver at a higher threshold), diversity
    * sampling (drop a doc whose neighbors are already kept), and kNN label
    * propagation all consume exactly this table. Differs from the ANN
    * queries (q28/q40: top-k for a FEW probes) by being corpus-wide, and
    * from q46 (all pairs over a global threshold) by being per-vector
    * adaptive — an isolated vector keeps its best 3 band-mates even when
    * no cosine clears 0.4.
    *
    * Scale shape: candidates come from the shared guarded band join
    * (never all-pairs; hot buckets hub-linked); symmetrizing doubles a
    * candidate table that is already O(corpus · bounded bucket); the
    * top-k window partitions PER VECTOR — thousands of bounded partitions
    * (≤ bands · cap band-mates each), the q08 shape, no global window.
    * The oracle runs the SAME banding, so the contract is
    * algorithm-exactness, not retrieval recall (recall floors live in
    * AnnRecallSpec). */
  def q74KnnGraph(s: SparkSession, d: String): DataFrame =
    knnEdges(s, d).orderBy(col("vec_id"), col("rn"))

  /** The ranked k-NN edge list q74 serves, un-ordered — the shared graph
    * primitive (q80 label propagation consumes it directly). */
  private[operators] def knnEdges(s: SparkSession, d: String): DataFrame = {
    import graft.functions.Vectors
    val emb = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding"),
        Vectors.dot(col("embedding"), col("embedding")).as("n2"))
    val bands = signBands(emb.select(col("vec_id").as("doc_id"), col("embedding")))
    val pairs = Dedup.guardedBandPairs(bands)
    val sym = pairs.select(col("doc_a").as("v"), col("doc_b").as("nb"))
      .unionByName(pairs.select(col("doc_b").as("v"), col("doc_a").as("nb")))
    val w = Window.partitionBy(col("v"))
      .orderBy(col("cosine").desc, col("nb"))
    sym
      .join(emb.select(col("vec_id"), col("embedding").as("ea"), col("n2").as("na")),
        col("v") === col("vec_id")).drop("vec_id")
      .join(emb.select(col("vec_id"), col("embedding").as("eb"), col("n2").as("nb2")),
        col("nb") === col("vec_id")).drop("vec_id")
      .withColumn("cosine", Vectors.dot(col("ea"), col("eb")) / sqrt(col("na") * col("nb2")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= KnnK)
      .select(col("v").as("vec_id"), col("nb").as("neighbor"),
        col("cosine"), col("rn"))
  }

  /** Oracle CTE chain ending in `knn(vec_id, neighbor)` — the SQL twin of
    * [[knnEdges]] (`ranked` stays in scope for q74's cosine/rn columns).
    * `ranked`/`knn` are MATERIALIZED: the graph consumers (q80's rounds,
    * q82's deg + per-round joins) reference `knn` 4+ times, and DuckDB's
    * per-reference re-inlining re-ran the entire banded-candidate × dot
    * chain each time — the reason q82's sf1 oracle ran ≥1 h while q74's
    * (one reference) finished. */
  private[operators] def knnSqlCtes: String =
    s"""$ndCandCtes, sym AS (
       |  SELECT vec_a AS v, vec_b AS nb FROM cand
       |  UNION ALL
       |  SELECT vec_b AS v, vec_a AS nb FROM cand
       |), scored AS (
       |  SELECT s.v, s.nb,
       |    ${duckDot("ea.embedding", "eb.embedding")} / sqrt(ea.n2 * eb.n2) AS cosine
       |  FROM sym s
       |  JOIN emb ea ON ea.vec_id = s.v
       |  JOIN emb eb ON eb.vec_id = s.nb
       |), ranked AS MATERIALIZED (
       |  SELECT v, nb, cosine,
       |    CAST(row_number() OVER (PARTITION BY v ORDER BY cosine DESC, nb) AS INT) AS rn
       |  FROM scored
       |), knn AS MATERIALIZED (
       |  SELECT v AS vec_id, nb AS neighbor FROM ranked WHERE rn <= $KnnK
       |)""".stripMargin

  def q74Sql: String =
    s"""$knnSqlCtes
       |SELECT v AS vec_id, nb AS neighbor, cosine, rn
       |FROM ranked WHERE rn <= $KnnK ORDER BY vec_id, rn""".stripMargin
}
