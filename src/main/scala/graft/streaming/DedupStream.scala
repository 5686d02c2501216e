package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

import graft.operators.{Dedup, Similarity}

/** Incremental near-dup — dedup at INGEST time, the shape a training-data
  * pipeline actually runs at 100 TB: records stream in, each micro-batch
  * signs only its NEW docs, probes its band keys against the persisted
  * signature state (one narrow row per doc ever seen), emits the near-dup
  * pairs the batch introduced, and appends its signatures. The dedup
  * family plugs in via [[DedupStream.Method]]: [[DedupStream.Minhash]]
  * (q20 semantics over (doc_id, text)) and [[DedupStream.Cosine]] (q46
  * banded sign-LSH + exact cosine over (doc_id, embedding)) run through
  * the SAME state machine. Per-batch work is O(batch × matching buckets),
  * never O(corpus²); the union of per-batch pairs over any arrival order
  * equals the one-shot batch pipeline ([[Dedup.q20MinhashNeardup]] /
  * [[Similarity.q46CosineNeardup]]) on the same corpus — pinned by
  * DedupStreamSpec and CosineStreamSpec.
  *
  * The hot-bucket guard carries over: STATE buckets over `cap` pair a new
  * doc only with the bucket's hub (the same linear bound as
  * [[Dedup.guardedBandPairs]]), so a spam cluster growing without bound
  * costs one pair per arrival, not |cluster| pairs. Deviation from the
  * batch guard, by construction: pairs emitted BEFORE a bucket crossed the
  * cap are kept, so the incremental output is a superset of the batch
  * guard's hub-only output for that bucket (equal whenever no cap engages).
  *
  * Replay safety (T9): every state row is tagged with the batch id that
  * wrote it, and each read-base filters to rows of STRICTLY EARLIER
  * batches — so a crash between any two of the five table writes replays
  * exactly (the surviving appends are detected by their batch_id rows and
  * skipped; the missing ones are regenerated bit-identically), re-delivered
  * docs dedupe against earlier batches, and the batch-id guard skips
  * fully-committed re-runs. This is the standard idempotent-foreachBatch
  * pattern; a cross-table transaction (the reference's Postgres) is exactly
  * what parquet state lacks.
  *
  * Write I/O per batch is O(batch), not O(corpus): the four data tables
  * publish via [[StateDir.append]] — only this batch's delta rows (new
  * signatures, new band keys, per-bucket count/hub deltas, new pairs) hit
  * disk, and [[StateDir]]'s periodic compaction bounds the read fan-in.
  * The bucket-stats table holds per-batch DELTAS (bsize increments, batch
  * hub), merged on read with sum/min — both associative, so the delta
  * representation is exact. Only the one-row meta table is a full write.
  * DedupStreamDeltaSpec pins bytes-written-per-batch ~flat as the corpus
  * grows across batches.
  *
  * With `trackClusters` the stream ALSO maintains the q54 closure
  * incrementally: per batch, the connected-components fixpoint re-solves
  * only the components touched by the batch's new pairs (prior components
  * enter as label-star edges, diameter ≤ 2), and the label table appends
  * min-merge-on-read deltas — see the block in [[processBatch]].
  * ClusterStreamSpec pins stream ≡ one-shot q54 over arrival orders.
  */
final class DedupStream(
    spark: SparkSession,
    state: StateDir,
    threshold: Double = 0.5,
    cap: Int = Dedup.HotBucketCap,
    method: DedupStream.Method = DedupStream.Minhash,
    trackClusters: Boolean = false) extends Serializable {

  import DedupStream._

  /** The signature state schema of THIS stream's method, plus batch_id. */
  private val sigStateSchema: StructType =
    StructType(method.sigSchema.fields :+ StructField("batch_id", LongType))

  def sigSnapshot: DataFrame = state.read(SigTable, sigStateSchema)
  def pairsSnapshot: DataFrame = state.read(PairsTable, PairsSchema)

  /** Current near-dup cluster labels (requires `trackClusters`): one
    * (v, lbl) row per clustered doc, lbl = component minimum. The state
    * table holds per-batch label DELTAS; labels only ever DECREASE as
    * components merge, so min-on-read is the exact merge — the same
    * associative-merge contract as the bucket-stats deltas. */
  def clustersSnapshot: DataFrame =
    state.read(ClustersTable, ClustersSchema)
      .groupBy(col("v")).agg(min(col("lbl")).as("lbl"))

  /** [[clustersSnapshot]] rolled up to the q54 output shape. */
  def clusterStats: DataFrame =
    clustersSnapshot.groupBy(col("lbl").as("cluster_id"))
      .agg(count(lit(1)).as("n_docs"), max(col("v")).as("max_doc"))

  /** Per-batch body (public: batch tests drive it directly). `docs` needs
    * whatever the method signs: (doc_id long, text string) for Minhash,
    * (doc_id long, embedding array<float>) for Cosine.
    *
    * Incremental invariant: NOTHING here recomputes over the corpus — the
    * band table and per-bucket stats are persisted state, appended/merged
    * per batch. Batch cost is O(new docs + matching-bucket residents +
    * |bucket stats|); the only corpus-sized reads are columnar state scans
    * (bands for the probe join, sig for pair scoring), never the
    * shingle→minhash pipeline. */
  def processBatch(docs: DataFrame, batchId: Long): Unit = {
    val lastBatch = if (state.exists(MetaTable))
      state.read(MetaTable, MetaSchema).first().getLong(0) else -1L
    if (batchId <= lastBatch) return

    // every read-base excludes rows this batch may have partially written
    // before a crash — replay then regenerates them bit-identically.
    // Legacy rows written before the batch_id column existed read as NULL;
    // they are committed-by-definition, so they coalesce to batch -1
    // instead of silently vanishing from every filter.
    def tagged(table: String, schema: StructType): DataFrame =
      state.read(table, schema)
        .withColumn("batch_id", coalesce(col("batch_id"), lit(-1L)))
    val sigPrev = tagged(SigTable, sigStateSchema)
      .filter(col("batch_id") < batchId)
    // idempotent re-delivery: docs signed by EARLIER batches are dropped
    val newSig = method.signature(docs)
      .join(sigPrev.select("doc_id"), Seq("doc_id"), "left_anti")
      .localCheckpoint() // feeds bands, scoring (twice), and the state append
    val newBands = method.bandKeys(newSig).localCheckpoint()

    val bandsPrev = tagged(BandsTable, BandsSchema)
      .filter(col("batch_id") < batchId)
      .select("doc_id", "band", "key")
    // bucket stats are stored as per-batch DELTAS (count increment + batch
    // hub); the current merged view is an aggregate over earlier deltas —
    // sum and min are associative, so merge-on-read is exact.
    val statsDelta = newBands.groupBy(col("band"), col("key"))
      .agg(count(lit(1)).as("bsize"), min(col("doc_id")).as("hub"))
      .localCheckpoint() // feeds the merged view AND the state append
    val statsPrev = tagged(StatsTable, StatsSchema)
      .filter(col("batch_id") < batchId)
      .groupBy(col("band"), col("key"))
      .agg(sum(col("bsize")).as("bsize"), min(col("hub")).as("hub"))
    val stats = statsPrev
      .unionByName(statsDelta)
      .groupBy(col("band"), col("key"))
      .agg(sum(col("bsize")).as("bsize"), min(col("hub")).as("hub"))
      .localCheckpoint()
    // hot buckets carry BOTH the merged hub and the bucket's previous hub:
    // a late arrival with the smallest doc_id ever seen BECOMES the merged
    // hub, and pairing it against itself would orphan it (no pair, despite
    // being a duplicate of everything in the bucket) — it pairs with the
    // previous hub instead.
    val hot = stats.filter(col("bsize") > cap)
      .join(statsPrev.select(col("band"), col("key"), col("hub").as("prev_hub")),
        Seq("band", "key"), "left")

    val newTagged = newBands.join(broadcast(hot), Seq("band", "key"), "left")
    // residents of the probed buckets: state + this batch's other new docs
    val allBands = bandsPrev.unionByName(newBands)
      .join(broadcast(hot.select("band", "key")), Seq("band", "key"), "left_anti")
    // small buckets: new docs probe every resident; hot buckets: hub only
    val candSmall = newTagged.filter(col("hub").isNull).as("n")
      .join(allBands.as("a"),
        col("n.band") === col("a.band") && col("n.key") === col("a.key")
          && col("n.doc_id") =!= col("a.doc_id"))
      .select(least(col("n.doc_id"), col("a.doc_id")).as("doc_a"),
        greatest(col("n.doc_id"), col("a.doc_id")).as("doc_b"))
    val candHot = newTagged
      .filter(col("hub").isNotNull)
      .select(when(col("doc_id") =!= col("hub"), col("hub"))
        .otherwise(col("prev_hub")).as("other"), col("doc_id"))
      .filter(col("other").isNotNull && col("other") =!= col("doc_id"))
      .select(least(col("other"), col("doc_id")).as("doc_a"),
        greatest(col("other"), col("doc_id")).as("doc_b"))
    val allSig = sigPrev.select(newSig.columns.map(col): _*).unionByName(newSig)
    val scored = candSmall.unionByName(candHot).distinct()
      .join(allSig.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(allSig.as("sb"), col("doc_b") === col("sb.doc_id"))
      .withColumn("score", method.score)
      .filter(col("score") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("score"))

    // each data table APPENDS only this batch's delta rows, tagged with the
    // batch id (write I/O O(batch)); a table whose chain already carries
    // this batch's rows survived a crash and is skipped — the recompute is
    // bit-identical, so skipping is exact self-healing.
    val tag = lit(batchId).as("batch_id")
    val pairsPrev = tagged(PairsTable, PairsSchema)
      .filter(col("batch_id") < batchId)
    val newPairs = scored.join(pairsPrev.select("doc_a", "doc_b"),
      Seq("doc_a", "doc_b"), "left_anti").localCheckpoint()
    appendOnce(PairsTable, PairsSchema, batchId, newPairs.select(col("*"), tag))

    if (trackClusters) {
      // Incremental connected components (the q54 closure, at ingest).
      // Only components TOUCHED by this batch's pairs can change, so the
      // CC re-solve is restricted to them: endpoints → their current
      // roots → those roots' members. Prior components enter the graph as
      // (v → label) star edges — diameter ≤ 2, so the fixpoint loop
      // converges in a couple of rounds regardless of corpus size. Labels
      // only decrease (components only grow and the min of a growing set
      // is non-increasing), so the appended delta rows merge on read with
      // min() — exact, associative, O(changed labels) write I/O per batch.
      val prevLbl = tagged(ClustersTable, ClustersSchema)
        .filter(col("batch_id") < batchId)
        .groupBy(col("v")).agg(min(col("lbl")).as("lbl"))
        .localCheckpoint()
      val eps = newPairs.select(col("doc_a").as("v"))
        .unionByName(newPairs.select(col("doc_b").as("v"))).distinct()
      val epRoots = eps.join(prevLbl, Seq("v"), "left")
        .select(coalesce(col("lbl"), col("v")).as("root")).distinct()
      val members = prevLbl
        .join(broadcast(epRoots), prevLbl("lbl") === epRoots("root"))
        .select(col("v"), col("lbl"))
      val graph = newPairs.select(col("doc_a"), col("doc_b"))
        .unionByName(members.select(col("v").as("doc_a"), col("lbl").as("doc_b")))
      val delta = Dedup.connectedComponents(graph)
        .join(prevLbl.withColumnRenamed("lbl", "old"), Seq("v"), "left")
        .filter(col("old").isNull || col("lbl") < col("old"))
        .select(col("v"), col("lbl"))
      appendOnce(ClustersTable, ClustersSchema, batchId, delta.select(col("*"), tag))
    }
    appendOnce(SigTable, sigStateSchema, batchId, newSig.select(col("*"), tag))
    appendOnce(BandsTable, BandsSchema, batchId, newBands.select(col("*"), tag))
    appendOnce(StatsTable, StatsSchema, batchId, statsDelta.select(col("*"), tag))
    state.write(MetaTable,
      spark.createDataFrame(Seq(Tuple1(batchId))).toDF("last_batch"))
  }

  /** Append `delta` unless the table already holds rows of this (or a
    * later) batch — the data-driven idempotency check that makes a replayed
    * foreachBatch re-run skip the appends that survived the crash instead
    * of duplicating them. */
  private def appendOnce(table: String, schema: StructType, batchId: Long,
      delta: DataFrame): Unit = {
    val committed = state.read(table, schema)
      .agg(max(coalesce(col("batch_id"), lit(-1L)))).first().get(0)
    if (committed == null || committed.asInstanceOf[Long] < batchId)
      state.append(table, delta)
  }

  /** Attach to a (doc_id, text) stream. */
  def start(docs: DataFrame, trigger: Trigger,
      checkpoint: String): StreamingQuery = {
    docs.writeStream
      .trigger(trigger)
      .option("checkpointLocation", checkpoint)
      .foreachBatch((df: Dataset[org.apache.spark.sql.Row], id: Long) =>
        processBatch(df.toDF(), id))
      .start()
  }
}

object DedupStream {
  val SigTable = "sig"
  val BandsTable = "bands"
  val StatsTable = "bucket_stats"
  val PairsTable = "neardup_pairs"
  val MetaTable = "dedup_meta"
  val ClustersTable = "cc_labels"

  /** What varies between dedup families, factored out of the state
    * machine: how a doc becomes a narrow signature row, how signatures
    * become (doc_id, band, key) rows, and how a candidate pair is scored
    * from the two signature aliases `sa`/`sb`. Everything else — banding
    * state, hot-bucket guard, batch-id replay, append-mode publish — is
    * method-independent. */
  trait Method extends Serializable {
    /** signature columns, doc_id first (batch_id is appended by the stream) */
    def sigSchema: StructType
    /** input rows → one signature row per doc_id */
    def signature(docs: DataFrame): DataFrame
    /** signature rows → (doc_id, band, key string) rows */
    def bandKeys(sig: DataFrame): DataFrame
    /** pair score over the joined signature aliases sa/sb */
    def score: Column
  }

  /** MinHash over (doc_id, text) — the q20 semantics. */
  object Minhash extends Method {
    val sigSchema: StructType = StructType(
      StructField("doc_id", LongType) +:
        (0 until Dedup.R).map(j => StructField(s"m$j", LongType)))
    def signature(docs: DataFrame): DataFrame = Dedup.signature(docs)
    def bandKeys(sig: DataFrame): DataFrame = Dedup.bandKeys(sig)
    def score: Column = (0 until Dedup.R)
      .map(j => when(col(s"sa.m$j") === col(s"sb.m$j"), 1).otherwise(0))
      .reduce(_ + _) / lit(Dedup.R.toDouble)
  }

  /** Embedding cosine over (doc_id, embedding array<float>) — the q46
    * semantics: banded sign-LSH candidates, exact-cosine scoring. Pair
    * with `threshold = Similarity.CosineThreshold` for q46 equivalence. */
  object Cosine extends Method {
    val sigSchema: StructType = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("embedding", ArrayType(FloatType, containsNull = true)),
      StructField("n2", DoubleType)))
    def signature(docs: DataFrame): DataFrame =
      docs.select(col("doc_id"), col("embedding"),
        graft.functions.Vectors.dot(col("embedding"), col("embedding")).as("n2"))
    def bandKeys(sig: DataFrame): DataFrame =
      Similarity.signBands(sig.select("doc_id", "embedding"))
    def score: Column =
      graft.functions.Vectors.dot(col("sa.embedding"), col("sb.embedding")) /
        sqrt(col("sa.n2") * col("sb.n2"))
  }

  // every state table carries the batch_id that wrote each row — the
  // replay-exactness anchor (see the class scaladoc)
  val SigSchema: StructType = StructType(
    Minhash.sigSchema.fields :+ StructField("batch_id", LongType))

  val BandsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType), StructField("band", IntegerType),
    StructField("key", StringType), StructField("batch_id", LongType)))

  val StatsSchema: StructType = StructType(Seq(
    StructField("band", IntegerType), StructField("key", StringType),
    StructField("bsize", LongType), StructField("hub", LongType),
    StructField("batch_id", LongType)))

  val PairsSchema: StructType = StructType(Seq(
    StructField("doc_a", LongType), StructField("doc_b", LongType),
    StructField("score", DoubleType), StructField("batch_id", LongType)))

  val MetaSchema: StructType = StructType(Seq(StructField("last_batch", LongType)))

  val ClustersSchema: StructType = StructType(Seq(
    StructField("v", LongType), StructField("lbl", LongType),
    StructField("batch_id", LongType)))
}
