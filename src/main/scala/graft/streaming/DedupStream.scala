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
  * (q20 semantics over (doc_id, text)), [[DedupStream.Cosine]] (q46
  * banded sign-LSH + exact cosine over (doc_id, embedding)), and
  * [[DedupStream.Winnow]] (q70 passage fingerprints over (doc_id, text))
  * run through the SAME state machine. Per-batch work is O(batch ×
  * matching buckets), never O(corpus²); the union of per-batch pairs over
  * any arrival order equals the one-shot batch pipeline
  * ([[Dedup.q20MinhashNeardup]] / [[Similarity.q46CosineNeardup]] /
  * [[graft.operators.Winnow.q70WinnowPairs]]) on the same corpus — pinned
  * by DedupStreamSpec, CosineStreamSpec, and WinnowStreamSpec.
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
  * incrementally, ROOT-INDIRECTED: each batch contracts its new pairs to
  * edges between component ROOTS ([[contractPairs]]) and solves the
  * fixpoint over those O(batch) edges alone — a merge appends one
  * root→root pointer row, untouched members keep their old pointers, and
  * reads collapse the chains ([[clustersSnapshot]] via
  * [[Dedup.resolveChains]]). One new member of a giant cluster therefore
  * costs O(1) solve input rows, not O(|component|) — pinned by
  * ClusterScaleSpec; ClusterStreamSpec pins stream ≡ one-shot q54 over
  * arrival orders.
  */
final class DedupStream(
    spark: SparkSession,
    state: StateDir,
    threshold: Double = 0.5,
    cap: Int = Dedup.HotBucketCap,
    method: DedupStream.Method = DedupStream.Minhash,
    trackClusters: Boolean = false,
    compactEvery: Int = 0) extends Serializable {

  import DedupStream._

  require(compactEvery == 0 || trackClusters,
    "compactEvery requires trackClusters = true")

  /** The signature state schema of THIS stream's method, plus batch_id. */
  private val sigStateSchema: StructType =
    StructType(method.sigSchema.fields :+ StructField("batch_id", LongType))

  def sigSnapshot: DataFrame = state.read(SigTable, sigStateSchema)
  def pairsSnapshot: DataFrame = state.read(PairsTable, PairsSchema)

  /** Current near-dup cluster labels (requires `trackClusters`): one
    * (v, lbl) row per clustered doc, lbl = component minimum. The state
    * table holds per-batch POINTER deltas forming a root-indirected
    * forest: a member row points at the root its component had when the
    * member was last touched, and a root that later merges appends ONE
    * root→root row instead of relabeling its members. Reads min-merge the
    * appended pointers per v (pointers only ever DECREASE, so min-on-read
    * is the exact latest — the same associative-merge contract as the
    * bucket-stats deltas) and then collapse the pointer chains
    * ([[Dedup.resolveChains]], O(log chain) rounds). */
  def clustersSnapshot: DataFrame =
    Dedup.resolveChains(
      state.read(ClustersTable, ClustersSchema)
        .groupBy(col("v")).agg(min(col("lbl")).as("lbl")))

  /** [[clustersSnapshot]] rolled up to the q54 output shape. */
  def clusterStats: DataFrame =
    clustersSnapshot.groupBy(col("lbl").as("cluster_id"))
      .agg(count(lit(1)).as("n_docs"), max(col("v")).as("max_doc"))

  /** Publish this stream's incrementally-maintained labels as the serving
    * source for batch consumers of `corpusDir`: [[Dedup.clusterLabels]]
    * (the q56 drop list) reads [[clustersSnapshot]] instead of re-solving
    * the fixpoint — ingest maintains, batch serves. Call
    * [[Dedup.stopServingClusters]] when the stream stops owning the
    * corpus. */
  def publishClusters(corpusDir: String): Unit = {
    require(trackClusters, "publishClusters requires trackClusters = true")
    Dedup.serveClustersFrom(spark, corpusDir)(() => clustersSnapshot)
  }

  /** Compact the cluster state: resolve every stored pointer chain ONCE
    * and rewrite `cc_labels` as the flat (v → component min) table — the
    * lazy member-rewrite deferred from the per-batch path to the
    * compaction cadence (run it with [[StateDir]] compaction). Afterwards
    * reads are a min-merge plus a single no-op resolve round, and the
    * root chains reset to length ≤ 1 for every doc seen so far.
    *
    * Crash-safe: only rows of COMMITTED batches (batch_id ≤ meta) are
    * folded; rows a mid-flight batch appended before a crash are carried
    * through untouched, so its replay still sees exactly the pre-crash
    * state and self-heals as usual. The rewrite publishes via the
    * StateDir's atomic versioned swap. */
  def compactClusters(): Unit = {
    require(trackClusters, "compactClusters requires trackClusters = true")
    val lastBatch = if (state.exists(MetaTable))
      state.read(MetaTable, MetaSchema).first().getLong(0) else -1L
    val all = state.read(ClustersTable, ClustersSchema)
      .withColumn("batch_id", coalesce(col("batch_id"), lit(-1L)))
    val resolved = Dedup.resolveChains(
        all.filter(col("batch_id") <= lastBatch)
          .groupBy(col("v")).agg(min(col("lbl")).as("lbl")))
      .withColumn("batch_id", lit(lastBatch))
    state.write(ClustersTable, resolved
      .unionByName(all.filter(col("batch_id") > lastBatch))
      .select(col("v"), col("lbl"), col("batch_id")))
  }

  /** Per-batch body (public: batch tests drive it directly). `docs` needs
    * whatever the method signs: (doc_id long, text string) for Minhash
    * and Winnow, (doc_id long, embedding array<float>) for Cosine.
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
      // Incremental connected components (the q54 closure, at ingest),
      // ROOT-INDIRECTED: the solve input is the batch's pairs CONTRACTED
      // to their components' roots — O(batch) edges regardless of how big
      // the touched components are (one new member of a 10⁸-doc cluster
      // costs one contracted edge, never 10⁸ member rows; pinned by
      // ClusterScaleSpec). A merge appends one root→root pointer row; the
      // untouched members keep their old pointers and reads resolve the
      // chains ([[clustersSnapshot]]). Pointers only decrease, so the
      // appended deltas merge on read with min() — exact, associative,
      // O(batch) write I/O per batch.
      val oneHop = tagged(ClustersTable, ClustersSchema)
        .filter(col("batch_id") < batchId)
        .groupBy(col("v")).agg(min(col("lbl")).as("lbl"))
        .localCheckpoint()
      val (resolved, trail, rootEdges) = contractPairs(newPairs, oneHop)
      // fixpoint over contracted roots + brand-new vertices only
      val solved = Dedup.connectedComponents(rootEdges)
        .localCheckpoint(true)
      // f(v) = post-merge final root of each endpoint
      val fr = resolved.join(
          solved.select(col("v").as("node"), col("lbl").as("slbl")),
          resolved("root") === col("node"), "left")
        .select(resolved("v"), col("known"), col("first"),
          coalesce(col("slbl"), col("root")).as("f"))
        .localCheckpoint(true)
      val delta =
        // merged roots and new non-minimum vertices: (node → component min)
        solved.filter(col("lbl") < col("v")).select(col("v"), col("lbl"))
          // a brand-new vertex that IS its component's minimum anchors the
          // component with a self-row (existing roots already have theirs)
          .unionByName(fr.filter(!col("known") && col("f") === col("v"))
            .select(col("v"), col("f").as("lbl")))
          // path compression: endpoints whose stored pointer was stale
          // point directly at the final root from now on
          .unionByName(fr.filter(col("known") && col("f") < col("first"))
            .select(col("v"), col("f").as("lbl")))
          // ...and so do the intermediate roots walked on their chains
          .unionByName(trail.join(fr.select(col("v"), col("f")), Seq("v"))
            .filter(col("f") < col("node"))
            .select(col("node").as("v"), col("f").as("lbl")))
          .distinct()
      appendOnce(ClustersTable, ClustersSchema, batchId, delta.select(col("*"), tag))
    }
    appendOnce(SigTable, sigStateSchema, batchId, newSig.select(col("*"), tag))
    appendOnce(BandsTable, BandsSchema, batchId, newBands.select(col("*"), tag))
    appendOnce(StatsTable, StatsSchema, batchId, statsDelta.select(col("*"), tag))
    state.write(MetaTable,
      spark.createDataFrame(Seq(Tuple1(batchId))).toDF("last_batch"))
    // self-compacting cadence: after every Nth committed batch, fold the
    // pointer chains flat (runs AFTER the meta write, so a crash inside
    // the compaction leaves a fully-committed batch + the old chains —
    // replay-safe by construction)
    if (compactEvery > 0 && (batchId + 1) % compactEvery == 0)
      compactClusters()
  }

  /** Contract a batch's pairs to ROOT edges against the stored pointer
    * forest. Walks each distinct endpoint's pointer chain to its current
    * root (a loop of keyed joins over the SMALL endpoint frontier — the
    * corpus-sized pointer table is only ever the build side of a lookup,
    * never solve input), then rewrites each pair as an edge between the
    * two roots, dropping pairs that land inside one component.
    *
    * Chain walks are short by amortization: every walk appends compression
    * rows for the endpoint AND each intermediate root it stepped through
    * (the `trail`), so a chain is paid once and collapsed — the classic
    * union-find path-compression argument.
    *
    * Returns (resolved endpoints (v, known, first, root), trail rows
    * (v, node) of intermediate chain nodes, contracted root edges). */
  private[streaming] def contractPairs(newPairs: DataFrame,
      oneHop: DataFrame): (DataFrame, DataFrame, DataFrame) = {
    val eps = newPairs.select(col("doc_a").as("v"))
      .unionByName(newPairs.select(col("doc_b").as("v"))).distinct()
    var resolved = eps.join(oneHop, Seq("v"), "left")
      .select(col("v"), col("lbl").isNotNull.as("known"),
        coalesce(col("lbl"), col("v")).as("first"),
        coalesce(col("lbl"), col("v")).as("root"))
      .localCheckpoint(true)
    val spark = newPairs.sparkSession
    var trails = List.empty[DataFrame]
    var moved = 1L
    var hops = 0
    while (moved > 0 && hops < 1024) { // rail: pointers strictly decrease, so a
      val step = resolved.join(        // long walk is a bug, not a big corpus
          oneHop.select(col("v").as("p"), col("lbl").as("plbl")),
          resolved("root") === col("p"), "left")
        .select(resolved("v"), col("known"), col("first"),
          resolved("root").as("prev"),
          coalesce(col("plbl"), resolved("root")).as("root"))
        .localCheckpoint(true)
      moved = step.filter(col("root") =!= col("prev")).count()
      if (moved > 0)
        trails ::= step.filter(col("root") =!= col("prev"))
          .select(col("v"), col("prev").as("node"))
      resolved = step.select(col("v"), col("known"), col("first"), col("root"))
      hops += 1
    }
    if (moved > 0)
      throw new IllegalStateException(
        s"pointer chain walk did not terminate in $hops hops (cycle in cc_labels?)")
    val trail = trails.reduceOption(_ unionByName _).getOrElse {
      import spark.implicits._
      Seq.empty[(Long, Long)].toDF("v", "node")
    }
    val roots = resolved.select(col("v"), col("root"))
    val rootEdges = newPairs.select(col("doc_a"), col("doc_b"))
      .join(roots.select(col("v").as("doc_a"), col("root").as("ra")), Seq("doc_a"))
      .join(roots.select(col("v").as("doc_b"), col("root").as("rb")), Seq("doc_b"))
      .filter(col("ra") =!= col("rb"))
      .select(col("ra").as("doc_a"), col("rb").as("doc_b"))
      .distinct()
    (resolved, trail, rootEdges)
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

  /** Winnowing passage fingerprints over (doc_id, text) — the q70
    * semantics at ingest: every fingerprint is its own band key (sharing
    * a bucket ≡ sharing a fingerprint), and the score is the
    * shared-fingerprint count |fps_a ∩ fps_b|. Pair with `threshold =
    * Winnow.MinShared` for q70 pair equivalence — which holds exactly
    * while no fingerprint appears in more than [[graft.operators.Winnow.FpCap]]
    * docs: beyond the cap the batch operator DROPS the fingerprint as
    * boilerplate (df-cap), while the stream's hot-bucket hub guard LINKS
    * through a hub instead. Both bound the quadratic term; they diverge
    * on which pairs survive a super-cap fingerprint. WinnowStreamSpec
    * pins equality below the cap (fixture scale never triggers it). */
  object Winnow extends Method {
    val sigSchema: StructType = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("fps", ArrayType(LongType, containsNull = true))))
    def signature(docs: DataFrame): DataFrame =
      graft.operators.Winnow.fingerprintArrays(docs)
    def bandKeys(sig: DataFrame): DataFrame =
      sig.select(col("doc_id"), explode(col("fps")).as("fp"))
        .select(col("doc_id"), lit(0).as("band"),
          col("fp").cast("string").as("key"))
    def score: Column =
      size(array_intersect(col("sa.fps"), col("sb.fps"))).cast("double")
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
