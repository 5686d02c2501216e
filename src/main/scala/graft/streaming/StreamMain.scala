package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

import graft.operators.{IvfIndex, LexIndex, PqIndex, Sq8Index}

/** The runnable ingest executable — the engine's analog of the
  * reference's launchable apps (`StreamingApp.scala:555-581`'s
  * `NotSimpleApp.main` and `FileWorkerApp.main`, driven by
  * `run_local.sh`): everything the streaming fabric does in the specs,
  * wired behind one `main` a user can point at a directory or a Kafka
  * topic.
  *
  * Two modes, mirroring the reference's positional-args contract
  * (source, state root, trigger interval — `StreamingApp.scala:561-575`
  * reads topic/dirs/interval positionally):
  *
  * {{{
  * # the LLM-data fabric: docs stream -> BloomGate -> DedupStream +
  * #   LexIndex + TelemetryStream + DriftStream (+ embeddings stream ->
  * #   IvfIndex + PqIndex + Sq8Index when --embeddings is given)
  * runMain graft.streaming.StreamMain docs <docsDir|kafka:host:port/topic> \
  *     <stateRoot> <intervalMs> [--bench <parquet>] \
  *     [--bootstrap <fixtureDir>] [--embeddings <dir>] \
  *     [--retrain-ppm <budget>] [--once]
  *
  * # the reference's chunk pipeline: wire-bytes chunk stream ->
  * #   ChunkIngest (verified binary sink + metadata + work queue + HW)
  * runMain graft.streaming.StreamMain chunks <chunkDir|kafka:host:port/topic> \
  *     <stateRoot> <intervalMs> --case <caseDir> --image-size <bytes> [--once]
  * }}}
  *
  * - `docs` sources: a directory streamed as parquet files of
  *   (doc_id, source, text) rows, or `kafka:<bootstrap>/<topic>` with
  *   the same rows JSON-encoded in `value`. ONE foreachBatch fans each
  *   micro-batch out to every consumer (single source read, one batch-id
  *   sequence, per-consumer replay guards absorb re-drives).
  * - `--bench <parquet>`: decontamination benchmark docs; when present,
  *   arrivals pass through [[BloomGate]] before any state.
  * - `--bootstrap <fixtureDir>`: builds [[LexIndex]] (and with
  *   `--embeddings` the [[IvfIndex]]/[[PqIndex]]/[[Sq8Index]] trio) from this corpus
  *   before streaming — the train-once half of the index lifecycle.
  *   Without it the index legs are skipped (gate/dedup/telemetry/drift
  *   still run; an index cannot ingest before `build`).
  * - `--eval-every <n>`: continuous index-quality monitoring — after
  *   every n-th embeddings batch, one [[EvalStream]] per ANN family
  *   (IVF, PQ, SQ8) measures that family's SERVED recall@k against
  *   exact brute force over the canary probe set — each graded in its
  *   own ranking metric — and appends a ledger tick into the family's
  *   StateDir (tick id = batch id, so the series is replay-idempotent
  *   like every other consumer). The measured, lagging complement of
  *   `--retrain-ppm`'s leading ppm proxy. Requires the index legs
  *   (`--bootstrap` + `--embeddings`).
  * - `--eval-stride <n>`: the canary dial (default
  *   [[graft.Dials.EvalProbeStride]]) — every n-th vec_id is a probe.
  *   RAISE with the corpus to hold |probes| constant: the exact-truth
  *   leg costs |probes|·N scores per tick (measured at sf1 in
  *   BASELINE §eval-cost — the fixture stride left as-is costs ~17 s
  *   per family-tick at 20k vectors; 10× the stride is ~10× cheaper at
  *   the same statistical power).
  * - `--eval-floor <milli>`: the MEASURED retrain loop — after each
  *   eval tick, any family whose latest recall_milli fell below the
  *   floor warm-rebuilds from the `--bootstrap` corpus (per family:
  *   only the degraded index pays a rebuild). Fires on the metric
  *   itself where `--retrain-ppm` fires on the drift proxy; a
  *   deployment typically runs both (leading alarm + lagging
  *   backstop).
  * - `--retrain-ppm <budget>`: the drift→retrain loop, live — after
  *   each docs batch, if [[DriftStream.shouldRetrain]] reports the
  *   largest |Δppm| at/over the budget, every built index family
  *   warm-rebuilds from the `--bootstrap` corpus
  *   ([[graft.operators.AnnIndex.rebuildWarm]]) and the drift baseline
  *   resets (a new measurement epoch). Without it the monitor only
  *   reports; the owner polls `shouldRetrain` out of band.
  * - `--once`: `Trigger.AvailableNow` — process everything present,
  *   checkpoint, and stop gracefully (T7's batch-drain form; the
  *   `chunks` mode additionally stops as soon as the image completes,
  *   the reference's own stop condition, `StreamingApp.scala:524-539`).
  *   Without it, `ProcessingTime(intervalMs)` and run until SIGTERM
  *   (a shutdown hook stops every query at a batch boundary).
  *
  * Exit: prints one JSON summary line (`{"mode":...,"batches":N,...}`)
  * — the Bench/Verify machine-line contract — then returns. */
object StreamMain {

  final case class Config(
      mode: String,
      source: String,
      stateRoot: String,
      intervalMs: Long,
      bench: Option[String] = None,
      bootstrap: Option[String] = None,
      embeddings: Option[String] = None,
      caseDir: Option[String] = None,
      imageSize: Long = 0L,
      once: Boolean = false,
      retrainPpm: Option[Long] = None,
      evalEvery: Long = 0L,
      evalFloor: Option[Long] = None,
      evalStride: Long = graft.Dials.EvalProbeStride,
      // file-source batch granularity (maxFilesPerTrigger): > 0 caps each
      // micro-batch at N files so a multi-file drop replays as multiple
      // batches even under --once; 0 = Spark's default (all available)
      maxFilesPerBatch: Int = 0,
      // --scrub-pii: redact email/IPv4/phone/SSN from admitted text
      // AFTER the bloom gate (which must match raw shingles) but BEFORE
      // any state (PiiScan.scrub — the q111 expression), so fingerprints,
      // indexes, and exports never hold a raw identifier
      scrubPii: Boolean = false)

  val DocsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("source", StringType),
    StructField("text", StringType)))

  val EmbeddingsSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType))))

  def parse(args: Array[String]): Config = {
    require(args.length >= 4,
      "usage: StreamMain <docs|chunks> <source> <stateRoot> <intervalMs> " +
        "[--bench p] [--bootstrap d] [--embeddings d] [--once]")
    var cfg = Config(args(0), args(1), args(2), args(3).toLong)
    var i = 4
    while (i < args.length) {
      args(i) match {
        case "--bench"      => cfg = cfg.copy(bench = Some(args(i + 1))); i += 2
        case "--bootstrap"  => cfg = cfg.copy(bootstrap = Some(args(i + 1))); i += 2
        case "--embeddings" => cfg = cfg.copy(embeddings = Some(args(i + 1))); i += 2
        case "--case"       => cfg = cfg.copy(caseDir = Some(args(i + 1))); i += 2
        case "--image-size" => cfg = cfg.copy(imageSize = args(i + 1).toLong); i += 2
        case "--once"       => cfg = cfg.copy(once = true); i += 1
        case "--retrain-ppm" =>
          cfg = cfg.copy(retrainPpm = Some(args(i + 1).toLong)); i += 2
        case "--eval-every" =>
          cfg = cfg.copy(evalEvery = args(i + 1).toLong); i += 2
        case "--eval-floor" =>
          cfg = cfg.copy(evalFloor = Some(args(i + 1).toLong)); i += 2
        case "--eval-stride" =>
          cfg = cfg.copy(evalStride = args(i + 1).toLong); i += 2
        case "--max-files-per-batch" =>
          cfg = cfg.copy(maxFilesPerBatch = args(i + 1).toInt); i += 2
        case "--scrub-pii" => cfg = cfg.copy(scrubPii = true); i += 1
        case other => throw new IllegalArgumentException(s"unknown arg $other")
      }
    }
    require(cfg.mode == "docs" || cfg.mode == "chunks", s"unknown mode ${cfg.mode}")
    // a privacy flag must never silently no-op: chunks are binary payloads
    // with no text column, so --scrub-pii there would be ignored
    require(!(cfg.scrubPii && cfg.mode == "chunks"),
      "--scrub-pii applies to docs mode only (chunk payloads carry no text)")
    require(cfg.evalStride > 0, s"--eval-stride must be positive (got ${cfg.evalStride})")
    // Eval legs ride the index legs: without bootstrap+embeddings there are
    // no EvalStreams and the flags would silently no-op (eval_ticks:0).
    if (cfg.evalEvery > 0 || cfg.evalFloor.isDefined)
      require(cfg.bootstrap.isDefined && cfg.embeddings.isDefined,
        "--eval-every/--eval-floor require the index legs (--bootstrap and --embeddings)")
    cfg
  }

  def main(args: Array[String]): Unit = {
    val cfg = parse(args)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    // same master dial as Verify/Bench: SPARK_GRAFT_MASTER=local-cluster[...]
    // runs the ingest fabric across real executor processes
    val builder = graft.Tables.configureMaster(SparkSession.builder(), cpus)
      .appName("graft-stream")
      .config("spark.sql.shuffle.partitions", math.min(cpus.toInt, 32))
      .config("spark.ui.enabled", "false")
    graft.Tables.sessionConfigs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try println(run(spark, cfg)) finally spark.stop()
  }

  /** Wire, run (to drain under `--once`, to SIGTERM otherwise), and
    * summarize. Public and session-taking so AppSmokeSpec launches the
    * EXACT production wiring in-process. */
  def run(spark: SparkSession, cfg: Config): String = cfg.mode match {
    case "docs"   => runDocs(spark, cfg)
    case "chunks" => runChunks(spark, cfg)
  }

  private def trigger(cfg: Config): Trigger =
    if (cfg.once) Trigger.AvailableNow()
    else Trigger.ProcessingTime(cfg.intervalMs)

  /** `kafka:<bootstrap>/<topic>` → Some((bootstrap, topic)). */
  private def kafkaSpec(source: String): Option[(String, String)] =
    if (!source.startsWith("kafka:")) None
    else {
      val rest = source.stripPrefix("kafka:")
      val slash = rest.lastIndexOf('/')
      require(slash > 0, s"kafka source must be kafka:<bootstrap>/<topic>: $source")
      Some((rest.substring(0, slash), rest.substring(slash + 1)))
    }

  private def docsStream(spark: SparkSession, source: String,
      maxFilesPerBatch: Int = 0): DataFrame =
    kafkaSpec(source) match {
      case Some((bootstrap, topic)) =>
        spark.readStream.format("kafka")
          .options(Sources.kafkaOptions(bootstrap, topic))
          .load()
          .select(from_json(col("value").cast("string"),
            DocsSchema).as("doc"))
          .select(col("doc.doc_id"), col("doc.source"), col("doc.text"))
          .filter(col("doc_id").isNotNull)
      case None =>
        val r = spark.readStream.schema(DocsSchema)
        (if (maxFilesPerBatch > 0)
           r.option("maxFilesPerTrigger", maxFilesPerBatch)
         else r).parquet(source)
    }

  private def awaitOrDrain(cfg: Config, queries: Seq[StreamingQuery],
      done: () => Boolean): Unit =
    if (cfg.once) queries.foreach(_.awaitTermination())
    else {
      // run until SIGTERM; stop at a batch boundary (graceful T7), or as
      // soon as the pipeline reports completion (chunks: image done)
      val hook = new Thread(() => queries.foreach(q => q.stop()))
      Runtime.getRuntime.addShutdownHook(hook)
      while (queries.exists(_.isActive) && !done())
        Thread.sleep(math.max(50L, cfg.intervalMs / 4))
      queries.filter(_.isActive).foreach(_.stop())
      queries.foreach(_.awaitTermination())
      try Runtime.getRuntime.removeShutdownHook(hook)
      catch { case _: IllegalStateException => () } // already shutting down
    }

  private def runDocs(spark: SparkSession, cfg: Config): String = {
    def st(leg: String) =
      new StateDir(spark, s"${cfg.stateRoot}/$leg")
    def ckpt(leg: String) = s"${cfg.stateRoot}/checkpoints/$leg"

    val bloom = cfg.bench.map(p => BloomGate.build(spark.read.parquet(p)))

    val dedup = new DedupStream(spark, st("dedup"))
    val telemetry = new TelemetryStream(spark, st("telemetry"))
    val drift = new DriftStream(spark, st("drift"))
    val lexIdx = cfg.bootstrap.map { d =>
      val idx = new LexIndex(spark, st("lex"))
      if (!idx.isBuilt) idx.build(d)
      idx
    }
    val lex = lexIdx.map(new IndexStream(spark, _))
    // ANN trio hoisted out of the embeddings-stream scope so the
    // drift→retrain hook below can rebuild every index family
    val annTrio = for (_ <- cfg.embeddings; d <- cfg.bootstrap) yield {
      val ivf = new IvfIndex(spark, st("ivf"))
      if (!ivf.isBuilt) ivf.build(d)
      val pq = new PqIndex(spark, st("pq"))
      if (!pq.isBuilt) pq.build(d)
      val sq = new Sq8Index(spark, st("sq"))
      if (!sq.isBuilt) sq.build(d)
      (ivf, pq, sq)
    }

    val arrivals = docsStream(spark, cfg.source, cfg.maxFilesPerBatch)
    // gate on RAW text, then scrub: the benchmark bloom is built from raw
    // bench docs, so a contaminated passage overlapping a PII span must be
    // matched BEFORE redaction rewrites its shingles (and placeholder
    // tokens must not collide with bloom bits) — while the scrub still
    // precedes every STATE consumer, so dedup fingerprints, indexes,
    // telemetry, and exports never hold a raw identifier
    val rawGated = bloom.fold(arrivals)(b => BloomGate.gate(arrivals, b))
    val gated =
      if (cfg.scrubPii) graft.operators.PiiScan.scrub(rawGated) else rawGated
    var batches = 0L
    var retrains = 0L
    var evalRetrains = 0L
    val docsQuery = gated
      .observe("ingest", count(lit(1)).as("n_docs"))
      .writeStream
      .trigger(trigger(cfg))
      .option("checkpointLocation", ckpt("docs"))
      .foreachBatch { (batch: DataFrame, id: Long) =>
        // one source read per batch: every consumer sees the SAME rows
        val b = batch.persist()
        try {
          dedup.processBatch(b.select("doc_id", "text"), id)
          telemetry.processBatch(b, id)
          drift.processBatch(b.select("doc_id", "text"), id)
          lex.foreach(_.processBatch(b.select("doc_id", "text"), id))
          batches += 1
        } finally { b.unpersist(); () }
        // the drift→retrain loop, closed IN the executable: when the
        // report's largest |Δppm| crosses the declared budget, every
        // index family warm-rebuilds from the authoritative corpus
        // (previous-generation seeds, the fast path), and the drift
        // baseline resets so the absorbed shift doesn't re-fire forever.
        // Rebuild-from-corpus semantics: rows live-ingested since the
        // last build are dropped until re-ingested (DriftRetrainSpec's
        // pinned contract). Index/state locks serialize against any
        // concurrent embeddings batch.
        for (thr <- cfg.retrainPpm; d <- cfg.bootstrap) {
          if (drift.shouldRetrain(thr)) {
            lexIdx.foreach(_.rebuildWarm(d))
            annTrio.foreach { case (ivf, pq, sq) =>
              ivf.rebuildWarm(d); pq.rebuildWarm(d); sq.rebuildWarm(d)
            }
            drift.resetBaseline()
            retrains += 1
          }
        }
      }
      .start()

    // the vector leg: its own arrival stream, its own batch-id sequence;
    // all three ANN families maintained from one source read
    // one monitor per ANN family, each ledgering into its own StateDir
    val evalStreams = annTrio.toSeq.flatMap { case (ivf, pq, sq) =>
      if (cfg.evalEvery > 0)
        Seq(new EvalStream(spark, ivf, cfg.evalStride),
          new EvalStream(spark, pq, cfg.evalStride),
          new EvalStream(spark, sq, cfg.evalStride))
      else Nil
    }
    val vecQuery = annTrio.map { case (ivf, pq, sq) =>
      val ivfIs = new IndexStream(spark, ivf)
      val pqIs = new IndexStream(spark, pq)
      val sqIs = new IndexStream(spark, sq)
      spark.readStream.schema(EmbeddingsSchema)
        .parquet(cfg.embeddings.get)
        .writeStream
        .trigger(trigger(cfg))
        .option("checkpointLocation", ckpt("embeddings"))
        .foreachBatch { (batch: DataFrame, id: Long) =>
          val b = batch.persist()
          try {
            ivfIs.processBatch(b, id)
            pqIs.processBatch(b, id)
            sqIs.processBatch(b, id)
          } finally { b.unpersist(); () }
          // quality tick on the declared cadence: measure every SERVED
          // family (this batch's rows included) against exact ground
          // truth; tick id = batch id makes replays no-ops.
          if (cfg.evalEvery > 0 && id % cfg.evalEvery == 0) {
            evalStreams.foreach(_.evalTick(id))
            // the MEASURED retrain loop: where --retrain-ppm fires on
            // the drift proxy, --eval-floor fires on the metric itself,
            // and PER FAMILY — only the family whose recall actually
            // fell rebuilds (warm, from the authoritative corpus; rows
            // live-ingested since the last build drop until re-ingested
            // — the drift loop's documented rebuild-from-corpus
            // semantics). The next cadence tick records the recovery.
            for (floor <- cfg.evalFloor; d <- cfg.bootstrap)
              evalStreams.foreach { es =>
                if (es.degraded(floor)) {
                  es.index.rebuildWarm(d)
                  evalRetrains += 1
                }
              }
          }
        }
        .start()
    }

    awaitOrDrain(cfg, Seq(docsQuery) ++ vecQuery, () => false)

    val pairs = dedup.pairsSnapshot.count()
    val sources = telemetry.snapshot.count()
    val driftRows = drift.report.count()
    val evalTicks = evalStreams.map(_.report.count()).sum
    s"""{"mode":"docs","batches":$batches,"retrains":$retrains,""" +
      s""""dedup_pairs":$pairs,""" +
      s""""telemetry_sources":$sources,"drift_tokens":$driftRows,""" +
      s""""lex":${lex.nonEmpty},"ann":${vecQuery.nonEmpty},""" +
      s""""eval_ticks":$evalTicks,"eval_retrains":$evalRetrains}"""
  }

  private def runChunks(spark: SparkSession, cfg: Config): String = {
    val caseDir = cfg.caseDir.getOrElse(
      throw new IllegalArgumentException(
        "chunks mode needs --case <dir> with files/layout/fs_info parquet " +
          "(the reference's TSK case-prep tables) and --image-size <bytes>"))
    require(cfg.imageSize > 0, "chunks mode needs --image-size <bytes>")
    val blocks = kafkaSpec(cfg.source) match {
      case Some((bootstrap, topic)) =>
        Sources.kafka(spark, bootstrap, topic)
      case None =>
        // file source standing in for the topic: each file is one chunk's
        // wire bytes (same codec as the Kafka value column). The
        // binaryFile source's schema is fixed but the streaming reader
        // still requires it stated.
        Sources.decodeBlocks(
          spark.readStream.format("binaryFile")
            .schema(StructType(Seq(
              StructField("path", StringType),
              StructField("modificationTime", TimestampType),
              StructField("length", LongType),
              StructField("content", BinaryType))))
            .load(cfg.source)
            .select(col("content").as("value")))
    }
    val ci = new ChunkIngest(spark,
      new StateDir(spark, s"${cfg.stateRoot}/chunks"), cfg.imageSize,
      spark.read.parquet(s"$caseDir/files.parquet"),
      spark.read.parquet(s"$caseDir/layout.parquet"),
      spark.read.parquet(s"$caseDir/fs_info.parquet"),
      chunkSink = Some(s"${cfg.stateRoot}/chunk-sink"))
    val query = ci.start(blocks, trigger(cfg),
      s"${cfg.stateRoot}/checkpoints/chunks")
    awaitOrDrain(cfg, Seq(query), () => ci.isDone)
    val n = ci.chunksSnapshot.count()
    val bad = ci.badChunksSnapshot.count()
    s"""{"mode":"chunks","done":${ci.isDone},"chunks":$n,"bad_chunks":$bad}"""
  }
}
