package graft.streaming

import java.nio.file.{Files, Paths}
import java.security.MessageDigest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSession
import graft.operators.{Decontamination, Dedup, Drift, IvfIndex, LexIndex,
  PqIndex, Retrieval, Sq8Index, Telemetry}

/** The runnable app end-to-end: [[StreamMain.run]] (the exact wiring
  * `main` launches, minus only the session construction) pointed at
  * fixture-derived source directories, run to drain with `--once`
  * semantics, then every served surface compared to its one-shot batch
  * twin. Also pins the restart contract: a second `run` over the same
  * state root picks up only NEW source files (the checkpoint carries
  * the offset) and extends the same state. This is the spec-form of the
  * reference's `run_local.sh` launch (`StreamingApp.scala:555-581`). */
class AppSmokeSpec extends AnyFunSuite {
  import TestSession.spark
  import spark.implicits._

  private val sf = TestSession.sf

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  test("docs mode: gate -> {dedup, telemetry, drift, lex} + ANN leg == batch twins; restart continues") {
    val docs = graft.Tables.documents(spark, sf)
    val bench = docs.filter(col("doc_id") < Decontamination.BenchDocs)
    val benchPath = tmp("app-bench-")
    bench.write.mode("overwrite").parquet(benchPath)

    // bootstrap fixture dir: the indexes' train-once corpus — bench docs
    // for the lexical leg, the full embedding base for the ANN legs
    val bootstrapDir = tmp("app-boot-")
    bench.write.parquet(s"$bootstrapDir/documents.parquet")
    graft.Tables.embeddings(spark, sf)
      .write.parquet(s"$bootstrapDir/embeddings.parquet")

    val corpus = docs.filter(col("doc_id") >= Decontamination.BenchDocs)
      .select("doc_id", "source", "text")
    val srcDir = tmp("app-src-")
    val embDir = tmp("app-emb-")
    val stateRoot = tmp("app-state-")
    val clones = graft.Tables.embeddings(spark, sf)
      .filter(col("vec_id").between(490L, 499L))
      .select((col("vec_id") + 9510L).as("vec_id"), col("embedding"))

    def cfg = StreamMain.Config("docs", srcDir, stateRoot, 0L,
      bench = Some(benchPath), bootstrap = Some(bootstrapDir),
      embeddings = Some(embDir), once = true, evalEvery = 1L)

    // installment 1: even docs, first half of the clone vectors
    corpus.filter(col("doc_id") % 2 === 0).write.mode("append").parquet(srcDir)
    clones.filter(col("vec_id") < 10005L).write.mode("append").parquet(embDir)
    val summary1 = StreamMain.run(spark, cfg)
    assert(summary1.contains("\"mode\":\"docs\"") &&
      summary1.contains("\"lex\":true") && summary1.contains("\"ann\":true"))
    assert(!summary1.contains("\"eval_ticks\":0"),
      s"--eval-every 1 must have appended quality ticks: $summary1")

    // installment 2 arrives later; a RESTARTED run continues from the
    // checkpoint — only the new files feed the (already-built) state
    corpus.filter(col("doc_id") % 2 =!= 0).write.mode("append").parquet(srcDir)
    clones.filter(col("vec_id") >= 10005L).write.mode("append").parquet(embDir)
    StreamMain.run(spark, cfg)

    // ---- batch twins over the gate-surviving corpus
    val bloom = BloomGate.build(bench)
    val gated = BloomGate.gate(corpus, bloom)

    val expectedPairs = Dedup.minhashPairsOf(gated.select("doc_id", "text"))
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val gotPairs = new DedupStream(spark,
        new StateDir(spark, s"$stateRoot/dedup"))
      .pairsSnapshot.select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(gotPairs == expectedPairs, "app dedup state != batch twin")

    val expectedTelemetry = Telemetry.estimates(
        Telemetry.mergeSketches(Telemetry.sourceSketches(gated)))
      .select("source", "n_docs", "n_tokens").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val gotTelemetry = new TelemetryStream(spark,
        new StateDir(spark, s"$stateRoot/telemetry"))
      .snapshot.select("source", "n_docs", "n_tokens").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(gotTelemetry == expectedTelemetry, "app telemetry != batch twin")

    val expectedDrift = Drift.reportFrom(
        gated.select((col("doc_id") % 2).as("half"),
            explode(split(col("text"), " ")).as("tok"))
          .groupBy("half", "tok").agg(count(lit(1)).as("cnt")))
      .collect().map(_.toSeq).toSeq
    val gotDrift = new DriftStream(spark,
        new StateDir(spark, s"$stateRoot/drift"))
      .report.collect().map(_.toSeq).toSeq
    assert(gotDrift == expectedDrift, "app drift report != batch twin")

    // lexical leg: the app's persisted index == build(bootstrap) + one
    // addBatch of the whole gated corpus (delta statistics are additive,
    // so any batch split serves bit-identically)
    val lexTwin = new LexIndex(spark, new StateDir(spark, tmp("app-lex-twin-")))
    lexTwin.build(bootstrapDir)
    lexTwin.addBatch(gated.select("doc_id", "text"))
    val expectedLex = lexTwin.query(0L, Retrieval.NQueries.toLong)
      .collect().map(_.toSeq).toSeq
    val appLex = new LexIndex(spark, new StateDir(spark, s"$stateRoot/lex"))
    assert(appLex.isBuilt && appLex.hasBatch(0L))
    assert(appLex.query(0L, Retrieval.NQueries.toLong)
      .collect().map(_.toSeq).toSeq == expectedLex,
      "app lex index != batch twin")

    // ANN legs: both families serve the clone probes exactly like a
    // one-shot addBatch twin over the same new vectors
    val ivfTwin = new IvfIndex(spark, new StateDir(spark, tmp("app-ivf-twin-")))
    ivfTwin.build(bootstrapDir)
    ivfTwin.addBatch(clones)
    val appIvf = new IvfIndex(spark, new StateDir(spark, s"$stateRoot/ivf"))
    assert(appIvf.isBuilt)
    assert(appIvf.query(10000L, 10L).collect().map(_.toSeq).toSeq ==
      ivfTwin.query(10000L, 10L).collect().map(_.toSeq).toSeq,
      "app ivf index != batch twin")

    val pqTwin = new PqIndex(spark, new StateDir(spark, tmp("app-pq-twin-")))
    pqTwin.build(bootstrapDir)
    pqTwin.addBatch(clones)
    val appPq = new PqIndex(spark, new StateDir(spark, s"$stateRoot/pq"))
    assert(appPq.isBuilt)
    assert(appPq.query(10000L, 10L).collect().map(_.toSeq).toSeq ==
      pqTwin.query(10000L, 10L).collect().map(_.toSeq).toSeq,
      "app pq index != batch twin")
  }

  test("docs mode --retrain-ppm: drift crossing warm-rebuilds every index live") {
    val docs = graft.Tables.documents(spark, sf)
    val bootstrapDir = tmp("rt-boot-")
    docs.filter(col("doc_id") < 100)
      .write.parquet(s"$bootstrapDir/documents.parquet")
    graft.Tables.embeddings(spark, sf)
      .write.parquet(s"$bootstrapDir/embeddings.parquet")

    val srcDir = tmp("rt-src-")
    val embDir = tmp("rt-emb-")
    val stateRoot = tmp("rt-state-")
    val clones = graft.Tables.embeddings(spark, sf)
      .filter(col("vec_id").between(490L, 499L))
      .select((col("vec_id") + 9510L).as("vec_id"), col("embedding"))

    def cfg(ppm: Long) = StreamMain.Config("docs", srcDir, stateRoot, 0L,
      bootstrap = Some(bootstrapDir), embeddings = Some(embDir),
      once = true, retrainPpm = Some(ppm))

    // epoch 0: the balanced corpus + live clone ingest, with the budget
    // far above ambient — no retrain fires, the clones serve
    docs.filter(col("doc_id") >= 100).select("doc_id", "source", "text")
      .write.mode("append").parquet(srcDir)
    clones.write.mode("append").parquet(embDir)
    val s1 = StreamMain.run(spark, cfg(1000000L))
    assert(s1.contains("\"retrains\":0"), s1)
    val appIvf = new IvfIndex(spark, new StateDir(spark, s"$stateRoot/ivf"))
    assert(appIvf.query(10000L, 10L).count() > 0, "clones must serve pre-retrain")

    // the budget for epoch 1 sits just above the measured ambient drift
    val drift = new DriftStream(spark, new StateDir(spark, s"$stateRoot/drift"))
    val ambient = drift.report.limit(1).collect()
      .headOption.map(r => math.abs(r.getAs[Long]("delta_ppm"))).getOrElse(0L)

    // epoch 1: a skewed snapshot (odd half hammers one token) crosses
    // the budget → the app warm-rebuilds lex + all three ANN families
    // and resets the drift baseline
    (0 until 50).map(i => (200001L + 2 * i, "skew",
        Seq.fill(40)("driftTokenXq").mkString(" ")))
      .toDF("doc_id", "source", "text")
      .write.mode("append").parquet(srcDir)
    val s2 = StreamMain.run(spark, cfg(ambient + 1))
    assert(!s2.contains("\"retrains\":0"), s"retrain must fire: $s2")

    // rebuild-from-authoritative-corpus: the live-ingested clones are
    // gone until re-ingested; the index itself serves (built epoch)
    assert(appIvf.isBuilt)
    assert(appIvf.query(10000L, 10L).isEmpty,
      "warm rebuild must drop live-ingested rows")
    assert(appIvf.query(490L, 10L).count() > 0, "rebuilt index must serve")
    val appPq = new PqIndex(spark, new StateDir(spark, s"$stateRoot/pq"))
    assert(appPq.isBuilt && appPq.query(490L, 10L).count() > 0)
    val appSq = new Sq8Index(spark, new StateDir(spark, s"$stateRoot/sq"))
    assert(appSq.isBuilt && appSq.query(490L, 10L).count() > 0)
    val appLex = new LexIndex(spark, new StateDir(spark, s"$stateRoot/lex"))
    assert(appLex.isBuilt &&
      appLex.query(0L, Retrieval.NQueries.toLong).count() > 0)
    // the baseline reset: the crossed threshold must not re-fire on the
    // next (benign) batch
    docs.filter(col("doc_id") >= 100 && col("doc_id") < 120)
      .select((col("doc_id") + 300000L).as("doc_id"), col("source"), col("text"))
      .write.mode("append").parquet(srcDir)
    val s3 = StreamMain.run(spark, cfg(ambient + 1))
    assert(s3.contains("\"retrains\":0"),
      s"absorbed drift must not re-fire after the baseline reset: $s3")
  }

  test("docs mode --eval-floor: the measured retrain loop fires per family") {
    val docs = graft.Tables.documents(spark, sf)
    val bootstrapDir = tmp("ef-boot-")
    docs.filter(col("doc_id") < 100)
      .write.parquet(s"$bootstrapDir/documents.parquet")
    graft.Tables.embeddings(spark, sf)
      .write.parquet(s"$bootstrapDir/embeddings.parquet")
    val srcDir = tmp("ef-src-")
    val embDir = tmp("ef-emb-")
    val stateRoot = tmp("ef-state-")
    docs.filter(col("doc_id") >= 100).select("doc_id", "source", "text")
      .write.mode("append").parquet(srcDir)
    val clones = graft.Tables.embeddings(spark, sf)
      .filter(col("vec_id").between(490L, 499L))
      .select((col("vec_id") + 9510L).as("vec_id"), col("embedding"))
    clones.write.mode("append").parquet(embDir)

    def cfg(floor: Option[Long]) = StreamMain.Config("docs", srcDir,
      stateRoot, 0L, bootstrap = Some(bootstrapDir),
      embeddings = Some(embDir), once = true, evalEvery = 1L,
      evalFloor = floor)

    // floor 0: no recall can fall below it — ticks land, nothing fires
    val s1 = StreamMain.run(spark, cfg(Some(0L)))
    assert(s1.contains("\"eval_retrains\":0"), s1)
    assert(!s1.contains("\"eval_ticks\":0"), s1)
    val appIvf = new IvfIndex(spark, new StateDir(spark, s"$stateRoot/ivf"))
    assert(appIvf.query(10000L, 10L).count() > 0, "clones must serve (no rebuild)")

    // floor 1001: recall_milli <= 1000 by construction, so EVERY family's
    // latest tick reads degraded — the loop must rebuild all three (the
    // impossible floor is the spec's forcing device; a deployment sets a
    // floor below healthy recall, and only a genuinely degraded family
    // rebuilds). A fresh embeddings file drives the one new batch whose
    // tick the floor check reads.
    docs.filter(col("doc_id") >= 100 && col("doc_id") < 110)
      .select((col("doc_id") + 500000L).as("doc_id"), col("source"), col("text"))
      .write.mode("append").parquet(srcDir)
    graft.Tables.embeddings(spark, sf)
      .filter(col("vec_id").between(480L, 489L))
      .select((col("vec_id") + 19520L).as("vec_id"), col("embedding"))
      .coalesce(1).write.mode("append").parquet(embDir)
    val s2 = StreamMain.run(spark, cfg(Some(1001L)))
    assert(s2.contains("\"eval_retrains\":3"), s"all three families rebuild: $s2")
    // rebuild-from-authoritative-corpus semantics, same as --retrain-ppm
    assert(appIvf.isBuilt && appIvf.query(10000L, 10L).isEmpty,
      "eval-floor rebuild must drop live-ingested rows")
    assert(appIvf.query(490L, 10L).count() > 0, "rebuilt index must serve")
  }

  test("chunks mode: wire-bytes files -> ChunkIngest to completion (T7)") {
    // the ChunkIngestSpec fixture: 8 chunks sized 10..80 (image 360),
    // synthetic TSK tables (FIXTURES.md §2) as the --case parquet dir
    def md5hex(b: Array[Byte]) =
      MessageDigest.getInstance("MD5").digest(b).map("%02x".format(_)).mkString
    val sizes = (1 to 8).map(_ * 10)
    def chunk(seq: Int): ImageBlock = {
      val data = Array.fill(sizes(seq))(seq.toByte)
      ImageBlock(s"img.dd.$seq", md5hex(data), data)
    }
    val caseDir = tmp("app-case-")
    Seq((1L, 100L, "$MFT", "/", 5), (2L, 100L, "fileA", "/", 5),
      (3L, 100L, "fileB", "/", 5), (4L, 100L, "fileC", "/", 5),
      (5L, 100L, "fileD", "/", 5), (6L, 100L, "$Boot", "/", 5),
      (7L, 100L, "somedir", "/", 3), (8L, 100L, "resident1", "/", 5),
      (9L, 100L, "residentdir", "/", 3))
      .toDF("obj_id", "fs_obj_id", "name", "parent_path", "dir_type")
      .write.parquet(s"$caseDir/files.parquet")
    Seq((1L, 0L, 30L), (2L, 30L, 29L), (3L, 60L, 90L), (4L, 150L, 150L),
      (5L, 300L, 55L), (6L, 0L, 10L), (7L, 0L, 5L))
      .toDF("obj_id", "byte_start", "byte_len")
      .write.parquet(s"$caseDir/layout.parquet")
    Seq((100L, 0L)).toDF("obj_id", "img_offset")
      .write.parquet(s"$caseDir/fs_info.parquet")

    val srcDir = tmp("app-chunks-")
    (0 until 8).foreach { i =>
      Files.write(Paths.get(srcDir, f"chunk$i%02d.bin"),
        ImageBlockCodec.encode(chunk(i)))
    }
    val stateRoot = tmp("app-chunk-state-")
    val summary = StreamMain.run(spark, StreamMain.Config(
      "chunks", srcDir, stateRoot, 0L,
      caseDir = Some(caseDir), imageSize = 360L, once = true))
    assert(summary.contains("\"done\":true"), s"image not completed: $summary")
    assert(summary.contains("\"chunks\":8"), s"chunk rows wrong: $summary")
  }
}
