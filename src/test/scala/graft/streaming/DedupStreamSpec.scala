package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSession
import graft.operators.Dedup

/** Incremental near-dup at ingest: the union of per-batch pairs over any
  * arrival order must equal the one-shot batch pipeline (q20) on the same
  * corpus; replays are no-ops; a growing spam cluster costs one hub pair
  * per arrival once the bucket is hot. */
class DedupStreamSpec extends AnyFunSuite {
  import TestSession.spark
  import spark.implicits._

  private def corpus = (0 until 30).flatMap { g =>
    (0 until 5).map(i =>
      ((g * 5 + i).toLong, s"group$g alpha$g beta$g gamma$g delta$g"))
  }

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  private def batchExpected(rows: Seq[(Long, String)]): Set[(Long, Long, Double)] = {
    val dir = Files.createTempDirectory("dedup-stream-exp-").toString
    rows.toDF("doc_id", "text").withColumn("lang",
      org.apache.spark.sql.functions.lit("en"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    pairSet(Dedup.q20MinhashNeardup(spark, dir))
  }

  test("accumulated stream pairs equal the one-shot batch q20 pipeline") {
    val st = new StateDir(spark, Files.createTempDirectory("dedup-stream-").toString)
    val ds = new DedupStream(spark, st)
    // interleaved arrival: clone clusters split across three batches
    val batches = corpus.groupBy(_._1 % 3).toSeq.sortBy(_._1).map(_._2)
    batches.zipWithIndex.foreach { case (rows, i) =>
      ds.processBatch(rows.toDF("doc_id", "text"), i.toLong)
    }
    val streamed = pairSet(ds.pairsSnapshot)
    assert(streamed == batchExpected(corpus))
    assert(streamed.nonEmpty)
    // replay of the last batch id changes nothing (T9)
    val before = streamed
    ds.processBatch(batches.last.toDF("doc_id", "text"), (batches.size - 1).toLong)
    assert(pairSet(ds.pairsSnapshot) == before)
    // re-delivery of already-signed docs under a NEW batch id also no-ops
    ds.processBatch(batches.head.toDF("doc_id", "text"), batches.size.toLong)
    assert(pairSet(ds.pairsSnapshot) == before)
  }

  test("hot cluster: one hub pair per arrival after the bucket crosses the cap") {
    val st = new StateDir(spark, Files.createTempDirectory("dedup-hot-").toString)
    val ds = new DedupStream(spark, st, cap = 10)
    val clones = (0 until 50).map(i => (i.toLong, "spam spam spam and more spam"))
    ds.processBatch(clones.take(20).toDF("doc_id", "text"), 0L)
    ds.processBatch(clones.slice(20, 35).toDF("doc_id", "text"), 1L)
    ds.processBatch(clones.drop(35).toDF("doc_id", "text"), 2L)
    val pairs = pairSet(ds.pairsSnapshot)
    // bucket is hot from batch 1 on (20 > 10): every arrival pairs with the
    // hub (doc 0) exactly once — 49 pairs, never C(50,2) = 1225
    assert(pairs.size == 49)
    assert(pairs.forall(p => p._1 == 0L && p._3 == 1.0))
    assert(pairs.map(_._2) == (1L until 50L).toSet)
  }

  test("property: any arrival order and batch split yields the same pair set") {
    val rnd = new scala.util.Random(31)
    val expected = batchExpected(corpus)
    (0 until 2).foreach { round =>
      val st = new StateDir(spark,
        Files.createTempDirectory(s"dedup-perm-$round-").toString)
      val ds = new DedupStream(spark, st)
      val shuffled = rnd.shuffle(corpus.toVector)
      val k = 2 + rnd.nextInt(3)
      val batches = shuffled.grouped((shuffled.size + k - 1) / k).toSeq
      batches.zipWithIndex.foreach { case (rows, i) =>
        ds.processBatch(rows.toDF("doc_id", "text"), i.toLong)
      }
      assert(pairSet(ds.pairsSnapshot) == expected, s"round $round k=$k")
    }
  }

  test("partial-crash replay: batch re-run self-heals whatever subset of writes survived") {
    import DedupStream._
    val stClean = new StateDir(spark, Files.createTempDirectory("dedup-clean-").toString)
    val dsClean = new DedupStream(spark, stClean)
    val stCrash = new StateDir(spark, Files.createTempDirectory("dedup-crash-").toString)
    val dsCrash = new DedupStream(spark, stCrash)
    val (b0, b1) = corpus.splitAt(70)

    dsClean.processBatch(b0.toDF("doc_id", "text"), 0L)
    dsClean.processBatch(b1.toDF("doc_id", "text"), 1L)

    dsCrash.processBatch(b0.toDF("doc_id", "text"), 0L)
    // simulate a crash mid-batch-1: the PAIRS and SIG writes landed, the
    // BANDS/STATS/META writes did not (the reviewed failure scenario — a
    // doc signed but bandless would silently never match again)
    stCrash.write(PairsTable, stClean.read(PairsTable, PairsSchema))
    stCrash.write(SigTable, stClean.read(SigTable, SigSchema))
    // foreachBatch replays batch 1 (meta still says 0)
    dsCrash.processBatch(b1.toDF("doc_id", "text"), 1L)

    def rows(st: StateDir, t: String, s: org.apache.spark.sql.types.StructType) =
      st.read(t, s).collect().map(_.toString).toSet
    for ((t, s) <- Seq((SigTable, SigSchema), (BandsTable, BandsSchema),
        (StatsTable, StatsSchema), (PairsTable, PairsSchema)))
      assert(rows(stCrash, t, s) == rows(stClean, t, s), s"table $t diverged")
    // and future batches behave: a near-dup of a batch-1 doc still matches
    val probe = Seq((9999L, corpus.last._2))
    dsClean.processBatch(probe.toDF("doc_id", "text"), 2L)
    dsCrash.processBatch(probe.toDF("doc_id", "text"), 2L)
    assert(rows(stCrash, PairsTable, PairsSchema) == rows(stClean, PairsTable, PairsSchema))
    assert(pairSet(dsCrash.pairsSnapshot).exists(p => p._2 == 9999L))
  }

  test("legacy state (no batch_id column) upgrades in place, nothing wiped") {
    import DedupStream._
    // build state with the CURRENT code, then strip batch_id to simulate a
    // dir written before the column existed
    val st = new StateDir(spark, Files.createTempDirectory("dedup-legacy-").toString)
    val ds = new DedupStream(spark, st)
    val (b0, b1) = corpus.splitAt(75)
    ds.processBatch(b0.toDF("doc_id", "text"), 0L)
    val schemas = Seq(SigTable -> SigSchema, BandsTable -> BandsSchema,
      StatsTable -> StatsSchema, PairsTable -> PairsSchema)
    for ((t, s) <- schemas)
      st.write(t, st.read(t, s).drop("batch_id"))
    val pairsBefore = st.read(PairsTable, PairsSchema).count()
    assert(pairsBefore > 0)
    // next batch must keep every legacy row and still match against it
    ds.processBatch(b1.toDF("doc_id", "text"), 1L)
    assert(pairSet(ds.pairsSnapshot) == batchExpected(corpus))
  }

  test("streaming wiring: MemoryStream drive matches direct batch drive") {
    val st = new StateDir(spark, Files.createTempDirectory("dedup-ms-").toString)
    val ds = new DedupStream(spark, st)
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val query = ds.start(input.toDF().toDF("doc_id", "text"),
      org.apache.spark.sql.streaming.Trigger.ProcessingTime(0),
      Files.createTempDirectory("dedup-ckpt-").toString)
    input.addData(corpus.take(75))
    query.processAllAvailable()
    input.addData(corpus.drop(75))
    query.processAllAvailable()
    query.stop()
    assert(pairSet(ds.pairsSnapshot) == batchExpected(corpus))
  }
}
