package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSession
import graft.operators.PiiScan

/** The `--scrub-pii` ingest stage: [[PiiScan.scrub]] is a stateless
  * per-row projection, so the streamed scrub must equal the batch scrub
  * for EVERY batch split, null text must survive (the BloomGate null
  * admission law — a scrub that nulls or drops rows would silently starve
  * downstream state), and scrubbed output must re-scan to zero PII.
  */
class PiiScrubSpec extends AnyFunSuite {
  import TestSession.spark
  import spark.implicits._

  private val rows: Seq[(Long, String)] = Seq(
    1L -> "reach me at eve.42@mail7.example.com or +1-555-0099 thanks",
    2L -> "server 10.1.2.3 fell over, failover 172.16.0.9 took it",
    3L -> "ssn on file 321-54-9876 ver 2.0.1 build-1234",
    4L -> "nothing sensitive here at all",
    5L -> (null: String))

  test("streamed scrub == batch scrub on every batch split; nulls survive") {
    val batchDf = rows.toDF("doc_id", "text")
    val expected = PiiScan.scrub(batchDf)
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap

    // explicit batch plans: 1, 2 (3+2), and 5 single-row micro-batches
    val batchPlans: Seq[Seq[Seq[(Long, String)]]] = Seq(
      Seq(rows),
      Seq(rows.take(3), rows.drop(3)),
      rows.map(Seq(_)))
    batchPlans.zipWithIndex.foreach { case (batches, i) =>
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[(Long, String)]
      val q = PiiScan.scrub(input.toDF().toDF("doc_id", "text"))
        .writeStream.format("memory").queryName(s"pii_scrub_$i")
        .outputMode("append").start()
      try {
        batches.foreach { b =>
          input.addData(b)
          q.processAllAvailable()
        }
        val got = spark.table(s"pii_scrub_$i")
          .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
        assert(got == expected, s"batches=${batches.length}")
      } finally q.stop()
    }
    assert(expected(5L).isEmpty, "null text must stay null through the scrub")
    assert(expected(4L).contains("nothing sensitive here at all"))
  }

  test("scrubbed stream output carries zero detectable PII") {
    val scrubbed = PiiScan.scrub(rows.toDF("doc_id", "text"))
      .filter(col("text").isNotNull)
      .select(
        sum(regexp_count(col("text"), lit(PiiScan.EmailRe))) +
        sum(regexp_count(col("text"), lit(PiiScan.Ipv4Re))) +
        sum(regexp_count(col("text"), lit(PiiScan.PhoneRe))) +
        sum(regexp_count(col("text"), lit(PiiScan.SsnRe))))
      .head().getLong(0)
    assert(scrubbed == 0L, s"$scrubbed PII hits survived the scrub")
  }

  test("--scrub-pii parses and defaults off") {
    val on = StreamMain.parse(Array("docs", "/s", "/st", "100", "--scrub-pii"))
    val off = StreamMain.parse(Array("docs", "/s", "/st", "100"))
    assert(on.scrubPii && !off.scrubPii)
  }
}
