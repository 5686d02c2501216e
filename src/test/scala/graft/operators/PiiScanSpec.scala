package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSession

/** q111's Java-side regex semantics pinned on adversarial strings — the
  * per-string truths the oracle hash then holds cross-engine (the DuckDB
  * RE2 side was verified to agree on exactly these cases; any drift in
  * either engine breaks the q111 gate row, this spec says WHICH side).
  * Plus the aggregate-law edges: the decoy tail never matches, the
  * five-group quad matches once as its four-group prefix, multi-PII docs
  * count every hit, and redaction is total (counts on the redacted text
  * are zero).
  */
class PiiScanSpec extends AnyFunSuite {
  import TestSession.spark
  import spark.implicits._

  private def scan(texts: Seq[String]) =
    texts.toDF("text").select(
      regexp_count(col("text"), lit(PiiScan.EmailRe)).as("em"),
      regexp_count(col("text"), lit(PiiScan.Ipv4Re)).as("ip"),
      regexp_count(col("text"), lit(PiiScan.PhoneRe)).as("ph"),
      regexp_count(col("text"), lit(PiiScan.SsnRe)).as("id"),
      PiiScan.redact(col("text")).as("red"))
      .collect()

  test("each class detects its shape and redacts to its placeholder") {
    val r = scan(Seq(
      "mail user.42@mail2.example.com end",
      "ip 10.3.29.42 end",
      "call +1-555-0042 end",
      "ssn 242-52-3042 end"))
    assert(r(0).getInt(0) == 1 && r(0).getString(4) == "mail <EMAIL> end")
    assert(r(1).getInt(1) == 1 && r(1).getString(4) == "ip <IP> end")
    assert(r(2).getInt(2) == 1 && r(2).getString(4) == "call <PHONE> end")
    assert(r(3).getInt(3) == 1 && r(3).getString(4) == "ssn <ID> end")
  }

  test("the decoy tail matches nothing") {
    val r = scan(Seq(" ver 2.0.1 build-1234 x@ 5-55-555 a1.b2.c3.d4"))
    assert((0 to 3).forall(i => r(0).getInt(i) == 0))
    assert(r(0).getString(4) == " ver 2.0.1 build-1234 x@ 5-55-555 a1.b2.c3.d4")
  }

  test("five-group quad matches once, as its four-group prefix") {
    val r = scan(Seq("x 1.2.3.4.5 y"))
    assert(r(0).getInt(1) == 1)
    assert(r(0).getString(4) == "x <IP>.5 y")
  }

  test("multiple hits per doc all count; redacted text re-scans to zero") {
    val text = "a@b.co then c.d@e.org ip 1.2.3.4 and 5.6.7.8 +1-555-1234 111-22-3333"
    val r = scan(Seq(text))
    assert(r(0).getInt(0) == 2 && r(0).getInt(1) == 2 &&
      r(0).getInt(2) == 1 && r(0).getInt(3) == 1)
    val rescan = scan(Seq(r(0).getString(4)))
    assert((0 to 3).forall(i => rescan(0).getInt(i) == 0),
      s"redaction left PII behind: ${r(0).getString(4)}")
  }

  test("q111 aggregate obeys the derivation law on sf0.001") {
    val rows = PiiScan.q111PiiScan(spark, TestSession.sf).collect()
    assert(rows.nonEmpty)
    // every doc carries exactly one primary PII literal + the %5 email +
    // the %7 tricky quad — so summed class counts ≥ docs, and redaction
    // removed a positive number of characters everywhere
    val total = rows.map(_.getLong(1)).sum
    val hits = rows.map(r => r.getLong(2) + r.getLong(3) + r.getLong(4) + r.getLong(5)).sum
    assert(hits >= total, s"hits $hits < docs $total")
    assert(rows.forall(_.getLong(6) > 0), "some source redacted zero chars")
  }
}
