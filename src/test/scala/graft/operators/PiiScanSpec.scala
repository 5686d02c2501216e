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
  * count every hit, redaction is total (counts on the redacted text are
  * zero), and — r14 — the Luhn law: every valid test PAN counts, a
  * shape-valid Luhn-negative is redacted but NOT counted.
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
      PiiScan.cardCount(col("text")).as("cd"),
      regexp_count(col("text"), lit(PiiScan.IbanRe)).as("ib"),
      regexp_count(col("text"), lit(PiiScan.E164Re)).as("e1"),
      regexp_count(col("text"), lit(PiiScan.Ipv6Re)).as("i6"),
      regexp_count(col("text"), lit(PiiScan.MacRe)).as("mc"),
      PiiScan.redact(col("text")).as("red"))
      .collect()

  private val Red = 9 // index of the redacted text column

  test("each original class detects its shape and redacts to its placeholder") {
    val r = scan(Seq(
      "mail user.42@mail2.example.com end",
      "ip 10.3.29.42 end",
      "call +1-555-0042 end",
      "ssn 242-52-3042 end"))
    assert(r(0).getInt(0) == 1 && r(0).getString(Red) == "mail <EMAIL> end")
    assert(r(1).getInt(1) == 1 && r(1).getString(Red) == "ip <IP> end")
    assert(r(2).getInt(2) == 1 && r(2).getString(Red) == "call <PHONE> end")
    assert(r(3).getInt(3) == 1 && r(3).getString(Red) == "ssn <ID> end")
  }

  test("each r14 class detects its shape and redacts to its placeholder") {
    val r = scan(Seq(
      "card 4111-1111-1111-1111 end",
      "iban DE89370400440532013000 end",
      "tel +44091234567 end",
      "v6 2001:0db8:0000:0042:0000:8a2e:0370:7334 end",
      "mac 0a:1b:2c:3d:4e:5f end"))
    assert(r(0).getInt(4) == 1 && r(0).getString(Red) == "card <CARD> end")
    assert(r(1).getInt(5) == 1 && r(1).getString(Red) == "iban <IBAN> end")
    assert(r(2).getInt(6) == 1 && r(2).getString(Red) == "tel <E164> end")
    assert(r(3).getInt(7) == 1 && r(3).getString(Red) == "v6 <IP6> end")
    assert(r(4).getInt(8) == 1 && r(4).getString(Red) == "mac <MAC> end")
  }

  test("Luhn law: all six planted PANs count; a Luhn-negative shape is " +
    "redacted but not counted") {
    val valid = scan(PiiScan.ValidPans.map(p => s"pay $p now"))
    valid.zip(PiiScan.ValidPans).foreach { case (row, pan) =>
      assert(row.getInt(4) == 1, s"$pan must pass Luhn")
      assert(row.getString(Red) == "pay <CARD> now")
    }
    val bad = scan(Seq("pay 1111-1111-1111-1111 now"))
    assert(bad(0).getInt(4) == 0, "Luhn-negative shape must not count")
    assert(bad(0).getString(Red) == "pay <CARD> now",
      "Luhn-negative shape must still be redacted")
  }

  test("the decoy tail matches nothing") {
    val tail = " ver 2.0.1 build-1234 x@ 5-55-555 a1.b2.c3.d4" +
      " DE99 +12345 1111:2222:3333:4444:5555:6666:7777 ab:cd:ef:00:11" +
      " de89370400440532013000"
    val r = scan(Seq(tail))
    assert((0 to 8).forall(i => r(0).getInt(i) == 0),
      s"decoy matched: ${(0 to 8).map(r(0).getInt).mkString(",")}")
    assert(r(0).getString(Red) == tail)
  }

  test("five-group quad matches once, as its four-group prefix") {
    val r = scan(Seq("x 1.2.3.4.5 y"))
    assert(r(0).getInt(1) == 1)
    assert(r(0).getString(Red) == "x <IP>.5 y")
  }

  test("multiple hits per doc all count; redacted text re-scans to zero") {
    val text = "a@b.co then c.d@e.org ip 1.2.3.4 and 5.6.7.8 +1-555-1234 " +
      "111-22-3333 4012-8888-8888-1881 +4409876543 0a:00:11:22:33:44"
    val r = scan(Seq(text))
    assert(r(0).getInt(0) == 2 && r(0).getInt(1) == 2 &&
      r(0).getInt(2) == 1 && r(0).getInt(3) == 1 && r(0).getInt(4) == 1 &&
      r(0).getInt(6) == 1 && r(0).getInt(8) == 1)
    val rescan = scan(Seq(r(0).getString(Red)))
    assert((0 to 8).forall(i => rescan(0).getInt(i) == 0),
      s"redaction left PII behind: ${r(0).getString(Red)}")
  }

  test("q111 aggregate obeys the derivation law on sf0.001") {
    val rows = PiiScan.q111PiiScan(spark, TestSession.sf).collect()
    assert(rows.nonEmpty)
    // every doc carries exactly one primary PII literal + the %5 email +
    // the %7 tricky quad — so summed class counts ≥ docs, and redaction
    // removed a positive number of characters everywhere (the every-doc
    // Luhn decoy alone guarantees that)
    val total = rows.map(_.getLong(1)).sum
    val hits = rows.map(r => (2 to 10).map(r.getLong).sum).sum
    assert(hits >= total, s"hits $hits < docs $total")
    assert(rows.forall(_.getLong(11) > 0), "some source redacted zero chars")
  }
}
