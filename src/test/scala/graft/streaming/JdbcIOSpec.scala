package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSession

/** The JDBC modality, EXECUTED (r10 verdict missing #5): write/read/
  * partitioned-read/pushdown/idempotent-append against embedded Apache
  * Derby — a real SQL database from Spark's own classpath. The data is
  * the fixture documents table, so the round trip covers the types the
  * reference's row sinks carried (bigint keys, varchar-ish text). */
class JdbcIOSpec extends AnyFunSuite {
  import TestSession.spark

  private lazy val dbDir =
    java.nio.file.Files.createTempDirectory("graft-derby-").toString
  private lazy val url = s"jdbc:derby:$dbDir/db;create=true"

  private lazy val docs = graft.Tables.documents(spark, TestSession.sf)
    .select(col("doc_id"), col("source"), col("text"))

  test("write + read round-trips the documents table") {
    JdbcIO.write(docs, url, "docs_rt", "overwrite")
    val back = JdbcIO.read(spark, url, "docs_rt")
    assert(back.count() == docs.count())
    assert(back.select("doc_id", "source", "text")
      .exceptAll(docs).isEmpty && docs
      .exceptAll(back.select("doc_id", "source", "text")).isEmpty)
  }

  test("partitioned read: N concurrent cursors, same rows, filter pushdown") {
    JdbcIO.write(docs, url, "docs_part", "overwrite")
    val hi = docs.agg(max(col("doc_id"))).first().getLong(0) + 1
    val part = JdbcIO.readPartitioned(spark, url, "docs_part",
      "doc_id", 0L, hi, numPartitions = 4)
    assert(part.rdd.getNumPartitions == 4)
    assert(part.count() == docs.count())
    // predicate pushdown reaches the remote SQL: the scan prints its
    // PushedFilters, and the JDBC-side WHERE keeps the transferred rows
    // at the filtered count, not the table count
    val filtered = part.filter(col("doc_id") < 10)
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("doc_id"),
      s"expected pushed doc_id filter in:\n$plan")
    assert(filtered.count() == docs.filter(col("doc_id") < 10).count())
  }

  test("appendOnce is a T9 sink: replay no-op, torn batch repaired") {
    val batch = docs.filter(col("doc_id") < 50)
    val n = batch.count()
    assert(JdbcIO.appendOnce(batch, url, "docs_once", 0L, n))
    assert(!JdbcIO.appendOnce(batch, url, "docs_once", 0L, n), "replay must skip")
    assert(JdbcIO.read(spark, url, "docs_once").count() == n)
    // a second batch appends
    val b1 = docs.filter(col("doc_id") >= 50 && col("doc_id") < 80)
    assert(JdbcIO.appendOnce(b1, url, "docs_once", 1L, b1.count()))
    assert(JdbcIO.read(spark, url, "docs_once").count() == n + b1.count())
    // torn batch: drop some of batch 1's rows behind the ledger's back,
    // then replay — the guard must repair to exactly the batch's rows
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.executeUpdate(
        "DELETE FROM docs_once WHERE \"batch_id\" = 1 AND \"doc_id\" >= 70")
    } finally conn.close()
    assert(JdbcIO.appendOnce(b1, url, "docs_once", 1L, b1.count()),
      "torn batch must rewrite")
    assert(JdbcIO.read(spark, url, "docs_once").count() == n + b1.count())
  }

  test("appendOnce post-append verify fails loudly and the replay repairs") {
    // The distributed append necessarily runs outside the probe
    // transaction, so appendOnce verifies the final count — a concurrent
    // double-append (zombie driver) or partial write surfaces HERE as a
    // throw, and the NEXT replay's torn-batch arm repairs to exactly-once.
    val b2 = docs.filter(col("doc_id") >= 80 && col("doc_id") < 100)
    val n2 = b2.count()
    // leg 1: the verify itself — a wrong declared count throws after the
    // rows land (and the follow-up replay with the true count recognizes
    // the batch as already complete: skip, no rewrite)
    intercept[IllegalStateException](
      JdbcIO.appendOnce(b2, url, "docs_once", 2L, n2 + 5))
    assert(!JdbcIO.appendOnce(b2, url, "docs_once", 2L, n2),
      "complete batch must skip")
    // leg 2: a concurrent double-append — simulate the zombie writer by
    // inserting a duplicate row behind the ledger's back; the replay's
    // probe sees n2+1 ≠ n2 (torn) and rewrites exactly-once
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.executeUpdate(
        """INSERT INTO docs_once SELECT * FROM docs_once WHERE "batch_id" = 2
          | FETCH FIRST 1 ROWS ONLY""".stripMargin)
    } finally conn.close()
    assert(JdbcIO.appendOnce(b2, url, "docs_once", 2L, n2),
      "over-complete batch must repair")
    assert(JdbcIO.read(spark, url, "docs_once")
      .filter(col("batch_id") === 2).count() == n2)
  }

  test("appendOnceLocal: one-txn ledger — replay no-op, torn repair, create-on-first-use") {
    val ids = (0L until 40L).toSeq
    assert(JdbcIO.appendOnceLocal(ids, url, "claims_local", 0L),
      "first append must write (and create the table)")
    assert(!JdbcIO.appendOnceLocal(ids, url, "claims_local", 0L),
      "full replay must skip")
    assert(JdbcIO.appendOnceLocal((40L until 70L).toSeq, url, "claims_local", 1L))
    def total(): Long = {
      val conn = java.sql.DriverManager.getConnection(url)
      try {
        val rs = conn.createStatement()
          .executeQuery("SELECT count(*) FROM claims_local")
        rs.next(); rs.getLong(1)
      } finally conn.close()
    }
    assert(total() == 70L)
    // torn batch: lose some of batch 1 behind the ledger's back → replay
    // repairs to exactly the batch (delete + rewrite, one transaction)
    val conn = java.sql.DriverManager.getConnection(url)
    try conn.createStatement().executeUpdate(
      "DELETE FROM claims_local WHERE \"batch_id\" = 1 AND \"file_id\" >= 60")
    finally conn.close()
    assert(JdbcIO.appendOnceLocal((40L until 70L).toSeq, url, "claims_local", 1L),
      "torn batch must rewrite")
    assert(total() == 70L)
    // empty claim list is a no-op, not a ledger row
    assert(!JdbcIO.appendOnceLocal(Seq.empty, url, "claims_local", 2L))
    assert(total() == 70L)
  }
}
