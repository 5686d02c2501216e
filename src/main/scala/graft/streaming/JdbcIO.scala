package graft.streaming

import java.sql.DriverManager
import java.util.Properties

import org.apache.spark.sql.{DataFrame, SparkSession}

/** JDBC sources/sinks — the one reference IO modality the port had
  * re-expressed over [[StateDir]] parquet without ever EXECUTING the
  * original shape. The reference's operative sinks are JDBC rows: the
  * streaming pipeline inserts chunk metadata and batch queue rows through
  * plain JDBC writes (`/root/reference`'s StreamingApp.scala:341-342 and
  * 452-471, FileWorkerApp.scala:207-227, all against PostgreSQL). This
  * facade is the executable Spark twin: `spark.read.jdbc` /
  * `df.write.jdbc` with the options that matter at scale, exercised
  * end-to-end in JdbcIOSpec against EMBEDDED Apache Derby — a real SQL
  * database that ships in Spark's own classpath (the Hive-metastore
  * dependency), so the modality runs in-sandbox with zero network.
  *
  * Scale notes (the knobs a 100 TB deployment tunes, spelled here so the
  * facade is the documentation):
  *  - READS partition by a numeric column's [lb, ub) range into
  *    `numPartitions` concurrent JDBC cursors ([[readPartitioned]]) —
  *    an unpartitioned `read.jdbc` is ONE executor pulling the whole
  *    table through one connection. Filters on the partition column and
  *    projected columns push into the remote SQL (PushedFilters in the
  *    scan — pinned by the spec).
  *  - WRITES go through `batchsize` (rows per executeBatch round trip)
  *    and `isolationLevel`; `numPartitions` bounds concurrent
  *    connections so a 1000-task stage does not open 1000 sessions
  *    against the database.
  *  - Exactly-once: JDBC appends are NOT idempotent by themselves; the
  *    streaming sink twin is [[appendOnce]] — the same batch-id ledger
  *    guard every StateDir sink uses (T9), here as a per-batch existence
  *    probe before the append. A re-delivered foreachBatch replays as a
  *    no-op; a torn append (some rows in, batch row incomplete) is
  *    repaired by the delete-first arm, mirroring the reference's
  *    Postgres transaction semantics as closely as a two-step protocol
  *    can.
  */
object JdbcIO {

  /** Connection properties for an embedded-Derby URL; for any other
    * database, callers pass their own (driver, user, password, …). */
  def derbyProps(): Properties = {
    val p = new Properties()
    p.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    p
  }

  def write(df: DataFrame, url: String, table: String, mode: String,
      props: Properties = derbyProps(), batchSize: Int = 1000,
      maxConnections: Int = 8): Unit =
    df.coalesce(maxConnections).write
      .option("batchsize", batchSize)
      .mode(mode).jdbc(url, table, props)

  /** One-cursor read — fine for dimension-sized tables only. */
  def read(spark: SparkSession, url: String, table: String,
      props: Properties = derbyProps()): DataFrame =
    spark.read.jdbc(url, table, props)

  /** Range-partitioned parallel read: `numPartitions` concurrent cursors
    * over `[lb, ub)` slices of numeric `partCol` — the only JDBC read
    * shape that scales past one connection's throughput. */
  def readPartitioned(spark: SparkSession, url: String, table: String,
      partCol: String, lb: Long, ub: Long, numPartitions: Int,
      props: Properties = derbyProps()): DataFrame =
    spark.read.jdbc(url, table, partCol, lb, ub, numPartitions, props)

  /** T9 over JDBC: append `df` tagged with `batchId` exactly once. The
    * guard probes the table for the batch's rows; a fully-replayed batch
    * is skipped, a TORN one (crash mid-append) is deleted and re-appended
    * — `df` must be deterministic for the batch (the same contract every
    * StateDir `appendOnce` sink holds). Returns true when rows were
    * (re)written. `df` must not already carry a `batch_id` column.
    *
    * Atomicity contract (the reference runs this inside Postgres
    * transactions; a two-phase Spark writer cannot, so the protocol is):
    *  - probe + torn-batch DELETE run in ONE SERIALIZABLE transaction on
    *    one connection — a crash between them rolls the delete back, so
    *    the batch is never left "fully absent with its ledger consumed"
    *    (the pre-r12 hole: three steps over separate auto-commit
    *    connections);
    *  - the append itself is Spark's distributed JDBC writer (its own
    *    connections, necessarily outside that transaction), so appendOnce
    *    VERIFIES the post-append count and throws on mismatch. Two
    *    concurrent writers of one batchId (zombie driver + its
    *    replacement) either deadlock in the probe txn (one aborts — Derby
    *    picks a victim) or both append; the verify-count turns the double
    *    append into a loud failure whose NEXT replay takes the torn-batch
    *    arm and repairs to exactly-once — with one honest residue: if the
    *    zombie's append lands only AFTER the survivor has verified and
    *    returned, the duplicates persist until something replays the batch
    *    (the throw fires in the dying zombie, which never retries). A
    *    single-writer-per-batch harness (Spark's streaming query guarantee
    *    under correctly-fenced checkpoints) never enters that window. */
  def appendOnce(df: DataFrame, url: String, table: String, batchId: Long,
      expectedRows: Long, props: Properties = derbyProps()): Boolean = {
    val tagged = df.withColumn("batch_id",
      org.apache.spark.sql.functions.lit(batchId))
    // Identifier-case contract, matching Spark's JDBC writer exactly: the
    // TABLE name goes into the DDL as-is (so Derby normalizes an unquoted
    // name, and these statements must also leave it unquoted), while
    // COLUMN names are dialect-quoted at CREATE time (case-sensitive
    // "batch_id" — quoted here too).
    // None means TABLE ABSENT only. Derby's table/view-not-found SQLStates
    // are 42X05 (table does not exist) and 42Y07 (schema does not exist);
    // anything else — a deadlock or serialization abort inside the
    // SERIALIZABLE probe txn in particular — must propagate, because
    // misreading it as "absent" would skip the torn-batch DELETE and
    // double-append on the retry (r12 advisor finding).
    def countBatch(conn: java.sql.Connection): Option[Long] =
      try {
        val st = conn.prepareStatement(
          s"""SELECT count(*) FROM $table WHERE "batch_id" = ?""")
        st.setLong(1, batchId)
        val rs = st.executeQuery()
        rs.next()
        Some(rs.getLong(1))
      } catch {
        case e: java.sql.SQLException
            if e.getSQLState == "42X05" || e.getSQLState == "42Y07" =>
          None
      }
    val conn = DriverManager.getConnection(url, props)
    val decision =
      try {
        conn.setAutoCommit(false)
        conn.setTransactionIsolation(
          java.sql.Connection.TRANSACTION_SERIALIZABLE)
        try {
          val d = countBatch(conn) match {
            case Some(n) if n == expectedRows && n > 0 => "skip"
            case Some(n) if n > 0 => // torn batch: repair by delete+rewrite
              val del = conn.prepareStatement(
                s"""DELETE FROM $table WHERE "batch_id" = ?""")
              del.setLong(1, batchId)
              del.executeUpdate()
              "append"
            case _ => "append"
          }
          conn.commit() // delete (if any) and its range locks settle here
          d
        } catch {
          case e: Throwable =>
            try conn.rollback() catch { case _: Throwable => () }
            throw e
        }
      } finally conn.close()
    if (decision == "append") {
      tagged.write.mode("append").jdbc(url, table, props)
      // post-append verify: the distributed append ran outside the probe
      // transaction, so this is what makes a concurrent double-append (or
      // a partial executor-side write) loud instead of silent.
      val check = DriverManager.getConnection(url, props)
      val n = try countBatch(check).getOrElse(-1L) finally check.close()
      if (n != expectedRows)
        throw new IllegalStateException(
          s"appendOnce($table, batch $batchId): wrote $n rows, expected " +
            s"$expectedRows — torn or concurrent append; replay to repair")
      true
    } else false
  }

  /** Driver-side transactional twin of [[appendOnce]] for DRIVER-SCALE row
    * sets — a worker's claim batch, which is a bounded driver decision by
    * nature (the same doctrine as [[graft.streaming.WorkQueue]].claim's
    * bounded collect). This is also the reference's OWN shape: the worker
    * executable runs every queue write as driver-side prepared statements
    * (`FileWorkerApp.scala:207-227`), never a distributed write.
    *
    * Two properties the distributed form cannot offer:
    *  - probe + torn-batch DELETE + insert all commit in ONE SERIALIZABLE
    *    transaction, so there is no zombie-after-commit residue — the
    *    append is exactly-once, not "verified after the fact";
    *  - it is the only JDBC WRITE shape that works under a multi-JVM
    *    master with EMBEDDED Derby (one JVM may boot a Derby database;
    *    executor JVMs cannot open the driver's ledger).
    *
    * Creates `table` on first use as ("file_id" BIGINT, "batch_id"
    * BIGINT). Returns true when rows were (re)written; a fully-present
    * batch replays as a no-op. */
  def appendOnceLocal(fileIds: Seq[Long], url: String, table: String,
      batchId: Long, props: Properties = derbyProps()): Boolean = {
    if (fileIds.isEmpty) return false
    val conn = DriverManager.getConnection(url, props)
    try {
      conn.setAutoCommit(false)
      conn.setTransactionIsolation(
        java.sql.Connection.TRANSACTION_SERIALIZABLE)
      try {
        // create-on-first-use, inside the txn (Derby DDL is transactional);
        // X0Y32 = "already exists"
        try conn.createStatement().executeUpdate(
          s"""CREATE TABLE $table ("file_id" BIGINT, "batch_id" BIGINT)""")
        catch {
          case e: java.sql.SQLException if e.getSQLState == "X0Y32" => ()
        }
        val probe = conn.prepareStatement(
          s"""SELECT count(*) FROM $table WHERE "batch_id" = ?""")
        probe.setLong(1, batchId)
        val rs = probe.executeQuery()
        rs.next()
        val present = rs.getLong(1)
        val wrote =
          if (present == fileIds.size) false // full replay: no-op
          else {
            if (present > 0) { // torn batch: repair by delete+rewrite
              val del = conn.prepareStatement(
                s"""DELETE FROM $table WHERE "batch_id" = ?""")
              del.setLong(1, batchId)
              del.executeUpdate()
            }
            val ins = conn.prepareStatement(
              s"""INSERT INTO $table ("file_id", "batch_id") VALUES (?, ?)""")
            fileIds.grouped(1000).foreach { grp =>
              grp.foreach { id =>
                ins.setLong(1, id); ins.setLong(2, batchId); ins.addBatch()
              }
              ins.executeBatch()
            }
            true
          }
        conn.commit()
        wrote
      } catch {
        case e: Throwable =>
          try conn.rollback() catch { case _: Throwable => () }
          throw e
      }
    } finally conn.close()
  }
}
