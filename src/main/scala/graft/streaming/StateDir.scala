package graft.streaming

import java.io.File
import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.StructType

/** Versioned parquet-backed state tables (operators S6/S7 — the reference's
  * PostgreSQL state tables `highwatermark`, `highwatermark_log`,
  * `desh_files`, `tsk_image_sizes`: DDL at `StreamingApp.scala:149,201,218`).
  *
  * Parquet directories are immutable, so "update" is read → transform →
  * write-new-version → atomically bump a `latest` pointer. This gives the
  * read-modify-write the reference gets from SQL UPDATE, without ever
  * writing into a directory a live plan is reading (self-overwrite is how
  * Spark jobs corrupt state). At cluster scale the same call sites map 1:1
  * onto a transactional table format (Delta/Iceberg MERGE); the versioning
  * here IS that pattern, minus compaction.
  *
  * Exactly-once (T9): writers dedupe on their natural key before publishing,
  * so a replayed micro-batch (foreachBatch may re-run a batch id after
  * failure) republishes the same content instead of duplicating rows.
  */
final class StateDir(spark: SparkSession, root: String) {

  new File(root).mkdirs()

  private val rmwLock = new Object

  /** Serializes read-modify-write sequences on this state dir. The version
    * pointer itself is swapped atomically, but two concurrent RMW cycles
    * (e.g. two workers claiming from the queue) would both read version N
    * and publish competing N+1s — last write wins, first is lost. All
    * driver-side mutators take this lock; on a real cluster the state
    * tables are a transactional format (Delta/Iceberg) and this becomes
    * optimistic commit-conflict retry. */
  def locked[T](f: => T): T = rmwLock.synchronized(f)

  private def tableRoot(name: String) = s"$root/$name"
  private def pointerPath(name: String) = Paths.get(s"$root/$name.latest")

  /** S7 "create if not exists": tables spring into existence empty. */
  private def latestVersion(name: String): Option[Int] =
    if (Files.exists(pointerPath(name)))
      Some(new String(Files.readAllBytes(pointerPath(name))).trim.toInt)
    else None

  def read(name: String, schema: StructType): DataFrame =
    latestVersion(name) match {
      case Some(v) => spark.read.schema(schema).parquet(s"${tableRoot(name)}/v$v")
      case None =>
        spark.createDataFrame(java.util.Collections.emptyList[Row](), schema)
    }

  /** Publish a new version. The write executes the (possibly self-reading)
    * plan into a fresh directory before the pointer moves — crash between
    * write and pointer-bump leaves the old version live (atomic swap). */
  def write(name: String, df: DataFrame): Unit = {
    val v = latestVersion(name).getOrElse(-1) + 1
    df.write.mode("overwrite").parquet(s"${tableRoot(name)}/v$v")
    Files.write(pointerPath(name), v.toString.getBytes,
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING,
      StandardOpenOption.WRITE)
  }

  /** S7 truncate — `delete from` (reference `StreamingApp.scala:161,222`). */
  def truncate(name: String, schema: StructType): Unit =
    write(name, spark.createDataFrame(java.util.Collections.emptyList[Row](), schema))

  def exists(name: String): Boolean = latestVersion(name).isDefined

  def path(name: String): String = tableRoot(name)
}
