package graft.streaming

import java.io.{File, RandomAccessFile}
import java.nio.file.{Files, Path, Paths, StandardCopyOption, StandardOpenOption}

import scala.util.Try

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
  * here IS that pattern, including retention: old versions beyond
  * [[StateDir.KeepVersions]] are deleted after each pointer bump (current
  * plus a cushion of recent priors — see the companion for the sizing).
  *
  * Crash safety: the pointer is written to a temp file and published with an
  * ATOMIC_MOVE — a crash mid-publish leaves either the old pointer or the
  * new one, never a torn file. If a pointer is nonetheless unreadable (e.g.
  * hand-edited), [[latestVersion]] falls back to the highest version
  * directory that finished writing (has a `_SUCCESS` marker).
  *
  * Exactly-once (T9): writers dedupe on their natural key before publishing,
  * so a replayed micro-batch (foreachBatch may re-run a batch id after
  * failure) republishes the same content instead of duplicating rows.
  */
final class StateDir(spark: SparkSession, root: String) {

  new File(root).mkdirs()

  // JVM-wide per-root lock state: two StateDir INSTANCES on the same root
  // in one JVM must share a monitor — OS file locks are held per JVM, so a
  // second instance's acquire would otherwise throw
  // OverlappingFileLockException instead of waiting.
  private val rmw = StateDir.lockFor(new File(root).getCanonicalPath)

  /** Serializes read-modify-write sequences on this state dir — in-process
    * via the monitor AND cross-process via an OS file lock on `.lock`, so
    * two worker processes sharing the same state dir (the reference's
    * multi-worker deployment, `FileWorkerApp` × N on one Postgres) cannot
    * both read version N and publish competing N+1s. All queue mutators
    * ([[WorkQueue]] claim/start/finish, [[ChunkIngest]] enqueue/reset) go
    * through here; the ingest-only tables (chunks, hw, …) assume a single
    * ingest process per state dir, like the reference's single StreamingApp.
    * On a real cluster the state tables are a transactional format
    * (Delta/Iceberg) and this becomes optimistic commit-conflict retry. */
  def locked[T](f: => T): T = rmw.synchronized {
    // Depth guard: FileChannel locks are per-JVM and non-reentrant
    // (OverlappingFileLockException on a nested acquire), while the monitor
    // IS reentrant — only the outermost locked() touches the OS lock.
    if (rmw.depth > 0) { rmw.depth += 1; try f finally rmw.depth -= 1 }
    else {
      val raf = new RandomAccessFile(new File(root, ".lock"), "rw")
      try {
        val fl = raf.getChannel.lock()
        rmw.depth = 1
        try f finally { rmw.depth = 0; fl.release() }
      } finally raf.close()
    }
  }

  private def tableRoot(name: String) = s"$root/$name"
  private def pointerPath(name: String) = Paths.get(s"$root/$name.latest")

  private def versionDirs(name: String): Seq[(Int, File)] = {
    val dirs = Option(new File(tableRoot(name)).listFiles()).getOrElse(Array.empty)
    dirs.toSeq.flatMap { f =>
      if (f.isDirectory && f.getName.startsWith("v"))
        Try(f.getName.drop(1).toInt).toOption.map(_ -> f)
      else None
    }
  }

  /** S7 "create if not exists": tables spring into existence empty. A
    * corrupt/unparseable pointer recovers to the newest COMPLETE version
    * directory (parquet `_SUCCESS` marker) instead of wedging every read. */
  private def latestVersion(name: String): Option[Int] = {
    val fromPointer =
      if (Files.exists(pointerPath(name)))
        Try(new String(Files.readAllBytes(pointerPath(name))).trim.toInt).toOption
      else None
    fromPointer.orElse {
      versionDirs(name)
        .filter { case (_, f) => new File(f, "_SUCCESS").exists() }
        .map(_._1).sorted.lastOption
    }
  }

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
    val tmp = Paths.get(s"$root/$name.latest.tmp")
    Files.write(tmp, v.toString.getBytes,
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING,
      StandardOpenOption.WRITE)
    Files.move(tmp, pointerPath(name),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    gc(name, v)
  }

  /** Retention: drop version dirs older than current − (KeepVersions − 1).
    * Without this a long-running ingest leaks a full parquet directory per
    * table per micro-batch, unbounded. */
  private def gc(name: String, current: Int): Unit =
    versionDirs(name)
      .filter { case (ver, _) => ver <= current - StateDir.KeepVersions }
      .foreach { case (_, dir) => deleteRecursively(dir.toPath) }

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p)) {
      val children = Files.list(p)
      try children.forEach(c => deleteRecursively(c)) finally children.close()
    }
    Files.deleteIfExists(p)
  }

  /** S7 truncate — `delete from` (reference `StreamingApp.scala:161,222`). */
  def truncate(name: String, schema: StructType): Unit =
    write(name, spark.createDataFrame(java.util.Collections.emptyList[Row](), schema))

  def exists(name: String): Boolean = latestVersion(name).isDefined

  def path(name: String): String = tableRoot(name)
}

object StateDir {
  /** Versions retained per table: the live one plus a cushion for in-flight
    * readers that resolved the pointer before recent publishes. A single
    * ChunkIngest batch can publish the queue table up to three times
    * (release enqueue, resident enqueue, error reset), so the cushion
    * covers a full batch; a snapshot DataFrame held across BATCHES must be
    * re-acquired (it lazily binds to a version directory that will
    * eventually be GC'd — before GC existed it merely read stale data).
    * Cross-process readers have no fence: read() takes no lock, so a slow
    * reader in another process racing KeepVersions publishes can lose its
    * directory mid-scan — such a reader must re-resolve and retry on
    * FileNotFound. A transactional table format's snapshot isolation is
    * the real fix at deployment scale. */
  val KeepVersions = 4

  /** Per-root lock state, shared by every StateDir instance in this JVM. */
  private final class RootLock { var depth = 0 }
  private val rootLocks =
    scala.collection.concurrent.TrieMap.empty[String, RootLock]
  private def lockFor(canonicalRoot: String): RootLock =
    rootLocks.getOrElseUpdate(canonicalRoot, new RootLock)
}
