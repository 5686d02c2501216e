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
  * here IS that pattern, including retention: version dirs no longer
  * reachable from the last [[StateDir.KeepVersions]] versions' chains are
  * deleted after each pointer bump (see the companion for the sizing).
  *
  * Two publish modes, mirroring a transactional table format's two commits:
  *  - [[write]] — a FULL version: the new dir alone is the table (MERGE /
  *    overwrite). Per-publish I/O is O(table).
  *  - [[append]] — a DELTA version (`_DELTA` marker in the dir): the table
  *    is the union of the delta chain back to its full base, resolved at
  *    read time. Per-publish I/O is O(delta); every
  *    [[StateDir.CompactEvery]]-th append folds the chain into a fresh full
  *    version (amortized O(table / CompactEvery) per publish — the
  *    append-log + compaction shape of Delta/Iceberg, which is what keeps a
  *    long-running 100 TB ingest's per-batch write I/O O(batch), not
  *    O(corpus)).
  *
  * Crash safety: the pointer is written to a temp file and published with an
  * ATOMIC_MOVE — a crash mid-publish leaves either the old pointer or the
  * new one, never a torn file. If a pointer is nonetheless unreadable (e.g.
  * hand-edited), [[latestVersion]] falls back to the highest version
  * directory that finished writing (has a `_SUCCESS` marker).
  *
  * Exactly-once (T9): writers dedupe on their natural key before publishing,
  * so a replayed micro-batch (foreachBatch may re-run a batch id after
  * failure) republishes the same content instead of duplicating rows;
  * append-mode writers skip a table whose chain already carries their batch
  * (see [[DedupStream]]'s batch-id guard).
  */
final class StateDir(spark: SparkSession, root: String,
    compactEvery: Int = StateDir.CompactEvery) {

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

  private def isDelta(dir: File): Boolean = new File(dir, "_DELTA").exists()

  /** The dirs composing version `v`: `v` itself plus, while dirs are
    * delta-marked, their predecessors down to the full base. */
  private def chainDirs(name: String, v: Int): Seq[(Int, File)] = {
    val dirs = versionDirs(name).toMap
    val out = Seq.newBuilder[(Int, File)]
    var cur = v
    var more = true
    while (more) dirs.get(cur) match {
      case Some(f) =>
        out += ((cur, f))
        if (isDelta(f)) cur -= 1 else more = false
      case None => more = false // base already GC'd — never for a live version
    }
    out.result()
  }

  def read(name: String, schema: StructType): DataFrame =
    latestVersion(name) match {
      case Some(v) =>
        val paths = chainDirs(name, v).map(_._2.getPath)
        spark.read.schema(schema).parquet(paths: _*)
      case None =>
        spark.createDataFrame(java.util.Collections.emptyList[Row](), schema)
    }

  /** Publish a new FULL version. The write executes the (possibly
    * self-reading) plan into a fresh directory before the pointer moves —
    * crash between write and pointer-bump leaves the old version live
    * (atomic swap). */
  def write(name: String, df: DataFrame): Unit =
    publish(name, df, delta = false)

  /** Publish `df` as a DELTA on the current version: the table becomes
    * chain ∪ df, but only |df| rows hit disk — per-publish write I/O is
    * O(delta), the append half of the Delta/Iceberg contract. Every
    * [[compactEvery]]-th consecutive delta folds the whole chain into a
    * full version instead (bounding both read fan-in and GC debt).
    * Requires `df`'s schema to match the table's (union-on-read). */
  def append(name: String, df: DataFrame): Unit =
    latestVersion(name) match {
      case None => write(name, df) // first publish is the chain base
      case Some(cur) if chainDirs(name, cur).count(c => isDelta(c._2)) + 1 >= compactEvery =>
        write(name, read(name, df.schema).unionByName(df))
      case Some(_) => publish(name, df, delta = true)
    }

  private def publish(name: String, df: DataFrame, delta: Boolean): Unit = {
    val v = latestVersion(name).getOrElse(-1) + 1
    val dir = s"${tableRoot(name)}/v$v"
    df.write.mode("overwrite").parquet(dir)
    if (delta)
      Files.write(Paths.get(dir, "_DELTA"), Array.empty[Byte],
        StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING,
        StandardOpenOption.WRITE)
    val tmp = Paths.get(s"$root/$name.latest.tmp")
    Files.write(tmp, v.toString.getBytes,
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING,
      StandardOpenOption.WRITE)
    Files.move(tmp, pointerPath(name),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    gc(name, v)
  }

  /** Retention: drop version dirs unreachable from the chains of the last
    * [[StateDir.KeepVersions]] versions (a delta's base must outlive every
    * version stacked on it). Without this a long-running ingest leaks a
    * full parquet directory per table per micro-batch, unbounded. */
  private def gc(name: String, current: Int): Unit = {
    val live = (current - StateDir.KeepVersions + 1 to current)
      .flatMap(v => chainDirs(name, v).map(_._1)).toSet
    versionDirs(name)
      .filter { case (ver, _) => ver <= current - StateDir.KeepVersions && !live(ver) }
      .foreach { case (_, dir) => deleteRecursively(dir.toPath) }
  }

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

  /** Delta-chain length that triggers compaction in [[StateDir.append]]:
    * read fan-in stays ≤ CompactEvery dirs and the amortized per-append
    * write cost is O(delta + table/CompactEvery). Small enough that a
    * pointer-fallback scan after a crash touches few dirs; large enough
    * that appends dominate. */
  val CompactEvery = 8

  /** Per-root lock state, shared by every StateDir instance in this JVM. */
  private final class RootLock { var depth = 0 }
  private val rootLocks =
    scala.collection.concurrent.TrieMap.empty[String, RootLock]
  private def lockFor(canonicalRoot: String): RootLock =
    rootLocks.getOrElseUpdate(canonicalRoot, new RootLock)
}
