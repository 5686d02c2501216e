package graft.operators

/** Keyed expensive-build memo with PER-SLOT locking and temp-root
  * lifecycle — the shared machinery behind the streaming state fixtures
  * ([[StreamState]] q107, [[ChunkState]] q108): build once per
  * (session, corpus stamp), serve many, rebuild on stamp change, delete
  * evicted/replaced/exiting roots.
  *
  * Locking doctrine (the [[ServedMemo]] two-level pattern, promoted here
  * after the r11 verdict found q107's build running inside a GLOBAL lock):
  * the map lock only looks up / creates slots — constant time; the
  * expensive build runs under the slot's own monitor, so concurrent
  * sessions building DIFFERENT corpora never serialize. The shutdown hook
  * reads a lock-free root registry, so a SIGTERM mid-build sweeps the
  * half-written tree without waiting for the build to finish.
  */
private[operators] final class BuildMemo(maxEntries: Int, prefix: String) {

  private final class Slot {
    var stamp: String = null // guarded by the slot monitor
    var root: String = null
  }

  // registered BEFORE a build starts; read by the hook with no lock
  private val liveRoots =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  // Slots detached by LRU eviction, awaiting root cleanup OUTSIDE the map
  // lock. The r12 advisor found the previous form (slot.synchronized
  // inside removeEldestEntry, i.e. under the map monitor) reintroducing
  // the global stall this class exists to remove: evicting a mid-build
  // slot blocked every lookup of every key for the whole build.
  private val evictedSlots =
    new java.util.concurrent.ConcurrentLinkedQueue[Slot]()

  private val memo =
    new java.util.LinkedHashMap[String, Slot](8, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, Slot]): Boolean = {
        val evict = size() > maxEntries
        // Detach only — no slot lock here. Cleanup (which may wait for an
        // in-flight build of the EVICTED corpus) happens in drainEvicted,
        // outside the map monitor, so lookups of other keys never block.
        if (evict) evictedSlots.add(e.getValue)
        evict
      }
    }

  /** Delete the roots of detached slots. Takes each slot's OWN monitor
    * (never the map's), so waiting for an in-flight build of an evicted
    * corpus blocks only this cleaner, not the memo. */
  private def drainEvicted(): Unit = {
    var s = evictedSlots.poll()
    while (s != null) {
      s.synchronized {
        Option(s.root).foreach { r =>
          BuildMemo.deleteTree(r); liveRoots.remove(r)
        }
        s.root = null
        s.stamp = null
      }
      s = evictedSlots.poll()
    }
  }

  locally {
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      liveRoots.forEach(BuildMemo.deleteTree(_))))
  }

  /** The memoized root for `key` at `stamp`, running `build(root)` into a
    * fresh temp dir when absent or stale. Builds for different keys run
    * concurrently; two callers of ONE key serialize on its slot.
    *
    * After taking the slot lock the caller revalidates that the slot is
    * still the map's slot for `key` — a slot evicted between lookup and
    * lock acquisition would otherwise be rebuilt into as an orphan whose
    * root is never served nor LRU-evicted (leaked until JVM exit; r12
    * advisor finding). Taking the map lock while holding a slot lock is
    * deadlock-free because eviction no longer takes slot locks under the
    * map monitor (it only detaches). */
  def get(key: String, stamp: String)(build: String => Unit): String = {
    while (true) {
      val slot = memo.synchronized {
        Option(memo.get(key)).getOrElse {
          val sl = new Slot
          memo.put(key, sl) // may detach the eldest into evictedSlots
          sl
        }
      }
      drainEvicted() // outside the map lock; may wait on evicted builds
      slot.synchronized {
        val current = memo.synchronized { memo.get(key) }
        if (current eq slot) {
          if (slot.stamp == stamp && slot.root != null) return slot.root
          Option(slot.root).foreach { r =>
            BuildMemo.deleteTree(r); liveRoots.remove(r)
          }
          slot.root = null
          slot.stamp = null
          val root =
            java.nio.file.Files.createTempDirectory(prefix).toString
          liveRoots.add(root)
          build(root)
          slot.stamp = stamp
          slot.root = root
          return root
        }
        // else: evicted between lookup and lock — retry with a fresh slot
      }
    }
    throw new IllegalStateException("unreachable")
  }
}

private[operators] object BuildMemo {
  def deleteTree(root: String): Unit = {
    def rec(p: java.nio.file.Path): Unit = {
      if (java.nio.file.Files.isDirectory(p)) {
        val c = java.nio.file.Files.list(p)
        try c.forEach(rec(_)) finally c.close()
      }
      java.nio.file.Files.deleteIfExists(p)
    }
    try rec(java.nio.file.Paths.get(root)) catch { case _: Throwable => () }
  }

  /** Driver-side corpus fingerprint (names + sizes + mtimes) of `table`
    * under dir `d` — the stamp every memoized build is keyed by, so a
    * corpus mutated in place re-builds instead of serving stale state. */
  def stampOf(d: String, table: String): String = {
    import java.nio.file.{Files, Path, Paths}
    val dir = Paths.get(d, table)
    val target = if (Files.isDirectory(dir)) dir else Paths.get(d)
    if (!Files.exists(target)) return "absent"
    val s = Files.list(target)
    try {
      val entries = new scala.collection.mutable.ArrayBuffer[String]()
      s.forEach { (p: Path) =>
        entries += s"${p.getFileName}:${Files.size(p)}:${Files.getLastModifiedTime(p).toMillis}"
      }
      entries.sorted.mkString(",")
    } finally s.close()
  }
}
