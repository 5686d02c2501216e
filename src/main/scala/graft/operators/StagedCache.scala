package graft.operators

import org.apache.spark.sql.DataFrame

/** Session-lifetime OWNER for the staged persists of the inline
  * (train-in-plan) queries — q40/q92's training stages, q98's tagged
  * assignment, the rank base of [[Sessions]]. Those plans persist an
  * intermediate that feeds two downstream branches; the query itself
  * returns a lazy DataFrame, so no caller is positioned to unpersist
  * (the classic leak: a bench loop re-running the query pins storage
  * with no bound and no owner). This registry is the owner: every such
  * persist is recorded under a (session, corpus, stage) key in a
  * bounded LRU, and eviction unpersists.
  *
  * Re-staging the same key does NOT invalidate: Spark's CacheManager
  * already dedupes persists by analyzed plan, so a repeat invocation
  * (same deterministic plan over the same fixture dir) reuses the one
  * cached copy — this class only adds the missing bound + eviction,
  * it does not change what gets cached or when. Same hygiene doctrine
  * as [[ServedMemo]] (which owns the persisted-INDEX temp roots; this
  * owns in-memory staged plans).
  */
private[graft] object StagedCache {

  private val owned =
    new java.util.LinkedHashMap[String, DataFrame](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, DataFrame]): Boolean = {
        val evict = size() > graft.Dials.StagedPersistCap
        if (evict) {
          try e.getValue.unpersist(false) catch { case _: Throwable => () }
        }
        evict
      }
    }

  /** Persist `df` with this registry as the owner. `dir` + `stage` key
    * the entry (plus the owning session, so two sessions over one
    * fixture dir do not shadow each other's refs). */
  def stage(dir: String, stage: String, df: DataFrame): DataFrame =
    synchronized {
      val key =
        s"${org.apache.spark.sql.graft.shims.sessionUUID(df.sparkSession)}|$dir|$stage"
      owned.remove(key) // refresh LRU position; CacheManager dedupes the re-persist
      val p = df.persist()
      owned.put(key, p)
      p
    }

  /** Live owned-persist count — the bench's between-query audit compares
    * this to the CacheManager's plan count so an UNOWNED persist (the
    * accumulation the old between-query clearCache masked) is visible. */
  def ownedCount: Int = synchronized(owned.size())
}
