package graft.operators

import org.apache.spark.sql.DataFrame

/** The persisted-ANN-index lifecycle contract — everything
  * [[graft.streaming.IndexStream]] needs to maintain an index at ingest,
  * abstracted over WHICH serving tables the index owns: [[IvfIndex]]
  * persists the float assignment (the compute leg), [[PqIndex]] persists
  * codes alongside it (the memory leg). Reference scope: the reference
  * ships no ANN; this family is north-star scope (see [[Ivf]], [[Pq]]).
  *
  * The multi-table indexes are why the replay contract lives HERE and
  * not in the stream wiring: a per-batch guard outside the index sees
  * "batch present" or "batch absent", but a crash between two table
  * appends leaves a batch HALF-present — and a whole-batch guard would
  * then either skip it forever (losing the missing table's rows: for
  * [[PqIndex]], candidates without codes silently vanish from the ADC
  * stage) or re-run it whole (duplicating the table that did land).
  * [[addBatch]] is therefore idempotent PER TABLE under a batch id, so
  * a re-driven batch completes exactly the missing appends.
  */
trait AnnIndex {
  /** Deterministic batch training; publishes every serving table to the
    * index's [[graft.streaming.StateDir]]. Rebuilding re-trains from
    * the current corpus (the retrain path [[graft.streaming.DriftStream]]
    * signals for). */
  def build(d: String): Unit

  /** True once every serving table is published. */
  def isBuilt: Boolean

  /** Append NEW vectors (vec_id, embedding) to every serving table,
    * assigned/encoded against the FIXED trained quantizers — O(batch)
    * write I/O, no retraining. With a `batchId`, the append is
    * idempotent per table: each serving table commits the batch at most
    * once, and a re-driven batch performs only the appends a previous
    * (crashed) attempt did not reach. Without one (plain batch caller),
    * the delta is appended unconditionally, tagged null. */
  def addBatch(newEmb: DataFrame, batchId: Option[Long] = None): Unit

  /** Whether EVERY serving table carries `batchId`'s delta — the replay
    * guard's question. A torn batch (crash mid-[[addBatch]]) answers
    * false until a re-driven [[addBatch]] completes it. */
  def hasBatch(batchId: Long): Boolean

  /** ANN lookups served purely from the persisted tables. */
  def query(probeFrom: Long, nProbes: Long): DataFrame
}
