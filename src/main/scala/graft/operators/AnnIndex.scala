package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types.{BooleanType, LongType, StructField, StructType}

/** The persisted-index lifecycle contract — everything
  * [[graft.streaming.IndexStream]] needs to maintain an index at ingest,
  * abstracted over WHICH serving tables the index owns: [[IvfIndex]]
  * persists the float assignment (the ANN compute leg), [[PqIndex]]
  * persists codes alongside it (the ANN memory leg), [[LexIndex]]
  * persists BM25 posting statistics (the lexical leg). Reference scope:
  * the reference ships no index serving; this family is north-star
  * scope (see [[Ivf]], [[Pq]], [[Retrieval]]).
  *
  * The trait owns the two crash-safety protocols, so every index family
  * gets them identically and a fix is a single-site change:
  *
  * '''Build epoch.''' `build` brackets the subclass's table publication
  * between two writes of a one-row meta table: a TOMBSTONE (done=false)
  * first, the commit (done=true) LAST. A crash mid-REBUILD of a
  * multi-table index would otherwise leave `isBuilt` true with
  * mixed-generation tables (new codebooks over old codes, new tf over
  * old df) and serve silently wrong answers; with the epoch guard the
  * torn rebuild reads as not-built, [[query]] refuses loudly, and the
  * owner re-drives `build`.
  *
  * '''Batch ledger.''' A batch id is committed to a ledger table only
  * AFTER every serving-table delta lands; [[hasBatch]] asks the ledger
  * (one small read), not the data tables — so a batch whose delta is
  * legitimately EMPTY in some table (a null-text micro-batch writes no
  * postings) still commits, instead of reading as absent forever and
  * re-driving on every restart. Within `addBatch`, each table append is
  * additionally guarded per table: a batch torn by a crash between a
  * multi-table index's appends (assignment landed, codes missing) is
  * COMPLETED by the re-drive — never skipped whole (dropping the
  * missing table's rows: for [[PqIndex]], candidates without codes
  * silently vanish from the ADC stage) nor re-run whole (duplicating
  * the table that did land). `build` and `addBatch` run under the
  * state lock (reentrant), so concurrent re-drives of the same batch
  * serialize instead of double-appending.
  */
trait AnnIndex {
  def spark: SparkSession

  /** The index's state root — also what callers lock to serialize
    * maintenance ([[graft.streaming.IndexStream]] locks THIS state, so
    * the lock and the writes can never target different roots). */
  def state: graft.streaming.StateDir

  /** Per-family table-name prefix; meta/ledger tables derive from it so
    * co-located index families cannot collide. */
  protected def prefix: String

  /** Publish every serving table for corpus `d` (invoked by [[build]] /
    * [[rebuildWarm]] inside the epoch bracket; deterministic training).
    * `warm` is empty on a cold build; on a warm rebuild it carries the
    * previous generation's snapshot of every [[warmStartTables]] entry,
    * localized BEFORE the tombstone — trainers seed from it instead of
    * their cold seed when the geometry still fits. */
  protected def publishTables(d: String, warm: Map[String, DataFrame]): Unit

  /** Which tables a warm rebuild snapshots from the previous generation
    * (name → read schema). Default: none — a family with no trainer
    * ([[Retrieval.LexIndex]]: BM25 statistics are corpus functions, not
    * fitted state) rebuilds identically warm or cold. */
  protected def warmStartTables: Seq[(String, StructType)] = Nil

  /** Append the batch's delta to every serving table, each append
    * guarded by [[tableFresh]] (invoked by [[addBatch]] after the
    * ledger check; `tag` is the batch_id column value to attach). */
  protected def appendDeltas(rows: DataFrame, batchId: Option[Long],
      tag: Column): Unit

  /** ANN/retrieval lookups served purely from the persisted tables
    * (invoked by [[query]] after the epoch check). */
  protected def serveTables(probeFrom: Long, nProbes: Long): DataFrame

  private def metaTable = s"${prefix}_build"
  private def ledgerTable = s"${prefix}_batches"

  private def oneRow(schema: StructType, values: Any*): DataFrame =
    spark.createDataFrame(
      java.util.Collections.singletonList(Row(values: _*)), schema)

  /** Deterministic batch training; publishes every serving table inside
    * the build-epoch bracket. Rebuilding re-trains from the current
    * corpus (the retrain path [[graft.streaming.DriftStream]] signals
    * for); a crash mid-rebuild leaves the tombstone, not a lie. */
  final def build(d: String): Unit = buildImpl(d, warm = false)

  /** [[build]] seeded from the PREVIOUS generation's trained state —
    * the production retrain path at 1e9 vectors: Lloyd started from the
    * old centroids converges in fewer/equal rounds than a cold
    * first-K-rows seed, and the old centroids are already near the
    * drifted optimum (the drift that triggered the retrain moved the
    * distribution, not replaced it). Falls back to a cold build when
    * nothing is built yet or the previous state no longer fits the
    * family's geometry (a family validates its own snapshot — dimension
    * change, empty table). Crash-safety is identical to [[build]]: the
    * snapshot is LOCALIZED (collected off the state tables) before the
    * tombstone lands, so a torn warm rebuild leaves the tombstone and a
    * re-drive (warm or cold) proceeds from clean state. */
  final def rebuildWarm(d: String): Unit = buildImpl(d, warm = true)

  private def buildImpl(d: String, warm: Boolean): Unit = state.locked {
    // snapshot BEFORE the tombstone: after it, this generation's tables
    // are fair game for overwrite, and a lazy read would see the new rows
    val seeds: Map[String, DataFrame] =
      if (warm && isBuilt) warmStartTables.flatMap { case (name, schema) =>
        val rows = state.read(name, schema).collect()
        if (rows.isEmpty) None
        else Some(name -> spark.createDataFrame(
          java.util.Arrays.asList(rows: _*), schema))
      }.toMap
      else Map.empty
    state.write(metaTable, oneRow(AnnIndex.BuildMetaSchema, Boolean.box(false)))
    // Batch ids are scoped to ONE build generation: publishTables fully
    // rewrites the serving tables (wiping the per-table tag guards), so
    // the ledger must restart empty too — otherwise a stream restarted
    // with a fresh checkpoint (batch ids from 0) against retained state
    // would find stale ledger rows and silently skip its first batches.
    // Inside the epoch bracket: a crash after this truncate leaves the
    // tombstone, so nothing serves or appends until a re-driven build.
    state.write(ledgerTable, spark.createDataFrame(
      java.util.Collections.emptyList[Row](), AnnIndex.LedgerSchema))
    publishTables(d, seeds)
    state.write(metaTable, oneRow(AnnIndex.BuildMetaSchema, Boolean.box(true)))
  }

  /** True once every serving table of ONE build generation is
    * published — false before the first build AND after a torn
    * rebuild. */
  final def isBuilt: Boolean =
    !state.read(metaTable, AnnIndex.BuildMetaSchema)
      .filter(col("done")).isEmpty

  /** Append NEW rows to every serving table against the FIXED trained
    * state — O(batch) write I/O, no retraining. With a `batchId` the
    * call is idempotent (ledger) and crash-completing (per-table
    * guards); without one (plain batch caller), deltas append
    * unconditionally, tagged null. Rows must be NEW ids — re-ingesting
    * an existing id double-counts; replays of the same batchId are what
    * the guard absorbs. */
  final def addBatch(rows: DataFrame, batchId: Option[Long] = None): Unit =
    state.locked {
      require(isBuilt, s"$prefix index not built — call build() first")
      if (!batchId.exists(hasBatch)) {
        val tag = batchId.fold(lit(null).cast(LongType))(id => lit(id))
        appendDeltas(rows, batchId, tag)
        batchId.foreach(id =>
          state.append(ledgerTable, oneRow(AnnIndex.LedgerSchema, Long.box(id))))
      }
    }

  /** Whether `batchId` is fully committed — the ledger row lands after
    * every delta, so a torn batch answers false until a re-driven
    * [[addBatch]] completes it, and a committed-but-empty batch answers
    * true. */
  final def hasBatch(batchId: Long): Boolean =
    !state.read(ledgerTable, AnnIndex.LedgerSchema)
      .filter(col("batch_id") === batchId).isEmpty

  /** Lookups served purely from the persisted tables; refuses loudly on
    * an unbuilt or torn-rebuild index instead of serving
    * mixed-generation answers. */
  final def query(probeFrom: Long, nProbes: Long): DataFrame = {
    require(isBuilt,
      s"$prefix index not built (or a rebuild was torn) — build() required")
    serveTables(probeFrom, nProbes)
  }

  /** Per-table half of the replay guard: true when `batchId`'s delta is
    * absent from `table` (always true for untagged batch callers). The
    * read scans only the chain's batch_id column — metadata-cheap next
    * to the batch's own work. */
  protected final def tableFresh(table: String, schema: StructType,
      batchId: Option[Long]): Boolean =
    batchId.forall(id =>
      state.read(table, AnnIndex.tagged(schema))
        .filter(col("batch_id") === id).isEmpty)
}

object AnnIndex {
  /** `schema` plus the ingest batch tag — the replay-guard read shape;
    * untagged (build-time) rows surface a null tag, and StateDir
    * compaction folds the chain with the incoming delta's (tagged)
    * schema, so the tags survive any fold. */
  def tagged(schema: StructType): StructType =
    StructType(schema.fields :+ StructField("batch_id", LongType))

  val BuildMetaSchema: StructType =
    StructType(Seq(StructField("done", BooleanType)))

  val LedgerSchema: StructType =
    StructType(Seq(StructField("batch_id", LongType)))
}
