package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.Decontamination

/** Benchmark decontamination at INGEST — the streaming complement of the
  * batch gate (q57 report / q81 exact clean-corpus export): documents
  * stream in, and each row is admitted only if NONE of its shingles hits
  * the benchmark Bloom filter.
  *
  * The decision is deliberately bloom-ONLY, the standard production
  * tradeoff for an at-ingest filter: a Bloom filter has NO false
  * negatives, so no contaminated document ever passes the gate — the
  * failure mode that corrupts an eval — while the false-positive trickle
  * (bitmap-rate, config-bounded) drops a handful of clean documents,
  * which a corpus survives. The exact decision needs the verify join
  * against the full benchmark shingle table (q81); at ingest that join
  * would make every micro-batch pay a stream-static shuffle, for a
  * correction the pipeline re-applies in batch anyway.
  *
  * Scale shape: the bitmap is built ONCE in batch (distributed
  * `BloomFilterAggregate` merge, one config-bounded binary on the
  * driver) and embedded as a LITERAL in the stream's filter — each
  * executor evaluates a pure per-row predicate (shingle → hash →
  * might-contain, short-circuiting `exists`) with zero state reads, zero
  * joins, zero shuffles per batch. Benchmark updates mean rebuilding one
  * bitmap and restarting the query — not rewriting state.
  */
object BloomGate {

  /** One config-bounded bitmap over the benchmark docs' distinct
    * [[Decontamination.ShingleK]]-token shingles. Batch-side, run once. */
  def build(benchDocs: DataFrame): Array[Byte] = {
    import org.apache.spark.sql.catalyst.expressions.{Literal => CatLit}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.graft.shims
    val k = Decontamination.ShingleK
    val sh = benchDocs
      .withColumn("t", graft.Tok.toksText)
      .filter(size(col("t")) >= k)
      .select(explode(array_distinct(
        graft.functions.Text.shingles(col("t"), k))).as("s"))
      .distinct()
    val agg = new BloomFilterAggregate(
      shims.expression(xxhash64(col("s"))),
      CatLit(Decontamination.BloomItems),
      CatLit(Decontamination.BloomBits)).toAggregateExpression()
    sh.agg(shims.column(agg).as("bf")).head.getAs[Array[Byte]](0)
  }

  /** TRUE when `textCol` shares no shingle with the bloom — a pure
    * per-row scalar (one short-circuiting codegen pass over the shingle
    * array, native [[graft.functions.BloomNone]] — the `exists` HOF it
    * replaced was an interpreted dispatch per shingle in the ingest hot
    * loop), legal anywhere a streaming filter is. Docs too short to carry
    * a shingle are clean by definition (the native shingler is total:
    * empty below k), and so are null-text docs (the coalesce below —
    * split(null) would otherwise propagate null through the predicate and
    * silently DROP the row, diverging from batch q81 which admits them). */
  def cleanPredicate(bloom: Array[Byte], textCol: Column): Column =
    coalesce(
      graft.functions.Text.bloomNone(
        graft.functions.Text.shingles(graft.Tok.toks(textCol), Decontamination.ShingleK),
        bloom),
      lit(true))

  /** The gate itself: admit only bloom-clean rows. Works identically on
    * a static frame and a streaming one (pure row-local predicate). */
  def gate(docs: DataFrame, bloom: Array[Byte], textCol: String = "text"): DataFrame =
    docs.filter(cleanPredicate(bloom, col(textCol)))
}
