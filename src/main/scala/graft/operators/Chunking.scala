package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Context-window chunking — the step between curation and the trainer:
  * every document is cut into fixed-size token windows (CHUNK tokens) with
  * a stride < chunk so consecutive windows overlap (the standard way to
  * keep boundary context when a doc exceeds the model's context length).
  * A trailing window whose tokens are all inside the previous window (its
  * size ≤ the overlap) is dropped — it would be pure duplication.
  *
  * Scale shape: this is a pure per-row explode — the stride positions come
  * from `sequence` and the window text from `slice`, all inside
  * whole-stage codegen, so chunking 100 TB of documents is ZERO shuffles
  * and the output amplification is the predictable ×(n_tokens / stride).
  * No window function, no join, no corpus-wide anything; partition count
  * and pruning are whatever the scan gives.
  */
object Chunking {

  /** context length in tokens */
  val Chunk = 32
  /** window start stride; overlap = Chunk - Stride = 8 tokens */
  val Stride = 24

  // ---------------------------------------------------------------- q61

  /** One row per (doc, window): ordinal, start offset, window size, and
    * the window text itself. */
  def q61ContextChunks(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("t", graft.Tok.toksText)
      .withColumn("start",
        explode(expr(s"sequence(0, size(t) - 1, $Stride)")))
      .withColumn("chunk_idx", expr(s"start DIV $Stride").cast("int"))
      .withColumn("chunk", expr(s"slice(t, start + 1, $Chunk)"))
      .withColumn("n_chunk_tokens", size(col("chunk")))
      // a runt window fully contained in its predecessor (≤ overlap tokens)
      // is dropped; chunk 0 always survives (short docs = one window)
      .filter(col("chunk_idx") === 0 ||
        col("n_chunk_tokens") > Chunk - Stride)
      .select(col("doc_id"), col("chunk_idx"), col("start").as("start_tok"),
        col("n_chunk_tokens"), array_join(col("chunk"), " ").as("chunk_text"))
      .orderBy(col("doc_id"), col("chunk_idx"))

  def q61Sql: String =
    s"""WITH t AS (
       |  SELECT doc_id, ${graft.Tok.sqlText} AS t FROM documents
       |), c AS (
       |  SELECT doc_id, CAST(s AS INT) AS start_tok,
       |    CAST(s // $Stride AS INT) AS chunk_idx,
       |    list_slice(t, CAST(s AS INT) + 1, CAST(s AS INT) + $Chunk) AS chunk
       |  FROM t, unnest(generate_series(0, len(t) - 1, $Stride)) AS g(s)
       |)
       |SELECT doc_id, chunk_idx, start_tok,
       |  CAST(len(chunk) AS INT) AS n_chunk_tokens,
       |  array_to_string(chunk, ' ') AS chunk_text
       |FROM c
       |WHERE chunk_idx = 0 OR len(chunk) > ${Chunk - Stride}
       |ORDER BY doc_id, chunk_idx""".stripMargin
}
