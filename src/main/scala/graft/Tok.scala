package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{col, split}

/** THE tokenizer — one dial, two engines. Every text operator (TF/TF-IDF,
  * BM25, shingling → MinHash/winnow/decon, language ID, PMI, packing
  * budgets, dup spans) tokenizes through [[toks]], and every DuckDB oracle
  * through [[sql]], so the two sides can never disagree about what a
  * "token" is.
  *
  * Modes (env `SPARK_GRAFT_TOKENIZER`):
  *  - `uni` (default): casefolded maximal Unicode letter/number runs —
  *    [[graft.functions.UniTokens]] natively on the Spark side,
  *    `list_filter(regexp_split_to_array(lower(t), '[^\p{L}\p{N}]+'),
  *    gtk -> gtk <> '')` in DuckDB. The honest tokenizer for real corpora:
  *    punctuation-delimited, case-insensitive, script-agnostic.
  *  - `ws`: literal single-space splitting (`split(t, ' ')` /
  *    `string_split(t, ' ')`) — the pre-r11 behavior, kept for corpora
  *    that are already tokenized text joined by spaces.
  *
  * On the synthetic fixtures (single-space-joined lowercase ASCII words,
  * no punctuation — verified at sf0.01) the two modes produce IDENTICAL
  * token streams, so the driver gate pins both: every oracle hash is
  * mode-invariant on fixture data, and UniTokSpec pins the `uni` semantics
  * where the modes differ (punctuation, case, accents, CJK, numerals).
  *
  * The dial is read once per JVM (oracle SQL builders are static); the
  * plans it shapes are built driver-side, so executors never read it.
  */
object Tok {
  val Mode: String = sys.env.getOrElse("SPARK_GRAFT_TOKENIZER", "uni") match {
    case m @ ("uni" | "ws") => m
    case other => throw new IllegalArgumentException(
      s"SPARK_GRAFT_TOKENIZER must be uni|ws, got $other")
  }

  /** Token array of a text column. */
  def toks(text: Column): Column = Mode match {
    case "uni" => graft.functions.Text.uniTokens(text)
    case "ws"  => split(text, " ")
  }

  /** Tokens of the conventional `text` column. */
  def toksText: Column = toks(col("text"))

  /** DuckDB twin of [[toks]] over SQL expression `expr`. */
  def sql(expr: String): String = Mode match {
    case "uni" =>
      s"list_filter(regexp_split_to_array(lower($expr), '[^\\p{L}\\p{N}]+'), gtk -> gtk <> '')"
    case "ws" => s"string_split($expr, ' ')"
  }

  /** [[sql]] of the conventional `text` column. */
  def sqlText: String = sql("text")
}
