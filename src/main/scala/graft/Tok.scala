package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.{col, split}

/** THE tokenizer — one dial, two engines. Every text operator (TF/TF-IDF,
  * BM25, shingling → MinHash/winnow/decon, language ID, PMI, packing
  * budgets, dup spans) tokenizes through [[toks]], and every DuckDB oracle
  * through [[sql]], so the two sides can never disagree about what a
  * "token" is.
  *
  * Modes:
  *  - `uni` (default): casefolded maximal Unicode letter/number runs —
  *    [[graft.functions.UniTokens]] natively on the Spark side,
  *    `list_filter(regexp_split_to_array(lower(t), '[^\p{L}\p{N}]+'),
  *    gtk -> gtk <> '')` in DuckDB. The honest tokenizer for real corpora:
  *    punctuation-delimited, case-insensitive, script-agnostic.
  *  - `ws`: literal single-space splitting (`split(t, ' ')` /
  *    `string_split(t, ' ')`) — the pre-r11 behavior, kept for corpora
  *    that are already tokenized text joined by spaces.
  *
  * Resolution order (read at PLAN-BUILD time, per call): the ACTIVE
  * session's conf [[ModeConf]] if set, else env `SPARK_GRAFT_TOKENIZER`,
  * else `uni`. The conf layer makes the dial per-session — a long-lived
  * multi-tenant JVM can serve a pre-tokenized corpus (`ws`) and a raw one
  * (`uni`) from two sessions at once (pre-r12 the env was read once per
  * JVM and froze every session). Plans and oracle strings are built
  * driver-side, so executors never read the dial; the env default keeps
  * the Bench/Verify mains' behavior a pure function of their environment.
  *
  * On the synthetic fixtures (single-space-joined lowercase ASCII words,
  * no punctuation — verified at sf0.01) the two modes produce IDENTICAL
  * token streams on the `documents` table, so the driver gate pins both
  * there; the `documents_uni` side table (punctuated/mixed-case/non-ASCII,
  * q108+) is where the modes DIVERGE and `uni` semantics sit under the
  * oracle hash. UniTokSpec pins the per-string semantics (punctuation,
  * case, accents, CJK, numerals).
  */
object Tok {

  /** Per-session override of the tokenizer mode (`uni` | `ws`). */
  val ModeConf = "spark.graft.tokenizer"

  private def check(m: String): String = m match {
    case "uni" | "ws" => m
    case other => throw new IllegalArgumentException(
      s"tokenizer mode must be uni|ws, got $other")
  }

  /** JVM-wide default: the env seed (conf-less sessions and the static
    * oracle builders resolve here). */
  private val EnvMode: String =
    check(sys.env.getOrElse("SPARK_GRAFT_TOKENIZER", "uni"))

  /** The mode in effect for plans built RIGHT NOW: active session's conf,
    * else the env default. */
  def Mode: String =
    SparkSession.getActiveSession
      .flatMap(_.conf.getOption(ModeConf))
      .map(check)
      .getOrElse(EnvMode)

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
