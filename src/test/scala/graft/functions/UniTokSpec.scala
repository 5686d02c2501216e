package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSession

/** The `uni` tokenizer's cross-engine contract ([[UniTokens]] /
  * [[graft.Tok]]): expected token arrays below are EXACTLY what the DuckDB
  * twin `list_filter(regexp_split_to_array(lower(t), '[^\p{L}\p{N}]+'),
  * gtk -> gtk <> '')` produced when probed (r11, DuckDB 1.x) on the same
  * strings — the two engines are coupled through these shared vectors.
  * Covers the divergence traps the implementation notes call out: SIMPLE
  * case mapping (İ → "i", one codepoint — a full-mapping toLowerCase
  * would emit i + combining dot and split on it), letter-number category
  * edges (Ⅳ is Nl, underscore is Pc and splits), supplementary-plane
  * round-tripping, and the fixture-equivalence fact the driver gate's
  * hash-stability rests on (single-space lowercase ASCII ⇒ uni ≡ ws).
  */
class UniTokSpec extends AnyFunSuite {
  import TestSession.spark
  import spark.implicits._

  private val vectors: Seq[(String, Seq[String])] = Seq(
    "Hello, World! 123" -> Seq("hello", "world", "123"),
    "état-Œuvre  café" -> Seq("état", "œuvre", "café"),
    "foo_bar baz9" -> Seq("foo", "bar", "baz9"),
    "中文 分词123x" -> Seq("中文", "分词123x"),
    "ΑΒΓ δε" -> Seq("αβγ", "δε"),
    "" -> Seq(),
    "  ...  " -> Seq(),
    "İstanbul ROMA Ⅳ" -> Seq("istanbul", "roma", "ⅳ"),
    "don't stop-me now" -> Seq("don", "t", "stop", "me", "now"),
    "ß Fußball" -> Seq("ß", "fußball"),
    // supplementary plane: 𝔘 (U+1D518, MATHEMATICAL FRAKTUR CAPITAL U, Lo
    // with no lowercase) must ride through codePoint iteration un-mangled
    "a𝔘b c" -> Seq("a𝔘b", "c"))

  test("uni tokens match the probed DuckDB twin on every vector, both exec paths") {
    for (codegen <- Seq("true", "false")) {
      spark.conf.set("spark.sql.codegen.wholeStage", codegen)
      try {
        val got = vectors.map(_._1).toDF("text")
          .select(Text.uniTokens(col("text")).as("toks"))
          .collect().map(_.getSeq[String](0).toSeq)
        vectors.zip(got).foreach { case ((in, want), t) =>
          assert(t == want, s"codegen=$codegen input=$in")
        }
      } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    }
  }

  test("null text stays null") {
    val r = Seq[(java.lang.Long, String)]((1L, null), (2L, "Ok Then"))
      .toDF("id", "text")
      .select(Text.uniTokens(col("text")).as("toks"))
      .collect().map(r => Option(r.get(0)))
    assert(r(0).isEmpty && r(1).nonEmpty)
  }

  test("fixture equivalence: uni ≡ ws token streams on the synthetic corpus") {
    val docs = graft.Tables.documents(spark, TestSession.sf)
    val n = docs.select(Text.uniTokens(col("text")).as("u"),
        split(col("text"), " ").as("w"))
      .filter(not(col("u") === col("w"))).count()
    assert(n == 0L)
  }
}
