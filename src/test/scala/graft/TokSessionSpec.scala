package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The tokenizer dial is PER-SESSION since r12 (`spark.graft.tokenizer`
  * conf, env `SPARK_GRAFT_TOKENIZER` as the JVM default): a long-lived
  * multi-tenant JVM can serve a pre-tokenized corpus (`ws`) and a raw one
  * (`uni`) from two sessions at once. These pins exercise exactly that —
  * two sessions in one JVM with different modes — plus the resolution
  * order and the invalid-mode guard. */
class TokSessionSpec extends AnyFunSuite {
  import TestSession.spark

  private def toksOf(s: SparkSession, text: String): Seq[String] = {
    SparkSession.setActiveSession(s)
    try {
      import s.implicits._
      Seq(text).toDF("text").select(Tok.toksText.as("t"))
        .collect()(0).getSeq[String](0)
    } finally SparkSession.setActiveSession(spark)
  }

  test("two sessions in one JVM tokenize with different modes") {
    val raw = spark.newSession()           // default: env seed (uni here)
    val pre = spark.newSession()
    pre.conf.set(Tok.ModeConf, "ws")
    val text = "Hello, World-wide  Web"
    assert(toksOf(raw, text) === Seq("hello", "world", "wide", "web"))
    assert(toksOf(pre, text) === Seq("Hello,", "World-wide", "", "Web"))
  }

  test("the oracle twin follows the same per-session dial") {
    val pre = spark.newSession()
    pre.conf.set(Tok.ModeConf, "ws")
    SparkSession.setActiveSession(pre)
    try assert(Tok.sqlText == "string_split(text, ' ')")
    finally SparkSession.setActiveSession(spark)
    // back on the default session the mode is the env seed again
    assert(Tok.sqlText != "string_split(text, ' ')" ||
      sys.env.get("SPARK_GRAFT_TOKENIZER").contains("ws"))
  }

  test("an invalid per-session mode fails loudly at plan-build time") {
    val bad = spark.newSession()
    bad.conf.set(Tok.ModeConf, "bpe")
    SparkSession.setActiveSession(bad)
    try intercept[IllegalArgumentException](Tok.toksText)
    finally SparkSession.setActiveSession(spark)
  }
}
