package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSession

/** graft_shingles ≡ the HOF chain it replaces — on the HOF chain's
  * defined domain (size ≥ k) for every k in use, over the real fixture
  * text, on BOTH execution paths (whole-stage codegen on and off). Plus
  * the totality extension (size < k ⇒ empty, no descending-sequence
  * trap) and null propagation.
  */
class TextExpressionsSpec extends AnyFunSuite {
  import TestSession.spark
  import spark.implicits._

  private def hof(k: Int) = expr(
    s"transform(sequence(1, size(t) - ${k - 1}), " +
      s"i -> concat_ws(' ', slice(t, i, $k)))")

  test("native shingles == HOF chain on fixture text, k in {2,3,4}, both exec paths") {
    val docs = graft.Tables.documents(spark, TestSession.sf)
      .withColumn("t", split(col("text"), " "))
    for (codegen <- Seq("true", "false")) {
      spark.conf.set("spark.sql.codegen.wholeStage", codegen)
      try {
        for (k <- Seq(2, 3, 4)) {
          val diff = docs.filter(size(col("t")) >= k)
            .select(Text.shingles(col("t"), k).as("a"), hof(k).as("b"))
            .filter(col("a") =!= col("b"))
            .count()
          assert(diff == 0, s"k=$k codegen=$codegen: native != HOF")
        }
      } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    }
  }

  test("total below k: empty array, not a descending-sequence artifact") {
    val rows = Seq("a b c", "a", "").toDF("text")
      .select(Text.shingles(split(col("text"), " "), 4).as("s"))
      .collect().map(_.getSeq[String](0))
    assert(rows.forall(_.isEmpty))
    val one = Seq("w x y z").toDF("text")
      .select(Text.shingles(split(col("text"), " "), 4).as("s"))
      .head.getSeq[String](0)
    assert(one == Seq("w x y z"))
  }

  test("null array propagates; SQL registration serves the same expression") {
    val df = Seq(Tuple1(Seq("a", "b", "c")), Tuple1(null: Seq[String]))
      .toDF("t")
    val vals = df.select(Text.shingles(col("t"), 2).as("s")).collect()
    assert(vals(0).getSeq[String](0) == Seq("a b", "b c"))
    assert(vals(1).isNullAt(0))

    Vectors.register(spark) // graft_dot; shingles goes via extensions —
    // register a temp twin here to pin the SQL path without a new session
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry.createOrReplaceTempFunction(
        "graft_shingles",
        exprs => Shingles(exprs.head,
          exprs(1).eval().asInstanceOf[Number].intValue()),
        "built-in")
    val viaSql = spark.sql(
      "SELECT graft_shingles(array('x','y','z'), 2) AS s").head.getSeq[String](0)
    assert(viaSql == Seq("x y", "y z"))
  }
}
