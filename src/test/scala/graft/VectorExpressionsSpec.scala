package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Vectors

/** The native codegen dot product must be bit-identical to the higher-order
  * aggregate/zip_with fold (same left-to-right double accumulation), via
  * both the Column API and the SQL registry. */
class VectorExpressionsSpec extends AnyFunSuite {
  import TestSession.spark

  private def hofDot = expr(
    "aggregate(zip_with(embedding, embedding, (x, y) -> double(x) * double(y)), " +
      "cast(0 as double), (acc, v) -> acc + v)")

  test("graft_dot == HOF fold on every fixture embedding (Column API)") {
    val emb = Tables.embeddings(spark, TestSession.sf)
    val diff = emb
      .select(Vectors.dot(col("embedding"), col("embedding")).as("native"),
        hofDot.as("hof"))
      .filter(col("native") =!= col("hof"))
    assert(diff.count() == 0)
  }

  test("SQL registration: SELECT graft_dot(...) works and matches") {
    Vectors.register(spark)
    Tables.embeddings(spark, TestSession.sf).createOrReplaceTempView("emb_v")
    val rows = spark.sql(
      "SELECT vec_id, graft_dot(embedding, embedding) AS d FROM emb_v ORDER BY vec_id LIMIT 5")
      .collect()
    assert(rows.length == 5 && rows.forall(_.getDouble(1) > 0))
  }

  test("interpreted fallback equals codegen path") {
    val e = graft.functions.DotProductFloat(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(1.0f, 2.0f, 3.0f),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(4.0f, 5.0f, 6.0f),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)))
    assert(e.eval(null) == (4.0 + 10.0 + 18.0))
  }
}
