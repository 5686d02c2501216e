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

  test("length mismatch and null elements go null, exactly like the HOF form") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(1.0f, 2.0f), Seq(3.0f, 4.0f)),          // clean: 11.0
      (2L, Seq(1.0f, 2.0f), Seq(3.0f)),                // length mismatch
      (3L, Seq(1.0f, 2.0f), Seq(3.0f, 4.0f, 5.0f)))    // mismatch, other side
      .toDF("id", "a", "b")
      // null element injected via SQL (Seq[Float] can't carry null)
      .union(Seq((4L, Seq(1.0f, 2.0f), Seq(1.0f, 2.0f))).toDF("id", "a", "b")
        .withColumn("b", expr("transform(b, (x, i) -> IF(i = 1, NULL, x))")))
    val hof = expr(
      "aggregate(zip_with(a, b, (x, y) -> double(x) * double(y)), " +
        "cast(0 as double), (acc, v) -> acc + v)")
    val rows = df.select(col("id"), Vectors.dot(col("a"), col("b")).as("native"), hof.as("hof"))
      .orderBy(col("id")).collect()
    assert(rows.forall(r => r.isNullAt(1) == r.isNullAt(2)))
    assert(!rows(0).isNullAt(1) && rows(0).getDouble(1) == 11.0)
    assert(rows.drop(1).forall(_.isNullAt(1)))
  }

  test("interpreted path: mismatch and null element also go null") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    def lit(a: Array[Any]) = Literal.create(a, ArrayType(FloatType))
    val mismatch = graft.functions.DotProductFloat(
      lit(Array[Any](1.0f, 2.0f)), lit(Array[Any](3.0f)))
    assert(mismatch.eval(null) == null)
    val nullElem = graft.functions.DotProductFloat(
      lit(Array[Any](1.0f, 2.0f)), lit(Array[Any](3.0f, null)))
    assert(nullElem.eval(null) == null)
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
  test("graft_md5_48 == conv(substring(md5)) built-in chain, incl. unicode/empty") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val strs = Seq("", "a", "hello world", "caf\u00e9 \u00fc\u00f1\u00ee",
      "\u65e5\u672c\u8a9e", "sp ace  s", "0123456789" * 30) ++
      (0 until 200).map(i => s"tok_$i suffix")
    val df = strs.toDF("s")
      .withColumn("native", graft.functions.Vectors.md5Prefix48(col("s")))
      .withColumn("builtin", conv(substring(md5(col("s")), 1, 12), 16, 10).cast("long"))
    assert(df.filter(col("native") =!= col("builtin")).count() == 0)
    assert(df.filter(col("native") < 0).count() == 0) // 48 bits: always positive
    // null in, null out
    val n = Seq[Option[String]](None).toDF("s")
      .select(graft.functions.Vectors.md5Prefix48(col("s"))).first()
    assert(n.isNullAt(0))
  }

  test("graft_vsub == zip_with float subtraction on every fixture embedding") {
    // the residual primitive must be bit-identical to the HOF form: one
    // float32 subtraction per element (q92's oracle contract relies on
    // both engines rounding the exact difference to float once)
    val emb = Tables.embeddings(spark, TestSession.sf)
    val a = emb.select(col("vec_id"), col("embedding").as("ea"))
    val b = emb.select((col("vec_id") + 1).as("vec_id"), col("embedding").as("eb"))
    val diff = a.join(b, "vec_id")
      .select(Vectors.sub(col("ea"), col("eb")).as("native"),
        expr("zip_with(ea, eb, (x, y) -> x - y)").as("hof"))
      .filter(col("native") =!= col("hof"))
    assert(diff.count() == 0)
  }

  test("graft_vsub null semantics: length mismatch and null elements go null") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(Option(1.5f), Option(2.25f)), Seq(Option(0.25f), Option(1.0f))),
      (2L, Seq(Option(1.0f), Option(2.0f)), Seq(Option(3.0f))), // length mismatch
      (3L, Seq(Option(1.0f), None), Seq(Option(3.0f), Option(4.0f))) // null element
    ).toDF("id", "a", "b")
      .select(col("id"), Vectors.sub(col("a"), col("b")).as("r"))
      .orderBy("id").collect()
    assert(df(0).getAs[scala.collection.Seq[Float]]("r") == Seq(1.25f, 1.25f))
    assert(df(1).isNullAt(1), "length mismatch must null the result")
    assert(df(2).isNullAt(1), "a null element must null the result")
  }

  test("graft_vsub interpreted fallback equals codegen path") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val mk = (xs: Array[Float]) =>
      Literal.create(ArrayData.toArrayData(xs), ArrayType(FloatType, false))
    val e = graft.functions.SubtractVectorsFloat(
      mk(Array(1.5f, 0.1f, -2.0f)), mk(Array(0.25f, 0.3f, 1.0f)))
    val got = e.eval(null).asInstanceOf[ArrayData].toFloatArray()
    assert(got.toSeq == Seq(1.5f - 0.25f, 0.1f - 0.3f, -2.0f - 1.0f))
  }

  test("graft_vmilli == transform(round(v*1000)) chain on every fixture embedding") {
    // the SQL chain q72's exploded form used per element — the native
    // vector form must match it value-for-value, incl. the HALF_UP
    // decimal rounding of Spark's round()
    val chain = expr(
      "transform(embedding, v -> CAST(round(CAST(v AS DOUBLE) * 1000, 0) AS BIGINT))")
    val diff = Tables.embeddings(spark, TestSession.sf)
      .select(Vectors.milli(col("embedding")).as("native"), chain.as("hof"))
      .filter(col("native") =!= col("hof"))
    assert(diff.count() == 0)
  }

  test("graft_vmilli rounding edges: halves, negatives, nulls") {
    import spark.implicits._
    val rows = Seq(
      (1L, Seq(0.0005f, -0.0005f, 0.0015f, -0.0015f, 1.0f)),
      (2L, Seq(0.49999997f, -0.49999997f)))
      .toDF("id", "v")
      .union(Seq((3L, Seq(1.0f))).toDF("id", "v")
        .withColumn("v", expr("transform(v, (x, i) -> IF(i = 0, NULL, x))")))
    val chain = expr(
      "transform(v, x -> CAST(round(CAST(x AS DOUBLE) * 1000, 0) AS BIGINT))")
    val got = rows.select(col("id"), Vectors.milli(col("v")).as("native"), chain.as("hof"))
      .orderBy("id").collect()
    // rows 1-2: native == per-element chain exactly
    (0 to 1).foreach { i =>
      assert(got(i).getAs[scala.collection.Seq[Long]]("native") ==
        got(i).getAs[scala.collection.Seq[Long]]("hof"))
    }
    // a null ELEMENT nulls the whole native vector (the fold-poisoning
    // contract every graft vector expression shares; transform keeps the
    // null in place instead — the downstream dot would poison there)
    assert(got(2).isNullAt(1))
  }

  test("graft_isectn == exploded-join pair count on random sorted multisets") {
    import spark.implicits._
    // the q27 exact-verify contract: |{(i,j): a_i = b_j}| — duplicate
    // values multiply run lengths exactly like an equi-join on the
    // exploded arrays. Deterministic pseudo-random multisets (seeded
    // LCG) exercise empty/disjoint/dup-heavy shapes.
    val rnd = new scala.util.Random(42)
    val cases = (0 until 50).map { i =>
      def arr() = Seq.fill(rnd.nextInt(12))(rnd.nextInt(8).toLong).sorted
      (i.toLong, arr(), arr())
    }
    val df = cases.toDF("id", "a", "b")
    val joinCount = expr(
      // per-row replica of the exploded equi-join count: for each element
      // of a, count its matches in b; sum
      "aggregate(transform(a, x -> size(filter(b, y -> y = x))), 0, (acc, v) -> acc + v)")
    val got = df.select(col("id"),
        Vectors.isectn(col("a"), col("b")).as("native"),
        joinCount.cast("long").as("joined"))
      .collect()
    got.foreach(r => assert(r.getLong(1) == r.getLong(2),
      s"row ${r.getLong(0)}: native ${r.getLong(1)} != join ${r.getLong(2)}"))
    // at least one case actually has duplicates on both sides
    assert(cases.exists { case (_, a, b) =>
      a.groupBy(identity).exists(_._2.size > 1) &&
        b.groupBy(identity).exists(_._2.size > 1) && a.toSet.intersect(b.toSet).nonEmpty
    })
  }

  test("graft_isectn null semantics and interpreted == codegen") {
    import spark.implicits._
    val edge = Seq(
      (1L, Seq(1L, 2L, 2L, 5L), Seq(2L, 2L, 2L, 5L, 9L)), // 2·3 + 1 = 7
      (2L, Seq.empty[Long], Seq(1L, 2L)))                  // empty -> 0
      .toDF("id", "a", "b")
      .union(Seq((3L, Seq(1L, 2L), Seq(1L, 2L))).toDF("id", "a", "b")
        .withColumn("b", expr("transform(b, (x, i) -> IF(i = 1, CAST(NULL AS BIGINT), x))")))
    val got = edge.select(col("id"), Vectors.isectn(col("a"), col("b")).as("n"))
      .orderBy("id").collect()
    assert(got(0).getLong(1) == 7L)
    assert(got(1).getLong(1) == 0L)
    assert(got(2).isNullAt(1), "a null element must null the result")
    // interpreted fallback: same run-product and null rules
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, LongType}
    val mk = (xs: Array[Long]) =>
      Literal.create(ArrayData.toArrayData(xs), ArrayType(LongType, false))
    val e = graft.functions.SortedIntersectCount(
      mk(Array(1L, 2L, 2L, 5L)), mk(Array(2L, 2L, 2L, 5L, 9L)))
    assert(e.eval(null) == 7L)
    val withNull = graft.functions.SortedIntersectCount(
      Literal.create(ArrayData.toArrayData(Array[Any](1L, null)), ArrayType(LongType, true)),
      mk(Array(1L)))
    assert(withNull.eval(null) == null)
  }

  test("graft_dotl == aggregate fold on milli vectors; null semantics") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, TestSession.sf)
      .select(Vectors.milli(col("embedding")).as("m"))
    val hof = expr(
      "aggregate(zip_with(m, m, (x, y) -> x * y), CAST(0 AS BIGINT), (acc, v) -> acc + v)")
    val diff = emb.select(Vectors.dotl(col("m"), col("m")).as("native"), hof.as("hof"))
      .filter(col("native") =!= col("hof"))
    assert(diff.count() == 0)
    val edge = Seq(
      (1L, Seq(2L, 3L), Seq(4L, 5L)),   // 23
      (2L, Seq(2L, 3L), Seq(4L)))       // length mismatch -> null
      .toDF("id", "a", "b")
      .select(col("id"), Vectors.dotl(col("a"), col("b")).as("d"))
      .orderBy("id").collect()
    assert(edge(0).getLong(1) == 23L && edge(1).isNullAt(1))
  }
}
