package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSession

/** [[KMinLongs]] (`graft_kmin`) pinned against the definition — "sorted
  * array of the k smallest DISTINCT values" — by a driver-side replay, and
  * pinned LAYOUT-INVARIANT: the same multiset through 1, 3, and 8
  * partitions (different merge trees, partial-buffer serialize round
  * trips) must produce identical results. Plus the edges the buffer logic
  * owns: duplicates collapse, nulls skip, under-k groups return their full
  * distinct set, k = 1 degenerates to min.
  */
class SketchSpec extends AnyFunSuite {
  import TestSession.spark
  import spark.implicits._

  private def expected(xs: Seq[Long], k: Int): Seq[Long] =
    xs.distinct.sorted.take(k)

  private val rng = new scala.util.Random(42)
  private val data: Seq[Long] =
    Seq.fill(5000)(rng.nextLong(1L << 48)) ++ Seq.fill(2000)(rng.nextLong(64))

  test("k smallest distinct == driver replay, invariant across layouts") {
    for (k <- Seq(1, 16, 256); parts <- Seq(1, 3, 8)) {
      val got = data.toDF("v").repartition(parts)
        .agg(Sketches.kmin(col("v"), k).as("m"))
        .head().getSeq[Long](0)
      assert(got == expected(data, k), s"k=$k parts=$parts")
    }
  }

  test("grouped: per-group k-mins exact, under-k group returns full set") {
    val rows = Seq.tabulate(1000)(i => ("big", (i % 400).toLong)) ++
      Seq(("small", 7L), ("small", 3L), ("small", 7L))
    val got = rows.toDF("g", "v").repartition(5)
      .groupBy("g").agg(Sketches.kmin(col("v"), 16).as("m"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(got("big") == (0L until 16L))
    assert(got("small") == Seq(3L, 7L))
  }

  test("nulls are skipped, all-null group yields empty array") {
    val got = Seq[(String, java.lang.Long)](("a", 5L), ("a", null), ("b", null))
      .toDF("g", "v")
      .groupBy("g").agg(Sketches.kmin(col("v"), 4).as("m"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(got("a") == Seq(5L))
    assert(got("b") == Seq.empty)
  }

  test("SQL registration: graft_kmin callable from SQL") {
    // temp twin of the GraftExtensions injection (the TextExpressionsSpec
    // pattern — pins the SQL path without a new session)
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry.createOrReplaceTempFunction(
        "graft_kmin",
        exprs => KMinLongs(exprs.head,
          exprs(1).eval().asInstanceOf[Number].intValue()).toAggregateExpression(),
        "built-in")
    data.toDF("v").createOrReplaceTempView("kmv_vals")
    val got = spark.sql("SELECT graft_kmin(v, 8) AS m FROM kmv_vals")
      .head().getSeq[Long](0)
    assert(got == expected(data, 8))
  }

  test("GraftExtensions injection path: happy call resolves, wrong arity " +
    "and non-literal k raise the intended errors") {
    // the REAL deploy path (spark.sql.extensions), not the temp twin
    // above: a fresh session over the shared SparkContext with the
    // extensions object applied, so the injected builder — including its
    // arity check and integer-literal validation — is what resolves the
    // SQL call
    import org.apache.spark.sql.SparkSession
    val active = SparkSession.getActiveSession
    val dflt = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 =
      try SparkSession.builder()
        .master("local[8]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      finally {
        dflt.foreach(SparkSession.setDefaultSession)
        active.foreach(SparkSession.setActiveSession)
      }
    val enc = org.apache.spark.sql.Encoders.scalaLong
    s2.createDataset(data)(enc).toDF("v").createOrReplaceTempView("kmv_ext")
    val got = s2.sql("SELECT graft_kmin(v, 8) AS m FROM kmv_ext")
      .head().getSeq[Long](0)
    assert(got == expected(data, 8), "extensions-resolved call diverged")

    def failsWith(sql: String, fragment: String): Unit = {
      val e = intercept[Throwable](s2.sql(sql).collect())
      def messages(t: Throwable): Seq[String] =
        if (t == null) Nil
        else Option(t.getMessage).toSeq ++ messages(t.getCause)
      assert(messages(e).exists(_.contains(fragment)),
        s"expected '$fragment' in: ${messages(e).mkString(" | ")}")
    }
    failsWith("SELECT graft_kmin(v) FROM kmv_ext", "takes 2 args")
    failsWith("SELECT graft_kmin(v, v) FROM kmv_ext", "integer literal")
    // the other injected builders validate arity the same way — a call
    // with extra args must fail loudly, not silently drop them
    failsWith("SELECT graft_luhn_cards(CAST(v AS STRING), 1) FROM kmv_ext",
      "takes 1 arg")
  }
}
