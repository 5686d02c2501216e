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

  test("native window-min == HOF chain on the real winnow hash arrays, both exec paths") {
    val W = 5
    val ghash = graft.Tables.documents(spark, TestSession.sf)
      .withColumn("toks", split(col("text"), " "))
      .filter(size(col("toks")) >= 4)
      .withColumn("ghash",
        transform(Text.shingles(col("toks"), 4), s => Vectors.md5Prefix48(s)))
    val hofFps = expr(
      s"transform(sequence(1, greatest(size(ghash) - ${W - 1}, 1)), " +
        s"j -> array_min(slice(ghash, j, $W)))")
    for (codegen <- Seq("true", "false")) {
      spark.conf.set("spark.sql.codegen.wholeStage", codegen)
      try {
        val diff = ghash
          .select(Text.windowMin(col("ghash"), W).as("a"), hofFps.as("b"))
          .filter(col("a") =!= col("b")).count()
        assert(diff == 0, s"codegen=$codegen: native window-min != HOF")
      } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    }
  }

  test("window-min edges: n < w clamps to one global min; duplicates; empty") {
    def wm(xs: Seq[Long], w: Int): Seq[Long] =
      Seq(Tuple1(xs)).toDF("a")
        .select(Text.windowMin(col("a"), w).as("m")).head.getSeq[Long](0)
    assert(wm(Seq(5L, 3L, 9L), 5) == Seq(3L))                   // clamp
    assert(wm(Seq(4L, 4L, 4L, 4L), 2) == Seq(4L, 4L, 4L))      // duplicates
    assert(wm(Seq(9L, 1L, 8L, 7L, 2L, 6L), 3) == Seq(1L, 1L, 2L, 2L)) // mixed
    assert(wm(Seq(1L, 2L, 3L, 4L), 1) == Seq(1L, 2L, 3L, 4L))  // w = 1
    assert(wm(Seq.empty[Long], 3) == Seq.empty[Long])          // empty
  }

  test("native simhash32 == explode/groupBy formulation on fixture text, both exec paths") {
    val docs = graft.Tables.documents(spark, TestSession.sf)
    val tok = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .withColumn("x", Vectors.md5Prefix48(col("tok")))
    val bitSums = (0 until 32).map(j =>
      sum(when(shiftright(col("x"), j).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"s$j"))
    val fp = (0 until 32)
      .map(j => when(col(s"s$j") > 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce(_ + _)
    val viaAgg = tok.groupBy(col("doc_id")).agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"), fp.as("simhash"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (codegen <- Seq("true", "false")) {
      spark.conf.set("spark.sql.codegen.wholeStage", codegen)
      try {
        val native = docs
          .select(col("doc_id"), Text.simhash32(split(col("text"), " ")).as("s"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(native == viaAgg, s"codegen=$codegen: native != agg formulation")
      } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    }
  }

  test("native feature-hash == explode/groupBy formulation on fixture text, both exec paths") {
    val docs = graft.Tables.documents(spark, TestSession.sf)
    val Dims = 64
    val viaAgg = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
      .withColumn("h", Vectors.md5Prefix48(col("t")))
      .withColumn("idx", (col("h") % Dims).cast("int"))
      .withColumn("sgn",
        when(expr(s"(h DIV $Dims) % 2") === 0, 1L).otherwise(-1L))
      .groupBy(col("doc_id"), col("idx"))
      .agg(sum(col("sgn")).as("val"))
      .filter(col("val") =!= 0)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    for (codegen <- Seq("true", "false")) {
      spark.conf.set("spark.sql.codegen.wholeStage", codegen)
      try {
        val native = docs
          .select(col("doc_id"),
            posexplode(Text.featureHash(split(col("text"), " "), Dims)))
          .filter(col("col") =!= 0)
          .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
        assert(native == viaAgg, s"codegen=$codegen: native != agg formulation")
      } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    }
  }

  test("native hash48-map == transform HOF on fixture shingle arrays, both exec paths") {
    val sh = graft.Tables.documents(spark, TestSession.sf)
      .withColumn("toks", split(col("text"), " "))
      .filter(size(col("toks")) >= 4)
      .withColumn("s", Text.shingles(col("toks"), 4))
    for (codegen <- Seq("true", "false")) {
      spark.conf.set("spark.sql.codegen.wholeStage", codegen)
      try {
        val diff = sh
          .select(Text.hash48Map(col("s")).as("a"),
            transform(col("s"), x => Vectors.md5Prefix48(x)).as("b"))
          .filter(col("a") =!= col("b")).count()
        assert(diff == 0, s"codegen=$codegen: native hash48-map != HOF")
      } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    }
  }

  test("native fingerprint48 == aggregate/zip_with fold on fixture text, both exec paths") {
    val P = 1000000007L
    val docs = graft.Tables.documents(spark, TestSession.sf)
      .withColumn("toks", split(col("text"), " "))
    val hof = expr(
      "aggregate(zip_with(toks, sequence(1, size(toks)), " +
        "(t, p) -> cast(conv(substring(md5(t), 1, 12), 16, 10) as bigint) * (((p-1) % 64) + 1)), " +
        s"cast(0 as bigint), (acc, v) -> (acc + v) % $P) % $P")
    for (codegen <- Seq("true", "false")) {
      spark.conf.set("spark.sql.codegen.wholeStage", codegen)
      try {
        val diff = docs
          .select(Text.fingerprint48(col("toks"), P).as("a"), hof.as("b"))
          .filter(col("a") =!= col("b")).count()
        assert(diff == 0, s"codegen=$codegen: native fingerprint48 != HOF fold")
      } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    }
  }

  test("native count-in == size(filter(IN)) for every q29 marker set, both exec paths") {
    val sets = Seq(
      Seq("the", "a", "of", "and", "to", "in"),
      Seq("the", "a", "of", "and"),
      Seq("el", "la", "de", "y"),
      Seq("der", "die", "das", "und"))
    val docs = graft.Tables.documents(spark, TestSession.sf)
      .withColumn("toks", split(col("text"), " "))
    for (codegen <- Seq("true", "false")) {
      spark.conf.set("spark.sql.codegen.wholeStage", codegen)
      try {
        for (s <- sets) {
          val inList = s.map(x => s"'$x'").mkString(", ")
          val diff = docs
            .select(Text.countIn(col("toks"), s).as("a"),
              size(expr(s"filter(toks, x -> x IN ($inList))")).as("b"))
            .filter(col("a") =!= col("b")).count()
          assert(diff == 0, s"codegen=$codegen set=$s: native count-in != HOF")
        }
      } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    }
  }

  test("bigrams via 2-shingles + substring_index == the struct transform, incl. empty tokens") {
    val fixture = graft.Tables.documents(spark, TestSession.sf)
      .select(split(col("text"), " ").as("toks"))
      .union(Seq("a  b", " x", "y ", "p q r").toDF("text")
        .select(split(col("text"), " ").as("toks")))
      .filter(size(col("toks")) >= 2)
    val viaStruct = fixture
      .select(explode_outer(expr(
        "transform(sequence(1, size(toks) - 1), " +
          "i -> named_struct('w1', toks[i - 1], 'w2', toks[i]))")).as("bg"))
      .select(col("bg.w1"), col("bg.w2"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq.sorted
    val viaShingles = fixture
      .select(explode_outer(Text.shingles(col("toks"), 2)).as("bg"))
      .select(substring_index(col("bg"), " ", 1).as("w1"),
        substring_index(col("bg"), " ", -1).as("w2"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq.sorted
    assert(viaShingles == viaStruct)
  }

  test("native bloom-none == !exists(might_contain) HOF on a real benchmark bloom, both exec paths") {
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal => CatLit}
    import org.apache.spark.sql.graft.shims
    val k = graft.operators.Decontamination.ShingleK
    val docs = graft.Tables.documents(spark, TestSession.sf)
    val bloom = graft.streaming.BloomGate.build(docs.filter(col("doc_id") < 50))
    val mightHit = (s: org.apache.spark.sql.Column) => shims.column(
      new BloomFilterMightContain(CatLit(bloom), shims.expression(xxhash64(s))))
    val sh = Text.shingles(split(col("text"), " "), k)
    for (codegen <- Seq("true", "false")) {
      spark.conf.set("spark.sql.codegen.wholeStage", codegen)
      try {
        val diff = docs
          .select((!exists(sh, mightHit)).as("a"), Text.bloomNone(sh, bloom).as("b"))
          .filter(col("a") =!= col("b")).count()
        assert(diff == 0, s"codegen=$codegen: native bloom-none != exists HOF")
      } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    }
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

  test("native luhn-card count == HOF reference on the q111 corpus, " +
    "both exec paths; null propagates") {
    // the interpreted reference implementation the native expression
    // replaced (plan-contract ban: filter/transform/aggregate are
    // CodegenFallback) — kept here as the equivalence oracle
    def hofLuhn(text: org.apache.spark.sql.Column) =
      size(filter(
        transform(regexp_extract_all(text, lit(LuhnCardCount.CardRe), lit(0)),
          c => regexp_replace(c, "[^0-9]", "")),
        ds => {
          val n = length(ds)
          aggregate(sequence(lit(1), n), lit(0), (acc, i) => {
            val dg = ds.substr(i, lit(1)).cast("int")
            val dbl = dg * 2
            acc + when((n - i) % 2 === 1,
              when(dbl > 9, dbl - 9).otherwise(dbl)).otherwise(dg)
          }) % 10 === 0
        }))
    // q111's decorated corpus: every doc carries the Luhn-negative decoy,
    // doc_id%9==4 docs add a valid PAN — both regimes exercised
    val deco = graft.operators.PiiScan.decorated(
      graft.Tables.documents(spark, TestSession.sf))
    for (codegen <- Seq("true", "false")) {
      spark.conf.set("spark.sql.codegen.wholeStage", codegen)
      try {
        val diff = deco
          .select(Text.luhnCards(col("text")).as("a"), hofLuhn(col("text")).as("b"))
          .filter(col("a") =!= col("b")).count()
        assert(diff == 0, s"codegen=$codegen: native != HOF reference")
      } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    }
    val vals = Seq(Tuple1("no cards here"), Tuple1(null: String)).toDF("text")
      .select(Text.luhnCards(col("text")).as("n")).collect()
    assert(vals(0).getInt(0) == 0)
    assert(vals(1).isNullAt(0))
  }
}
