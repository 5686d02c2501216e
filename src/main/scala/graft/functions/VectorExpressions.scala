package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.shims
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType, FloatType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the embedding hot path (SURVEY.md §7.4:
  * "custom Catalyst Expression only as a perf optimization" — this is it).
  *
  * `graft_dot(a, b)`: dot product of two float vectors, accumulated in
  * double LEFT TO RIGHT — exactly the fold order of the higher-order
  * `aggregate(zip_with(...))` form in [[graft.operators.Similarity]], so
  * the two paths are bit-identical and interchangeable under the oracle.
  *
  * Why an Expression and not a UDF: codegen emits a tight primitive loop
  * over the array (no boxing, no Row copying, no lambda-per-element
  * dispatch), and it stays inside the surrounding WholeStageCodegen stage,
  * unlike a Scala UDF which black-boxes the call. nullSafeEval provides the
  * interpreted fallback so the expression also works where codegen is off.
  */
case class DotProductFloat(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def isFloatArray(t: DataType) = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (isFloatArray(left.dataType) && isFloatArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot expects two array<float> args, got ${left.dataType} / ${right.dataType}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  /** Null even for non-null inputs: length mismatch / null element ⇒ null,
    * exactly like the HOF form (zip_with pads the shorter array with null,
    * the product poisons the fold). Without this the two "interchangeable"
    * paths diverge outside equal-length null-free arrays (ADVICE r2). */
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductFloat =
    copy(left = newLeft, right = newRight)
}

/** `graft_vsub(a, b)`: element-wise difference of two float vectors, as
  * float — the residual primitive of the IVFADC formulation
  * ([[graft.operators.Pq]] encodes `embedding − coarse_centroid`, Jégou
  * et al. 2011 §III). Each element is a single float32 subtraction
  * (round-to-nearest once), which DuckDB's `REAL - REAL` reproduces
  * bit-for-bit — so residual arrays are type- and bit-identical across
  * engines, like [[DotProductFloat]]'s double fold. Null semantics match
  * graft_dot: length mismatch or a null element nulls the whole result
  * (zip_with-equivalent), keeping the native and HOF forms
  * interchangeable. Native rather than `zip_with` so the PQ encode path
  * stays free of interpreted HigherOrderFunctions (PqSpec pins that).
  */
case class SubtractVectorsFloat(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def isFloatArray(t: DataType) = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (isFloatArray(left.dataType) && isFloatArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_vsub expects two array<float> args, got ${left.dataType} / ${right.dataType}")
  }
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "graft_vsub"
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    val out = new Array[Float](n)
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      out(i) = x.getFloat(i) - y.getFloat(i)
      i += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val out = ctx.freshName("out")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  float[] $out = new float[$n];
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $out[$i] = $a.getFloat($i) - $b.getFloat($i);
         |  }
         |  if (!${ev.isNull}) ${ev.value} =
         |    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SubtractVectorsFloat =
    copy(left = newLeft, right = newRight)
}

/** `graft_md5_48(s)`: the first 48 bits of md5(s) as a long — the dedup
  * family's shared string-hash primitive, natively. Bit-identical to the
  * built-in chain `conv(substring(md5(s), 1, 12), 16, 10)` (the first 12
  * hex chars ARE the first 6 digest bytes big-endian, < 2^48 so the long
  * is always positive), but skips materializing the 32-char hex string and
  * re-parsing it per row — the hot op under every MinHash shingle, SimHash
  * token, and hash-sampling row. The DuckDB oracles keep the hex-parse
  * form; equality of the two forms is pinned by VectorExpressionsSpec and
  * every q19/q20/q26/q27/q49/q50 oracle hash. */
case class Md5Prefix48(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_md5_48 expects a string arg, got $t")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_md5_48"

  override protected def nullSafeEval(input: Any): Any =
    Md5Prefix48.hash48(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Prefix48.hash48($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Prefix48 =
    copy(child = newChild)
}

object Md5Prefix48 {
  // MessageDigest is stateful and not thread-safe; one per executor thread,
  // reset per row — no per-row allocation, no hex-string round trip
  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 6 md5 bytes of the UTF-8 string, big-endian, as a long. */
  def hash48(s: UTF8String): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s.getBytes)
    ((d(0) & 0xffL) << 40) | ((d(1) & 0xffL) << 32) | ((d(2) & 0xffL) << 24) |
      ((d(3) & 0xffL) << 16) | ((d(4) & 0xffL) << 8) | (d(5) & 0xffL)
  }
}

/** `graft_sq8(v, mins, maxs)`: scalar (SQ8) quantization of a float
  * vector against per-dimension corpus bounds — q_i =
  * min(255, ⌊((v_i − mn_i) · 255) / (mx_i − mn_i)⌋), emitted CENTERED
  * (q_i − 128) as one SIGNED byte per dimension. Bytes because the
  * 4×-smaller representation is the whole point ([[graft.operators.Sq]]
  * scans 64 B/vector where floats are 256 B); centered because the
  * shortlist scorer is a raw integer dot over codes, and for near-
  * centered embedding dimensions (mid_d = (mn_d+mx_d)/2 ≈ 0, true of
  * any whitened/normalized corpus) Σ(q_p−128)(q_c−128) is proportional
  * to the true dot, while the UNcentered Σ q_p·q_c carries a per-
  * candidate bias term mn·Σv_c that can dominate the signal — the
  * standard symmetric-quantization formulation. Every step is a
  * correctly-rounded IEEE double op in a fixed order (widen, subtract,
  * ×255.0, divide, floor), so DuckDB's
  * `floor(((v − mn) * 255.0) / (mx − mn)) − 128` over the same floats
  * yields the same integer on both engines — the code table is
  * cross-engine deterministic without any float aggregation. A flat
  * dimension (mx = mn) quantizes to −128 rather than dividing by zero;
  * the upper clamp guards v = mx landing exactly on 255.0. Null
  * semantics match graft_dot: length mismatch or null element nulls
  * the result. */
case class Sq8Encode(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def isFloatArray(t: DataType) = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (Seq(first, second, third).forall(e => isFloatArray(e.dataType)))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_sq8 expects three array<float> args, got " +
        s"${first.dataType} / ${second.dataType} / ${third.dataType}")
  }
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_sq8"
  override def nullable: Boolean = true

  override protected def nullSafeEval(v: Any, mn: Any, mx: Any): Any =
    Sq8Encode.encode(v.asInstanceOf[ArrayData], mn.asInstanceOf[ArrayData],
      mx.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, mn, mx) => {
      s"""
         |${ev.value} = graft.functions.Sq8Encode.encode($v, $mn, $mx);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Sq8Encode =
    copy(first = f, second = s, third = t)
}

object Sq8Encode {
  /** Shared by codegen and interpreted eval — one body, zero drift. */
  def encode(v: ArrayData, mn: ArrayData, mx: ArrayData): Array[Byte] = {
    val n = v.numElements()
    if (mn.numElements() != n || mx.numElements() != n) return null
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      if (v.isNullAt(i) || mn.isNullAt(i) || mx.isNullAt(i)) return null
      val lo = mn.getFloat(i).toDouble
      val hi = mx.getFloat(i).toDouble
      val c =
        if (hi == lo) 0L
        else {
          // NaN ratio pins to code 0 (floor(NaN).toLong would also give 0 on
          // the JVM, but DuckDB's greatest() treats NaN as largest → 255;
          // the explicit branch keeps both engines at -128). ±Inf clamps.
          val r = (v.getFloat(i).toDouble - lo) * 255.0 / (hi - lo)
          val q = if (r.isNaN) 0L else math.floor(r).toLong
          if (q > 255L) 255L else if (q < 0L) 0L else q
        }
      out(i) = (c - 128L).toByte
      i += 1
    }
    out
  }
}

/** `graft_doti(a, b)`: integer dot product of two SQ8 code vectors
  * (signed centered bytes — [[Sq8Encode]]'s output), as a long — the
  * shortlist scorer of [[graft.operators.Sq]]. 64 signed-byte products
  * summed in int64: ORDER-FREE exactness (max term 128² · 64 dims ≪
  * 2⁶³), so unlike the float paths no fold-order contract is needed —
  * any engine summing the same codes gets the same integer. Native for
  * the same reason as graft_dot: the code scan is the hot brute loop
  * (N × dim byte reads per probe), and codegen keeps it a tight
  * primitive loop inside the enclosing WholeStageCodegen stage. Length
  * mismatch nulls the result (mirrors graft_dot). */
case class DotProductBytes(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_doti expects two binary args, got ${left.dataType} / ${right.dataType}")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_doti"
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Array[Byte]]
    val y = b.asInstanceOf[Array[Byte]]
    if (x.length != y.length) return null
    var acc = 0L
    var i = 0
    while (i < x.length) {
      acc += x(i).toLong * y(i).toLong
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |if ($a.length != $b.length) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $a.length; $i++) {
         |    $acc += (long)$a[$i] * (long)$b[$i];
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductBytes =
    copy(left = newLeft, right = newRight)
}

/** `graft_vmilli(v)`: a float vector quantized to integer MILLIUNITS —
  * per element, `CAST(round(CAST(v AS DOUBLE) * 1000, 0) AS BIGINT)` as
  * one codegen'd loop. The rounding is EXACTLY Spark's `round(x, 0)`
  * (decimal-string BigDecimal, HALF_UP — see [[RoundMilliVector.milli]])
  * so rewriting a `posexplode + round` chain to this expression cannot
  * move a single value; DuckDB's `round()` matches (every milliunit
  * oracle is pinned on that). The per-element BigDecimal is the price
  * of exactness — still ~element-count cheaper than streaming exploded
  * rows through the row machinery, which is what this exists to
  * replace ([[graft.operators.Centroids]] q72). Null semantics: a null
  * element nulls the whole result, matching `transform`'s poisoning of
  * the downstream fold. */
case class RoundMilliVector(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_vmilli expects array<float>, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_vmilli"
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) return null
      out(i) = RoundMilliVector.milli(x.getFloat(i))
      i += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val out = ctx.freshName("out")
      s"""
         |int $n = $a.numElements();
         |long[] $out = new long[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  $out[$i] = graft.functions.RoundMilliVector.milli($a.getFloat($i));
         |}
         |if (!${ev.isNull}) ${ev.value} =
         |  org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): RoundMilliVector = copy(child = newChild)
}

object RoundMilliVector {
  /** Spark's `CAST(round(CAST(v AS DOUBLE) * 1000, 0) AS BIGINT)` for
    * one element: Spark's Round on DoubleType goes through the
    * DECIMAL-STRING BigDecimal (`BigDecimal.valueOf`) with HALF_UP —
    * binary-nearest-to-half cases follow the printed decimal, which is
    * also what DuckDB's `round()` does. Called from generated code. */
  def milli(v: Float): Long =
    java.math.BigDecimal.valueOf(v.toDouble * 1000.0)
      .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue().toLong
}

/** `graft_dotl(a, b)`: integer dot product of two bigint vectors — the
  * exact-arithmetic companion of [[DotProductBytes]] for milliunit
  * vectors ([[RoundMilliVector]]): a pure long multiply-accumulate, so
  * the result is ORDER-FREE (integer addition associates — no float
  * summation contract needed anywhere it's used). Null semantics match
  * graft_dot: length mismatch or a null element nulls the result. */
case class DotProductLongs(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dotl expects two array<bigint> args, got ${left.dataType} / ${right.dataType}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_dotl"
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getLong(i) * y.getLong(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += $a.getLong($i) * $b.getLong($i);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductLongs =
    copy(left = newLeft, right = newRight)
}

/** `graft_isectn(a, b)`: multiset intersection size of two SORTED
  * array<bigint> — Σ over each shared value v of countA(v)·countB(v),
  * i.e. exactly the row count an equi-join on the exploded arrays
  * followed by a per-pair COUNT(*) would produce (the q27 exact-verify
  * contract: duplicate fingerprints, should a 48-bit collision ever
  * make one, multiply out the same way the join does — exactness by
  * construction, not by collision-improbability).
  *
  * The merge walk is O(|a|+|b|) with zero allocation, runs inside
  * WholeStageCodegen, and replaces a shingle-grain shuffle join +
  * re-aggregation with one per-row loop at candidate-pair grain.
  * CALLER CONTRACT: both arrays sorted ascending (`sort_array`) — the
  * walk silently undercounts on unsorted input. Null semantics match
  * the family doctrine: null array or any null element nulls the
  * result. */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_isectn expects two array<bigint> args, got ${left.dataType} / ${right.dataType}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_isectn"
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val na = x.numElements(); val nb = y.numElements()
    var k = 0
    while (k < na) { if (x.isNullAt(k)) return null; k += 1 }
    k = 0
    while (k < nb) { if (y.isNullAt(k)) return null; k += 1 }
    var i = 0; var j = 0; var acc = 0L
    while (i < na && j < nb) {
      val va = x.getLong(i); val vb = y.getLong(j)
      if (va < vb) i += 1
      else if (va > vb) j += 1
      else {
        var ca = 1L
        while (i + ca < na && x.getLong((i + ca).toInt) == va) ca += 1
        var cb = 1L
        while (j + cb < nb && y.getLong((j + cb).toInt) == va) cb += 1
        acc += ca * cb; i += ca.toInt; j += cb.toInt
      }
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val k = ctx.freshName("k"); val acc = ctx.freshName("acc")
      val va = ctx.freshName("va"); val vb = ctx.freshName("vb")
      val ca = ctx.freshName("ca"); val cb = ctx.freshName("cb")
      s"""
         |int $na = $a.numElements();
         |int $nb = $b.numElements();
         |for (int $k = 0; $k < $na; $k++) {
         |  if ($a.isNullAt($k)) { ${ev.isNull} = true; break; }
         |}
         |for (int $k = 0; !${ev.isNull} && $k < $nb; $k++) {
         |  if ($b.isNullAt($k)) { ${ev.isNull} = true; break; }
         |}
         |if (!${ev.isNull}) {
         |  int $i = 0; int $j = 0; long $acc = 0L;
         |  while ($i < $na && $j < $nb) {
         |    long $va = $a.getLong($i); long $vb = $b.getLong($j);
         |    if ($va < $vb) { $i++; }
         |    else if ($va > $vb) { $j++; }
         |    else {
         |      int $ca = 1;
         |      while ($i + $ca < $na && $a.getLong($i + $ca) == $va) $ca++;
         |      int $cb = 1;
         |      while ($j + $cb < $nb && $b.getLong($j + $cb) == $va) $cb++;
         |      $acc += (long) $ca * (long) $cb; $i += $ca; $j += $cb;
         |    }
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

/** Column-API and SQL-registry front doors for the vector expressions. */
object Vectors {

  /** Column API — no registration needed, usable in any plan. */
  def dot(a: Column, b: Column): Column =
    shims.column(DotProductFloat(shims.expression(a), shims.expression(b)))

  /** Element-wise float difference (see [[SubtractVectorsFloat]]). */
  def sub(a: Column, b: Column): Column =
    shims.column(SubtractVectorsFloat(shims.expression(a), shims.expression(b)))

  /** 48-bit md5 prefix of a string column (see [[Md5Prefix48]]). */
  def md5Prefix48(c: Column): Column =
    shims.column(Md5Prefix48(shims.expression(c)))

  /** SQ8 byte codes of a float vector against per-dim bounds
    * (see [[Sq8Encode]]). */
  def sq8(v: Column, mins: Column, maxs: Column): Column =
    shims.column(Sq8Encode(shims.expression(v), shims.expression(mins),
      shims.expression(maxs)))

  /** Integer dot of two SQ8 code vectors (see [[DotProductBytes]]). */
  def doti(a: Column, b: Column): Column =
    shims.column(DotProductBytes(shims.expression(a), shims.expression(b)))

  /** Float vector → integer milliunits (see [[RoundMilliVector]]). */
  def milli(v: Column): Column =
    shims.column(RoundMilliVector(shims.expression(v)))

  /** Integer dot of two bigint vectors (see [[DotProductLongs]]). */
  def dotl(a: Column, b: Column): Column =
    shims.column(DotProductLongs(shims.expression(a), shims.expression(b)))

  /** Multiset intersection size of two SORTED bigint arrays
    * (see [[SortedIntersectCount]]). */
  def isectn(a: Column, b: Column): Column =
    shims.column(SortedIntersectCount(shims.expression(a), shims.expression(b)))

  /** Session-scoped SQL registration: `SELECT graft_dot(a, b)`. */
  def register(spark: SparkSession): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry.createOrReplaceTempFunction(
        "graft_dot", exprs => DotProductFloat(exprs(0), exprs(1)), "built-in")
}

/** `spark.sql.extensions=graft.functions.GraftExtensions` — the documented
  * deploy-time path (SparkSessionExtensions.injectFunction). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProductFloat].getName, "graft_dot"),
      (exprs: Seq[Expression]) => DotProductFloat(exprs.head, exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_vsub"),
      new ExpressionInfo(classOf[SubtractVectorsFloat].getName, "graft_vsub"),
      (exprs: Seq[Expression]) => SubtractVectorsFloat(exprs.head, exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_md5_48"),
      new ExpressionInfo(classOf[Md5Prefix48].getName, "graft_md5_48"),
      (exprs: Seq[Expression]) => Md5Prefix48(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_shingles"),
      new ExpressionInfo(classOf[Shingles].getName, "graft_shingles"),
      // k must be a literal (an index-time constant, like every call site)
      (exprs: Seq[Expression]) => Shingles(exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue())))
    ext.injectFunction((
      FunctionIdentifier("graft_window_min"),
      new ExpressionInfo(classOf[WindowMin].getName, "graft_window_min"),
      (exprs: Seq[Expression]) => WindowMin(exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue())))
    ext.injectFunction((
      FunctionIdentifier("graft_simhash32"),
      new ExpressionInfo(classOf[Simhash32].getName, "graft_simhash32"),
      (exprs: Seq[Expression]) => Simhash32(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_feature_hash"),
      new ExpressionInfo(classOf[FeatureHash].getName, "graft_feature_hash"),
      (exprs: Seq[Expression]) => FeatureHash(exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue())))
    ext.injectFunction((
      FunctionIdentifier("graft_hash48_map"),
      new ExpressionInfo(classOf[Hash48Map].getName, "graft_hash48_map"),
      (exprs: Seq[Expression]) => Hash48Map(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_fingerprint48"),
      new ExpressionInfo(classOf[Fingerprint48].getName, "graft_fingerprint48"),
      (exprs: Seq[Expression]) => Fingerprint48(exprs.head,
        exprs(1).eval().asInstanceOf[Number].longValue())))
    ext.injectFunction((
      FunctionIdentifier("graft_sq8"),
      new ExpressionInfo(classOf[Sq8Encode].getName, "graft_sq8"),
      (exprs: Seq[Expression]) => Sq8Encode(exprs.head, exprs(1), exprs(2))))
    ext.injectFunction((
      FunctionIdentifier("graft_doti"),
      new ExpressionInfo(classOf[DotProductBytes].getName, "graft_doti"),
      (exprs: Seq[Expression]) => DotProductBytes(exprs.head, exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_vmilli"),
      new ExpressionInfo(classOf[RoundMilliVector].getName, "graft_vmilli"),
      (exprs: Seq[Expression]) => RoundMilliVector(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_dotl"),
      new ExpressionInfo(classOf[DotProductLongs].getName, "graft_dotl"),
      (exprs: Seq[Expression]) => DotProductLongs(exprs.head, exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_isectn"),
      new ExpressionInfo(classOf[SortedIntersectCount].getName, "graft_isectn"),
      (exprs: Seq[Expression]) => SortedIntersectCount(exprs.head, exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_count_in"),
      new ExpressionInfo(classOf[CountIn].getName, "graft_count_in"),
      (exprs: Seq[Expression]) => CountIn(exprs.head,
        exprs.tail.map(_.eval().asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString))))
    ext.injectFunction((
      FunctionIdentifier("graft_unitok"),
      new ExpressionInfo(classOf[UniTokens].getName, "graft_unitok"),
      (exprs: Seq[Expression]) => UniTokens(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_luhn_cards"),
      new ExpressionInfo(classOf[LuhnCardCount].getName, "graft_luhn_cards"),
      // arity validated like graft_kmin's — extra args must fail loudly,
      // not silently drop
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1,
          s"graft_luhn_cards(text) takes 1 arg, got ${exprs.length}")
        LuhnCardCount(exprs.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_kmin"),
      new ExpressionInfo(classOf[KMinLongs].getName, "graft_kmin"),
      // k must be a literal, like every sketch-size dial — validated
      // here so a bad call surfaces as a clear error, not a CCE/NPE
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2,
          s"graft_kmin(col, k) takes 2 args, got ${exprs.length}")
        val k = exprs(1) match {
          case lit: org.apache.spark.sql.catalyst.expressions.Literal
              if lit.value != null && (lit.dataType == org.apache.spark.sql
                .types.IntegerType || lit.dataType == org.apache.spark.sql
                .types.LongType || lit.dataType == org.apache.spark.sql
                .types.ShortType) =>
            lit.value.asInstanceOf[Number].intValue()
          case other => throw new IllegalArgumentException(
            s"graft_kmin: k must be a non-null integer literal, got $other")
        }
        KMinLongs(exprs.head, k).toAggregateExpression()
      }))
  }
}
