package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.shims
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_shingles(toks, k)`: the k-token shingle array — the hot op under
  * the entire n-gram family (MinHash signatures, winnowing fingerprints,
  * decontamination collision joins, PMI bigrams, repetition ratios, the
  * Bloom ingest gate). Replaces the higher-order-function chain
  * `transform(sequence(1, size(t)−k+1), i -> concat_ws(' ', slice(t, i, k)))`,
  * which Catalyst CANNOT codegen (HigherOrderFunction is CodegenFallback:
  * per-row interpreted lambda dispatch, plus a materialized int sequence
  * and a sliced array copy per shingle). The native form is one static
  * call inside the surrounding WholeStageCodegen stage that walks the
  * token array once and emits each shingle with a single `concatWs`.
  *
  * Semantics are bit-identical to the HOF chain on its defined domain
  * (size ≥ k), and TOTAL below it: size < k yields the empty array, where
  * the HOF chain needs a `size(t) >= k` guard because `sequence(1, 0)`
  * DESCENDS. Callers keep or drop their guards freely; equality on both
  * codegen and interpreted paths is pinned by TextExpressionsSpec, and
  * every n-gram oracle hash (q19/q20/q26/q27/q53/q57/q59/q64/q70/q73/q81)
  * rides on it.
  */
case class Shingles(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, s"shingle size must be >= 1, got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_shingles expects array<string>, got $t")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingles"

  override protected def nullSafeEval(input: Any): Any =
    Shingles.make(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Shingles.make($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): Shingles =
    copy(child = newChild)
}

object Shingles {
  private val Sep = UTF8String.fromString(" ")

  /** All k-token shingles of `arr`, space-joined; empty when |arr| < k. */
  def make(arr: ArrayData, k: Int): ArrayData = {
    val n = arr.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n - k + 1)
    val parts = new Array[UTF8String](k)
    var i = 0
    while (i + k <= n) {
      var j = 0
      while (j < k) { parts(j) = arr.getUTF8String(i + j); j += 1 }
      out(i) = UTF8String.concatWs(Sep, parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** `graft_window_min(arr, w)`: sliding-window minimum — winnowing's inner
  * loop (Schleimer et al.: the fingerprint set is the distinct minima of
  * every w-window over the shingle-hash array). Replaces
  * `transform(sequence(1, greatest(n−w+1, 1)), j -> array_min(slice(arr, j, w)))`
  * — interpreted (CodegenFallback) AND O(n·w): a sliced array copy plus a
  * w-scan per window. The native form is a monotonic-deque pass: O(n)
  * total, no copies, inside WholeStageCodegen. Semantics mirror the HOF
  * chain exactly, including the n < w clamp (one window, the global
  * minimum) and array_min's null-skipping (null windows can't occur in
  * the winnowing chain but the fallback path preserves the contract).
  */
case class WindowMin(child: Expression, w: Int) extends UnaryExpression {
  require(w >= 1, s"window must be >= 1, got $w")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_window_min expects array<bigint>, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "graft_window_min"

  override protected def nullSafeEval(input: Any): Any =
    WindowMin.make(input.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WindowMin.make($c, $w)")

  override protected def withNewChildInternal(newChild: Expression): WindowMin =
    copy(child = newChild)
}

object WindowMin {
  /** Minima of all w-windows of `arr` (clamped: |arr| < w ⇒ one window
    * over the whole array); empty input ⇒ empty output. */
  def make(arr: ArrayData, w: Int): ArrayData = {
    val n = arr.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    var i = 0
    while (i < n && !arr.isNullAt(i)) i += 1
    if (i < n) return makeWithNulls(arr, w) // rare: mirror array_min
    val m = math.max(n - w + 1, 1)
    val out = new Array[Any](m)
    if (n < w) {
      var best = arr.getLong(0)
      var j = 1
      while (j < n) { val v = arr.getLong(j); if (v < best) best = v; j += 1 }
      out(0) = best
      return new GenericArrayData(out)
    }
    // monotonic deque of indices, values increasing from head to tail
    val idx = new Array[Int](n)
    var head = 0
    var tail = 0
    var k = 0
    while (k < n) {
      val v = arr.getLong(k)
      while (tail > head && arr.getLong(idx(tail - 1)) >= v) tail -= 1
      idx(tail) = k
      tail += 1
      if (k >= w - 1) {
        out(k - w + 1) = arr.getLong(idx(head))
        if (idx(head) == k - w + 1) head += 1
      }
      k += 1
    }
    new GenericArrayData(out)
  }

  /** Slow path preserving array_min's null semantics (skip nulls; a
    * window of only nulls yields null). */
  private def makeWithNulls(arr: ArrayData, w: Int): ArrayData = {
    val n = arr.numElements()
    val m = math.max(n - w + 1, 1)
    val out = new Array[Any](m)
    var j = 0
    while (j < m) {
      val end = math.min(j + w, n)
      var best: java.lang.Long = null
      var i = j
      while (i < end) {
        if (!arr.isNullAt(i)) {
          val v = arr.getLong(i)
          if (best == null || v < best) best = v
        }
        i += 1
      }
      out(j) = best
      j += 1
    }
    new GenericArrayData(out)
  }
}

/** `graft_simhash32(toks)`: the 32-bit TF-weighted SimHash fingerprint of
  * a token array, in ONE per-row pass — per token occurrence, bit j of
  * the token's 48-bit md5 hash votes ±1 on counter j; the fingerprint
  * sets bit j iff the counter ends positive. Replaces the
  * explode → hash → groupBy(doc) 32-conditional-sums formulation, which
  * materializes a row per token and pays a full hash-aggregate exchange
  * of 33-column partials JUST to rebuild per-document state the row
  * already had. The native form keeps the fingerprint stage entirely
  * inside the scan's WholeStageCodegen: zero explode, zero aggregation,
  * zero shuffle. Bit-identical by construction (same per-occurrence ±1
  * votes, same threshold, integer arithmetic — order-independent).
  */
case class Simhash32(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash32 expects array<string>, got $t")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash32"

  override protected def nullSafeEval(input: Any): Any =
    Simhash32.make(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Simhash32.make($c)")

  override protected def withNewChildInternal(newChild: Expression): Simhash32 =
    copy(child = newChild)
}

object Simhash32 {
  /** One pass: 32 signed counters over the tokens' hash bits → packed
    * fingerprint. Empty array ⇒ all counters 0 ⇒ fingerprint 0. */
  def make(arr: ArrayData): Long = {
    val counts = new Array[Int](32)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val x = Md5Prefix48.hash48(arr.getUTF8String(i))
      var j = 0
      while (j < 32) {
        if (((x >> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
        j += 1
      }
      i += 1
    }
    var fp = 0L
    var j = 0
    while (j < 32) {
      if (counts(j) > 0) fp |= 1L << j
      j += 1
    }
    fp
  }
}

/** `graft_feature_hash(toks, dims)`: the hashing-trick vector (Weinberger
  * et al.) of a token array in ONE per-row pass — each token's 48-bit
  * hash picks a bucket (`h % dims`) and a sign (`(h DIV dims) % 2`), and
  * the result is the dense array of signed counts. Replaces q79's
  * explode → groupBy(doc, idx) formulation: row amplification drops from
  * |tokens| to `dims` per document and the hash-aggregate exchange
  * disappears (the sparse form is a `posexplode` + non-zero filter away,
  * all inside the scan stage). Bucket and sign arithmetic is identical
  * int64, so results are bit-equal to the relational form the oracle
  * keeps.
  */
case class FeatureHash(child: Expression, dims: Int) extends UnaryExpression {
  require(dims >= 1, s"dims must be >= 1, got $dims")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_feature_hash expects array<string>, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_feature_hash"

  override protected def nullSafeEval(input: Any): Any =
    FeatureHash.make(input.asInstanceOf[ArrayData], dims)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.FeatureHash.make($c, $dims)")

  override protected def withNewChildInternal(newChild: Expression): FeatureHash =
    copy(child = newChild)
}

object FeatureHash {
  /** Dense signed bucket counts; empty array ⇒ all zeros. */
  def make(arr: ArrayData, dims: Int): ArrayData = {
    val counts = new Array[Long](dims)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val x = Md5Prefix48.hash48(arr.getUTF8String(i))
      val idx = (x % dims).toInt
      if ((x / dims) % 2 == 0) counts(idx) += 1L else counts(idx) -= 1L
      i += 1
    }
    val out = new Array[Any](dims)
    var j = 0
    while (j < dims) { out(j) = counts(j); j += 1 }
    new GenericArrayData(out)
  }
}

/** Column-API front door for the text expressions. */
object Text {
  /** k-token shingles of a tokens column (see [[Shingles]]). */
  def shingles(toks: Column, k: Int): Column =
    shims.column(Shingles(shims.expression(toks), k))

  /** Sliding-window minima of a long-array column (see [[WindowMin]]). */
  def windowMin(arr: Column, w: Int): Column =
    shims.column(WindowMin(shims.expression(arr), w))

  /** One-pass 32-bit SimHash of a tokens column (see [[Simhash32]]). */
  def simhash32(toks: Column): Column =
    shims.column(Simhash32(shims.expression(toks)))

  /** One-pass hashing-trick vector of a tokens column (see [[FeatureHash]]). */
  def featureHash(toks: Column, dims: Int): Column =
    shims.column(FeatureHash(shims.expression(toks), dims))
}
