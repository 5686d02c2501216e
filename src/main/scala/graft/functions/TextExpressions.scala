package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.shims
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
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

/** Column-API front door for the text expressions. */
object Text {
  /** k-token shingles of a tokens column (see [[Shingles]]). */
  def shingles(toks: Column, k: Int): Column =
    shims.column(Shingles(shims.expression(toks), k))
}
