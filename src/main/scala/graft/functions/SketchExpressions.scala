package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.shims
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** `graft_kmin(h, k)` — bounded k-minimum-values aggregate: the k smallest
  * DISTINCT values of a bigint column, returned as a sorted ascending
  * array. The engine's first custom AGGREGATE expression (the scalar
  * surface lives in VectorExpressions/TextExpressions); it is the sketch
  * primitive behind q112's KMV distinct-count estimator (Bar-Yossef et al.
  * 2002, "Counting distinct elements in a data stream"): with uniform
  * hashes over [0, M), ndv ≈ (k−1)·M / h₍k₎.
  *
  * Why an aggregate and not `slice(sort_array(collect_set(h)), 1, k)`:
  * collect_set materializes the ENTIRE distinct set per group (corpus
  * vocabulary at 100 TB — unbounded heap, unbounded shuffle rows), while
  * this buffer is capped at k longs per (task, group) everywhere in the
  * tree: map-side partials keep k, the exchange carries k longs per
  * partition-group, the final merge unions and re-trims to k. That bound
  * IS the sketch's point — the estimator's accuracy is set by k, not by
  * the corpus.
  *
  * Determinism: "k smallest distinct values of a multiset" is invariant
  * to row order, partitioning, and merge tree shape, so the result is
  * layout-stable and sits under the DuckDB oracle hash (the twin computes
  * the same k-prefix relationally). Runs under ObjectHashAggregateExec
  * (Spark's execution path for TypedImperativeAggregate) — an agg-boundary
  * operator, not a per-row hot-path expression, so codegen is not the
  * relevant axis here.
  *
  * Buffer: java.util.TreeSet[java.lang.Long] (dedupe + ordered trim in one
  * structure; k ≤ a few hundred, so boxing at the agg boundary is noise).
  * Nulls are skipped, the aggregate itself never returns null (empty
  * group ⇒ empty array).
  */
case class KMinLongs(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] {

  require(k >= 1 && k <= 65536, s"graft_kmin k must be in [1, 65536], got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_kmin expects a bigint column, got ${child.dataType}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_kmin"

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  override def update(
      buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(
      buf: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) add(buf, it.next())
    buf
  }

  /** Insert keeping the k smallest distinct: skip early when the buffer is
    * full and v is not below its max (the common case on a hot stream). */
  private def add(buf: java.util.TreeSet[java.lang.Long], v: Long): Unit = {
    if (buf.size < k) { buf.add(v); () }
    else if (v < buf.last()) {
      if (buf.add(v)) buf.pollLast()
      ()
    }
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val buf = createAggregationBuffer()
    val bb = ByteBuffer.wrap(bytes)
    while (bb.remaining() >= 8) buf.add(bb.getLong())
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KMinLongs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KMinLongs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KMinLongs =
    copy(child = newChild)
}

/** Column-API entry points for the sketch aggregates. */
object Sketches {
  /** Sorted array of the k smallest distinct values of bigint column `c`. */
  def kmin(c: Column, k: Int): Column =
    shims.column(KMinLongs(shims.expression(c), k).toAggregateExpression())
}
