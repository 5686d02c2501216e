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
  * chain exactly on NON-EMPTY input, including the 0 < n < w clamp (one
  * window, the global minimum) and array_min's null-skipping (null
  * windows can't occur in the winnowing chain but the fallback path
  * preserves the contract). Empty input is a totality EXTENSION, not a
  * mirror: the HOF chain yields [null] (one window over an empty slice);
  * the native form yields [] — the sane answer, and the one the
  * winnowing chain needs (no shingles → no fingerprints).
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

/** `graft_hash48_map(arr)`: elementwise 48-bit md5 prefix of a string
  * array — the shingle-hash step of winnowing ([[graft.operators.Winnow]])
  * and any chain that hashes an n-gram array in place. Replaces
  * `transform(arr, s -> graft_md5_48(s))`: the per-element hash was
  * already native, but `transform` itself is a HigherOrderFunction —
  * CodegenFallback, one interpreted lambda dispatch per element. The
  * native form is one static call inside WholeStageCodegen walking the
  * array once. Values identical (same [[Md5Prefix48.hash48]] per
  * element); null elements map to null, mirroring the lambda.
  */
case class Hash48Map(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_hash48_map expects array<string>, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "graft_hash48_map"

  override protected def nullSafeEval(input: Any): Any =
    Hash48Map.make(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Hash48Map.make($c)")

  override protected def withNewChildInternal(newChild: Expression): Hash48Map =
    copy(child = newChild)
}

object Hash48Map {
  /** hash48 of every element; null elements stay null. */
  def make(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) out(i) = Md5Prefix48.hash48(arr.getUTF8String(i))
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** `graft_fingerprint48(toks, mod)`: q29's order-sensitive rolling document
  * fingerprint — Σ_p hash48(token_p)·((p−1) mod 64 + 1), running-mod `mod`
  * at every step — in ONE per-row pass. Replaces the
  * `aggregate(zip_with(toks, sequence(1, size(toks)), …))` fold: THREE
  * interpreted HigherOrderFunctions plus a materialized position array and
  * a per-token md5-hex round trip, per row. Arithmetic is identical int64
  * (acc < mod ≈ 1e9 against terms ≤ 2^48·64 ≈ 1.8e16 — no overflow at any
  * document length), so results are bit-equal on the fold's domain
  * (non-empty arrays — `split` never yields an empty array). Total below
  * it: empty ⇒ 0, where the HOF chain nulls out through a descending
  * `sequence(1, 0)`. Null elements ⇒ null, mirroring the fold.
  */
case class Fingerprint48(child: Expression, mod: Long) extends UnaryExpression {
  require(mod >= 2, s"mod must be >= 2, got $mod")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_fingerprint48 expects array<string>, got $t")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_fingerprint48"

  override protected def nullSafeEval(input: Any): Any =
    Fingerprint48.make(input.asInstanceOf[ArrayData], mod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val boxed = ctx.freshName("fp48")
      s"""java.lang.Long $boxed = graft.functions.Fingerprint48.make($c, ${mod}L);
         |if ($boxed == null) { ${ev.isNull} = true; } else { ${ev.value} = $boxed.longValue(); }
         |""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Fingerprint48 =
    copy(child = newChild)
}

object Fingerprint48 {
  /** Position-weighted running-mod fold; null element ⇒ null (the fold's
    * poison semantics), empty ⇒ 0 (totality extension). */
  def make(arr: ArrayData, mod: Long): java.lang.Long = {
    val n = arr.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      val w = (i % 64) + 1
      acc = (acc + Md5Prefix48.hash48(arr.getUTF8String(i)) * w) % mod
      i += 1
    }
    acc
  }
}

/** `graft_count_in(toks, items…)`: how many elements of a string array are
  * members of a fixed literal set — the stopword-density / language-marker
  * counter under q29's metrics scan. Replaces
  * `size(filter(toks, x -> x IN (…)))`: the IN list was cheap but `filter`
  * is a HigherOrderFunction — CodegenFallback, an interpreted dispatch per
  * token, and q29 ran FOUR of them per row. The native form is one set
  * probe per token inside WholeStageCodegen. Null elements don't count
  * (IN yields null ⇒ `filter` drops), mirroring the HOF exactly.
  */
case class CountIn(child: Expression, items: Seq[String]) extends UnaryExpression {
  require(items.nonEmpty, "graft_count_in needs a non-empty item set")

  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](items.size * 2)
    items.foreach(i => s.add(UTF8String.fromString(i)))
    s
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_count_in expects array<string>, got $t")
  }
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "graft_count_in"

  override protected def nullSafeEval(input: Any): Any =
    CountIn.make(input.asInstanceOf[ArrayData], set)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftCountInSet", set, "java.util.HashSet")
    defineCodeGen(ctx, ev, c => s"graft.functions.CountIn.make($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): CountIn =
    copy(child = newChild)
}

object CountIn {
  /** Membership count; null elements are skipped. */
  def make(arr: ArrayData, set: java.util.HashSet[UTF8String]): Int = {
    val n = arr.numElements()
    var c = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i) && set.contains(arr.getUTF8String(i))) c += 1
      i += 1
    }
    c
  }
}

/** `graft_bloom_none(arr, bloom)`: TRUE iff NO element of a string array
  * might be in the Bloom filter — the streaming decontamination gate's
  * per-row decision ([[graft.streaming.BloomGate]]) as ONE short-circuit
  * codegen pass. Replaces `!exists(arr, s -> might_contain(bloom,
  * xxhash64(s)))`: `exists` is a HigherOrderFunction (CodegenFallback —
  * an interpreted lambda dispatch per shingle, in the ingest path's
  * per-row hot loop). Probes are identical (same seed-42 xxhash64, same
  * `mightContainLong`), and the filter is deserialized once per task via
  * the same reference-object pattern Spark's own `BloomFilterMightContain`
  * uses. Null elements are skipped (the shingler never emits them).
  */
case class BloomNone(child: Expression, bloom: Array[Byte]) extends UnaryExpression {
  require(bloom != null && bloom.nonEmpty, "graft_bloom_none needs a non-empty bloom")

  @transient private lazy val filter: org.apache.spark.util.sketch.BloomFilter =
    org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(bloom))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_bloom_none expects array<string>, got $t")
  }
  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def prettyName: String = "graft_bloom_none"

  override protected def nullSafeEval(input: Any): Any =
    BloomNone.make(input.asInstanceOf[ArrayData], filter)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBloomFilter", filter,
      classOf[org.apache.spark.util.sketch.BloomFilter].getName)
    defineCodeGen(ctx, ev, c => s"graft.functions.BloomNone.make($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomNone =
    copy(child = newChild)
}

object BloomNone {
  /** Short-circuits on the first might-contain hit. */
  def make(arr: ArrayData, bf: org.apache.spark.util.sketch.BloomFilter): Boolean = {
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
          arr.getUTF8String(i), StringType, 42L)
        if (bf.mightContainLong(h)) return false
      }
      i += 1
    }
    true
  }
}

/** `graft_unitok(text)`: Unicode-class tokenization — casefolded maximal
  * runs of letters (Lu/Ll/Lt/Lm/Lo) and numbers (Nd/Nl/No), i.e. the
  * DuckDB-twinnable `list_filter(regexp_split_to_array(lower(text),
  * '[^\p{L}\p{N}]+'), t -> t <> '')`. This is the honest tokenizer behind
  * the text family's `uni` dial ([[graft.Tok]]): whitespace splitting is
  * exactly right for the synthetic fixtures (single-space lowercase ASCII)
  * but a toy on real corpora — no punctuation handling, no case folding,
  * no non-Latin scripts.
  *
  * Cross-engine contract (UniTokSpec pins the Scala side on the same
  * strings the DuckDB form was probed with): case folding is the SIMPLE
  * per-codepoint mapping (`Character.toLowerCase(int)`), matching
  * utf8proc's 1:1 `lower()` — NOT `String.toLowerCase`, whose full
  * mappings diverge (İ → "i"+U+0307 there, a two-token split here would
  * follow). Class membership is the Unicode general-category test both
  * regex engines implement (`Character.isLetter` = L*;
  * Nd/Nl/No = \p{N}). One pass, no regex engine, native codegen — at
  * 100 TB the tokenizer IS the text family's hot inner loop.
  */
case class UniTokens(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_unitok expects string, got $t")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_unitok"

  override protected def nullSafeEval(input: Any): Any =
    UniTokens.make(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UniTokens.make($c)")

  override protected def withNewChildInternal(newChild: Expression): UniTokens =
    copy(child = newChild)
}

object UniTokens {
  private def isTokenCp(cp: Int): Boolean =
    Character.isLetter(cp) || {
      val t = Character.getType(cp)
      t == Character.DECIMAL_DIGIT_NUMBER || t == Character.LETTER_NUMBER ||
        t == Character.OTHER_NUMBER
    }

  /** Casefolded letter/number runs of `s`; empty array when none. */
  def make(s: UTF8String): ArrayData = {
    val str = s.toString
    val out = new java.util.ArrayList[Any](8)
    val sb = new java.lang.StringBuilder(16)
    var i = 0
    val n = str.length
    while (i < n) {
      val cp = str.codePointAt(i)
      if (isTokenCp(cp)) sb.appendCodePoint(Character.toLowerCase(cp))
      else if (sb.length > 0) {
        out.add(UTF8String.fromString(sb.toString)); sb.setLength(0)
      }
      i += Character.charCount(cp)
    }
    if (sb.length > 0) out.add(UTF8String.fromString(sb.toString))
    new GenericArrayData(out.toArray)
  }
}

/** Column-API front door for the text expressions. */
object Text {
  /** Unicode letter/number-run tokens, casefolded (see [[UniTokens]]). */
  def uniTokens(text: Column): Column =
    shims.column(UniTokens(shims.expression(text)))

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

  /** Elementwise 48-bit md5 prefix of a string-array column (see [[Hash48Map]]). */
  def hash48Map(arr: Column): Column =
    shims.column(Hash48Map(shims.expression(arr)))

  /** One-pass position-weighted rolling fingerprint (see [[Fingerprint48]]). */
  def fingerprint48(toks: Column, mod: Long): Column =
    shims.column(Fingerprint48(shims.expression(toks), mod))

  /** Membership count of a tokens column against a literal set (see [[CountIn]]). */
  def countIn(toks: Column, items: Seq[String]): Column =
    shims.column(CountIn(shims.expression(toks), items))

  /** TRUE iff no element might be in the Bloom filter (see [[BloomNone]]). */
  def bloomNone(arr: Column, bloom: Array[Byte]): Column =
    shims.column(BloomNone(shims.expression(arr), bloom))

  /** Luhn-valid card-candidate count of a text column (see [[LuhnCardCount]]). */
  def luhnCards(text: Column): Column =
    shims.column(LuhnCardCount(shims.expression(text)))
}

/** `graft_luhn_cards(text)`: the number of card-SHAPED candidates
  * (`\b\d{4}-\d{4}-\d{4}-\d{4}\b`, the q111 detection shape) whose digits
  * pass the Luhn checksum — the counting half of q111's shape-redact /
  * Luhn-count card policy. Replaces the HOF chain
  * `size(filter(transform(regexp_extract_all(...)), ds -> aggregate(...)))`,
  * which is CodegenFallback (an interpreted lambda dispatch per candidate
  * and per DIGIT — ~40 interpreted evals per matching row) and banned by
  * the plan contract. The native form is one static call inside the
  * surrounding codegen stage: java.util.regex find-scan (the SAME engine
  * and therefore the same `\b`/greedy-left/non-overlapping semantics as
  * Spark's own RegExpCount next to it in the q111 projection) plus a
  * tight right-to-left digit fold per candidate.
  *
  * The DuckDB twin spells the identical arithmetic as a list_filter/
  * list_sum lambda over `regexp_extract_all` — integer-exact on both
  * sides, so the q111 oracle hash holds; PiiScanSpec pins the per-string
  * truths (all six industry test PANs count, a shape-valid Luhn-negative
  * does not).
  */
case class LuhnCardCount(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_luhn_cards expects string, got $t")
  }
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "graft_luhn_cards"

  override protected def nullSafeEval(input: Any): Any =
    LuhnCardCount.count(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.LuhnCardCount.count($c)")

  override protected def withNewChildInternal(newChild: Expression): LuhnCardCount =
    copy(child = newChild)
}

object LuhnCardCount {
  /** Card candidate shape — single source of truth; PiiScan aliases it. */
  val CardRe = """\b\d{4}-\d{4}-\d{4}-\d{4}\b"""
  private val P = java.util.regex.Pattern.compile(CardRe)

  def count(text: UTF8String): Int = {
    val m = P.matcher(text.toString)
    var n = 0
    while (m.find()) if (luhnOk(m.group())) n += 1
    n
  }

  /** Right-to-left Luhn fold over the candidate's digits (separators
    * skipped): double every second digit from the right, fold > 9 to
    * digit − 9, valid iff sum ≡ 0 (mod 10). */
  private def luhnOk(cand: String): Boolean = {
    var sum = 0
    var pos = 0
    var i = cand.length - 1
    while (i >= 0) {
      val c = cand.charAt(i)
      if (c >= '0' && c <= '9') {
        var d = c - '0'
        if (pos % 2 == 1) { d *= 2; if (d > 9) d -= 9 }
        sum += d
        pos += 1
      }
      i -= 1
    }
    sum % 10 == 0
  }
}
