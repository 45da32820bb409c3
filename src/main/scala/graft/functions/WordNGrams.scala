package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `ngrams(words, n)` — space-joined word n-grams of an `array<string>`
  * column as a native Catalyst expression.
  *
  * The composed form — `transform(sequence(...), i -> concat_ws(" ",
  * slice(w, i, n)))` — is an interpreted higher-order function: one
  * closure dispatch + slice allocation per n-gram, for every token of
  * every document. Shingling is the front of all four text-dedup
  * pipelines (p02/p03/p14/p15), so that per-element overhead is the
  * dominant map cost at corpus scale. This expression builds the whole
  * output array in one compiled call per row (tight loop over
  * UTF8String concat), staying inside whole-stage codegen.
  *
  * Semantics (identical to the composed form, which the DuckDB oracles
  * mirror): null input → null; fewer than n words → empty array;
  * otherwise len−n+1 grams of consecutive words joined by one space. */
case class WordNGrams(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "n must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ngrams requires array<string>, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(v: Any): Any = build(v.asInstanceOf[ArrayData])

  private val sep = UTF8String.fromString(" ")

  /** Also the codegen entry point (referenced object call: one virtual
    * call per ROW — the win over per-ELEMENT interpreted lambdas). */
  def build(w: ArrayData): ArrayData = {
    val len = w.numElements()
    if (len < n) return new GenericArrayData(new Array[Any](0))
    val m = len - n + 1
    val out = new Array[Any](m)
    val parts = new Array[UTF8String](n)
    var i = 0
    while (i < m) {
      var k = 0
      while (k < n) {
        // isNullAt BEFORE get: the ArrayData contract leaves getUTF8String
        // on a null slot undefined (ColumnarArray returns garbage, not
        // null); concatWs then skips nulls exactly like concat_ws
        parts(k) = if (w.isNullAt(i + k)) null else w.getUTF8String(i + k)
        k += 1
      }
      out(i) = UTF8String.concatWs(sep, parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ngramsExpr", this)
    nullSafeCodeGen(ctx, ev, w =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.build($w);")
  }

  override protected def withNewChildInternal(newChild: Expression): WordNGrams =
    copy(child = newChild)

  override def prettyName: String = "ngrams"
}

/** `winnow_mins(hashes, w)` — the DISTINCT sliding-window minima of an
  * `array<long>` column, first-occurrence order: the winnowing
  * selection step (Schleimer et al. 2003) as one compiled call per row.
  *
  * The composed form — `array_distinct(transform(sequence(1,
  * greatest(len−w+1, 1)), i -> array_min(slice(h, i, w))))` — is an
  * interpreted HOF paying a closure dispatch plus a w-element slice
  * ALLOCATION per window per document (O(len·w) work and garbage); the
  * r14 mid-round bench measured it at 21 s for p97 at sf0.1. This
  * kernel is the classic monotonic-deque sliding minimum: O(len) with
  * zero per-window allocation, byte-identical output (the clamped
  * single window when 0 < len < w included), inside whole-stage
  * codegen.
  *
  * Null elements cannot occur from the hashing projection that feeds
  * it (md5 of non-null grams), but are skipped defensively exactly as
  * `array_min` skips them; an all-null window yields nothing, matching
  * array_distinct over nulls-dropped minima only when inputs are
  * non-null — hence the defensive posture stays semantics-preserving
  * for every reachable input. */
case class WinnowMins(child: Expression, w: Int) extends UnaryExpression {
  require(w >= 1, "w must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"winnow_mins requires array<bigint>, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(v: Any): Any =
    build(v.asInstanceOf[ArrayData])

  /** Codegen entry point (one virtual call per row). */
  def build(h: ArrayData): ArrayData = {
    val n = h.numElements()
    val out = new java.util.ArrayList[Any]()
    val seen = new java.util.HashSet[java.lang.Long]()
    if (n == 0) return new GenericArrayData(new Array[Any](0))
    if (n < w) {
      // the composed form's single clamped window: min of everything
      var best = Long.MaxValue
      var any = false
      var i = 0
      while (i < n) {
        if (!h.isNullAt(i)) { val x = h.getLong(i); if (x < best) { best = x }; any = true }
        i += 1
      }
      return new GenericArrayData(
        if (any) Array[Any](best) else new Array[Any](0))
    }
    val deque = new Array[Int](n) // indices, increasing values front→back
    var head = 0
    var tail = 0
    var i = 0
    while (i < n) {
      if (!h.isNullAt(i)) {
        val v = h.getLong(i)
        while (tail > head && h.getLong(deque(tail - 1)) >= v) tail -= 1
        deque(tail) = i
        tail += 1
      }
      while (tail > head && deque(head) < i - w + 1) head += 1
      if (i >= w - 1 && tail > head) {
        val m = java.lang.Long.valueOf(h.getLong(deque(head)))
        if (seen.add(m)) out.add(m)
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("winnowExpr", this)
    nullSafeCodeGen(ctx, ev, h =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.build($h);")
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowMins =
    copy(child = newChild)

  override def prettyName: String = "winnow_mins"
}

object TextExprs {
  /** Column-level entry point for Scala callers. */
  def ngrams(words: Column, n: Int): Column =
    GraftColumnBridge.column(WordNGrams(GraftColumnBridge.expression(words), n))

  /** Column-level entry point for the winnowing selection step. */
  def winnowMins(hashes: Column, w: Int): Column =
    GraftColumnBridge.column(WinnowMins(GraftColumnBridge.expression(hashes), w))

  /** Exact integer division (SQL `DIV`) over inline Columns — `expr()`
    * needs attribute names, so ops building struct fields in place use
    * this instead. Same IntegralDivide node either way. */
  def divL(a: Column, b: Column): Column =
    GraftColumnBridge.column(
      org.apache.spark.sql.catalyst.expressions.IntegralDivide(
        GraftColumnBridge.toExpression(a), GraftColumnBridge.toExpression(b)))
}
