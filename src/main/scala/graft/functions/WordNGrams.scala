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

object TextExprs {
  /** Column-level entry point for Scala callers. */
  def ngrams(words: Column, n: Int): Column =
    GraftColumnBridge.column(WordNGrams(GraftColumnBridge.expression(words), n))

  /** Exact integer division (SQL `DIV`) over inline Columns — `expr()`
    * needs attribute names, so ops building struct fields in place use
    * this instead. Same IntegralDivide node either way. */
  def divL(a: Column, b: Column): Column =
    GraftColumnBridge.column(
      org.apache.spark.sql.catalyst.expressions.IntegralDivide(
        GraftColumnBridge.toExpression(a), GraftColumnBridge.toExpression(b)))
}
