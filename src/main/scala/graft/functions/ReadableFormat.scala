package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** ClickHouse `formatReadableSize` / `formatReadableQuantity` — the
  * dashboard-formatting pair (`formatReadableSize(sum(bytes))` is all
  * over real ClickHouse system-table queries). Semantics per the
  * published implementation: divide by the base while |value| >= base
  * and a larger unit exists, then print with exactly two fixed decimals
  * and the unit suffix.
  *
  *  - size: base 1024, units " B", " KiB", " MiB", " GiB", " TiB",
  *    " PiB", " EiB", " ZiB", " YiB".
  *  - quantity: base 1000, units "", " thousand", " million",
  *    " billion", " trillion", " quadrillion".
  *
  * Rounding matches C++ fixed-format printing (round-half-EVEN on the
  * exact binary value — Java's %.2f would round 1.125 KiB the other
  * way), via BigDecimal(HALF_EVEN). Doc-derivable pins in
  * DialectExtrasSpec: 1 → '1.00 B', 1024 → '1.00 KiB',
  * 1024*1024 → '1.00 MiB'; 1024 → '1.02 thousand',
  * 10765432 → '10.77 million'. Non-finite inputs print C++-style
  * `nan`/`inf`/`-inf` with the base unit. */
object ReadableFormat {
  private val SizeUnits = Array(" B", " KiB", " MiB", " GiB", " TiB",
    " PiB", " EiB", " ZiB", " YiB")
  private val QtyUnits = Array("", " thousand", " million", " billion",
    " trillion", " quadrillion")

  private def render(v0: Double, base: Double, units: Array[String]): String = {
    if (java.lang.Double.isNaN(v0)) return "nan" + units(0)
    if (java.lang.Double.isInfinite(v0))
      return (if (v0 > 0) "inf" else "-inf") + units(0)
    var v = v0
    var i = 0
    while (math.abs(v) >= base && i + 1 < units.length) { v /= base; i += 1 }
    new java.math.BigDecimal(v)
      .setScale(2, java.math.RoundingMode.HALF_EVEN).toPlainString + units(i)
  }

  def size(v: Double): UTF8String =
    UTF8String.fromString(render(v, 1024d, SizeUnits))
  def quantity(v: Double): UTF8String =
    UTF8String.fromString(render(v, 1000d, QtyUnits))
}

/** `formatReadableSize(x)` / `formatReadableQuantity(x)`; builders wrap
  * the argument in a double cast, so the input type here is fixed. */
case class FormatReadable(child: Expression, quantity: Boolean)
  extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName expects a double")
  private def fn = if (quantity) "quantity" else "size"
  override protected def nullSafeEval(v: Any): Any =
    if (quantity) ReadableFormat.quantity(v.asInstanceOf[Double])
    else ReadableFormat.size(v.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ReadableFormat.$fn($c)")
  override protected def withNewChildInternal(newChild: Expression): FormatReadable =
    copy(child = newChild)
  override def prettyName: String =
    if (quantity) "formatReadableQuantity" else "formatReadableSize"
}
