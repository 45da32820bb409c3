package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** `epoch_ns(ts)` → int64 nanoseconds since the epoch.
  *
  * The reference keeps all times as int64 nanoseconds and exposes DuckDB's
  * `epoch_ns` for query-time conversion (reference README.md:121,
  * ARCHITECTURE.md:4956). Spark's `TimestampType` is µs-precision
  * internally (a Long), so the conversion is a single multiply that stays
  * inside whole-stage codegen.
  */
case class EpochNs(child: Expression) extends UnaryExpression {
  // Registration wraps the argument in Cast(_, TimestampType) (a no-op on
  // timestamps), so `child` is always µs-since-epoch Long at eval time.
  override def dataType: DataType = LongType
  override protected def nullSafeEval(input: Any): Any =
    input.asInstanceOf[Long] * 1000L
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"$c * 1000L")
  override protected def withNewChildInternal(newChild: Expression): EpochNs =
    copy(child = newChild)
  override def prettyName: String = "epoch_ns"
}
