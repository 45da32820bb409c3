package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** `spark.sql.extensions`-pluggable registration of the whole graft
  * function surface (ClickHouse aliases, epoch_ns, codegen vector/text
  * kernels, CH analytics aggregates, pipeline text ops).
  *
  * A STOCK Spark session — spark-shell, spark-submit, a notebook —
  * enables graft by config alone, the idiomatic library entry point:
  *
  * {{{
  * spark-shell --conf spark.sql.extensions=graft.GraftSparkExtensions
  * }}}
  *
  * `injectFunction` lands the same builders `GraftFunctions.registerAll`
  * installs imperatively (the server/Tables path), but in the session's
  * base registry at build time — every derived `newSession()` inherits
  * them, where temp-function registration is per-session state. */
class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    graft.functions.GraftFunctions.builders.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftSparkExtensions].getName, name),
        builder))
    }
}
