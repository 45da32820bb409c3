package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** `hdr_quantile(q_permille)` — quantile lookup against a TRAINED
  * log-linear histogram bound at registration time (the SQL face of
  * [[graft.ops.SketchOps.hdrHistogram]]): returns
  * `(rank, est_lo_milli, est_hi_milli)` with the true q-quantile of
  * the recorded values guaranteed inside `[lo, hi]` at ≤3.125%
  * relative width — the same contract (and the same ceil-rank /
  * decode arithmetic, via [[graft.ops.SketchOps.hdrDecode]]) as the
  * dataflow face `hdrQuantiles`, so the two answers cannot drift.
  *
  * The histogram rides the expression as two parallel sorted arrays
  * (bucket index, cumulative count) — ≤1.5 k entries by the layout's
  * construction, a constant-size driver artifact regardless of how
  * many corpus rows were recorded. Lookup is one binary search.
  * `q_permille` outside [1, 1000] or an EMPTY histogram returns NULL
  * (nothing recorded ⇒ no quantile exists — not a zero). */
case class HdrQuantile(child: Expression,
                       idxs: Array[Long], cums: Array[Long])
  extends UnaryExpression with CodegenFallback {

  require(idxs.length == cums.length,
    s"idxs/cums must be parallel, got ${idxs.length}/${cums.length}")

  override def prettyName: String = "hdr_quantile"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case IntegerType | LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"hdr_quantile requires an integral q_permille, got ${t.sql}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("rank", LongType, nullable = false),
    StructField("est_lo_milli", LongType, nullable = false),
    StructField("est_hi_milli", LongType, nullable = false)))

  override def nullable: Boolean = true

  override protected def nullSafeEval(q: Any): Any = {
    val qpm = q match {
      case i: java.lang.Integer => i.longValue()
      case l: java.lang.Long => l.longValue()
    }
    if (qpm < 1 || qpm > 1000 || cums.isEmpty) null
    else {
      val t = cums(cums.length - 1)
      val rank = (qpm * t + 999) / 1000
      // first position with cum >= rank (cums is strictly increasing)
      var lo = 0; var hi = cums.length - 1
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (cums(mid) >= rank) hi = mid else lo = mid + 1
      }
      val (eLo, eHi) = graft.ops.SketchOps.hdrDecode(idxs(lo))
      InternalRow(rank, eLo, eHi)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): HdrQuantile =
    copy(child = newChild)
}
