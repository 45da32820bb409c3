package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `cms_count(term)` — count-min point estimate of a word-3-gram's
  * document frequency under a TRAINED counter sketch bound at
  * registration time (the SQL face of
  * [[graft.ops.SketchOps.cmsCounters]]; the bloom_hit/unigram_encode
  * boxed-field precedent — the d·w = 2^18-long counter array rides the
  * expression as ONE field, so the analyzed plan stays O(1) in corpus
  * size and the bind's driver state is the bounded 2 MB sketch, never
  * the shingle set).
  *
  * The probe replays [[graft.ops.SketchOps.cmsSlotJvm]] — the same
  * md5-bucket spelling the Column builder hashed with — and takes the
  * row-wise MIN, so `cms_count(s)` ≥ the true document frequency of
  * `s` always (CMS never under-counts) with the overestimate bounded
  * by e·N/w per row w.p. 1 − (1/e)^d. A term the corpus never produced
  * typically reads 0 (all four rows unoccupied) but MAY read small
  * positive — that is the sketch's documented false-positive shape,
  * not a bug. */
case class CmsCount(child: Expression, counters: Array[Long])
  extends UnaryExpression with CodegenFallback {

  require(counters.length ==
    graft.ops.SketchOps.CmsDepth * graft.ops.SketchOps.CmsWidth,
    s"counters must be depth*width = " +
      s"${graft.ops.SketchOps.CmsDepth * graft.ops.SketchOps.CmsWidth} " +
      s"longs, got ${counters.length}")

  override def prettyName: String = "cms_count"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"cms_count requires string, got ${t.sql}")
  }

  override def dataType: DataType = LongType

  override protected def nullSafeEval(s: Any): Any = {
    val term = s.asInstanceOf[UTF8String].toString
    var est = Long.MaxValue
    var j = 0
    while (j < graft.ops.SketchOps.CmsDepth) {
      val slot = graft.ops.SketchOps.cmsSlotJvm(j, term)
      val c = counters(j * graft.ops.SketchOps.CmsWidth + slot.toInt)
      if (c < est) est = c
      j += 1
    }
    est
  }

  override protected def withNewChildInternal(newChild: Expression): CmsCount =
    copy(child = newChild)
}
