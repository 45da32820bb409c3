package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `unigram_encode(text)` — per-document unigram-LM tokenizer rollup
  * `(n_words, total_pieces, total_cost)` under a TRAINED piece table
  * bound at registration time (the SQL face of
  * [[graft.ops.UnigramOps.encodeDocs]]; the IvfProbeCells boxed-field
  * precedent — the piece costs ride the expression as ONE field, so
  * the analyzed plan stays O(1) in vocabulary size).
  *
  * Tokenization replays `TextOps.tokens` exactly — UTF8String
  * lower → trim → regex split, the SAME engine primitives the Column
  * face compiles to — then every kept token (non-empty, under
  * PieceCountBase code points: the `encodeDocs`/oracle skip) runs the
  * integer Viterbi DP of [[graft.ops.UnigramOps.segment]]. Segmenting
  * per INSTANCE would re-run the DP Zipf-many times for "the", so
  * results memoize per expression instance (bounded; the distinct-word
  * working set is Heaps-law small). The batch face segments each
  * distinct word once globally and joins back — the better shape for
  * one big batch pass; this face is the streaming/SQL-scalar shape
  * (no shuffle at all). Both decode (cost, n_pieces) from the single
  * minimized cost' number, so ANY optimal segmentation agrees. */
case class UnigramEncode(child: Expression, costs: Map[String, Long])
  extends UnaryExpression with CodegenFallback {

  override def prettyName: String = "unigram_encode"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"unigram_encode requires string, got ${t.sql}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("total_pieces", LongType, nullable = false),
    StructField("total_cost", LongType, nullable = false)))

  @transient private lazy val splitPat = UTF8String.fromString("\\s+")

  /** word → (cost_q, n_pieces), bounded (expression instances are
    * per-task after serialization, but local mode can share one across
    * threads — hence concurrent). */
  @transient private lazy val memo =
    new java.util.concurrent.ConcurrentHashMap[String, (Long, Long)]()
  private val MemoCap = 1 << 16

  override protected def nullSafeEval(s: Any): Any = {
    val toks = s.asInstanceOf[UTF8String].toLowerCase.trim()
      .split(splitPat, -1)
    var nWords = 0L
    var pieces = 0L
    var cost = 0L
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      val n = t.numChars() // code points, the unit of every index here
      if (n > 0 && n < graft.ops.UnigramOps.PieceCountBase) {
        val w = t.toString
        var r = memo.get(w)
        if (r == null) {
          val (c, p, _) = graft.ops.UnigramOps.segment(w, costs)
          r = (c, p)
          if (memo.size < MemoCap) memo.put(w, r)
        }
        nWords += 1
        cost += r._1
        pieces += r._2
      }
      i += 1
    }
    InternalRow(nWords, pieces, cost)
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramEncode =
    copy(child = newChild)
}
