package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `bpe_encode(text)` — per input token, the BPE pieces under a TRAINED
  * merge table bound at registration time (the SQL face of
  * [[graft.ops.BpeOps.encode]]'s replace chain; the IvfProbeCells
  * boxed-field precedent). Returns `array<array<string>>` — one inner
  * array per kept token (`|` stripped, empties dropped, exactly the
  * [[graft.ops.BpeOps.encode]] hygiene); `flatten` is the piece stream.
  *
  * Two reasons this is an expression and not the Column replace chain
  * it is provably equivalent to (the p80 oracle hash-checks the
  * equivalence end-to-end against the chain's DuckDB render):
  *  - a 120-merge chain inside a `transform` lambda evaluates
  *    INTERPRETED per element (higher-order functions don't codegen) —
  *    measured 3.9 s vs the batch projection's 1.0 s at sf0.1;
  *  - the symbol-array fold (the trainLocal spelling, provably equal to
  *    the non-overlapping left-to-right replace pass because a merge
  *    cannot recreate its own pair) is O(merges × symbols) integer work
  *    instead of 120 string scans, and results MEMOIZE per distinct
  *    token (Zipf: "the" encodes once per partition, not once per
  *    occurrence — the UnigramEncode discipline).
  *
  * Tokenization replays `TextOps.tokens` on the same engine primitives
  * (UTF8String lower → trim → regex split); the per-character seed
  * split uses the SAME `(?!^)` code-unit semantics as the Column face's
  * `split(w, "(?!^)")`. */
case class BpeEncode(child: Expression, merges: Seq[(String, String)])
  extends UnaryExpression with CodegenFallback {

  override def prettyName: String = "bpe_encode"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bpe_encode requires string, got ${t.sql}")
  }

  override def dataType: DataType =
    ArrayType(ArrayType(StringType, containsNull = false), containsNull = false)

  @transient private lazy val splitPat = UTF8String.fromString("\\s+")

  /** token → its pieces, bounded (the UnigramEncode memo shape;
    * concurrent because local mode can share one instance across
    * threads). */
  @transient private lazy val memo =
    new java.util.concurrent.ConcurrentHashMap[String, Array[UTF8String]]()
  private val MemoCap = 1 << 16

  private def encodeWord(w: String): Array[UTF8String] = {
    // per-character seed symbols: the Column face's split(w, "(?!^)")
    // (code units, not code points — a deliberate match, the oracle
    // splits the same corpus the same way)
    var syms = w.split("(?!^)")
    merges.foreach { case (l, r) =>
      // one non-overlapping left-to-right pass per merge, exhaustive
      // (l+r is a single symbol afterwards, so no new (l,r) pair can
      // appear mid-pass) — provably the replace chain's semantics
      var i = 0
      var found = false
      while (!found && i < syms.length - 1) {
        if (syms(i) == l && syms(i + 1) == r) found = true
        i += 1
      }
      if (found) {
        val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
        var k = 0
        while (k < syms.length) {
          if (k < syms.length - 1 && syms(k) == l && syms(k + 1) == r) {
            out += (l + r); k += 2
          } else { out += syms(k); k += 1 }
        }
        syms = out.toArray
      }
    }
    syms.map(UTF8String.fromString)
  }

  override protected def nullSafeEval(s: Any): Any = {
    val toks = s.asInstanceOf[UTF8String].toLowerCase.trim()
      .split(splitPat, -1)
    val out = new scala.collection.mutable.ArrayBuffer[GenericArrayData](toks.length)
    var i = 0
    while (i < toks.length) {
      // the encode() hygiene: strip the frame char, drop empties
      val w = toks(i).toString.replace("|", "")
      if (w.nonEmpty) {
        var pieces = memo.get(w)
        if (pieces == null) {
          pieces = encodeWord(w)
          if (memo.size < MemoCap) memo.put(w, pieces)
        }
        out += new GenericArrayData(pieces.asInstanceOf[Array[Any]])
      }
      i += 1
    }
    new GenericArrayData(out.toArray[Any])
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
}
