package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types._

/** `nfc(t)` — Unicode NFC normalization of a string, as a codegen'd
  * Catalyst expression (`java.text.Normalizer`, which implements the
  * same Unicode standard annex #15 as DuckDB's `nfc_normalize` — both
  * engines produce identical bytes for identical input, which is what
  * makes the p43 hygiene pass oracle-checkable).
  *
  * Why it exists: web-scraped corpora mix composed ("é" U+00E9) and
  * decomposed ("e" + U+0301) spellings of the same text, so exact and
  * shingle dedup (p01/p02), fingerprints (p08/p12) and token counts all
  * see two distinct documents where a human sees one. Normalizing to
  * NFC before hashing is standard corpus hygiene. Spark has no built-in
  * normalizer — the alternative is a Scala UDF, which would break
  * whole-stage codegen on the hottest text path.
  *
  * The ASCII fast path matters at scale: `Normalizer.isNormalized` is a
  * cheap scan that short-circuits the (allocating) `normalize` call, and
  * virtually all bytes of a real corpus are already NFC. */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nfc requires a string argument, got ${other.sql}")
  }

  override def dataType: DataType = StringType

  override protected def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
    NfcNormalize.normalize(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)

  override def prettyName: String = "nfc"
}

object NfcNormalize {
  /** Shared by interpreted eval and generated code. ASCII is NFC by
    * definition, so the all-ASCII common case returns the input
    * reference after one byte scan — no UTF-8 decode, no allocation.
    * Non-ASCII rows pay one decode; `isNormalized` then short-circuits
    * the (allocating) `normalize` call for already-NFC text. */
  def normalize(s: org.apache.spark.unsafe.types.UTF8String)
  : org.apache.spark.unsafe.types.UTF8String = {
    if (s.isFullAscii) return s
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else org.apache.spark.unsafe.types.UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  /** Column-level entry point. */
  def nfc(t: Column): Column =
    GraftColumnBridge.column(NfcNormalize(GraftColumnBridge.expression(t)))
}
