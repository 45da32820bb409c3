package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `md5_slice(s, pos, len)` ≡ `conv(substring(md5(s), pos, len), 16, 10)
  * .cast("long")` — the md5-prefix hash primitive every bucket/sample/
  * signature spelling in this engine is built on (TextOps.md5Bucket and
  * friends), computed straight from the digest bytes.
  *
  * r15 optimization round (guide §1.2 step 2 "per-task work"): the
  * composed spelling materializes the full 32-char hex string, takes a
  * substring, and string-parses it base-16 — three UTF8String
  * allocations and a digit loop per call, on top of Spark's Md5
  * expression fetching a fresh MessageDigest per row. This expression
  * hashes the child's RAW UTF-8 bytes (exactly what Spark's Md5 feeds
  * the digest — `UTF8String.getBytes`, no re-encode), reuses a
  * thread-local MessageDigest (`digest()` resets it), and folds the
  * requested hex window as nibbles of the digest, so the value is
  * bit-identical BY CONSTRUCTION for every input including invalid
  * UTF-8 (Md5SliceSpec property-pins it against the composed spelling;
  * every consumer's DuckDB oracle keeps the hex spelling and the
  * differential gate re-proves it per query). `len ≤ 15` keeps the
  * value under 2⁶⁰ — the same bound the conv spelling relied on.
  */
object Md5Slice {
  private val Md5 = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  /** The raw 16-byte digest of u's UTF-8 bytes — `unhex(md5(u))`
    * without the hex round-trip (see [[Md5BinExpr]]). */
  def bin(u: UTF8String): Array[Byte] = Md5.get().digest(u.getBytes)

  /** Hex chars [pos, pos+len) of md5(raw bytes of u), 1-based pos,
    * parsed as an unsigned base-16 long. */
  def slice(u: UTF8String, pos: Int, len: Int): Long = {
    val d = Md5.get().digest(u.getBytes)
    var v = 0L
    var k = pos - 1
    val end = k + len
    while (k < end) {
      val b = d(k >> 1)
      val nib = if ((k & 1) == 0) (b >> 4) & 0xf else b & 0xf
      v = (v << 4) | nib
      k += 1
    }
    v
  }
}

case class Md5SliceExpr(child: Expression, pos: Int, len: Int)
  extends UnaryExpression {

  require(pos >= 1 && len >= 1 && pos + len - 1 <= 32,
    s"md5_slice window [$pos, +$len) must sit inside the 32 hex chars")
  require(len <= 15, s"md5_slice len $len would overflow a signed long")

  override def prettyName: String = "md5_slice"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"md5_slice requires string, got ${t.sql}")
  }

  override protected def nullSafeEval(s: Any): Any =
    Md5Slice.slice(s.asInstanceOf[UTF8String], pos, len)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Md5Slice.slice($c, $pos, $len)")

  override protected def withNewChildInternal(newChild: Expression): Md5SliceExpr =
    copy(child = newChild)
}

/** `md5_bin(s)` ≡ `unhex(md5(s))` — the full digest as its raw 16
  * bytes (r16 optimization, guide §2.3 "narrower types"): a GROUPING/
  * window key spelled as the hex string shuffles 32+ chars per row and
  * pays the hex render; the raw bytes are half the key and skip the
  * render, while hex ↔ bytes is a bijection so every equality,
  * partition and row_number over the binary key is decision-identical
  * to the hex spelling — including under (astronomically unlikely)
  * md5 collisions, which collide identically in both spellings. Same
  * thread-local digest + raw-UTF-8 contract as [[Md5SliceExpr]];
  * property-pinned against `unhex(md5(s))` in Md5SliceSpec. Only ever
  * used for INTERNAL keys a query never outputs — oracle-visible md5
  * columns keep the hex spelling. */
case class Md5BinExpr(child: Expression) extends UnaryExpression {

  override def prettyName: String = "md5_bin"
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"md5_bin requires string, got ${t.sql}")
  }

  override protected def nullSafeEval(s: Any): Any =
    Md5Slice.bin(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Slice.bin($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5BinExpr =
    copy(child = newChild)
}
