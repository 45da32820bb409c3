package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types._

/** `dotf(a, b)` — dot product of two `array<float|double>` columns as a
  * native codegen'd Catalyst expression.
  *
  * Vector similarity (dedup, ANN) is the hot loop of the pipeline
  * operators: an all-pairs verify at sf0.1 evaluates millions of dot
  * products. Composing `aggregate(zip_with(...))` is semantically right
  * but those are interpreted higher-order functions (no whole-stage
  * codegen, one closure call per element): ~35 µs per 64-dim pair
  * measured. This expression compiles to a tight primitive loop inside
  * whole-stage codegen (~0.1 µs/pair) — the difference between a 70 s and
  * a ~2 s near-dup pass at sf0.1, and the difference between feasible and
  * not at 100 TB.
  *
  * Semantics: null input array → null; element count = min(len(a),
  * len(b)); array elements are assumed non-null (embedding vectors —
  * a null element reads as 0.0, it does not poison the result).
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {
  private def elemOk(t: DataType): Boolean = t == FloatType || t == DoubleType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(lt, _), ArrayType(rt, _)) if elemOk(lt) && elemOk(rt) =>
      TypeCheckResult.TypeCheckSuccess
    case _ =>
      TypeCheckResult.TypeCheckFailure(
        s"dotf requires array<float|double> arguments, got ${left.dataType.sql}, ${right.dataType.sql}")
  }

  override def dataType: DataType = DoubleType

  private lazy val leftElem = left.dataType.asInstanceOf[ArrayType].elementType
  private lazy val rightElem = right.dataType.asInstanceOf[ArrayType].elementType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      // isNullAt BEFORE the typed getter: ColumnarArray returns stale
      // buffer garbage (not 0.0) for null slots — the WordNGrams note
      val xv = if (x.isNullAt(i)) 0.0
        else if (leftElem == FloatType) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (y.isNullAt(i)) 0.0
        else if (rightElem == FloatType) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xv * yv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      def get(arr: String, t: DataType): String = {
        val raw = if (t == FloatType) s"(double) $arr.getFloat($i)"
          else s"$arr.getDouble($i)"
        s"($arr.isNullAt($i) ? 0.0 : $raw)" // null slot = 0.0, not garbage
      }
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ${get(a, leftElem)} * ${get(b, rightElem)};
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "dotf"
}

/** `dotl(a, b)` — dot product of two `array<long>` columns in EXACT
  * integer arithmetic, as a native codegen'd Catalyst expression.
  *
  * Powers the quantized-embedding similarity path (SimilarityOps
  * .quantizedTopK): int8-quantized vectors dot in the integer domain —
  * bit-replayable in an oracle, overflow-free for |q| ≤ 127 up to
  * ~5.7e14 dimensions — at the same tight-primitive-loop speed as
  * `dotf`. Same null semantics as DotProduct. */
case class DotProductLong(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case _ =>
      TypeCheckResult.TypeCheckFailure(
        s"dotl requires array<bigint> arguments, got ${left.dataType.sql}, ${right.dataType.sql}")
  }

  override def dataType: DataType = LongType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      // null slot = 0 (see DotProduct): typed getters on null slots
      // return garbage from reused columnar buffers
      val xv = if (x.isNullAt(i)) 0L else x.getLong(i)
      val yv = if (y.isNullAt(i)) 0L else y.getLong(i)
      acc += xv * yv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ($a.isNullAt($i) ? 0L : $a.getLong($i))
         |      * ($b.isNullAt($i) ? 0L : $b.getLong($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotProductLong =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "dotl"
}

/** `quant8(v)` — symmetric int8 quantization of an `array<float|double>`
  * vector to `array<long>`: q_i = floor(x_i·127/mx + 0.5), mx = max|x|
  * (all-zero vector → all zeros).
  *
  * One codegen'd two-pass primitive loop instead of the three
  * interpreted `transform`/`array_max` passes the Column-level spelling
  * costs (~260 µs/vector measured at 64 dims — quantization would
  * dominate the quantized scan it exists to accelerate). floor(y + 0.5)
  * rather than round(): identical IEEE op sequence in Spark and DuckDB,
  * so the quantizer replays bit-for-bit in the oracle
  * (SimilarityOps.quantizedTopKSql). Null array → null; null elements
  * read as 0.0 (DotProduct convention). */
case class Quantize8(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(t, _) if t == FloatType || t == DoubleType =>
      TypeCheckResult.TypeCheckSuccess
    case _ =>
      TypeCheckResult.TypeCheckFailure(
        s"quant8 requires an array<float|double> argument, got ${child.dataType.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private lazy val elem = child.dataType.asInstanceOf[ArrayType].elementType

  override protected def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val n = x.numElements()
    def get(i: Int): Double =
      if (x.isNullAt(i)) 0.0 // doc'd convention; columnar null slots are garbage
      else if (elem == FloatType) x.getFloat(i).toDouble else x.getDouble(i)
    var mx = 0.0
    var i = 0
    while (i < n) { val a = math.abs(get(i)); if (a > mx) mx = a; i += 1 }
    val out = new Array[Long](n)
    if (mx > 0) {
      i = 0
      while (i < n) { out(i) = math.floor(get(i) * 127.0 / mx + 0.5).toLong; i += 1 }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val mx = ctx.freshName("mx")
      val out = ctx.freshName("out")
      val a = ctx.freshName("a")
      def get(idx: String): String = {
        val raw = if (elem == FloatType) s"(double) $v.getFloat($idx)"
          else s"$v.getDouble($idx)"
        s"($v.isNullAt($idx) ? 0.0 : $raw)" // null slot = 0.0, not garbage
      }
      s"""
         |int $n = $v.numElements();
         |double $mx = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $a = java.lang.Math.abs(${get(i)});
         |  if ($a > $mx) $mx = $a;
         |}
         |long[] $out = new long[$n];
         |if ($mx > 0.0) {
         |  for (int $i = 0; $i < $n; $i++) {
         |    $out[$i] = (long) java.lang.Math.floor(${get(i)} * 127.0 / $mx + 0.5);
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Quantize8 =
    copy(child = newChild)

  override def prettyName: String = "quant8"
}

/** `letter_counts(t)` — the 26-dim `a`..`z` character-count profile of a
  * string, as ONE codegen'd byte scan.
  *
  * This is the featurizer under chunk retrieval (SimilarityOps
  * .chunkRetrieval): the Column-level spelling — 26 independent
  * `length(t) - length(regexp_replace(t, letter, ''))` terms — walks and
  * re-allocates the chunk text 26 times per row, and dominated the p38
  * scan (~70% of query time at sf0.1). One pass over the UTF-8 bytes is
  * exact for ASCII letters (multi-byte UTF-8 sequences never contain
  * bytes < 0x80), so the result is bit-identical to the regexp spelling
  * and to the DuckDB oracle's `length(replace(...))` rendering.
  * Null string → null. */
case class LetterCounts(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"letter_counts requires a string argument, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
    val n = s.numBytes()
    val out = new Array[Long](26)
    var i = 0
    while (i < n) {
      val b = s.getByte(i)
      if (b >= 'a' && b <= 'z') out(b - 'a') += 1L
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val b = ctx.freshName("b")
      val out = ctx.freshName("out")
      s"""
         |int $n = $v.numBytes();
         |long[] $out = new long[26];
         |for (int $i = 0; $i < $n; $i++) {
         |  byte $b = $v.getByte($i);
         |  if ($b >= 97 && $b <= 122) $out[$b - 97]++;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): LetterCounts =
    copy(child = newChild)

  override def prettyName: String = "letter_counts"
}

object VectorExprs {
  /** Column-level entry point for Scala callers. */
  def dotf(a: Column, b: Column): Column =
    GraftColumnBridge.column(
      DotProduct(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  /** Exact integer dot product of two array<long> columns. */
  def dotl(a: Column, b: Column): Column =
    GraftColumnBridge.column(
      DotProductLong(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  /** Symmetric int8 quantization of a float/double vector (see Quantize8). */
  def quant8(v: Column): Column =
    GraftColumnBridge.column(Quantize8(GraftColumnBridge.expression(v)))

  /** 26-dim a..z count profile of a string (see LetterCounts). */
  def letterCounts(t: Column): Column =
    GraftColumnBridge.column(LetterCounts(GraftColumnBridge.expression(t)))
}
