package graft.functions

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

import graft.ops.SketchOps

/** `hll_distinct(expr)` — the [[graft.ops.SketchOps]] deterministic
  * HyperLogLog as a native Catalyst aggregate (the `uniq`-family
  * estimator on the /query SQL surface), returning the DOUBLE estimate.
  *
  * The register state is a fixed 64-byte array per group; merge is
  * elementwise max — commutative AND associative, so unlike
  * space-saving `top_k` the result is bit-identical under any
  * partitioning or partial-buffer arrival order, at every cardinality.
  * The hash, register math, and estimate arithmetic are EXACTLY
  * [[SketchOps.hllSummary]]'s (same md5 slices, same integer harmonic
  * sum, same one-division estimate), so the aggregate's output
  * hash-matches the dataflow face and the DuckDB oracle (p90). */
case class HllAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "hll_distinct: expr must be STRING (cast numeric keys explicitly " +
        "so the hashed text is unambiguous)")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Byte] =
    new Array[Byte](SketchOps.HllM)

  override def update(buf: Array[Byte], row: InternalRow): Array[Byte] = {
    val v = child.eval(row)
    if (v != null) {
      val hex = org.apache.commons.codec.digest.DigestUtils.md5Hex(
        v.toString.getBytes(StandardCharsets.UTF_8))
      val bucket = (java.lang.Integer.parseInt(hex.substring(0, 3), 16) %
        SketchOps.HllM).toInt
      val value = java.lang.Long.parseLong(hex.substring(3, 15), 16)
      val rho =
        if (value == 0L) SketchOps.HllMaxRho
        else SketchOps.HllMaxRho - (64 - java.lang.Long.numberOfLeadingZeros(value))
      if (rho > buf(bucket)) buf(bucket) = rho.toByte
    }
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < a.length) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Byte]): Any = {
    var sp = 0L; var zeros = 0L
    var i = 0
    while (i < buf.length) {
      if (buf(i) == 0) zeros += 1
      else sp += 1L << (SketchOps.HllMaxRho - buf(i))
      i += 1
    }
    val s = sp + zeros * SketchOps.HllScale
    val raw = SketchOps.HllC / s
    val est =
      if (zeros > 0 && raw <= SketchOps.HllLcThreshold)
        SketchOps.HllM * math.log(SketchOps.HllM.toDouble / zeros)
      else raw
    // same rounding device as Spark's round(x, 2): HALF_UP on the
    // shortest-decimal form (BigDecimal.valueOf)
    java.math.BigDecimal.valueOf(est)
      .setScale(2, java.math.RoundingMode.HALF_UP).doubleValue()
  }

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): HllAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HllAgg =
    copy(child = newChildren(0))

  override def prettyName: String = "hll_distinct"
}
