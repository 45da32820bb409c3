package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** `retention(cond1, ..., condK)` — ClickHouse's retention aggregate on
  * the SQL surface: returns `array<int>` of K 0/1 flags where r(0) = 1
  * iff cond1 matched any row of the group, and r(i) = 1 iff BOTH cond1
  * and cond(i+1) matched (CH semantics; same as ops.TimeSeriesOps
  * .retention's dataflow spelling).
  *
  * State is ONE Int bitmask per group — the whole aggregate is
  * order-independent bitwise OR, so it partial-aggregates map-side and
  * merges in any order at any scale. */
case class RetentionAgg(
    conds: Seq[Expression],
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Int]] {

  override def children: Seq[Expression] = conds

  override def checkInputDataTypes(): TypeCheckResult =
    if (conds.isEmpty || conds.size > 32)
      TypeCheckResult.TypeCheckFailure("retention: 1..32 conditions")
    else if (conds.exists(_.dataType != BooleanType))
      TypeCheckResult.TypeCheckFailure("retention: conditions must be BOOLEAN")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = false

  // single-cell array: a mutable Int box that serializes in 4 bytes
  override def createAggregationBuffer(): Array[Int] = Array(0)

  override def update(buf: Array[Int], row: InternalRow): Array[Int] = {
    var j = 0
    while (j < conds.size) {
      if (conds(j).eval(row) == true) buf(0) |= 1 << j
      j += 1
    }
    buf
  }

  override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
    a(0) |= b(0); a
  }

  override def eval(buf: Array[Int]): Any = {
    val m = buf(0)
    val f0 = m & 1
    new GenericArrayData(conds.indices.map { i =>
      if (i == 0) f0 else f0 & ((m >> i) & 1)
    }.toArray)
  }

  override def serialize(buf: Array[Int]): Array[Byte] =
    java.nio.ByteBuffer.allocate(4).putInt(buf(0)).array()

  override def deserialize(bytes: Array[Byte]): Array[Int] =
    Array(java.nio.ByteBuffer.wrap(bytes).getInt)

  override def withNewMutableAggBufferOffset(newOffset: Int): RetentionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): RetentionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): RetentionAgg =
    copy(conds = newChildren)

  override def prettyName: String = "retention"
}
