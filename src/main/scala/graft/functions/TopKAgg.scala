package graft.functions

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import scala.collection.mutable

/** `top_k(k, expr)` — approximate heavy hitters over a string column as
  * a native Catalyst aggregate (ClickHouse's `topK`; re-derived from
  * the public space-saving algorithm, Metwally et al. 2005 — the same
  * family CH documents for its implementation).
  *
  * Space-saving with capacity C = reserveFactor × k counters: when a
  * new value arrives at a full summary, it REPLACES the minimum counter
  * and inherits its count (the classic overestimate-bounded eviction).
  * Guarantees: any value with true frequency > N/C is in the summary,
  * and each reported count overestimates by at most min-counter. When
  * the group's distinct cardinality ≤ C the result is EXACT — the
  * property the spec pins. Merge sums matching counters, takes the
  * top-C survivors (the standard mergeable-summary treatment).
  *
  * Returns `array<struct<value:string, cnt:bigint>>` ordered by
  * (cnt desc, value) truncated to k. State is O(C) per group at any
  * corpus size — heavy hitters over 100 TB without a full (group,
  * value) shuffle; the exact alternative is a two-level groupBy at
  * strictly higher shuffle cost. */
case class TopKAgg(
    kExpr: Expression, child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.LinkedHashMap[String, Long]] {

  val ReserveFactor = 8

  override def children: Seq[Expression] = Seq(kExpr, child)

  /** ClickHouse's own topK threshold cap is 65536 — matching it also
    * bounds the space-saving eviction scan (O(8k) per non-resident
    * insert) to something a hot aggregate path can afford. */
  val MaxK = 1 << 16

  override def checkInputDataTypes(): TypeCheckResult =
    if (!kExpr.foldable)
      TypeCheckResult.TypeCheckFailure("top_k: k must be a literal")
    else if (kExpr.dataType != IntegerType && kExpr.dataType != LongType)
      TypeCheckResult.TypeCheckFailure("top_k: k must be integral")
    else if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure("top_k: expr must be STRING")
    else kExpr.eval() match {
      // range-check at analysis: k <= 0 is meaningless (CH errors too)
      // and a huge k would overflow capacity into a negative Int,
      // making the summary reject every value and minBy throw at run
      case n: java.lang.Number if n.longValue() >= 1 && n.longValue() <= MaxK =>
        TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(s"top_k: k must be in [1, $MaxK], got $other")
    }

  private lazy val k: Int = kExpr.eval() match {
    case i: java.lang.Integer => i.intValue()
    case l: java.lang.Long => l.intValue()
    case other => throw new IllegalArgumentException(s"top_k: bad k $other")
  }
  private def capacity: Int = math.max(1, k) * ReserveFactor

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("value", StringType, nullable = false),
      StructField("cnt", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): mutable.LinkedHashMap[String, Long] =
    mutable.LinkedHashMap.empty

  // UTF-8 binary (code-point) order — the order Spark, DuckDB and
  // ClickHouse compare strings in. Java String.compareTo is UTF-16
  // code-unit order, which flips supplementary-plane characters
  // against U+E000..U+FFFF on count ties (review r10): the reported
  // order, the take(k) boundary survivor, and the evicted counter
  // could all differ from any engine-side rendering.
  private def utf8Lt(a: String, b: String): Boolean =
    UTF8String.fromString(a).compareTo(UTF8String.fromString(b)) < 0

  private def add(buf: mutable.LinkedHashMap[String, Long], v: String, n: Long): Unit =
    buf.get(v) match {
      case Some(c) => buf.update(v, c + n)
      case None if buf.size < capacity => buf.update(v, n)
      case None =>
        // space-saving eviction: replace the min counter, inherit count.
        // Manual scan, not minBy: this runs once per non-resident insert
        // on the aggregate hot path, and minBy allocates a tuple per
        // entry (capacity = 8k of them)
        var mv: String = null
        var mc = Long.MaxValue
        buf.foreach { case (value, c) =>
          if (c < mc || (c == mc && (mv == null || utf8Lt(value, mv)))) { mv = value; mc = c }
        }
        buf.remove(mv)
        buf.update(v, mc + n)
    }

  override def update(buf: mutable.LinkedHashMap[String, Long], row: InternalRow)
  : mutable.LinkedHashMap[String, Long] = {
    val v = child.eval(row)
    if (v != null) add(buf, v.toString, 1L)
    buf
  }

  override def merge(a: mutable.LinkedHashMap[String, Long],
                     b: mutable.LinkedHashMap[String, Long])
  : mutable.LinkedHashMap[String, Long] = {
    // within one merge CALL the fold order is canonical (sorted), but
    // space-saving merge with eviction is non-associative, so when a
    // group's cardinality EXCEEDS the summary capacity the result still
    // depends on Spark's partial-buffer arrival order (not controllable
    // here). Determinism therefore holds in the exact regime —
    // cardinality ≤ 8k, where no eviction happens and merge IS
    // commutative addition — which is the oracle-gated regime (p29);
    // beyond it, results carry the documented N/C overestimate bound AND
    // run-to-run arrival-order variance, like ClickHouse's own topK.
    b.toSeq.sortWith { case ((v1, c1), (v2, c2)) =>
      c1 > c2 || (c1 == c2 && utf8Lt(v1, v2))
    }.foreach { case (v, c) => add(a, v, c) }
    a
  }

  override def eval(buf: mutable.LinkedHashMap[String, Long]): Any = {
    val top = buf.toSeq.sortWith { case ((v1, c1), (v2, c2)) =>
      c1 > c2 || (c1 == c2 && utf8Lt(v1, v2))
    }.take(k)
    new GenericArrayData(top.map { case (v, c) =>
      InternalRow(UTF8String.fromString(v), c)
    }.toArray[Any])
  }

  override def serialize(buf: mutable.LinkedHashMap[String, Long]): Array[Byte] = {
    val entries = buf.toSeq.map { case (v, c) =>
      (v.getBytes(StandardCharsets.UTF_8), c)
    }
    val bb = java.nio.ByteBuffer.allocate(
      4 + entries.map(e => 4 + e._1.length + 8).sum)
    bb.putInt(entries.size)
    entries.foreach { case (vb, c) =>
      bb.putInt(vb.length); bb.put(vb); bb.putLong(c)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.LinkedHashMap[String, Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = mutable.LinkedHashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val vb = new Array[Byte](bb.getInt)
      bb.get(vb)
      buf.update(new String(vb, StandardCharsets.UTF_8), bb.getLong)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKAgg =
    copy(kExpr = newChildren(0), child = newChildren(1))

  override def prettyName: String = "top_k"
}
