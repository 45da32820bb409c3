package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

import scala.collection.mutable.ArrayBuffer

/** `window_funnel(window_ns, t, cond1, ..., condK)` — ClickHouse's
  * windowFunnel as a native Catalyst AGGREGATE function on the SQL
  * surface (the reference exposes CH compat through `aliases.sql`
  * scalars; this covers the aggregate a CH funnel user reaches for).
  *
  * Semantics match ops.TimeSeriesOps.windowFunnel (the dataflow
  * spelling) for UNIQUE event times: max level L such that events
  * matching stages 1..L occur at increasing rank with t_L − t_1 ≤
  * window_ns, window anchored at the chain's first event, max-start
  * DP. Rank order here is (t, stage-mask): an aggregate sees rows in
  * arbitrary order, so the buffer sorts by a total key before folding
  * — making the result deterministic under any partitioning/merge
  * order (ties at the same (t, mask) are interchangeable). KNOWN
  * deviation (review r10): same-TIMESTAMP ties rank by mask here but
  * by the caller's tie column (event_id) in the dataflow — the
  * aggregate never sees that column — so the two faces can report
  * different levels for same-µs chains; the spec pins agreement on
  * unique times only. A row may match several conds; it folds against
  * the PRE-row state, so it never chains on itself.
  *
  * State: one (t: long, mask: int) pair per row that matches ≥1 cond —
  * rows matching nothing are never buffered. Like ClickHouse, per-group
  * memory is proportional to matching events; the dataflow spelling
  * (one sort per key, O(stages) state) is the 100 TB path, this
  * aggregate is the SQL-ergonomics path.
  */
case class WindowFunnelAgg(
    windowExpr: Expression, time: Expression, conds: Seq[Expression],
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[(Long, Int)]] {

  override def children: Seq[Expression] = windowExpr +: time +: conds

  override def checkInputDataTypes(): TypeCheckResult =
    if (!windowExpr.foldable)
      TypeCheckResult.TypeCheckFailure("window_funnel: window_ns must be a literal")
    else if (windowExpr.dataType != LongType && windowExpr.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure("window_funnel: window_ns must be integral")
    else if (time.dataType != LongType)
      TypeCheckResult.TypeCheckFailure("window_funnel: t must be BIGINT (ns)")
    else if (conds.isEmpty || conds.size > 31)
      TypeCheckResult.TypeCheckFailure("window_funnel: 1..31 stage conditions")
    else if (conds.exists(_.dataType != BooleanType))
      TypeCheckResult.TypeCheckFailure("window_funnel: stage conditions must be BOOLEAN")
    else windowExpr.eval() match {
      // null/degenerate window literals fail HERE, not after the whole
      // job has scanned and shuffled (the TopKAgg k-range discipline)
      case n: java.lang.Number if n.longValue() > 0 =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"window_funnel: window_ns must be a positive literal, got $other")
    }

  private lazy val windowNs: Long = windowExpr.eval() match {
    case i: java.lang.Integer => i.longValue()
    case l: java.lang.Long => l
    case other => throw new IllegalArgumentException(
      s"window_funnel: bad window literal $other")
  }

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): ArrayBuffer[(Long, Int)] = ArrayBuffer.empty

  override def update(buf: ArrayBuffer[(Long, Int)], row: InternalRow): ArrayBuffer[(Long, Int)] = {
    val tv = time.eval(row)
    if (tv != null) {
      var mask = 0
      var j = 0
      while (j < conds.size) {
        if (conds(j).eval(row) == true) mask |= 1 << j
        j += 1
      }
      if (mask != 0) buf += ((tv.asInstanceOf[Long], mask))
    }
    buf
  }

  override def merge(a: ArrayBuffer[(Long, Int)], b: ArrayBuffer[(Long, Int)]): ArrayBuffer[(Long, Int)] =
    a ++= b

  override def eval(buf: ArrayBuffer[(Long, Int)]): Any = {
    val k = conds.size
    val starts = Array.fill(k)(Long.MinValue)
    // total order => deterministic under any partition/merge order
    val sorted = buf.sortBy(identity)
    var best = 0
    sorted.foreach { case (t, mask) =>
      // fold against pre-row state: a row never chains on itself
      val ext = Array.fill(k)(Long.MinValue)
      var j = 0
      while (j < k) {
        if ((mask & (1 << j)) != 0) {
          if (j == 0) ext(0) = t
          else {
            val m = starts(j - 1)
            // d >= 0 guards the overflow class too: t values are
            // user-controlled through /query, and t - m for m near
            // Long.MinValue wraps negative and would pass <= windowNs
            // for events ~2^64 ns apart (review r10). Sorted fold
            // guarantees m <= t for real chains, so d >= 0 rejects
            // only wrapped arithmetic.
            val d = t - m
            if (m != Long.MinValue && d >= 0 && d <= windowNs) ext(j) = m
          }
        }
        j += 1
      }
      j = 0
      while (j < k) {
        if (ext(j) != Long.MinValue && ext(j) > starts(j)) starts(j) = ext(j)
        if (starts(j) != Long.MinValue && j + 1 > best) best = j + 1
        j += 1
      }
    }
    best
  }

  override def serialize(buf: ArrayBuffer[(Long, Int)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 12)
    bb.putInt(buf.size)
    buf.foreach { case (t, m) => bb.putLong(t); bb.putInt(m) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[(Long, Int)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new ArrayBuffer[(Long, Int)](n)
    var i = 0
    while (i < n) { buf += ((bb.getLong, bb.getInt)); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): WindowFunnelAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): WindowFunnelAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): WindowFunnelAgg =
    copy(windowExpr = newChildren.head, time = newChildren(1), conds = newChildren.drop(2))

  override def prettyName: String = "window_funnel"
}
