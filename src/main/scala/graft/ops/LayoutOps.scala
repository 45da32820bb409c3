package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton) clustering.
  *
  * The lakehouse prunes scans from per-file min/max zone maps
  * (`index/MetadataIndex` + `pruning/GraftFileIndex`); a single-column
  * sort makes those stats tight on ONE column only — a file sorted by
  * time spans the whole user_id domain, so a `user_id BETWEEN …`
  * predicate prunes nothing. Interleaving the bits of two bucketed
  * key columns (the classic Morton curve; Delta/Iceberg `OPTIMIZE
  * ZORDER BY` is the same idea) gives every file a tight range on BOTH
  * columns at once, so two-dimensional predicates (time × series,
  * time × tenant) prune multiplicatively. At 100 TB this is the
  * difference between reading a tenant's hour and reading the fleet's.
  *
  * Spark-first: the z-value is a pure integer column expression
  * (shift/mask spread — whole-stage codegen, no UDF), the layout is
  * `repartitionByRange` + `sortWithinPartitions` on that expression
  * (Spark's own range exchange does the balancing), and the SAME
  * arithmetic renders to DuckDB SQL for the differential oracle
  * (p88 — both engines compute identical z-values bit for bit). */
object LayoutOps {

  /** Bits kept per dimension. 31 bits each keeps the final interleave
    * inside 62 bits — the z-value stays a POSITIVE long, so its sort
    * order equals its unsigned bit order (a sign flip would sort the
    * top half of the curve first). */
  val DimMask: Long = 0x7FFFFFFFL

  private val SpreadMasks: Seq[(Int, Long)] = Seq(
    16 -> 0x0000FFFF0000FFFFL,
    8 -> 0x00FF00FF00FF00FFL,
    4 -> 0x0F0F0F0F0F0F0F0FL,
    2 -> 0x3333333333333333L,
    1 -> 0x5555555555555555L)

  /** Spread the low 31 bits of `c` to the even bit positions (the
    * standard mask-doubling Morton spread). */
  def spreadBits(c: Column): Column =
    SpreadMasks.foldLeft(c.bitwiseAND(lit(DimMask))) {
      case (x, (s, m)) => (x.bitwiseOR(shiftleft(x, s))).bitwiseAND(lit(m))
    }

  /** 2-D Morton code: x in even bits, y in odd bits. Inputs are masked
    * to 31 bits — callers bucket coarse domains (e.g. hour numbers,
    * id hashes) into that range first. */
  def zorder2(x: Column, y: Column): Column =
    spreadBits(x).bitwiseOR(shiftleft(spreadBits(y), 1))

  /** The identical arithmetic as DuckDB SQL text (for differential
    * oracles): every shift/mask constant mirrors [[spreadBits]]. */
  def spreadBitsSql(e: String): String =
    SpreadMasks.foldLeft(s"(($e) & ${DimMask})") {
      case (x, (s, m)) => s"((($x) | (($x) << $s)) & $m)"
    }

  def zorder2Sql(x: String, y: String): String =
    s"(${spreadBitsSql(x)} | (${spreadBitsSql(y)} << 1))"

  /** Cluster `df` on the Morton curve of two bucketed key expressions:
    * one range exchange on the z-value (sampled split points — Spark's
    * own range partitioner balances file sizes), in-partition sort so
    * row-group zone maps inside each file are tight too. The write
    * path then emits `numFiles` files whose min/max rectangles tile
    * the (x, y) plane instead of striping one dimension. */
  def zorderLayout(df: DataFrame, x: Column, y: Column,
                   numFiles: Int): DataFrame = {
    // collision-safe scratch name: silently overwriting (then dropping)
    // a caller's own `__z` column would lose its data
    val zc = Iterator.from(0).map(i => if (i == 0) "__z" else s"__z$i")
      .find(n => !df.columns.contains(n)).get
    df.withColumn(zc, zorder2(x, y))
      .repartitionByRange(numFiles, col(zc))
      .sortWithinPartitions(col(zc))
      .drop(zc)
  }
}
