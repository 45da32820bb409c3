package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LayoutOpsSpec extends SparkSpec {
  import spark.implicits._

  /** Reference Morton interleave — the naive bit loop the shift/mask
    * chain must agree with. */
  private def mortonRef(x: Long, y: Long): Long = {
    var z = 0L
    var i = 0
    while (i < 31) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  test("zorder2 equals the naive bit-interleave on random and edge inputs") {
    val r = new scala.util.Random(42)
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (LayoutOps.DimMask, LayoutOps.DimMask),
      (LayoutOps.DimMask, 0L), (12345L, 67890L)) ++
      Seq.fill(50)((r.nextLong().abs & LayoutOps.DimMask,
        r.nextLong().abs & LayoutOps.DimMask))
    val got = cases.toDF("x", "y")
      .select(col("x"), col("y"), LayoutOps.zorder2(col("x"), col("y")).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, z) =>
      assert(z == mortonRef(x, y), s"($x, $y): got $z, want ${mortonRef(x, y)}")
      assert(z >= 0L, s"z-value must stay positive for order-preserving sort: $z")
    }
  }

  test("inputs beyond 31 bits are masked, not sign-corrupted") {
    val got = Seq((Long.MaxValue, -1L)).toDF("x", "y")
      .select(LayoutOps.zorder2(col("x"), col("y"))).as[Long].collect()(0)
    assert(got == mortonRef(Long.MaxValue & LayoutOps.DimMask, -1L & LayoutOps.DimMask))
    assert(got >= 0L)
  }

  test("zorder2Sql renders the identical arithmetic (Spark SQL replay)") {
    // the oracle contract: the SQL text must compute the same z as the
    // Column chain — run the rendered text through Spark itself
    val sql = LayoutOps.zorder2Sql("x", "y")
    val rows = Seq((3L, 5L), (1048575L, 77L)).toDF("x", "y")
    val viaSql = rows.selectExpr(s"$sql AS z").as[Long].collect().toSeq
    val viaCol = rows.select(LayoutOps.zorder2(col("x"), col("y"))).as[Long].collect().toSeq
    assert(viaSql == viaCol)
  }

  test("zorder_key is on the SQL surface as a native builder") {
    val z = spark.sql("SELECT zorder_key(3, 5) AS z").as[Long].collect()(0)
    assert(z == mortonRef(3L, 5L))
    // wrong arity: a clear usage message, not an opaque IndexOutOfBounds
    val e = intercept[Exception](spark.sql("SELECT zorder_key(3)").collect())
    assert(e.getMessage.contains("expected 2 arguments"), e.getMessage)
  }

  test("zorderLayout does not clobber a caller's own __z column") {
    val df = Seq((1L, 2L, "keep-me"), (3L, 4L, "also"))
      .toDF("x", "y", "__z")
    val out = LayoutOps.zorderLayout(df, col("x"), col("y"), 2)
    assert(out.columns.toSeq == Seq("x", "y", "__z"))
    assert(out.select("__z").as[String].collect().toSet ==
      Set("keep-me", "also"))
  }

  test("z-order layout makes per-file rectangles tight on BOTH dimensions") {
    // 32x32 grid of (hour, series): a time-sorted layout stripes hours,
    // so every file spans the full series range and a series predicate
    // prunes nothing; the Morton layout tiles the plane, so per-file
    // series ranges shrink and series predicates prune files. Measure
    // exactly that: sum of per-partition series spans.
    val grid = (for (h <- 0 until 32; u <- 0 until 32) yield (h.toLong, u.toLong))
      .toDF("hour", "series")
    val files = 16
    def spanSum(df: org.apache.spark.sql.DataFrame): Long = df
      .withColumn("__pid", spark_partition_id())
      .groupBy("__pid").agg((max("series") - min("series")).as("span"))
      .agg(sum("span")).as[Long].collect()(0)
    val timeSorted = grid.repartitionByRange(files, col("hour"))
      .sortWithinPartitions(col("hour"))
    val zOrdered = LayoutOps.zorderLayout(grid, col("hour"), col("series"), files)
    val (tSpan, zSpan) = (spanSum(timeSorted), spanSum(zOrdered))
    // time-striped: every file spans ~the full 0..31 series range
    assert(tSpan >= files * 28L, s"time layout unexpectedly tight: $tSpan")
    // Morton tiles: per-file series span collapses to a fraction
    assert(zSpan * 2 <= tSpan, s"z-order not tighter: z=$zSpan vs t=$tSpan")
    // and no rows are lost or duplicated by the layout exchange
    assert(zOrdered.count() == 32L * 32L)
  }
}
