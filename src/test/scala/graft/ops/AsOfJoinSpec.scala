package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("asof attaches the latest right row at-or-before each left time, per key") {
    val left = Seq(("a", 5L, "l1"), ("a", 10L, "l2"), ("b", 7L, "l3"), ("a", 2L, "l4"))
      .toDF("k", "lt", "tag")
    val right = Seq(("a", 3L, 30.0), ("a", 10L, 100.0), ("c", 1L, 9.9))
      .toDF("k", "rt", "v")
    val r = AsOfJoin.asof(left, right, key = "k", leftTime = "lt",
      rightTime = "rt", rightCols = Seq("rt", "v"))
      .orderBy("tag")
      .select($"tag", $"rt", $"v")
      .collect().map(x => (x.getString(0),
        if (x.isNullAt(1)) null else x.getLong(1),
        if (x.isNullAt(2)) null else x.getDouble(2))).toSeq
    assert(r == Seq(
      ("l1", 3L, 30.0),    // 3 <= 5
      ("l2", 10L, 100.0),  // tie matches (inclusive)
      ("l3", null, null),  // key b has no right rows
      ("l4", null, null))) // no right row at or before t=2
  }

  test("a matched right row with a null payload value stays matched (no skip-past)") {
    val left = Seq(("a", 10L)).toDF("k", "lt")
    val right = Seq(("a", 3L, Some(1.0)), ("a", 7L, None))
      .toDF("k", "rt", "v")
    val r = AsOfJoin.asof(left, right, "k", "lt", "rt", Seq("rt", "v")).collect().head
    assert(r.getAs[Long]("rt") == 7L, "must match the t=7 row, not skip to t=3")
    assert(r.isNullAt(r.fieldIndex("v")), "and carry its null value")
  }

  test("a right row with NULL time matches nothing (SQL ASOF semantics, review r10)") {
    // null __t sorted first (asc-nulls-first) and its payload struct
    // carried onto every left row before the first real right row
    val left = Seq(("a", 5L)).toDF("k", "lt")
    val right = Seq(("a", Option.empty[Long], 30.0), ("a", Some(10L), 99.0))
      .toDF("k", "rt", "v")
    val r = AsOfJoin.asof(left, right, key = "k", leftTime = "lt",
      rightTime = "rt", rightCols = Seq("v")).collect()(0)
    assert(r.isNullAt(r.fieldIndex("v")), r.toString)
  }

  test("left row count and columns are preserved") {
    val left = spark.range(100).select(lit("k").as("k"), $"id".as("lt"), ($"id" * 2).as("x"))
    val right = spark.range(10).select(lit("k").as("k"), ($"id" * 10).as("rt"), $"id".as("rv"))
    val out = AsOfJoin.asof(left, right, "k", "lt", "rt", Seq("rv"))
    assert(out.count() == 100)
    assert(out.columns.toSeq == Seq("k", "lt", "x", "rv"))
    // spot: lt=55 -> latest rt<=55 is 50 -> rv 5
    assert(out.filter($"lt" === 55).select("rv").as[Long].head() == 5L)
  }
}
