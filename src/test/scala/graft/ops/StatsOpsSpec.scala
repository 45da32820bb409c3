package graft.ops

import graft.SparkSpec

class StatsOpsSpec extends SparkSpec {
  import spark.implicits._

  private def events() = (0 until 100).map(i =>
    (if (i % 2 == 0) "a" else "b", i.toDouble)).toDF("event_type", "value")

  test("exact regime: sort-based percentile, values match the exact definition") {
    val df = StatsOps.groupedPercentiles(events(), "event_type", "value",
      Seq(0.5 -> "p50", 0.9 -> "p90"))
    // the plan carries the exact aggregate, not the t-digest sketch
    val plan = df.queryExecution.analyzed.toString
    assert(plan.contains("percentile") && !plan.contains("approx"), plan)
    val a = df.filter($"event_type" === "a").collect()(0)
    // group a = 0,2,…,98: exact linear-interpolated median = 49.0
    assert(a.getAs[Double]("p50") == 49.0)
    assert(a.getAs[Long]("n") == 50L)
  }

  test("past the group-size threshold the same call routes to approx_percentile") {
    val df = StatsOps.groupedPercentiles(events(), "event_type", "value",
      Seq(0.5 -> "p50"), exactMaxGroup = 10L)
    val plan = df.queryExecution.analyzed.toString
    assert(plan.contains("approx_percentile") || plan.contains("percentile_approx"), plan)
    // t-digest at this tiny size is exact too — sanity, not the contract
    val a = df.filter($"event_type" === "a").collect()(0)
    assert(math.abs(a.getAs[Double]("p50") - 49.0) <= 1.0)
  }

  test("knownMaxGroup skips the guard scan and decides the route") {
    val exact = StatsOps.groupedPercentiles(events(), "event_type", "value",
      Seq(0.5 -> "p50"), knownMaxGroup = Some(1L))
    assert(!exact.queryExecution.analyzed.toString.contains("approx"))
    val approx = StatsOps.groupedPercentiles(events(), "event_type", "value",
      Seq(0.5 -> "p50"), knownMaxGroup = Some(StatsOps.ExactPercentileMaxGroup + 1))
    assert(approx.queryExecution.analyzed.toString.contains("approx_percentile"))
  }

  test("output type is DOUBLE on both routes; internal alias survives a group column named c") {
    // approx_percentile returns the INPUT type (BIGINT here) — without
    // the cast the 4dp-float contract silently flipped to integer at
    // the route boundary and cross-route unions failed on schema
    val longs = (0 until 100).map(i => ("g", i.toLong)).toDF("c", "v")
    val exact = StatsOps.groupedPercentiles(longs, "c", "v", Seq(0.5 -> "p50"))
    val approx = StatsOps.groupedPercentiles(longs, "c", "v", Seq(0.5 -> "p50"),
      exactMaxGroup = 10L)
    assert(exact.schema("p50").dataType.typeName == "double")
    assert(approx.schema("p50").dataType.typeName == "double")
    assert(exact.unionByName(approx).count() == 2L) // schemas agree
    // the route probe's internal count alias must not collide with a
    // group column literally named "c"
    assert(approx.collect()(0).getAs[Double]("p50") >= 0.0)
  }

  test("threshold is pinned where the exact multiset stops fitting comfortably") {
    // 10 M doubles ≈ 80 MB reducer heap for one group's multiset — the
    // documented bound the SCALE.md q17 row routes around
    assert(StatsOps.ExactPercentileMaxGroup == 10000000L)
  }

  test("empty input routes exact and returns no rows, not an NPE") {
    val empty = Seq.empty[(String, Double)].toDF("event_type", "value")
    assert(StatsOps.groupedPercentiles(empty, "event_type", "value",
      Seq(0.5 -> "p50")).count() == 0L)
  }
}
