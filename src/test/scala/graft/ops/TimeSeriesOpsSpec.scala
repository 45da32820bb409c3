package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TimeSeriesOpsSpec extends SparkSpec {
  import spark.implicits._

  test("pointInInterval matches exactly the BETWEEN pairs, across bucket boundaries") {
    // bucket width 10: interval [8, 22] spans buckets 0,1,2
    val points = Seq(("k", 1L, 7L), ("k", 2L, 8L), ("k", 3L, 15L), ("k", 4L, 22L),
      ("k", 5L, 23L), ("z", 6L, 15L)).toDF("k", "p_id", "t")
    val ivs = Seq(("k", 100L, 8L, 22L)).toDF("k", "iv_id", "s0", "e0")
    val got = RangeJoin.pointInInterval(points, ivs, "k", "t", "s0", "e0", bucketNs = 10L)
      .select("p_id", "iv_id").as[(Long, Long)].collect().toSet
    // inclusive both ends; wrong key and out-of-range points excluded
    assert(got == Set((2L, 100L), (3L, 100L), (4L, 100L)))
    // no duplicate pairs from multi-bucket intervals
    val cnt = RangeJoin.pointInInterval(points, ivs, "k", "t", "s0", "e0", 10L).count()
    assert(cnt == 3)
  }

  test("pointInInterval buckets ns-epoch times exactly (no double rounding)") {
    val base = 1700000000000000000L // > 2^53: double division would misbucket
    val points = Seq(("k", 1L, base + 1L)).toDF("k", "p_id", "t")
    val ivs = Seq(("k", 9L, base, base + 2L)).toDF("k", "iv_id", "s0", "e0")
    val got = RangeJoin.pointInInterval(points, ivs, "k", "t", "s0", "e0",
      bucketNs = 3600000000000L).count()
    assert(got == 1)
  }

  test("sessionize splits on gaps > gapNs, numbering deterministically") {
    val df = Seq(
      ("a", 1L, 0L), ("a", 2L, 10L), ("a", 3L, 31L),  // gap 21 > 20 -> new session
      ("a", 4L, 40L), ("b", 5L, 0L))                   // b: own numbering
      .toDF("k", "id", "t")
    val r = Sessionize.sessionize(df, "k", "t", "id", gapNs = 20L)
      .select("id", "session_seq").as[(Long, Long)].collect().toMap
    assert(r == Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 1L, 5L -> 0L))
  }

  test("sessionize: a gap exactly equal to gapNs does NOT split") {
    val df = Seq(("a", 1L, 0L), ("a", 2L, 20L)).toDF("k", "id", "t")
    val r = Sessionize.sessionize(df, "k", "t", "id", gapNs = 20L)
      .select("session_seq").as[Long].collect().toSet
    assert(r == Set(0L))
  }
}
