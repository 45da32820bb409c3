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

  test("an inverted interval (end < start) matches nothing, cheaply (review r10)") {
    // sequence(start, stop) defaults to step -1 when start > stop: one
    // corrupt row would explode a huge descending bucket range instead
    // of matching zero points
    val points = Seq(("k", 100L)).toDF("k", "pt")
    val ivs = Seq(("k", 3_600_000_000_000_000_000L, 0L, "bad"),
      ("k", 50L, 200L, "good")).toDF("k", "s0", "e0", "tag")
    val r = RangeJoin.pointInInterval(points, ivs, key = "k",
      pointTime = "pt", ivStart = "s0", ivEnd = "e0",
      bucketNs = 3_600_000_000_000L).select("tag").collect().map(_.getString(0))
    assert(r.toSeq == Seq("good"))
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

  test("gapFill materializes every bucket per key, zero-count gaps LOCF-filled") {
    // key a observes buckets 0 and 3 (width 10); grid must be 0,1,2,3
    // with gaps carrying bucket-0's average; key b has its own range
    val df = Seq(("a", 1L, 2.0), ("a", 3L, 4.0), ("a", 35L, 9.0),
      ("b", 100L, 1.0)).toDF("k", "t", "v")
    val r = TimeSeriesOps.gapFill(df, "k", "t", "v", bucketNs = 10L)
      .select($"k", $"bucket_ts", $"n", $"v_avg", $"v_fill")
      .as[(String, Long, Long, Option[Double], Double)].collect().toSet
    assert(r == Set(
      ("a", 0L, 2L, Some(3.0), 3.0),   // avg(2,4)
      ("a", 10L, 0L, None, 3.0),       // gap: carried
      ("a", 20L, 0L, None, 3.0),       // gap: carried
      ("a", 30L, 1L, Some(9.0), 9.0),
      ("b", 100L, 1L, Some(1.0), 1.0)))
  }

  test("windowFunnel: full chain within window reaches max level") {
    val df = funnelDf(Seq((1L, 0L, "view"), (1L, 5L, "click"), (1L, 9L, "purchase")))
    assert(funnelLevels(df) == Map(1L -> 3))
  }

  test("windowFunnel: window anchors at the chain's FIRST event (CH semantics)") {
    // purchase is within 10 of the click but 11 from the view -> level 2
    val df = funnelDf(Seq((6L, 0L, "view"), (6L, 9L, "click"), (6L, 11L, "purchase")))
    assert(funnelLevels(df) == Map(6L -> 2))
  }

  test("windowFunnel: a later stage-1 event restarts the window (max-start DP)") {
    // click at 15 is outside [0,10] but inside [8,18] of the second view
    val df = funnelDf(Seq((4L, 0L, "view"), (4L, 8L, "view"), (4L, 15L, "click")))
    assert(funnelLevels(df) == Map(4L -> 2))
  }

  test("windowFunnel: out-of-order stages don't chain; no stage-1 means level 0") {
    val wrongOrder = funnelDf(Seq((5L, 0L, "purchase"), (5L, 1L, "click"), (5L, 2L, "view")))
    assert(funnelLevels(wrongOrder) == Map(5L -> 1))
    val noStage1 = funnelDf(Seq((3L, 0L, "click"), (3L, 1L, "purchase")))
    assert(funnelLevels(noStage1) == Map(3L -> 0))
  }

  test("windowFunnel: same-timestamp events chain by tie order, not simultaneity") {
    // click shares t=0 with the view but has a later tie id -> chains;
    // the purchase at the SAME (t, id) rank as nothing after it stays out
    val df = funnelDf(Seq((7L, 0L, "view"), (7L, 0L, "click")))
    assert(funnelLevels(df) == Map(7L -> 2))
  }

  private def funnelDf(rows: Seq[(Long, Long, String)]) =
    rows.zipWithIndex.map { case ((u, t, e), i) => (u, t, i.toLong, e) }
      .toDF("user_id", "t", "event_id", "event_type")

  private def funnelLevels(df: org.apache.spark.sql.DataFrame): Map[Long, Int] =
    TimeSeriesOps.windowFunnel(df, "user_id", "t", "event_id",
      stages = Seq("view", "click", "purchase").map(s => col("event_type") === s),
      windowNs = 10L)
      .as[(Long, Int)].collect().toMap

  test("gapFill matches an in-memory reference on randomized sparse series") {
    val rnd = new scala.util.Random(5)
    val bucket = 10L
    val rows = for {
      k <- Seq("a", "b", "c")
      _ <- 0 until 12
    } yield (k, rnd.nextInt(300).toLong, rnd.nextInt(100) / 10.0)
    val got = TimeSeriesOps.gapFill(rows.toDF("k", "t", "v"), "k", "t", "v", bucket)
      .select($"k", $"bucket_ts", $"n", $"v_avg", $"v_fill")
      .as[(String, Long, Long, Option[Double], Double)].collect().toSet

    val expected = rows.groupBy(_._1).flatMap { case (k, evs) =>
      val byB = evs.groupBy(_._2 / bucket)
      val (b0, b1) = (byB.keys.min, byB.keys.max)
      var lastAvg = 0.0
      (b0 to b1).map { b =>
        val vs = byB.getOrElse(b, Nil).map(_._3)
        val avg = if (vs.nonEmpty) Some(vs.sum / vs.size) else None
        avg.foreach(lastAvg = _)
        (k, b * bucket, vs.size.toLong, avg, lastAvg)
      }
    }.toSet
    assert(got == expected)
  }

  test("windowFunnel: overlapping stage conditions report the HIGHEST matched level") {
    // second event satisfies BOTH stage-1 (type in a,b) and stage-2
    // (type = b): its row level must be 2, not 1
    val df = Seq((1L, 0L, 0L, "a"), (1L, 5L, 1L, "b"))
      .toDF("user_id", "t", "event_id", "event_type")
    val got = TimeSeriesOps.windowFunnel(df, "user_id", "t", "event_id",
      stages = Seq(col("event_type").isin("a", "b"), col("event_type") === "b"),
      windowNs = 10L)
      .as[(Long, Int)].collect().toMap
    assert(got == Map(1L -> 2), got)
  }

  test("windowFunnel matches a brute-force chain DP on randomized event sets") {
    // 40 users x ~25 events, seeded: random stage/noise types, random
    // times in a SMALL range so window-boundary (t - start == w) and
    // duplicate-timestamp tie cases actually occur
    val stages = Seq("view", "click", "purchase")
    val types = stages :+ "noise"
    val w = 10L
    val rnd = new scala.util.Random(42)
    val rows = for {
      u <- 0L until 40L
      i <- 0 until (5 + rnd.nextInt(25))
    } yield (u, rnd.nextInt(40).toLong, u * 1000 + i, types(rnd.nextInt(types.size)))
    val got = funnelLevelsW(
      rows.toDF("user_id", "t", "event_id", "event_type"), stages, w)

    // independent reference: O(n^2 * stages) DP over (t, id)-sorted
    // events, chain start must satisfy t - start <= w at every step
    def refLevel(evs: Seq[(Long, Long, String)]): Int = {
      val sorted = evs.sortBy(e => (e._1, e._2)) // (t, id, type)
      val n = sorted.length
      val dp = Array.fill(n, stages.length + 1)(Long.MinValue)
      var best = 0
      for (i <- 0 until n) {
        val (t, _, e) = sorted(i)
        for (j <- 1 to stages.length if stages(j - 1) == e) {
          if (j == 1) dp(i)(1) = t
          else {
            var m = Long.MinValue
            for (p <- 0 until i)
              if (dp(p)(j - 1) != Long.MinValue && t - dp(p)(j - 1) <= w)
                m = math.max(m, dp(p)(j - 1))
            dp(i)(j) = m
          }
          if (dp(i)(j) != Long.MinValue) best = math.max(best, j)
        }
      }
      best
    }
    val expected = rows.groupBy(_._1).map { case (u, evs) =>
      u -> refLevel(evs.map(e => (e._2, e._3, e._4)).toSeq)
    }
    assert(got == expected)
  }

  private def funnelLevelsW(df: org.apache.spark.sql.DataFrame,
                            stages: Seq[String], w: Long): Map[Long, Int] =
    TimeSeriesOps.windowFunnel(df, "user_id", "t", "event_id",
      stages = stages.map(s => col("event_type") === s), windowNs = w)
      .as[(Long, Int)].collect().toMap

  test("window_funnel SQL aggregate matches the dataflow windowFunnel (unique times)") {
    // unique times: the aggregate's tie rule is (t, stage-mask) while
    // the dataflow uses (t, event_id) — identical whenever times differ
    val stages = Seq("view", "click", "purchase")
    val rnd = new scala.util.Random(7)
    val rows = for {
      u <- 0L until 30L
      i <- 0 until 20
    } yield (u, u * 10000 + rnd.nextInt(500) * 20 + i, u * 1000 + i,
      (stages :+ "noise")(rnd.nextInt(4)))
    val df = rows.toDF("user_id", "t", "event_id", "event_type")
    val expected = funnelLevelsW(df, stages, w = 100L)
    df.createOrReplaceTempView("wfev")
    graft.Tables.init(spark)
    val got = spark.sql(
      """SELECT user_id, window_funnel(100L, t,
        |  event_type = 'view', event_type = 'click', event_type = 'purchase')
        |FROM wfev GROUP BY user_id""".stripMargin)
      .as[(Long, Int)].collect().toMap
    assert(got == expected)
  }

  test("window_funnel: a multi-stage row folds against pre-row state (no self-chain)") {
    // one row matching both view and click cannot be level 2 by itself
    Seq((1L, 5L, "both")).toDF("user_id", "t", "k").createOrReplaceTempView("wfself")
    graft.Tables.init(spark)
    val lvl = spark.sql(
      """SELECT window_funnel(10L, t, k = 'both', k = 'both') FROM wfself""")
      .as[Int].head()
    assert(lvl == 1)
    // a NULL/degenerate window literal fails at ANALYSIS (TopKAgg's
    // k-range discipline) — not after the whole job scanned+shuffled
    Seq("CAST(NULL AS BIGINT)", "0L", "-5L").foreach { w =>
      val e = intercept[Exception](spark.sql(
        s"SELECT window_funnel($w, t, k = 'both') FROM wfself").collect())
      assert(e.getMessage.contains("positive literal"), s"$w: ${e.getMessage}")
    }
  }

  test("retention SQL aggregate matches the dataflow retention op") {
    val rnd = new scala.util.Random(11)
    val rows = for (u <- 0L until 50L; _ <- 0 until 8)
      yield (u, rnd.nextInt(5).toLong)
    val df = rows.toDF("user_id", "wk")
    df.createOrReplaceTempView("retev")
    graft.Tables.init(spark)
    val got = spark.sql(
      """SELECT user_id, retention(wk = 0, wk = 1, wk = 2, wk = 3) AS r
        |FROM retev GROUP BY user_id""".stripMargin)
      .as[(Long, Seq[Int])].collect().toMap
    val expected = TimeSeriesOps.retention(df, "user_id",
      conds = (0 until 4).map(i => col("wk") === i))
      .as[(Long, Int, Int, Int, Int)].collect()
      .map { case (u, a, b, c, d) => u -> Seq(a, b, c, d) }.toMap
    assert(got == expected)
  }

  test("retention: r_i requires BOTH cond0 and cond_i; cond0 gates everything") {
    val df = Seq((1L, 0L), (1L, 1L), (1L, 3L),   // active w0, w1, w3
      (2L, 1L), (2L, 2L),                         // no w0 -> all zeros
      (3L, 0L)).toDF("user_id", "wk")             // only w0
    val r = TimeSeriesOps.retention(df, "user_id",
      conds = (0 until 4).map(i => col("wk") === i))
      .as[(Long, Int, Int, Int, Int)].collect()
      .map { case (u, a, b, c, d) => u -> ((a, b, c, d)) }.toMap
    assert(r(1L) == ((1, 1, 0, 1)))
    assert(r(2L) == ((0, 0, 0, 0)))
    assert(r(3L) == ((1, 0, 0, 0)))
  }
}
