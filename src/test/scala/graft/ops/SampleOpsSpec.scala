package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SampleOpsSpec extends SparkSpec {
  import spark.implicits._

  test("sampleByHash is a pure function of the key: partitioning-invariant") {
    val df = spark.range(2000).toDF("id")
    def ids(parts: Int) =
      SampleOps.sampleByHash(df.repartition(parts), col("id"), 0.3)
        .select("id").as[Long].collect().toSet
    val once = ids(1)
    assert(ids(7) == once && ids(32) == once,
      "resplitting the input must not change sample membership")
  }

  test("sample rate lands near the requested fraction") {
    val df = spark.range(20000).toDF("id")
    val n = SampleOps.sampleByHash(df, col("id"), 0.25).count()
    assert(math.abs(n / 20000.0 - 0.25) < 0.02, s"got $n of 20000")
  }

  test("buckets cover [0, SampleBuckets) roughly uniformly") {
    val b = spark.range(10000).select(SampleOps.hashBucket(col("id")).as("b"))
    val (lo, hi) = (b.agg(min("b")).as[Long].head(), b.agg(max("b")).as[Long].head())
    assert(lo >= 0 && hi < SampleOps.SampleBuckets)
    val distinct = b.distinct().count()
    assert(distinct > 900, s"only $distinct of 1000 buckets hit")
  }

  test("stratifiedSample takes exactly min(n, |stratum|) per stratum, order-invariant") {
    val df = spark.range(100).select(col("id"), (col("id") % 3).as("g"))
    val got = SampleOps.stratifiedSample(df, col("g"), col("id"), n = 10)
    val per = got.groupBy("g").count().as[(Long, Long)].collect().toMap
    assert(per.values.toSet == Set(10L), per)
    // tiny stratum: quota caps at stratum size
    val small = df.filter(col("id") < 5) // g=0:{0,3}, g=1:{1,4}, g=2:{2}
    val perSmall = SampleOps.stratifiedSample(small, col("g"), col("id"), n = 10)
      .groupBy("g").count().as[(Long, Long)].collect().toMap
    assert(perSmall == Map(0L -> 2L, 1L -> 2L, 2L -> 1L), perSmall)
    // membership is a pure function of the data, not its partitioning
    def members(parts: Int) =
      SampleOps.stratifiedSample(df.repartition(parts), col("g"), col("id"), 10)
        .select("id").as[Long].collect().toSet
    assert(members(1) == members(13))
  }

  test("stratifiedSample's rank<=N compiles to WindowGroupLimit (O(N) task state)") {
    val df = spark.range(1000).select(col("id"), (col("id") % 3).as("g"))
    val plan = SampleOps.stratifiedSample(df, col("g"), col("id"), n = 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan)
  }
}
