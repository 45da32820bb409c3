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

  test("temperatureMix flattens skewed strata toward sqrt weights") {
    // strata sizes 1000 / 100 / 10: α=1/2 weights √n ∝ 31.6/10/3.16
    val df = spark.range(1110).select(col("id"),
      when(col("id") < 1000, "big").when(col("id") < 1100, "mid")
        .otherwise("tiny").as("src"))
    val kept = SampleOps.temperatureMix(df, col("src"), col("id"), 0.25)
      .groupBy("src").count().as[(String, Long)].collect().toMap
    val fBig = kept("big") / 1000.0
    val fMid = kept("mid") / 100.0
    val fTiny = kept.getOrElse("tiny", 0L) / 10.0
    // keep-rate must INCREASE as stratum size decreases (flattening)
    assert(fBig < fMid && fMid <= fTiny, kept)
    // α=1/2 rates: r_s = 0.25·N·√n_s/(Z·n_s); bucket-floor granularity
    // makes the realized fraction approximate — check within ±0.05
    val z = math.floor(math.sqrt(1000)) + math.floor(math.sqrt(100)) +
      math.floor(math.sqrt(10))
    def expect(n: Double) =
      math.min(1.0, 0.25 * 1110 * math.floor(math.sqrt(n)) / (z * n))
    assert(math.abs(fBig - expect(1000)) < 0.05, (fBig, expect(1000)))
    assert(math.abs(fMid - expect(100)) < 0.1, (fMid, expect(100)))
  }

  test("temperatureMix membership is partitioning-invariant") {
    val df = spark.range(500).select(col("id"),
      concat(lit("s"), (col("id") % 7)).as("src"))
    def members(parts: Int) =
      SampleOps.temperatureMix(df.repartition(parts), col("src"), col("id"), 0.5)
        .select("id").as[Long].collect().toSet
    assert(members(1) == members(11))
  }

  test("temperatureMix clamps tiny strata at rate 1 (kept whole)") {
    // one doc in 'rare': targetFrac·N·w/(Z·1) > 1 -> min clamps, doc kept
    val df = spark.range(101).select(col("id"),
      when(col("id") < 100, "big").otherwise("rare").as("src"))
    val kept = SampleOps.temperatureMix(df, col("src"), col("id"), 0.9)
      .groupBy("src").count().as[(String, Long)].collect().toMap
    assert(kept("rare") == 1L, kept)
  }

  test("lengthCurriculum: bins partition the corpus, ordered by length") {
    // 100 docs, token counts 1..100 (text = k repeats of 'w')
    val docs = spark.range(1, 101).select(col("id").as("doc_id"),
      array_join(array_repeat(lit("w"), col("id").cast("int")), " ").as("text"))
    val bins = SampleOps.lengthCurriculum(docs, nBins = 10)
      .orderBy("bin").collect()
    assert(bins.map(_.getInt(0)).toSeq == (1 to 10), "all 10 bins present")
    // every doc lands in exactly one bin
    assert(bins.map(_.getLong(1)).sum == 100L)
    // uniform 1..100 with type-1 decile boundaries: 10 docs per bin
    assert(bins.map(_.getLong(1)).toSet == Set(10L), bins.mkString(", "))
    // bins are length-ordered and non-overlapping
    val ranges = bins.map(r => (r.getLong(3), r.getLong(4))) // (min_tok, max_tok)
    ranges.sliding(2).foreach { case Array((_, hi), (lo, _)) =>
      assert(hi < lo, s"bins overlap: $hi >= $lo")
    }
    assert(ranges.head._1 == 1L && ranges.last._2 == 100L)
  }

  test("dsirScores ranks target-like docs above off-target docs") {
    // two disjoint vocabularies: 30 'target' docs of english-ish words,
    // 30 off-target docs of digit-words; target model = the en docs, so
    // en-vocab buckets carry all the target mass
    val docs = spark.range(60).select(col("id").as("doc_id"),
      when(col("id") < 30, "en").otherwise("xx").as("lang"),
      when(col("id") < 30,
        concat(lit("the quick brown fox word"), col("id") % 3))
        .otherwise(concat(lit("111 222 333 444 num"), col("id") % 3)).as("text"))
    val got = SampleOps.dsirScores(docs, col("lang") === "en")
      .select("doc_id", "logw", "keep").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(got.length == 60)
    val (tgt, off) = got.partition(_._1 < 30)
    val minTgt = tgt.map(_._2).min
    val maxOff = off.map(_._2).max
    assert(minTgt > maxOff,
      s"every target doc must outscore every off-target doc ($minTgt vs $maxOff)")
    // keep is exactly the integer gate
    got.foreach { case (_, lw, k) => assert(k == (lw >= 0)) }
  }

  test("dsirScores weight math matches a by-hand replay of the quantized formula") {
    // tiny corpus, hand-replayable: compute expected logw in Scala from
    // the same bucket/model/llog2 definitions and compare row-for-row
    val rows = Seq((0L, "en", "aa bb"), (1L, "en", "aa"), (2L, "xx", "cc aa"))
    val docs = rows.toDF("doc_id", "lang", "text")
    def bucket(g: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(g.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md.substring(0, 6), 16) % SampleOps.DsirBuckets
    }
    def llog2(c: Long): Long = 63 - java.lang.Long.numberOfLeadingZeros(c + 1)
    def grams(t: String): Seq[String] = {
      val w = t.split("\\s+").toSeq
      w ++ w.sliding(2).filter(_.size == 2).map(_.mkString(" ")).toSeq
    }
    val inst = rows.flatMap { case (id, lang, t) =>
      grams(t).map(g => (id, lang == "en", bucket(g))) }
    val model = inst.groupBy(_._3).map { case (b, xs) =>
      b -> (xs.size.toLong, xs.count(_._2).toLong) }
    val bigR = inst.size.toLong
    val bigT = inst.count(_._2).toLong
    val expected = inst.groupBy(_._1).map { case (id, xs) =>
      val mw = xs.map { case (_, _, b) =>
        val (raw, tgt) = model(b); llog2(tgt) - llog2(raw) }.sum
      id -> (mw + xs.size * (llog2(bigR) - llog2(bigT)))
    }
    val got = SampleOps.dsirScores(docs, col("lang") === "en")
      .select("doc_id", "logw").as[(Long, Long)].collect().toMap
    assert(got == expected, s"got $got expected $expected")
  }

  test("leakageSafeSplit keeps every cluster member in one split, ~80/10/10 overall") {
    // 3000 singleton clusters + 3 multi-member clusters
    val singles = spark.range(10, 3010)
      .select(col("id").as("doc_id"), col("id").as("cluster_id"))
    val clustered = Seq(
      (0L, 0L), (1L, 0L), (2L, 0L),          // cluster 0
      (3L, 3L), (4L, 3L),                    // cluster 3
      (5L, 5L), (6L, 5L), (7L, 5L), (8L, 5L) // cluster 5
    ).toDF("doc_id", "cluster_id").union(singles)
    val got = SampleOps.leakageSafeSplit(clustered)
    // one split per cluster — the leakage guard itself
    val perCluster = got.groupBy("cluster_id")
      .agg(countDistinct("split").as("n")).agg(max("n")).as[Long].head()
    assert(perCluster == 1L, "a cluster straddled splits")
    // overall proportions near 80/10/10 over the 3003 clusters
    val dist = got.groupBy("split").count().as[(String, Long)].collect().toMap
    val n = dist.values.sum.toDouble
    assert(math.abs(dist("train") / n - 0.8) < 0.03, dist)
    assert(math.abs(dist("val") / n - 0.1) < 0.02, dist)
    assert(math.abs(dist("test") / n - 0.1) < 0.02, dist)
    // split is a pure function of cluster_id: same bucket rule as
    // hashBucket, so re-partitioning cannot move a doc between splits
    def members(parts: Int) =
      SampleOps.leakageSafeSplit(clustered.repartition(parts))
        .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(members(1) == members(17))
  }

  test("lengthCurriculum boundaries are integer data values (no interpolation)") {
    // heavily tied lengths: boundaries must still be actual data values
    // and every doc must be binned (sum preserved)
    val docs = spark.range(60).select(col("id").as("doc_id"),
      array_join(array_repeat(lit("w"), ((col("id") % 3) + 1).cast("int")), " ").as("text"))
    val bins = SampleOps.lengthCurriculum(docs, nBins = 4).collect()
    assert(bins.map(_.getLong(1)).sum == 60L)
    bins.foreach { r =>
      assert(Set(1L, 2L, 3L).contains(r.getLong(3)), r.toString) // min_tok a real value
    }
  }
}
