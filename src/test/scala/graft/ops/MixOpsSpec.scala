package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MixOpsSpec extends SparkSpec {
  import spark.implicits._

  /** Synthetic corpus with controlled quality: quality rises with token
    * count, so doc ranks inside a source are predictable; several docs
    * share a score so the boundary-group tie path runs. */
  private def corpus(rows: Seq[(Long, String, String, String)]) =
    rows.toDF("doc_id", "text", "lang", "source")

  test("domainCap == the rank definition (brute-force window), ties included") {
    // source A: 12 docs, 4 distinct scores with ties straddling the cap;
    // source B: 3 docs (under cap -> all kept)
    val rows =
      (1L to 12L).map { i =>
        val words = Seq.fill(((i - 1) / 3 + 1).toInt * 5)("tok").mkString(" ")
        (i, words, "en", "A")
      } ++ (21L to 23L).map(i => (i, "short text here", "en", "B"))
    val docs = corpus(rows)
    val got = MixOps.domainCap(docs, cap = 8)
      .select("doc_id", "kept").as[(Long, Boolean)].collect().toMap

    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("source").orderBy(col("q").desc, col("doc_id"))
    val want = docs
      .select(col("doc_id"), col("source"), TextOps.qualityScore(col("text")).as("q"))
      .withColumn("rn", row_number().over(w))
      .select(col("doc_id"), (col("rn") <= 8).as("kept"))
      .as[(Long, Boolean)].collect().toMap
    assert(got == want)
    assert(got.values.count(identity) == 8 + 3) // A capped, B whole
  }

  test("domainCap keeps every doc exactly once (clear ∪ boundary is a partition)") {
    val rows = (1L to 40L).map(i =>
      (i, Seq.fill((i % 7 + 1).toInt)("w").mkString(" "), "en", s"s${i % 3}"))
    val out = MixOps.domainCap(corpus(rows), cap = 5)
    assert(out.count() == 40)
    assert(out.select("doc_id").distinct().count() == 40)
    assert(out.filter(col("kept")).count() == 15) // 3 sources x cap 5
  }

  test("domainCap plan: no rank window over source — only histogram + boundary group") {
    val rows = (1L to 60L).map(i =>
      (i, Seq.fill((i % 5 + 1).toInt)("w").mkString(" "), "en", s"s${i % 2}"))
    val plan = MixOps.domainCap(corpus(rows), cap = 10)
      .queryExecution.optimizedPlan.toString
    // the only windows allowed: the histogram cumulative (partition by
    // source over the DIMENSION-sized hist) and the (source, q) tie rank;
    // a corpus-wide row_number over source alone would read "partitionBy
    // [source]" with row_number — assert the tie window carries q too
    val rankWindows = plan.linesIterator.filter(_.contains("row_number")).toSeq
    assert(rankWindows.nonEmpty)
    assert(rankWindows.forall(_.contains("q#")),
      s"rank window must be scoped to the boundary (source, q) group:\n$plan")
  }

  test("mixturePlan: integer-exact allocation, epochs, and conservation bounds") {
    val rows =
      (1L to 100L).map(i => (i, Seq.fill(20)("w").mkString(" "), "en", "big")) ++
      (101L to 110L).map(i => (i, Seq.fill(10)("w").mkString(" "), "de", "small"))
    val out = MixOps.mixturePlan(corpus(rows), budget = 1000L)
      .orderBy("lang").as[(String, String, Long, Long, Long, Long, Long)].collect()
    // big: 2000 tokens, w=44; small: 100 tokens, w=10; Z=54
    val Seq(de, en) = out.toSeq.sortBy(_._1)
    assert(en == (("en", "big", 100L, 2000L, 44L * 1000000L / 54L, 44L * 1000L / 54L,
      (44L * 1000L / 54L) * 10000L / 2000L)))
    assert(de == (("de", "small", 10L, 100L, 10L * 1000000L / 54L, 10L * 1000L / 54L,
      (10L * 1000L / 54L) * 10000L / 100L)))
    // √-temperature: the small slice oversamples (epochs > big's)
    assert(de._7 > en._7)
    // allocations never exceed the budget
    assert(out.map(_._6).sum <= 1000L)
  }

  test("mixturePlan plan: corpus aggregates once, total is a 1-row broadcast") {
    val rows = (1L to 50L).map(i => (i, "a b c", "en", s"s${i % 4}"))
    val plan = MixOps.mixturePlan(corpus(rows)).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      plan)
  }
}
