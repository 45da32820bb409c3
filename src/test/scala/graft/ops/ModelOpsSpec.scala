package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ModelOpsSpec extends SparkSpec {
  import spark.implicits._

  // high-quality shape: long, stopword-rich, normal word length (clears
  // the p09 gate); low-quality shape: short, no stopwords
  private val good = ("the quality of the data is good and it was clear " +
    "that the model for the corpus is sound and it is ready ") * 3
  private val bad = "zzzz qqqq xxxx"

  private def corpus = (0L until 40L).map { i =>
    if (i % 2 == 0) (i, good + s" extra$i") else (i, bad + s" noise$i")
  }.toDF("doc_id", "text")

  test("weak labels split the corpus and the learned model reproduces them") {
    val out = ModelOps.nbQualityScores(corpus).cache()
    val labels = out.select("label").as[Boolean].collect()
    assert(labels.count(identity) == 20 && labels.count(!_) == 20,
      "seed gate must split this corpus evenly")
    // distillation fidelity: hashed-ngram NB separates two disjoint
    // vocabularies perfectly
    val agree = out.filter(col("agree")).count()
    assert(agree == 40L, s"only $agree/40 agree")
    // both predicted classes occur (score crosses 0)
    val preds = out.select("pred").as[Boolean].collect().toSet
    assert(preds == Set(true, false))
    out.unpersist()
  }

  test("scores are a pure function of the data: partitioning-invariant") {
    def rows(parts: Int) =
      ModelOps.nbQualityScores(corpus.repartition(parts))
        .select("doc_id", "score").as[(Long, Long)].collect().toSortedMap
    assert(rows(1) == rows(13))
  }

  test("model join broadcasts; corpus is never shuffled to score") {
    val plan = ModelOps.nbQualityScores(corpus)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  private implicit class ToSortedMap(a: Array[(Long, Long)]) {
    def toSortedMap: Map[Long, Long] = a.toMap
  }
}
