package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ShardOpsSpec extends SparkSpec {
  import spark.implicits._

  private def manifest(parts: Int = 4) =
    ShardOps.shuffleManifest(spark.range(1000).toDF("id").repartition(parts),
      col("id"))

  test("manifest is a permutation: every key once, per-shard seq contiguous, steps distinct") {
    val m = manifest().cache()
    try {
      assert(m.count() == 1000 && m.select("doc_id").distinct().count() == 1000)
      // seq is 1..n within each shard (row_number is gapless)
      val bad = m.groupBy("shard")
        .agg(count(lit(1)).as("n"), max("seq").as("mx"), min("seq").as("mn"))
        .filter(col("mx") =!= col("n") || col("mn") =!= 1)
      assert(bad.isEmpty, "per-shard seq must be contiguous from 1")
      assert(m.select("step").distinct().count() == 1000,
        "interleaved steps must be distinct across shards")
    } finally m.unpersist()
  }

  test("order is a pure function of (seed, key): partitioning-invariant, seed-sensitive") {
    def rows(parts: Int) = manifest(parts)
      .select("doc_id", "shard", "seq").as[(Long, Int, Long)].collect().toSet
    val once = rows(1)
    assert(rows(13) == once, "resplitting the input must not change the order")
    val other = ShardOps.shuffleManifest(
        spark.range(1000).toDF("id"), col("id"), seed = "epoch-1")
      .select("doc_id", "shard", "seq").as[(Long, Int, Long)].collect().toSet
    assert(other != once, "a new seed must be a new shuffle")
  }

  test("hash sharding balances shards") {
    val per = manifest().groupBy("shard").count().as[(Int, Long)].collect().toMap
    assert(per.size == ShardOps.Shards)
    val (lo, hi) = (per.values.min, per.values.max)
    assert(hi - lo < 100, s"shards too skewed: $per")
  }

  test("no global sort in the plan: one hash exchange on shard, no range partitioning") {
    val plan = manifest().queryExecution.executedPlan.toString
    assert(!plan.contains("rangepartitioning"),
      s"shuffleManifest must not global-sort:\n$plan")
    assert(plan.contains("hashpartitioning"), plan)
  }

  test("permutation sweep: manifest stays a bijection at odd sizes and shard counts") {
    val rnd = new scala.util.Random(11)
    for (_ <- 0 until 3) {
      val n = 1 + rnd.nextInt(500)
      val shards = 1 + rnd.nextInt(15)
      val m = ShardOps.shuffleManifest(
        spark.range(n).toDF("id"), col("id"), seed = s"s$n", shards = shards)
        .as[(Long, Int, Long, Long)].collect()
      assert(m.length == n && m.map(_._1).toSet.size == n)
      assert(m.map(_._4).toSet.size == n, "steps must be distinct")
      // step formula: step = (seq-1)*shards + shard, shard in range
      m.foreach { case (_, sh, seq, st) =>
        assert(sh >= 0 && sh < shards && st == (seq - 1) * shards + sh)
      }
    }
  }

  test("curriculumManifest: stages ordered within every shard, shuffle within stage") {
    import org.apache.spark.sql.functions.col
    // 300 docs across 3 planted bins
    val bins = spark.range(300).toDF("doc_id")
      .withColumn("bin", (col("doc_id") % 3 + 1).cast("int"))
    val m = ShardOps.curriculumManifest(bins, seed = "e0", shards = 4)
      .as[(Long, Int, Int, Long, Long)].collect()
    assert(m.length == 300 && m.map(_._1).toSet.size == 300)
    assert(m.map(_._5).toSet.size == 300, "steps distinct")
    // within each shard, bin is non-decreasing along seq
    m.groupBy(_._3).foreach { case (_, rows) =>
      val byseq = rows.sortBy(_._4).map(_._2)
      assert(byseq.sameElements(byseq.sorted), "curriculum order violated")
    }
    // shard assignment ignores the bin: same as the plain shuffle's
    val plain = ShardOps.shuffleManifest(
      bins.select(col("doc_id")), col("doc_id"), seed = "e0", shards = 4)
      .as[(Long, Int, Long, Long)].collect().map(r => r._1 -> r._2).toMap
    assert(m.forall { case (id, _, sh, _, _) => plain(id) == sh })
    // a new seed reorders WITHIN a stage but never across stages
    val m2 = ShardOps.curriculumManifest(bins, seed = "e1", shards = 4)
      .as[(Long, Int, Int, Long, Long)].collect()
    m2.groupBy(_._3).foreach { case (_, rows) =>
      val byseq = rows.sortBy(_._4).map(_._2)
      assert(byseq.sameElements(byseq.sorted))
    }
    assert(m.map(r => r._1 -> r._4).toMap != m2.map(r => r._1 -> r._4).toMap,
      "different epoch seed must reshuffle")
  }
}
