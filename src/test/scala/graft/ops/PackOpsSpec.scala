package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Sequence packing (p30): the distributed per-shard scan must compute
  * exactly the sequential next-fit definition. */
class PackOpsSpec extends SparkSpec {

  /** The sequential definition: per shard, in doc_id order. */
  private def reference(rows: Seq[(Int, Long, Int)], budget: Int)
  : Seq[(Int, Long, Int, Long, Long)] =
    rows.groupBy(_._1).toSeq.flatMap { case (shard, docs) =>
      var bin = 0L; var fill = 0L
      docs.sortBy(_._2).map { case (_, id, n) =>
        if (fill > 0 && fill + n > budget) { bin += 1; fill = 0L }
        val off = fill
        fill += n
        (shard, id, n, bin, off)
      }
    }

  private def run(rows: Seq[(Int, Long, Int)], budget: Int)
  : Seq[(Int, Long, Int, Long, Long)] = {
    import spark.implicits._
    val df = rows.toDF("shard", "doc_id", "n_tok").repartition(7)
    PackOps.packGreedy(df, budget).as[(Int, Long, Int, Long, Long)]
      .collect().toSeq
  }

  test("matches the sequential definition on random sizes across shards") {
    val rnd = new scala.util.Random(11)
    val rows = (0L until 400L).map(i =>
      ((i % 5).toInt, i, 1 + rnd.nextInt(90)))
    val got = run(rows, budget = 128).sortBy(r => (r._1, r._2))
    val want = reference(rows, budget = 128).sortBy(r => (r._1, r._2))
    assert(got == want)
  }

  test("bins never overflow except a lone oversize doc at offset 0") {
    val rnd = new scala.util.Random(5)
    // include docs bigger than the budget
    val rows = (0L until 300L).map(i =>
      ((i % 3).toInt, i, 1 + rnd.nextInt(200)))
    val budget = 100
    val got = run(rows, budget)
    val byBin = got.groupBy(r => (r._1, r._4))
    byBin.foreach { case ((shard, bin), docs) =>
      val tot = docs.map(_._3.toLong).sum
      if (tot > budget)
        assert(docs.size == 1 && docs.head._5 == 0L,
          s"overfull bin ($shard,$bin) with ${docs.size} docs")
    }
    // offsets tile each bin contiguously in doc_id order
    byBin.foreach { case (_, docs) =>
      val sorted = docs.sortBy(_._2)
      var expect = 0L
      sorted.foreach { d => assert(d._5 == expect); expect += d._3 }
    }
  }

  test("bin ids are dense per shard starting at 0") {
    val rows = (0L until 120L).map(i => ((i % 4).toInt, i, 40))
    val got = run(rows, budget = 128) // 3 docs of 40 per bin
    got.groupBy(_._1).foreach { case (_, docs) =>
      val bins = docs.map(_._4).distinct.sorted
      assert(bins == (0L until bins.size))
      assert(docs.groupBy(_._4).values.forall(_.size == 3))
    }
  }

  test("empty input packs to an empty result") {
    assert(run(Nil, 64).isEmpty)
  }
}
