package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BpeOpsSpec extends SparkSpec {
  import spark.implicits._

  test("train reproduces the hand-computed merge sequence (Sennrich worked example shape)") {
    // word histogram via docs: 'aaab' x3, 'aab' x2, 'ab' x1
    val docs = Seq(
      1L -> "aaab aaab aab",
      2L -> "aaab aab ab"
    ).toDF("doc_id", "text")
    val m = BpeOps.train(docs, numMerges = 3)
    // step 1 char pairs: (a,a) = 2*3 + 1*2 = 8; (a,b) = 3+2+1 = 6 -> (a,a)
    assert(m(0) == BpeOps.Merge(1, "a", "a", "aa", 8L), m(0))
    // step 2 on [aa,a,b]x3 [aa,b]x2 [a,b]x1:
    //   (aa,a)=3, (a,b)=3+1=4, (aa,b)=2 -> (a,b)
    assert(m(1) == BpeOps.Merge(2, "a", "b", "ab", 4L), m(1))
    // step 3 on [aa,ab]x3 [aa,b]x2 [ab]x1: (aa,ab)=3, (aa,b)=2 -> (aa,ab)
    assert(m(2) == BpeOps.Merge(3, "aa", "ab", "aaab", 3L), m(2))
  }

  test("ties break by (cnt desc, l, r) — deterministic across partitionings") {
    // 'xy' and 'yz' both appear twice: (x,y)=2 ties (y,z)=2 -> (x,y) wins
    val docs = Seq(1L -> "xy xy yz yz").toDF("doc_id", "text")
    val m = BpeOps.train(docs, numMerges = 1)
    assert(m.head == BpeOps.Merge(1, "x", "y", "xy", 2L), m.head)
    val m13 = BpeOps.train(docs.repartition(13), numMerges = 1)
    assert(m13 == m, "training must be partitioning-invariant")
  }

  test("merge application is a left-to-right pass: aaaa -> [aa][aa], not [aa][a][a]") {
    val docs = Seq(1L -> "aaaa aaaa aaaa").toDF("doc_id", "text")
    val m = BpeOps.train(docs, numMerges = 2)
    assert(m(0) == BpeOps.Merge(1, "a", "a", "aa", 9L), m(0))
    // after pass 1 every 'aaaa' is [aa, aa]: the only pair is (aa, aa)
    assert(m(1) == BpeOps.Merge(2, "aa", "aa", "aaaa", 3L), m(1))
  }

  test("word gate: only lowercase alnum words train; early stop when no pairs remain") {
    val docs = Seq(1L -> "Zed! a9 a9 ?? x").toDF("doc_id", "text")
    // eligible: 'a9' x2 ('zed!'/'??' fail the gate post-lower; 'x' has no pair)
    val m = BpeOps.train(docs, numMerges = 10)
    assert(m == Seq(BpeOps.Merge(1, "a", "9", "a9", 2L)), m)
  }

  test("trainDf column contract matches the oracle (step,l,r,merged,cnt)") {
    val docs = Seq(1L -> "ab ab").toDF("doc_id", "text")
    val df = BpeOps.trainDf(docs, numMerges = 1)
    assert(df.columns.toSeq == Seq("step", "l", "r", "merged", "cnt"))
    assert(df.as[(Int, String, String, String, Long)].collect()
      .toSeq == Seq((1, "a", "b", "ab", 2L)))
  }

  test("encodePiecesCol rebuilds encode's exact rollup (p80's binding)") {
    val docs = Seq(
      0L -> "low lower lowest newer new|er low",
      1L -> "| || |||",   // every token strips to empty -> no row either way
      2L -> "ab ab abc naïve café").toDF("doc_id", "text")
    val merges = BpeOps.train(docs, numMerges = 6)
    assert(merges.nonEmpty)
    def key(r: org.apache.spark.sql.Row) =
      r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))
    val viaCol = docs
      .select(col("doc_id"), BpeOps.encodePiecesCol(col("text"), merges).as("enc"))
      .select(col("doc_id"), size(col("enc")).cast("long").as("n_tok"),
        aggregate(col("enc"), lit(0L), (a, ps) => a + size(ps)).as("n_pieces"),
        md5(array_join(transform(col("enc"),
          ps => concat(lit("|"), array_join(ps, "||"), lit("|"))), " ")).as("fp"))
      .filter(col("n_tok") > 0)
      .collect().map(key).toMap
    val batch = BpeOps.encode(docs, merges)
      .select(col("doc_id"), col("n_tok"), col("n_pieces"), col("fp"))
      .collect().map(key).toMap
    assert(viaCol == batch)
    assert(!viaCol.contains(1L)) // the stripped-empty doc is absent in both
  }
}
