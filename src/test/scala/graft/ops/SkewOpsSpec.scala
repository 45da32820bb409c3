package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SkewOpsSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin returns exactly the plain-join rows on skewed data") {
    // 90% of left rows share one hot key
    val left = (0 until 2000).map(i =>
      (if (i % 10 == 0) s"k${i % 7}" else "hot", i)).toDF("k", "lv")
    val right = Seq(("hot", 100), ("k0", 200), ("k3", 300), ("nomatch", 400))
      .toDF("k", "rv")
    val plain = left.join(right, Seq("k")).select("k", "lv", "rv")
      .as[(String, Int, Int)].collect().sorted.toSeq
    val salted = SkewOps.saltedJoin(left, right, "k", salt = 8)
      .select("k", "lv", "rv").as[(String, Int, Int)].collect().sorted.toSeq
    assert(salted == plain)
    assert(plain.count(_._1 == "hot") == 1800)
  }

  test("salting spreads IDENTICAL hot rows across sub-keys") {
    // duplicate rows are the common skew shape: a content hash would
    // send them all to one salt
    val left = (0 until 1000).map(_ => ("hot", 1)).toDF("k", "lv")
    val salts = left.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(8L)))
      .select("__salt").distinct().count()
    assert(salts == 8, s"identical hot rows must spread over all salts, got $salts")
    // and the join result is still exactly the plain join
    val right = Seq(("hot", 9)).toDF("k", "rv")
    assert(SkewOps.saltedJoin(left, right, "k", 8).count() == 1000)
  }
}
