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

  test("salting spreads the hot key across sub-keys") {
    val left = (0 until 1000).map(i => ("hot", i)).toDF("k", "lv")
    val salts = left.withColumn("__salt",
      pmod(xxhash64(left.columns.map(col): _*), lit(8L)))
      .select("__salt").distinct().count()
    assert(salts > 4, s"hot key must spread over many salts, got $salts")
  }
}
