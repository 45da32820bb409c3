package graft

import org.apache.spark.sql.functions._

/** q22's sequenceCount leans on a regex-semantics claim: the LAZY
  * pattern `v.*?c.*?p` counted by `regexp_count` yields exactly the
  * ClickHouse sequenceCount semantics — non-overlapping chains matched
  * greedily by earliest completion, scanning left to right. This spec
  * checks that claim against a direct fold implementation of the chain
  * scan over randomized event strings (the DuckDB side of the same
  * pattern is held to it by the oracle gate). */
class SequenceMatchSpec extends SparkSpec {
  import spark.implicits._

  /** CH-style chain scan: earliest-completion non-overlapping count. */
  private def chainCount(s: String, steps: Seq[Char]): Int = {
    var stage = 0
    var n = 0
    s.foreach { ch =>
      if (ch == steps(stage)) {
        stage += 1
        if (stage == steps.length) { n += 1; stage = 0 }
      }
    }
    n
  }

  test("lazy regexp_count equals the earliest-completion chain scan") {
    val rnd = new scala.util.Random(23)
    val alphabet = "vcpse".toCharArray
    val cases = (0 until 300).map { i =>
      (i, (0 until rnd.nextInt(40)).map(_ => alphabet(rnd.nextInt(5))).mkString)
    } :+ ((300, "vcpvcp")) :+ ((301, "vvccpp")) :+ ((302, "vcvcpp")) :+
      ((303, "")) :+ ((304, "pcv"))
    val df = cases.toDF("id", "seq")
      .withColumn("n_re", regexp_count(col("seq"), lit("v.*?c.*?p")))
    val got = df.select("id", "seq", "n_re").collect()
    got.foreach { r =>
      val expected = chainCount(r.getString(1), Seq('v', 'c', 'p'))
      assert(r.getInt(2) == expected,
        s"seq='${r.getString(1)}': regex ${r.getInt(2)} vs chain $expected")
    }
  }

  test("greedy rlike matches iff at least one chain completes") {
    val df = Seq("vcp", "vxcxp", "pcv", "vpc", "", "ssscccppp", "svscspsp")
      .toDF("seq")
      .withColumn("m", col("seq").rlike("v.*c.*p"))
      .withColumn("n", regexp_count(col("seq"), lit("v.*?c.*?p")))
    df.collect().foreach { r =>
      assert(r.getBoolean(1) == (r.getInt(2) > 0), r.toString)
    }
  }
}
