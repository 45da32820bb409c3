package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SketchOpsSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(n: Int) = (0 until n).map(i => s"value-$i-${i * 7}")

  test("hll estimate tracks true cardinality within sketch error (m=64 ~ 13% stderr)") {
    for (n <- Seq(300, 3000, 30000)) {
      val est = SketchOps.hllSummary(corpus(n).toDF("v"), col("v"))
        .select("est_distinct").as[Double].collect()(0)
      assert(math.abs(est - n) / n < 0.35, s"n=$n est=$est")
    }
  }

  test("registers and estimate are partition-invariant (merge = elementwise max)") {
    val df = corpus(5000).toDF("v")
    val a = SketchOps.hllSummary(df.repartition(1), col("v")).collect()(0)
    val b = SketchOps.hllSummary(df.repartition(17), col("v")).collect()(0)
    assert(a == b)
  }

  test("duplicates and NULLs do not move the estimate (COUNT DISTINCT semantics)") {
    val base = corpus(2000)
    val once = SketchOps.hllSummary(base.toDF("v"), col("v")).collect()(0)
    val dupes = SketchOps.hllSummary(
      (base ++ base ++ base).map(Option(_)).:+(None: Option[String]).toDF("v"),
      col("v")).collect()(0)
    assert(once == dupes)
  }

  test("hll_distinct aggregate matches the dataflow face bit for bit") {
    val df = corpus(4000).toDF("v")
    df.createOrReplaceTempView("hll_t")
    val viaAgg = spark.sql("SELECT hll_distinct(v) AS e FROM hll_t")
      .as[Double].collect()(0)
    val viaFlow = SketchOps.hllSummary(df, col("v"))
      .select("est_distinct").as[Double].collect()(0)
    assert(viaAgg == viaFlow)
    // and the aggregate itself is arrival-order / partitioning invariant
    df.repartition(23).createOrReplaceTempView("hll_t2")
    val viaAgg2 = spark.sql("SELECT hll_distinct(v) AS e FROM hll_t2")
      .as[Double].collect()(0)
    assert(viaAgg2 == viaAgg)
  }

  test("linear-counting regime: small cardinalities estimate tightly") {
    // raw HLL is biased low at n << m; the zeros-based correction is
    // near-exact there (every distinct value usually owns a register)
    for (n <- Seq(5, 20, 60)) {
      val est = SketchOps.hllSummary(corpus(n).toDF("v"), col("v"))
        .select("est_distinct").as[Double].collect()(0)
      assert(math.abs(est - n) / n < 0.25, s"n=$n est=$est")
    }
  }

  test("empty and all-NULL inputs estimate zero") {
    val empty = SketchOps.hllSummary(Seq.empty[String].toDF("v"), col("v"))
      .collect()(0)
    assert(empty.getAs[Double]("est_distinct") == 0.0)
    assert(empty.getAs[Long]("zeros") == SketchOps.HllM.toLong)
    val nulls = SketchOps.hllSummary(
      Seq[Option[String]](None, None).toDF("v"), col("v")).collect()(0)
    assert(nulls.getAs[Double]("est_distinct") == 0.0)
  }

  test("hll_distinct works per-group and rejects wrong arity with a clear message") {
    Seq(("a", "x1"), ("a", "x2"), ("b", "x1"), ("b", "x1"))
      .toDF("g", "v").createOrReplaceTempView("hll_g")
    val rows = spark.sql(
      "SELECT g, hll_distinct(v) AS e FROM hll_g GROUP BY g ORDER BY g")
      .as[(String, Double)].collect().toSeq
    // tiny groups sit in the linear-counting regime: near-exact
    assert(rows.map(_._1) == Seq("a", "b"))
    assert(math.abs(rows(0)._2 - 2.0) < 0.1, rows.toString)
    assert(math.abs(rows(1)._2 - 1.0) < 0.1, rows.toString)
    val e = intercept[Exception](
      spark.sql("SELECT hll_distinct(v, 2) FROM hll_g").collect())
    assert(e.getMessage.contains("expected 1 argument"), e.getMessage)
    // non-string input: analysis-time type error, not a runtime surprise
    val e2 = intercept[Exception](
      spark.sql("SELECT hll_distinct(42) FROM hll_g").collect())
    assert(e2.getMessage.toLowerCase.contains("string"), e2.getMessage)
  }
}
