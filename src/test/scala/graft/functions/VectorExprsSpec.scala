package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import graft.functions.VectorExprs.dotf

class VectorExprsSpec extends SparkSpec {
  import spark.implicits._

  test("dotf matches interpreted zip_with/aggregate on random float vectors") {
    val rnd = new scala.util.Random(11)
    val df = (0 until 50).map(i =>
      (i, Array.fill(64)(rnd.nextFloat() * 2 - 1), Array.fill(64)(rnd.nextFloat() * 2 - 1)))
      .toDF("id", "a", "b")
    val r = df.select(
      dotf($"a", $"b").as("fast"),
      aggregate(zip_with($"a", $"b", (p, q) => p.cast("double") * q.cast("double")),
        lit(0.0), (acc, v) => acc + v).as("slow"))
      .as[(Double, Double)].collect()
    // identical element order => bit-identical doubles, not just close
    r.foreach { case (fast, slow) => assert(fast == slow) }
  }

  test("dotf handles double arrays, empty arrays, and length mismatch") {
    val r = Seq((Array(1.0, 2.0, 3.0), Array(4.0, 5.0)))
      .toDF("a", "b")
      .select(dotf($"a", $"b"), dotf($"a", array().cast("array<double>")))
      .as[(Double, Double)].collect().head
    assert(r._1 == 1.0 * 4.0 + 2.0 * 5.0) // min-length semantics
    assert(r._2 == 0.0)
  }

  test("dotf is null-safe and registered for SQL") {
    val r = Seq((Some(Array(1.0f)), Option.empty[Array[Float]]))
      .toDF("a", "b").select(dotf($"a", $"b")).collect().head
    assert(r.isNullAt(0))
    val sql = spark.sql("SELECT dotf(array(1.0D, 2.0D), array(3.0D, 0.5D)) v")
      .as[Double].collect().head
    assert(sql == 4.0)
  }

  test("null ELEMENTS read as zero in dotf/dotl/quant8 (not columnar garbage)") {
    // a null slot must contribute 0, in BOTH eval and codegen paths —
    // unguarded typed getters on ColumnarArray return stale buffer bytes
    val r = spark.sql(
      """SELECT dotf(array(1.0D, CAST(NULL AS DOUBLE), 3.0D),
        |            array(10.0D, 20.0D, 30.0D)) AS f,
        |       dotl(array(2L, CAST(NULL AS BIGINT)), array(5L, 7L)) AS l,
        |       quant8(array(CAST(NULL AS DOUBLE), 127.0D)) AS q""".stripMargin)
      .collect()(0)
    assert(r.getDouble(0) == 1.0 * 10.0 + 3.0 * 30.0)
    assert(r.getLong(1) == 10L)
    assert(r.getSeq[Long](2) == Seq(0L, 127L))
    // and through a PARQUET round-trip (the vectorized columnar reader
    // is where null slots actually carry garbage)
    val dir = java.nio.file.Files.createTempDirectory("nullvec").toString
    Seq((Array[java.lang.Double](1.0, null, 3.0),
         Array[java.lang.Double](10.0, 20.0, 30.0)))
      .toDF("a", "b").write.mode("overwrite").parquet(dir)
    val p = spark.read.parquet(dir)
      .selectExpr("dotf(a, b) AS f").as[Double].collect()(0)
    assert(p == 1.0 * 10.0 + 3.0 * 30.0)
  }

  test("wrong-arity calls to any registered function fail with the name, not IndexOutOfBounds") {
    val e = intercept[Exception](spark.sql("SELECT quantile(0.5)").collect())
    assert(e.getMessage.contains("quantile"), e.getMessage)
    assert(e.getMessage.contains("arguments"), e.getMessage)
    val e2 = intercept[Exception](spark.sql("SELECT dotf(array(1.0D))").collect())
    assert(e2.getMessage.contains("dotf"), e2.getMessage)
  }

  test("dotf stays inside whole-stage codegen (no interpreted fallback)") {
    // repartition defeats ConvertToLocalRelation so a real projection runs;
    // execute first — AQE only materializes the final plan afterwards
    val df = Seq((Array(1.0f, 2.0f), Array(3.0f, 4.0f))).toDF("a", "b")
      .repartition(1)
      .select(dotf($"a", $"b").as("d"))
    assert(df.collect().head.getDouble(0) == 11.0)
    // the `*(n)` prefix marks WholeStageCodegen stages; a codegen failure
    // in DotProduct.doGenCode would drop the star (interpreted fallback)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [dotf("), plan)
  }

  test("letter_counts matches the 26x regexp_replace spelling on messy strings") {
    val rnd = new scala.util.Random(23)
    // letters, uppercase (must NOT count), digits, punctuation, multi-byte
    // UTF-8 (é/λ/中 — their encodings contain no bytes < 0x80, so the byte
    // scan must ignore them), and the empty string
    val alphabet = "abcxyzABCXYZ0189 .,;éλ中\n\t"
    val strs = "" +: (1 to 60).map(_ =>
      (0 until rnd.nextInt(120)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    val slow = array(TextOps26.map(l =>
      (length($"t") - length(regexp_replace($"t", l, ""))).cast("long")): _*)
    val r = strs.toDF("t")
      .select(VectorExprs.letterCounts($"t").as("fast"), slow.as("slow"))
      .as[(Seq[Long], Seq[Long])].collect()
    r.foreach { case (fast, slow) => assert(fast == slow) }
  }

  test("letter_counts is null-safe, registered for SQL, and codegen'd") {
    val nulls = Seq(Option.empty[String]).toDF("t")
      .select(VectorExprs.letterCounts($"t")).collect().head
    assert(nulls.isNullAt(0))
    val sql = spark.sql("SELECT letter_counts('abba z') v")
      .as[Seq[Long]].collect().head
    assert(sql(0) == 2 && sql(1) == 2 && sql(25) == 1 && sql.sum == 5)
    val df = Seq("hello").toDF("t").repartition(1)
      .select(VectorExprs.letterCounts($"t").as("v"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [letter_counts("), plan)
  }

  private val TextOps26: Seq[String] = ('a' to 'z').map(_.toString)
}
