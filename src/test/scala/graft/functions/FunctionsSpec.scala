package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Row

/** FIXTURES.md F7: ClickHouse alias semantics (reference aliases.sql). */
class FunctionsSpec extends SparkSpec {

  private def one(sql: String): Any =
    spark.sql(s"SELECT $sql AS v").collect().head.get(0)

  test("toString casts to string") {
    assert(one("toString(42)") == "42")
    assert(one("toString(4.5)") == "4.5")
  }

  test("toInt64 / toInt8 are 64-bit (DuckDB INT8 = BIGINT, per reference)") {
    assert(one("toInt64('123')") == 123L)
    assert(one("toInt8('123')") == 123L)
    assert(one("toInt32('123')") == 123)
    assert(one("toInt16('123')") == 123.toShort)
  }

  test("OrNull variants try-cast") {
    assert(one("toInt64OrNull('abc')") == null)
    assert(one("toInt64OrNull('7')") == 7L)
    assert(one("toFloatOrNull('abc')") == null)
    // regex-guard parity: every string bare try_cast parses must survive
    // the guard (Java parseDouble suffix/hex/inf forms, bool-as-number)
    assert(one("toFloatOrNull('1.5d')") == 1.5)
    assert(one("toFloatOrNull('  42 ')") == 42.0)
    assert(one("toFloatOrNull('Infinity')") == Double.PositiveInfinity)
    assert(one("toInt64OrNull(true)") == 1L)
    assert(one("toFloatOrZero('oops')") == 0.0)
  }

  test("OrNull on non-string inputs matches bare try_cast (no regex detour)") {
    // the regex guard exists for non-numeric STRINGS only: a timestamp
    // rendered to string fails the regex, so the old string-detour made
    // toInt64OrNull(ts) all-NULL where try_cast yields epoch seconds
    assert(one("toInt64OrNull(timestamp'1970-01-01 00:00:10Z')") == 10L)
    assert(one("toInt64OrZero(timestamp'1970-01-01 00:00:10Z')") == 10L)
    assert(one("toInt32OrNull(9.7)") == 9)
  }

  test("OrZero variants default to 0") {
    assert(one("toInt64OrZero('abc')") == 0L)
    assert(one("toInt64OrZero('7')") == 7L)
    assert(one("toFloatOrZero('x')") == 0.0)
  }

  test("reference uint naming quirk: toUInt8rZero / rNull") {
    assert(one("toUInt8rZero('abc')") == 0.toShort)
    assert(one("toUInt64rNull('18446744073709551615')") == null ||
      one("toUInt64rNull('12')").toString == "12")
  }

  test("intDiv is plain division (reference deviation from ClickHouse)") {
    assert(one("intDiv(7, 2)") == 3.5)
  }

  test("match is LIKE (reference deviation from ClickHouse re2)") {
    assert(one("match('abcd', 'ab%')") == true)
    assert(one("match('abcd', 'x%')") == false)
  }

  test("epoch_ns returns int64 nanoseconds") {
    assert(one("epoch_ns(TIMESTAMP '1970-01-01 00:00:01')") == 1000000000L)
    assert(one("epoch_ns(TIMESTAMP '2024-01-15 00:00:00')") == 1705276800000000000L)
  }

  test("ngrams is SQL-callable") {
    assert(one("ngrams(array('a','b','c'), 2)") ==
      scala.collection.mutable.ArraySeq("a b", "b c"))
  }

  test("WinnowMins is byte-identical to the composed HOF spelling (r14)") {
    import org.apache.spark.sql.functions._
    // 300 random arrays across the edge lengths (0, < w, = w, >> w)
    // with a small value domain so duplicate minima exercise the
    // distinct/first-occurrence path
    val rnd = new scala.util.Random(42)
    val w = 4
    val arrays: Seq[Seq[Long]] = (0 until 300).map { i =>
      val len = i % 30
      Seq.fill(len)(rnd.nextInt(12).toLong)
    }
    import spark.implicits._
    val df = arrays.map(a => Tuple1(a)).toDF("h")
    val both = df.select(
      graft.functions.TextExprs.winnowMins(col("h"), w).as("kernel"),
      when(size(col("h")) >= 1,
        array_distinct(transform(
          sequence(lit(1), greatest(size(col("h")) - lit(w - 1), lit(1))),
          i => array_min(slice(col("h"), i, lit(w))))))
        .otherwise(array().cast("array<bigint>")).as("composed"))
      .collect()
    both.zipWithIndex.foreach { case (r, i) =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1),
        s"row $i: kernel=${r.getSeq[Long](0)} composed=${r.getSeq[Long](1)}")
    }
  }

  test("dotl is SQL-callable and exact on bigint arrays") {
    assert(one("dotl(array(1L, -2L, 3L), array(4L, 5L, -6L))") == -24L)
  }

  test("quant8 is SQL-callable") {
    assert(one("quant8(array(1.0F, -0.5F, 0.0F, 0.25F))") ==
      scala.collection.mutable.ArraySeq(127L, -63L, 0L, 32L))
  }

  test("top_k is exact when distinct cardinality fits the summary") {
    import spark.implicits._
    // 10 distinct values, value i appearing i+1 times, spread over tasks
    val rows = for (i <- 0 until 10; _ <- 0 to i) yield s"v$i"
    scala.util.Random.shuffle(rows).toDF("s").repartition(7)
      .createOrReplaceTempView("topk_exact")
    val got = spark.sql("SELECT top_k(3, s) FROM topk_exact")
      .as[Seq[(String, Long)]].head()
    assert(got == Seq(("v9", 10L), ("v8", 9L), ("v7", 8L)), got)
  }

  test("-If combinators gate rows like their base aggregates") {
    import spark.implicits._
    Seq((1, 10.0), (2, 20.0), (3, 30.0), (4, 40.0)).toDF("id", "v")
      .createOrReplaceTempView("agg_if")
    val r = spark.sql(
      """SELECT countIf(v > 15), sumIf(v, id % 2 = 0), avgIf(v, id > 1),
        |  minIf(v, v > 10.0), maxIf(v, id < 4) FROM agg_if""".stripMargin)
      .collect().head
    assert(r.getLong(0) == 3L)
    assert(r.getDouble(1) == 60.0)
    assert(r.getDouble(2) == 30.0)
    assert(r.getDouble(3) == 20.0)
    assert(r.getDouble(4) == 30.0)
  }

  test("-If combinators over zero matching rows yield null (not 0/NaN)") {
    import spark.implicits._
    Seq((1, 10.0)).toDF("id", "v").createOrReplaceTempView("agg_if0")
    val r = spark.sql(
      "SELECT countIf(v > 99), sumIf(v, id > 99), avgIf(v, id > 99) FROM agg_if0")
      .collect().head
    assert(r.getLong(0) == 0L)
    assert(r.isNullAt(1) && r.isNullAt(2))
  }

  test("argMax / argMin return the value at the extremal key") {
    import spark.implicits._
    Seq((1L, 5.0), (9L, 7.5), (4L, 2.5)).toDF("id", "v")
      .createOrReplaceTempView("agg_arg")
    val r = spark.sql("SELECT argMax(v, id), argMin(v, id) FROM agg_arg")
      .collect().head
    assert(r.getDouble(0) == 7.5) // value at id=9
    assert(r.getDouble(1) == 5.0) // value at id=1
  }

  test("uniqExact is exact; uniq (HLL++) lands within its 5% rsd") {
    import spark.implicits._
    val n = 3000
    (0 until n).map(i => i % 750).toDF("k").repartition(9)
      .createOrReplaceTempView("agg_uniq")
    val r = spark.sql("SELECT uniqExact(k), uniq(k) FROM agg_uniq").collect().head
    assert(r.getLong(0) == 750L)
    assert(math.abs(r.getLong(1) - 750L) <= 75L, s"uniq=${r.getLong(1)}")
  }

  test("quantile family: exact matches percentile_cont, sketch lands close") {
    import spark.implicits._
    // 1..1000 shuffled across partitions: quantiles known in closed form
    (1 to 1000).map(i => (i * 389) % 1000 + 1).toDF("v").repartition(7)
      .createOrReplaceTempView("agg_q")
    val r = spark.sql(
      """SELECT quantileExact(0.25d, v), quantileExact(0.5d, v),
        |       quantile(0.5d, v),
        |       quantileExact(0.5d, v) - percentile(v, 0.5d)
        |FROM agg_q""".stripMargin).collect().head
    assert(r.getDouble(0) == 250.75) // percentile_cont interpolation
    assert(r.getDouble(1) == 500.5)
    // the sketch is deterministic GK with default accuracy: ±1 rank here
    assert(math.abs(r.getInt(2) - 500) <= 1, s"quantile=${r.getInt(2)}")
    assert(r.getDouble(3) == 0.0) // quantileExact IS Spark's percentile
  }

  test("histogram(bins, x) returns adaptive centroids covering the range") {
    import spark.implicits._
    (1 to 1000).map(_.toDouble).toDF("v").repartition(5)
      .createOrReplaceTempView("agg_h")
    val bins = spark.sql("SELECT histogram(10, v) FROM agg_h")
      .collect().head.getSeq[org.apache.spark.sql.Row](0)
    assert(bins.size == 10)
    val total = bins.map(_.getDouble(1)).sum
    assert(total == 1000.0, s"bin weights must sum to row count, got $total")
    val xs = bins.map(_.getDouble(0))
    assert(xs == xs.sorted && xs.head >= 1.0 && xs.last <= 1000.0)
  }

  test("top_k keeps true heavy hitters when cardinality exceeds capacity") {
    import spark.implicits._
    // capacity = 8k = 16; 400 distinct light values + 2 dominant ones
    val rnd = new scala.util.Random(3)
    val rows = Seq.fill(500)("dominant") ++ Seq.fill(300)("second") ++
      Seq.fill(2000)(s"light${rnd.nextInt(400)}")
    scala.util.Random.shuffle(rows).toDF("s").repartition(11)
      .createOrReplaceTempView("topk_heavy")
    val got = spark.sql("SELECT top_k(2, s) FROM topk_heavy")
      .as[Seq[(String, Long)]].head()
    val n = rows.size
    assert(got.map(_._1) == Seq("dominant", "second"), got)
    // space-saving overestimates by at most N/C
    assert(got(0)._2 >= 500 && got(0)._2 <= 500 + n / 16, got)
    assert(got(1)._2 >= 300 && got(1)._2 <= 300 + n / 16, got)
  }

  test("pipeline text ops are callable from plain SQL") {
    val r = spark.sql(
      """SELECT redact_pii('mail a@b.co or call 555-123-4567') AS red,
        |  token_count('a b  c') AS tc,
        |  lang_id('the and of to in is was for that it') AS lang,
        |  quality_score('the and of to in is was for that it') AS q,
        |  set_fingerprint('b a a b') AS sfp,
        |  rolling_fingerprint('x') AS rfp""".stripMargin).head()
    assert(r.getAs[String]("red") == "mail <EMAIL> or call <PHONE>")
    assert(r.getAs[Int]("tc") == 3)
    assert(r.getAs[String]("lang") == "en")
    val q = r.getAs[Double]("q")
    assert(q > 0.0 && q <= 1.0, q)
    // md5("a b") — the sorted distinct token set
    assert(r.getAs[String]("sfp") ==
      java.security.MessageDigest.getInstance("MD5")
        .digest("a b".getBytes("UTF-8")).map("%02x".format(_)).mkString)
    assert(r.getAs[String]("rfp") == "x") // single token: the seed itself
  }

  // ---- r12 DuckDB-compat tier (VERDICT r10 #5), semantics pinned
  //      against DuckDB itself ----

  test("arg_min/arg_max return the value at the extremal key (DuckDB order)") {
    import spark.implicits._
    Seq(("x", 1), ("y", 3), ("z", 2)).toDF("a", "b").createOrReplaceTempView("amx")
    val r = spark.sql(
      "SELECT arg_min(a, b) AS lo, arg_max(a, b) AS hi FROM amx").collect().head
    assert(r.getString(0) == "x" && r.getString(1) == "y")
  }

  test("string_agg/group_concat: DuckDB's default ',' separator and custom sep") {
    import spark.implicits._
    Seq("a", "b", "c").toDF("s").createOrReplaceTempView("sagg")
    def one(sql: String): String =
      spark.sql(s"SELECT $sql AS v FROM sagg").collect().head.getString(0)
    // single partition here, so arrival order is the input order
    assert(one("string_agg(s)").split(",").sorted.toSeq == Seq("a", "b", "c"))
    assert(one("string_agg(s, '|')").split("\\|").sorted.toSeq == Seq("a", "b", "c"))
    assert(one("group_concat(s)").split(",").sorted.toSeq == Seq("a", "b", "c"))
  }

  test("list_sort is ASC NULLS LAST; list_reverse_sort DESC NULLS LAST (DuckDB)") {
    def arr(sql: String): Seq[Any] =
      spark.sql(s"SELECT $sql AS v").collect().head.getSeq[Any](0)
    // probed against DuckDB: list_sort([3,null,1]) = [1,3,NULL],
    // list_reverse_sort([3,null,1]) = [3,1,NULL]
    assert(arr("list_sort(array(3, null, 1))") == Seq(1, 3, null))
    assert(arr("list_reverse_sort(array(3, null, 1))") == Seq(3, 1, null))
    // the optional DuckDB order/null-order arguments select the combo
    assert(arr("list_sort(array(3, null, 1), 'DESC')") == Seq(3, 1, null))
    assert(arr("list_sort(array(3, null, 1), 'ASC', 'NULLS FIRST')") ==
      Seq(null, 1, 3))
    assert(arr("list_sort(array(3, null, 1), 'DESC', 'NULLS FIRST')") ==
      Seq(null, 3, 1))
    assert(arr("list_reverse_sort(array(3, null, 1), 'NULLS FIRST')") ==
      Seq(null, 3, 1))
    val e = intercept[Exception](
      spark.sql("SELECT list_sort(array(1), 'SIDEWAYS')").collect())
    assert(e.getMessage.contains("ASC or DESC"))
  }

  test("generate_series scalar form is the inclusive list (DuckDB)") {
    def arr(sql: String): Seq[Any] =
      spark.sql(s"SELECT $sql AS v").collect().head.getSeq[Any](0)
    assert(arr("generate_series(1, 5)") == (1 to 5))
    assert(arr("generate_series(1, 10, 3)") == Seq(1, 4, 7, 10))
    assert(arr("generate_series(5, 1, -2)") == Seq(5, 3, 1))
  }

  test("unnest in SELECT position explodes one row per element") {
    val r = spark.sql("SELECT unnest(array(1, 2, 3)) AS u")
    assert(r.collect().map(_.getInt(0)).toSeq == Seq(1, 2, 3))
  }
}
