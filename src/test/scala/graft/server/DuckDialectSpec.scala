package graft.server

import graft.SparkSpec

/** `expr::TYPE` postfix-cast rewrite + DuckDB-compat function names
  * (VERDICT r7 #2): the reference promises DuckDB SQL on /query
  * (reference README.md:115-133), and its canonical example uses the
  * postfix cast Spark's parser rejects. */
class DuckDialectSpec extends SparkSpec {

  private def rw(s: String) = DuckDialect.rewrite(s)

  test("literal / identifier / dotted-chain primaries") {
    assert(rw("SELECT '2025-04-24'::TIMESTAMP") ==
      "SELECT CAST('2025-04-24' AS TIMESTAMP)")
    assert(rw("SELECT x::INT FROM t") == "SELECT CAST(x AS INT) FROM t")
    assert(rw("SELECT a.b::BIGINT") == "SELECT CAST(a.b AS BIGINT)")
    assert(rw("""SELECT "weird col"::INT""") ==
      """SELECT CAST("weird col" AS INT)""")
    assert(rw("SELECT t.\"c\"::INT") == "SELECT CAST(t.\"c\" AS INT)")
  }

  test("parenthesized / function-call / number primaries; spaced ::") {
    assert(rw("SELECT (x + 1)::VARCHAR") == "SELECT CAST((x + 1) AS STRING)")
    assert(rw("SELECT f(x, y)::HUGEINT") ==
      "SELECT CAST(f(x, y) AS DECIMAL(38,0))")
    assert(rw("SELECT 1.5::DOUBLE") == "SELECT CAST(1.5 AS DOUBLE)")
    assert(rw("SELECT x :: INT") == "SELECT CAST(x AS INT)")
    assert(rw("SELECT arr[1]::INT") == "SELECT CAST(arr[1] AS INT)")
  }

  test("chained casts resolve inner-out") {
    assert(rw("SELECT x::INT::VARCHAR") ==
      "SELECT CAST(CAST(x AS INT) AS STRING)")
  }

  test("strings, comments, and unrecognized shapes are untouched") {
    assert(rw("SELECT 'a::b' AS s") == "SELECT 'a::b' AS s")
    assert(rw("SELECT 'it''s::ok'") == "SELECT 'it''s::ok'")
    val c = "SELECT x -- cast me not: y::INT\nFROM t"
    assert(rw(c) == c)
    val bc = "SELECT /* y::INT */ x FROM t"
    assert(rw(bc) == bc)
    // array-suffix type: Spark spells array casts differently; pass through
    assert(rw("SELECT x::INT[]") == "SELECT x::INT[]")
  }

  test("DuckDB-only type names map to Spark equivalents") {
    assert(rw("SELECT x::VARCHAR(20)") == "SELECT CAST(x AS STRING)")
    assert(rw("SELECT x::TEXT") == "SELECT CAST(x AS STRING)")
    assert(rw("SELECT x::BLOB") == "SELECT CAST(x AS BINARY)")
    assert(rw("SELECT x::UBIGINT") == "SELECT CAST(x AS DECIMAL(20,0))")
    assert(rw("SELECT x::DECIMAL(10,2)") == "SELECT CAST(x AS DECIMAL(10,2))")
    assert(rw("SELECT x::REAL") == "SELECT CAST(x AS FLOAT)")
  }

  test("read_parquet/read_json table functions map to Spark direct-path reads") {
    assert(rw("SELECT * FROM read_parquet('/data/t.parquet')") ==
      "SELECT * FROM parquet.`/data/t.parquet`")
    assert(rw("SELECT * FROM read_parquet(['/a.parquet', '/b.parquet'])") ==
      "SELECT * FROM parquet.`{/a.parquet,/b.parquet}`")
    assert(rw("SELECT * FROM read_parquet(ARRAY['/a.parquet', '/b.parquet'])") ==
      "SELECT * FROM parquet.`{/a.parquet,/b.parquet}`")
    assert(rw("SELECT * FROM read_json_auto('/d.json')") ==
      "SELECT * FROM json.`/d.json`")
    // option arguments: rewriting while dropping them would change
    // semantics — leave for the parser to reject loudly
    val opt = "SELECT * FROM read_parquet('/a.parquet', union_by_name=true)"
    assert(rw(opt) == opt)
    // inside a string: untouched
    assert(rw("SELECT 'read_parquet(''x'')'") == "SELECT 'read_parquet(''x'')'")
    // composes with the cast rewrite in one call
    assert(rw("SELECT v::INT FROM read_parquet('/t.parquet')") ==
      "SELECT CAST(v AS INT) FROM parquet.`/t.parquet`")
  }

  test("read_parquet actually reads through Spark") {
    val dir = java.nio.file.Files.createTempDirectory("duckrp-").toString
    import spark.implicits._
    Seq((1L, "a"), (2L, "b")).toDF("id", "s").write.mode("overwrite").parquet(dir)
    val out = spark.sql(rw(s"SELECT count(*) AS c FROM read_parquet('$dir')"))
      .collect().head.getLong(0)
    assert(out == 2L)
  }

  test("rewritten SQL actually runs on Spark") {
    val r = spark.sql(rw(
      "SELECT 42::VARCHAR AS s, '7'::INT2 AS i, epoch_ns('2025-04-24T00:00:00'::TIMESTAMP) AS ns"))
      .collect().head
    assert(r.getString(0) == "42")
    assert(r.getShort(1) == 7.toShort)
    assert(r.getLong(2) > 0L)
  }

  test("DuckDB-compat function names run as native expressions") {
    def one(sql: String): Any = spark.sql(s"SELECT $sql AS v").collect().head.get(0)
    assert(one("len('abcd')") == 4L)
    assert(one("len(array(1, 2, 3))") == 3L)
    assert(one("string_split('a.b.c', '.')") ==
      Seq("a", "b", "c")) // plain separator, not regex-any-char
    assert(one("string_split_regex('a1b22c', '[0-9]+')") == Seq("a", "b", "c"))
    assert(one("regexp_matches('graft', 'ra.t')") == true)
    assert(one("list_contains(array(1, 2), 2)") == true)
    assert(one("list_distinct(array(1, 1, 2))") == Seq(1, 2))
    assert(one("strftime(TIMESTAMP '2025-04-24 01:02:03', '%Y-%m-%dT%H:%M:%S')") ==
      "2025-04-24T01:02:03")
    assert(one("strftime(TIMESTAMP '2025-04-03 00:00:00', '%-d/%-m/%y')") == "3/4/25")
    assert(one("epoch(TIMESTAMP '1970-01-01 00:01:00')") == 60L)
    assert(one("epoch_ms(TIMESTAMP '1970-01-01 00:01:00')") == 60000L)
    assert(one("epoch_us(TIMESTAMP '1970-01-01 00:01:00')") == 60000000L)
    assert(one("epoch_ms(strptime('24/04/2025 00:00:00', '%d/%m/%Y %H:%M:%S'))") ==
      one("epoch_ms(TIMESTAMP '2025-04-24 00:00:00')"))
  }

  test("shingles/ngrams arity + integral-literal validation (ADVICE r7)") {
    def fails(sql: String, frag: String): Unit = {
      val e = intercept[Exception](spark.sql(s"SELECT $sql").collect())
      def all(t: Throwable): Seq[String] =
        if (t == null) Nil else t.getMessage +: all(t.getCause)
      assert(all(e).exists(m => m != null && m.contains(frag)),
        s"expected '$frag' in: ${all(e)}")
    }
    fails("shingles('a b c')", "expected 2 arguments")
    fails("shingles('a b c', 2, 3)", "expected 2 arguments")
    fails("shingles('a b c', 2.5)", "must be a literal integer")
    fails("ngrams(array('a'), 2.5)", "must be a literal integer")
    // the valid shapes still work
    assert(spark.sql("SELECT shingles('a b c d', 3) AS v").collect()
      .head.getSeq[String](0).nonEmpty)
  }
}
