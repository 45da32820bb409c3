package graft.functions

import graft.SparkSpec

/** chsql-compat surface: the reference image installs the community
  * chsql extension (reference merge/service/merge_service_fs.go:147-152)
  * so these names work through its /query; ours registers them as
  * native Catalyst builders. ClickHouse semantics asserted per family. */
class ChsqlFunctionsSpec extends SparkSpec {

  private def one(sql: String): Any =
    spark.sql(s"SELECT $sql AS v").collect().head.get(0)

  test("date parts and truncation") {
    val t = "TIMESTAMP '2025-04-24 13:45:56'"
    assert(one(s"toYear($t)") == 2025)
    assert(one(s"toMonth($t)") == 4)
    assert(one(s"toDayOfMonth($t)") == 24)
    assert(one(s"toDayOfWeek($t)") == 4) // 2025-04-24 is Thursday, ISO 4
    assert(one(s"toDayOfYear($t)") == 114)
    assert(one(s"toHour($t)") == 13)
    assert(one(s"toMinute($t)") == 45)
    assert(one(s"toSecond($t)") == 56)
    assert(one(s"toYYYYMM($t)") == 202504)
    assert(one(s"toYYYYMMDD($t)") == 20250424)
    assert(one(s"toDate($t)").toString == "2025-04-24")
    assert(one(s"toStartOfMonth($t)").toString == "2025-04-01")
    assert(one(s"toStartOfYear($t)").toString == "2025-01-01")
    // CH default mode 0: weeks start SUNDAY (2025-04-24 is a Thursday);
    // a Sunday is its own week start
    assert(one(s"toStartOfWeek($t)").toString == "2025-04-20")
    assert(one("toStartOfWeek(DATE '2025-04-20')").toString == "2025-04-20")
    assert(one(s"toStartOfDay($t)").toString == "2025-04-24 00:00:00.0")
    assert(one(s"toStartOfHour($t)").toString == "2025-04-24 13:00:00.0")
    assert(one(s"toStartOfMinute($t)").toString == "2025-04-24 13:45:00.0")
    assert(one(s"toUnixTimestamp(TIMESTAMP '1970-01-01 00:02:00')") == 120L)
    assert(one("yesterday() < today()") == true)
  }

  test("string tests work on strings AND arrays (CH empty/notEmpty/length)") {
    assert(one("empty('')") == true)
    assert(one("empty('x')") == false)
    assert(one("notEmpty(array(1))") == true)
    assert(one("empty(array())") == true)
    assert(one("lengthUTF8('héllo')") == 5)
    assert(one("lowerUTF8('AbC')") == "abc")
    assert(one("upperUTF8('AbC')") == "ABC")
    assert(one("substringUTF8('hello', 2, 3)") == "ell")
    assert(one("leftPad('7', 3, '0')") == "007")
    assert(one("rightPad('7', 3)") == "7  ")
    assert(one("startsWith('graft', 'gr')") == true)
    assert(one("endsWith('graft', 'ft')") == true)
    assert(one("splitByChar(',', 'a,b,c')") == Seq("a", "b", "c"))
    assert(one("splitByChar('.', 'a.b')") == Seq("a", "b")) // literal, not regex
  }

  test("URL parts") {
    val u = "'https://example.com/a/b?x=1'"
    assert(one(s"protocol($u)") == "https")
    assert(one(s"domain($u)") == "example.com")
    assert(one(s"path($u)") == "/a/b")
    assert(one(s"queryString($u)") == "x=1")
  }

  test("IPv4 round-trip") {
    assert(one("IPv4NumToString(3232235777)") == "192.168.1.1")
    assert(one("IPv4StringToNum('192.168.1.1')") == 3232235777L)
    assert(one("IPv4NumToString(IPv4StringToNum('10.0.0.255'))") == "10.0.0.255")
    // malformed/out-of-range input is NULL in BOTH ANSI modes — the
    // unguarded form returned a silently-WRONG number for '300.1.2.3'
    // (round-tripping as '44.1.2.3') and flipped NULL/throw with ANSI
    Seq("'300.1.2.3'", "'1.2.3'", "'1.2.3.4.5'", "'a.b.c.d'", "''")
      .foreach { bad =>
        val r = spark.sql(s"SELECT IPv4StringToNum($bad) v").collect()(0)
        assert(r.isNullAt(0), s"$bad must be NULL")
      }
    assert(one("IPv4StringToNum('0.0.0.0')") == 0L)
    assert(one("IPv4StringToNum('255.255.255.255')") == 4294967295L)
  }

  test("JSON extraction") {
    val j = """'{"a": 7, "s": "hi", "f": 1.5, "b": true}'"""
    assert(one(s"JSONExtractInt($j, 'a')") == 7L)
    assert(one(s"JSONExtractString($j, 's')") == "hi")
    assert(one(s"JSONExtractFloat($j, 'f')") == 1.5)
    assert(one(s"JSONExtractBool($j, 'b')") == true)
    assert(one(s"JSONHas($j, 'a')") == true)
    assert(one(s"JSONHas($j, 'zz')") == false)
    assert(one(s"JSONExtractInt($j, 's')") == null) // non-numeric: null, not throw
  }

  test("arrays, multiIf, arithmetic names") {
    assert(one("has(array(1, 2, 3), 2)") == true)
    assert(one("indexOf(array(10, 20), 20)") == 2L)
    assert(one("arrayDistinct(array(1, 1, 2))") == Seq(1, 2))
    assert(one("arrayReverse(array(1, 2))") == Seq(2, 1))
    assert(one("arraySlice(array(1, 2, 3, 4), 2, 2)") == Seq(2, 3))
    assert(one("arraySlice(array(1, 2, 3, 4), 3)") == Seq(3, 4)) // to end
    assert(one("multiIf(false, 1, true, 2, 3)") == 2)
    assert(one("multiIf(false, 1, false, 2, 3)") == 3)
    intercept[Exception](spark.sql("SELECT multiIf(true, 1)").collect())
    assert(one("plus(2, 3)") == 5)
    assert(one("minus(2, 3)") == -1)
    assert(one("multiply(4, 3)") == 12)
    assert(one("modulo(7, 3)") == 1)
    assert(one("negate(5)") == -5)
    assert(one("bitCount(7)") == 3)
  }

  test("next-used tier: quarter/epoch64/url/string/array forms (VERDICT r9 #5)") {
    val t = "TIMESTAMP '2025-04-24 13:45:56'"
    assert(one(s"toQuarter($t)") == 2)
    assert(one(s"toStartOfQuarter($t)").toString == "2025-04-01")
    assert(one(s"toYYYYMMDDhhmmss($t)") == 20250424134556L)
    assert(one(s"toUnixTimestamp64Milli($t)") == 1745502356000L)
    assert(one(s"toUnixTimestamp64Micro($t)") == 1745502356000000L)
    assert(one(s"toUnixTimestamp64Nano($t)") == 1745502356000000000L)
    assert(one("toUnixTimestamp64Milli(fromUnixTimestamp64Milli(1745502356123))")
      == 1745502356123L)
    assert(one("toUnixTimestamp64Micro(fromUnixTimestamp64Micro(1745502356123456))")
      == 1745502356123456L)
    assert(one("toUnixTimestamp64Nano(fromUnixTimestamp64Nano(1745502356123456000))")
      == 1745502356123456000L)
    val u = "'https://www.example.com/a/b?q=1&r=2#frag'"
    assert(one(s"fragment($u)") == "frag")
    assert(one(s"extractURLParameter($u, 'r')") == "2")
    assert(one(s"domainWithoutWWW($u)") == "example.com")
    assert(one(s"topLevelDomain($u)") == "com")
    assert(one("topLevelDomain('https://localhost/x')") == "")
    assert(one("splitByString('ab', '1ab2ab3')") == Seq("1", "2", "3"))
    assert(one("arrayStringConcat(array('a', 'b'), '-')") == "a-b")
    assert(one("arrayStringConcat(array('a', 'b'))") == "ab")
    assert(one("arrayFlatten(array(array(1, 2), array(3)))") == Seq(1, 2, 3))
    assert(one("intDivOrZero(6, 0)") == 0.0)
    assert(one("moduloOrZero(7, 0)") == 0)
    assert(one("moduloOrZero(7, 3)") == 1)
    assert(one("isIPv4String('192.168.1.1')") == true)
    assert(one("isIPv4String('300.1.2.3')") == false)
    assert(one("isIPv4String('nope')") == false)
    assert(one("leftPadUTF8('x', 3, '_')") == "__x")
    assert(one("rightPadUTF8('x', 3)") == "x  ")
  }

  test("groupArray / groupUniqArray / anyLast aggregate forms") {
    import spark.implicits._
    Seq(("a", 1), ("a", 2), ("a", 2), ("b", 5)).toDF("k", "v")
      .createOrReplaceTempView("gagg")
    val r = spark.sql(
      "SELECT k, groupArray(v) AS ga, groupUniqArray(v) AS gu, " +
        "anyLast(v) AS al FROM gagg GROUP BY k ORDER BY k")
      .collect()
    assert(r(0).getSeq[Int](1).sorted == Seq(1, 2, 2))
    assert(r(0).getSeq[Int](2).sorted == Seq(1, 2))
    assert(Seq(1, 2).contains(r(0).getInt(3)))
    assert(r(1).getSeq[Int](1) == Seq(5) && r(1).getInt(3) == 5)
    // anyLast skips nulls (CH aggregate convention)
    val n = spark.sql("SELECT anyLast(x) AS v FROM VALUES (1), (NULL) t(x)")
      .collect()(0)
    assert(n.getInt(0) == 1)
  }

  test("URL family is permissive: junk input is NULL, never a throw (r12)") {
    // regression pin: ParseUrl's failOnError default tracks the ANSI
    // flag (ON in Spark 4) — the bare form THREW on malformed URLs,
    // contradicting this family's documented CH contract
    Seq("protocol", "domain", "path", "queryString", "fragment",
      "domainWithoutWWW", "topLevelDomain").foreach { f =>
      assert(one(s"$f('not a url at all')") == null, f)
    }
    assert(one("extractURLParameter('%% garbage', 'k')") == null)
  }

  // ---- r12 tier (VERDICT r10 #6): formatDateTime, toStartOfInterval,
  //      the week family ----

  test("formatDateTime: C-compatible specifiers plus CH/MySQL %i = minute") {
    val t = "TIMESTAMP '2025-04-24 13:45:56'"
    assert(one(s"formatDateTime($t, '%Y-%m-%d %H:%M:%S')") == "2025-04-24 13:45:56")
    assert(one(s"formatDateTime($t, '%Y-%m-%d %H:%i:%S')") == "2025-04-24 13:45:56")
    assert(one(s"formatDateTime($t, '%d/%m/%Y')") == "24/04/2025")
    val e = intercept[Exception](
      spark.sql(s"SELECT formatDateTime($t, '%Q')").collect())
    assert(e.getMessage.contains("unsupported format specifier"))
  }

  test("toStartOfInterval floors to the epoch-anchored grid (CH)") {
    val t = "TIMESTAMP '2025-04-24 13:45:56'"
    assert(one(s"toStartOfInterval($t, INTERVAL 15 MINUTE)").toString
      == "2025-04-24 13:45:00.0")
    assert(one(s"toStartOfInterval($t, INTERVAL 1 HOUR)").toString
      == "2025-04-24 13:00:00.0")
    assert(one(s"toStartOfInterval($t, INTERVAL 6 HOUR)").toString
      == "2025-04-24 12:00:00.0")
    assert(one(s"toStartOfInterval($t, INTERVAL 1 DAY)").toString
      == "2025-04-24 00:00:00.0")
    // month grid anchored at 1970-01: April 2025 = 663 months since
    // epoch → floor to 662 → 2025-03-01 (CH returns Date here)
    assert(one(s"toStartOfInterval($t, INTERVAL 2 MONTH)").toString == "2025-03-01")
    assert(one(s"toStartOfInterval($t, INTERVAL 1 YEAR)").toString == "2025-01-01")
    val e = intercept[Exception](
      spark.sql(s"SELECT toStartOfInterval($t, INTERVAL 0 MINUTE)").collect())
    assert(e.getMessage.contains("positive"))
  }

  test("toWeek mode 0 (CH/MySQL Sunday weeks), mode 3 = ISO; toISOWeek; toMonday") {
    // 2024-01-01 is a Monday: days before the year's first Sunday are
    // week 0; the first Sunday (Jan 7) starts week 1 — MySQL WEEK(,0)
    assert(one("toWeek(DATE '2024-01-01')") == 0)
    assert(one("toWeek(DATE '2024-01-06')") == 0)
    assert(one("toWeek(DATE '2024-01-07')") == 1)
    assert(one("toWeek(DATE '2024-01-13')") == 1)
    // 2023-01-01 is a Sunday: week 1 starts on day one
    assert(one("toWeek(DATE '2023-01-01')") == 1)
    // 2025-04-24: first Sunday is Jan 5; (2025-04-24 - Jan 5) = 109 d
    // → week 16
    assert(one("toWeek(DATE '2025-04-24')") == 16)
    // mode 3 = ISO = Spark weekofyear; 2025-04-24 is ISO week 17
    assert(one("toWeek(DATE '2025-04-24', 3)") == 17)
    assert(one("toISOWeek(DATE '2025-04-24')") == 17)
    // ISO week-1-belongs-to-next-year edge: 2024-12-30 is ISO week 1
    assert(one("toISOWeek(DATE '2024-12-30')") == 1)
    val e = intercept[Exception](
      spark.sql("SELECT toWeek(DATE '2024-01-01', 7)").collect())
    assert(e.getMessage.contains("mode 7 not supported"))
    // toMonday rounds DOWN to Monday (2025-04-24 is a Thursday)
    assert(one("toMonday(DATE '2025-04-24')").toString == "2025-04-21")
    assert(one("toMonday(DATE '2025-04-21')").toString == "2025-04-21")
    assert(one("toMonday(TIMESTAMP '2025-04-27 23:59:59')").toString == "2025-04-21")
  }
}
