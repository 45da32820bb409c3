package graft.functions

import graft.SparkSpec

/** r12 second dialect tier (DialectExtras): CH array lambdas
  * (lambda-FIRST order), URL parts, DuckDB list constructors and
  * aggregates, multi-search, the permissive timestamp parser.
  * DuckDB-sourced semantics were probed against DuckDB itself
  * (null-skipping list_aggregate, list_unique counting non-nulls);
  * CH semantics follow the docs like the rest of the compat surface. */
class DialectExtrasSpec extends SparkSpec {

  private def one(sql: String): Any =
    spark.sql(s"SELECT $sql AS v").collect().head.get(0)
  private def arr(sql: String): Seq[Any] =
    spark.sql(s"SELECT $sql AS v").collect().head.getSeq[Any](0)

  test("DuckDB list constructors and list_unique (probed semantics)") {
    assert(arr("list_value(1, 2, 3)") == Seq(1, 2, 3))
    assert(arr("list_pack('a', 'b')") == Seq("a", "b"))
    // probed: list_unique([1,1,NULL,2,NULL]) = 2 (distinct NON-null)
    assert(one("list_unique(array(1, 1, null, 2, null))") == 2L)
  }

  test("list_aggregate skips nulls like DuckDB (probed: sum=3, avg=1.5)") {
    assert(one("list_aggregate(array(1, null, 2), 'sum')") == 3L)
    assert(one("list_aggregate(array(1, null, 2), 'avg')") == 1.5)
    assert(one("list_aggregate(array(1, null, 2), 'count')") == 2L)
    assert(one("list_aggregate(array(3, 1), 'min')") == 1)
    assert(one("list_aggregate(array(3, 1), 'max')") == 3)
    assert(one("list_aggregate(array(1.5d, 2.5d), 'sum')") == 4.0)
    assert(one("list_aggr(array('a', null, 'b'), 'string_agg', '|')") == "a|b")
    assert(one("list_aggregate(array('a', 'b'), 'string_agg')") == "a,b")
    val e = intercept[Exception](
      spark.sql("SELECT list_aggregate(array(1), 'median')").collect())
    assert(e.getMessage.contains("unsupported aggregate"))
  }

  test("CH array lambdas use the lambda-FIRST argument order") {
    assert(arr("arrayMap(x -> x + 1, array(1, 2))") == Seq(2, 3))
    assert(arr("arrayFilter(x -> x > 1, array(1, 2, 3))") == Seq(2, 3))
    assert(one("arrayExists(x -> x = 2, array(1, 2))") == true)
    assert(one("arrayAll(x -> x > 0, array(1, 2))") == true)
    assert(one("arrayAll(x -> x > 1, array(1, 2))") == false)
    assert(one("arrayCount(x -> x % 2 = 0, array(1, 2, 3, 4))") == 2)
    // lambda-less truthy forms (non-zero, non-null)
    assert(one("arrayExists(array(0, 0, 5))") == true)
    assert(one("arrayAll(array(1, 0))") == false)
    assert(one("arrayCount(array(0, 1, null, 2))") == 2)
  }

  test("CH array transforms: enumerate, difference, compact, zip, arrayJoin") {
    assert(arr("arrayEnumerate(array('a', 'b', 'c'))") == Seq(1, 2, 3))
    assert(arr("arrayDifference(array(1, 4, 9))") == Seq(0, 3, 5))
    assert(arr("arrayCompact(array(1, 1, 2, 2, 1))") == Seq(1, 2, 1))
    val z = spark.sql("SELECT arrayZip(array(1, 2), array('a', 'b')) AS v")
      .collect().head.getSeq[org.apache.spark.sql.Row](0)
    assert(z.size == 2 && z.head.get(0) == 1 && z.head.get(1) == "a")
    // CH arrayJoin unfolds rows (the explode semantic)
    assert(spark.sql("SELECT arrayJoin(array(1, 2, 3)) AS v")
      .collect().map(_.getInt(0)).toSeq == Seq(1, 2, 3))
  }

  test("multiSearchAny / multiSearchFirstPosition / positionCaseInsensitive") {
    assert(one("multiSearchAny('hello world', array('xyz', 'wor'))") == true)
    assert(one("multiSearchAny('hello world', array('xyz'))") == false)
    // leftmost offset of any needle: 'e' at 2 beats 'l' at 3; none -> 0
    assert(one("multiSearchFirstPosition('hello', array('l', 'e'))") == 2)
    assert(one("multiSearchFirstPosition('hello', array('z'))") == 0)
    assert(one("positionCaseInsensitive('Hello World', 'world')") == 7)
  }

  test("uniqCombined sketches distincts; quantiles returns the level array") {
    import spark.implicits._
    (1 to 100).toDF("x").createOrReplaceTempView("uqx")
    val u = spark.sql("SELECT uniqCombined(x) AS v FROM uqx")
      .collect().head.getLong(0)
    assert(math.abs(u - 100) <= 5) // HLL++ default rsd
    val q = spark.sql(
      "SELECT quantiles(0.0d, 0.5d, 1.0d, x) AS v FROM uqx")
      .collect().head.getSeq[Int](0)
    assert(q == Seq(1, 50, 100) || q == Seq(1, 51, 100))
  }

  test("CH date shortcuts: fixed grids, ISO year, relative nums") {
    val t = "TIMESTAMP '2025-04-24 13:47:56.789'"
    assert(one(s"toStartOfFiveMinutes($t)").toString == "2025-04-24 13:45:00.0")
    assert(one(s"toStartOfTenMinutes($t)").toString == "2025-04-24 13:40:00.0")
    assert(one(s"toStartOfFifteenMinutes($t)").toString == "2025-04-24 13:45:00.0")
    assert(one(s"timeSlot($t)").toString == "2025-04-24 13:30:00.0")
    assert(one(s"toStartOfSecond($t)").toString == "2025-04-24 13:47:56.0")
    // ISO year = year of the ISO week (2024-12-30 is ISO 2025-W01;
    // 2021-01-01 is ISO 2020-W53)
    assert(one("toISOYear(DATE '2024-12-30')") == 2025)
    assert(one("toISOYear(DATE '2021-01-01')") == 2020)
    assert(one("toISOYear(DATE '2025-04-24')") == 2025)
    assert(one("toRelativeDayNum(DATE '1970-01-02')") == 1)
    assert(one("toRelativeDayNum(DATE '1970-01-01')") == 0)
    assert(one("toRelativeHourNum(TIMESTAMP '1970-01-01 05:30:00')") == 5L)
  }

  test("parseDateTimeBestEffort: ISO, YYYYMMDD[hhmmss], DD/MM/YYYY, unix seconds") {
    def p(s: String): Any = one(s"parseDateTimeBestEffort('$s')")
    assert(p("2024-01-02 03:04:05").toString == "2024-01-02 03:04:05.0")
    assert(p("2024-01-02T03:04:05").toString == "2024-01-02 03:04:05.0")
    assert(p("20240102030405").toString == "2024-01-02 03:04:05.0")
    assert(p("20240102").toString == "2024-01-02 00:00:00.0")
    assert(p("02/01/2024").toString == "2024-01-02 00:00:00.0")
    // 9-10 digit strings are unix seconds (CH rule); session is UTC
    assert(p("1700000000").toString == "2023-11-14 22:13:20.0")
    // documented deviation: NULL on garbage (CH base form throws)
    assert(p("definitely not a date") == null)
    assert(one("parseDateTimeBestEffortOrNull('garbage')") == null)
  }

  test("extractAll picks the capture group iff the literal pattern has one") {
    assert(arr("extractAll('a1b22c333', '\\\\d+')") == Seq("1", "22", "333"))
    assert(arr("extractAll('key=1, key=2', 'key=(\\\\d)')") == Seq("1", "2"))
  }

  test("extractGroups: the first match's capture groups; no match = []") {
    assert(arr("extractGroups('a=1, b=2', '(\\\\w+)=(\\\\d+)')") == Seq("a", "1"))
    assert(arr("extractGroups('no digits here', '(\\\\d+)')") == Seq())
    assert(spark.sql("SELECT extractGroups(CAST(null AS STRING), '(x)') AS v")
      .collect().head.get(0) == null)
    val e = intercept[Exception](
      spark.sql("SELECT extractGroups('x', 'nogroups')").collect())
    assert(e.getMessage.contains("capture group"))
  }

  test("simple-JSON getters and JSONLength") {
    assert(one("""visitParamExtractString('{"a":"x"}', 'a')""") == "x")
    assert(one("""simpleJSONExtractString('{"a":"x"}', 'a')""") == "x")
    assert(one("JSONLength('[1,2,3]')") == 3)
    assert(one("""JSONLength('{"a":1,"b":2}')""") == 2)
  }

  test("URL family: netloc, cut*, queryStringAndFragment, parameters") {
    val u = "'http://e.com/p?page=1&b=2#frag'"
    assert(one(s"netloc('https://paul:pw@example.com:8080/path')")
      == "paul:pw@example.com:8080")
    assert(one("cutWWW('https://www.example.com/x')") == "https://example.com/x")
    assert(one("cutWWW('www.example.com')") == "example.com")
    assert(one("cutWWW('https://example.com/www.html')") == "https://example.com/www.html")
    assert(one(s"cutQueryString($u)") == "http://e.com/p#frag")
    assert(one(s"cutFragment($u)") == "http://e.com/p?page=1&b=2")
    assert(one(s"cutQueryStringAndFragment($u)") == "http://e.com/p")
    assert(one(s"queryStringAndFragment($u)") == "page=1&b=2#frag")
    assert(one("queryStringAndFragment('http://e.com/p')") == null)
    assert(arr(s"extractURLParameters($u)") == Seq("page=1", "b=2"))
    assert(arr(s"extractURLParameterNames($u)") == Seq("page", "b"))
    assert(one("decodeURLComponent('a%20b%2Bc+d')") == "a b+c+d")
    assert(one("encodeURLComponent('a b')") == "a%20b")
  }

  test("firstSignificantSubdomain honors the CH second-level list") {
    assert(one("firstSignificantSubdomain('https://news.clickhouse.com.tr/')")
      == "clickhouse")
    assert(one("firstSignificantSubdomain('https://news.clickhouse.com/')")
      == "clickhouse")
    assert(one("firstSignificantSubdomain('https://example.com')") == "example")
    assert(one("cutToFirstSignificantSubdomain('https://news.clickhouse.com.tr/')")
      == "clickhouse.com.tr")
    assert(one("cutToFirstSignificantSubdomain('https://news.clickhouse.com/x')")
      == "clickhouse.com")
    assert(one("firstSignificantSubdomain('not a url')") == null)
  }

  test("toIPv4 is the UInt32 (documented numeric deviation); round-trips") {
    assert(one("toIPv4('1.2.3.4')") == 16909060L)
    assert(one("IPv4NumToString(toIPv4('10.0.0.255'))") == "10.0.0.255")
    assert(one("toIPv4('300.1.2.3')") == null)
  }

  test("read_ndjson maps through the table-fn rewrite") {
    val dir = java.nio.file.Files.createTempDirectory("ndj")
    java.nio.file.Files.write(dir.resolve("d.ndjson"),
      "{\"a\": 1}\n{\"a\": 2}\n".getBytes("UTF-8"))
    val sql = graft.server.DuckDialect.rewrite(
      s"SELECT a FROM read_ndjson('${dir.resolve("d.ndjson")}') ORDER BY a")
    assert(sql.contains("json.`"))
    assert(spark.sql(sql).collect().map(_.getLong(0)).toSeq == Seq(1L, 2L))
  }

  // ---- r13 second-pass tier: arithmetic / bits / trims / date shifts /
  //      readable formatting ----

  test("divide is always floating-point; the bit family matches CH") {
    assert(one("divide(7, 2)") == 3.5)
    assert(one("bitNot(0)") == -1)
    assert(one("bitShiftLeft(1, 10)") == 1024)
    assert(one("bitShiftRight(1024, 3)") == 128)
    assert(one("bitTest(5, 0)") == 1) // 0b101
    assert(one("bitTest(5, 1)") == 0)
    assert(one("bitTest(5, 2)") == 1)
  }

  test("shifts at/past the operand width yield 0, not Java's mod-width (ADVICE r13)") {
    // Java masks the count (1 << 64 == 1); CH zeroes at/past the width
    assert(one("bitShiftLeft(CAST(1 AS BIGINT), 64)") == 0L)
    assert(one("bitShiftLeft(CAST(1 AS BIGINT), 63)") == Long.MinValue)
    assert(one("bitShiftLeft(1, 32)") == 0)    // INT operand: width 32
    assert(one("bitShiftLeft(1, 31)") == Int.MinValue)
    assert(one("bitShiftRight(CAST(-8 AS BIGINT), 1)") == -4L) // arithmetic in-range
    assert(one("bitShiftRight(1024, 32)") == 0)
    assert(one("bitShiftLeft(1, -1)") == 0)    // negative count: 0, not 1<<31
    assert(one("bitTest(5, 64)") == 0)          // was reading bit 0
    assert(one("bitTest(CAST(-1 AS BIGINT), 63)") == 1)
    assert(one("bitTest(5, -1)") == 0)
  }

  test("intExp10: exact UInt64 with CH's intExp.h clamps (r14)") {
    def dec(s: String) = new java.math.BigDecimal(s)
    assert(one("intExp10(0)").asInstanceOf[java.math.BigDecimal]
      .compareTo(dec("1")) == 0)
    assert(one("intExp10(3)").asInstanceOf[java.math.BigDecimal]
      .compareTo(dec("1000")) == 0)
    assert(one("intExp10(19)").asInstanceOf[java.math.BigDecimal]
      .compareTo(dec("10000000000000000000")) == 0)
    // clamps: negative → 0, past 19 → UInt64 max (intExp.h)
    assert(one("intExp10(-1)").asInstanceOf[java.math.BigDecimal]
      .compareTo(dec("0")) == 0)
    assert(one("intExp10(25)").asInstanceOf[java.math.BigDecimal]
      .compareTo(dec("18446744073709551615")) == 0)
    // NULL propagates — without the IsNull arm the null fell through
    // every condition (null=false) to the else-clamp and answered
    // UInt64 max (review r14)
    assert(one("intExp10(CAST(NULL AS INT))") == null)
  }

  test("roundToExp2: the CH doc ladder, full UInt64 range, floats (r14)") {
    // docs: numbers 0..9 → 0,1,2,2,4,4,4,4,8,8
    assert((0 to 9).map(n => one(s"roundToExp2($n)")) ==
      Seq(0, 1, 2, 2, 4, 4, 4, 4, 8, 8))
    assert(one("roundToExp2(CAST(-5 AS BIGINT))") == 0L)
    assert(one("roundToExp2(CAST(6442450944 AS BIGINT))") == 4294967296L)
    // UInt64 convention: above 2^63 still rounds exactly (no double
    // detour — the old gap reason)
    assert(one("roundToExp2(intExp2(63) + 5)")
      .asInstanceOf[java.math.BigDecimal]
      .compareTo(new java.math.BigDecimal("9223372036854775808")) == 0)
    // float path: mantissa clear = 2^floor(log2 x); < 1 → 0
    assert(one("roundToExp2(CAST(5.5 AS DOUBLE))") == 4.0)
    assert(one("roundToExp2(CAST(0.7 AS DOUBLE))") == 0.0)
  }

  test("bar renders full blocks + one left-eighth partial (r14)") {
    assert(one("bar(5, 0, 10, 10)") == "█████")
    assert(one("bar(3, 0, 8, 8)") == "███")
    // w = 5.5 → five full + floor(0.5*8)=4 eighths = ▌ (U+258C)
    assert(one("bar(5.5, 0, 8, 8)") == "█████▌")
    // w = 2/3 → floor(0.6667*8) = 5 eighths = ▋ (U+258B)
    assert(one("bar(1, 0, 3, 2)") == "▋")
    // clamps at both ends; default width is 80
    assert(one("bar(-1, 0, 10, 10)") == "")
    assert(one("bar(20, 0, 10, 10)") == "██████████")
    assert(one("bar(1, 0, 1)") == "█" * 80)
    // degenerate/IEEE edges pinned to live-probed DuckDB bar: min==max
    // with x past it → +Inf → full; 0/0 → NaN → EMPTY (NaN used to
    // clamp to full width under Greatest/Least NaN-greatest ordering,
    // and ANSI Divide used to THROW on min==max — review r14)
    assert(one("bar(5, 0, 0, 10)") == "██████████")
    assert(one("bar(0, 0, 0, 10)") == "")
    assert(one("bar(CAST('NaN' AS DOUBLE), 0, 10, 10)") == "")
    assert(one("bar(CAST('Infinity' AS DOUBLE), 0, 10, 10)") == "██████████")
    // NULL propagates from ANY argument, including through the
    // degenerate min==max arms (ADVICE r14: a NULL x with min==max
    // answered '' because IsNaN(NULL) is false and the den==0 arm won;
    // DuckDB's bar is null-propagating — probed: bar(NULL,0,0,10),
    // bar(NULL,0,7,10), bar(2,0,0,NULL), bar(2,NULL,3,10) all NULL)
    assert(one("bar(NULL, 0, 0, 10)") == null)
    assert(one("bar(NULL, 0, 7, 10)") == null)
    assert(one("bar(2, 0, 0, NULL)") == null)
    assert(one("bar(2, NULL, 3, 10)") == null)
  }

  test("trimBoth/trimLeft/trimRight, 1- and 2-arg forms") {
    assert(one("trimBoth('  x  ')") == "x")
    assert(one("trimLeft('  x  ')") == "x  ")
    assert(one("trimRight('  x  ')") == "  x")
    assert(one("trimBoth('xxaxx', 'x')") == "a")
    assert(one("trimLeft('xxaxx', 'x')") == "axx")
  }

  test("add*/subtract* date shifts at every unit (CH calendar semantics)") {
    assert(one("addYears(timestamp'2020-02-29 10:00:00', 1)").toString
      == "2021-02-28 10:00:00.0") // leap-day clamp, like CH
    assert(one("addQuarters(timestamp'2024-01-15 00:00:00', 1)").toString
      == "2024-04-15 00:00:00.0")
    assert(one("addMonths(timestamp'2024-01-31 00:00:00', 1)").toString
      == "2024-02-29 00:00:00.0") // month-end clamp
    assert(one("addWeeks(timestamp'2024-01-01 00:00:00', 2)").toString
      == "2024-01-15 00:00:00.0")
    assert(one("addDays(timestamp'2024-01-01 12:00:00', 31)").toString
      == "2024-02-01 12:00:00.0")
    assert(one("addHours(timestamp'2024-01-01 23:30:00', 2)").toString
      == "2024-01-02 01:30:00.0")
    assert(one("addMinutes(timestamp'2024-01-01 00:59:00', 2)").toString
      == "2024-01-01 01:01:00.0")
    assert(one("addSeconds(timestamp'2024-01-01 00:00:59', 2)").toString
      == "2024-01-01 00:01:01.0")
    assert(one("subtractDays(timestamp'2024-03-01 00:00:00', 1)").toString
      == "2024-02-29 00:00:00.0")
    assert(one("subtractMonths(timestamp'2024-03-31 00:00:00', 1)").toString
      == "2024-02-29 00:00:00.0")
    // epoch-ns int64 inputs go through the same ts() cast as the tier
    assert(one("addDays(epoch_ns(1700000000000000000), 1)") != null)
  }

  test("toTime keeps the time-of-day on the 1970-01-02 carrier date") {
    assert(one("toTime(timestamp'2024-06-15 13:45:07')").toString
      == "1970-01-02 13:45:07.0")
    assert(one("toTime(timestamp'1969-06-15 23:59:59')").toString
      == "1970-01-02 23:59:59.0") // pmod: pre-1970 stays positive
  }

  test("exp2/exp10/intExp2 (exact UInt64 at 2^63)") {
    assert(one("exp2(10)") == 1024d)
    assert(one("exp10(3)") == 1000d)
    assert(one("intExp2(10)").toString == "1024")
    assert(one("intExp2(63)").toString == "9223372036854775808")
  }

  test("replace family: first-only literal, all-literal, regexp with \\N backrefs") {
    assert(one("replaceOne('aXbXc', 'X', '_')") == "a_bXc")
    assert(one("replaceOne('abc', 'z', '_')") == "abc") // no match: original
    assert(one("replaceOne('abc', '', '_')") == "abc")  // empty needle: original
    assert(one("replaceAll('aXbXc', 'X', '_')") == "a_b_c")
    // CH backreference spelling \\1 translates to Spark's $1; a literal
    // '$' in the replacement stays literal
    assert(one("replaceRegexpAll('a1b2', '([0-9])', '[\\\\1]')") == "a[1]b[2]")
    assert(one("replaceRegexpAll('ab', '(b)', '$x\\\\1')") == "a$xb")
    // a LONE backslash in the replacement (before a non-digit, or
    // trailing) stays a literal backslash, as in CH — Java's rules
    // would drop it / throw (ADVICE r13). SQL-literal parsing eats one
    // level: '\\\\x' in source is \x in the replacement string.
    assert(one("replaceRegexpAll('ab', 'b', '\\\\x')") == "a\\x")
    assert(one("replaceRegexpAll('ab', 'b', 'z\\\\')") == "az\\")
  }

  test("UTF8-named spellings are codepoint-level; null identities pass through") {
    assert(one("reverseUTF8('ab€')") == "€ba")
    assert(one("leftUTF8('a€c', 2)") == "a€")
    assert(one("rightUTF8('a€c', 2)") == "€c")
    assert(one("concatWithSeparator('-', 'a', 'b', 'c')") == "a-b-c")
    assert(one("assumeNotNull(5)") == 5)
    assert(one("toNullable(5)") == 5)
  }

  test("array predicates carry CH null semantics (<=> element compare)") {
    assert(one("countEqual(array(1, 2, 1, null), 1)") == 2)
    assert(one("countEqual(array(1, null, null), null)") == 2) // CH counts NULLs
    assert(one("hasAll(array(1, 2, 3), array(3, 1))") == true)
    assert(one("hasAll(array(1, null), array(null))") == true) // CH doc example
    assert(one("hasAll(array(1, 2), array(3))") == false)
    assert(one("hasAny(array(1, 2), array(9, 2))") == true)
    assert(one("hasAny(array(1, 2), array(9))") == false)
    assert(arr("arrayIntersect(array(1, 2, 3, 2), array(3, 2), array(2, 3))")
      .toSet == Set(2, 3))
  }

  test("toFixedString NUL-pads to n and throws past it (CH contract)") {
    assert(one("length(toFixedString('ab', 4))") == 4)
    assert(one("toFixedString('ab', 4)").toString.startsWith("ab"))
    val e = intercept[Exception](one("toFixedString('abcdef', 4)"))
    assert(e.getMessage.contains("toFixedString"))
  }

  test("toRelativeMinuteNum/SecondNum floor like the hour tier") {
    assert(one("toRelativeSecondNum(timestamp'1970-01-01 00:02:05')") == 125L)
    assert(one("toRelativeMinuteNum(timestamp'1970-01-01 00:02:05')") == 2L)
    assert(one("toRelativeMinuteNum(timestamp'1969-12-31 23:59:30')") == -1L)
  }

  test("formatReadableSize / formatReadableQuantity (doc-pinned)") {
    assert(one("formatReadableSize(1)") == "1.00 B")
    assert(one("formatReadableSize(1024)") == "1.00 KiB")
    assert(one("formatReadableSize(1024 * 1024)") == "1.00 MiB")
    assert(one("formatReadableSize(23456789)") == "22.37 MiB")
    assert(one("formatReadableSize(-2048)") == "-2.00 KiB")
    // C++-style fixed rounding: 1152/1024 = 1.125 rounds half-EVEN
    assert(one("formatReadableSize(1152)") == "1.12 KiB")
    assert(one("formatReadableQuantity(1024)") == "1.02 thousand")
    assert(one("formatReadableQuantity(10765432)") == "10.77 million")
    assert(one("formatReadableQuantity(999)") == "999.00")
    assert(one("formatReadableQuantity(cast('nan' as double))") == "nan")
  }
}
