package graft.functions

import graft.SparkSpec

/** ngramDistance / ngramSearch (VERDICT r12 #6), pinned to the worked
  * examples in ClickHouse's own documentation — the strongest public
  * vectors available for these CH-specific definitions. */
class ChNgramSpec extends SparkSpec {

  private def one(sql: String): Float =
    spark.sql(s"SELECT $sql AS v").collect().head.getFloat(0)

  test("ngramDistance matches the ClickHouse documentation examples") {
    // docs: ngramDistance('ClickHouse','ClickHouse!') = 0.06666667
    //   grams: 7 and 8, multiset intersection 7 → (7+8-14)/15 = 1/15
    assert(math.abs(one("ngramDistance('ClickHouse','ClickHouse!')") - 1f / 15) < 1e-6)
    // docs: ngramDistance('ClickHouse','House') = 0.5555556
    //   grams: 7 and 2, intersection 2 → (7+2-4)/9 = 5/9
    assert(math.abs(one("ngramDistance('ClickHouse','House')") - 5f / 9) < 1e-6)
    // identical strings → 0; disjoint → 1
    assert(one("ngramDistance('ClickHouse','ClickHouse')") == 0f)
    assert(one("ngramDistance('abcd','wxyz')") == 1f)
  }

  test("ngramDistance is a MULTISET metric (repeat grams count)") {
    // 'aaaaa' = 2x gram 'aaaa'; 'aaaa' = 1x. I = 1 → (2+1-2)/3 = 1/3
    assert(math.abs(one("ngramDistance('aaaaa','aaaa')") - 1f / 3) < 1e-6)
  }

  test("ngramDistance edge semantics: gram-less strings") {
    // both under 4 bytes: no grams on either side → 0 (nothing differs)
    assert(one("ngramDistance('ab','xy')") == 0f)
    // one side gram-less → fully different
    assert(one("ngramDistance('abcd','x')") == 1f)
    assert(one("ngramDistance('', 'abcd')") == 1f)
  }

  test("ngramSearch is the non-symmetric containment score") {
    // needle fully contained → 1
    assert(one("ngramSearch('Hello World','World')") == 1f)
    // disjoint → 0
    assert(one("ngramSearch('Hello World','zzzz')") == 0f)
    // half the needle's grams present: needle 'Worlx' grams =
    // {Worl, orlx}; haystack has only 'Worl' → 0.5
    assert(one("ngramSearch('Hello World','Worlx')") == 0.5f)
    // NOT symmetric: a short needle in a long haystack scores 1, the
    // reverse direction is far below 1
    assert(one("ngramSearch('World','Hello World')") < 0.5f)
    // gram-less needle: vacuously contained
    assert(one("ngramSearch('anything','ab')") == 1f)
  }

  test("CaseInsensitive variants fold ASCII case only") {
    assert(one("ngramDistanceCaseInsensitive('ClickHouse','clickhouse')") == 0f)
    assert(one("ngramSearchCaseInsensitive('HELLO WORLD','world')") == 1f)
    // the case-sensitive base treats case as different bytes
    assert(one("ngramDistance('ClickHouse','clickhouse')") > 0f)
  }

  test("null propagation and codegen") {
    val r = spark.sql("SELECT ngramDistance(CAST(NULL AS STRING), 'x') AS v")
      .collect().head
    assert(r.isNullAt(0))
    val df = spark.sql(
      "SELECT ngramSearch(concat('doc-', CAST(id AS STRING)), 'doc-5') AS v FROM range(0, 10)")
    assert(df.collect().length == 10)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [ngramSearch("), plan)
  }
}
