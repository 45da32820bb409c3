package graft.functions

import graft.SparkSpec

/** IPv6 conversion family (VERDICT r12 #4): compressed / expanded /
  * v4-mapped parse forms, RFC 5952 canonical formatting, strictness of
  * isIPv6String, and the throw-vs-null contract split. */
class Ipv6ExprsSpec extends SparkSpec {

  private def one(sql: String): Any =
    spark.sql(s"SELECT $sql AS v").collect().head.get(0)
  private def hex(sql: String): String =
    one(sql).asInstanceOf[Array[Byte]].map("%02x".format(_)).mkString

  test("IPv6StringToNum: expanded, compressed, and v4-forms") {
    // full expanded form
    assert(hex("IPv6StringToNum('2001:0db8:0000:0000:0000:ff00:0042:8329')") ==
      "20010db8000000000000ff0000428329")
    // compressed
    assert(hex("IPv6StringToNum('2001:db8::ff00:42:8329')") ==
      "20010db8000000000000ff0000428329")
    assert(hex("IPv6StringToNum('::1')") ==
      "00000000000000000000000000000001")
    assert(hex("IPv6StringToNum('::')") ==
      "00000000000000000000000000000000")
    assert(hex("IPv6StringToNum('1::')") ==
      "00010000000000000000000000000000")
    // uppercase hex accepted
    assert(hex("IPv6StringToNum('2001:DB8::FF00:42:8329')") ==
      "20010db8000000000000ff0000428329")
    // v4-mapped with dotted tail
    assert(hex("IPv6StringToNum('::ffff:192.168.0.1')") ==
      "00000000000000000000ffffc0a80001")
    // a BARE IPv4 string maps to its IPv4-mapped equivalent (CH docs)
    assert(hex("IPv6StringToNum('127.0.0.1')") ==
      "00000000000000000000ffff7f000001")
  }

  test("IPv6StringToNum / toIPv6 throw on invalid input (CH contract)") {
    Seq("'junk'", "'1:::2'", "'1::2::3'", "'::ffff:1.2.3.999'", "'1:2'",
      "'1:2:3:4:5:6:7:8:9'", "':1::2'", "'1::2:'", "'fe80::1%eth0'",
      "''").foreach { bad =>
      val e = intercept[Exception](
        spark.sql(s"SELECT IPv6StringToNum($bad)").collect())
      assert(e.getMessage != null, bad)
    }
    // the '::' must stand for at least one zero group: 8 explicit
    // groups plus '::' is invalid
    intercept[Exception](
      spark.sql("SELECT toIPv6('1:2:3:4:5:6:7::8')").collect())
  }

  test("toIPv6OrNull returns NULL instead of throwing") {
    assert(one("toIPv6OrNull('nope')") == null)
    assert(hex("toIPv6OrNull('::1')") ==
      "00000000000000000000000000000001")
    assert(one("toIPv6OrNull(CAST(NULL AS STRING))") == null)
  }

  test("IPv6NumToString: RFC 5952 canonical text") {
    // round-trips through parse
    def rt(s: String): String =
      one(s"IPv6NumToString(IPv6StringToNum('$s'))").asInstanceOf[String]
    assert(rt("2001:0db8:0000:0000:0000:ff00:0042:8329") ==
      "2001:db8::ff00:42:8329")
    assert(rt("::1") == "::1")
    assert(rt("::") == "::")
    assert(rt("1::") == "1::")
    // longest zero run wins; leftmost on tie
    assert(rt("1:0:0:2:0:0:0:3") == "1:0:0:2::3")
    assert(rt("1:0:0:2:0:0:3:4") == "1::2:0:0:3:4")
    // a SINGLE zero group is never compressed (RFC 5952 §4.2.2)
    assert(rt("1:0:2:3:4:5:6:7") == "1:0:2:3:4:5:6:7")
    // lowercase hex (RFC 5952 §4.3)
    assert(rt("2001:DB8::FF") == "2001:db8::ff")
    // v4-MAPPED renders the dotted tail
    assert(rt("::ffff:192.168.0.1") == "::ffff:192.168.0.1")
    assert(rt("127.0.0.1") == "::ffff:127.0.0.1")
  }

  test("IPv6NumToString throws on a wrong-length binary") {
    val e = intercept[Exception](
      spark.sql("SELECT IPv6NumToString(CAST('abc' AS BINARY))").collect())
    assert(e.getMessage.contains("16-byte") ||
      e.getCause != null && e.getCause.getMessage.contains("16-byte"))
  }

  test("isIPv6String is strict: dotted quads are NOT IPv6 text") {
    assert(one("isIPv6String('::1')") == true)
    assert(one("isIPv6String('2001:db8::ff00:42:8329')") == true)
    assert(one("isIPv6String('::ffff:127.0.0.1')") == true)
    // bare IPv4 is false (matches ClickHouse), junk is false
    assert(one("isIPv6String('127.0.0.1')") == false)
    assert(one("isIPv6String('hello')") == false)
    assert(one("isIPv6String('')") == false)
    assert(one("isIPv6String(CAST(NULL AS STRING))") == null)
  }

  test("IPv6 expressions stay codegen'd (no UDF boundary)") {
    val df = spark.sql(
      "SELECT IPv6NumToString(toIPv6(concat('::ffff:10.0.0.', CAST(id AS STRING)))) AS s " +
        "FROM range(0, 10)")
    assert(df.collect().map(_.getString(0)).toSeq ==
      (0 until 10).map(i => s"::ffff:10.0.0.$i"))
    // the `*(n)` prefix marks WholeStageCodegen stages; a codegen failure
    // in doGenCode would drop the star (interpreted fallback)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [IPv6NumToString("), plan)
  }
}
