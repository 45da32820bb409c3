package graft.functions

import graft.SparkSpec
import java.math.BigInteger

/** Bit-exactness pins for the ClickHouse hash family (VERDICT r12 #3).
  *
  * What is pinned against PUBLISHED vectors:
  *  - SipHash-2-4: the reference implementation's test-vector table
  *    (key 000102…0f over messages 00,01,…) including the worked
  *    example from the SipHash paper's appendix (15-byte message →
  *    a129ca6149be45e5).
  *  - halfMD5: RFC 1321's published MD5 test-suite digests, read as
  *    ClickHouse reads them (first 8 bytes, big-endian).
  *  - cityHash64(''): CityHash64 of empty input is the k2 constant by
  *    construction (9ae16a3b2f90404f).
  *  - intHash64's fixed point: fmix64(0) = 0, so the input equal to
  *    IntHash64Impl's salt must hash to exactly 0.
  *
  * The remaining CityHash64 values are structural goldens computed from
  * this implementation of the published v1.0.2 layout, pinned so any
  * later refactor that changes a single constant or rotation fails
  * loudly at every length-class boundary. */
class ChHashSpec extends SparkSpec {

  private def one(sql: String): Any =
    spark.sql(s"SELECT $sql AS v").collect().head.get(0)
  private def udec(sql: String): BigInteger =
    one(sql).asInstanceOf[java.math.BigDecimal].toBigIntegerExact

  private def u64(hex: String): BigInteger = new BigInteger(hex, 16)

  // ---- SipHash-2-4 kernel vs the reference implementation's vectors ----

  test("sipHash64Keyed matches the published SipHash-2-4 vectors") {
    // key = 000102030405060708090a0b0c0d0e0f (little-endian halves),
    // message n = first n bytes of 00, 01, 02, …
    val k0 = 0x0706050403020100L
    val k1 = 0x0f0e0d0c0b0a0908L
    val expected = Seq(
      "726fdb47dd0e0e31", "74f839c593dc67fd", "0d6c8009d9a94f5a",
      "85676696d7fb7e2d", "cf2794e0277187b7", "18765564cd99a68d",
      "cbc9466e58fee3ce", "ab0200f58b01d137", "93f5f5799a932462",
      "9e0082df0ba9e4b0", "7a5dbbc594ddb9f3", "f4b32f46226bada7",
      "751e8fbc860ee5fb", "14ea5627c0843d90", "f723ca908e7af2ee",
      "a129ca6149be45e5")
    expected.zipWithIndex.foreach { case (hex, n) =>
      val msg = Array.tabulate[Byte](n)(_.toByte)
      val got = ChHash.sipHash64Keyed(k0, k1, msg)
      assert(got == java.lang.Long.parseUnsignedLong(hex, 16),
        s"vector $n: got ${java.lang.Long.toHexString(got)}, want $hex")
    }
  }

  test("sipHash64 SQL surface: zero key, UInt64 as Decimal(20,0)") {
    // zero-key values derive from the pinned keyed kernel
    val viaKernel = ChHash.sipHash64("graft".getBytes("UTF-8"))
    assert(udec("sipHash64('graft')") ==
      new BigInteger(java.lang.Long.toUnsignedString(viaKernel)))
    assert(one("sipHash64(CAST(NULL AS STRING))") == null)
  }

  // ---- halfMD5 vs RFC 1321's test suite ----

  test("halfMD5 reads the first 8 MD5 bytes big-endian (RFC 1321 suite)") {
    // MD5('')    = d41d8cd98f00b204e9800998ecf8427e
    // MD5('abc') = 900150983cd24fb0d6963f7d28e17f72
    // MD5('message digest') = f96b697d7cb7938d525a2f31aaf161d0
    assert(udec("halfMD5('')") == u64("d41d8cd98f00b204"))
    assert(udec("halfMD5('abc')") == u64("900150983cd24fb0"))
    assert(udec("halfMD5('message digest')") == u64("f96b697d7cb7938d"))
  }

  // ---- CityHash64 v1.0.2 ----

  test("cityHash64('') is the k2 constant (derivable vector)") {
    assert(udec("cityHash64('')") == u64("9ae16a3b2f90404f"))
  }

  test("cityHash64 structural goldens across every length-class boundary") {
    // lengths 1, 3 (len<4), 4, 8 (4..8), 9, 16 (9..16), 17, 32, 33, 64,
    // 65, 128, 129 (>64 loop, 1 and 2 iterations + remainder)
    def h(len: Int): Long =
      ChHash.cityHash64(Array.tabulate[Byte](len)(i => ('a' + (i % 26)).toByte))
    val lens = Seq(1, 3, 4, 8, 9, 16, 17, 32, 33, 64, 65, 128, 129)
    val got = lens.map(l => l -> java.lang.Long.toHexString(h(l))).toMap
    // golden snapshot of this implementation (v1.0.2 layout) — any
    // change to a constant, rotation, or length-class branch trips this
    val golden = ChHashSpec.CityGoldens
    lens.foreach { l =>
      assert(got(l) == golden(l), s"len $l: ${got(l)} != ${golden(l)}")
    }
    // distinctness sanity: no two length classes collide
    assert(got.values.toSet.size == lens.size)
  }

  test("cityHash64 avalanche sanity: one flipped byte changes the hash") {
    val base = Array.tabulate[Byte](100)(i => (i % 7).toByte)
    val mod = base.clone(); mod(50) = (mod(50) ^ 1).toByte
    assert(ChHash.cityHash64(base) != ChHash.cityHash64(mod))
  }

  // ---- integer mixers ----

  test("intHash64: fmix64 fixed point — the salt input hashes to zero") {
    // intHash64(x) = fmix64(x ^ 0x4CF2D2BAAE6DA887); fmix64(0) = 0
    assert(udec(s"intHash64(${0x4CF2D2BAAE6DA887L}L)") == BigInteger.ZERO)
    // and a nonzero golden for drift detection
    assert(udec("intHash64(42)") == new BigInteger(
      java.lang.Long.toUnsignedString(ChHash.intHash64(42L))))
  }

  test("intHash32 returns the UInt32 range as a plain long") {
    val v = one("intHash32(42)").asInstanceOf[Long]
    assert(v >= 0L && v <= 0xffffffffL)
    assert(v == ChHash.intHash32(42L))
    // distinct across adjacent keys (mix sanity)
    assert(ChHash.intHash32(1L) != ChHash.intHash32(2L))
  }

  // ---- surface semantics ----

  test("multi-argument chaining folds with the family combiner") {
    val a = ChHash.cityUtf8(org.apache.spark.unsafe.types.UTF8String.fromString("a"))
    val b = ChHash.cityUtf8(org.apache.spark.unsafe.types.UTF8String.fromString("b"))
    assert(udec("cityHash64('a', 'b')") == new BigInteger(
      java.lang.Long.toUnsignedString(ChHash.hash128to64(a, b))))
    val sa = ChHash.sipUtf8(org.apache.spark.unsafe.types.UTF8String.fromString("a"))
    val sb = ChHash.sipUtf8(org.apache.spark.unsafe.types.UTF8String.fromString("b"))
    assert(udec("sipHash64('a', 'b')") == new BigInteger(
      java.lang.Long.toUnsignedString(ChHash.sipCombine(sa, sb))))
  }

  test("integer arguments hash their static-width little-endian layout") {
    // an 8-byte BIGINT and the same value as a 4-byte INT hash
    // DIFFERENTLY (ClickHouse hashes the in-memory representation)
    val asLong = udec("cityHash64(CAST(5 AS BIGINT))")
    val asInt = udec("cityHash64(CAST(5 AS INT))")
    assert(asLong != asInt)
    assert(asLong == new BigInteger(
      java.lang.Long.toUnsignedString(ChHash.cityHash64(ChHash.leBytes(5L, 8)))))
    assert(asInt == new BigInteger(
      java.lang.Long.toUnsignedString(ChHash.cityHash64(ChHash.leBytes(5L, 4)))))
  }

  test("URLHash drops exactly ONE trailing /, ? or # before cityHash64") {
    assert(udec("URLHash('http://x.io/a/')") == udec("cityHash64('http://x.io/a')"))
    assert(udec("URLHash('http://x.io/a')") == udec("cityHash64('http://x.io/a')"))
    // two trailing slashes: only one comes off
    assert(udec("URLHash('http://x.io/a//')") == udec("cityHash64('http://x.io/a/')"))
    assert(udec("URLHash('http://x.io/a#')") == udec("cityHash64('http://x.io/a')"))
  }

  test("% N sampling stays in ClickHouse arithmetic (never negative)") {
    // a key whose 64-bit pattern is negative as a signed long
    val r = spark.sql(
      "SELECT cityHash64(CAST(id AS STRING)) % 10 AS b FROM range(0, 200)")
      .collect().map(_.getDecimal(0).longValueExact())
    assert(r.forall(b => b >= 0 && b <= 9))
    // and all ten buckets appear over 200 keys (distribution sanity)
    assert(r.toSet.size == 10)
  }

  test("hash expressions stay codegen'd (no UDF boundary)") {
    val df = spark.sql(
      "SELECT cityHash64(CAST(id AS STRING)) AS c, sipHash64(CAST(id AS STRING)) AS s, " +
        "intHash64(id) AS i FROM range(0, 10)")
    assert(df.collect().length == 10)
    // the `*(n)` prefix marks WholeStageCodegen stages; a codegen failure
    // in doGenCode would drop the star (interpreted fallback)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [toUInt64Bits(cityHash64("), plan)
  }
}

object ChHashSpec {
  /** Structural goldens for cityHash64 over 'abcdef…' prefixes — see the
    * length-class test above. */
  val CityGoldens: Map[Int, String] = Map(
    1 -> "2420662cd003acfa", 3 -> "3a912f483a4ece31",
    4 -> "f75a3b8a1499428d", 8 -> "4382a8d0fe8edb17",
    9 -> "66c7fa4eb3fab8d1", 16 -> "b7c60922803552c1",
    17 -> "34bb4fe133a33e6", 32 -> "3d15a3afcb91adca",
    33 -> "555864a17c9d14d1", 64 -> "96da9029aac365a3",
    65 -> "ba11b28d3940bf8e", 128 -> "b5d4330ef7830046",
    129 -> "78f7887d19846ebf")
}
