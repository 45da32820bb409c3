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
  * loudly at every length-class boundary.
  *
  * r14 (VERDICT r13 #1) adds a cross-language tier: every family is
  * additionally pinned to the printed output of
  * `tools/cityhash102_ref.py`, an INDEPENDENT pure-Python derivation
  * of the same published definitions (plus hashlib for MD5 — a
  * genuinely third-party kernel). The container has no egress, so live
  * ClickHouse goldens remain unfetchable; two independent derivations
  * agreeing at every length class, integer width, fold and URL shape
  * is the strongest available external check, and it caught a real
  * transcription slip on first run (the Python had Wang's 64→64
  * schedule where CH's intHash32 uses the rotate 64→32). */
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

  test("sipHash64Keyed matches Guava's sipHash24 — third-party keyed sweep (r15 late)") {
    // Guava ships its own SipHash-2-4 (com.google.common.hash.SipHashFunction,
    // tested upstream against the reference implementation) — a genuinely
    // third-party kernel beyond the published-vector table above and the
    // Python twin derivation: random keys × random messages across every
    // length class, plus the zero key the SQL surface uses.
    import com.google.common.hash.Hashing
    val rnd = new scala.util.Random(0x51b)
    (0 until 300).foreach { i =>
      val k0 = rnd.nextLong(); val k1 = rnd.nextLong()
      val b = new Array[Byte](rnd.nextInt(200))
      rnd.nextBytes(b)
      assert(ChHash.sipHash64Keyed(k0, k1, b) ==
        Hashing.sipHash24(k0, k1).hashBytes(b).asLong(), s"iter $i len ${b.length}")
    }
    assert(ChHash.sipHash64("graft".getBytes("UTF-8")) ==
      Hashing.sipHash24(0L, 0L).hashBytes("graft".getBytes("UTF-8")).asLong())
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

  // ---- r14: cross-language independent derivation (VERDICT r13 #1).
  //      This container has no egress, so live-ClickHouse goldens can't
  //      be fetched; the strongest available external check is a
  //      SECOND, independent implementation in a different language:
  //      tools/cityhash102_ref.py, pure Python written directly from
  //      the published definitions (CityHash v1.0.2 layout, MurmurHash3
  //      fmix64, Thomas Wang's 64→32 rotate-mix, the SipHash-2-4 paper,
  //      and hashlib — a genuinely third-party MD5 — for halfMD5).
  //      Every value below is that script's printed output, pinned
  //      verbatim. Agreement between two independent derivations
  //      catches translation bugs (byte order, signedness, rotation
  //      direction, length-class boundaries) that same-source
  //      structural goldens cannot. cityHash64('') doubles as a real
  //      ClickHouse golden: SELECT cityHash64('') prints
  //      11160318154034397263 (the k2 constant) on CH, which pins the
  //      family's empty-input anchor to the genuine engine. ----

  private def U(dec: String) = new BigInteger(dec)
  private def asU(h: Long) =
    new BigInteger(java.lang.Long.toUnsignedString(h))

  private val CrossLangStrings = Seq(
    "", "a", "ab", "abc", "abcd", "hello", "12345678", "123456789",
    "0123456789abcdef", "0123456789abcdefg",
    "0123456789abcdef0123456789abcdef",
    "0123456789abcdef0123456789abcdefg",
    "0123456789abcdef0123456789abcdef0123456789abcdef0123456789abcdef",
    "0123456789abcdef0123456789abcdef0123456789abcdef0123456789abcdefg",
    "x" * 129,
    "The quick brown fox jumps over the lazy dog")

  test("cityHash64 agrees with the independent Python derivation (every length class)") {
    val want = Seq(
      "11160318154034397263", "2603192927274642682", "1725057946192985918",
      "4220206313085259313", "17823623939509273229", "2578220239953316063",
      "7177601938557627951", "12390271160407166709", "692747204941329175",
      "792568009951096890", "1759797222395115254", "4759647983374658989",
      "2761429772394894929", "3007465168035330452", "2138420318052850041",
      "16697807905646383735")
    CrossLangStrings.zip(want).foreach { case (s, w) =>
      assert(asU(ChHash.cityHash64(s.getBytes("UTF-8"))) == U(w),
        s"cityHash64 len=${s.length}")
    }
  }

  test("sipHash64 (zero key) agrees with the independent Python derivation") {
    val want = Seq(
      "2202906307356721367", "10863254463029944905", "16456794104814867134",
      "4596069200710135518", "9849111927117796634", "10142490492830962361",
      "6766637294834280856", "620596589959453183", "10719539101438027700",
      "6291727573249898517", "14907405626867982925", "10451699801303421073",
      "10142961681096493728", "15284486219392724713", "3211001499184910444",
      "6413216055727023117")
    CrossLangStrings.zip(want).foreach { case (s, w) =>
      assert(asU(ChHash.sipHash64(s.getBytes("UTF-8"))) == U(w),
        s"sipHash64 len=${s.length}")
    }
  }

  // ---- r15: the 128-bit pair, closing the sipHash128 hold ----

  test("sipHash128Reference matches the paper reference's published 128-bit vectors") {
    // vectors_sip128 from the reference siphash.c's test suite: key =
    // 000102…0f, message n = first n bytes of 00, 01, 02, … — a TRUE
    // third-party pin for the paper variant, same key/message
    // convention as the pinned 64-bit vectors above (the Python net's
    // keyed transcription reproduced all four independently).
    val k0 = 0x0706050403020100L
    val k1 = 0x0f0e0d0c0b0a0908L
    val expected = Seq(
      "a3817f04ba25a8e66df67214c7550293",
      "da87c1d86b99af44347659119b22fc45",
      "8177228da4a45dc7fca38bdef60affe4",
      "9c70b60c5267a94e5f33b6b02985ed51")
    expected.zipWithIndex.foreach { case (hex, n) =>
      val msg = Array.tabulate[Byte](n)(_.toByte)
      val got = ChHash.hexLower(ChHash.sipHash128Keyed(k0, k1, msg, ref = true))
      assert(got == hex, s"sip128 ref vector $n")
    }
  }

  test("sipHash128 / sipHash128Reference agree with the independent Python derivation") {
    // zero-key values from tools/cityhash102_ref.py's siphash128
    // printer (CH get128 fold | paper variant), every length class
    val want = Seq(
      ("32b5c1db56a683e9e5b5b6a8cbed11f7", "5049d74780a3e07d4202ab47d4cef2f4"),
      ("71315e763ccb60893893cdbb5cc3a21f", "ffcc4e749c37a0bee6c404890ecd7325"),
      ("2f06b32389c5fd4e919488c482829faa", "b1d648fe666a7184b4e206d2e6f1c948"),
      ("b6b415a2da966b6c685a65e54c12a353", "6c95dec302962fa8ca5e69c1d5d15478"),
      ("6bc413d2257779257191f8ba3864d6ad", "2e19dfb914d6e3180572463f6f33d7f2"),
      ("54f0c4900581e097eda2332258dc211b", "7eba74f2264d88eff5cde46b5643e6c0"),
      ("d13ee228fbdfef7449d763923f330829", "18fffdce1b2379e93644ff5b0d68b7f1"),
      ("b777323f70d82e8e486e68423f15b286", "bb762c2bd72bcc1ebad9734df0272e2a"),
      ("9a9fb1d50db506452e38ae7c09c1c5d1", "f7b74fb64f39b8ec1f3a905b2189f0d6"),
      ("67230a80aeed6da2721b1d134a593df5", "cb44af2831b52be36387582193e8e727"),
      ("bd7c84dfb8c33cb9f05ea48fd77ddd77", "fb566c87f9cb795cde62f7e6a4405c44"),
      ("6dd1026e3ebc7952fcc1b46da65972c3", "e7fb3955370ee252f38613e1516f70f9"),
      ("4ea70a4377b2a1e9ee6d2d879fbb6265", "35d70b1e89bd05ccfd682a5cb94e826a"),
      ("3e07b68b79e8e8ebd7a9f7ea458ff53f", "98e1a0ab247c1a28ec3772c5230cf06a"),
      ("93217b42ad6ee6dcfff1529674aa69f0", "253868c2e6cc837e764fbf0f4267d30f"),
      ("85e0b8a437a3177f8804c88131f11726", "df8c5ce876c57f25c03f1bb5df591ab2"))
    def hex(b: Array[Byte]) = ChHash.hexLower(b)
    CrossLangStrings.zip(want).foreach { case (s, (ch, ref)) =>
      assert(hex(ChHash.sipHash128(s.getBytes("UTF-8"), ref = false)) == ch,
        s"sipHash128 len=${s.length}")
      assert(hex(ChHash.sipHash128(s.getBytes("UTF-8"), ref = true)) == ref,
        s"sipHash128Reference len=${s.length}")
    }
  }

  test("sipHash128 SQL surface: lowercase hex, multi-arg fold, int widths") {
    // zero-key folds + little-endian integer layouts from the Python
    // printer; the SQL face returns LOWERCASE hex text (convention
    // documented at the builder — CH's hex() of its FixedString(16) is
    // the uppercase spelling)
    assert(one("sipHash128('hello')") == "54f0c4900581e097eda2332258dc211b")
    assert(one("sipHash128Reference('hello')") == "7eba74f2264d88eff5cde46b5643e6c0")
    assert(one("sipHash128('a', 'b')") == "7b64e9f103295c192f07a59fca5d7252")
    assert(one("sipHash128('hello', 'world')") == "37948cb82a70bc999926b43c6307af62")
    assert(one("sipHash128Reference('hello', 'world')") ==
      "a18357347785f657d6b8e57f10655c11")
    assert(one("sipHash128(CAST(5 AS BIGINT))") == "8a4b5acdf0d1108c8e69c1ba01398844")
    assert(one("sipHash128(CAST(5 AS INT))") == "31a2c398ad5ad08a3c90a13e0128600d")
    assert(one("sipHash128(CAST(NULL AS STRING))") == null)
    assert(one("upper(sipHash128('hello'))") == "54F0C4900581E097EDA2332258DC211B")
  }

  test("halfMD5 agrees with Python hashlib (true third-party MD5) on long inputs") {
    // the RFC 1321 suite above pins the short shapes; these extend the
    // external check across the block boundaries (64/65/129 bytes)
    val want = Seq(
      "15284527576400310788", "919145239626757800", "1765116674205471180",
      "10376663631224000432", "16356072519128051347", "6719722671305337462",
      "2726185009641308170", "2736472872288208184", "4625952789015777571",
      "5052779176427519754", "9590042233359327282", "4569730421919508527",
      "18318989574081841586", "17743432916874495837", "4118124170326048963",
      "11389741571808933506")
    CrossLangStrings.zip(want).foreach { case (s, w) =>
      assert(asU(ChHash.halfMD5(s.getBytes("UTF-8"))) == U(w),
        s"halfMD5 len=${s.length}")
    }
  }

  test("intHash64/intHash32 agree with the independent Python derivation") {
    // (the first Python draft transcribed Wang's 64→64 schedule for
    // intHash32 and disagreed at every input — the net catching a real
    // transcription slip; see the note in tools/cityhash102_ref.py)
    val cases = Seq(
      (0L, "4761183170873013810", 4249604106L),
      (1L, "10577349846663553072", 1343103100L),
      (2L, "18198135717204167749", 1996614413L),
      (42L, "11490350930367293593", 1228623923L),
      (255L, "8055013221972926055", 4243176437L),
      (256L, "4401603007587918817", 4089823266L),
      (0xDEADBEEFL, "5692207831998274174", 1432217248L),
      (2147483648L, "6300953685602397207", 3805774551L),
      (Long.MaxValue, "16054072765933828340", 2112611299L),
      (Long.MinValue, "7378616448805205431", 3930999127L), // 2^63 as u64
      (-1L, "14600443904207254319", 3545659993L))          // 2^64-1
    cases.foreach { case (x, i64, i32) =>
      assert(asU(ChHash.intHash64(x)) == U(i64), s"intHash64($x)")
      assert(ChHash.intHash32(x) == i32, s"intHash32($x)")
    }
  }

  test("multi-arg folds and URLHash agree with the independent Python derivation") {
    assert(udec("cityHash64('a', 'b')") == U("7468329322676821011"))
    assert(udec("cityHash64('hello', 'world')") == U("966684281678495360"))
    assert(udec("cityHash64('', 'x')") == U("8791309753493997805"))
    assert(udec("URLHash('http://x.io/a/')") == U("5587423116265031016"))
    assert(udec("URLHash('http://x.io/a')") == U("5587423116265031016"))
    assert(udec("URLHash('https://example.com/path/q/')") ==
      U("12754603280090290098"))
    // integer arguments: the little-endian fixed-width layouts
    assert(asU(ChHash.cityHash64(ChHash.leBytes(5L, 8))) ==
      U("1111307707891106543"))
    assert(asU(ChHash.cityHash64(ChHash.leBytes(5L, 4))) ==
      U("2281002389597347307"))
    assert(asU(ChHash.cityHash64(ChHash.leBytes(255L, 8))) ==
      U("14090926325917266726"))
    assert(asU(ChHash.cityHash64(ChHash.leBytes(1L << 40, 8))) ==
      U("5182794050848961668"))
  }

  // ---- r15 late: farmFingerprint64 vs a TRUE independent golden ----
  //      Guava (on the Spark classpath) ships Google's own Java port
  //      of FarmHash Fingerprint64 (= farmhashna::Hash64, the family's
  //      documented never-changing portable member), itself tested
  //      against the C++ reference — a genuinely third-party kernel,
  //      stronger than the twin-derivation tier the rest of the family
  //      rests on. ClickHouse's farmFingerprint64 applies exactly this
  //      function to each argument's memory representation.

  private def guavaFp64(b: Array[Byte]): Long =
    com.google.common.hash.Hashing.farmHashFingerprint64().hashBytes(b).asLong()

  test("farmFingerprint64 matches Guava's golden at every length-class boundary") {
    // 0..16 (three small layouts), 17..32, 33..64, then the >64 loop at
    // 1 and 2+ iterations with every remainder shape that matters
    val lens = Seq(0, 1, 2, 3, 4, 5, 7, 8, 9, 15, 16, 17, 31, 32, 33,
      63, 64, 65, 96, 127, 128, 129, 191, 192, 193, 255, 256, 1024, 1000)
    lens.foreach { l =>
      val b = Array.tabulate[Byte](l)(i => ('a' + (i % 26)).toByte)
      assert(ChHash.farmFingerprint64(b) == guavaFp64(b), s"len $l")
    }
  }

  test("farmFingerprint64 matches Guava on a random-bytes property sweep") {
    val rnd = new scala.util.Random(0xfa53)
    (0 until 400).foreach { i =>
      val len = rnd.nextInt(600)
      val b = new Array[Byte](len)
      rnd.nextBytes(b)
      assert(ChHash.farmFingerprint64(b) == guavaFp64(b),
        s"iter $i len $len")
    }
    // and a few long ones across multi-block loops
    Seq(4096, 65536, 100003).foreach { len =>
      val b = new Array[Byte](len)
      rnd.nextBytes(b)
      assert(ChHash.farmFingerprint64(b) == guavaFp64(b), s"len $len")
    }
  }

  test("farmFingerprint64 SQL surface: UInt64 Decimal, widths, arity, codegen") {
    val viaKernel = ChHash.farmFingerprint64("graft".getBytes("UTF-8"))
    assert(udec("farmFingerprint64('graft')") == asU(viaKernel))
    assert(one("farmFingerprint64(CAST(NULL AS STRING))") == null)
    // integer args hash the static-width little-endian layout (family
    // convention; a BIGINT and an INT of the same value differ)
    assert(udec("farmFingerprint64(CAST(5 AS BIGINT))") ==
      asU(guavaFp64(ChHash.leBytes(5L, 8))))
    assert(udec("farmFingerprint64(CAST(5 AS INT))") ==
      asU(guavaFp64(ChHash.leBytes(5L, 4))))
    // the multi-argument fold convention has no verifiable golden in
    // this sandbox — loud error, not a silent guess
    val e = intercept[Exception] {
      spark.sql("SELECT farmFingerprint64('a', 'b')").collect()
    }
    assert(e.getMessage.contains("single-argument"), e.getMessage)
    // stays codegen'd
    val df = spark.sql(
      "SELECT farmFingerprint64(CAST(id AS STRING)) AS f FROM range(0, 10)")
    assert(df.collect().length == 10)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [toUInt64Bits(farmFingerprint64("), plan)
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
