package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Cast, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** ClickHouse hash-function family, bit-exact (VERDICT r12 task 3).
  *
  * The reference's /query surface exposes ClickHouse's hash functions
  * through the chsql extension; these names sat on the dialect GAP list
  * through r12 because mapping them to a same-named Spark hash (xxhash64,
  * murmur) would return silently DIFFERENT values — `cityHash64(k) % 10`
  * sampling is the single most common still-unmapped idiom a migrating
  * ClickHouse user types, and it must produce the same buckets it did on
  * ClickHouse. So this file implements the published layouts themselves:
  *
  *  - [[ChHash.sipHash64]]: SipHash-2-4 (Aumasson & Bernstein 2012) with
  *    the zero key, which is what ClickHouse's `sipHash64` computes for a
  *    string argument. Pinned in ChHashSpec to the reference
  *    implementation's published test vectors (key 000102…0f), including
  *    the worked example from the paper's appendix.
  *  - [[ChHash.cityHash64]]: CityHash64 v1.0.2 (Pike & Alakuijala,
  *    Google, MIT-licensed) — ClickHouse deliberately pins the OLD 1.0.2
  *    layout (their contrib/cityhash102) because Google changed the
  *    algorithm in 1.1; the 1.0.2-only pieces here are the k3 constant,
  *    RotateByAtLeast1, and the 0-to-16/17-to-32/33-to-64 small-string
  *    layouts. Pinned to the derivable empty-input constant (k2) — the
  *    value real ClickHouse prints for cityHash64('') — plus structural
  *    goldens across every length-class boundary, and since r14 to an
  *    INDEPENDENT cross-language derivation (tools/cityhash102_ref.py;
  *    ChHashSpec's cross-language tier) covering every family, fold,
  *    width and URL shape.
  *  - [[ChHash.sipHash128]] (r15): both 128-bit output conventions —
  *    ClickHouse's `sipHash128` (the sipHash64 state machine with the
  *    final xor-fold stopped at 128 bits, public SipHash.h get128) and
  *    the paper's outlen=16 variant (`sipHash128Reference`), surfaced
  *    as lowercase hex text (convention documented at the builder).
  *    The ref variant is pinned to the reference implementation's
  *    PUBLISHED 128-bit vectors (key 000102…0f); both are pinned to
  *    the independent Python derivation.
  *  - [[ChHash.halfMD5]]: first 8 bytes of MD5 read big-endian
  *    (ClickHouse HalfMD5Impl does bswap64 of the first MD5 word).
  *    Pinned against RFC 1321's published MD5 test-suite digests.
  *  - [[ChHash.intHash64]] / [[ChHash.intHash32]]: ClickHouse's
  *    integer mixers — MurmurHash3's fmix64 applied to `x ^`
  *    0x4CF2D2BAAE6DA887 (IntHash32/64Impl in the public
  *    Functions/FunctionsHashing.h), and the Thomas-Wang-derived 64→32
  *    rotate-mix with salt 0x75D9543DE018BF45 (Common/HashTable/Hash.h).
  *  - `URLHash(url)`: cityHash64 of the url minus ONE trailing `/`,
  *    `?` or `#` (ClickHouse URLHashImpl) — composed in the builder as
  *    `cityHash64(regexp_replace(url, '[/?#]$', ''))`.
  *
  * Return-type convention: ClickHouse returns UInt64; Spark has no
  * unsigned 64-bit type, so the 64-bit families return Decimal(20,0)
  * carrying the exact unsigned value — the repo-wide UInt64 convention
  * (toUInt64 does the same), and the one that keeps `% N` sampling
  * arithmetic identical to ClickHouse (a signed-Long bit pattern would
  * flip `hash % 10` negative for half of all keys). intHash32 returns
  * the UInt32 as a plain LongType (the toUInt32 convention).
  *
  * Multi-argument calls combine per ClickHouse's documented chaining:
  * cityHash64 folds with Hash128to64(h1, h2); sipHash64/halfMD5 fold by
  * re-hashing the 16-byte little-endian (h1, h2) buffer. Integer
  * arguments hash their little-endian fixed-width layout at the column's
  * static width (ClickHouse hashes the in-memory representation, so a
  * 4-byte INT and an 8-byte BIGINT of the same value hash differently
  * there too).
  *
  * Everything is a codegen'd Catalyst expression calling the shared
  * static kernels below — no UDF boundary, stays inside whole-stage
  * codegen like the rest of the compat surface.
  */
object ChHash {
  // ---- shared byte-order helpers (uint64 ops = Java Long +,*,^,<<,>>>) --

  @inline private def rotr(v: Long, shift: Int): Long =
    if (shift == 0) v else (v >>> shift) | (v << (64 - shift))
  @inline private def rotl(v: Long, shift: Int): Long =
    (v << shift) | (v >>> (64 - shift))

  @inline private def le64(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) | ((b(i + 2) & 0xffL) << 16) |
      ((b(i + 3) & 0xffL) << 24) | ((b(i + 4) & 0xffL) << 32) |
      ((b(i + 5) & 0xffL) << 40) | ((b(i + 6) & 0xffL) << 48) |
      ((b(i + 7) & 0xffL) << 56)

  @inline private def le32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) | ((b(i + 2) & 0xffL) << 16) |
      ((b(i + 3) & 0xffL) << 24)

  /** Little-endian fixed-width layout of an integer — what ClickHouse
    * hashes for a numeric argument (x86 memory representation). */
  def leBytes(v: Long, width: Int): Array[Byte] = {
    val out = new Array[Byte](width)
    var i = 0
    while (i < width) { out(i) = ((v >>> (8 * i)) & 0xff).toByte; i += 1 }
    out
  }

  // ---- SipHash-2-4 ------------------------------------------------------

  /** SipHash-2-4 with an explicit 128-bit key (k0 = little-endian first
    * key half, as in the reference implementation). */
  def sipHash64Keyed(k0: Long, k1: Long, data: Array[Byte]): Long = {
    var v0 = 0x736f6d6570736575L ^ k0
    var v1 = 0x646f72616e646f6dL ^ k1
    var v2 = 0x6c7967656e657261L ^ k0
    var v3 = 0x7465646279746573L ^ k1

    // one SipRound, inlined twice per message word (the "2" of 2-4)
    @inline def round(): Unit = {
      v0 += v1; v1 = rotl(v1, 13); v1 ^= v0; v0 = rotl(v0, 32)
      v2 += v3; v3 = rotl(v3, 16); v3 ^= v2
      v0 += v3; v3 = rotl(v3, 21); v3 ^= v0
      v2 += v1; v1 = rotl(v1, 17); v1 ^= v2; v2 = rotl(v2, 32)
    }

    val len = data.length
    val full = len & ~7
    var i = 0
    while (i < full) {
      val m = le64(data, i)
      v3 ^= m; round(); round(); v0 ^= m
      i += 8
    }
    // final word: remaining bytes little-endian, length (mod 256) on top
    var b = len.toLong << 56
    var j = len - 1
    while (j >= full) { b |= (data(j) & 0xffL) << (8 * (j - full)); j -= 1 }
    v3 ^= b; round(); round(); v0 ^= b
    v2 ^= 0xff
    round(); round(); round(); round()
    v0 ^ v1 ^ v2 ^ v3
  }

  /** ClickHouse `sipHash64(string)`: SipHash-2-4 with the zero key. */
  def sipHash64(data: Array[Byte]): Long = sipHash64Keyed(0L, 0L, data)

  // ---- SipHash 128-bit outputs (r15, closing the sipHash128 hold) -------

  /** The two 128-bit output conventions, zero key, as 16 little-endian
    * bytes:
    *
    *  - `ref = false`: ClickHouse's `sipHash128` — the SAME SipHash-2-4
    *    state machine as [[sipHash64]] (normal init, `v2 ^= 0xff`
    *    finalization) but the final xor-fold stops at 128 bits:
    *    out = LE(v0^v1) || LE(v2^v3). This is ClickHouse's public
    *    SipHash.h `get128`; their docs call out that it differs from
    *    the paper's 128-bit mode.
    *  - `ref = true`: the PAPER's 128-bit variant (Aumasson & Bernstein
    *    2012 reference siphash.c with outlen=16) — `v1 ^= 0xee` at init,
    *    `v2 ^= 0xee` at finalization, first word b0 = v0^v1^v2^v3, then
    *    `v1 ^= 0xdd` + 4 more rounds for b1. ClickHouse exposes this as
    *    `sipHash128Reference`.
    *
    * Both are pinned in ChHashSpec against the independent pure-Python
    * derivation (tools/cityhash102_ref.py — the r14 cross-language
    * net); like cityHash64, live-ClickHouse goldens are impossible
    * without egress and that residual is documented there. */
  def sipHash128(data: Array[Byte], ref: Boolean): Array[Byte] =
    sipHash128Keyed(0L, 0L, data, ref)

  /** Keyed form — the key slot exists so the paper's PUBLISHED 128-bit
    * test vectors (key 000102…0f) can pin the ref variant directly.
    *
    * The SipHash-2-4 state machine here deliberately DUPLICATES
    * [[sipHash64Keyed]]'s (round function, block loop, tail-word
    * build): delegating one to the other would put a per-call 16-byte
    * allocation or a boxed state tuple on the 64-bit hot path. Both
    * copies are frozen, vector-pinned spec code (ChHashSpec pins each
    * against published vectors AND the independent Python derivation)
    * — a change to one must land in both, and the pins catch a
    * one-sided edit. */
  def sipHash128Keyed(k0: Long, k1: Long, data: Array[Byte],
                      ref: Boolean): Array[Byte] = {
    var v0 = 0x736f6d6570736575L ^ k0
    var v1 = (0x646f72616e646f6dL ^ k1) ^ (if (ref) 0xeeL else 0L)
    var v2 = 0x6c7967656e657261L ^ k0
    var v3 = 0x7465646279746573L ^ k1

    @inline def round(): Unit = {
      v0 += v1; v1 = rotl(v1, 13); v1 ^= v0; v0 = rotl(v0, 32)
      v2 += v3; v3 = rotl(v3, 16); v3 ^= v2
      v0 += v3; v3 = rotl(v3, 21); v3 ^= v0
      v2 += v1; v1 = rotl(v1, 17); v1 ^= v2; v2 = rotl(v2, 32)
    }

    val len = data.length
    val full = len & ~7
    var i = 0
    while (i < full) {
      val m = le64(data, i)
      v3 ^= m; round(); round(); v0 ^= m
      i += 8
    }
    var b = len.toLong << 56
    var j = len - 1
    while (j >= full) { b |= (data(j) & 0xffL) << (8 * (j - full)); j -= 1 }
    v3 ^= b; round(); round(); v0 ^= b
    if (ref) {
      v2 ^= 0xee
      round(); round(); round(); round()
      val b0 = v0 ^ v1 ^ v2 ^ v3
      v1 ^= 0xdd
      round(); round(); round(); round()
      le128(b0, v0 ^ v1 ^ v2 ^ v3)
    } else {
      v2 ^= 0xff
      round(); round(); round(); round()
      le128(v0 ^ v1, v2 ^ v3)
    }
  }

  private def le128(h0: Long, h1: Long): Array[Byte] = {
    val out = new Array[Byte](16)
    var i = 0
    while (i < 8) {
      out(i) = ((h0 >>> (8 * i)) & 0xff).toByte
      out(8 + i) = ((h1 >>> (8 * i)) & 0xff).toByte
      i += 1
    }
    out
  }

  /** Multi-argument chaining for the 128-bit family: re-hash the
    * 32-byte concatenation of the two 16-byte hashes (ClickHouse's
    * generic combineHashesFunc over UInt128 applies the hash to the
    * concatenated in-memory representations — the 128-bit analog of
    * [[sipCombine]]'s 16-byte fold). */
  def sip128Combine(a: Array[Byte], b: Array[Byte], ref: Boolean): Array[Byte] = {
    val buf = new Array[Byte](32)
    System.arraycopy(a, 0, buf, 0, 16)
    System.arraycopy(b, 0, buf, 16, 16)
    sipHash128(buf, ref)
  }

  def sip128Utf8(s: UTF8String, ref: Boolean): Array[Byte] =
    sipHash128(s.getBytes, ref)
  def sip128Long(v: Long, width: Int, ref: Boolean): Array[Byte] =
    sipHash128(leBytes(v, width), ref)

  /** The ONE lowercase-hex rendering of a hash's bytes — the surface
    * convention for the 128-bit family; the q23 oracle renderer and
    * the spec pins all spell it through here. */
  def hexLower(b: Array[Byte]): String =
    b.map(x => f"${x & 0xff}%02x").mkString

  /** ClickHouse's multi-argument chaining: re-hash the 16-byte
    * little-endian (h1, h2) buffer (SipHash64Impl::combineHashes). */
  def sipCombine(h1: Long, h2: Long): Long = {
    val buf = new Array[Byte](16)
    var i = 0
    while (i < 8) {
      buf(i) = ((h1 >>> (8 * i)) & 0xff).toByte
      buf(8 + i) = ((h2 >>> (8 * i)) & 0xff).toByte
      i += 1
    }
    sipHash64(buf)
  }

  // ---- CityHash64 v1.0.2 -------------------------------------------------

  private val K0 = 0xc3a5c85c97cb3127L
  private val K1 = 0xb492b66fbe98f273L
  private val K2 = 0x9ae16a3b2f90404fL
  private val K3 = 0xc949d7c7509e6557L // v1.0.2 only; dropped in 1.1
  private val KMul = 0x9ddfea08eb382d69L

  @inline private def shiftMix(v: Long): Long = v ^ (v >>> 47)

  /** Hash128to64 — also ClickHouse's cityHash64 argument combiner
    * (u = low 64 bits, v = high). */
  def hash128to64(u: Long, v: Long): Long = {
    var a = (u ^ v) * KMul
    a ^= a >>> 47
    var b = (v ^ a) * KMul
    b ^= b >>> 47
    b *= KMul
    b
  }

  @inline private def hashLen16(u: Long, v: Long): Long = hash128to64(u, v)

  private def hashLen0to16(s: Array[Byte], off: Int, len: Int): Long = {
    if (len > 8) {
      val a = le64(s, off)
      val b = le64(s, off + len - 8)
      // RotateByAtLeast1: callers guarantee 9 <= shift <= 16
      hashLen16(a, rotr(b + len, len)) ^ b
    } else if (len >= 4) {
      val a = le32(s, off)
      hashLen16(len + (a << 3), le32(s, off + len - 4))
    } else if (len > 0) {
      val a = s(off) & 0xff
      val b = s(off + (len >> 1)) & 0xff
      val c = s(off + len - 1) & 0xff
      val y = (a + (b << 8)).toLong & 0xffffffffL
      val z = (len + (c << 2)).toLong & 0xffffffffL
      shiftMix(y * K2 ^ z * K3) * K2
    } else K2
  }

  private def hashLen17to32(s: Array[Byte], off: Int, len: Int): Long = {
    val a = le64(s, off) * K1
    val b = le64(s, off + 8)
    val c = le64(s, off + len - 8) * K2
    val d = le64(s, off + len - 16) * K0
    hashLen16(rotr(a - b, 43) + rotr(c, 30) + d,
      a + rotr(b ^ K3, 20) - c + len)
  }

  private def hashLen33to64(s: Array[Byte], off: Int, len: Int): Long = {
    var z = le64(s, off + 24)
    var a = le64(s, off) + (len + le64(s, off + len - 16)) * K0
    var b = rotr(a + z, 52)
    var c = rotr(a, 37)
    a += le64(s, off + 8)
    c += rotr(a, 7)
    a += le64(s, off + 16)
    val vf = a + z
    val vs = b + rotr(a, 31) + c
    a = le64(s, off + 16) + le64(s, off + len - 32)
    z = le64(s, off + len - 8)
    b = rotr(a + z, 52)
    c = rotr(a, 37)
    a += le64(s, off + len - 24)
    c += rotr(a, 7)
    a += le64(s, off + len - 16)
    val wf = a + z
    val ws = b + rotr(a, 31) + c
    val r = shiftMix((vf + ws) * K2 + (wf + vs) * K0)
    shiftMix(r * K0 + vs) * K2
  }

  // WeakHashLen32WithSeeds — returns (first, second) packed via an array
  // to avoid a tuple allocation per 64-byte block
  @inline private def weakHash(s: Array[Byte], off: Int, a0: Long, b0: Long,
                               out: Array[Long]): Unit = {
    val w = le64(s, off); val x = le64(s, off + 8)
    val y = le64(s, off + 16); val z = le64(s, off + 24)
    var a = a0 + w
    var b = rotr(b0 + a + z, 21)
    val c = a
    a += x
    a += y
    b += rotr(a, 44)
    out(0) = a + z
    out(1) = b + c
  }

  /** CityHash64 v1.0.2 over the whole array. */
  def cityHash64(data: Array[Byte]): Long = cityHash64(data, 0, data.length)

  def cityHash64(s: Array[Byte], off0: Int, len0: Int): Long = {
    var off = off0
    var len = len0
    if (len <= 32) {
      return if (len <= 16) hashLen0to16(s, off, len) else hashLen17to32(s, off, len)
    }
    if (len <= 64) return hashLen33to64(s, off, len)

    var x = le64(s, off)
    var y = le64(s, off + len - 16) ^ K1
    var z = le64(s, off + len - 56) ^ K0
    val v = new Array[Long](2)
    val w = new Array[Long](2)
    weakHash(s, off + len - 64, len.toLong, y, v)
    weakHash(s, off + len - 32, len.toLong * K1, K0, w)
    z += shiftMix(v(1)) * K1
    x = rotr(z + x, 39) * K1
    y = rotr(y, 33) * K1

    len = (len - 1) & ~63
    do {
      x = rotr(x + y + v(0) + le64(s, off + 16), 37) * K1
      y = rotr(y + v(1) + le64(s, off + 48), 42) * K1
      x ^= w(1)
      y ^= v(0)
      z = rotr(z ^ w(0), 33)
      val vs = v(1); val wf = w(0); val ws = w(1)
      weakHash(s, off, vs * K1, x + wf, v)
      weakHash(s, off + 32, z + ws, y, w)
      val t = z; z = x; x = t
      off += 64
      len -= 64
    } while (len != 0)
    hashLen16(hashLen16(v(0), w(0)) + shiftMix(y) * K1 + z,
      hashLen16(v(1), w(1)) + x)
  }

  // ---- FarmHash Fingerprint64 (farmhashna::Hash64) ------------------------

  /** Murmur-inspired 2-value mix with a length-dependent multiplier —
    * FarmHash's HashLen16(u, v, mul). The 1.1-lineage layouts below
    * thread `mul = k2 + len * 2` through this where the 1.0.2 layouts
    * above use the fixed-kMul [[hash128to64]]. */
  @inline private def farmMix(u: Long, v: Long, mul: Long): Long = {
    var a = (u ^ v) * mul
    a ^= a >>> 47
    var b = (v ^ a) * mul
    b ^= b >>> 47
    b * mul
  }

  private def farmLen0to16(s: Array[Byte], off: Int, len: Int): Long = {
    if (len >= 8) {
      val mul = K2 + len * 2L
      val a = le64(s, off) + K2
      val b = le64(s, off + len - 8)
      val c = rotr(b, 37) * mul + a
      val d = (rotr(a, 25) + b) * mul
      farmMix(c, d, mul)
    } else if (len >= 4) {
      val mul = K2 + len * 2L
      val a = le32(s, off)
      farmMix(len + (a << 3), le32(s, off + len - 4), mul)
    } else if (len > 0) {
      val a = s(off) & 0xff
      val b = s(off + (len >> 1)) & 0xff
      val c = s(off + len - 1) & 0xff
      val y = (a + (b << 8)).toLong & 0xffffffffL
      val z = (len + (c << 2)).toLong & 0xffffffffL
      shiftMix(y * K2 ^ z * K0) * K2
    } else K2
  }

  private def farmLen17to32(s: Array[Byte], off: Int, len: Int): Long = {
    val mul = K2 + len * 2L
    val a = le64(s, off) * K1
    val b = le64(s, off + 8)
    val c = le64(s, off + len - 8) * mul
    val d = le64(s, off + len - 16) * K2
    farmMix(rotr(a + b, 43) + rotr(c, 30) + d,
      a + rotr(b + K2, 18) + c, mul)
  }

  private def farmLen33to64(s: Array[Byte], off: Int, len: Int): Long = {
    val mul = K2 + len * 2L
    val a = le64(s, off) * K2
    val b = le64(s, off + 8)
    val c = le64(s, off + len - 8) * mul
    val d = le64(s, off + len - 16) * K2
    val y = rotr(a + b, 43) + rotr(c, 30) + d
    val z = farmMix(y, a + rotr(b + K2, 18) + c, mul)
    val e = le64(s, off + 16) * mul
    val f = le64(s, off + 24)
    val g = (y + le64(s, off + len - 32)) * mul
    val h = (z + le64(s, off + len - 24)) * mul
    // the second mix threads a (not k2 as in the other layouts) — the
    // slip the Guava golden caught on first run
    farmMix(rotr(e + f, 43) + rotr(g, 30) + h,
      e + rotr(f + a, 18) + g, mul)
  }

  /** FarmHash Fingerprint64 — the PORTABLE, documented-never-changing
    * member of Google's FarmHash family (farmhash.h Fingerprint64 =
    * farmhashna::Hash64; MIT), which is what ClickHouse's
    * `farmFingerprint64` applies to each argument's memory
    * representation. Shares k0/k1/k2, shiftMix and
    * WeakHashLen32WithSeeds with the CityHash lineage; the per-length
    * layouts differ from the 1.0.2 ones cityHash64 above deliberately
    * preserves (1.1 dropped k3 and threads a length-dependent
    * multiplier through every mix). Spec-pinned in ChHashSpec against a
    * TRUE independent golden — Guava's
    * com.google.common.hash.Hashing.farmHashFingerprint64() (Google's
    * own Java port, already on the Spark classpath) — across every
    * length class and a random-bytes property sweep, plus the
    * cross-language Python derivation in tools/cityhash102_ref.py. */
  def farmFingerprint64(data: Array[Byte]): Long =
    farmFingerprint64(data, 0, data.length)

  def farmFingerprint64(s: Array[Byte], off0: Int, len: Int): Long = {
    if (len <= 32) {
      return if (len <= 16) farmLen0to16(s, off0, len)
      else farmLen17to32(s, off0, len)
    }
    if (len <= 64) return farmLen33to64(s, off0, len)

    // 56 bytes of state over 64-byte blocks, then one last overlapping
    // 64-byte block with a z-derived multiplier
    val seed = 81L
    var x = seed * K2 + le64(s, off0)
    var y = seed * K1 + 113L
    var z = shiftMix(y * K2 + 113L) * K2
    val v = new Array[Long](2)
    val w = new Array[Long](2)
    var off = off0
    val endOff = off0 + ((len - 1) / 64) * 64
    val last64 = off0 + len - 64
    do {
      x = rotr(x + y + v(0) + le64(s, off + 8), 37) * K1
      y = rotr(y + v(1) + le64(s, off + 48), 42) * K1
      x ^= w(1)
      y += v(0) + le64(s, off + 40)
      z = rotr(z + w(0), 33) * K1
      val vs = v(1); val wf = w(0); val ws = w(1)
      weakHash(s, off, vs * K1, x + wf, v)
      weakHash(s, off + 32, z + ws, y + le64(s, off + 16), w)
      val t = z; z = x; x = t
      off += 64
    } while (off != endOff)
    val mul = K1 + ((z & 0xffL) << 1)
    off = last64
    w(0) += (len - 1) & 63
    v(0) += w(0)
    w(0) += v(0)
    x = rotr(x + y + v(0) + le64(s, off + 8), 37) * mul
    y = rotr(y + v(1) + le64(s, off + 48), 42) * mul
    x ^= w(1) * 9L
    y += v(0) * 9L + le64(s, off + 40)
    z = rotr(z + w(0), 33) * mul
    val vs = v(1); val wf = w(0); val ws = w(1)
    weakHash(s, off, vs * mul, x + wf, v)
    weakHash(s, off + 32, z + ws, y + le64(s, off + 16), w)
    val t = z; z = x; x = t
    farmMix(farmMix(v(0), w(0), mul) + shiftMix(y) * K0 + z,
      farmMix(v(1), w(1), mul) + x, mul)
  }

  // ---- halfMD5 -----------------------------------------------------------

  /** First 8 bytes of MD5, interpreted big-endian (ClickHouse
    * HalfMD5Impl: bswap64 of the first little-endian word). */
  def halfMD5(data: Array[Byte]): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = md.digest(data)
    ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) | ((d(2) & 0xffL) << 40) |
      ((d(3) & 0xffL) << 32) | ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
  }

  /** halfMD5's combiner is itself over the 16-byte LE (h1, h2) buffer. */
  def halfMD5Combine(h1: Long, h2: Long): Long = {
    val buf = new Array[Byte](16)
    var i = 0
    while (i < 8) {
      buf(i) = ((h1 >>> (8 * i)) & 0xff).toByte
      buf(8 + i) = ((h2 >>> (8 * i)) & 0xff).toByte
      i += 1
    }
    halfMD5(buf)
  }

  // ---- integer mixers ----------------------------------------------------

  /** MurmurHash3 fmix64 — ClickHouse's intHash64 core. */
  @inline private def fmix64(x0: Long): Long = {
    var x = x0
    x ^= x >>> 33
    x *= 0xff51afd7ed558ccdL
    x ^= x >>> 33
    x *= 0xc4ceb9fe1a85ec53L
    x ^= x >>> 33
    x
  }

  /** ClickHouse `intHash64`: fmix64 of the salted key (IntHash64Impl's
    * salt avoids collisions with the raw mixer used in its hash tables). */
  def intHash64(x: Long): Long = fmix64(x ^ 0x4CF2D2BAAE6DA887L)

  /** ClickHouse `intHash32`: the rotate-mix 64→32 from
    * Common/HashTable/Hash.h with IntHash32Impl's salt; returns the
    * UInt32 widened to a non-negative Long. */
  def intHash32(x0: Long): Long = {
    var key = x0 ^ 0x75D9543DE018BF45L
    key = (~key) + (key << 18)
    key = key ^ rotr(key, 31)
    key = key * 21
    key = key ^ rotr(key, 11)
    key = key + (key << 6)
    key = key ^ rotr(key, 22)
    key & 0xffffffffL
  }

  // ---- Spark-facing adapters ----------------------------------------------

  /** Long bit pattern → exact unsigned value as Decimal(20,0) — the
    * repo-wide UInt64 convention; compact-long fast path for values
    * below 2^63. */
  def toUDec(x: Long): Decimal =
    if (x >= 0) Decimal(x, 20, 0)
    else Decimal(new java.math.BigDecimal(
      new java.math.BigInteger(java.lang.Long.toUnsignedString(x))), 20, 0)

  def cityUtf8(s: UTF8String): Long = cityHash64(s.getBytes)
  def farmFp64Utf8(s: UTF8String): Long = farmFingerprint64(s.getBytes)
  def farmFp64Long(v: Long, width: Int): Long = farmFingerprint64(leBytes(v, width))
  def sipUtf8(s: UTF8String): Long = sipHash64(s.getBytes)
  def halfMD5Utf8(s: UTF8String): Long = halfMD5(s.getBytes)
  def cityLong(v: Long, width: Int): Long = cityHash64(leBytes(v, width))
  def sipLong(v: Long, width: Int): Long = sipHash64(leBytes(v, width))
  def halfMD5Long(v: Long, width: Int): Long = halfMD5(leBytes(v, width))
}

/** Shared base: hash one column of string/binary/integral bytes to the
  * ClickHouse 64-bit bit pattern (LongType; the builder wraps the final
  * fold in [[UnsignedDecimal]] for the UInt64 surface value). */
abstract class ChHash64Base extends UnaryExpression {
  def kernel: String // static method prefix in ChHash: "city" | "sip" | "halfMD5"

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | BinaryType | ByteType | ShortType | IntegerType | LongType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string, binary or integer argument, got ${other.sql}")
  }

  private def width: Int = child.dataType match {
    case ByteType => 1
    case ShortType => 2
    case IntegerType => 4
    case _ => 8
  }

  override protected def nullSafeEval(v: Any): Any = child.dataType match {
    case StringType => hashUtf8(v.asInstanceOf[UTF8String])
    case BinaryType => hashBytes(v.asInstanceOf[Array[Byte]])
    case _ => hashLong(v match {
      case b: java.lang.Byte => b.longValue
      case s: java.lang.Short => s.longValue
      case i: java.lang.Integer => i.longValue
      case l: java.lang.Long => l.longValue
    }, width)
  }

  protected def hashUtf8(s: UTF8String): Long
  protected def hashBytes(b: Array[Byte]): Long
  protected def hashLong(v: Long, w: Int): Long

  /** ChHash static method name for the raw-bytes form. */
  protected def bytesKernel: String =
    if (kernel == "halfMD5") "halfMD5" else kernel + "Hash64"

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    child.dataType match {
      case StringType =>
        defineCodeGen(ctx, ev, c => s"graft.functions.ChHash.${kernel}Utf8($c)")
      case BinaryType =>
        defineCodeGen(ctx, ev, c => s"graft.functions.ChHash.$bytesKernel($c)")
      case _ =>
        defineCodeGen(ctx, ev, c =>
          s"graft.functions.ChHash.${kernel}Long((long)$c, $width)")
    }
}

/** `cityHash64(x)` bit pattern — CityHash64 v1.0.2 (ClickHouse's pinned
  * version; see [[ChHash]]). */
case class CityHash64Expr(child: Expression) extends ChHash64Base {
  override def kernel: String = "city"
  override protected def hashUtf8(s: UTF8String): Long = ChHash.cityUtf8(s)
  override protected def hashBytes(b: Array[Byte]): Long = ChHash.cityHash64(b)
  override protected def hashLong(v: Long, w: Int): Long = ChHash.cityLong(v, w)
  override protected def withNewChildInternal(newChild: Expression): CityHash64Expr =
    copy(child = newChild)
  override def prettyName: String = "cityHash64"
}

/** `sipHash64(x)` bit pattern — SipHash-2-4, zero key. */
case class SipHash64Expr(child: Expression) extends ChHash64Base {
  override def kernel: String = "sip"
  override protected def hashUtf8(s: UTF8String): Long = ChHash.sipUtf8(s)
  override protected def hashBytes(b: Array[Byte]): Long = ChHash.sipHash64(b)
  override protected def hashLong(v: Long, w: Int): Long = ChHash.sipLong(v, w)
  override protected def withNewChildInternal(newChild: Expression): SipHash64Expr =
    copy(child = newChild)
  override def prettyName: String = "sipHash64"
}

/** `halfMD5(x)` bit pattern — first 8 MD5 bytes big-endian. */
case class HalfMd5Expr(child: Expression) extends ChHash64Base {
  override def kernel: String = "halfMD5"
  override protected def hashUtf8(s: UTF8String): Long = ChHash.halfMD5Utf8(s)
  override protected def hashBytes(b: Array[Byte]): Long = ChHash.halfMD5(b)
  override protected def hashLong(v: Long, w: Int): Long = ChHash.halfMD5Long(v, w)
  override protected def withNewChildInternal(newChild: Expression): HalfMd5Expr =
    copy(child = newChild)
  override def prettyName: String = "halfMD5"
}

/** `farmFingerprint64(x)` bit pattern — FarmHash Fingerprint64
  * (farmhashna::Hash64; see [[ChHash.farmFingerprint64]]). */
case class FarmFingerprint64Expr(child: Expression) extends ChHash64Base {
  override def kernel: String = "farmFp64"
  override protected def bytesKernel: String = "farmFingerprint64"
  override protected def hashUtf8(s: UTF8String): Long = ChHash.farmFp64Utf8(s)
  override protected def hashBytes(b: Array[Byte]): Long = ChHash.farmFingerprint64(b)
  override protected def hashLong(v: Long, w: Int): Long = ChHash.farmFp64Long(v, w)
  override protected def withNewChildInternal(newChild: Expression): FarmFingerprint64Expr =
    copy(child = newChild)
  override def prettyName: String = "farmFingerprint64"
}

/** One argument's 16-byte SipHash-128 (either convention — see
  * [[ChHash.sipHash128]]); the builder folds with [[SipHash128Combine]]
  * and renders lowercase hex. */
case class SipHash128Expr(child: Expression, ref: Boolean) extends UnaryExpression {
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | BinaryType | ByteType | ShortType | IntegerType | LongType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string, binary or integer argument, got ${other.sql}")
  }

  private def width: Int = child.dataType match {
    case ByteType => 1
    case ShortType => 2
    case IntegerType => 4
    case _ => 8
  }

  override protected def nullSafeEval(v: Any): Any = child.dataType match {
    case StringType => ChHash.sip128Utf8(v.asInstanceOf[UTF8String], ref)
    case BinaryType => ChHash.sipHash128(v.asInstanceOf[Array[Byte]], ref)
    case _ => ChHash.sip128Long(v match {
      case b: java.lang.Byte => b.longValue
      case s: java.lang.Short => s.longValue
      case i: java.lang.Integer => i.longValue
      case l: java.lang.Long => l.longValue
    }, width, ref)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    child.dataType match {
      case StringType =>
        defineCodeGen(ctx, ev, c => s"graft.functions.ChHash.sip128Utf8($c, $ref)")
      case BinaryType =>
        defineCodeGen(ctx, ev, c => s"graft.functions.ChHash.sipHash128($c, $ref)")
      case _ =>
        defineCodeGen(ctx, ev, c =>
          s"graft.functions.ChHash.sip128Long((long)$c, $width, $ref)")
    }

  override protected def withNewChildInternal(newChild: Expression): SipHash128Expr =
    copy(child = newChild)
  override def prettyName: String =
    if (ref) "sipHash128Reference" else "sipHash128"
}

/** 128-bit multi-argument fold step: re-hash the 32-byte concatenation
  * of two 16-byte hashes (see [[ChHash.sip128Combine]]). */
case class SipHash128Combine(left: Expression, right: Expression, ref: Boolean)
  extends BinaryExpression {
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName combiner expects two binaries")

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ChHash.sip128Combine(a.asInstanceOf[Array[Byte]],
      b.asInstanceOf[Array[Byte]], ref)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, r) =>
      s"graft.functions.ChHash.sip128Combine($l, $r, $ref)")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): SipHash128Combine =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "sip128Combine"
}

/** Multi-argument combiner fold step: `combine(h1, h2)` over two already-
  * hashed 64-bit patterns. `mode` picks the ClickHouse family combiner. */
case class ChHashCombine(left: Expression, right: Expression, mode: String)
  extends BinaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName combiner expects two longs")

  private def fn: String = mode match {
    case "city" => "hash128to64"
    case "sip" => "sipCombine"
    case _ => "halfMD5Combine"
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = mode match {
    case "city" => ChHash.hash128to64(a.asInstanceOf[Long], b.asInstanceOf[Long])
    case "sip" => ChHash.sipCombine(a.asInstanceOf[Long], b.asInstanceOf[Long])
    case _ => ChHash.halfMD5Combine(a.asInstanceOf[Long], b.asInstanceOf[Long])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, r) => s"graft.functions.ChHash.$fn($l, $r)")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): ChHashCombine =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = s"${mode}Combine"
}

/** Long bit pattern → exact UInt64 value as Decimal(20,0) (the repo's
  * unsigned-64 convention — keeps `cityHash64(k) % N` arithmetic
  * identical to ClickHouse where a signed Long would go negative). */
case class UnsignedDecimal(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DecimalType(20, 0)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName expects a long")
  override protected def nullSafeEval(v: Any): Any =
    ChHash.toUDec(v.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ChHash.toUDec($c)")
  override protected def withNewChildInternal(newChild: Expression): UnsignedDecimal =
    copy(child = newChild)
  override def prettyName: String = "toUInt64Bits"
}

/** `intHash64(n)` → UInt64 as Decimal(20,0); `intHash32(n)` → UInt32 as
  * LongType. Both take any integral (cast to the 64-bit key like
  * ClickHouse's UInt64 calling convention for these two). */
case class IntHash64Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ByteType | ShortType | IntegerType | LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"intHash64 expects an integer argument, got ${other.sql}")
  }
  override protected def nullSafeEval(v: Any): Any =
    ChHash.intHash64(v match {
      case b: java.lang.Byte => b.longValue
      case s: java.lang.Short => s.longValue
      case i: java.lang.Integer => i.longValue
      case l: java.lang.Long => l.longValue
    })
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ChHash.intHash64((long)$c)")
  override protected def withNewChildInternal(newChild: Expression): IntHash64Expr =
    copy(child = newChild)
  override def prettyName: String = "intHash64"
}

case class IntHash32Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ByteType | ShortType | IntegerType | LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"intHash32 expects an integer argument, got ${other.sql}")
  }
  override protected def nullSafeEval(v: Any): Any =
    ChHash.intHash32(v match {
      case b: java.lang.Byte => b.longValue
      case s: java.lang.Short => s.longValue
      case i: java.lang.Integer => i.longValue
      case l: java.lang.Long => l.longValue
    })
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ChHash.intHash32((long)$c)")
  override protected def withNewChildInternal(newChild: Expression): IntHash32Expr =
    copy(child = newChild)
  override def prettyName: String = "intHash32"
}

object ChHashBuilders {
  import org.apache.spark.sql.catalyst.expressions.{Hex, Literal, Lower, RegExpReplace}

  private def fold(es: Seq[Expression], one: Expression => Expression,
                   mode: String): Expression =
    es.map(one).reduceLeft((a, b) => ChHashCombine(a, b, mode))

  /** cityHash64(a[, b, …]) → UInt64 Decimal(20,0). */
  def cityHash64(es: Seq[Expression]): Expression =
    UnsignedDecimal(fold(es, CityHash64Expr, "city"))

  def sipHash64(es: Seq[Expression]): Expression =
    UnsignedDecimal(fold(es, SipHash64Expr, "sip"))

  /** sipHash128 / sipHash128Reference → the 16 bytes as LOWERCASE hex
    * text. Return-type convention (documented deviation, the
    * Decimal(20,0)-for-UInt64 pattern): ClickHouse returns
    * FixedString(16) raw bytes, which only ever reach users through
    * hex()/reinterpret — Spark has no fixed-width binary and raw bytes
    * don't survive JSON serving, so the hex spelling IS the usable
    * surface here (ClickHouse's own hex() prints these bytes uppercase;
    * `upper(sipHash128(x))` reproduces that spelling exactly). */
  private def sip128(es: Seq[Expression], ref: Boolean): Expression =
    Lower(Hex(es.map(e => SipHash128Expr(e, ref): Expression)
      .reduceLeft((a, b) => SipHash128Combine(a, b, ref))))

  def sipHash128(es: Seq[Expression]): Expression = sip128(es, ref = false)

  def sipHash128Reference(es: Seq[Expression]): Expression =
    sip128(es, ref = true)

  def halfMD5(es: Seq[Expression]): Expression =
    UnsignedDecimal(fold(es, HalfMd5Expr, "halfMD5"))

  /** farmFingerprint64(x) → UInt64 Decimal(20,0). SINGLE argument only:
    * the one-value kernel is pinned to a true independent golden
    * (Guava's farmHashFingerprint64), but ClickHouse's multi-argument
    * fold convention for the farm family cannot be cross-checked in
    * this zero-egress sandbox — a guessed combiner would be a SILENT
    * deviation, so the multi-arg form errors loudly instead (the
    * URLHash two-arg precedent). */
  def farmFingerprint64(es: Seq[Expression]): Expression = {
    if (es.size != 1) throw new IllegalArgumentException(
      "farmFingerprint64: only the single-argument form is mapped; the " +
        "multi-argument fold convention has no verifiable golden here — " +
        "fold explicitly, e.g. farmFingerprint64(concat(a, '\\0', b))")
    UnsignedDecimal(FarmFingerprint64Expr(es.head))
  }

  def intHash64(e: Expression): Expression = UnsignedDecimal(IntHash64Expr(e))

  def intHash32(e: Expression): Expression = IntHash32Expr(e)

  /** URLHash(url): cityHash64 of the url minus ONE trailing /, ? or #
    * (ClickHouse URLHashImpl). The two-argument hierarchy-level form is
    * not mapped — loud arity error. */
  def urlHash(e: Expression): Expression =
    UnsignedDecimal(CityHash64Expr(RegExpReplace(
      Cast(e, StringType), Literal("[/?#]$"), Literal(""), Literal(1))))
}
