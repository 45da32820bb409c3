#!/usr/bin/env python3
"""Independent cross-language reference for the ChHashes.scala kernels.

Written directly from the PUBLISHED algorithm definitions — CityHash
v1.0.2 (Pike & Alakuijala, Google, MIT; the layout ClickHouse pins in
its contrib/cityhash102), MurmurHash3's fmix64 finalizer (Appleby,
public domain; ClickHouse's intHash64 applies it to x ^
0x4CF2D2BAAE6DA887), Thomas Wang's 64->32 rotate-mix (ClickHouse's
intHash32 with salt 0x75D9543DE018BF45), SipHash-2-4 (Aumasson &
Bernstein 2012) with the zero key, and halfMD5 via Python's own
hashlib (a genuinely third-party MD5).

Purpose: the Scala kernels were derived from the same publications; a
SECOND derivation in a different language by a different code path
catches translation bugs (byte order, signedness, rotate direction,
length-class boundaries) that structural self-goldens cannot. This
container has no egress, so live-ClickHouse goldens cannot be fetched;
ChHashSpec documents that and pins the vectors this script prints.

farmFingerprint64 (r15 late) is deliberately NOT re-derived here: its
independent golden is Guava's com.google.common.hash
.Hashing.farmHashFingerprint64() on the Spark classpath — Google's own
Java port of farmhashna::Hash64, tested upstream against the C++
reference — which ChHashSpec property-sweeps directly (the hashlib
precedent: prefer a genuinely third-party kernel over a twin
derivation when one exists in-sandbox).

Usage: python3 tools/cityhash102_ref.py   # prints the vector table
"""
import hashlib

M64 = (1 << 64) - 1

k0 = 0xc3a5c85c97cb3127
k1 = 0xb492b66fbe98f273
k2 = 0x9ae16a3b2f90404f
k3 = 0xc949d7c7509e6557
kMul = 0x9ddfea08eb382d69


def u64(x):
    return x & M64


def fetch64(b, i):
    return int.from_bytes(b[i:i + 8], "little")


def fetch32(b, i):
    return int.from_bytes(b[i:i + 4], "little")


def rot(v, shift):
    return v if shift == 0 else u64((v >> shift) | (v << (64 - shift)))


def rot_by_at_least_1(v, shift):
    return u64((v >> shift) | (v << (64 - shift)))


def shift_mix(v):
    return u64(v ^ (v >> 47))


def hash128to64(lo, hi):
    a = u64((lo ^ hi) * kMul)
    a ^= a >> 47
    b = u64((hi ^ a) * kMul)
    b ^= b >> 47
    return u64(b * kMul)


def hash_len16(u, v):
    return hash128to64(u, v)


def hash_len_0_to_16(b, length):
    if length > 8:
        a = fetch64(b, 0)
        bb = fetch64(b, length - 8)
        return u64(hash_len16(a, rot_by_at_least_1(u64(bb + length), length)) ^ bb)
    if length >= 4:
        a = fetch32(b, 0)
        return hash_len16(u64(length + (a << 3)), fetch32(b, length - 4))
    if length > 0:
        a = b[0]
        bb = b[length >> 1]
        c = b[length - 1]
        y = u64(a + (bb << 8))
        z = u64(length + (c << 2))
        return u64(shift_mix(u64(y * k2) ^ u64(z * k3)) * k2)
    return k2


def hash_len_17_to_32(b, length):
    a = u64(fetch64(b, 0) * k1)
    bb = fetch64(b, 8)
    c = u64(fetch64(b, length - 8) * k2)
    d = u64(fetch64(b, length - 16) * k0)
    return hash_len16(
        u64(rot(u64(a - bb), 43) + rot(c, 30) + d),
        u64(a + rot(bb ^ k3, 20) - c + length))


def weak_hash_len32_with_seeds_raw(w, x, y, z, a, b):
    a = u64(a + w)
    b = rot(u64(b + a + z), 21)
    c = a
    a = u64(a + x)
    a = u64(a + y)
    b = u64(b + rot(a, 44))
    return u64(a + z), u64(b + c)


def weak_hash_len32_with_seeds(buf, i, a, b):
    return weak_hash_len32_with_seeds_raw(
        fetch64(buf, i), fetch64(buf, i + 8), fetch64(buf, i + 16),
        fetch64(buf, i + 24), a, b)


def hash_len_33_to_64(b, length):
    z = fetch64(b, 24)
    a = u64(fetch64(b, 0) + u64((length + fetch64(b, length - 16)) * k0))
    bb = rot(u64(a + z), 52)
    c = rot(a, 37)
    a = u64(a + fetch64(b, 8))
    c = u64(c + rot(a, 7))
    a = u64(a + fetch64(b, 16))
    vf = u64(a + z)
    vs = u64(bb + rot(a, 31) + c)
    a = u64(fetch64(b, 16) + fetch64(b, length - 32))
    z = fetch64(b, length - 8)
    bb = rot(u64(a + z), 52)
    c = rot(a, 37)
    a = u64(a + fetch64(b, length - 24))
    c = u64(c + rot(a, 7))
    a = u64(a + fetch64(b, length - 16))
    wf = u64(a + z)
    ws = u64(bb + rot(a, 31) + c)
    r = shift_mix(u64(u64(vf + ws) * k2 + u64(wf + vs) * k0))
    return u64(shift_mix(u64(r * k0 + vs)) * k2)


def cityhash64(data):
    b = bytes(data)
    length = len(b)
    if length <= 32:
        if length <= 16:
            return hash_len_0_to_16(b, length)
        return hash_len_17_to_32(b, length)
    if length <= 64:
        return hash_len_33_to_64(b, length)

    x = fetch64(b, 0)
    y = fetch64(b, length - 16) ^ k1
    z = fetch64(b, length - 56) ^ k0
    v = weak_hash_len32_with_seeds(b, length - 64, length, y)
    w = weak_hash_len32_with_seeds(b, length - 32, u64(length * k1), k0)
    z = u64(z + shift_mix(v[1]) * k1)
    x = u64(rot(u64(z + x), 39) * k1)
    y = u64(rot(y, 33) * k1)

    i = 0
    remaining = (length - 1) & ~63
    while True:
        x = u64(rot(u64(x + y + v[0] + fetch64(b, i + 16)), 37) * k1)
        y = u64(rot(u64(y + v[1] + fetch64(b, i + 48)), 42) * k1)
        x ^= w[1]
        y ^= v[0]
        z = rot(z ^ w[0], 33)
        v = weak_hash_len32_with_seeds(b, i, u64(v[1] * k1), u64(x + w[0]))
        w = weak_hash_len32_with_seeds(b, i + 32, u64(z + w[1]), y)
        z, x = x, z
        i += 64
        remaining -= 64
        if remaining == 0:
            break
    return hash_len16(
        u64(hash_len16(v[0], w[0]) + shift_mix(y) * k1 + z),
        u64(hash_len16(v[1], w[1]) + x))


# ---- ClickHouse integer mixers ----

def fmix64(x):
    x ^= x >> 33
    x = u64(x * 0xff51afd7ed558ccd)
    x ^= x >> 33
    x = u64(x * 0xc4ceb9fe1a85ec53)
    x ^= x >> 33
    return x


def ch_int_hash64(x):
    return fmix64(u64(x) ^ 0x4CF2D2BAAE6DA887)


def ch_int_hash32(key):
    """Thomas Wang's 64->32 with rotates (CH Common/HashTable/Hash.h,
    template salt 0x75D9543DE018BF45 at the FunctionsHashing call site).

    Transcription note: Wang published TWO related mixers — the 64->64
    (21/24/3+8/14/2+4/28/31 shift schedule) and the 64->32
    (18/31/21*/11/6/22). A first draft of this script used the 64->64
    schedule by mistake and disagreed with the Scala kernel at every
    input; the cross-language net working as intended. ClickHouse's
    Hash.h intHash32 is the 64->32 schedule with the shifts replaced by
    ROTATES, as below."""
    key = u64(key) ^ 0x75D9543DE018BF45
    key = u64((~key & M64) + (key << 18))
    key = key ^ u64((key >> 31) | (key << 33))
    key = u64(key * 21)
    key = key ^ u64((key >> 11) | (key << 53))
    key = u64(key + (key << 6))
    key = key ^ u64((key >> 22) | (key << 42))
    return key & 0xffffffff


# ---- SipHash-2-4, zero key (what CH sipHash64 computes) ----

def siphash24(data, key0=0, key1=0):
    b = bytes(data)
    v0 = key0 ^ 0x736f6d6570736575
    v1 = key1 ^ 0x646f72616e646f6d
    v2 = key0 ^ 0x6c7967656e657261
    v3 = key1 ^ 0x7465646279746573

    def rotl(v, s):
        return u64((v << s) | (v >> (64 - s)))

    def round_():
        nonlocal v0, v1, v2, v3
        v0 = u64(v0 + v1); v1 = rotl(v1, 13); v1 ^= v0; v0 = rotl(v0, 32)
        v2 = u64(v2 + v3); v3 = rotl(v3, 16); v3 ^= v2
        v0 = u64(v0 + v3); v3 = rotl(v3, 21); v3 ^= v0
        v2 = u64(v2 + v1); v1 = rotl(v1, 17); v1 ^= v2; v2 = rotl(v2, 32)

    n = len(b)
    i = 0
    while n - i >= 8:
        m = fetch64(b, i)
        v3 ^= m
        round_(); round_()
        v0 ^= m
        i += 8
    m = (n & 0xff) << 56
    for j in range(n - i):
        m |= b[i + j] << (8 * j)
    v3 ^= m
    round_(); round_()
    v0 ^= m
    v2 ^= 0xff
    round_(); round_(); round_(); round_()
    return u64(v0 ^ v1 ^ v2 ^ v3)


def siphash128(data, ref=False):
    """SipHash 128-bit outputs, zero key, as 32 lowercase hex chars.

    ref=False: ClickHouse's sipHash128 — the sipHash64 state machine
    (normal init, v2 ^= 0xff finalization) with the final xor-fold
    stopped at 128 bits: out = LE(v0^v1) || LE(v2^v3) (public
    SipHash.h get128; the CH docs call out the divergence from the
    paper's mode). ref=True: the paper's outlen=16 variant (Aumasson
    & Bernstein reference siphash.c): v1 ^= 0xee at init, v2 ^= 0xee
    at finalization, b0 = v0^v1^v2^v3, then v1 ^= 0xdd + 4 rounds for
    b1 (ClickHouse sipHash128Reference)."""
    b = bytes(data)
    v0 = 0x736f6d6570736575
    v1 = 0x646f72616e646f6d ^ (0xee if ref else 0)
    v2 = 0x6c7967656e657261
    v3 = 0x7465646279746573

    def rotl(v, s):
        return u64((v << s) | (v >> (64 - s)))

    def round_():
        nonlocal v0, v1, v2, v3
        v0 = u64(v0 + v1); v1 = rotl(v1, 13); v1 ^= v0; v0 = rotl(v0, 32)
        v2 = u64(v2 + v3); v3 = rotl(v3, 16); v3 ^= v2
        v0 = u64(v0 + v3); v3 = rotl(v3, 21); v3 ^= v0
        v2 = u64(v2 + v1); v1 = rotl(v1, 17); v1 ^= v2; v2 = rotl(v2, 32)

    n = len(b)
    i = 0
    while n - i >= 8:
        m = fetch64(b, i)
        v3 ^= m
        round_(); round_()
        v0 ^= m
        i += 8
    m = (n & 0xff) << 56
    for j in range(n - i):
        m |= b[i + j] << (8 * j)
    v3 ^= m
    round_(); round_()
    v0 ^= m
    if ref:
        v2 ^= 0xee
        round_(); round_(); round_(); round_()
        b0 = u64(v0 ^ v1 ^ v2 ^ v3)
        v1 ^= 0xdd
        round_(); round_(); round_(); round_()
        b1 = u64(v0 ^ v1 ^ v2 ^ v3)
    else:
        v2 ^= 0xff
        round_(); round_(); round_(); round_()
        b0 = u64(v0 ^ v1)
        b1 = u64(v2 ^ v3)
    return (b0.to_bytes(8, "little") + b1.to_bytes(8, "little")).hex()


def siphash128_combine(hex_a, hex_b, ref=False):
    """Multi-arg 128-bit chaining: re-hash the 32-byte concatenation of
    the two 16-byte hashes (the 128-bit analog of the sipHash64 fold)."""
    return siphash128(bytes.fromhex(hex_a) + bytes.fromhex(hex_b), ref)


def half_md5(data):
    """First 8 bytes of MD5, read BIG-endian (CH HalfMD5Impl bswaps)."""
    return int.from_bytes(hashlib.md5(bytes(data)).digest()[:8], "big")


def url_hash(s):
    t = s[:-1] if s and s[-1] in "/?#" else s
    return cityhash64(t.encode("utf-8"))


def main():
    # string vectors across every CityHash length-class boundary
    strings = ["", "a", "ab", "abc", "abcd", "hello", "12345678",
               "123456789", "0123456789abcdef",          # 16
               "0123456789abcdefg",                      # 17
               "0123456789abcdef0123456789abcdef",       # 32
               "0123456789abcdef0123456789abcdefg",      # 33
               "0123456789abcdef0123456789abcdef0123456789abcdef0123456789abcdef",   # 64
               "0123456789abcdef0123456789abcdef0123456789abcdef0123456789abcdefg",  # 65
               "x" * 129,
               "The quick brown fox jumps over the lazy dog"]
    print("== cityHash64(utf8) ==")
    for s in strings:
        print(f"  len={len(s):3d} {cityhash64(s.encode()):>20d}  {s[:32]!r}")
    print("== sipHash64 (zero key) ==")
    for s in strings:
        print(f"  len={len(s):3d} {siphash24(s.encode()):>20d}  {s[:32]!r}")
    print("== sipHash128 (CH get128 fold) / sipHash128Reference (paper) ==")
    for s in strings:
        print(f"  len={len(s):3d} ch={siphash128(s.encode())} "
              f"ref={siphash128(s.encode(), ref=True)}  {s[:24]!r}")
    print("== sipHash128 folds + int layouts ==")
    for a, b in [("a", "b"), ("hello", "world"), ("", "x")]:
        print(f"  sipHash128({a!r},{b!r}) = "
              f"{siphash128_combine(siphash128(a.encode()), siphash128(b.encode()))} "
              f"ref={siphash128_combine(siphash128(a.encode(), True), siphash128(b.encode(), True), True)}")
    for v, w in [(5, 8), (5, 4), (255, 8), (2**40, 8)]:
        bs = int(v).to_bytes(w, "little")
        print(f"  v={v} width={w} -> ch={siphash128(bs)} ref={siphash128(bs, True)}")
    print("== halfMD5 ==")
    for s in strings:
        print(f"  len={len(s):3d} {half_md5(s.encode()):>20d}  {s[:32]!r}")
    print("== intHash64 / intHash32 ==")
    for x in [0, 1, 2, 42, 255, 256, 0xDEADBEEF, 2**31, 2**63 - 1,
              2**63, 2**64 - 1]:
        print(f"  x={x:>20d} i64={ch_int_hash64(x):>20d} "
              f"i32={ch_int_hash32(x):>10d}")
    print("== hash128to64 folds (multi-arg cityHash64 chain) ==")
    for a, b in [("a", "b"), ("hello", "world"), ("", "x")]:
        fold = hash128to64(cityhash64(a.encode()), cityhash64(b.encode()))
        print(f"  cityHash64({a!r},{b!r}) = {fold}")
    print("== URLHash ==")
    for s in ["http://x.io/a/", "http://x.io/a", "http://x.io/a?",
              "http://x.io/a#", "https://example.com/path/q/"]:
        print(f"  {s!r} -> {url_hash(s)}")
    # little-endian fixed-width integer layouts (CH hashes the in-memory
    # representation of integer columns)
    print("== cityHash64(int little-endian layout) ==")
    for v, w in [(5, 8), (5, 4), (255, 8), (2**40, 8)]:
        bs = int(v).to_bytes(w, "little")
        print(f"  v={v} width={w} -> {cityhash64(bs)}")


if __name__ == "__main__":
    main()
