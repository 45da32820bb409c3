#!/usr/bin/env python3
"""glibc erf vectors for ChErfSpec (the erf closure, r15 late).

CPython's math.erf delegates to the platform libm when available
(HAVE_ERF); on this container that is glibc's FDLIBM-derived
ieee754_erf — the same kernel ClickHouse's std::erf resolves to on
glibc hosts, i.e. the exact production bits a migrating user compares
against. The ChErf.scala kernel is correctly rounded by construction
(70-digit BigDecimal series), so the spec asserts agreement within
1 ulp — any residual 1-ulp disagreement on a vector is the libm's own
documented sub-ulp error, and the spec reports the observed count.

Prints (x_bits_hex, erf_bits_hex) pairs; bit patterns avoid any
decimal round-trip ambiguity.

Usage: python3 tools/erf_ref.py
"""
import math
import struct


def bits(v):
    return struct.pack(">d", v).hex()


def main():
    xs = []
    # the q27/sweep domain: x = (m - 128) / 32 for m in 0..255
    xs += [(m - 128) / 32.0 for m in range(256)]
    # branch edges and special shapes
    xs += [0.0, -0.0, 1e-300, -1e-300, 5e-324, 1e-17, -1e-17,
           0.5, -0.5, 0.84375, 1.0, -1.0, 1.25, 2.0, -2.0, 3.0,
           4.0, 5.0, 5.5, 5.8, 5.9, 6.0, -6.0, 6.25, 6.5, -6.5,
           7.0, 10.0, -27.0, 1e308, -1e308,
           math.inf, -math.inf]
    # a pseudo-random sweep across the live range (deterministic)
    seed = 0x2545F4914F6CDD1D
    s = seed
    for _ in range(64):
        s = (s * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        xs.append((s / (1 << 64) - 0.5) * 13.0)  # [-6.5, 6.5)
    for x in xs:
        print(f"{bits(x)} {bits(math.erf(x))}")


if __name__ == "__main__":
    main()
