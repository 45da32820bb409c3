package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Structural properties tying the two deliberately-duplicated
  * SipHash-2-4 kernels together (see the rationale on
  * [[ChHash.sipHash128Keyed]] — the 64-bit state machine stays inlined
  * for the hot path, so nothing shares code at runtime; these
  * properties are the guard that a one-sided edit cannot survive):
  *
  *  - XOR-FOLD: ClickHouse's sipHash128 is the SAME state machine as
  *    sipHash64 with the final fold stopped at 128 bits, so for EVERY
  *    input `sipHash64(x) == lo64(sipHash128(x)) ^ hi64(sipHash128(x))`
  *    — an algebraic identity of the two implementations, checked over
  *    random byte strings spanning every block/tail shape.
  *  - REF DIVERGES: the paper's outlen=16 variant perturbs the state at
  *    init (v1 ^= 0xee), so it must NOT satisfy the same fold identity
  *    (a refactor that dropped the ref flag would pass the CH identity
  *    and fail here).
  *  - LENGTH CLASSES: outputs are always 16 bytes; the hex surface is
  *    32 lowercase chars.
  */
class SipHashPropertySpec extends AnyFunSuite {

  // lengths biased to the block boundaries (0..8 tail bytes, block
  // counts 0..3) where the tail-word build could slip
  private val bytesGen: Gen[Array[Byte]] = for {
    n <- Gen.oneOf(Gen.chooseNum(0, 9), Gen.chooseNum(0, 70),
      Gen.oneOf(7, 8, 9, 15, 16, 17, 23, 24, 25, 31, 32, 33))
    bs <- Gen.listOfN(n, Gen.chooseNum(-128, 127).map(_.toByte))
  } yield bs.toArray

  private def le64(b: Array[Byte], i: Int): Long = {
    var v = 0L
    var j = 7
    while (j >= 0) { v = (v << 8) | (b(i + j) & 0xffL); j -= 1 }
    v
  }

  private def check(p: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(500), p)
    assert(r.passed, r.status.toString)
  }

  test("sipHash64(x) == lo64 ^ hi64 of sipHash128(x) for every input (500 random)") {
    check(Prop.forAll(bytesGen) { bs =>
      val h128 = ChHash.sipHash128(bs, ref = false)
      ChHash.sipHash64(bs) == (le64(h128, 0) ^ le64(h128, 8))
    })
  }

  test("the paper variant diverges from the CH fold identity (init perturbation)") {
    check(Prop.forAll(bytesGen) { bs =>
      val hRef = ChHash.sipHash128(bs, ref = true)
      ChHash.sipHash64(bs) != (le64(hRef, 0) ^ le64(hRef, 8))
    })
  }

  test("both variants always emit 16 bytes / 32 lowercase hex chars") {
    check(Prop.forAll(bytesGen) { bs =>
      val a = ChHash.sipHash128(bs, ref = false)
      val b = ChHash.sipHash128(bs, ref = true)
      val hex = ChHash.hexLower(a)
      a.length == 16 && b.length == 16 && hex.length == 32 &&
        hex.forall(c => (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f'))
    })
  }
}
