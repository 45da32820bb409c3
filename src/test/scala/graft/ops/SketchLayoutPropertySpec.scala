package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Properties of the HDR log-linear bucket layout (the pure-JVM replica
  * [[SketchOps.hdrBucket]], spec-pinned to the Column face in
  * SketchOpsSpec): the quantile contract — "the true q-quantile lies in
  * the reported bucket at ≤3.125% relative width" — rests on exactly
  * three invariants of the index function, so each is a property over
  * the full milli-domain rather than an example sweep:
  *  - DECODE BRACKETS: vm ∈ [lo(idx(vm)), hi(idx(vm))] for every vm
  *  - MONOTONE: vm1 ≤ vm2 ⇒ idx(vm1) ≤ idx(vm2) (rank order survives
  *    bucketing — without this a cumulative-count quantile is garbage)
  *  - WIDTH: hi − lo ≤ lo·2^−(b−1) for lo ≥ 2^b (identity region below)
  * The generator leans on the adversarial region: values within ±2 of
  * powers of two, where an off-by-one in the k/idx arithmetic would
  * break continuity. */
class SketchLayoutPropertySpec extends AnyFunSuite {

  private val b = SketchOps.HdrSubBits

  private val vmGen: Gen[Long] = Gen.oneOf(
    Gen.chooseNum(0L, 1L << (b + 2)),              // identity + first octaves
    Gen.chooseNum(0L, 1L << 53),                   // the whole milli-domain
    Gen.chooseNum(1, 52).flatMap(p =>              // power-of-two boundaries
      Gen.chooseNum(-2L, 2L).map(d => math.max(0L, (1L << p) + d))))

  private def check(p: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(500), p)
    assert(r.passed, r.status.toString)
  }

  test("decode brackets every value (500 random milli-values)") {
    check(Prop.forAll(vmGen) { vm =>
      val (lo, hi) = SketchOps.hdrDecode(SketchOps.hdrBucket(vm))
      lo <= vm && vm <= hi
    })
  }

  test("bucket index is monotone in the value (500 random pairs)") {
    check(Prop.forAll(vmGen, vmGen) { (a, c) =>
      val (lo, hi) = (math.min(a, c), math.max(a, c))
      SketchOps.hdrBucket(lo) <= SketchOps.hdrBucket(hi)
    })
  }

  test("bucket width respects the 2^-(b-1) relative bound past the identity region") {
    check(Prop.forAll(vmGen) { vm =>
      val (lo, hi) = SketchOps.hdrDecode(SketchOps.hdrBucket(vm))
      lo < (1L << b) || (hi - lo) <= (lo >> (b - 1))
    })
  }

  test("buckets tile: consecutive indices leave no gap and no overlap") {
    // idx and idx+1 decode to adjacent ranges wherever both are
    // reachable — with bracketing this makes the layout a partition of
    // the domain (every value in exactly one bucket)
    val idxGen = vmGen.map(SketchOps.hdrBucket)
    check(Prop.forAll(idxGen) { idx =>
      val (_, hi) = SketchOps.hdrDecode(idx)
      val (lo2, _) = SketchOps.hdrDecode(idx + 1)
      lo2 == hi + 1
    })
  }
}
