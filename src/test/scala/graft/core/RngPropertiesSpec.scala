package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property-based RNG checks (SURVEY §5.2 item 3) via ScalaCheck directly
  * (scalatestplus isn't in the offline dep set, so properties run through
  * ScalaCheck's own Test.check and assert on the result).
  */
class RngPropertiesSpec extends AnyFunSuite {

  private def check(p: Prop, name: String): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, s"$name: $res")
  }

  private val seedGen = Gen.chooseNum(0L, DeterministicRng.M - 1)
  private val ctrGen = Gen.chooseNum(0L, 1000000L)

  test("uniform is always in [0,1) for arbitrary counters") {
    check(Prop.forAll(seedGen, ctrGen, ctrGen, ctrGen) { (s, m, si, st) =>
      val u = DeterministicRng.uniform(s, m, si, st)
      u >= 0.0 && u < 1.0
    }, "range")
  }

  test("uniform is a pure function of its counters") {
    check(Prop.forAll(seedGen, ctrGen, ctrGen, ctrGen) { (s, m, si, st) =>
      DeterministicRng.uniform(s, m, si, st) == DeterministicRng.uniform(s, m, si, st)
    }, "determinism")
  }

  test("changing any single counter changes the stream (w.h.p.)") {
    check(Prop.forAll(seedGen, ctrGen, ctrGen, ctrGen) { (s, m, si, st) =>
      val base = DeterministicRng.hash(s, m, si, st)
      // a single collision is possible (31-bit range) but three at once is
      // (2^-31)^3 — effectively impossible
      Seq(
        DeterministicRng.hash(s + 1, m, si, st),
        DeterministicRng.hash(s, m + 1, si, st),
        DeterministicRng.hash(s, m, si, st + 1)
      ).count(_ == base) <= 1
    }, "sensitivity")
  }

  test("per-seed sample mean stays near 1/2 (uniformity across seeds)") {
    check(Prop.forAll(seedGen) { s =>
      val n = 2000
      val mean = (0 until n).map(i => DeterministicRng.uniform(s, 0, i / 20, i % 20)).sum / n
      math.abs(mean - 0.5) < 0.05 // 0.5 ± ~7.7 SE
    }, "mean")
  }

  test("coin model trace length law holds for arbitrary sizes") {
    check(Prop.forAll(Gen.chooseNum(1, 64), Gen.chooseNum(0, 8), seedGen) { (points, pre, seed) =>
      val rng = new StepRng(seed, 0, 0)
      val start = Seq.fill(pre)("T")
      CoinSequence.simulate(points, rng, Seq(0.5), start).length == points + pre
    }, "trace length")
  }
}
