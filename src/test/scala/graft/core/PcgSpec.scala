package graft.core

import java.math.BigInteger
import org.scalatest.funsuite.AnyFunSuite

/** Known-answer + property tests for the PCG64 backend
  * (pcg_setseq_128_xsl_rr_64, O'Neill 2014).
  *
  * KAT provenance: the vectors below were generated with an independent
  * arbitrary-precision implementation of the published algorithm
  * (tools/pcg64_kat.py) and cross-validated against NumPy's C
  * implementation by raw-state injection — and the (42, 54) sequence is
  * the published pcg64 demo output (first value 0x86B1DA1D72062B68). The
  * BigInteger model in this spec is a THIRD independent implementation,
  * exercising the two-long 128-bit carry arithmetic across random states.
  */
class PcgSpec extends AnyFunSuite {

  test("KAT: seeded (42, 54) reproduces the published pcg64 demo sequence") {
    val g = Pcg64.seeded(0L, 42L, 0L, 54L)
    val want = Seq(
      0x86b1da1d72062b68L, 0x1304aa46c9853d39L, 0xa3670e9e0dd50358L,
      0xf9090e529a7dae00L, 0xc85b9fd837996f2cL, 0x606121f8e3919196L)
    assert((0 until 6).map(_ => g.next64()) == want)
  }

  test("KAT: wide 128-bit initstate, initseq 7") {
    val g = Pcg64.seeded(0x0123456789ABCDEFL, 0xFEDCBA9876543210L, 0L, 7L)
    val want = Seq(
      0x2c9b65e47bbaed5fL, 0x8d424bd31de41b8aL,
      0x6c25b095d1b38c81L, 0x3335d6888a7f2babL)
    assert((0 until 4).map(_ => g.next64()) == want)
  }

  // --- independent BigInteger model of the published spec ---
  private val M128 = BigInteger.ONE.shiftLeft(128)
  private val MULT = new BigInteger("2360ED051FC65DA44385DF649FCCF645", 16)
  private def big2(hi: Long, lo: Long): BigInteger =
    new BigInteger(java.lang.Long.toUnsignedString(hi)).shiftLeft(64)
      .add(new BigInteger(java.lang.Long.toUnsignedString(lo)))
  private def refSeedState(isHi: Long, isLo: Long, seqHi: Long, seqLo: Long):
      (BigInteger, BigInteger) = {
    val inc = big2(seqHi, seqLo).shiftLeft(1).or(BigInteger.ONE).mod(M128)
    var st = inc                                    // 0*M + inc
    st = st.add(big2(isHi, isLo)).mod(M128)
    st = st.multiply(MULT).add(inc).mod(M128)
    (st, inc)
  }
  private def refNext(st: BigInteger, inc: BigInteger): (Long, BigInteger) = {
    val s = st.multiply(MULT).add(inc).mod(M128)
    val hi = s.shiftRight(64).longValue()
    val lo = s.longValue()
    (java.lang.Long.rotateRight(hi ^ lo, (hi >>> 58).toInt), s)
  }

  test("two-long arithmetic matches a BigInteger model across random streams") {
    val rnd = new scala.util.Random(1234)
    (0 until 50).foreach { _ =>
      val (isHi, isLo, sqHi, sqLo) =
        (rnd.nextLong(), rnd.nextLong(), rnd.nextLong(), rnd.nextLong())
      val g = Pcg64.seeded(isHi, isLo, sqHi, sqLo)
      var (st, inc) = refSeedState(isHi, isLo, sqHi, sqLo)
      (0 until 10).foreach { _ =>
        val (want, st2) = refNext(st, inc)
        st = st2
        assert(g.next64() == want)
      }
    }
  }

  test("advance(n) equals n sequential steps (Brown jump-ahead)") {
    Seq(1L, 2L, 7L, 63L, 64L, 1000L, 123456789L).foreach { n =>
      val a = Pcg64.seeded(0L, 42L, 0L, 54L)
      var last = 0L
      (0L until n).foreach(_ => last = a.next64())
      val next = a.next64()
      val b = Pcg64.seeded(0L, 42L, 0L, 54L)
      b.advance(n)
      assert(b.next64() == next, s"advance($n)")
    }
  }

  test("uniform honors the counter contract: stateless draw == sequential stream") {
    // engine stream (seed, model, sim): draw at step k == (k+1)-th
    // sequential nextDouble of the same stream
    val seq = Pcg64.seeded(42L, 3L, 0L, 5L)
    val sequential = (0 until 20).map(_ => seq.nextDouble())
    val stateless = (0 until 20).map(k => Pcg64.uniform(42L, 3L, 5L, k.toLong))
    assert(stateless == sequential)
  }

  test("uniform is in [0,1), deterministic, counter-sensitive") {
    val u = Pcg64.uniform(7L, 1L, 2L, 3L)
    assert(u >= 0.0 && u < 1.0)
    assert(u == Pcg64.uniform(7L, 1L, 2L, 3L))
    assert(u != Pcg64.uniform(8L, 1L, 2L, 3L))
    assert(u != Pcg64.uniform(7L, 2L, 2L, 3L))
    assert(u != Pcg64.uniform(7L, 1L, 3L, 3L))
    assert(u != Pcg64.uniform(7L, 1L, 2L, 4L))
  }

  test("fromRaw resumes a stream mid-flight (NumPy state-injection shape)") {
    val g = Pcg64.seeded(0L, 42L, 0L, 54L)
    (0 until 3).foreach(_ => g.next64())
    // a second instance seeded identically and advanced to the same point
    // must continue identically — fromRaw requires odd inc
    intercept[IllegalArgumentException] { Pcg64.fromRaw(0L, 0L, 0L, 2L) }
    val h = Pcg64.seeded(0L, 42L, 0L, 54L)
    h.advance(3L)
    assert(g.next64() == h.next64())
  }

  test("uniform stream is statistically sane (mean/uniformity smoke)") {
    val n = 20000
    val draws = (0 until n).map(i => Pcg64.uniform(42L, 0L, 0L, i.toLong))
    val mean = draws.sum / n
    assert(math.abs(mean - 0.5) < 0.01, s"mean = $mean")
    val deciles = draws.groupBy(u => (u * 10).toInt).view.mapValues(_.size)
    (0 until 10).foreach { d =>
      val c = deciles.getOrElse(d, 0)
      assert(math.abs(c - n / 10) < n / 50, s"decile $d count $c")
    }
  }
}
