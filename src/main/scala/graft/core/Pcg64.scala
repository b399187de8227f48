package graft.core

/** PCG64 (pcg_setseq_128_xsl_rr_64) — M.E. O'Neill, "PCG: A Family of
  * Simple Fast Space-Efficient Statistically Good Algorithms for Random
  * Number Generation" (2014); constants, seeding and step/output order per
  * the public pcg_variants.h. This is the REAL algorithm behind the
  * reference's DEFAULT `np.random.PCG64` family (`models.py:25-26`,
  * `parallel_simulations/parallel_simulations.py:121-130`): a 128-bit LCG
  * (default multiplier 0x2360ED051FC65DA4_4385DF649FCCF645, per-stream odd
  * increment) with the XSL-RR output permutation
  * `rotr64(hi ^ lo, hi >>> 58)`. State is carried in two JVM longs;
  * 128-bit multiplies go through Math.multiplyHigh (Java 9+), mirroring
  * how [[Philox]] carries 32-bit lanes in longs.
  *
  * KAT-verified (PcgSpec): seeding with (42, 54) reproduces the published
  * pcg64 demo sequence starting 0x86B1DA1D72062B68; vectors were generated
  * with an independent arbitrary-precision implementation of the spec
  * (tools/pcg64_kat.py) and cross-validated against NumPy's C
  * implementation by raw-state injection (state dict round-trip), including
  * `advance`.
  *
  * The engine's stateless counter contract — any executor evaluates any
  * (seed, model, sim, step) point with no shared state, the property that
  * keeps trace generation shuffle-free on a 1000-executor cluster — is
  * honored through the LCG's O(log step) jump-ahead (Brown, "Random Number
  * Generation with Arbitrary Strides", MC-94; the same algorithm behind
  * NumPy's `advance`): stream identity (seed, model, sim) maps injectively
  * onto (initstate, initseq), and the draw at `step` is
  * seed → advance(step) → one step → output. A stateless draw costs
  * ~log2(step) 128-bit multiplies — the price of shuffle-free parallelism;
  * bulk sequential generation reuses one [[Pcg64]] instance and pays one
  * step per draw.
  *
  * NumPy-fidelity caveat (one layer thinner than [[Philox]]'s): the
  * generator is bit-identical to NumPy's and the double conversion matches
  * NumPy's `(x >>> 11) * 2^-53`, but NumPy seeds through SeedSequence
  * entropy pooling, so `np.random.PCG64(42)` still differs from this
  * engine's seed-42 stream. A NumPy stream IS reproducible here by
  * injecting NumPy's raw state (`bg.state['state']`) via [[Pcg64.fromRaw]].
  */
final class Pcg64 private (
    private var hi: Long, private var lo: Long,
    private val incHi: Long, private val incLo: Long) {
  import Pcg64._

  /** state = state * MULT + inc (mod 2^128). */
  private def step(): Unit = {
    val nLo = lo * MULT_LO
    val nHi = hi * MULT_LO + lo * MULT_HI + umulHi(lo, MULT_LO)
    val sLo = nLo + incLo
    val carry = if (java.lang.Long.compareUnsigned(sLo, nLo) < 0) 1L else 0L
    hi = nHi + incHi + carry
    lo = sLo
  }

  /** Next raw 64-bit output: step first, then XSL-RR of the new state
    * (the 128-bit-state variants in pcg_variants.h step before output).
    */
  def next64(): Long = {
    step()
    java.lang.Long.rotateRight(hi ^ lo, (hi >>> 58).toInt)
  }

  /** Uniform in [0,1) with a full 53-bit mantissa — NumPy's conversion. */
  def nextDouble(): Double = (next64() >>> 11).toDouble / 9007199254740992.0

  /** Jump the state `delta` draws ahead in O(log delta) 128-bit multiplies
    * (Brown's arbitrary-stride algorithm; `delta` is interpreted unsigned).
    */
  def advance(delta: Long): Unit = {
    var cmHi = MULT_HI; var cmLo = MULT_LO    // cur_mult
    var cpHi = incHi; var cpLo = incLo        // cur_plus
    var amHi = 0L; var amLo = 1L              // acc_mult = 1
    var apHi = 0L; var apLo = 0L              // acc_plus = 0
    var d = delta
    while (d != 0L) {
      if ((d & 1L) == 1L) {
        // acc_mult *= cur_mult
        val mHi = amHi * cmLo + amLo * cmHi + umulHi(amLo, cmLo)
        val mLo = amLo * cmLo
        // acc_plus = acc_plus * cur_mult + cur_plus
        val pmHi = apHi * cmLo + apLo * cmHi + umulHi(apLo, cmLo)
        val pmLo = apLo * cmLo
        val sLo = pmLo + cpLo
        val c = if (java.lang.Long.compareUnsigned(sLo, pmLo) < 0) 1L else 0L
        amHi = mHi; amLo = mLo
        apHi = pmHi + cpHi + c; apLo = sLo
      }
      // cur_plus = (cur_mult + 1) * cur_plus
      val c1Lo = cmLo + 1L
      val c1Hi = cmHi + (if (c1Lo == 0L) 1L else 0L)
      val npHi = c1Hi * cpLo + c1Lo * cpHi + umulHi(c1Lo, cpLo)
      val npLo = c1Lo * cpLo
      // cur_mult *= cur_mult
      val nmHi = cmHi * cmLo + cmLo * cmHi + umulHi(cmLo, cmLo)
      val nmLo = cmLo * cmLo
      cpHi = npHi; cpLo = npLo
      cmHi = nmHi; cmLo = nmLo
      d >>>= 1
    }
    // state = acc_mult * state + acc_plus
    val fHi = amHi * lo + amLo * hi + umulHi(amLo, lo)
    val fLo = amLo * lo
    val sLo = fLo + apLo
    val c = if (java.lang.Long.compareUnsigned(sLo, fLo) < 0) 1L else 0L
    hi = fHi + apHi + c
    lo = sLo
  }
}

object Pcg64 {
  /** PCG_DEFAULT_MULTIPLIER_128 (pcg_variants.h). */
  val MULT_HI = 0x2360ED051FC65DA4L
  val MULT_LO = 0x4385DF649FCCF645L

  /** Unsigned high 64 bits of a*b (Java 17 lacks unsignedMultiplyHigh). */
  @inline private[core] def umulHi(a: Long, b: Long): Long =
    Math.multiplyHigh(a, b) + ((a >> 63) & b) + ((b >> 63) & a)

  /** pcg_setseq_128_srandom: inc = initseq<<1 | 1; state = 0; step;
    * state += initstate; step.
    */
  def seeded(initstateHi: Long, initstateLo: Long,
      initseqHi: Long, initseqLo: Long): Pcg64 = {
    val incHi = (initseqHi << 1) | (initseqLo >>> 63)
    val incLo = (initseqLo << 1) | 1L
    val g = new Pcg64(0L, 0L, incHi, incLo)
    g.step()                                  // state = inc
    val sLo = g.lo + initstateLo
    val c = if (java.lang.Long.compareUnsigned(sLo, g.lo) < 0) 1L else 0L
    g.hi = g.hi + initstateHi + c
    g.lo = sLo
    g.step()
    g
  }

  /** Resume from a raw (state, inc) pair — e.g. NumPy's
    * `bg.state['state']` dict — for exact NumPy stream reproduction.
    * `inc` must be odd (every pcg_setseq increment is).
    */
  def fromRaw(stateHi: Long, stateLo: Long, incHi: Long, incLo: Long): Pcg64 = {
    require((incLo & 1L) == 1L, "PCG64 increment must be odd")
    new Pcg64(stateHi, stateLo, incHi, incLo)
  }

  /** The engine's four-counter contract over the real PCG64: stream
    * identity (seed, model, sim) → initstate = (seed, model),
    * initseq = (0, sim) — injective, so distinct tuples get distinct
    * streams — then advance(step) and one draw. The draw at `step` equals
    * the (step+1)-th sequential draw of the stream, so a user iterating
    * the same stream with a reused [[Pcg64]] reproduces the engine's
    * traces draw-for-draw.
    */
  def uniform(seed: Long, model: Long, sim: Long, step: Long): Double = {
    val g = seeded(seed, model, 0L, sim)
    if (step != 0L) g.advance(step)
    g.nextDouble()
  }
}
