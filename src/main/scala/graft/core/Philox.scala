package graft.core

/** Philox-4x32-10 — the counter-based generator of Salmon, Moraes, Dror &
  * Shaw, "Parallel Random Numbers: As Easy as 1, 2, 3" (SC'11), per the
  * public Random123 specification. This is the REAL algorithm behind the
  * reference's `np.random.Philox` family name
  * (`parallel_simulations/parallel_simulations.py:121-130`), implemented as
  * a second RNG backend next to the SQL-oracle-expressible counter hash
  * ([[DeterministicRng]]): same counter-based architecture (any worker can
  * evaluate any (seed, model, sim, step) point statelessly — the property
  * that makes trace generation shuffle-free on a 1000-executor cluster),
  * cryptographically much stronger mixing, not expressible in oracle SQL —
  * which is why it is the opt-in family rather than the default.
  *
  * Verified against the Random123 known-answer test vectors (PhiloxSpec).
  *
  * NumPy-fidelity caveat (documented, accepted): `np.random.Philox` is the
  * 4x64-10 variant plus NumPy's own buffering/double-conversion layer, so
  * seeded NumPy traces still aren't reproduced verbatim; this backend gives
  * the genuine Philox bit-mixing with this engine's counter mapping.
  */
object Philox {
  // Round multipliers and Weyl key-schedule constants (Random123 philox.h).
  private val M0 = 0xD2511F53L
  private val M1 = 0xCD9E8D57L
  private val W0 = 0x9E3779B9L
  private val W1 = 0xBB67AE85L
  private val MASK = 0xFFFFFFFFL

  /** One 10-round philox4x32 block. Inputs/outputs are unsigned 32-bit
    * words carried in the low halves of longs. Layout per Random123: the
    * first round uses the key as given; the key is bumped by the Weyl
    * constants before each subsequent round (10 rounds, 9 bumps).
    */
  def block(c0: Long, c1: Long, c2: Long, c3: Long, k0: Long, k1: Long): Array[Long] = {
    var x0 = c0 & MASK; var x1 = c1 & MASK; var x2 = c2 & MASK; var x3 = c3 & MASK
    var key0 = k0 & MASK; var key1 = k1 & MASK
    var r = 0
    while (r < 10) {
      if (r > 0) {
        key0 = (key0 + W0) & MASK
        key1 = (key1 + W1) & MASK
      }
      val p0 = M0 * x0 // 64-bit product of unsigned 32-bit factors
      val p1 = M1 * x2
      val hi0 = p0 >>> 32; val lo0 = p0 & MASK
      val hi1 = p1 >>> 32; val lo1 = p1 & MASK
      x0 = hi1 ^ x1 ^ key0
      x2 = hi0 ^ x3 ^ key1
      x1 = lo1
      x3 = lo0
      r += 1
    }
    Array(x0, x1, x2, x3)
  }

  /** Uniform in [0, 1) at counter (seed, model, sim, step) — the engine's
    * four-counter contract mapped onto Philox's 128-bit counter + 64-bit
    * key: counter = (lo32(step), hi32(step), lo32(sim), hi32(sim)),
    * key = (fold32(seed), fold32(model)) where fold32(x) = lo32(x ^ x>>>32)
    * (battery seeds are < 2^32 after salting, so the fold is a no-op there;
    * it keeps distinct wider seeds from silently aliasing). The double gets
    * a full 53-bit mantissa from output words 0 and 1 (32 + 21 bits) — one
    * draw per counter tick, matching the engine's one-uniform-per-step
    * stream shape; words 2-3 of the block are unused (accepted: the
    * stateless counter contract regenerates the block per step, and
    * buffering across steps would reintroduce sequential state).
    */
  def uniform(seed: Long, model: Long, sim: Long, step: Long): Double = {
    val w = block(
      step & MASK, (step >>> 32) & MASK,
      sim & MASK, (sim >>> 32) & MASK,
      (seed ^ (seed >>> 32)) & MASK,
      (model ^ (model >>> 32)) & MASK)
    ((w(0) << 21) | (w(1) >>> 11)).toDouble / 9007199254740992.0
  }
}
