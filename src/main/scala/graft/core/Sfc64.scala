package graft.core

/** SFC64 — Chris Doty-Humphrey's Small Fast Chaotic generator (from the
  * public PractRand suite; the algorithm NumPy ships as `np.random.SFC64`):
  * three 64-bit chaotic words plus a counter,
  *
  *   out = a + b + counter++;  a = b ^ (b >>> 11);
  *   b = c + (c << 3);         c = rotl(c, 24) + out
  *
  * KAT-verified (Sfc64Spec): cross-validated word-for-word against NumPy's
  * C implementation by raw-state injection, with the published reference
  * seeding (a = b = c = seed words, counter = 1, 12 discarded warmup
  * draws).
  *
  * Like [[Mt19937]], SFC64 is chaotic — no jump-ahead exists at all — so
  * it backs the engine as a SEQUENTIAL STREAM per (seed, model, sim): the
  * three counters are the three seed words, streams are independent across
  * simulations, draws are consumed in step order within a trace. Stateless
  * single-point access costs O(step) (documented; prefer PCG64/Philox/
  * CounterHash for point access).
  */
final class Sfc64 private (
    private var a: Long, private var b: Long,
    private var c: Long, private var counter: Long) {

  def next64(): Long = {
    val out = a + b + counter
    counter += 1
    a = b ^ (b >>> 11)
    b = c + (c << 3)
    c = java.lang.Long.rotateLeft(c, 24) + out
    out
  }

  /** Uniform in [0,1) with a 53-bit mantissa (NumPy's conversion). */
  def nextDouble(): Double = (next64() >>> 11).toDouble / 9007199254740992.0
}

object Sfc64 {
  /** Reference seeding: state = the three seed words, counter = 1, then 12
    * warmup draws discarded (sfc64 reference code / NumPy `sfc64_seed`).
    */
  def seeded(s1: Long, s2: Long, s3: Long): Sfc64 = {
    val g = new Sfc64(s1, s2, s3, 1L)
    var i = 0
    while (i < 12) { g.next64(); i += 1 }
    g
  }

  /** Resume from raw (a, b, c, counter) words — e.g. NumPy's
    * `bg.state['state']['state']` — for exact stream reproduction and KAT.
    */
  def fromRaw(a: Long, b: Long, c: Long, counter: Long): Sfc64 =
    new Sfc64(a, b, c, counter)

  /** Engine stream mapping: the three counters ARE the three seed words. */
  def stream(seed: Long, model: Long, sim: Long): Sfc64 =
    seeded(seed, model, sim)
}
