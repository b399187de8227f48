package graft.core

import org.scalatest.funsuite.AnyFunSuite

class RngSpec extends AnyFunSuite {

  test("uniform is deterministic and in [0,1)") {
    val u1 = DeterministicRng.uniform(42, 0, 7, 3)
    val u2 = DeterministicRng.uniform(42, 0, 7, 3)
    assert(u1 == u2)
    for (seed <- 0L to 50L; step <- 0L to 20L) {
      val u = DeterministicRng.uniform(seed, 1, 2, step)
      assert(u >= 0.0 && u < 1.0)
    }
  }

  test("distinct counters give distinct streams (no collisions on a grid)") {
    val vals = for (sim <- 0L until 100L; step <- 0L until 20L)
      yield DeterministicRng.hash(42, 0, sim, step)
    // 2000 draws from [0, 2^31): birthday bound ~ 2000^2/2^32 ≈ 0.1% collision
    assert(vals.distinct.size >= vals.size - 1)
  }

  test("mean and variance look uniform (moment check)") {
    val n = 20000
    val us = (0 until n).map(i => DeterministicRng.uniform(123, 0, i / 20, i % 20))
    val mean = us.sum / n
    val varr = us.map(u => (u - mean) * (u - mean)).sum / n
    assert(math.abs(mean - 0.5) < 0.01, s"mean=$mean")
    assert(math.abs(varr - 1.0 / 12) < 0.01, s"var=$varr")
  }

  test("adjacent steps are not correlated (lag-1 autocorrelation)") {
    val n = 20000
    val us = (0 until n).map(i => DeterministicRng.uniform(7, 0, 0, i))
    val mean = us.sum / n
    val num = (0 until n - 1).map(i => (us(i) - mean) * (us(i + 1) - mean)).sum
    val den = us.map(u => (u - mean) * (u - mean)).sum
    assert(math.abs(num / den) < 0.03, s"lag1=${num / den}")
  }

  test("adjacent sims are not correlated") {
    val n = 10000
    val a = (0 until n).map(i => DeterministicRng.uniform(7, 0, i, 0))
    val b = (0 until n).map(i => DeterministicRng.uniform(7, 0, i + 1, 0))
    val ma = a.sum / n; val mb = b.sum / n
    val num = (0 until n).map(i => (a(i) - ma) * (b(i) - mb)).sum
    val den = math.sqrt(a.map(x => (x - ma) * (x - ma)).sum * b.map(x => (x - mb) * (x - mb)).sum)
    assert(math.abs(num / den) < 0.03, s"corr=${num / den}")
  }

  test("chi-square on 16 bins is sane") {
    val n = 32000
    val bins = new Array[Int](16)
    (0 until n).foreach { i =>
      bins((DeterministicRng.uniform(99, 2, i / 16, i % 16) * 16).toInt) += 1
    }
    val exp = n / 16.0
    val chi2 = bins.map(b => (b - exp) * (b - exp) / exp).sum
    // df=15; P(chi2 > 45) < 0.0001 — wide bound, just catches gross bias
    assert(chi2 < 45, s"chi2=$chi2 bins=${bins.mkString(",")}")
  }

  test("RNG family salts decorrelate streams; names map per reference enum") {
    assert(RngFamily.fromName(None) == RngFamily.PCG64) // default, models.py:25
    assert(RngFamily.fromName(Some("Philox")) == RngFamily.Philox)
    intercept[IllegalArgumentException] { RngFamily.fromName(Some("nope")) }
    val a = (0 until 1000).map(i => DeterministicRng.uniform(42 + RngFamily.PCG64.salt, 0, i, 0))
    val b = (0 until 1000).map(i => DeterministicRng.uniform(42 + RngFamily.Philox.salt, 0, i, 0))
    assert(a != b)
  }

  test("StepRng draws the counter stream sequentially") {
    val r = new StepRng(42, 0, 7, RngFamily.CounterHash)
    val direct = (0 until 5).map(s => DeterministicRng.uniform(42, 0, 7, s))
    val drawn = (0 until 5).map(_ => r.nextUniform())
    assert(direct == drawn)
    // the default family is the real PCG64 backend (reference default)
    val d = new StepRng(42, 0, 7)
    val pcg = (0 until 5).map(s => Pcg64.uniform(42, 0, 7, s))
    assert((0 until 5).map(_ => d.nextUniform()) == pcg)
  }

  test("nextGaussian has roughly standard moments") {
    val r = new StepRng(1234, 0, 0)
    val n = 20000
    val zs = (0 until n).map(_ => r.nextGaussian())
    val mean = zs.sum / n
    val varr = zs.map(z => (z - mean) * (z - mean)).sum / n
    assert(math.abs(mean) < 0.03, s"mean=$mean")
    assert(math.abs(varr - 1.0) < 0.05, s"var=$varr")
  }
}
