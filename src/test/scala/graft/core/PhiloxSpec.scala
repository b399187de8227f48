package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Known-answer tests for the Philox-4x32-10 backend against the public
  * Random123 distribution's kat_vectors (philox4x32, R=10), plus the
  * counter-based-architecture properties the engine relies on.
  */
class PhiloxSpec extends AnyFunSuite {

  private def hex(ws: Array[Long]): String = ws.map(w => f"$w%08x").mkString(" ")

  test("Random123 KAT: zero counter, zero key") {
    assert(hex(Philox.block(0L, 0L, 0L, 0L, 0L, 0L)) ==
      "6627e8d5 e169c58d bc57ac4c 9b00dbd8")
  }

  test("Random123 KAT: all-ones counter and key") {
    val f = 0xFFFFFFFFL
    assert(hex(Philox.block(f, f, f, f, f, f)) ==
      "408f276d 41c83b0e a20bc7c6 6d5451fd")
  }

  test("Random123 KAT: pi-digits counter and key") {
    assert(hex(Philox.block(
      0x243F6A88L, 0x85A308D3L, 0x13198A2EL, 0x03707344L,
      0xA4093822L, 0x299F31D0L)) ==
      "d16cfe09 94fdcceb 5001e420 24126ea1")
  }

  test("uniform is in [0,1), deterministic, and counter-sensitive") {
    val u = Philox.uniform(7L, 1L, 2L, 3L)
    assert(u >= 0.0 && u < 1.0)
    assert(u == Philox.uniform(7L, 1L, 2L, 3L))
    // flipping any single counter coordinate changes the draw
    assert(u != Philox.uniform(8L, 1L, 2L, 3L))
    assert(u != Philox.uniform(7L, 2L, 2L, 3L))
    assert(u != Philox.uniform(7L, 1L, 3L, 3L))
    assert(u != Philox.uniform(7L, 1L, 2L, 4L))
  }

  test("uniform stream is statistically sane (mean/uniformity smoke)") {
    val n = 20000
    val draws = (0 until n).map(i => Philox.uniform(42L, 0L, 0L, i.toLong))
    val mean = draws.sum / n
    assert(math.abs(mean - 0.5) < 0.01, s"mean = $mean")
    // decile occupancy within 20% of expected
    val deciles = draws.groupBy(u => (u * 10).toInt).view.mapValues(_.size)
    (0 until 10).foreach { d =>
      val c = deciles.getOrElse(d, 0)
      assert(math.abs(c - n / 10) < n / 50, s"decile $d count $c")
    }
  }
}
