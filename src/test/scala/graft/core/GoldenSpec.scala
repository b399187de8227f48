package graft.core

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._
import graft.SparkTestBase

/** Golden-file determinism check (SURVEY §5.2 item 4): a seeded run's CSV
  * output is committed under src/test/resources/golden and byte-compared on
  * every run — the reference repo's manual notebook inspection, made a test.
  * A diff here means the RNG chain, model semantics, or sink format changed:
  * all are breaking changes for reproducibility and for the DuckDB oracle.
  */
class GoldenSpec extends SparkTestBase {

  private val specs = Seq(
    SimulationSpec(0, "coin_sequence", 20, 8, Seq(0.5), Nil, 42),
    SimulationSpec(1, "random_walk", 10, 6, Seq(0.6), Nil, 7),
    SimulationSpec(2, "coin_sequence", 5, 4, Seq(0.7), Seq("T", "T"), 9))
  private val goldenNames = Seq("golden_coin.csv", "golden_walk.csv", "golden_start.csv")

  test("seeded battery output is byte-identical to the committed golden files") {
    val tmp = Files.createTempDirectory("graft-golden")
    val withPaths = specs.zip(goldenNames).map { case (s, n) =>
      s.copy(outputPath = Some(s"$tmp/$n"))
    }
    TraceSink.writeReferenceCsv(new MCBattery(spark).simulate(withPaths), withPaths)
    goldenNames.foreach { n =>
      val got = Files.readAllLines(Paths.get(s"$tmp/$n")).asScala.toList
      val want = {
        val in = getClass.getResourceAsStream(s"/golden/$n")
        assert(in != null, s"missing committed golden resource /golden/$n")
        try scala.io.Source.fromInputStream(in).getLines().toList
        finally in.close()
      }
      assert(got == want, s"$n diverged from golden")
    }
  }
}
