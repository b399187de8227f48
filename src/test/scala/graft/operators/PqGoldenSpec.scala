package graft.operators

import java.nio.file.{Files, Paths}
import graft.SparkTestBase
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** Byte-for-byte pin of the trained PQ codebooks on the sf0.001
  * embeddings — the [[graft.core]] golden-file discipline applied to the
  * engine's trickiest numeric machinery (two distributed Lloyd
  * iterations per subspace over decimal-exact means). Any change to the
  * training value stream — hashing, assignment tie-breaks, mean
  * arithmetic, seed handling — fails this spec even if it happens to
  * keep the current oracle green (e.g. a change mirrored into the oracle
  * by accident).
  *
  * Regenerate deliberately with GRAFT_REGEN_GOLDEN=1 (the run then FAILS
  * so the diff is inspected before committing).
  */
class PqGoldenSpec extends SparkTestBase {

  test("trained PQ codebooks are byte-identical to the committed golden file") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val got = SimilarityOps.pqCodebooks(e).orderBy("sub", "cid").collect()
      .map { r =>
        val ce = r.getSeq[Double](2)
          .map(d => java.lang.Double.toString(d)).mkString(",")
        s"${r.getInt(0)}|${r.getLong(1)}|$ce"
      }.toList
    val name = "golden_pq_codebooks.txt"
    if (sys.env.contains("GRAFT_REGEN_GOLDEN")) {
      val dir = Paths.get("src/test/resources/golden")
      Files.createDirectories(dir)
      Files.write(dir.resolve(name), got.asJava)
      fail(s"GRAFT_REGEN_GOLDEN set: regenerated $name — inspect the diff, rerun without the flag")
    }
    val in = getClass.getResourceAsStream(s"/golden/$name")
    assert(in != null, s"missing committed golden resource /golden/$name")
    val want = try scala.io.Source.fromInputStream(in).getLines().toList finally in.close()
    assert(got == want, "PQ codebook value stream diverged from golden")
  }
}
