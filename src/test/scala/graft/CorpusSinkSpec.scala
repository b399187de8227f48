package graft

import graft.sources.CorpusSink
import org.apache.spark.sql.functions._

/** The release-packaging contract: deterministic sharding, a manifest
  * that certifies the on-disk bytes, and detection of the delivery
  * corruption classes (truncation, duplication) a consumer re-manifest
  * must catch.
  */
class CorpusSinkSpec extends SparkTestBase {
  import spark.implicits._

  test("writeSharded: deterministic shards, complete manifest, re-manifest agrees") {
    val docs = graft.operators.Tables.t(spark, sfDir, "documents")
    val out = java.nio.file.Files.createTempDirectory("graft-corpus-sink").toString
    val m1 = CorpusSink.writeSharded(docs, out, col("doc_id"), 8)
      .orderBy("shard").collect()
    // every row landed in exactly one of the 8 shards
    assert(m1.map(_.getLong(1)).sum == docs.count())
    assert(m1.length <= 8 && m1.nonEmpty)
    // consumer-side re-manifest of the same directory certifies the bytes
    val m2 = CorpusSink.manifest(spark, out, col("doc_id")).orderBy("shard").collect()
    assert(m1.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      m2.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq)
    // shard assignment is a pure hash: a second write produces the
    // identical manifest (row order inside shards may differ — the
    // order-independent digest must not care)
    val out2 = java.nio.file.Files.createTempDirectory("graft-corpus-sink2").toString
    val m3 = CorpusSink.writeSharded(
        docs.orderBy(col("doc_id").desc), out2, col("doc_id"), 8)
      .orderBy("shard").collect()
    assert(m1.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      m3.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq)
  }

  test("manifest detects truncated and duplicated deliveries") {
    val docs = graft.operators.Tables.t(spark, sfDir, "documents").limit(100)
    val out = java.nio.file.Files.createTempDirectory("graft-corpus-tamper").toString
    val good = CorpusSink.writeSharded(docs, out, col("doc_id"), 4)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap

    // truncated: drop some rows -> count and digest both move
    val outT = java.nio.file.Files.createTempDirectory("graft-corpus-trunc").toString
    val trunc = CorpusSink.writeSharded(docs.filter(col("doc_id") % 7 =!= 0),
        outT, col("doc_id"), 4)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(trunc != good)

    // duplicated delivery: same ids twice -> digests XOR out to the
    // all-pairs cancellation, but n_rows doubles — the column PAIR catches
    // what either alone would miss
    val outD = java.nio.file.Files.createTempDirectory("graft-corpus-dup").toString
    val dup = CorpusSink.writeSharded(docs.unionAll(docs), outD, col("doc_id"), 4)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(dup.keySet == good.keySet)
    dup.foreach { case (s, (n, _)) => assert(n == 2 * good(s)._1) }
  }
}
