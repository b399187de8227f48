package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** End-to-end COMPOSED streaming ingest (VERDICT r9 #1): the chain
  * JSONL landing → parse/quarantine → minhash decontamination against a
  * fixed corpus index → classifier floor → versioned snapshot publish,
  * driven as ONE checkpointed query with a mid-feed stop/restart, and
  * proved equal to the batch composition of the same stages over the
  * same landed files. The single-op twins are pinned in StreamingSpec;
  * this spec hunts the bugs that only live in the COMPOSITION — offset
  * replay across a restart, quarantine/publish ordering, stage
  * interaction through the shared parser.
  */
class StreamingIngestSpec extends SparkTestBase {

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  private def jline(id: Long, text: String): String =
    s"""{"doc_id":$id,"text":"$text"}"""

  test("ingestPipeline: landed files flow to versioned snapshots; restart resumes; equals the batch composition") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-ingest").toString
    val landing = s"$base/landing"; new java.io.File(landing).mkdirs()
    val snapRoot = s"$base/snap"
    val quarantine = s"$base/quarantine"
    val ckpt = s"$base/ckpt"

    // released corpus (the decontamination target): ~30-token docs so
    // 3-word shingles exist; index computed ONCE, the production shape
    val baseText = "the quick brown fox jumps over the lazy dog while the " +
      "spotted cat watches quietly from the warm stone windowsill every " +
      "single morning before the busy village market slowly opens its gates"
    val corpus = Seq(
      (1L, "en", baseText.length, baseText),
      (2L, "en", 100, "entirely different content describing shuffle " +
        "partitioning strategies and broadcast joins for large scale " +
        "distributed analytics engines running on many executors"))
      .toDF("doc_id", "lang", "n_chars", "text")
    val index = graft.operators.DedupOps.minhashIndex(corpus)
    index._1.persist(); index._2.persist()

    // classifier model: deterministic 256-bucket weights (the
    // scoreLinearStream spec construction)
    val model = spark.range(256).select(col("id").as("feature"),
      ((col("id") * 37 % 2001 - 1000).cast("double") / 1000.0).as("weight"))

    // the feed: file1 lands before the first run; file2 + file3 land
    // while the query is DOWN (the mid-chain restart window)
    val d101 = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val d102 = baseText // EXACT corpus text -> jac 1.0, must be dropped
    val d103 = "completely fresh survey of partition pruning and skew " +
      "handling with salted keys across many very large shuffle stages"
    val d104 = "spark table query engine relational operators window " +
      "functions aggregation joins sorting sketches profiling audits"
    val d105 = "one two three four five six seven eight nine ten eleven " +
      "twelve thirteen fourteen fifteen sixteen seventeen eighteen"
    def land(name: String, lines: Seq[String]): Unit =
      java.nio.file.Files.write(java.nio.file.Paths.get(landing, name),
        lines.mkString("\n").getBytes("UTF-8"))
    land("f1.jsonl", Seq(
      jline(101, d101), jline(102, d102),
      """{"doc_id":9001,"text": TRUNCATED""", // malformed_json
      jline(103, d103)))

    // choose the floor from the BATCH scorer so at least one good doc
    // falls below it (self-calibrating: no dependence on hash details)
    val allGood = Seq((101L, d101), (103L, d103), (104L, d104), (105L, d105))
    val scores = graft.operators.TextOps.scoreLinear(
        allGood.toDF("doc_id", "text"), model)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val sorted = scores.values.toSeq.sorted
    val minScore = sorted(1) // floor drops exactly the lowest scorer
    val expectKept = scores.filter(_._2 >= minScore).keySet

    def start() = StreamOps.ingestPipeline(spark, landing, schema,
      required = Seq("doc_id", "text"), corpusIndex = index, model = model,
      minScore = minScore, snapRoot = snapRoot, quarantineDir = quarantine,
      checkpointDir = ckpt)

    try {
      val q1 = start()
      try q1.processAllAvailable() finally q1.stop()
      val v1 = graft.sources.SnapshotStore.latestVersion(snapRoot)
      assert(v1.nonEmpty, "first run must have published at least one version")
      val afterRun1 = graft.sources.SnapshotStore.read(spark, snapRoot)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(!afterRun1.contains(102L), "corpus near-dup must be dropped")

      // files land WHILE THE QUERY IS DOWN — the restart must pick them
      // up from the checkpointed file-source offsets without replaying f1
      land("f2.jsonl", Seq(
        jline(104, d104),
        """{"text":"no id on this record"}""")) // missing_required
      land("f3.jsonl", Seq(jline(105, d105)))
      val q2 = start()
      try q2.processAllAvailable() finally q2.stop()

      // fold the delivery log: union of all versions = everything published
      val versions = graft.sources.SnapshotStore.versions(spark, snapRoot)
        .collect().map(_.getLong(0))
      assert(versions.length >= 2,
        s"expected one version per non-empty batch across runs, got $versions")
      val published = versions.flatMap(v =>
        graft.sources.SnapshotStore.readVersion(spark, snapRoot, v)
          .select("doc_id").collect().map(_.getLong(0)))
      // no doc published twice: graceful stop/restart must not replay f1
      assert(published.distinct.length == published.length,
        s"restart replayed a committed batch: ${published.toSeq.sorted}")

      // === equality with the batch composition over the same files ===
      val batchParsed = graft.sources.CorpusSource.readJsonl(
        spark, landing, schema, Seq("doc_id", "text"))
      val batchDedupIn = batchParsed.good.select(col("doc_id"),
        lit("und").as("lang"), length(col("text")).cast("long").as("n_chars"),
        col("text"))
      val batchDups = graft.operators.DedupOps
        .minhashPairsAgainst(index, batchDedupIn)
        .select("doc_new").collect().map(_.getLong(0)).toSet
      val batchKept = graft.operators.TextOps.scoreLinear(
          batchParsed.good.select("doc_id", "text"), model)
        .filter(col("score") >= minScore)
        .collect().map(_.getLong(0)).toSet -- batchDups
      assert(published.toSet == batchKept,
        s"stream ${published.toSeq.sorted} vs batch ${batchKept.toSeq.sorted}")
      assert(published.toSet == expectKept -- Set(102L),
        s"published ${published.toSet} vs engineered $expectKept")

      // quarantine parity: both bad lines landed exactly once, with the
      // right reasons, across the restart boundary
      val quar = spark.read.parquet(quarantine)
        .select("raw_line", "reason").collect()
        .map(r => (r.getString(0), r.getString(1)))
      assert(quar.length == 2, s"quarantine rows: ${quar.toSeq}")
      assert(quar.count(_._2 == "malformed_json") == 1 &&
        quar.count(_._2 == "missing_required") == 1, quar.toSeq.toString)
      val batchQuar = batchParsed.quarantine
        .select("raw_line", "reason").collect()
        .map(r => (r.getString(0), r.getString(1)))
      assert(quar.toSet == batchQuar.toSet,
        s"stream quarantine ${quar.toSet} vs batch ${batchQuar.toSet}")

      // published versions carry the score column (the floor's evidence)
      val withScore = graft.sources.SnapshotStore.read(spark, snapRoot)
      assert(withScore.columns.contains("score"))
    } finally { index._1.unpersist(); index._2.unpersist() }
  }
}
