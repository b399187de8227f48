package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType, StringType, StructField, StructType}

/** End-to-end COMPOSED streaming ingest at batch-Pipeline parity
  * (VERDICT r9 #1 + r10 #1): the chain JSONL landing → parse/quarantine
  * → exact dedup (within-batch AND cross-batch via the persisted digest
  * index) → minhash decontamination against a fixed corpus index →
  * history near-dup dedup (paraphrases of docs the stream already
  * published) → within-batch near-dup dedup → optional semantic LSH
  * decontamination → classifier floor → versioned snapshot publish,
  * driven as ONE checkpointed query with a mid-feed stop/restart, and
  * proved equal to the batch composition of the same stages over the
  * same landed files. The single-op twins are pinned in StreamingSpec;
  * this spec hunts the bugs that only live in the COMPOSITION — offset
  * replay across a restart, the publish→index-append ordering, a dup
  * arriving in a later micro-batch than its original.
  */
class StreamingIngestSpec extends SparkTestBase {

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  private def jline(id: Long, text: String): String =
    s"""{"doc_id":$id,"text":"$text"}"""

  test("ingestPipeline: exact + near-dup dedup across batches; restart resumes; equals the batch composition") {
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
    def scoreOf(texts: Seq[(Long, String)]): Map[Long, Double] =
      graft.operators.TextOps.scoreLinear(texts.toDF("doc_id", "text"), model)
        .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap

    // the feed — every dedup class the batch Pipeline drops:
    //   102  near-dups the FIXED corpus            -> corpus-index stage
    //   106  exact copy of 101, LATER batch        -> cross-batch digest probe
    //   107  paraphrase of 103, later RUN          -> history minhash probe
    //   109  exact copy of 108, SAME batch         -> within-batch keep-min
    //   111  paraphrase of 110, SAME batch         -> within-batch minhash
    //   115  engineered lowest scorer              -> classifier floor
    val d101 = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val d102 = baseText // EXACT corpus text -> jac 1.0, must be dropped
    val d103 = "completely fresh survey of partition pruning and skew " +
      "handling with salted keys across many very large shuffle stages"
    val d104 = "spark table query engine relational operators window " +
      "functions aggregation joins sorting sketches profiling audits"
    val d105 = "one two three four five six seven eight nine ten eleven " +
      "twelve thirteen fourteen fifteen sixteen seventeen eighteen"
    val d107 = d103 + " zebra" // jac 17/18 vs d103 — history near-dup
    val d108 = "archive ledger granite harbor velvet crimson anchor " +
      "lantern meadow cobalt prism ember willow falcon breeze summit"
    val d110 = "orchard tunnel marble quiver sonnet glacier pepper " +
      "mosaic thunder ribbon casket violet hammer sparrow nectar dune"
    val d111 = d110 + " maple" // within-batch near-dup of d110
    // floor victim: 20 copies of the most NEGATIVE-weight word from a
    // pool — self-calibrating, strictly below every doc above
    val pool = Seq("aardvark", "bramble", "cinder", "dapple", "eddy",
      "fjord", "gusset", "hollow", "imprint", "jumble")
    val wordScores = scoreOf(pool.zipWithIndex.map { case (w, i) => (i.toLong, w) })
      .toSeq.sortBy(_._2)
    val lowWord = pool(wordScores.head._1.toInt)
    require(wordScores.head._2 < 0, s"test pool needs a negative-weight word")
    val d115 = Seq.fill(20)(lowWord).mkString(" ")

    val goodTexts = Seq(101L -> d101, 103L -> d103, 104L -> d104,
      105L -> d105, 106L -> d101, 107L -> d107, 108L -> d108,
      109L -> d108, 110L -> d110, 111L -> d111)
    val scores = scoreOf(goodTexts :+ (115L -> d115))
    require(scores(115L) < goodTexts.map(t => scores(t._1)).min,
      s"floor victim must be the strict minimum: $scores")
    // floor drops EXACTLY 115 — every dedup-stage doc sits above it, so
    // the absence of 106/107/109/111 below can only come from dedup
    val minScore = (scores(115L) + goodTexts.map(t => scores(t._1)).min) / 2

    def land(name: String, lines: Seq[String]): Unit =
      java.nio.file.Files.write(java.nio.file.Paths.get(landing, name),
        lines.mkString("\n").getBytes("UTF-8"))
    land("f1.jsonl", Seq(
      jline(101, d101), jline(102, d102),
      """{"doc_id":9001,"text": TRUNCATED""", // malformed_json
      jline(103, d103), jline(115, d115)))

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
      assert(!afterRun1.contains(115L), "floor victim must be dropped")
      assert(afterRun1.contains(101L) && afterRun1.contains(103L),
        s"run-1 anchors must publish: $afterRun1")

      // files land WHILE THE QUERY IS DOWN — the restart must pick them
      // up from the checkpointed file-source offsets without replaying
      // f1, and the history index (reconciled at start) must still drop
      // 106 (exact dup of published 101) and 107 (paraphrase of
      // published 103) even though their originals ran BEFORE the restart
      land("f2.jsonl", Seq(
        jline(104, d104),
        """{"text":"no id on this record"}""", // missing_required
        jline(106, d101), jline(108, d108), jline(109, d108),
        jline(110, d110), jline(111, d111)))
      land("f3.jsonl", Seq(jline(105, d105), jline(107, d107)))
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

      // every dedup class absent, each attributable to its stage (all
      // four sit ABOVE the floor by construction)
      val pub = published.toSet
      assert(!pub.contains(106L), "cross-batch exact dup escaped the digest probe")
      assert(!pub.contains(107L), "cross-restart paraphrase escaped the history index")
      assert(!pub.contains(109L), "within-batch exact dup escaped keep-min")
      assert(!pub.contains(111L), "within-batch near-dup escaped minhash+keepCanonical")
      assert(pub == Set(101L, 103L, 104L, 105L, 108L, 110L),
        s"published $pub")

      // === equality with the batch composition (the graft.Pipeline
      // document-side stages) over the same landed files ===
      val batchParsed = graft.sources.CorpusSource.readJsonl(
        spark, landing, schema, Seq("doc_id", "text"))
      def shape(df: org.apache.spark.sql.DataFrame) = df.select(col("doc_id"),
        lit("und").as("lang"), length(col("text")).cast("long").as("n_chars"),
        col("text"))
      // stage 2: exact dedup, keep min doc_id per digest
      val keepIds = batchParsed.good.groupBy(md5(col("text")).as("d"))
        .agg(min(col("doc_id")).as("doc_id")).select("doc_id")
      val exact = batchParsed.good.join(keepIds, Seq("doc_id"), "left_semi")
      // stage 3: decontaminate vs the fixed corpus index
      val corpusDups = graft.operators.DedupOps
        .minhashPairsAgainst(index, shape(exact))
        .select(col("doc_new").as("doc_id")).distinct()
      val fresh0 = exact.join(corpusDups, Seq("doc_id"), "left_anti")
      // stage 4: near-dup dedup within the delivery (pairs → components →
      // canonical) — the batch twin of the stream's history + within-batch
      // stages (arrival order agrees with doc_id order here, so the
      // canonical choices coincide)
      val fresh = graft.operators.DedupOps.keepCanonical(fresh0,
        graft.operators.DedupOps.nearDupClusters(
          graft.operators.DedupOps.minhashPairs(shape(fresh0))))
      // stage 5: classifier floor
      val batchKept = graft.operators.TextOps.scoreLinear(
          fresh.select("doc_id", "text"), model)
        .filter(col("score") >= minScore)
        .collect().map(_.getLong(0)).toSet
      assert(pub == batchKept,
        s"stream ${pub.toSeq.sorted} vs batch ${batchKept.toSeq.sorted}")

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

      // the history index covers exactly the published versions (the
      // reconcile invariant a crash-heal depends on)
      val idxVersions = spark.read.parquet(s"$snapRoot/_ingest_index/digests")
        .select(col("version").cast("long")).distinct()
        .collect().map(_.getLong(0)).toSet
      assert(idxVersions == versions.toSet,
        s"index versions $idxVersions vs published ${versions.toSet}")
    } finally { index._1.unpersist(); index._2.unpersist() }
  }

  test("ingestPipeline: semantic LSH decontamination drops embedding-near-bench docs") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-ingest-sem").toString
    val landing = s"$base/landing"; new java.io.File(landing).mkdirs()

    val embSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("embedding", ArrayType(DoubleType))))
    val corpus = Seq((1L, "en", 60L, "completely unrelated held corpus " +
      "document about networking throughput and congestion windows"))
      .toDF("doc_id", "lang", "n_chars", "text")
    val index = graft.operators.DedupOps.minhashIndex(corpus)
    // bench vector (DIM = 64, the fixed hyperplane width): identical
    // signatures in EVERY LSH table for an identical embedding — the drop
    // is deterministic, and the exact cosine verify rejects accidental
    // bucket-mates
    val benchVec = Array.tabulate(64)(i => if (i % 2 == 0) 0.5f else -0.5f)
    val orthoVec = Array.fill(64)(0.5) // dot(bench, ortho) = 0 -> cos 0.0
    val bench = Seq((900L, benchVec)).toDF("vec_id", "embedding")
    val contaminated = "this training document paraphrases an eval item"
    val clean = "this training document is genuinely novel content"
    def jemb(id: Long, text: String, e: Array[Double]): String =
      s"""{"doc_id":$id,"text":"$text","embedding":[${e.mkString(",")}]}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(landing, "f1.jsonl"),
      Seq(
        jemb(201, contaminated, benchVec.map(_.toDouble)),   // cos 1.0 -> drop
        jemb(202, clean, orthoVec))                          // cos 0.0 -> keep
        .mkString("\n").getBytes("UTF-8"))

    val model = spark.range(1).select(lit(0L).as("feature"), lit(0.0).as("weight"))
    val q = StreamOps.ingestPipeline(spark, landing, embSchema,
      required = Seq("doc_id", "text"), corpusIndex = index, model = model,
      minScore = Double.NegativeInfinity, snapRoot = s"$base/snap",
      quarantineDir = s"$base/quarantine", checkpointDir = s"$base/ckpt",
      benchEmbeddings = Some(bench), semThreshold = 0.40)
    try q.processAllAvailable() finally q.stop()

    val pub = graft.sources.SnapshotStore.read(spark, s"$base/snap")
    assert(pub.select("doc_id").collect().map(_.getLong(0)).toSet == Set(202L),
      "semantic decontamination must drop 201 (cos 1.0) and keep 202 (cos 0.0)")
    // the embedding column rides into the published version
    assert(pub.columns.contains("embedding"))
  }

  test("ingestPipeline maintenance: compactEvery folds increments, keepFull bounds versions, dedup survives the index rewrite") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-ingest-mnt").toString
    val landing = s"$base/landing"; new java.io.File(landing).mkdirs()
    val snapRoot = s"$base/snap"

    val corpus = Seq((1L, "en", 60L, "held reference corpus about container " +
      "orchestration and service meshes that matches nothing below"))
      .toDF("doc_id", "lang", "n_chars", "text")
    val index = graft.operators.DedupOps.minhashIndex(corpus)
    val model = spark.range(1).select(lit(0L).as("feature"), lit(0.0).as("weight"))
    val dA = "granite summit ledger velvet falcon meadow crimson anchor " +
      "lantern cobalt prism ember willow breeze harbor archive quiver"
    val dB = "orchard tunnel marble sonnet glacier pepper mosaic thunder " +
      "ribbon casket violet hammer sparrow nectar dune cipher tundra"
    val dC = "galaxy nebula quasar photon meteor comet aurora eclipse " +
      "orbit zenith parallax spectrum pulsar corona telescope horizon"
    val dD = "harvest barley clover furrow sickle meadowlark granary " +
      "paddock fallow thresher windmill silo pasture orchardist plough"
    val dE = "voltage capacitor inductor resistor transistor diode " +
      "amplifier oscillator rectifier transformer circuit breaker relay"
    val dF = "basalt rhyolite gneiss schist marble quartzite obsidian " +
      "pumice granite andesite dolomite shale limestone slate chert"

    def run(): Unit = {
      val q = StreamOps.ingestPipeline(spark, landing, schema,
        required = Seq("doc_id", "text"), corpusIndex = index, model = model,
        minScore = Double.NegativeInfinity, snapRoot = snapRoot,
        quarantineDir = s"$base/quarantine", checkpointDir = s"$base/ckpt",
        compactEvery = 2, keepFull = 1)
      try q.processAllAvailable() finally q.stop()
    }
    def land(name: String, lines: Seq[String]): Unit =
      java.nio.file.Files.write(java.nio.file.Paths.get(landing, name),
        lines.mkString("\n").getBytes("UTF-8"))
    def versionIds: Set[Long] = graft.sources.SnapshotStore
      .versions(spark, snapRoot).collect().map(_.getLong(0)).toSet
    def fullMarkers: Set[Long] = new java.io.File(s"$snapRoot/_ingest_index")
      .listFiles().toSeq.map(_.getName)
      .filter(n => n.startsWith("full_v=") && n.endsWith(".marker"))
      .map(_.stripPrefix("full_v=").stripSuffix(".marker").toLong).toSet
    def corpusIds: Set[Long] = StreamOps.ingestCorpus(spark, snapRoot)
      .select("doc_id").collect().map(_.getLong(0)).toSet

    // run 1: one increment — below the compaction threshold
    land("f1.jsonl", Seq(jline(401, dA), jline(402, dB)))
    run()
    assert(versionIds == Set(1L) && corpusIds == Set(401L, 402L))

    // run 2: second increment trips compactEvery=2 — the log folds into
    // ONE full snapshot and the increments vacuum away (keepFull=1)
    land("f2.jsonl", Seq(jline(403, dC)))
    run()
    assert(versionIds == Set(3L),
      s"after compaction only the full snapshot remains: $versionIds")
    assert(fullMarkers == Set(3L))
    assert(graft.sources.SnapshotStore.latestVersion(snapRoot).contains(3L),
      "live pointer must flip to the compacted version")
    assert(corpusIds == Set(401L, 402L, 403L))
    // live read never broken: the pointer target is always readable
    assert(graft.sources.SnapshotStore.read(spark, snapRoot).count() == 3L)
    // the rewritten index carries no sentinels, one digest per doc, all
    // re-tagged to the compacted version
    val dig = spark.read.parquet(s"$snapRoot/_ingest_index/digests")
    assert(dig.filter(col("digest") === "~").count() == 0L)
    assert(dig.select(col("version").cast("long")).distinct()
      .collect().map(_.getLong(0)).toSet == Set(3L))
    assert(dig.count() == 3L)

    // run 3: dedup must SURVIVE the rewrite — 405 is an exact dup of 401
    // (digest table) and 407 a paraphrase of 402 (minhash tables), both
    // published before the compaction
    land("f3.jsonl", Seq(jline(404, dD), jline(405, dA),
      jline(406, dE), jline(407, dB + " maple")))
    run()
    assert(versionIds == Set(3L, 4L))
    assert(corpusIds == Set(401L, 402L, 403L, 404L, 406L),
      s"post-compaction dedup failed: $corpusIds")

    // run 4: second compaction cycle — keepFull=1 drops the older full
    land("f4.jsonl", Seq(jline(408, dF)))
    run()
    assert(versionIds == Set(6L), s"second cycle versions: $versionIds")
    assert(fullMarkers == Set(6L), "older full snapshot's marker must go")
    assert(corpusIds == Set(401L, 402L, 403L, 404L, 406L, 408L))
    assert(StreamOps.ingestCorpus(spark, snapRoot)
      .select("doc_id").distinct().count() == 6L, "fold must stay duplicate-free")
  }

  test("ingestPipeline crash-heal: a lost or partial history index is rebuilt at start and dedup still works") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-ingest-heal").toString
    val landing = s"$base/landing"; new java.io.File(landing).mkdirs()
    val snapRoot = s"$base/snap"

    val corpus = Seq((1L, "en", 55L, "reference corpus about submarine " +
      "cable routing and landing stations that matches nothing below"))
      .toDF("doc_id", "lang", "n_chars", "text")
    val index = graft.operators.DedupOps.minhashIndex(corpus)
    val model = spark.range(1).select(lit(0L).as("feature"), lit(0.0).as("weight"))
    val dA = "citrus ladder whisper canyon mirror tempest drizzle copper " +
      "lantern saddle thicket plume harvest ember trellis brook"
    val dB = "binary heap traversal balanced rotations pivot quicksort " +
      "partition merge buffer stack recursion depth first search order"

    def run(): Unit = {
      val q = StreamOps.ingestPipeline(spark, landing, schema,
        required = Seq("doc_id", "text"), corpusIndex = index, model = model,
        minScore = Double.NegativeInfinity, snapRoot = snapRoot,
        quarantineDir = s"$base/quarantine", checkpointDir = s"$base/ckpt")
      try q.processAllAvailable() finally q.stop()
    }
    def land(name: String, lines: Seq[String]): Unit =
      java.nio.file.Files.write(java.nio.file.Paths.get(landing, name),
        lines.mkString("\n").getBytes("UTF-8"))
    def rm(path: String): Unit = {
      def go(f: java.io.File): Unit = {
        if (f.isDirectory && f.listFiles() != null) f.listFiles().foreach(go)
        f.delete(); ()
      }
      go(new java.io.File(path))
    }

    land("f1.jsonl", Seq(jline(501, dA), jline(502, dB)))
    run()

    // crash window 1: the WHOLE index is lost (e.g. a kill between the
    // rewrite's delete and move) — the startup reconcile must rebuild it
    // from the published versions, so a later exact dup and a later
    // paraphrase of run-1 docs are still dropped
    Seq("digests", "hashed", "bands").foreach(n => rm(s"$snapRoot/_ingest_index/$n"))
    land("f2.jsonl", Seq(jline(503, dA),                  // exact dup of 501
      jline(504, dB + " override")))                      // paraphrase of 502
    run()
    val pub2 = graft.sources.SnapshotStore.versions(spark, snapRoot)
      .collect().map(_.getLong(0)).flatMap(v =>
        graft.sources.SnapshotStore.readVersion(spark, snapRoot, v)
          .select("doc_id").collect().map(_.getLong(0))).toSet
    assert(pub2 == Set(501L, 502L),
      s"rebuilt index must still drop the dup and the paraphrase: $pub2")

    // crash window 2: a PARTIAL index (bands dir lost mid-append) — the
    // consistency guard must reset all three and rebuild, never probe a
    // digests/bands pair that disagrees
    rm(s"$snapRoot/_ingest_index/bands")
    land("f3.jsonl", Seq(jline(505, dB),                  // exact dup of 502
      jline(506, "entirely novel content about tidal estuaries sediment " +
        "transport and brackish marsh ecology measurements")))
    run()
    val pub3 = graft.sources.SnapshotStore.versions(spark, snapRoot)
      .collect().map(_.getLong(0)).flatMap(v =>
        graft.sources.SnapshotStore.readVersion(spark, snapRoot, v)
          .select("doc_id").collect().map(_.getLong(0))).toSet
    assert(pub3 == Set(501L, 502L, 506L),
      s"partial-index reset must heal before probing: $pub3")
    // the healed index covers the published docs exactly once: a doubled
    // shingle table would corrupt jaccard verify counts
    val hashed = spark.read.parquet(s"$snapRoot/_ingest_index/hashed")
    val dupShingles = hashed.groupBy("doc_id", "h")
      .count().filter(col("count") > 1).count()
    assert(dupShingles == 0L, "healed index must not double-index any doc")
  }

  test("ingestPipeline ANN maintenance: published vectors join the versioned IVF index; crash-heal and replay keep coverage exactly-once") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-ingest-ann").toString
    val landing = s"$base/landing"; new java.io.File(landing).mkdirs()
    val snapRoot = s"$base/snap"
    val annDir = s"$base/ann"
    val DIM = 8

    def vec(hot: Int, w: Double): Array[Double] =
      Array.tabulate(DIM)(i => if (i == hot) w else (1.0 - w) / 4)

    // persisted IVF index over the base corpus vectors, trained state =
    // two axis-aligned centroids (the ingest CONSUMES this index; it
    // never trains one)
    val cents = Seq((0L, vec(0, 1.0)), (1L, vec(1, 1.0))).toDF("cid", "ce")
    val baseVecs = Seq((1L, vec(0, 0.9)), (2L, vec(1, 0.9)))
      .toDF("vec_id", "embedding")
    graft.operators.SimilarityOps.writeIvfIndex(baseVecs, cents, annDir)

    val corpus = Seq((1L, "en", 52L, "reference corpus about glacier mass " +
      "balance and firn densification that matches nothing below"))
      .toDF("doc_id", "lang", "n_chars", "text")
    val index = graft.operators.DedupOps.minhashIndex(corpus)
    val model = spark.range(1).select(lit(0L).as("feature"), lit(0.0).as("weight"))
    val embSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("embedding", ArrayType(DoubleType))))
    val tA = "quartz meadow anvil ribbon sparrow delta furnace willow " +
      "compass ember lattice pebble harbor violet summit chalk"
    val tB = "packet scheduler latency jitter congestion window retransmit " +
      "buffer queue discipline fairness throughput backoff probing"
    val tC = "sourdough levain hydration autolyse crumb lamination scoring " +
      "proofing oven spring crust fermentation starter bench rest"

    def land(name: String, lines: Seq[String]): Unit =
      java.nio.file.Files.write(java.nio.file.Paths.get(landing, name),
        lines.mkString("\n").getBytes("UTF-8"))
    def jemb(id: Long, text: String, e: Array[Double]): String =
      s"""{"doc_id":$id,"text":"$text","embedding":[${e.mkString(",")}]}"""
    def run(): Unit = {
      val q = StreamOps.ingestPipeline(spark, landing, embSchema,
        required = Seq("doc_id", "text"), corpusIndex = index, model = model,
        minScore = Double.NegativeInfinity, snapRoot = snapRoot,
        quarantineDir = s"$base/quarantine", checkpointDir = s"$base/ckpt",
        annIndexDir = Some(annDir))
      try q.processAllAvailable() finally q.stop()
    }
    def indexedPairs(): Set[(Long, Long)] =
      graft.operators.SimilarityOps.readIvfIndexAll(spark, annDir)._2
        .select(col("vec_id"), col("cid").cast("long")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet

    land("f1.jsonl", Seq(jemb(301, tA, vec(0, 0.8)), jemb(302, tB, vec(1, 0.8))))
    run()
    val after1 = indexedPairs()
    assert(after1 == Set((1L, 0L), (2L, 1L), (301L, 0L), (302L, 1L)),
      s"published vectors must join the index under their nearest list: $after1")

    // crash window: publish + history index committed, ANN append lost —
    // the startup reconcile must restore the identical coverage
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory && f.listFiles() != null) f.listFiles().foreach(rm)
      f.delete(); ()
    }
    val v1 = graft.sources.SnapshotStore.manifestVersions(snapRoot).head
    rm(new java.io.File(s"$annDir/appends/version=$v1"))
    StreamOps.reconcileIvfAppends(spark, snapRoot, annDir)
    assert(indexedPairs() == after1,
      "reconcile must restore the lost append exactly")

    // restart with a new doc AND an exact cross-batch dup of 301: the
    // dup never publishes, so it never re-enters the ANN index either
    land("f2.jsonl", Seq(jemb(303, tC, vec(0, 0.7)), jemb(304, tA, vec(0, 0.8))))
    run()
    val after2 = indexedPairs()
    assert(after2 == after1 + ((303L, 0L)),
      s"second batch must add exactly the one genuinely new vector: $after2")
    val lists = graft.operators.SimilarityOps.readIvfIndexAll(spark, annDir)._2
    assert(lists.groupBy("vec_id").count().filter(col("count") > 1).count() == 0L,
      "no vector may be indexed twice across restarts and heals")

    // drift telemetry: one persisted report per published version, none
    // recommending retrain (the synthetic vectors sit on the manifold)
    val pub = graft.sources.SnapshotStore.manifestVersions(snapRoot).toSet
    val hist = graft.operators.SimilarityOps.ivfDriftHistory(spark, annDir)
      .collect()
    assert(hist.map(_.getAs[Long]("version")).toSet == pub,
      s"drift history ${hist.toSeq} must cover published $pub")
  }

  test("ingestPipeline: per-batch plan has no emptiness probe — job structure is independent of quarantine content (VERDICT r10 #5)") {
    import spark.implicits._
    // Two single-batch runs that differ ONLY in whether a malformed line
    // exists: with the unconditional quarantine append there is no
    // data-dependent isEmpty probe+skip branch, so the Spark job count is
    // IDENTICAL. (The removed probe cost one extra job per healthy batch
    // AND made the two runs differ by probe-vs-write.)
    val corpus = Seq((1L, "en", 50L, "held corpus row about something else " +
      "entirely with enough words for shingles to exist here"))
      .toDF("doc_id", "lang", "n_chars", "text")
    val index = graft.operators.DedupOps.minhashIndex(corpus)
    val model = spark.range(1).select(lit(0L).as("feature"), lit(0.0).as("weight"))
    val doc = "a perfectly healthy document with several words of content"

    def runOnce(name: String, extraLine: Option[String]): Int = {
      val base = java.nio.file.Files.createTempDirectory(s"graft-probe-$name").toString
      val landing = s"$base/landing"; new java.io.File(landing).mkdirs()
      java.nio.file.Files.write(java.nio.file.Paths.get(landing, "f1.jsonl"),
        (Seq(jline(301, doc)) ++ extraLine).mkString("\n").getBytes("UTF-8"))
      val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet(); ()
        }
      }
      spark.sparkContext.addSparkListener(listener)
      try {
        val q = StreamOps.ingestPipeline(spark, landing, schema,
          required = Seq("doc_id", "text"), corpusIndex = index, model = model,
          minScore = Double.NegativeInfinity, snapRoot = s"$base/snap",
          quarantineDir = s"$base/quarantine", checkpointDir = s"$base/ckpt")
        try q.processAllAvailable() finally q.stop()
      } finally spark.sparkContext.removeSparkListener(listener)
      // the listener bus is async and has no public drain — the query is
      // fully stopped, so a short settle suffices for the START events
      Thread.sleep(1000)
      jobs.get()
    }

    val cleanJobs = runOnce("clean", None)
    val dirtyJobs = runOnce("dirty", Some("""{"doc_id":9,"text": BROKEN"""))
    assert(cleanJobs == dirtyJobs,
      s"per-batch job structure must not depend on quarantine content: " +
        s"clean=$cleanJobs dirty=$dirtyJobs (a probe+skip branch is back?)")
    // both runs must still have produced a readable (possibly empty)
    // quarantine dir — the unconditional append's observable effect
  }
}
