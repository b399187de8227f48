// Library-boundary smoke: drives the graft ops the way a USER would — from
// spark-shell against plain parquet tables, via the packaged jar only (no
// test classpath, no gate harness).
//
// Usage:
//   sbt package
//   /opt/spark/bin/spark-shell --master 'local[8]' \
//     --jars target/scala-2.13/parallelmontecarlosimulationsspark_2.13-0.1.0.jar \
//     --conf spark.ui.enabled=false \
//     --conf spark.driver.extraJavaOptions=-Dgraft.data=/root/testdata/sf0.01 \
//     -I tools/libcheck.scala < /dev/null
//
// Point -Dgraft.data at any directory holding documents/embeddings/events/
// customer parquet tables with the TESTDATA.md schemas. Exits 0 iff every
// surface returns rows and the sink round-trips.

import org.apache.spark.sql.functions._
import graft.operators.{AuditOps, DedupOps, EventOps, GraphOps, LayoutOps, SimilarityOps, SketchOps, TextOps}
import graft.multimodal.{MediaOps, MediaStub}
import graft.streaming.StreamOps
import graft.core.{MCBattery, RngFamily, SimulationSpec, TraceSink}

def runLibcheck(): Unit = {
  // events.ts contract is int64 nanos; normalizeTs folds timestamp-typed
  // parquet generations back to it (nanosAsLong covers NANOS parquet)
  spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
  spark.conf.set("spark.sql.session.timeZone", "UTC")
  val dataDir = sys.props.getOrElse("graft.data", "/root/testdata/sf0.01")
  val docs = spark.read.parquet(s"$dataDir/documents.parquet")
  val embs = spark.read.parquet(s"$dataDir/embeddings.parquet")
  val events = graft.operators.Tables.normalizeTs(
    spark.read.parquet(s"$dataDir/events.parquet"))
  val customers = spark.read.parquet(s"$dataDir/customer.parquet")

  def check(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
    val n = df.count()
    require(n > 0, s"$name returned 0 rows")
    println(f"$name%-32s ${n}%8d rows")
  }
  val bloomDimEarly = docs.filter(col("doc_id") % 10 === 0).select(col("doc_id"))

  // text analysis
  check("TextOps.tokenStats")(TextOps.tokenStats(docs))
  check("TextOps.quality")(TextOps.quality(docs))
  check("TextOps.langId")(TextOps.langId(docs))
  check("TextOps.repetition")(TextOps.repetition(docs))
  check("TextOps.trainValTest")(TextOps.trainValTest(docs))
  check("TextOps.topTerms")(TextOps.topTerms(docs))
  check("TextOps.stratifiedSampleHash")(
    TextOps.stratifiedSampleHash(docs, Map("en" -> 0.5, "de" -> 0.5)))
  check("TextOps.redactPii")(TextOps.redactPii(docs))
  check("TextOps.contamination")(TextOps.contamination(
    docs.filter(col("doc_id") % 50 =!= 0), docs.filter(col("doc_id") % 50 === 0)))
  check("TextOps.packSequences")(TextOps.packSequences(docs, 256))
  check("TextOps.chunkText")(TextOps.chunkText(docs, 16, 4))
  check("TextOps.lengthBuckets")(TextOps.lengthBuckets(docs, 16, 4, 2))
  check("TextOps.corpusReport")(TextOps.corpusReport(docs))
  check("TextOps.scoreLinear")(TextOps.scoreLinear(docs,
    spark.range(256).select(col("id").as("feature"),
      ((col("id") * 37 % 2001 - 1000).cast("double") / 1000.0).as("weight"))))
  check("TextOps.weightedSample")(TextOps.weightedSample(docs, "n_chars", 10))
  check("TextOps.capPerGroup")(TextOps.capPerGroup(docs, "source", col("n_chars"), 3))
  check("TextOps.bpePairs")(TextOps.bpePairs(docs))
  // persisted tokenizer artifacts (r14): train -> write -> read -> serve,
  // both families, via the public jar surface only
  val tokRoot = java.nio.file.Files.createTempDirectory("graft-tok").toString
  val tinyDocs = docs.filter(col("doc_id") < 300)
  val bpeM = TextOps.bpeTrain(tinyDocs, 3)
  TextOps.writeTokenizer(bpeM, s"$tokRoot/bpe", "bpe")
  val (bpeFam, bpeLoaded, _) = TextOps.readTokenizer(spark, s"$tokRoot/bpe")
  require(bpeFam == "bpe", s"tokenizer family round-trip: $bpeFam")
  check("TextOps.write/readTokenizer bpe")(
    TextOps.bpeEncode(tinyDocs, TextOps.bpeMergeSeq(bpeLoaded)))
  val uniM = TextOps.unigramModel(tinyDocs, candN = 50, maxPieceLen = 3, rounds = 1)
  TextOps.writeTokenizer(uniM, s"$tokRoot/uni", "unigram", 3)
  val (uniFam, uniLoaded, uniMpl) = TextOps.readTokenizer(spark, s"$tokRoot/uni")
  require(uniFam == "unigram" && uniMpl == 3, s"unigram manifest: $uniFam/$uniMpl")
  check("TextOps.write/readTokenizer uni")(
    TextOps.unigramEncode(tinyDocs, TextOps.unigramLp(uniLoaded), uniMpl))
  check("TextOps.bigramPerplexity")(TextOps.bigramPerplexity(docs))
  check("TextOps.trigramPerplexity")(TextOps.trigramPerplexity(docs))
  check("TextOps.mixWeights")(TextOps.mixWeights(docs))
  check("TextOps.mixEpochs")(TextOps.mixEpochs(docs, 1000000L))
  check("LayoutOps.zTiles")(graft.operators.LayoutOps.zTiles(
    events, pmod(col("user_id") * 131, lit(65536L)),
    pmod(col("event_id") * 521, lit(65536L))))
  // sketches
  check("SketchOps.kmvDistinct")(
    SketchOps.kmvDistinct(events, col("user_id"), "event_type", 64))
  check("SketchOps.kmvJaccard")(
    SketchOps.kmvJaccard(events, col("user_id"), "event_type", 64))
  check("SketchOps.skewReport")(SketchOps.skewReport(events, col("user_id")))
  check("SketchOps.bucketize")(
    SketchOps.bucketize(events, col("value"), Seq(1.0, 10.0)))
  check("SketchOps.cmsHeavyHitters")(
    SketchOps.cmsHeavyHitters(events, col("user_id"), 4, 1024, 5))
  check("SketchOps.histQuantiles")(
    SketchOps.histQuantiles(events, col("value"), 8L, 1024, Seq(500, 950)))
  check("SketchOps.profile")(SketchOps.profile(
    events.select(col("event_id"), col("user_id"), col("event_type"), col("value"))))
  check("SketchOps.profileTyped")(SketchOps.profileTyped(
    events.select(col("event_id"), col("user_id"), col("event_type"), col("value"))))
  check("SketchOps.amsF2")(SketchOps.amsF2(events, col("user_id")))
  check("SketchOps.cmsCounters")(
    SketchOps.cmsCounters(events, col("user_id"), 4, 1024))
  check("SketchOps.cmsTopKEstimates")(
    SketchOps.cmsTopKEstimates(events, col("user_id"), 4, 1024, 5))
  check("SketchOps.bloomPositions")(
    SketchOps.bloomPositions(bloomDimEarly, col("doc_id"), 1024, 3))
  check("SketchOps.exactQuantileRefine")(
    SketchOps.exactQuantileRefine(events, col("value"), "event_type",
      8L, 1024, Seq(500, 950)))
  check("StreamOps.latestByKey")(StreamOps.latestByKey(
    events, Seq("user_id", "event_type"), Seq(col("ts"), col("event_id"))))
  check("EventOps.cohortRetention")(EventOps.cohortRetention(
    events, call_function("div", col("ts").cast("long"), lit(1000L))))
  val bloomDim = bloomDimEarly
  val bloomMask = SketchOps.bloomBits(bloomDim, col("doc_id"), 1024, 3)
  check("SketchOps.bloomMayContain")(
    docs.filter(SketchOps.bloomMayContain(col("doc_id"), bloomMask, 1024, 3)))
  // dedup
  check("DedupOps.exactDedupStats")(DedupOps.exactDedupStats(docs))
  check("DedupOps.minhashPairs")(DedupOps.minhashPairs(docs))
  check("DedupOps.simhashPairs")(DedupOps.simhashPairs(docs))
  check("DedupOps.ngramJaccardPairs")(DedupOps.ngramJaccardPairs(docs))
  check("DedupOps.dedupEval")(DedupOps.dedupEval(
    DedupOps.simhashPairs(docs), DedupOps.ngramJaccardPairs(docs)))
  check("DedupOps.nearDupClustersStar")(
    DedupOps.nearDupClustersStar(DedupOps.minhashPairs(docs)))
  check("DedupOps.antiJoinDedup")(
    DedupOps.antiJoinDedup(docs, docs.filter(col("doc_id") % 50 === 0)))
  check("DedupOps.snapshotDiff")(DedupOps.snapshotDiff(
    docs.filter(col("doc_id") % 13 =!= 0), docs.filter(col("doc_id") % 10 =!= 0)))
  check("DedupOps.containmentPairs")(DedupOps.containmentPairs(docs))
  check("DedupOps.keepCanonical")(DedupOps.keepCanonical(docs,
    DedupOps.nearDupClusters(DedupOps.minhashPairs(docs))))
  check("GraphOps.pageRank")(GraphOps.pageRank(DedupOps.minhashPairs(docs)))
  check("TextOps.winnowPairs")(
    TextOps.winnowPairs(docs.filter(col("doc_id") < 200), minShared = 1))
  check("TextOps.chunkDedup")(TextOps.chunkDedup(docs))
  // similarity search
  val queries = embs.filter(col("vec_id") < 3)
    .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
  check("SimilarityOps.bruteTopK")(SimilarityOps.bruteTopK(embs, queries, 5))
  check("SimilarityOps.labelKnnGraph")(SimilarityOps.labelKnnGraph(embs, 5))
  check("SimilarityOps.bitextMine")(SimilarityOps.bitextMine(
    embs.filter(col("vec_id") % 2 === 0).limit(50),
    embs.filter(col("vec_id") % 2 === 1).limit(50)))
  check("SimilarityOps.bitextMineLsh")(SimilarityOps.bitextMineLsh(
    embs.filter(col("vec_id") % 2 === 0),
    embs.filter(col("vec_id") % 2 === 1), 4, 0.0, 4, 24, 99L))
  // column-expression surfaces: drive through a select over the corpus
  check("SimilarityOps.cosine")(embs.limit(20).crossJoin(
      embs.limit(1).select(col("embedding").as("e2")))
    .select(SimilarityOps.cosine(col("embedding"), col("e2")).as("cos")))
  check("SimilarityOps.lshSignature")(
    embs.select(SimilarityOps.lshSignature(col("embedding"), 4241L).as("sig")))
  val cents16 = embs.filter(col("vec_id") < 16)
    .select(col("vec_id").as("cid"), col("embedding").as("ce"))
  check("SimilarityOps.assignToCentroids")(
    SimilarityOps.assignToCentroids(embs, cents16))
  val trained = SimilarityOps.trainCentroids(embs, cents16, 1)
  check("SimilarityOps.trainCentroids")(trained)
  check("SimilarityOps.ivfTopK")(
    SimilarityOps.ivfTopK(embs, queries, trained, 3, 5))
  // persisted IVF index lifecycle: build, incremental append + drift
  // report, serve from the appended lists
  val ivfDir = java.nio.file.Files.createTempDirectory("graft-lc-ivf").toString
  SimilarityOps.writeIvfIndex(embs.filter(col("vec_id") % 2 === 0), trained, ivfDir)
  check("SimilarityOps.appendToIvfIndex")(SimilarityOps.appendToIvfIndex(
    spark, ivfDir, embs.filter(col("vec_id") % 2 === 1)))
  val (lcCents, lcLists) = SimilarityOps.readIvfIndex(spark, ivfDir)
  check("SimilarityOps.ivfTopKFromIndex")(
    SimilarityOps.ivfTopKFromIndex(lcLists, queries, lcCents, 3, 5))
  check("SimilarityOps.ivfPqTopK (trained coarse)")(
    SimilarityOps.ivfPqTopK(embs, queries, trained, 3, 5))
  check("SimilarityOps.pqCodebooks")(SimilarityOps.pqCodebooks(embs))
  check("SimilarityOps.nearPairs")(SimilarityOps.nearPairs(embs, 0.3))
  check("SimilarityOps.nearPairsLsh")(
    SimilarityOps.nearPairsLsh(embs, 0.3, 4, 48, 4241L))
  check("SimilarityOps.normalizeEmbeddings")(
    SimilarityOps.normalizeEmbeddings(embs))
  check("SimilarityOps.semanticDecontaminate")(
    SimilarityOps.semanticDecontaminate(
      embs.filter(col("vec_id") % 25 =!= 0),
      embs.filter(col("vec_id") % 25 === 0), 0.4, 4, 48, 4241L))
  check("SimilarityOps.quantizeInt8")(SimilarityOps.quantizeInt8(embs))
  check("SimilarityOps.lshTopK")(SimilarityOps.lshTopK(embs, queries, 5))
  check("SimilarityOps.randomProjection")(SimilarityOps.randomProjection(embs))
  check("SimilarityOps.labelCentroids")(SimilarityOps.labelCentroids(embs))
  check("SimilarityOps.centroidSimilarity")(SimilarityOps.centroidSimilarity(embs))
  check("SimilarityOps.semanticDedup")(SimilarityOps.semanticDedup(
    embs, embs.filter(col("vec_id") < 16)
      .select(col("vec_id").as("cid"), col("embedding").as("ce")), 0.3))
  check("SimilarityOps.pqCodes")(SimilarityOps.pqCodes(embs))
  check("SimilarityOps.pqTopK")(SimilarityOps.pqTopK(embs, queries, 5))
  check("SimilarityOps.ivfPqTopK")(SimilarityOps.ivfPqTopK(embs, queries,
    embs.filter(col("vec_id") < 16)
      .select(col("vec_id").as("cid"), col("embedding").as("ce")), 3, 5))
  check("SimilarityOps.annRecall")(SimilarityOps.annRecall(
    SimilarityOps.lshTopK(embs, queries, 5),
    SimilarityOps.bruteTopK(embs, queries, 5), 5))
  // multimodal plumbing (stub decode, real Spark shapes)
  check("MediaOps.thumbnail")(
    MediaOps.thumbnail(MediaStub.withPayload(docs.limit(50))))
  // streaming ops, batch twins
  check("StreamOps.scoreLinearStream (batch mode)")(
    StreamOps.scoreLinearStream(docs,
      spark.range(256).select(col("id").as("feature"),
        ((col("id") * 37 % 2001 - 1000).cast("double") / 1000.0).as("weight"))))
  check("StreamOps.tumblingCounts")(StreamOps.tumblingCounts(events))
  check("StreamOps.slidingCounts")(StreamOps.slidingCounts(events))
  check("StreamOps.userSessions")(StreamOps.userSessions(events))
  check("StreamOps.dedupEvents")(StreamOps.dedupEvents(events))
  check("StreamOps.enrichEvents")(StreamOps.enrichEvents(events, customers))
  check("StreamOps.funnelAttribution")(StreamOps.funnelAttribution(events, maxGapMin = 120))
  check("StreamOps.scd2History")(StreamOps.scd2History(
    events, Seq("user_id", "event_type"), Seq(col("ts"), col("event_id"))))
  check("TextOps.applyMixture")(TextOps.applyMixture(docs))
  check("TextOps.dsirScores")(TextOps.dsirScores(docs, col("source") === "src0"))
  check("TextOps.bm25")(TextOps.bm25(docs, Seq("query", "spark", "table")))
  check("TextOps.normalizeText")(TextOps.normalizeText(docs))
  check("DedupOps.minhashPairsAgainst")(DedupOps.minhashPairsAgainst(
    docs.filter(col("doc_id") % 7 =!= 0), docs.filter(col("doc_id") % 7 === 0)))
  // precomputed-index incremental form: index once, probe per batch
  val mhIndex = DedupOps.minhashIndex(docs.filter(col("doc_id") % 7 =!= 0))
  check("DedupOps.minhashIndex")(mhIndex._2)
  check("DedupOps.minhashPairsAgainst (index)")(DedupOps.minhashPairsAgainst(
    mhIndex, docs.filter(col("doc_id") % 7 === 0)))
  check("TextOps.applyMixtureRows")(TextOps.applyMixtureRows(docs))
  check("TextOps.tokenEntropy")(TextOps.tokenEntropy(docs))
  check("TextOps.zipfSlope")(TextOps.zipfSlope(docs))
  check("TextOps.tfidfPairs")(TextOps.tfidfPairs(docs))
  check("DedupOps.fuzzyPairs")(DedupOps.fuzzyPairs(
    docs, col("doc_id"), substring(col("text"), 1, 40), k = 2))
  check("DedupOps.hammingPairs")(DedupOps.hammingPairs(
    docs, col("doc_id"), substring(col("text"), 1, 40), k = 2))
  check("DedupOps.prefixJaccardPairs")(DedupOps.prefixJaccardPairs(docs))
  check("SimilarityOps.rrfFuse")(SimilarityOps.rrfFuse(
    SimilarityOps.lshTopK(embs, queries.filter(col("query_id") === 0), 5)
      .select(col("vec_id").as("id"), col("rank")),
    SimilarityOps.bruteTopK(embs, queries.filter(col("query_id") === 0), 5)
      .select(col("vec_id").as("id"), col("rank"))))
  check("SimilarityOps.covarianceMatrix")(SimilarityOps.covarianceMatrix(embs))
  check("SimilarityOps.pcaProject")(SimilarityOps.pcaProject(embs, 4))
  check("TextOps.bowFingerprint")(TextOps.bowFingerprint(docs))
  check("TextOps.stratifiedSample")(
    TextOps.stratifiedSample(docs, Map("en" -> 0.5, "de" -> 1.0), 42L))
  check("LayoutOps.zorder16")(events.select(graft.operators.LayoutOps.zorder16(
    pmod(col("user_id"), lit(65536L)), pmod(col("event_id"), lit(65536L))).as("z")))
  // streaming-definition ops runnable in batch mode (same code, one engine)
  check("StreamOps.clickErrorJoin")(StreamOps.clickErrorJoin(
    events.filter(col("event_type") === "click"),
    events.filter(col("event_type") === "error")))
  check("StreamOps.funnelAttributionStream (batch run)")(
    StreamOps.funnelAttributionStream(events, maxGapMin = 120).toDF(
      "user_id", "to_id", "to_us", "from_id", "from_us", "gap_us"))
  check("MediaOps.resizeToFit")(MediaOps.resizeToFit(
    MediaStub.decodeAll(spark, docs.limit(50)).toDF()))
  check("MediaOps.frameSample")(
    MediaOps.frameSample(MediaStub.withPayload(docs.limit(50))))
  check("MediaOps.thumbnailPixels")(
    MediaOps.thumbnailPixels(spark, MediaStub.withPayload(docs.limit(50))).toDF())
  check("MediaOps.audioMeta")(MediaOps.audioMeta(spark,
    spark.range(3).select(col("id").as("doc_id"),
      udf((i: Long) => MediaStub.synthWav(8000 + i.toInt * 1000, 1, 16, 200))
        .apply(col("id")).as("payload"))).toDF())
  check("MediaOps.frameSampleDecoded")(
    MediaOps.frameSampleDecoded(spark, MediaStub.withPayload(docs.limit(50))))
  // data-quality constraint suite + exact outliers + streaming twin
  check("AuditOps.dataQualityReport")(AuditOps.dataQualityReport(
    Map("documents" -> docs),
    Seq(AuditOps.Check.NotNull("documents", "text"),
      AuditOps.Check.UniqueKey("documents", Seq("doc_id")),
      AuditOps.Check.InRange("documents", "n_chars", "1", "1000000"))))
  check("AuditOps.outlierReport")(
    AuditOps.outlierReport(events, "event_type", "value", 3))
  check("StreamOps.dqViolationsStream (batch run)")(
    StreamOps.dqViolationsStream(events,
      Seq(AuditOps.Check.NotNull("events", "value"))))
  check("AuditOps.anomalyVerdicts")(AuditOps.anomalyVerdicts(
    events, "event_type", "ts", "event_id", "value", 3, 30))
  check("AuditOps.winsorize")(AuditOps.winsorize(
    events, col("value"), "event_type", 25, 975))
  check("AuditOps.aucReport")(AuditOps.aucReport(
    events, floor(col("value")), col("event_type") === "error"))
  check("AuditOps.robustOutlierReport")(AuditOps.robustOutlierReport(
    events, col("value"), "event_type"))
  check("AuditOps.numericAuditReport")(AuditOps.numericAuditReport(
    events, col("value"), "event_type"))
  check("AuditOps.calibrationReport")(AuditOps.calibrationReport(
    events, col("value") / 1000.0, col("event_type") === "error"))
  check("AuditOps.categoricalDrift")(AuditOps.categoricalDrift(
    docs, docs.filter(col("doc_id") % 3 =!= 0), "source"))
  check("AuditOps.ksReport")(AuditOps.ksReport(
    events, col("value"), col("event_type") === "error"))
  check("AuditOps.ksReportBy")(AuditOps.ksReportBy(
    docs, col("n_chars"), col("lang") === "en", "source"))
  check("AuditOps.thresholdReport")(AuditOps.thresholdReport(
    events, floor(col("value")), col("event_type") === "error"))
  check("AuditOps.benfordReport")(AuditOps.benfordReport(events, col("value")))
  check("TextOps.noveltyReport")(TextOps.noveltyReport(docs))
  check("EventOps.pseudonymize")(EventOps.pseudonymize(
    events, Seq("user_id"), "libchecksalt"))
  check("EventOps.gapFill")(EventOps.gapFill(events,
    call_function("div", col("ts").cast("long"), lit(1000L))))
  check("GraphOps.quarantineSet")(GraphOps.quarantineSet(
    DedupOps.minhashPairs(docs),
    docs.filter(col("doc_id") % 45 === 0).select("doc_id"), 2))
  check("EventOps.rollingDaily")(EventOps.rollingDaily(events,
    call_function("div", col("ts").cast("long"), lit(1000L))))
  check("TextOps.pmiCollocations")(TextOps.pmiCollocations(docs))
  check("EventOps.transitionCounts")(EventOps.transitionCounts(events))
  locally {
    import spark.implicits._
    check("StreamOps.transitionsStream (batch run)")(
      StreamOps.transitionsStream(events.select(col("user_id").as("user"),
        col("ts").cast("long").as("ord"), col("event_id").as("id"),
        col("event_type").as("tpe")).as[StreamOps.TransRow])
        .toDF("from_type", "to_type"))
  }
  locally {
    import spark.implicits._
    check("StreamOps.anomalyStream (batch run)")(
      StreamOps.anomalyStream(events.select(col("event_type").as("grp"),
        col("ts").as("ord"), col("event_id").as("id"),
        floor(col("value")).cast("long").as("x")).as[StreamOps.AnomRow])
        .toDF("grp", "id", "x"))
  }
  // record linkage with a compound blocking key
  check("DedupOps.fuzzyPairs(blockOn)")(DedupOps.fuzzyPairs(docs,
    col("doc_id"), concat_ws(" ", slice(split(col("text"), " "), 1, 3)),
    2, 4, Seq(col("lang"))))
  // bucketed layout: write once, join exchange-free
  LayoutOps.writeBucketed(docs.select("doc_id", "n_chars"),
    "lc_docs_a", Seq("doc_id"), 4)
  LayoutOps.writeBucketed(docs.select("doc_id", "lang"),
    "lc_docs_b", Seq("doc_id"), 4)
  check("LayoutOps.writeBucketed join")(
    spark.table("lc_docs_a").join(spark.table("lc_docs_b"), "doc_id"))
  spark.sql("DROP TABLE IF EXISTS lc_docs_a")
  spark.sql("DROP TABLE IF EXISTS lc_docs_b")

  // round-9 surfaces
  check("SketchOps.kmvSetOps")(
    SketchOps.kmvSetOps(events, col("user_id"), "event_type", 64))
  check("GraphOps.triangleStats")(GraphOps.triangleStats(
    DedupOps.minhashPairs(docs)))
  check("AuditOps.gainsReport")(AuditOps.gainsReport(
    events, floor(col("value")), col("event_type") === "error"))
  check("AuditOps.gainsReportBy")(AuditOps.gainsReportBy(
    docs, col("n_chars"), col("lang") === "en", "source", 5))
  check("AuditOps.categoricalDriftBy")(AuditOps.categoricalDriftBy(
    docs, docs.filter(col("doc_id") % 3 =!= 0), "lang", "source"))
  check("AuditOps.psiReportBy")(AuditOps.psiReportBy(
    docs, docs.filter(col("doc_id") % 3 =!= 0), "lang", "source"))
  check("AuditOps.kAnonymityReport")(AuditOps.kAnonymityReport(
    docs.withColumn("len_band", expr("n_chars div 200")),
    Seq("lang", "len_band"), col("source"), 5, 3))
  check("AuditOps.dpCounts")(AuditOps.dpCounts(
    docs, col("source"), seed = 7L))
  check("TextOps.cdcChunks")(TextOps.cdcChunks(docs, 3, 5))
  check("TextOps.cdcChunkDedup")(TextOps.cdcChunkDedup(docs, 3, 3))
  check("EventOps.markovAttribution")(EventOps.markovAttribution(
    events, "purchase"))
  check("SimilarityOps.mmrTopK")(SimilarityOps.mmrTopK(embs,
    embs.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe")),
    k = 3, pool = 8))
  check("SimilarityOps.mmrRerank")(SimilarityOps.mmrRerank(embs,
    SimilarityOps.lshTopK(embs,
      embs.filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("embedding").as("qe")),
      k = 8), k = 3))
  // lifecycle: JSONL round-trip, observed write, versioned snapshots
  val lcDir = java.nio.file.Files.createTempDirectory("graft-lc").toString
  graft.sources.CorpusSource.writeJsonl(
    docs.select("doc_id", "text").limit(20), s"$lcDir/jsonl")
  check("CorpusSource.readJsonl")(graft.sources.CorpusSource.readJsonl(spark,
    s"$lcDir/jsonl", org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType))), Seq("doc_id")).good)
  val obs = LayoutOps.writeObserved(docs.limit(30), s"$lcDir/obs", col("doc_id"))
  require(obs("n_rows") == 30L, s"writeObserved metrics off: $obs")
  println(f"LayoutOps.writeObserved          ${obs("n_rows")}%8s rows (in-flight)")
  val v1 = graft.sources.SnapshotStore.publish(
    docs.limit(25), s"$lcDir/snap", col("doc_id"))
  require(v1 == 1L, s"snapshot version off: $v1")
  check("SnapshotStore.read")(graft.sources.SnapshotStore.read(spark, s"$lcDir/snap"))
  // single-writer lease: a held lease rejects the second writer loudly;
  // breakLease recovers (the graft.Snapshots CLI verbs drive these same ops)
  java.nio.file.Files.write(
    java.nio.file.Paths.get(s"$lcDir/snap", "_publish.lease"),
    "{}".getBytes("UTF-8"), java.nio.file.StandardOpenOption.CREATE_NEW)
  val leaseRejected = try {
    graft.sources.SnapshotStore.publish(docs.limit(5), s"$lcDir/snap", col("doc_id")); false
  } catch { case e: IllegalStateException => e.getMessage.contains("lease") }
  require(leaseRejected, "held lease must reject a second writer")
  require(graft.sources.SnapshotStore.breakLease(s"$lcDir/snap"), "breakLease")
  require(graft.sources.SnapshotStore.publish(
    docs.limit(5), s"$lcDir/snap", col("doc_id")) == 2L, "post-lease publish")
  graft.sources.SnapshotStore.rollback(s"$lcDir/snap", 1L)
  check("SnapshotStore.versions")(graft.sources.SnapshotStore.versions(
    spark, s"$lcDir/snap"))
  println("SnapshotStore lease/rollback       single-writer enforced OK")
  // composed streaming ingest: land two JSONL lines (one corrupt), run
  // the checkpointed chain once, read back the published snapshot
  val ingestDir = s"$lcDir/ingest"; new java.io.File(s"$ingestDir/landing").mkdirs()
  java.nio.file.Files.write(
    java.nio.file.Paths.get(s"$ingestDir/landing/f1.jsonl"),
    ("{\"doc_id\":1,\"text\":\"alpha beta gamma delta epsilon zeta\"}\n" +
      "{\"doc_id\":2,\"text\": BROKEN").getBytes("UTF-8"))
  val ingestIdx = graft.operators.DedupOps.minhashIndex(
    docs.select("doc_id", "lang", "n_chars", "text").limit(10))
  val ingestModel = spark.range(256).select(col("id").as("feature"),
    lit(0.5).as("weight"))
  val ingestQ = graft.streaming.StreamOps.ingestPipeline(spark,
    s"$ingestDir/landing",
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType))),
    Seq("doc_id", "text"), ingestIdx, ingestModel, minScore = 0.0,
    snapRoot = s"$ingestDir/snap", quarantineDir = s"$ingestDir/quarantine",
    checkpointDir = s"$ingestDir/ckpt")
  try ingestQ.processAllAvailable() finally ingestQ.stop()
  check("StreamOps.ingestPipeline -> snapshot")(
    graft.sources.SnapshotStore.read(spark, s"$ingestDir/snap"))
  require(spark.read.parquet(s"$ingestDir/quarantine").count() == 1L,
    "ingest quarantine row missing")
  // maintenance surface: fold the log into one full snapshot, read back
  check("StreamOps.ingestCorpus")(
    graft.streaming.StreamOps.ingestCorpus(spark, s"$ingestDir/snap"))
  check("TextOps.trainPerceptron")(graft.operators.TextOps.trainPerceptron(
    docs.limit(50), col("lang") === "en", iters = 2))
  val compactedV = graft.streaming.StreamOps.compactIngestLog(
    spark, s"$ingestDir/snap", keepFull = 1)
  require(graft.sources.SnapshotStore.latestVersion(s"$ingestDir/snap")
    .contains(compactedV), "compacted version must be live")
  require(graft.streaming.StreamOps.ingestCorpus(spark, s"$ingestDir/snap")
    .count() == 1L, "compacted corpus row count off")
  println("StreamOps.compactIngestLog         maintenance cycle OK")

  // antithetic battery: paired variants present
  check("MCBattery.simulateAntithetic")(new MCBattery(spark,
    RngFamily.CounterHash).simulateAntithetic(
    Seq(SimulationSpec(0, "random_walk", 20, 8, Seq(0.5), Nil, 7))))

  // engine core: simulate on the default family (real PCG64) + parity sink
  val out = java.nio.file.Files.createTempDirectory("graft-libcheck")
  val specs = Seq(SimulationSpec(0, "coin_sequence", 100, 16, Seq(0.5), Nil,
    42, Some(s"$out/0.txt")))
  val traces = new MCBattery(spark).simulate(specs)
  check("MCBattery.simulate")(traces)
  TraceSink.writeReferenceCsv(traces, specs)
  val lines = java.nio.file.Files.readAllLines(
    java.nio.file.Paths.get(s"$out/0.txt"))
  require(lines.size == 100 && lines.get(0).split(",").length == 16,
    s"reference sink shape off: ${lines.size} rows")
  println("MCBattery -> TraceSink.writeReferenceCsv    round-trip OK")
  println("libcheck OK - every library surface returned rows")
}

// single line: the REPL evaluates statement-by-statement, so a try/catch
// split across lines would be parsed as two fragments
val libcheckRc = try { runLibcheck(); 0 } catch { case e: Throwable => e.printStackTrace(); 1 }
System.exit(libcheckRc)
