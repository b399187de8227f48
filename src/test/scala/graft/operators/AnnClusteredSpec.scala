package graft.operators

import graft.SparkTestBase
import graft.core.DeterministicRng
import org.apache.spark.sql.functions._

/** ANN quality on PLANTED-CLUSTER data. The driver's synthetic `embeddings`
  * table is unstructured random vectors (measured: near pairs are the smooth
  * tail of the random-cosine distribution), which caps any bucketed ANN at
  * low recall floors — that is a property of the corpus, not the operators.
  * This spec builds a deterministic clustered corpus (10 tight clusters in
  * 64-d) and shows the SAME signature/bucket shape `knn_lsh` uses reaches
  * high recall there, independently verified against a driver-side exact
  * brute force.
  */
class AnnClusteredSpec extends SparkTestBase {

  private val DIM = 64
  private val CLUSTERS = 10
  private val PER_CLUSTER = 50
  private val N = CLUSTERS * PER_CLUSTER
  private val TOP_K = 10
  private val N_TABLES = 6
  private val SIG_BITS = 8
  private val N_QUERIES = 5

  // deterministic clustered vectors: center(c) + small per-member noise
  private lazy val vecs: Array[(Long, Array[Float], Int)] =
    (0 until N).map { id =>
      val c = id / PER_CLUSTER
      val v = Array.tabulate(DIM) { i =>
        val center = DeterministicRng.uniform(9001L, c.toLong, 0L, i.toLong) - 0.5
        val noise = (DeterministicRng.uniform(9002L, id.toLong, 0L, i.toLong) - 0.5) * 0.15
        (center + noise).toFloat
      }
      (id.toLong, v, c)
    }.toArray

  private def cos(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < DIM) { dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i); i += 1 }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  // independent exact brute force on the driver; quantize with the SAME
  // rounding the shipped cosine uses (6 decimals HALF_UP, not rint's
  // half-even) so a cosine landing exactly on a 0.5e-6 tie can't rank
  // differently between operator and reference
  private lazy val brute: Set[(Long, Long)] = {
    val byId = vecs.map(v => v._1 -> v._2).toMap
    def round6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    (0L until N_QUERIES).flatMap { qid =>
      vecs.filter(_._1 != qid)
        .map(v => (v._1, round6(cos(byId(qid), v._2))))
        .sortBy { case (id, c) => (-c, id) }
        .take(TOP_K).map(p => (qid, p._1))
    }.toSet
  }

  private def corpusDf = {
    import spark.implicits._
    vecs.toSeq.toDF("vec_id", "embedding", "cluster").repartition(4)
  }

  private def queriesDf(df: org.apache.spark.sql.DataFrame) =
    df.filter(col("vec_id") < N_QUERIES)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))

  test("LSH bucket shape reaches recall@10 >= 0.8 on clustered data") {
    val df = corpusDf
    // the SHIPPED operator, not a re-implementation — a regression in
    // SimilarityOps.lshTopK fails this spec
    val lsh = SimilarityOps.lshTopK(
        df.select(col("vec_id"), col("embedding")), queriesDf(df), TOP_K,
        tables = N_TABLES, bits = SIG_BITS)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    val recall = (brute & lsh).size.toDouble / brute.size
    assert(recall >= 0.8, s"clustered recall@10 = $recall")
    // and neighbors really are intra-cluster (the structure is real)
    val cluster = vecs.map(v => v._1 -> v._3).toMap
    val intra = brute.count { case (q, n) => cluster(q) == cluster(n) }
    assert(intra.toDouble / brute.size >= 0.9, s"intra-cluster fraction ${intra.toDouble / brute.size}")
  }

  test("nearPairsLsh wins its intended regime: exact pairs at cos>=0.9, candidates << all-pairs") {
    // The gate's 0.40-threshold corpus is the documented adversarial case
    // (near pairs are the smooth tail of random cosine, so near-total
    // recall costs MORE candidates than all-pairs — analysis on the op).
    // THIS is the regime the op exists for: sparse genuine near-dups
    // (100 clusters x 5 members, ~0.8% of pairs are dups at cos >= 0.9).
    import spark.implicits._
    val nClusters = 100; val perCluster = 5; val n = nClusters * perCluster
    val sparse = (0 until n).map { id =>
      val c = id / perCluster
      val v = Array.tabulate(DIM) { i =>
        val center = DeterministicRng.uniform(7001L, c.toLong, 0L, i.toLong) - 0.5
        val noise = (DeterministicRng.uniform(7002L, id.toLong, 0L, i.toLong) - 0.5) * 0.15
        (center + noise).toFloat
      }
      (id.toLong, v)
    }
    val df = sparse.toDF("vec_id", "embedding").repartition(4)
    val bits = 12; val tables = 24; val seed = 99L
    val blocked = SimilarityOps.nearPairsLsh(df, 0.9, bits, tables, seed)
      .select("vec_a", "vec_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = SimilarityOps.nearPairs(df, 0.9)
      .select("vec_a", "vec_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "corpus must contain genuine near-dups")
    assert(blocked == exact, s"blocked path missed ${(exact -- blocked).size} pairs")
    // and the blocking actually PAYS here: candidate volume (bucket
    // collisions, the quantity the join materializes) well under all-pairs
    val sigArr = array((0 until tables).map(l =>
      SimilarityOps.lshSignature(col("embedding"), seed + l * 131L, bits)): _*)
    val sigs = df.select(col("vec_id"), posexplode(sigArr).as(Seq("tbl", "sig")))
    val candidates = sigs.as("x").join(sigs.as("y"),
        col("x.tbl") === col("y.tbl") && col("x.sig") === col("y.sig") &&
          col("x.vec_id") < col("y.vec_id")).count()
    val allPairs = n.toLong * (n - 1) / 2
    assert(candidates < allPairs / 4,
      s"candidates=$candidates not << all-pairs=$allPairs")
  }

  test("packed lsh_signatures is bit-identical to the per-table literal-plane form") {
    // The packed expression replaced tables x bits literal hyperplane
    // arrays in the tree (a per-query planning cost measured in seconds);
    // this pins that the values did not move, on both float and double
    // corpora (the 10x ScaleBench corpus stores doubles).
    import spark.implicits._
    val vecsF = (0 until 50).map { id =>
      (id.toLong, Array.tabulate(DIM)(i =>
        (DeterministicRng.uniform(5005L, id.toLong, 0L, i.toLong) - 0.5).toFloat))
    }
    val dfF = vecsF.toDF("vec_id", "embedding")
    val dfD = vecsF.map { case (id, v) => (id, v.map(_.toDouble)) }
      .toDF("vec_id", "embedding")
    for (df <- Seq(dfF, dfD); (tables, bits, seed) <- Seq((48, 4, 4241L), (6, 8, 777L))) {
      val legacy = array((0 until tables).map(l =>
        SimilarityOps.lshSignature(col("embedding"), seed + l * 131L, bits)): _*)
      val packed = graft.functions.VectorFunctions.lsh_signatures(
        col("embedding"), seed, tables, bits, DIM)
      val diff = df.select(col("vec_id"), legacy.as("a"), packed.as("b"))
        .filter(col("a") =!= col("b")).count()
      assert(diff == 0, s"packed/legacy signature mismatch at tables=$tables bits=$bits")
    }
  }

  test("semanticDecontaminate drops exactly the benchmark-similar vectors") {
    // Planted-cluster corpus (the nearPairsLsh regime construction):
    // bench = member 0 of the first 10 clusters, corpus = everything
    // else. Truth is computed driver-side with plain Scala cosine over
    // the 490x10 cross — fully independent of the op's code path. At
    // cos >= 0.9 the contaminated set is the bench vectors' cluster
    // siblings; survivors are the other 90 clusters.
    import spark.implicits._
    val nClusters = 100; val perCluster = 5; val n = nClusters * perCluster
    val vecs = (0 until n).map { id =>
      val c = id / perCluster
      val v = Array.tabulate(DIM) { i =>
        val center = DeterministicRng.uniform(7001L, c.toLong, 0L, i.toLong) - 0.5
        val noise = (DeterministicRng.uniform(7002L, id.toLong, 0L, i.toLong) - 0.5) * 0.15
        (center + noise).toFloat
      }
      (id.toLong, v)
    }
    val isBench = (id: Long) => id % perCluster == 0 && id / perCluster < 10
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i) }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val benchVecs = vecs.filter(v => isBench(v._1))
    val truthKept = vecs.filter(v => !isBench(v._1))
      .filter(v => benchVecs.forall(b => cos(v._2, b._2) < 0.9))
      .map(_._1).toSet
    assert(truthKept.size < n - 10 && truthKept.nonEmpty,
      "planted contamination must be non-vacuous")

    val df = vecs.toDF("vec_id", "embedding")
      .withColumn("tag", col("vec_id") * 7) // pass-through column
      .repartition(4)
    val kept = SimilarityOps.semanticDecontaminate(
        df.filter(!col("vec_id").isin(benchVecs.map(_._1): _*)),
        df.filter(col("vec_id").isin(benchVecs.map(_._1): _*)),
        0.9, bits = 12, tables = 24, seed = 99L)
      .select("vec_id", "tag").collect()
    assert(kept.map(_.getLong(0)).toSet == truthKept,
      "LSH-blocked decontamination must equal the exhaustive truth")
    assert(kept.forall(r => r.getLong(1) == r.getLong(0) * 7),
      "non-key corpus columns must pass through untouched")
  }

  test("trained IVF reaches recall@10 >= 0.8 on clustered data") {
    // the gate's knn_ivf floor on the driver's RANDOM corpus is 0.15 — a
    // property of structureless data. This is the operator-quality proof:
    // stride-seeded centroids (no label peeking), distributed Lloyd through
    // the SHIPPED trainCentroids, probe/re-rank through the SHIPPED ivfTopK,
    // recall vs the independent driver-side brute force.
    val df = corpusDf
    val e = df.select(col("vec_id"), col("embedding"))
    val kCents = 16
    val stride = N / kCents // 31: deliberately NOT aligned to cluster size
    val init = e.filter(col("vec_id") % stride === 0)
      .select((col("vec_id") / stride).cast("long").as("cid"),
        col("embedding").as("ce"))
    val cents = SimilarityOps.trainCentroids(e, init, 3)
    val ivf = SimilarityOps.ivfTopK(e, queriesDf(df), cents, nprobe = 3, k = TOP_K)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    val recall = (brute & ivf).size.toDouble / brute.size
    assert(recall >= 0.8, s"trained-IVF clustered recall@10 = $recall")
  }

  test("ANN-fed MMR: IVF-shortlist rerank agrees with brute-fed MMR on clustered data") {
    // the serving shape (VERDICT r9 #5): mmrRerank diversifies whatever
    // shortlist the index returns, instead of always paying bruteTopK's
    // corpus scan. Two pins on the planted clusters:
    //  (a) identical shortlists => IDENTICAL selections (mmrTopK is
    //      literally mmrRerank ∘ bruteTopK — the delegation contract);
    //  (b) a trained-IVF shortlist's MMR picks stay high-overlap with
    //      the brute-fed picks (the bitextMineLsh discipline: the
    //      production path recovers the anchor's answers on data with
    //      real structure).
    val df = corpusDf
    val e = df.select(col("vec_id"), col("embedding"))
    val qs = queriesDf(df)
    val pool = 10; val k = 4
    // (a) exact agreement when fed the same candidates
    val viaTopK = SimilarityOps.mmrTopK(e, qs, k = k, pool = pool)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val viaRerank = SimilarityOps.mmrRerank(e,
        SimilarityOps.bruteTopK(e, qs, pool), k = k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(viaTopK.toSeq == viaRerank.toSeq,
      s"brute-fed rerank diverged from mmrTopK:\n${viaTopK.toSeq}\n${viaRerank.toSeq}")
    // (b) IVF-fed serving path: train on stride-seeded centroids, probe,
    // rerank the survivors; per-query overlap with brute-fed MMR >= 3/4
    val kCents = 16
    val stride = N / kCents
    val init = e.filter(col("vec_id") % stride === 0)
      .select((col("vec_id") / stride).cast("long").as("cid"),
        col("embedding").as("ce"))
    val cents = SimilarityOps.trainCentroids(e, init, 3)
    val ivfCand = SimilarityOps.ivfTopK(e, qs, cents, nprobe = 3, k = pool)
    val viaIvf = SimilarityOps.mmrRerank(e, ivfCand, k = k).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    val bruteSel = viaTopK.map(t => (t._1, t._3)).toSet
    val byQ = viaIvf.groupBy(_._1)
    assert(byQ.keySet.size == N_QUERIES.toInt, s"queries missing: ${byQ.keySet}")
    byQ.foreach { case (q, picks) =>
      val overlap = picks.count(bruteSel.contains)
      assert(overlap >= k - 1,
        s"query $q: IVF-fed MMR picked ${picks.map(_._2).toSeq}, " +
          s"only $overlap/$k shared with brute-fed")
    }
  }

  test("IVF index parquet round-trip: serving from the persisted lists equals the from-scratch probe") {
    val df = corpusDf
    val e = df.select(col("vec_id"), col("embedding"))
    val cents = df.filter(col("vec_id") < 16)
      .select(col("vec_id").as("cid"), col("embedding").as("ce"))
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfidx").toString
    SimilarityOps.writeIvfIndex(e, cents, dir)
    val (rCents, lists) = SimilarityOps.readIvfIndex(spark, dir)
    val fresh = SimilarityOps.ivfTopK(e, queriesDf(df), cents, nprobe = 3, k = TOP_K)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val served = SimilarityOps.ivfTopKFromIndex(lists, queriesDf(df), rCents,
        nprobe = 3, k = TOP_K)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(served == fresh, "persisted-index serving must equal the fresh probe")
    // one directory per inverted list on disk — the partition-pruned
    // serving layout
    val listDirs = new java.io.File(s"$dir/lists.parquet").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cid="))
    assert(listDirs.length == 16, s"expected 16 cid= list dirs, got ${listDirs.length}")
  }

  test("appendToIvfIndex: incremental append equals a from-scratch rebuild on the union; drift guard fires on off-manifold data") {
    val df = corpusDf
    // build the index on the FIRST 8 clusters; clusters 8-9 arrive later
    // as the incremental batch (same manifold -> no drift)
    val build = df.filter(col("cluster") < 8).select("vec_id", "embedding")
    val late = df.filter(col("cluster") >= 8).select("vec_id", "embedding")
    // one centroid per planted cluster: build assignments sit at cos≈0.97,
    // so the build's p10 reference is tight and off-manifold data is
    // unambiguously below it
    val cents = df.filter(col("vec_id") % PER_CLUSTER === 0)
      .select(col("vec_id").as("cid"), col("embedding").as("ce"))
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfapp").toString
    SimilarityOps.writeIvfIndex(build, cents, dir)

    val report = SimilarityOps.appendToIvfIndex(spark, dir, late).collect()(0)
    assert(report.getLong(0) == late.count(), "every late vector appended")

    // round-trip equality: serving from the appended index == serving
    // from a from-scratch rebuild over the union corpus under the SAME
    // frozen centroids (assignment is deterministic given centroids)
    val (rCents, lists) = SimilarityOps.readIvfIndex(spark, dir)
    val served = SimilarityOps.ivfTopKFromIndex(lists, queriesDf(df), rCents,
        nprobe = 3, k = TOP_K)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val dir2 = java.nio.file.Files.createTempDirectory("graft-ivfapp2").toString
    SimilarityOps.writeIvfIndex(df.select("vec_id", "embedding"), cents, dir2)
    val (c2, l2) = SimilarityOps.readIvfIndex(spark, dir2)
    val rebuilt = SimilarityOps.ivfTopKFromIndex(l2, queriesDf(df), c2,
        nprobe = 3, k = TOP_K)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(served == rebuilt,
      "appended index must serve the same top-k as the union rebuild")

    // same-manifold batch: median assignment sim comfortably above the
    // build's 10th percentile -> no retrain recommendation
    assert(!report.getBoolean(5),
      s"drift guard must stay quiet on same-manifold data: $report")
    // stats.parquet stays the ORIGINAL build reference after the append
    val statsAfter = spark.read.parquet(s"$dir/stats.parquet").collect()(0)
    assert(statsAfter.getLong(0) == build.count(),
      "build stats must not be rewritten by an append")

    // off-manifold batch: axis-aligned one-hot vectors sit near-orthogonal
    // to every planted centroid -> batch median below build p10 -> retrain
    import spark.implicits._
    val off = (0 until 40).map { i =>
      val v = Array.fill(DIM)(0.0f); v(i % DIM) = 1.0f
      (100000L + i, v)
    }.toDF("vec_id", "embedding")
    val driftReport = SimilarityOps.appendToIvfIndex(spark, dir, off).collect()(0)
    assert(driftReport.getBoolean(5),
      s"drift guard must fire on off-manifold data: $driftReport")

    // empty batch (an ingest tick that deduped to nothing): the report
    // stays readable — n 0, a real false verdict, never a NULL boolean
    val emptyReport = SimilarityOps.appendToIvfIndex(spark, dir,
      late.limit(0)).collect()(0)
    assert(emptyReport.getLong(0) == 0L && !emptyReport.getBoolean(5),
      s"empty-batch report must be (0, ..., false): $emptyReport")
  }

  test("appendVersionToIvfIndex: overwrite-idempotent versioned appends, union serving equality, drift history") {
    val df = corpusDf
    val build = df.filter(col("cluster") < 8).select("vec_id", "embedding")
    val b1 = df.filter(col("cluster") === 8).select("vec_id", "embedding")
    val b2 = df.filter(col("cluster") === 9).select("vec_id", "embedding")
    val cents = df.filter(col("vec_id") % PER_CLUSTER === 0)
      .select(col("vec_id").as("cid"), col("embedding").as("ce"))
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfver").toString
    SimilarityOps.writeIvfIndex(build, cents, dir)

    SimilarityOps.appendVersionToIvfIndex(spark, dir, 1L, b1)
    SimilarityOps.appendVersionToIvfIndex(spark, dir, 2L, b2)
    // a REPLAY of version 2 (the ingest's crash story) overwrites its own
    // subdir — the index must come out identical, never double-rowed
    SimilarityOps.appendVersionToIvfIndex(spark, dir, 2L, b2)

    val (rCents, lists) = SimilarityOps.readIvfIndexAll(spark, dir)
    assert(lists.count() == df.count(), "every vector indexed exactly once")
    assert(lists.groupBy("vec_id").count().filter(col("count") > 1).count() == 0L,
      "replayed version append must not duplicate rows")

    // serving through the versioned appends == from-scratch rebuild on
    // the union corpus under the SAME frozen centroids
    val served = SimilarityOps.ivfTopKFromIndex(lists, queriesDf(df), rCents,
        nprobe = 3, k = TOP_K)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val dir2 = java.nio.file.Files.createTempDirectory("graft-ivfver2").toString
    SimilarityOps.writeIvfIndex(df.select("vec_id", "embedding"), cents, dir2)
    val (c2, l2) = SimilarityOps.readIvfIndex(spark, dir2)
    val rebuilt = SimilarityOps.ivfTopKFromIndex(l2, queriesDf(df), c2,
        nprobe = 3, k = TOP_K)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(served == rebuilt,
      "versioned-append index must serve the same top-k as the union rebuild")

    // drift HISTORY: one persisted row per version, version-ordered,
    // same-manifold batches keep the guard quiet
    val hist = SimilarityOps.ivfDriftHistory(spark, dir).collect()
    assert(hist.map(_.getAs[Long]("version")).toSeq == Seq(1L, 2L),
      s"drift history must carry one row per version: ${hist.toSeq}")
    assert(hist.forall(!_.getAs[Boolean]("recommend_retrain")),
      "same-manifold appends must not recommend retrain")
  }

  test("compactIvfIndex: folds appends into the base, serving equality, bounded dirs, reconcile coverage, crash-window exclusion") {
    val df = corpusDf
    val build = df.filter(col("cluster") < 8).select("vec_id", "embedding")
    val b1 = df.filter(col("cluster") === 8).select("vec_id", "embedding")
    val b2 = df.filter(col("cluster") === 9 && col("vec_id") % 2 === 0)
      .select("vec_id", "embedding")
    val b3 = df.filter(col("cluster") === 9 && col("vec_id") % 2 === 1)
      .select("vec_id", "embedding")
    val cents = df.filter(col("vec_id") % PER_CLUSTER === 0)
      .select(col("vec_id").as("cid"), col("embedding").as("ce"))
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfcmp").toString
    SimilarityOps.writeIvfIndex(build, cents, dir)
    SimilarityOps.appendVersionToIvfIndex(spark, dir, 1L, b1)
    SimilarityOps.appendVersionToIvfIndex(spark, dir, 2L, b2)
    def serve() = {
      val (c, l) = SimilarityOps.readIvfIndexAll(spark, dir)
      SimilarityOps.ivfTopKFromIndex(l, queriesDf(df), c, nprobe = 3, k = TOP_K)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    }
    val before = serve()

    assert(SimilarityOps.compactIvfIndex(spark, dir) == 2L,
      "both committed append versions must fold")
    // serving is unchanged by maintenance
    assert(serve() == before, "compaction must not change what the index serves")
    // the folded subdirs are vacuumed; coverage survives in the pointer
    // (reconcile must never re-append a folded version)
    assert(SimilarityOps.annAppendedVersions(dir).isEmpty,
      "folded append subdirs must be vacuumed")
    assert(SimilarityOps.annIndexedVersions(dir) == Seq(1L, 2L),
      "folded versions stay ANN-covered")
    // drift history survives the fold
    val hist = SimilarityOps.ivfDriftHistory(spark, dir).collect()
      .map(_.getAs[Long]("version")).toSeq
    assert(hist == Seq(1L, 2L), s"drift history must survive compaction: $hist")
    // bounded layout: exactly ONE base dir, one subdir per inverted list,
    // and (post-cid-shuffle) O(1) part files per list
    val bases = new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory &&
        (f.getName == "lists.parquet" || f.getName.startsWith("lists_c=")))
    assert(bases.length == 1 && bases(0).getName == "lists_c=2.parquet", bases.mkString(","))
    val worstFiles = bases(0).listFiles().filter(_.getName.startsWith("cid="))
      .map(_.listFiles().count(_.getName.endsWith(".parquet"))).max
    assert(worstFiles <= 2, s"compacted lists must be O(1) files per cid, worst=$worstFiles")
    // legacy single-dir reader resolves the pointer too
    assert(SimilarityOps.readIvfIndex(spark, dir)._2.count() ==
      build.count() + b1.count() + b2.count())
    // idempotent: nothing left to fold
    assert(SimilarityOps.compactIvfIndex(spark, dir) == 0L)

    // CRASH WINDOW between pointer flip and vacuum: a folded version's
    // subdir reappearing on disk must NOT be read twice — the pointer's
    // folded set excludes it atomically with the base swap
    SimilarityOps.appendVersionToIvfIndex(spark, dir, 2L, b2)
    val total = build.count() + b1.count() + b2.count()
    assert(SimilarityOps.readIvfIndexAll(spark, dir)._2.count() == total,
      "a folded version's lingering subdir must be excluded from reads")
    SimilarityOps.compactIvfIndex(spark, dir) // vacuum heals the lingering dir
    assert(SimilarityOps.annAppendedVersions(dir).isEmpty)

    // life goes on: a post-compaction append serves and re-folds
    SimilarityOps.appendVersionToIvfIndex(spark, dir, 3L, b3)
    assert(SimilarityOps.readIvfIndexAll(spark, dir)._2.count() == df.count())
    assert(SimilarityOps.compactIvfIndex(spark, dir) == 1L)
    assert(SimilarityOps.readIvfIndex(spark, dir)._2.count() == df.count())
    assert(SimilarityOps.annIndexedVersions(dir) == Seq(1L, 2L, 3L))

    // a FRESH build owns the dir: stale pointer/appends/drift from the
    // previous centroids are cleared, reads resolve to lists.parquet
    SimilarityOps.writeIvfIndex(build, cents, dir)
    assert(SimilarityOps.annIndexedVersions(dir).isEmpty,
      "rebuild must clear the folded-set pointer and appends")
    assert(SimilarityOps.readIvfIndex(spark, dir)._2.count() == build.count())
  }

  test("bitextMineLsh recovers the exhaustive margins on clustered sides") {
    // even/odd halves of the clustered corpus as the two "languages":
    // cluster-mates sit at cos ~0.98, so the LSH buckets that work for
    // near-pairs also recover the bitext best-matches; margins computed
    // over candidate neighborhoods (the production semantics), so compare
    // the MATCHED PAIRS, not the margin values
    val df = corpusDf
    val a = df.filter(col("vec_id") % 2 === 0).select("vec_id", "embedding")
    val b = df.filter(col("vec_id") % 2 === 1).select("vec_id", "embedding")
    val exact = SimilarityOps.bitextMine(a, b, k = 4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val blocked = SimilarityOps.bitextMineLsh(a, b, k = 4,
        bits = 6, tables = 24, seed = 99L).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val agree = exact.count { case (s, d) => blocked.get(s).contains(d) }
    assert(agree.toDouble / exact.size >= 0.8,
      s"blocked best-match agreement ${agree.toDouble / exact.size}")
  }

  test("bitext margin averages over the ACTUAL candidate neighborhood, not a constant k") {
    // an isolated candidate pair (each side's only neighbor is the other)
    // must score margin = c / c = 1.0, not 2k*c/(2c) = k
    import org.apache.spark.sql.functions.col
    val spark2 = spark
    import spark2.implicits._
    val a = Seq((0L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val b = Seq((1L, Array(0.8f, 0.6f))).toDF("vec_id", "embedding")
    val r = SimilarityOps.bitextMine(a, b, k = 4).collect()(0)
    assert(r.getDouble(3) == 1.0, s"isolated pair must score margin 1.0: $r")
  }

  test("PQ/IVFADC preserve cluster geometry: one byte of codes, every retrieved neighbor intra-cluster") {
    // Exact top-10 recall is the WRONG metric on this corpus for a
    // one-byte code: all 49 cluster-mates tie at cos ≈ 0.98 and ADC
    // cannot (and need not) rank within that tie band. What quantization
    // must preserve — and the reason PQ works at billion scale — is the
    // cluster structure: every ADC-retrieved neighbor should come from
    // the query's own cluster. Measured: intra = 1.00 for flat ADC at
    // ks ∈ {4, 8, 16}; 0.94 for IVFADC (the coarse probe occasionally
    // crosses); exact recall climbs 0.18 → 0.46 with ks as the codebook
    // gains intra-cluster resolution.
    val df = corpusDf
    val e = df.select(col("vec_id"), col("embedding"))
    val cluster = vecs.map(v => v._1 -> v._3).toMap
    def intra(rows: Array[org.apache.spark.sql.Row]): Double =
      rows.count(r => cluster(r.getLong(0)) == cluster(r.getLong(2))).toDouble / rows.length
    val pq = SimilarityOps.pqTopK(e, queriesDf(df), TOP_K).collect()
    assert(pq.length == N_QUERIES * TOP_K)
    assert(intra(pq) >= 0.95, s"flat-ADC intra-cluster fraction ${intra(pq)}")
    val cents = df.filter(col("vec_id") < 16)
      .select(col("vec_id").as("cid"), col("embedding").as("ce"))
    val ivfpq = SimilarityOps.ivfPqTopK(e, queriesDf(df), cents, 3, TOP_K, ks = 16).collect()
    assert(intra(ivfpq) >= 0.85, s"IVFADC intra-cluster fraction ${intra(ivfpq)}")
    // Larger codebooks buy RESOLUTION: the ADC cosine approaches the true
    // cosine as ks grows. (Exact top-10 recall is NOT monotone in ks here —
    // with hash-spread seeds a good ks codebook collapses all 49 cluster-
    // mates onto one code and the rank inside the tie band is arbitrary, so
    // recall hovers near 10/49 REGARDLESS of ks; the old dense-id seeds
    // only "showed" recall growth because ids 0..15 all sat in cluster 0,
    // accidentally buying intra-cluster code diversity.)
    val byId = vecs.map(v => v._1 -> v._2).toMap
    def meanAdcErr(rows: Array[org.apache.spark.sql.Row]): Double =
      rows.map(r => math.abs(r.getDouble(3) - cos(byId(r.getLong(0)), byId(r.getLong(2))))).sum / rows.length
    val pq16 = SimilarityOps.pqTopK(e, queriesDf(df), TOP_K, ks = 16).collect()
    assert(meanAdcErr(pq16) < meanAdcErr(pq),
      s"ks=16 mean ADC error ${meanAdcErr(pq16)} should be below ks=4 ${meanAdcErr(pq)}")
  }

  test("trained-coarse IVFADC tracks the flat ADC scan and stays intra-cluster") {
    // The full production composition (knn_ivfpq_trained's shape): Lloyd-
    // trained coarse lists prune, ADC scores the survivors. IVFADC is by
    // construction the flat ADC scan restricted to probed lists, so its
    // top-k should recover most of flat ADC's top-k (recall@10 vs flat,
    // the VERDICT-r5 asked-for metric) while keeping the quantization
    // contract of the flat test above: retrieved neighbors intra-cluster.
    val df = corpusDf
    val e = df.select(col("vec_id"), col("embedding"))
    val stride = N / 16
    val init = e.filter(col("vec_id") % stride === 0)
      .select((col("vec_id") / stride).cast("long").as("cid"),
        col("embedding").as("ce"))
    val cents = SimilarityOps.trainCentroids(e, init, 2)
    val flat = SimilarityOps.pqTopK(e, queriesDf(df), TOP_K).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val ivfpq = SimilarityOps.ivfPqTopK(e, queriesDf(df), cents, 3, TOP_K).collect()
    assert(ivfpq.nonEmpty)
    val got = ivfpq.map(r => (r.getLong(0), r.getLong(2))).toSet
    val recallVsFlat = (flat & got).size.toDouble / flat.size
    assert(recallVsFlat >= 0.8, s"trained-IVFADC recall@10 vs flat ADC = $recallVsFlat")
    val cluster = vecs.map(v => v._1 -> v._3).toMap
    val intra = ivfpq.count(r => cluster(r.getLong(0)) == cluster(r.getLong(2))).toDouble / ivfpq.length
    assert(intra >= 0.85, s"trained-IVFADC intra-cluster fraction $intra")
  }

  test("PQ training seeds by id hash: an id-offset corpus trains and encodes identically") {
    // The former seed (`vec_id < ks`) required dense ids from 0; the
    // hash-bottom-ks seed must be invariant to WHERE the id space sits
    // only in the sense that it still works — and because the md5 hash is
    // of the id STRING, shifting every id by a constant changes which
    // vectors seed, so the invariance we pin is structural: same corpus
    // under offset ids trains codebooks of the right shape, encodes every
    // vector, and each code is one of the ks seed-descended codewords.
    import spark.implicits._
    val off = 100000L
    val e = corpusDf.select((col("vec_id") + off).as("vec_id"), col("embedding"))
    val books = SimilarityOps.pqCodebooks(e).collect()
    assert(books.nonEmpty, "offset-id corpus must train")
    // every codebook id descends from a seed vec_id in the offset space
    assert(books.map(_.getLong(1)).forall(_ >= off),
      "codebook cids must come from the offset id space")
    val m = 4
    assert(books.map(_.getInt(0)).toSet == (0 until m).toSet, "all subspaces trained")
    val codes = SimilarityOps.pqCodes(e)
    assert(codes.count() == N, "every offset-id vector encodes")
    val cids = books.map(r => (r.getInt(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    codes.collect().foreach { r =>
      (0 until m).foreach { s =>
        assert(cids(s).contains(r.getLong(1 + s)),
          s"code c$s=${r.getLong(1 + s)} not a trained codeword")
      }
    }
  }

  test("semanticDedup: cluster blocking recovers the intra-cluster 0.9-pairs, never crosses clusters") {
    // SemDeDup's contract: exactly the pairs that (a) clear the threshold
    // and (b) land in the same assigned cluster. On the planted corpus,
    // stride-seeded trained centroids give clusters aligned with the true
    // structure, so the blocked result should recover nearly all true
    // 0.9-pairs at a fraction of the all-pairs work.
    val df = corpusDf
    val e = df.select(col("vec_id"), col("embedding"))
    // k matched to the planted cluster count: with k ABOVE it (16 was
    // tried) Lloyd splits planted clusters and pairs straddling the split
    // are missed — recall drops to ~0.67, which is real SemDeDup behavior
    // (over-clustering trades recall for smaller pair blocks), but the
    // spec pins the aligned-k contract where blocking should be ~lossless.
    val stride = N / CLUSTERS
    val init = e.filter(col("vec_id") % stride === 0)
      .select((col("vec_id") / stride).cast("long").as("cid"), col("embedding").as("ce"))
    val cents = SimilarityOps.trainCentroids(e, init, 3)
    val sem = SimilarityOps.semanticDedup(e, cents, 0.9)
    val semPairs = sem.select("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = SimilarityOps.nearPairs(e, 0.9)
      .select("vec_a", "vec_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "planted corpus must have 0.9-pairs")
    // blocked result is a SUBSET of the exact pairs (threshold identical,
    // blocking only removes)...
    assert((semPairs -- exact).isEmpty, s"semanticDedup invented pairs: ${semPairs -- exact}")
    // ...and recovers nearly all of them (clusters track the structure)
    val recall = (exact & semPairs).size.toDouble / exact.size
    assert(recall >= 0.9, s"semantic-dedup pair recall = $recall")
    // every returned pair is same-cluster by construction
    val asg = SimilarityOps.assignToCentroids(e, cents)
      .select("vec_id", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    semPairs.foreach { case (a, b) => assert(asg(a) == asg(b), s"cross-cluster pair ($a,$b)") }
  }

  test("annRecall over the PQ path: frame equals an independent intersection; PQ misses rank order, never clusters") {
    val e = corpusDf.select(col("vec_id"), col("embedding"))
    val qs = e.filter(col("vec_id") < 4)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val pq = SimilarityOps.pqTopK(e, qs, 5)
    val tru = SimilarityOps.bruteTopK(e, qs, 5)
    val rec = SimilarityOps.annRecall(pq, tru, 5).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(rec.size == 4)
    // independent expectation: per-query intersection of the two rankings
    def pairs(df: org.apache.spark.sql.DataFrame) = df
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val hits = pairs(pq).intersect(pairs(tru))
      .groupBy(_._1).view.mapValues(_.size.toLong).toMap
    rec.foreach { case (q, r) =>
      assert(r.getLong(2) == 5L, s"truth must have k rows: $r")
      assert(r.getLong(1) == hits.getOrElse(q, 0L),
        s"annRecall hits must equal the independent intersection: $r")
      assert(r.getDouble(3) == r.getLong(1).toDouble / 5.0)
    }
    // PQ's documented trade on tight clusters: within-cluster order may
    // collapse (recall@k can be low) but retrieval NEVER crosses clusters
    val byCluster = corpusDf.select("vec_id", "cluster").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    pairs(pq).foreach { case (q, v) =>
      assert(byCluster(q) == byCluster(v), s"cross-cluster PQ hit ($q,$v)")
    }
  }

  test("truncated-dim retrieval: head-dim corpora keep recall 1, tail-dim corpora lose everything") {
    import spark.implicits._
    def vec(head: Seq[Float], tail: Seq[Float]): Array[Float] =
      (head.padTo(16, 0f) ++ tail.padTo(48, 0f)).toArray
    def run(vs: Seq[(Long, Array[Float])]) = {
      val e = vs.toDF("vec_id", "embedding")
      val qs = e.filter(col("vec_id") === 0L)
        .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
      def cut(df: org.apache.spark.sql.DataFrame, c: String) =
        df.withColumn(c, slice(col(c), 1, 16))
      SimilarityOps.annRecall(
        SimilarityOps.bruteTopK(cut(e, "embedding"), cut(qs, "qe"), 2),
        SimilarityOps.bruteTopK(e, qs, 2), 2).collect().head.getDouble(3)
    }
    // signal entirely in the first 16 dims: truncation is lossless
    val head = (0L to 4L).map(i => i -> vec(
      Seq(1f, i.toFloat / 10f), Seq(0f)))
    assert(run(head) == 1.0, "head-dim corpus must keep recall 1")
    // signal entirely in dims 17+ (full top-2 = {4,3} by rising tail
    // alignment): every truncated vector is the identical head, ties
    // break to {1,2} — recall collapses to 0
    val tail = (0L to 4L).map(i => i -> vec(
      Seq(1f), Seq(if (i == 0) 4f else i.toFloat)))
    assert(run(tail) == 0.0, "tail-dim structure must be invisible at 16 dims")
  }

  test("oodReport: hand-computed cosines vs the decimal-pinned label centroid; threshold split; singleton label") {
    import spark.implicits._
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // label 0: two (1,0,0) + one off-axis (0,1,0); centroid rounds to
    // (0.666667, 0.333333, 0); label 1: singleton -> csim exactly 1.0
    val e = Seq(
      (1L, Array(1f, 0f, 0f), 0), (2L, Array(1f, 0f, 0f), 0),
      (3L, Array(0f, 1f, 0f), 0), (4L, Array(0f, 0f, 1f), 1))
      .toDF("vec_id", "embedding", "label")
    val cd = Array(r6(2.0 / 3.0), r6(1.0 / 3.0), 0.0)
    val cn = math.sqrt(cd(0) * cd(0) + cd(1) * cd(1) + cd(2) * cd(2))
    val csimOn = r6(cd(0) / (1.0 * cn))   // (1,0,0) vs centroid
    val csimOff = r6(cd(1) / (1.0 * cn))  // (0,1,0) vs centroid
    assert(csimOn > 0.5 && csimOff < 0.5, s"$csimOn / $csimOff")
    val out = SimilarityOps.oodReport(e, threshold = 0.5).collect()
      .map(r => r.getLong(0) -> r).toMap
    val a = out(0L)
    assert(a.getLong(1) == 3 && a.getLong(2) == 1, a.toString)
    assert(a.getDouble(3) == 1.0 / 3.0)
    assert(a.getDouble(4) == csimOff, s"${a.getDouble(4)} != $csimOff")
    // mean over the exact DECIMAL(12,6) sum of the round-6 csims
    val meanExp = (BigDecimal(csimOn) * 2 + BigDecimal(csimOff)).toDouble / 3.0
    assert(a.getDouble(5) == meanExp, s"${a.getDouble(5)} != $meanExp")
    val b = out(1L)
    assert(b.getLong(1) == 1 && b.getLong(2) == 0 && b.getDouble(4) == 1.0 &&
      b.getDouble(5) == 1.0, b.toString)
  }
}
