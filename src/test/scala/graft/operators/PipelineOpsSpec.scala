package graft.operators

import graft.SparkTestBase
import graft.multimodal.MediaStub
import org.apache.spark.sql.functions._

/** Semantics checks for the training-data pipeline operators (dedup,
  * similarity, text, multimodal). Value-level correctness is covered by the
  * DuckDB oracle gate; these assert the algorithmic properties the oracle
  * can't express (recall floors, supersets, stub contracts).
  */
class PipelineOpsSpec extends SparkTestBase {

  private def q(name: String) = SparkEntryRef.queries(name)(spark, sfDir)

  test("dd_exact: self-union doubles input, dedup halves it") {
    val r = q("dd_exact").collect()(0)
    val (nInput, nUnique, nRemoved) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(nInput == 2 * nUnique)
    assert(nRemoved == nUnique)
  }

  test("profileTyped: min/max keep their original types and exact values") {
    import spark.implicits._
    import org.apache.spark.sql.types.{DoubleType, LongType, TimestampType}
    val df = Seq(
      (1L, 0.1, java.sql.Timestamp.valueOf("2024-01-01 00:00:00.000001"), Option("a")),
      (2L, -3.75, java.sql.Timestamp.valueOf("2024-06-15 12:00:00.5"), Option.empty[String]),
      (3L, 2.5, java.sql.Timestamp.valueOf("2023-12-31 23:59:59.999999"), Option("c")))
      .toDF("id", "x", "ts", "s")
    val r = SketchOps.profileTyped(df).collect()(0)
    val schema = SketchOps.profileTyped(df).schema
    // original types survive — the string-rendering caveat of profile()
    // does not apply here
    assert(schema("min_x").dataType == DoubleType)
    assert(schema("max_id").dataType == LongType)
    assert(schema("min_ts").dataType == TimestampType)
    assert(r.getAs[Long]("n_id") == 3 && r.getAs[Long]("n_null_s") == 1)
    assert(r.getAs[Double]("min_x") == -3.75 && r.getAs[Double]("max_x") == 2.5)
    assert(r.getAs[java.sql.Timestamp]("min_ts") ==
      java.sql.Timestamp.valueOf("2023-12-31 23:59:59.999999"))
    assert(r.getAs[String]("min_s") == "a" && r.getAs[String]("max_s") == "c")
  }

  test("capPerGroup: keeps exactly the best n per group with deterministic ties") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a", 10), (2L, "a", 30), (3L, "a", 30), (4L, "a", 5),
      (5L, "b", 7)).toDF("doc_id", "source", "n_chars")
    val kept = TextOps.capPerGroup(docs, "source", col("n_chars"), 2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // group a: ties at 30 break by doc_id (2 then 3); 10 and 5 capped out.
    // group b: under the cap, kept whole.
    assert(kept == Set(2L, 3L, 5L), kept.toString)
    // cap >= group size is the identity
    assert(TextOps.capPerGroup(docs, "source", col("n_chars"), 10).count() == 5)
  }

  test("snapshotDiff: statuses partition the union of both id spaces") {
    import spark.implicits._
    val oldV = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
    val newV = Seq((2L, "b"), (3L, "c edited"), (4L, "d")).toDF("doc_id", "text")
    val m = DedupOps.snapshotDiff(oldV, newV).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m == Map(1L -> "removed", 2L -> "unchanged",
      3L -> "changed", 4L -> "added"), m.toString)
    // identity: diffing a snapshot against itself is all-unchanged
    val self = DedupOps.snapshotDiff(oldV, oldV).collect().map(_.getString(1))
    assert(self.forall(_ == "unchanged") && self.length == 3)
  }

  test("snapshotDiff: duplicate doc_ids collapse to one deterministic row per id") {
    import spark.implicits._
    // id 1 duplicated in old with two digests -> min(digest) represents it;
    // id 2 duplicated in new with IDENTICAL text -> plain unchanged.
    val oldV = Seq((1L, "a"), (1L, "b"), (2L, "x")).toDF("doc_id", "text")
    val newV = Seq((1L, "a"), (2L, "x"), (2L, "x")).toDF("doc_id", "text")
    val rows = DedupOps.snapshotDiff(oldV, newV).collect()
    assert(rows.length == 2, s"one row per id, got ${rows.length}")
    val m = rows.map(r => r.getLong(0) -> r.getString(1)).toMap
    // md5("a") < md5("b") (0cc1... < 92eb...), so old id 1 is represented
    // by digest("a") and matches new -> unchanged, never 'conflicting'.
    assert(m == Map(1L -> "unchanged", 2L -> "unchanged"), m.toString)
  }

  test("q26_approx_distinct: HLL estimates inside the published rsd bound of exact counts") {
    // The one gate row the oracle can't hash (HLL registers are engine-
    // internal): bracket it quantitatively instead. approx_count_distinct
    // is HLL++ with rsd = 0.02 (standard error); 5 sigma = 10% relative
    // error is far beyond any plausible estimate drift, and the estimate
    // is deterministic for fixed data, so this pins a real bound.
    val r = q("q26_approx_distinct").collect()(0)
    val exactParts = r.getAs[Long]("exact_parts")
    val approxParts = r.getAs[Long]("approx_parts")
    val approxOrders = r.getAs[Long]("approx_orders")
    val exactOrders = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_orderkey").distinct().count()
    def relErr(approx: Long, exact: Long): Double =
      math.abs(approx - exact).toDouble / exact
    assert(relErr(approxParts, exactParts) <= 0.10,
      s"parts estimate $approxParts vs exact $exactParts outside 5*rsd")
    assert(relErr(approxOrders, exactOrders) <= 0.10,
      s"orders estimate $approxOrders vs exact $exactOrders outside 5*rsd")
  }

  test("tx_stratified_sample: full strata kept exactly, sampled stratum inside CLT bounds") {
    // The other permanent rows-only gate row (sampleBy = engine-RNG
    // membership): fraction-1.0 strata must keep EVERY doc (rand() < 1.0
    // is always true — exact, not statistical), and the 0.25 'en' stratum
    // must land within 5 sigma of its binomial expectation.
    val totals = spark.read.parquet(s"$sfDir/documents.parquet")
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = q("tx_stratified_sample").collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    Seq("de", "es", "fr", "zh").foreach { l =>
      assert(got(l) == totals(l), s"fraction-1.0 stratum $l: ${got.get(l)} != all ${totals(l)}")
    }
    val nEn = totals("en")
    val sd = math.sqrt(nEn * 0.25 * 0.75)
    assert(math.abs(got("en") - 0.25 * nEn) <= 5 * sd,
      s"en stratum ${got("en")} of $nEn outside 0.25 +/- 5 sigma")
  }

  test("stratifiedSampleHash: deterministic membership, fractions honored, absent langs dropped") {
    import spark.implicits._
    val docs = (0 until 4000)
      .map(i => (i.toLong, if (i % 2 == 0) "en" else "de", "t", 1))
      .toDF("doc_id", "lang", "text", "n_chars")
    def run() = TextOps.stratifiedSampleHash(docs, Map("en" -> 0.25, "de" -> 0.75))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val s1 = run()
    assert(s1 == run()) // pure function of the rows — identical on re-run
    // binomial(2000, f) within 5 sigma
    def within(n: Long, f: Double): Boolean =
      math.abs(n - 2000 * f) < 5 * math.sqrt(2000 * f * (1 - f))
    assert(within(s1("en"), 0.25), s1.toString)
    assert(within(s1("de"), 0.75), s1.toString)
    // languages without a fraction are dropped entirely
    val zh = (0 until 100).map(i => (i.toLong + 10000, "zh", "t", 1))
      .toDF("doc_id", "lang", "text", "n_chars")
    assert(!TextOps.stratifiedSampleHash(docs.unionAll(zh),
      Map("en" -> 0.25, "de" -> 0.75)).collect().map(_.getString(0)).contains("zh"))
  }

  test("ops fail at the call site with the contract and actual schema") {
    import spark.implicits._
    val wrong = Seq((1L, "x")).toDF("id", "body")
    Seq(
      () => TextOps.tokenStats(wrong),
      () => DedupOps.minhashPairs(wrong),
      () => SimilarityOps.quantizeInt8(wrong),
      () => graft.streaming.StreamOps.dedupEvents(wrong)
    ).foreach { op =>
      val e = intercept[IllegalArgumentException](op())
      // message names the op, the required columns, and what was passed —
      // not an unresolved-column error from deep inside a lazy plan
      assert(e.getMessage.contains("requires input columns"), e.getMessage)
      assert(e.getMessage.contains("(id, body)"), e.getMessage)
    }
  }

  test("nearDupClusters: components, canonical minimum, convergence guard") {
    import spark.implicits._
    // triangle {1,2,3}, 4-chain {10,11,12,13} (propagation needs >1 round),
    // isolated pair {20,21}
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L), (10L, 11L), (11L, 12L),
      (12L, 13L), (20L, 21L)).toDF("doc_a", "doc_b")
    val got = DedupOps.nearDupClusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L, 20L -> 20L, 21L -> 20L))
    // diameter beyond the round cap fails fast instead of returning a
    // partial clustering
    val longChain = (0L until 12L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    intercept[IllegalArgumentException] {
      DedupOps.nearDupClusters(longChain, maxIters = 3)
    }
  }

  test("star contraction equals min-label propagation, and handles deep chains in O(log n) rounds") {
    import spark.implicits._
    def labels(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // fixture with a triangle, a chain, an isolated pair
    val fixture = Seq((1L, 2L), (2L, 3L), (1L, 3L), (10L, 11L), (11L, 12L),
      (12L, 13L), (20L, 21L)).toDF("doc_a", "doc_b")
    assert(labels(DedupOps.nearDupClustersStar(fixture)) ==
      labels(DedupOps.nearDupClusters(fixture)))
    // seeded random graph: 120 nodes, 90 edges — many nontrivial components
    val rnd = (0 until 90).map { i =>
      val a = (graft.core.DeterministicRng.uniform(5L, 0L, i.toLong, 0L) * 120).toLong
      val b = (graft.core.DeterministicRng.uniform(5L, 1L, i.toLong, 0L) * 120).toLong
      (math.min(a, b), math.max(a, b))
    }.filter(p => p._1 != p._2).toDF("doc_a", "doc_b")
    assert(labels(DedupOps.nearDupClustersStar(rnd)) ==
      labels(DedupOps.nearDupClusters(rnd)))
    // a 40-deep chain: min-label needs ~40 rounds (fails its default cap of
    // 20), star contraction converges within its default O(log n) budget
    val chain = (0L until 40L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val star = labels(DedupOps.nearDupClustersStar(chain))
    assert(star.values.toSet == Set(0L) && star.size == 41)
    intercept[IllegalArgumentException] { DedupOps.nearDupClusters(chain) }
  }

  test("dd_minhash finds every high-similarity pair the exact blocked scan finds") {
    // MinHash-LSH (probabilistic recall) must catch all strongly-similar
    // pairs; at jaccard >= 0.5 the 4x4-band miss probability is
    // (1 - 0.5^4)^4 ≈ 0.66 per... so assert against the jaccard >= 0.7 tier
    // where miss prob is (1 - 0.24)^4 ≈ 0.33 — still probabilistic, so
    // assert on the pinned dataset outcome: recall over the >= 0.5 exact
    // pairs must be positive and candidates must be a superset at >= 0.9.
    val exact = q("dd_ngram_jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val mh = q("dd_minhash").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val strong = exact.filter(_._3 >= 0.5).map(p => (p._1, p._2))
    if (strong.nonEmpty) {
      val hit = strong.count(mh.contains).toDouble / strong.size
      assert(hit >= 0.5, s"minhash recall on strong pairs = $hit")
    }
    // and minhash-verified pairs genuinely meet the threshold
    q("dd_minhash").collect().foreach(r => assert(r.getDouble(2) >= 0.3))
  }

  test("dd_simhash pairs have small hamming distance and are symmetric-free") {
    val rows = q("dd_simhash").collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(rows.forall(_._3 <= 3))
    assert(rows.forall(p => p._1 < p._2))
  }

  test("knn_lsh recall@10 vs knn_brute is above the multiprobe floor") {
    def pairs(name: String) = q(name).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val brute = pairs("knn_brute")
    val lsh = pairs("knn_lsh")
    val recall = (brute & lsh).size.toDouble / brute.size
    assert(recall >= 0.25, s"recall@10 = $recall")
  }

  test("emb_near_pairs_lsh reproduces the exact all-pairs result (recall 1.0)") {
    // The blocked path must be pair-for-pair identical to the exact anchor
    // at gate scale: candidates-only verification makes precision exact by
    // construction, and the 48×4-bit table configuration is sized so the
    // per-threshold-pair miss probability is ~2.6e-4 — zero misses on the
    // pinned corpus (this is also what keeps its DuckDB oracle row green).
    def pairs(name: String) = q(name).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val exact = pairs("emb_near_pairs")
    val blocked = pairs("emb_near_pairs_lsh")
    assert(exact == blocked,
      s"missed=${(exact -- blocked).size} extra=${(blocked -- exact).size}")
  }

  test("knn_ivf recall@10 vs knn_brute is above the nprobe floor") {
    def pairs(name: String) = q(name).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val brute = pairs("knn_brute")
    val ivf = pairs("knn_ivf")
    val recall = (brute & ivf).size.toDouble / brute.size
    assert(recall >= 0.15, s"recall@10 = $recall")
    val trained = pairs("knn_ivf_trained")
    val trainedRecall = (brute & trained).size.toDouble / brute.size
    assert(trainedRecall >= 0.15, s"trained recall@10 = $trainedRecall")
  }

  test("cosine: self-similarity is 1, symmetry holds") {
    val e = Tables.t(spark, sfDir, "embeddings").limit(20)
    val self = e.select(SimilarityQueries.cosine(col("embedding"), col("embedding")).as("c"))
      .collect().map(_.getDouble(0))
    assert(self.forall(c => math.abs(c - 1.0) < 1e-9))
  }

  test("tx_stratified_sample downsamples the dominant class to its fraction") {
    val counts = q("tx_stratified_sample").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val full = Tables.t(spark, sfDir, "documents")
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // en sampled at 0.25: expect binomial(n_en, 0.25) within 5 sigma
    val nEn = full("en").toDouble
    val se = math.sqrt(nEn * 0.25 * 0.75)
    assert(math.abs(counts("en") - 0.25 * nEn) < 5 * se,
      s"en sampled ${counts("en")} of $nEn")
    // other classes kept whole
    Seq("de", "es", "fr", "zh").foreach(l => assert(counts(l) == full(l), l))
  }

  test("tx_train_val_test is a partition: disjoint, exhaustive, stable") {
    val rows = q("tx_train_val_test").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = Tables.t(spark, sfDir, "documents").count()
    assert(rows.values.sum == total, "splits must cover every document")
    assert(rows.keySet == Set("train", "val", "test"))
    assert(rows("train") > rows("val") && rows("train") > rows("test"))
    // stability: rerun yields identical counts (hash-based, not sampler-based)
    val again = q("tx_train_val_test").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again == rows)
  }

  test("tx_langid predictions cover every document exactly once") {
    val total = q("tx_langid").agg(sum("n_docs")).collect()(0).getLong(0)
    val docs = Tables.t(spark, sfDir, "documents").count()
    assert(total == docs)
  }

  test("multimodal decode stub: typed mapPartitions path matches arithmetic contract") {
    val metas = MediaStub.decodeAll(spark,
      Tables.t(spark, sfDir, "documents").filter(col("doc_id") < 10)).collect()
    assert(metas.length == 10)
    metas.foreach { m =>
      assert(m.width == 32 + m.n_bytes % 512)
      assert(m.height == 32 + (m.n_bytes * 7) % 512)
      assert(m.n_frames == 1 + m.n_bytes / 100)
      assert(m.format.startsWith("fake/"))
    }
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("centroidSimilarity: identical centroids give cos 1, orthogonal give cos 0") {
    import spark.implicits._
    val rows = Seq(
      (0L, "A", Array.tabulate(64)(i => if (i == 0) 2.0f else 0f)),
      (1L, "A", Array.tabulate(64)(i => if (i == 0) 4.0f else 0f)),
      (2L, "B", Array.tabulate(64)(i => if (i == 0) 3.0f else 0f)), // = A's mean direction
      (3L, "C", Array.tabulate(64)(i => if (i == 1) 5.0f else 0f))) // orthogonal axis
    val e = rows.toDF("vec_id", "label", "embedding")
    val r = SimilarityOps.centroidSimilarity(e).collect()
      .map(x => ((x.getString(0), x.getString(1)), x.getDouble(2))).toMap
    assert(r(("A", "B")) == 1.0, r.toString)
    assert(r(("A", "C")) == 0.0)
    assert(r(("B", "C")) == 0.0)
  }

  test("mmrTopK: diversified pick beats the redundant runner-up; ties break by id") {
    import spark.implicits._
    // q = (1,0,0); A(id1) cos .8; B(id2) cos .6 but near-dup of A
    // (cos(A,B) = .96); C(id3) cos .6, orthogonal-ish to A (cos 0).
    // plain top-2 = [A, B] (id tie-break on the .6 pair); MMR λ=1/2
    // step 2 scores B at .6 − .96 = −.36 vs C at .6 − 0 = .6 → [A, C].
    val e = Seq(
      (1L, Array(0.8f, 0.6f, 0f)), (2L, Array(0.6f, 0.8f, 0f)),
      (3L, Array(0.6f, -0.8f, 0f))).toDF("vec_id", "embedding")
    val q = Seq((100L, Array(1f, 0f, 0f))).toDF("query_id", "qe")
    val plain = SimilarityOps.bruteTopK(e, q, 2).collect().map(_.getLong(2))
    assert(plain.toSeq == Seq(1L, 2L), plain.mkString(","))
    val mmr = SimilarityOps.mmrTopK(e, q, k = 2, pool = 3).collect()
    assert(mmr.map(_.getLong(2)).toSeq == Seq(1L, 3L),
      mmr.mkString(";"))
    assert(mmr(0).getLong(1) == 1 && mmr(1).getLong(1) == 2)
    assert(mmr(0).getDouble(3) == 0.8 && mmr(1).getDouble(3) == 0.6)
    // k > candidates: exhausts the pool, no null rows
    val all = SimilarityOps.mmrTopK(e, q, k = 5, pool = 3).collect()
    assert(all.length == 3 && all.map(_.getLong(2)).toSet == Set(1L, 2L, 3L))
  }

  test("hardNegatives: band membership, exclusions, shortlist-fed equality") {
    import spark.implicits._
    // q = (1,0,0,0): id1 cos 1.0 (positive zone, >= hi -> OUT),
    // id2 cos .6 (band), id3 cos 0 (easy, < lo -> OUT), id4 cos .8 (band)
    val e = Seq(
      (1L, Array(1f, 0f, 0f, 0f)), (2L, Array(0.6f, 0.8f, 0f, 0f)),
      (3L, Array(0f, 1f, 0f, 0f)), (4L, Array(0.8f, 0.6f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val q = Seq((100L, Array(1f, 0f, 0f, 0f))).toDF("query_id", "qe")
    val out = SimilarityOps.hardNegatives(e, q, k = 2, lo = 0.5, hi = 0.95)
      .collect()
    assert(out.map(_.getLong(2)).toSeq == Seq(4L, 2L) &&
      out.map(_.getDouble(3)).toSeq == Seq(0.8, 0.6),
      out.mkString(";"))
    // k exceeds band population: just the band, never padded
    assert(SimilarityOps.hardNegatives(e, q, 5, 0.5, 0.95).count() == 2L)
    // shortlist contract: mining over a brute top-pool shortlist that
    // covers the band equals mining over the exhaustive scores
    val fed = SimilarityOps.hardNegativesFrom(
        SimilarityOps.bruteTopK(e, q, 4).drop("rank"), 2, 0.5, 0.95)
      .collect()
    assert(fed.map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq ==
      out.map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq,
      "ANN-shortlist-fed mining must equal the exhaustive anchor")
  }

  test("mattr: hand-computed windows, short-doc TTR fallback, length independence") {
    import spark.implicits._
    // w=3: "a b a b" -> windows [a b a]=2,[b a b]=2 -> 4/6; "c c c c c"
    // -> 3 windows of 1 -> 3/9; "x y" short -> TTR 2/2 = 1
    val docs = Seq((1L, "a b a b"), (2L, "c c c c c"), (3L, "x y"))
      .toDF("doc_id", "text")
    val out = TextOps.mattr(docs, w = 3).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getLong(1) == 4 && out(1L).getLong(2) == 2 &&
      out(1L).getDouble(3) == 4.0 / 6.0, out(1L).toString)
    assert(out(2L).getLong(2) == 3 && out(2L).getDouble(3) == 3.0 / 9.0)
    assert(out(3L).getLong(1) == 2 && out(3L).getLong(2) == 1 &&
      out(3L).getDouble(3) == 1.0)
    // length independence (the MATTR point): a doc repeated 5x keeps the
    // same per-window diversity while plain TTR would collapse
    val rep = Seq((4L, Seq.fill(5)("a b a b").mkString(" ")))
      .toDF("doc_id", "text")
    val m4 = TextOps.mattr(rep, w = 3).collect()(0)
    assert(m4.getLong(1) == 20 && m4.getDouble(3) == 36.0 / 54.0,
      s"18 windows of alternating a/b each have 2 distinct: $m4")
  }

  test("readabilityReport: hand-counted words/sentences/vowel-groups; sentence floor; flesch formula") {
    import spark.implicits._
    // "The cat sat. It ran!" -> words 5, sentence runs 2,
    // vowel groups: the(1) cat(1) sat(1) it(1) ran(1) = 5
    // "hmm" -> words 1, sentences floor 1, vowel groups 0
    val docs = Seq(("s1", "The cat sat. It ran!"), ("s1", "hmm"),
      ("s2", "Queueing!?"))
      .toDF("source", "text")
    val out = TextOps.readabilityReport(docs, "source").collect()
      .map(r => r.getString(0) -> r).toMap
    val a = out("s1")
    assert(a.getLong(1) == 2 && a.getLong(2) == 6 && a.getLong(3) == 3 &&
      a.getLong(4) == 5, a.toString)
    val expected = BigDecimal(206.835 - 1.015 * (6.0 / 3.0) - 84.6 * (5.0 / 6.0))
      .setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(a.getDouble(5) == expected, s"${a.getDouble(5)} != $expected")
    // queueing: 1 word, "!?" one sentence run, vowel groups ueuei+... ->
    // q-ueuei-ng = 1 group
    val b = out("s2")
    assert(b.getLong(2) == 1 && b.getLong(3) == 1 && b.getLong(4) == 1,
      b.toString)
    // determinism across partitionings
    val again = TextOps.readabilityReport(docs.repartition(5), "source")
      .collect().map(_.toString).toSeq
    assert(again == out.values.map(_.toString).toSeq.sorted ||
      again.sorted == out.values.map(_.toString).toSeq.sorted)
  }

  test("burstinessReport: metronome gaps hit B = -1; hand moments; censored last events excluded") {
    import spark.implicits._
    // A: u1 at 0,10,20,30 -> gaps 10,10,10 -> cv2 = 0, B = -1
    // B: u2 at 0,1,101 -> gaps 1,100 -> cv2 = 9801/10201
    val e = Seq((1L, 0L, 1L, "A"), (1L, 10L, 2L, "A"), (1L, 20L, 3L, "A"),
      (1L, 30L, 4L, "A"),
      (2L, 0L, 5L, "B"), (2L, 1L, 6L, "B"), (2L, 101L, 7L, "B"))
      .toDF("user_id", "tk", "event_id", "event_type")
    val out = EventOps.burstinessReport(e, col("tk")).collect()
      .map(r => r.getString(0) -> r).toMap
    val a = out("A")
    assert(a.getLong(1) == 3 && a.getDouble(2) == 10.0)
    assert(a.getDouble(3) == 0.0 && a.getDouble(4) == -1.0, a.toString)
    val b = out("B")
    val cv2 = 9801.0 / 10201.0
    assert(b.getLong(1) == 2 && b.getDouble(3) == cv2, b.toString)
    assert(b.getDouble(4) ==
      (math.sqrt(cv2) - 1.0) / (math.sqrt(cv2) + 1.0))
    // a user's LAST event has no gap: n_gaps sums to rows - users
    assert(out.values.map(_.getLong(1)).sum == 7 - 2)
  }

  test("stickinessReport: hand-computed trailing windows, empty-day spine, ratio") {
    import spark.implicits._
    val dayUs = 86400000000L
    // u1 days {0,1}, u2 {0}, u3 {8} -> span 0..8
    val e = Seq((1L, 0L), (1L, 0L), (1L, 1L), (2L, 0L), (3L, 8L))
      .map { case (u, d) => (u, d * dayUs + 3L) }.toDF("user_id", "us")
    val out = EventOps.stickinessReport(e, col("us")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1.0 else r.getDouble(3)))
    assert(out.length == 9, "one row per day in the span")
    assert(out(0) == ((0L, 2L, 2L, 1.0)) && out(1) == ((1L, 1L, 2L, 0.5)),
      out.toSeq)
    (2 to 6).foreach(d => assert(out(d) == ((d.toLong, 0L, 2L, 0.0)),
      out(d).toString))
    assert(out(7) == ((7L, 0L, 1L, 0.0)) && out(8) == ((8L, 1L, 1L, 1.0)))
  }

  test("cohortLtv: hand-computed cohort cells, cumulative per-user curve, null revenue coalesced") {
    import spark.implicits._
    val wk = 604800000000L
    val e = Seq(
      (1L, 0L, Some(10.5)), (1L, 1L, Some(2.25)), (2L, 0L, Some(1.0)),
      (2L, 0L, None), (3L, 1L, Some(4.0)))
      .map { case (u, w, v) => (u, w * wk + 9L, v) }
      .toDF("user_id", "us", "value")
    val out = EventOps.cohortLtv(e, col("us"), "value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
    assert(out.toSeq == Seq(
      (0L, 0L, 2L, 11.5, 11.5, 5.75),
      (0L, 1L, 1L, 2.25, 13.75, 6.875),
      (1L, 0L, 1L, 4.0, 4.0, 4.0)), out.toSeq)
  }

  test("heapsFit: exact-line sources recover beta=0.5, log2_k=0") {
    import spark.implicits._
    // (tt, vt) = (4,2), (16,4), (64,8): log2 points (2,1),(4,2),(6,3)
    def rep(toks: Seq[String], times: Int) =
      Seq.fill(times)(toks).flatten.mkString(" ")
    val docs = Seq(
      ("s1", rep(Seq("a", "b"), 2)),
      ("s2", rep(Seq("a", "b", "c", "d"), 4)),
      ("s3", rep((0 until 8).map("t" + _), 8)))
      .toDF("source", "text")
    val r = TextOps.heapsFit(docs).collect().head
    assert(r.getLong(0) == 3 && r.getDouble(1) == 0.5 &&
      r.getDouble(2) == 0.0, r.toString)
  }

  test("growthAccounting: hand-classified weeks, horizon-capped churn, accounting identities") {
    import spark.implicits._
    // weeks via WeekUs ticks: u1 {0,1,3}, u2 {1}, u3 {0,2,3}
    val wk = 604800000000L
    val e = Seq((1L, 0L), (1L, 1L), (1L, 3L), (2L, 1L),
      (3L, 0L), (3L, 2L), (3L, 3L), (3L, 3L))
      .map { case (u, w) => (u, w * wk + 5L) }.toDF("user_id", "us")
    val out = EventOps.growthAccounting(e, col("us")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(out.toSeq == Seq(
      (0L, 2L, 0L, 0L, 0L), (1L, 1L, 1L, 0L, 1L),
      (2L, 0L, 0L, 1L, 2L), (3L, 0L, 1L, 1L, 0L)), out.toSeq)
    // identities: active(w) = new+ret+res; retained(w) = active(w-1) - churned(w)
    val active = out.map(r => r._1 -> (r._2 + r._3 + r._4)).toMap
    out.filter(_._1 > 0).foreach { r =>
      assert(r._3 == active(r._1 - 1) - r._5,
        s"retained(${r._1}) must equal active(${r._1 - 1}) - churned(${r._1})")
    }
  }

  test("captureRecapture: hand overlap, Chapman estimate, duplicate-insensitive sides") {
    import spark.implicits._
    // A (even ids): {x,y,z}; B (odd ids): {y,z,w,w dup} -> na=3 nb=3 m=2
    // Chapman = 4*4/3 - 1 = 13/3; true population 4
    val docs = Seq((0L, "x"), (2L, "y"), (4L, "z"),
      (1L, "y"), (3L, "z"), (5L, "w"), (7L, "w"))
      .toDF("doc_id", "text")
    val r = DedupOps.captureRecapture(docs,
      org.apache.spark.sql.functions.pmod(col("doc_id"), lit(2)) === 0)
      .collect().head
    assert(r.getLong(0) == 3 && r.getLong(1) == 3 && r.getLong(2) == 2,
      r.toString)
    assert(r.getDouble(3) == 16.0 / 3.0 - 1.0)
  }

  test("codeDetectReport: symbol cross-multiply flag, keyword threshold, hand counts") {
    import spark.implicits._
    // d1: "def f(x): return x;" -> syms ( ) ; : is not in set -> ( ) ; = 3
    //     n_chars 19; 50*3=150 > 19 -> code. kws def, return = 2 -> code.
    // d2: "the quiet morning" -> 0 syms, 0 kws, 17 chars -> prose
    // d3: "a = b" -> 1 sym '='; 50 > 5 -> code by symbols, 0 kws
    // d4: "if only they knew if that" -> kw 'if' twice -> code, 0 syms
    val docs = Seq(
      ("s1", "def f(x): return x;", 19L), ("s1", "the quiet morning", 17L),
      ("s2", "a = b", 5L), ("s2", "if only they knew if that", 26L))
      .toDF("source", "text", "n_chars")
    val out = TextOps.codeDetectReport(docs, "source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(out.toSeq == Seq(("s1", 2L, 1L, 3L, 2L, 0.5),
      ("s2", 2L, 2L, 1L, 2L, 1.0)), out.toSeq)
  }

  test("hazardReport: observed gaps + right-censored last events, decade buckets, at-risk cumulative") {
    import spark.implicits._
    // u1: A@0 -> gap 5 (bucket 1); B@5 -> gap 995 (bucket 3); A@1000
    // censored t=0 (bucket 0). u2: B@0 censored t=1000 (bucket 4).
    val e = Seq((1L, 0L, 1L, "A"), (1L, 5L, 2L, "B"), (1L, 1000L, 3L, "A"),
      (2L, 0L, 4L, "B")).toDF("user_id", "tk", "event_id", "event_type")
    val out = EventOps.hazardReport(e, col("tk")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(out.toSeq == Seq(
      ("A", 0L, 0L, 1L, 2L, 0.0), ("A", 1L, 1L, 0L, 1L, 1.0),
      ("B", 3L, 1L, 0L, 2L, 0.5), ("B", 4L, 0L, 1L, 1L, 0.0)), out.toSeq)
    // determinism across partitionings
    val again = EventOps.hazardReport(e.repartition(5), col("tk")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(again.toSeq == out.toSeq)
  }

  test("rfmReport: hand-computed scores; null users dropped; quantile-refine cutpoint composition") {
    import spark.implicits._
    // gmx=100, unit=10: u1 rec 0, f 2, m 30.75; u2 rec 0, f 1, m NULL->0;
    // u3 rec (100-30)/10=7, f 3, m 3.0
    val e = Seq(
      (Some(1L), 5L, Some(10.5)), (Some(1L), 95L, Some(20.25)),
      (Some(2L), 100L, None), (Some(3L), 10L, Some(1.0)),
      (Some(3L), 20L, Some(1.0)), (Some(3L), 30L, Some(1.0)),
      (None, 100L, Some(99.0)))
      .toDF("user_id", "tk", "value")
    val out = EventOps.rfmReport(e, col("tk"), "user_id", "value", 10L,
      cutR = (0L, 3L, 7L), cutF = (1L, 2L, 3L), cutM = (1.0, 5.0, 30.0))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out.size == 3, "null user_id row must be dropped")
    assert(out(1L).getLong(1) == 0 && out(1L).getLong(2) == 2 &&
      out(1L).getDouble(3) == 30.75 && out(1L).getLong(7) == 434,
      out(1L).toString)
    assert(out(2L).isNullAt(3) && out(2L).getLong(7) == 421, out(2L).toString)
    assert(out(3L).getLong(1) == 7 && out(3L).getLong(7) == 242,
      out(3L).toString)
    // cutpoint composition: quartiles from exactQuantileRefine over the
    // op's own per-user monetary feed back in as cutM — 8 users with
    // monetary 1..8 quarter into m_score buckets of exactly 2
    val e8 = (1 to 8).map(i => (i.toLong, i.toLong, i.toDouble))
      .toDF("user_id", "tk", "value")
    val base = EventOps.rfmReport(e8, col("tk"), "user_id", "value", 1L,
      (0L, 0L, 0L), (1L, 1L, 1L), (0.0, 0.0, 0.0))
    val cuts = SketchOps.exactQuantileRefine(
        base.withColumn("one", lit("all")),
        col("monetary").cast("double"), "one", binWidth = 1L, bins = 16,
        permille = Seq(250, 500, 750))
      .orderBy("q").collect().map(_.getDouble(2))
    assert(cuts.toSeq == Seq(2.75, 4.5, 6.25), cuts.mkString(","))
    val scored = EventOps.rfmReport(e8, col("tk"), "user_id", "value", 1L,
      (0L, 0L, 0L), (1L, 1L, 1L), (cuts(0), cuts(1), cuts(2)))
    val hist = scored.groupBy("m_score").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hist == Map(1L -> 2L, 2L -> 2L, 3L -> 2L, 4L -> 2L), hist.toString)
  }

  test("diverseSample: nearest-centroid membership, per-cluster cap, prototype vs fringe") {
    import spark.implicits._
    val cents = Seq((0L, Array(1.0, 0.0, 0.0, 0.0)),
      (1L, Array(0.0, 1.0, 0.0, 0.0))).toDF("cid", "ce")
    // c0: v1 csim 1.0, v2 .9; c1: v3 1.0, v5 ~.9536, v4 .9
    val e = Seq(
      (1L, Array(1f, 0f, 0f, 0f)), (2L, Array(0.9f, 0.4358899f, 0f, 0f)),
      (3L, Array(0f, 1f, 0f, 0f)), (4L, Array(0.4358899f, 0.9f, 0f, 0f)),
      (5L, Array(0.3f, 0.95f, 0f, 0f))).toDF("vec_id", "embedding")
    val top1 = SimilarityOps.diverseSample(e, cents, 1).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(top1 == Map(0L -> 1L, 1L -> 3L), top1.toString)
    val fringe1 = SimilarityOps.diverseSample(e, cents, 1, mostCentral = false)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(fringe1 == Map(0L -> 2L, 1L -> 4L),
      s"farthest-first must pick each cluster's least-central: $fringe1")
    // the cap is PER CLUSTER: k=2 keeps 2 of c1's 3 members, 4 rows total
    val k2 = SimilarityOps.diverseSample(e, cents, 2)
    assert(k2.count() == 4 &&
      k2.filter(col("cid") === 1L).collect().map(_.getLong(2)).toSet ==
        Set(3L, 5L))
  }

  test("dwellReport: per-user gaps credited to the FROM event's type; last events emit nothing") {
    import spark.implicits._
    // user 1: click@1µs -> view@25 -> click2@100 (gap 24 credited to
    // click, 75 to view, nothing to the last event); user 2: one event
    // only -> no gap rows
    val ev = Seq(
      (10L, 1L, 1L, "click"), (11L, 1L, 25L, "view"), (12L, 1L, 100L, "click2"),
      (20L, 2L, 50L, "view"))
      .toDF("event_id", "user_id", "us0", "event_type")
    val r = EventOps.dwellReport(
        ev.select(col("event_id"), col("user_id"), col("event_type"),
          col("us0").as("ts")), col("ts"))
      .collect().map(x => x.getString(0) ->
        (x.getLong(1), x.getLong(2), x.getLong(3), x.getDouble(4))).toMap
    assert(r("click") == ((1L, 24L, 24L, 24.0)), r.toString)
    assert(r("view") == ((1L, 75L, 75L, 75.0)), r.toString)
    // the user's LAST event (click2@100) and the single-event user
    // produce no gap rows at all
    assert(!r.contains("click2"))
    assert(r.values.map(_._1).sum == 2L)
  }

  test("cdcChunks: lossless reassembly; boundaries resynchronize after an insertion") {
    import spark.implicits._
    val base = (1 to 400).map(i => s"w${i % 97}x$i").mkString(" ")
    val edited = "INSERTED TOKENS HERE " + base
    val docs = Seq((0L, base), (1L, edited)).toDF("doc_id", "text")
    val r = TextOps.cdcChunks(docs, window = 3, maskBits = 4)
      .orderBy("doc_id", "idx").collect()
    val byDoc = r.groupBy(_.getLong(0)).view.mapValues(_.sortBy(_.getLong(1)))
    // lossless: chunks joined in order reproduce the exact text
    assert(byDoc(0L).map(_.getString(3)).mkString(" ") == base)
    assert(byDoc(1L).map(_.getString(3)).mkString(" ") == edited)
    // chunk token counts sum to the doc token count
    assert(byDoc(0L).map(_.getLong(2)).sum == 400)
    // resynchronization: boundaries are local-content functions, so after
    // the head insertion the two docs share their entire chunk TAIL —
    // fixed-grid chunking (chunkDedup) shares none. At least half of
    // doc 0's chunks must reappear verbatim in doc 1.
    val c0 = byDoc(0L).map(_.getString(3)).toSet
    val c1 = byDoc(1L).map(_.getString(3)).toSet
    val shared = c0.intersect(c1).size
    assert(shared * 2 >= byDoc(0L).size,
      s"only $shared of ${byDoc(0L).size} chunks resynchronized")
    // multiple chunks actually formed (maskBits=4 -> ~16-token chunks)
    assert(byDoc(0L).size >= 10, s"got ${byDoc(0L).size} chunks")
  }

  test("cdcChunks: docs shorter than the window yield one whole-doc chunk (no crash)") {
    import spark.implicits._
    // 1- and 2-token docs have NO interior boundary candidates at
    // window=3: sequence(3, n) would descend and drive slice() starts
    // to 0/negative without the n >= window guard. Contract (mirrors
    // the oracle's empty range(3, n+1)): exactly one chunk = the doc.
    val docs = Seq((0L, "solo"), (1L, "two tokens"), (2L, "one two three"),
      (3L, (1 to 50).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
    val r = TextOps.cdcChunks(docs, window = 3, maskBits = 2)
      .orderBy("doc_id", "idx").collect()
    val byDoc = r.groupBy(_.getLong(0))
    assert(byDoc(0L).length == 1 && byDoc(0L).head.getString(3) == "solo")
    assert(byDoc(0L).head.getLong(1) == 0L && byDoc(0L).head.getLong(2) == 1L)
    assert(byDoc(1L).length == 1 && byDoc(1L).head.getString(3) == "two tokens")
    assert(byDoc(1L).head.getLong(2) == 2L)
    // exactly-window-length doc still runs the boundary filter path
    assert(byDoc(2L).map(_.getString(3)).mkString(" ") == "one two three")
    // long doc unaffected by the guard: lossless reassembly holds
    assert(byDoc(3L).map(_.getLong(2)).sum == 50L)
    // and the dedup apply over the same mixed-length corpus doesn't crash
    val d = TextOps.cdcChunkDedup(docs, window = 3, maskBits = 2)
      .orderBy("doc_id").collect()
    assert(d.length == 4 && d.forall(_.getLong(1) >= 1L))
  }

  test("cdcChunkDedup: removes boilerplate shifted by an edit; rebuild digests pin bytes") {
    import spark.implicits._
    // same 400-token body, doc 1 with a 3-token head insertion: the CDC
    // boundaries resynchronize, so the shared body chunks are detected
    // as duplicates in BOTH docs despite the offset
    val body = (1 to 400).map(i => s"w${i % 97}x$i").mkString(" ")
    val docs = Seq((0L, body), (1L, "INSERTED TOKENS HERE " + body))
      .toDF("doc_id", "text")
    val r = TextOps.cdcChunkDedup(docs, window = 3, maskBits = 4)
      .orderBy("doc_id").collect()
    // most of both docs must be flagged as shared (resynchronized tail)
    assert(r(0).getLong(2) * 2 >= r(0).getLong(1),
      s"doc0 removed ${r(0).getLong(2)} of ${r(0).getLong(1)} chunks")
    assert(r(1).getLong(2) > 0, r(1).toString)
    // survivors reassemble deterministically: digest = md5 of clean text
    val clean0 = r(0).getString(3)
    assert(clean0.length == 32 && r(0).getLong(4) >= 0)
  }

  test("tokenEntropy: zero for constant docs, log2(n) for uniform docs, bounded by distinct count") {
    import spark.implicits._
    val docs = Seq(
      (0L, "x x x x x"),            // constant -> H = 0
      (1L, "a b c d"),              // uniform over 4 -> H = 2 exactly
      (2L, "a a b c")               // H = 1.5 exactly (0.5 + 2*0.5)
    ).toDF("doc_id", "text")
    val r = TextOps.tokenEntropy(docs).orderBy("doc_id").collect()
    // Emission is BIGINT micro-bits (entropy·1e7) — see tokenEntropy doc.
    def h(i: Int) = r(i).getLong(2)
    assert(r(0).getLong(1) == 5 && h(0) == 0L)
    assert(r(1).getLong(1) == 4 && h(1) == 20000000L)
    assert(r(2).getLong(1) == 4 && h(2) == 15000000L)
  }

  test("trigramPerplexity: closed-form mixture values on a token-disjoint two-doc corpus") {
    import spark.implicits._
    // Token-disjoint docs keep every count hand-computable (only the
    // corpus total N = 8 is shared).
    // doc0 "x x x x": trigram "x x x" c123=2; c12=c23("x x")=3; c2=c3=4
    //   -> p = .6·2/3 + .3·3/4 + .1·4/8 = 0.675 (context less certain
    //      than doc1's: "x x" also continues to end-of-doc).
    // doc1 "a b c d": both trigrams singleton with singleton contexts
    //   -> p = .6 + .3 + .1·1/8 = 0.9125 for each.
    val docs = Seq(
      (0L, "x x x x"),
      (1L, "a b c d")).toDF("doc_id", "text")
    val r = TextOps.trigramPerplexity(docs).orderBy("doc_id").collect()
    def expected(p: Double) = {
      val t = BigDecimal(-math.log(p) / math.log(2.0))
        .setScale(7, BigDecimal.RoundingMode.HALF_UP)
      t.setScale(6, BigDecimal.RoundingMode.HALF_UP).doubleValue
    }
    assert(r(0).getLong(1) == 2)
    assert(r(0).getDouble(2) == expected(0.6 * 2 / 3 + 0.3 * 3 / 4.0 + 0.1 * 4 / 8.0),
      r(0).toString)
    assert(r(1).getLong(1) == 2)
    assert(r(1).getDouble(2) == expected(0.6 + 0.3 + 0.1 * 1 / 8.0), r(1).toString)
  }

  test("cohortRetention: first-seen week cohorts, within-week duplicates collapse") {
    import spark.implicits._
    val wk = 7L * 24 * 3600 * 1000000L
    val ev = Seq(
      (1L, 0L * wk + 5L), (1L, 0L * wk + 9L), (1L, 1L * wk), (1L, 3L * wk),
      (2L, 0L * wk), (2L, 2L * wk),
      (3L, 1L * wk + 17L)).toDF("user_id", "us")
    val r = EventOps.cohortRetention(ev, col("us"))
      .orderBy("cohort_week", "week_offset").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    assert(r.toSeq == Seq((0L, 0L, 2L), (0L, 1L, 1L), (0L, 2L, 1L),
      (0L, 3L, 1L), (1L, 0L, 1L)), r.toSeq.toString)
  }

  test("transitionCounts: per-user sequencing, exact row-normalized probabilities") {
    import spark.implicits._
    // user 1: A@1 -> B@2 -> A@3; user 2: B@1 -> B@2; last events emit no row
    // transitions: A->B ×1, B->A ×1, B->B ×1; from A: p=1; from B: p=0.5 each
    val ev = Seq(
      (1L, 1L, 10L, "A"), (1L, 2L, 11L, "B"), (1L, 3L, 12L, "A"),
      (2L, 1L, 20L, "B"), (2L, 2L, 21L, "B")).toDF("user_id", "ts", "event_id", "event_type")
    val r = EventOps.transitionCounts(ev).orderBy("from_type", "to_type").collect()
      .map(x => (x.getString(0), x.getString(1), x.getLong(2), x.getDouble(3)))
    assert(r.toSeq == Seq(("A", "B", 1L, 1.0), ("B", "A", 1L, 0.5),
      ("B", "B", 1L, 0.5)), r.toSeq.toString)
    // tie on ts breaks by event_id: same-ts events order 30 -> 31
    val tie = Seq((5L, 7L, 31L, "Y"), (5L, 7L, 30L, "X")).toDF(
      "user_id", "ts", "event_id", "event_type")
    val t = EventOps.transitionCounts(tie).collect()
    assert(t.length == 1 && t(0).getString(0) == "X" && t(0).getString(1) == "Y")
  }

  test("markovAttribution: hand-solved removal effects, conversion splits journeys") {
    import spark.implicits._
    // u1: ad -> purchase; u2: ad -> search -> purchase; u3: search (drop).
    // Chain: P(conv)=2/3; remove ad -> 1/6 (effect 3/4); remove search
    // -> 1/3 (effect 1/2); shares 0.6 / 0.4.
    val ev = Seq(
      (1L, 1L, 1L, "ad"), (1L, 2L, 2L, "purchase"),
      (2L, 1L, 3L, "ad"), (2L, 2L, 4L, "search"), (2L, 3L, 5L, "purchase"),
      (3L, 1L, 6L, "search")).toDF("user_id", "ts", "event_id", "event_type")
    val r = EventOps.markovAttribution(ev, "purchase").collect()
      .map(x => x.getString(0) -> x).toMap
    def d(x: Double, want: Double) = math.abs(x - want) < 1e-9
    assert(d(r("__p_conv__").getDouble(1), 2.0 / 3.0), r.toString)
    assert(d(r("ad").getDouble(1), 0.75) && d(r("ad").getDouble(2), 0.6), r.toString)
    assert(d(r("search").getDouble(1), 0.5) && d(r("search").getDouble(2), 0.4),
      r.toString)
    // a post-conversion touch starts a NEW journey (u4: ad -> purchase ->
    // search, the search dangles): hand-resolved chain gives P(conv)=0.6
    val ev2 = ev.unionAll(Seq(
      (4L, 1L, 7L, "ad"), (4L, 2L, 8L, "purchase"), (4L, 3L, 9L, "search"))
      .toDF("user_id", "ts", "event_id", "event_type"))
    val r2 = EventOps.markovAttribution(ev2, "purchase").collect()
      .map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(d(r2("__p_conv__"), 0.6), r2.toString)
  }

  test("applyChangelog: update wins, stale change loses, tombstone deletes, insert lands") {
    import spark.implicits._
    val snap = Seq(
      (1L, 10L, 100L, "state", 1.0), // will be updated
      (2L, 11L, 101L, "state", 2.0), // will be tombstoned
      (3L, 12L, 102L, "state", 3.0)) // a STALE change arrives -> survives
      .toDF("user_id", "event_id", "ts_us", "event_type", "value")
    val changes = Seq(
      (1L, 20L, 200L, "state", 1.5),
      (2L, 21L, 201L, "dead", 0.0),
      (3L, 9L, 50L, "state", -9.0),  // older than the snapshot row
      (4L, 22L, 202L, "state", 4.0))
      .toDF("user_id", "event_id", "ts_us", "event_type", "value")
    val r = EventOps.applyChangelog(snap, changes, Seq("user_id"),
        Seq(col("ts_us"), col("event_id")), col("event_type") === "dead")
      .orderBy("user_id").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getDouble(4)))
    assert(r.toSeq == Seq((1L, 20L, 1.5), (3L, 12L, 3.0), (4L, 22L, 4.0)),
      r.toSeq.toString)
    // same-ts tie resolves by the event_id tie-break column
    val tieSnap = Seq((7L, 1L, 500L, "state", 0.1))
      .toDF("user_id", "event_id", "ts_us", "event_type", "value")
    val tieChg = Seq((7L, 2L, 500L, "state", 0.2))
      .toDF("user_id", "event_id", "ts_us", "event_type", "value")
    val t = EventOps.applyChangelog(tieSnap, tieChg, Seq("user_id"),
      Seq(col("ts_us"), col("event_id")), lit(false)).collect()
    assert(t.length == 1 && t(0).getLong(1) == 2L)
  }

  test("bitextMine: ratio margin normalizes by both neighborhoods, exact decimal arithmetic") {
    import spark.implicits._
    val a = Seq((0L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val b = Seq((1L, Array(1.0f, 0.0f)), (3L, Array(0.8f, 0.6f)))
      .toDF("vec_id", "embedding")
    val r = SimilarityOps.bitextMine(a, b, k = 1).orderBy("src_id").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getDouble(2), x.getDouble(3)))
    // x0 -> y1 (cos 1.0): margin 2*1.0/(1.0 + 1.0) = 1.0
    // x2 -> y3 (cos 0.6): margin 2*0.6/(0.6 + 0.8) = 6/7
    assert(r(0) == ((0L, 1L, 1.0, 1.0)), r(0).toString)
    assert(r(1)._1 == 2L && r(1)._2 == 3L && r(1)._3 == 0.6, r(1).toString)
    assert(math.abs(r(1)._4 - 1.2 / 1.4) < 1e-12, r(1).toString)
  }

  test("rollingDaily: RANGE frame excludes absent days by value, not by row position") {
    import spark.implicits._
    val day = 86400000000L
    val ev = Seq(
      ("A", 1 * day + 5, 10.0), ("A", 2 * day + 5, 20.0),
      ("A", 9 * day + 1, 5.0), ("A", 9 * day + 2, 5.0))
      .toDF("event_type", "tus", "value")
    val r = EventOps.rollingDaily(ev, col("tus"), windowDays = 7)
      .orderBy("day").collect()
      .map(x => (x.getLong(1), x.getLong(2), x.getLong(4), x.getDouble(5)))
    // day 9's 7-day frame is [3, 9]: days 1 and 2 are OUT even though they
    // are the adjacent ROWS — the rows-frame bug this op exists to avoid
    assert(r.toSeq == Seq((1L, 1L, 1L, 10.0), (2L, 1L, 2L, 30.0),
      (9L, 2L, 2L, 10.0)), r.toSeq.toString)
  }

  test("mixEpochs: sqrt-temperature budget split, epochs flag the data-constrained language") {
    import spark.implicits._
    // lang a: 100 tokens, lang b: 400 -> s6 = 10, 20 -> shares 1/3, 2/3
    val docs = Seq(
      (1L, "a", Seq.fill(100)("w").mkString(" ")),
      (2L, "b", Seq.fill(400)("w").mkString(" ")))
      .toDF("doc_id", "lang", "text")
    val r = TextOps.mixEpochs(docs, budgetTokens = 900L).orderBy("lang").collect()
      .map(x => (x.getString(0), x.getLong(1), x.getDouble(2), x.getDouble(3),
        x.getDouble(4), x.getBoolean(5)))
    // a: target 300 over 100 avail -> 3 epochs (oversampled)
    // b: target 600 over 400 avail -> 1.5 epochs (oversampled)
    assert(r(0)._1 == "a" && r(0)._2 == 100L && r(0)._5 == 3.0 && r(0)._6,
      r(0).toString)
    assert(r(1)._1 == "b" && r(1)._2 == 400L && r(1)._5 == 1.5 && r(1)._6,
      r(1).toString)
    assert(math.abs(r(0)._3 + r(1)._3 - 1.0) < 1e-12, "shares sum to 1")
  }

  test("pmiCollocations: lift ranks pairs by exact contingency ratio with a total-order cut") {
    import spark.implicits._
    // bigrams of "a b a b c b": (a,b)x2 (b,a) (b,c) (c,b); N = 5
    val docs = Seq((1L, "a b a b c b")).toDF("doc_id", "text")
    val r = TextOps.pmiCollocations(docs, minCount = 1L, k = 10).collect()
      .map(x => (x.getString(0), x.getString(1), x.getLong(2), x.getDouble(5)))
    assert(r.toSeq == Seq(
      ("b", "a", 1L, 2.5), ("b", "c", 1L, 2.5), // tie -> w2 ascending
      ("a", "b", 2L, 10.0 / 6.0), ("c", "b", 1L, 10.0 / 6.0)), r.toSeq.toString)
  }

  test("gapFill: missing days materialize with n=0 and the carry holds the last observed sum") {
    import spark.implicits._
    val day = 86400000000L
    val ev = Seq(
      ("A", 10 * day + 1, 1.5), ("A", 10 * day + 2, 2.5), ("A", 12 * day, 4.0),
      ("B", 11 * day, 3.0))
      .toDF("event_type", "tus", "value")
    val r = EventOps.gapFill(ev, col("tus")).orderBy("event_type", "day").collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2),
        if (x.isNullAt(3)) null else x.getDouble(3),
        if (x.isNullAt(4)) null else x.getDouble(4)))
    assert(r.toSeq == Seq(
      ("A", 10L, 2L, 4.0, 4.0),
      ("A", 11L, 0L, null, 4.0), // gap day: zero count, carry holds
      ("A", 12L, 1L, 4.0, 4.0),
      ("B", 10L, 0L, null, null), // before B's first observation
      ("B", 11L, 1L, 3.0, 3.0),
      ("B", 12L, 0L, null, 3.0)), r.toSeq.toString)
  }

  test("pseudonymize: deterministic salted tokens, null passthrough, other columns untouched") {
    import spark.implicits._
    val a = Seq((1L, Option(42L), "click"), (2L, Option(42L), "view"),
      (3L, None, "click"), (4L, Option(7L), "view"))
      .toDF("event_id", "user_id", "event_type")
    val r = EventOps.pseudonymize(a, Seq("user_id"), "s1")
      .orderBy("event_id").collect()
    // same (salt, value) -> same token, across rows and across calls
    assert(r(0).getString(1) == r(1).getString(1))
    assert(r(0).getString(1) == md5hex("s1:42"))
    assert(r(3).getString(1) == md5hex("s1:7"))
    assert(r(2).isNullAt(1), "null key must stay null for completeness audits")
    assert(r.map(_.getString(2)).toSeq == Seq("click", "view", "click", "view"))
    // a different salt unlinks the release
    val r2 = EventOps.pseudonymize(a, Seq("user_id"), "s2")
      .orderBy("event_id").collect()
    assert(r2(0).getString(1) != r(0).getString(1))
  }

  test("writeObserved: in-flight metrics equal the read-back truth, no second scan") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft-observed").toString + "/t"
    val df = Seq((Option(1L), "a"), (Option(2L), "b"), (Option(3L), "c"),
      (Option.empty[Long], "d")).toDF("id", "v")
    val m = LayoutOps.writeObserved(df, out, col("id"))
    assert(m("n_rows") == 4L && m("id_nulls") == 1L, m.toString)
    assert(m("id_min") == 1L && m("id_max") == 3L, m.toString)
    // read-back agrees with the streamed-out metrics
    val back = spark.read.parquet(out)
    assert(back.count() == 4 && back.filter(col("id").isNull).count() == 1)
    // empty input: count 0, min/max NULL — the documented degenerate form
    val me = LayoutOps.writeObserved(df.filter(lit(false)), out + "2", col("id"))
    assert(me("n_rows") == 0L && me("id_min") == null, me.toString)
  }

  test("compact: rewrites many small files into the row-bound file count, content-identical") {
    import spark.implicits._
    val in = java.nio.file.Files.createTempDirectory("graft-cin").toString + "/t.parquet"
    val out = java.nio.file.Files.createTempDirectory("graft-cout").toString + "/t.parquet"
    spark.range(100).select(col("id"), (col("id") % 7).as("k"))
      .repartition(50).write.parquet(in)
    def parts(d: String) = new java.io.File(d).listFiles()
      .count(f => f.getName.startsWith("part-"))
    assert(parts(in) == 50)
    LayoutOps.compact(spark, in, out, targetRowsPerFile = 25)
    assert(parts(out) == 4, s"expected ceil(100/25)=4 files, got ${parts(out)}")
    val a = spark.read.parquet(in).collect().map(_.toSeq).toSet
    val b = spark.read.parquet(out).collect().map(_.toSeq).toSet
    assert(a == b, "compaction must be a byte-identical row rewrite")
    intercept[IllegalArgumentException] {
      LayoutOps.compact(spark, in, in, 25)
    }
  }

  test("applyChangelog: a NULL tombstone verdict keeps the row (three-valued logic)") {
    import spark.implicits._
    // user 9's surviving row has a NULL type: !(NULL === 'del') is NULL,
    // which must read as "did not match the delete predicate"
    val snap = Seq((9L, Option.empty[String], 1L), (8L, Option("ok"), 1L))
      .toDF("user_id", "typ", "ord")
    val chg = Seq((8L, Option("del"), 2L)).toDF("user_id", "typ", "ord")
    val r = EventOps.applyChangelog(snap, chg, Seq("user_id"), Seq(col("ord")),
        col("typ") === "del")
      .collect().map(_.getLong(0)).toSet
    assert(r == Set(9L), s"user 9 must survive its NULL verdict, 8 deletes: $r")
  }

  test("attribution: lookback bounds, equal credit, untouched conversions emit nothing") {
    import spark.implicits._
    // ts in ns (the op divides to µs). Window = 20 µs.
    def ns(us: Long) = us * 1000L
    val ev = Seq(
      (1L, 1L, ns(10), "click"),
      (1L, 2L, ns(20), "click"),
      (1L, 3L, ns(25), "purchase"),
      (1L, 4L, ns(26), "click"),   // after the conversion
      (1L, 5L, ns(4), "click"),    // 25-20=5: ts 4 is outside (exclusive low)
      (2L, 6L, ns(30), "purchase") // no touches at all
    ).toDF("user_id", "event_id", "ts", "event_type")
    val r = EventOps.attribution(ev, "purchase", "click", 20L)
      .orderBy("conv_id", "pos").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4)))
    assert(r.toSeq == Seq((3L, 1L, 1L, 2L, 5000L), (3L, 2L, 2L, 2L, 5000L)),
      r.toSeq.toString)
    // boundary: touch exactly at conv_ts is credited (inclusive high)
    val b = Seq((9L, 1L, ns(50), "click"), (9L, 2L, ns(50), "purchase"))
      .toDF("user_id", "event_id", "ts", "event_type")
    val rb = EventOps.attribution(b, "purchase", "click", 20L).collect()
    assert(rb.length == 1 && rb(0).getLong(4) == 10000L)
  }

  test("gopherRules: each rule fails on its designed violator, exact integer thresholds") {
    import spark.implicits._
    val docs = Seq(
      (0L, "the cats sat of and mats dogs fox owl elk"), // passes all (minWords=3)
      (1L, "of and"),                                  // too short at minWords=3
      (2L, "cat dog fox owl elk pig hen cow bee ant"), // zero stop words
      (3L, "the the the the the the the of of ant"),   // 3 distinct of 10 -> r_unique fails
      (4L, "the of incomprehensibilities extraordinarily " +
        "incomprehensibilities extraordinarily incomprehensibilities " +
        "antidisestablishmentarian extraordinarily floccinaucinihilipilification"))
      .toDF("doc_id", "text")
    val r = TextOps.gopherRules(docs, minWords = 3, maxWords = 100)
      .orderBy("doc_id").collect()
    def flags(i: Int) = (r(i).getBoolean(2), r(i).getBoolean(3),
      r(i).getBoolean(4), r(i).getBoolean(5), r(i).getBoolean(6))
    assert(flags(0) == (true, true, true, true, true), r(0).toString)
    assert(flags(1)._1 == false && flags(1)._5 == false, r(1).toString)
    assert(flags(2) == (true, true, false, true, false), r(2).toString)
    assert(flags(3)._4 == false && flags(3)._5 == false, r(3).toString)
    // doc 4: mean word length > 10 chars -> r_mean_len fails
    assert(flags(4)._2 == false && flags(4)._5 == false, r(4).toString)
  }

  test("bpeTrain/bpeEncode: merged symbols re-merge, ties break lexicographically, runs merge greedily, early stop") {
    import spark.implicits._
    val docs = Seq((0L, "abc abc abc ab"), (1L, "aaaa")).toDF("doc_id", "text")
    // vocab {abc:3, ab:1, aaaa:1}
    // r1 pairs: (a,b)=4, (b,c)=3, (a,a)=3            -> (a,b) 4
    // r2: abc=[ab,c], aaaa=[a,a,a,a]: (ab,c)=3 ties (a,a)=3 -> lex: (a,a)
    // r3: aaaa=[aa,aa]: (ab,c)=3, (aa,aa)=1          -> (ab,c) 3
    // r4: (aa,aa)=1                                  -> (aa,aa) 1
    // r5: no pairs left                              -> stop at 4 rows
    val m = TextOps.bpeTrain(docs, 5).orderBy("merge_round").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(m.toSeq == Seq((1L, "a", "b", 4L), (2L, "a", "a", 3L),
      (3L, "ab", "c", 3L), (4L, "aa", "aa", 1L)), m.toSeq.toString)
    val enc = TextOps.bpeEncode(docs, m.map(x => (x._2, x._3)).toSeq)
      .orderBy("doc_id").collect()
    // doc 0: abc -> [abc] x3, ab -> [ab]: 4 tokens over 11 chars
    assert(enc(0).getLong(1) == 4 && enc(0).getLong(2) == 11 &&
      enc(0).getLong(3) == 4, enc(0).toString)
    // doc 1: aaaa -> [aa,aa] -> [aaaa]: 1 token over 4 chars
    assert(enc(1).getLong(3) == 1 && enc(1).getDouble(4) == 0.25, enc(1).toString)
  }

  test("intervalJoinBinned: equals the brute-force theta join, exactly once per pair, any bin width") {
    import spark.implicits._
    val pts = Seq((1L, 5L), (2L, 10L), (3L, 17L), (4L, 100L))
      .toDF("pid", "p")
    // intervals spanning multiple bins at width 4; touching endpoints
    val ivs = Seq((10L, 3L, 11L), (20L, 10L, 10L), (30L, 16L, 40L))
      .toDF("iid", "lo", "hi")
    val brute = pts.crossJoin(ivs)
      .filter(col("p") >= col("lo") && col("p") <= col("hi"))
      .select("pid", "iid").orderBy("pid", "iid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    for (w <- Seq(1L, 4L, 100L)) {
      val got = RangeJoin.intervalJoinBinned(pts, ivs,
          col("p"), col("lo"), col("hi"), w)
        .select("pid", "iid").orderBy("pid", "iid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(got == brute, s"width $w: $got vs $brute")
    }
    // overlapping column names are rejected up front
    val e = intercept[IllegalArgumentException] {
      RangeJoin.intervalJoinBinned(pts, pts, col("p"), col("p"), col("p"), 1L)
    }
    assert(e.getMessage.contains("overlapping column names"))
  }

  test("labelKnnGraph: exact within-block neighbors, cos/dst tie-break, singleton blocks emit nothing") {
    import spark.implicits._
    def v(hot: Seq[(Int, Float)]) =
      Array.tabulate(64)(i => hot.toMap.getOrElse(i, 0f))
    val e = Seq(
      (0L, 1, v(Seq(0 -> 1f))),
      (1L, 1, v(Seq(0 -> 1f, 1 -> 1f))),
      (2L, 1, v(Seq(1 -> 1f))),
      (3L, 2, v(Seq(2 -> 1f)))).toDF("vec_id", "label", "embedding")
    val r = SimilarityOps.labelKnnGraph(e, 2).orderBy("src_id", "rank").collect()
      .map(x => (x.getLong(0), x.getInt(1), x.getLong(2), x.getDouble(3)))
    assert(r.length == 6, r.toSeq.toString) // vec 3's block is a singleton
    assert(r.toSeq == Seq(
      (0L, 1, 1L, 0.707107), (0L, 2, 2L, 0.0),
      (1L, 1, 0L, 0.707107), (1L, 2, 2L, 0.707107), // round-6 tie -> dst asc
      (2L, 1, 1L, 0.707107), (2L, 2, 0L, 0.0)), r.toSeq.toString)
  }

  test("zipfSlope: an exact-Zipf corpus (freq = C/rank) fits slope -1") {
    import spark.implicits._
    // freqs 12/6/4/3 = 12/r for ranks 1..4 -> log2(freq) = log2(12) -
    // log2(rank), every point exactly on the slope -1 line (up to the
    // round(7) of the regression inputs).
    val text = (Seq.fill(12)("aa") ++ Seq.fill(6)("bb") ++
      Seq.fill(4)("cc") ++ Seq.fill(3)("dd")).mkString(" ")
    val docs = Seq((0L, "en", text)).toDF("doc_id", "lang", "text")
    val r = TextOps.zipfSlope(docs).collect()
    assert(r.length == 1)
    assert(r(0).getLong(1) == 4) // k_used
    assert(math.abs(r(0).getDouble(2) + 1.0) < 1e-5, r(0).toString)
  }

  test("noveltyReport: shingle first-occurrence goes to the smallest doc_id") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d"), // shingles {a b c, b c d} — both first here
      (2L, "a b c x"), // {a b c (seen), b c x (novel)}
      (3L, "b c d e"), // {b c d (seen), c d e (novel)}
      (4L, "a b")) // < 3 words -> no shingles -> omitted
      .toDF("doc_id", "text")
    val r = TextOps.noveltyReport(docs).orderBy("doc_id").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getDouble(3)))
    assert(r.toSeq == Seq((1L, 2L, 2L, 1.0), (2L, 2L, 1L, 0.5),
      (3L, 2L, 1L, 0.5)), r.toSeq.toString)
  }

  test("noveltyReport: repeated shingles inside one doc count once") {
    import spark.implicits._
    val docs = Seq((7L, "a b c a b c a b c")).toDF("doc_id", "text")
    // windows: "a b c","b c a","c a b" each repeated -> 3 DISTINCT shingles
    val r = TextOps.noveltyReport(docs).collect()(0)
    assert(r.getLong(1) == 3 && r.getLong(2) == 3 && r.getDouble(3) == 1.0)
  }

  test("redactPii masks emails/ips/phones; counts are measured on the original text") {
    import spark.implicits._
    val docs = Seq(
      (0L, "write a.b+c@x-mail.org or ops@x.io from 192.168.0.1 call +4915123456789 now"),
      (1L, "no pii here at all")).toDF("doc_id", "text")
    val r = TextOps.redactPii(docs).collect()
    assert(r(0).getLong(1) == 2 && r(0).getLong(2) == 1 && r(0).getLong(3) == 1)
    val expected = "write <EMAIL> or <EMAIL> from <IP> call <PHONE> now"
    assert(r(0).getLong(4) == expected.length.toLong)
    assert(r(0).getString(5) == md5hex(expected))
    // a clean document passes through byte-identical
    assert(r(1).getLong(1) == 0 && r(1).getLong(2) == 0 && r(1).getLong(3) == 0)
    assert(r(1).getString(5) == md5hex("no pii here at all"))
  }

  test("contamination counts DISTINCT shared n-grams per corpus doc, clean docs absent") {
    import spark.implicits._
    val bench = Seq((100L, "a b c d")).toDF("doc_id", "text") // grams: "a b c", "b c d"
    val corpus = Seq(
      (0L, "a b c d e"),    // shares both benchmark 3-grams
      (1L, "x a b c y"),    // shares "a b c"
      (2L, "x y z w"),      // clean -> no output row
      (3L, "a b c a b c")). // repeated gram counts once (distinct within doc)
      toDF("doc_id", "text")
    val m = TextOps.contamination(corpus, bench)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m == Map(0L -> 2L, 1L -> 1L, 3L -> 1L), m.toString)
  }

  test("packSequences lays docs head-to-tail per lang and splits across pack boundaries") {
    import spark.implicits._
    // en tokens 3,4,5 at capacity 5: doc0 [0,3) p0; doc1 [3,7) p0(2)+p1(2);
    // doc2 [7,12) p1(3)+p2(2). de packs independently.
    val docs = Seq(
      (0L, "en", "a b c"), (1L, "en", "a b c d"), (2L, "en", "a b c d e"),
      (3L, "de", "x y")).toDF("doc_id", "lang", "text")
    val rows = TextOps.packSequences(docs, 5).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(rows == Seq(
      ("de", 0L, 3L, 2L),
      ("en", 0L, 0L, 3L), ("en", 0L, 1L, 2L),
      ("en", 1L, 1L, 2L), ("en", 1L, 2L, 3L),
      ("en", 2L, 2L, 2L)), rows.toString)
    // conservation: every token lands in exactly one pack
    assert(rows.filter(_._1 == "en").map(_._4).sum == 12L)
  }

  test("antiJoinDedup removes every exact-text match of the blocklist, keeps the rest") {
    import spark.implicits._
    val corpus = Seq((0L, "keep me"), (1L, "drop me"), (2L, "drop me"),
      (3L, "also keep")).toDF("doc_id", "text")
    val bl = Seq((9L, "drop me")).toDF("doc_id", "text")
    val kept = DedupOps.antiJoinDedup(corpus, bl).collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(0L, 3L))
  }

  test("randomProjection equals the driver-recomputed integer projection exactly") {
    import spark.implicits._
    import graft.core.DeterministicRng
    val vecs = Seq(
      0L -> Array.tabulate(SimilarityOps.DIM)(i => math.sin(i + 1).toFloat),
      1L -> Array.tabulate(SimilarityOps.DIM)(i => (math.cos(i) * 0.37).toFloat))
    val df = vecs.toDF("vec_id", "embedding")
    val got = SimilarityOps.randomProjection(df, outDim = 4, seed = 123L)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    val want = vecs.map { case (id, x) =>
      val q = x.map(v => BigDecimal(v.toDouble * 1000.0)
        .setScale(0, scala.math.BigDecimal.RoundingMode.HALF_UP).toLong)
      id -> (0 until 4).map { j =>
        (0 until SimilarityOps.DIM).map { i =>
          q(i) * (math.floor(DeterministicRng.uniform(123L, j.toLong, 0L, i.toLong) * 7.0) - 3.0).toLong
        }.sum
      }.toSeq
    }.toMap
    assert(got == want, s"got $got want $want")
  }

  test("kmvDistinct: exact below k, estimate within the theoretical error above k") {
    import spark.implicits._
    // group "small": 100 distinct keys < k=128 -> exact path
    // group "big": 5000 distinct keys -> estimate, stderr ~ 1/sqrt(k-2) ~ 9%
    val df = ((0 until 100).map(i => ("small", i)) ++
      (0 until 5000).map(i => ("big", i + 1000000))).toDF("g", "key")
    val r = SketchOps.kmvDistinct(df, col("key"), "g", 128)
      .collect().map(x => x.getString(0) -> (x.getLong(1), x.getDouble(2))).toMap
    assert(r("small") == ((100L, 100.0)))
    val (exact, est) = r("big")
    assert(exact == 5000L)
    assert(math.abs(est - 5000.0) / 5000.0 < 0.45, s"est $est") // 5 sigma
  }

  test("amsF2: exact self-join size on one side, estimate within the sketch error on the other") {
    import spark.implicits._
    // 50 keys x 20 rows each -> F2 = 50 * 400 = 20000
    val df = (0 until 1000).map(i => i % 50).toDF("k")
    val r = SketchOps.amsF2(df, col("k")).collect()(0)
    assert(r.getLong(0) == 20000L, r.toString)
    // median of 5 means of 16 estimators: rel std ~ sqrt(2/16) ~ 0.35 per
    // mean; 1.0 is a ~3-sigma bracket on the median
    assert(r.getDouble(2) < 1.0, s"rel_err ${r.getDouble(2)}")
    // deterministic: the hash family is fixed
    val again = SketchOps.amsF2(df, col("k")).collect()(0)
    assert(r.getDouble(1) == again.getDouble(1))
    intercept[IllegalArgumentException] {
      SketchOps.amsF2(df, col("k"), d = 4)
    }
  }

  test("kmvJaccard: exact below saturation, bracketed estimate above, disjoint sets score 0") {
    import spark.implicits._
    // Sub-saturated regime (k=64 > any union): the union sketch holds
    // EVERYTHING, so est must equal exact to the last bit. A={0..9},
    // B={5..14} -> J = 5/15; C disjoint -> J = 0 with both pairs present.
    val small = ((0 until 10).map(i => ("A", i)) ++ (5 until 15).map(i => ("B", i)) ++
      (100 until 110).map(i => ("C", i))).toDF("g", "key")
    val rs = SketchOps.kmvJaccard(small, col("key"), "g", 64)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(rs(("A", "B")) == ((15L, 5.0 / 15.0, 5.0 / 15.0)))
    assert(rs(("A", "C")) == ((20L, 0.0, 0.0)))
    assert(rs(("B", "C")) == ((20L, 0.0, 0.0)))
    // Saturated regime: 1500-key union at J=1/3, k=64 -> n_union_kept=k
    // and |est-exact| within ~5 sigma of sqrt(J(1-J)/k) ~ 0.059
    val big = ((0 until 1000).map(i => ("X", i)) ++ (500 until 1500).map(i => ("Y", i)))
      .toDF("g", "key")
    val rb = SketchOps.kmvJaccard(big, col("key"), "g", 64).collect().head
    assert(rb.getLong(2) == 64L, "union sketch must cap at k")
    assert(math.abs(rb.getDouble(4) - 1.0 / 3.0) < 1e-12, "exact path")
    assert(math.abs(rb.getDouble(3) - 1.0 / 3.0) < 0.30, s"est ${rb.getDouble(3)}")
    // Null keys are excluded (set semantics): injecting nulls into both
    // groups must not move the sketch, the union size, or the exact path —
    // a null hash sorted NULLS FIRST would otherwise steal a bottom-k slot.
    val withNulls = small.unionAll(
      Seq(("A", null.asInstanceOf[Integer]), ("B", null.asInstanceOf[Integer]))
        .toDF("g", "key").select(col("g"), col("key").cast("int")))
    val rn = SketchOps.kmvJaccard(withNulls, col("key"), "g", 64)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(rn == rs, "null keys must be invisible to both paths")
  }

  test("kmvSetOps: exact below saturation, bracketed above, nulls invisible") {
    import spark.implicits._
    // Sub-saturated (k=64 > every union): all four set-op estimates must
    // be EXACT — est_union = nk (the < k branch), jaccard = n_both/n_union,
    // differences from exact per-group sizes. A={0..9}, B={5..14}, C disjoint.
    val small = ((0 until 10).map(i => ("A", i)) ++ (5 until 15).map(i => ("B", i)) ++
      (100 until 110).map(i => ("C", i))).toDF("g", "key")
    val rs = SketchOps.kmvSetOps(small, col("key"), "g", 64)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(5), r.getDouble(6), r.getDouble(7))).toMap
    assert(rs(("A", "B")) == ((15L, 15.0, 5.0, 5.0, 5.0)))
    assert(rs(("A", "C")) == ((20L, 20.0, 0.0, 10.0, 10.0)))
    assert(rs(("B", "C")) == ((20L, 20.0, 0.0, 10.0, 10.0)))
    // Saturated: X={0..999}, Y={500..1499} -> union 1500, inter 500,
    // each difference 500. k=64: union kept caps at k; every estimate
    // within a generous ~5-sigma multiplicative bracket.
    val big = ((0 until 1000).map(i => ("X", i)) ++ (500 until 1500).map(i => ("Y", i)))
      .toDF("g", "key")
    val rb = SketchOps.kmvSetOps(big, col("key"), "g", 64).collect().head
    assert(rb.getLong(2) == 64L, "union sketch must cap at k")
    assert(math.abs(rb.getDouble(3) - 1500.0) < 600.0, s"union ${rb.getDouble(3)}")
    assert(math.abs(rb.getDouble(5) - 500.0) < 450.0, s"inter ${rb.getDouble(5)}")
    assert(math.abs(rb.getDouble(6) - 500.0) < 500.0, s"only_a ${rb.getDouble(6)}")
    assert(math.abs(rb.getDouble(7) - 500.0) < 500.0, s"only_b ${rb.getDouble(7)}")
    // Differences are clamped at 0 even when finite-k noise pushes the
    // subtraction negative; identical groups must report only_a=only_b=0
    // exactly (est_a = est_union, jaccard = 1).
    val twin = ((0 until 200).map(i => ("P", i)) ++ (0 until 200).map(i => ("Q", i)))
      .toDF("g", "key")
    val rt = SketchOps.kmvSetOps(twin, col("key"), "g", 64).collect().head
    assert(rt.getDouble(4) == 1.0 && rt.getDouble(6) == 0.0 && rt.getDouble(7) == 0.0, rt.toString)
    // Null keys invisible (set semantics), as in kmvJaccard.
    val withNulls = small.unionAll(
      Seq(("A", null.asInstanceOf[Integer]), ("B", null.asInstanceOf[Integer]))
        .toDF("g", "key").select(col("g"), col("key").cast("int")))
    val rn = SketchOps.kmvSetOps(withNulls, col("key"), "g", 64)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(5), r.getDouble(6), r.getDouble(7))).toMap
    assert(rn == rs, "null keys must be invisible")
    intercept[IllegalArgumentException] {
      SketchOps.kmvSetOps(small, col("key"), "g", 1)
    }
  }

  test("cmsHeavyHitters: estimates never undercount, exact counts correct, rank deterministic") {
    import spark.implicits._
    // skewed stream: key 0 is the heavy hitter
    val df = ((0 until 2000).map(_ => 0L) ++ (0 until 500).flatMap(k => Seq(k.toLong + 1, k.toLong + 1)))
      .toDF("user_id")
    val rows = SketchOps.cmsHeavyHitters(df, col("user_id"), d = 4, w = 256, topK = 5).collect()
    assert(rows.length == 5)
    rows.foreach(r => assert(r.getLong(2) >= r.getLong(3),
      s"CMS undercounted: est ${r.getLong(2)} < exact ${r.getLong(3)}")) // structural guarantee
    // the true heavy hitter tops the ranking (its estimate >= 2000, others <= ~2+collisions)
    assert(rows(0).getLong(1) == 0L && rows(0).getLong(3) == 2000L)
  }

  test("weightedSample is deterministic and matches the driver-side A-ES selection") {
    import spark.implicits._
    val docs = (0 until 300).map(i => (i.toLong, "en", "t", (i % 7) * 100 + 10))
      .toDF("doc_id", "lang", "text", "n_chars")
    val got = TextOps.weightedSample(docs, "n_chars", 15).collect().map(_.getLong(0)).toSeq
    assert(got == TextOps.weightedSample(docs, "n_chars", 15).collect().map(_.getLong(0)).toSeq)
    // driver-side recompute of the same keys
    val u = (i: Long) => {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"wsamp:$i".getBytes("UTF-8"))
      java.lang.Long.parseLong(md.take(8).map("%02x".format(_)).mkString.take(15), 16) /
        1152921504606846976.0
    }
    val want = (0 until 300).map { i =>
      val w = (i % 7) * 100 + 10
      (i.toLong, math.pow(u(i.toLong), 1.0 / w))
    }.sortBy { case (id, k) => (-k, id) }.take(15).map(_._1).sorted
    assert(got == want, s"got $got want $want")
  }

  test("labelCentroids: decimal-exact means over known vectors") {
    import spark.implicits._
    val dim = SimilarityOps.DIM
    val vecs = Seq(
      (0L, Array.fill(dim)(1.0f), 7),
      (1L, Array.fill(dim)(2.0f), 7),
      (2L, Array.fill(dim)(5.0f), 9))
    val df = vecs.toDF("vec_id", "embedding", "label")
    val r = SimilarityOps.labelCentroids(df).collect()
    assert(r.length == 2 * dim)
    r.foreach { row =>
      val (label, m, n) = (row.getInt(0), row.getDouble(2), row.getLong(3))
      if (label == 7) assert(m == 1.5 && n == 2L) else assert(m == 5.0 && n == 1L)
    }
  }

  test("bloom may-contain: no false negatives, bounded false positives, shuffle-free probe") {
    import spark.implicits._
    val dim = (0 until 50).map(i => i.toLong * 7).toDF("key")
    val mask = SketchOps.bloomBits(dim, col("key"), m = 1024, k = 3)
    val probe = (0 until 2000).map(_.toLong).toDF("k2")
    val passed = probe.filter(SketchOps.bloomMayContain(col("k2"), mask, 1024, 3))
    val got = passed.collect().map(_.getLong(0)).toSet
    // every true member passes (multiples of 7 below 350)
    val truth = (0 until 50).map(_.toLong * 7).toSet
    assert(truth.subsetOf(got), s"false negatives: ${truth -- got}")
    // false positives bounded: fp rate (1-e^(-150/1024))^3 ~ 2.5e-3 over
    // 1950 non-members -> expect ~5, allow generous headroom
    assert((got -- truth).size < 60, s"fp=${(got -- truth).size}")
    // the probe side is a pure projection: scan -> filter, no exchange
    val p = passed.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p)
  }

  test("bpePairs counts frequency-weighted adjacent char pairs over the vocab") {
    import spark.implicits._
    // vocab: "ab" x3 (2 docs), "abc" x1 -> pairs: ab: 3+1=4, bc: 1; "x" has no pair
    val docs = Seq((0L, "ab ab x abc"), (1L, "ab x")).toDF("doc_id", "text")
    val rows = TextOps.bpePairs(docs, k = 5).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    assert(rows == Seq((1, "ab", 4L), (2, "bc", 1L)), rows.toString)
  }

  test("zorder16 interleaves bits; top-bit tiles are aligned rectangles") {
    import spark.implicits._
    // z(3, 5): x bits 0,1 -> z bits 0,2; y bits 0,2 -> z bits 1,5 = 1+4+2+32
    val z = spark.range(1).select(
      LayoutOps.zorder16(lit(3L), lit(5L)),
      LayoutOps.zorder16(lit(0L), lit(1L)),
      LayoutOps.zorder16(lit(65535L), lit(65535L))).collect()(0)
    assert(z.getLong(0) == 39L && z.getLong(1) == 2L && z.getLong(2) == 4294967295L)
    // locality proof: with tileBits=6 every tile's envelope fits the
    // aligned 2^13 x 2^13 rectangle the curve guarantees
    val pts = (0 until 4000).map(i => ((i * 2654435761L) % 65536, (i * 40503L) % 65536))
      .toDF("a", "b")
    val tiles = LayoutOps.zTiles(pts, col("a"), col("b")).collect()
    assert(tiles.nonEmpty)
    tiles.foreach { r =>
      assert(r.getLong(3) - r.getLong(2) < 8192, s"x envelope too wide: $r")
      assert(r.getLong(5) - r.getLong(4) < 8192, s"y envelope too wide: $r")
      // and the envelope is inside the tile's aligned grid cell
      assert(r.getLong(2) / 8192 == r.getLong(3) / 8192, s"x crosses cells: $r")
      assert(r.getLong(4) / 8192 == r.getLong(5) / 8192, s"y crosses cells: $r")
    }
  }

  test("histQuantiles: estimate upper-bounds the true quantile within one bin") {
    import spark.implicits._
    val vals = (1 to 10000).map(_.toDouble * 3.7).toDF("v")
    val rows = SketchOps.histQuantiles(vals, col("v"), binWidth = 64L,
      bins = 1024, permille = Seq(500, 990)).collect()
    rows.foreach { r =>
      val (q, estHi, n) = (r.getDouble(0), r.getLong(1), r.getLong(2))
      assert(n == 10000L)
      val rank = math.ceil(q * n).toLong
      val exact = rank * 3.7 // values are rank*3.7 in sorted order
      assert(estHi >= exact && estHi - 64 <= exact,
        s"q=$q est_hi=$estHi exact=$exact")
    }
    // real-table bracket vs the ceil(q·n)-th ORDER STATISTIC — the value
    // the sketch actually bounds (an interpolated percentile can sit a
    // whole data gap past it, so bounding that would be data-dependent).
    // The exact comparator lives here, not in the gate query — it is the
    // cost the sketch replaces; see SketchQueries.
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val sk = SketchOps.histQuantiles(li, col("l_extendedprice"), 128L, 1024,
      Seq(500, 950)).collect()
    val cnt = li.filter(col("l_extendedprice").isNotNull).count()
    Seq(0, 1).zip(Seq(500, 950)).foreach { case (i, p) =>
      val estHi = sk(i).getLong(1)
      val rank = math.floor((cnt * p + 999) / 1000.0).toLong
      val orderStat = li.select(col("l_extendedprice"))
        .orderBy(col("l_extendedprice")).limit(rank.toInt)
        .agg(max(col("l_extendedprice"))).collect()(0).getDouble(0)
      assert(estHi >= orderStat && estHi - 128 <= orderStat,
        s"p=$p est=$estHi orderStat=$orderStat")
    }
  }

  test("containmentPairs: asymmetric — quote-in-larger-doc found in one direction only") {
    import spark.implicits._
    val quote = (1 to 12).map(i => s"w$i").mkString(" ")       // 10 shingles
    val big = quote + " " + (100 to 160).map(i => s"x$i").mkString(" ")
    val other = (200 to 240).map(i => s"y$i").mkString(" ")
    val docs = Seq(
      (1L, quote, "en"), (2L, big, "en"), (3L, other, "en"),
      (4L, quote, "de")) // same text, different lang -> never paired
      .map { case (id, t, l) => (id, t, l, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "n_chars")
    val got = DedupOps.containmentPairs(docs)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    // 1 -> 2: all of the quote's shingles appear in big (plus the two
    // straddling ones at the splice point don't exist in doc 1, so 1.0)
    assert(got.contains((1L, 2L)) && got((1L, 2L)) == 1.0, got.toString)
    // 2 -> 1: big is NOT contained in the quote
    assert(!got.contains((2L, 1L)), got.toString)
    // unrelated and cross-language pairs absent
    assert(!got.keys.exists { case (a, b) => a == 3L || b == 3L || a == 4L || b == 4L },
      got.toString)
  }

  test("mixWeights: sqrt-temperature weights upsample rare languages, eff_docs exact") {
    import spark.implicits._
    val docs = ((1 to 90).map(i => (i.toLong, "en")) ++ (91 to 100).map(i => (i.toLong, "de")))
      .toDF("doc_id", "lang")
    val rows = TextOps.mixWeights(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(3), r.getDouble(4))).toMap
    assert(rows("en")._1 == 90 && rows("de")._1 == 10)
    assert(rows("de")._2 == math.sqrt(10.0) && rows("en")._2 == math.sqrt(100.0 / 90.0))
    // rare language upweighted, and effective docs are sqrt(N*n_g)
    assert(rows("de")._2 > rows("en")._2)
    assert(rows("de")._3 == math.sqrt(1000.0) && rows("en")._3 == math.sqrt(9000.0))
  }

  test("exactQuantileRefine equals built-in percentile() — the q22/q34 tie") {
    // The refine path must return the SAME exact interpolated percentiles
    // as Spark's collect-everything builtin (q22's scale-killer) — that
    // equality is what licenses calling q34 the 100 TB replacement for q22.
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    val got = SketchOps.exactQuantileRefine(orders, col("o_totalprice"),
        "o_orderstatus", binWidth = 1024L, bins = 1024,
        permille = Seq(250, 500, 900))
      .collect().map(r => ((r.getString(0), r.getDouble(1)), r.getDouble(2))).toMap
    val want = orders.groupBy("o_orderstatus")
      .agg(expr("percentile(o_totalprice, 0.25)").as("p25"),
        expr("percentile(o_totalprice, 0.5)").as("p50"),
        expr("percentile(o_totalprice, 0.9)").as("p90"))
      .collect().flatMap(r => Seq(
        ((r.getString(0), 0.25), r.getDouble(1)),
        ((r.getString(0), 0.5), r.getDouble(2)),
        ((r.getString(0), 0.9), r.getDouble(3)))).toMap
    assert(got.keySet == want.keySet, s"got=${got.keySet} want=${want.keySet}")
    got.foreach { case (k, v) =>
      // both sides are the same 3-FP-op interpolation over the same two
      // order statistics; tolerance only covers the builtin's different
      // internal summation order
      assert(math.abs(v - want(k)) <= math.ulp(want(k)) * 4, s"$k: got $v want ${want(k)}")
    }
    // degenerate inputs: single-row group and integral index (frac = 0)
    import spark.implicits._
    val tiny = Seq(("a", 10.0), ("b", 1.0), ("b", 3.0), ("b", 5.0))
      .toDF("g", "v")
    val tq = SketchOps.exactQuantileRefine(tiny, col("v"), "g", 2L, 16,
        Seq(0, 500, 1000))
      .collect().map(r => ((r.getString(0), r.getDouble(1)), r.getDouble(2))).toMap
    assert(tq == Map(("a", 0.0) -> 10.0, ("a", 0.5) -> 10.0, ("a", 1.0) -> 10.0,
      ("b", 0.0) -> 1.0, ("b", 0.5) -> 3.0, ("b", 1.0) -> 5.0), tq.toString)
  }

  test("latestByKey keeps exactly the max-ordered row per key, ties broken by later columns") {
    import spark.implicits._
    val df = Seq(
      (1L, "a", 10L, 100L), (1L, "a", 20L, 101L), // later ts wins
      (1L, "b", 5L, 102L),
      (2L, "a", 7L, 103L), (2L, "a", 7L, 104L))   // ts tie -> higher id wins
      .toDF("user_id", "event_type", "ts", "event_id")
    val got = graft.streaming.StreamOps.latestByKey(df,
        Seq("user_id", "event_type"), Seq(col("ts"), col("event_id")))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(3))).toSet
    assert(got == Set((1L, "a", 101L), (1L, "b", 102L), (2L, "a", 104L)), got.toString)
  }

  test("bigramPerplexity: repetitive text scores fewer bits/token than novel text") {
    import spark.implicits._
    val docs = Seq(
      (0L, "a b a b a b a b"),  // frequent bigrams -> fluent under the model
      (1L, "q r s t u v w x")). // every bigram unique -> high surprise
      toDF("doc_id", "text")
    val r = TextOps.bigramPerplexity(docs).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getDouble(2))).toMap
    assert(r(0L)._1 == 7L && r(1L)._1 == 7L) // 8 words -> 7 bigrams each
    assert(r(0L)._2 < r(1L)._2, s"repetitive doc must score lower: $r")
    // deterministic on re-run (the FP discipline holds within Spark too)
    val again = TextOps.bigramPerplexity(docs).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getDouble(2))).toMap
    assert(r == again)
  }

  test("winnowPairs: a copied >=10-word run is guaranteed a shared fingerprint; unrelated docs pair-free") {
    import spark.implicits._
    // 15 words of doc A reappear verbatim inside doc B; doc C shares nothing.
    // Winnowing with 3-gram shingles and window 8 guarantees any shared run
    // of >= 8+3-1 = 10 words leaves at least one common selected fingerprint.
    val run = (0 until 15).map(i => s"copied$i").mkString(" ")
    val docs = Seq(
      (1L, "en", (0 until 20).map(i => s"alpha$i").mkString(" ") + " " + run),
      (2L, "en", run + " " + (0 until 25).map(i => s"beta$i").mkString(" ")),
      (3L, "en", (0 until 40).map(i => s"gamma$i").mkString(" "))
    ).toDF("doc_id", "lang", "text")
    val pairs = TextOps.winnowPairs(docs, minShared = 1).collect()
    assert(pairs.length == 1)
    val p = pairs(0)
    assert(p.getLong(0) == 1L && p.getLong(1) == 2L) // doc_a < doc_b, no mirror row
    assert(p.getLong(2) >= 1)                        // shared fingerprints from the run
    val overlap = p.getDouble(5)
    assert(overlap > 0.0 && overlap <= 1.0)
    // The document-granularity dedups would NOT flag this pair: whole-set
    // resemblance of A vs B is small even though a paragraph is copied.
    val setsA = docs.filter($"doc_id" === 1L).select(explode(split($"text", " "))).as[String].collect().toSet
    val setsB = docs.filter($"doc_id" === 2L).select(explode(split($"text", " "))).as[String].collect().toSet
    val jac = setsA.intersect(setsB).size.toDouble / setsA.union(setsB).size
    assert(jac < 0.5, s"corpus not adversarial enough for the substring-vs-set point (jaccard $jac)")
  }

  test("pq: duplicate vectors share codes; ADC top-k is k rows per query, sorted, deterministic") {
    import spark.implicits._
    import graft.core.DeterministicRng
    // 40 deterministic vectors; vec 17 is an exact copy of vec 5
    val vecs = (0 until 40).map { id =>
      val src = if (id == 17) 5L else id.toLong
      (id.toLong, Array.tabulate(64)(i =>
        (DeterministicRng.uniform(515L, src, 0L, i.toLong) - 0.5).toFloat))
    }
    val e = vecs.toDF("vec_id", "embedding")
    val codes = SimilarityOps.pqCodes(e).collect()
    assert(codes.length == 40)
    val byId = codes.map(r => r.getLong(0) -> (1 to 4).map(r.getLong)).toMap
    assert(byId(5L) == byId(17L), "identical vectors must encode to identical codes")
    // codes are trained-codeword ids (hash-bottom-ks SEED vec_ids survive
    // as cids — arbitrary values, not 0..ks-1): check per-subspace membership
    val cidsBySub = SimilarityOps.pqCodebooks(e).collect()
      .map(r => (r.getInt(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    assert(byId.values.forall(_.zipWithIndex.forall {
      case (c, s) => cidsBySub(s).contains(c)
    }), "every code must be a trained codeword of its subspace")
    val q = e.filter($"vec_id" < 2).select($"vec_id".as("query_id"), $"embedding".as("qe"))
    val topk = SimilarityOps.pqTopK(e, q, 10).collect()
    assert(topk.length == 20) // 10 per query
    topk.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val scores = rows.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b }, "ADC scores sorted desc")
    }
    val again = SimilarityOps.pqTopK(e, q, 10).collect()
    assert(topk.map(_.toString).toSeq == again.map(_.toString).toSeq, "ADC must be deterministic")
  }

  test("applyMixture: rarest language keeps every doc, dominant is sqrt-downsampled") {
    import spark.implicits._
    val docs = ((0 until 1000).map(i => (i.toLong, "en")) ++
      (0 until 10).map(i => (2000L + i, "fr"))).toDF("doc_id", "lang")
    val r = TextOps.applyMixture(docs).collect().map(x =>
      x.getString(0) -> (x.getLong(1), x.getDouble(2), x.getLong(3))).toMap
    val (frDocs, frP, frKept) = r("fr")
    assert(frDocs == 10 && frP == 1.0 && frKept == 10, "rarest language must keep all docs")
    val (enDocs, enP, enKept) = r("en")
    assert(enDocs == 1000 && math.abs(enP - 0.1) < 1e-12) // sqrt(10/1000)
    assert(enKept > 50 && enKept < 200, s"~100 expected from p=0.1, got $enKept")
    val again = TextOps.applyMixture(docs).collect()
    assert(again.map(_.toString).toSeq == TextOps.applyMixture(docs).collect().map(_.toString).toSeq)
  }

  test("dsirScores: target-vocabulary docs outscore off-target docs") {
    import spark.implicits._
    // target slice (doc_id < 20) speaks vocabulary A; the raw rest speaks B
    val docs = (0 until 60).map { i =>
      val vocab = if (i < 20) "alpha beta gamma delta" else "omega sigma tau rho"
      (i.toLong, if (i < 20) "tgt" else "raw", vocab + " " + vocab)
    }.toDF("doc_id", "source", "text")
    val scores = TextOps.dsirScores(docs, col("source") === "tgt").collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val tgtMin = (0 until 20).map(i => scores(i.toLong)).min
    val rawMax = (20 until 60).map(i => scores(i.toLong)).max
    assert(tgtMin > rawMax,
      s"every target-vocab doc must outscore every off-target doc ($tgtMin vs $rawMax)")
    assert(tgtMin > 0 && rawMax < 0, "log-ratio sign should separate the distributions")
  }

  test("funnelAttribution: latest prior touch wins; out-of-window and post-purchase clicks don't attribute") {
    import spark.implicits._
    def ns(min: Long) = min * 60L * 1000000000L // minutes -> nanos
    val events = Seq(
      (1L, 1L, "click", ns(0)), (2L, 1L, "click", ns(5)), (3L, 1L, "purchase", ns(8)),
      (4L, 2L, "purchase", ns(100)),                       // no prior click
      (5L, 3L, "click", ns(300)), (6L, 3L, "purchase", ns(290)), // click AFTER purchase
      (7L, 4L, "click", ns(0)), (8L, 4L, "purchase", ns(500))    // outside 10-min window
    ).toDF("event_id", "user_id", "event_type", "ts")
    val rows = graft.streaming.StreamOps.funnelAttribution(events, maxGapMin = 10).collect()
    assert(rows.length == 1, s"only user 1 converts: ${rows.mkString(";")}")
    val r = rows(0)
    assert(r.getLong(0) == 1L && r.getLong(1) == 3L)
    assert(r.getLong(3) == 2L, "latest prior click (id 2) must win attribution")
    assert(r.getLong(5) == 3L * 60L * 1000000L) // 3-minute gap in micros
  }

  test("pageRank: hub outranks leaves, symmetric nodes tie exactly, deterministic") {
    import spark.implicits._
    // star: 0 connected to 1..4, plus a detached pair (10, 11)
    val pairs = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L), (10L, 11L))
      .toDF("doc_a", "doc_b")
    val pr = GraphOps.pageRank(pairs).collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(pr.size == 7)
    assert((1L to 4L).forall(l => pr(0L) > pr(l)), "hub must outrank every leaf")
    assert((1L to 4L).map(pr).distinct.size == 1, "symmetric leaves must tie bit-exactly")
    assert(pr(10L) == pr(11L), "detached symmetric pair must tie bit-exactly")
    val again = GraphOps.pageRank(pairs).collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(pr == again, "ranks must be bit-identical across runs")
  }

  test("quarantineSet: BFS min hops, hop bound respected, early exit on empty frontier") {
    import spark.implicits._
    // chain 1-2-3-4 plus pair 5-6; seeds {1, 5}; maxHops 2
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (5L, 6L)).toDF("doc_a", "doc_b")
    val seeds = Seq(1L, 5L).toDF("doc_id")
    val got = GraphOps.quarantineSet(pairs, seeds, maxHops = 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 5L -> 0L, 6L -> 1L),
      s"4 is 3 hops away and must be excluded: $got")
    // a diamond (1-2, 1-3, 2-4, 3-4): 4 is reachable two ways, hops = 2 once
    val diamond = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L)).toDF("doc_a", "doc_b")
    val d = GraphOps.quarantineSet(diamond, Seq(1L).toDF("doc_id"), maxHops = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d == Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 2L), d.toString)
  }

  test("quarantineSet equals Spark's own WITH RECURSIVE walk (SQL-surface twin)") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (5L, 6L), (4L, 1L))
      .toDF("doc_a", "doc_b")
    val seeds = Seq(1L, 5L).toDF("doc_id")
    pairs.createOrReplaceTempView("qr_pairs")
    seeds.createOrReplaceTempView("qr_seeds")
    val sqlWalk = spark.sql(
      """WITH RECURSIVE walk(doc_id, hops) AS (
        |  SELECT doc_id, 0L FROM qr_seeds
        |  UNION ALL
        |  SELECT e.dst, w.hops + 1L FROM walk w
        |  JOIN (SELECT doc_a AS src, doc_b AS dst FROM qr_pairs
        |        UNION ALL SELECT doc_b, doc_a FROM qr_pairs) e
        |    ON e.src = w.doc_id
        |  WHERE w.hops < 3)
        |SELECT doc_id, MIN(hops) AS hops FROM walk GROUP BY doc_id""".stripMargin)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val op = GraphOps.quarantineSet(pairs, seeds, maxHops = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(op == sqlWalk, s"op $op vs recursive CTE $sqlWalk")
  }

  test("triangleStats: hand-counted census, once-per-triangle, degenerate edges") {
    import spark.implicits._
    // K4 on {1,2,3,4} plus pendant 4-5: 6+1 edges, C(4,3)=4 triangles.
    // Wedges: degs are 3,3,3,4,1 -> 3+3+3+6+0 = 15; coeff = 12/15 = 0.8
    val k4p = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L), (4L, 5L))
      .toDF("doc_a", "doc_b")
    val r = GraphOps.triangleStats(k4p).collect().head
    assert(r.getLong(0) == 7L && r.getLong(1) == 4L && r.getLong(2) == 15L,
      r.toString)
    assert(r.getDouble(3) == 12.0 / 15.0, r.toString)
    // a triangle-free star: 0 triangles, coefficient 0.0 (wedges > 0)
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("doc_a", "doc_b")
    val rs = GraphOps.triangleStats(star).collect().head
    assert(rs.getLong(1) == 0L && rs.getLong(2) == 3L && rs.getDouble(3) == 0.0)
    // a single edge: no wedges -> coefficient NULL, not 0/0
    val one = Seq((1L, 2L)).toDF("doc_a", "doc_b")
    val ro = GraphOps.triangleStats(one).collect().head
    assert(ro.getLong(0) == 1L && ro.getLong(2) == 0L && ro.isNullAt(3), ro.toString)
    // duplicate rows and self-loops are collapsed/dropped before counting
    val messy = Seq((1L, 2L), (1L, 2L), (3L, 3L), (2L, 3L), (1L, 3L))
      .toDF("doc_a", "doc_b")
    val rm = GraphOps.triangleStats(messy).collect().head
    assert(rm.getLong(0) == 3L && rm.getLong(1) == 1L, rm.toString)
  }

  test("chunkDedup removes only cross-doc chunks and pins the rebuilt text") {
    import spark.implicits._
    val docs = Seq(
      (1L, "aa bb cc dd"), // chunks "aa bb" | "cc dd"
      (2L, "aa bb xx yy"), // shares "aa bb" with doc 1
      (3L, "zz ww qq")     // all chunks unique (incl. the short tail "qq")
    ).toDF("doc_id", "text")
    val out = TextOps.chunkDedup(docs).collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getLong(2) == 1 && out(2L).getLong(2) == 1 && out(3L).getLong(2) == 0)
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(out(1L).getString(3) == md5hex("cc dd"))
    assert(out(2L).getString(3) == md5hex("xx yy"))
    assert(out(3L).getString(3) == md5hex("zz ww qq"))
  }

  test("scd2History: contiguous validity intervals; current rows equal latestByKey") {
    import spark.implicits._
    import graft.streaming.StreamOps
    def ns(min: Long) = min * 60L * 1000000000L
    val cdc = Seq(
      (1L, 10L, "addr", ns(0)), (2L, 10L, "addr", ns(5)), (3L, 10L, "addr", ns(9)),
      (4L, 20L, "addr", ns(2))
    ).toDF("event_id", "user_id", "event_type", "ts")
      .withColumn("ts_us", call_function("div", col("ts").cast("long"), lit(1000L)))
    val hist = StreamOps.scd2History(cdc,
      Seq("user_id", "event_type"), Seq(col("ts_us"), col("event_id")))
    val h10 = hist.filter($"user_id" === 10L).orderBy("valid_from_us").collect()
    assert(h10.length == 3)
    assert(h10(0).getAs[Long]("valid_to_us") == h10(1).getAs[Long]("valid_from_us"))
    assert(h10(1).getAs[Long]("valid_to_us") == h10(2).getAs[Long]("valid_from_us"))
    assert(h10.map(_.getAs[Boolean]("is_current")).toSeq == Seq(false, false, true))
    val current = hist.filter($"is_current").select("event_id").as[Long].collect().toSet
    val latest = StreamOps.latestByKey(cdc,
        Seq("user_id", "event_type"), Seq(col("ts_us"), col("event_id")))
      .select("event_id").as[Long].collect().toSet
    assert(current == latest, "is_current rows must be exactly the latestByKey survivors")
  }

  test("minhashPairsAgainst emits cross-corpus pairs only — old-old dups stay silent") {
    import spark.implicits._
    val base = (0 until 30).map(i => s"w$i").mkString(" ")
    val corpus = Seq(
      (1L, "en", base, base.length.toLong),
      (2L, "en", base + " tail2", (base.length + 6).toLong), // near-dup of 1 INSIDE the corpus
      (3L, "en", (0 until 30).map(i => s"z$i").mkString(" "), 100L)
    ).toDF("doc_id", "lang", "text", "n_chars")
    val incoming = Seq(
      (100L, "en", base + " tail100", (base.length + 8).toLong), // near-dup of 1 and 2
      (101L, "en", (0 until 30).map(i => s"q$i").mkString(" "), 100L)
    ).toDF("doc_id", "lang", "text", "n_chars")
    val got = DedupOps.minhashPairsAgainst(corpus, incoming).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 100L), (2L, 100L)),
      s"expected only cross pairs to 100, got $got (old-old pair (1,2) must NOT appear)")
  }

  test("minhash index parquet round-trip: a reloaded index probes identically to a fresh one") {
    import spark.implicits._
    val base = (0 until 30).map(i => s"w$i").mkString(" ")
    val corpus = Seq(
      (1L, "en", base, base.length.toLong),
      (2L, "en", (0 until 30).map(i => s"z$i").mkString(" "), 100L)
    ).toDF("doc_id", "lang", "text", "n_chars")
    val incoming = Seq(
      (100L, "en", base + " tail100", (base.length + 8).toLong),
      (101L, "en", (0 until 30).map(i => s"q$i").mkString(" "), 100L)
    ).toDF("doc_id", "lang", "text", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("graft-mhidx").toString
    DedupOps.writeMinhashIndex(DedupOps.minhashIndex(corpus), dir)
    val fresh = DedupOps.minhashPairsAgainst(DedupOps.minhashIndex(corpus), incoming)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val reloaded = DedupOps.minhashPairsAgainst(
        DedupOps.readMinhashIndex(spark, dir), incoming)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fresh == Set((1L, 100L)), fresh.toString)
    assert(reloaded == fresh, "reloaded index must probe identically")
  }

  test("bm25: more matches score higher; rare terms outweigh common ones; non-matching docs absent") {
    import spark.implicits._
    val filler = (0 until 20).map(i => s"f$i").mkString(" ")
    val docs = Seq(
      (1L, s"rare $filler"),
      (2L, s"common $filler"),
      (3L, s"common common $filler"),
      (4L, filler)
    ) ++ (10 until 30).map(i => (i.toLong, s"common $filler"))
    val df = docs.toDF("doc_id", "text")
    val scores = TextOps.bm25(df, Seq("rare", "common")).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(!scores.contains(4L), "doc without query terms must be absent")
    assert(scores(1L) > scores(2L), "the corpus-rare term must outscore the common term")
    assert(scores(3L) > scores(2L), "two matches must outscore one at equal df")
  }

  test("normalizeText pins lowercase/collapsed/trimmed bytes") {
    import spark.implicits._
    val docs = Seq((1L, "  Hello   WORLD  x ")).toDF("doc_id", "text")
    val r = TextOps.normalizeText(docs).collect()(0)
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(r.getString(2) == md5hex("hello world x"))
    assert(r.getLong(3) == "hello world x".length)
  }

  test("knn_ivfpq: pruned ADC ranks are pointwise bounded by the flat ADC scan, scores agree on shared pairs") {
    val ivfpq = q("knn_ivfpq").collect()
    val flat = q("knn_pq").collect()
    def byQuery(rows: Array[org.apache.spark.sql.Row]) =
      rows.groupBy(_.getLong(0)).view.mapValues(_.sortBy(_.getInt(1))).toMap
    val (a, b) = (byQuery(ivfpq), byQuery(flat))
    assert(a.keySet == b.keySet)
    a.foreach { case (qid, rows) =>
      assert(rows.length == 10)
      // pruning can only lose candidates: rank-i score <= flat rank-i score
      rows.zip(b(qid)).foreach { case (p, f) =>
        assert(p.getDouble(3) <= f.getDouble(3) + 1e-9,
          s"query $qid: pruned rank ${p.getInt(1)} beat the flat scan")
      }
      // same (query, vec) pair must carry the identical ADC score
      val flatScores = b(qid).map(r => r.getLong(2) -> r.getDouble(3)).toMap
      rows.foreach(p => flatScores.get(p.getLong(2))
        .foreach(fs => assert(fs == p.getDouble(3), "shared pair score mismatch")))
    }
  }

  test("profile: numeric min/max (not lexicographic), nulls counted, exact distincts") {
    import spark.implicits._
    val df = Seq((9L, Some("a")), (10L, None), (10L, Some("b")), (2L, Some("a")))
      .toDF("k", "s")
    val p = SketchOps.profile(df).collect().map(r => r.getString(0) -> r).toMap
    val k = p("k")
    assert(k.getLong(1) == 4 && k.getLong(2) == 0)
    assert(k.getString(3) == "2" && k.getString(4) == "10",
      "min/max must order numerically — a lexicographic min would be '10'")
    assert(k.getLong(5) == 3) // 2, 9, 10
    val s = p("s")
    assert(s.getLong(2) == 1, "one null in s")
    assert(s.getLong(5) == 2, "distincts exclude null")
    assert(s.getString(3) == "a" && s.getString(4) == "b")
  }

  test("annRecall: identical tables score 1.0, disjoint 0.0, misses still reported") {
    import spark.implicits._
    val truth = Seq((1L, 1, 10L), (1L, 2, 11L), (2L, 1, 20L), (2L, 2, 21L))
      .toDF("query_id", "rank", "vec_id")
    val perfect = SimilarityOps.annRecall(truth, truth, 2).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(perfect == Map(1L -> 1.0, 2L -> 1.0))
    val wrong = Seq((1L, 1, 99L), (1L, 2, 98L)).toDF("query_id", "rank", "vec_id")
    val zeroed = SimilarityOps.annRecall(wrong, truth, 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3))).toSet
    assert(zeroed == Set((1L, 0L, 0.0), (2L, 0L, 0.0)),
      "query 2 (absent from results) must still report recall 0")
  }

  test("scoreLinear: hand-computed logits, sparse-model zeros, token accounting") {
    import spark.implicits._
    import graft.functions.CrossHash
    val docs = Seq((1L, "aa bb aa"), (2L, "cc"), (3L, "zz zz")).toDF("doc_id", "text")
    // model keyed by the ops' own feature hash; zz deliberately ABSENT
    def f(w: String): Long = {
      val r = spark.range(1).select(CrossHash.mdint(lit(w)) % 256).head().getLong(0)
      r
    }
    val model = Seq((f("aa"), 0.5), (f("bb"), -0.25), (f("cc"), 1.0))
      .toDF("feature", "weight")
    val out = TextOps.scoreLinear(docs, model)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out(1L) == ((3L, 0.75)), "2*0.5 - 0.25")   // exact: decimal sums
    assert(out(2L) == ((1L, 1.0)))
    assert(out(3L) == ((2L, 0.0)), "absent feature scores 0 but counts tokens")
    // Duplicate feature rows in the EXTERNAL model must not fan out the
    // (doc, feature) counts: weights combine additively (0.2 + 0.3 = 0.5
    // for aa), token counts stay exact.
    val dupModel = Seq((f("aa"), 0.2), (f("aa"), 0.3), (f("bb"), -0.25),
      (f("cc"), 1.0)).toDF("feature", "weight")
    val outDup = TextOps.scoreLinear(docs, dupModel)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(outDup == out, "duplicate model features combine, never fan out")
  }

  test("trainPerceptron: hand-traced updates; converges on separable data; trained model feeds scoreLinear") {
    import spark.implicits._
    import graft.functions.CrossHash
    def f(w: String): Long =
      spark.range(1).select(CrossHash.mdint(lit(w)) % 256).head().getLong(0)
    // separable seed set sharing one word across classes: iter 1 updates
    // only the positives (all scores 0 under zero weights); the shared
    // word then misleads the negative doc until its updates push it back
    val docs = Seq(
      (1L, "good good good"), (2L, "good fine"), // y = +1
      (3L, "good spam"), (4L, "spam spam"))      // y = -1
      .toDF("doc_id", "text")
    val label = col("doc_id") <= 2L
    require(Set(f("good"), f("fine"), f("spam")).size == 3,
      "toy words must not collide in 256 buckets")

    // iter 1 by hand: misclassified = {1, 2} -> G = {good: +4, fine: +1}
    val w1 = TextOps.trainPerceptron(docs, label, iters = 1)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(w1(f("good")) == 0.004 && w1(f("fine")) == 0.001, w1.toString)
    assert(w1(f("spam")) == 0.0)
    assert(w1.values.count(_ != 0.0) == 2, "only touched buckets move")

    // iter 2 by hand: doc3 scores 4 > 0 -> misclassified -> G gains
    // {good: -1, spam: -1}; doc4 scores 0 -> already correct
    val w2 = TextOps.trainPerceptron(docs, label, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(w2(f("good")) == 0.003 && w2(f("spam")) == -0.001, w2.toString)

    // after enough iterations the separable set is fully correct, and
    // the trained table drives scoreLinear (the train -> apply pair):
    // positives strictly above 0, negatives at or below
    val model = TextOps.trainPerceptron(docs, label, iters = 6)
    val scored = TextOps.scoreLinear(docs, model)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(scored(1L) > 0 && scored(2L) > 0, scored.toString)
    assert(scored(3L) <= 0 && scored(4L) <= 0, scored.toString)
  }

  test("bucketize: cut boundaries inclusive, nulls null, equi-depth composition holds") {
    import spark.implicits._
    val df = Seq[java.lang.Double](0.0, 9.9, 10.0, 49.9, 50.0, 100.0, null)
      .toDF("v")
    val out = SketchOps.bucketize(df, col("v"), Seq(10.0, 50.0)).collect()
      .map(r => (if (r.isNullAt(0)) null else r.getDouble(0)) ->
        (if (r.isNullAt(1)) -1 else r.getInt(1))).toMap
    assert(out(0.0) == 0 && out(9.9) == 0, "below first cut")
    assert(out(10.0) == 1 && out(49.9) == 1, "cut is inclusive (>=)")
    assert(out(50.0) == 2 && out(100.0) == 2)
    assert(out(null) == -1, "null value -> null bucket")
    // composition with histQuantiles: p50 cutpoint splits ~half/half
    val vals = (1 to 1000).map(_.toDouble * 128).toDF("v")
    val cut = SketchOps.histQuantiles(vals, col("v"), 128L, 1024, Seq(500))
      .select("est_hi").collect().head.getAs[Number](0).doubleValue()
    val lo = SketchOps.bucketize(vals, col("v"), Seq(cut))
      .filter(col("bucket") === 0).count()
    assert(math.abs(lo - 500L) <= 128, s"p50 bucket split off: $lo below cut $cut")
  }

  test("skewReport: hand-computed skew factor and salt on a planted hot key") {
    import spark.implicits._
    // key 7 has 8 rows, keys 1..4 have 2 each -> 16 rows / 5 keys,
    // avg 3.2, skew 8/3.2 = 2.5, salt ceil = 3
    val df = (Seq.fill(8)(7) ++ (1 to 4).flatMap(k => Seq(k, k))).toDF("k")
    val r = SketchOps.skewReport(df, col("k")).collect().head
    assert(r.getLong(0) == 16 && r.getLong(1) == 5 && r.getLong(2) == 8)
    assert(r.getString(3) == "7" && r.getLong(4) == 8)
    assert(r.getDouble(5) == 3.2 && r.getDouble(6) == 2.5)
    assert(r.getLong(7) == 3, "suggested salt = ceil(2.5)")
    // uniform input reports skew 1.0 / salt 1 (the no-action answer)
    val u = SketchOps.skewReport((1 to 10).toDF("k"), col("k")).collect().head
    assert(u.getDouble(6) == 1.0 && u.getLong(7) == 1)
  }

  test("normalizeEmbeddings: exact centering, unit norms, zero-vector guard") {
    import spark.implicits._
    // means (2,2); centered (-1,1),(1,-1),(0,0); norms sqrt2, sqrt2, 0
    val e = Seq((1L, Array(1f, 3f)), (2L, Array(3f, 1f)), (3L, Array(2f, 2f)))
      .toDF("vec_id", "embedding")
    val out = SimilarityOps.normalizeEmbeddings(e).collect()
      .map(r => r.getLong(0) -> (r.getSeq[Double](1), r.getDouble(2))).toMap
    val u = BigDecimal(1.0 / math.sqrt(2.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val s2 = BigDecimal(math.sqrt(2.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(1L) == ((Seq(-u, u), s2)))
    assert(out(2L) == ((Seq(u, -u), s2)))
    assert(out(3L) == ((Seq(0.0, 0.0), 0.0)), "all-zero centered vector passes through")
    // and unit norm holds for the non-degenerate rows (to rounding)
    for (id <- Seq(1L, 2L)) {
      val v = out(id)._1
      assert(math.abs(v.map(x => x * x).sum - 1.0) < 1e-5, s"vec $id not unit")
    }
  }

  test("corpusReport: dup rate, token totals, language spread on a planted corpus") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a", "en", 5L, "x y z"),
      (2L, "a", "en", 5L, "x y z"), // exact dup of doc 1
      (3L, "a", "de", 3L, "p q"),
      (4L, "b", "en", 4L, "solo"))
      .toDF("doc_id", "source", "lang", "n_chars", "text")
    val r = TextOps.corpusReport(docs).collect()
      .map(x => x.getString(0) -> x).toMap
    val a = r("a")
    assert(a.getLong(1) == 3 && a.getLong(2) == 2, "docs/unique")
    assert(a.getDouble(3) == 1.0 / 3.0, "dup_rate single exact division")
    assert(a.getLong(4) == 8 && a.getDouble(5) == 8.0 / 3.0, "token totals")
    assert(a.getLong(6) == 2, "lang spread")
    assert(a.getLong(7) == 3 && a.getLong(8) == 5, "char extremes")
    val b = r("b")
    assert(b.getLong(1) == 1 && b.getLong(2) == 1 && b.getDouble(3) == 0.0)
  }

  test("lengthBuckets: padded buckets, bounded batches, exact waste accounting") {
    import spark.implicits._
    // 40 docs with token counts 1..40 -> buckets 8,16,...,40 at padTo=8
    val docs = (1 to 40).map(i => (i.toLong, Seq.fill(i)("w").mkString(" ")))
      .toDF("doc_id", "text")
    val out = TextOps.lengthBuckets(docs, padTo = 8, batchSize = 3, nShards = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(out.length == 40)
    out.foreach { case (id, n, bucket, shard, _, _) =>
      assert(n == id, "token count")
      assert(bucket % 8 == 0 && bucket >= n && bucket < n + 8,
        s"doc $id: bucket $bucket not the padded length of $n")
      assert(shard >= 0 && shard < 2)
    }
    // batches: per (bucket, shard) ids 0..m contiguous, <= batchSize docs,
    // filled in doc_id order; waste = rows*bucket - sum(tokens) per batch
    out.groupBy(t => (t._3, t._4)).foreach { case ((bucket, _), rows) =>
      val byBatch = rows.groupBy(_._5)
      assert(byBatch.keySet == (0L until byBatch.size).toSet, "contiguous batch ids")
      byBatch.foreach { case (_, b) =>
        assert(b.length <= 3, "batch overflow")
        val expWaste = b.length * bucket - b.map(_._2).sum
        b.foreach(r => assert(r._6 == expWaste, s"waste ${r._6} != $expWaste"))
      }
      // only the LAST batch may be short
      assert(byBatch.toSeq.sortBy(_._1).dropRight(1).forall(_._2.length == 3),
        "non-final batch not full")
    }
  }

  test("chunkText: coverage, overlap, and clipped-tail invariants") {
    import spark.implicits._
    // token counts straddling every boundary case: single short doc,
    // exactly one window, one past, mid-stride, exact multi-window end
    val docs = Seq(1, 16, 17, 28, 29, 40).zipWithIndex.map { case (n, i) =>
      ((i + 1).toLong, (0 until n).map(j => s"t$j").mkString(" "))
    }.toDF("doc_id", "text")
    val out = TextOps.chunkText(docs, win = 16, overlap = 4)
      .collect().groupBy(_.getLong(0)).view.mapValues(_.sortBy(_.getLong(1))).toMap
    // chunk counts: 1 for n<=16, else ceil((n-16)/12)+1
    assert(out(1L).length == 1 && out(2L).length == 1 && out(3L).length == 2 &&
      out(4L).length == 2 && out(5L).length == 3 && out(6L).length == 3)
    for ((id, rows) <- out) {
      val full = docs.filter(col("doc_id") === id)
        .head().getString(1).split(" ").toSeq
      // reconstruction: chunk 0 + each later chunk minus its leading overlap
      val rebuilt = rows.head.getString(2).split(" ").toSeq ++
        rows.tail.flatMap(_.getString(2).split(" ").drop(4).toSeq)
      assert(rebuilt == full, s"doc $id reassembly")
      // consecutive chunks share exactly the 4-token overlap region
      rows.sliding(2).foreach {
        case Array(a, b) =>
          val aw = a.getString(2).split(" "); val bw = b.getString(2).split(" ")
          assert(aw.takeRight(aw.length - 12).take(4).sameElements(bw.take(4)) ||
            aw.length == 16 && aw.takeRight(4).sameElements(bw.take(4)))
        case _ => ()
      }
      // n_tokens matches the emitted text; tail keeps > overlap tokens
      rows.foreach(r =>
        assert(r.getString(2).split(" ").length == r.getLong(3)))
      assert(rows.last.getLong(3) > 4 || rows.length == 1)
    }
  }

  test("dedupEval: exact counts, one-division ratios, null-safe empty sides") {
    import spark.implicits._
    val truth = Seq((1L, 2L), (3L, 4L), (5L, 6L)).toDF("doc_a", "doc_b")
    val pred = Seq((1L, 2L), (3L, 4L), (7L, 8L), (9L, 10L)).toDF("doc_a", "doc_b")
    val r = DedupOps.dedupEval(pred, truth).collect()(0)
    assert(r.getLong(0) == 4 && r.getLong(1) == 3 && r.getLong(2) == 2)
    assert(r.getDouble(3) == 2.0 / 4 && r.getDouble(4) == 2.0 / 3)
    assert(r.getDouble(5) == 4.0 / 7, "f1 = 2*hits/(|P|+|T|), one division")
    // perfect detector: all three ratios exactly 1.0
    val p = DedupOps.dedupEval(truth, truth).collect()(0)
    assert(p.getDouble(3) == 1.0 && p.getDouble(4) == 1.0 && p.getDouble(5) == 1.0)
    // empty predicted: precision NULL (not an engine-specific 0/0), recall 0
    val e = DedupOps.dedupEval(truth.limit(0), truth).collect()(0)
    assert(e.isNullAt(3) && e.getDouble(4) == 0.0)
  }

  test("chunkDedup identity: a duplicate-free corpus reassembles byte-identically (incl. odd tails)") {
    import spark.implicits._
    // every chunk globally unique; lengths 1..7 words exercise the
    // partial tail chunk and the single-chunk doc
    val docs = (1 to 7).map { n =>
      (n.toLong, (0 until n).map(i => s"u${n}x$i").mkString(" "))
    }.toDF("doc_id", "text")
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val out = TextOps.chunkDedup(docs).collect().map(r => r.getLong(0) -> r).toMap
    (1 to 7).foreach { n =>
      val original = (0 until n).map(i => s"u${n}x$i").mkString(" ")
      assert(out(n.toLong).getLong(2) == 0, s"doc $n: nothing to remove")
      assert(out(n.toLong).getString(3) == md5hex(original),
        s"doc $n must reassemble byte-identically")
      assert(out(n.toLong).getLong(4) == original.length)
    }
  }

  test("normalizeText is idempotent") {
    import spark.implicits._
    val docs = Seq((1L, "  A   b  C "), (2L, "x y z")).toDF("doc_id", "text")
    val once = TextOps.normalizeText(docs).collect()
      .map(r => r.getLong(0) -> (r.getString(2), r.getLong(3))).toMap
    // re-normalizing the normalized text must be a fixed point: rebuild
    // the normalized strings and run the op again
    val normed = Seq((1L, "a b c"), (2L, "x y z")).toDF("doc_id", "text")
    val twice = TextOps.normalizeText(normed).collect()
      .map(r => r.getLong(0) -> (r.getString(2), r.getLong(3))).toMap
    assert(once == twice, s"$once vs $twice")
  }

  test("minhash signature is permutation-stable (same doc -> same signature)") {
    import graft.functions.CrossHash
    val h = CrossHash.mdint(lit("a b c"))
    val df = spark.range(1).select(
      CrossHash.minhash(h, 0).as("m0"), CrossHash.minhash(h, 0).as("m0b"),
      CrossHash.minhash(h, 1).as("m1"))
    val r = df.collect()(0)
    assert(r.getLong(0) == r.getLong(1))
    assert(r.getLong(0) != r.getLong(2))
  }

  test("tfidfPairs: identical docs cosine 1.0, disjoint docs no pair, maxDf prunes boilerplate") {
    import spark.implicits._
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon"),
      (1L, "alpha beta gamma delta epsilon"), // exact copy of 0
      (2L, "zeta eta theta iota kappa"),      // shares no shingle with 0/1
      (3L, "one two three alpha beta gamma")) // shares one shingle with 0/1
      .toDF("doc_id", "text")
    val pairs = TextOps.tfidfPairs(docs, maxDf = 50, minCos = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    assert(pairs.length == 1 && pairs(0)._1 == 0L && pairs(0)._2 == 1L)
    // weights quantize to 7 decimals before the dot, so "1.0" carries
    // ~1e-7-grade rounding — the same quantization the oracle applies
    assert(math.abs(pairs(0)._3 - 1.0) < 1e-6,
      s"identical docs must score cosine 1.0, got ${pairs(0)._3}")
    // lower threshold: (0,3) and (1,3) appear via the shared shingle
    val loose = TextOps.tfidfPairs(docs, maxDf = 50, minCos = 0.01)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(loose == Set((0L, 1L), (0L, 3L), (1L, 3L)))
    // maxDf = 2 kills the "alpha beta gamma" shingle (df = 3): only the
    // exact-copy pair survives, through its unique remaining shingles
    val pruned = TextOps.tfidfPairs(docs, maxDf = 2, minCos = 0.01)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pruned == Set((0L, 1L)))
  }

  test("fuzzyPairs: banded blocking loses nothing vs brute force; k=0 is exact match") {
    import spark.implicits._
    // keys engineered across block boundaries: lengths straddle multiples
    // of the block width so qualifying pairs sit in ADJACENT blocks
    val rows = Seq(
      (0L, "abcdefg"),    // len 7  -> blk 1 (B=4)
      (1L, "abcdefgh"),   // len 8  -> blk 2, dist(0,1)=1 across blocks
      (2L, "abcdefghx"),  // len 9  -> blk 2, dist(1,2)=1
      (3L, "zzzzzzzz"),   // len 8  -> blk 2, far from everything
      (4L, "abcdefg"),    // len 7  -> exact dup of 0
      (5L, "abqdefg"))    // len 7  -> dist 1 from 0/4
      .toDF("id", "key")
    val got = DedupOps.fuzzyPairs(rows, col("id"), col("key"), k = 2, blockWidth = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // brute-force truth computed in-test
    val truth = rows.as("x").crossJoin(rows.as("y"))
      .filter(col("x.id") < col("y.id"))
      .select(col("x.id"), col("y.id"), levenshtein(col("x.key"), col("y.key")).as("d"))
      .filter(col("d") <= 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2).toLong)).toSet
    assert(got == truth, s"blocked result must equal brute force: got $got vs $truth")
    assert(got.contains((0L, 1L, 1L)), "cross-block pair must be found")
    assert(got.count { case (_, _, d) => d == 0 } == 1, "one exact-dup pair")
    // k = 0: only the exact duplicate pair
    val exact = DedupOps.fuzzyPairs(rows, col("id"), col("key"), k = 0, blockWidth = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact == Set((0L, 4L)))
  }

  test("hammingPairs: pigeonhole blocking equals brute force; unequal lengths excluded; multi-segment match dedups") {
    import spark.implicits._
    val rows = Seq(
      (0L, "aaaabbbbcccc"),
      (1L, "aaaabbbbccxx"),  // dist 2 from 0: both edits in LAST segment -> matches segs 0 AND 1
      (2L, "axaabxbbcccc"),  // dist 2 from 0 spread over segs 0/1 -> matches seg 2 only
      (3L, "aaaabbbbcccc"),  // exact dup of 0
      (4L, "zzzzzzzzzzzz"),  // far from everything
      (5L, "aaaabbbbcc"))    // dist-0 prefix but SHORTER: excluded by definition
      .toDF("id", "key")
    val got = DedupOps.hammingPairs(rows, col("id"), col("key"), k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // brute-force truth over equal-length pairs, computed in-test
    val truth = rows.as("x").crossJoin(rows.as("y"))
      .filter(col("x.id") < col("y.id") &&
        length(col("x.key")) === length(col("y.key")))
      .select(col("x.id"), col("y.id"),
        aggregate(
          zip_with(split(col("x.key"), ""), split(col("y.key"), ""),
            (a, b) => when(a === b, lit(0)).otherwise(lit(1))),
          lit(0), (acc, v) => acc + v).cast("long").as("d"))
      .filter(col("d") <= 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == truth, s"pigeonhole result must equal brute force: got $got vs $truth")
    assert(got.contains((0L, 1L, 2L)) && got.contains((0L, 2L, 2L)) &&
      got.contains((0L, 3L, 0L)))
    assert(!got.exists { case (a, b, _) => a == 5L || b == 5L },
      "shorter key must not pair under substitution-only distance")
    // multi-segment candidate (0,3) matches all 3 segments yet appears once
    assert(got.count { case (a, b, _) => a == 0L && b == 3L } == 1)
  }

  test("rrfFuse: hand-computed fusion, union semantics, absent side contributes 0") {
    import spark.implicits._
    val a = Seq((10L, 1), (20L, 2), (30L, 3)).toDF("id", "rank")
    val b = Seq((20L, 1), (40L, 2)).toDF("id", "rank")
    val r = SimilarityOps.rrfFuse(a, b).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getDouble(3)))).toMap
    // terms are 1/(60+rank) rounded to 7 decimals: 1/61 = 0.0163934,
    // 1/62 = 0.0161290, 1/63 = 0.0158730
    assert(r(10L) == ((1L, 0L, 0.0163934)))
    // the DECIMAL sum is exactly 0.0325224; compare against the literal,
    // not a double addition of the two terms (which can differ by an ulp)
    assert(r(20L) == ((2L, 1L, 0.0325224)))
    assert(r(30L) == ((3L, 0L, 0.0158730)))
    assert(r(40L) == ((0L, 2L, 0.0161290)))
    assert(r.size == 4)
  }

  test("prefixJaccardPairs: prefix filtering loses nothing vs all-pairs truth; finds cross-bucket pairs ngram blocking drops") {
    import spark.implicits._
    // Planted corpus: (0,1) heavy overlap same length; (2,3) heavy overlap
    // with lengths straddling a n_chars-div-100 boundary (the pair class
    // ngramJaccardPairs' bucket blocking excludes by design); (4) shares
    // only the corpus-wide boilerplate token run (high-df tokens -> never
    // in anyone's prefix); (5) different lang twin of 0.
    def doc(id: Long, lang: String, nChars: Long, text: String) =
      (id, lang, nChars, text)
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val rows = Seq(
      doc(0L, "en", 98L, s"$base lambda mu"),
      doc(1L, "en", 99L, s"$base lambda nu"),
      doc(2L, "en", 99L, s"$base omicron pi rho"),
      doc(3L, "en", 101L, s"$base omicron pi sigma"),
      doc(4L, "en", 99L, "alpha beta unrelated words entirely different tail here"),
      doc(5L, "de", 98L, s"$base lambda mu"))
      .toDF("doc_id", "lang", "n_chars", "text")
    val got = DedupOps.prefixJaccardPairs(rows)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // all-pairs truth within a lang, exact Jaccard on distinct 3-shingles
    val sh = rows.select(col("doc_id"), col("lang"),
      array_distinct(expr(
        "transform(sequence(0, size(split(text, ' ')) - 3), " +
          "i -> concat_ws(' ', slice(split(text, ' '), i + 1, 3)))")).as("sh"))
    val truth = sh.as("x").join(sh.as("y"),
        col("x.lang") === col("y.lang") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id"), col("y.doc_id"),
        (size(array_intersect(col("x.sh"), col("y.sh"))).cast("double") /
          size(array_union(col("x.sh"), col("y.sh")))).as("jac"))
      .filter(col("jac") >= DedupOps.JACCARD_T)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == truth, s"prefix filter must be lossless: got $got vs $truth")
    assert(got.contains((2L, 3L)),
      "pair straddling the 100-char bucket boundary must be found")
    assert(!got.exists { case (a, b) => a == 4L || b == 4L },
      "boilerplate-only co-occurrence must verify below threshold")
    assert(!got.exists { case (a, b) => (a, b) == ((0L, 5L)) },
      "cross-lang pairs are out of scope")
    // and the bucket-blocked op indeed cannot see (2,3) — the documented
    // semantic difference, not a regression in either op
    val ngram = DedupOps.ngramJaccardPairs(rows)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!ngram.contains((2L, 3L)) && ngram.contains((0L, 1L)))
  }

  test("covarianceMatrix: equals the driver-side definition; diagonal nonnegative; dim-complete") {
    import spark.implicits._
    val e = Tables.t(spark, sfDir, "embeddings")
    val got = SimilarityOps.covarianceMatrix(e).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val dim = 64
    assert(got.size == dim * (dim + 1) / 2, "full upper triangle")
    assert((0 until dim).forall(i => got((i.toLong, i.toLong)) >= 0.0),
      "variances must be nonnegative")
    // brute-force truth on the collected corpus (sf0.001 is small):
    // population covariance in plain double arithmetic; the op computes on
    // 1e-6-quantized inputs and rounds to 6 decimals, so agreement is
    // bounded by the quantization bias (≤ 5e-7·(E|x_i|+E|x_j|)) plus the
    // final half-ulp (5e-7) — not by double-sum order
    val vecs = e.select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val n = vecs.length.toDouble
    val mean = Array.tabulate(dim)(i => vecs.map(_(i)).sum / n)
    def cov(i: Int, j: Int) =
      vecs.map(v => v(i) * v(j)).sum / n - mean(i) * mean(j)
    val worst = (for (i <- 0 until dim; j <- i until dim)
      yield math.abs(got((i.toLong, j.toLong)) - cov(i, j))).max
    assert(worst < 5e-6, s"op covariance diverges from definition by $worst")
  }

  test("pcaComponents/pcaProject: orthonormal descending spectrum, eigen residual, projection variance = eigenvalue") {
    val e = Tables.t(spark, sfDir, "embeddings")
    val comps = SimilarityOps.pcaComponents(e, 4)
    val lambdas = comps.map(_._1)
    assert(lambdas == lambdas.sorted.reverse, "eigenvalues must descend")
    assert(lambdas.forall(_ >= -1e-6), "covariance spectrum is nonnegative")
    def dot(a: Array[Double], b: Array[Double]) =
      a.indices.map(i => a(i) * b(i)).sum
    for (i <- comps.indices; j <- comps.indices) {
      val d = dot(comps(i)._2, comps(j)._2)
      if (i == j) assert(math.abs(d - 1.0) < 1e-9, s"component $i not unit")
      else assert(math.abs(d) < 1e-6, s"components $i,$j not orthogonal: $d")
    }
    // eigen residual against the (rounded-cell) covariance model
    val cells = SimilarityOps.covarianceMatrix(e).collect()
    val dim = 64
    val c = Array.ofDim[Double](dim, dim)
    cells.foreach { r =>
      c(r.getLong(0).toInt)(r.getLong(1).toInt) = r.getDouble(2)
      c(r.getLong(1).toInt)(r.getLong(0).toInt) = r.getDouble(2)
    }
    comps.foreach { case (l, v) =>
      val res = math.sqrt((0 until dim).map { i =>
        val cv = (0 until dim).map(j => c(i)(j) * v(j)).sum
        val r = cv - l * v(i); r * r
      }.sum)
      assert(res < 0.05 * (1 + l), s"eigen residual $res too large for lambda $l")
    }
    // projection self-consistency: population variance of each score column
    // equals its eigenvalue (vᵀCv), up to the cells' round(,6) and the
    // scores' round(,6)
    val pcs = SimilarityOps.pcaProject(e, 4).select("pc").collect()
      .map(_.getSeq[Double](0).toArray)
    val n = pcs.length.toDouble
    for (cmp <- 0 until 4) {
      val xs = pcs.map(_(cmp))
      val m = xs.sum / n
      val variance = xs.map(x => (x - m) * (x - m)).sum / n
      assert(math.abs(variance - lambdas(cmp)) < 1e-3 * (1 + lambdas(cmp)),
        s"projection variance $variance != lambda ${lambdas(cmp)} for comp $cmp")
    }
  }
}

/** Indirection so the spec reads naturally. */
private object SparkEntryRef {
  def queries = graft.SparkEntry.queries
}
