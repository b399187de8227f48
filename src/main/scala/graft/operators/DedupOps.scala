package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.CrossHash

/** Deduplication operators as DataFrame→DataFrame functions — the public
  * library surface ([[DedupQueries]] binds them to the test tables for the
  * gate). Input contract: a documents DataFrame with `doc_id BIGINT`,
  * `lang STRING`, `text STRING` (single-space tokenized), `n_chars INT`.
  *
  * Scale design (the part that matters at 100 TB):
  *   - exact dedup = one hash aggregate on a 128-bit digest — never on the
  *     raw text (shuffle ships 16-byte keys, not documents);
  *   - n-gram Jaccard joins only within blocking keys via an inverted
  *     index — work ∝ shingle co-occurrences, not O(block²);
  *   - MinHash: per-doc signature is ONE aggregation over exploded shingles
  *     (k min-aggregates in the same pass); LSH band join ships only
  *     (band, 4-int key) pairs; true Jaccard verified only for candidates;
  *   - SimHash: 32 conditional sums in one aggregate pass; pair search
  *     joins on 8-bit chunk equality (pigeonhole: hamming ≤ 3 over 4
  *     chunks ⇒ some chunk equal), never all-pairs.
  */
object DedupOps {
  import CrossHash._

  private[operators] val K = 16     // minhash signature length
  private[operators] val BANDS = 4  // 4 bands × 4 rows
  private[operators] val JACCARD_T = 0.3

  private def wordsCol: Column = split(col("text"), " ")

  /** Distinct 3-word shingles (the dedup literature's default unit), via the
    * native [[graft.functions.WordShingles]] expression (one string pass;
    * the composable transform/element_at form cost ~4 s per pass at sf0.1).
    */
  private[operators] def shinglesCol(text: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(graft.functions.WordShingles(Bridge.expression(text), 3))
  }

  /** Shingle sets with an explicit repartition BEFORE the heavy projection:
    * a corpus read from a handful of parquet files is a handful of scan
    * partitions, so without it the shingle+hash work runs on a few cores no
    * matter how many the executor has — the small-file parallelism trap.
    */
  private def docShingleSets(docs: DataFrame): DataFrame =
    OpContract.requireCols(docs, "DedupOps shingle ops", "doc_id", "lang", "n_chars", "text")
      .repartition(docs.sparkSession.sparkContext.defaultParallelism)
      .select(col("doc_id"), col("lang"), col("n_chars"), shinglesCol(col("text")).as("sh"))
      .filter(size(col("sh")) >= 1)

  /** Exact dedup summary: digest-keyed aggregate over md5(text) with a
    * keep-first policy; returns (n_input, n_unique, n_removed).
    */
  def exactDedupStats(docs: DataFrame): DataFrame =
    OpContract.requireCols(docs, "DedupOps.exactDedupStats", "doc_id", "text")
      .groupBy(md5(col("text")).as("digest"))
      .agg(count(lit(1)).as("copies"), min(col("doc_id")).as("keep_id"))
      .agg(
        sum(col("copies")).as("n_input"),
        count(lit(1)).as("n_unique"),
        (sum(col("copies")) - count(lit(1))).as("n_removed"))

  /** Snapshot diff between two corpus VERSIONS keyed by doc_id — the
    * dataset-versioning audit a recurring crawl refresh runs before
    * promoting a new snapshot: per-doc status `added` (id only in new),
    * `removed` (only in old), `changed` (both, digest differs),
    * `unchanged`. Output: (doc_id, status), one row per id in either
    * version.
    *
    * Scale shape: both sides collapse to (doc_id, 128-bit digest) BEFORE
    * the full-outer hash join — the join ships 24-byte rows, never text;
    * no window, no sort, one shuffle on the id key each side (colocated
    * for free if both snapshots are bucketed/partitioned by doc_id, the
    * layout a versioned corpus store would use).
    */
  def snapshotDiff(oldDocs: DataFrame, newDocs: DataFrame): DataFrame = {
    OpContract.requireCols(oldDocs, "DedupOps.snapshotDiff old", "doc_id", "text")
    OpContract.requireCols(newDocs, "DedupOps.snapshotDiff new", "doc_id", "text")
    // Each side collapses to ONE digest per doc_id (min — deterministic)
    // BEFORE the full-outer join: a snapshot with duplicate doc_ids would
    // otherwise multiply join rows and emit conflicting statuses for the
    // same id. The aggregate shares the join's hash partitioning on
    // doc_id, so it adds no extra exchange.
    val o = oldDocs.select(col("doc_id"), md5(col("text")).as("old_digest"))
      .groupBy("doc_id").agg(min(col("old_digest")).as("old_digest"))
    val n = newDocs.select(col("doc_id"), md5(col("text")).as("new_digest"))
      .groupBy("doc_id").agg(min(col("new_digest")).as("new_digest"))
    o.join(n, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("old_digest").isNull, lit("added"))
          .when(col("new_digest").isNull, lit("removed"))
          .when(col("old_digest") =!= col("new_digest"), lit("changed"))
          .otherwise(lit("unchanged")).as("status"))
  }

  /** Exact cross-corpus decontamination: drop every corpus document whose
    * text digest appears in `blocklist` (a benchmark/eval set) — the
    * exact-match half of decontamination next to
    * [[TextOps.contamination]]'s n-gram overlap measure. Returns the
    * surviving corpus rows unchanged.
    *
    * Scale shape: the blocklist collapses to distinct 128-bit digests and
    * is BROADCAST (benchmark sets are tiny next to a training corpus), so
    * the anti join is one corpus scan with no shuffle and the raw text
    * never leaves its partition.
    */
  def antiJoinDedup(docs: DataFrame, blocklist: DataFrame): DataFrame = {
    OpContract.requireCols(docs, "DedupOps.antiJoinDedup corpus", "text")
    OpContract.requireCols(blocklist, "DedupOps.antiJoinDedup blocklist", "text")
    docs.join(
      broadcast(blocklist.select(md5(col("text")).as("bl_digest")).distinct()),
      md5(col("text")) === col("bl_digest"), "left_anti")
  }

  /** Blocked n-gram Jaccard via an INVERTED INDEX: explode shingles, join
    * on (lang, size-bucket, 64-bit shingle hash), count shared shingles per
    * pair, then jac = common / (|A| + |B| − common). Work is proportional
    * to the number of shingle co-occurrences, not O(block²) array
    * intersections — pairs sharing nothing are never materialized.
    * Identical result to the all-pairs formulation (jac > 0 requires ≥ 1
    * shared shingle).
    */
  def ngramJaccardPairs(docs: DataFrame): DataFrame = {
    val sets = docShingleSets(docs)
      .withColumn("bucket", expr("n_chars div 100"))
      .withColumn("sz", size(col("sh")))
    // Join on a 64-bit hash of the shingle, not the string — 8-byte keys
    // in the shuffle instead of ~25-byte strings (collisions: ~|shingles|²
    // /2^64, irrelevant; the oracle compares final jaccards, unchanged).
    // Checkpointed (r15): the a/b sides of the self-join carry different
    // column aliases, so exchange reuse never fires and the corpus
    // scan+shingle+hash pipeline ran TWICE; one materialization of the
    // 8-byte-keyed postings serves both sides (the prefixJaccard/tfidf
    // postings discipline, measured win in the same-session pair).
    val inv = sets.select(col("doc_id"), col("lang"), col("bucket"), col("sz"),
        explode(col("sh")).as("shingle"))
      .select(col("doc_id"), col("lang"), col("bucket"), col("sz"),
        xxhash64(col("shingle")).as("shx"))
      .localCheckpoint()
    val a = inv.select(col("lang"), col("bucket"), col("shx"),
      col("doc_id").as("doc_a"), col("sz").as("sz_a"))
    val b = inv.select(col("lang").as("l2"), col("bucket").as("bkt2"),
      col("shx").as("shx2"), col("doc_id").as("doc_b"), col("sz").as("sz_b"))
    // Size-ratio prune: common <= min(sz) forces jac <= min(sz)/max(sz),
    // so jac >= 0.3 requires 10*min >= 3*max — exact integer arithmetic
    // (the -1 slack provably covers the pair-at-the-boundary case where
    // the double-rounded jac clears the filter while the exact ratio sits
    // an ulp under it). Drops hopeless co-occurrence pairs BEFORE the
    // aggregate; output is unchanged by construction.
    a.join(b, col("lang") === col("l2") && col("bucket") === col("bkt2") &&
        col("shx") === col("shx2") && col("doc_a") < col("doc_b") &&
        least(col("sz_a"), col("sz_b")) * 10 >= greatest(col("sz_a"), col("sz_b")) * 3 - 1)
      .groupBy("doc_a", "doc_b", "sz_a", "sz_b")
      .agg(count(lit(1)).as("common"))
      .withColumn("jac",
        col("common").cast("double") / (col("sz_a") + col("sz_b") - col("common")))
      .filter(col("jac") >= JACCARD_T)
      .select("doc_a", "doc_b", "jac")
  }

  /** Exact Jaccard ≥ [[JACCARD_T]] similarity join via PREFIX FILTERING —
    * the AllPairs/PPJoin candidate scheme (Bayardo et al. WWW'07; Xiao et
    * al. WWW'08), a different pruning strategy from [[ngramJaccardPairs]]'
    * full inverted index. Tokens get a global total order (ascending
    * document frequency, ties by hash); each doc indexes only its PREFIX —
    * the first `|sh| − ⌈t·|sh|⌉ + 1` tokens in that order. The prefix
    * lemma guarantees any pair with jac ≥ t shares ≥ 1 prefix token, so
    * joining prefixes (instead of all tokens) finds every qualifying pair
    * while the candidate join touches only each doc's RAREST tokens — the
    * high-df head tokens that dominate inverted-index co-occurrence cost
    * never enter the join. The prefix length uses the exact integer form
    * `sz − ((3·sz + 9) div 10) + 1` (t = 0.3): a double `ceil(0.3·sz)`
    * can land an ulp high and shorten the prefix below the lossless bound.
    *
    * Unlike [[ngramJaccardPairs]] this op does NOT block by n_chars
    * bucket, so it also finds true pairs straddling a length-bucket
    * boundary; the size-ratio prune (10·min ≥ 3·max − 1, same slack
    * argument) still drops hopeless pairs exactly. Candidates are then
    * exact-verified by shared-shingle counts — identical jac arithmetic
    * to the rest of the family.
    *
    * Scale shape: df is one map-side-combined aggregate over 8-byte token
    * hashes; the rank window shuffles (hash, df) pairs by doc_id; the
    * candidate join carries prefix rows only. On a skewed Zipf corpus the
    * prefix join's worst key is a RARE token by construction — the
    * frequent-token hot keys that force salting in a naive token join are
    * pruned out of the index entirely.
    */
  def prefixJaccardPairs(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sets = docShingleSets(docs).withColumn("sz", size(col("sh")))
    // the exploded+hashed postings feed THREE consumers (df counts, the
    // rank join, the verify stage) — checkpoint once so the corpus
    // scan/shingle/hash pipeline runs once, not three times (the
    // tfidfPairs postings discipline; measured 4.0 -> ~2.6 s at sf0.1).
    // Only the 64-bit hash is checkpointed — every consumer (df counts,
    // rank window, candidate join, verify counts) keys on shx; the
    // shingle STRING (~25 B/row vs 8 B) was materialized and carried
    // through the rank window join without ever being read (guide §6 /
    // §2.3: narrower types, project before the exchange).
    val inv = sets.select(col("doc_id"), col("lang"), col("sz"),
        explode(col("sh")).as("shingle"))
      .select(col("doc_id"), col("lang"), col("sz"),
        xxhash64(col("shingle")).as("shx"))
      .localCheckpoint()
    val dfreq = inv.groupBy("lang", "shx").agg(count(lit(1)).as("df"))
    val ranked = inv.join(dfreq, Seq("lang", "shx"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("doc_id").orderBy(col("df"), col("shx"))))
    val prefix = ranked
      .filter(col("rn") <= col("sz") - expr("(3 * sz + 9) div 10") + 1)
    val a = prefix.select(col("lang"), col("shx"),
      col("doc_id").as("doc_a"), col("sz").as("sz_a"))
    val b = prefix.select(col("lang").as("l2"), col("shx").as("shx2"),
      col("doc_id").as("doc_b"), col("sz").as("sz_b"))
    val cand = a.join(b, col("lang") === col("l2") && col("shx") === col("shx2") &&
        col("doc_a") < col("doc_b") &&
        least(col("sz_a"), col("sz_b")) * 10 >=
          greatest(col("sz_a"), col("sz_b")) * 3 - 1)
      .select("doc_a", "doc_b").distinct()
    // verify joins on the 64-bit shingle hash, not the string — the
    // postings shuffle carries 8-byte keys (the candidate-stage
    // convention; collisions ~|shingles|²/2^64, value-oracle-checked)
    verifyJaccard(cand, inv.select(col("doc_id"), col("sz"),
        col("shx").as("h")),
      "doc_a", "doc_b")
  }

  /** Asymmetric CONTAINMENT pairs: c(A→B) = |sh(A) ∩ sh(B)| / |sh(A)| —
    * the fraction of A's 3-gram shingles that also appear in B. Jaccard
    * ops miss the quote-embedded-in-a-larger-document case (a 100-shingle
    * doc fully contained in a 1000-shingle doc has jac ≈ 0.1 but
    * containment 1.0); this is the standard complement for training-data
    * dedup, where boilerplate-wrapped copies are common.
    *
    * Same inverted-index shape as [[ngramJaccardPairs]] — join on
    * (lang, 64-bit shingle hash), count co-occurrences per pair — but
    * WITHOUT the size-ratio prune (containment is exactly the
    * small-inside-big case that prune discards) and without the n_chars
    * bucket. Work is proportional to shingle co-occurrences; both
    * directions of each unordered pair are emitted from ONE aggregate via
    * a 2-element explode (no second pass over the join).
    *
    * FP discipline: the ≥ 0.8 threshold is evaluated as the EXACT integer
    * inequality 10·common ≥ 8·|sh| — no double compare anywhere near the
    * gate; the reported containment is one correctly-rounded division of
    * exact integers.
    */
  def containmentPairs(docs: DataFrame): DataFrame = {
    val sets = docShingleSets(docs).withColumn("sz", size(col("sh")))
    // NOT checkpointed: the same-session A/B that added the postings
    // checkpoint to [[ngramJaccardPairs]] (two aliased self-join sides,
    // exchange reuse never fires) made containment consistently SLOWER
    // (1.37/1.48 -> 1.59-1.73 s at sf0.1 across three pairs) — without
    // the size-ratio prune its join blocks dominate, and the eager
    // materialization job costs more than the duplicated lazy scan.
    val inv = sets.select(col("doc_id"), col("lang"), col("sz"),
        explode(col("sh")).as("shingle"))
      .select(col("doc_id"), col("lang"), col("sz"), xxhash64(col("shingle")).as("shx"))
    val a = inv.select(col("lang"), col("shx"),
      col("doc_id").as("doc_a"), col("sz").as("sz_a"))
    val b = inv.select(col("lang").as("l2"), col("shx").as("shx2"),
      col("doc_id").as("doc_b"), col("sz").as("sz_b"))
    val common = a.join(b, col("lang") === col("l2") &&
        col("shx") === col("shx2") && col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b", "sz_a", "sz_b")
      .agg(count(lit(1)).as("common"))
    common.select(col("common"), explode(array(
        struct(col("doc_a"), col("doc_b"), col("sz_a").as("sz")),
        struct(col("doc_b").as("doc_a"), col("doc_a").as("doc_b"),
          col("sz_b").as("sz")))).as("d"))
      .filter(col("common") * 10 >= col("d.sz") * 8)
      .select(col("d.doc_a").as("doc_a"), col("d.doc_b").as("doc_b"),
        (col("common").cast("double") / col("d.sz")).as("containment"))
  }

  /** MinHash + LSH: k=16 universal-family minhashes in one aggregation
    * pass, 4-band LSH join, candidates verified with true Jaccard (via
    * shared-shingle counts, like [[ngramJaccardPairs]]). The
    * exploded+hashed shingle lineage feeds signatures AND verification; it
    * is recomputed per branch rather than persisted — a persist() from
    * inside a builder is never released (the API returns a lazy DataFrame)
    * and would pin executor memory for the rest of the session. At 100 TB
    * the caller should checkpoint this intermediate explicitly; with the
    * native shingle/hash expressions the local recompute is ~1 s.
    */
  /** Shared MinHash machinery: per-doc (sz, shingle-hash) rows and the
    * banded signature table. The band explode is ONE explode, not a
    * BANDS-way unionAll — a union would recompute the signature aggregate
    * once per branch.
    */
  private def minhashBands(docs: DataFrame): (DataFrame, DataFrame) = {
    val sets = docShingleSets(docs).select(col("doc_id"), col("sh"))
      .withColumn("sz", size(col("sh")))
    // per-doc rows carry the 60-bit cross-engine hash ONLY: the signature
    // min-hashes and the verify join both key on h, and the shingle STRING
    // (~25 B vs 8 B) was being shuffled through the corpus-sized verify
    // join — and persisted in every minhash index artifact — unread
    // (§2.3 narrower types; the prefix/ngram candidate-stage convention,
    // collisions ~|shingles|²/2^60, value-oracle-checked)
    val hashed = sets.select(col("doc_id"), col("sz"), explode(col("sh")).as("shingle"))
      .select(col("doc_id"), col("sz"), mdint(col("shingle")).as("h"))
    val sigCols = (0 until K).map(i => min(minhash(col("h"), i)).as(s"s$i"))
    val sig = hashed.groupBy("doc_id").agg(sigCols.head, sigCols.tail: _*)
    val bands = sig.select(col("doc_id"), explode(array((0 until BANDS).map { bnd =>
      struct(lit(bnd).as("band"),
        concat_ws(",", (0 until 4).map(r => col(s"s${bnd * 4 + r}")): _*).as("key"))
    }: _*)).as("b"))
      .select(col("doc_id"), col("b.band").as("band"), col("b.key").as("key"))
    (hashed, bands)
  }

  /** Shared exact-Jaccard verification of a candidate pair table against
    * the per-doc (doc_id, sz, h) shingle-HASH rows; emits
    * (aCol, bCol, jac ≥ JACCARD_T). Shared-shingle counts join on the
    * integer hash column `h`, never a string.
    */
  private def verifyJaccard(cand: DataFrame, hashed: DataFrame,
      aCol: String, bCol: String): DataFrame =
    verifyJaccard2(cand, hashed, hashed, aCol, bCol)

  /** Two-sided variant: the a-side and b-side docs live in DIFFERENT
    * shingle-hash tables (corpus vs incoming) — the incremental-dedup
    * shape, where the corpus side comes from a precomputed index.
    */
  private def verifyJaccard2(cand: DataFrame, hashedA: DataFrame,
      hashedB: DataFrame, aCol: String, bCol: String): DataFrame = {
    val ia = hashedA.select(col("doc_id").as(aCol), col("sz").as("sz_a"),
      col("h"))
    val ib = hashedB.select(col("doc_id").as("vj_b"), col("sz").as("sz_b"),
      col("h").as("h2"))
    cand.join(ia, aCol)
      .join(ib, col(bCol) === col("vj_b") && col("h") === col("h2"))
      .groupBy(aCol, bCol, "sz_a", "sz_b")
      .agg(count(lit(1)).as("common"))
      .withColumn("jac",
        col("common").cast("double") / (col("sz_a") + col("sz_b") - col("common")))
      .filter(col("jac") >= JACCARD_T)
      .select(col(aCol), col(bCol), col("jac"))
  }

  def minhashPairs(docs: DataFrame): DataFrame = {
    val (hashed, bands) = minhashBands(docs)
    val cand = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    verifyJaccard(cand, hashed, "doc_a", "doc_b")
  }

  /** The corpus-side MinHash index for incremental dedup: the per-doc
    * (sz, shingle-hash) rows and the banded signature table, as a pair
    * the caller computes ONCE per corpus version, persists (or writes to
    * parquet), and hands to every [[minhashPairsAgainst]] batch probe —
    * per-batch cost is then ∝ batch size + collisions, NOT corpus size.
    */
  def minhashIndex(docs: DataFrame): (DataFrame, DataFrame) = {
    OpContract.requireCols(docs, "DedupOps.minhashIndex", "doc_id", "text")
    minhashBands(docs)
  }

  /** Persist a [[minhashIndex]] as two parquet tables — the production
    * ingest shape: index the corpus once per version, write it next to
    * the corpus, and let every batch probe (tomorrow's ingest, another
    * job, a streaming query) read it back instead of re-hashing the
    * corpus. Layout: `dir/hashed.parquet` (per-doc shingle-hash rows) +
    * `dir/bands.parquet` (banded signatures); both partition-friendly
    * columnar tables, no driver-side state.
    */
  def writeMinhashIndex(index: (DataFrame, DataFrame), dir: String): Unit = {
    index._1.write.mode("overwrite").parquet(s"$dir/hashed.parquet")
    index._2.write.mode("overwrite").parquet(s"$dir/bands.parquet")
  }

  /** Reload a persisted [[writeMinhashIndex]]; the result feeds
    * [[minhashPairsAgainst]] exactly like a freshly built index
    * (round-trip equality pinned in PipelineOpsSpec).
    */
  def readMinhashIndex(spark: org.apache.spark.sql.SparkSession,
      dir: String): (DataFrame, DataFrame) =
    (spark.read.parquet(s"$dir/hashed.parquet"),
      spark.read.parquet(s"$dir/bands.parquet"))

  /** INCREMENTAL MinHash dedup: near-dup pairs BETWEEN an existing corpus
    * and an incoming batch only — the daily-ingest shape, where comparing
    * the corpus against itself again would redo almost all of yesterday's
    * work. Same signatures/bands/verify as [[minhashPairs]], but the band
    * join is corpus-bands × incoming-bands: candidates are cross-side
    * collisions only, old×old and new×new bucket-mates never pair. This
    * convenience form recomputes the corpus index per call; production
    * ingest (and the streaming twin,
    * [[graft.streaming.StreamOps.incrementalDedupStream]]) computes
    * [[minhashIndex]] once and calls the index overload per batch.
    * Sides are kept structurally separate, so a doc_id appearing on BOTH
    * sides cannot mislabel: each side verifies against its own shingle
    * table, and identical ids never self-pair (the old×new join requires
    * distinct ids). Output: (doc_old, doc_new, jac ≥ [[JACCARD_T]]).
    */
  def minhashPairsAgainst(corpus: DataFrame, incoming: DataFrame): DataFrame = {
    OpContract.requireCols(corpus, "DedupOps.minhashPairsAgainst corpus", "doc_id", "text")
    minhashPairsAgainst(minhashBands(corpus), incoming)
  }

  /** Precomputed-corpus overload: `corpusIndex` = [[minhashIndex]] output
    * (possibly persisted across many batches). See the two-arg form for
    * semantics.
    */
  def minhashPairsAgainst(corpusIndex: (DataFrame, DataFrame),
      incoming: DataFrame): DataFrame = {
    OpContract.requireCols(incoming, "DedupOps.minhashPairsAgainst incoming", "doc_id", "text")
    val (corpusHashed, corpusBands) = corpusIndex
    val (incHashed, incBands) = minhashBands(incoming)
    val cand = corpusBands.as("x").join(incBands.as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
          col("x.doc_id") =!= col("y.doc_id"))
      .select(col("x.doc_id").as("doc_old"), col("y.doc_id").as("doc_new"))
      .distinct()
    verifyJaccard2(cand, corpusHashed, incHashed, "doc_old", "doc_new")
  }

  /** SimHash: 32-bit signature from term-frequency-weighted word-hash bits;
    * near-dup pairs = hamming ≤ 3, found via 8-bit chunk blocking.
    */
  def simhashPairs(docs: DataFrame): DataFrame = {
    val wc = OpContract.requireCols(docs, "DedupOps.simhashPairs", "doc_id", "text")
      .repartition(docs.sparkSession.sparkContext.defaultParallelism)
      .select(col("doc_id"), explode(wordsCol).as("word"))
      .groupBy("doc_id", "word").agg(count(lit(1)).as("cnt"))
      .withColumn("h", mdint(col("word")))
    val bitCols = (0 until 32).map(j =>
      sum(col("cnt") * (shiftright(col("h"), j).bitwiseAND(lit(1L)) * 2 - 1)).as(s"b$j"))
    val bitSums = wc.groupBy("doc_id").agg(bitCols.head, bitCols.tail: _*)
    // Checkpointed (r15): the chunk self-join's x/y sides carry different
    // aliases, so exchange reuse never deduplicated the corpus
    // scan+explode+bitsum pipeline — it ran TWICE per invocation (and
    // dd_eval pays it next to ngramJaccardPairs). The per-doc signature
    // table is 2 longs/doc — the cheapest possible materialization point
    // (the ngram/prefix/tfidf postings discipline, measured in the
    // same-session pair).
    val sig = bitSums.select(col("doc_id"),
      (0 until 32).map(j => when(col(s"b$j") > 0, lit(1L << j)).otherwise(0L))
        .reduce(_ + _).as("sig"))
      .localCheckpoint()
    val chunks = sig.select(col("doc_id"), col("sig"),
        explode(array((0 until 4).map(c =>
          struct(lit(c).as("chunk"),
            shiftright(col("sig"), c * 8).bitwiseAND(lit(255L)).as("ck"))): _*)).as("c"))
      .select(col("doc_id"), col("sig"), col("c.chunk").as("chunk"), col("c.ck").as("ck"))
    chunks.as("x").join(chunks.as("y"),
        col("x.chunk") === col("y.chunk") && col("x.ck") === col("y.ck") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        bit_count(col("x.sig").bitwiseXOR(col("y.sig"))).cast("int").as("hamming"))
      .distinct()
      .filter(col("hamming") <= 3)
  }

  /** Detector evaluation: precision / recall / F1 of a predicted near-dup
    * pair table against an exact-truth pair table — the dedup counterpart
    * of [[SimilarityOps.annRecall]], and the measurement loop a production
    * dedup deployment runs on sampled shards before trusting a cheap
    * detector (simhash, banding config, threshold choice) on the full
    * corpus. Both inputs are (doc_a, doc_b, …) canonical pair tables
    * (doc_a < doc_b, as every pair op here emits).
    *
    * All three ratios are SINGLE correctly-rounded divisions of exact
    * integer counts (F1 uses the algebraic form 2·hits/(|P|+|T|), one
    * division, not 2pr/(p+r) which would chain three roundings) — so the
    * row is deterministic cross-engine and cross-partitioning. Empty
    * sides yield NULL ratios rather than an engine-specific 0/0.
    *
    * Scale shape: pair tables carry ids only (16-byte rows); one
    * (doc_a, doc_b) semi join + three map-side count aggregates to a
    * single row — no text, no wide rows, no driver loop.
    */
  def dedupEval(predicted: DataFrame, truth: DataFrame): DataFrame = {
    OpContract.requireCols(predicted, "DedupOps.dedupEval predicted", "doc_a", "doc_b")
    OpContract.requireCols(truth, "DedupOps.dedupEval truth", "doc_a", "doc_b")
    val p = predicted.select("doc_a", "doc_b")
    val t = truth.select("doc_a", "doc_b")
    val np = p.agg(count(lit(1)).as("n_predicted"))
    val nt = t.agg(count(lit(1)).as("n_truth"))
    val nh = p.join(t, Seq("doc_a", "doc_b"), "left_semi")
      .agg(count(lit(1)).as("n_hits"))
    np.crossJoin(nt).crossJoin(nh) // three 1-row sides — scalar broadcast
      .select(col("n_predicted"), col("n_truth"), col("n_hits"),
        when(col("n_predicted") > 0,
          col("n_hits").cast("double") / col("n_predicted")).as("precision"),
        when(col("n_truth") > 0,
          col("n_hits").cast("double") / col("n_truth")).as("recall"),
        when(col("n_predicted") + col("n_truth") > 0,
          (col("n_hits") * 2).cast("double") /
            (col("n_predicted") + col("n_truth"))).as("f1"))
  }

  /** Near-dup CLUSTERS from a pair list — the step that turns pairwise
    * similarity into a keep-one-per-group dedup decision: connected
    * components over the (doc_a, doc_b) graph, each doc labeled with the
    * minimum doc_id reachable from it (the canonical survivor).
    *
    * Algorithm: iterative min-label propagation to a fixpoint —
    * label(v) ← min(label(v), min of neighbors' labels) — converging in
    * O(component diameter) rounds. The iterated set is only the docs that
    * appear in a pair (the near-dup subgraph, tiny next to the corpus) and
    * each round is one join + one min-aggregate; labels are
    * `localCheckpoint`ed per round so the plan doesn't grow with the
    * iteration count (on a cluster, use reliable checkpointing). Dedup
    * components are short chains/cliques in practice; pathological
    * diameters (> maxIters) fail fast rather than return a partial
    * clustering. For adversarial graph shapes at extreme scale the
    * alternating large-star/small-star algorithm (Kiveris et al.,
    * "Connected Components in MapReduce and Beyond", SoCC'14) converges in
    * O(log n) rounds with the same per-round join shape.
    */
  def nearDupClusters(pairs: DataFrame, maxIters: Int = 20): DataFrame = {
    val sym = OpContract.requireCols(pairs, "DedupOps.nearDupClusters", "doc_a", "doc_b")
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionAll(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .localCheckpoint()
    var labels = sym.select(col("src").as("doc_id")).distinct()
      .select(col("doc_id"), col("doc_id").as("cluster_id"))
      .localCheckpoint()
    var it = 0
    var converged = false
    while (!converged && it < maxIters) {
      val viaNeighbors = sym
        .join(labels.withColumnRenamed("doc_id", "dst2"), col("dst") === col("dst2"))
        .select(col("src").as("doc_id"), col("cluster_id"))
      val next = labels.unionAll(viaNeighbors)
        .groupBy("doc_id").agg(min("cluster_id").as("cluster_id"))
        .localCheckpoint()
      converged = next.as("n")
        .join(labels.as("o"), "doc_id")
        .filter(col("n.cluster_id") =!= col("o.cluster_id"))
        .isEmpty
      labels = next
      it += 1
    }
    require(converged,
      s"nearDupClusters did not converge in $maxIters rounds — component " +
        "diameter exceeds the cap; raise maxIters or switch to star-contraction")
    labels
  }

  /** Connected components by ALTERNATING STAR CONTRACTION (Kiveris et al.,
    * "Connected Components in MapReduce and Beyond", SoCC'14) — the
    * extreme-scale alternative to [[nearDupClusters]]: O(log n) rounds
    * regardless of component diameter, where min-label propagation needs
    * O(diameter). Same output contract ((doc_id, cluster_id = minimum
    * reachable id), one row per doc appearing in a pair) — asserted equal
    * to the propagation implementation in PipelineOpsSpec, and gated
    * against the same recursive-CTE oracle (dd_clusters_star).
    *
    * Each round is two half-steps over the edge list:
    *   - large-star: every node u links its LARGER neighbors to
    *     m = min(Γ(u) ∪ u);
    *   - small-star: keyed by the larger endpoint, every node links its
    *     smaller neighbors (and itself) to the minimum.
    * Edges stay canonical (min, max) pairs; the edge list shrinks toward
    * star graphs centered at component minima. Same per-round shape as
    * propagation (join-free aggregates + one equality check), same
    * localCheckpoint lineage discipline.
    */
  def nearDupClustersStar(pairs0: DataFrame, maxRounds: Int = 30): DataFrame =
    nearDupClustersStarRounds(pairs0, maxRounds)._1

  /** [[nearDupClustersStar]] plus the executed round count — the O(log n)
    * claim made observable (ScaleBench prints rounds per corpus scale).
    * The contraction loop runs eagerly (per-round convergence actions), so
    * the count is exact at return time.
    */
  def nearDupClustersStarRounds(pairs0: DataFrame,
      maxRounds: Int = 30): (DataFrame, Int) = {
    OpContract.requireCols(pairs0, "DedupOps.nearDupClustersStar", "doc_a", "doc_b")
    // checkpoint the INPUT once: nodes and the initial edge set both
    // derive from it, and without this the (possibly expensive) upstream
    // lineage — e.g. a full MinHash pass — would evaluate twice
    val pairs = pairs0.localCheckpoint()
    val nodes = pairs.select(col("doc_a").as("n"))
      .unionAll(pairs.select(col("doc_b").as("n"))).distinct().localCheckpoint()
    def canon(df: DataFrame): DataFrame =
      df.filter(col("x") =!= col("y"))
        .select(least(col("x"), col("y")).as("a"), greatest(col("x"), col("y")).as("b"))
        .distinct()
    def star(edges: DataFrame, large: Boolean): DataFrame = {
      // large-star groups the SYMMETRIC adjacency by u and links neighbors
      // v > u; small-star groups by the larger endpoint and links all of
      // (smaller neighbors ∪ itself) except the minimum
      val adj =
        if (large)
          edges.select(col("a").as("u"), col("b").as("v"))
            .unionAll(edges.select(col("b").as("u"), col("a").as("v")))
        else edges.select(col("b").as("u"), col("a").as("v"))
      val m = adj.groupBy("u").agg(min(col("v")).as("mv"))
        .select(col("u"), least(col("mv"), col("u")).as("m"))
      val linked = adj.join(m, "u")
      val re =
        if (large) linked.filter(col("v") > col("u"))
          .select(col("v").as("x"), col("m").as("y"))
        else linked.select(col("v").as("x"), col("m").as("y"))
          .unionAll(m.select(col("u").as("x"), col("m").as("y")))
      canon(re)
    }
    var edges = canon(pairs.select(col("doc_a").as("x"), col("doc_b").as("y")))
      .localCheckpoint()
    var round = 0
    var converged = false
    while (!converged && round < maxRounds) {
      val next = star(star(edges, large = true), large = false).localCheckpoint()
      // both sides are DISTINCT canonical pair sets, so equal counts plus
      // an empty one-sided difference imply equality — one exceptAll scan
      // per round, not two
      converged = next.count() == edges.count() && next.exceptAll(edges).isEmpty
      edges = next
      round += 1
    }
    require(converged,
      s"nearDupClustersStar did not converge in $maxRounds rounds")
    // converged edges are stars rooted at component minima: every
    // non-root node has exactly the edge (root, node); roots label
    // themselves
    val rooted = edges.select(col("b").as("doc_id"), col("a").as("cluster_id"))
    val labels = nodes.join(rooted, col("n") === col("doc_id"), "left")
      .select(col("n").as("doc_id"),
        coalesce(col("cluster_id"), col("n")).as("cluster_id"))
    (labels, round)
  }

  /** Apply a near-dup clustering to the corpus: keep ONE canonical
    * document per cluster — the `cluster_id` representative, which
    * [[nearDupClusters]]/[[nearDupClustersStar]] define as the component
    * minimum — plus every document that belongs to no cluster. This is
    * the "write the deduplicated corpus" step that turns the pair/cluster
    * analyses into an actual filtered dataset at the end of a pipeline.
    *
    * Scale shape: the removal list is non-canonical member ids only —
    * `(doc_id)` rows, a small fraction of the corpus in practice — and
    * the corpus is filtered by a left_anti join on that 8-byte key, so
    * document text never shuffles. AQE broadcasts the removal side when
    * it fits; at any size the anti join is one hash exchange of ids.
    */
  def keepCanonical(docs: DataFrame, clusters: DataFrame): DataFrame = {
    OpContract.requireCols(docs, "DedupOps.keepCanonical", "doc_id")
    val removed = OpContract
      .requireCols(clusters, "DedupOps.keepCanonical", "doc_id", "cluster_id")
      .filter(col("doc_id") =!= col("cluster_id"))
      .select("doc_id")
    docs.join(removed, Seq("doc_id"), "left_anti")
  }

  /** Fixed-length-key fuzzy pairs: every (a, b) with HAMMING distance ≤
    * `k` between equal-length keys, via lossless pigeonhole blocking —
    * the [[simhashPairs]] signature-chunk trick applied to strings. The
    * key splits into k+1 contiguous segments; ≤ k substitutions can
    * touch at most k of them, so a qualifying pair matches at least one
    * segment EXACTLY, and an equi-join on (segment index, segment text,
    * key length) finds every candidate. Pairs differing in length are
    * excluded by definition (substitution-only distance).
    *
    * This is the scale-safe twin of [[fuzzyPairs]] for the fixed-width
    * regime (normalized codes, hashes, equal-length prefixes): length
    * banding has NO leverage when every key has the same length — one
    * band holds the whole corpus and the candidate set degenerates to
    * corpus²/2 — while segment blocking keeps candidates at block
    * occupancy (keys sharing a ~|key|/(k+1)-char exact run), replicating
    * each record k+1 times with ids + segments only. A candidate pair
    * matching on several segments is collapsed by a pair-distinct before
    * the verify, so the O(|key|) Hamming check runs once per pair.
    */
  def hammingPairs(df: DataFrame, idCol: Column, keyCol: Column,
      k: Int = 2): DataFrame = {
    require(k >= 0, s"hammingPairs needs k >= 0, got $k")
    val nSeg = k + 1
    val keyed = df.select(idCol.as("id"), keyCol.as("key"))
      .withColumn("len", length(col("key")))
    val segs = keyed
      .select(col("id"), col("key"), col("len"),
        explode(sequence(lit(0), lit(nSeg - 1))).as("seg"))
      .withColumn("lo", (col("seg") * col("len") / nSeg).cast("int"))
      .withColumn("hi", ((col("seg") + 1) * col("len") / nSeg).cast("int"))
      .select(col("id"), col("key"), col("len"), col("seg"),
        expr("substring(key, lo + 1, hi - lo)").as("segval"))
    val cand = segs.as("a").join(segs.as("b"),
        col("a.seg") === col("b.seg") && col("a.len") === col("b.len") &&
          col("a.segval") === col("b.segval") && col("a.id") < col("b.id"))
      .select(col("a.id").as("doc_a"), col("b.id").as("doc_b"),
        col("a.key").as("key_a"), col("b.key").as("key_b"))
      .distinct()
    cand
      .withColumn("dist",
        aggregate(
          zip_with(split(col("key_a"), ""), split(col("key_b"), ""),
            (x, y) => when(x === y, lit(0)).otherwise(lit(1))),
          lit(0), (acc, v) => acc + v).cast("long"))
      .filter(col("dist") <= k)
      .select(col("doc_a"), col("doc_b"), col("dist"))
  }

  /** Record-linkage fuzzy pairs: every (a, b) with edit distance ≤ `k` on
    * a short linkage key, found via LOSSLESS length-banded blocking. Each
    * single-character edit changes string length by at most 1, so a
    * qualifying pair satisfies |len(a) − len(b)| ≤ k; with block width
    * B ≥ k the two length blocks `len div B` differ by at most one, so
    * probing a record's own block plus its two neighbors misses nothing.
    * One side replicates ×3 (ids + keys only, never full rows); the join
    * is an equi-join on the block id, so candidate count is bounded by
    * block occupancy — never corpus² — and the O(|key|²) levenshtein
    * verify runs only inside blocks, after a cheap length-difference
    * pre-filter. Keys should be short linkage fields (names, titles,
    * normalized prefixes), not whole documents: edit distance on a long
    * string is both expensive and semantically weak — near-dup DOCUMENT
    * detection belongs to [[minhashPairs]]/[[simhashPairs]].
    *
    * Each qualifying pair is emitted exactly once (`id_a < id_b`): the
    * lower id matches the higher id's home block through exactly one of
    * its three probe replicas.
    *
    * Scale caveat: blocking leverage here comes ENTIRELY from the block
    * key's selectivity. On fixed-width keys the length band alone puts
    * every record in one block and the candidate set degenerates to
    * corpus²/2 — use [[hammingPairs]] (pigeonhole segment blocking) in
    * that regime, or sharpen the block with `blockOn`: exact-match
    * attributes (source, language, postcode — the standard compound
    * blocking key of record-linkage practice) that multiply the block
    * count and divide per-block occupancy. MEASURED (BENCHNOTES r8
    * curve): with `blockOn` attributes of FIXED cardinality, block
    * population grows with the corpus and the fitted exponent is 1.83
    * (quadratic — 424 s at 30×); adding one attribute whose cardinality
    * grows with the corpus (ingest batch) holds occupancy constant and
    * the exponent drops to 0.59 (5.5 s at 30×). Grow the compound key
    * with the corpus. Only same-`blockOn` pairs are
    * compared — that restriction is part of the declared semantics, not
    * an approximation. A NULL `blockOn` value is never paired (plain
    * equality, not null-safe — matching the SQL-oracle `a.x = b.x`
    * semantics; ADVICE r7): an unknown blocking attribute gives no
    * evidence two records belong to the same block.
    */
  def fuzzyPairs(df: DataFrame, idCol: Column, keyCol: Column, k: Int = 2,
      blockWidth: Int = 8, blockOn: Seq[Column] = Nil): DataFrame = {
    require(k >= 0, s"fuzzyPairs needs k >= 0, got $k")
    require(blockWidth >= math.max(k, 1),
      s"blockWidth ($blockWidth) must be >= k ($k) for lossless length banding")
    val extra = blockOn.zipWithIndex.map { case (c, i) => c.as(s"xb$i") }
    val keyed = df.select((Seq(idCol.as("id"), keyCol.as("key")) ++ extra): _*)
      .withColumn("len", length(col("key")))
      .withColumn("blk", floor(col("len") / blockWidth))
    val probes0 = keyed.withColumn("blk",
      explode(array(col("blk") - 1, col("blk"), col("blk") + 1)))
    // The O(|key|²) levenshtein verify executes AT THE JOIN, and with the
    // block side broadcast the join's parallelism is the PROBE side's
    // partition count — a corpus that arrives as one small file would run
    // the whole verify in one task (measured: 11 s single-task vs <1 s
    // spread, sf0.1). Probe rows are (id, key, len, blk) — tiny — so when
    // the input has fewer partitions than the cluster has slots, one
    // negligible round-robin shuffle buys full fan-out; an already-wide
    // corpus is left untouched (no extra exchange at real scale).
    val para = df.sparkSession.sparkContext.defaultParallelism
    val probes = if (probes0.rdd.getNumPartitions < para)
      probes0.repartition(para) else probes0
    val blockEq = blockOn.indices
      .map(i => col(s"a.xb$i") === col(s"b.xb$i"))
      .foldLeft(col("a.blk") === col("b.blk"))(_ && _)
    probes.as("a").join(keyed.as("b"), blockEq && col("a.id") < col("b.id"))
      .filter(abs(col("a.len") - col("b.len")) <= k)
      // threshold form runs the banded O(k·|key|) DP and returns -1 past
      // the bound — the verify never pays the full O(|key|²) matrix for
      // the (vast majority of) candidates that miss
      .withColumn("dist", levenshtein(col("a.key"), col("b.key"), k))
      .filter(col("dist") >= 0 && col("dist") <= k)
      .select(col("a.id").as("doc_a"), col("b.id").as("doc_b"),
        col("dist").cast("long").as("dist"))
  }

  /** CAPTURE–RECAPTURE corpus-size estimate (Chapman '51) — "how big is
    * the population our two collection passes are both sampling": treat
    * the two sides (two crawls, two vendors, two time windows) as
    * capture samples keyed by exact text digest; the overlap rate
    * estimates total coverage exactly like tagged fish. n̂ = (n_a+1)·
    * (n_b+1)/(m+1) − 1, the bias-corrected estimator (defined even at
    * m = 0). The dedup-family companion to [[minhashIndex]]: dedup asks
    * "what did we collect twice", this asks "how much did we never
    * collect at all" — the number a coverage-driven crawl budget needs.
    * Emits one row `(n_a, n_b, n_overlap, chapman_est)`.
    *
    * Exactness: side membership reduces per digest to two MAX flags;
    * the three counts are exact; the estimate is ONE division of exact
    * integers then one subtraction — engine-stable.
    *
    * Scale shape: text hashes to a 128-bit digest at the scan ([[
    * exactDups]]' discipline — text never shuffles); one map-side-
    * combined digest aggregate, then a 1-row global count. At 100 TB
    * this is the cheapest estimator that exists: strictly less work
    * than the exact dedup already being run.
    */
  def captureRecapture(docs: DataFrame, sideACol: Column): DataFrame = {
    OpContract.requireCols(docs, "DedupOps.captureRecapture", "text")
    val k = docs.select(md5(col("text")).as("dg"),
        when(sideACol, 1L).otherwise(0L).as("a"),
        when(sideACol, 0L).otherwise(1L).as("b"))
      .groupBy("dg")
      .agg(max(col("a")).as("a"), max(col("b")).as("b"))
    k.agg(sum(col("a")).as("n_a"), sum(col("b")).as("n_b"),
        sum(col("a") * col("b")).as("n_overlap"))
      .select(col("n_a"), col("n_b"), col("n_overlap"),
        (((col("n_a") + 1) * (col("n_b") + 1)).cast("double") /
          (col("n_overlap") + 1).cast("double") - lit(1.0))
          .as("chapman_est"))
  }
  /** CROSS-SOURCE VOCABULARY OVERLAP — the pairwise token-Jaccard
    * matrix between corpus slices ("how much does the web slice share
    * with the books slice"), the mixture-design diagnostic next to
    * [[graft.operators.AuditOps.independenceReport]]'s one-number
    * dependence verdict: per group, the DISTINCT token set of its
    * documents (the house single-space tokenizer); per ordered pair
    * (a < b), `jaccard = |A∩B| / (|A|+|B|−|A∩B|)` — one division of
    * exact integers. Pairs that share nothing still emit their zero row
    * (the matrix is complete by construction). Emits
    * `(src_a, src_b, n_a, n_b, intersection, jaccard)`.
    *
    * Scale shape: one (group, token) DISTINCT reduction — the shuffle
    * carries each (group, token) pair once, and the result is
    * vocabulary-sized per group, orders of magnitude under the corpus;
    * the pair join runs over token-keyed postings (each token
    * contributes its ≤\|groups\|² group pairs), and the output is the
    * ≤\|groups\|² matrix. At extreme vocabularies hash the token to 8
    * bytes pre-shuffle (the [[minhashIndex]] discipline) — kept as raw
    * strings here so the oracle is exact, not collision-modulo.
    */
  def sourceOverlap(docs: DataFrame, groupCol: String = "source"): DataFrame = {
    val d = OpContract.requireCols(docs, "DedupOps.sourceOverlap",
      groupCol, "text")
    val toks = d.filter(col(groupCol).isNotNull && col("text").isNotNull)
      .select(col(groupCol).cast("string").as("g"),
        explode(split(col("text"), " ")).as("tok"))
      .distinct()
      .localCheckpoint(false)
    val sizes = toks.groupBy("g").agg(count(lit(1)).as("n"))
    val inter = toks.as("x").join(toks.as("y"),
        col("x.tok") === col("y.tok") && col("x.g") < col("y.g"))
      .groupBy(col("x.g").as("src_a"), col("y.g").as("src_b"))
      .agg(count(lit(1)).as("intersection"))
    val pairs = sizes.as("a").join(sizes.as("b"),
        col("a.g") < col("b.g"))
      .select(col("a.g").as("src_a"), col("b.g").as("src_b"),
        col("a.n").as("n_a"), col("b.n").as("n_b"))
    pairs.join(inter, Seq("src_a", "src_b"), "left")
      .select(col("src_a"), col("src_b"), col("n_a"), col("n_b"),
        coalesce(col("intersection"), lit(0L)).as("intersection"),
        (coalesce(col("intersection"), lit(0L)).cast("double") /
          (col("n_a") + col("n_b") - coalesce(col("intersection"), lit(0L)))
            .cast("double")).as("jaccard"))
      .orderBy("src_a", "src_b")
  }
}
