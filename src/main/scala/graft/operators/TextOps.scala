package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators as DataFrame→DataFrame functions — the public
  * library surface (same pattern as [[graft.streaming.StreamOps]]: the gate
  * queries in [[TextQueries]] are thin bindings of these to the test
  * tables, and a user points them at their own corpus).
  *
  * Input contract: a documents DataFrame with `doc_id BIGINT`,
  * `lang STRING`, `text STRING` (single-space tokenized), `n_chars INT`.
  * Ops that explode per-word/per-shingle repartition to the session's
  * default parallelism first — a corpus read from a handful of files would
  * otherwise run its heaviest projection on a handful of cores (the
  * small-file parallelism trap).
  *
  * Cross-engine discipline (what keeps these DuckDB-oracle-checkable):
  * ratios are exact-integer sums divided once at the end, never averaged
  * doubles; word splitting is a plain single-space split identical to
  * DuckDB's string_split.
  */
object TextOps {

  private[operators] def words: Column = split(col("text"), " ")
  private[operators] val stop = Seq("the", "a", "of", "and", "to", "in")
  private def stopCount(w: Column): Column =
    size(filter(w, x => x.isin(stop.map(lit(_)): _*)))

  // Marker vocabularies for the language-ID heuristic (argmax of hit counts;
  // ties resolved in fixed en>de>es>fr order both engines).
  private[operators] val markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and"),
    "de" -> Seq("der", "die", "das", "und"),
    "es" -> Seq("el", "los", "las", "y"),
    "fr" -> Seq("le", "les", "et", "ou"))

  private def spread(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)

  private def positionalShingles(n: Int = 3): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(
      graft.functions.WordShingles(Bridge.expression(col("text")), n, distinct = false))
  }

  /** Corpus token statistics per language: whitespace tokens, BPE-ish regex
    * tokens, distinct-token ratio. One scan, one small hash agg.
    */
  def tokenStats(docs: DataFrame): DataFrame =
    OpContract.requireCols(docs, "TextOps.tokenStats", "lang", "n_chars", "text")
      .select(col("lang"), col("n_chars"),
        size(words).as("ws_tokens"),
        // count of maximal [a-z0-9]+ runs == count of non-empty tokens
        // when splitting on [^a-z0-9]+ (the oracle's formulation), with
        // no interpreted filter lambda and no token-array materialization
        regexp_count(col("text"), lit("[a-z0-9]+")).cast("int").as("re_tokens"),
        size(array_distinct(words)).as("uniq_tokens"))
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        (sum(col("ws_tokens")).cast("double") / count(lit(1))).as("avg_tokens"),
        (sum(col("n_chars")).cast("double") / count(lit(1))).as("avg_chars"),
        sum(col("re_tokens")).as("total_re_tokens"),
        (sum(col("uniq_tokens")).cast("double") / sum(col("ws_tokens"))).as("distinct_ratio"))
      .orderBy("lang")

  /** PER-SOURCE DATA CARD — the audit row a corpus release publishes per
    * source/domain (and the first thing a pipeline owner asks for when a
    * source misbehaves): volume (docs, tokens), exact-duplicate pressure
    * (distinct text digests vs rows → dup_rate), language spread, and
    * length extremes. One aggregation pass; duplicate detection goes
    * through a 128-bit text digest so the distinct never ships document
    * text — the [[DedupOps]] discipline (at 100 TB the digest distinct
    * shuffles 16-byte hashes; the second distinct aggregate on `lang`
    * expands rows ×2, the standard multi-distinct plan).
    *
    * FP discipline: every emitted ratio is ONE division of exact
    * integers — bit-identical cross-engine.
    */
  def corpusReport(docs: DataFrame): DataFrame = {
    val d = spread(OpContract.requireCols(docs, "TextOps.corpusReport",
      "doc_id", "source", "lang", "n_chars", "text"))
    d.select(col("source"), col("lang"), col("n_chars"),
        size(words).cast("long").as("tok"), md5(col("text")).as("digest"))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("digest")).as("n_unique"),
        sum(col("tok")).as("n_tokens"),
        countDistinct(col("lang")).as("n_langs"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"))
      .withColumn("dup_rate",
        (col("n_docs") - col("n_unique")).cast("double") / col("n_docs").cast("double"))
      .withColumn("avg_tokens",
        col("n_tokens").cast("double") / col("n_docs").cast("double"))
      .select("source", "n_docs", "n_unique", "dup_rate", "n_tokens",
        "avg_tokens", "n_langs", "min_chars", "max_chars")
      .orderBy("source")
  }

  /** Per-document quality scoring: type-token ratio, stopword ratio, word
    * length — combined into one deterministic score. Pure projection (no
    * shuffle at all).
    */
  def quality(docs: DataFrame): DataFrame =
    OpContract.requireCols(docs, "TextOps.quality", "doc_id", "text")
      .select(col("doc_id"),
        size(words).as("n_tokens"),
        (size(array_distinct(words)).cast("double") / size(words)).as("ttr"),
        (stopCount(words).cast("double") / size(words)).as("stop_ratio"),
        (length(regexp_replace(col("text"), " ", "")).cast("double") / size(words))
          .as("avg_word_len"))
      .withColumn("quality_score",
        col("ttr") * 0.5 + col("stop_ratio") * 0.2 +
          when(col("n_tokens") >= 30 && col("n_tokens") <= 120, 0.3).otherwise(0.0))

  /** Gopher-style rule filter report (Rae et al. 2021 §A1.1 "quality
    * filtering heuristics", re-expressed over this corpus's single-space
    * tokenization): per document, one boolean per rule plus the combined
    * verdict — the rule-based pre-filter every web-scale training corpus
    * runs BEFORE model-based scoring ([[scoreLinear]] is the model side).
    *
    *  - `r_word_count`: token count within [minWords, maxWords]
    *  - `r_mean_len`:   mean word length within [3, 10] characters
    *  - `r_stop`:       ≥ 2 DISTINCT stop words present (the "contains
    *                    required English function words" rule)
    *  - `r_unique`:     distinct-token fraction ≥ 50% (the duplicate-
    *                    line/paragraph guard at word granularity)
    *
    * Plan: pure per-row projection — no shuffle, no explode; the word
    * array is built once per rule family by codegen'd `size`/`filter`.
    * FP discipline: ZERO floating point — every ratio rule is the exact
    * integer cross-multiplication (3·n ≤ chars ≤ 10·n, 2·distinct ≥ n),
    * so both engines compare the same integers.
    */
  def gopherRules(docs: DataFrame, minWords: Int = 50,
      maxWords: Int = 100000): DataFrame = {
    val d = OpContract.requireCols(docs, "TextOps.gopherRules", "doc_id", "text")
    val n = size(words).cast("long")
    val chars = length(regexp_replace(col("text"), " ", "")).cast("long")
    // distinct-stopword presence as Σ array_contains over the 6-word stop
    // list — fully codegen'd, vs the interpreted higher-order
    // filter(words, …) lambda (the langId-documented HOF trap)
    val nStop = stop.map(s => array_contains(words, s).cast("long"))
      .reduce(_ + _)
    val nUniq = size(array_distinct(words)).cast("long")
    d.select(col("doc_id"), n.as("n_words"),
        (n >= minWords && n <= maxWords).as("r_word_count"),
        (chars >= lit(3L) * n && chars <= lit(10L) * n).as("r_mean_len"),
        (nStop >= 2L).as("r_stop"),
        (lit(2L) * nUniq >= n).as("r_unique"))
      .withColumn("pass",
        col("r_word_count") && col("r_mean_len") && col("r_stop") && col("r_unique"))
  }

  /** Language-ID heuristic: marker-word hit counts, argmax with fixed tie
    * order; output is the label×prediction confusion matrix.
    * Plan: ONE word explode + four codegen'd conditional sums per doc —
    * a `size(filter(split(...)))` form would split the text four times and
    * run the marker test as an interpreted per-element lambda (the repo's
    * documented ~40× higher-order-function trap). The per-doc aggregate
    * partially combines map-side, so the shuffle carries ~one row per
    * document, not the exploded words.
    */
  def langId(docs: DataFrame): DataFrame = {
    val hitCols = markers.map { case (l, ms) =>
      sum(when(col("word").isin(ms.map(lit(_)): _*), 1).otherwise(0)).as(s"c_$l")
    }
    // explode(split) emits >= 1 row per doc (split("") is [""]) — but
    // split(NULL) is NULL and explode would DROP the document, while the
    // oracle's CASE over NULL counts falls through to 'fr' and keeps it;
    // coalescing text to '' plus an explicit null flag preserves parity
    // on corpora with NULL text (all-NULL marker counts -> 'fr')
    val counts = spread(docs)
      .select(col("doc_id"), col("lang"), col("text").isNull.as("tnull"),
        explode(split(coalesce(col("text"), lit("")), " ")).as("word"))
      .groupBy("doc_id", "lang", "tnull")
      .agg(hitCols.head, hitCols.tail: _*)
    val predicted =
      when(col("tnull"), "fr") // matches the oracle's NULL-falls-to-ELSE
        .when(col("c_en") >= greatest(col("c_de"), col("c_es"), col("c_fr")), "en")
        .when(col("c_de") >= greatest(col("c_es"), col("c_fr")), "de")
        .when(col("c_es") >= col("c_fr"), "es")
        .otherwise("fr")
    counts
      .select(col("lang"), predicted.as("predicted"))
      .groupBy("lang", "predicted")
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("lang", "predicted")
  }

  /** Per-document language predictions — [[langId]]'s per-doc stage
    * exposed for evaluation composition ([[graft.operators.AuditOps
    * .classificationReport]] consumes `(lang, predicted)` pairs). Same
    * marker-count argmax, same NULL-text convention.
    */
  def langPredictions(docs: DataFrame): DataFrame = {
    val hitCols = markers.map { case (l, ms) =>
      sum(when(col("word").isin(ms.map(lit(_)): _*), 1).otherwise(0)).as(s"c_$l")
    }
    val counts = spread(docs)
      .select(col("doc_id"), col("lang"), col("text").isNull.as("tnull"),
        explode(split(coalesce(col("text"), lit("")), " ")).as("word"))
      .groupBy("doc_id", "lang", "tnull")
      .agg(hitCols.head, hitCols.tail: _*)
    val predicted =
      when(col("tnull"), "fr")
        .when(col("c_en") >= greatest(col("c_de"), col("c_es"), col("c_fr")), "en")
        .when(col("c_de") >= greatest(col("c_es"), col("c_fr")), "de")
        .when(col("c_es") >= col("c_fr"), "es")
        .otherwise("fr")
    counts.select(col("doc_id"), col("lang"), predicted.as("predicted"))
  }

  /** Winnowing fingerprints (Schleimer/Wilkerson/Aiken, the MOSS
    * algorithm): positional 3-gram hashes → minimum per sliding window of
    * 8 → the distinct minima are the document's fingerprint set. Guarantees
    * any shared run ≥ 10 words produces a shared fingerprint. Output:
    * corpus summary of per-doc fingerprint counts. Shuffles by doc_id by
    * nature (winnowing needs positional windows), but the shingle
    * generation is the native positional WordShingles expression, so the
    * per-row work stays codegen'd.
    */
  def winnow(docs: DataFrame): DataFrame = {
    OpContract.requireCols(docs, "TextOps.winnow", "doc_id", "text")
    import graft.functions.CrossHash
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(Window.currentRow, 7)
    val fps = docs
      .filter(size(words) >= 3)
      .select(col("doc_id"), posexplode(positionalShingles()).as(Seq("pos", "shingle")))
      .withColumn("h", CrossHash.mdint(col("shingle")))
      .withColumn("winmin", min(col("h")).over(w))
      .select(col("doc_id"), col("winmin")).distinct()
    fps.groupBy("doc_id").agg(count(lit(1)).as("n_fingerprints"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_fingerprints")).as("total_fps"),
        min(col("n_fingerprints")).as("min_fps"),
        max(col("n_fingerprints")).as("max_fps"))
  }

  /** Winnowing PAIR detection (the MOSS pair stage, Schleimer et al.
    * SIGMOD'03): documents sharing ≥ `minShared` winnowed fingerprints —
    * SUBSTRING-level copy detection. The document-granularity ops
    * (Jaccard/MinHash/SimHash) score whole shingle SETS, so a paragraph
    * copied into an otherwise-different document scores near zero there;
    * winnowing guarantees any shared run ≥ window+n−1 words leaves at
    * least one common fingerprint, and `shared` counts those runs'
    * selected hashes.
    *
    * Shape: per-doc fingerprints (the [[winnow]] window pass) → inverted
    * index on (lang, fingerprint) → co-occurrence counts per pair — work
    * ∝ fingerprint co-occurrences, never |docs|². The ≥ `minShared` gate
    * is exact integer; `overlap` = shared / min(|fp_a|, |fp_b|) is one
    * correctly-rounded division of exact integers.
    */
  def winnowPairs(docs: DataFrame, minShared: Int = 3): DataFrame = {
    OpContract.requireCols(docs, "TextOps.winnowPairs", "doc_id", "lang", "text")
    import graft.functions.CrossHash
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(Window.currentRow, 7)
    val fps = docs
      .filter(size(words) >= 3)
      .select(col("doc_id"), col("lang"),
        posexplode(positionalShingles()).as(Seq("pos", "shingle")))
      .withColumn("h", CrossHash.mdint(col("shingle")))
      .withColumn("winmin", min(col("h")).over(w))
      .select(col("doc_id"), col("lang"), col("winmin")).distinct()
    val counts = fps.groupBy("doc_id").agg(count(lit(1)).as("nfp"))
    val a = fps.select(col("lang"), col("winmin"),
      col("doc_id").as("doc_a"))
    val b = fps.select(col("lang").as("l2"), col("winmin").as("wm2"),
      col("doc_id").as("doc_b"))
    a.join(b, col("lang") === col("l2") && col("winmin") === col("wm2") &&
        col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
      .join(counts.select(col("doc_id").as("doc_a"), col("nfp").as("fp_a")), "doc_a")
      .join(counts.select(col("doc_id").as("doc_b"), col("nfp").as("fp_b")), "doc_b")
      .select(col("doc_a"), col("doc_b"), col("shared"), col("fp_a"), col("fp_b"),
        (col("shared").cast("double") / least(col("fp_a"), col("fp_b"))).as("overlap"))
  }

  /** C4-style boilerplate-chunk removal (Raffel et al. 2020 §2.2 dedup
    * rule, re-expressed over fixed word windows): split every document
    * into consecutive `chunkWords`-word chunks, drop every occurrence of
    * any chunk that appears in ≥ 2 DISTINCT documents (shared
    * boilerplate), and reassemble the surviving text. Output pins the
    * cleaned corpus byte-for-byte via (md5, length) per doc — the
    * tx_pii_redact discipline.
    *
    * Scale shape: chunking is pure array functions (sequence → transform →
    * slice) inside codegen — no explode until the chunk rows are needed;
    * the duplicate-detection shuffle carries an 8-byte chunk hash, never
    * chunk text; the only shuffle that moves text is the per-doc rebuild
    * (unavoidable — reassembly is a grouping by doc). The dup-hash table
    * is the boilerplate subset (small in real corpora) — AQE broadcasts
    * the flag join when it fits. There is deliberately NO broadcast hint
    * on that join: the planner sizes the dup side from stats, so the
    * broadcast is opportunistic, not forced. On a pathological corpus
    * where most chunks are duplicated (dup set ≈ chunk vocabulary, too
    * big for the driver) pass `broadcastDup = false` — the flag join is
    * then pinned to a shuffle join whose rows are the 8-byte hash + a
    * boolean, never text, so the fallback regime is scan-bound rather
    * than driver-bound (PlanSpec pins both regimes and their equality).
    */
  def chunkDedup(docs: DataFrame, chunkWords: Int = 2,
      broadcastDup: Boolean = true): DataFrame = {
    require(chunkWords >= 1, s"chunkDedup needs chunkWords >= 1, got $chunkWords")
    OpContract.requireCols(docs, "TextOps.chunkDedup", "doc_id", "text")
    import graft.functions.CrossHash
    val nChunks = ceil(size(words).cast("double") / chunkWords).cast("bigint")
    val chunks = spread(docs)
      .filter(size(words) >= 1)
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0L), nChunks - 1), i =>
          array_join(slice(words, (i * chunkWords + 1).cast("int"), lit(chunkWords)), " ")))
          .as(Seq("idx", "chunk")))
    val hashed = chunks.withColumn("h", CrossHash.mdint(col("chunk")))
    val dup = hashed.groupBy("h")
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= 2)
      .select(col("h"), lit(true).as("dup"))
    val dupSide = if (broadcastDup) dup else dup.hint("shuffle_merge")
    val flagged = hashed.join(dupSide, Seq("h"), "left")
      .withColumn("dup", coalesce(col("dup"), lit(false)))
    flagged.groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_chunks"),
        sum(when(col("dup"), 1L).otherwise(0L)).as("n_removed"),
        array_join(
          transform(
            array_sort(collect_list(
              when(!col("dup"), struct(col("idx").as("i"), col("chunk").as("c"))))),
            s => s.getField("c")),
          " ").as("clean_text"))
      .select(col("doc_id"), col("n_chunks"), col("n_removed"),
        md5(col("clean_text")).as("digest"),
        length(col("clean_text")).cast("long").as("n_clean_chars"))
  }

  /** CONTENT-DEFINED chunking (the LBFS/FastCDC boundary scheme,
    * Muthitacharoen et al. SOSP'01, over tokens instead of bytes): a
    * chunk boundary falls AFTER token i whenever the hash of the
    * `window`-token context ending at i has its low `maskBits` bits zero
    * — so boundaries are a function of LOCAL content only, and an
    * insertion near the head of a document shifts every downstream chunk
    * of [[chunkDedup]]'s fixed grid but re-synchronizes here after one
    * window. This is the chunking that makes cross-version dedup of
    * edited documents work (expected chunk length 2^maskBits tokens).
    * Emits one row per chunk: `(doc_id, idx, n_tokens_chunk, chunk)` —
    * compose with the [[chunkDedup]] hash-count stage for the dedup
    * apply, or feed the chunk table to incremental ingest diffing.
    *
    * Implementation is pure codegen'd array functions — boundary
    * positions via `filter(sequence)` over window hashes
    * ([[graft.functions.CrossHash.mdint]], the SQL-mirrorable 60-bit md5
    * family), chunk slices via `transform` over adjacent boundary pairs;
    * NO explode until the final per-chunk rows, no shuffle at all (the
    * chunker is a projection). A window hash per position costs
    * O(window) — constant; the true rolling-hash optimization changes
    * the constant, not the shape, and would cost SQL-oracle parity.
    *
    * Determinism: boundaries and slices are exact integer/string ops;
    * the 60-bit hash is the cross-engine [[graft.functions.CrossHash]]
    * family — every value (including chunk text) is oracle-comparable.
    */
  def cdcChunks(docs: DataFrame, window: Int = 3, maskBits: Int = 6): DataFrame = {
    require(window >= 1, s"cdcChunks needs window >= 1, got $window")
    require(maskBits >= 1 && maskBits <= 30,
      s"cdcChunks needs maskBits in [1,30], got $maskBits")
    OpContract.requireCols(docs, "TextOps.cdcChunks", "doc_id", "text")
    import graft.functions.CrossHash
    val mask = (1L << maskBits) - 1
    val toks = words
    val n = size(toks).cast("bigint")
    // boundary AFTER token i (1-based, i >= window): low maskBits of the
    // window hash are zero. The document end is always a boundary. Docs
    // shorter than the window have no interior boundary candidates and
    // yield one whole-doc chunk — guarded explicitly because Spark's
    // sequence(window, n) DESCENDS when n < window (it would emit i <
    // window, driving slice() starts to zero or negative), while the
    // oracle's range(window, n+1) is simply empty there.
    val bpos = when(n >= window,
      filter(sequence(lit(window.toLong), n), i =>
        CrossHash.mdint(array_join(
          slice(toks, (i - (window - 1)).cast("int"), lit(window)), " "))
          .bitwiseAND(lit(mask)) === 0L))
      .otherwise(array().cast("array<bigint>"))
    val withEdges = spread(docs).filter(size(toks) >= 1)
      .withColumn("edges", array_distinct(concat(
        array(lit(0L)), bpos, array(n))))
    withEdges.select(col("doc_id"),
        posexplode(transform(sequence(lit(1), size(col("edges")) - 1), j =>
          struct(
            (element_at(col("edges"), j + 1) -
              element_at(col("edges"), j)).as("len"),
            array_join(slice(toks,
              (element_at(col("edges"), j) + 1).cast("int"),
              (element_at(col("edges"), j + 1) -
                element_at(col("edges"), j)).cast("int")), " ").as("c"))))
          .as(Seq("idx", "ch")))
      .select(col("doc_id"), col("idx").cast("long").as("idx"),
        col("ch.len").as("n_tokens_chunk"), col("ch.c").as("chunk"))
  }

  /** The CDC dedup APPLY step: [[cdcChunks]] boundaries + the
    * [[chunkDedup]] removal rule (drop any chunk appearing in ≥ 2
    * distinct documents) + per-doc reassembly. Same output contract as
    * [[chunkDedup]] — `(doc_id, n_chunks, n_removed, digest,
    * n_clean_chars)` — so the two chunking disciplines are directly
    * comparable on one corpus: the fixed grid catches aligned
    * boilerplate, CDC also catches boilerplate SHIFTED by edits
    * (insertions/deletions upstream of the copy), which the grid misses
    * once the alignment breaks.
    *
    * Scale shape: the chunker is a shuffle-free projection
    * ([[cdcChunks]]); the dup-detection shuffle carries the 8-byte chunk
    * hash; only the per-doc rebuild groups text (unavoidable — the
    * chunkDedup argument verbatim). The dup-flag join is opportunistic
    * broadcast with the same `broadcastDup = false` escape.
    */
  def cdcChunkDedup(docs: DataFrame, window: Int = 3, maskBits: Int = 6,
      broadcastDup: Boolean = true): DataFrame = {
    import graft.functions.CrossHash
    val chunks = cdcChunks(docs, window, maskBits)
    val hashed = chunks.withColumn("h", CrossHash.mdint(col("chunk")))
    val dup = hashed.groupBy("h")
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= 2)
      .select(col("h"), lit(true).as("dup"))
    val dupSide = if (broadcastDup) dup else dup.hint("shuffle_merge")
    val flagged = hashed.join(dupSide, Seq("h"), "left")
      .withColumn("dup", coalesce(col("dup"), lit(false)))
    flagged.groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_chunks"),
        sum(when(col("dup"), 1L).otherwise(0L)).as("n_removed"),
        array_join(
          transform(
            array_sort(collect_list(
              when(!col("dup"), struct(col("idx").as("i"), col("chunk").as("c"))))),
            s => s.getField("c")),
          " ").as("clean_text"))
      .select(col("doc_id"), col("n_chunks"), col("n_removed"),
        md5(col("clean_text")).as("digest"),
        length(col("clean_text")).cast("long").as("n_clean_chars"))
  }

  /** MATTR — moving-average type-token ratio (Covington & McFall 2010),
    * the length-independent lexical-diversity score: plain TTR
    * (types/tokens) shrinks mechanically as documents grow, so it can't
    * rank a tweet against a chapter; MATTR instead averages the TTR of
    * every `w`-token sliding window, making "how varied is the
    * vocabulary" comparable across lengths — the diversity axis of the
    * quality panel next to [[repetition]] (verbatim copying) and
    * [[tokenEntropy]] (distributional skew). Documents shorter than `w`
    * fall back to plain TTR over one whole-document window (the paper's
    * convention). Emits `(doc_id, n_tokens, n_windows, mattr)`.
    *
    * FP discipline: every per-window distinct count is an exact integer,
    * so mattr = Σdistinct / (n_windows·w) is ONE correctly-rounded
    * division of exact integers (the mean of per-window ratios with a
    * COMMON denominator folds into a single fraction — no per-window FP).
    *
    * Scale shape (r15): Σ over window starts of the window's distinct
    * count is computed in CLOSED FORM per token occurrence — an
    * occurrence at position p is the first occurrence of its token (and
    * therefore the one counted) in exactly the windows starting at
    * s ∈ [max(0, p−w+1, prev_p+1), min(p, n−w)], where prev_p is the
    * token's previous position in the doc (−1 if none). One lag() over
    * (doc_id, token) plus exact integer arithmetic replaces the r14
    * O(tokens×w) sliding collect_set of token STRINGS (an
    * ObjectWindowFunction holding w strings per row) — same dcount sum,
    * bit-identical mattr, per-row O(1) codegen expressions.
    */
  def mattr(docs: DataFrame, w: Int = 20): DataFrame = {
    OpContract.requireCols(docs, "TextOps.mattr", "doc_id", "text")
    require(w >= 2 && w <= 1000, s"TextOps.mattr: 2 <= w <= 1000, got $w")
    val base = docs.select(col("doc_id"), split(col("text"), " ").as("toks"))
      .withColumn("n", size(col("toks")).cast("long"))
    val short = base.filter(col("n") < w)
      .select(col("doc_id"), col("n").as("n_tokens"), lit(1L).as("n_windows"),
        (size(array_distinct(col("toks"))).cast("double") /
          col("n").cast("double")).as("mattr"))
    val ow = Window.partitionBy(col("doc_id"), col("tok")).orderBy(col("pos"))
    val slid = base.filter(col("n") >= w)
      .select(col("doc_id"), col("n"),
        posexplode(col("toks")).as(Seq("pos", "tok")))
      .withColumn("p", col("pos").cast("long"))
      .withColumn("prev", coalesce(lag(col("p"), 1).over(ow), lit(-1L)))
      .withColumn("contrib",
        greatest(
          least(col("p"), col("n") - w) -
            greatest(col("p") - (w - 1), col("prev") + 1L, lit(0L)) + 1L,
          lit(0L)))
      .groupBy("doc_id")
      .agg(max(col("n")).as("n_tokens"),
        (max(col("n")) - (w - 1)).as("n_windows"),
        sum(col("contrib")).as("sd"))
      .select(col("doc_id"), col("n_tokens"), col("n_windows"),
        (col("sd").cast("double") /
          (col("n_windows") * w).cast("double")).as("mattr"))
    short.unionByName(slid)
  }

  /** Repetition filter (the Gopher-style quality signal): fraction of
    * positional 3-grams that are duplicates within the document —
    * boilerplate/spam detection in every large-scale corpus pipeline.
    * One native-shingle explode, per-doc exact integer counts (total vs
    * distinct via a two-level aggregate — no countDistinct, so no Expand),
    * per-language summary with a single division at the end; the 0.2 flag
    * threshold compares identically cross-engine because each ratio is ONE
    * correctly-rounded division of exact integers.
    */
  def repetition(docs: DataFrame): DataFrame = {
    val perShingle = spread(OpContract.requireCols(docs,
        "TextOps.repetition", "doc_id", "lang", "text"))
      .filter(size(words) >= 3)
      .select(col("doc_id"), col("lang"), explode(positionalShingles()).as("shingle"))
      .groupBy("doc_id", "lang", "shingle")
      .agg(count(lit(1)).as("cnt"))
    val perDoc = perShingle.groupBy("doc_id", "lang")
      .agg(sum(col("cnt")).as("total"), count(lit(1)).as("uniq"))
    perDoc.groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("total")).as("total_shingles"),
        sum(col("total") - col("uniq")).as("dup_shingles"),
        (sum(col("total") - col("uniq")).cast("double") / sum(col("total")))
          .as("dup_ratio"),
        sum(when((col("total") - col("uniq")).cast("double") / col("total") >= 0.2, 1)
          .otherwise(0)).as("n_flagged"))
      .orderBy("lang")
  }

  /** Stratified sampling (class rebalancing): sampleBy with per-class
    * fractions. Sampler randomness is engine-specific — validate with
    * per-class tolerances, not value oracles.
    */
  /** Per-language top-k terms by DOCUMENT frequency (number of docs
    * containing the term, not raw occurrences — the dedup-robust corpus
    * statistic). distinct (lang, doc, term) then count: two exchanges on
    * small post-distinct data; at 100 TB the distinct's map-side combine on
    * (doc, term) does the heavy lifting since in-document repeats collapse
    * locally before the shuffle.
    */
  def topTerms(docs: DataFrame, k: Int = 10): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("df").desc, col("term"))
    spread(OpContract.requireCols(docs, "TextOps.topTerms", "lang", "doc_id", "text"))
      .select(col("lang"), col("doc_id"), explode(words).as("term"))
      .distinct()
      .groupBy("lang", "term").agg(count(lit(1)).as("df"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("lang", "rank", "term", "df")
      .orderBy("lang", "rank")
  }

  /** Per-group document cap — the "at most N pages per domain" crawl
    * rule (and the generic best-N-per-key selector): keep the top `n`
    * rows of each group by `ord` DESCENDING with the deterministic
    * doc_id tie-break. One key shuffle + a per-group rank window; groups
    * rank independently in parallel, so work per task is bounded by
    * group size. Under pathological group skew (one domain holding a
    * large fraction of the corpus) identify the hot groups first with
    * [[SketchOps.cmsHeavyHitters]] and cap them via the orderBy+limit
    * (TakeOrderedAndProject) shape per hot group — the
    * `cmsTopKEstimates` lesson applied per key.
    */
  def capPerGroup(docs: DataFrame, groupCol: String, ord: Column,
      n: Int): DataFrame = {
    require(n >= 1, s"capPerGroup needs n >= 1, got $n")
    OpContract.requireCols(docs, "TextOps.capPerGroup", "doc_id", groupCol)
    val w = Window.partitionBy(col(groupCol)).orderBy(ord.desc, col("doc_id"))
    docs.withColumn("grp_rank", row_number().over(w))
      .filter(col("grp_rank") <= n)
      .drop("grp_rank")
  }

  def stratifiedSample(docs: DataFrame, fractions: Map[String, Double], seed: Long): DataFrame =
    OpContract.requireCols(docs, "TextOps.stratifiedSample", "lang").stat.sampleBy("lang", fractions, seed)
      .groupBy("lang").agg(count(lit(1)).as("n_sampled"))
      .orderBy("lang")

  /** DETERMINISTIC stratified sampler: membership is a pure function of
    * (doc_id, lang) — doc kept iff hash(doc_id)/2^60 < fraction(lang) —
    * so the sample is stable across runs, partitionings and engines
    * (fully value-oracled, unlike [[stratifiedSample]]'s engine-specific
    * sampler RNG). This is the sampler a reproducible 100 TB pipeline
    * wants: re-running anywhere selects the same documents, and the
    * sample composes with splits/dedup keyed off the same ids. The
    * hash→double cast and the division by 2^60 are one rounding + one
    * exact scale, identical cross-engine; languages absent from
    * `fractions` are dropped (fraction 0).
    */
  def stratifiedSampleHash(docs: DataFrame, fractions: Map[String, Double]): DataFrame = {
    OpContract.requireCols(docs, "TextOps.stratifiedSampleHash", "doc_id", "lang")
    val u = graft.functions.CrossHash.mdint(concat(lit("strat:"), col("doc_id")))
      .cast("double") / lit(1152921504606846976.0) // 2^60
    val fracCol = fractions.toSeq.sortBy(_._1)
      .foldLeft(when(lit(false), lit(0.0))) { case (acc, (l, f)) =>
        acc.when(col("lang") === l, lit(f))
      }.otherwise(lit(0.0))
    docs.filter(u < fracCol)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_sampled"),
        min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"))
      .orderBy("lang")
  }

  /** Deterministic weighted sampling WITHOUT replacement
    * (Efraimidis–Spirakis A-ES): each doc draws u = hash(doc_id)/2^60 and
    * scores key = u^(1/weight); the top-k keys are a weighted sample. Like
    * [[stratifiedSampleHash]], membership is a pure function of the row —
    * reproducible across runs, partitionings and engines, and the top-k
    * reduces distributively (per-partition top-k then merge), never a
    * global shuffle of the corpus.
    *
    * Cross-engine note: `pow` is the one op here the FP discipline can't
    * pin bit-exact (libm last-ulp differences between engines). A 1-ulp
    * key difference flips SELECTION only if two keys straddle the k-th
    * boundary within ~1e-15 — keys on a real corpus are spaced ~1/n near
    * the boundary, so the sampled SET is stable; the keys themselves are
    * deliberately not emitted.
    *
    * A-ES is only defined for positive weights: non-positive-weight rows
    * are filtered out up front (a negative weight would give u^(1/w) ≥ 1
    * and silently outrank every valid document; zero gives pow(u, ∞)).
    */
  def weightedSample(docs: DataFrame, weightCol: String, k: Int): DataFrame = {
    OpContract.requireCols(docs, "TextOps.weightedSample", "doc_id", "lang", weightCol)
    val u = graft.functions.CrossHash.mdint(concat(lit("wsamp:"), col("doc_id")))
      .cast("double") / lit(1152921504606846976.0) // 2^60
    docs.filter(col(weightCol) > 0)
      .select(col("doc_id"), col("lang"), col(weightCol),
        pow(u, lit(1.0) / col(weightCol).cast("double")).as("aes_key"))
      .orderBy(col("aes_key").desc, col("doc_id"))
      .limit(k)
      .select(col("doc_id"), col("lang"), col(weightCol))
      .orderBy("doc_id")
  }

  /** Deterministic train/val/test split — the canonical dataset-prep op.
    * Hash-based assignment (not randomSplit) so membership is a pure
    * function of doc_id: stable across runs, partitionings and engines —
    * at 100 TB you want splits reproducible from the row itself, not from
    * a sampler's partition-local state. Fully oracle-checkable.
    */
  def trainValTest(docs: DataFrame): DataFrame =
    OpContract.requireCols(docs, "TextOps.trainValTest", "doc_id")
      .withColumn("bucket",
        graft.functions.CrossHash.mdint(concat(lit("split:"), col("doc_id"))) % 10)
      .withColumn("split",
        when(col("bucket") <= 7, "train").when(col("bucket") === 8, "val").otherwise("test"))
      .groupBy("split")
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("min_doc"),
        max(col("doc_id")).as("max_doc"))
      .orderBy("split")

  /** Temperature-sampling mix weights per language at α = 0.5 — the
    * multilingual-corpus rebalancing step (upsample rare languages,
    * downsample dominant ones; α = 0.5 is the square-root temperature
    * used by multilingual LM data recipes). Per group:
    * weight = sqrt(N / n_g) (relative sampling rate so group g's expected
    * share ∝ sqrt(p_g)) and eff_docs = n_g·weight = sqrt(N·n_g).
    *
    * α is FIXED at 0.5 because sqrt is an IEEE correctly-rounded
    * operation in every engine — pow(x, α) for general α is a libm call
    * with no cross-engine rounding contract, which would break the value
    * oracle. Both outputs are compositions of exact integer arithmetic
    * and single correctly-rounded ops (÷, √, ×), bit-identical in DuckDB.
    *
    * Scale shape: one count aggregate (map-side combined) over the
    * corpus; everything after runs on the ≤|languages|-row counter table.
    */
  def mixWeights(docs: DataFrame): DataFrame = {
    val counts = OpContract.requireCols(docs, "TextOps.mixWeights", "doc_id", "lang")
      .groupBy("lang").agg(count(lit(1)).as("n_docs"))
    val total = counts.agg(sum(col("n_docs")).as("n_total"))
    counts.crossJoin(total)
      .select(col("lang"), col("n_docs"), col("n_total"),
        sqrt(col("n_total").cast("double") / col("n_docs").cast("double")).as("weight"),
        sqrt((col("n_total") * col("n_docs")).cast("double")).as("eff_docs"))
      .orderBy("lang")
  }

  /** EPOCH-REPETITION PLANNER — the data-budgeting decision [[mixWeights]]
    * explicitly defers ("upsampling beyond 1.0 is an epoch-repetition
    * decision, not a row op"): given a training token budget, split it
    * across languages by the α = 0.5 temperature shares
    * (share_g ∝ √tokens_g) and report how many EPOCHS of each language's
    * available tokens that target implies — `epochs > 1` marks the
    * data-constrained languages that will repeat (the multi-epoch
    * degradation knob a run report must disclose).
    *
    * Output per language: `(lang, avail_tokens, share, target_tokens,
    * epochs, oversampled)`.
    *
    * Cross-engine FP: per-language √tokens is one correctly-rounded IEEE
    * sqrt FIXED at 6 decimals as DECIMAL(18,6) before the share
    * normalizer sums them (exact decimal sum — order-independent, the
    * round-6 cosine discipline); share, target and epochs are short
    * mul/div chains of single correctly-rounded ops in mirrored
    * association (no additions — nothing for FMA contraction to fuse).
    *
    * Scale shape: one map-side-combined token-count aggregate over the
    * corpus; everything after runs on the ≤\|languages\|-row table.
    */
  def mixEpochs(docs: DataFrame, budgetTokens: Long): DataFrame = {
    require(budgetTokens >= 1, s"mixEpochs needs budgetTokens >= 1, got $budgetTokens")
    val dec = org.apache.spark.sql.types.DataTypes.createDecimalType(18, 6)
    val sumDec = org.apache.spark.sql.types.DataTypes.createDecimalType(28, 6)
    val tc = OpContract.requireCols(docs, "TextOps.mixEpochs", "lang", "text")
      .groupBy("lang").agg(sum(size(words)).as("avail_tokens"))
      .withColumn("s6", round(sqrt(col("avail_tokens").cast("double")), 6).cast(dec))
    val tot = tc.agg(sum(col("s6")).cast(sumDec).as("st"))
    val share = col("s6").cast("double") / col("st").cast("double")
    val target = lit(budgetTokens.toDouble) * share
    tc.crossJoin(broadcast(tot))
      .select(col("lang"), col("avail_tokens"),
        share.as("share"),
        target.as("target_tokens"),
        (target / col("avail_tokens").cast("double")).as("epochs"))
      .withColumn("oversampled", col("epochs") > 1.0)
  }

  /** APPLY step for the α=0.5 temperature mixture ([[mixWeights]]):
    * realize the rebalancing by deterministic hash subsampling. Sampling
    * probability ∝ the temperature weight √(N/n_g), normalized so the
    * RAREST language keeps every document: p_g = √(n_min/n_g) — expected
    * kept counts √(n_min·n_g), i.e. per-language shares ∝ √n_g, the α=0.5
    * mixture realized purely by down-sampling (no duplication).
    * Upsampling beyond 1.0 is an epoch-repetition decision, not a row op.
    *
    * Cross-engine FP: p_g is one division of exact integers and one sqrt —
    * both correctly-rounded IEEE ops, so both engines compute the
    * identical double; membership u < p_g uses the exact hash-uniform of
    * [[stratifiedSampleHash]]. Scale shape: one tiny counts aggregate,
    * rates broadcast, membership a pure row function, one summary
    * aggregate — the corpus is scanned once and never shuffled.
    */
  /** Surviving ROWS of the temperature mixture — the row-level apply that
    * [[applyMixture]] summarizes (and what a pipeline actually writes):
    * the input columns plus (n_docs, p_keep) for the row's language.
    */
  def applyMixtureRows(docs: DataFrame): DataFrame = {
    OpContract.requireCols(docs, "TextOps.applyMixture", "doc_id", "lang")
    val counts = docs.groupBy("lang").agg(count(lit(1)).as("n_docs"))
    val rates = counts.crossJoin(counts.agg(min(col("n_docs")).as("n_min")))
      .select(col("lang"), col("n_docs"),
        sqrt(col("n_min").cast("double") / col("n_docs").cast("double")).as("p_keep"))
    val u = graft.functions.CrossHash.mdint(concat(lit("mix:"), col("doc_id")))
      .cast("double") / lit(1152921504606846976.0) // 2^60
    docs.join(broadcast(rates), "lang").filter(u < col("p_keep"))
  }

  def applyMixture(docs: DataFrame): DataFrame =
    applyMixtureRows(docs)
      .groupBy("lang")
      .agg(max(col("n_docs")).as("n_docs"),
        max(col("p_keep")).as("p_keep"),
        count(lit(1)).as("n_kept"),
        min(col("doc_id")).as("min_kept"), max(col("doc_id")).as("max_kept"))
      .orderBy("lang")

  // PII patterns, restricted to the dialect Java regex and RE2 (DuckDB)
  // interpret identically — no lookaround, no backreferences, \b and
  // bounded quantifiers only — so redaction is value-oracle-checkable.
  private[operators] val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private[operators] val ipv4Re  = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  private[operators] val phoneRe = "\\+\\d{7,15}"

  /** PII redaction — the scrub step every public-corpus pipeline runs
    * before training: masks emails, IPv4 addresses and international
    * phone-shaped digit runs. Counts are measured on the ORIGINAL text
    * (so overlapping patterns are each reported); redaction applies
    * email → ip → phone in a fixed order so the output is deterministic.
    * Pure projection — no shuffle, stays inside whole-stage codegen; the
    * compact (md5, length) result keeps 100 TB outputs aggregate-sized
    * while still pinning every redacted byte.
    */
  def redactPii(docs: DataFrame): DataFrame = {
    val red = regexp_replace(
      regexp_replace(
        regexp_replace(col("text"), emailRe, "<EMAIL>"),
        ipv4Re, "<IP>"),
      phoneRe, "<PHONE>")
    OpContract.requireCols(docs, "TextOps.redactPii", "doc_id", "text")
      .select(col("doc_id"),
        regexp_count(col("text"), lit(emailRe)).cast("long").as("n_emails"),
        regexp_count(col("text"), lit(ipv4Re)).cast("long").as("n_ips"),
        regexp_count(col("text"), lit(phoneRe)).cast("long").as("n_phones"),
        length(red).cast("long").as("red_len"),
        md5(red).as("red_md5"))
  }

  /** Benchmark-contamination check (decontamination's measurement half):
    * for each corpus document, the number of distinct word n-grams it
    * shares with a benchmark set. The benchmark side is collapsed to its
    * distinct shingle set and BROADCAST — benchmark suites are tiny next
    * to a training corpus, so the JOIN adds no shuffle; the corpus side
    * pays one spreading repartition (the module's small-file-parallelism
    * guard before the shingle explode) and the per-doc count aggregate
    * combines map-side to ~one row per contaminated doc. Shingling uses
    * the native WordShingles expression (distinct within doc), and the
    * join is on the shingle STRING — exact, no hash-collision caveat.
    */
  def contamination(docs: DataFrame, benchmark: DataFrame, n: Int = 3): DataFrame = {
    import org.apache.spark.sql.graftbridge.Bridge
    def sh(df: DataFrame, name: String) =
      OpContract.requireCols(df, s"TextOps.contamination $name", "doc_id", "text")
        .select(col("doc_id"), Bridge.column(graft.functions.WordShingles(
          Bridge.expression(col("text")), n, distinct = true)).as("shs"))
        .filter(size(col("shs")) >= 1)
    val bench = sh(benchmark, "benchmark")
      .select(explode(col("shs")).as("sh")).distinct()
    spread(sh(docs, "corpus"))
      .select(col("doc_id"), explode(col("shs")).as("sh"))
      .join(broadcast(bench), "sh")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shared"))
  }

  /** Sequence packing (concat-and-chunk, the standard LLM pretraining
    * batch layout): documents are laid head-to-tail in doc_id order
    * within each language shard and cut into fixed-`capacity` token
    * packs; a document crossing a pack boundary is split across packs.
    * Output: one row per (document, pack) span with the token count the
    * document contributes to that pack — exactly what a writer needs to
    * emit packed sequences.
    *
    * Scale shape: the running total is a window partitioned by the shard
    * column (`lang` here) — shards pack independently and in parallel,
    * which is how a 100 TB corpus does it (a single global ordering
    * would serialize the world). All-integer arithmetic end to end, so
    * the result is bit-exact cross-engine.
    */
  def packSequences(docs: DataFrame, capacity: Int): DataFrame = {
    require(capacity >= 1, s"pack capacity must be >= 1, got $capacity")
    val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    OpContract.requireCols(docs, "TextOps.packSequences", "lang", "doc_id", "text")
      .select(col("lang"), col("doc_id"), size(words).cast("long").as("tok"))
      .withColumn("cb", coalesce(sum(col("tok")).over(w), lit(0L)))
      .select(col("lang"), col("doc_id"), col("tok"), col("cb"),
        explode(sequence(
          floor(col("cb") / capacity).cast("long"),
          floor((col("cb") + col("tok") - 1) / capacity).cast("long"))).as("pack_id"))
      .select(col("lang"), col("pack_id"), col("doc_id"),
        (least((col("pack_id") + 1) * capacity, col("cb") + col("tok")) -
          greatest(col("pack_id") * capacity, col("cb"))).as("tokens_in_pack"))
  }

  /** LENGTH-BUCKETED BATCH LAYOUT — the padding-based dynamic-batching
    * assignment (the seq2seq/encoder dataloader counterpart of
    * [[packSequences]]: packing concatenates documents head-to-tail for
    * decoder-only training; bucketing groups SIMILAR-length documents
    * into fixed-count batches so per-batch padding waste is bounded by
    * `padTo`). Each document goes to bucket `ceil(n_tokens/padTo)·padTo`
    * (its padded length — pure integer math, bit-exact cross-engine; no
    * log2/power-of-two float hazard), then to a deterministic
    * `batch_id` of at most `batchSize` documents within its
    * (bucket, shard), ordered by doc_id.
    *
    * Sharding IS the scale design: a single global sequence per bucket
    * would be one unpartitioned window over a corpus-sized partition, so
    * batch numbering is SHARD-LOCAL (`shard` = corpus hash of doc_id mod
    * `nShards`, the same deterministic membership discipline as the
    * samplers) — exactly how a distributed dataloader packs anyway (each
    * worker batches its own shard; padding efficiency is unchanged, only
    * the numbering is shard-local). The rank window runs per
    * (bucket, shard): ONE key shuffle, running-counter state, partitions
    * bounded by corpus/(buckets·nShards) with nShards sized to the
    * cluster. Batch `waste` = padding tokens the batch pays
    * (batch_rows·bucket − Σtok) is emitted per doc alongside so a
    * downstream audit can aggregate it without recomputing the layout.
    */
  def lengthBuckets(docs: DataFrame, padTo: Int = 64, batchSize: Int = 8,
      nShards: Int = 4): DataFrame = {
    require(padTo >= 1 && batchSize >= 1 && nShards >= 1,
      s"lengthBuckets needs positive padTo/batchSize/nShards, got $padTo/$batchSize/$nShards")
    val d = spread(OpContract.requireCols(docs, "TextOps.lengthBuckets", "doc_id", "text"))
    val w = Window.partitionBy(col("bucket"), col("shard")).orderBy(col("doc_id"))
    d.select(col("doc_id"), size(words).cast("long").as("n_tokens"))
      .withColumn("bucket",
        (((col("n_tokens") + (padTo - 1)) / padTo).cast("long")) * padTo)
      .withColumn("shard",
        graft.functions.CrossHash.mdint(col("doc_id").cast("string")) % nShards)
      .withColumn("batch_id", ((row_number().over(w) - 1) / batchSize).cast("long"))
      .withColumn("waste",
        count(lit(1)).over(Window.partitionBy(col("bucket"), col("shard"),
            col("batch_id"))) * col("bucket") -
          sum(col("n_tokens")).over(Window.partitionBy(col("bucket"), col("shard"),
            col("batch_id"))))
  }

  /** Per-document OVERLAPPING token-window chunking — the retrieval /
    * context-window chunker (split every document into windows of `win`
    * whitespace tokens advancing by `win - overlap`, so consecutive
    * chunks share `overlap` tokens of context). Complements
    * [[packSequences]]: packing lays documents head-to-tail into
    * fixed-capacity training rows; chunking splits ONE document into
    * retrieval units that each stand alone.
    *
    * Window count per doc is `ceil((n - win) / stride) + 1` (one clipped
    * tail window rather than a degenerate all-overlap suffix: the last
    * window always contains at least `stride` new tokens unless the doc
    * fits in a single window). All-integer arithmetic, so counts and
    * boundaries are bit-exact cross-engine.
    *
    * Scale shape: pure projection + per-row explode — NO shuffle, no
    * window function; a document's text turns into its chunks inside its
    * own scan partition, which is exactly how a 100 TB corpus chunks in
    * one pass. Output: (doc_id, chunk_id, chunk_text, n_tokens).
    */
  def chunkText(docs: DataFrame, win: Int, overlap: Int): DataFrame = {
    require(win >= 1, s"chunk window must be >= 1, got $win")
    require(overlap >= 0 && overlap < win,
      s"overlap must be in [0, win), got $overlap for win $win")
    val stride = win - overlap
    OpContract.requireCols(docs, "TextOps.chunkText", "doc_id", "text")
      .select(col("doc_id"), words.as("w"))
      .withColumn("n", size(col("w")).cast("long"))
      .withColumn("k", explode(sequence(lit(0L),
        when(col("n") <= win, lit(0L))
          .otherwise(expr(s"(n - $win + $stride - 1) div $stride")))))
      .select(col("doc_id"), col("k").as("chunk_id"),
        array_join(slice(col("w"), (col("k") * stride + 1).cast("int"),
          lit(win)), " ").as("chunk_text"),
        least(lit(win.toLong), col("n") - col("k") * stride).as("n_tokens"))
  }

  /** BPE pair statistics — the first merge step of byte-pair-encoding
    * tokenizer training, at corpus scale: build the word-frequency
    * vocabulary (one explode + count, map-side combined), then count
    * adjacent CHARACTER pairs over the DISTINCT words weighted by word
    * frequency. Extracting pairs from the vocabulary rather than the raw
    * corpus is the real trainer's shape — pair work scales with |vocab|,
    * not corpus size, and the corpus is touched exactly once. Output:
    * top-k pairs by weighted count (the candidates for the first merge).
    */
  def bpePairs(docs: DataFrame, k: Int = 20): DataFrame = {
    val vocab = spread(OpContract.requireCols(docs, "TextOps.bpePairs", "text"))
      .select(explode(words).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
    val w = Window.orderBy(col("total").desc, col("pair"))
    vocab
      // sequence(1, len-1) would run BACKWARDS for 1-char words (Spark
      // sequence auto-steps -1), so guard len >= 2
      .filter(length(col("word")) >= 2)
      .select(col("freq"),
        explode(transform(sequence(lit(1), length(col("word")) - 1),
          i => col("word").substr(i, lit(2)))).as("pair"))
      .groupBy("pair").agg(sum(col("freq")).as("total"))
      // top-k via orderBy+limit (TakeOrdered: per-partition heaps, no
      // global sort) BEFORE the rank window, so the unpartitioned
      // row_number runs over <= k rows — the char-pair table is already
      // bounded by charset², but the knn_rrf/cmsHeavyHitters discipline
      // costs nothing and keeps every rank window input k-bounded
      .orderBy(col("total").desc, col("pair")).limit(k)
      .withColumn("rank", row_number().over(w))
      .select("rank", "pair", "total")
      .orderBy("rank")
  }

  // ---- BPE tokenizer training ------------------------------------------
  //
  // Token streams are encoded as separator-framed strings — every symbol
  // wrapped in U+0001 (absent from any text corpus worth training on;
  // validated absent from the gate corpus), so tokens "a","b","c" become
  // "␁a␁␁b␁␁c␁". TWO separators stand between adjacent symbols, which
  // makes one BPE merge a plain string replace: the pair (l, r) matches
  // "␁l␁␁r␁" → "␁lr␁", adjacent matches never share characters (each
  // boundary owns its own separator), a match can never start mid-symbol
  // (the leading ␁ anchors it), and `replace`'s non-overlapping
  // left-to-right scan IS the greedy left-to-right BPE application — with
  // identical semantics in Spark and DuckDB, so the whole trainer is
  // oracle-checkable with zero floating point.

  private val BpeSep = "\u0001"
  private def bpeEnc0(word: Column): Column =
    regexp_replace(word, "(.)", s"$BpeSep$$1$BpeSep")
  private def bpeToks(enc: Column): Column =
    split(trim(enc, BpeSep), BpeSep + BpeSep)
  private def bpeMergeApply(enc: Column, l: String, r: String): Column =
    call_function("replace", enc,
      lit(s"$BpeSep$l$BpeSep$BpeSep$r$BpeSep"), lit(s"$BpeSep$l$r$BpeSep"))

  /** BPE tokenizer TRAINING (Sennrich et al. 2016), distributed: learn
    * `nMerges` merge rules by repeatedly counting adjacent symbol pairs
    * and merging the most frequent (ties: count desc, then (lhs, rhs)
    * lexicographic — deterministic in any engine). [[bpePairs]] is one
    * round of the counting; this is the full trainer loop.
    *
    * Scale shape (the real trainer's): the corpus is scanned ONCE into
    * the distinct-word frequency vocabulary; every round then runs over
    * \|vocab\| rows (Heaps-law sublinear in corpus size), extracts pairs
    * ROW-LOCALLY (slice + arrays_zip — no shuffle until the map-side-
    * combined pair count), and collects exactly ONE row (the argmax pair)
    * — merges are k-row MODEL STATE, the [[SimilarityOps.trainCentroids]]
    * Lloyd pattern. Each round's encoding is the codegen'd replace chain
    * of all previous merges over the cached vocabulary.
    *
    * Output: (merge_round, lhs, rhs, pair_count) — stop early if the
    * vocabulary runs out of pairs. Counts are exact integers; no FP.
    */
  def bpeTrain(docs: DataFrame, nMerges: Int): DataFrame = {
    require(nMerges >= 1 && nMerges <= 64,
      s"bpeTrain: nMerges must be in [1, 64], got $nMerges")
    val sp = docs.sparkSession
    val vocab = spread(OpContract.requireCols(docs, "TextOps.bpeTrain", "text"))
      .select(explode(words).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .select(bpeEnc0(col("word")).as("enc"), col("freq"))
      .cache()
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    var enc: Column = col("enc")
    var round = 1
    var done = false
    while (round <= nMerges && !done) {
      val top = vocab
        .withColumn("t", bpeToks(enc))
        .withColumn("tl", slice(col("t"), lit(1), size(col("t")) - 1))
        .withColumn("tr", slice(col("t"), lit(2), size(col("t")) - 1))
        .select(col("freq"), explode(arrays_zip(col("tl"), col("tr"))).as("p"))
        .groupBy(col("p.tl").as("l"), col("p.tr").as("r"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(1).collect()
      if (top.isEmpty) done = true
      else {
        val (l, r) = (top(0).getString(0), top(0).getString(1))
        out += ((round.toLong, l, r, top(0).getLong(2)))
        enc = bpeMergeApply(enc, l, r)
        round += 1
      }
    }
    vocab.unpersist()
    import sp.implicits._
    out.toSeq.toDF("merge_round", "lhs", "rhs", "pair_count")
  }

  /** Apply learned BPE merges ([[bpeTrain]] output, in training order)
    * and report per-document token statistics — the "how many tokens is
    * this corpus under my tokenizer" pass every training-data budget
    * starts from. `compression` is BPE tokens per character (lower =
    * better compression), ONE double division of exact integer sums.
    *
    * Scale shape: the merge list folds into a single codegen'd
    * replace-chain projection — encoding is shuffle-free; the only
    * exchange is the per-doc aggregation of three integer counters.
    */
  def bpeEncode(docs: DataFrame, merges: Seq[(String, String)]): DataFrame = {
    val d = spread(OpContract.requireCols(docs, "TextOps.bpeEncode", "doc_id", "text"))
    val encN = merges.foldLeft(bpeEnc0(col("word"))) {
      case (c, (l, r)) => bpeMergeApply(c, l, r)
    }
    d.select(col("doc_id"), explode(words).as("word"))
      .filter(length(col("word")) > 0)
      .select(col("doc_id"), length(col("word")).cast("long").as("nc"),
        size(bpeToks(encN)).cast("long").as("nt"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), sum(col("nc")).as("n_chars"),
        sum(col("nt")).as("n_bpe_tokens"))
      .withColumn("compression",
        col("n_bpe_tokens").cast("double") / col("n_chars").cast("double"))
  }

  /** Statistical LM quality scoring (the CCNet recipe): train a
    * Laplace-smoothed bigram model ON the corpus, score every document
    * as bits-per-token — low-perplexity docs are fluent/common text,
    * high-perplexity docs are noise (and extreme lows are boilerplate).
    * p(w₂|w₁) = (c₁₂ + 1) / (c₁ + V); score = Σ −log₂ p / n_bigrams.
    *
    * Scale shape: the corpus is reduced FIRST — occurrences pre-aggregate
    * to (doc, pair, cnt) with map-side combine, and the −log₂/round model
    * term is computed once per DISTINCT bigram (vocabulary-sized), not
    * per occurrence; the scoring join then carries (pair, decimal-term)
    * against (doc, pair, cnt) rows — never documents, never raw tokens.
    *
    * Cross-engine FP discipline for an op built on log₂: each per-pair
    * term is rounded to 7 decimals and held as DECIMAL; cnt·t products
    * and their sums are exact decimal arithmetic, so the order-dependent
    * double summation (the thing that can never be oracled) never
    * happens; libm's ≤1-ulp log₂ differences sit ~1e-9 below the 5e-8
    * rounding boundary. One division + one round(6) at the end.
    */
  def bigramPerplexity(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val d = spread(OpContract.requireCols(docs, "TextOps.bigramPerplexity", "doc_id", "text"))
    val uni = d.select(explode(words).as("w1")).groupBy("w1").agg(count(lit(1)).as("c1"))
    val vocab = uni.agg(count(lit(1)).as("v"))
    // WordShingles yields an empty array below 2 words, so explode already
    // drops those docs — no pre-filter (it would re-split every text)
    val bg = d.select(col("doc_id"), explode(positionalShingles(2)).as("pair"))
      .groupBy("doc_id", "pair").agg(count(lit(1)).as("cnt"))
    val bc = bg.groupBy("pair").agg(sum(col("cnt")).as("c12"))
    val terms = bc
      .withColumn("w1", substring_index(col("pair"), " ", 1))
      .join(uni, "w1").crossJoin(vocab)
      .select(col("pair"),
        round(-log2((col("c12") + 1) / (col("c1") + col("v")).cast("double")), 7)
          .cast(DecimalType(12, 7)).as("t"))
    bg.join(terms, "pair")
      .groupBy("doc_id")
      .agg(sum(col("cnt")).as("n_bigrams"),
        round(sum(col("cnt") * col("t")).cast("double") / sum(col("cnt")), 6).as("bpt"))
  }

  /** Interpolated (Jelinek-Mercer) trigram-LM bits-per-token — the
    * longer-context fluency signal above [[bigramPerplexity]]:
    * p(w₃|w₁w₂) = 0.6·c₁₂₃/c₁₂ + 0.3·c₂₃/c₂ + 0.1·c₃/N. Every term is
    * nonzero because the model is estimated ON the scoring corpus (each
    * trigram and its suffixes occur at least once), so no discounting is
    * needed; the fixed-λ mixture is the standard fallback structure for
    * contexts that WOULD be unseen when the model scores held-out text.
    *
    * Scale shape: same as [[bigramPerplexity]] — all count tables are
    * map-side-combined reductions to vocabulary-sized rows, the −log₂
    * model term is computed once per DISTINCT trigram (its four count
    * joins are all vocabulary-keyed), and the scoring join carries
    * (doc, tri, cnt) rows, never raw tokens. Docs under 3 words drop at
    * the shingle explode in both engines.
    *
    * Cross-engine FP: the mixture is a fixed left-to-right expression
    * tree of single IEEE ops (each `λ·c/c'` one multiply + one divide,
    * the two adds left-assoc) written identically in the oracle, then
    * the [[bigramPerplexity]] log₂ discipline — round(−log₂ p, 7) into
    * DECIMAL per distinct trigram, exact decimal Σ cnt·t, one final
    * division + round(6).
    */
  def trigramPerplexity(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val d = spread(OpContract.requireCols(docs, "TextOps.trigramPerplexity", "doc_id", "text"))
    val uni = d.select(explode(words).as("w")).groupBy("w").agg(count(lit(1)).as("c1"))
    val tot = uni.agg(sum(col("c1")).as("n"))
    val bgc = d.select(explode(positionalShingles(2)).as("pair"))
      .groupBy("pair").agg(count(lit(1)).as("cb"))
    val tg = d.select(col("doc_id"), explode(positionalShingles(3)).as("tri"))
      .groupBy("doc_id", "tri").agg(count(lit(1)).as("cnt"))
    val tc = tg.groupBy("tri").agg(sum(col("cnt")).as("c123"))
    val terms = tc
      .withColumn("p12", substring_index(col("tri"), " ", 2))
      .withColumn("p23", substring_index(col("tri"), " ", -2))
      .join(bgc.select(col("pair").as("p12"), col("cb").as("c12")), "p12")
      .join(bgc.select(col("pair").as("p23"), col("cb").as("c23")), "p23")
      .withColumn("w2", substring_index(col("p23"), " ", 1))
      .withColumn("w3", substring_index(col("p23"), " ", -1))
      .join(uni.select(col("w").as("w2"), col("c1").as("c2")), "w2")
      .join(uni.select(col("w").as("w3"), col("c1").as("c3")), "w3")
      .crossJoin(tot)
      .select(col("tri"),
        round(-log2(lit(0.6) * col("c123") / col("c12")
            + lit(0.3) * col("c23") / col("c2")
            + lit(0.1) * col("c3") / col("n")), 7)
          .cast(DecimalType(12, 7)).as("t"))
    tg.join(terms, "tri")
      .groupBy("doc_id")
      .agg(sum(col("cnt")).as("n_trigrams"),
        round(sum(col("cnt") * col("t")).cast("double") / sum(col("cnt")), 6).as("bpt"))
  }

  /** Per-document token-level Shannon entropy (bits over the token
    * histogram): H = −Σ p·log₂p — the lexical-diversity quality signal
    * (low entropy = repetitive/template text, the complement of [[quality]]'s
    * type-token ratio; corpus filters threshold on it directly).
    *
    * Scale shape: one map-side-combined (doc, token) count, one per-doc
    * aggregate, constant-width output. Cross-engine FP: restructured
    * (after the r7 driver gate flipped a per-term round(−p·log₂p, 7) —
    * the second live tie in this class) as
    * H = log₂(n) − (Σ cnt·log₂ cnt)/n, so the ONLY libm calls are
    * log₂(integer) on the few distinct per-doc token counts, each rounded
    * ONCE to 7 decimals into DECIMAL (a tie needs log₂(int) within ~2 ulp
    * of a 7-decimal midpoint — ~4e-9 per distinct value, vs the old
    * scheme's tens of thousands of rounded products of two already-
    * divergent doubles); everything downstream — the Σ cnt·L(cnt) sum,
    * the /n division (half-away integer division at scale 7), the final
    * emission — is exact integer arithmetic. The p=1 doc (all tokens
    * equal) hits no −0.0: L(1) = 0 exactly.
    *
    * Emission convention (r9, battery-wide rule): the entropy is emitted
    * as `ent_e7` — BIGINT micro-bits (entropy·1e7), the [[SimilarityOps
    * .quantize]] integer-output convention — NOT as a wide decimal. The
    * r7/r8 driver-gate reds for this query were isolated (VERDICT r8) to
    * the DECIMAL(20,7) output column, the battery's only one; an integer
    * column has a single cross-engine representation. Callers wanting
    * bits divide by 1e7 (exact in a double below 2^53).
    */
  def tokenEntropy(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val d = spread(OpContract.requireCols(docs, "TextOps.tokenEntropy", "doc_id", "text"))
    val wc = d.select(col("doc_id"), explode(words).as("w"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("cnt"))
    def l2(c: Column) = round(log2(c.cast("double")), 7).cast(DecimalType(12, 7))
    wc.groupBy("doc_id")
      .agg(sum(col("cnt")).as("n_tokens"),
        sum(col("cnt") * l2(col("cnt"))).as("s"))
      // ent·1e7 = L(n)·1e7 − round_half_up(S·1e7 / n): exact integers
      .withColumn("ln7", l2(col("n_tokens")) * lit(10000000L))
      .withColumn("a", col("s") * lit(10000000L))
      .withColumn("ent7",
        expr("CAST(ln7 AS BIGINT) - ((2 * a + n_tokens) div (2 * n_tokens))"))
      .select(col("doc_id"), col("n_tokens"),
        col("ent7").cast("long").as("ent_e7"))
  }

  /** Zipf rank-frequency slope per language: least-squares fit of
    * log₂(freq) on log₂(rank) over the top-`k` terms by raw occurrence
    * count — ≈ −1 for organic natural language (Zipf's law), far from it
    * for template/machine-generated output; the data-card companion to
    * [[corpusReport]]. Ties rank deterministically by (freq desc, term).
    *
    * Scale shape: occurrence counts are map-side combined to the
    * vocabulary-sized (lang, term) table; the ranking window and the
    * regression then run over ≤k rows per language — bounded output,
    * presentation sort kept. Cross-engine FP: regression inputs rounded(7)
    * into DECIMAL so all four sums (Σx, Σy, Σxy, Σx²) are exact; the
    * closed form (n·Σxy − Σx·Σy)/(n·Σx² − (Σx)²) is evaluated as doubles
    * with numerator and denominator each rounded(6) BEFORE the single
    * division (absorbs DuckDB's FMA contraction of a·b − c·d), one final
    * round(6). Languages with fewer than two distinct terms are dropped
    * (the fit is undefined).
    */
  def zipfSlope(docs: DataFrame, k: Int = 50): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    require(k >= 2, s"zipfSlope needs k >= 2, got $k")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("freq").desc, col("term"))
    val ranked = spread(OpContract.requireCols(docs, "TextOps.zipfSlope",
        "lang", "doc_id", "text"))
      .select(col("lang"), explode(words).as("term"))
      .groupBy("lang", "term").agg(count(lit(1)).as("freq"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
    ranked.select(col("lang"),
        round(log2(col("rank").cast("double")), 7).cast(DecimalType(12, 7)).as("x"),
        round(log2(col("freq").cast("double")), 7).cast(DecimalType(12, 7)).as("y"))
      .groupBy("lang")
      .agg(count(lit(1)).as("k_used"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
      .filter(col("k_used") >= 2)
      .select(col("lang"), col("k_used"),
        round(col("k_used").cast("double") * col("sxy").cast("double") -
          col("sx").cast("double") * col("sy").cast("double"), 6).as("num"),
        round(col("k_used").cast("double") * col("sxx").cast("double") -
          col("sx").cast("double") * col("sx").cast("double"), 6).as("den"))
      .select(col("lang"), col("k_used"),
        round(col("num") / col("den"), 6).as("zipf_slope"))
      .orderBy("lang")
  }

  /** DSIR-style importance scores (Xie et al., "Data Selection for
    * Language Models via Importance Resampling", NeurIPS 2023): score
    * every document by the average hashed-unigram log-likelihood ratio
    * between a TARGET distribution (the `isTarget` slice — e.g. a trusted
    * source) and the raw corpus. Tokens hash into `buckets` feature
    * buckets; bucket probabilities are Laplace-smoothed count ratios; a
    * document's score is Σ cnt_b·t_b / n_tokens with
    * t_b = log2(p_target(b)) − log2(p_raw(b)). Positive ⇒ looks like the
    * target; the downstream resampling keeps docs ∝ exp(score) (a
    * [[weightedSample]] call).
    *
    * FP discipline (the [[bigramPerplexity]] pattern): each bucket term is
    * rounded to 7 decimals and fixed as DECIMAL(12,7), so the per-doc
    * weighted sums are EXACT integer-scaled decimal arithmetic in any
    * accumulation order; one double division + round(·,6) at the end.
    *
    * Scale shape: the bucket model is `buckets` rows — broadcast; token
    * rows reduce map-side to ≤ docs×buckets (doc_id, bucket) partial
    * counts; the corpus text never shuffles.
    */
  def dsirScores(docs: DataFrame, isTarget: Column, buckets: Int = 256): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val d = spread(OpContract.requireCols(docs, "TextOps.dsirScores", "doc_id", "text"))
    val toks = d.select(col("doc_id"), isTarget.as("tgt"), explode(words).as("w"))
      .withColumn("b", graft.functions.CrossHash.mdint(col("w")) % buckets)
    val perDocB = toks.groupBy("doc_id", "b").agg(count(lit(1)).as("cnt"))
    val tgtC = toks.filter(col("tgt")).groupBy("b").agg(count(lit(1)).as("tc"))
    val rawC = toks.groupBy("b").agg(count(lit(1)).as("rc"))
    val bucketTable = rawC.join(tgtC, Seq("b"), "left")
      .withColumn("tc", coalesce(col("tc"), lit(0L)))
      .crossJoin(toks.filter(col("tgt")).agg(count(lit(1)).as("tn")))
      .crossJoin(toks.agg(count(lit(1)).as("rn")))
      .select(col("b"),
        round(
          log2((col("tc") + 1).cast("double") / (col("tn") + buckets).cast("double")) -
            log2((col("rc") + 1).cast("double") / (col("rn") + buckets).cast("double")),
          7).cast(DecimalType(12, 7)).as("t"))
    perDocB.join(broadcast(bucketTable), "b")
      .groupBy("doc_id")
      .agg(sum(col("cnt")).as("n_tokens"),
        round(sum(col("cnt") * col("t")).cast("double") / sum(col("cnt")), 6).as("dsir"))
  }

  /** Hashed-feature LINEAR MODEL application — the "run the trained
    * quality classifier over the whole corpus" step (fastText-style
    * scoring): each document's hashed bag-of-words features are looked
    * up in an externally supplied (feature, weight) model table and
    * summed into the document's LOGIT score (monotone in the classifier
    * probability — emitting the logit skips exp(), the one
    * transcendental whose libm could differ cross-engine). The score is
    * the per-doc TOTAL w·x; the per-token mean (fastText's form) is
    * score / n_tokens, one division away, left to the caller — keeping
    * the emitted value division-free makes it BIT-exact, not just
    * correctly-rounded (a mean hits round-at-scale ties when weights
    * are decimal-friendly, and Spark's BigDecimal HALF_UP and DuckDB's
    * multiply-then-round can resolve an ulp-adjacent tie differently).
    * Complements [[dsirScores]], which TRAINS its bucket table from a
    * target/raw split; here the model is an input, the shape every
    * externally-trained filter (quality, toxicity, educational-value)
    * deploys through.
    *
    * FP discipline: weights are fixed at DECIMAL(12,7) on entry, so
    * per-doc sums are order-independent exact arithmetic; ONE cast to
    * double at the end and no division at all. Features absent from the
    * model score 0 (sparse models are valid); tokens always count toward
    * n_tokens.
    *
    * Scale shape: the model is ≤ `buckets` rows and BROADCAST; the
    * corpus is scanned once, (doc, feature) counts combine map-side, and
    * the final shuffle carries one row per document. Model size bounds
    * driver state, corpus size only the scan.
    */
  def scoreLinear(docs: DataFrame, model: DataFrame, buckets: Int = 256): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    require(buckets >= 1, s"scoreLinear needs buckets >= 1, got $buckets")
    OpContract.requireCols(model, "TextOps.scoreLinear model", "feature", "weight")
    val d = spread(OpContract.requireCols(docs, "TextOps.scoreLinear", "doc_id", "text"))
    val perDocF = d.select(col("doc_id"), explode(words).as("w"))
      .withColumn("feature", graft.functions.CrossHash.mdint(col("w")) % buckets)
      .groupBy("doc_id", "feature").agg(count(lit(1)).as("cnt"))
    // The model is an EXTERNAL input, so duplicate feature rows are a
    // plausible hazard: joined as-is they would fan out the (doc, feature)
    // counts and silently inflate n_tokens and score. Collapse to one row
    // per feature with the linear-model combine rule (weights ADD — the sum
    // is exact decimal arithmetic, so the collapse is order-independent).
    val m = model
      .select(col("feature"), round(col("weight"), 7).cast(DecimalType(12, 7)).as("t"))
      .groupBy("feature").agg(sum(col("t")).cast(DecimalType(12, 7)).as("t"))
    perDocF.join(broadcast(m), Seq("feature"), "left")
      .withColumn("t", coalesce(col("t"), lit(0).cast(DecimalType(12, 7))))
      .groupBy("doc_id")
      .agg(sum(col("cnt")).as("n_tokens"),
        sum(col("cnt") * col("t")).cast("double").as("score"))
  }

  /** BATCH-PERCEPTRON TRAINING of the hashed linear text classifier
    * (Rosenblatt '58; the batch form of the mistake-driven update
    * Collins EMNLP'02 popularized for NLP) — the TRAIN side of the
    * [[scoreLinear]] apply: a quality/domain classifier is fit on a
    * labeled seed set over the SAME `mdint(word) % buckets` feature
    * space, so the returned `(feature, weight)` table feeds
    * [[scoreLinear]] (and the streaming floor) unchanged. Per
    * iteration, every misclassified doc (predict positive iff the
    * integer score > 0) contributes `y·count` to its buckets' gradient;
    * weights accumulate `lr = lrNum/lrDen` times the gradient.
    *
    * EXACT BY CONSTRUCTION: training runs entirely over INTEGER
    * accumulators — the learning rate factors out of the sign test
    * (sign(lr·Σ) = sign(Σ) for lr > 0), so no float enters any
    * iteration, and the emitted weight is ONE division of exact
    * integers (`G·lrNum / lrDen`) at the end. The oracle unrolls the
    * iterations as a SQL CTE chain (the trained-Lloyd discipline);
    * every intermediate is bit-identical cross-engine, not just
    * correctly rounded.
    *
    * Scale shape: the (doc, feature) count table is computed ONCE
    * (map-side combined, localCheckpoint'ed — every iteration reuses it
    * without re-scanning the corpus); per iteration one broadcast-map
    * score pass + one ≤`buckets`-row gradient aggregate collects to the
    * driver — model state is ≤`buckets` longs, the Lloyd bound. Null
    * labels train as negatives (document your label column).
    */
  def trainPerceptron(docs: DataFrame, label: Column, buckets: Int = 256,
      iters: Int = 3, lrNum: Long = 1L, lrDen: Long = 1000L): DataFrame = {
    require(buckets >= 1 && iters >= 1 && lrNum >= 1 && lrDen >= 1,
      s"trainPerceptron: bad hyperparameters ($buckets, $iters, $lrNum, $lrDen)")
    val d = spread(OpContract.requireCols(docs, "TextOps.trainPerceptron",
      "doc_id", "text"))
    val s = docs.sparkSession
    val pf = d.select(col("doc_id"),
        when(label, 1L).otherwise(-1L).as("y"), explode(words).as("w"))
      .withColumn("f", graft.functions.CrossHash.mdint(col("w")) % buckets)
      .groupBy("doc_id", "y", "f").agg(count(lit(1)).as("cnt"))
      .localCheckpoint()
    def mapOf(g: Map[Long, Long]) = {
      val entries = g.toSeq.sortBy(_._1).flatMap { case (k, v) => Seq(lit(k), lit(v)) }
      if (entries.isEmpty) typedLit(Map.empty[Long, Long]) else map(entries: _*)
    }
    var g = Map.empty[Long, Long]
    (1 to iters).foreach { _ =>
      val wmap = mapOf(g)
      val miscl = pf.groupBy("doc_id", "y")
        .agg(sum(col("cnt") * coalesce(element_at(wmap, col("f")), lit(0L))).as("s"))
        .filter((col("y") === 1L && col("s") <= 0L) ||
          (col("y") === -1L && col("s") > 0L))
        .select("doc_id")
      g = pf.join(miscl, "doc_id")
        .groupBy("f").agg(sum(col("y") * col("cnt")).as("gb"))
        .collect()
        .foldLeft(g) { (acc, r) =>
          val nv = acc.getOrElse(r.getLong(0), 0L) + r.getLong(1)
          if (nv == 0L) acc - r.getLong(0) else acc.updated(r.getLong(0), nv)
        }
    }
    val gmap = mapOf(g)
    s.range(buckets).select(col("id").as("feature"),
      ((coalesce(element_at(gmap, col("id")), lit(0L)) * lrNum).cast("double")
        / lit(lrDen.toDouble)).as("weight"))
  }

  /** BM25 relevance scores (Robertson et al., the Lucene-practical form
    * with the +1 idf floor) of every document against a fixed query term
    * set — the retrieval-scoring step of a search or query-targeted
    * data-selection stack. Inputs to every factor are exact integers
    * (tf, df, doc length, corpus totals); the per-(doc, term) score is
    * rounded to 7 decimals and fixed as DECIMAL(12,7), so per-doc sums
    * are order-independent exact arithmetic (the [[bigramPerplexity]]
    * discipline) — one cast to double at the end.
    *
    * Scale shape (r15): the query terms are a handful of literals, so
    * per-doc `tf` is a pure ARRAY expression (`size(filter(words, ...))`)
    * — the corpus is never exploded and no (doc, token) row ever
    * shuffles. Corpus stats and the per-term document frequencies reduce
    * map-side to ONE row; scoring is a second projection against that
    * broadcast row. (The pre-r15 shape exploded every token into a
    * doc-length groupBy plus a (doc, term) groupBy — two corpus-sized
    * exchanges carrying ~0 bits per row — and then joined them back.)
    * Every factor is built from the same exact integers through the same
    * expression trees, so scores are bit-identical to the exploded form.
    */
  def bm25(docs: DataFrame, terms: Seq[String], k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    require(terms.nonEmpty, "bm25 needs at least one query term")
    val qs = terms.distinct
    val d = OpContract.requireCols(docs, "TextOps.bm25", "doc_id", "text")
      .filter(col("text").isNotNull)
    def tfOf(term: String): Column =
      size(filter(words, x => x === lit(term))).cast("long")
    val base = d.select(
      Seq(col("doc_id"), size(words).cast("long").as("dl")) ++
        qs.indices.map(i => tfOf(qs(i)).as(s"tf_$i")): _*)
    val statAggs = Seq(count(lit(1)).as("n_docs"), sum(col("dl")).as("total")) ++
      qs.indices.map(i => sum(when(col(s"tf_$i") > 0, 1L).otherwise(0L)).as(s"df_$i"))
    val stats = base.agg(statAggs.head, statAggs.tail: _*)
    val joined = base.crossJoin(broadcast(stats))
      .withColumn("avgdl", col("total").cast("double") / col("n_docs"))
    val zero = lit(BigDecimal(0)).cast(DecimalType(12, 7))
    val ts = qs.indices.map { i =>
      val idf = log((col("n_docs") - col(s"df_$i") + lit(0.5)) /
        (col(s"df_$i") + lit(0.5)) + lit(1.0))
      val tfpart = col(s"tf_$i") * lit(k1 + 1) /
        (col(s"tf_$i") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / col("avgdl")))
      when(col(s"tf_$i") > 0, round(idf * tfpart, 7).cast(DecimalType(12, 7)))
    }
    joined
      .filter(qs.indices.map(i => col(s"tf_$i") > 0).reduce(_ || _))
      .select(col("doc_id"),
        qs.indices.map(i => when(col(s"tf_$i") > 0, 1L).otherwise(0L))
          .reduce(_ + _).as("n_terms"),
        ts.map(t => coalesce(t, zero)).reduce(_ + _).cast("double").as("bm25"))
  }

  /** Text normalization (the C4/RefinedWeb pre-dedup cleanup, restricted
    * to transforms both engines define identically): lowercase, collapse
    * whitespace runs to single spaces, trim. Pure shuffle-free
    * projection; output pins the normalized corpus byte-for-byte via
    * (md5, length) — the [[redactPii]] discipline.
    */
  def normalizeText(docs: DataFrame): DataFrame = {
    OpContract.requireCols(docs, "TextOps.normalizeText", "doc_id", "text")
    val norm = trim(regexp_replace(lower(col("text")), "\\s+", " "))
    docs.select(col("doc_id"),
      length(col("text")).cast("long").as("n_raw"),
      md5(norm).as("digest"),
      length(norm).cast("long").as("n_norm"))
  }

  /** Bag-of-words fingerprint (md5 over the sorted distinct vocabulary):
    * documents with identical word sets collapse to one fingerprint —
    * word-order-insensitive near-dup detection in one agg pass.
    */
  def bowFingerprint(docs: DataFrame): DataFrame =
    OpContract.requireCols(docs, "TextOps.bowFingerprint", "text")
      .select(md5(concat_ws(" ", array_sort(array_distinct(split(lower(col("text")), " ")))))
        .as("fp"))
      .groupBy("fp").agg(count(lit(1)).as("cluster_size"))
      .agg(
        count(lit(1)).as("n_fingerprints"),
        sum(col("cluster_size")).as("n_docs"),
        sum(when(col("cluster_size") > 1, 1).otherwise(0)).as("n_multi_clusters"),
        max(col("cluster_size")).as("max_cluster"))

  /** Sparse TF-IDF cosine all-pairs document similarity over positional
    * 3-word shingles — the inverted-index all-pairs formulation (Bayardo
    * et al., WWW'07): documents pair ONLY through shared postings, never
    * via a cartesian product. Shingles, not unigrams, are the term space:
    * on a small vocabulary every doc shares every word and unigram cosine
    * is degenerate, while shingle df stays discriminative. The `maxDf`
    * cap is the quadratic guard — pair-generation cost is Σ_t df(t)² over
    * kept terms, so each posting self-join block is bounded by maxDf²
    * regardless of corpus size (ubiquitous shingles are boilerplate, not
    * signal; dropping them from the weight space is the standard
    * stop-posting prune). Weights are unit-normalized per document, so
    * the pair dot product IS the cosine.
    *
    * FP discipline (the [[bm25]] pattern): idf and normalized weights are
    * rounded to 7 decimals and fixed as DECIMAL, pair dots are exact
    * decimal sums (order-independent), the threshold compares decimals,
    * and ONE cast to double happens at the end. Scale shape: tf/df/norms
    * are map-side-combined aggregates over (doc, shingle) rows; the `tf`
    * postings and the normalized `wn` postings are localCheckpointed (the
    * [[DedupOps.nearDupClustersStar]] discipline for a shared data-sized
    * intermediate) because FIVE branches fork off tf and the pair
    * self-join forks off wn — without the checkpoint each branch re-scans
    * and re-explodes the corpus (8 parquet scans in the naive plan);
    * with it the corpus is read once and every branch reads the
    * materialized postings. Document text never leaves its scan
    * partition — everything after the explode carries (doc_id, shingle,
    * counts/weights) rows.
    */
  def tfidfPairs(docs: DataFrame, maxDf: Int = 50,
      minCos: Double = 0.30): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    require(maxDf >= 2, s"tfidfPairs needs maxDf >= 2, got $maxDf")
    require(minCos >= 0.0 && minCos <= 1.0, s"minCos in [0,1], got $minCos")
    val d = spread(OpContract.requireCols(docs, "TextOps.tfidfPairs", "doc_id", "text"))
    // the shingle STRING never reaches the output — every downstream use
    // (tf/df group keys, the pair self-join key) only tests equality — so
    // the term space is keyed by the 64-bit xxhash of the shingle from the
    // explode on (the dd-family candidate-stage convention: ~25 B string ->
    // 8 B key in both checkpoints and the self-join shuffle; collisions
    // ~|shingles|^2/2^64, value-oracle-checked at every SF)
    val tf = d.filter(size(words) >= 3)
      .select(col("doc_id"), explode(positionalShingles(3)).as("sw"))
      .select(col("doc_id"), xxhash64(col("sw")).as("s"))
      .groupBy("doc_id", "s").agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    val st = tf.agg(countDistinct(col("doc_id")).as("n_docs"))
    val dfq = tf.groupBy("s").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf)
    val kept = tf.join(dfq, "s").crossJoin(broadcast(st))
      .withColumn("wt",
        col("tf").cast(DecimalType(11, 0)) *
          round(log(col("n_docs").cast("double") / col("df")), 7)
            .cast(DecimalType(12, 7)))
    val nr = kept.groupBy("doc_id")
      .agg(sum(col("wt").cast(DecimalType(18, 7)) *
        col("wt").cast(DecimalType(18, 7))).as("norm2"))
    val wn = kept.join(nr, "doc_id")
      .select(col("doc_id"), col("s"),
        round(col("wt").cast("double") / sqrt(col("norm2").cast("double")), 7)
          .cast(DecimalType(12, 7)).as("wn"))
      .localCheckpoint()
    wn.as("a").join(wn.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared"), sum(col("a.wn") * col("b.wn")).as("cd"))
      .filter(col("cd") >= lit(java.math.BigDecimal.valueOf(minCos)))
      .select(col("doc_a"), col("doc_b"), col("n_shared"),
        col("cd").cast("double").as("cos_sim"))
  }

  /** COLLOCATION mining by LIFT over the corpus bigram table: for every
    * adjacent word pair seen ≥ `minCount` times, the ratio of its observed
    * count to the count independence would predict from the pair's
    * marginals — `lift = n_ab·N / (c_a·c_b)` over the bigram contingency
    * table (the monotone exp-PMI; ranking by lift IS ranking by PMI with
    * zero libm). Top-k rows by (lift desc, w1, w2) — the phrase/tokenizer-
    * merge candidate list (multi-word expressions a word-level pipeline
    * should treat as units).
    *
    * Exactness: all four counts are integers; `n_ab·N` and `c_a·c_b` are
    * exact DECIMAL(38,0) products (≤ ~1e28 at 1e14 words); `lift` is the
    * single final division. The top-k is a TakeOrderedAndProject
    * (distributive, no global sort) under a TOTAL order.
    *
    * Scale shape: one corpus scan explodes to bigram rows; three
    * map-side-combined count aggregations (pairs + both marginals, all
    * vocabulary-bounded); marginals join back on the word key —
    * vocabulary-sized tables, broadcast when small.
    */
  def pmiCollocations(docs: DataFrame, minCount: Long = 5L, k: Int = 50): DataFrame = {
    require(minCount >= 1 && k >= 1, s"pmiCollocations: minCount/k >= 1")
    val dec = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0)
    val d = spread(OpContract.requireCols(docs, "TextOps.pmiCollocations", "doc_id", "text"))
    // bigrams via the codegen'd 2-word shingle generator (non-distinct,
    // positional) — one generate, no word-array carried past the explode
    val bi = d.select(explode(positionalShingles(2)).as("pair"))
      .select(substring_index(col("pair"), " ", 1).as("w1"),
        substring_index(col("pair"), " ", -1).as("w2"))
    val pairs = bi.groupBy("w1", "w2").agg(count(lit(1)).as("n_ab"))
    val left = pairs.groupBy("w1").agg(sum(col("n_ab")).as("c1"))
    val right = pairs.groupBy("w2").agg(sum(col("n_ab")).as("c2"))
    val tot = pairs.agg(sum(col("n_ab")).as("nn"))
    pairs.filter(col("n_ab") >= minCount)
      .join(left, "w1").join(right, "w2")
      .crossJoin(broadcast(tot))
      .select(col("w1"), col("w2"), col("n_ab"), col("c1"), col("c2"),
        ((col("n_ab").cast(dec) * col("nn").cast(dec)).cast("double") /
          (col("c1").cast(dec) * col("c2").cast(dec)).cast("double")).as("lift"))
      .orderBy(col("lift").desc, col("w1"), col("w2"))
      .limit(k)
  }

  /** Per-document n-gram NOVELTY: the fraction of a doc's distinct 3-word
    * shingles whose corpus-wide FIRST occurrence (minimum doc_id) is the
    * doc itself. The curation metric behind "fresh content" weighting —
    * a doc of mostly already-seen shingles is boilerplate/near-dup tail
    * even when no single pair-level dedup fires; the per-doc score feeds
    * [[scoreLinear]]-style mixing the same way quality does.
    *
    * Emits `(doc_id, n_shingles, n_novel, novelty)`; docs with fewer than
    * 3 words have no shingles and are omitted. Exactness: counts are
    * integers; `novelty` is the single final division.
    *
    * Scale shape: docs explode once to (doc_id, 60-bit shingle hash)
    * pairs — 16 bytes/row; first-occurrence is one map-side-combined
    * `min(doc_id)` aggregation on the hash; the join back ships only
    * (hash, id) pairs (text never shuffles). At 100 TB swap
    * [[graft.functions.CrossHash.mdint]] for `xxhash64` (same plan, no
    * oracle) and bucket both sides by `shx` to make the join co-located.
    */
  def noveltyReport(docs: DataFrame): DataFrame = {
    OpContract.requireCols(docs, "TextOps.noveltyReport", "doc_id", "text")
    val para = docs.sparkSession.sparkContext.defaultParallelism
    val pairs = docs.repartition(para)
      .select(col("doc_id"),
        explode(DedupOps.shinglesCol(col("text"))).as("sh"))
      .select(col("doc_id"), graft.functions.CrossHash.mdint(col("sh")).as("shx"))
    val firsts = pairs.groupBy("shx").agg(min(col("doc_id")).as("first_doc"))
    pairs.join(firsts, Seq("shx"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L))
          .as("n_novel"))
      .withColumn("novelty",
        col("n_novel").cast("double") / col("n_shingles").cast("double"))
  }

  /** READABILITY audit per group (source/domain): corpus-level Flesch
    * Reading Ease from the classic regex approximations — words =
    * maximal `[a-z]+` runs of the lowered text, sentences = maximal
    * `[.!?]+` runs (floored at 1/doc so a fragment without terminal
    * punctuation counts as one sentence, the standard convention),
    * syllables = maximal `[aeiouy]+` vowel-group runs (the textbook
    * syllable proxy; exact dictionary syllabification is a lexicon
    * problem, not an engine problem). A pretraining mix that drifts
    * toward very low FRE (dense legalese/generated sludge) or very high
    * (fragment spam) shows up here per source before any model does.
    * Emits `(grp, n_docs, words, sentences, syllables, flesch)` with
    * FRE computed on the POOLED group totals:
    * 206.835 − 1.015·(W/S) − 84.6·(Y/W), round(·,12).
    *
    * FP discipline: all three counts are exact integers (regexp_count ↔
    * DuckDB len(regexp_extract_all) on character-class-only patterns —
    * identical across regex dialects); W/S and Y/W are single divisions
    * of engine-identical integers; the final two multiply-subtract steps
    * have the FMA-contractible a−b·c shape, so the result is
    * round(·,12)-pinned in both engines (the [[AuditOps
    * .independenceReport]] cc discipline).
    *
    * Scale shape: one scan, three codegen'd per-row regex counts, one
    * map-side-combined aggregation to ≤|groups| rows. Nothing shuffles
    * but the counter rows.
    */
  /** HEAPS'-LAW vocabulary-growth fit across sources — V = K·Nᵝ
    * (Heaps '78): each source contributes one (log₂ total tokens,
    * log₂ distinct tokens) point and ONE least-squares line is fit
    * across the sources. The scaling audit behind tokenizer/vocab
    * sizing and dedup sanity: natural corpora sit near β ≈ 0.5–0.7 — a
    * source family fitting β ≈ 1 is template/random sludge (every doc
    * new vocabulary), β ≈ 0 is a copy farm (no new vocabulary) — the
    * corpus-level complement of [[zipfSlope]] (which fits WITHIN-source
    * rank-frequency; the two exponents are theoretically linked).
    * Emits one row `(n_sources, beta, log2_k)`.
    *
    * FP discipline (the [[zipfSlope]] contract): log₂ of exact integer
    * counts rounded once to 7 decimals and fixed as DECIMAL(12,7), so
    * all moment sums are exact in any order; slope = the round(·,6)
    * num/den division; the intercept's a−b·c shape (FMA-contractible)
    * is round(·,6)-pinned after the division by n.
    *
    * Scale shape: tokens hash to 8-byte values before the distinct
    * (text never shuffles — the [[DedupOps]] discipline); per-source
    * totals are one map-side-combined agg; the fit runs over ≤|sources|
    * decimal points in a second tiny agg.
    */
  def heapsFit(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val d = spread(OpContract.requireCols(docs, "TextOps.heapsFit",
      "source", "text"))
    val per = d.select(col("source"), explode(words).as("w"))
      .select(col("source"), graft.functions.CrossHash.mdint(col("w")).as("h"))
      .groupBy("source")
      .agg(count(lit(1)).as("tt"), count_distinct(col("h")).as("vt"))
    val pts = per.select(
      round(log2(col("tt").cast("double")), 7).cast(DecimalType(12, 7)).as("x"),
      round(log2(col("vt").cast("double")), 7).cast(DecimalType(12, 7)).as("y"))
    val m = pts.agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
      .filter(col("n") >= 2)
    val beta = round(
      round(col("n").cast("double") * col("sxy").cast("double") -
        col("sx").cast("double") * col("sy").cast("double"), 6) /
      round(col("n").cast("double") * col("sxx").cast("double") -
        col("sx").cast("double") * col("sx").cast("double"), 6), 6)
    m.select(col("n").as("n_sources"), beta.as("beta"),
      round((col("sy").cast("double") - beta * col("sx").cast("double")) /
        col("n").cast("double"), 6).as("log2_k"))
  }

  /** CODE-CONTAMINATION screen per group (source/domain) — the mix audit
    * for "how much of this prose source is actually source code" (and
    * vice versa: a code source full of prose): per doc, two exact
    * signals — `n_sym` = count of code-structural characters
    * `{}();=<>`, `n_kw` = count of `\b`-delimited programming keywords
    * (def/class/import/return/function/var/const/if/else/for/while) —
    * and a doc is flagged code-like when symbols exceed 2% of chars
    * (integer cross-multiply `50·n_sym > n_chars`, no FP threshold) or
    * it contains ≥ 2 keyword hits. Emits per group:
    * `(grp, n_docs, n_code, sym_total, kw_total, code_frac)` with
    * `code_frac` the single division. A classifier ([[trainPerceptron]])
    * beats this once labels exist; this is the label-free screen that
    * runs first and cross-checks the classifier forever after.
    *
    * Exactness: both regex counts are character-class / alternation
    * patterns with identical Java-regex and RE2 semantics (`\b` included);
    * the flag is pure integer arithmetic; `code_frac` ONE division.
    * Scale shape: one scan, two codegen'd per-row regex counts, one
    * map-side-combined aggregation to ≤|groups| rows.
    */
  def codeDetectReport(docs: DataFrame, groupCol: String): DataFrame = {
    OpContract.requireCols(docs, "TextOps.codeDetectReport",
      groupCol, "text", "n_chars")
    val kwRe =
      "\\b(def|class|import|return|function|var|const|if|else|for|while)\\b"
    val perDoc = docs.select(col(groupCol).cast("string").as("grp"),
        col("n_chars"),
        regexp_count(col("text"), lit("[{}();=<>]")).cast("long").as("n_sym"),
        regexp_count(col("text"), lit(kwRe)).cast("long").as("n_kw"))
      .withColumn("is_code",
        lit(50L) * col("n_sym") > col("n_chars") || col("n_kw") >= 2L)
    perDoc.groupBy("grp")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("is_code"), 1L).otherwise(0L)).as("n_code"),
        sum("n_sym").as("sym_total"), sum("n_kw").as("kw_total"))
      .withColumn("code_frac",
        col("n_code").cast("double") / col("n_docs").cast("double"))
      .orderBy("grp")
  }

  def readabilityReport(docs: DataFrame, groupCol: String): DataFrame = {
    OpContract.requireCols(docs, "TextOps.readabilityReport", groupCol, "text")
    val perDoc = docs.select(col(groupCol).cast("string").as("grp"),
      regexp_count(lower(col("text")), lit("[a-z]+")).cast("long").as("w"),
      greatest(regexp_count(col("text"), lit("[.!?]+")).cast("long"), lit(1L))
        .as("s"),
      regexp_count(lower(col("text")), lit("[aeiouy]+")).cast("long").as("y"))
    perDoc.groupBy("grp")
      .agg(count(lit(1)).as("n_docs"), sum("w").as("words"),
        sum("s").as("sentences"), sum("y").as("syllables"))
      .withColumn("flesch", when(col("words") > 0, round(
        lit(206.835) -
          lit(1.015) * (col("words").cast("double") /
            col("sentences").cast("double")) -
          lit(84.6) * (col("syllables").cast("double") /
            col("words").cast("double")), 12)))
      .orderBy("grp")
  }

  /** TOKENIZER FERTILITY by corpus slice — tokens-per-word under a
    * trained BPE merge table, the standard "how well does my tokenizer
    * fit this domain" readout (fertility ≫ 1 on a source means its text
    * fragments into many subwords — under-served by the vocab; the
    * metric behind multilingual vocab-allocation decisions): compose
    * [[bpeTrain]] → [[bpeEncode]] and reduce per `groupCol`. Emits
    * `(source, n_docs, n_words, n_bpe_tokens, fertility)` — fertility
    * ONE division of exact integers.
    *
    * Scale shape: [[bpeEncode]]'s per-doc encoding is the only
    * data-sized work (pure projection + per-doc aggregate); this adds
    * one broadcast join of (doc_id → group) and a ≤\|groups\| reduction.
    */
  def bpeFertility(docs: DataFrame, merges: Seq[(String, String)],
      groupCol: String = "source"): DataFrame = {
    OpContract.requireCols(docs, "TextOps.bpeFertility", groupCol)
    bpeEncode(docs, merges)
      .join(docs.select(col("doc_id"), col(groupCol).as("grp")), "doc_id")
      .filter(col("grp").isNotNull)
      .groupBy(col("grp").as("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_words")).as("n_words"),
        sum(col("n_bpe_tokens")).as("n_bpe_tokens"))
      .select(col("source"), col("n_docs"), col("n_words"),
        col("n_bpe_tokens"),
        (col("n_bpe_tokens").cast("double") / col("n_words").cast("double"))
          .as("fertility"))
      .orderBy("source")
  }

  // ---- Unigram-LM (SentencePiece-style) tokenizer training ------------
  //
  // The family member next to the BPE trio: where BPE GROWS a vocabulary
  // bottom-up by merging the most frequent adjacent pair, the unigram LM
  // (Kudo '18) starts from a LARGE candidate piece set and re-estimates
  // piece probabilities by EM over the segmentation lattice. This
  // implementation is the hard-EM (Viterbi) variant — each E-step
  // assigns every word its single BEST segmentation under the current
  // model and re-counts pieces from those segmentations — which is the
  // published alternating optimization SentencePiece itself exposes, and
  // the one whose arithmetic can be made bit-identical cross-engine:
  // scores are exact BIGINT sums of per-piece log-probs that were
  // rounded ONCE to 7 decimals and scaled by 1e7 (the psi/jsd ln idiom),
  // so the DP, its max, and its deterministic tie-break (longest piece
  // wins on equal score) produce the same segmentation in Spark and in
  // the oracle's recursive-CTE mirror — zero floating point in the DP.

  /** Scaled log-prob column: round(ln(cnt), 7) held as DECIMAL(12,7),
    * then ×1e7 into an exact BIGINT — the one rounded transcendental per
    * piece; everything downstream is integer arithmetic.
    */
  private def ln7(c: Column): Column =
    (round(log(c.cast("double")), 7)
      .cast(org.apache.spark.sql.types.DecimalType(12, 7)) * lit(10000000))
      .cast("long")

  /** Sentinel for a piece absent from the model: far below any real
    * path score (|lp| ≤ ~1.8e8 per piece) yet far from Long overflow
    * when accumulated along a word. The ORACLE uses the same literal,
    * so even degenerate all-absent paths score identically in both
    * engines.
    */
  private val UniNeg = -1000000000000000L

  /** Floor every DP candidate is clamped to, in BOTH engines (the
    * oracle wraps each candidate in GREATEST(·, UniClamp)): without it
    * a pathological word of ~9200+ model-absent characters accumulates
    * UniNeg past Long.MinValue — silent wraparound in the JVM, an
    * overflow ERROR in DuckDB's BIGINT. Clamped, dp is bounded below by
    * UniClamp − UniNeg regardless of word length, and the clamp never
    * binds for real text (it needs ~400 consecutive absent pieces).
    */
  private val UniClamp = -400000000000000000L

  /** Viterbi segmentation of one word under scaled log-probs — exact
    * BIGINT dp, tie-break prefers the LONGER piece (mirrors the oracle's
    * k=3,2,1 CASE priority).
    *
    * The dp indexes Unicode CODE POINTS, not UTF-16 code units: the
    * candidate extraction (Spark SQL `substring`/`length` count code
    * points via UTF8String) and the DuckDB oracle both index code
    * points, and a surrogate half can never be a model piece — walking
    * code units would break single-character coverage for any
    * supplementary-plane word (emoji, rare CJK) and diverge `n_chars`
    * from the oracle (ADVICE r13). `offs` holds the code-unit offset of
    * each code-point boundary, so for BMP-only text every offset equals
    * its index and the dp is bit-for-bit the pre-r14 one.
    */
  private def viterbiPieces(word: String, lp: java.util.HashMap[String, java.lang.Long],
      maxLen: Int): List[String] = {
    val wlen = word.length
    val offs = new Array[Int](wlen + 1)
    var n = 0
    var o = 0
    while (o < wlen) {
      offs(n) = o
      n += 1
      o += Character.charCount(word.codePointAt(o))
    }
    offs(n) = wlen
    val dp = new Array[Long](n + 1)
    val back = new Array[Int](n + 1)
    var i = 1
    while (i <= n) {
      var best = Long.MinValue
      var bestK = 1
      var k = 1
      val kMax = math.min(maxLen, i)
      while (k <= kMax) {
        val l = lp.get(word.substring(offs(i - k), offs(i)))
        val raw = dp(i - k) + (if (l == null) UniNeg else l.longValue)
        val cand = if (raw < UniClamp) UniClamp else raw
        if (cand > best || (cand == best && k > bestK)) {
          best = cand; bestK = k
        }
        k += 1
      }
      dp(i) = best
      back(i) = bestK
      i += 1
    }
    var out = List.empty[String]
    var p = n
    while (p > 0) {
      val k = back(p)
      out = word.substring(offs(p - k), offs(p)) :: out
      p -= k
    }
    out
  }

  /** Scaled log-prob map (piece → round(ln cnt,7)·1e7 − round(ln Σcnt,7)
    * ·1e7) from a `(piece, cnt)` model table — the bounded driver-side
    * state each EM round segments under, and the public bridge that
    * lets [[unigramFertility]] run under a trained [[unigramModel]].
    */
  def unigramLp(m: DataFrame): Map[String, Long] = {
    OpContract.requireCols(m, "TextOps.unigramLp", "piece", "cnt")
    val totRow = m.agg(ln7(sum(col("cnt")))).collect()(0)
    // empty model (empty corpus / all-blank text): sum(cnt) is NULL —
    // return the empty map so every word segments under the sentinel
    // instead of NPE-ing the whole trainer
    if (totRow.isNullAt(0)) return Map.empty
    val tot7 = totRow.getLong(0)
    m.select(col("piece"), ln7(col("cnt"))).collect()
      .map(r => r.getString(0) -> (r.getLong(1) - tot7)).toMap
  }

  /** The model map as the broadcast JVM HashMap the DP tasks read —
    * one place for the Map→HashMap conversion all three segmentation
    * entry points share.
    */
  private def bcastModel(sp: org.apache.spark.sql.SparkSession, model: Map[String, Long])
      : org.apache.spark.broadcast.Broadcast[java.util.HashMap[String, java.lang.Long]] = {
    val m = new java.util.HashMap[String, java.lang.Long]()
    model.foreach { case (k, v) => m.put(k, v) }
    sp.sparkContext.broadcast(m)
  }

  /** The trained unigram model itself — the full `(piece, cnt)` table
    * after `rounds` hard-EM rounds (what [[unigramTrain]] ranks and what
    * [[unigramFertility]] segments under). See [[unigramTrain]] for the
    * algorithm and determinism contract.
    */
  def unigramModel(docs: DataFrame, candN: Int = 500, maxPieceLen: Int = 3,
      rounds: Int = 2): DataFrame = {
    require(candN >= 1 && maxPieceLen >= 1 && maxPieceLen <= 4 &&
      rounds >= 1 && rounds <= 8,
      s"unigramModel: bad params ($candN, $maxPieceLen, $rounds)")
    val sp = docs.sparkSession
    import sp.implicits._
    // localCheckpoint, not cache: the vocabulary is read by the candidate
    // pass and by every EM round; checkpoint blocks are reclaimed by the
    // ContextCleaner once the returned plan is dropped (no unpersist
    // bookkeeping to leak — the GateMemo/ADVICE-r12 discipline)
    val w = spread(OpContract.requireCols(docs, "TextOps.unigramModel", "text"))
      .select(explode(words).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .localCheckpoint()
    val cand = w.select(col("freq"), explode(expr(
      s"""flatten(transform(sequence(1, length(word)), i ->
            transform(sequence(1, least($maxPieceLen, length(word) - i + 1)),
              k -> substring(word, i, k))))""")).as("piece"))
      .groupBy("piece").agg(sum(col("freq")).as("cnt"))
    // checkpoint each model table before unigramLp reads it: lp needs
    // TWO collects (total + pieces), and an unmaterialized plan would
    // re-run the candidate scan / the whole segmentation pass once per
    // collect — the checkpoint halves per-round cluster work
    val m0 = cand.orderBy(col("cnt").desc, col("piece")).limit(candN)
      .union(cand.filter(length(col("piece")) === 1))
      .distinct()
      .localCheckpoint()
    var model = unigramLp(m0)
    var counts: DataFrame = null
    var r = 1
    while (r <= rounds) {
      val bc = bcastModel(sp, model)
      val mpl = maxPieceLen
      counts = w.as[(String, Long)].mapPartitions { it =>
        val lp = bc.value
        it.flatMap { case (word, freq) =>
          viterbiPieces(word, lp, mpl).map(p => (p, freq)) }
      }.toDF("piece", "freq")
        .groupBy("piece").agg(sum(col("freq")).as("cnt"))
      if (r < rounds) {
        counts = counts.localCheckpoint()
        model = unigramLp(counts)
      }
      r += 1
    }
    counts
  }

  /** UNIGRAM-LM TOKENIZER TRAINING (Kudo '18, hard-EM/Viterbi variant),
    * distributed: build the candidate piece set from every substring of
    * length 1..`maxPieceLen` of the corpus vocabulary (occurrence-
    * weighted), keep the `candN` most frequent plus ALL single
    * characters (initial coverage), then run `rounds` alternating
    * steps: Viterbi-segment every DISTINCT word under the current
    * piece log-probs and re-estimate probabilities from the
    * frequency-weighted piece counts of those best segmentations.
    * Emits the `topK` surviving pieces: `(rank, piece, n_uses)` by
    * (n_uses DESC, piece).
    *
    * Model-selection determinism: candidate cut is (cnt DESC, piece)
    * — a total order; log-probs are round(ln,7)-scaled BIGINTs (one
    * rounded ln per piece per round, the [[ln7]] idiom); the DP and its
    * longest-piece tie-break are exact integer arithmetic, so the whole
    * trainer is value-oracled (the oracle unrolls each EM round as a
    * model CTE + a recursive Viterbi CTE carrying a 3-deep dp window +
    * best-path string). Pieces dropped by an EM round (every occurrence
    * absorbed into longer pieces) stay dropped — later DP rounds price
    * them with the shared [[UniNeg]] sentinel in both engines.
    *
    * Scale shape (the trainCentroids discipline): the corpus reduces
    * ONCE to the (word, freq) vocabulary; candidate extraction and both
    * E-steps run over that vocabulary-sized table, never raw tokens;
    * the model state collected to the driver between rounds is
    * ≤ candN + |alphabet| rows; per-round cluster work is one
    * mapPartitions projection + one map-side-combined count reduction.
    * Nothing corpus-sized ever shuffles.
    */
  def unigramTrain(docs: DataFrame, candN: Int = 500, maxPieceLen: Int = 3,
      rounds: Int = 2, topK: Int = 20): DataFrame =
    unigramTopK(unigramModel(docs, candN, maxPieceLen, rounds), topK)

  /** Rank a trained model's pieces: `(rank, piece, n_uses)` by
    * (n_uses DESC, piece) — split from [[unigramModel]] so a gate can
    * share ONE training between the train and fertility readouts.
    */
  def unigramTopK(model: DataFrame, topK: Int = 20): DataFrame = {
    OpContract.requireCols(model, "TextOps.unigramTopK", "piece", "cnt")
    val topWin = Window.orderBy(col("n_uses").desc, col("piece"))
    model.orderBy(col("cnt").desc, col("piece")).limit(topK)
      .select(col("piece"), col("cnt").as("n_uses"))
      .select(row_number().over(topWin).cast("long").as("rank"),
        col("piece"), col("n_uses"))
      .orderBy("rank")
  }

  /** Per-document token statistics under the TRAINED unigram model —
    * the [[bpeEncode]] readout for the other vocab family (same output
    * shape: `(doc_id, n_words, n_chars, n_tokens, compression)`, so
    * tokenizer A/B budget comparisons are a single join). Viterbi
    * segmentation per word occurrence with the dim-bounded log-prob map
    * broadcast; `compression` is tokens per character, ONE double
    * division of exact integer sums.
    *
    * Scale shape: shuffle-free mapPartitions projection; the only
    * exchange is the per-doc aggregation of three integer counters —
    * [[bpeEncode]]'s plan with the replace-chain swapped for the DP.
    */
  def unigramEncode(docs: DataFrame, model: Map[String, Long],
      maxPieceLen: Int = 3): DataFrame = {
    val sp = docs.sparkSession
    import sp.implicits._
    val d = spread(OpContract.requireCols(docs, "TextOps.unigramEncode",
      "doc_id", "text"))
    val bc = bcastModel(sp, model)
    val mpl = maxPieceLen
    d.select(col("doc_id"), explode(words).as("word"))
      .filter(length(col("word")) > 0)
      .as[(Long, String)]
      .mapPartitions { it =>
        val lp = bc.value
        it.map { case (id, word) =>
          // code points, not UTF-16 units — matches the oracle's length()
          (id, word.codePointCount(0, word.length).toLong,
            viterbiPieces(word, lp, mpl).size.toLong) }
      }
      .toDF("doc_id", "nc", "nt")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), sum(col("nc")).as("n_chars"),
        sum(col("nt")).as("n_tokens"))
      .withColumn("compression",
        col("n_tokens").cast("double") / col("n_chars").cast("double"))
  }

  /** Tokenizer fertility by source under the TRAINED unigram model —
    * the [[bpeFertility]] readout parameterized to the other vocab
    * family: Viterbi-segment each (doc, word) occurrence under `model`
    * (a piece → scaled-log-prob map, [[unigramTrain]]'s internal state
    * re-derivable from its published counts) and reduce tokens-per-word
    * per source. Same output shape as [[bpeFertility]], so vocab A/B
    * comparisons are a single union.
    *
    * Scale shape: segmentation is a shuffle-free mapPartitions over
    * (doc_id, word) projections with the dim-bounded model broadcast;
    * the only exchange is the per-source aggregation of three integer
    * counters.
    */
  def unigramFertility(docs: DataFrame, model: Map[String, Long],
      maxPieceLen: Int = 3, groupCol: String = "source"): DataFrame = {
    val sp = docs.sparkSession
    import sp.implicits._
    val d = spread(OpContract.requireCols(docs, "TextOps.unigramFertility",
      "doc_id", "text", groupCol))
    val bc = bcastModel(sp, model)
    val mpl = maxPieceLen
    d.filter(col(groupCol).isNotNull)
      .select(col(groupCol).cast("string").as("grp"), explode(words).as("word"))
      .filter(length(col("word")) > 0)
      .as[(String, String)]
      .mapPartitions { it =>
        val lp = bc.value
        it.map { case (grp, word) =>
          (grp, 1L, viterbiPieces(word, lp, mpl).size.toLong) }
      }
      .toDF("source", "n_words_one", "n_tok")
      .groupBy("source")
      .agg(sum(col("n_words_one")).as("n_words"), sum(col("n_tok")).as("n_tokens"))
      .select(col("source"), col("n_words"), col("n_tokens"),
        (col("n_tokens").cast("double") / col("n_words").cast("double"))
          .as("fertility"))
      .orderBy("source")
  }

  // ---- Persisted tokenizer artifacts (r14) ---------------------------
  //
  // Train-once / serve-many for the tokenizer families — the contract
  // the ANN index already honors ([[SimilarityOps.writeIvfIndex]]) and
  // the MinHash index pioneered ([[DedupOps.writeMinhashIndex]]):
  // GateMemo shares a training within one JVM session, but a production
  // pipeline restarts; the artifact is what survives the process.

  /** [[bpeTrain]] output → the ordered merge-pair list [[bpeEncode]] /
    * [[bpeFertility]] consume (training order = merge_round ASC; the
    * replace-chain fold is order-sensitive).
    */
  def bpeMergeSeq(merges: DataFrame): Seq[(String, String)] = {
    OpContract.requireCols(merges, "TextOps.bpeMergeSeq",
      "merge_round", "lhs", "rhs")
    merges.orderBy("merge_round").collect()
      .map(r => (r.getAs[String]("lhs"), r.getAs[String]("rhs"))).toSeq
  }

  /** Persist a trained tokenizer model: `model.parquet` (the BPE merge
    * table `(merge_round, lhs, rhs, pair_count)` or the unigram
    * `(piece, cnt)` table) plus a tiny `manifest` properties file
    * pinning the family and its segmentation parameter, written LAST by
    * atomic rename — a reader that sees the manifest sees a complete
    * artifact (the [[graft.sources.SnapshotStore]] `_latest`
    * discipline). Model tables are k-row driver state (merges ≤ 64,
    * pieces ≤ candN + alphabet), so the artifact is kilobytes at any
    * corpus scale.
    */
  def writeTokenizer(model: DataFrame, dir: String, family: String,
      maxPieceLen: Int = 3): Unit = {
    require(family == "bpe" || family == "unigram",
      s"writeTokenizer: family must be bpe|unigram, got $family")
    require(maxPieceLen >= 1 && maxPieceLen <= 4,
      s"writeTokenizer: maxPieceLen in [1,4], got $maxPieceLen")
    if (family == "bpe")
      OpContract.requireCols(model, "TextOps.writeTokenizer bpe",
        "merge_round", "lhs", "rhs", "pair_count")
    else
      OpContract.requireCols(model, "TextOps.writeTokenizer unigram",
        "piece", "cnt")
    model.write.mode("overwrite").parquet(s"$dir/model.parquet")
    val tmp = java.nio.file.Paths.get(dir, "_manifest.tmp")
    java.nio.file.Files.write(tmp,
      s"family=$family\nmax_piece_len=$maxPieceLen\nversion=1\n"
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.nio.file.Files.move(tmp, java.nio.file.Paths.get(dir, "manifest"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  /** Reload a persisted [[writeTokenizer]]: `(family, model, maxPieceLen)`
    * — feed the model to [[bpeMergeSeq]]→[[bpeEncode]]/[[bpeFertility]]
    * (family `bpe`) or [[unigramLp]]→[[unigramEncode]]/
    * [[unigramFertility]] with the manifest's maxPieceLen (family
    * `unigram`). Round-trip equality with a freshly trained model is
    * pinned in R14OpsSpec. Raises loudly on a missing/torn artifact
    * (no manifest = the write never committed).
    */
  def readTokenizer(spark: org.apache.spark.sql.SparkSession,
      dir: String): (String, DataFrame, Int) = {
    val mf = java.nio.file.Paths.get(dir, "manifest")
    require(java.nio.file.Files.exists(mf),
      s"readTokenizer: no manifest in $dir (incomplete or absent artifact)")
    val props = new java.util.Properties()
    val in = java.nio.file.Files.newInputStream(mf)
    try props.load(in) finally in.close()
    val family = props.getProperty("family")
    require(family == "bpe" || family == "unigram",
      s"readTokenizer: bad family '$family' in $dir/manifest")
    val mpl = props.getProperty("max_piece_len", "3").toInt
    (family, spark.read.parquet(s"$dir/model.parquet"), mpl)
  }

  /** `manifest` present = a complete [[writeTokenizer]] artifact lives
    * here — the "train or load?" probe for restart-safe pipelines.
    */
  def tokenizerExists(dir: String): Boolean =
    java.nio.file.Files.exists(java.nio.file.Paths.get(dir, "manifest"))
}
