package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gate bindings of the [[TextOps]] library surface to the driver's test
  * tables, plus the DuckDB oracle SQL for each. All algorithm/plan
  * documentation lives on the ops themselves; the only logic here is the
  * oracle-cost-bounding doc_id slices for tx_quality / tx_winnow and the
  * pinned sampling fractions.
  */
object TextQueries {
  import Tables._

  private val sqlStop = TextOps.stop.map(s => s"'$s'").mkString("(", ", ", ")")

  // ONE BPE training per (session, dir), shared by the three tokenizer
  // gates — see the tx_bpe_train gate comment and [[GateMemo]].
  private val bpeCache = new GateMemo("bpe_train")
  private def bpeMergesDf(s: SparkSession, d: String): DataFrame =
    bpeCache.cached(s, d) {
      TextOps.bpeTrain(t(s, d, "documents"), 3).orderBy("merge_round")
    }
  private def bpeMergePairs(s: SparkSession, d: String): Seq[(String, String)] =
    bpeMergesDf(s, d).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq

  // ONE unigram-LM training per (session, dir), shared by the train and
  // fertility gates (same GateMemo discipline as BPE/Lloyd).
  private val uniCache = new GateMemo("unigram_train")
  private def uniModelDf(s: SparkSession, d: String): DataFrame =
    uniCache.cached(s, d) {
      TextOps.unigramModel(t(s, d, "documents"), candN = 500,
        maxPieceLen = 3, rounds = 2)
    }
  // the maxPieceLen=4 variant (r14): pins the op's full documented bound
  // (require <= 4) against an oracle DP window of the same depth —
  // through r13 the oracle was hard-coded 3-deep, silently un-oracling
  // any maxPieceLen=4 caller (VERDICT r13 #6)
  private val uniCache4 = new GateMemo("unigram_train4")
  private def uniModelDf4(s: SparkSession, d: String): DataFrame =
    uniCache4.cached(s, d) {
      TextOps.unigramModel(t(s, d, "documents"), candN = 500,
        maxPieceLen = 4, rounds = 2)
    }

  /** One Viterbi-DP round of the unigram trainer as a DuckDB RECURSIVE
    * CTE (`v` under model `m`): each step extends every word by one
    * character position, carrying a `maxK`-deep dp window (d0..d{K−1} =
    * dp at pos, pos−1, …) plus the best-path piece string for each — so
    * the k∈{1..maxK}-piece transitions and the longest-piece-wins
    * tie-break (CASE priority k=maxK..1) mirror TextOps.viterbiPieces
    * exactly in BIGINT arithmetic (maxK=3 emits the r13 chain
    * verbatim-semantically; r14 parameterized it so the op's full
    * maxPieceLen ≤ 4 bound is oracle-able). Absent pieces price at the shared
    * −1e15 sentinel; out-of-range k slots at −2e15 and are guarded out
    * of the path CASE by the pos conditions; every candidate clamps at
    * the shared −4e17 floor (TextOps.UniClamp) so degenerate all-absent
    * words can never overflow BIGINT in either engine.
    */
  private def uniDpSql(v: String, m: String, maxK: Int = 3): String = {
    require(maxK >= 2 && maxK <= 6, s"uniDpSql: maxK in [2,6], got $maxK")
    val ks = 1 to maxK
    // the k-piece candidate ends at position pos+1, so it starts at
    // character pos + 2 - k (1-indexed substr) — k=1 -> pos+1 (the r13
    // literals), k=2 -> pos, k=3 -> pos-1
    def pos0(k: Int) =
      if (k == 1) "r.pos + 1" else if (k == 2) "r.pos" else s"r.pos - ${k - 2}"
    def sub(k: Int) = s"substr(r.word, CAST(${pos0(k)} AS INTEGER), $k)"
    val decl = ks.map(k => s"d${k - 1}, p${k - 1}").mkString(", ")
    val init = ks.tail
      .map(_ => "    CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR)")
      .mkString(",\n")
    val g = ks.map(k => s"c$k").mkString(", ")
    val arms = (maxK to 2 by -1).map { k =>
      val kw = if (k == maxK) "    CASE" else "        "
      s"""$kw WHEN pos >= ${k - 1} AND c$k = greatest($g)
         |           THEN p${k - 1} || chr(1) || s$k""".stripMargin
    }.mkString("\n")
    val shift = ks.dropRight(1).map(k => s"d${k - 1}, p${k - 1}").mkString(", ")
    val subs = ks.map(k => s"      ${sub(k)} AS s$k,").mkString("\n")
    val cands = ks.map { k =>
      if (k == 1)
        s"""      greatest(r.d0 + COALESCE(a1.lp, -1000000000000000),
           |               -400000000000000000) AS c1""".stripMargin
      else
        s"""      CASE WHEN r.pos >= ${k - 1}
           |           THEN greatest(r.d${k - 1} + COALESCE(a$k.lp, -1000000000000000),
           |                         -400000000000000000)
           |           ELSE -2000000000000000 END AS c$k""".stripMargin
    }.mkString(",\n")
    val joins = ks.map { k =>
      val cond = if (k == 1) s"a1.piece = ${sub(1)}"
      else s"r.pos >= ${k - 1} AND a$k.piece = ${sub(k)}"
      s"""    LEFT JOIN $m a$k
         |      ON $cond""".stripMargin
    }.mkString("\n")
    s"""$v(word, freq, pos, $decl) AS (
       |  SELECT word, freq, CAST(0 AS BIGINT), CAST(0 AS BIGINT), '',
       |$init FROM w
       |  UNION ALL
       |  SELECT word, freq, pos + 1, greatest($g),
       |$arms
       |         ELSE p0 || chr(1) || s1 END,
       |    $shift
       |  FROM (
       |    SELECT r.*,
       |$subs
       |$cands
       |    FROM $v r
       |$joins
       |    WHERE r.pos < length(r.word)))""".stripMargin
  }

  /** Piece counts of a finished DP round: split each word's best path on
    * the chr(1) separator, weight by word frequency. */
  private def uniCountSql(c: String, v: String): String =
    s"""$c AS (SELECT piece, CAST(SUM(freq) AS BIGINT) AS cnt FROM (
       |    SELECT freq, unnest(string_split(ltrim(p0, chr(1)), chr(1))) AS piece
       |    FROM $v WHERE pos = length(word)) GROUP BY piece)""".stripMargin

  /** Scaled log-probs from a (piece, cnt) model CTE — the TextOps.ln7
    * idiom: ONE round(ln,7) DECIMAL(12,7) per value, ×1e7 into BIGINT,
    * subtraction exact. */
  private def uniLpSql(m: String, c: String, tt: String): String =
    s"""$tt AS (SELECT CAST(CAST(round(ln(CAST(SUM(cnt) AS DOUBLE)), 7)
       |    AS DECIMAL(12,7)) * 10000000 AS BIGINT) AS lt FROM $c),
       |$m AS (SELECT piece,
       |    CAST(CAST(round(ln(CAST(cnt AS DOUBLE)), 7) AS DECIMAL(12,7))
       |      * 10000000 AS BIGINT) - (SELECT lt FROM $tt) AS lp
       |  FROM $c)""".stripMargin

  /** The shared head + two unrolled EM rounds of the unigram trainer
    * (mirrors TextOps.unigramModel with candN=500, maxPieceLen=3,
    * rounds=2): vocabulary `w`, substring candidates, the (cnt DESC,
    * piece) top-500 cut ∪ all single chars, then per round a model CTE
    * + recursive Viterbi CTE + count CTE. Ends at `c2t` = the trained
    * (piece, cnt) table.
    */
  private def uniChainSql(maxK: Int = 3): String =
    s"""w AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS freq FROM (
       |    SELECT unnest(string_split(text, ' ')) AS word FROM documents)
       |  WHERE length(word) > 0 GROUP BY word),
       |pp0 AS (SELECT word, freq,
       |    unnest(generate_series(1, length(word))) AS i FROM w),
       |pp1 AS (SELECT word, freq, i,
       |    unnest(generate_series(1, least($maxK, length(word) - i + 1))) AS k
       |  FROM pp0),
       |cand AS (SELECT substr(word, CAST(i AS INTEGER), CAST(k AS INTEGER))
       |      AS piece, CAST(SUM(freq) AS BIGINT) AS cnt
       |  FROM pp1 GROUP BY 1),
       |sel AS (SELECT piece, cnt FROM cand ORDER BY cnt DESC, piece LIMIT 500),
       |c0t AS (SELECT DISTINCT piece, cnt FROM (
       |    SELECT piece, cnt FROM sel
       |    UNION ALL SELECT piece, cnt FROM cand WHERE length(piece) = 1)),
       |${uniLpSql("m0", "c0t", "t0")},
       |${uniDpSql("v1", "m0", maxK)},
       |${uniCountSql("c1t", "v1")},
       |${uniLpSql("m1", "c1t", "t1")},
       |${uniDpSql("v2", "m1", maxK)},
       |${uniCountSql("c2t", "v2")}""".stripMargin

  /** The BPE trainer as a DuckDB CTE chain: vocabulary `w`, initial
    * framed encoding `e0`, then per round k a pair-count `pk`, argmax
    * `mk(merge_round, l, r, cnt)` and merged encoding `ek`. Mirrors
    * TextOps.bpeTrain block-for-block (chr(1) = the framing separator).
    */
  private def bpeChainSql(rounds: Int): String = {
    val head =
      """w AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS freq FROM (
        |    SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        |  WHERE length(word) > 0 GROUP BY word),
        |e0 AS (SELECT freq,
        |    regexp_replace(word, '(.)', chr(1) || '\1' || chr(1), 'g') AS enc
        |  FROM w)""".stripMargin
    val blocks = (1 to rounds).map { k =>
      s"""t$k AS (SELECT freq,
         |    string_split(trim(enc, chr(1)), chr(1) || chr(1)) AS t
         |  FROM e${k - 1}),
         |z$k AS (SELECT freq,
         |    unnest(list_zip(t[1:len(t)-1], t[2:len(t)])) AS p FROM t$k),
         |p$k AS (SELECT p[1] AS l, p[2] AS r, CAST(SUM(freq) AS BIGINT) AS cnt
         |  FROM z$k GROUP BY 1, 2),
         |m$k AS (SELECT $k AS merge_round, l, r, cnt FROM p$k
         |  ORDER BY cnt DESC, l, r LIMIT 1),
         |e$k AS (SELECT freq, replace(enc,
         |    chr(1) || m.l || chr(1) || chr(1) || m.r || chr(1),
         |    chr(1) || m.l || m.r || chr(1)) AS enc FROM e${k - 1}, m$k m)""".stripMargin
    }
    (head +: blocks).mkString(",\n")
  }
  private def markers = TextOps.markers

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "tx_token_stats" -> ((s, d) => TextOps.tokenStats(t(s, d, "documents"))),
    // Gate-determinism sorts live HERE, not in the library ops (the ops
    // return unordered relations; see DedupQueries note).
    "tx_quality" -> ((s, d) =>
      TextOps.quality(t(s, d, "documents").filter(col("doc_id") < 200))
        .orderBy("doc_id")),
    "tx_langid" -> ((s, d) => TextOps.langId(t(s, d, "documents"))),
    // Per-class precision/recall/F1 of the langid predictions against
    // the lang column — exact confusion counts, F1 in the
    // single-division 2tp/(2tp+fp+fn) form.
    "tx_langid_eval" -> ((s, d) =>
      AuditOps.classificationReport(
        TextOps.langPredictions(t(s, d, "documents")), "lang", "predicted")),
    // Chance-corrected agreement of the same predictions: raw accuracy
    // flatters a skewed class mix; kappa subtracts the marginal-chance
    // agreement. No FP products anywhere — two subtractions, three
    // divisions over exact integers.
    "tx_langid_kappa" -> ((s, d) =>
      AuditOps.kappaReport(
        TextOps.langPredictions(t(s, d, "documents")), "lang", "predicted")),
    // MATTR lexical diversity (w=20): per-window distinct counts fold
    // into one exact-integer fraction per doc.
    "tx_mattr" -> ((s, d) =>
      TextOps.mattr(t(s, d, "documents"), w = 20).orderBy("doc_id")),
    // Pooled Flesch Reading Ease per source: three exact regex counts,
    // two single divisions, round(.,12)-pinned multiply-subtract tail.
    "tx_readability" -> ((s, d) =>
      TextOps.readabilityReport(t(s, d, "documents"), "source")),
    // Label-free code-contamination screen per source: two exact regex
    // counts, integer cross-multiply flag, one division.
    "tx_code_detect" -> ((s, d) =>
      TextOps.codeDetectReport(t(s, d, "documents"), "source")),
    // Heaps'-law vocabulary-growth exponent across sources: one decimal
    // log-log point per source, the zipf least-squares contract.
    "tx_heaps" -> ((s, d) => TextOps.heapsFit(t(s, d, "documents"))),
    // Gopher rule filter: defaults (minWords 50 splits the 10–99-token
    // corpus; the stop/unique rules split on marker vocabulary / length).
    "tx_gopher_rules" -> ((s, d) =>
      TextOps.gopherRules(t(s, d, "documents")).orderBy("doc_id")),
    "tx_winnow" -> ((s, d) =>
      TextOps.winnow(t(s, d, "documents").filter(col("doc_id") < 200))),
    // Winnowing pair stage (MOSS): same oracle-cost-bounding doc slice as
    // tx_winnow (the per-doc window pass is the expensive SQL part).
    // minShared = 1 here — at the gate SFs' document lengths the MOSS
    // default of 3 matches nothing (a vacuous empty-vs-empty pass), while
    // >= 1 pins 80 real co-occurrence rows at sf0.01.
    "tx_winnow_pairs" -> ((s, d) =>
      TextOps.winnowPairs(t(s, d, "documents").filter(col("doc_id") < 200),
        minShared = 1).orderBy("doc_a", "doc_b")),
    "tx_repetition" -> ((s, d) => TextOps.repetition(t(s, d, "documents"))),
    // 2-word chunks so the rule actually fires on the synthetic corpus's
    // ~30-word vocabulary (5-word chunks are near-unique at this SF).
    "tx_chunk_dedup" -> ((s, d) =>
      TextOps.chunkDedup(t(s, d, "documents")).orderBy("doc_id")),
    // Content-defined chunking: boundaries from the 60-bit window hash
    // (maskBits=5 -> expected 32-token chunks, so the synthetic ~60-token
    // docs actually split; chunk text itself is oracle-compared).
    "tx_cdc_chunks" -> ((s, d) =>
      TextOps.cdcChunks(t(s, d, "documents"), window = 3, maskBits = 5)
        .orderBy("doc_id", "idx")),
    // The CDC dedup apply: ~8-token content-defined chunks (maskBits=3)
    // so the shared-boilerplate rule actually fires on the ~30-word
    // synthetic vocabulary; chunkDedup output contract, byte-pinned
    // rebuild digests.
    "tx_cdc_dedup" -> ((s, d) =>
      TextOps.cdcChunkDedup(t(s, d, "documents"), window = 3, maskBits = 3)
        .orderBy("doc_id")),
    "tx_mix_weights" -> ((s, d) => TextOps.mixWeights(t(s, d, "documents"))),
    "tx_mix_apply" -> ((s, d) => TextOps.applyMixture(t(s, d, "documents"))),
    // DSIR: target distribution = the src0 slice of the corpus.
    "tx_dsir" -> ((s, d) =>
      TextOps.dsirScores(t(s, d, "documents"), col("source") === "src0")
        .orderBy("doc_id")),
    // BM25 against a fixed three-term query over the corpus vocabulary.
    "tx_bm25" -> ((s, d) =>
      TextOps.bm25(t(s, d, "documents"), Seq("query", "spark", "table"))
        .orderBy("doc_id")),
    // Data-card report: every 10th doc re-appended so the duplicate
    // columns are non-vacuous (the dd_exact injection pattern — the base
    // table has no exact dups).
    "tx_corpus_report" -> ((s, d) => {
      val docs = t(s, d, "documents")
      TextOps.corpusReport(docs.unionAll(docs.filter(col("doc_id") % 10 === 0)))
    }),
    // Length-bucketed batch layout: padTo 16 over the 10-99-token test
    // docs spreads documents across ~7 buckets; 4 shards x 4-doc batches.
    "tx_length_buckets" -> ((s, d) =>
      TextOps.lengthBuckets(t(s, d, "documents"),
        padTo = 16, batchSize = 4, nShards = 4).orderBy("doc_id")),
    // Linear-model apply: a deterministic stand-in model (weight is a
    // fixed integer function of the feature id, in [-1, 1]) playing the
    // externally-trained classifier — what the op does with it is the
    // thing under test.
    "tx_score_linear" -> ((s, d) => {
      val model = s.range(256).select(col("id").as("feature"),
        ((col("id") * 37 % 2001 - 1000).cast("double") / 1000.0).as("weight"))
      TextOps.scoreLinear(t(s, d, "documents"), model).orderBy("doc_id")
    }),
    // The TRAIN side of scoreLinear: 3 batch-perceptron iterations over
    // the lang='en' label in the shared hashed feature space — pure
    // integer accumulators, one exact division at the end, the oracle an
    // unrolled 3-iteration CTE chain (the trained-Lloyd discipline).
    "tx_train_classifier" -> ((s, d) =>
      TextOps.trainPerceptron(t(s, d, "documents"), col("lang") === "en",
        buckets = 256, iters = 3).orderBy("feature")),
    // Normalization needs dirt to clean: inject case noise and runs of
    // whitespace (the tx_pii_redact injection pattern).
    "tx_normalize" -> ((s, d) =>
      TextOps.normalizeText(t(s, d, "documents").select(col("doc_id"),
        concat(upper(substring(col("text"), 1, 10)), lit("   "),
          col("text"), lit("  THE End ")).as("text"))).orderBy("doc_id")),
    "tx_topterms" -> ((s, d) => TextOps.topTerms(t(s, d, "documents"))),
    "tx_stratified_sample" -> ((s, d) =>
      TextOps.stratifiedSample(t(s, d, "documents"),
        Map("en" -> 0.25, "de" -> 1.0, "es" -> 1.0, "fr" -> 1.0, "zh" -> 1.0), 42L)),
    "tx_stratified_hash" -> ((s, d) =>
      TextOps.stratifiedSampleHash(t(s, d, "documents"),
        Map("en" -> 0.25, "de" -> 0.5, "es" -> 1.0, "fr" -> 0.75))),
    // Per-source cap: at most 3 docs per source, best by n_chars
    // (doc_id tie-break) — the "max N pages per domain" crawl rule.
    "tx_cap_per_source" -> ((s, d) =>
      TextOps.capPerGroup(t(s, d, "documents"), "source", col("n_chars"), 3)
        .select(col("doc_id"), col("source"), col("n_chars"))
        .orderBy("source", "doc_id")),
    "tx_train_val_test" -> ((s, d) => TextOps.trainValTest(t(s, d, "documents"))),
    "tx_fingerprint" -> ((s, d) => TextOps.bowFingerprint(t(s, d, "documents"))),
    // The test corpus carries no natural PII, so the binding plants a
    // deterministic email/ip/phone (round-robin by doc_id) before
    // redacting — the op then has real matches to count and mask, and the
    // oracle rebuilds the identical injected text.
    "tx_pii_redact" -> ((s, d) =>
      TextOps.redactPii(t(s, d, "documents").select(col("doc_id"), concat(
        col("text"),
        when(col("doc_id") % 3 === 0, concat(lit(" contact p"),
          col("doc_id").cast("string"), lit("@mail.example.com now"))).otherwise(lit("")),
        when(col("doc_id") % 3 === 1, concat(lit(" from 10."),
          (col("doc_id") % 250).cast("string"), lit(".0.1 logged"))).otherwise(lit("")),
        when(col("doc_id") % 3 === 2, concat(lit(" call +1415550"),
          lpad((col("doc_id") % 10000).cast("string"), 4, "0"), lit(" today")))
          .otherwise(lit(""))).as("text"))).orderBy("doc_id")),
    // Benchmark set = every 50th doc; the rest of the corpus is checked
    // for shared 3-grams against it.
    "tx_contamination" -> ((s, d) => {
      val docs = t(s, d, "documents")
      TextOps.contamination(
        docs.filter(col("doc_id") % 50 =!= 0),
        docs.filter(col("doc_id") % 50 === 0)).orderBy("doc_id")
    }),
    "tx_pack" -> ((s, d) =>
      TextOps.packSequences(t(s, d, "documents"), 256)
        .orderBy("lang", "pack_id", "doc_id")),
    // Retrieval chunking: 16-token windows overlapping by 4 — small
    // enough that sf0.01 docs split into several chunks each.
    "tx_chunk_text" -> ((s, d) =>
      TextOps.chunkText(t(s, d, "documents"), win = 16, overlap = 4)
        .orderBy("doc_id", "chunk_id")),
    "tx_weighted_sample" -> ((s, d) =>
      TextOps.weightedSample(t(s, d, "documents"), "n_chars", 20)),
    "tx_bpe_pairs" -> ((s, d) => TextOps.bpePairs(t(s, d, "documents"))),
    // Full BPE trainer: 3 merge rounds (each oracle round is a
    // count→argmax→replace CTE block, so the SQL cost is 3 corpus-vocab
    // passes — keep nMerges small at the gate; the op itself caps at 64).
    // Training runs ONCE per (session, dir) and is shared by the three
    // tokenizer gates (train / encode / fertility) via the same
    // GateMemo discipline as the trained-ANN trio (VERDICT r12 #2):
    // bpeTrain is deterministic (exact integer pair counts,
    // (cnt DESC, l, r) tie order), so the shared 3-row merge table is
    // bit-identical to what each gate trained alone — oracles untouched.
    "tx_bpe_train" -> ((s, d) => bpeMergesDf(s, d)),
    // Tokenize the corpus under the 3 learned merges: per-doc token
    // budget + compression. The merges collected here are bounded model
    // state (3 rows), the trainCentroids composition pattern.
    "tx_bpe_encode" -> ((s, d) =>
      TextOps.bpeEncode(t(s, d, "documents"), bpeMergePairs(s, d))
        .orderBy("doc_id")),
    // Tokenizer fertility by source under the same 3-merge vocab —
    // the domain-fit readout behind vocab allocation.
    "tx_bpe_fertility" -> ((s, d) =>
      TextOps.bpeFertility(t(s, d, "documents"), bpeMergePairs(s, d))),
    // Unigram-LM (SentencePiece-style) trainer: 2 hard-EM rounds over
    // the top-500 substring candidates ∪ all single chars — the other
    // tokenizer family next to BPE (Kudo '18). Training shared with the
    // fertility gate via GateMemo; fully value-oracled (each EM round
    // unrolls as a model CTE + recursive Viterbi CTE).
    "tx_unigram_train" -> ((s, d) => TextOps.unigramTopK(uniModelDf(s, d), 20)),
    // The maxPieceLen=4 trainer — same chain at the op's full documented
    // bound, oracled by the parameterized 4-deep DP window.
    "tx_unigram_train4" -> ((s, d) => TextOps.unigramTopK(uniModelDf4(s, d), 20)),
    // The bpe_encode readout under the trained unigram vocab: per-doc
    // token budget + compression (same shape, single-join tokenizer A/B).
    "tx_unigram_encode" -> ((s, d) =>
      TextOps.unigramEncode(t(s, d, "documents"),
        TextOps.unigramLp(uniModelDf(s, d))).orderBy("doc_id")),
    // The bpe_fertility readout parameterized to the unigram vocab —
    // tokens-per-word per source under the TRAINED unigram model.
    "tx_unigram_fertility" -> ((s, d) =>
      TextOps.unigramFertility(t(s, d, "documents"),
        TextOps.unigramLp(uniModelDf(s, d)))),

    "tx_bigram_ppl" -> ((s, d) =>
      TextOps.bigramPerplexity(t(s, d, "documents")).orderBy("doc_id")),
    "tx_trigram_ppl" -> ((s, d) =>
      TextOps.trigramPerplexity(t(s, d, "documents")).orderBy("doc_id")),
    "tx_token_entropy" -> ((s, d) =>
      TextOps.tokenEntropy(t(s, d, "documents")).orderBy("doc_id")),
    "tx_zipf" -> ((s, d) => TextOps.zipfSlope(t(s, d, "documents"))),

    // Per-doc shingle novelty (fresh-content scoring); sorted here, not
    // in the op.
    "tx_novelty" -> ((s, d) =>
      TextOps.noveltyReport(t(s, d, "documents")).orderBy("doc_id")),

    // Top-50 collocations by exact-integer lift (the no-libm PMI rank).
    "tx_pmi" -> ((s, d) =>
      TextOps.pmiCollocations(t(s, d, "documents"), minCount = 5L, k = 50)),

    // Epoch planner: a 1M-token budget split by the α=0.5 temperature
    // shares; languages with epochs > 1 are the data-constrained ones.
    "tx_mix_epochs" -> ((s, d) =>
      TextOps.mixEpochs(t(s, d, "documents"), budgetTokens = 1000000L)
        .orderBy("lang")),
    // Inverted-index TF-IDF cosine pairs over 3-word shingles: at sf0.01
    // the 25 survivors are exactly the minhash near-dup pairs — two
    // independent detectors agreeing on the truth set.
    "tx_tfidf_pairs" -> ((s, d) =>
      TextOps.tfidfPairs(t(s, d, "documents"))
        .orderBy("doc_a", "doc_b")))

  // BM25: constants interpolated from the same Scala doubles the Spark
  // expression uses (full-precision round-trip), factor association
  // mirrored operator-for-operator; per-(doc,term) scores decimal-fixed
  // at round 7 so the per-doc sums are order-independent. Shared with
  // the knn_rrf oracle (SimilarityQueries), which fuses this ranking.
  private[operators] lazy val bm25OracleSql: String = {
    val (k1, b) = (1.2, 0.75)
    s"""WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
      |dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id),
      |st AS (SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS BIGINT) AS total FROM dl),
      |tf AS (SELECT doc_id, w, COUNT(*) AS tf FROM toks
      |  WHERE w IN ('query', 'spark', 'table') GROUP BY doc_id, w),
      |dfq AS (SELECT w, COUNT(*) AS df FROM tf GROUP BY w),
      |sc AS (SELECT t.doc_id,
      |    CAST(round(ln((st.n_docs - q.df + 0.5) / (q.df + 0.5) + 1.0) *
      |      ((t.tf * ${k1 + 1}) / (t.tf + $k1 * (1.0 - $b + $b * CAST(l.dl AS DOUBLE) /
      |        (CAST(st.total AS DOUBLE) / st.n_docs)))), 7) AS DECIMAL(12, 7)) AS t
      |  FROM tf t JOIN dfq q ON q.w = t.w JOIN dl l ON l.doc_id = t.doc_id CROSS JOIN st)
      |SELECT doc_id, COUNT(*) AS n_terms, CAST(SUM(t) AS DOUBLE) AS bm25
      |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  private def sqlMarkerCount(ms: Seq[String]): String =
    s"len(list_filter(string_split(text, ' '), x -> x IN ${ms.map(m => s"'$m'").mkString("(", ", ", ")")}))"

  def oracleSql: Map[String, String] = Map(
    // α = 0.5 temperature weights: sqrt/÷ are correctly-rounded IEEE ops
    // (unlike general pow), so the weights value-oracle bit-for-bit.
    "tx_mix_weights" ->
      """WITH c AS (SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang),
        |n AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS n_total FROM c)
        |SELECT lang, n_docs, n_total,
        |  sqrt(CAST(n_total AS DOUBLE) / CAST(n_docs AS DOUBLE)) AS weight,
        |  sqrt(CAST(n_total * n_docs AS DOUBLE)) AS eff_docs
        |FROM c, n ORDER BY lang""".stripMargin,
    // Mixture APPLY: p_keep = sqrt(n_min/n_g) is division+sqrt over exact
    // integers (both correctly rounded — identical doubles cross-engine);
    // membership reuses the exact hash-uniform.
    "tx_mix_apply" -> {
      val u = s"CAST(${graft.functions.CrossHash.sqlMdint("'mix:' || CAST(doc_id AS VARCHAR)")} AS DOUBLE)" +
        " / 1152921504606846976.0"
      s"""WITH c AS (SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang),
        |mn AS (SELECT MIN(n_docs) AS n_min FROM c),
        |r AS (SELECT lang, n_docs,
        |    sqrt(CAST(n_min AS DOUBLE) / CAST(n_docs AS DOUBLE)) AS p_keep
        |  FROM c, mn),
        |k AS (SELECT d.lang, d.doc_id, r.n_docs, r.p_keep
        |  FROM documents d JOIN r ON d.lang = r.lang
        |  WHERE $u < r.p_keep)
        |SELECT lang, MAX(n_docs) AS n_docs, MAX(p_keep) AS p_keep,
        |  COUNT(*) AS n_kept, MIN(doc_id) AS min_kept, MAX(doc_id) AS max_kept
        |FROM k GROUP BY lang ORDER BY lang""".stripMargin
    },
    // A-ES weighted sample: key = (hash/2^60)^(1/n_chars); selection only
    // (keys not emitted) — see TextOps.weightedSample for the pow caveat.
    "tx_weighted_sample" -> {
      val u = s"CAST(${graft.functions.CrossHash.sqlMdint("'wsamp:' || CAST(doc_id AS VARCHAR)")} AS DOUBLE)" +
        " / 1152921504606846976.0"
      s"""SELECT doc_id, lang, n_chars FROM (
         |  SELECT doc_id, lang, n_chars FROM documents
         |  WHERE n_chars > 0
         |  ORDER BY pow($u, 1.0 / CAST(n_chars AS DOUBLE)) DESC, doc_id
         |  LIMIT 20) x
         |ORDER BY doc_id""".stripMargin
    },
    // Bigram-LM bits-per-token: per-DISTINCT-pair term round(−log₂ p, 7)
    // as DECIMAL, per-doc Σ cnt·t as exact decimals (order-free) — the
    // same reduced shape as the Spark side.
    "tx_bigram_ppl" ->
      """WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |uni AS (SELECT wx AS w1, COUNT(*) AS c1 FROM (
        |    SELECT unnest(w) AS wx FROM ws) GROUP BY wx),
        |v AS (SELECT COUNT(*) AS v FROM uni),
        |bg AS (SELECT doc_id, pair, COUNT(*) AS cnt FROM (
        |    SELECT doc_id, w[i] || ' ' || w[i+1] AS pair FROM (
        |      SELECT doc_id, w, unnest(range(1, len(w))) AS i
        |      FROM ws WHERE len(w) >= 2))
        |  GROUP BY doc_id, pair),
        |bc AS (SELECT pair, CAST(SUM(cnt) AS BIGINT) AS c12 FROM bg GROUP BY pair),
        |terms AS (SELECT bc.pair,
        |    CAST(round(-log2((bc.c12 + 1) / CAST(u.c1 + v.v AS DOUBLE)), 7)
        |      AS DECIMAL(12, 7)) AS t
        |  FROM bc JOIN uni u ON u.w1 = string_split(bc.pair, ' ')[1]
        |  CROSS JOIN v)
        |SELECT g.doc_id, CAST(SUM(g.cnt) AS BIGINT) AS n_bigrams,
        |  round(CAST(SUM(g.cnt * t.t) AS DOUBLE) / SUM(g.cnt), 6) AS bpt
        |FROM bg g JOIN terms t ON t.pair = g.pair
        |GROUP BY g.doc_id ORDER BY g.doc_id""".stripMargin,
    // Trigram-LM bits-per-token: the bigram-ppl discipline with the
    // fixed-λ Jelinek-Mercer mixture written as the SAME left-to-right
    // IEEE expression tree as the Spark side (0.6 etc. cast to DOUBLE so
    // DuckDB does not fall into decimal arithmetic on the λ literals).
    "tx_trigram_ppl" ->
      """WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |uni AS (SELECT wx AS w1, COUNT(*) AS c1 FROM (
        |    SELECT unnest(w) AS wx FROM ws) GROUP BY wx),
        |tot AS (SELECT CAST(SUM(c1) AS BIGINT) AS n FROM uni),
        |bgc AS (SELECT pair, COUNT(*) AS cb FROM (
        |    SELECT w[i] || ' ' || w[i+1] AS pair FROM (
        |      SELECT w, unnest(range(1, len(w))) AS i
        |      FROM ws WHERE len(w) >= 2))
        |  GROUP BY pair),
        |tg AS (SELECT doc_id, tri, COUNT(*) AS cnt FROM (
        |    SELECT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS tri FROM (
        |      SELECT doc_id, w, unnest(range(1, len(w) - 1)) AS i
        |      FROM ws WHERE len(w) >= 3))
        |  GROUP BY doc_id, tri),
        |tc AS (SELECT tri, CAST(SUM(cnt) AS BIGINT) AS c123 FROM tg GROUP BY tri),
        |parts AS (SELECT tri, c123, string_split(tri, ' ') AS p FROM tc),
        |terms AS (SELECT x.tri,
        |    CAST(round(-log2(
        |      CAST(0.6 AS DOUBLE) * x.c123 / b12.cb
        |      + CAST(0.3 AS DOUBLE) * b23.cb / u2.c1
        |      + CAST(0.1 AS DOUBLE) * u3.c1 / tot.n), 7)
        |      AS DECIMAL(12, 7)) AS t
        |  FROM parts x
        |  JOIN bgc b12 ON b12.pair = x.p[1] || ' ' || x.p[2]
        |  JOIN bgc b23 ON b23.pair = x.p[2] || ' ' || x.p[3]
        |  JOIN uni u2 ON u2.w1 = x.p[2]
        |  JOIN uni u3 ON u3.w1 = x.p[3]
        |  CROSS JOIN tot)
        |SELECT g.doc_id, CAST(SUM(g.cnt) AS BIGINT) AS n_trigrams,
        |  round(CAST(SUM(g.cnt * t.t) AS DOUBLE) / SUM(g.cnt), 6) AS bpt
        |FROM tg g JOIN terms t ON t.tri = g.tri
        |GROUP BY g.doc_id ORDER BY g.doc_id""".stripMargin,
    // Token entropy restructured as H = log2(n) − (Σ cnt·log2 cnt)/n
    // (r7 driver gate flipped a per-term round(−p·log2 p, 7) tie): libm
    // only touches log2(integer) on the few distinct counts, rounded once
    // into DECIMAL; the sum and /n (half-away integer division at scale
    // 7) are exact integer arithmetic. Emitted as BIGINT micro-bits
    // (ent_e7 = entropy·1e7, the emb_quantize integer convention) — the
    // r7/r8 driver reds were isolated to the battery's only DECIMAL(20,7)
    // output column (VERDICT r8), so no decimal leaves the query.
    "tx_token_entropy" ->
      """WITH wc AS (SELECT doc_id, w, COUNT(*) AS cnt FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
        |  GROUP BY doc_id, w),
        |ag AS (SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n,
        |    SUM(cnt * CAST(round(log2(CAST(cnt AS DOUBLE)), 7)
        |      AS DECIMAL(12, 7))) AS s
        |  FROM wc GROUP BY doc_id),
        |e AS (SELECT doc_id, n,
        |    CAST(CAST(round(log2(CAST(n AS DOUBLE)), 7) AS DECIMAL(12, 7))
        |        * 10000000 AS BIGINT)
        |      - (2 * CAST(s * 10000000 AS HUGEINT) + n) // (2 * n) AS ent7
        |  FROM ag)
        |SELECT doc_id, n AS n_tokens, CAST(ent7 AS BIGINT) AS ent_e7
        |FROM e ORDER BY doc_id""".stripMargin,
    // Zipf slope: x/y rounded(7) into DECIMAL so the four regression sums
    // are exact; numerator and denominator each rounded(6) as doubles
    // BEFORE the single division (absorbs FMA contraction of a·b − c·d),
    // final round(6). Rank ties pinned by (freq DESC, term).
    // sqrt fixed at 6 dp as decimal pre-sum; share/target/epochs mirrored
    // mul/div chains with no additions
    "tx_mix_epochs" ->
      """WITH tc AS (SELECT lang,
        |    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS avail_tokens
        |  FROM documents GROUP BY lang),
        |s AS (SELECT lang, avail_tokens,
        |    CAST(round(sqrt(CAST(avail_tokens AS DOUBLE)), 6) AS DECIMAL(18,6)) AS s6
        |  FROM tc),
        |t AS (SELECT CAST(SUM(s6) AS DECIMAL(28,6)) AS st FROM s)
        |SELECT s.lang, s.avail_tokens,
        |  CAST(s.s6 AS DOUBLE) / CAST(t.st AS DOUBLE) AS share,
        |  1000000.0 * (CAST(s.s6 AS DOUBLE) / CAST(t.st AS DOUBLE)) AS target_tokens,
        |  (1000000.0 * (CAST(s.s6 AS DOUBLE) / CAST(t.st AS DOUBLE)))
        |    / CAST(s.avail_tokens AS DOUBLE) AS epochs,
        |  (1000000.0 * (CAST(s.s6 AS DOUBLE) / CAST(t.st AS DOUBLE)))
        |    / CAST(s.avail_tokens AS DOUBLE) > 1.0 AS oversampled
        |FROM s, t ORDER BY lang""".stripMargin,

    // lift = n_ab·N/(c_a·c_b): HUGEINT products, one division; total
    // order (lift desc, w1, w2) makes the top-50 cut deterministic
    "tx_pmi" ->
      """WITH w AS (SELECT string_split(text, ' ') AS ws FROM documents),
        |bi AS (SELECT ws[i] AS w1, ws[i + 1] AS w2 FROM (
        |    SELECT ws, unnest(range(1, len(ws))) AS i FROM w)),
        |pairs AS (SELECT w1, w2, COUNT(*) AS n_ab FROM bi GROUP BY 1, 2),
        |l AS (SELECT w1, SUM(n_ab) AS c1 FROM pairs GROUP BY 1),
        |r AS (SELECT w2, SUM(n_ab) AS c2 FROM pairs GROUP BY 1),
        |t AS (SELECT CAST(SUM(n_ab) AS HUGEINT) AS nn FROM pairs)
        |SELECT p.w1, p.w2, CAST(p.n_ab AS BIGINT) AS n_ab,
        |  CAST(l.c1 AS BIGINT) AS c1, CAST(r.c2 AS BIGINT) AS c2,
        |  CAST(CAST(p.n_ab AS HUGEINT) * t.nn AS DOUBLE)
        |    / CAST(CAST(l.c1 AS HUGEINT) * r.c2 AS DOUBLE) AS lift
        |FROM pairs p JOIN l USING (w1) JOIN r USING (w2), t
        |WHERE p.n_ab >= 5
        |ORDER BY lift DESC, p.w1, p.w2 LIMIT 50""".stripMargin,

    // first-occurrence via min(doc_id) per 60-bit shingle hash (the
    // mirrored CrossHash); counts exact, one final division
    "tx_novelty" ->
      s"""WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         |sets AS (SELECT doc_id, ${DedupQueries.sqlShingles} AS sh
         |  FROM ws WHERE len(w) >= 3),
         |ex AS (SELECT doc_id, ${graft.functions.CrossHash.sqlMdint("sx")} AS h
         |  FROM (SELECT doc_id, unnest(sh) AS sx FROM sets)),
         |f AS (SELECT h, MIN(doc_id) AS first_doc FROM ex GROUP BY h)
         |SELECT ex.doc_id, COUNT(*) AS n_shingles,
         |  CAST(SUM(CASE WHEN f.first_doc = ex.doc_id THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_novel,
         |  CAST(SUM(CASE WHEN f.first_doc = ex.doc_id THEN 1 ELSE 0 END)
         |      AS DOUBLE)
         |    / CAST(COUNT(*) AS DOUBLE) AS novelty
         |FROM ex JOIN f USING (h) GROUP BY ex.doc_id ORDER BY doc_id""".stripMargin,

    "tx_zipf" ->
      """WITH tf AS (SELECT lang, term, COUNT(*) AS freq FROM (
        |    SELECT lang, unnest(string_split(text, ' ')) AS term FROM documents)
        |  GROUP BY lang, term),
        |rk AS (SELECT lang, freq,
        |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY freq DESC, term) AS rank
        |  FROM tf),
        |pts AS (SELECT lang,
        |    CAST(round(log2(CAST(rank AS DOUBLE)), 7) AS DECIMAL(12, 7)) AS x,
        |    CAST(round(log2(CAST(freq AS DOUBLE)), 7) AS DECIMAL(12, 7)) AS y
        |  FROM rk WHERE rank <= 50),
        |s AS (SELECT lang, COUNT(*) AS k_used, SUM(x) AS sx, SUM(y) AS sy,
        |    SUM(x * y) AS sxy, SUM(x * x) AS sxx
        |  FROM pts GROUP BY lang HAVING COUNT(*) >= 2)
        |SELECT lang, k_used,
        |  round(round(CAST(k_used AS DOUBLE) * CAST(sxy AS DOUBLE) -
        |      CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE), 6) /
        |    round(CAST(k_used AS DOUBLE) * CAST(sxx AS DOUBLE) -
        |      CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE), 6), 6) AS zipf_slope
        |FROM s ORDER BY lang""".stripMargin,
    // DSIR: identical 60-bit hash % 256 bucketing, Laplace-smoothed
    // log2 ratios rounded to 7 and fixed as DECIMAL(12,7) (exact sums any
    // order), one double division + round 6 — the bigram-ppl discipline.
    "tx_dsir" -> {
      val h = graft.functions.CrossHash.sqlMdint("w")
      s"""WITH tok AS (SELECT doc_id, source = 'src0' AS tgt, wx AS w FROM (
        |    SELECT doc_id, source, unnest(string_split(text, ' ')) AS wx FROM documents)),
        |hb AS (SELECT doc_id, tgt, $h % 256 AS b FROM tok),
        |pdb AS (SELECT doc_id, b, COUNT(*) AS cnt FROM hb GROUP BY doc_id, b),
        |tc AS (SELECT b, COUNT(*) AS tc FROM hb WHERE tgt GROUP BY b),
        |rc AS (SELECT b, COUNT(*) AS rc FROM hb GROUP BY b),
        |tn AS (SELECT COUNT(*) AS tn FROM hb WHERE tgt),
        |rn AS (SELECT COUNT(*) AS rn FROM hb),
        |bt AS (SELECT rc.b,
        |    CAST(round(log2(CAST(COALESCE(tc.tc, 0) + 1 AS DOUBLE) / CAST(tn.tn + 256 AS DOUBLE)) -
        |               log2(CAST(rc.rc + 1 AS DOUBLE) / CAST(rn.rn + 256 AS DOUBLE)), 7)
        |      AS DECIMAL(12, 7)) AS t
        |  FROM rc LEFT JOIN tc ON rc.b = tc.b CROSS JOIN tn CROSS JOIN rn)
        |SELECT p.doc_id, CAST(SUM(p.cnt) AS BIGINT) AS n_tokens,
        |  round(CAST(SUM(p.cnt * bt.t) AS DOUBLE) / SUM(p.cnt), 6) AS dsir
        |FROM pdb p JOIN bt ON bt.b = p.b
        |GROUP BY p.doc_id ORDER BY p.doc_id""".stripMargin
    },
    // Data card: same dup injection; every ratio a single division of
    // exact integers.
    "tx_corpus_report" ->
      """WITH base AS (
        |  SELECT * FROM documents
        |  UNION ALL SELECT * FROM documents WHERE doc_id % 10 = 0),
        |rows_ AS (SELECT source, lang, n_chars,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS tok,
        |    md5(text) AS digest FROM base)
        |SELECT source,
        |  COUNT(*) AS n_docs,
        |  COUNT(DISTINCT digest) AS n_unique,
        |  CAST(COUNT(*) - COUNT(DISTINCT digest) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE) AS dup_rate,
        |  CAST(SUM(tok) AS BIGINT) AS n_tokens,
        |  CAST(SUM(tok) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_tokens,
        |  COUNT(DISTINCT lang) AS n_langs,
        |  MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars
        |FROM rows_ GROUP BY source ORDER BY source""".stripMargin,
    // Length-bucket layout mirrored stage-for-stage; all-integer math
    // (padded-length buckets, shard-local ranks, per-batch waste), so
    // every column is bit-exact cross-engine.
    "tx_length_buckets" -> {
      val h = graft.functions.CrossHash.sqlMdint("CAST(doc_id AS VARCHAR)")
      s"""WITH tk AS (SELECT doc_id,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens FROM documents),
         |b AS (SELECT doc_id, n_tokens,
         |    ((n_tokens + 15) // 16) * 16 AS bucket,
         |    $h % 4 AS shard FROM tk),
         |r AS (SELECT b.*,
         |    (ROW_NUMBER() OVER (PARTITION BY bucket, shard ORDER BY doc_id) - 1) // 4
         |      AS batch_id FROM b)
         |SELECT doc_id, n_tokens, bucket, shard, batch_id,
         |  CAST(COUNT(*) OVER (PARTITION BY bucket, shard, batch_id) * bucket
         |    - SUM(n_tokens) OVER (PARTITION BY bucket, shard, batch_id) AS BIGINT) AS waste
         |FROM r ORDER BY doc_id""".stripMargin
    },
    // Linear-model apply: same stand-in model regenerated from
    // generate_series; weights decimal-fixed at (12,7) before the sums,
    // ONE cast to double at the end and no division — the emitted total
    // logit is bit-exact cross-engine.
    "tx_score_linear" -> {
      val h = graft.functions.CrossHash.sqlMdint("w")
      s"""WITH tok AS (SELECT doc_id, wx AS w FROM (
         |    SELECT doc_id, unnest(string_split(text, ' ')) AS wx FROM documents)),
         |pf AS (SELECT doc_id, $h % 256 AS feature, COUNT(*) AS cnt
         |       FROM tok GROUP BY doc_id, feature),
         |m AS (SELECT gs AS feature,
         |    CAST(round(CAST(gs * 37 % 2001 - 1000 AS DOUBLE) / 1000.0, 7)
         |      AS DECIMAL(12, 7)) AS t
         |  FROM generate_series(0, 255) g(gs))
         |SELECT p.doc_id, CAST(SUM(p.cnt) AS BIGINT) AS n_tokens,
         |  CAST(SUM(p.cnt * COALESCE(m.t, 0)) AS DOUBLE) AS score
         |FROM pf p LEFT JOIN m ON m.feature = p.feature
         |GROUP BY p.doc_id ORDER BY p.doc_id""".stripMargin
    },
    // Batch perceptron, 3 iterations unrolled (the trained-Lloyd CTE
    // pattern): iter 1 under zero weights misclassifies exactly the
    // positives; iters 2-3 score via the accumulated integer gradient,
    // fold the misclassified docs' y·cnt per bucket, and FULL OUTER
    // merge. All arithmetic BIGINT; ONE division at the end.
    "tx_train_classifier" -> {
      val h = graft.functions.CrossHash.sqlMdint("wx")
      s"""WITH lab AS (SELECT doc_id,
         |    CASE WHEN lang = 'en' THEN 1 ELSE -1 END AS y FROM documents),
         |tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS wx
         |        FROM documents),
         |pf AS (SELECT t.doc_id, CAST(l.y AS BIGINT) AS y, $h % 256 AS f,
         |         CAST(COUNT(*) AS BIGINT) AS cnt
         |       FROM tok t JOIN lab l ON l.doc_id = t.doc_id
         |       GROUP BY t.doc_id, l.y, f),
         |g1 AS (SELECT f, SUM(y * cnt) AS g FROM pf WHERE y = 1 GROUP BY f),
         |s2 AS (SELECT p.doc_id, p.y,
         |         SUM(p.cnt * CAST(COALESCE(a.g, 0) AS BIGINT)) AS s
         |       FROM pf p LEFT JOIN g1 a ON a.f = p.f
         |       GROUP BY p.doc_id, p.y),
         |m2 AS (SELECT doc_id FROM s2
         |       WHERE (y = 1 AND s <= 0) OR (y = -1 AND s > 0)),
         |d2 AS (SELECT p.f, SUM(p.y * p.cnt) AS g FROM pf p
         |       JOIN m2 ON m2.doc_id = p.doc_id GROUP BY p.f),
         |g2 AS (SELECT COALESCE(a.f, b.f) AS f,
         |         CAST(COALESCE(a.g, 0) + COALESCE(b.g, 0) AS BIGINT) AS g
         |       FROM g1 a FULL OUTER JOIN d2 b ON a.f = b.f),
         |s3 AS (SELECT p.doc_id, p.y,
         |         SUM(p.cnt * CAST(COALESCE(a.g, 0) AS BIGINT)) AS s
         |       FROM pf p LEFT JOIN g2 a ON a.f = p.f
         |       GROUP BY p.doc_id, p.y),
         |m3 AS (SELECT doc_id FROM s3
         |       WHERE (y = 1 AND s <= 0) OR (y = -1 AND s > 0)),
         |d3 AS (SELECT p.f, SUM(p.y * p.cnt) AS g FROM pf p
         |       JOIN m3 ON m3.doc_id = p.doc_id GROUP BY p.f),
         |g3 AS (SELECT COALESCE(a.f, b.f) AS f,
         |         CAST(COALESCE(a.g, 0) + COALESCE(b.g, 0) AS BIGINT) AS g
         |       FROM g2 a FULL OUTER JOIN d3 b ON a.f = b.f)
         |SELECT CAST(gs AS BIGINT) AS feature,
         |  CAST(CAST(COALESCE(g3.g, 0) * 1 AS DOUBLE) / 1000.0 AS DOUBLE)
         |    AS weight
         |FROM generate_series(0, 255) gg(gs)
         |LEFT JOIN g3 ON g3.f = gs ORDER BY feature""".stripMargin
    },
    "tx_bm25" -> bm25OracleSql,
    // Normalization: same injection, lower/collapse/trim in both dialects.
    "tx_normalize" ->
      """WITH inj AS (SELECT doc_id,
        |    upper(substring(text, 1, 10)) || '   ' || text || '  THE End ' AS text
        |  FROM documents),
        |n AS (SELECT doc_id, text,
        |    trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm FROM inj)
        |SELECT doc_id, CAST(length(text) AS BIGINT) AS n_raw,
        |  md5(norm) AS digest, CAST(length(norm) AS BIGINT) AS n_norm
        |FROM n ORDER BY doc_id""".stripMargin,
    "tx_bpe_pairs" ->
      """WITH vocab AS (
        |  SELECT word, COUNT(*) AS freq FROM (
        |    SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        |  GROUP BY word),
        |pairs AS (
        |  SELECT unnest(list_transform(range(1, length(word)),
        |      i -> substr(word, i, 2))) AS pair, freq
        |  FROM vocab WHERE length(word) >= 2),
        |pc AS (SELECT pair, CAST(SUM(freq) AS BIGINT) AS total
        |  FROM pairs GROUP BY pair)
        |SELECT rank, pair, total FROM (
        |  SELECT pair, total,
        |    ROW_NUMBER() OVER (ORDER BY total DESC, pair) AS rank
        |  FROM pc) x
        |WHERE rank <= 20 ORDER BY rank""".stripMargin,
    // BPE trainer mirrored round-for-round: each block counts adjacent
    // pairs over the separator-framed vocabulary (list_zip of the two
    // shifted slices), picks the argmax with the identical
    // (cnt DESC, l, r) tie order, and applies the merge as the SAME
    // doubled-separator replace the op uses — pure integer counts and
    // byte-identical string semantics, zero FP caveat.
    "tx_bpe_train" ->
      s"""WITH ${bpeChainSql(3)}
         |SELECT CAST(merge_round AS BIGINT) AS merge_round, l AS lhs,
         |  r AS rhs, cnt AS pair_count
         |FROM (SELECT * FROM m1 UNION ALL SELECT * FROM m2
         |      UNION ALL SELECT * FROM m3)
         |ORDER BY merge_round""".stripMargin,
    // Encode under the same learned merges: the m1..m3 one-row CTEs fold
    // into the per-(doc, word) replace chain, then per-doc integer sums.
    "tx_bpe_encode" ->
      s"""WITH ${bpeChainSql(3)},
         |dw AS (SELECT doc_id, word FROM (
         |    SELECT doc_id, unnest(string_split(text, ' ')) AS word
         |    FROM documents) WHERE length(word) > 0),
         |de0 AS (SELECT doc_id, CAST(length(word) AS BIGINT) AS nc,
         |    regexp_replace(word, '(.)', chr(1) || '\\1' || chr(1), 'g') AS e
         |  FROM dw),
         |de1 AS (SELECT doc_id, nc, replace(e,
         |    chr(1) || m.l || chr(1) || chr(1) || m.r || chr(1),
         |    chr(1) || m.l || m.r || chr(1)) AS e FROM de0, m1 m),
         |de2 AS (SELECT doc_id, nc, replace(e,
         |    chr(1) || m.l || chr(1) || chr(1) || m.r || chr(1),
         |    chr(1) || m.l || m.r || chr(1)) AS e FROM de1, m2 m),
         |de3 AS (SELECT doc_id, nc, replace(e,
         |    chr(1) || m.l || chr(1) || chr(1) || m.r || chr(1),
         |    chr(1) || m.l || m.r || chr(1)) AS e FROM de2, m3 m)
         |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
         |  CAST(SUM(nc) AS BIGINT) AS n_chars,
         |  CAST(SUM(len(string_split(trim(e, chr(1)), chr(1) || chr(1))))
         |    AS BIGINT) AS n_bpe_tokens,
         |  CAST(SUM(len(string_split(trim(e, chr(1)), chr(1) || chr(1))))
         |      AS DOUBLE) /
         |    CAST(SUM(nc) AS DOUBLE) AS compression
         |FROM de3 GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // Unigram trainer mirrored round-for-round: candidate cut, two
    // model/DP/count blocks, then rank the trained pieces. All-BIGINT
    // dp (one rounded ln per piece per round), recursive Viterbi with
    // the 3-deep window — see uniDpSql.
    "tx_unigram_train" ->
      s"""WITH RECURSIVE ${uniChainSql()}
         |SELECT CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, piece) AS BIGINT)
         |    AS rank, piece, cnt AS n_uses
         |FROM c2t ORDER BY rank LIMIT 20""".stripMargin,
    // the same chain with the candidate bound and DP window at 4
    "tx_unigram_train4" ->
      s"""WITH RECURSIVE ${uniChainSql(4)}
         |SELECT CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, piece) AS BIGINT)
         |    AS rank, piece, cnt AS n_uses
         |FROM c2t ORDER BY rank LIMIT 20""".stripMargin,
    // encode under the trained unigram model: ONE more Viterbi pass
    // (v3 under m2) over the vocabulary, then per-doc occurrence-weighted
    // integer sums; one division
    "tx_unigram_encode" ->
      s"""WITH RECURSIVE ${uniChainSql()},
         |${uniLpSql("m2", "c2t", "t2")},
         |${uniDpSql("v3", "m2")},
         |nt AS (SELECT word, CAST(length(word) AS BIGINT) AS nc,
         |    CAST(len(string_split(ltrim(p0, chr(1)), chr(1))) AS BIGINT)
         |      AS n_tok
         |  FROM v3 WHERE pos = length(word)),
         |dw AS (SELECT d.doc_id, ww.word FROM documents d,
         |    unnest(string_split(d.text, ' ')) AS ww(word)
         |  WHERE length(ww.word) > 0)
         |SELECT dw.doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
         |  CAST(SUM(nt.nc) AS BIGINT) AS n_chars,
         |  CAST(SUM(nt.n_tok) AS BIGINT) AS n_tokens,
         |  CAST(SUM(nt.n_tok) AS DOUBLE) / CAST(SUM(nt.nc) AS DOUBLE)
         |    AS compression
         |FROM dw JOIN nt ON nt.word = dw.word
         |GROUP BY dw.doc_id ORDER BY dw.doc_id""".stripMargin,
    // fertility under the trained unigram model: ONE more Viterbi pass
    // (v3 under m2) over the vocabulary, then per-source occurrence-
    // weighted tokens-per-word; one division
    "tx_unigram_fertility" ->
      s"""WITH RECURSIVE ${uniChainSql()},
         |${uniLpSql("m2", "c2t", "t2")},
         |${uniDpSql("v3", "m2")},
         |nt AS (SELECT word,
         |    CAST(len(string_split(ltrim(p0, chr(1)), chr(1))) AS BIGINT)
         |      AS n_tok
         |  FROM v3 WHERE pos = length(word)),
         |dw AS (SELECT d.source, ww.word FROM documents d,
         |    unnest(string_split(d.text, ' ')) AS ww(word)
         |  WHERE length(ww.word) > 0 AND d.source IS NOT NULL),
         |oc AS (SELECT source, word, CAST(COUNT(*) AS BIGINT) AS occ
         |  FROM dw GROUP BY 1, 2)
         |SELECT oc.source, CAST(SUM(oc.occ) AS BIGINT) AS n_words,
         |  CAST(SUM(oc.occ * nt.n_tok) AS BIGINT) AS n_tokens,
         |  CAST(SUM(oc.occ * nt.n_tok) AS DOUBLE) / CAST(SUM(oc.occ) AS DOUBLE)
         |    AS fertility
         |FROM oc JOIN nt ON nt.word = oc.word
         |GROUP BY oc.source ORDER BY oc.source""".stripMargin,
    // fertility: the tx_bpe_encode chain reduced per source; one division
    "tx_bpe_fertility" ->
      s"""WITH ${bpeChainSql(3)},
         |dw AS (SELECT d.doc_id, d.source, w.word FROM documents d,
         |    unnest(string_split(d.text, ' ')) AS w(word)
         |  WHERE length(w.word) > 0 AND d.source IS NOT NULL),
         |de0 AS (SELECT doc_id, source,
         |    regexp_replace(word, '(.)', chr(1) || '\\1' || chr(1), 'g') AS e
         |  FROM dw),
         |de1 AS (SELECT doc_id, source, replace(e,
         |    chr(1) || m.l || chr(1) || chr(1) || m.r || chr(1),
         |    chr(1) || m.l || m.r || chr(1)) AS e FROM de0, m1 m),
         |de2 AS (SELECT doc_id, source, replace(e,
         |    chr(1) || m.l || chr(1) || chr(1) || m.r || chr(1),
         |    chr(1) || m.l || m.r || chr(1)) AS e FROM de1, m2 m),
         |de3 AS (SELECT doc_id, source, replace(e,
         |    chr(1) || m.l || chr(1) || chr(1) || m.r || chr(1),
         |    chr(1) || m.l || m.r || chr(1)) AS e FROM de2, m3 m),
         |pd AS (SELECT doc_id, source, COUNT(*) AS n_words,
         |    SUM(len(string_split(trim(e, chr(1)), chr(1) || chr(1))))
         |      AS n_tok
         |  FROM de3 GROUP BY doc_id, source)
         |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(n_words) AS BIGINT) AS n_words,
         |  CAST(SUM(n_tok) AS BIGINT) AS n_bpe_tokens,
         |  CAST(SUM(n_tok) AS DOUBLE) / CAST(SUM(n_words) AS DOUBLE)
         |    AS fertility
         |FROM pd GROUP BY source ORDER BY source""".stripMargin,

    "tx_pii_redact" -> {
      val red = s"regexp_replace(regexp_replace(regexp_replace(text, " +
        s"'${TextOps.emailRe}', '<EMAIL>', 'g'), " +
        s"'${TextOps.ipv4Re}', '<IP>', 'g'), " +
        s"'${TextOps.phoneRe}', '<PHONE>', 'g')"
      s"""WITH inj AS (
         |  SELECT doc_id, text ||
         |    CASE WHEN doc_id % 3 = 0 THEN ' contact p' || CAST(doc_id AS VARCHAR)
         |      || '@mail.example.com now' ELSE '' END ||
         |    CASE WHEN doc_id % 3 = 1 THEN ' from 10.' || CAST(doc_id % 250 AS VARCHAR)
         |      || '.0.1 logged' ELSE '' END ||
         |    CASE WHEN doc_id % 3 = 2 THEN ' call +1415550'
         |      || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' today' ELSE '' END
         |      AS text
         |  FROM documents)
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(text, '${TextOps.emailRe}')) AS BIGINT) AS n_emails,
         |  CAST(len(regexp_extract_all(text, '${TextOps.ipv4Re}')) AS BIGINT) AS n_ips,
         |  CAST(len(regexp_extract_all(text, '${TextOps.phoneRe}')) AS BIGINT) AS n_phones,
         |  CAST(length($red) AS BIGINT) AS red_len,
         |  md5($red) AS red_md5
         |FROM inj ORDER BY doc_id""".stripMargin
    },
    "tx_contamination" -> {
      val sh3 = "list_distinct(list_transform(range(1, len(w) - 1), " +
        "i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))"
      s"""WITH bw AS (SELECT string_split(text, ' ') AS w FROM documents WHERE doc_id % 50 = 0),
         |bs AS (SELECT DISTINCT unnest($sh3) AS sh FROM bw WHERE len(w) >= 3),
         |cw AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents WHERE doc_id % 50 <> 0),
         |cs AS (SELECT doc_id, unnest($sh3) AS sh FROM cw WHERE len(w) >= 3)
         |SELECT cs.doc_id, COUNT(*) AS n_shared
         |FROM cs JOIN bs ON bs.sh = cs.sh
         |GROUP BY cs.doc_id ORDER BY cs.doc_id""".stripMargin
    },
    "tx_pack" ->
      """WITH x AS (
        |  SELECT lang, doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS tok
        |  FROM documents),
        |c AS (SELECT lang, doc_id, tok,
        |    CAST(COALESCE(SUM(tok) OVER (PARTITION BY lang ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cb
        |  FROM x),
        |s AS (SELECT lang, doc_id, tok, cb,
        |    unnest(generate_series(cb // 256, (cb + tok - 1) // 256)) AS pack_id
        |  FROM c)
        |SELECT lang, pack_id, doc_id,
        |  least((pack_id + 1) * 256, cb + tok) - greatest(pack_id * 256, cb) AS tokens_in_pack
        |FROM s ORDER BY lang, pack_id, doc_id""".stripMargin,
    // win=16 overlap=4 -> stride 12; chunk count = ceil((n-16)/12)+1
    // (1 when n <= 16), boundaries all-integer — identical arithmetic to
    // TextOps.chunkText. list_slice bounds are 1-based inclusive, clipped
    // explicitly with least(…, n) to match Spark's slice() clipping.
    "tx_chunk_text" ->
      """WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |sz AS (SELECT doc_id, w, CAST(len(w) AS BIGINT) AS n FROM ws),
        |ex AS (SELECT doc_id, w, n,
        |    unnest(range(0, CASE WHEN n <= 16 THEN 1
        |                        ELSE (n - 16 + 11) // 12 + 1 END)) AS k
        |  FROM sz)
        |SELECT doc_id, CAST(k AS BIGINT) AS chunk_id,
        |  array_to_string(list_slice(w, k * 12 + 1, least(k * 12 + 16, n)), ' ') AS chunk_text,
        |  least(16, n - k * 12) AS n_tokens
        |FROM ex ORDER BY doc_id, chunk_id""".stripMargin,
    // deterministic sampler: membership = hash(doc_id)/2^60 < fraction(lang);
    // same single long->double rounding + exact power-of-two scale both
    // engines, so the SAMPLE ITSELF is reproduced, not just its size
    "tx_stratified_hash" ->
      s"""WITH s AS (
         |  SELECT lang, doc_id FROM documents
         |  WHERE CAST(${graft.functions.CrossHash.sqlMdint("'strat:' || CAST(doc_id AS VARCHAR)")} AS DOUBLE)
         |      / 1152921504606846976.0
         |    < CASE lang WHEN 'en' THEN 0.25 WHEN 'de' THEN 0.5
         |        WHEN 'es' THEN 1.0 WHEN 'fr' THEN 0.75 ELSE 0.0 END)
         |SELECT lang, COUNT(*) AS n_sampled, MIN(doc_id) AS min_doc,
         |  MAX(doc_id) AS max_doc
         |FROM s GROUP BY lang ORDER BY lang""".stripMargin,
    "tx_cap_per_source" ->
      """SELECT doc_id, source, n_chars FROM (
        |  SELECT doc_id, source, n_chars,
        |    ROW_NUMBER() OVER (PARTITION BY source
        |      ORDER BY n_chars DESC, doc_id) AS rn
        |  FROM documents) x
        |WHERE rn <= 3 ORDER BY source, doc_id""".stripMargin,
    "tx_topterms" ->
      """WITH tw AS (SELECT DISTINCT lang, doc_id, term FROM (
        |    SELECT lang, doc_id, unnest(string_split(text, ' ')) AS term
        |    FROM documents)),
        |df AS (SELECT lang, term, COUNT(*) AS df FROM tw GROUP BY lang, term)
        |SELECT lang, rank, term, df FROM (
        |  SELECT lang, term, df,
        |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY df DESC, term) AS rank
        |  FROM df) x
        |WHERE rank <= 10 ORDER BY lang, rank""".stripMargin,
    "tx_repetition" ->
      """WITH ws AS (SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents),
        |sh AS (SELECT doc_id, lang,
        |    unnest(list_transform(range(1, len(w) - 1), i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS shingle
        |  FROM ws WHERE len(w) >= 3),
        |pc AS (SELECT doc_id, lang, shingle, COUNT(*) AS cnt FROM sh GROUP BY 1, 2, 3),
        |pd AS (SELECT doc_id, lang, SUM(cnt) AS total, COUNT(*) AS uniq FROM pc GROUP BY 1, 2)
        |SELECT lang, COUNT(*) AS n_docs,
        |  CAST(SUM(total) AS BIGINT) AS total_shingles,
        |  CAST(SUM(total - uniq) AS BIGINT) AS dup_shingles,
        |  CAST(SUM(total - uniq) AS DOUBLE) / CAST(SUM(total) AS DOUBLE) AS dup_ratio,
        |  CAST(SUM(CASE WHEN CAST(total - uniq AS DOUBLE) / CAST(total AS DOUBLE) >= 0.2
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged
        |FROM pd GROUP BY lang ORDER BY lang""".stripMargin,
    // MATTR: sliding windows as 1-based inclusive list slices; the mean
    // of per-window TTRs folds into ONE division of exact integers
    // (common denominator n_windows·w); short docs = whole-doc TTR.
    "tx_mattr" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |n AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n FROM d),
        |s AS (SELECT doc_id, n AS n_tokens, CAST(1 AS BIGINT) AS n_windows,
        |    CAST(len(list_distinct(toks)) AS DOUBLE) / CAST(n AS DOUBLE) AS mattr
        |  FROM n WHERE n < 20),
        |l AS (SELECT doc_id, n,
        |    CAST(len(list_distinct(toks[i:i+19])) AS BIGINT) AS dcount
        |  FROM n, unnest(generate_series(1, CAST(n - 19 AS BIGINT))) AS t(i)
        |  WHERE n >= 20),
        |a AS (SELECT doc_id, CAST(MAX(n) AS BIGINT) AS n_tokens,
        |    CAST(COUNT(*) AS BIGINT) AS n_windows,
        |    CAST(SUM(dcount) AS BIGINT) AS sd FROM l GROUP BY doc_id)
        |SELECT doc_id, n_tokens, n_windows,
        |  CAST(sd AS DOUBLE) / CAST(n_windows * 20 AS DOUBLE) AS mattr FROM a
        |UNION ALL
        |SELECT doc_id, n_tokens, n_windows, mattr FROM s
        |ORDER BY doc_id""".stripMargin,
    // Heaps: per-source token totals + hash-distinct vocabulary, log2
    // rounded once into DECIMAL(12,7), the zipf round(.,6) num/den
    // slope, the FMA-shaped intercept round(.,6)-pinned
    "tx_heaps" -> {
      val h = graft.functions.CrossHash.sqlMdint("w")
      s"""WITH tok AS (SELECT source, unnest(string_split(text, ' ')) AS w
         |  FROM documents),
         |per AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS tt,
         |    CAST(COUNT(DISTINCT $h) AS BIGINT) AS vt
         |  FROM tok GROUP BY source),
         |pts AS (SELECT
         |    CAST(round(log2(CAST(tt AS DOUBLE)), 7) AS DECIMAL(12, 7)) AS x,
         |    CAST(round(log2(CAST(vt AS DOUBLE)), 7) AS DECIMAL(12, 7)) AS y
         |  FROM per),
         |m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(x) AS sx,
         |    SUM(y) AS sy, SUM(x * y) AS sxy, SUM(x * x) AS sxx
         |  FROM pts),
         |b AS (SELECT n, sx, sy,
         |    round(round(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
         |        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE), 6)
         |      / round(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
         |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE), 6), 6) AS beta
         |  FROM m WHERE n >= 2)
         |SELECT n AS n_sources, beta,
         |  round((CAST(sy AS DOUBLE) - beta * CAST(sx AS DOUBLE))
         |    / CAST(n AS DOUBLE), 6) AS log2_k
         |FROM b""".stripMargin
    },
    // code screen: identical character-class / \b-alternation semantics
    // in Java regex and RE2; the flag is integer cross-multiplication
    "tx_code_detect" ->
      """WITH d AS (SELECT CAST(source AS VARCHAR) AS grp, n_chars,
        |    CAST(len(regexp_extract_all(text, '[{}();=<>]')) AS BIGINT)
        |      AS n_sym,
        |    CAST(len(regexp_extract_all(text,
        |      '\b(def|class|import|return|function|var|const|if|else|for|while)\b'))
        |      AS BIGINT) AS n_kw
        |  FROM documents),
        |f AS (SELECT grp, n_sym, n_kw,
        |    (50 * n_sym > n_chars OR n_kw >= 2) AS is_code FROM d)
        |SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(CASE WHEN is_code THEN 1 ELSE 0 END) AS BIGINT) AS n_code,
        |  CAST(SUM(n_sym) AS BIGINT) AS sym_total,
        |  CAST(SUM(n_kw) AS BIGINT) AS kw_total,
        |  CAST(SUM(CASE WHEN is_code THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE) AS code_frac
        |FROM f GROUP BY grp ORDER BY grp""".stripMargin,
    // Flesch on pooled group totals: regexp_count ↔ len(regexp_extract_all)
    // on character-class-only patterns, the FMA-shaped tail round(.,12)
    // in both engines
    "tx_readability" ->
      """WITH d AS (SELECT CAST(source AS VARCHAR) AS grp,
        |    CAST(len(regexp_extract_all(lower(text), '[a-z]+')) AS BIGINT) AS w,
        |    GREATEST(CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT),
        |      1) AS s,
        |    CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT)
        |      AS y
        |  FROM documents)
        |SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(w) AS BIGINT) AS words,
        |  CAST(SUM(s) AS BIGINT) AS sentences,
        |  CAST(SUM(y) AS BIGINT) AS syllables,
        |  CASE WHEN SUM(w) > 0 THEN round(206.835
        |    - 1.015*(CAST(SUM(w) AS DOUBLE)/CAST(SUM(s) AS DOUBLE))
        |    - 84.6*(CAST(SUM(y) AS DOUBLE)/CAST(SUM(w) AS DOUBLE)), 12)
        |  END AS flesch
        |FROM d GROUP BY grp ORDER BY grp""".stripMargin,
    "tx_token_stats" ->
      """WITH x AS (
        |  SELECT lang, n_chars,
        |    len(string_split(text, ' ')) AS ws_tokens,
        |    len(list_filter(regexp_split_to_array(text, '[^a-z0-9]+'), x -> x <> '')) AS re_tokens,
        |    len(list_distinct(string_split(text, ' '))) AS uniq_tokens
        |  FROM documents)
        |SELECT lang, COUNT(*) AS n_docs,
        |  CAST(SUM(ws_tokens) AS DOUBLE) / COUNT(*) AS avg_tokens,
        |  CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars,
        |  CAST(SUM(re_tokens) AS BIGINT) AS total_re_tokens,
        |  CAST(SUM(uniq_tokens) AS DOUBLE) / CAST(SUM(ws_tokens) AS DOUBLE) AS distinct_ratio
        |FROM x GROUP BY lang ORDER BY lang""".stripMargin,
    "tx_quality" ->
      s"""WITH x AS (
         |  SELECT doc_id,
         |    len(string_split(text, ' ')) AS n_tokens,
         |    CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) / len(string_split(text, ' ')) AS ttr,
         |    CAST(len(list_filter(string_split(text, ' '), x -> x IN $sqlStop)) AS DOUBLE) / len(string_split(text, ' ')) AS stop_ratio,
         |    CAST(length(replace(text, ' ', '')) AS DOUBLE) / len(string_split(text, ' ')) AS avg_word_len
         |  FROM documents WHERE doc_id < 200)
         |SELECT doc_id, n_tokens, ttr, stop_ratio, avg_word_len,
         |  ttr * 0.5 + stop_ratio * 0.2 +
         |    (CASE WHEN n_tokens >= 30 AND n_tokens <= 120 THEN 0.3 ELSE 0.0 END) AS quality_score
         |FROM x ORDER BY doc_id""".stripMargin,
    // Gopher rules: same integer cross-multiplications as the op — the
    // distinct-stopword count is a Σ of list_contains CASEs over the
    // fixed 6-word list, so no FP appears anywhere on either side.
    "tx_gopher_rules" -> {
      val stopSum = TextOps.stop
        .map(s => s"(CASE WHEN list_contains(w, '$s') THEN 1 ELSE 0 END)")
        .mkString(" + ")
      s"""WITH g AS (
         |  SELECT doc_id, string_split(text, ' ') AS w,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
         |    CAST(length(replace(text, ' ', '')) AS BIGINT) AS chars,
         |    CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_uniq
         |  FROM documents),
         |r AS (SELECT doc_id, n_words,
         |    n_words >= 50 AND n_words <= 100000 AS r_word_count,
         |    chars >= 3 * n_words AND chars <= 10 * n_words AS r_mean_len,
         |    ($stopSum) >= 2 AS r_stop,
         |    2 * n_uniq >= n_words AS r_unique
         |  FROM g)
         |SELECT doc_id, n_words, r_word_count, r_mean_len, r_stop, r_unique,
         |  r_word_count AND r_mean_len AND r_stop AND r_unique AS pass
         |FROM r ORDER BY doc_id""".stripMargin
    },
    "tx_langid" ->
      s"""WITH h AS (
         |  SELECT lang,
         |    ${sqlMarkerCount(markers(0)._2)} AS c_en,
         |    ${sqlMarkerCount(markers(1)._2)} AS c_de,
         |    ${sqlMarkerCount(markers(2)._2)} AS c_es,
         |    ${sqlMarkerCount(markers(3)._2)} AS c_fr
         |  FROM documents)
         |SELECT lang,
         |  CASE WHEN c_en >= greatest(c_de, c_es, c_fr) THEN 'en'
         |       WHEN c_de >= greatest(c_es, c_fr) THEN 'de'
         |       WHEN c_es >= c_fr THEN 'es'
         |       ELSE 'fr' END AS predicted,
         |  COUNT(*) AS n_docs
         |FROM h GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // kappa over the same prediction CTE: exact marginal products,
    // p_o/p_e single divisions, the correction pure subtract/divide
    "tx_langid_kappa" ->
      s"""WITH h AS (
         |  SELECT lang,
         |    ${sqlMarkerCount(markers(0)._2)} AS c_en,
         |    ${sqlMarkerCount(markers(1)._2)} AS c_de,
         |    ${sqlMarkerCount(markers(2)._2)} AS c_es,
         |    ${sqlMarkerCount(markers(3)._2)} AS c_fr
         |  FROM documents),
         |pr AS (SELECT lang AS a,
         |  CASE WHEN c_en >= greatest(c_de, c_es, c_fr) THEN 'en'
         |       WHEN c_de >= greatest(c_es, c_fr) THEN 'de'
         |       WHEN c_es >= c_fr THEN 'es'
         |       ELSE 'fr' END AS b
         |  FROM h WHERE lang IS NOT NULL),
         |m AS (SELECT a, b, CAST(COUNT(*) AS BIGINT) AS cnt
         |  FROM pr GROUP BY a, b),
         |ra AS (SELECT a, CAST(SUM(cnt) AS BIGINT) AS ra FROM m GROUP BY a),
         |cb AS (SELECT b AS a, CAST(SUM(cnt) AS BIGINT) AS cb
         |  FROM m GROUP BY b),
         |pe AS (SELECT CAST(SUM(CAST(ra.ra AS HUGEINT) * cb.cb) AS HUGEINT)
         |    AS penum FROM ra JOIN cb USING (a)),
         |t AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n,
         |    CAST(SUM(CASE WHEN a = b THEN cnt ELSE 0 END) AS BIGINT)
         |      AS agree FROM m),
         |x AS (SELECT t.n, t.agree AS n_agree,
         |    CAST(t.agree AS DOUBLE) / CAST(t.n AS DOUBLE) AS po,
         |    CAST(COALESCE(pe.penum, 0) AS DOUBLE)
         |      / CAST(CAST(t.n AS HUGEINT) * t.n AS DOUBLE) AS pe
         |  FROM t, pe)
         |SELECT n, n_agree, po, pe,
         |  CASE WHEN pe < 1.0 THEN (po - pe) / (1.0 - pe) END AS kappa
         |FROM x""".stripMargin,
    // per-class eval over the same per-doc prediction CTE: exact
    // confusion sums over the bounded matrix, single-division F1
    "tx_langid_eval" ->
      s"""WITH h AS (
         |  SELECT lang,
         |    ${sqlMarkerCount(markers(0)._2)} AS c_en,
         |    ${sqlMarkerCount(markers(1)._2)} AS c_de,
         |    ${sqlMarkerCount(markers(2)._2)} AS c_es,
         |    ${sqlMarkerCount(markers(3)._2)} AS c_fr
         |  FROM documents),
         |pr AS (SELECT lang AS a,
         |  CASE WHEN c_en >= greatest(c_de, c_es, c_fr) THEN 'en'
         |       WHEN c_de >= greatest(c_es, c_fr) THEN 'de'
         |       WHEN c_es >= c_fr THEN 'es'
         |       ELSE 'fr' END AS p
         |  FROM h WHERE lang IS NOT NULL),
         |m AS (SELECT a, p, CAST(COUNT(*) AS BIGINT) AS cnt
         |  FROM pr GROUP BY a, p),
         |ba AS (SELECT a AS label,
         |    CAST(SUM(CASE WHEN a = p THEN cnt ELSE 0 END) AS BIGINT) AS tp,
         |    CAST(SUM(CASE WHEN a <> p THEN cnt ELSE 0 END) AS BIGINT) AS fn
         |  FROM m GROUP BY a),
         |bp AS (SELECT p AS label,
         |    CAST(SUM(CASE WHEN a <> p THEN cnt ELSE 0 END) AS BIGINT) AS fp
         |  FROM m GROUP BY p),
         |f AS (SELECT COALESCE(ba.label, bp.label) AS label,
         |    COALESCE(tp, 0) AS tp, COALESCE(fp, 0) AS fp,
         |    COALESCE(fn, 0) AS fn
         |  FROM ba FULL OUTER JOIN bp ON ba.label = bp.label)
         |SELECT label, CAST(tp + fn AS BIGINT) AS support,
         |  CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
         |  CAST(fn AS BIGINT) AS fn,
         |  CASE WHEN tp + fp > 0
         |    THEN CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE) END AS precision,
         |  CASE WHEN tp + fn > 0
         |    THEN CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE) END AS recall,
         |  CASE WHEN 2*tp + fp + fn > 0 THEN CAST(2*tp AS DOUBLE)
         |    / CAST(2*tp + fp + fn AS DOUBLE) END AS f1
         |FROM f ORDER BY label""".stripMargin,
    "tx_winnow" ->
      s"""WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents WHERE doc_id < 200),
        |sh0 AS (SELECT doc_id, unnest(range(1, len(w) - 1)) AS i, w FROM ws WHERE len(w) >= 3),
        |sh AS (SELECT doc_id, i - 1 AS pos,
        |    ${graft.functions.CrossHash.sqlMdint("w[i] || ' ' || w[i+1] || ' ' || w[i+2]")} AS h
        |  FROM sh0),
        |wm AS (SELECT doc_id, MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
        |    ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS winmin FROM sh),
        |fp AS (SELECT DISTINCT doc_id, winmin FROM wm),
        |pc AS (SELECT doc_id, COUNT(*) AS n_fingerprints FROM fp GROUP BY doc_id)
        |SELECT COUNT(*) AS n_docs, CAST(SUM(n_fingerprints) AS BIGINT) AS total_fps,
        |  MIN(n_fingerprints) AS min_fps, MAX(n_fingerprints) AS max_fps
        |FROM pc""".stripMargin,
    // Winnowing pair stage: same fingerprint CTEs as tx_winnow (with lang
    // carried through), inverted-index co-occurrence counts; the >= 3 gate
    // is exact integer, overlap one division of exact integers.
    "tx_winnow_pairs" ->
      s"""WITH ws AS (SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents WHERE doc_id < 200),
        |sh0 AS (SELECT doc_id, lang, unnest(range(1, len(w) - 1)) AS i, w FROM ws WHERE len(w) >= 3),
        |sh AS (SELECT doc_id, lang, i - 1 AS pos,
        |    ${graft.functions.CrossHash.sqlMdint("w[i] || ' ' || w[i+1] || ' ' || w[i+2]")} AS h
        |  FROM sh0),
        |wm AS (SELECT doc_id, lang, MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
        |    ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS winmin FROM sh),
        |fp AS (SELECT DISTINCT doc_id, lang, winmin FROM wm),
        |pc AS (SELECT doc_id, COUNT(*) AS nfp FROM fp GROUP BY doc_id),
        |pair AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS shared
        |  FROM fp a JOIN fp b ON a.lang = b.lang AND a.winmin = b.winmin
        |    AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id)
        |SELECT doc_a, doc_b, shared, pa.nfp AS fp_a, pb.nfp AS fp_b,
        |  CAST(shared AS DOUBLE) / least(pa.nfp, pb.nfp) AS overlap
        |FROM pair JOIN pc pa ON pa.doc_id = doc_a JOIN pc pb ON pb.doc_id = doc_b
        |WHERE shared >= 1 ORDER BY doc_a, doc_b""".stripMargin,
    // CDC: identical window hash (60-bit md5 family), identical 1-based
    // inclusive slices; range(w, n+1) = sequence(w, n); list_sort guards
    // DuckDB's list_distinct order while Spark's array_distinct is
    // order-preserving over the already-sorted edge array.
    "tx_cdc_chunks" ->
      s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        |            WHERE len(string_split(text, ' ')) >= 1),
        |e AS (SELECT doc_id, toks,
        |    list_sort(list_distinct(list_concat(list_concat(
        |      [CAST(0 AS BIGINT)],
        |      list_filter(range(3, len(toks) + 1), i ->
        |        (${graft.functions.CrossHash.sqlMdint(
                   "array_to_string(toks[(i-2):i], ' ')")} & 31) = 0)),
        |      [CAST(len(toks) AS BIGINT)]))) AS edges
        |  FROM d),
        |c AS (SELECT doc_id, toks, edges,
        |    unnest(range(1, len(edges))) AS j FROM e)
        |SELECT doc_id, CAST(j - 1 AS BIGINT) AS idx,
        |  CAST(edges[CAST(j + 1 AS INT)] - edges[CAST(j AS INT)] AS BIGINT)
        |    AS n_tokens_chunk,
        |  array_to_string(
        |    toks[CAST(edges[CAST(j AS INT)] + 1 AS INT):CAST(edges[CAST(j + 1 AS INT)] AS INT)],
        |    ' ') AS chunk
        |FROM c ORDER BY doc_id, idx""".stripMargin,

    // CDC apply: the tx_cdc_chunks chunker (mask 7 = maskBits 3) feeding
    // the tx_chunk_dedup removal/rebuild tail verbatim
    "tx_cdc_dedup" ->
      s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        |            WHERE len(string_split(text, ' ')) >= 1),
        |e AS (SELECT doc_id, toks,
        |    list_sort(list_distinct(list_concat(list_concat(
        |      [CAST(0 AS BIGINT)],
        |      list_filter(range(3, len(toks) + 1), i ->
        |        (${graft.functions.CrossHash.sqlMdint(
                   "array_to_string(toks[(i-2):i], ' ')")} & 7) = 0)),
        |      [CAST(len(toks) AS BIGINT)]))) AS edges
        |  FROM d),
        |c AS (SELECT doc_id, toks, edges,
        |    unnest(range(1, len(edges))) AS j FROM e),
        |ch AS (SELECT doc_id, CAST(j - 1 AS BIGINT) AS idx,
        |    array_to_string(
        |      toks[CAST(edges[CAST(j AS INT)] + 1 AS INT):CAST(edges[CAST(j + 1 AS INT)] AS INT)],
        |      ' ') AS chunk
        |  FROM c),
        |hs AS (SELECT doc_id, idx, chunk,
        |    ${graft.functions.CrossHash.sqlMdint("chunk")} AS h FROM ch),
        |dup AS (SELECT h FROM hs GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2),
        |fl AS (SELECT doc_id, idx, chunk, h IN (SELECT h FROM dup) AS dup FROM hs),
        |pd AS (SELECT doc_id, COUNT(*) AS n_chunks,
        |    CAST(SUM(CASE WHEN dup THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
        |    COALESCE(string_agg(CASE WHEN NOT dup THEN chunk END, ' ' ORDER BY idx), '') AS clean_text
        |  FROM fl GROUP BY doc_id)
        |SELECT doc_id, n_chunks, n_removed, md5(clean_text) AS digest,
        |  CAST(length(clean_text) AS BIGINT) AS n_clean_chars
        |FROM pd ORDER BY doc_id""".stripMargin,

    // Chunk dedup: identical chunking (1-based clamped slices both
    // engines), identical 60-bit chunk hash, >= 2 DISTINCT docs rule;
    // string_agg(... ORDER BY idx) mirrors the array_sort rebuild, and
    // COALESCE('') keeps the all-removed doc at md5('') parity.
    "tx_chunk_dedup" ->
      s"""WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |            WHERE len(string_split(text, ' ')) >= 1),
        |ix AS (SELECT doc_id, w,
        |    unnest(range(0, CAST(ceil(len(w) / 2.0) AS BIGINT))) AS idx FROM ws),
        |ch AS (SELECT doc_id, idx,
        |    array_to_string(w[CAST(idx * 2 + 1 AS BIGINT):CAST(idx * 2 + 2 AS BIGINT)], ' ') AS chunk
        |  FROM ix),
        |hs AS (SELECT doc_id, idx, chunk, ${graft.functions.CrossHash.sqlMdint("chunk")} AS h FROM ch),
        |dup AS (SELECT h FROM hs GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2),
        |fl AS (SELECT doc_id, idx, chunk, h IN (SELECT h FROM dup) AS dup FROM hs),
        |pd AS (SELECT doc_id, COUNT(*) AS n_chunks,
        |    CAST(SUM(CASE WHEN dup THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
        |    COALESCE(string_agg(CASE WHEN NOT dup THEN chunk END, ' ' ORDER BY idx), '') AS clean_text
        |  FROM fl GROUP BY doc_id)
        |SELECT doc_id, n_chunks, n_removed, md5(clean_text) AS digest,
        |  CAST(length(clean_text) AS BIGINT) AS n_clean_chars
        |FROM pd ORDER BY doc_id""".stripMargin,
    "tx_train_val_test" ->
      s"""WITH b AS (
         |  SELECT doc_id, ${graft.functions.CrossHash.sqlMdint("'split:' || doc_id")} % 10 AS bucket
         |  FROM documents),
         |s AS (SELECT doc_id, CASE WHEN bucket <= 7 THEN 'train'
         |                          WHEN bucket = 8 THEN 'val' ELSE 'test' END AS split
         |      FROM b)
         |SELECT split, COUNT(*) AS n_docs, MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
         |FROM s GROUP BY split ORDER BY split""".stripMargin,
    "tx_fingerprint" ->
      """WITH fp AS (
        |  SELECT md5(array_to_string(list_sort(list_distinct(string_split(lower(text), ' '))), ' ')) AS fp
        |  FROM documents),
        |cl AS (SELECT fp, COUNT(*) AS cluster_size FROM fp GROUP BY fp)
        |SELECT COUNT(*) AS n_fingerprints,
        |  CAST(SUM(cluster_size) AS BIGINT) AS n_docs,
        |  CAST(SUM(CASE WHEN cluster_size > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_multi_clusters,
        |  MAX(cluster_size) AS max_cluster
        |FROM cl""".stripMargin,
    // Same decimal chain as the op: idf and unit weights rounded to 7
    // decimals and fixed as DECIMAL, exact decimal pair dots, decimal
    // threshold compare, one double cast at the end.
    "tx_tfidf_pairs" ->
      """WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |sh AS (SELECT doc_id,
        |    unnest(list_transform(range(1, len(w) - 1), i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
        |  FROM ws WHERE len(w) >= 3),
        |tf AS (SELECT doc_id, s, COUNT(*) AS tf FROM sh GROUP BY 1, 2),
        |st AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM tf),
        |dfq AS (SELECT s, COUNT(*) AS df FROM tf GROUP BY s HAVING COUNT(*) <= 50),
        |kept AS (SELECT f.doc_id, f.s,
        |    CAST(f.tf AS DECIMAL(11, 0)) *
        |      CAST(round(ln(CAST(st.n_docs AS DOUBLE) / q.df), 7) AS DECIMAL(12, 7)) AS wt
        |  FROM tf f JOIN dfq q ON q.s = f.s CROSS JOIN st),
        |nr AS (SELECT doc_id,
        |    SUM(CAST(wt AS DECIMAL(18, 7)) * CAST(wt AS DECIMAL(18, 7))) AS norm2
        |  FROM kept GROUP BY doc_id),
        |wn AS (SELECT k.doc_id, k.s,
        |    CAST(round(CAST(k.wt AS DOUBLE) / sqrt(CAST(n.norm2 AS DOUBLE)), 7)
        |      AS DECIMAL(12, 7)) AS wn
        |  FROM kept k JOIN nr n USING (doc_id)),
        |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |    COUNT(*) AS n_shared, SUM(a.wn * b.wn) AS cd
        |  FROM wn a JOIN wn b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2)
        |SELECT doc_a, doc_b, n_shared, CAST(cd AS DOUBLE) AS cos_sim
        |FROM p WHERE cd >= 0.30 ORDER BY doc_a, doc_b""".stripMargin)
}
