package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.CrossHash

/** Gate bindings of the [[DedupOps]] library surface to the test tables
  * (dd_exact doubles the input via self-union so the keep-first policy is
  * actually exercised), plus the DuckDB oracle SQL — every op is
  * oracle-checked value-for-value (the cross-engine md5-int hash +
  * universal-family permutations make even the MinHash signatures
  * reproducible in SQL). Algorithm/plan documentation lives on the ops.
  */
object DedupQueries {
  import Tables._
  import CrossHash._

  private val K = DedupOps.K
  private val BANDS = DedupOps.BANDS
  private val JACCARD_T = DedupOps.JACCARD_T

  /** The near-dup PAIR TABLE shared by the six dup-graph ANALYTICS gates
    * (dd_clusters / dd_clusters_star / dd_keep_canonical / dd_pagerank /
    * dd_triangles / dd_quarantine) — the [[GateMemo]] shared-training
    * pattern (r14): a production pipeline computes the minhash pair
    * table ONCE (that is what [[DedupOps.writeMinhashIndex]] persists)
    * and derives every graph analytic from the same artifact; each gate
    * re-ran the identical deterministic pair computation before its
    * measured graph work. The pair-FINDING gates (dd_minhash,
    * dd_minhash_incr, dd_eval) keep computing pairs fresh — pair
    * construction is the op under measurement there. Pairs are exact-
    * verified candidates (≤ true near-dups, never corpus-sized), so the
    * checkpoint pins bounded state like every memoized model table.
    */
  private val pairsCache = new GateMemo("dd_pair_table")
  private def minhashPairsOf(s: SparkSession, d: String): DataFrame =
    pairsCache.cached(s, d)(DedupOps.minhashPairs(t(s, d, "documents")))

  private[operators] val sqlShingles =
    "list_distinct(list_transform(range(1, len(w) - 1), i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Cross-source vocabulary overlap: pairwise token-Jaccard matrix
    // between corpus slices (complete — zero-overlap pairs emit rows).
    "dd_source_overlap" -> ((s, d) =>
      DedupOps.sourceOverlap(t(s, d, "documents"))),

    "dd_exact" -> ((s, d) => {
      val docs = t(s, d, "documents")
      DedupOps.exactDedupStats(docs.unionAll(docs))
    }),
    // Chapman capture-recapture between the even/odd doc_id halves
    // (stand-ins for two collection passes): exact digest-overlap
    // counts, the estimate one division + one subtraction.
    "dd_capture" -> ((s, d) =>
      DedupOps.captureRecapture(t(s, d, "documents"),
        pmod(col("doc_id"), lit(2)) === 0)),
    // Gate-determinism sorts live HERE, not in the library ops: the ops
    // return unordered relations (a trailing global Sort+Exchange would
    // charge every 100 TB user for oracle hash stability).
    "dd_ngram_jaccard" -> ((s, d) =>
      DedupOps.ngramJaccardPairs(t(s, d, "documents")).orderBy("doc_a", "doc_b")),
    "dd_prefix_jaccard" -> ((s, d) =>
      DedupOps.prefixJaccardPairs(t(s, d, "documents")).orderBy("doc_a", "doc_b")),
    "dd_containment" -> ((s, d) =>
      DedupOps.containmentPairs(t(s, d, "documents")).orderBy("doc_a", "doc_b")),
    "dd_minhash" -> ((s, d) =>
      DedupOps.minhashPairs(t(s, d, "documents")).orderBy("doc_a", "doc_b")),
    // Incremental ingest dedup: every 7th doc plays the incoming batch,
    // the rest the existing corpus; pairs are cross-corpus only.
    "dd_minhash_incr" -> ((s, d) => {
      val docs = t(s, d, "documents")
      DedupOps.minhashPairsAgainst(
        docs.filter(col("doc_id") % 7 =!= 0),
        docs.filter(col("doc_id") % 7 === 0)).orderBy("doc_old", "doc_new")
    }),
    "dd_clusters" -> ((s, d) =>
      DedupOps.nearDupClusters(minhashPairsOf(s, d))
        .orderBy("doc_id")),
    "dd_clusters_star" -> ((s, d) =>
      DedupOps.nearDupClustersStar(minhashPairsOf(s, d))
        .orderBy("doc_id")),
    "dd_simhash" -> ((s, d) =>
      DedupOps.simhashPairs(t(s, d, "documents")).orderBy("doc_a", "doc_b")),
    // Detector eval: how well does the cheap simhash detector recover the
    // exact n-gram-Jaccard ≥ 0.3 truth pairs? (minhashPairs would be
    // uninformative here — it exact-verifies candidates, so its precision
    // is 1.0 by construction; simhash is the genuinely lossy detector.)
    "dd_eval" -> ((s, d) => {
      val docs = t(s, d, "documents")
      DedupOps.dedupEval(
        DedupOps.simhashPairs(docs), DedupOps.ngramJaccardPairs(docs))
    }),
    // End-to-end dedup APPLY: minhash pairs -> connected components ->
    // keep the canonical member of each cluster, summarized per language.
    "dd_keep_canonical" -> ((s, d) => {
      val docs = t(s, d, "documents")
      DedupOps.keepCanonical(docs,
          DedupOps.nearDupClusters(minhashPairsOf(s, d)))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_kept"),
          sum(col("n_chars")).as("kept_chars"),
          min(col("doc_id")).as("min_kept"), max(col("doc_id")).as("max_kept"))
        .orderBy("lang")
    }),
    // PageRank over the near-dup graph: which docs center a duplicate
    // neighborhood (GraphOps.PrIters iterations — the oracle unrolls the
    // SAME constants, so op and oracle cannot desync). Domain note: ranks
    // cover only docs appearing in a near-dup pair (see GraphOps.pageRank
    // scaladoc) — isolated docs have no duplicate neighborhood to rank.
    "dd_pagerank" -> ((s, d) =>
      GraphOps.pageRank(minhashPairsOf(s, d))
        .orderBy("doc_id")),
    // Triangle census of the same graph: are dup clusters clique-like
    // (transitively-agreeing true duplicates) or chain-like (threshold-
    // grazing near-dups that make components over-merge)?
    "dd_triangles" -> ((s, d) =>
      GraphOps.triangleStats(minhashPairsOf(s, d))),
    // Snapshot diff: two deterministic corpus versions carved from the
    // documents table — every 13th doc exists only in the new snapshot
    // (added), every 10th only in the old (removed), every 7th has its
    // text edited in the new version (changed) — per-doc status audit.
    "dd_snapshot_diff" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val oldV = docs.filter(col("doc_id") % 13 =!= 0)
      val newV = docs.filter(col("doc_id") % 10 =!= 0)
        .withColumn("text",
          when(col("doc_id") % 7 === 0, concat(col("text"), lit(" v2")))
            .otherwise(col("text")))
      DedupOps.snapshotDiff(oldV, newV).orderBy("doc_id")
    }),
    // Exact decontamination: benchmark = every 50th doc; the anti join
    // drops those docs AND any exact-text duplicate of them from the
    // corpus, summarized per language.
    "dd_cross" -> ((s, d) => {
      val docs = t(s, d, "documents")
      DedupOps.antiJoinDedup(docs, docs.filter(col("doc_id") % 50 === 0))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_kept"),
          min(col("doc_id")).as("min_kept"), max(col("doc_id")).as("max_kept"))
        .orderBy("lang")
    }),
    // Record linkage: levenshtein ≤ 2 on a first-3-words linkage key
    // (name-like short field whose LENGTH VARIES — the length-banded
    // blocking needs that spread for leverage; a fixed-width key would put
    // the whole corpus in one band and degenerate to corpus²/2 candidates,
    // the regime dd_hamming's pigeonhole blocking is for. Found the hard
    // way: a 40-char-prefix key ground for minutes at sf0.1).
    //
    // DELIBERATE SCALE ANCHOR (the emb_near_pairs convention): this
    // config's blocking attributes — (length band, lang) — are both
    // FIXED-cardinality, so block occupancy grows with the corpus and
    // the measured 30× curve is quadratic (exponent 1.83, 424 s —
    // BENCHNOTES r8). It is kept as the exact-verifiable correctness
    // anchor; deployment shapes are dd_fuzzy_compound (per-source
    // compound key, green gate) and the dd_fuzzy_scaledblocks curve
    // config (corpus-growing batch key, exponent 0.59). Do not copy this
    // blocking config to production data.
    "dd_fuzzy" -> ((s, d) =>
      DedupOps.fuzzyPairs(t(s, d, "documents"),
          col("doc_id"),
          concat_ws(" ", slice(split(col("text"), " "), 1, 3)), k = 2, blockWidth = 4,
          blockOn = Seq(col("lang")))
        .orderBy("doc_a", "doc_b")),
    // Contamination blast radius: seeds (every 45th doc plays the
    // flagged set — the stride intersects the near-dup graph, so the
    // walk genuinely expands) walk the minhash near-dup graph <= 3
    // hops; output is
    // the quarantine set with min hop counts. Frontier BFS in the op;
    // the oracle (and GraphOpsSpec's Spark-side twin) express the same
    // walk as a recursive CTE.
    "dd_quarantine" -> ((s, d) => {
      val docs = t(s, d, "documents")
      GraphOps.quarantineSet(
          minhashPairsOf(s, d),
          docs.filter(col("doc_id") % 45 === 0).select("doc_id"),
          maxHops = 3)
        .orderBy("doc_id")
    }),

    // The deployment-shape linkage config measured in ScaleBench: a
    // COMPOUND blocking key (lang, source) whose cardinality grows with
    // the corpus keeps block occupancy constant — the knob that took the
    // fixed-block config's 1.83 scale exponent to 0.59. Gated here so the
    // compound-key path is value-oracled, not just timed.
    "dd_fuzzy_compound" -> ((s, d) =>
      DedupOps.fuzzyPairs(t(s, d, "documents"),
          col("doc_id"),
          concat_ws(" ", slice(split(col("text"), " "), 1, 3)), k = 2, blockWidth = 4,
          blockOn = Seq(col("lang"), col("source")))
        .orderBy("doc_a", "doc_b")),
    // Fixed-width-key twin: pigeonhole segment blocking + Hamming verify
    // (the scale path when every key has the same length and length
    // banding has no leverage).
    "dd_hamming" -> ((s, d) =>
      DedupOps.hammingPairs(t(s, d, "documents"),
          col("doc_id"), substring(col("text"), 1, 40), k = 2)
        .orderBy("doc_a", "doc_b")),
    // Entity resolution end-to-end: fuzzy edges -> star-contraction
    // connected components (same CC engine as dd_clusters_star, different
    // edge detector).
    "dd_fuzzy_clusters" -> ((s, d) =>
      DedupOps.nearDupClustersStar(
          DedupOps.fuzzyPairs(t(s, d, "documents"),
            col("doc_id"),
            concat_ws(" ", slice(split(col("text"), " "), 1, 3)), k = 2, blockWidth = 4,
            blockOn = Seq(col("lang"))))
        .orderBy("doc_id")))

  def oracleSql: Map[String, String] = {
    val minhashAggs = (0 until K)
      .map(i => s"min(${sqlMinhash("h", i)}) AS s$i").mkString(",\n    ")
    val bandSelects = (0 until BANDS).map { bnd =>
      val key = (0 until 4).map(r => s"s${bnd * 4 + r}::VARCHAR").mkString(" || ',' || ")
      s"SELECT doc_id, $bnd AS band, $key AS key FROM sig"
    }.mkString("\n  UNION ALL\n  ")
    val bitSumAggs = (0 until 32)
      .map(j => s"sum(cnt * (((h >> $j) & 1) * 2 - 1)) AS b$j").mkString(",\n    ")
    val sigExpr = (0 until 32)
      .map(j => s"(CASE WHEN b$j > 0 THEN (1::BIGINT << $j) ELSE 0 END)").mkString(" + ")
    val chunkSelects = (0 until 4)
      .map(c => s"SELECT doc_id, sig, $c AS chunk, (sig >> ${c * 8}) & 255 AS ck FROM sig")
      .mkString("\n  UNION ALL\n  ")
    // shared CTE chain: shingles -> minhash signatures -> LSH bands ->
    // verified pairs; dd_minhash selects from it directly, dd_clusters
    // appends the recursive connected-components step
    val minhashCtes =
      s"""ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         |sets AS (SELECT doc_id, $sqlShingles AS sh FROM ws WHERE len(w) >= 3),
         |ex AS (SELECT doc_id, ${sqlMdint("sx")} AS h
         |       FROM (SELECT doc_id, unnest(sh) AS sx FROM sets)),
         |sig AS (SELECT doc_id,
         |    $minhashAggs
         |  FROM ex GROUP BY doc_id),
         |bands AS (
         |  $bandSelects),
         |cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
         |  FROM bands x JOIN bands y
         |    ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id),
         |jacs AS (SELECT doc_a, doc_b,
         |    CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / len(list_distinct(list_concat(a.sh, b.sh))) AS jac
         |  FROM cand JOIN sets a ON doc_a = a.doc_id JOIN sets b ON doc_b = b.doc_id)""".stripMargin

    val clustersOracle =
      s"""WITH RECURSIVE $minhashCtes,
         |mpairs AS (SELECT doc_a, doc_b FROM jacs WHERE jac >= $JACCARD_T),
         |edges AS (SELECT doc_a AS src, doc_b AS dst FROM mpairs
         |          UNION ALL SELECT doc_b, doc_a FROM mpairs),
         |reach(id, r) AS (
         |  SELECT src, src FROM edges
         |  UNION
         |  SELECT e.src, r.r FROM edges e JOIN reach r ON e.dst = r.id)
         |SELECT id AS doc_id, MIN(r) AS cluster_id FROM reach
         |GROUP BY id ORDER BY doc_id""".stripMargin

    // One PageRank step as SQL text: per-edge contributions decimal-fixed
    // at round 12 before the sum (order-independent), one double
    // multiply-add + round(·,12) per node — mirrors GraphOps.pageRank.
    // Damping and the unrolled iteration count come from GraphOps'
    // PUBLIC constants (Double.toString round-trips, so the SQL literal
    // is the identical double).
    val prD = GraphOps.PrDamping
    def prIter(prev: String): String =
      s"""SELECT e.dst AS doc_id,
         |    round((1.0 - $prD) / CAST(nn.n AS DOUBLE) +
         |      $prD * CAST(SUM(CAST(round(p.pr / CAST(d.deg AS DOUBLE), 12) AS DECIMAL(28, 12))) AS DOUBLE), 12) AS pr
         |  FROM edges e JOIN $prev p ON p.doc_id = e.src JOIN deg d ON d.src = e.src
         |  CROSS JOIN nn GROUP BY e.dst, nn.n""".stripMargin

    val prChain = (1 to GraphOps.PrIters)
      .map(i => s"it$i AS (${prIter(if (i == 1) "pr0" else s"it${i - 1}")})")
      .mkString(",\n")
    val pagerankOracle =
      s"""WITH $minhashCtes,
         |mpairs AS (SELECT doc_a, doc_b FROM jacs WHERE jac >= $JACCARD_T),
         |edges AS (SELECT doc_a AS src, doc_b AS dst FROM mpairs
         |          UNION SELECT doc_b, doc_a FROM mpairs),
         |deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
         |nn AS (SELECT COUNT(*) AS n FROM deg),
         |pr0 AS (SELECT src AS doc_id, round(1.0 / CAST(nn.n AS DOUBLE), 12) AS pr
         |        FROM deg, nn),
         |$prChain
         |SELECT doc_id, pr FROM it${GraphOps.PrIters} ORDER BY doc_id""".stripMargin

    // Incremental variant: the Spark side restricts the band join to
    // old×new; post-filtering the all-pairs jacs to cross-corpus pairs is
    // result-equivalent (a cross pair collides in a bucket identically
    // either way) and keeps the oracle on the shared CTE chain.
    val minhashIncrOracle =
      s"""WITH $minhashCtes,
         |flags AS (SELECT doc_id, doc_id % 7 = 0 AS is_new FROM documents),
         |xp AS (SELECT CASE WHEN fb.is_new THEN j.doc_a ELSE j.doc_b END AS doc_old,
         |    CASE WHEN fb.is_new THEN j.doc_b ELSE j.doc_a END AS doc_new, j.jac
         |  FROM jacs j JOIN flags fa ON fa.doc_id = j.doc_a
         |              JOIN flags fb ON fb.doc_id = j.doc_b
         |  WHERE fa.is_new <> fb.is_new AND j.jac >= $JACCARD_T)
         |SELECT doc_old, doc_new, jac FROM xp ORDER BY doc_old, doc_new""".stripMargin

    val ngramJaccardOracle =
      s"""WITH ws AS (SELECT doc_id, lang, n_chars, string_split(text, ' ') AS w FROM documents),
         |sets AS (SELECT doc_id, lang, n_chars // 100 AS bucket, $sqlShingles AS sh
         |         FROM ws WHERE len(w) >= 3)
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |  CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / len(list_distinct(list_concat(a.sh, b.sh))) AS jac
         |FROM sets a JOIN sets b
         |  ON a.lang = b.lang AND a.bucket = b.bucket AND a.doc_id < b.doc_id
         |WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / len(list_distinct(list_concat(a.sh, b.sh))) >= $JACCARD_T
         |ORDER BY doc_a, doc_b""".stripMargin

    // Prefix-filter variant: same exact-Jaccard semantics WITHOUT the
    // n_chars length-bucket blocking (the prefix filter replaces it), so
    // the truth is plain all-pairs within a lang. The candidate scheme is
    // Spark-side-only pruning — provably lossless, so the oracle states
    // the spec, not the algorithm.
    val prefixJaccardOracle =
      s"""WITH ws AS (SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents),
         |sets AS (SELECT doc_id, lang, $sqlShingles AS sh
         |         FROM ws WHERE len(w) >= 3)
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |  CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / len(list_distinct(list_concat(a.sh, b.sh))) AS jac
         |FROM sets a JOIN sets b
         |  ON a.lang = b.lang AND a.doc_id < b.doc_id
         |WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / len(list_distinct(list_concat(a.sh, b.sh))) >= $JACCARD_T
         |ORDER BY doc_a, doc_b""".stripMargin

    val simhashOracle =
      s"""WITH wc AS (SELECT doc_id, wx AS word, COUNT(*) AS cnt
         |    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS wx FROM documents)
         |    GROUP BY doc_id, wx),
         |hs AS (SELECT doc_id, cnt, ${sqlMdint("word")} AS h FROM wc),
         |bits AS (SELECT doc_id,
         |    $bitSumAggs
         |  FROM hs GROUP BY doc_id),
         |sig AS (SELECT doc_id, CAST($sigExpr AS BIGINT) AS sig FROM bits),
         |chunks AS (
         |  $chunkSelects),
         |pairs AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
         |    CAST(bit_count(xor(x.sig, y.sig)) AS INTEGER) AS hamming
         |  FROM chunks x JOIN chunks y
         |    ON x.chunk = y.chunk AND x.ck = y.ck AND x.doc_id < y.doc_id)
         |SELECT doc_a, doc_b, hamming FROM pairs WHERE hamming <= 3
         |ORDER BY doc_a, doc_b""".stripMargin

    Map(
      "dd_pagerank" -> pagerankOracle,
      // degree-oriented triangle count mirrored join-for-join; the
      // coefficient is one division of exact integers
      "dd_triangles" ->
        s"""WITH $minhashCtes,
           |e AS (SELECT doc_a AS a, doc_b AS b FROM jacs WHERE jac >= $JACCARD_T),
           |deg AS (SELECT v, COUNT(*) AS d FROM (
           |    SELECT a AS v FROM e UNION ALL SELECT b FROM e) GROUP BY v),
           |o AS (SELECT
           |    CASE WHEN da.d < db.d OR (da.d = db.d AND e.a < e.b)
           |      THEN e.a ELSE e.b END AS src,
           |    CASE WHEN da.d < db.d OR (da.d = db.d AND e.a < e.b)
           |      THEN e.b ELSE e.a END AS dst
           |  FROM e JOIN deg da ON da.v = e.a JOIN deg db ON db.v = e.b),
           |w AS (SELECT x.dst AS wa, y.dst AS wb FROM o x JOIN o y
           |      ON x.src = y.src AND x.dst < y.dst),
           |tri AS (SELECT COUNT(*) AS triangles FROM w
           |        JOIN e ON e.a = w.wa AND e.b = w.wb),
           |wg AS (SELECT CAST(SUM((d * (d - 1)) // 2) AS BIGINT) AS wedges FROM deg),
           |ne AS (SELECT COUNT(*) AS n_edges FROM e)
           |SELECT ne.n_edges, tri.triangles, wg.wedges,
           |  CASE WHEN wg.wedges > 0 THEN
           |    CAST(3 * tri.triangles AS DOUBLE) / CAST(wg.wedges AS DOUBLE)
           |  END AS global_clustering
           |FROM ne, tri, wg""".stripMargin,
      // Detector eval: the simhash and ngram-jaccard sub-oracles wrapped
      // verbatim as derived tables (the knn_eval pattern), so the grader
      // stays consistent with the graded by construction. F1 in the
      // one-division 2·hits/(|P|+|T|) form — same as the Spark op.
      "dd_eval" ->
        s"""WITH res AS (SELECT doc_a, doc_b FROM ($simhashOracle) rx),
           |tru AS (SELECT doc_a, doc_b FROM ($ngramJaccardOracle) tx),
           |np AS (SELECT COUNT(*) AS n_predicted FROM res),
           |nt AS (SELECT COUNT(*) AS n_truth FROM tru),
           |nh AS (SELECT COUNT(*) AS n_hits FROM res r
           |       WHERE EXISTS (SELECT 1 FROM tru t
           |                     WHERE t.doc_a = r.doc_a AND t.doc_b = r.doc_b))
           |SELECT n_predicted, n_truth, n_hits,
           |  CASE WHEN n_predicted > 0
           |    THEN CAST(n_hits AS DOUBLE) / n_predicted END AS precision,
           |  CASE WHEN n_truth > 0
           |    THEN CAST(n_hits AS DOUBLE) / n_truth END AS recall,
           |  CASE WHEN n_predicted + n_truth > 0
           |    THEN CAST(n_hits * 2 AS DOUBLE) / (n_predicted + n_truth) END AS f1
           |FROM np, nt, nh""".stripMargin,
      "dd_minhash_incr" -> minhashIncrOracle,
      "dd_cross" ->
        """WITH bl AS (SELECT DISTINCT md5(text) AS d FROM documents WHERE doc_id % 50 = 0),
          |k AS (SELECT lang, doc_id FROM documents
          |      WHERE md5(text) NOT IN (SELECT d FROM bl))
          |SELECT lang, COUNT(*) AS n_kept, MIN(doc_id) AS min_kept,
          |  MAX(doc_id) AS max_kept
          |FROM k GROUP BY lang ORDER BY lang""".stripMargin,
      // Snapshot diff: digest inequality only (never emitted), so the
      // md5 rendering itself needs no cross-engine contract beyond
      // determinism per engine.
      "dd_snapshot_diff" ->
        """WITH oldv AS (SELECT doc_id, md5(text) AS od FROM documents WHERE doc_id % 13 <> 0),
          |newv AS (SELECT doc_id,
          |    md5(CASE WHEN doc_id % 7 = 0 THEN text || ' v2' ELSE text END) AS nd
          |  FROM documents WHERE doc_id % 10 <> 0)
          |SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
          |  CASE WHEN o.doc_id IS NULL THEN 'added'
          |       WHEN n.doc_id IS NULL THEN 'removed'
          |       WHEN od <> nd THEN 'changed' ELSE 'unchanged' END AS status
          |FROM oldv o FULL OUTER JOIN newv n ON n.doc_id = o.doc_id
          |ORDER BY doc_id""".stripMargin,
      // pairwise token-Jaccard: distinct (source, token) sets, postings
      // self-join on the token, complete matrix via the sizes left join
      "dd_source_overlap" ->
        """WITH tk AS (SELECT DISTINCT g, tok FROM (
          |    SELECT source AS g, unnest(string_split(text, ' ')) AS tok
          |    FROM documents WHERE source IS NOT NULL AND text IS NOT NULL) q),
          |sz AS (SELECT g, COUNT(*) AS n FROM tk GROUP BY g),
          |inter AS (SELECT x.g AS src_a, y.g AS src_b, COUNT(*) AS i
          |  FROM tk x JOIN tk y ON x.tok = y.tok AND x.g < y.g GROUP BY 1, 2)
          |SELECT a.g AS src_a, b.g AS src_b, CAST(a.n AS BIGINT) AS n_a,
          |  CAST(b.n AS BIGINT) AS n_b,
          |  CAST(COALESCE(i.i, 0) AS BIGINT) AS intersection,
          |  CAST(COALESCE(i.i, 0) AS DOUBLE)
          |    / CAST(a.n + b.n - COALESCE(i.i, 0) AS DOUBLE) AS jaccard
          |FROM sz a JOIN sz b ON a.g < b.g
          |LEFT JOIN inter i ON i.src_a = a.g AND i.src_b = b.g
          |ORDER BY src_a, src_b""".stripMargin,

      "dd_exact" ->
        """WITH doubled AS (SELECT * FROM documents UNION ALL SELECT * FROM documents),
          |cl AS (SELECT md5(text) AS digest, COUNT(*) AS copies, MIN(doc_id) AS keep_id
          |       FROM doubled GROUP BY md5(text))
          |SELECT CAST(SUM(copies) AS BIGINT) AS n_input, COUNT(*) AS n_unique,
          |  CAST(SUM(copies) - COUNT(*) AS BIGINT) AS n_removed
          |FROM cl""".stripMargin,
      // capture–recapture: per-digest MAX side flags, three exact
      // counts, Chapman as one division then one subtraction
      "dd_capture" ->
        """WITH k AS (SELECT md5(text) AS dg,
          |    MAX(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS a,
          |    MAX(CASE WHEN doc_id % 2 = 0 THEN 0 ELSE 1 END) AS b
          |  FROM documents GROUP BY dg)
          |SELECT CAST(SUM(a) AS BIGINT) AS n_a, CAST(SUM(b) AS BIGINT) AS n_b,
          |  CAST(SUM(a * b) AS BIGINT) AS n_overlap,
          |  CAST((SUM(a) + 1) * (SUM(b) + 1) AS DOUBLE)
          |    / CAST(SUM(a * b) + 1 AS DOUBLE) - 1.0 AS chapman_est
          |FROM k""".stripMargin,
      "dd_ngram_jaccard" -> ngramJaccardOracle,
      "dd_prefix_jaccard" -> prefixJaccardOracle,
      // Containment: both directions emitted from the unordered-pair CTE;
      // the >= 0.8 gate is the exact integer form (10*common >= 8*|sh|)
      // on BOTH sides, so no double threshold can diverge cross-engine.
      "dd_containment" ->
        s"""WITH ws AS (SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents),
           |sets AS (SELECT doc_id, lang, $sqlShingles AS sh
           |         FROM ws WHERE len(w) >= 3),
           |pairs AS (SELECT a.doc_id AS da, b.doc_id AS db,
           |    len(list_intersect(a.sh, b.sh)) AS common, len(a.sh) AS sza, len(b.sh) AS szb
           |  FROM sets a JOIN sets b ON a.lang = b.lang AND a.doc_id < b.doc_id
           |  WHERE len(list_intersect(a.sh, b.sh)) >= 1)
           |SELECT da AS doc_a, db AS doc_b, CAST(common AS DOUBLE) / sza AS containment
           |  FROM pairs WHERE common * 10 >= sza * 8
           |UNION ALL
           |SELECT db AS doc_a, da AS doc_b, CAST(common AS DOUBLE) / szb AS containment
           |  FROM pairs WHERE common * 10 >= szb * 8
           |ORDER BY doc_a, doc_b""".stripMargin,
      "dd_minhash" ->
        s"""WITH $minhashCtes
           |SELECT doc_a, doc_b, jac FROM jacs WHERE jac >= $JACCARD_T
           |ORDER BY doc_a, doc_b""".stripMargin,
      // connected components over the minhash pairs: each doc's cluster_id
      // is the MIN doc_id reachable from it (recursive closure). TWO Spark
      // implementations compute the same fixpoint — min-label propagation
      // (dd_clusters) and alternating star contraction (dd_clusters_star)
      // — and both hash-match this one oracle.
      "dd_clusters" -> clustersOracle,
      "dd_clusters_star" -> clustersOracle,
      // Same component chain as clustersOracle; non-canonical members are
      // removed, survivors summarized per language.
      "dd_keep_canonical" ->
        s"""WITH RECURSIVE $minhashCtes,
           |mpairs AS (SELECT doc_a, doc_b FROM jacs WHERE jac >= $JACCARD_T),
           |edges AS (SELECT doc_a AS src, doc_b AS dst FROM mpairs
           |          UNION ALL SELECT doc_b, doc_a FROM mpairs),
           |reach(id, r) AS (
           |  SELECT src, src FROM edges
           |  UNION
           |  SELECT e.src, r.r FROM edges e JOIN reach r ON e.dst = r.id),
           |cl AS (SELECT id AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY id),
           |rm AS (SELECT doc_id FROM cl WHERE doc_id <> cluster_id),
           |k AS (SELECT lang, doc_id, n_chars FROM documents
           |      WHERE doc_id NOT IN (SELECT doc_id FROM rm))
           |SELECT lang, COUNT(*) AS n_kept, CAST(SUM(n_chars) AS BIGINT) AS kept_chars,
           |  MIN(doc_id) AS min_kept, MAX(doc_id) AS max_kept
           |FROM k GROUP BY lang ORDER BY lang""".stripMargin,
      "dd_simhash" -> simhashOracle,
      // The oracle verifies by exhaustive pairing (125k levenshtein calls
      // at sf0.01) — the op's banded blocking must lose nothing vs it.
      "dd_fuzzy" ->
        """WITH k AS (SELECT doc_id, lang, array_to_string(string_split(text, ' ')[1:3], ' ') AS key FROM documents),
          |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
          |    CAST(levenshtein(a.key, b.key) AS BIGINT) AS dist
          |  FROM k a JOIN k b ON a.doc_id < b.doc_id AND a.lang = b.lang
          |  WHERE abs(length(a.key) - length(b.key)) <= 2)
          |SELECT doc_a, doc_b, dist FROM p WHERE dist <= 2
          |ORDER BY doc_a, doc_b""".stripMargin,
      "dd_quarantine" ->
        s"""WITH RECURSIVE $minhashCtes,
           |mpairs AS (SELECT doc_a, doc_b FROM jacs WHERE jac >= $JACCARD_T),
           |edges AS (SELECT doc_a AS src, doc_b AS dst FROM mpairs
           |          UNION ALL SELECT doc_b, doc_a FROM mpairs),
           |walk(doc_id, hops) AS (
           |  SELECT doc_id, 0 FROM documents WHERE doc_id % 45 = 0
           |  UNION ALL
           |  SELECT e.dst, w.hops + 1 FROM walk w JOIN edges e ON e.src = w.doc_id
           |  WHERE w.hops < 3)
           |SELECT doc_id, CAST(MIN(hops) AS BIGINT) AS hops FROM walk
           |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
      "dd_fuzzy_compound" ->
        """WITH k AS (SELECT doc_id, lang, source, array_to_string(string_split(text, ' ')[1:3], ' ') AS key FROM documents),
          |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
          |    CAST(levenshtein(a.key, b.key) AS BIGINT) AS dist
          |  FROM k a JOIN k b ON a.doc_id < b.doc_id AND a.lang = b.lang
          |    AND a.source = b.source
          |  WHERE abs(length(a.key) - length(b.key)) <= 2)
          |SELECT doc_a, doc_b, dist FROM p WHERE dist <= 2
          |ORDER BY doc_a, doc_b""".stripMargin,
      "dd_hamming" ->
        """WITH k AS (SELECT doc_id, substring(text, 1, 40) AS key FROM documents),
          |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
          |    CAST(hamming(a.key, b.key) AS BIGINT) AS dist
          |  FROM k a JOIN k b
          |    ON a.doc_id < b.doc_id AND length(a.key) = length(b.key))
          |SELECT doc_a, doc_b, dist FROM p WHERE dist <= 2
          |ORDER BY doc_a, doc_b""".stripMargin,
      "dd_fuzzy_clusters" ->
        """WITH RECURSIVE k AS (SELECT doc_id, lang, array_to_string(string_split(text, ' ')[1:3], ' ') AS key FROM documents),
          |mp AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
          |  FROM k a JOIN k b ON a.doc_id < b.doc_id AND a.lang = b.lang
          |  WHERE abs(length(a.key) - length(b.key)) <= 2
          |    AND levenshtein(a.key, b.key) <= 2),
          |edges AS (SELECT doc_a AS src, doc_b AS dst FROM mp
          |          UNION ALL SELECT doc_b, doc_a FROM mp),
          |reach(id, r) AS (
          |  SELECT src, src FROM edges
          |  UNION
          |  SELECT e.src, r.r FROM edges e JOIN reach r ON e.dst = r.id)
          |SELECT id AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY id
          |ORDER BY doc_id""".stripMargin)
  }
}
