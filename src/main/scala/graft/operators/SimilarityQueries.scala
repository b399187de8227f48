package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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

  /** Forwarders kept as the stable public names (also used by specs). */
  def cosine(a: Column, b: Column): Column = SimilarityOps.cosine(a, b)
  def lshSignature(v: Column, seed: Long, bits: Int = 8): Column =
    SimilarityOps.lshSignature(v, seed, bits)

  private def sqlCosine(a: String, b: String): String =
    s"round(list_dot_product($a::DOUBLE[], $b::DOUBLE[]) / " +
      s"(sqrt(list_dot_product($a::DOUBLE[], $a::DOUBLE[])) * sqrt(list_dot_product($b::DOUBLE[], $b::DOUBLE[]))), 6)"

  private def queriesOf(e: DataFrame): DataFrame =
    e.filter(col("vec_id") < N_QUERIES)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))

  private def firstCentroids(e: DataFrame): DataFrame =
    e.filter(col("vec_id") < N_CENTROIDS)
      .select(col("vec_id").as("cid"), col("embedding").as("ce"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // IVF with TRAINED centroids: seed from the first vectors, run two
    // distributed Lloyd iterations (driver-materialized between steps),
    // then probe/re-rank as in knn_ivf. Deterministic end-to-end (seeded
    // init, exact arithmetic), rows-only gate; recall floor in
    // PipelineOpsSpec. Measured on the synthetic corpus: 0.84 recall@10 vs
    // 0.90 untrained — this corpus has no real cluster structure, so Lloyd
    // tightens lists without aligning them to neighborhoods; on clustered
    // real-world embeddings training is the win (AnnClusteredSpec shows the
    // bucketed shapes deliver there). The point here is the training SHAPE:
    // per-dimension explode -> aggregate -> re-collect, fully distributed.
    "knn_ivf_trained" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      val cents = SimilarityOps.trainCentroids(e, firstCentroids(e), 2)
      SimilarityOps.ivfTopK(e, queriesOf(e), cents, N_PROBE, TOP_K)
    }),

    // Embedding-cosine near-duplicate pairs, exact all-pairs formulation —
    // kept as the ORACLE ANCHOR for the blocked path below; right plan only
    // at oracle scale.
    "emb_near_pairs" -> ((s, d) =>
      SimilarityOps.nearPairs(t(s, d, "embeddings"), NEAR_T)),

    // LSH-blocked near-dup pairs — the bucketed scale path; same output as
    // the anchor at this threshold (oracle row + PipelineOpsSpec).
    "emb_near_pairs_lsh" -> ((s, d) =>
      SimilarityOps.nearPairsLsh(t(s, d, "embeddings"), NEAR_T,
        NP_BITS, NP_TABLES, NP_SEED)),

    "knn_brute" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      SimilarityOps.bruteTopK(e, queriesOf(e), TOP_K)
    }),

    // Deterministic coarse quantizer (first 16 vectors as centroids) keeps
    // the operator reproducible without a stored model, which is what the
    // oracle-free gate can check; a production IVF trains via
    // SimilarityOps.trainCentroids (knn_ivf_trained).
    "knn_ivf" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      SimilarityOps.ivfTopK(e, queriesOf(e), broadcast(firstCentroids(e)),
        N_PROBE, TOP_K)
    }),

    "knn_lsh" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      SimilarityOps.lshTopK(e, queriesOf(e), TOP_K)
    }))

  def oracleSql: Map[String, String] = Map(
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
    "knn_brute" ->
      s"""SELECT query_id, rank, vec_id, cos FROM (
         |  SELECT q.vec_id AS query_id, e.vec_id AS vec_id,
         |    ${sqlCosine("q.embedding", "e.embedding")} AS cos,
         |    ROW_NUMBER() OVER (PARTITION BY q.vec_id
         |      ORDER BY ${sqlCosine("q.embedding", "e.embedding")} DESC, e.vec_id) AS rank
         |  FROM embeddings q JOIN embeddings e ON e.vec_id <> q.vec_id
         |  WHERE q.vec_id < $N_QUERIES) x
         |WHERE rank <= $TOP_K ORDER BY query_id, rank""".stripMargin)
}
