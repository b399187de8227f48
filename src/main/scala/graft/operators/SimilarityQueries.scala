package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.DeterministicRng

/** Similarity search over `embeddings` (`embedding ARRAY<FLOAT>`, dim 64).
  *
  * Three operators:
  *   - [[cosine]] as a pure built-in expression (cast→zip_with→aggregate):
  *     left-to-right fold, so the summation order is defined — that is what
  *     lets DuckDB's sequential list_dot_product reproduce it (results are
  *     rounded to 6 decimals on both sides to absorb any last-ulp skew);
  *   - brute-force top-k: the exact baseline. O(Q·N) — fine for a handful of
  *     query vectors even at 100 TB because it is a single broadcast-join
  *     scan (queries broadcast, one pass over the corpus, partial top-k per
  *     partition via window rank);
  *   - LSH-bucketed ANN (random-hyperplane signatures from the deterministic
  *     counter RNG): the scale path — candidates come from matching 8-bit
  *     signature buckets (±1-bit multiprobe), so each query touches ~2^-8 of
  *     the corpus per probe instead of all of it. Recall vs. the brute-force
  *     baseline is asserted in SimilaritySpec.
  */
object SimilarityQueries {
  import Tables._

  private val DIM = 64
  private val SIG_BITS = 8
  private val N_TABLES = 6
  private val N_CENTROIDS = 16
  private val N_PROBE = 3
  private val NEAR_T = 0.40
  private val TOP_K = 10
  private val N_QUERIES = 5
  // emb_near_pairs_lsh blocking: NP_TABLES tables of NP_BITS-bit signatures.
  // Sized for the 0.40 threshold (see the query's scaladoc): at cos 0.40 the
  // per-hyperplane agreement probability is 1 − arccos(0.40)/π ≈ 0.631, so
  // per-table collision is 0.631^4 ≈ 0.16 and the 48-table miss probability
  // per threshold pair is (1 − 0.16)^48 ≈ 2.6e-4 — zero misses on the test
  // corpus at sf0.01 AND sf0.1 (asserted against the exact formulation in
  // the spec at gate scale). Cost at this recall: a random pair shares
  // ~48/2^4 = 3 buckets, so candidate volume is ~3× all-pairs — see the
  // query scaladoc for why that is inherent at this threshold and where
  // the blocking actually wins.
  private val NP_BITS = 4
  private val NP_TABLES = 48
  private val NP_SEED = 4241L

  /** Exact cosine between two float-array columns, rounded to 6 decimals.
    * Delegates to the native codegen'd [[graft.functions.DotProduct]]
    * expression — same left-to-right double accumulation as the
    * `aggregate(zip_with(...))` fold it replaced (oracle-identical), ~40×
    * cheaper per pair because it stays inside whole-stage codegen.
    */
  def cosine(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.cosine_similarity(a, b)

  private def sqlCosine(a: String, b: String): String =
    s"round(list_dot_product($a::DOUBLE[], $b::DOUBLE[]) / " +
      s"(sqrt(list_dot_product($a::DOUBLE[], $a::DOUBLE[])) * sqrt(list_dot_product($b::DOUBLE[], $b::DOUBLE[]))), 6)"

  /** Random-hyperplane signature: bit j = sign(v · r_j) with hyperplane
    * components r_j[i] = u(seed, j, 0, i) − 0.5 from the counter-based RNG.
    * The hyperplanes are materialized driver-side as array literals (they
    * are model constants — bits×64 doubles), so each bit is one native
    * dot-product against a literal, not an interpreted per-element lambda.
    */
  def lshSignature(v: Column, seed: Long, bits: Int = SIG_BITS): Column =
    (0 until bits).map { j =>
      val plane = Array.tabulate(DIM)(i =>
        DeterministicRng.uniform(seed, j.toLong, 0L, i.toLong) - 0.5)
      val proj = graft.functions.VectorFunctions.dot_product(v, typedLit(plane))
      when(proj > 0, lit(1 << j)).otherwise(lit(0))
    }.reduce(_ + _)

  /** One distributed Lloyd iteration: mean vector per cluster via
    * per-dimension explode + aggregate, re-collected into arrays in
    * dimension order. This is the shape k-means training takes on a
    * DataFrame engine — no driver-side math over the corpus.
    */
  private def lloydStep(assigned: DataFrame): DataFrame =
    assigned
      .select(col("cid"), posexplode(col("embedding")).as(Seq("dim", "x")))
      // decimal-exact mean, not avg(): double partial-aggregate buffers
      // merge in shuffle-fetch order, so avg() can differ in the last ulp
      // across runs — enough to flip an assignment on a rounding boundary.
      // Decimal sums are exact regardless of order; one deterministic
      // division at the end (the repo-wide FP discipline).
      .groupBy("cid", "dim")
      .agg((sum(col("x").cast(org.apache.spark.sql.types.DecimalType(28, 12)))
        .cast("double") / count(lit(1))).as("m"))
      .groupBy("cid")
      .agg(transform(array_sort(collect_list(struct(col("dim"), col("m")))),
        s => s.getField("m")).as("ce"))

  private def assignToCentroids(e: DataFrame, cents: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("vec_id")).orderBy(col("csim").desc, col("cid"))
    e.join(broadcast(cents))
      .withColumn("csim", cosine(col("embedding"), col("ce")))
      .withColumn("crn", row_number().over(w))
      .filter(col("crn") === 1)
      .select(col("vec_id"), col("embedding"), col("cid"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // IVF with TRAINED centroids: seed from the first vectors, run two
    // distributed Lloyd iterations, then probe/re-rank as in knn_ivf.
    // Deterministic end-to-end (seeded init, exact arithmetic), rows-only
    // gate; recall floor in PipelineOpsSpec. Measured on the synthetic
    // corpus: 0.84 recall@10 vs 0.90 untrained — this corpus has no real
    // cluster structure, so Lloyd tightens lists without aligning them to
    // neighborhoods; on clustered real-world embeddings training is the win.
    // The point here is the training SHAPE: per-dimension explode ->
    // aggregate -> re-collect, fully distributed.
    "knn_ivf_trained" -> ((s, d) => {
      import s.implicits._
      val e = t(s, d, "embeddings").repartition(s.sparkContext.defaultParallelism)
      var cents = e.filter(col("vec_id") < N_CENTROIDS)
        .select(col("vec_id").as("cid"), col("embedding").as("ce"))
      (0 until 2).foreach { _ =>
        // Materialize the centroid table DRIVER-SIDE between iterations:
        // 16×64 doubles — legitimate tiny model state, the same pattern as
        // lshSignature's literal hyperplanes. Without it every Lloyd
        // iteration (and the final assignment) recomputes the full upstream
        // lineage — at 100 TB that is ~6 corpus re-scans; with it each
        // iteration is exactly one scan. Values are unchanged: lloydStep's
        // decimal-exact means are deterministic, and re-injection as a
        // local relation feeds the same doubles back in.
        val local = lloydStep(assignToCentroids(e, cents)).collect()
          .map(r => (r.getLong(0), r.getSeq[Double](1)))
        cents = local.toSeq.toDF("cid", "ce")
      }
      val assigned = assignToCentroids(e, cents)
      val qw = Window.partitionBy(col("query_id")).orderBy(col("qcsim").desc, col("cid"))
      val probes = e.filter(col("vec_id") < N_QUERIES)
        .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
        .join(broadcast(cents))
        .withColumn("qcsim", cosine(col("qe"), col("ce")))
        .withColumn("qrn", row_number().over(qw))
        .filter(col("qrn") <= N_PROBE)
        .select(col("query_id"), col("qe"), col("cid"))
      val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("vec_id"))
      probes.join(assigned, "cid")
        .filter(col("vec_id") =!= col("query_id"))
        .withColumn("cos", cosine(col("qe"), col("embedding")))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= TOP_K)
        .select("query_id", "rank", "vec_id", "cos")
        .orderBy("query_id", "rank")
    }),

    // Embedding-cosine near-duplicate pairs (the embedding dedup stage).
    // The probe side is repartitioned so the O(N²) scoring runs on all
    // cores (the table is a single small parquet -> one scan partition).
    "emb_near_pairs" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      val a = e.repartition(s.sparkContext.defaultParallelism)
        .select(col("vec_id").as("vec_a"), col("embedding").as("ea"))
      val b = e.select(col("vec_id").as("vec_b"), col("embedding").as("eb"))
      a.join(b, col("vec_a") < col("vec_b"))
        .withColumn("cos", cosine(col("ea"), col("eb")))
        .filter(col("cos") >= NEAR_T)
        .select("vec_a", "vec_b", "cos")
        .orderBy("vec_a", "vec_b")
    }),

    // LSH-BLOCKED near-dup pairs: candidates = pairs sharing any (table,
    // signature) bucket across NP_TABLES hyperplane tables (one corpus scan
    // computes all signatures, exploded to (tbl, sig) rows); candidates are
    // then verified with the EXACT cosine, so precision is exact and only
    // recall depends on the blocking. This is the bucketed shape that
    // replaces emb_near_pairs' all-pairs nested-loop at scale: candidate
    // generation is a shuffle equi-join on 12-byte keys, never a cross
    // product of embeddings.
    //
    // Honest scale note (measured on this corpus): a 0.40 threshold is
    // adversarial for hyperplane LSH — qualifying pairs here are the smooth
    // tail of the random-cosine distribution (bit agreement 0.63 vs 0.50
    // random, only a 1.26× separation per bit), so near-total recall needs
    // enough tables that candidate volume EXCEEDS all-pairs (~3× at these
    // constants: a random pair shares ~48/16 buckets). At this threshold
    // the query is the correctness-checked demonstration of the bucketed
    // SHAPE — no exact subquadratic method exists for dense low-threshold
    // similarity joins on unstructured data. The operator earns its keep on
    // real near-dup corpora (cos ≥ 0.8–0.9, agreement ≥ 0.86): identical
    // plan, and e.g. at 0.9 a 94-table/16-bit configuration reaches the
    // same 1e-4 miss rate while candidates drop to ~0.1% of all pairs.
    // emb_near_pairs stays as the exact oracle anchor; recall here is
    // asserted 1.0 vs that anchor on the test corpus (PipelineOpsSpec).
    "emb_near_pairs_lsh" -> ((s, d) => {
      val e = t(s, d, "embeddings").repartition(s.sparkContext.defaultParallelism)
      val sigArr = array((0 until NP_TABLES).map(l =>
        lshSignature(col("embedding"), NP_SEED + l * 131L, NP_BITS)): _*)
      val sigs = e.select(col("vec_id"), posexplode(sigArr).as(Seq("tbl", "sig")))
      // Candidates stay 16-byte id rows through the bucket join (the shuffle
      // never ships embeddings), and are verified WITHOUT a pre-verification
      // distinct: deduplicating millions of candidate rows is a full extra
      // exchange, while re-verifying the ~L·2^-bits duplicate collisions is
      // a few pipelined codegen'd dot products each — the vector attach
      // joins, cosine and threshold filter all run in the same stage, and
      // the distinct happens after the filter on the few surviving pairs.
      val cand = sigs.as("x").join(sigs.as("y"),
          col("x.tbl") === col("y.tbl") && col("x.sig") === col("y.sig") &&
            col("x.vec_id") < col("y.vec_id"))
        .select(col("x.vec_id").as("vec_a"), col("y.vec_id").as("vec_b"))
      val va = e.select(col("vec_id").as("vec_a"), col("embedding").as("ea"))
      val vb = e.select(col("vec_id").as("vec_b"), col("embedding").as("eb"))
      cand.join(va, "vec_a").join(vb, "vec_b")
        .withColumn("cos", cosine(col("ea"), col("eb")))
        .filter(col("cos") >= NEAR_T)
        .select("vec_a", "vec_b", "cos")
        .distinct()
        .orderBy("vec_a", "vec_b")
    }),

    // Brute-force cosine top-k: exact ANN baseline. Query side is tiny and
    // broadcast; rank window is per-query.
    "knn_brute" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      val q = broadcast(e.filter(col("vec_id") < N_QUERIES)
        .select(col("vec_id").as("query_id"), col("embedding").as("qe")))
      val scored = e.join(q, col("vec_id") =!= col("query_id"))
        .withColumn("cos", cosine(col("qe"), col("embedding")))
      val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("vec_id"))
      scored.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= TOP_K)
        .select("query_id", "rank", "vec_id", "cos")
        .orderBy("query_id", "rank")
    }),

    // IVF-style ANN: a deterministic coarse quantizer (16 centroid vectors)
    // partitions the corpus into inverted lists; each query probes its
    // nprobe=3 nearest centroids and re-ranks only those lists. Per-query
    // cost ∝ probed-list size — the other classic ANN scale shape next to
    // LSH. Approximate by design → no oracle; recall floor in
    // SimilaritySpec. (A production IVF would train centroids with k-means;
    // the deterministic pick keeps the operator reproducible without a
    // stored model, which is what the oracle-free gate can check.)
    "knn_ivf" -> ((s, d) => {
      val e = t(s, d, "embeddings").repartition(s.sparkContext.defaultParallelism)
      val cents = broadcast(e.filter(col("vec_id") < N_CENTROIDS)
        .select(col("vec_id").as("cid"), col("embedding").as("ce")))
      val wAssign = Window.partitionBy(col("vec_id")).orderBy(col("csim").desc, col("cid"))
      val assigned = e.join(cents)
        .withColumn("csim", cosine(col("embedding"), col("ce")))
        .withColumn("crn", row_number().over(wAssign))
        .filter(col("crn") === 1)
        .select(col("vec_id"), col("embedding"), col("cid"))
      val qw = Window.partitionBy(col("query_id")).orderBy(col("qcsim").desc, col("cid"))
      val probes = e.filter(col("vec_id") < N_QUERIES)
        .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
        .join(cents)
        .withColumn("qcsim", cosine(col("qe"), col("ce")))
        .withColumn("qrn", row_number().over(qw))
        .filter(col("qrn") <= N_PROBE)
        .select(col("query_id"), col("qe"), col("cid"))
      val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("vec_id"))
      probes.join(assigned, "cid")
        .filter(col("vec_id") =!= col("query_id"))
        .withColumn("cos", cosine(col("qe"), col("embedding")))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= TOP_K)
        .select("query_id", "rank", "vec_id", "cos")
        .orderBy("query_id", "rank")
    }),

    // LSH-bucketed ANN: L independent hash tables (random-hyperplane
    // signatures with per-table seeds), 1-bit multiprobe per table, union of
    // candidates, exact re-rank. Each probe touches ~N/2^bits of the corpus,
    // so cost scales with candidate count, not corpus size — the 100 TB
    // shape. No oracle — approximate by design; recall vs knn_brute is
    // asserted in SimilaritySpec.
    "knn_lsh" -> ((s, d) => {
      val e = t(s, d, "embeddings").repartition(s.sparkContext.defaultParallelism)
      // corpus side: ONE scan computes all L signatures (48 native literal
      // dot products per row) and explodes to L (table, signature) rows —
      // the earlier 6-way unionAll re-scanned the corpus and re-derived the
      // signature projection once per table.
      val sigArr = array((0 until N_TABLES).map(l =>
        lshSignature(col("embedding"), 777L + l * 131L)): _*)
      val tables = e.select(col("vec_id"), col("embedding"),
        posexplode(sigArr).as(Seq("tbl", "sig")))
      val q = tables.filter(col("vec_id") < N_QUERIES)
        .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
          col("tbl").as("qtbl"), col("sig").as("qsig"))
      val probes = q.select(col("query_id"), col("qtbl"), col("qsig"),
          explode(array(lit(0) +: (0 until SIG_BITS).map(j => lit(1 << j)): _*)).as("flip"))
        .withColumn("probe_sig", col("qsig").bitwiseXOR(col("flip")))
      // dedup candidate IDs only (cheap 16-byte rows), then rejoin the
      // vectors once — distinct over rows carrying the float arrays would
      // hash/compare 64 floats per row per table per probe
      val cand = probes.join(tables,
          col("tbl") === col("qtbl") && col("sig") === col("probe_sig") &&
            col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id")).distinct()
      val qe = e.filter(col("vec_id") < N_QUERIES)
        .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
      val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("vec_id"))
      cand
        .join(broadcast(qe), "query_id")
        .join(e.select(col("vec_id"), col("embedding")), "vec_id")
        .withColumn("cos", cosine(col("qe"), col("embedding")))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= TOP_K)
        .select("query_id", "rank", "vec_id", "cos")
        .orderBy("query_id", "rank")
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
