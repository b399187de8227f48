package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.CrossHash

/** Deduplication operators over `documents` — the dedup stages of a
  * training-data pipeline: exact, blocked n-gram Jaccard, MinHash+LSH and
  * SimHash. Every one is oracle-checked value-for-value in DuckDB (the
  * cross-engine md5-int hash + universal-family permutations make even the
  * MinHash signatures reproducible in SQL).
  *
  * Scale design (the part that matters at 100 TB):
  *   - exact dedup = one hash aggregate on a 128-bit digest — never on the
  *     raw text (shuffle ships 16-byte keys, not documents);
  *   - n-gram Jaccard joins only within blocking keys — O(Σ block²), not
  *     O(n²); skew in a hot block is the known failure mode, which is what
  *     MinHash/LSH solves;
  *   - MinHash: per-doc signature is ONE aggregation over exploded shingles
  *     (k min-aggregates computed in the same pass — not k passes); LSH
  *     band join ships only (band, 4-int key) pairs; true Jaccard is then
  *     verified only for candidates;
  *   - SimHash: 32 conditional sums in one aggregate pass; pair search joins
  *     on 8-bit chunk equality (pigeonhole: hamming ≤ 3 over 4 chunks ⇒ some
  *     chunk equal), never all-pairs.
  */
object DedupQueries {
  import Tables._
  import CrossHash._

  private val K = 16          // minhash signature length
  private val BANDS = 4       // 4 bands × 4 rows
  private val JACCARD_T = 0.3

  private def wordsCol: Column = split(col("text"), " ")

  /** Distinct 3-word shingles (the dedup literature's default unit), via the
    * native [[graft.functions.WordShingles]] expression (one string pass;
    * the composable transform/element_at form cost ~4 s per pass at sf0.1).
    */
  private def shinglesCol(text: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(graft.functions.WordShingles(Bridge.expression(text), 3))
  }

  private val sqlShingles =
    "list_distinct(list_transform(range(1, len(w) - 1), i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))"

  /** Shingle sets with an explicit repartition BEFORE the heavy projection:
    * the documents table is one small parquet file (one scan partition), so
    * without it the shingle+hash work runs on a single core no matter how
    * many the executor has — the classic small-file parallelism trap.
    */
  private def docShingleSets(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .repartition(s.sparkContext.defaultParallelism)
      .select(col("doc_id"), col("lang"), col("n_chars"), shinglesCol(col("text")).as("sh"))
      .filter(size(col("sh")) >= 1)

  private def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") / size(array_union(a, b))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Exact dedup: digest-keyed aggregate; the self-union doubles the input
    // so the keep-first policy is actually exercised.
    "dd_exact" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val doubled = docs.unionAll(docs)
      doubled
        .groupBy(md5(col("text")).as("digest"))
        .agg(count(lit(1)).as("copies"), min(col("doc_id")).as("keep_id"))
        .agg(
          sum(col("copies")).as("n_input"),
          count(lit(1)).as("n_unique"),
          (sum(col("copies")) - count(lit(1))).as("n_removed"))
    }),

    // Blocked n-gram Jaccard via an INVERTED INDEX: explode shingles, join
    // on (block, shingle), count shared shingles per pair, then
    // jac = common / (|A| + |B| − common). Work is proportional to the
    // number of shingle co-occurrences, not O(block²) array intersections —
    // pairs sharing nothing are never materialized. Identical result to the
    // all-pairs formulation (jac > 0 requires ≥ 1 shared shingle).
    "dd_ngram_jaccard" -> ((s, d) => {
      val docs = docShingleSets(s, d)
        .withColumn("bucket", expr("n_chars div 100"))
        .withColumn("sz", size(col("sh")))
      // Join on a 64-bit hash of the shingle, not the string — 8-byte keys
      // in the shuffle instead of ~25-byte strings (collisions: ~|shingles|²
      // /2^64, irrelevant; the oracle compares final jaccards, unchanged).
      val inv = docs.select(col("doc_id"), col("lang"), col("bucket"), col("sz"),
          explode(col("sh")).as("shingle"))
        .select(col("doc_id"), col("lang"), col("bucket"), col("sz"),
          xxhash64(col("shingle")).as("shx"))
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
        .orderBy("doc_a", "doc_b")
    }),

    // MinHash + LSH: k=16 universal-family minhashes in one aggregation
    // pass, 4-band LSH join, candidates verified with true Jaccard (via
    // shared-shingle counts, like dd_ngram_jaccard). The exploded+hashed
    // shingle lineage feeds signatures AND verification; it is recomputed
    // per branch rather than persisted — a persist() from inside a query
    // builder is never released (the API returns a lazy DataFrame) and
    // would pin executor memory for the rest of the session. At 100 TB
    // the caller should checkpoint this intermediate explicitly; with the
    // native shingle/hash expressions the local recompute is ~1 s.
    "dd_minhash" -> ((s, d) => {
      val sets = docShingleSets(s, d).select(col("doc_id"), col("sh"))
        .withColumn("sz", size(col("sh")))
      val hashed = sets.select(col("doc_id"), col("sz"), explode(col("sh")).as("shingle"))
        .withColumn("h", mdint(col("shingle")))
      val sigCols = (0 until K).map(i => min(minhash(col("h"), i)).as(s"s$i"))
      val sig = hashed.groupBy("doc_id").agg(sigCols.head, sigCols.tail: _*)
      // one explode, not a 4-way unionAll — a union recomputes the signature
      // aggregate once per branch
      val bands = sig.select(col("doc_id"), explode(array((0 until BANDS).map { bnd =>
        struct(lit(bnd).as("band"),
          concat_ws(",", (0 until 4).map(r => col(s"s${bnd * 4 + r}")): _*).as("key"))
      }: _*)).as("b"))
        .select(col("doc_id"), col("b.band").as("band"), col("b.key").as("key"))
      val cand = bands.as("x").join(bands.as("y"),
          col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
        .distinct()
      val ia = hashed.select(col("doc_id").as("doc_a"), col("sz").as("sz_a"),
        col("shingle"))
      val ib = hashed.select(col("doc_id").as("doc_b2"), col("sz").as("sz_b"),
        col("shingle").as("shingle2"))
      cand.join(ia, "doc_a")
        .join(ib, col("doc_b") === col("doc_b2") && col("shingle") === col("shingle2"))
        .groupBy("doc_a", "doc_b", "sz_a", "sz_b")
        .agg(count(lit(1)).as("common"))
        .withColumn("jac",
          col("common").cast("double") / (col("sz_a") + col("sz_b") - col("common")))
        .filter(col("jac") >= JACCARD_T)
        .select("doc_a", "doc_b", "jac")
        .orderBy("doc_a", "doc_b")
    }),

    // SimHash: 32-bit signature from term-frequency-weighted word-hash bits;
    // near-dup pairs = hamming ≤ 3, found via 8-bit chunk blocking.
    "dd_simhash" -> ((s, d) => {
      val wc = t(s, d, "documents")
        .repartition(s.sparkContext.defaultParallelism)
        .select(col("doc_id"), explode(wordsCol).as("word"))
        .groupBy("doc_id", "word").agg(count(lit(1)).as("cnt"))
        .withColumn("h", mdint(col("word")))
      val bitCols = (0 until 32).map(j =>
        sum(col("cnt") * (shiftright(col("h"), j).bitwiseAND(lit(1L)) * 2 - 1)).as(s"b$j"))
      val bitSums = wc.groupBy("doc_id").agg(bitCols.head, bitCols.tail: _*)
      // (no persist: see dd_minhash — builder-scoped persists leak for the
      // session; the two-sided recompute of this small aggregate is cheap)
      val sig = bitSums.select(col("doc_id"),
        (0 until 32).map(j => when(col(s"b$j") > 0, lit(1L << j)).otherwise(0L))
          .reduce(_ + _).as("sig"))
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
        .orderBy("doc_a", "doc_b")
    }))

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

    Map(
      "dd_exact" ->
        """WITH doubled AS (SELECT * FROM documents UNION ALL SELECT * FROM documents),
          |cl AS (SELECT md5(text) AS digest, COUNT(*) AS copies, MIN(doc_id) AS keep_id
          |       FROM doubled GROUP BY md5(text))
          |SELECT CAST(SUM(copies) AS BIGINT) AS n_input, COUNT(*) AS n_unique,
          |  CAST(SUM(copies) - COUNT(*) AS BIGINT) AS n_removed
          |FROM cl""".stripMargin,
      "dd_ngram_jaccard" ->
        s"""WITH ws AS (SELECT doc_id, lang, n_chars, string_split(text, ' ') AS w FROM documents),
           |sets AS (SELECT doc_id, lang, n_chars // 100 AS bucket, $sqlShingles AS sh
           |         FROM ws WHERE len(w) >= 3)
           |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           |  CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / len(list_distinct(list_concat(a.sh, b.sh))) AS jac
           |FROM sets a JOIN sets b
           |  ON a.lang = b.lang AND a.bucket = b.bucket AND a.doc_id < b.doc_id
           |WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / len(list_distinct(list_concat(a.sh, b.sh))) >= $JACCARD_T
           |ORDER BY doc_a, doc_b""".stripMargin,
      "dd_minhash" ->
        s"""WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
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
           |  FROM cand JOIN sets a ON doc_a = a.doc_id JOIN sets b ON doc_b = b.doc_id)
           |SELECT doc_a, doc_b, jac FROM jacs WHERE jac >= $JACCARD_T
           |ORDER BY doc_a, doc_b""".stripMargin,
      "dd_simhash" ->
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
           |ORDER BY doc_a, doc_b""".stripMargin)
  }
}
