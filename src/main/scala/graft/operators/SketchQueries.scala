package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.CrossHash

/** Gate bindings of the [[SketchOps]] surface to the test tables, plus the
  * DuckDB oracle SQL. Because both sketches draw their randomness from the
  * cross-engine hash, the APPROXIMATE estimates themselves hash-match the
  * oracle — the sketch category's counterpart to what q26 (engine-native
  * HLL) can only rows-gate.
  */
object SketchQueries {
  import Tables._

  private val KMV_K = 256
  private val CMS_D = 4
  private val CMS_W = 1024 // ~6 events/bucket at sf0.01 — collisions rare
                           // enough that min-over-rows recovers near-exact
                           // counts (w=64 measured: est ~5× exact, noise)
  private val CMS_TOPK = 10

  private val BLOOM_M = 1024
  private val BLOOM_K = 3

  private val AMS_D = 5
  private val AMS_W = 16

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q30_kmv_distinct" -> ((s, d) =>
      SketchOps.kmvDistinct(t(s, d, "lineitem"), col("l_partkey"),
        "l_returnflag", KMV_K)),

    // AMS second-moment sketch: self-join size of events on user_id —
    // the join-size estimate a planner wants before paying the join.
    "q41_ams_f2" -> ((s, d) =>
      SketchOps.amsF2(t(s, d, "events"), col("user_id"), AMS_D, AMS_W)),
    // Feature binning COMPOSED with the quantile sketch: cutpoints are
    // the p50/p95/p99 est_hi values (integer-valued by construction),
    // collected as model state and applied as a pure projection — the
    // never-sort-the-corpus equi-depth binning path.
    "q38_bucketize" -> ((s, d) => {
      val li = t(s, d, "lineitem")
      val cuts = SketchOps.histQuantiles(li, col("l_extendedprice"), 128L, 1024,
          Seq(500, 950, 990))
        .select("est_hi").collect().map(_.getAs[Number](0).doubleValue()).sorted
      SketchOps.bucketize(
          li.select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice")),
          col("l_extendedprice"), cuts.toSeq)
        .orderBy("l_orderkey", "l_linenumber")
    }),
    // Skew pre-flight over events.user_id with every 10th user's rows
    // doubled (the dup-injection pattern) so the hottest key, skew factor
    // and suggested salt are all non-trivial.
    "q37_skew_report" -> ((s, d) => {
      val ev = t(s, d, "events")
      SketchOps.skewReport(ev.unionAll(ev.filter(col("user_id") % 10 === 0)),
        col("user_id"))
    }),
    // Cross-source shingle-set Jaccard from bottom-k sketches: the
    // overlap triage over the 20 sources' 3-word shingle vocabularies
    // (~700 distinct per source at sf0.01, so the k=256 sketch genuinely
    // SATURATES and the estimator estimates rather than degenerating to
    // the exact small-set case). Shingles via the same native
    // WordShingles expression the minhash family pins.
    "q36_kmv_jaccard" -> ((s, d) =>
      SketchOps.kmvJaccard(
        t(s, d, "documents").select(col("source"),
          explode(DedupOps.shinglesCol(col("text"))).as("sh3")),
        col("sh3"), "source", KMV_K)),
    // Sketch set ops on the SAME input family as q36: per source pair,
    // union/intersection/difference vocabulary cardinalities from the
    // bottom-k sketches alone — the merge-planning readout.
    "q42_kmv_setops" -> ((s, d) =>
      SketchOps.kmvSetOps(
        t(s, d, "documents").select(col("source"),
          explode(DedupOps.shinglesCol(col("text"))).as("sh3")),
        col("sh3"), "source", KMV_K)),
    "ev_heavy_hitters" -> ((s, d) =>
      SketchOps.cmsHeavyHitters(t(s, d, "events"), col("user_id"),
        CMS_D, CMS_W, CMS_TOPK)),
    // Histogram quantile sketch — the quantile member of the sketch
    // family. binWidth 128 = 2^7 keeps bin assignment exact; the oracle
    // value-checks the estimates and PipelineOpsSpec asserts the
    // est_hi ≥ exact ≥ est_hi − binWidth bracket (incl. on this table
    // at test scale). The exact interpolated
    // percentile is deliberately NOT computed here: Spark's exact
    // percentile collects every value per group (4.6 s at sf0.1, OOM at
    // scale) — replacing exactly that cost is the sketch's reason to
    // exist, and charging it to the sketch's bench entry buried the
    // sketch's true ~0.3 s cost.
    "q33_hist_quantile" -> ((s, d) =>
      SketchOps.histQuantiles(t(s, d, "lineitem"), col("l_extendedprice"),
          binWidth = 128L, bins = 1024, permille = Seq(500, 950, 990))
        .select("q", "est_hi", "n")
        .orderBy("q")),
    // Sketch-then-refine EXACT percentiles — the scale-safe replacement for
    // q22's built-in percentile() (which collects every group value into
    // one buffer). Same grid as q33; pass 2 sorts only the target bins.
    // binWidth 1024 = 2^10, 1024 bins covers o_totalprice (< 2^20).
    "q34_quantile_refine" -> ((s, d) =>
      SketchOps.exactQuantileRefine(t(s, d, "orders"), col("o_totalprice"),
        "o_orderstatus", binWidth = 1024L, bins = 1024,
        permille = Seq(250, 500, 900))),

    // ANALYZE-style column profile over a 4-type projection (bigint,
    // integral double, string, date) whose rendered min/max strings are
    // dialect-identical; exact distincts via the melt shape, no Expand.
    "q35_profile" -> ((s, d) =>
      SketchOps.profile(t(s, d, "lineitem").select(
        col("l_orderkey"), col("l_quantity"), col("l_returnflag"),
        col("l_shipdate").cast("date").as("l_shipdate")))),

    // Runtime-filter demo: bloom built from the FILTERED dim side
    // (p_size = 50 parts), fact side prefiltered by the pure-projection
    // may-contain predicate; output compares bloom passes vs the exact
    // semi join per flag (n_false_pos = the price of m=1024 bits).
    "q31_bloom_prune" -> ((s, d) => {
      val dim = t(s, d, "part").filter(col("p_size") === 50).select(col("p_partkey"))
      val mask = SketchOps.bloomBits(dim, col("p_partkey"), BLOOM_M, BLOOM_K)
      val li = t(s, d, "lineitem")
      val nPass = li
        .filter(SketchOps.bloomMayContain(col("l_partkey"), mask, BLOOM_M, BLOOM_K))
        .groupBy("l_returnflag").agg(count(lit(1)).as("n_pass"))
      val nTrue = li
        .join(broadcast(dim), col("l_partkey") === col("p_partkey"), "left_semi")
        .groupBy("l_returnflag").agg(count(lit(1)).as("n_true"))
      nPass.join(nTrue, Seq("l_returnflag"), "left")
        .select(col("l_returnflag"), col("n_pass"),
          coalesce(col("n_true"), lit(0L)).as("n_true"),
          (col("n_pass") - coalesce(col("n_true"), lit(0L))).as("n_false_pos"))
        .orderBy("l_returnflag")
    }))

  private val sqlH = CrossHash.sqlMdint("CAST(l_partkey AS VARCHAR)")
  private val sqlHU = CrossHash.sqlMdint("CAST(user_id AS VARCHAR)")

  def oracleSql: Map[String, String] = Map(
    // Profile: per-column scalar aggregates, one UNION ALL branch per
    // column — trivially correct SQL against the melt-shaped Spark plan.
    "q35_profile" -> {
      val branches = Seq("l_orderkey", "l_quantity", "l_returnflag", "l_shipdate")
        .map { c =>
          s"""SELECT '$c' AS col_name, COUNT(*) AS n_rows,
             |  CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
             |  CAST(MIN($c) AS VARCHAR) AS min_str, CAST(MAX($c) AS VARCHAR) AS max_str,
             |  COUNT(DISTINCT $c) AS n_distinct
             |FROM src""".stripMargin
        }.mkString("\nUNION ALL\n")
      s"""WITH src AS (SELECT l_orderkey, l_quantity, l_returnflag,
         |    CAST(l_shipdate AS DATE) AS l_shipdate FROM lineitem)
         |$branches
         |ORDER BY col_name""".stripMargin
    },
    // Binning: the q33 cutpoint CTE chain verbatim, then bucket = count
    // of cuts <= value via a correlated count — integer compares only.
    "q38_bucketize" ->
      """WITH b AS (SELECT least(greatest(CAST(floor(l_extendedprice / 128) AS BIGINT), 0), 1023) AS bin
        |  FROM lineitem WHERE l_extendedprice IS NOT NULL),
        |c AS (SELECT bin, COUNT(*) AS cnt FROM b GROUP BY bin),
        |cum AS (SELECT bin, CAST(SUM(cnt) OVER (ORDER BY bin) AS BIGINT) AS cum FROM c),
        |n AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM c),
        |qs AS (SELECT unnest([500, 950, 990]) AS p),
        |est AS (SELECT p, MIN(bin) AS qbin
        |  FROM qs, n, cum
        |  WHERE cum >= floor((n * p + 999) / CAST(1000 AS DOUBLE))
        |  GROUP BY p),
        |cuts AS (SELECT (qbin + 1) * 128 AS cut FROM est)
        |SELECT l.l_orderkey, l.l_linenumber, l.l_extendedprice,
        |  CASE WHEN l.l_extendedprice IS NULL THEN NULL
        |       ELSE CAST((SELECT COUNT(*) FROM cuts WHERE l.l_extendedprice >= cut)
        |         AS INTEGER) END AS bucket
        |FROM lineitem l ORDER BY l_orderkey, l_linenumber""".stripMargin,
    // Skew report: integer counts, single-division ratios, the
    // multiply-then-divide skew factor association mirrored exactly.
    "q37_skew_report" ->
      """WITH base AS (
        |  SELECT user_id FROM events
        |  UNION ALL SELECT user_id FROM events WHERE user_id % 10 = 0),
        |counts AS (SELECT CAST(user_id AS VARCHAR) AS k, COUNT(*) AS c
        |  FROM base GROUP BY 1),
        |s AS (SELECT CAST(SUM(c) AS BIGINT) AS n_rows, COUNT(*) AS n_keys,
        |    MAX(c) AS max_count FROM counts),
        |t AS (SELECT k AS top_key, c AS top_count FROM counts
        |  ORDER BY c DESC, k LIMIT 1)
        |SELECT s.n_rows, s.n_keys, s.max_count, t.top_key, t.top_count,
        |  CAST(s.n_rows AS DOUBLE) / CAST(s.n_keys AS DOUBLE) AS avg_per_key,
        |  CAST(s.max_count AS DOUBLE) * CAST(s.n_keys AS DOUBLE)
        |    / CAST(s.n_rows AS DOUBLE) AS skew_factor,
        |  CAST(ceil(CAST(s.max_count AS DOUBLE) * CAST(s.n_keys AS DOUBLE)
        |    / CAST(s.n_rows AS DOUBLE)) AS BIGINT) AS suggested_salt
        |FROM s, t""".stripMargin,
    // Mirrors kmvJaccard stage-for-stage: distinct (source, shingle-hash),
    // per-source bottom-k, per-pair union-of-sketches re-ranked to k with
    // membership flags, then the exact distinct + equality-self-join
    // comparison path. Both emitted ratios are single divisions of exact
    // integers — bit-identical cross-engine.
    "q36_kmv_jaccard" -> {
      val h = graft.functions.CrossHash.sqlMdint("key")
      s"""WITH ws AS (SELECT source, string_split(text, ' ') AS w FROM documents),
         |shg AS (SELECT source AS g, unnest(${DedupQueries.sqlShingles}) AS key FROM ws),
         |hashed AS (SELECT DISTINCT g, $h AS h FROM shg),
         |sk AS (SELECT g, h FROM (
         |    SELECT g, h, ROW_NUMBER() OVER (PARTITION BY g ORDER BY h) AS rn
         |    FROM hashed) x WHERE rn <= $KMV_K),
         |gs AS (SELECT DISTINCT g FROM sk),
         |pairs AS (SELECT a.g AS ga, b.g AS gb FROM gs a JOIN gs b ON a.g < b.g),
         |pu AS (SELECT p.ga, p.gb, s.h,
         |    MAX(CASE WHEN s.g = p.ga THEN 1 ELSE 0 END) AS in_a,
         |    MAX(CASE WHEN s.g = p.gb THEN 1 ELSE 0 END) AS in_b
         |  FROM pairs p JOIN sk s ON s.g = p.ga OR s.g = p.gb
         |  GROUP BY p.ga, p.gb, s.h),
         |est AS (SELECT ga, gb, COUNT(*) AS n_union_kept,
         |    SUM(in_a * in_b) AS n_both
         |  FROM (SELECT pu.*, ROW_NUMBER() OVER (PARTITION BY ga, gb ORDER BY h) AS urn
         |        FROM pu) y
         |  WHERE urn <= $KMV_K GROUP BY ga, gb),
         |ks AS (SELECT DISTINCT g, key FROM shg),
         |dper AS (SELECT g, COUNT(*) AS d FROM ks GROUP BY g),
         |inter AS (SELECT a.g AS ia, b.g AS ib, COUNT(*) AS n_inter
         |  FROM ks a JOIN ks b ON a.key = b.key AND a.g < b.g GROUP BY a.g, b.g)
         |SELECT e.ga AS group_a, e.gb AS group_b,
         |  e.n_union_kept,
         |  CAST(e.n_both AS DOUBLE) / CAST(e.n_union_kept AS DOUBLE) AS est_jaccard,
         |  CAST(COALESCE(i.n_inter, 0) AS DOUBLE)
         |    / CAST(da.d + db.d - COALESCE(i.n_inter, 0) AS DOUBLE) AS exact_jaccard
         |FROM est e
         |JOIN dper da ON da.g = e.ga
         |JOIN dper db ON db.g = e.gb
         |LEFT JOIN inter i ON i.ia = e.ga AND i.ib = e.gb
         |ORDER BY group_a, group_b""".stripMargin
    },
    // set-ops estimates mirrored from the same sketches: est_union via
    // the saturation-aware KMV estimator ((k−1)·2^60 exact in a double),
    // intersection = jaccard·union (multiply of two correctly-rounded
    // values), differences clamped at 0 — op-for-op
    "q42_kmv_setops" -> {
      val h = graft.functions.CrossHash.sqlMdint("key")
      val c260 = "1152921504606846976.0"
      def est(nk: String, kth: String) =
        s"CASE WHEN $nk < $KMV_K THEN CAST($nk AS DOUBLE) " +
          s"ELSE ${KMV_K - 1}.0 * $c260 / CAST($kth AS DOUBLE) END"
      s"""WITH ws AS (SELECT source, string_split(text, ' ') AS w FROM documents),
         |shg AS (SELECT source AS g, unnest(${DedupQueries.sqlShingles}) AS key FROM ws),
         |hashed AS (SELECT DISTINCT g, $h AS h FROM shg),
         |sk AS (SELECT g, h FROM (
         |    SELECT g, h, ROW_NUMBER() OVER (PARTITION BY g ORDER BY h) AS rn
         |    FROM hashed) x WHERE rn <= $KMV_K),
         |per AS (SELECT g, COUNT(*) AS nk, MAX(h) AS kth FROM sk GROUP BY g),
         |gs AS (SELECT DISTINCT g FROM sk),
         |pairs AS (SELECT a.g AS ga, b.g AS gb FROM gs a JOIN gs b ON a.g < b.g),
         |pu AS (SELECT p.ga, p.gb, s.h,
         |    MAX(CASE WHEN s.g = p.ga THEN 1 ELSE 0 END) AS in_a,
         |    MAX(CASE WHEN s.g = p.gb THEN 1 ELSE 0 END) AS in_b
         |  FROM pairs p JOIN sk s ON s.g = p.ga OR s.g = p.gb
         |  GROUP BY p.ga, p.gb, s.h),
         |est AS (SELECT ga, gb, COUNT(*) AS n_union_kept,
         |    SUM(in_a * in_b) AS n_both, MAX(h) AS ukth
         |  FROM (SELECT pu.*, ROW_NUMBER() OVER (PARTITION BY ga, gb ORDER BY h) AS urn
         |        FROM pu) y
         |  WHERE urn <= $KMV_K GROUP BY ga, gb),
         |ej AS (SELECT e.ga, e.gb, e.n_union_kept,
         |    ${est("e.n_union_kept", "e.ukth")} AS est_union,
         |    CAST(e.n_both AS DOUBLE) / CAST(e.n_union_kept AS DOUBLE) AS est_jaccard,
         |    ${est("da.nk", "da.kth")} AS est_a,
         |    ${est("db.nk", "db.kth")} AS est_b
         |  FROM est e JOIN per da ON da.g = e.ga JOIN per db ON db.g = e.gb)
         |SELECT ga AS group_a, gb AS group_b, n_union_kept, est_union,
         |  est_jaccard, est_jaccard * est_union AS est_intersection,
         |  GREATEST(est_a - est_jaccard * est_union, 0.0) AS est_only_a,
         |  GREATEST(est_b - est_jaccard * est_union, 0.0) AS est_only_b
         |FROM ej ORDER BY group_a, group_b""".stripMargin
    },
    "q41_ams_f2" -> {
      // per-j sign sums mirrored through the same universal family;
      // median of the d integer-scaled means via ORDER BY ... OFFSET
      val sums = (0 until AMS_D * AMS_W).map { j =>
        s"SUM(1 - 2 * (${CrossHash.sqlMinhash("h", j)} % 2)) AS s$j"
      }.mkString(",\n    ")
      val means = (0 until AMS_D).map { i =>
        (0 until AMS_W).map(j => s"s${i * AMS_W + j} * s${i * AMS_W + j}")
          .mkString(" + ") + s" AS m$i"
      }.mkString(",\n    ")
      s"""WITH b AS (SELECT ${CrossHash.sqlMdint("CAST(user_id AS VARCHAR)")} AS h
         |  FROM events WHERE user_id IS NOT NULL),
         |sk AS (SELECT
         |    $sums
         |  FROM b),
         |m AS (SELECT
         |    $means
         |  FROM sk),
         |med AS (SELECT mm AS medw FROM (
         |    SELECT unnest([${(0 until AMS_D).map(i => s"m$i").mkString(", ")}]) AS mm
         |    FROM m) ORDER BY mm LIMIT 1 OFFSET ${(AMS_D - 1) / 2}),
         |ex AS (SELECT CAST(SUM(cnt * cnt) AS BIGINT) AS f2_exact FROM (
         |    SELECT COUNT(*) AS cnt FROM events WHERE user_id IS NOT NULL
         |    GROUP BY user_id))
         |SELECT ex.f2_exact,
         |  CAST(med.medw AS DOUBLE) / ${AMS_W.toDouble} AS f2_est,
         |  abs(CAST(med.medw AS DOUBLE) / ${AMS_W.toDouble}
         |      - CAST(ex.f2_exact AS DOUBLE))
         |    / CAST(ex.f2_exact AS DOUBLE) AS rel_err
         |FROM ex, med""".stripMargin
    },
    "q30_kmv_distinct" -> {
      // (k−1)·2^60 folded exactly on both sides (≤ 8 significant bits)
      val scale = s"(${(KMV_K - 1).toDouble} * 1152921504606846976.0)"
      s"""WITH hashed AS (
         |  SELECT DISTINCT l_returnflag, $sqlH AS h FROM lineitem),
         |ranked AS (SELECT l_returnflag, h,
         |    ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY h) AS rn
         |  FROM hashed),
         |sk AS (SELECT l_returnflag, COUNT(*) AS n_kept, MAX(h) AS kth
         |  FROM ranked WHERE rn <= $KMV_K GROUP BY l_returnflag),
         |ex AS (SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS exact_distinct
         |  FROM lineitem GROUP BY l_returnflag),
         |j AS (SELECT sk.l_returnflag, ex.exact_distinct,
         |    CASE WHEN sk.n_kept < $KMV_K THEN CAST(sk.n_kept AS DOUBLE)
         |         ELSE $scale / CAST(sk.kth AS DOUBLE) END AS est_distinct
         |  FROM sk JOIN ex ON sk.l_returnflag = ex.l_returnflag)
         |SELECT l_returnflag, exact_distinct, est_distinct,
         |  (est_distinct - CAST(exact_distinct AS DOUBLE))
         |    / CAST(exact_distinct AS DOUBLE) AS rel_err
         |FROM j ORDER BY l_returnflag""".stripMargin
    },
    // q literal is p/1000.0 (one exact-ish division both engines); ranks
    // are integer permille math — deliberately NOT double quantile
    // literals (DuckDB bare 0.95 types as DECIMAL: exact ceil(q·n) where
    // Spark's double 0.95·n rounds — a real off-by-one trap at integral
    // boundaries).
    "q33_hist_quantile" ->
      """WITH b AS (SELECT least(greatest(CAST(floor(l_extendedprice / 128) AS BIGINT), 0), 1023) AS bin
        |  FROM lineitem WHERE l_extendedprice IS NOT NULL),
        |c AS (SELECT bin, COUNT(*) AS cnt FROM b GROUP BY bin),
        |cum AS (SELECT bin, CAST(SUM(cnt) OVER (ORDER BY bin) AS BIGINT) AS cum FROM c),
        |n AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM c),
        |qs AS (SELECT unnest([500, 950, 990]) AS p),
        |est AS (SELECT p, MIN(bin) AS qbin
        |  FROM qs, n, cum
        |  WHERE cum >= floor((n * p + 999) / CAST(1000 AS DOUBLE))
        |  GROUP BY p)
        |SELECT p / CAST(1000 AS DOUBLE) AS q, (qbin + 1) * 128 AS est_hi, n.n AS n
        |FROM est, n ORDER BY q""".stripMargin,
    // Mirrors exactQuantileRefine's construction step-for-step: integer
    // permille rank math, bin location via cumulative counts, ROW_NUMBER
    // only inside the located bins, 3-FP-op interpolation in the same
    // operand order.
    "q34_quantile_refine" ->
      """WITH b AS (SELECT o_orderstatus AS g,
        |    least(greatest(CAST(floor(o_totalprice / 1024) AS BIGINT), 0), 1023) AS bin,
        |    CAST(o_totalprice AS DOUBLE) AS v
        |  FROM orders WHERE o_totalprice IS NOT NULL),
        |c AS (SELECT g, bin, COUNT(*) AS cnt FROM b GROUP BY g, bin),
        |cc AS (SELECT g, bin, cnt, COALESCE(CAST(SUM(cnt) OVER (PARTITION BY g ORDER BY bin
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS cum_prev FROM c),
        |nn AS (SELECT g, CAST(SUM(cnt) AS BIGINT) AS n FROM c GROUP BY g),
        |qs AS (SELECT unnest([250, 500, 900]) AS p),
        |t AS (SELECT nn.g, qs.p, nn.n,
        |    ((nn.n - 1) * qs.p) % 1000 AS fr,
        |    ((nn.n - 1) * qs.p) // 1000 + 1 AS rank_lo,
        |    ((nn.n - 1) * qs.p) // 1000
        |      + CASE WHEN ((nn.n - 1) * qs.p) % 1000 > 0 THEN 2 ELSE 1 END AS rank_hi
        |  FROM nn, qs),
        |nb AS (SELECT DISTINCT t.g, cc.bin, cc.cum_prev FROM t JOIN cc ON cc.g = t.g
        |    AND ((t.rank_lo > cc.cum_prev AND t.rank_lo <= cc.cum_prev + cc.cnt)
        |      OR (t.rank_hi > cc.cum_prev AND t.rank_hi <= cc.cum_prev + cc.cnt))),
        |s AS (SELECT b.g, b.v, nb.cum_prev
        |    + ROW_NUMBER() OVER (PARTITION BY b.g, b.bin ORDER BY b.v) AS grank
        |  FROM b JOIN nb ON nb.g = b.g AND nb.bin = b.bin),
        |vals AS (SELECT t.g, t.p, t.n, t.fr,
        |    MAX(CASE WHEN s.grank = t.rank_lo THEN s.v END) AS v_lo,
        |    MAX(CASE WHEN s.grank = t.rank_hi THEN s.v END) AS v_hi
        |  FROM t JOIN s ON s.g = t.g AND (s.grank = t.rank_lo OR s.grank = t.rank_hi)
        |  GROUP BY t.g, t.p, t.n, t.fr)
        |SELECT g AS o_orderstatus, p / CAST(1000 AS DOUBLE) AS q,
        |  v_lo + (CAST(fr AS DOUBLE) / CAST(1000 AS DOUBLE)) * (v_hi - v_lo) AS exact_value,
        |  n
        |FROM vals ORDER BY o_orderstatus, q""".stripMargin,
    "q31_bloom_prune" -> {
      val hKey = CrossHash.sqlMdint("CAST(key AS VARCHAR)")
      val hLi = CrossHash.sqlMdint("CAST(l_partkey AS VARCHAR)")
      val posSelects = (0 until BLOOM_K).map(i =>
        s"SELECT (${CrossHash.sqlMinhash(hKey, i)}) % $BLOOM_M AS pos FROM bl")
        .mkString("\n  UNION ALL\n  ")
      val allSet = (0 until BLOOM_K).map(i =>
        s"(${CrossHash.sqlMinhash(hLi, i)}) % $BLOOM_M IN (SELECT pos FROM pc)")
        .mkString("\n    AND ")
      s"""WITH bl AS (SELECT p_partkey AS key FROM part WHERE p_size = 50),
         |pc AS (SELECT DISTINCT pos FROM (
         |  $posSelects)),
         |keys AS (SELECT DISTINCT l_partkey FROM lineitem),
         |pass AS (SELECT l_partkey FROM keys
         |  WHERE $allSet),
         |agg_pass AS (SELECT l_returnflag, COUNT(*) AS n_pass
         |  FROM lineitem JOIN pass USING (l_partkey) GROUP BY l_returnflag),
         |agg_true AS (SELECT l_returnflag, COUNT(*) AS n_true
         |  FROM lineitem WHERE l_partkey IN (SELECT key FROM bl)
         |  GROUP BY l_returnflag)
         |SELECT a.l_returnflag, a.n_pass,
         |  COALESCE(t.n_true, 0) AS n_true,
         |  a.n_pass - COALESCE(t.n_true, 0) AS n_false_pos
         |FROM agg_pass a LEFT JOIN agg_true t USING (l_returnflag)
         |ORDER BY a.l_returnflag""".stripMargin
    },
    "ev_heavy_hitters" -> {
      val rows = (0 until CMS_D).map(r =>
        s"SELECT user_id, $r AS r, (${CrossHash.sqlMinhash(sqlHU, r)}) % $CMS_W AS bucket FROM events")
        .mkString("\n  UNION ALL\n  ")
      s"""WITH rb AS (
         |  $rows),
         |counters AS (SELECT r, bucket, COUNT(*) AS cnt FROM rb GROUP BY r, bucket),
         |ex AS (SELECT user_id AS key, COUNT(*) AS exact_count FROM events GROUP BY user_id),
         |kb AS (SELECT DISTINCT user_id, r, bucket FROM rb),
         |est AS (SELECT kb.user_id, MIN(c.cnt) AS est_count
         |  FROM kb JOIN counters c ON c.r = kb.r AND c.bucket = kb.bucket
         |  GROUP BY kb.user_id)
         |SELECT rank, key, est_count, exact_count FROM (
         |  SELECT ex.key, est.est_count, ex.exact_count,
         |    ROW_NUMBER() OVER (ORDER BY est.est_count DESC, ex.key) AS rank
         |  FROM est JOIN ex ON ex.key = est.user_id) x
         |WHERE rank <= $CMS_TOPK ORDER BY rank""".stripMargin
    })
}
