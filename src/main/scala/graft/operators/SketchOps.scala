package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.CrossHash

/** Deterministic mergeable sketches built on the cross-engine 60-bit hash
  * ([[CrossHash.mdint]]) and the Carter–Wegman universal family
  * ([[CrossHash.minhash]]).
  *
  * Why these exist next to Spark's own sketches: `approx_count_distinct`
  * (HLL, gate query q26) answers the same questions, but its registers are
  * engine-internal — the result can only be rows-gated. A sketch whose
  * randomness comes from a SEEDED HASH is a pure function of the data, so
  * the approximate answer itself value-oracles in DuckDB, and two
  * independent engines can build/merge THE SAME sketch — exactly what a
  * 100 TB pipeline wants when sketches are persisted and unioned across
  * days or clusters.
  *
  * Scale shapes:
  *   - KMV: one distinct on (group, 60-bit hash) with map-side combine,
  *     then a bottom-k window per group — shuffle carries hashes, never
  *     keys; sketch state is k longs per group, mergeable by min-union.
  *   - CMS: counter table is d×w cells REGARDLESS of key cardinality; the
  *     counter build is one explode + count aggregate (map-side combined),
  *     and lookups join the tiny broadcast counter table.
  */
object SketchOps {

  /** KMV (k-minimum-values / bottom-k) distinct-count estimate per group:
    * keep the k smallest distinct hash values; when the sketch saturates
    * the estimator is (k−1)·2^60 / h_(k) (hashes uniform on [0, 2^60)),
    * below saturation the estimate is the distinct-HASH count — exact up
    * to 60-bit collisions (~n²/2^61 expected, irrelevant below ~10^8
    * keys per group). Output per group: `exact_distinct` (true
    * distinct-KEY count, computed the expensive way for comparison),
    * `est_distinct`, `rel_err`.
    *
    * FP discipline: (k−1)·2^60 is a constant with ≤ 53 significant bits
    * (exact double), h_(k) < 2^60 casts exactly, so the estimate is ONE
    * correctly-rounded division — bit-identical cross-engine.
    */
  def kmvDistinct(df: DataFrame, keyCol: Column, groupCol: String, k: Int): DataFrame = {
    require(k >= 2, s"KMV needs k >= 2, got $k")
    val hashed = df
      .select(col(groupCol), CrossHash.mdint(keyCol.cast("string")).as("h"))
      .distinct()
    val w = Window.partitionBy(col(groupCol)).orderBy(col("h"))
    val sketch = hashed
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_kept"), max(col("h")).as("kth"))
    val exact = df.groupBy(col(groupCol)).agg(countDistinct(keyCol).as("exact_distinct"))
    val est = when(col("n_kept") < k, col("n_kept").cast("double"))
      .otherwise(lit((k - 1).toDouble * 1152921504606846976.0d) / col("kth").cast("double"))
    sketch.join(exact, groupCol)
      .select(col(groupCol), col("exact_distinct"), est.as("est_distinct"))
      .withColumn("rel_err",
        (col("est_distinct") - col("exact_distinct").cast("double")) /
          col("exact_distinct").cast("double"))
      .orderBy(groupCol)
  }

  /** FEATURE BINNING against precomputed cutpoints — the apply step of
    * equi-depth bucketing: compute cutpoints ONCE (on a sample, via
    * [[histQuantiles]] — the sketch exists precisely so this never sorts
    * the corpus), then assign `bucket` = number of cutpoints ≤ value as a
    * pure projection with the cuts as broadcast literals. Cutpoints are
    * MODEL STATE (a handful of doubles), the corpus is scanned once, no
    * shuffle — the 100 TB shape for quantile/range binning. Comparisons
    * and the bucket sum are exact integer/compare ops — bit-identical
    * cross-engine. Values below every cut get bucket 0; nulls get null.
    */
  def bucketize(df: DataFrame, valueCol: Column, cuts: Seq[Double]): DataFrame = {
    require(cuts.nonEmpty && cuts == cuts.sorted,
      s"bucketize needs non-empty ascending cutpoints, got $cuts")
    val b = cuts.map(c => when(valueCol >= c, 1).otherwise(0))
      .reduce(_ + _)
    df.withColumn("bucket", when(valueCol.isNull, lit(null)).otherwise(b).cast("int"))
  }

  /** JOIN-KEY SKEW PRE-FLIGHT — the one-row diagnostic a pipeline runs
    * before a big keyed join/aggregation to decide whether it needs
    * salting ([[SkewJoin]]) or AQE skew handling: row/key volumes, the
    * hottest key and its count, mean key occupancy, `skew_factor`
    * (max/avg — 1.0 is perfectly uniform) and the actionable
    * `suggested_salt` = ceil(skew_factor), the fan-out that levels the
    * hottest key to the average.
    *
    * Scale shape: one map-side-combined count per key (the only
    * data-sized shuffle — same cost as the join's own exchange, run on a
    * sample in practice), then constant-size aggregates; the hottest key
    * is a TakeOrdered over the counts, never a global sort. FP: ratios
    * are single divisions (skew_factor is one multiply then one divide,
    * association mirrored in the oracle).
    */
  def skewReport(df: DataFrame, keyCol: Column): DataFrame = {
    val counts = df.groupBy(keyCol.cast("string").as("k"))
      .agg(count(lit(1)).as("c"))
    val summary = counts.agg(
      sum(col("c")).as("n_rows"),
      count(lit(1)).as("n_keys"),
      max(col("c")).as("max_count"))
    val top = counts.orderBy(col("c").desc, col("k")).limit(1)
      .select(col("k").as("top_key"), col("c").as("top_count"))
    summary.crossJoin(top)
      .withColumn("avg_per_key",
        col("n_rows").cast("double") / col("n_keys").cast("double"))
      .withColumn("skew_factor",
        col("max_count").cast("double") * col("n_keys").cast("double") /
          col("n_rows").cast("double"))
      .withColumn("suggested_salt", ceil(col("skew_factor")).cast("long"))
      .select("n_rows", "n_keys", "max_count", "top_key", "top_count",
        "avg_per_key", "skew_factor", "suggested_salt")
  }

  /** KMV (bottom-k) JACCARD between every pair of groups — the
    * cross-source overlap triage a corpus audit runs ("how much of
    * source A's vocabulary / url set / doc-shingle set is also in B?")
    * before paying for a full cross-source dedup pass. Estimator
    * (Broder's minhash resemblance in its bottom-k sketch form, as in
    * Beyer et al. SIGMOD'07 / Bar-Yossef et al.): with K(S) the k
    * smallest distinct 60-bit hashes of S,
    * J ≈ |K(A∪B) ∩ K(A) ∩ K(B)| / |K(A∪B)| — and K(A∪B) is computable
    * from the two sketches alone (bottom-k of K(A) ∪ K(B)), which is why
    * KMV sketches are the mergeable summary: pairwise Jaccard over G
    * sources costs G·k sketch rows, NOT another pass over the data.
    * Below saturation (|A∪B| < k) the sketch holds the whole union and
    * the estimate is exact over hashes.
    *
    * Output per (group_a < group_b) pair: `n_union_kept` (=|K(A∪B)|),
    * `est_jaccard`, plus `exact_jaccard` — the expensive comparison path
    * the sketch replaces at scale, same contract as [[kmvDistinct]]'s
    * `exact_distinct` (drop it in production; it is a full distinct +
    * hash-equality self-join over the per-group hash sets).
    *
    * FP discipline: both ratios are a SINGLE division of exact integers —
    * bit-identical cross-engine. Null keys are excluded from both the
    * sketch and the exact path (set semantics; engines disagree on NULL
    * ordering, so a null hash must never reach a bottom-k slot — the
    * [[histQuantiles]] null discipline). Scale shape: the only data-sized stages
    * are the (group, hash) distinct (map-side combined, hashes not keys
    * on the wire) and the per-group bottom-k window (state k longs per
    * group); everything pairwise runs on G·k-row sketches.
    */
  def kmvJaccard(df: DataFrame, keyCol: Column, groupCol: String, k: Int): DataFrame = {
    require(k >= 2, s"KMV needs k >= 2, got $k")
    // Null keys are EXCLUDED from both the sketch and the exact path (the
    // histQuantiles null discipline): mdint(null) is a null hash that
    // survives distinct() and, under Spark's NULLS FIRST window ordering,
    // would occupy a bottom-k slot — diverging from engines that sort
    // NULLS LAST and from the exact path's set semantics.
    val nn = df.filter(keyCol.isNotNull)
    val hashed = nn
      .select(col(groupCol).as("g"), CrossHash.mdint(keyCol.cast("string")).as("h"))
      .distinct()
    val w = Window.partitionBy(col("g")).orderBy(col("h"))
    val sketch = hashed.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k).select("g", "h")
    val groups = sketch.select(col("g")).distinct()
    val pairs = groups.select(col("g").as("ga"))
      .join(groups.select(col("g").as("gb")), col("ga") < col("gb"))
    // per-pair union of the two sketches' hash SETS, with membership flags
    val pu = pairs.join(sketch, col("g") === col("ga") || col("g") === col("gb"))
      .groupBy(col("ga"), col("gb"), col("h"))
      .agg(max(when(col("g") === col("ga"), 1).otherwise(0)).as("in_a"),
        max(when(col("g") === col("gb"), 1).otherwise(0)).as("in_b"))
    val uw = Window.partitionBy(col("ga"), col("gb")).orderBy(col("h"))
    val est = pu.withColumn("urn", row_number().over(uw))
      .filter(col("urn") <= k)
      .groupBy(col("ga"), col("gb"))
      .agg(count(lit(1)).as("n_union_kept"),
        sum(col("in_a") * col("in_b")).as("n_both"))
      .withColumn("est_jaccard",
        col("n_both").cast("double") / col("n_union_kept").cast("double"))
    // exact comparison path (r15): the SAME distinct (g, h) table the
    // sketch is built from — per-group cardinalities and the equality
    // self-join key on the 60-bit hash, so the raw key string is never
    // distinct'd a second time and never shuffles through the self-join
    // (~25 B/row -> 8 B/row; collision-free at gate scale,
    // oracle-verified — the dd-family candidate-stage convention).
    val dPer = hashed.groupBy(col("g")).agg(count(lit(1)).as("d"))
    val inter = hashed.select(col("g").as("ia"), col("h"))
      .join(hashed.select(col("g").as("ib"), col("h")), Seq("h"))
      .filter(col("ia") < col("ib"))
      .groupBy(col("ia"), col("ib")).agg(count(lit(1)).as("n_inter"))
    est
      .join(dPer.select(col("g").as("ga"), col("d").as("da")), Seq("ga"))
      .join(dPer.select(col("g").as("gb"), col("d").as("db")), Seq("gb"))
      .join(inter, col("ia") === col("ga") && col("ib") === col("gb"), "left")
      .withColumn("ni", coalesce(col("n_inter"), lit(0L)))
      .select(col("ga").as("group_a"), col("gb").as("group_b"),
        col("n_union_kept"), col("est_jaccard"),
        (col("ni").cast("double") / (col("da") + col("db") - col("ni")).cast("double"))
          .as("exact_jaccard"))
      .orderBy("group_a", "group_b")
  }

  /** KMV SET-OPERATION cardinalities between every pair of groups — the
    * mergeable-sketch completion of [[kmvJaccard]]: from the per-group
    * bottom-k sketches ALONE (no second data pass), estimate
    * `|A ∪ B|`, `|A ∩ B|`, `|A \ B|`, `|B \ A|` for every group pair —
    * the numbers a corpus-merge plan needs ("how many new documents does
    * source B actually add?") at G·k sketch rows of cost. Estimators
    * (Beyer et al. SIGMOD'07): union from the KMV distinct estimator on
    * the merged sketch; intersection as Ĵ·Û; differences as each side's
    * own KMV estimate minus the intersection (clamped at 0 — finite-k
    * noise can push the subtraction slightly negative).
    *
    * Unlike [[kmvJaccard]] there is deliberately NO exact comparison
    * path: this op IS the production shape (kmvJaccard's gate already
    * pins sketch-vs-exact on the same input family); every emitted
    * estimate is still value-oracled because the whole chain is
    * deterministic — bottom-k over the 60-bit mdint hashes, then
    * single correctly-rounded divisions/multiplies mirrored op-for-op.
    *
    * Scale shape: identical to [[kmvJaccard]] minus its exact path —
    * one distinct on (group, hash), per-group bottom-k window, all
    * pairwise work on G·k-row sketches.
    */
  def kmvSetOps(df: DataFrame, keyCol: Column, groupCol: String, k: Int): DataFrame = {
    require(k >= 2, s"KMV needs k >= 2, got $k")
    val nn = df.filter(keyCol.isNotNull)
    val hashed = nn
      .select(col(groupCol).as("g"), CrossHash.mdint(keyCol.cast("string")).as("h"))
      .distinct()
    val w = Window.partitionBy(col("g")).orderBy(col("h"))
    val sketch = hashed.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k).select("g", "h")
    val per = sketch.groupBy("g")
      .agg(count(lit(1)).as("nk"), max(col("h")).as("kth"))
    def estOf(nk: Column, kth: Column) = when(nk < k, nk.cast("double"))
      .otherwise(lit((k - 1).toDouble * 1152921504606846976.0d) / kth.cast("double"))
    val groups = sketch.select(col("g")).distinct()
    val pairs = groups.select(col("g").as("ga"))
      .join(groups.select(col("g").as("gb")), col("ga") < col("gb"))
    val pu = pairs.join(sketch, col("g") === col("ga") || col("g") === col("gb"))
      .groupBy(col("ga"), col("gb"), col("h"))
      .agg(max(when(col("g") === col("ga"), 1).otherwise(0)).as("in_a"),
        max(when(col("g") === col("gb"), 1).otherwise(0)).as("in_b"))
    val uw = Window.partitionBy(col("ga"), col("gb")).orderBy(col("h"))
    val est = pu.withColumn("urn", row_number().over(uw))
      .filter(col("urn") <= k)
      .groupBy(col("ga"), col("gb"))
      .agg(count(lit(1)).as("n_union_kept"),
        sum(col("in_a") * col("in_b")).as("n_both"),
        max(col("h")).as("ukth"))
      .withColumn("est_union", estOf(col("n_union_kept"), col("ukth")))
      .withColumn("est_jaccard",
        col("n_both").cast("double") / col("n_union_kept").cast("double"))
      .withColumn("est_intersection", col("est_jaccard") * col("est_union"))
    est
      .join(broadcast(per.select(col("g").as("ga"),
        col("nk").as("nka"), col("kth").as("ktha"))), Seq("ga"))
      .join(broadcast(per.select(col("g").as("gb"),
        col("nk").as("nkb"), col("kth").as("kthb"))), Seq("gb"))
      .select(col("ga").as("group_a"), col("gb").as("group_b"),
        col("n_union_kept"), col("est_union"), col("est_jaccard"),
        col("est_intersection"),
        greatest(estOf(col("nka"), col("ktha")) - col("est_intersection"),
          lit(0.0)).as("est_only_a"),
        greatest(estOf(col("nkb"), col("kthb")) - col("est_intersection"),
          lit(0.0)).as("est_only_b"))
      .orderBy("group_a", "group_b")
  }

  /** Count–min sketch heavy hitters: d universal-family hash rows × w
    * buckets; a key's estimate is min over rows of its bucket counter
    * (never under the true count, biased up by collisions). Returns the
    * top-`topK` keys by estimated count with the exact count alongside.
    *
    * The counter build never shuffles raw keys (explode emits (r, bucket)
    * int pairs, combined map-side into ≤ d·w cells); estimates join the
    * BROADCAST counter table; the top-k over the estimates is distributive
    * (TakeOrderedAndProject — per-partition top-k, k·P-row driver merge,
    * never a global sort). Exact counts — the expensive comparison path the
    * sketch replaces at scale — are computed ONLY for the ≤ topK survivors
    * via a broadcast semi filter of the base table.
    */
  /** The (r, bucket) derivation shared by every CMS build — ONE definition
    * so batch-built and streaming-built counters stay mergeable (they
    * must agree bucket-for-bucket or min-over-rows is meaningless).
    */
  private[graft] def cmsBuckets(key: Column, d: Int, w: Int): Column = {
    val h = CrossHash.mdint(key.cast("string"))
    array((0 until d).map(r =>
      struct(lit(r).as("r"), pmod(CrossHash.minhash(h, r), lit(w.toLong)).as("bucket"))): _*)
  }

  /** CMS counter build (works unchanged as a batch aggregate or an
    * incremental streaming aggregation — see
    * [[graft.streaming.StreamOps.cmsCountersStream]]).
    */
  def cmsCounters(df: DataFrame, keyCol: Column, d: Int, w: Int): DataFrame = {
    require(d >= 1 && w >= 2, s"CMS needs d >= 1, w >= 2, got d=$d w=$w")
    df.select(explode(cmsBuckets(keyCol, d, w)).as("rb"))
      .select(col("rb.r").as("r"), col("rb.bucket").as("bucket"))
      .groupBy("r", "bucket").agg(count(lit(1)).as("cnt"))
  }

  /** The estimate + distributive-top-k sub-plan of [[cmsHeavyHitters]],
    * public so its physical plan (the TakeOrderedAndProject that replaced
    * round 4's unpartitioned rank window) is inspectable on its own — in
    * the full operator it executes as the localCheckpoint job, so it
    * doesn't appear in the final query's explain output.
    */
  def cmsTopKEstimates(df: DataFrame, keyCol: Column, d: Int, w: Int,
      topK: Int): DataFrame = {
    val counters = cmsCounters(df, keyCol, d, w)
    // Estimates over the distinct-key table — exact counts deliberately NOT
    // computed here, where they would cost a count per key.
    val est = df.select(keyCol.as("key")).distinct()
      .select(col("key"), explode(cmsBuckets(col("key"), d, w)).as("rb"))
      .select(col("key"), col("rb.r").as("r"), col("rb.bucket").as("bucket"))
      .join(broadcast(counters), Seq("r", "bucket"))
      .groupBy("key")
      .agg(min(col("cnt")).as("est_count"))
    // Distributive top-k: orderBy+limit plans as TakeOrderedAndProject —
    // each partition keeps its own topK and the driver merges k·P rows —
    // instead of an unpartitioned rank window (one task sorting EVERY
    // distinct key: at 10^9 users that single sort is the whole job).
    // (est_count DESC, key) is a total order over unique keys, so the
    // survivor SET is exactly the old rank<=topK set.
    est.orderBy(col("est_count").desc, col("key")).limit(topK)
  }

  def cmsHeavyHitters(df: DataFrame, keyCol: Column, d: Int = 4, w: Int = 64,
      topK: Int = 10): DataFrame = {
    // The ≤topK-row survivor table is localCheckpoint'ed (lazily) because
    // it feeds BOTH the final join and the exact-count semi filter —
    // without it Spark would rebuild the whole counters-plus-top-k subtree
    // (two extra scans) for each use.
    val survivors = cmsTopKEstimates(df, keyCol, d, w, topK)
      .localCheckpoint(false)
    // Exact counts only for the <=topK survivors: broadcast-semi-filter the
    // base table down to survivor rows before counting, instead of counting
    // every key in the corpus.
    val exact = df.select(keyCol.as("key"))
      .join(broadcast(survivors.select("key")), Seq("key"), "left_semi")
      .groupBy("key").agg(count(lit(1)).as("exact_count"))
    // rank window now runs over <=topK rows — constant-size by construction
    val rankW = Window.orderBy(col("est_count").desc, col("key"))
    survivors.join(broadcast(exact), Seq("key"))
      .withColumn("rank", row_number().over(rankW))
      .select("rank", "key", "est_count", "exact_count")
      .orderBy("rank")
  }

  /** Fixed-grid histogram quantile sketch — the deterministic,
    * value-oracle-able member of the approximate-quantile family (t-digest
    * / GK summaries are merge-order-dependent, so their results can only
    * ever be rows-gated). State is `bins` counters; estimates are upper
    * bin edges, so est ≥ true quantile with error ≤ `binWidth`.
    *
    * Determinism contract: `binWidth` must be a power of two — v/2^s is
    * an EXACT double scale, so bin assignment is one exact op + one floor
    * in any engine. Quantile ranks are integer permille arithmetic
    * (rank = ⌈n·p/1000⌉ via exact sub-2^53 doubles) — no FP thresholds.
    *
    * Scale shape: one scan → `bins` counters (map-side combined); the
    * cumulative window + rank probe run over the tiny counter table.
    */
  def histQuantiles(df: DataFrame, valCol: Column, binWidth: Long, bins: Int,
      permille: Seq[Int]): DataFrame = {
    require(binWidth >= 1 && (binWidth & (binWidth - 1)) == 0,
      s"binWidth must be a power of two for exact cross-engine binning, got $binWidth")
    require(permille.forall(p => p >= 1 && p <= 1000), s"permille out of range: $permille")
    val spark = df.sparkSession
    import spark.implicits._
    val bin = least(greatest(floor(valCol / binWidth).cast("long"), lit(0L)),
      lit(bins - 1L))
    // NULL values occupy no bin and are excluded from n (quantiles are
    // over the non-null population — and Spark's NULLS FIRST vs DuckDB's
    // NULLS LAST window order would otherwise skew every cumulative count)
    val counts = df.filter(valCol.isNotNull)
      .select(bin.as("bin")).groupBy("bin").agg(count(lit(1)).as("cnt"))
    val cum = counts.withColumn("cum",
      sum(col("cnt")).over(Window.orderBy(col("bin"))))
    // n derived from the counters — NOT a second scan of the base table
    // (the op's one-scan claim is load-bearing at 100 TB)
    val total = counts.agg(sum(col("cnt")).as("n"))
    val qs = permille.toDF("p")
    qs.crossJoin(total).crossJoin(cum)
      .filter(col("cum") >= floor((col("n") * col("p") + 999) / 1000.0))
      .groupBy("p", "n").agg(min(col("bin")).as("qbin"))
      .select((col("p") / 1000.0).as("q"),
        ((col("qbin") + 1) * binWidth).as("est_hi"), col("n"), col("p"))
      .orderBy("p")
  }

  /** EXACT interpolated percentiles at scale — sketch-then-refine. Spark's
    * built-in `percentile()` collects every value of a group into one
    * aggregation buffer (the q22 scale-killer: fine at sf0.1, OOM at
    * 100 TB). This operator gets the SAME exact answer with bounded state:
    *
    *   pass 1 (one scan): per-group bin counts on the q33 power-of-two grid
    *     — ≤ groups×bins counters, map-side combined;
    *   plan math (tiny): cumulative counts locate, for every (group, p),
    *     the one or two bins holding the target order statistics;
    *   pass 2 (pruned scan): only rows landing in those target bins are
    *     shuffled and rank-sorted — per-task work is ONE BIN's population
    *     (n/bins in expectation, tunable via `bins`), never the group.
    *
    * Interpolation follows the quantile_cont / numpy-linear definition both
    * engines share: idx = (n−1)·p, result = v_⌊idx⌋₊₁ + frac·(v_⌈idx⌉₊₁ −
    * v_⌊idx⌋₊₁) (1-based ranks). FP discipline: p arrives as integer
    * PERMILLE, so idxnum = (n−1)·permille, rank arithmetic, and the
    * bin-locating comparisons are ALL INTEGER; the only FP ops are the
    * final frac = permille%1000 / 1000 division and the 3-op interpolation,
    * identical instruction-for-instruction in DuckDB.
    *
    * Bin clamping never breaks exactness (unlike the sketch's error bound):
    * clamped bins still partition the value range in ORDER, so
    * cum_prev + within-bin rank is the true global rank even for rows
    * clamped into bin 0 or bin bins−1.
    */
  def exactQuantileRefine(df: DataFrame, valCol: Column, groupCol: String,
      binWidth: Long, bins: Int, permille: Seq[Int]): DataFrame = {
    require(binWidth >= 1 && (binWidth & (binWidth - 1)) == 0,
      s"binWidth must be a power of two for exact cross-engine binning, got $binWidth")
    val bin = least(greatest(floor(valCol / binWidth).cast("long"), lit(0L)),
      lit(bins - 1L))
    val binned = df.filter(valCol.isNotNull)
      .select(col(groupCol).as("g"), bin.as("bin"), valCol.cast("double").as("v"))
    val counts = binned.groupBy("g", "bin").agg(count(lit(1)).as("cnt"))
    refineFromCounts(binned, counts, permille)
      .select(col("g").as(groupCol), (col("p") / 1000.0).as("q"),
        col("exact_value"), col("n"))
      .orderBy(groupCol, "q")
  }

  /** The locate-and-refine core of [[exactQuantileRefine]] on an
    * already-binned input — shared with [[AuditOps.numericAuditReport]],
    * whose fused first pass computes the (g, bin) counters alongside the
    * moment sums so one scan serves both. `binned` = (g, bin, v),
    * `counts` = (g, bin, cnt); returns one row per (g, permille p):
    * (g, p, exact_value, n).
    */
  private[operators] def refineFromCounts(binned: DataFrame, counts: DataFrame,
      permille: Seq[Int]): DataFrame = {
    require(permille.forall(p => p >= 0 && p <= 1000), s"permille out of range: $permille")
    // ONE ordered window pass over the ≤ groups×bins counter table computes
    // BOTH cum_prev (rows strictly before this bin within the group) and the
    // group total n (full-frame sum over the same partition/order spec, so
    // Catalyst evaluates both in a single Window over a single exchange).
    // The previous shape paid a second groupBy(g) aggregate for n, a
    // crossJoin building a per-(g,p) targets table, a join+distinct locating
    // the needed bins, and a second broadcast join re-attaching the targets
    // to the survivors — four extra plan stages per refine whose values are
    // all derivable per row from (n, cum_prev, cnt) and the permille
    // LITERALS (guide §2.4: remove shuffles outright). Rank arithmetic is
    // unchanged integer-for-integer: idxnum = (n-1)*permille,
    // rank_lo/rank_hi its floor-div bracket.
    val w = Window.partitionBy(col("g")).orderBy(col("bin"))
    val cumc = counts
      .withColumn("cum_prev", coalesce(sum(col("cnt")).over(
        w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("n", sum(col("cnt")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
    // the bins holding any target rank: rank ∈ (cum_prev, cum_prev+cnt]
    def rankLo(p: Int) = expr(s"((n - 1) * $p) div 1000") + lit(1L)
    def rankHi(p: Int) =
      rankLo(p) + when(((col("n") - 1) * p) % 1000 > 0, 1L).otherwise(0L)
    def hits(r: Column) = r > col("cum_prev") && r <= col("cum_prev") + col("cnt")
    val needed = cumc
      .filter(permille.map(p => hits(rankLo(p)) || hits(rankHi(p))).reduce(_ || _))
      .select(col("g"), col("bin"), col("cum_prev"), col("n"))
    // pass 2: only target-bin rows are sorted; global rank = cum_prev + rn
    val survivors = binned.join(broadcast(needed), Seq("g", "bin"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("g"), col("bin")).orderBy(col("v"))))
      .withColumn("grank", col("cum_prev") + col("rn"))
    survivors.select(col("g"), col("n"), col("v"), col("grank"),
        explode(typedLit(permille)).as("p"))
      .withColumn("idxnum", (col("n") - 1) * col("p"))
      .withColumn("fr", col("idxnum") % 1000)
      .withColumn("rank_lo", expr("idxnum div 1000") + 1)
      .withColumn("rank_hi",
        expr("idxnum div 1000") + when(col("fr") > 0, 2).otherwise(1))
      .filter(col("grank") === col("rank_lo") || col("grank") === col("rank_hi"))
      .groupBy(col("g"), col("p"), col("n"), col("fr"))
      .agg(max(when(col("grank") === col("rank_lo"), col("v"))).as("v_lo"),
        max(when(col("grank") === col("rank_hi"), col("v"))).as("v_hi"))
      .select(col("g"), col("p"),
        (col("v_lo") + (col("fr").cast("double") / 1000.0) * (col("v_hi") - col("v_lo")))
          .as("exact_value"),
        col("n"))
  }

  /** Bloom-filter positions of a key set: k universal-family hashes into
    * m bits, materialized as the DISTINCT set of set-bit positions (≤ m
    * rows of one int — for the m that matter this is kilobytes, i.e.
    * broadcastable). The explicit, engine-portable form of the runtime
    * filters query engines push into scans at scale.
    */
  def bloomPositions(df: DataFrame, keyCol: Column, m: Int, k: Int): DataFrame = {
    require(k >= 1 && m >= 2, s"bloom needs k >= 1, m >= 2, got k=$k m=$m")
    val h = CrossHash.mdint(keyCol.cast("string"))
    df.select(explode(array((0 until k).map(i =>
        pmod(CrossHash.minhash(h, i), lit(m.toLong))): _*)).as("pos"))
      .distinct()
  }

  /** Materialize the m-bit bloom bitmask driver-side: m/64 longs of model
    * state — the same legitimate driver-side materialization as
    * [[SimilarityOps.trainCentroids]]' centroids and `lshSignature`'s
    * hyperplanes (a 2^16-bit filter is 8 KB).
    */
  def bloomBits(df: DataFrame, keyCol: Column, m: Int, k: Int): Array[Long] = {
    val mask = new Array[Long]((m + 63) / 64)
    bloomPositions(df, keyCol, m, k).collect().foreach { r =>
      val p = r.getLong(0).toInt
      mask(p >> 6) |= 1L << (p & 63)
    }
    mask
  }

  /** Bloom may-contain predicate over the literal bitmask: true iff ALL k
    * hash positions are set (no false negatives; false-positive rate
    * ≈ (1 − e^(−kn/m))^k). A pure codegen'd per-row projection — no join,
    * no shuffle, no exchange anywhere on the probe side — which is the
    * runtime-filter shape engines push into 100 TB scans: build the mask
    * from the small/filtered dimension side, prefilter the fact side to
    * candidates before the real join. The variable bit shift is expressed
    * as an AND against a 64-entry power-of-two literal array (Spark's
    * `shiftright` wants a literal shift amount).
    */
  def bloomMayContain(keyCol: Column, mask: Array[Long], m: Int, k: Int): Column = {
    require(mask.length == (m + 63) / 64,
      s"mask has ${mask.length} words, expected ${(m + 63) / 64} for m=$m")
    val maskLit = typedLit(mask.toSeq)
    val pow2 = typedLit(Array.tabulate(64)(1L << _).toSeq)
    val h = CrossHash.mdint(keyCol.cast("string"))
    (0 until k).map { i =>
      val pos = pmod(CrossHash.minhash(h, i), lit(m.toLong))
      (element_at(maskLit, (pos / 64).cast("int") + 1)
        .bitwiseAND(element_at(pow2, (pos % 64).cast("int") + 1))) =!= 0L
    }.reduce(_ && _)
  }

  /** Column profiler (the ANALYZE-TABLE statistics pass): one row per
    * input column with row/null counts, EXACT distinct count, and
    * min/max rendered as strings. Two scans, neither with an Expand:
    *
    *   - min/max/counts: a single all-map-side aggregate over the
    *     original column types (so ordering is numeric, not
    *     lexicographic), reshaped to rows by exploding a struct array;
    *   - distincts: the table MELTED to (column, value-string) rows —
    *     map-side combined to per-partition distincts — then two-level
    *     counted. This is how k exact distinct counts avoid Catalyst's
    *     k-way Expand (the q11 lesson, generalized): the melt multiplies
    *     rows by k but each (c, v) partial collapses before the shuffle.
    *
    * Exact distincts shuffle one row per distinct value — the honest
    * ANALYZE cost; profile wide high-cardinality tables with
    * [[kmvDistinct]] per column instead when estimates suffice.
    * String rendering caveat: value strings only need to be injective
    * per column for the distinct count (they are — same-typed casts),
    * but min/max strings follow each engine's numeric formatting; the
    * gate profiles columns whose rendered forms are dialect-identical
    * (integers, integral doubles, strings, µs epochs).
    */
  def profile(df: DataFrame): DataFrame = {
    val cols = df.columns.toSeq
    require(cols.nonEmpty, "profile needs at least one column")
    val mmAggs = cols.flatMap { c =>
      Seq(count(lit(1)).as(s"n_$c"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nn_$c"),
        min(col(c)).cast("string").as(s"mn_$c"),
        max(col(c)).cast("string").as(s"mx_$c"))
    }
    val mm = df.agg(mmAggs.head, mmAggs.tail: _*)
      .select(explode(array(cols.map(c => struct(
        lit(c).as("col_name"), col(s"n_$c").as("n_rows"),
        col(s"nn_$c").as("n_null"), col(s"mn_$c").as("min_str"),
        col(s"mx_$c").as("max_str"))): _*)).as("s"))
      .select(col("s.col_name"), col("s.n_rows"), col("s.n_null"),
        col("s.min_str"), col("s.max_str"))
    val dist = df
      .repartition(df.sparkSession.sparkContext.defaultParallelism)
      .select(explode(array(cols.map(c =>
        struct(lit(c).as("c"), col(c).cast("string").as("v"))): _*)).as("s"))
      .select(col("s.c"), col("s.v"))
      .filter(col("v").isNotNull)
      .groupBy("c", "v").agg(count(lit(1)).as("cnt"))
      .groupBy("c").agg(count(lit(1)).as("n_distinct"))
      .select(col("c").as("col_name"), col("n_distinct"))
    mm.join(dist, Seq("col_name"), "left")
      .withColumn("n_distinct", coalesce(col("n_distinct"), lit(0L)))
      .orderBy("col_name")
  }

  /** TYPED profiler variant: ONE wide row with per-column
    * `n_<c>` / `n_null_<c>` / `min_<c>` / `max_<c>` aggregates in each
    * column's ORIGINAL type — no string rendering anywhere, so
    * non-integral doubles, timestamps and decimals come back as exact
    * values instead of engine-formatted text ([[profile]]'s rows-per-
    * column report needs one shared column type and keeps the string
    * form; its rendering is dialect-identical only for the curated gate
    * types). Programmatic consumers should prefer this variant. Same
    * scale shape as the min/max pass of [[profile]]: one all-map-side
    * aggregate, no Expand, no shuffle beyond the final single-row merge.
    */
  def profileTyped(df: DataFrame): DataFrame = {
    val cols = df.columns.toSeq
    require(cols.nonEmpty, "profileTyped needs at least one column")
    val aggs = cols.flatMap { c =>
      Seq(count(lit(1)).as(s"n_$c"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"n_null_$c"),
        min(col(c)).as(s"min_$c"),
        max(col(c)).as(s"max_$c"))
    }
    df.agg(aggs.head, aggs.tail: _*)
  }

  /** AMS (Alon–Matias–Szegedy) SECOND-MOMENT sketch: estimate
    * F₂ = Σ_k cnt_k² of a key column — the SELF-JOIN SIZE on that key,
    * the quantity a join planner needs to predict skew/output volume
    * before paying the join, and the classic streaming second-moment
    * estimator. Median of `d` means of `w` sign-sketch estimators
    * X_j = (Σ_rows s_j(key))² with 4-universal-ish signs
    * s_j = 1 − 2·(perm_j(mdint(key)) mod 2) from the mirrored
    * [[graft.functions.CrossHash]] family, so the ESTIMATE itself is
    * value-oracle-checkable (the q30/q36 discipline). Output one row:
    * `(f2_exact, f2_est, rel_err)` — exact side computed the expensive
    * way for comparison, like [[kmvDistinct]].
    *
    * Scale shape: the sketch side is ONE map-side-combined aggregation
    * with d·w integer sums — rows never shuffle, state is d·w longs; the
    * exact side pays the key groupBy (that's the point of the sketch —
    * at 100 TB run only the sketch). FP: the per-row sums are exact longs
    * (|Σ s_j| ≤ n < 2^63); the squares and their w-sum are computed in
    * DECIMAL(38,0) — w·n² silently wraps a long from n ≈ √(2^63/w)
    * ≈ 7.6e8 rows at w=16, exactly the one-hot-key skew this sketch
    * exists to detect, so the squares must never ride a long. The
    * means/median stay integer-scaled by w; `f2_est = med/w` and
    * `rel_err` are single exact-value divisions.
    */
  def amsF2(df: DataFrame, keyCol: Column, d: Int = 5, w: Int = 16): DataFrame = {
    require(d >= 1 && d % 2 == 1, s"amsF2 needs odd d >= 1, got $d")
    require(w >= 1, s"amsF2 needs w >= 1, got $w")
    val h = graft.functions.CrossHash.mdint(keyCol.cast("string"))
    val base = df.filter(keyCol.isNotNull).select(h.as("h"))
    val sums = (0 until d * w).map { j =>
      sum(lit(1L) - lit(2L) * pmod(graft.functions.CrossHash.minhash(col("h"), j),
        lit(2L))).as(s"s$j")
    }
    val sketch = base.agg(sums.head, sums.tail: _*)
    // means stay integer-scaled by w: mean_i·w = Σ_j X_j; the median of d
    // such integers is one array sort over d values. Squares in
    // DECIMAL(38,0): a hot key drives |s_j| toward n, and w·n² wraps a
    // long from n ≈ 7.6e8 (ADVICE r8) — decimal is exact to n ≈ 2.5e18.
    val dec38 = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0)
    val meansW = (0 until d).map { i =>
      (0 until w).map { j =>
        val sj = col(s"s${i * w + j}").cast(dec38)
        sj * sj
      }.reduce(_ + _).as(s"m$i")
    }
    val est = sketch.select(meansW: _*)
      .select(element_at(sort_array(array((0 until d).map(i => col(s"m$i")): _*)),
        (d + 1) / 2).as("medw"))
      .select((col("medw").cast("double") / lit(w.toDouble)).as("f2_est"))
    val exact = df.filter(keyCol.isNotNull)
      .groupBy(keyCol.as("k")).agg(count(lit(1)).as("cnt"))
      .agg(sum(col("cnt") * col("cnt")).as("f2_exact"))
    exact.crossJoin(broadcast(est))
      .select(col("f2_exact"), col("f2_est"),
        (abs(col("f2_est") - col("f2_exact").cast("double")) /
          col("f2_exact").cast("double")).as("rel_err"))
  }
}
