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

  /** Count–min sketch heavy hitters: d universal-family hash rows × w
    * buckets; a key's estimate is min over rows of its bucket counter
    * (never under the true count, biased up by collisions). Returns the
    * top-`topK` keys by estimated count with the exact count alongside.
    *
    * The counter build never shuffles raw keys (explode emits (r, bucket)
    * int pairs, combined map-side into ≤ d·w cells); estimates join the
    * BROADCAST counter table. The exact counts computed here for
    * comparison are the expensive path the sketch replaces at scale —
    * a production pipeline keeps only the d·w counters.
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

  def cmsHeavyHitters(df: DataFrame, keyCol: Column, d: Int = 4, w: Int = 64,
      topK: Int = 10): DataFrame = {
    val counters = cmsCounters(df, keyCol, d, w)
    val exact = df.groupBy(keyCol.as("key")).agg(count(lit(1)).as("exact_count"))
    // the global rank window runs over the DISTINCT-KEY table (cardinality-
    // sized, not data-sized) — the single-partition sort is over candidates
    // a real deployment would already have reduced to
    val rankW = Window.orderBy(col("est_count").desc, col("key"))
    exact
      .select(col("key"), col("exact_count"),
        explode(cmsBuckets(col("key"), d, w)).as("rb"))
      .select(col("key"), col("exact_count"), col("rb.r").as("r"), col("rb.bucket").as("bucket"))
      .join(broadcast(counters), Seq("r", "bucket"))
      .groupBy("key", "exact_count")
      .agg(min(col("cnt")).as("est_count"))
      .withColumn("rank", row_number().over(rankW))
      .filter(col("rank") <= topK)
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
}
