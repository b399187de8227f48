package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Regenerates PLANS.md: formatted physical plans of the headline queries,
  * the artifact backing the "is this the plan you'd want at 1000
  * executors" review (pushdown reaches the scan, small dims broadcast,
  * partial aggregation before every shuffle, simulation shuffle-free).
  *
  *   sbt "runMain graft.Plans /root/testdata/sf0.001 PLANS.md"
  */
object Plans {
  // queries whose plan shape carries the scale argument; dd_clusters is
  // deliberately absent (its result is a localCheckpoint scan — the
  // interesting structure is the per-round loop, documented on the op)
  private val headline = Seq(
    "q1_pricing_summary", "q2_filter_project", "q5_region_revenue",
    "q6_revenue_forecast", "sim_coin_traces", "sim_gbm_stats",
    "dd_minhash", "dd_simhash", "emb_near_pairs_lsh",
    "knn_lsh", "tx_langid", "tx_topterms", "ev_sliding", "q20_asof_clicks",
    // round 4: de-Expanded multi-distinct, shuffle-free bloom probe,
    // pure-projection random projection, per-shard packing window
    "q11_distinct_parts", "q31_bloom_prune", "emb_rp_reduce", "tx_pack",
    // round 5: distributive CMS top-k (TakeOrderedAndProject, no global
    // rank window), sketch-then-refine exact percentiles, containment
    // inverted index, SemDeDup cluster-blocked pairs
    "ev_heavy_hitters", "q34_quantile_refine", "dd_containment",
    "emb_semantic_dedup",
    // round 5 (cont.): C4 chunk removal (array-codegen chunking, hash-only
    // dup shuffle), MOSS winnow pairs (inverted index), ADC scan over PQ
    // codes (LUT broadcast joins, no float shuffle)
    "tx_chunk_dedup", "tx_winnow_pairs", "knn_pq",
    // round 5 (cont. 2): broadcast bucket-model scoring, SCD2 lead window
    // after one key shuffle, iterative PR join+agg step
    "tx_dsir", "ev_scd2", "dd_pagerank",
    // round 5 (cont. 3): IVFADC candidate pruning + code-only scoring,
    // old×new-restricted incremental band join
    "knn_ivfpq", "dd_minhash_incr",
    // the melted no-Expand k-column distinct shape
    "q35_profile",
    // SCD2 consumer: interval as-of join against the history
    "ev_scd2_lookup",
    // round 7: inverted-index tf-idf cosine pairs (df-capped postings),
    // length-banded levenshtein linkage (3-replica probe equi-join)
    "tx_tfidf_pairs", "dd_fuzzy",
    // round 7 (cont.): AllPairs prefix-filter exact-Jaccard join (rare-
    // token-only candidate join), dim-bounded covariance model state
    "dd_prefix_jaccard", "emb_covariance",
    // round 7 (cont. 2): pigeonhole segment-blocked Hamming pairs,
    // decimal reciprocal-rank fusion, label²-bounded centroid cosine,
    // decimal p·log p entropy agg, top-k Zipf least-squares
    "dd_hamming", "knn_rrf", "emb_centroid_sim",
    "tx_token_entropy", "tx_zipf",
    // round 7 (cont. 3): cohort retention (events reduce to the
    // user×week set first), interpolated trigram LM (vocabulary-keyed
    // model terms), label-blocked exact kNN graph (join exchange reused
    // by the rank window)
    "ev_retention", "tx_trigram_ppl", "emb_knn_graph",
    // round 7 (cont. 4): constraint suite (row-level checks fused into
    // one shared-scan agg per table; FK = broadcast dim-key left join),
    // exact integer z-score outliers (stats broadcast back over one scan)
    "aud_dq_report", "aud_outliers",
    // round-7 (cont. 5): sequential anomaly window, sketch-refine
    // winsorize clip, distinct-score-group AUC
    "aud_anomaly_cum", "aud_winsorize", "aud_auc",
    // round 8: CDC merge as one max_by hash agg (no per-key sort), the
    // single-shuffle attribution pair stream, melt-then-lag completeness
    // over a bounded (day, column) table, BPE encode as a codegen'd
    // replace-chain projection
    "ev_apply_changes", "ev_attribution", "aud_completeness",
    "tx_bpe_encode",
    // round 8 (cont.): banded two-sample KS CDF (no global window),
    // 9-row Benford broadcast, shingle first-occurrence novelty
    // (ids+hashes shuffle, text never moves), compound-blocked linkage
    "aud_ks", "aud_benford", "tx_novelty", "dd_fuzzy_compound",
    // round 8 (cont. 2): (group, day)-reduced spine + bounded-table fill
    // window; the pseudonymize pure projection
    "ev_gap_fill", "ev_pseudonymize",
    // round 8 (cont. 3): decorrelated LATERAL top-N, group-partitioned
    // KS, shingle-generator bigram lift, RANGE-frame rolling windows
    "q40_lateral", "aud_ks_by_source", "tx_pmi", "ev_rolling7",
    // round 8 (cont. 4): banded argmax-F1 confusion prefix, ratio-margin
    // bitext windows, single-agg AMS sign sums, language-bounded epoch
    // planner
    "aud_threshold", "emb_bitext", "q41_ams_f2", "tx_mix_epochs",
    // round 9: per-source reliability/operating-point panels — every
    // window partitions by source, totals ride a <=|sources|-row
    // broadcast join; PSI (counts-only, ln(integer) once) and Gini
    // (bounded all-pairs over the count table)
    "aud_calibration_by_source", "aud_threshold_by_source",
    "aud_psi", "aud_gini",
    // round 9 (cont.): shuffle-free array-function CDC chunker (+ its
    // dedup apply); counts-only two-proportion experiment readout
    "tx_cdc_chunks", "tx_cdc_dedup", "aud_abtest",
    // round 9 (cont. 2): MMR rerank — pool-bounded pairwise sims per
    // query, runtime greedy loop in one aggregate() (constant tree)
    "knn_mmr",
    // round 9 (cont. 3): mergeable-sketch set-op cardinalities — all
    // pairwise work over the G·k-row bottom-k sketches, per-group
    // stats ride a broadcast join
    "q42_kmv_setops",
    // round 9 (cont. 4): gains/lift — banded descending prefix, then
    // everything collapses to <=B rows (B×B broadcast cumulative)
    "aud_gains",
    // round 9 (cont. 5): degree-oriented triangle census — O(√m)
    // out-neighborhoods, wedges closed by one hash join on ids
    "dd_triangles",
    // round 9 (cont. 6): per-source gains — every window partitioned
    // by source, cross-bucket cumulative a per-group <=B×B join
    "aud_gains_by_source",
    // round 9 (cont. 7): antithetic battery — shuffle-free union of two
    // codegen'd Range→Projects, exact-integer moment aggregation
    "sim_walk_antithetic",
    // round 9 (cont. 8): importance sampling — two Range batteries to
    // two 1-row moment aggregates, one broadcast stitch
    "sim_walk_importance",
    // round 9 (cont. 9): per-source drift/PSI — (group, category)-keyed
    // counts, per-group totals on broadcast joins
    "aud_drift_by_source", "aud_psi_by_source",
    // round 9 (cont. 10): privacy gates — one quasi-group agg + bounded
    // summary; DP release is a category agg + pure noise projection
    "aud_kanon", "aud_dp_counts",
    // round 9 (cont. 11): CUSUM — one stats pass + one group-partitioned
    // sort feeding a streaming per-partition fold (true recursion)
    "aud_cusum",
    // round 10: runs test (both windows group-partitioned), dwell lead
    // window per user, audio header decode via mapPartitions
    "aud_runs", "ev_dwell", "mm_audio_meta",
    // round 11: MP4 box walk — synth projection → mapPartitions decode,
    // embarrassingly parallel, no shuffle before the final sort
    "mm_video_meta",
    // round 11 (cont.): integer-accumulator perceptron training (per-iter
    // bounded weight table re-broadcast), the trend family over the
    // bounded (grp, day)/(grp, slot) model tables (pair joins + grp-
    // partitioned ranking never corpus-sized), band-filtered hard
    // negatives (broadcast queries, per-query rank window)
    "tx_train_classifier", "aud_trend", "aud_theilsen", "aud_seasonal",
    "emb_hard_negatives",
    // round 11 (cont. 2): autocorr leads from one group-partitioned
    // window, RFM one per-user agg + 1-row broadcast, MATTR doc-
    // partitioned O(w)-frame window
    "aud_autocorr", "ev_rfm", "tx_mattr",
    // round 11 (cont. 3): rank window over the bounded (grp, value)
    // count table, never raw rows
    "aud_mannwhitney",
    // round 11 (cont. 4): broadcast centroids, cid-partitioned pick
    // window, ≤ k_c·k output rows
    "emb_diverse_sample",
    // round 11 (cont. 5): explode ×B BEFORE the partial agg — the only
    // shuffle moves O(partitions·groups·B) counter rows, never data
    "aud_bootstrap",
    // round 11 (cont. 6): one map-side-combined reduction to the
    // contingency table; everything after is distinct(a)×distinct(b)
    "aud_chisq_indep",
    // round 11 (cont. 7): three codegen'd per-row regex counts, one
    // map-side-combined agg to ≤|groups| rows
    "tx_readability",
    // round 11 (cont. 8): one user-partitioned lead window, 1-row
    // corpus-max broadcast, bounded (type, bucket) cumulative
    "ev_hazard",
    // round 11 (cont. 9): two codegen'd regex counts, integer
    // cross-multiply flag, one map-side-combined agg
    "tx_code_detect",
    // round 11 (cont. 10): corpus → labels×dim model state, centroid
    // arrays broadcast back, scoring a pure projection
    "emb_ood",
    // round 11 (cont. 11): one agg to ≤|variants| rows, 1-row loud
    // control broadcast, row-local TOST arithmetic
    "aud_tost",
    // round 11 (cont. 12): digest-keyed side flags, one agg + 1-row
    // count — strictly cheaper than the exact dedup it rides on
    "dd_capture",
    // round 11 (cont. 13): distinct (user, week) reduction first, one
    // user-partitioned lag/lead window, re-agg to ≤|weeks| rows
    "ev_lifecycle",
    // round 11 (cont. 14): tokens hash to 8 bytes before the distinct,
    // fit over ≤|sources| decimal points
    "tx_heaps",
    // round 11 (cont. 15): synth projection → mapPartitions pixel
    // decode, embarrassingly parallel, no shuffle before the sort
    "mm_image_stats",
    // round 11 (cont. 16): the abtest agg + 1-row control broadcast,
    // row-local power arithmetic
    "aud_mde",
    // round 11 (cont. 17): pairs → bounded confusion matrix in one agg,
    // |classes|²-sized everything after
    "tx_langid_eval",
    // round 11 (cont. 18): Range → codegen'd bit arithmetic → 1-row
    // agg — shuffle-free like every sim plan
    "sim_qmc_vdc",
    // round 11 (cont. 19): one count agg to ≤|variants| rows, quantized
    // goodness-of-fit arithmetic on the bounded table
    "aud_srm",
    // round 11 (cont. 20): the same bounded contingency reduction;
    // marginal products over ≤|classes| rows
    "tx_langid_kappa",
    // round 11 (cont. 21): ADC ranking joined to exact truth on
    // (query, vec) ids — the measurement loop for the quantized path
    "knn_eval_pq",
    // round 11 (cont. 22): the cusum plan — stats pass, one group
    // exchange, per-partition sorted streaming fold
    "aud_ewma",
    // round 11 (cont. 23): the retention reduction + bounded cohort ×
    // offset windows
    "ev_ltv",
    // round 11 (cont. 24): one moment agg to ≤k rows, k-bounded
    // quantized arithmetic
    "aud_anova",
    // round 11 (cont. 25): (sample, value) counts, rank window over the
    // bounded distinct-value table, k-bounded tail
    "aud_kruskal",
    // round 11 (cont. 26): reduced (user, day) set, ×7 window explode,
    // day spine from a 1-row span
    "ev_stickiness",
    // round 11 (cont. 27): slice projection feeding the brute frame —
    // the 4× cheaper first-stage scan measured against full-dim truth
    "emb_dim_eval",
    // round 11 (cont. 28): the dwell lead window, moments to ≤|types|
    // rows
    "ev_burstiness",
    // round 11 (cont. 29): synth projection → mapPartitions PCM decode,
    // embarrassingly parallel
    "mm_audio_stats",
    // round 11 (cont. 30): explicit-list pivot — two-phase aggregation,
    // no values-discovery job, no Expand
    "q44_pivot",
    // round 11 (cont. 31): two group-partitioned rank constructions,
    // (grp, value) hash joins back, one moment agg
    "aud_spearman",
    // round 12: the release data card — 11 independent panel aggregates
    // unioned at plan level (one job, parallel stages), each the
    // documented shape of its gate-pinned op
    "aud_card",
    // round 12 (cont.): per-arm moment agg to ≤2·groups rows (welch);
    // the ks windows + lead over the (grp, value) count table (w1);
    // distinct-value median selection + broadcast medians + the anova
    // moment reduction (levene)
    "aud_welch", "aud_wasserstein", "aud_levene",
    // round 12 (cont. 2): chained per-user min anchors reusing the
    // user_id partitioning; one user rank window + path agg +
    // TakeOrdered; users-sized rank + ceil cut; decile buckets
    "ev_funnel3", "ev_paths", "ev_pareto", "ev_lorenz",
    // round 12 (cont. 3): distinct (user,type)/(source,token) sets,
    // key-partitioned pair joins, complete bounded matrices
    "ev_coengagement", "dd_source_overlap",
    // round 12 (cont. 4): bounded ≤types² matrix power iteration,
    // localCheckpointed per step
    "ev_markov3",
    // round 12 (cont. 5): synth projection → mapPartitions PCM decode +
    // lag walk, embarrassingly parallel
    "mm_audio_zcr",
    // round 12 (cont. 6): broadcast exact-long weight table riding the
    // shuffle-free sim grid; decimal-exact weighted sum per sim
    "sim_ou_final",
    // round 12 (cont. 7): segment-partitioned rank windows, top-3 filter
    "q45_percent_rank",
    // round 12 (cont. 8): the cusum/ewma sorted fold with the trend
    // accumulator; the psi-idiom ln table over groups×categories
    "aud_holt", "aud_jsd_source",
    // round 12 (cont. 9): per-user conditional sums, 1-row moment
    // broadcast, ≤variants reduction
    "aud_cuped",
    // round 12 (cont. 10): the hazard reduction + the bounded-collect KM
    // fold; the funnel anchor join + users-sized percentile
    "ev_survival", "ev_time_to_convert",
    // round 12 (cont. 11): bpe encode projection + broadcast source join
    "tx_bpe_fertility",
    "tx_unigram_train",
    "tx_unigram_encode",
    "tx_unigram_fertility")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val out = args.lift(1).getOrElse("PLANS.md")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sb = new StringBuilder
    sb.append("# PLANS — physical plans of headline queries (sf0.001, local[4])\n\n")
    sb.append("Regenerate with `sbt \"runMain graft.Plans\"`. Reviewed per the design\n")
    sb.append("rules: filters/projections reach the scan, always-small dims broadcast,\n")
    sb.append("partial aggregation before every shuffle, simulation stays shuffle-free.\n")
    sb.append("\nDeliberate scale anchors (gate configs kept exact-verifiable on purpose;\n")
    sb.append("each has a measured scale-safe deployment twin — do NOT copy the anchor\n")
    sb.append("config to production data): `emb_near_pairs` (exact all-pairs; twin\n")
    sb.append("`emb_near_pairs_lsh`), `q22_percentiles` (exact global percentile; twin\n")
    sb.append("`q34_quantile_refine`), `emb_bitext` (exhaustive A×B margin; twin\n")
    sb.append("`bitextMineLsh`), and `dd_fuzzy`/`dd_fuzzy_clusters` (fixed-cardinality\n")
    sb.append("blocking — measured exponent 1.83 at 30×; twins `dd_fuzzy_compound` and\n")
    sb.append("the `dd_fuzzy_scaledblocks` curve config, exponent 0.59).\n")
    headline.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      sb.append(s"\n## $name\n\n```\n").append(plan.trim).append("\n```\n")
    }
    // ev_heavy_hitters' distributive top-k runs as the localCheckpoint job,
    // invisible in the final query's explain — print its sub-plan so the
    // TakeOrderedAndProject (vs an unpartitioned rank window) is on record.
    locally {
      import org.apache.spark.sql.functions.col
      val sub = graft.operators.SketchOps.cmsTopKEstimates(
        spark.read.parquet(s"$sfDir/events.parquet"), col("user_id"), 4, 1024, 10)
      val plan = sub.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      sb.append("\n## ev_heavy_hitters — survivor top-k sub-job (the localCheckpoint job)\n\n```\n")
        .append(plan.trim).append("\n```\n")
    }
    Files.writeString(Paths.get(out), sb.toString)
    println(s"[plans] wrote ${headline.size} plans to $out")
    spark.stop()
  }
}
