package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Gate bindings for [[AuditOps]] — the data-quality constraint suite and
  * the exact outlier report, each with a DuckDB value oracle. The suite
  * mixes passing and failing checks on purpose: a report that can only say
  * "pass" verifies nothing.
  */
object AuditQueries {
  import Tables._
  import AuditOps.Check._

  private def dqChecks = Seq(
    NotNull("customer", "c_name"),
    NotNull("orders", "o_custkey"),
    UniqueKey("orders", Seq("o_orderkey")),
    UniqueKey("lineitem", Seq("l_orderkey", "l_linenumber")),
    FkIntegrity("orders", "o_custkey", "customer", "c_custkey"),
    FkIntegrity("lineitem", "l_partkey", "part", "p_partkey"),
    InRange("lineitem", "l_quantity", "1", "45"), // quantities run to 50 — fails
    InRange("part", "p_size", "1", "50"), // passes
    AcceptedValues("orders", "o_orderstatus", Seq("F", "O")), // P rows — fails
    AcceptedValues("lineitem", "l_returnflag", Seq("A", "N", "R")), // passes
    RowCountBetween("region", 1, 100), // 5 regions — passes
    RowCountBetween("nation", 1, 10)) // 25 nations — fails by 15

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Constraint suite over the star schema; see AuditOps for the
    // shared-scan / broadcast-FK scale shape. Sorted here (gate
    // determinism), not in the op.
    "aud_dq_report" -> ((s, d) =>
      AuditOps.dataQualityReport(
        Map("customer" -> t(s, d, "customer"), "orders" -> t(s, d, "orders"),
          "lineitem" -> t(s, d, "lineitem"), "part" -> t(s, d, "part"),
          "region" -> t(s, d, "region"), "nation" -> t(s, d, "nation")),
        dqChecks).orderBy("check_id")),

    // Exact integer-arithmetic z=3 outliers of events.value per event type.
    "aud_outliers" -> ((s, d) =>
      AuditOps.outlierReport(t(s, d, "events"), "event_type", "value", z = 3)
        .orderBy("grp")),

    // Sequential (arrival-order) anomaly verdicts — the online monitor's
    // decisions reproduced exactly over data at rest; streaming twin
    // spec-pinned to emit the identical anomaly set.
    "aud_anomaly_cum" -> ((s, d) =>
      AuditOps.anomalyReport(t(s, d, "events"), "event_type", "ts", "event_id",
          "value", z = 3, minPrior = 30)
        .orderBy("grp")),

    // CUSUM sequential drift detection per event type (k=30 slack,
    // h=150 threshold — a minority of alarms on this data): the
    // drift-optimal fold the z-detector's point test can't express.
    "aud_cusum" -> ((s, d) =>
      AuditOps.cusumReport(t(s, d, "events"), "event_type", "ts", "event_id",
        "value", k = 30L, h = 150L)),

    // One-way ANOVA of the quantized value across event types: F and
    // eta^2 from quantized floor-division sums of squares — the k-group
    // question the pairwise tests can't pose in one shot.
    "aud_anova" -> ((s, d) =>
      AuditOps.anovaReport(t(s, d, "events"), "event_type", "value")),

    // CUPED adjusted A/B readout: user pre-period (before the mid-month
    // cutoff) as the covariate for the post-period metric; pooled theta,
    // corr² variance reduction (Deng et al. '13).
    "aud_cuped" -> ((s, d) =>
      AuditOps.cupedReport(t(s, d, "events"),
        concat(lit("v"), pmod(col("user_id"), lit(3))),
        call_function("div", col("ts").cast("long"), lit(1000L)),
        "value", cutoffTicks = 1705276800000000L)),

    // Holt double-exponential smoothing per event type: level + trend
    // integer-floor recursions (the ewma chart with a trend state),
    // one-step forecast + its exact mean absolute error.
    "aud_holt" -> ((s, d) =>
      AuditOps.holtReport(t(s, d, "events"), "event_type", "ts",
        "event_id", "value")),

    // Jensen–Shannon divergence of each source's language mix vs the
    // corpus mix — the bounded symmetric member of the f-divergence
    // wing (TVD/PSI/chi²/JSD).
    "aud_jsd_source" -> ((s, d) =>
      AuditOps.jsdBySource(t(s, d, "documents"), "lang", "source")),

    // Welch's unequal-variance t per event type between even/odd user
    // cohorts — the continuous-mean A/B cell of the test matrix
    // (abtest = proportions, mannwhitney = ranks, this = means).
    "aud_welch" -> ((s, d) =>
      AuditOps.welchReport(t(s, d, "events"), "event_type",
        pmod(col("user_id"), lit(2)) === 0, "value")),

    // Exact 1-Wasserstein distance between the same cohorts — the
    // shift-magnitude companion to aud_ks's max-gap.
    "aud_wasserstein" -> ((s, d) =>
      AuditOps.wassersteinReport(t(s, d, "events"), "event_type",
        pmod(col("user_id"), lit(2)) === 0, "value")),

    // Brown–Forsythe variance homogeneity across event types — the
    // spread question aud_anova's mean F assumes away.
    "aud_levene" -> ((s, d) =>
      AuditOps.leveneReport(t(s, d, "events"), "event_type", "value")),

    // Kruskal-Wallis: the nonparametric k-group cell completing the test
    // matrix — integer doubled rank sums from the distinct-value table,
    // tie-corrected H one division of exact integers.
    "aud_kruskal" -> ((s, d) =>
      AuditOps.kruskalReport(t(s, d, "events"), "event_type", "value")),

    // Spearman rank correlation of value vs time per event type — the
    // monotone-drift effect size next to aud_trend's verdict; doubled
    // tie-averaged ranks, exact moments, the mirrored five-op chain.
    "aud_spearman" -> ((s, d) =>
      AuditOps.spearmanReport(t(s, d, "events"), "event_type",
        call_function("div", col("ts").cast("long"), lit(1000L)),
        col("value"))),

    // EWMA control chart per event type: the small-persistent-shift
    // detector between CUSUM and the point-outlier screen; integer-floor
    // recursion (lambda = 1/4) seeded at the floor mean, cross-multiplied
    // +-20 band.
    "aud_ewma" -> ((s, d) =>
      AuditOps.ewmaReport(t(s, d, "events"), "event_type", "ts", "event_id",
        "value", el = 4L, h = 20L)),

    // Wald–Wolfowitz runs test per event type: too few runs = stuck
    // metric, too many = oscillation — the sequence-randomness audit
    // the point/drift detectors can't see.
    "aud_runs" -> ((s, d) =>
      AuditOps.runsReport(t(s, d, "events"), "event_type", "ts", "event_id",
        "value")),

    // Mann–Kendall monotone-trend test per event type over the daily
    // volume series — the steady-drift audit between the jump detectors
    // (CUSUM/outliers) and the randomness screen (runs): S and the
    // tie-corrected Var·18 are exact integers, z the mirrored three-op
    // chain.
    "aud_trend" -> ((s, d) =>
      AuditOps.trendReport(t(s, d, "events"), "event_type",
        call_function("div",
          call_function("div", col("ts").cast("long"), lit(1000L)),
          lit(86400000000L)))),

    // Theil–Sen robust slope of the same daily volume series — the
    // magnitude companion to aud_trend's verdict: each pairwise slope is
    // one exact-integer division, the median picks sorted-rank positions
    // of the identical double multiset, the even case averages exactly
    // two doubles (mirrored add + exact halving).
    "aud_theilsen" -> ((s, d) =>
      AuditOps.theilSenReport(t(s, d, "events"), "event_type",
        call_function("div",
          call_function("div", col("ts").cast("long"), lit(1000L)),
          lit(86400000000L)))),

    // Chi-square day-of-week uniformity screen per event type — the
    // periodic-pattern audit (jumps: outliers/CUSUM; drift: trend;
    // non-randomness: runs; season: this): numerator exact integer via
    // the (p·O − n)² rearrangement, one division, Wilson–Hilferty 5%
    // critical value mirrored op-for-op.
    "aud_seasonal" -> ((s, d) =>
      AuditOps.seasonalityReport(t(s, d, "events"), "event_type",
        call_function("div",
          call_function("div", col("ts").cast("long"), lit(1000L)),
          lit(86400000000L)))),

    // Lag-1..3 serial correlation per event type: the dependence screen
    // an AR(1)-sticky metric trips when jumps/drift/runs/seasonality all
    // pass — exact HUGEINT moments, r the mirrored √·√÷ five-op chain,
    // |r| > 2/√m white-noise band.
    "aud_autocorr" -> ((s, d) =>
      AuditOps.autocorrReport(t(s, d, "events"), "event_type", "ts",
        "event_id", "value", maxLag = 3)),

    // The treat step: clip o_totalprice into each status group's exact
    // [2.5%, 97.5%] percentiles (sketch-locates bins, one pruned ranking
    // pass) and report clip pressure + the winsorized decimal sum.
    "aud_winsorize" -> ((s, d) =>
      AuditOps.winsorize(t(s, d, "orders"), col("o_totalprice"), "o_orderstatus",
          loPermille = 25, hiPermille = 975)
        .orderBy("o_orderstatus")),

    // Ranking-quality audit: exact tie-corrected AUC of floor(value)
    // separating error events from the rest (integer scores — the tie
    // path is exercised for real). One row; no sort of the data, only of
    // the distinct-score groups.
    "aud_auc" -> ((s, d) =>
      AuditOps.aucReport(t(s, d, "events"), floor(col("value")),
        col("event_type") === "error")),

    // Robust detect: |x − median| > 3·MAD per event type, both medians
    // exact sketch-refine percentiles broadcast back as model state.
    "aud_robust_outliers" -> ((s, d) =>
      AuditOps.robustOutlierReport(t(s, d, "events"), col("value"), "event_type")
        .orderBy("event_type")),

    // Data-card AUC: does document length rank English docs, per source?
    // (groups rank in parallel — the window partitions by source)
    "aud_auc_by_source" -> ((s, d) =>
      AuditOps.aucReportBy(t(s, d, "documents"), col("n_chars"),
          col("lang") === "en", "source")
        .orderBy("grp")),

    // The fused suite: z-outliers + median/MAD + winsorize over
    // events.value in 5 scans instead of ~10 (AuditOpsSpec pins equality
    // with the three separate ops; same exact-arithmetic oracle pieces).
    "aud_combined" -> ((s, d) =>
      AuditOps.numericAuditReport(t(s, d, "events"), col("value"), "event_type",
          z = 3, kMad = 3, loPermille = 25, hiPermille = 975)
        .orderBy("event_type")),

    // Calibration audit: does value/1000 (a [0,1] "confidence") predict
    // error events? 10-bin reliability diagram + integer-exact ECE.
    "aud_calibration" -> ((s, d) =>
      AuditOps.calibrationReport(t(s, d, "events"),
          col("value") / 1000.0, col("event_type") === "error")
        .orderBy("bin")),

    // Drift audit: source distribution of the corpus vs a refreshed
    // snapshot (every 3rd doc dropped) — per-source chi-square
    // contributions + the total-variation distance a rebalance gates on.
    "aud_drift" -> ((s, d) => {
      val docs = t(s, d, "documents")
      AuditOps.categoricalDrift(docs, docs.filter(col("doc_id") % 3 =!= 0), "source")
        .orderBy("cat")
    }),

    // Per-source drift of the LANGUAGE mix between the same snapshot
    // pair — global drift can hide one source shifting against a stable
    // rest (the data-card form next to aud_auc/ks/gains_by_source).
    "aud_drift_by_source" -> ((s, d) => {
      val docs = t(s, d, "documents")
      AuditOps.categoricalDriftBy(docs, docs.filter(col("doc_id") % 3 =!= 0),
        "lang", "source")
    }),

    // A/B experiment readout: purchase-rate lift + pooled two-proportion
    // z of user-cohort variants vs the v0 control — all four statistics
    // from exact integer counts (split-fraction z², no a·b±c double
    // shapes).
    "aud_abtest" -> ((s, d) =>
      AuditOps.abTestReport(t(s, d, "events"),
        concat(lit("v"), pmod(col("user_id"), lit(3))),
        col("event_type") === "purchase", "v0")),

    // TOST equivalence on the same split: is each variant provably
    // within ±2pp of control? diff/se² as single divisions of exact
    // integers (unpooled n³ denominators), one fixed-order addition,
    // no FMA-contractible shape — the booleans hash-match.
    "aud_tost" -> ((s, d) =>
      AuditOps.tostReport(t(s, d, "events"),
        concat(lit("v"), pmod(col("user_id"), lit(3))),
        col("event_type") === "purchase", "v0", margin = 0.02)),

    // MDE at the current exposure: 2.8016·se (80% power, two-sided 5%),
    // the design readout to consult before trusting a null aud_abtest.
    "aud_mde" -> ((s, d) =>
      AuditOps.mdeReport(t(s, d, "events"),
        concat(lit("v"), pmod(col("user_id"), lit(3))),
        col("event_type") === "purchase", "v0")),

    // Sample-ratio mismatch vs the intended 1:1:1 split — run BEFORE
    // reading aud_abtest; quantized floor-division chi-square, strict
    // α=0.001 Wilson–Hilferty alarm.
    "aud_srm" -> ((s, d) =>
      AuditOps.srmReport(t(s, d, "events"),
        concat(lit("v"), pmod(col("user_id"), lit(3))),
        Seq("v0" -> 1L, "v1" -> 1L, "v2" -> 1L))),

    // Nonparametric A/B companion: Mann–Whitney U of the quantized value
    // between even/odd user cohorts per event type — rank arithmetic on
    // the 2×-scale trick, tie-corrected variance, ±0.5 continuity.
    "aud_mannwhitney" -> ((s, d) =>
      AuditOps.mannWhitneyReport(t(s, d, "events"), "event_type",
        pmod(col("user_id"), lit(2)) === 0, "value")),

    // Poisson-bootstrap envelope of the mean quantized value per event
    // type: 20 deterministic hash-weighted replicates (integer-threshold
    // Poisson(1) weights, PoissonT60), replicate means as single exact
    // divisions, min/max envelope ≈ 90% CI. The nonparametric uncertainty
    // companion to aud_abtest's z-test.
    "aud_bootstrap" -> ((s, d) =>
      AuditOps.bootstrapCiReport(t(s, d, "events"), "event_type",
        "event_id", "value")),

    // Chi-square independence of lang × source over documents — the
    // collection-bias audit the marginal screens can't see. The χ²
    // statistic is exact (quantized integer floor divisions over the
    // bounded contingency table), the runtime-dof Wilson–Hilferty
    // critical value is round(·,12)-pinned before cubing, Cramér's V
    // one ÷ + one √ on engine-identical inputs.
    "aud_chisq_indep" -> ((s, d) =>
      AuditOps.independenceReport(t(s, d, "documents"), "lang", "source")),

    // PSI drift on the same snapshot pair as aud_drift: the credit-risk
    // convention's stability score, libm confined to ln(integer) rounded
    // once (the tokenEntropy discipline); zero-count categories carry a
    // NULL psi_term and are excluded from the total by definition.
    "aud_psi" -> ((s, d) => {
      val docs = t(s, d, "documents")
      AuditOps.psiReport(docs, docs.filter(col("doc_id") % 3 =!= 0), "source")
        .orderBy("cat")
    }),

    // Privacy release gate: k-anonymity / l-diversity over the
    // (lang, n_chars-band) quasi-identifiers with source as the
    // sensitive attribute — would publishing these columns let an
    // attacker re-identify a row's provenance?
    "aud_kanon" -> ((s, d) =>
      AuditOps.kAnonymityReport(
        t(s, d, "documents")
          .withColumn("len_band", expr("n_chars div 200")),
        Seq("lang", "len_band"), col("source"), k = 5, l = 3)),

    // DP count release: the per-source histogram with two-sided
    // geometric noise at eps = 0.5, seed pinned — every noisy count
    // value-oracled (quantized uniforms + ln(integer) decimals).
    "aud_dp_counts" -> ((s, d) =>
      AuditOps.dpCounts(t(s, d, "documents"), col("source"),
        seed = 1234567L, invEps = 2)),

    // Per-source PSI of the language mix — the last per-group member of
    // the audit data-card panel.
    "aud_psi_by_source" -> ((s, d) => {
      val docs = t(s, d, "documents")
      AuditOps.psiReportBy(docs, docs.filter(col("doc_id") % 3 =!= 0),
        "lang", "source")
    }),

    // Source concentration: exact all-pairs |Δcount| over the bounded
    // per-source count table, one division — the mixture-rebalance grade.
    "aud_gini" -> ((s, d) =>
      AuditOps.giniReport(t(s, d, "documents"), "source")),

    // Completeness trend: the source events have no NULLs, so the gate
    // injects them deterministically (value on every 7th id, props on
    // every 11th — the dd_exact injection pattern) before the per-day
    // null-rate/delta audit. Day = epoch day from the µs timestamp.
    "aud_completeness" -> ((s, d) => {
      val ev = t(s, d, "events").select(
        call_function("div",
          call_function("div", col("ts").cast("long"), lit(1000L)),
          lit(86400000000L)).as("day"),
        when(col("event_id") % 7 === 0, lit(null)).otherwise(col("value")).as("value"),
        when(col("event_id") % 11 === 0, lit(null)).otherwise(col("props")).as("props"))
      AuditOps.completenessReport(ev, Seq("value", "props"), col("day"))
        .orderBy("column_name", "day")
    }),

    // Numeric-drift audit: exact two-sample KS of o_totalprice between the
    // F and O order cohorts — distinct-value groups, banded cumulative
    // (no unpartitioned window), cross-multiplied integer verdict.
    "aud_ks" -> ((s, d) =>
      AuditOps.ksReport(
        t(s, d, "orders").filter(col("o_orderstatus").isin("F", "O")),
        col("o_totalprice"), col("o_orderstatus") === "F")),

    // Operating point: the floor(value)->error classifier's argmax-F1
    // cutoff (same score/label pair aud_auc grades as a ranking).
    "aud_threshold" -> ((s, d) =>
      AuditOps.thresholdReport(t(s, d, "events"), floor(col("value")),
        col("event_type") === "error")),

    // Decile cumulative gains / lift of the same score/label pair — the
    // whole targeting curve next to aud_auc's one number. Tie-groups land
    // in the bucket of their first row (exact integer div), so bucket
    // assignment is engine-exact.
    "aud_gains" -> ((s, d) =>
      AuditOps.gainsReport(t(s, d, "events"), floor(col("value")),
        col("event_type") === "error")),

    // Data-card KS: per source, does the n_chars distribution differ
    // between English and non-English docs? (groups rank in parallel —
    // every window partitions by source; integer values exercise ties)
    "aud_ks_by_source" -> ((s, d) =>
      AuditOps.ksReportBy(t(s, d, "documents"), col("n_chars"),
          col("lang") === "en", "source")
        .orderBy("grp")),

    // Data-card calibration: per source, is n_chars/2000 calibrated as a
    // "probability of English"? Completes the per-source audit panel
    // (aud_auc_by_source grades the ranking, this the probabilities —
    // same score/label pair). Long docs saturate into bin 9 by design.
    "aud_calibration_by_source" -> ((s, d) =>
      AuditOps.calibrationReportBy(t(s, d, "documents"),
          col("n_chars") / 2000.0, col("lang") === "en", "source")
        .orderBy("grp", "bin")),

    // Data-card operating point: per source, the argmax-F1 length cutoff
    // for predicting English — the per-group DECISION row next to the
    // per-group AUC/KS/calibration (windows all partition by source).
    "aud_threshold_by_source" -> ((s, d) =>
      AuditOps.thresholdReportBy(t(s, d, "documents"),
          col("n_chars"), col("lang") === "en", "source")
        .orderBy("grp")),

    // Per-source gains curve for the same pair — a global lift curve
    // hides a source whose scores don't rank at all.
    "aud_gains_by_source" -> ((s, d) =>
      AuditOps.gainsReportBy(t(s, d, "documents"),
        col("n_chars"), col("lang") === "en", "source", 5)),

    // Benford screen on order totals: digit from the decimal string (no
    // libm on data), deviation as the exact ppb cross-multiplication.
    "aud_benford" -> ((s, d) =>
      AuditOps.benfordReport(t(s, d, "orders"), col("o_totalprice"))
        .orderBy("digit")),

    // The RELEASE DATA CARD (r12): the full per-source audit panel as
    // ONE long-format table — every value produced by the same gate-
    // pinned op graded elsewhere in this battery (DataCardSpec pins the
    // relabeling; graft.Audit --card publishes it as a SnapshotStore
    // version). The oracle re-derives each panel with the battle-tested
    // by-source constructions.
    "aud_card" -> ((s, d) =>
      graft.Audit.buildCard(s, d).orderBy("section", "source", "metric")))

  /** One instance of the q34 exact-percentile CTE chain (binWidth 1024,
    * bins 1024 — the [[AuditOps]] defaults) at the given integer
    * permilles, over CTE/table `src` with group `grpCol` and value
    * `valCol`; emits CTEs prefixed `$id`, final `${id}q(g, p, cut)`
    * (plus `${id}b(g, bin, v)` for downstream re-scans).
    */
  private def quantileChain(id: String, src: String, grpCol: String,
      valCol: String, ps: Seq[Int]): String =
    s"""${id}b AS (SELECT $grpCol AS g,
       |    least(greatest(CAST(floor($valCol / 1024) AS BIGINT), 0), 1023) AS bin,
       |    CAST($valCol AS DOUBLE) AS v FROM $src WHERE $valCol IS NOT NULL),
       |${id}c AS (SELECT g, bin, COUNT(*) AS cnt FROM ${id}b GROUP BY g, bin),
       |${id}cc AS (SELECT g, bin, cnt, COALESCE(CAST(SUM(cnt) OVER (PARTITION BY g ORDER BY bin
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS cum_prev FROM ${id}c),
       |${id}nn AS (SELECT g, CAST(SUM(cnt) AS BIGINT) AS n FROM ${id}c GROUP BY g),
       |${id}t AS (SELECT nn.g, qs.p, nn.n, ((nn.n - 1) * qs.p) % 1000 AS fr,
       |    ((nn.n - 1) * qs.p) // 1000 + 1 AS rank_lo,
       |    ((nn.n - 1) * qs.p) // 1000
       |      + CASE WHEN ((nn.n - 1) * qs.p) % 1000 > 0 THEN 2 ELSE 1 END AS rank_hi
       |  FROM ${id}nn nn, (SELECT unnest([${ps.mkString(", ")}]) AS p) qs),
       |${id}nb AS (SELECT DISTINCT t.g, cc.bin, cc.cum_prev FROM ${id}t t JOIN ${id}cc cc
       |    ON cc.g = t.g
       |    AND ((t.rank_lo > cc.cum_prev AND t.rank_lo <= cc.cum_prev + cc.cnt)
       |      OR (t.rank_hi > cc.cum_prev AND t.rank_hi <= cc.cum_prev + cc.cnt))),
       |${id}s AS (SELECT b.g, b.v, nb.cum_prev
       |    + ROW_NUMBER() OVER (PARTITION BY b.g, b.bin ORDER BY b.v) AS grank
       |  FROM ${id}b b JOIN ${id}nb nb ON nb.g = b.g AND nb.bin = b.bin),
       |${id}q AS (SELECT t.g, t.p,
       |    MAX(CASE WHEN s.grank = t.rank_lo THEN s.v END)
       |      + (CAST(t.fr AS DOUBLE) / CAST(1000 AS DOUBLE))
       |        * (MAX(CASE WHEN s.grank = t.rank_hi THEN s.v END)
       |           - MAX(CASE WHEN s.grank = t.rank_lo THEN s.v END)) AS cut
       |  FROM ${id}t t JOIN ${id}s s ON s.g = t.g
       |    AND (s.grank = t.rank_lo OR s.grank = t.rank_hi)
       |  GROUP BY t.g, t.p, t.fr)""".stripMargin

  /** The single-permille (median) form of [[quantileChain]]; emits the
    * same CTEs plus `${id}m(g, cut)`.
    */
  private def medianChain(id: String, src: String, grpCol: String, valCol: String): String =
    quantileChain(id, src, grpCol, valCol, Seq(500)) +
      s""",
         |${id}m AS (SELECT g, MIN(cut) AS cut FROM ${id}q GROUP BY g)""".stripMargin

  def oracleSql: Map[String, String] = Map(
    // median of v per type (chain m1), deviations, median of |v−med|
    // (chain m2), then the 3·MAD flag count — every step the exact q34
    // arithmetic
    "aud_robust_outliers" ->
      s"""WITH ${medianChain("m1", "events", "event_type", "value")},
         |dev AS (SELECT b.g, b.v, m.cut AS med, abs(b.v - m.cut) AS ad
         |  FROM m1b b JOIN m1m m ON m.g = b.g),
         |${medianChain("m2", "dev", "g", "ad")}
         |SELECT d.g AS event_type, COUNT(*) AS n, MIN(d.med) AS med,
         |  MIN(m2.cut) AS mad,
         |  CAST(SUM(CASE WHEN d.ad > 3 * m2.cut THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged
         |FROM dev d JOIN m2m m2 ON m2.g = d.g
         |GROUP BY d.g ORDER BY d.g""".stripMargin,
    "aud_dq_report" -> {
      // each branch mirrors one check's semantics; see AuditOps null
      // discipline (nulls fire only not_null checks)
      def row(id: String, tpe: String, table: String, target: String,
          viol: String, total: String, from: String) =
        s"""SELECT '$id' AS check_id, '$tpe' AS check_type, '$table' AS table_name,
           |  '$target' AS target, CAST($viol AS BIGINT) AS violations,
           |  CAST($total AS BIGINT) AS total,
           |  CAST(CASE WHEN $viol = 0 THEN 1 ELSE 0 END AS BIGINT) AS passed
           |FROM $from""".stripMargin
      Seq(
        row("nn_customer_c_name", "not_null", "customer", "c_name",
          "SUM(CASE WHEN c_name IS NULL THEN 1 ELSE 0 END)", "COUNT(*)", "customer"),
        row("nn_orders_o_custkey", "not_null", "orders", "o_custkey",
          "SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)", "COUNT(*)", "orders"),
        row("uk_orders_o_orderkey", "unique_key", "orders", "o_orderkey",
          "COUNT(*) - COUNT(DISTINCT o_orderkey)", "COUNT(*)", "orders"),
        row("uk_lineitem_l_orderkey_l_linenumber", "unique_key", "lineitem",
          "l_orderkey,l_linenumber",
          "COUNT(*) - COUNT(DISTINCT (l_orderkey, l_linenumber))", "COUNT(*)", "lineitem"),
        row("fk_orders_o_custkey", "fk_integrity", "orders", "o_custkey->customer.c_custkey",
          "SUM(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END)", "COUNT(*)",
          """(SELECT c.c_custkey FROM orders o
            |   LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
            |   ON o.o_custkey = c.c_custkey WHERE o.o_custkey IS NOT NULL)""".stripMargin),
        row("fk_lineitem_l_partkey", "fk_integrity", "lineitem", "l_partkey->part.p_partkey",
          "SUM(CASE WHEN p_partkey IS NULL THEN 1 ELSE 0 END)", "COUNT(*)",
          """(SELECT p.p_partkey FROM lineitem l
            |   LEFT JOIN (SELECT DISTINCT p_partkey FROM part) p
            |   ON l.l_partkey = p.p_partkey WHERE l.l_partkey IS NOT NULL)""".stripMargin),
        row("rng_lineitem_l_quantity", "in_range", "lineitem", "l_quantity",
          "SUM(CASE WHEN l_quantity IS NOT NULL AND NOT (l_quantity >= 1 AND l_quantity <= 45) THEN 1 ELSE 0 END)",
          "COUNT(*)", "lineitem"),
        row("rng_part_p_size", "in_range", "part", "p_size",
          "SUM(CASE WHEN p_size IS NOT NULL AND NOT (p_size >= 1 AND p_size <= 50) THEN 1 ELSE 0 END)",
          "COUNT(*)", "part"),
        row("av_orders_o_orderstatus", "accepted_values", "orders", "o_orderstatus",
          "SUM(CASE WHEN o_orderstatus IS NOT NULL AND o_orderstatus NOT IN ('F','O') THEN 1 ELSE 0 END)",
          "COUNT(*)", "orders"),
        row("av_lineitem_l_returnflag", "accepted_values", "lineitem", "l_returnflag",
          "SUM(CASE WHEN l_returnflag IS NOT NULL AND l_returnflag NOT IN ('A','N','R') THEN 1 ELSE 0 END)",
          "COUNT(*)", "lineitem"),
        row("rc_region", "row_count", "region", "[1,100]",
          "GREATEST(1 - COUNT(*), COUNT(*) - 100, 0)", "COUNT(*)", "region"),
        row("rc_nation", "row_count", "nation", "[1,10]",
          "GREATEST(1 - COUNT(*), COUNT(*) - 10, 0)", "COUNT(*)", "nation"))
        .mkString("", "\nUNION ALL\n", "\nORDER BY check_id")
    },

    // exact rewrite (n*x - S)^2 > 9*(n*S2 - S^2): DuckDB's BIGINT sums go
    // through HUGEINT — exact, same verdicts as the DECIMAL(38,0) path
    "aud_outliers" ->
      """WITH b AS (SELECT event_type AS grp, CAST(floor(value) AS BIGINT) AS x
        |           FROM events WHERE value IS NOT NULL),
        |st AS (SELECT grp, COUNT(*) AS n, SUM(x) AS s, SUM(x*x) AS s2
        |       FROM b GROUP BY grp)
        |SELECT b.grp, COUNT(*) AS n_rows,
        |  CAST(SUM(CASE WHEN (st.n*b.x - st.s)*(st.n*b.x - st.s)
        |                     > 9*(st.n*st.s2 - st.s*st.s)
        |           THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
        |  MAX(CASE WHEN (st.n*b.x - st.s)*(st.n*b.x - st.s)
        |                > 9*(st.n*st.s2 - st.s*st.s) THEN b.x END) AS max_outlier,
        |  MIN(CASE WHEN (st.n*b.x - st.s)*(st.n*b.x - st.s)
        |                > 9*(st.n*st.s2 - st.s*st.s) THEN b.x END) AS min_outlier
        |FROM b JOIN st USING (grp)
        |GROUP BY b.grp ORDER BY b.grp""".stripMargin,

    // cumulative-window twin of the op's Spark window; BIGINT window sums
    // go through HUGEINT — exact, same verdict sequence
    "aud_anomaly_cum" ->
      """WITH b AS (SELECT event_type AS grp, event_id, ts,
        |    CAST(floor(value) AS BIGINT) AS x
        |  FROM events WHERE value IS NOT NULL),
        |w AS (SELECT grp, event_id, x,
        |    COUNT(*) OVER pw AS n, SUM(x) OVER pw AS s, SUM(x*x) OVER pw AS s2
        |  FROM b WINDOW pw AS (PARTITION BY grp ORDER BY ts, event_id
        |                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
        |v AS (SELECT grp, event_id,
        |    CASE WHEN n >= 30 AND (n*x - s)*(n*x - s) > 9*(n*s2 - s*s)
        |         THEN 1 ELSE 0 END AS fl,
        |    CASE WHEN n >= 30 THEN 1 ELSE 0 END AS scored FROM w)
        |SELECT grp, CAST(SUM(scored) AS BIGINT) AS n_scored,
        |  CAST(SUM(fl) AS BIGINT) AS n_anomalies,
        |  MIN(CASE WHEN fl = 1 THEN event_id END) AS first_anomaly,
        |  MAX(CASE WHEN fl = 1 THEN event_id END) AS last_anomaly
        |FROM v GROUP BY grp ORDER BY grp""".stripMargin,

    // the CUSUM fold unrolled as a recursive CTE over per-group row
    // numbers; integer-scaled residuals n·x − Σx keep every state value
    // exact, the two max-statistic divisions are the only FP
    "aud_cusum" ->
      """WITH RECURSIVE b AS (SELECT event_type AS grp, ts, event_id,
        |    CAST(floor(value) AS BIGINT) AS x
        |  FROM events WHERE value IS NOT NULL),
        |st AS (SELECT grp, CAST(COUNT(*) AS HUGEINT) AS n,
        |    CAST(SUM(x) AS HUGEINT) AS s FROM b GROUP BY grp),
        |r AS (SELECT b.grp, b.event_id, st.n,
        |    CAST(st.n * b.x - st.s AS HUGEINT) AS res,
        |    ROW_NUMBER() OVER (PARTITION BY b.grp ORDER BY b.ts, b.event_id) AS rn
        |  FROM b JOIN st ON st.grp = b.grp),
        |f(grp, rn, tp, tn) AS (
        |  SELECT grp, CAST(0 AS BIGINT), CAST(0 AS HUGEINT), CAST(0 AS HUGEINT)
        |  FROM st
        |  UNION ALL
        |  SELECT r.grp, r.rn,
        |    GREATEST(CAST(0 AS HUGEINT), f.tp + r.res - r.n * 30),
        |    GREATEST(CAST(0 AS HUGEINT), f.tn - r.res - r.n * 30)
        |  FROM f JOIN r ON r.grp = f.grp AND r.rn = f.rn + 1),
        |al AS (SELECT f.grp, f.rn, f.tp, f.tn, r.event_id, r.n,
        |    CASE WHEN f.tp > r.n * 150 THEN 1 ELSE 0 END AS up,
        |    CASE WHEN f.tn > r.n * 150 THEN 1 ELSE 0 END AS dn
        |  FROM f JOIN r ON r.grp = f.grp AND r.rn = f.rn)
        |SELECT grp, CAST(MAX(n) AS BIGINT) AS n,
        |  CAST(SUM(up) AS BIGINT) AS n_alarms_up,
        |  CAST(SUM(dn) AS BIGINT) AS n_alarms_down,
        |  arg_min(event_id, rn) FILTER (WHERE up = 1 OR dn = 1)
        |    AS first_alarm_id,
        |  CAST(MAX(tp) AS DOUBLE) / CAST(MAX(n) AS DOUBLE) AS max_cusum_up,
        |  CAST(MAX(tn) AS DOUBLE) / CAST(MAX(n) AS DOUBLE) AS max_cusum_down
        |FROM al GROUP BY grp ORDER BY grp""".stripMargin,

    // Spearman: both columns ranked by the 2x tie-averaged construction
    // per group, HUGEINT moments, the autocorr cast->sqrt*sqrt->div chain
    "aud_spearman" ->
      """WITH b AS (SELECT event_type AS grp, epoch_us(ts) AS x,
        |    CAST(floor(value) AS BIGINT) AS y
        |  FROM events WHERE value IS NOT NULL AND ts IS NOT NULL),
        |rx AS (SELECT grp, x, 2*(COALESCE(CAST(SUM(cnt) OVER (PARTITION BY grp
        |      ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS BIGINT), 0)) + cnt + 1 AS rx
        |  FROM (SELECT grp, x, CAST(COUNT(*) AS BIGINT) AS cnt
        |        FROM b GROUP BY grp, x)),
        |ry AS (SELECT grp, y, 2*(COALESCE(CAST(SUM(cnt) OVER (PARTITION BY grp
        |      ORDER BY y ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS BIGINT), 0)) + cnt + 1 AS ry
        |  FROM (SELECT grp, y, CAST(COUNT(*) AS BIGINT) AS cnt
        |        FROM b GROUP BY grp, y)),
        |j AS (SELECT b.grp, rx.rx, ry.ry
        |  FROM b JOIN rx ON rx.grp = b.grp AND rx.x = b.x
        |         JOIN ry ON ry.grp = b.grp AND ry.y = b.y),
        |m AS (SELECT grp, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CAST(rx AS HUGEINT)) AS HUGEINT) AS sx,
        |    CAST(SUM(CAST(ry AS HUGEINT)) AS HUGEINT) AS sy,
        |    CAST(SUM(CAST(rx AS HUGEINT) * rx) AS HUGEINT) AS sxx,
        |    CAST(SUM(CAST(ry AS HUGEINT) * ry) AS HUGEINT) AS syy,
        |    CAST(SUM(CAST(rx AS HUGEINT) * ry) AS HUGEINT) AS sxy
        |  FROM j GROUP BY grp),
        |z AS (SELECT grp, n,
        |    CASE WHEN CAST(n AS HUGEINT)*sxx - sx*sx > 0
        |          AND CAST(n AS HUGEINT)*syy - sy*sy > 0 THEN
        |      CAST(CAST(n AS HUGEINT)*sxy - sx*sy AS DOUBLE)
        |        / (sqrt(CAST(CAST(n AS HUGEINT)*sxx - sx*sx AS DOUBLE))
        |           * sqrt(CAST(CAST(n AS HUGEINT)*syy - sy*sy AS DOUBLE)))
        |    END AS rho
        |  FROM m)
        |SELECT grp, n, rho,
        |  COALESCE(abs(rho) * sqrt(CAST(n - 1 AS DOUBLE)) >= 1.96, FALSE)
        |    AS significant
        |FROM z ORDER BY grp""".stripMargin,

    // Kruskal-Wallis: the mannwhitney 2x-rank construction globalized,
    // two floor divisions collapsing the fraction tower, tie-corrected
    // H one exact division, runtime-dof Wilson-Hilferty verdict
    "aud_kruskal" ->
      """WITH b AS (SELECT event_type AS s, CAST(floor(value) AS BIGINT) AS x
        |  FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL),
        |sx AS (SELECT s, x, CAST(COUNT(*) AS BIGINT) AS cgx
        |  FROM b GROUP BY s, x),
        |cx AS (SELECT x, CAST(SUM(cgx) AS BIGINT) AS c FROM sx GROUP BY x),
        |cx2 AS (SELECT x, c, COALESCE(CAST(SUM(c) OVER (ORDER BY x
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
        |    0) AS cum_prev FROM cx),
        |ps AS (SELECT s, CAST(SUM(cgx) AS HUGEINT) AS ng,
        |    CAST(SUM(CAST(cgx AS HUGEINT) * (2*cum_prev + c + 1)) AS HUGEINT)
        |      AS r2
        |  FROM sx JOIN cx2 USING (x) GROUP BY s),
        |tt AS (SELECT CAST(SUM(CAST(c AS HUGEINT)*c*c - c) AS HUGEINT) AS tt
        |  FROM cx),
        |a AS (SELECT CAST(COUNT(*) AS BIGINT) AS k,
        |    CAST(SUM(ng) AS BIGINT) AS n,
        |    CAST(SUM((3*r2*r2) // ng) AS HUGEINT) AS tsum FROM ps),
        |x2 AS (SELECT a.k, a.n, tt.tt,
        |    (a.tsum * 1000000) // (CAST(a.n AS HUGEINT) * (a.n + 1)) AS aa,
        |    CAST(a.n AS HUGEINT)*a.n*a.n - a.n AS n3n FROM a, tt),
        |y AS (SELECT k, n, tt, n3n, GREATEST(CAST(0 AS HUGEINT),
        |    aa - 3*(CAST(n AS HUGEINT)+1)*1000000) AS hq FROM x2),
        |z AS (SELECT k, n, CASE WHEN n3n > tt THEN
        |    CAST(hq * n3n AS DOUBLE) / CAST((n3n - tt) * 1000000 AS DOUBLE)
        |  END AS h, k - 1 AS dof FROM y),
        |w AS (SELECT *, round((1.0 - 2.0/(9.0*dof))
        |    + 1.645*sqrt(2.0/(9.0*dof)), 12) AS cc FROM z)
        |SELECT k, n, h, CASE WHEN dof > 0 THEN dof*(cc*cc*cc) END AS crit,
        |  COALESCE(dof > 0 AND h >= dof*(cc*cc*cc), FALSE) AS significant
        |FROM w""".stripMargin,

    // ANOVA: exact HUGEINT moments, quantized floor-division mean-square
    // terms, F and eta^2 each one division of exact integers
    "aud_anova" ->
      """WITH b AS (SELECT event_type AS grp,
        |    CAST(floor(value) AS BIGINT) AS x
        |  FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL),
        |g AS (SELECT grp, CAST(COUNT(*) AS HUGEINT) AS ng,
        |    CAST(SUM(x) AS HUGEINT) AS sg,
        |    CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS qg
        |  FROM b GROUP BY grp),
        |a AS (SELECT CAST(COUNT(*) AS BIGINT) AS k,
        |    CAST(SUM(ng) AS BIGINT) AS n, CAST(SUM(sg) AS HUGEINT) AS s,
        |    CAST(SUM(qg) AS HUGEINT) AS qq,
        |    CAST(SUM((sg * sg * 1000000) // ng) AS HUGEINT) AS tsum
        |  FROM g),
        |x AS (SELECT k, n, tsum, qq,
        |    (s * s * 1000000) // n AS tq FROM a),
        |y AS (SELECT k, n,
        |    GREATEST(CAST(0 AS HUGEINT), tsum - tq) AS ssb,
        |    GREATEST(CAST(0 AS HUGEINT), qq * 1000000 - tsum) AS ssw
        |  FROM x)
        |SELECT k, n, CAST(ssb AS DOUBLE) / 1000000.0 AS ss_between,
        |  CAST(ssw AS DOUBLE) / 1000000.0 AS ss_within,
        |  CASE WHEN k >= 2 AND n > k AND ssw > 0 THEN
        |    CAST(ssb * (n - k) AS DOUBLE) / CAST(ssw * (k - 1) AS DOUBLE)
        |  END AS f_stat,
        |  CASE WHEN ssb + ssw > 0 THEN
        |    CAST(ssb AS DOUBLE) / CAST(ssb + ssw AS DOUBLE) END AS eta2
        |FROM y""".stripMargin,

    // EWMA: the cusum recursive-CTE frame with the integer-floor
    // smoothing step (HUGEINT // is floor for nonnegative operands,
    // identical to the fold's Math.floorDiv)
    "aud_ewma" ->
      """WITH RECURSIVE b AS (SELECT event_type AS grp, ts, event_id,
        |    CAST(floor(value) AS BIGINT) AS x
        |  FROM events WHERE value IS NOT NULL),
        |st AS (SELECT grp, CAST(COUNT(*) AS HUGEINT) AS n,
        |    CAST(SUM(x) AS HUGEINT) AS s FROM b GROUP BY grp),
        |r AS (SELECT b.grp, b.event_id, st.n, st.s,
        |    CAST(b.x AS HUGEINT) AS x,
        |    ROW_NUMBER() OVER (PARTITION BY b.grp ORDER BY b.ts, b.event_id)
        |      AS rn
        |  FROM b JOIN st ON st.grp = b.grp),
        |f(grp, rn, z) AS (
        |  SELECT grp, CAST(0 AS BIGINT), s // n FROM st
        |  UNION ALL
        |  SELECT r.grp, r.rn, (r.x + 3 * f.z) // 4
        |  FROM f JOIN r ON r.grp = f.grp AND r.rn = f.rn + 1),
        |al AS (SELECT f.grp, f.rn, f.z, r.event_id, r.n,
        |    CASE WHEN abs(r.n * f.z - r.s) > r.n * 20 THEN 1 ELSE 0 END
        |      AS alarm,
        |    abs(r.n * f.z - r.s) AS dev
        |  FROM f JOIN r ON r.grp = f.grp AND r.rn = f.rn)
        |SELECT grp, CAST(MAX(n) AS BIGINT) AS n,
        |  CAST(SUM(alarm) AS BIGINT) AS n_alarms,
        |  arg_min(event_id, rn) FILTER (WHERE alarm = 1) AS first_alarm_id,
        |  CAST(arg_max(z, rn) AS DOUBLE) AS final_ewma,
        |  CAST(MAX(dev) AS DOUBLE) / CAST(MAX(n) AS DOUBLE) AS max_dev
        |FROM al GROUP BY grp ORDER BY grp""".stripMargin,

    // runs test: mean-side flags by exact cross-multiply, one lag +
    // one prefix-sum window per group, statistics in the split
    // two-division form mirrored op-for-op
    "aud_runs" ->
      """WITH b AS (SELECT event_type AS grp, ts, event_id,
        |    CAST(floor(value) AS BIGINT) AS x
        |  FROM events WHERE value IS NOT NULL),
        |st AS (SELECT grp, CAST(COUNT(*) AS HUGEINT) AS n,
        |    CAST(SUM(x) AS HUGEINT) AS s FROM b GROUP BY grp),
        |sd AS (SELECT b.grp, b.ts, b.event_id,
        |    CASE WHEN st.n * b.x > st.s THEN 1 ELSE 0 END AS side
        |  FROM b JOIN st ON st.grp = b.grp),
        |ch AS (SELECT grp, ts, event_id, side,
        |    CASE WHEN LAG(side) OVER (PARTITION BY grp ORDER BY ts, event_id)
        |        IS DISTINCT FROM side THEN 1 ELSE 0 END AS chg
        |  FROM sd),
        |ri AS (SELECT grp, side,
        |    SUM(chg) OVER (PARTITION BY grp ORDER BY ts, event_id
        |      ROWS UNBOUNDED PRECEDING) AS run_id
        |  FROM ch),
        |rl AS (SELECT grp, run_id, COUNT(*) AS len FROM ri GROUP BY grp, run_id),
        |ra AS (SELECT grp, CAST(MAX(run_id) AS BIGINT) AS n_runs,
        |    CAST(MAX(len) AS BIGINT) AS longest_run FROM rl GROUP BY grp),
        |n1t AS (SELECT grp, CAST(SUM(side) AS HUGEINT) AS n1 FROM sd GROUP BY grp),
        |j AS (SELECT st.grp, st.n, n1t.n1, st.n - n1t.n1 AS n0,
        |    2 * n1t.n1 * (st.n - n1t.n1) AS tno, ra.n_runs, ra.longest_run
        |  FROM st JOIN ra ON ra.grp = st.grp JOIN n1t ON n1t.grp = st.grp)
        |SELECT grp, CAST(n AS BIGINT) AS n, CAST(n1 AS BIGINT) AS n1,
        |  CAST(n0 AS BIGINT) AS n0, n_runs, longest_run,
        |  CAST(n + tno AS DOUBLE) / CAST(n AS DOUBLE) AS mu_runs,
        |  CASE WHEN n >= 2 AND n1 > 0 AND n0 > 0 THEN
        |    (CAST(tno AS DOUBLE) / CAST(n * n AS DOUBLE)) *
        |      (CAST(tno - n AS DOUBLE) / CAST(n - 1 AS DOUBLE)) END AS var_runs,
        |  CASE WHEN n >= 2 AND n1 > 0 AND n0 > 0 AND
        |      (CAST(tno AS DOUBLE) / CAST(n * n AS DOUBLE)) *
        |        (CAST(tno - n AS DOUBLE) / CAST(n - 1 AS DOUBLE)) > 0 THEN
        |    (CAST(n_runs * n - n - tno AS DOUBLE) / CAST(n AS DOUBLE)) /
        |      sqrt((CAST(tno AS DOUBLE) / CAST(n * n AS DOUBLE)) *
        |        (CAST(tno - n AS DOUBLE) / CAST(n - 1 AS DOUBLE))) END AS z_runs
        |FROM j ORDER BY grp""".stripMargin,

    // the q34 percentile CTE chain (integer permille rank arithmetic, same
    // 3-op interpolation) at [25, 975], then the clip + decimal sum
    "aud_winsorize" ->
      """WITH b AS (SELECT o_orderstatus AS g,
        |    least(greatest(CAST(floor(o_totalprice / 1024) AS BIGINT), 0), 1023) AS bin,
        |    CAST(o_totalprice AS DOUBLE) AS v
        |  FROM orders WHERE o_totalprice IS NOT NULL),
        |c AS (SELECT g, bin, COUNT(*) AS cnt FROM b GROUP BY g, bin),
        |cc AS (SELECT g, bin, cnt, COALESCE(CAST(SUM(cnt) OVER (PARTITION BY g ORDER BY bin
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS cum_prev FROM c),
        |nn AS (SELECT g, CAST(SUM(cnt) AS BIGINT) AS n FROM c GROUP BY g),
        |qs AS (SELECT unnest([25, 975]) AS p),
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
        |vals AS (SELECT t.g, t.p,
        |    MAX(CASE WHEN s.grank = t.rank_lo THEN s.v END)
        |      + (CAST(t.fr AS DOUBLE) / CAST(1000 AS DOUBLE))
        |        * (MAX(CASE WHEN s.grank = t.rank_hi THEN s.v END)
        |           - MAX(CASE WHEN s.grank = t.rank_lo THEN s.v END)) AS cut
        |  FROM t JOIN s ON s.g = t.g AND (s.grank = t.rank_lo OR s.grank = t.rank_hi)
        |  GROUP BY t.g, t.p, t.n, t.fr),
        |cuts AS (SELECT g, MIN(CASE WHEN p = 25 THEN cut END) AS lo_cut,
        |    MAX(CASE WHEN p = 975 THEN cut END) AS hi_cut FROM vals GROUP BY g),
        |w AS (SELECT b.g, b.v, cuts.lo_cut, cuts.hi_cut,
        |    least(greatest(b.v, cuts.lo_cut), cuts.hi_cut) AS w
        |  FROM b JOIN cuts ON cuts.g = b.g)
        |SELECT g AS o_orderstatus, COUNT(*) AS n,
        |  CAST(SUM(CASE WHEN v < lo_cut THEN 1 ELSE 0 END) AS BIGINT) AS n_clip_lo,
        |  CAST(SUM(CASE WHEN v > hi_cut THEN 1 ELSE 0 END) AS BIGINT) AS n_clip_hi,
        |  MIN(lo_cut) AS lo_cut, MIN(hi_cut) AS hi_cut,
        |  CAST(SUM(CAST(w AS DECIMAL(28,6))) AS DOUBLE) AS win_sum
        |FROM w GROUP BY g ORDER BY g""".stripMargin,

    // distinct-score groups, cumulative window over groups, one final
    // division of exact (HUGEINT) integers
    "aud_auc" ->
      """WITH b AS (SELECT CAST(floor(value) AS BIGINT) AS s,
        |    CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS y
        |  FROM events WHERE value IS NOT NULL),
        |g AS (SELECT s, COUNT(*) AS cnt, SUM(y) AS pos FROM b GROUP BY s),
        |r AS (SELECT s, cnt, pos, COALESCE(SUM(cnt) OVER (ORDER BY s
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum FROM g)
        |SELECT CAST(SUM(cnt) AS BIGINT) AS n, CAST(SUM(pos) AS BIGINT) AS n_pos,
        |  CAST(SUM(cnt) - SUM(pos) AS BIGINT) AS n_neg,
        |  CAST(SUM(pos * (2 * cum + cnt + 1)) - SUM(pos) * (SUM(pos) + 1) AS DOUBLE)
        |    / CAST(2 * SUM(pos) * (SUM(cnt) - SUM(pos)) AS DOUBLE) AS auc
        |FROM r""".stripMargin,

    // the fused report mirrored piece-for-piece: the q34 chain at
    // [25, 500, 975] gives lo/med/hi, a second chain over |v − med| gives
    // MAD, HUGEINT sums give the z verdict, one final join computes every
    // column with the same exact arithmetic as the three separate oracles
    "aud_combined" ->
      s"""WITH ${quantileChain("qa", "events", "event_type", "value", Seq(25, 500, 975))},
         |cuts AS (SELECT g, MIN(CASE WHEN p = 25 THEN cut END) AS lo_cut,
         |    MIN(CASE WHEN p = 500 THEN cut END) AS med,
         |    MAX(CASE WHEN p = 975 THEN cut END) AS hi_cut FROM qaq GROUP BY g),
         |dev AS (SELECT b.g, b.v, c.med, abs(b.v - c.med) AS ad
         |  FROM qab b JOIN cuts c ON c.g = b.g),
         |${quantileChain("qm", "dev", "g", "ad", Seq(500))},
         |madt AS (SELECT g, MIN(cut) AS mad FROM qmq GROUP BY g),
         |bx AS (SELECT event_type AS g, CAST(floor(value) AS BIGINT) AS x,
         |    CAST(value AS DOUBLE) AS v FROM events WHERE value IS NOT NULL),
         |st AS (SELECT g, COUNT(*) AS n, SUM(x) AS s, SUM(x*x) AS s2
         |  FROM bx GROUP BY g)
         |SELECT bx.g AS event_type, COUNT(*) AS n_rows,
         |  CAST(SUM(CASE WHEN (st.n*bx.x - st.s)*(st.n*bx.x - st.s)
         |                     > 9*(st.n*st.s2 - st.s*st.s)
         |           THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
         |  MIN(CASE WHEN (st.n*bx.x - st.s)*(st.n*bx.x - st.s)
         |                > 9*(st.n*st.s2 - st.s*st.s) THEN bx.x END) AS min_outlier,
         |  MAX(CASE WHEN (st.n*bx.x - st.s)*(st.n*bx.x - st.s)
         |                > 9*(st.n*st.s2 - st.s*st.s) THEN bx.x END) AS max_outlier,
         |  MIN(cuts.med) AS med, MIN(madt.mad) AS mad,
         |  CAST(SUM(CASE WHEN abs(bx.v - cuts.med) > 3 * madt.mad
         |           THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
         |  MIN(cuts.lo_cut) AS lo_cut, MIN(cuts.hi_cut) AS hi_cut,
         |  CAST(SUM(CASE WHEN bx.v < cuts.lo_cut THEN 1 ELSE 0 END) AS BIGINT) AS n_clip_lo,
         |  CAST(SUM(CASE WHEN bx.v > cuts.hi_cut THEN 1 ELSE 0 END) AS BIGINT) AS n_clip_hi,
         |  CAST(SUM(CAST(least(greatest(bx.v, cuts.lo_cut), cuts.hi_cut)
         |    AS DECIMAL(28,6))) AS DOUBLE) AS win_sum
         |FROM bx JOIN st USING (g) JOIN cuts ON cuts.g = bx.g
         |  JOIN madt ON madt.g = bx.g
         |GROUP BY bx.g ORDER BY event_type""".stripMargin,

    // reliability diagram mirrored in exact integers: bin by one IEEE
    // multiply + floor, ECE numerator Σ|2B·pos − n·(2i+1)| in HUGEINT,
    // single divisions for mid/acc/ece
    "aud_calibration" ->
      """WITH b AS (SELECT
        |    GREATEST(LEAST(CAST(floor((value / 1000.0) * 10) AS BIGINT), 9), 0) AS bin,
        |    CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS y
        |  FROM events WHERE value IS NOT NULL),
        |g AS (SELECT bin, COUNT(*) AS n, SUM(y) AS n_pos FROM b GROUP BY bin),
        |t AS (SELECT CAST(SUM(n) AS HUGEINT) AS nn,
        |    CAST(SUM(abs(20 * n_pos - n * (2 * bin + 1))) AS HUGEINT) AS ece_num
        |  FROM g)
        |SELECT g.bin, CAST(2 * g.bin + 1 AS DOUBLE) / 20.0 AS conf_mid,
        |  CAST(g.n AS BIGINT) AS n, CAST(g.n_pos AS BIGINT) AS n_pos,
        |  CAST(g.n_pos AS DOUBLE) / CAST(g.n AS DOUBLE) AS acc,
        |  CAST(t.ece_num AS DOUBLE) / CAST(20 * t.nn AS DOUBLE) AS ece
        |FROM g, t ORDER BY bin""".stripMargin,

    // drift mirrored in exact integers: TVD numerator Σ|o·Nn − n·No| in
    // HUGEINT with one division; chi-square contribution as two
    // exact-integer quotients added in the same order as the op
    "aud_drift" ->
      """WITH o AS (SELECT source AS cat, COUNT(*) AS o_cnt FROM documents
        |  WHERE source IS NOT NULL GROUP BY source),
        |nw AS (SELECT source AS cat, COUNT(*) AS n_cnt FROM documents
        |  WHERE source IS NOT NULL AND doc_id % 3 <> 0 GROUP BY source),
        |j AS (SELECT COALESCE(o.cat, nw.cat) AS cat,
        |    CAST(COALESCE(o.o_cnt, 0) AS HUGEINT) AS o_cnt,
        |    CAST(COALESCE(nw.n_cnt, 0) AS HUGEINT) AS n_cnt
        |  FROM o FULL OUTER JOIN nw ON o.cat = nw.cat),
        |t AS (SELECT CAST(SUM(o_cnt) AS HUGEINT) AS no,
        |    CAST(SUM(n_cnt) AS HUGEINT) AS nn FROM j),
        |tv AS (SELECT CAST(SUM(abs(j.o_cnt * t.nn - j.n_cnt * t.no)) AS HUGEINT)
        |    AS tvd_num FROM j, t)
        |SELECT j.cat, CAST(j.o_cnt AS BIGINT) AS o_cnt,
        |  CAST(j.n_cnt AS BIGINT) AS n_cnt,
        |  CAST(j.o_cnt AS DOUBLE) / CAST(t.no AS DOUBLE) AS o_rate,
        |  CAST(j.n_cnt AS DOUBLE) / CAST(t.nn AS DOUBLE) AS n_rate,
        |  CAST(((t.no + t.nn) * j.o_cnt - t.no * (j.o_cnt + j.n_cnt))
        |      * ((t.no + t.nn) * j.o_cnt - t.no * (j.o_cnt + j.n_cnt)) AS DOUBLE)
        |    / CAST((t.no + t.nn) * t.no * (j.o_cnt + j.n_cnt) AS DOUBLE)
        |  + CAST(((t.no + t.nn) * j.n_cnt - t.nn * (j.o_cnt + j.n_cnt))
        |      * ((t.no + t.nn) * j.n_cnt - t.nn * (j.o_cnt + j.n_cnt)) AS DOUBLE)
        |    / CAST((t.no + t.nn) * t.nn * (j.o_cnt + j.n_cnt) AS DOUBLE)
        |  AS chi2_contrib,
        |  CAST(tv.tvd_num AS DOUBLE) / CAST(2 * t.no * t.nn AS DOUBLE) AS tvd
        |FROM j, t, tv ORDER BY cat""".stripMargin,

    // the aud_drift construction with every count/total keyed by source;
    // CASE guards mirror the op's degenerate-side NULLs
    "aud_drift_by_source" ->
      """WITH o AS (SELECT source AS grp, lang AS cat, COUNT(*) AS o_cnt
        |  FROM documents WHERE source IS NOT NULL AND lang IS NOT NULL
        |  GROUP BY source, lang),
        |nw AS (SELECT source AS grp, lang AS cat, COUNT(*) AS n_cnt
        |  FROM documents WHERE source IS NOT NULL AND lang IS NOT NULL
        |    AND doc_id % 3 <> 0 GROUP BY source, lang),
        |j AS (SELECT COALESCE(o.grp, nw.grp) AS grp,
        |    COALESCE(o.cat, nw.cat) AS cat,
        |    CAST(COALESCE(o.o_cnt, 0) AS HUGEINT) AS o_cnt,
        |    CAST(COALESCE(nw.n_cnt, 0) AS HUGEINT) AS n_cnt
        |  FROM o FULL OUTER JOIN nw ON o.grp = nw.grp AND o.cat = nw.cat),
        |t AS (SELECT grp, CAST(SUM(o_cnt) AS HUGEINT) AS no,
        |    CAST(SUM(n_cnt) AS HUGEINT) AS nn FROM j GROUP BY grp),
        |tv AS (SELECT j.grp,
        |    CAST(SUM(abs(j.o_cnt * t.nn - j.n_cnt * t.no)) AS HUGEINT) AS tvd_num
        |  FROM j JOIN t ON t.grp = j.grp GROUP BY j.grp)
        |SELECT j.grp, j.cat, CAST(j.o_cnt AS BIGINT) AS o_cnt,
        |  CAST(j.n_cnt AS BIGINT) AS n_cnt,
        |  CASE WHEN t.no > 0 THEN
        |    CAST(j.o_cnt AS DOUBLE) / CAST(t.no AS DOUBLE) END AS o_rate,
        |  CASE WHEN t.nn > 0 THEN
        |    CAST(j.n_cnt AS DOUBLE) / CAST(t.nn AS DOUBLE) END AS n_rate,
        |  CASE WHEN t.no > 0 AND t.nn > 0 AND j.o_cnt + j.n_cnt > 0 THEN
        |    CAST(((t.no + t.nn) * j.o_cnt - t.no * (j.o_cnt + j.n_cnt))
        |        * ((t.no + t.nn) * j.o_cnt - t.no * (j.o_cnt + j.n_cnt)) AS DOUBLE)
        |      / CAST((t.no + t.nn) * t.no * (j.o_cnt + j.n_cnt) AS DOUBLE)
        |    + CAST(((t.no + t.nn) * j.n_cnt - t.nn * (j.o_cnt + j.n_cnt))
        |        * ((t.no + t.nn) * j.n_cnt - t.nn * (j.o_cnt + j.n_cnt)) AS DOUBLE)
        |      / CAST((t.no + t.nn) * t.nn * (j.o_cnt + j.n_cnt) AS DOUBLE)
        |  END AS chi2_contrib,
        |  CASE WHEN t.no > 0 AND t.nn > 0 THEN
        |    CAST(tv.tvd_num AS DOUBLE) / CAST(2 * t.no * t.nn AS DOUBLE)
        |  END AS tvd
        |FROM j JOIN t ON t.grp = j.grp JOIN tv ON tv.grp = j.grp
        |ORDER BY j.grp, j.cat""".stripMargin,

    // same construction with the window partitioned by source; the NULL
    // branch mirrors the op's one-class guard
    "aud_auc_by_source" ->
      """WITH b AS (SELECT source AS grp, n_chars AS s,
        |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y FROM documents),
        |g AS (SELECT grp, s, COUNT(*) AS cnt, SUM(y) AS pos FROM b GROUP BY grp, s),
        |r AS (SELECT grp, s, cnt, pos, COALESCE(SUM(cnt) OVER (PARTITION BY grp ORDER BY s
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum FROM g)
        |SELECT grp, CAST(SUM(cnt) AS BIGINT) AS n, CAST(SUM(pos) AS BIGINT) AS n_pos,
        |  CAST(SUM(cnt) - SUM(pos) AS BIGINT) AS n_neg,
        |  CASE WHEN SUM(pos) > 0 AND SUM(cnt) - SUM(pos) > 0 THEN
        |    CAST(SUM(pos * (2 * cum + cnt + 1)) - SUM(pos) * (SUM(pos) + 1) AS DOUBLE)
        |      / CAST(2 * SUM(pos) * (SUM(cnt) - SUM(pos)) AS DOUBLE)
        |  END AS auc
        |FROM r GROUP BY grp ORDER BY grp""".stripMargin,

    // Completeness: identical null injection; the rate delta is the
    // cross-multiplied exact-integer form — never a difference of two
    // rounded doubles. LAG partitions by column over the bounded
    // (day, column) table.
    // Mann–Kendall: pairwise sign sum + tie-corrected variance over the
    // bounded (grp, day) count table; z mirrored as the identical
    // divide → sqrt → divide chain, so the 1.96 verdict is stable.
    "aud_trend" ->
      """WITH e AS (SELECT event_type AS grp,
        |    epoch_us(ts) // 86400000000 AS day FROM events),
        |d AS (SELECT grp, day, CAST(COUNT(*) AS BIGINT) AS x
        |      FROM e GROUP BY grp, day),
        |n AS (SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_days FROM d GROUP BY grp),
        |sp AS (SELECT a.grp,
        |    CAST(SUM(CASE WHEN b.x > a.x THEN 1
        |                  WHEN b.x < a.x THEN -1 ELSE 0 END) AS BIGINT) AS s
        |  FROM d a JOIN d b ON b.grp = a.grp AND b.day > a.day GROUP BY a.grp),
        |tt AS (SELECT grp,
        |    CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tsum
        |  FROM (SELECT grp, x, CAST(COUNT(*) AS BIGINT) AS t
        |        FROM d GROUP BY grp, x) g WHERE t > 1 GROUP BY grp),
        |j AS (SELECT n.grp, n.n_days, COALESCE(sp.s, 0) AS s,
        |    n.n_days * (n.n_days - 1) * (2 * n.n_days + 5)
        |      - COALESCE(tt.tsum, 0) AS var18
        |  FROM n LEFT JOIN sp ON sp.grp = n.grp
        |         LEFT JOIN tt ON tt.grp = n.grp),
        |z AS (SELECT grp, n_days, s, var18,
        |    CASE WHEN var18 > 0 THEN
        |      CASE WHEN s > 0 THEN
        |             CAST(s - 1 AS DOUBLE) / sqrt(CAST(var18 AS DOUBLE) / 18.0)
        |           WHEN s < 0 THEN
        |             CAST(s + 1 AS DOUBLE) / sqrt(CAST(var18 AS DOUBLE) / 18.0)
        |           ELSE 0.0 END
        |    END AS z FROM j)
        |SELECT grp, n_days, s, var18, z,
        |  CASE WHEN z IS NOT NULL AND z >= 1.96 THEN 'increasing'
        |       WHEN z IS NOT NULL AND z <= -1.96 THEN 'decreasing'
        |       ELSE 'none' END AS trend
        |FROM z ORDER BY grp""".stripMargin,
    // Seasonality: exact HUGEINT numerator over the bounded (grp, slot)
    // count table (absent slots contribute n²), one division; the
    // Wilson–Hilferty critical value is the identical op chain on both
    // engines so even the boolean verdict hash-matches.
    "aud_seasonal" ->
      """WITH e AS (SELECT event_type AS grp,
        |    (epoch_us(ts) // 86400000000) % 7 AS slot FROM events),
        |s AS (SELECT grp, slot, CAST(COUNT(*) AS BIGINT) AS o
        |      FROM e GROUP BY grp, slot),
        |n AS (SELECT grp, CAST(SUM(o) AS BIGINT) AS n,
        |    CAST(COUNT(*) AS BIGINT) AS present FROM s GROUP BY grp),
        |x AS (SELECT s.grp,
        |    SUM(CAST(7*s.o - n.n AS HUGEINT) * CAST(7*s.o - n.n AS HUGEINT))
        |      AS psum
        |  FROM s JOIN n ON n.grp = s.grp GROUP BY s.grp),
        |k AS (SELECT (1.0 - 2.0/54.0) + 1.645*sqrt(2.0/54.0) AS cc),
        |c AS (SELECT n.grp, n.n,
        |    CAST(x.psum + CAST(7 - n.present AS HUGEINT)
        |        * CAST(n.n AS HUGEINT) * CAST(n.n AS HUGEINT) AS DOUBLE)
        |      / CAST(7*n.n AS DOUBLE) AS chi2
        |  FROM n JOIN x ON x.grp = n.grp)
        |SELECT grp, n, chi2, 6.0*(cc*cc*cc) AS crit,
        |  chi2 >= 6.0*(cc*cc*cc) AS seasonal
        |FROM c, k ORDER BY grp""".stripMargin,
    // Serial correlation: all three leads from one window pass, exact
    // HUGEINT moments, r and the 2/√m band in the mirrored
    // cast→√·√→÷ op order.
    "aud_autocorr" ->
      """WITH b AS (SELECT event_type AS grp, ts, event_id,
        |    CAST(floor(value) AS BIGINT) AS x
        |  FROM events WHERE value IS NOT NULL),
        |l AS (SELECT grp, x,
        |    LEAD(x, 1) OVER w AS y1, LEAD(x, 2) OVER w AS y2,
        |    LEAD(x, 3) OVER w AS y3
        |  FROM b WINDOW w AS (PARTITION BY grp ORDER BY ts, event_id)),
        |u AS (SELECT grp, CAST(1 AS BIGINT) AS lag, x, y1 AS y FROM l
        |  UNION ALL SELECT grp, 2, x, y2 FROM l
        |  UNION ALL SELECT grp, 3, x, y3 FROM l),
        |a AS (SELECT grp, lag, CAST(COUNT(*) AS HUGEINT) AS m,
        |    CAST(SUM(CAST(x AS HUGEINT)) AS HUGEINT) AS sx,
        |    CAST(SUM(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
        |    CAST(SUM(CAST(x AS HUGEINT)*CAST(x AS HUGEINT)) AS HUGEINT) AS sxx,
        |    CAST(SUM(CAST(y AS HUGEINT)*CAST(y AS HUGEINT)) AS HUGEINT) AS syy,
        |    CAST(SUM(CAST(x AS HUGEINT)*CAST(y AS HUGEINT)) AS HUGEINT) AS sxy
        |  FROM u WHERE y IS NOT NULL GROUP BY grp, lag),
        |d AS (SELECT grp, lag, m,
        |    m*sxy - sx*sy AS num, m*sxx - sx*sx AS d1, m*syy - sy*sy AS d2
        |  FROM a)
        |SELECT grp, lag, CAST(m AS BIGINT) AS n_pairs,
        |  CASE WHEN d1 > 0 AND d2 > 0 THEN CAST(num AS DOUBLE) /
        |    (sqrt(CAST(d1 AS DOUBLE)) * sqrt(CAST(d2 AS DOUBLE))) END AS r,
        |  COALESCE(CASE WHEN d1 > 0 AND d2 > 0 THEN
        |      abs(CAST(num AS DOUBLE) /
        |        (sqrt(CAST(d1 AS DOUBLE)) * sqrt(CAST(d2 AS DOUBLE))))
        |        > 2.0 / sqrt(CAST(m AS DOUBLE)) END, FALSE) AS significant
        |FROM d ORDER BY grp, lag""".stripMargin,
    // Theil–Sen: the pair join and ranking window over the bounded
    // (grp, day) table; slope = one exact-int division per pair, median
    // = values at sorted-rank positions, even case averaged as the
    // identical add + exact halving.
    "aud_theilsen" ->
      """WITH e AS (SELECT event_type AS grp,
        |    epoch_us(ts) // 86400000000 AS day FROM events),
        |d AS (SELECT grp, day, CAST(COUNT(*) AS BIGINT) AS x
        |      FROM e GROUP BY grp, day),
        |n AS (SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_days FROM d GROUP BY grp),
        |p AS (SELECT a.grp,
        |    CAST(b.x - a.x AS DOUBLE) / CAST(b.day - a.day AS DOUBLE) AS slope
        |  FROM d a JOIN d b ON b.grp = a.grp AND b.day > a.day),
        |np AS (SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_pairs FROM p GROUP BY grp),
        |r AS (SELECT grp, slope,
        |    ROW_NUMBER() OVER (PARTITION BY grp ORDER BY slope) AS rn FROM p),
        |m AS (SELECT r.grp, AVG(r.slope) AS slope
        |  FROM r JOIN np ON np.grp = r.grp
        |  WHERE r.rn = (np.n_pairs + 1) // 2 OR r.rn = (np.n_pairs + 2) // 2
        |  GROUP BY r.grp)
        |SELECT n.grp, n.n_days, COALESCE(np.n_pairs, 0) AS n_pairs, m.slope
        |FROM n LEFT JOIN np ON np.grp = n.grp LEFT JOIN m ON m.grp = n.grp
        |ORDER BY n.grp""".stripMargin,
    "aud_completeness" ->
      """WITH e AS (SELECT epoch_us(ts) // 86400000000 AS day,
        |    CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS value,
        |    CASE WHEN event_id % 11 = 0 THEN NULL ELSE props END AS props
        |  FROM events),
        |m AS (
        |  SELECT day, 'value' AS column_name, COUNT(*) AS n_rows,
        |    SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS n_null
        |  FROM e GROUP BY day
        |  UNION ALL
        |  SELECT day, 'props', COUNT(*),
        |    SUM(CASE WHEN props IS NULL THEN 1 ELSE 0 END)
        |  FROM e GROUP BY day),
        |l AS (SELECT day, column_name,
        |    CAST(n_rows AS BIGINT) AS n_rows, CAST(n_null AS BIGINT) AS n_null,
        |    LAG(n_rows) OVER w AS p_rows, LAG(n_null) OVER w AS p_null
        |  FROM m WINDOW w AS (PARTITION BY column_name ORDER BY day))
        |SELECT day, column_name, n_rows, n_null,
        |  CAST(n_null AS DOUBLE) / CAST(n_rows AS DOUBLE) AS null_rate,
        |  CAST(CAST(n_null AS HUGEINT) * p_rows - CAST(p_null AS HUGEINT) * n_rows
        |      AS DOUBLE) /
        |    CAST(CAST(n_rows AS HUGEINT) * p_rows AS DOUBLE) AS rate_delta
        |FROM l ORDER BY column_name, day""".stripMargin,

    // KS mirrored with one global window over distinct values (oracle
    // scale); HUGEINT cross-multiplication, smallest arg-max value
    "aud_ks" ->
      """WITH b AS (SELECT o_totalprice AS s,
        |    CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS a
        |  FROM orders WHERE o_totalprice IS NOT NULL AND o_orderstatus IN ('F','O')),
        |g AS (SELECT s, COUNT(*) AS cnt, SUM(a) AS ca FROM b GROUP BY s),
        |c AS (SELECT s,
        |    CAST(SUM(ca) OVER iw AS HUGEINT) AS cum_a,
        |    CAST(SUM(cnt - ca) OVER iw AS HUGEINT) AS cum_b
        |  FROM g WINDOW iw AS (ORDER BY s
        |                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |t AS (SELECT CAST(SUM(ca) AS HUGEINT) AS n_a,
        |    CAST(SUM(cnt) - SUM(ca) AS HUGEINT) AS n_b FROM g),
        |d AS (SELECT c.s, abs(c.cum_a * t.n_b - c.cum_b * t.n_a) AS d,
        |    t.n_a, t.n_b FROM c, t),
        |m AS (SELECT MAX(d) AS dm FROM d)
        |SELECT CAST(MIN(d.n_a) AS BIGINT) AS n_a, CAST(MIN(d.n_b) AS BIGINT) AS n_b,
        |  CAST(MIN(m.dm) AS BIGINT) AS ks_num,
        |  CAST(MIN(m.dm) AS DOUBLE) / CAST(MIN(d.n_a) * MIN(d.n_b) AS DOUBLE) AS ks,
        |  CAST(MIN(d.s) AS DOUBLE) AS at_value
        |FROM d, m WHERE d.d = m.dm""".stripMargin,

    // exclusive prefix over distinct scores; tp/fp/fn integers; each rate
    // one division; argmax by (f1 DESC, threshold) mirrored
    "aud_threshold" ->
      """WITH b AS (SELECT CAST(floor(value) AS BIGINT) AS s,
        |    CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS y
        |  FROM events WHERE value IS NOT NULL),
        |g AS (SELECT s, COUNT(*) AS cnt, SUM(y) AS pos FROM b GROUP BY s),
        |t AS (SELECT CAST(SUM(cnt) AS HUGEINT) AS n,
        |    CAST(SUM(pos) AS HUGEINT) AS p FROM g),
        |c AS (SELECT s,
        |    COALESCE(CAST(SUM(cnt) OVER ew AS HUGEINT), 0) AS cumc,
        |    COALESCE(CAST(SUM(pos) OVER ew AS HUGEINT), 0) AS cump
        |  FROM g WINDOW ew AS (ORDER BY s
        |                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
        |conf AS (SELECT c.s,
        |    CAST(t.p - c.cump AS BIGINT) AS tp,
        |    CAST(t.n - t.p - (c.cumc - c.cump) AS BIGINT) AS fp,
        |    CAST(c.cump AS BIGINT) AS fn
        |  FROM c, t),
        |f AS (SELECT s, tp, fp, fn,
        |    CASE WHEN 2 * tp + fp + fn > 0 THEN
        |      CAST(2 * tp AS DOUBLE) / CAST(2 * tp + fp + fn AS DOUBLE)
        |    ELSE 0.0 END AS f1
        |  FROM conf)
        |SELECT CAST(s AS DOUBLE) AS threshold, tp, fp, fn,
        |  CASE WHEN tp + fp > 0 THEN
        |    CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE) END AS precision,
        |  CASE WHEN tp + fn > 0 THEN
        |    CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE) END AS recall,
        |  f1
        |FROM f ORDER BY f1 DESC, s LIMIT 1""".stripMargin,

    // gains/lift: descending exclusive prefix -> integer-div bucket of
    // the group's FIRST row from the top; gain = one division of exact
    // integers, lift = one division of two exact HUGEINT products
    "aud_gains" ->
      """WITH b AS (SELECT CAST(floor(value) AS BIGINT) AS s,
        |    CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS y
        |  FROM events WHERE value IS NOT NULL),
        |g AS (SELECT s, COUNT(*) AS cnt, SUM(y) AS pos FROM b GROUP BY s),
        |t AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n,
        |    CAST(SUM(pos) AS BIGINT) AS p FROM g),
        |c AS (SELECT s, cnt, pos,
        |    COALESCE(CAST(SUM(cnt) OVER dw AS BIGINT), 0) AS above
        |  FROM g WINDOW dw AS (ORDER BY s DESC
        |                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
        |d AS (SELECT (c.above * 10) // t.n + 1 AS bucket, c.cnt, c.pos,
        |    t.n, t.p FROM c, t),
        |bk AS (SELECT bucket, CAST(SUM(cnt) AS BIGINT) AS n_bucket,
        |    CAST(SUM(pos) AS BIGINT) AS pos_bucket,
        |    MIN(n) AS n, MIN(p) AS p FROM d GROUP BY bucket),
        |cm AS (SELECT bucket, n_bucket, pos_bucket, n, p,
        |    CAST(SUM(n_bucket) OVER cw AS BIGINT) AS cum_n,
        |    CAST(SUM(pos_bucket) OVER cw AS BIGINT) AS cum_pos
        |  FROM bk WINDOW cw AS (ORDER BY bucket
        |                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT bucket, n_bucket, pos_bucket, cum_n, cum_pos,
        |  CASE WHEN p > 0 THEN
        |    CAST(cum_pos AS DOUBLE) / CAST(p AS DOUBLE) END AS gain,
        |  CASE WHEN p > 0 THEN
        |    CAST(CAST(cum_pos AS HUGEINT) * n AS DOUBLE) /
        |      CAST(CAST(cum_n AS HUGEINT) * p AS DOUBLE) END AS lift
        |FROM cm ORDER BY bucket""".stripMargin,

    // per-source gains: the aud_gains construction with every window
    // partitioned by source (5 buckets — sources are ~1k docs each)
    "aud_gains_by_source" ->
      """WITH b AS (SELECT source AS grp, n_chars AS s,
        |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
        |  FROM documents WHERE n_chars IS NOT NULL AND source IS NOT NULL),
        |g AS (SELECT grp, s, COUNT(*) AS cnt, SUM(y) AS pos
        |  FROM b GROUP BY grp, s),
        |c AS (SELECT grp, s, cnt, pos,
        |    COALESCE(CAST(SUM(cnt) OVER dw AS BIGINT), 0) AS above,
        |    CAST(SUM(cnt) OVER gw AS BIGINT) AS n,
        |    CAST(SUM(pos) OVER gw AS BIGINT) AS p
        |  FROM g WINDOW dw AS (PARTITION BY grp ORDER BY s DESC
        |                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |                gw AS (PARTITION BY grp)),
        |d AS (SELECT grp, (above * 5) // n + 1 AS bucket, cnt, pos, n, p FROM c),
        |bk AS (SELECT grp, bucket, CAST(SUM(cnt) AS BIGINT) AS n_bucket,
        |    CAST(SUM(pos) AS BIGINT) AS pos_bucket,
        |    MIN(n) AS n, MIN(p) AS p FROM d GROUP BY grp, bucket),
        |cm AS (SELECT grp, bucket, n_bucket, pos_bucket, n, p,
        |    CAST(SUM(n_bucket) OVER cw AS BIGINT) AS cum_n,
        |    CAST(SUM(pos_bucket) OVER cw AS BIGINT) AS cum_pos
        |  FROM bk WINDOW cw AS (PARTITION BY grp ORDER BY bucket
        |                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT grp, bucket, n_bucket, pos_bucket, cum_n, cum_pos,
        |  CASE WHEN p > 0 THEN
        |    CAST(cum_pos AS DOUBLE) / CAST(p AS DOUBLE) END AS gain,
        |  CASE WHEN p > 0 THEN
        |    CAST(CAST(cum_pos AS HUGEINT) * n AS DOUBLE) /
        |      CAST(CAST(cum_n AS HUGEINT) * p AS DOUBLE) END AS lift
        |FROM cm ORDER BY grp, bucket""".stripMargin,

    // same construction with every window partitioned by source
    "aud_ks_by_source" ->
      """WITH b AS (SELECT source AS grp, n_chars AS s,
        |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS a
        |  FROM documents WHERE n_chars IS NOT NULL AND source IS NOT NULL),
        |g AS (SELECT grp, s, COUNT(*) AS cnt, SUM(a) AS ca FROM b GROUP BY grp, s),
        |c AS (SELECT grp, s,
        |    CAST(SUM(ca) OVER iw AS HUGEINT) AS cum_a,
        |    CAST(SUM(cnt - ca) OVER iw AS HUGEINT) AS cum_b,
        |    CAST(SUM(ca) OVER gw AS HUGEINT) AS n_a,
        |    CAST(SUM(cnt - ca) OVER gw AS HUGEINT) AS n_b
        |  FROM g WINDOW iw AS (PARTITION BY grp ORDER BY s
        |                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |              gw AS (PARTITION BY grp)),
        |d AS (SELECT grp, s, abs(cum_a * n_b - cum_b * n_a) AS d, n_a, n_b,
        |    MAX(abs(cum_a * n_b - cum_b * n_a)) OVER (PARTITION BY grp) AS dm
        |  FROM c)
        |SELECT grp, CAST(MIN(n_a) AS BIGINT) AS n_a, CAST(MIN(n_b) AS BIGINT) AS n_b,
        |  CAST(MIN(dm) AS BIGINT) AS ks_num,
        |  CASE WHEN MIN(n_a) > 0 AND MIN(n_b) > 0 THEN
        |    CAST(MIN(dm) AS DOUBLE) / CAST(MIN(n_a) * MIN(n_b) AS DOUBLE) END AS ks,
        |  CAST(MIN(s) AS DOUBLE) AS at_value
        |FROM d WHERE d = dm GROUP BY grp ORDER BY grp""".stripMargin,

    // per-group reliability diagram: integer-exact ECE numerator per
    // source; the (n_chars/2000.0)*10 bin map is one double division +
    // one multiply + floor, mirrored op-for-op
    "aud_calibration_by_source" ->
      """WITH b AS (SELECT source AS grp,
        |    GREATEST(LEAST(CAST(floor((n_chars / 2000.0) * 10) AS BIGINT), 9), 0) AS bin,
        |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
        |  FROM documents WHERE n_chars IS NOT NULL AND source IS NOT NULL),
        |g AS (SELECT grp, bin, COUNT(*) AS n, SUM(y) AS n_pos
        |  FROM b GROUP BY grp, bin),
        |t AS (SELECT grp, CAST(SUM(n) AS HUGEINT) AS nn,
        |    CAST(SUM(abs(20 * n_pos - n * (2 * bin + 1))) AS HUGEINT) AS ece_num
        |  FROM g GROUP BY grp)
        |SELECT g.grp, g.bin, CAST(2 * g.bin + 1 AS DOUBLE) / 20.0 AS conf_mid,
        |  CAST(g.n AS BIGINT) AS n, CAST(g.n_pos AS BIGINT) AS n_pos,
        |  CAST(g.n_pos AS DOUBLE) / CAST(g.n AS DOUBLE) AS acc,
        |  CAST(t.ece_num AS DOUBLE) / CAST(20 * t.nn AS DOUBLE) AS ece
        |FROM g JOIN t ON g.grp = t.grp ORDER BY g.grp, g.bin""".stripMargin,

    // per-group argmax-F1: exclusive prefixes and totals all PARTITION BY
    // grp; confusion counts exact integers, each rate one division, the
    // (f1 DESC, s) argmax a ROW_NUMBER filter — mirrored op-for-op
    "aud_threshold_by_source" ->
      """WITH b AS (SELECT source AS grp, n_chars AS s,
        |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
        |  FROM documents WHERE n_chars IS NOT NULL AND source IS NOT NULL),
        |g AS (SELECT grp, s, COUNT(*) AS cnt, SUM(y) AS pos
        |  FROM b GROUP BY grp, s),
        |c AS (SELECT grp, s,
        |    COALESCE(CAST(SUM(cnt) OVER ew AS HUGEINT), 0) AS cumc,
        |    COALESCE(CAST(SUM(pos) OVER ew AS HUGEINT), 0) AS cump,
        |    CAST(SUM(cnt) OVER gw AS HUGEINT) AS n,
        |    CAST(SUM(pos) OVER gw AS HUGEINT) AS p
        |  FROM g WINDOW ew AS (PARTITION BY grp ORDER BY s
        |                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |              gw AS (PARTITION BY grp)),
        |conf AS (SELECT grp, s,
        |    CAST(p - cump AS BIGINT) AS tp,
        |    CAST(n - p - (cumc - cump) AS BIGINT) AS fp,
        |    CAST(cump AS BIGINT) AS fn
        |  FROM c),
        |f AS (SELECT grp, s, tp, fp, fn,
        |    CASE WHEN 2 * tp + fp + fn > 0 THEN
        |      CAST(2 * tp AS DOUBLE) / CAST(2 * tp + fp + fn AS DOUBLE)
        |    ELSE 0.0 END AS f1
        |  FROM conf),
        |r AS (SELECT grp, s, tp, fp, fn, f1,
        |    ROW_NUMBER() OVER (PARTITION BY grp ORDER BY f1 DESC, s) AS rk
        |  FROM f)
        |SELECT grp, CAST(s AS DOUBLE) AS threshold, tp, fp, fn,
        |  CASE WHEN tp + fp > 0 THEN
        |    CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE) END AS precision,
        |  CASE WHEN tp + fn > 0 THEN
        |    CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE) END AS recall,
        |  f1
        |FROM r WHERE rk = 1 ORDER BY grp""".stripMargin,

    // Mann–Whitney: 2×-scaled average ranks over the (grp, value) count
    // table, exact HUGEINT tie/variance factors, z the mirrored
    // ÷→√→halve→÷ chain
    // CUPED: per-user conditional sums, five exact HUGEINT moments,
    // theta/corr² each one division; mean_adj the round-9-pinned chain
    "aud_cuped" ->
      """WITH u AS (SELECT user_id,
        |    MIN('v' || CAST(user_id % 3 AS VARCHAR)) AS variant,
        |    COALESCE(SUM(CASE WHEN epoch_us(ts) < 1705276800000000
        |      THEN CAST(floor(value) AS BIGINT) END), 0) AS pre,
        |    COALESCE(SUM(CASE WHEN epoch_us(ts) >= 1705276800000000
        |      THEN CAST(floor(value) AS BIGINT) END), 0) AS post
        |  FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL
        |  GROUP BY user_id),
        |g AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n,
        |    CAST(SUM(pre) AS HUGEINT) AS sx, CAST(SUM(post) AS HUGEINT) AS sy,
        |    CAST(SUM(CAST(pre AS HUGEINT) * pre) AS HUGEINT) AS sxx,
        |    CAST(SUM(CAST(post AS HUGEINT) * post) AS HUGEINT) AS syy,
        |    CAST(SUM(CAST(pre AS HUGEINT) * post) AS HUGEINT) AS sxy
        |  FROM u),
        |gg AS (SELECT n, sx,
        |    CASE WHEN n * sxx - sx * sx > 0 THEN
        |      CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE)
        |    END AS theta,
        |    CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0 THEN
        |      CAST((n * sxy - sx * sy) * (n * sxy - sx * sy) AS DOUBLE)
        |        / CAST((n * sxx - sx * sx) * (n * syy - sy * sy) AS DOUBLE)
        |    END AS var_reduction,
        |    CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS gmx
        |  FROM g),
        |v AS (SELECT variant, CAST(COUNT(*) AS BIGINT) AS n_users,
        |    CAST(SUM(pre) AS HUGEINT) AS vx, CAST(SUM(post) AS HUGEINT) AS vy
        |  FROM u GROUP BY variant)
        |SELECT v.variant, v.n_users,
        |  CAST(v.vx AS DOUBLE) / CAST(v.n_users AS DOUBLE) AS mean_pre,
        |  CAST(v.vy AS DOUBLE) / CAST(v.n_users AS DOUBLE) AS mean_post,
        |  round(CAST(v.vy AS DOUBLE) / CAST(v.n_users AS DOUBLE)
        |    - gg.theta * (CAST(v.vx AS DOUBLE) / CAST(v.n_users AS DOUBLE) - gg.gmx),
        |    9) AS mean_adj,
        |  gg.theta, gg.var_reduction
        |FROM v, gg ORDER BY v.variant""".stripMargin,

    // Holt: the aud_ewma recursive-CTE fold with a second (trend)
    // accumulator; // TRUNCATES toward zero on negatives (measured:
    // (-1)//4 = 0), exactly Java's / — the op uses plain long division
    // so the negative trend states divide identically
    "aud_holt" ->
      """WITH RECURSIVE b0 AS (SELECT event_type AS grp, ts, event_id,
        |    CAST(floor(value) AS BIGINT) AS x
        |  FROM events WHERE value IS NOT NULL),
        |st AS (SELECT grp, CAST(COUNT(*) AS HUGEINT) AS n,
        |    CAST(SUM(x) AS HUGEINT) AS s FROM b0 GROUP BY grp),
        |r AS (SELECT b0.grp, st.n, CAST(b0.x AS HUGEINT) AS x,
        |    ROW_NUMBER() OVER (PARTITION BY b0.grp ORDER BY b0.ts, b0.event_id) AS rn
        |  FROM b0 JOIN st ON st.grp = b0.grp),
        |f(grp, rn, l, b, ae) AS (
        |  SELECT grp, CAST(0 AS BIGINT), s // n, CAST(0 AS HUGEINT),
        |    CAST(0 AS HUGEINT) FROM st
        |  UNION ALL
        |  SELECT r.grp, r.rn,
        |    (r.x + 3 * (f.l + f.b)) // 4,
        |    (((r.x + 3 * (f.l + f.b)) // 4) - f.l + 3 * f.b) // 4,
        |    f.ae + abs(r.x - (f.l + f.b))
        |  FROM f JOIN r ON r.grp = f.grp AND r.rn = f.rn + 1)
        |SELECT f.grp, CAST(MAX(st.n) AS BIGINT) AS n,
        |  CAST(arg_max(f.l, f.rn) AS DOUBLE) AS final_level,
        |  CAST(arg_max(f.b, f.rn) AS DOUBLE) AS final_trend,
        |  CAST(arg_max(f.l + f.b, f.rn) AS DOUBLE) AS forecast_next,
        |  CAST(MAX(f.ae) AS DOUBLE) / CAST(MAX(st.n) AS DOUBLE)
        |    AS mean_abs_one_step_err
        |FROM f JOIN st ON st.grp = f.grp
        |WHERE f.rn > 0
        |GROUP BY f.grp ORDER BY f.grp""".stripMargin,

    // JSD: every ratio cross-multiplied into exact-integer ln arguments,
    // round(ln,7) decimals (the psi idiom), two divisions + one add;
    // absent categories ride the general o0=0 term
    "aud_jsd_source" ->
      """WITH o AS (SELECT source AS grp, lang AS cat, CAST(COUNT(*) AS BIGINT) AS o
        |  FROM documents WHERE source IS NOT NULL AND lang IS NOT NULL
        |  GROUP BY 1, 2),
        |ns AS (SELECT grp, CAST(SUM(o) AS BIGINT) AS ns FROM o GROUP BY grp),
        |g AS (SELECT cat, CAST(SUM(o) AS BIGINT) AS g FROM o GROUP BY cat),
        |t AS (SELECT CAST(SUM(g) AS BIGINT) AS nn FROM g),
        |grid AS (SELECT ns.grp, ns.ns, g.cat, g.g, t.nn, COALESCE(o.o, 0) AS o0
        |  FROM ns CROSS JOIN g CROSS JOIN t
        |  LEFT JOIN o ON o.grp = ns.grp AND o.cat = g.cat),
        |tm AS (SELECT grp, ns, nn,
        |    CASE WHEN o0 > 0 THEN o0 *
        |      (CAST(round(ln(CAST(o0 * nn * 2 AS DOUBLE)), 7) AS DECIMAL(12,7))
        |       - CAST(round(ln(CAST(o0 * nn + g * ns AS DOUBLE)), 7) AS DECIMAL(12,7)))
        |      ELSE 0 END AS tp,
        |    g * (CAST(round(ln(CAST(g * ns * 2 AS DOUBLE)), 7) AS DECIMAL(12,7))
        |       - CAST(round(ln(CAST(o0 * nn + g * ns AS DOUBLE)), 7) AS DECIMAL(12,7)))
        |      AS tq
        |  FROM grid),
        |a AS (SELECT grp, MIN(ns) AS n, MIN(nn) AS nn, SUM(tp) AS sp, SUM(tq) AS sq
        |  FROM tm GROUP BY grp)
        |SELECT grp, n,
        |  CAST(sp AS DOUBLE) / CAST(2 * n AS DOUBLE)
        |    + CAST(sq AS DOUBLE) / CAST(2 * nn AS DOUBLE) AS jsd,
        |  (CAST(sp AS DOUBLE) / CAST(2 * n AS DOUBLE)
        |    + CAST(sq AS DOUBLE) / CAST(2 * nn AS DOUBLE)) / 0.6931471805599453
        |    AS jsd_norm
        |FROM a ORDER BY grp""".stripMargin,

    // Welch t: per-arm exact moments; each var/n ONE exact-integer
    // division, se2 one add, t the mirrored subtract->sqrt->divide chain
    "aud_welch" ->
      """WITH b AS (SELECT event_type AS grp,
        |    CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS arm,
        |    CAST(floor(value) AS BIGINT) AS x
        |  FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL),
        |g AS (SELECT grp, arm, COUNT(*) AS n,
        |    CAST(SUM(CAST(x AS HUGEINT)) AS HUGEINT) AS s,
        |    CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS q
        |  FROM b GROUP BY grp, arm),
        |j AS (SELECT a.grp, a.n AS n_a, a.s AS s_a, a.q AS q_a,
        |    bb.n AS n_b, bb.s AS s_b, bb.q AS q_b
        |  FROM g a JOIN g bb ON a.grp = bb.grp AND a.arm = 1 AND bb.arm = 0),
        |c AS (SELECT grp, n_a, n_b,
        |    CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS mean_a,
        |    CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS mean_b,
        |    CAST(n_a * q_a - s_a * s_a AS DOUBLE)
        |        / CAST(n_a * n_a * (n_a - 1) AS DOUBLE)
        |      + CAST(n_b * q_b - s_b * s_b AS DOUBLE)
        |        / CAST(n_b * n_b * (n_b - 1) AS DOUBLE) AS se2
        |  FROM j)
        |SELECT grp, CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
        |  mean_a, mean_b, mean_a - mean_b AS diff,
        |  CASE WHEN n_a >= 2 AND n_b >= 2 AND se2 > 0 THEN sqrt(se2) END AS se,
        |  CASE WHEN n_a >= 2 AND n_b >= 2 AND se2 > 0
        |    THEN (mean_a - mean_b) / sqrt(se2) END AS t,
        |  COALESCE(CASE WHEN n_a >= 2 AND n_b >= 2 AND se2 > 0
        |    THEN abs((mean_a - mean_b) / sqrt(se2)) >= 1.96 END, FALSE) AS significant
        |FROM c ORDER BY grp""".stripMargin,

    // W1: the ks cross-multiplication x the exact integer value gap,
    // one DECIMAL-exact sum, one final division by n_a*n_b
    "aud_wasserstein" ->
      """WITH b AS (SELECT event_type AS grp, CAST(floor(value) AS BIGINT) AS s,
        |    CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS a
        |  FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL),
        |g AS (SELECT grp, s, COUNT(*) AS cnt, SUM(a) AS ca FROM b GROUP BY grp, s),
        |c AS (SELECT grp, s,
        |    CAST(SUM(ca) OVER iw AS HUGEINT) AS cum_a,
        |    CAST(SUM(cnt - ca) OVER iw AS HUGEINT) AS cum_b,
        |    CAST(SUM(ca) OVER gw AS HUGEINT) AS n_a,
        |    CAST(SUM(cnt - ca) OVER gw AS HUGEINT) AS n_b,
        |    LEAD(s) OVER (PARTITION BY grp ORDER BY s) - s AS gap
        |  FROM g WINDOW iw AS (PARTITION BY grp ORDER BY s
        |                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |              gw AS (PARTITION BY grp))
        |SELECT grp, CAST(MIN(n_a) AS BIGINT) AS n_a, CAST(MIN(n_b) AS BIGINT) AS n_b,
        |  CASE WHEN MIN(n_a) > 0 AND MIN(n_b) > 0 THEN
        |    CAST(COALESCE(SUM(CASE WHEN gap IS NOT NULL
        |        THEN abs(cum_a * n_b - cum_b * n_a) * gap END), 0) AS DOUBLE)
        |      / CAST(MIN(n_a) * MIN(n_b) AS DOUBLE) END AS w1
        |FROM c GROUP BY grp ORDER BY grp""".stripMargin,

    // Brown-Forsythe: exact lower medians from the distinct-value
    // cumulative, then the aud_anova quantized floor-division F on |z|
    "aud_levene" ->
      """WITH b AS (SELECT event_type AS grp, CAST(floor(value) AS BIGINT) AS x
        |  FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL),
        |vc AS (SELECT grp, x, COUNT(*) AS cnt FROM b GROUP BY grp, x),
        |m AS (SELECT grp, MIN(x) AS med FROM (
        |    SELECT grp, x, SUM(cnt) OVER (PARTITION BY grp ORDER BY x
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |      SUM(cnt) OVER (PARTITION BY grp) AS n
        |    FROM vc) q WHERE cum * 2 >= n GROUP BY grp),
        |z AS (SELECT b.grp, abs(b.x - m.med) AS z FROM b JOIN m ON m.grp = b.grp),
        |g AS (SELECT grp, COUNT(*) AS ng,
        |    CAST(SUM(CAST(z AS HUGEINT)) AS HUGEINT) AS sg,
        |    CAST(SUM(CAST(z AS HUGEINT) * z) AS HUGEINT) AS qg
        |  FROM z GROUP BY grp),
        |a AS (SELECT CAST(COUNT(*) AS BIGINT) AS k, CAST(SUM(ng) AS BIGINT) AS n,
        |    CAST(SUM(sg) AS HUGEINT) AS s, CAST(SUM(qg) AS HUGEINT) AS qq,
        |    CAST(SUM((sg * sg * 1000000) // CAST(ng AS HUGEINT)) AS HUGEINT) AS tsum,
        |    MAX(CAST(sg AS DOUBLE) / CAST(ng AS DOUBLE)) AS mx,
        |    MIN(CAST(sg AS DOUBLE) / CAST(ng AS DOUBLE)) AS mn
        |  FROM g),
        |x AS (SELECT k, n,
        |    GREATEST(tsum - (s * s * 1000000) // CAST(n AS HUGEINT), 0) AS ssb,
        |    GREATEST(qq * 1000000 - tsum, 0) AS ssw, mx, mn FROM a)
        |SELECT k, n,
        |  CASE WHEN k >= 2 AND n > k AND ssw > 0 THEN
        |    CAST(ssb * (n - k) AS DOUBLE) / CAST(ssw * (k - 1) AS DOUBLE) END AS f_stat,
        |  mx AS max_mean_absdev, mn AS min_mean_absdev
        |FROM x""".stripMargin,

    "aud_mannwhitney" ->
      """WITH b AS (SELECT event_type AS grp, CAST(floor(value) AS BIGINT) AS x,
        |    (user_id % 2 = 0) AS a
        |  FROM events WHERE value IS NOT NULL AND user_id IS NOT NULL),
        |v AS (SELECT grp, x, CAST(COUNT(*) AS HUGEINT) AS c,
        |    CAST(SUM(CASE WHEN a THEN 1 ELSE 0 END) AS HUGEINT) AS ca
        |  FROM b GROUP BY grp, x),
        |r AS (SELECT grp, x, c, ca,
        |    COALESCE(SUM(c) OVER (PARTITION BY grp ORDER BY x
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_prev
        |  FROM v),
        |ag AS (SELECT grp, CAST(SUM(ca) AS HUGEINT) AS n1,
        |    CAST(SUM(c) AS HUGEINT) AS n,
        |    CAST(SUM(ca * (2*cum_prev + c + 1)) AS HUGEINT) AS r1x2,
        |    CAST(SUM(c*c*c - c) AS HUGEINT) AS t3t
        |  FROM r GROUP BY grp),
        |d AS (SELECT grp, n1, n - n1 AS n2,
        |    r1x2 - n1*(n1+1) AS u1x2,
        |    r1x2 - n1*(n1+1) - n1*(n - n1) AS num2,
        |    n1*(n - n1)*((n+1)*n*(n-1) - t3t) AS vn,
        |    CAST(12 AS HUGEINT)*n*(n-1) AS vd
        |  FROM ag),
        |e AS (SELECT grp, n1, n2, u1x2, vn, vd,
        |    CASE WHEN num2 > 0 THEN num2 - 1
        |      WHEN num2 < 0 THEN num2 + 1 ELSE 0 END AS num2c
        |  FROM d)
        |SELECT grp, CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
        |  CAST(u1x2 AS DOUBLE) / 2.0 AS u1,
        |  CASE WHEN vn > 0 THEN (CAST(num2c AS DOUBLE) / 2.0) /
        |    sqrt(CAST(vn AS DOUBLE) / CAST(vd AS DOUBLE)) END AS z,
        |  COALESCE(CASE WHEN vn > 0 THEN
        |      abs((CAST(num2c AS DOUBLE) / 2.0) /
        |        sqrt(CAST(vn AS DOUBLE) / CAST(vd AS DOUBLE))) >= 1.96
        |    END, FALSE) AS significant
        |FROM e ORDER BY grp""".stripMargin,
    // the same integer Poisson thresholds (AuditOps.PoissonT60 interpolated
    // verbatim — single source of truth), HUGEINT replicate sums, one
    // double division per replicate mean, order-independent min/max
    "aud_bootstrap" -> {
      val h = graft.functions.CrossHash.sqlMdint(
        "'boot:' || CAST(b AS VARCHAR) || ':' || CAST(id AS VARCHAR)")
      val cases = AuditOps.PoissonT60.zipWithIndex
        .map { case (t, k) => s"WHEN h < $t THEN $k" }.mkString(" ")
      s"""WITH base AS (SELECT event_type AS grp, event_id AS id,
         |    CAST(floor(value) AS BIGINT) AS x
         |  FROM events WHERE value IS NOT NULL AND event_id IS NOT NULL),
         |reps AS (SELECT grp, id, x, gs.b
         |  FROM base, generate_series(0, 19) AS gs(b)),
         |wt AS (SELECT grp, b, x, CASE $cases ELSE 8 END AS w
         |  FROM (SELECT grp, b, x, $h AS h FROM reps)),
         |rep AS (SELECT grp, b, CAST(SUM(w) AS BIGINT) AS ne,
         |    CAST(SUM(CAST(w AS HUGEINT) * x) AS HUGEINT) AS wx
         |  FROM wt GROUP BY grp, b),
         |m AS (SELECT grp, CAST(wx AS DOUBLE) / CAST(ne AS DOUBLE) AS mean_b
         |  FROM rep WHERE ne > 0),
         |ci AS (SELECT grp, COUNT(*) AS n_replicates, MIN(mean_b) AS ci_lo,
         |    MAX(mean_b) AS ci_hi FROM m GROUP BY grp),
         |f AS (SELECT grp, COUNT(*) AS n,
         |    CAST(SUM(CAST(x AS HUGEINT)) AS HUGEINT) AS sx
         |  FROM base GROUP BY grp)
         |SELECT f.grp, f.n, CAST(f.sx AS DOUBLE) / CAST(f.n AS DOUBLE) AS mean,
         |  ci.n_replicates, ci.ci_lo, ci.ci_hi
         |FROM f LEFT JOIN ci USING (grp) ORDER BY grp""".stripMargin
    },

    // exact quantized-floor-division chi-square over the contingency
    // table (HUGEINT // is trunc = floor for positives, identical to
    // Spark's decimal div), round(cc,12) before cubing, V as ÷ then √
    "aud_chisq_indep" ->
      """WITH o AS (SELECT CAST(lang AS VARCHAR) AS a,
        |    CAST(source AS VARCHAR) AS b, CAST(COUNT(*) AS BIGINT) AS o
        |  FROM documents WHERE lang IS NOT NULL AND source IS NOT NULL
        |  GROUP BY a, b),
        |r AS (SELECT a, CAST(SUM(o) AS BIGINT) AS ra FROM o GROUP BY a),
        |c AS (SELECT b, CAST(SUM(o) AS BIGINT) AS cb FROM o GROUP BY b),
        |n AS (SELECT CAST(SUM(o) AS BIGINT) AS n,
        |    CAST(COUNT(DISTINCT a) AS BIGINT) AS r,
        |    CAST(COUNT(DISTINCT b) AS BIGINT) AS c FROM o),
        |t AS (SELECT CAST(SUM((CAST(o.o AS HUGEINT)*o.o*n.n*1000000000)
        |      // (CAST(r.ra AS HUGEINT)*c.cb)) AS HUGEINT) AS tq
        |  FROM o JOIN r USING (a) JOIN c USING (b) CROSS JOIN n),
        |x AS (SELECT n.n, n.r, n.c, (n.r-1)*(n.c-1) AS dof,
        |    CAST(CAST(n.n AS HUGEINT)*t.tq
        |        - CAST(n.n AS HUGEINT)*n.n*1000000000 AS DOUBLE)
        |      / (1000000000.0 * CAST(n.n AS DOUBLE)) AS chi2
        |  FROM n CROSS JOIN t),
        |k AS (SELECT *, round((1.0 - 2.0/(9.0*dof))
        |    + 1.645*sqrt(2.0/(9.0*dof)), 12) AS cc FROM x)
        |SELECT n, r AS n_rows, c AS n_cols, CAST(dof AS BIGINT) AS dof,
        |  chi2, CASE WHEN dof > 0 THEN dof*(cc*cc*cc) END AS crit,
        |  CASE WHEN dof > 0
        |    THEN sqrt(chi2/CAST(n*(least(r,c)-1) AS DOUBLE)) END AS cramers_v,
        |  COALESCE(dof > 0 AND chi2 >= dof*(cc*cc*cc), FALSE) AS dependent
        |FROM k""".stripMargin,

    // two-proportion z mirrored as the same split fractions over HUGEINT
    // integers: div, div, mul, sqrt — each a single correctly-rounded op
    // on engine-identical inputs
    // SRM: quantized floor-division goodness-of-fit terms, one double
    // division, round(cc,12)-pinned strict critical value
    "aud_srm" ->
      """WITH g AS (SELECT 'v' || CAST(user_id % 3 AS VARCHAR) AS variant,
        |    CAST(COUNT(*) AS BIGINT) AS o
        |  FROM events WHERE user_id IS NOT NULL GROUP BY 1),
        |w AS (SELECT variant, o, CASE variant WHEN 'v0' THEN 1
        |    WHEN 'v1' THEN 1 WHEN 'v2' THEN 1 END AS w FROM g),
        |t AS (SELECT CAST(SUM(o) AS BIGINT) AS n,
        |    CAST(COUNT(*) AS BIGINT) AS nv FROM g),
        |s AS (SELECT CAST(SUM(
        |    ((3*CAST(o AS HUGEINT) - CAST(t.n AS HUGEINT)*w)
        |     * (3*CAST(o AS HUGEINT) - CAST(t.n AS HUGEINT)*w)
        |     * 1000000000)
        |    // (CAST(3 AS HUGEINT) * t.n * w)) AS HUGEINT) AS tq
        |  FROM w, t),
        |x AS (SELECT t.n, t.nv, t.nv - 1 AS dof,
        |    CAST(s.tq AS DOUBLE) / 1000000000.0 AS chi2 FROM t, s),
        |k AS (SELECT *, round((1.0 - 2.0/(9.0*dof))
        |    + 3.090*sqrt(2.0/(9.0*dof)), 12) AS cc FROM x)
        |SELECT n, nv AS n_variants, CAST(dof AS BIGINT) AS dof, chi2,
        |  CASE WHEN dof > 0 THEN dof*(cc*cc*cc) END AS crit,
        |  COALESCE(dof > 0 AND chi2 >= dof*(cc*cc*cc), FALSE) AS mismatch
        |FROM k""".stripMargin,

    // MDE: the TOST se² chain, one multiply by the 4-dp power constant,
    // rate₀ and the relative form single divisions
    "aud_mde" ->
      """WITH g AS (SELECT 'v' || CAST(user_id % 3 AS VARCHAR) AS variant,
        |    COUNT(*) AS n,
        |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS conv
        |  FROM events WHERE user_id IS NOT NULL GROUP BY 1),
        |ctl AS (SELECT n AS n0, conv AS c0 FROM g WHERE variant = 'v0'),
        |j AS (SELECT g.variant, g.n, g.conv, ctl.n0, ctl.c0,
        |    CAST(g.conv AS HUGEINT) * (g.n - g.conv) AS sa,
        |    CAST(g.n AS HUGEINT) * g.n * g.n AS na3,
        |    CAST(ctl.c0 AS HUGEINT) * (ctl.n0 - ctl.c0) AS sb,
        |    CAST(ctl.n0 AS HUGEINT) * ctl.n0 * ctl.n0 AS nb3
        |  FROM g, ctl),
        |k AS (SELECT variant, n, conv, n0, c0,
        |    CAST(sa AS DOUBLE) / CAST(na3 AS DOUBLE)
        |      + CAST(sb AS DOUBLE) / CAST(nb3 AS DOUBLE) AS se2
        |  FROM j)
        |SELECT variant, CAST(n AS BIGINT) AS n, conv,
        |  CAST(conv AS DOUBLE) / CAST(n AS DOUBLE) AS rate,
        |  CASE WHEN variant <> 'v0' AND se2 > 0 THEN sqrt(se2) END AS se,
        |  CASE WHEN variant <> 'v0' AND se2 > 0
        |    THEN 2.8016 * sqrt(se2) END AS mde_abs,
        |  CASE WHEN variant <> 'v0' AND se2 > 0
        |      AND CAST(c0 AS DOUBLE) / CAST(n0 AS DOUBLE) > 0
        |    THEN (2.8016 * sqrt(se2))
        |      / (CAST(c0 AS DOUBLE) / CAST(n0 AS DOUBLE)) END AS mde_rel
        |FROM k ORDER BY variant""".stripMargin,

    // TOST: diff one division, se² two divisions + one fixed-order add
    // (variant term then control term), each z one add/sub + one divide
    "aud_tost" ->
      """WITH g AS (SELECT 'v' || CAST(user_id % 3 AS VARCHAR) AS variant,
        |    COUNT(*) AS n,
        |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS conv
        |  FROM events WHERE user_id IS NOT NULL GROUP BY 1),
        |ctl AS (SELECT n AS n0, conv AS c0 FROM g WHERE variant = 'v0'),
        |j AS (SELECT g.variant, g.n, g.conv,
        |    CAST(g.conv AS HUGEINT) * ctl.n0
        |      - CAST(ctl.c0 AS HUGEINT) * g.n AS num,
        |    CAST(g.n AS HUGEINT) * ctl.n0 AS d1,
        |    CAST(g.conv AS HUGEINT) * (g.n - g.conv) AS sa,
        |    CAST(g.n AS HUGEINT) * g.n * g.n AS na3,
        |    CAST(ctl.c0 AS HUGEINT) * (ctl.n0 - ctl.c0) AS sb,
        |    CAST(ctl.n0 AS HUGEINT) * ctl.n0 * ctl.n0 AS nb3
        |  FROM g, ctl),
        |k AS (SELECT variant, n, conv,
        |    CAST(num AS DOUBLE) / CAST(d1 AS DOUBLE) AS diff,
        |    CAST(sa AS DOUBLE) / CAST(na3 AS DOUBLE)
        |      + CAST(sb AS DOUBLE) / CAST(nb3 AS DOUBLE) AS se2
        |  FROM j)
        |SELECT variant, CAST(n AS BIGINT) AS n, conv,
        |  CAST(conv AS DOUBLE) / CAST(n AS DOUBLE) AS rate,
        |  CASE WHEN variant <> 'v0' THEN diff END AS diff,
        |  CASE WHEN variant <> 'v0' AND se2 > 0 THEN sqrt(se2) END AS se,
        |  CASE WHEN variant <> 'v0' AND se2 > 0
        |    THEN (diff + 0.02) / sqrt(se2) END AS z_lower,
        |  CASE WHEN variant <> 'v0' AND se2 > 0
        |    THEN (0.02 - diff) / sqrt(se2) END AS z_upper,
        |  COALESCE(CASE WHEN variant <> 'v0' AND se2 > 0 THEN
        |      (diff + 0.02) / sqrt(se2) >= 1.645
        |      AND (0.02 - diff) / sqrt(se2) >= 1.645 END, FALSE)
        |    AS equivalent
        |FROM k ORDER BY variant""".stripMargin,

    "aud_abtest" ->
      """WITH g AS (SELECT 'v' || CAST(user_id % 3 AS VARCHAR) AS variant,
        |    COUNT(*) AS n,
        |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS conv
        |  FROM events WHERE user_id IS NOT NULL GROUP BY 1),
        |ctl AS (SELECT n AS n0, conv AS c0 FROM g WHERE variant = 'v0'),
        |j AS (SELECT g.variant, g.n, g.conv,
        |    CAST(g.conv AS HUGEINT) * ctl.n0
        |      - CAST(ctl.c0 AS HUGEINT) * g.n AS num,
        |    CAST(g.n + ctl.n0 AS HUGEINT) AS bign,
        |    CAST(g.conv + ctl.c0 AS HUGEINT) AS bigc,
        |    CAST(g.n AS HUGEINT) * ctl.n0 AS d1
        |  FROM g, ctl)
        |SELECT variant, CAST(n AS BIGINT) AS n, conv,
        |  CAST(conv AS DOUBLE) / CAST(n AS DOUBLE) AS rate,
        |  CASE WHEN variant <> 'v0' THEN
        |    CAST(num AS DOUBLE) / CAST(d1 AS DOUBLE) END AS lift,
        |  CASE WHEN variant <> 'v0' AND bigc > 0 AND bign > bigc AND d1 > 0 THEN
        |    (CAST(num * num AS DOUBLE) / CAST(d1 AS DOUBLE))
        |      * (CAST(bign AS DOUBLE) / CAST(bigc * (bign - bigc) AS DOUBLE))
        |  END AS z2,
        |  CASE WHEN variant <> 'v0' AND bigc > 0 AND bign > bigc AND d1 > 0 THEN
        |    sqrt((CAST(num * num AS DOUBLE) / CAST(d1 AS DOUBLE))
        |      * (CAST(bign AS DOUBLE) / CAST(bigc * (bign - bigc) AS DOUBLE)))
        |  END AS z
        |FROM j ORDER BY variant""".stripMargin,

    // PSI mirrored exactly: ln(integer) rounded once into DECIMAL(12,7)
    // per side, the (o·Nn − n·No) numerator in DECIMAL(20,0) so num·ΔL
    // is exact DECIMAL in both engines, one division per emitted value
    "aud_psi" ->
      """WITH o AS (SELECT source AS cat, COUNT(*) AS o_cnt FROM documents
        |  WHERE source IS NOT NULL GROUP BY source),
        |nw AS (SELECT source AS cat, COUNT(*) AS n_cnt FROM documents
        |  WHERE source IS NOT NULL AND doc_id % 3 <> 0 GROUP BY source),
        |j AS (SELECT COALESCE(o.cat, nw.cat) AS cat,
        |    CAST(COALESCE(o.o_cnt, 0) AS HUGEINT) AS o_cnt,
        |    CAST(COALESCE(nw.n_cnt, 0) AS HUGEINT) AS n_cnt
        |  FROM o FULL OUTER JOIN nw ON o.cat = nw.cat),
        |t AS (SELECT CAST(SUM(o_cnt) AS HUGEINT) AS no,
        |    CAST(SUM(n_cnt) AS HUGEINT) AS nn FROM j),
        |w AS (SELECT j.cat, j.o_cnt, j.n_cnt, t.no, t.nn,
        |    CAST(j.o_cnt * t.nn - j.n_cnt * t.no AS DECIMAL(20, 0)) AS num,
        |    CASE WHEN j.o_cnt > 0 AND j.n_cnt > 0 THEN
        |      CAST(round(ln(CAST(j.o_cnt * t.nn AS DOUBLE)), 7) AS DECIMAL(12, 7))
        |      - CAST(round(ln(CAST(j.n_cnt * t.no AS DOUBLE)), 7) AS DECIMAL(12, 7))
        |    END AS dl
        |  FROM j, t),
        |w2 AS (SELECT *, num * dl AS tnum FROM w),
        |tt AS (SELECT SUM(tnum) AS psi_num FROM w2)
        |SELECT w2.cat, CAST(w2.o_cnt AS BIGINT) AS o_cnt,
        |  CAST(w2.n_cnt AS BIGINT) AS n_cnt,
        |  CAST(w2.o_cnt AS DOUBLE) / CAST(w2.no AS DOUBLE) AS o_rate,
        |  CAST(w2.n_cnt AS DOUBLE) / CAST(w2.nn AS DOUBLE) AS n_rate,
        |  CAST(w2.tnum AS DOUBLE) / CAST(w2.no * w2.nn AS DOUBLE) AS psi_term,
        |  CAST(tt.psi_num AS DOUBLE) / CAST(w2.no * w2.nn AS DOUBLE) AS psi
        |FROM w2, tt ORDER BY cat""".stripMargin,

    // DP release mirrored draw-for-draw: quantized counter uniforms at
    // (seed, 0, mdint(cat), draw), geometric inverse-CDF on
    // round(ln(integer), 7) decimals, exact decimal multiply by invEps
    "aud_dp_counts" -> {
      def geo(draw: Int): String = {
        val u = graft.core.DeterministicRng.uniformSql(
          "1234567", "0", graft.functions.CrossHash.sqlMdint("CAST(cat AS VARCHAR)"),
          draw.toString)
        s"""CAST(floor(2 * (CAST(round(ln(1073741824.0), 7) AS DECIMAL(12, 7))
           |  - CAST(round(ln(CAST(CAST(floor(($u) * 1073741824.0) + 1 AS BIGINT)
           |      AS DOUBLE)), 7) AS DECIMAL(12, 7)))) AS BIGINT)""".stripMargin
      }
      s"""WITH g AS (SELECT source AS cat, COUNT(*) AS cnt FROM documents
         |  WHERE source IS NOT NULL GROUP BY source)
         |SELECT cat, cnt + (${geo(0)}) - (${geo(1)}) AS noisy_count,
         |  CAST(0.5 AS DOUBLE) AS epsilon
         |FROM g ORDER BY cat""".stripMargin
    },

    // quasi-group sizes + per-group distinct sensitive values; every
    // statistic exact integer, one division
    "aud_kanon" ->
      """WITH g AS (SELECT lang, n_chars // 200 AS len_band,
        |    COUNT(*) AS cnt, COUNT(DISTINCT source) AS lv
        |  FROM documents GROUP BY lang, n_chars // 200)
        |SELECT CAST(SUM(cnt) AS BIGINT) AS n_rows,
        |  COUNT(*) AS n_groups,
        |  CAST(MIN(cnt) AS BIGINT) AS min_group_size,
        |  CAST(SUM(CASE WHEN cnt < 5 THEN cnt ELSE 0 END) AS BIGINT)
        |    AS rows_below_k,
        |  CASE WHEN SUM(cnt) > 0 THEN
        |    CAST(SUM(CASE WHEN cnt < 5 THEN cnt ELSE 0 END) AS DOUBLE) /
        |      CAST(SUM(cnt) AS DOUBLE) END AS frac_below_k,
        |  CAST(MIN(lv) AS BIGINT) AS min_l,
        |  MIN(cnt) >= 5 AS k_anonymous,
        |  MIN(lv) >= 3 AS l_diverse
        |FROM g""".stripMargin,

    // the aud_psi construction keyed by (source, lang); CASE guards
    // mirror the op's degenerate-side NULLs
    "aud_psi_by_source" ->
      """WITH o AS (SELECT source AS grp, lang AS cat, COUNT(*) AS o_cnt
        |  FROM documents WHERE source IS NOT NULL AND lang IS NOT NULL
        |  GROUP BY source, lang),
        |nw AS (SELECT source AS grp, lang AS cat, COUNT(*) AS n_cnt
        |  FROM documents WHERE source IS NOT NULL AND lang IS NOT NULL
        |    AND doc_id % 3 <> 0 GROUP BY source, lang),
        |j AS (SELECT COALESCE(o.grp, nw.grp) AS grp,
        |    COALESCE(o.cat, nw.cat) AS cat,
        |    CAST(COALESCE(o.o_cnt, 0) AS HUGEINT) AS o_cnt,
        |    CAST(COALESCE(nw.n_cnt, 0) AS HUGEINT) AS n_cnt
        |  FROM o FULL OUTER JOIN nw ON o.grp = nw.grp AND o.cat = nw.cat),
        |t AS (SELECT grp, CAST(SUM(o_cnt) AS HUGEINT) AS no,
        |    CAST(SUM(n_cnt) AS HUGEINT) AS nn FROM j GROUP BY grp),
        |w AS (SELECT j.grp, j.cat, j.o_cnt, j.n_cnt, t.no, t.nn,
        |    CAST(j.o_cnt * t.nn - j.n_cnt * t.no AS DECIMAL(20, 0)) AS num,
        |    CASE WHEN j.o_cnt > 0 AND j.n_cnt > 0 THEN
        |      CAST(round(ln(CAST(j.o_cnt * t.nn AS DOUBLE)), 7) AS DECIMAL(12, 7))
        |      - CAST(round(ln(CAST(j.n_cnt * t.no AS DOUBLE)), 7) AS DECIMAL(12, 7))
        |    END AS dl
        |  FROM j JOIN t ON t.grp = j.grp),
        |w2 AS (SELECT *, num * dl AS tnum FROM w),
        |tt AS (SELECT grp, SUM(tnum) AS psi_num FROM w2 GROUP BY grp)
        |SELECT w2.grp, w2.cat, CAST(w2.o_cnt AS BIGINT) AS o_cnt,
        |  CAST(w2.n_cnt AS BIGINT) AS n_cnt,
        |  CASE WHEN w2.no > 0 THEN
        |    CAST(w2.o_cnt AS DOUBLE) / CAST(w2.no AS DOUBLE) END AS o_rate,
        |  CASE WHEN w2.nn > 0 THEN
        |    CAST(w2.n_cnt AS DOUBLE) / CAST(w2.nn AS DOUBLE) END AS n_rate,
        |  CASE WHEN w2.no > 0 AND w2.nn > 0 THEN
        |    CAST(w2.tnum AS DOUBLE) / CAST(w2.no * w2.nn AS DOUBLE)
        |  END AS psi_term,
        |  CASE WHEN w2.no > 0 AND w2.nn > 0 THEN
        |    CAST(tt.psi_num AS DOUBLE) / CAST(w2.no * w2.nn AS DOUBLE)
        |  END AS psi
        |FROM w2 JOIN tt ON tt.grp = w2.grp ORDER BY w2.grp, w2.cat""".stripMargin,

    // exact integer all-pairs |Δcount| numerator over the bounded count
    // table; one division by 2·K·N
    "aud_gini" ->
      """WITH g AS (SELECT source AS cat, CAST(COUNT(*) AS HUGEINT) AS cnt
        |  FROM documents WHERE source IS NOT NULL GROUP BY source),
        |n AS (SELECT CAST(SUM(abs(a.cnt - b.cnt)) AS HUGEINT) AS num
        |  FROM g a, g b),
        |t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_categories,
        |    CAST(SUM(cnt) AS HUGEINT) AS n_rows FROM g)
        |SELECT t.n_categories, CAST(t.n_rows AS BIGINT) AS n_rows,
        |  CASE WHEN t.n_categories > 0 AND t.n_rows > 0 THEN
        |    CAST(n.num AS DOUBLE)
        |      / CAST(2 * t.n_categories * t.n_rows AS DOUBLE) END AS gini
        |FROM n, t""".stripMargin,

    // digit from the integer's decimal string; the nine Benford ppb
    // constants are literals on both sides; deviations cross-multiplied
    // in HUGEINT
    "aud_benford" ->
      """WITH x AS (SELECT CAST(substr(CAST(CAST(floor(abs(o_totalprice)) AS BIGINT)
        |      AS VARCHAR), 1, 1) AS BIGINT) AS digit
        |  FROM orders
        |  WHERE o_totalprice IS NOT NULL AND floor(abs(o_totalprice)) > 0),
        |g AS (SELECT digit, COUNT(*) AS cnt FROM x GROUP BY digit),
        |e AS (SELECT unnest([1,2,3,4,5,6,7,8,9]) AS digit,
        |    unnest([301029996, 176091259, 124938737, 96910013, 79181246,
        |            66946790, 57991947, 51152522, 45757491]) AS exp_ppb),
        |t AS (SELECT CAST(SUM(cnt) AS HUGEINT) AS n FROM g)
        |SELECT CAST(e.digit AS BIGINT) AS digit,
        |  CAST(COALESCE(g.cnt, 0) AS BIGINT) AS cnt,
        |  CAST(t.n AS BIGINT) AS n,
        |  CAST(COALESCE(g.cnt, 0) AS DOUBLE) / CAST(t.n AS DOUBLE) AS frac,
        |  CAST(e.exp_ppb AS BIGINT) AS exp_ppb,
        |  CAST(abs(CAST(COALESCE(g.cnt, 0) AS HUGEINT) * 1000000000
        |           - t.n * e.exp_ppb) AS BIGINT) AS dev_num,
        |  CAST(abs(CAST(COALESCE(g.cnt, 0) AS HUGEINT) * 1000000000
        |           - t.n * e.exp_ppb) AS DOUBLE)
        |    / CAST(t.n * 1000000000 AS DOUBLE) AS dev
        |FROM e LEFT JOIN g ON g.digit = e.digit, t ORDER BY digit""".stripMargin,


    // The data card: each panel is the corresponding by-source oracle
    // reduced to its one card metric; globals unnest to (metric, value)
    // pairs. Score n_chars vs the op's n_chars/2000.0 is deliberate —
    // AUC/F1/lift/KS are rank statistics, invariant under the strictly
    // monotone rescale, so the integer form stays exact.
    "aud_card" ->
      """SELECT 'volume' AS section, CAST(source AS VARCHAR) AS source, 'n_docs' AS metric,
        |  CAST(COUNT(*) AS DOUBLE) AS value
        |FROM documents WHERE source IS NOT NULL GROUP BY source
        |UNION ALL
        |SELECT 'ranking', CAST(grp AS VARCHAR), 'auc', auc FROM (
        |  WITH b AS (SELECT source AS grp, n_chars AS s,
        |      CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y FROM documents
        |    WHERE n_chars IS NOT NULL AND source IS NOT NULL),
        |  g AS (SELECT grp, s, COUNT(*) AS cnt, SUM(y) AS pos FROM b GROUP BY grp, s),
        |  r AS (SELECT grp, s, cnt, pos, COALESCE(SUM(cnt) OVER (PARTITION BY grp ORDER BY s
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum FROM g)
        |  SELECT grp,
        |    CASE WHEN SUM(pos) > 0 AND SUM(cnt) - SUM(pos) > 0 THEN
        |      CAST(SUM(pos * (2 * cum + cnt + 1)) - SUM(pos) * (SUM(pos) + 1) AS DOUBLE)
        |        / CAST(2 * SUM(pos) * (SUM(cnt) - SUM(pos)) AS DOUBLE)
        |    END AS auc
        |  FROM r GROUP BY grp)
        |UNION ALL
        |SELECT 'calibration', CAST(grp AS VARCHAR), 'ece', ece FROM (
        |  WITH b AS (SELECT source AS grp,
        |      GREATEST(LEAST(CAST(floor((n_chars / 2000.0) * 10) AS BIGINT), 9), 0) AS bin,
        |      CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
        |    FROM documents WHERE n_chars IS NOT NULL AND source IS NOT NULL),
        |  g AS (SELECT grp, bin, COUNT(*) AS n, SUM(y) AS n_pos FROM b GROUP BY grp, bin)
        |  SELECT grp, CAST(SUM(abs(20 * n_pos - n * (2 * bin + 1))) AS DOUBLE)
        |      / CAST(20 * SUM(n) AS DOUBLE) AS ece
        |  FROM g GROUP BY grp)
        |UNION ALL
        |SELECT 'operating_point', CAST(grp AS VARCHAR), 'f1', f1 FROM (
        |  WITH b AS (SELECT source AS grp, n_chars AS s,
        |      CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
        |    FROM documents WHERE n_chars IS NOT NULL AND source IS NOT NULL),
        |  g AS (SELECT grp, s, COUNT(*) AS cnt, SUM(y) AS pos FROM b GROUP BY grp, s),
        |  c AS (SELECT grp, s,
        |      COALESCE(CAST(SUM(cnt) OVER ew AS HUGEINT), 0) AS cumc,
        |      COALESCE(CAST(SUM(pos) OVER ew AS HUGEINT), 0) AS cump,
        |      CAST(SUM(cnt) OVER gw AS HUGEINT) AS n,
        |      CAST(SUM(pos) OVER gw AS HUGEINT) AS p
        |    FROM g WINDOW ew AS (PARTITION BY grp ORDER BY s
        |                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |                gw AS (PARTITION BY grp)),
        |  conf AS (SELECT grp, s, CAST(p - cump AS BIGINT) AS tp,
        |      CAST(n - p - (cumc - cump) AS BIGINT) AS fp, CAST(cump AS BIGINT) AS fn
        |    FROM c),
        |  f AS (SELECT grp, s, CASE WHEN 2 * tp + fp + fn > 0 THEN
        |        CAST(2 * tp AS DOUBLE) / CAST(2 * tp + fp + fn AS DOUBLE)
        |      ELSE 0.0 END AS f1
        |    FROM conf),
        |  r AS (SELECT grp, f1,
        |      ROW_NUMBER() OVER (PARTITION BY grp ORDER BY f1 DESC, s) AS rk FROM f)
        |  SELECT grp, f1 FROM r WHERE rk = 1)
        |UNION ALL
        |SELECT 'gains', CAST(grp AS VARCHAR), 'top_quintile_lift', lift FROM (
        |  WITH b AS (SELECT source AS grp, n_chars AS s,
        |      CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
        |    FROM documents WHERE n_chars IS NOT NULL AND source IS NOT NULL),
        |  g AS (SELECT grp, s, COUNT(*) AS cnt, SUM(y) AS pos FROM b GROUP BY grp, s),
        |  c AS (SELECT grp, s, cnt, pos,
        |      COALESCE(CAST(SUM(cnt) OVER dw AS BIGINT), 0) AS above,
        |      CAST(SUM(cnt) OVER gw AS BIGINT) AS n,
        |      CAST(SUM(pos) OVER gw AS BIGINT) AS p
        |    FROM g WINDOW dw AS (PARTITION BY grp ORDER BY s DESC
        |                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |                  gw AS (PARTITION BY grp)),
        |  d AS (SELECT grp, (above * 5) // n + 1 AS bucket, cnt, pos, n, p FROM c),
        |  bk AS (SELECT grp, bucket, CAST(SUM(cnt) AS BIGINT) AS n_bucket,
        |      CAST(SUM(pos) AS BIGINT) AS pos_bucket, MIN(n) AS n, MIN(p) AS p
        |    FROM d GROUP BY grp, bucket),
        |  cm AS (SELECT grp, bucket, n, p,
        |      CAST(SUM(n_bucket) OVER cw AS BIGINT) AS cum_n,
        |      CAST(SUM(pos_bucket) OVER cw AS BIGINT) AS cum_pos
        |    FROM bk WINDOW cw AS (PARTITION BY grp ORDER BY bucket
        |                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |  SELECT grp, CASE WHEN p > 0 THEN
        |      CAST(CAST(cum_pos AS HUGEINT) * n AS DOUBLE) /
        |        CAST(CAST(cum_n AS HUGEINT) * p AS DOUBLE) END AS lift
        |  FROM cm WHERE bucket = 1)
        |UNION ALL
        |SELECT 'drift', CAST(grp AS VARCHAR), 'tvd', tvd FROM (
        |  WITH o AS (SELECT source AS grp, lang AS cat, COUNT(*) AS o_cnt
        |    FROM documents WHERE source IS NOT NULL AND lang IS NOT NULL
        |    GROUP BY source, lang),
        |  nw AS (SELECT source AS grp, lang AS cat, COUNT(*) AS n_cnt
        |    FROM documents WHERE source IS NOT NULL AND lang IS NOT NULL
        |      AND doc_id % 3 <> 0 GROUP BY source, lang),
        |  j AS (SELECT COALESCE(o.grp, nw.grp) AS grp,
        |      CAST(COALESCE(o.o_cnt, 0) AS HUGEINT) AS o_cnt,
        |      CAST(COALESCE(nw.n_cnt, 0) AS HUGEINT) AS n_cnt
        |    FROM o FULL OUTER JOIN nw ON o.grp = nw.grp AND o.cat = nw.cat),
        |  t AS (SELECT grp, CAST(SUM(o_cnt) AS HUGEINT) AS no,
        |      CAST(SUM(n_cnt) AS HUGEINT) AS nn FROM j GROUP BY grp),
        |  tv AS (SELECT j.grp,
        |      CAST(SUM(abs(j.o_cnt * t.nn - j.n_cnt * t.no)) AS HUGEINT) AS tvd_num
        |    FROM j JOIN t ON t.grp = j.grp GROUP BY j.grp)
        |  SELECT tv.grp, CASE WHEN t.no > 0 AND t.nn > 0 THEN
        |      CAST(tv.tvd_num AS DOUBLE) / CAST(2 * t.no * t.nn AS DOUBLE) END AS tvd
        |  FROM tv JOIN t ON t.grp = tv.grp)
        |UNION ALL
        |SELECT 'psi', CAST(grp AS VARCHAR), 'psi', psi FROM (
        |  WITH o AS (SELECT source AS grp, lang AS cat, COUNT(*) AS o_cnt
        |    FROM documents WHERE source IS NOT NULL AND lang IS NOT NULL
        |    GROUP BY source, lang),
        |  nw AS (SELECT source AS grp, lang AS cat, COUNT(*) AS n_cnt
        |    FROM documents WHERE source IS NOT NULL AND lang IS NOT NULL
        |      AND doc_id % 3 <> 0 GROUP BY source, lang),
        |  j AS (SELECT COALESCE(o.grp, nw.grp) AS grp,
        |      CAST(COALESCE(o.o_cnt, 0) AS HUGEINT) AS o_cnt,
        |      CAST(COALESCE(nw.n_cnt, 0) AS HUGEINT) AS n_cnt
        |    FROM o FULL OUTER JOIN nw ON o.grp = nw.grp AND o.cat = nw.cat),
        |  t AS (SELECT grp, CAST(SUM(o_cnt) AS HUGEINT) AS no,
        |      CAST(SUM(n_cnt) AS HUGEINT) AS nn FROM j GROUP BY grp),
        |  w AS (SELECT j.grp, t.no, t.nn,
        |      CAST(j.o_cnt * t.nn - j.n_cnt * t.no AS DECIMAL(20, 0)) AS num,
        |      CASE WHEN j.o_cnt > 0 AND j.n_cnt > 0 THEN
        |        CAST(round(ln(CAST(j.o_cnt * t.nn AS DOUBLE)), 7) AS DECIMAL(12, 7))
        |        - CAST(round(ln(CAST(j.n_cnt * t.no AS DOUBLE)), 7) AS DECIMAL(12, 7))
        |      END AS dl
        |    FROM j JOIN t ON t.grp = j.grp),
        |  tt AS (SELECT grp, MIN(no) AS no, MIN(nn) AS nn,
        |      SUM(num * dl) AS psi_num FROM w GROUP BY grp)
        |  SELECT grp, CASE WHEN no > 0 AND nn > 0 THEN
        |      CAST(psi_num AS DOUBLE) / CAST(no * nn AS DOUBLE) END AS psi
        |  FROM tt)
        |UNION ALL
        |SELECT 'ks', CAST(grp AS VARCHAR), 'ks', ks FROM (
        |  WITH b AS (SELECT source AS grp, n_chars AS s, 1 AS a FROM documents
        |      WHERE n_chars IS NOT NULL AND source IS NOT NULL
        |    UNION ALL
        |    SELECT source, n_chars, 0 FROM documents
        |      WHERE n_chars IS NOT NULL AND source IS NOT NULL AND doc_id % 3 <> 0),
        |  g AS (SELECT grp, s, COUNT(*) AS cnt, SUM(a) AS ca FROM b GROUP BY grp, s),
        |  c AS (SELECT grp, s,
        |      CAST(SUM(ca) OVER iw AS HUGEINT) AS cum_a,
        |      CAST(SUM(cnt - ca) OVER iw AS HUGEINT) AS cum_b,
        |      CAST(SUM(ca) OVER gw AS HUGEINT) AS n_a,
        |      CAST(SUM(cnt - ca) OVER gw AS HUGEINT) AS n_b
        |    FROM g WINDOW iw AS (PARTITION BY grp ORDER BY s
        |                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |                gw AS (PARTITION BY grp)),
        |  d AS (SELECT grp, abs(cum_a * n_b - cum_b * n_a) AS d, n_a, n_b,
        |      MAX(abs(cum_a * n_b - cum_b * n_a)) OVER (PARTITION BY grp) AS dm
        |    FROM c)
        |  SELECT grp, CASE WHEN MIN(n_a) > 0 AND MIN(n_b) > 0 THEN
        |      CAST(MIN(dm) AS DOUBLE) / CAST(MIN(n_a) * MIN(n_b) AS DOUBLE) END AS ks
        |  FROM d WHERE d = dm GROUP BY grp)
        |UNION ALL
        |SELECT 'mix', CAST(grp AS VARCHAR), 'jsd_norm', jsd_norm FROM (
        |  WITH o AS (SELECT source AS grp, lang AS cat, CAST(COUNT(*) AS BIGINT) AS o
        |      FROM documents WHERE source IS NOT NULL AND lang IS NOT NULL
        |      GROUP BY 1, 2),
        |  ns AS (SELECT grp, CAST(SUM(o) AS BIGINT) AS ns FROM o GROUP BY grp),
        |  g AS (SELECT cat, CAST(SUM(o) AS BIGINT) AS g FROM o GROUP BY cat),
        |  t AS (SELECT CAST(SUM(g) AS BIGINT) AS nn FROM g),
        |  grid AS (SELECT ns.grp, ns.ns, g.cat, g.g, t.nn, COALESCE(o.o, 0) AS o0
        |    FROM ns CROSS JOIN g CROSS JOIN t
        |    LEFT JOIN o ON o.grp = ns.grp AND o.cat = g.cat),
        |  tm AS (SELECT grp, ns, nn,
        |      CASE WHEN o0 > 0 THEN o0 *
        |        (CAST(round(ln(CAST(o0 * nn * 2 AS DOUBLE)), 7) AS DECIMAL(12,7))
        |         - CAST(round(ln(CAST(o0 * nn + g * ns AS DOUBLE)), 7) AS DECIMAL(12,7)))
        |        ELSE 0 END AS tp,
        |      g * (CAST(round(ln(CAST(g * ns * 2 AS DOUBLE)), 7) AS DECIMAL(12,7))
        |         - CAST(round(ln(CAST(o0 * nn + g * ns AS DOUBLE)), 7) AS DECIMAL(12,7)))
        |        AS tq
        |    FROM grid),
        |  a AS (SELECT grp, MIN(ns) AS n, MIN(nn) AS nn, SUM(tp) AS sp, SUM(tq) AS sq
        |    FROM tm GROUP BY grp)
        |  SELECT grp,
        |    (CAST(sp AS DOUBLE) / CAST(2 * n AS DOUBLE)
        |      + CAST(sq AS DOUBLE) / CAST(2 * nn AS DOUBLE)) / 0.6931471805599453
        |      AS jsd_norm
        |  FROM a)
        |UNION ALL
        |SELECT 'privacy', '__corpus__', m, v FROM (
        |  WITH g AS (SELECT lang, n_chars // 200 AS len_band,
        |      COUNT(*) AS cnt, COUNT(DISTINCT source) AS lv
        |    FROM documents GROUP BY lang, n_chars // 200),
        |  s AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n_rows,
        |      CAST(MIN(cnt) AS BIGINT) AS min_group_size,
        |      CAST(SUM(CASE WHEN cnt < 5 THEN cnt ELSE 0 END) AS BIGINT) AS rows_below_k,
        |      CAST(MIN(lv) AS BIGINT) AS min_l FROM g)
        |  SELECT unnest(['k_anonymous', 'l_diverse', 'min_group_size', 'frac_below_k']) AS m,
        |    unnest([CASE WHEN min_group_size >= 5 THEN 1.0 ELSE 0.0 END,
        |            CASE WHEN min_l >= 3 THEN 1.0 ELSE 0.0 END,
        |            CAST(min_group_size AS DOUBLE),
        |            CASE WHEN n_rows > 0 THEN
        |              CAST(rows_below_k AS DOUBLE) / CAST(n_rows AS DOUBLE)
        |            ELSE 0.0 END]) AS v
        |  FROM s)
        |UNION ALL
        |SELECT 'concentration', '__corpus__', 'gini', gini FROM (
        |  WITH g AS (SELECT source AS cat, CAST(COUNT(*) AS HUGEINT) AS cnt
        |    FROM documents WHERE source IS NOT NULL GROUP BY source),
        |  n AS (SELECT CAST(SUM(abs(a.cnt - b.cnt)) AS HUGEINT) AS num
        |    FROM g a, g b),
        |  t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_categories,
        |      CAST(SUM(cnt) AS HUGEINT) AS n_rows FROM g)
        |  SELECT CASE WHEN t.n_categories > 0 AND t.n_rows > 0 THEN
        |      CAST(n.num AS DOUBLE) / CAST(2 * t.n_categories * t.n_rows AS DOUBLE)
        |    END AS gini
        |  FROM n, t)
        |UNION ALL
        |SELECT 'independence', '__corpus__', m, v FROM (
        |  WITH o AS (SELECT CAST(lang AS VARCHAR) AS a,
        |      CAST(source AS VARCHAR) AS b, CAST(COUNT(*) AS BIGINT) AS o
        |    FROM documents WHERE lang IS NOT NULL AND source IS NOT NULL
        |    GROUP BY a, b),
        |  r AS (SELECT a, CAST(SUM(o) AS BIGINT) AS ra FROM o GROUP BY a),
        |  c AS (SELECT b, CAST(SUM(o) AS BIGINT) AS cb FROM o GROUP BY b),
        |  n AS (SELECT CAST(SUM(o) AS BIGINT) AS n,
        |      CAST(COUNT(DISTINCT a) AS BIGINT) AS r,
        |      CAST(COUNT(DISTINCT b) AS BIGINT) AS c FROM o),
        |  t AS (SELECT CAST(SUM((CAST(o.o AS HUGEINT)*o.o*n.n*1000000000)
        |        // (CAST(r.ra AS HUGEINT)*c.cb)) AS HUGEINT) AS tq
        |    FROM o JOIN r USING (a) JOIN c USING (b) CROSS JOIN n),
        |  x AS (SELECT n.n, n.r, n.c, (n.r-1)*(n.c-1) AS dof,
        |      CAST(CAST(n.n AS HUGEINT)*t.tq
        |          - CAST(n.n AS HUGEINT)*n.n*1000000000 AS DOUBLE)
        |        / (1000000000.0 * CAST(n.n AS DOUBLE)) AS chi2
        |    FROM n CROSS JOIN t),
        |  k AS (SELECT *, round((1.0 - 2.0/(9.0*dof))
        |      + 1.645*sqrt(2.0/(9.0*dof)), 12) AS cc FROM x)
        |  SELECT unnest(['cramers_v', 'dependent']) AS m,
        |    unnest([CASE WHEN dof > 0
        |        THEN sqrt(chi2/CAST(n*(least(r,c)-1) AS DOUBLE)) END,
        |      CASE WHEN dof > 0 AND chi2 >= dof*(cc*cc*cc) THEN 1.0 ELSE 0.0 END]) AS v
        |  FROM k)
        |ORDER BY 1, 2, 3""".stripMargin)
}
