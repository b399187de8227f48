package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.streaming.StreamOps

/** Event-stream analytics over `events`, built on the StreamOps transforms
  * (the same functions run under readStream — StreamingSpec proves it).
  * Oracles reproduce the window semantics arithmetically:
  * epoch-aligned tumbling buckets and lag/cumsum sessionization.
  */
object EventQueries {
  import Tables._

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Upsert compaction: one surviving (latest) event per
    // (user_id, event_type) — the CDC merge pattern. Ordering is on
    // MICROSECOND time + event_id, not raw nanos: DuckDB reads the
    // parquet ts at µs resolution, so ordering Spark on full nanos would
    // let two same-µs events resolve ties differently across engines.
    // Daily re-spine + forward fill; gaps injected deterministically
    // (error-type days divisible by 3 dropped) so the zero-count rows and
    // the carry path are exercised for real.
    "ev_gap_fill" -> ((s, d) => {
      val ev = t(s, d, "events")
      val tsUs = call_function("div", col("ts").cast("long"), lit(1000L))
      val day = call_function("div", tsUs, lit(86400000000L))
      EventOps.gapFill(
          ev.filter(!(col("event_type") === "error" && day % 3 === 0)),
          tsUs)
        .orderBy("event_type", "day")
    }),

    // Trailing 7-day rolling counts/sums per type — a RANGE frame over
    // the day value (gap days simply absent from the frame).
    "ev_rolling7" -> ((s, d) =>
      EventOps.rollingDaily(t(s, d, "events"),
          call_function("div", col("ts").cast("long"), lit(1000L)))
        .orderBy("event_type", "day")),

    // Salted-hash pseudonymization of the user key before release; the
    // token is deterministic per (salt, user), so downstream joins and
    // retention still work on tokens. Pure projection — no shuffle.
    "ev_pseudonymize" -> ((s, d) =>
      EventOps.pseudonymize(t(s, d, "events"), Seq("user_id"), "r8salt")
        .select(col("event_id"), col("user_id").as("user_token"),
          col("event_type"))
        .orderBy("event_id")),

    "ev_latest" -> ((s, d) =>
      StreamOps.latestByKey(
          t(s, d, "events").withColumn("ts_us",
            call_function("div", col("ts").cast("long"), lit(1000L))),
          Seq("user_id", "event_type"), Seq(col("ts_us"), col("event_id")))
        .select(col("user_id"), col("event_type"), col("ts_us"), col("value"))
        .orderBy("user_id", "event_type")),

    // SCD2 history: every change of a (user_id, event_type) key becomes a
    // validity interval — same µs+event_id ordering discipline as
    // ev_latest (whose surviving rows are exactly the is_current ones).
    "ev_scd2" -> ((s, d) =>
      StreamOps.scd2History(
          t(s, d, "events").withColumn("ts_us",
            call_function("div", col("ts").cast("long"), lit(1000L))),
          Seq("user_id", "event_type"), Seq(col("ts_us"), col("event_id")))
        .select(col("user_id"), col("event_type"), col("event_id"),
          col("valid_from_us"), col("valid_to_us"), col("is_current"))
        .orderBy("user_id", "event_type", "valid_from_us", "event_id")),

    // The CONSUMER side of SCD2: each purchase joined to the signup
    // VERSION valid at its event time (temporal as-of against the
    // scd2History output — interval predicate on the validity columns).
    "ev_scd2_lookup" -> ((s, d) => {
      val ev = t(s, d, "events")
      val dim = StreamOps.scd2History(
          ev.filter(col("event_type") === "signup")
            .withColumn("ts_us",
              call_function("div", col("ts").cast("long"), lit(1000L))),
          Seq("user_id"), Seq(col("ts_us"), col("event_id")))
        .select(col("user_id").as("d_user"), col("event_id").as("dim_event"),
          col("valid_from_us"), col("valid_to_us"))
      val facts = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"),
          call_function("div", col("ts").cast("long"), lit(1000L)).as("p_us"))
      facts.join(dim, col("user_id") === col("d_user") &&
          col("valid_from_us") <= col("p_us") &&
          (col("valid_to_us").isNull || col("p_us") < col("valid_to_us")))
        .select(col("purchase_id"), col("user_id"), col("dim_event"),
          col("valid_from_us"), col("p_us"))
        .orderBy("purchase_id")
    }),

    // Tumbling 15-min windows per event type (Spark window() function).
    "ev_tumbling" -> ((s, d) =>
      StreamOps.tumblingCounts(t(s, d, "events"))
        .orderBy("window_start_us", "event_type")),

    // Sliding windows (30 min every 15 min): each event in exactly 2
    // overlapping windows — the oracle replicates rows over a 2-element
    // offset series.
    "ev_sliding" -> ((s, d) =>
      StreamOps.slidingCounts(t(s, d, "events"))
        .orderBy("window_start_us", "event_type")),

    // Session windows (8h gap) per user (Spark session_window()).
    "ev_sessions" -> ((s, d) =>
      StreamOps.userSessions(t(s, d, "events"))
        .orderBy("user_id", "session_start_us")),

    // Stream-stream interval join shape, in batch mode: errors × preceding
    // 30-min clicks per user (the same function runs under readStream with
    // watermark-bounded state — StreamingSpec).
    // Last-touch funnel attribution click→purchase within 2 hours (the
    // synthetic stream is sparse per user — 10 min attributes almost
    // nothing at gate SFs).
    "ev_funnel" -> ((s, d) =>
      StreamOps.funnelAttribution(t(s, d, "events"), maxGapMin = 120)
        .orderBy("to_id")),

    "ev_click_error_join" -> ((s, d) => {
      val ev = t(s, d, "events")
      StreamOps.clickErrorJoin(
          ev.filter(col("event_type") === "click"),
          ev.filter(col("event_type") === "error"))
        .orderBy("error_id", "click_id")
    }),

    // Session summary: sessions per user histogram — exercises the
    // two-level agg on top of session_window.
    "ev_session_histogram" -> ((s, d) =>
      StreamOps.userSessions(t(s, d, "events"))
        .groupBy("user_id").agg(count(lit(1)).as("n_sessions"))
        .groupBy("n_sessions").agg(count(lit(1)).as("n_users"))
        .orderBy("n_sessions")),

    // Stream-static enrichment (StreamOps.enrichEvents) + per-segment
    // rollup: event counts and decimal-exact value sums per market segment
    // and event type. The join side is the static customer dim — broadcast
    // in batch, re-joined per micro-batch with no state under readStream
    // (StreamingSpec).
    "ev_enrich" -> ((s, d) =>
      StreamOps.enrichEvents(t(s, d, "events"), t(s, d, "customer"))
        .groupBy("segment", "event_type")
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
            .cast("double").as("sum_value"))
        .orderBy("segment", "event_type")),

    // Cohort retention matrix: first-seen epoch-week cohorts × week
    // offset, distinct-user counts (EventOps.cohortRetention — events
    // reduce to the (user, week) set before anything global happens).
    "ev_retention" -> ((s, d) =>
      EventOps.cohortRetention(t(s, d, "events"),
          call_function("div", col("ts").cast("long"), lit(1000L)))
        .orderBy("cohort_week", "week_offset")),

    // Burstiness of the inter-event process per type: exact gap moments
    // from the dwell lead window, cv2 one division, B the mirrored
    // sqrt -> sum -> divide chain.
    "ev_burstiness" -> ((s, d) =>
      EventOps.burstinessReport(t(s, d, "events"),
        call_function("div", col("ts").cast("long"), lit(1000L)))),

    // DAU/WAU stickiness per day: exact distinct counts via the x7
    // window explode over the reduced (user, day) set, one division.
    "ev_stickiness" -> ((s, d) =>
      EventOps.stickinessReport(t(s, d, "events"),
        call_function("div", col("ts").cast("long"), lit(1000L)))),

    // Cohort LTV curve: the retention frame with exact DECIMAL(28,6)
    // revenue; cumulative over the bounded cohort x offset table,
    // per-user LTV one division by the offset-0 cohort size.
    "ev_ltv" -> ((s, d) =>
      EventOps.cohortLtv(t(s, d, "events"),
        call_function("div", col("ts").cast("long"), lit(1000L)), "value")),

    // Growth accounting over the same (user, week) presence set:
    // new/retained/resurrected by previous presence, churn charged to
    // the following week and capped at the observation horizon.
    "ev_lifecycle" -> ((s, d) =>
      EventOps.growthAccounting(t(s, d, "events"),
        call_function("div", col("ts").cast("long"), lit(1000L)))),

    // Ingestion dedup: the events feed doubled (simulating at-least-once
    // redelivery), deduplicated on event_id, then summarized. event_id is
    // unique in the source and the duplicates are bit-identical rows, so
    // the surviving set is deterministic and equals the original table —
    // which is exactly what the oracle checks. Streaming twin:
    // StreamOps.dedupEventsStream (bounded watermark state).
    "ev_dedup" -> ((s, d) => {
      val ev = t(s, d, "events")
      StreamOps.dedupEvents(ev.unionAll(ev))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
            .cast("double").as("sum_value"))
        .orderBy("event_type")
    }),

    // Time-to-next-action dwell per event type: gaps on the µs values
    // themselves (ts div 1000 before differencing — the cohortRetention
    // convention, so both engines difference identical integers).
    "ev_dwell" -> ((s, d) =>
      EventOps.dwellReport(t(s, d, "events"),
        call_function("div", col("ts").cast("long"), lit(1000L)))),

    // Discrete-time hazard per event type on the same µs convention:
    // observed gaps + right-censored last events, decade buckets as
    // integer threshold counts, at-risk a descending cumulative over
    // the bounded (type, bucket) table, hazard one division.
    "ev_hazard" -> ((s, d) =>
      EventOps.hazardReport(t(s, d, "events"),
        call_function("div", col("ts").cast("long"), lit(1000L)))),

    // Kaplan–Meier survival over the hazard buckets: the curve the
    // hazard panel plots; per-step round-6 product (markov convention).
    "ev_survival" -> ((s, d) =>
      EventOps.survivalReport(t(s, d, "events"),
        call_function("div", col("ts").cast("long"), lit(1000L)))),

    // RFM segmentation on the µs values (the ev_dwell convention):
    // recency in whole hours vs the corpus-latest event, frequency,
    // monetary accumulated exactly in DECIMAL(28,6) and emitted via one
    // final double cast; quartile-ish cutpoints as config
    // (2/7/14 h, 60/66/73 events, 2900/3300/3650 value).
    "ev_rfm" -> ((s, d) =>
      EventOps.rfmReport(t(s, d, "events"),
        call_function("div", col("ts").cast("long"), lit(1000L)),
        "user_id", "value", unitTicks = 3600000000L,
        cutR = (2L, 7L, 14L), cutF = (60L, 66L, 73L),
        cutM = (2900.0, 3300.0, 3650.0))),

    // Co-engagement matrix: users doing BOTH of each type pair, with
    // the Jaccard share of the two user bases.
    "ev_coengagement" -> ((s, d) =>
      EventOps.coEngagement(t(s, d, "events"))),

    // 3-step-ahead Markov distribution from uniform, over the
    // ev_transitions matrix (round-6 decimal quantization per step).
    "ev_markov3" -> ((s, d) =>
      EventOps.markovStepAhead(
        t(s, d, "events").withColumn("ts",
          call_function("div", col("ts").cast("long"), lit(1000L))),
        iters = 3)),

    // Lorenz curve of user activity: decile-by-decile cumulative event
    // share (the full curve behind ev_pareto's one point).
    "ev_lorenz" -> ((s, d) => EventOps.lorenzReport(t(s, d, "events"))),

    // 3-step ordered funnel signup→click→purchase, 24 h per hop on the
    // µs values; every anchor a min() — no ordering ambiguity.
    "ev_funnel3" -> ((s, d) =>
      EventOps.funnelSteps(t(s, d, "events"),
        call_function("div", col("ts").cast("long"), lit(1000L)),
        Seq("signup", "click", "purchase"), horizonTicks = 86400000000L)),

    // Time-to-convert distribution for the funnel's first hop: exact
    // gap integers, shared interpolated percentiles.
    "ev_time_to_convert" -> ((s, d) =>
      EventOps.timeToConvert(t(s, d, "events"),
        call_function("div", col("ts").cast("long"), lit(1000L)),
        "signup", "click", horizonTicks = 86400000000L)),

    // Top journey-opening paths: first 3 event types per user in the
    // (µs, event_id) order, top-10 by user count.
    "ev_paths" -> ((s, d) =>
      EventOps.topPaths(t(s, d, "events"),
        call_function("div", col("ts").cast("long"), lit(1000L)),
        depth = 3, k = 10)),

    // Activity concentration: the top-decile users' share of all events
    // (exact rank over the per-user aggregate, one division).
    "ev_pareto" -> ((s, d) => EventOps.paretoReport(t(s, d, "events"))),

    // Markov transition matrix of user journeys (next-event panel):
    // per-user (µs, event_id) sequencing — the ev_scd2 ordering
    // convention, so both engines break ties identically.
    "ev_transitions" -> ((s, d) =>
      EventOps.transitionCounts(
          t(s, d, "events").withColumn("ts",
            call_function("div", col("ts").cast("long"), lit(1000L))))
        .orderBy("from_type", "to_type")),

    // CDC changelog apply: snapshot = per-user latest state BEFORE the
    // mid-month cutoff, changes = everything after; the merged result is
    // checked against latest-over-everything (with error-state users
    // tombstoned out) — the oracle is correct by construction, so the
    // gate pins the MERGE path (union + max_by hash agg + tombstone
    // filter), not a rederivation.
    "ev_apply_changes" -> ((s, d) => {
      val keyed = t(s, d, "events").select(col("user_id"), col("event_id"),
        call_function("div", col("ts").cast("long"), lit(1000L)).as("ts_us"),
        col("event_type"), col("value"))
      val cutoffUs = 1705276800000000L // 2024-01-15T00:00:00Z
      val snap = StreamOps.latestByKey(keyed.filter(col("ts_us") < cutoffUs),
        Seq("user_id"), Seq(col("ts_us"), col("event_id")))
      EventOps.applyChangelog(snap, keyed.filter(col("ts_us") >= cutoffUs),
          Seq("user_id"), Seq(col("ts_us"), col("event_id")),
          col("event_type") === "error")
        .orderBy("user_id")
    }),

    // Linear multi-touch attribution: purchases credited equally across
    // the same user's clicks in a 3-day lookback (ties broken on
    // event_id — the ev_latest µs discipline).
    "ev_attribution" -> ((s, d) =>
      EventOps.attribution(t(s, d, "events"), "purchase", "click",
          3L * 24 * 3600 * 1000000L)
        .orderBy("conv_id", "pos")),

    // KEYLESS range join (vs ev_click_error_join's user-keyed interval
    // join): every click inside ANY error's 30-minute window, any user —
    // bin width = window length, so each interval replicates to ≤ 2 bins
    // and the join is a plain bin equi-join.
    "ev_range_join" -> ((s, d) => {
      val ev = t(s, d, "events")
      val tsUs = call_function("div", col("ts").cast("long"), lit(1000L))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), tsUs.as("click_us"))
      val errs = ev.filter(col("event_type") === "error")
        .select(col("event_id").as("err_id"),
          (tsUs - lit(1800000000L)).as("lo_us"), tsUs.as("hi_us"))
      RangeJoin.intervalJoinBinned(clicks, errs,
          col("click_us"), col("lo_us"), col("hi_us"), 1800000000L)
        .orderBy("click_id", "err_id")
    }))

  private val sessionsSql =
    """WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events),
      |g AS (SELECT user_id, us,
      |    CASE WHEN us - LAG(us) OVER (PARTITION BY user_id ORDER BY us) > 28800000000
      |         OR LAG(us) OVER (PARTITION BY user_id ORDER BY us) IS NULL
      |         THEN 1 ELSE 0 END AS brk
      |  FROM e),
      |sess AS (SELECT user_id, us,
      |    SUM(brk) OVER (PARTITION BY user_id ORDER BY us
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |  FROM g)
      |SELECT user_id, MIN(us) AS session_start_us, COUNT(*) AS n_events
      |FROM sess GROUP BY user_id, sid""".stripMargin

  def oracleSql: Map[String, String] = Map(
    // spine from one min/max row; addends decimal-fixed before the sum;
    // IGNORE NULLS carry over the bounded (group, day) table
    "ev_gap_fill" ->
      """WITH base AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day, value
        |  FROM events
        |  WHERE NOT (event_type = 'error' AND (epoch_us(ts) // 86400000000) % 3 = 0)),
        |daily AS (SELECT event_type, day, COUNT(value) AS n,
        |    CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS day_sum
        |  FROM base GROUP BY event_type, day),
        |span AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM base),
        |spine AS (SELECT DISTINCT d.event_type, u.day FROM daily d,
        |  (SELECT unnest(range(span.lo, span.hi + 1)) AS day FROM span) u)
        |SELECT s.event_type, s.day, CAST(COALESCE(d.n, 0) AS BIGINT) AS n,
        |  d.day_sum,
        |  last_value(d.day_sum IGNORE NULLS) OVER (
        |    PARTITION BY s.event_type ORDER BY s.day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ffill_sum
        |FROM spine s LEFT JOIN daily d
        |  ON d.event_type = s.event_type AND d.day = s.day
        |ORDER BY 1, 2""".stripMargin,

    // RANGE BETWEEN over the integer day in both engines; decimal window
    // sum cast once
    "ev_rolling7" ->
      """WITH daily AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |    COUNT(value) AS n,
        |    SUM(CAST(value AS DECIMAL(28,6))) AS dsum
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type, day, CAST(n AS BIGINT) AS n,
        |  CAST(dsum AS DOUBLE) AS day_sum,
        |  CAST(SUM(n) OVER rw AS BIGINT) AS roll_n,
        |  CAST(SUM(dsum) OVER rw AS DOUBLE) AS roll_sum
        |FROM daily
        |WINDOW rw AS (PARTITION BY event_type ORDER BY day
        |              RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
        |ORDER BY event_type, day""".stripMargin,

    // md5 of the same salted bytes is engine-identical
    "ev_pseudonymize" ->
      """SELECT event_id,
        |  CASE WHEN user_id IS NOT NULL
        |       THEN md5('r8salt:' || CAST(user_id AS VARCHAR)) END AS user_token,
        |  event_type
        |FROM events ORDER BY event_id""".stripMargin,

    "ev_latest" ->
      """SELECT user_id, event_type, epoch_us(ts) AS ts_us, value FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, event_type
        |      ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
        |  FROM events) x
        |WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin,
    "ev_scd2" ->
      """SELECT user_id, event_type, event_id, epoch_us(ts) AS valid_from_us,
        |  LEAD(epoch_us(ts)) OVER w AS valid_to_us,
        |  LEAD(epoch_us(ts)) OVER w IS NULL AS is_current
        |FROM events
        |WINDOW w AS (PARTITION BY user_id, event_type ORDER BY epoch_us(ts), event_id)
        |ORDER BY user_id, event_type, valid_from_us, event_id""".stripMargin,
    // Temporal as-of: at most one dimension version matches per fact by
    // construction (intervals partition each key's timeline).
    "ev_scd2_lookup" ->
      """WITH dim AS (SELECT user_id, event_id AS dim_event,
        |    epoch_us(ts) AS valid_from_us,
        |    LEAD(epoch_us(ts)) OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts), event_id) AS valid_to_us
        |  FROM events WHERE event_type = 'signup'),
        |f AS (SELECT event_id AS purchase_id, user_id, epoch_us(ts) AS p_us
        |  FROM events WHERE event_type = 'purchase')
        |SELECT f.purchase_id, f.user_id, d.dim_event, d.valid_from_us, f.p_us
        |FROM f JOIN dim d ON d.user_id = f.user_id
        |  AND d.valid_from_us <= f.p_us
        |  AND (d.valid_to_us IS NULL OR f.p_us < d.valid_to_us)
        |ORDER BY purchase_id""".stripMargin,
    "ev_enrich" ->
      """SELECT c.c_mktsegment AS segment, e.event_type,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events e JOIN customer c ON e.user_id = c.c_custkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // Retention: DISTINCT (user, week) first, so COUNT(*) is the
    // burstiness: the dwell LEAD window, HUGEINT gap moments, the same
    // single-division cv2 and mirrored sqrt chain
    "ev_burstiness" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS us, event_id, event_type
        |  FROM events),
        |g AS (SELECT event_type,
        |    LEAD(us) OVER (PARTITION BY user_id ORDER BY us, event_id) - us
        |      AS g
        |  FROM e),
        |a AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CAST(g AS HUGEINT)) AS HUGEINT) AS sg,
        |    CAST(SUM(CAST(g AS HUGEINT) * g) AS HUGEINT) AS qg
        |  FROM g WHERE g IS NOT NULL GROUP BY event_type),
        |c AS (SELECT event_type, n, sg,
        |    CASE WHEN sg > 0 THEN
        |      CAST(CAST(n AS HUGEINT) * qg - sg * sg AS DOUBLE)
        |        / CAST(sg * sg AS DOUBLE) END AS cv2
        |  FROM a)
        |SELECT event_type, n AS n_gaps,
        |  CAST(sg AS DOUBLE) / CAST(n AS DOUBLE) AS mean_gap_us, cv2,
        |  CASE WHEN cv2 IS NOT NULL THEN
        |    (sqrt(cv2) - 1.0) / (sqrt(cv2) + 1.0) END AS burstiness
        |FROM c ORDER BY event_type""".stripMargin,

    // stickiness: the same reduced-set + window-explode construction,
    // day spine from the 1-row span
    "ev_stickiness" ->
      """WITH ud AS (SELECT DISTINCT user_id,
        |    epoch_us(ts) // 86400000000 AS day FROM events),
        |span AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM ud),
        |spine AS (SELECT unnest(generate_series(span.d0, span.d1)) AS day
        |  FROM span),
        |dau AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS dau
        |  FROM ud GROUP BY day),
        |wx AS (SELECT DISTINCT user_id, day + o.o AS day
        |  FROM ud, unnest(generate_series(0, 6)) AS o(o)),
        |wau AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS wau
        |  FROM wx GROUP BY day)
        |SELECT CAST(spine.day AS BIGINT) AS day,
        |  COALESCE(dau.dau, 0) AS dau, COALESCE(wau.wau, 0) AS wau,
        |  CASE WHEN COALESCE(wau.wau, 0) > 0 THEN
        |    CAST(COALESCE(dau.dau, 0) AS DOUBLE) / CAST(wau.wau AS DOUBLE)
        |  END AS stickiness
        |FROM spine LEFT JOIN dau ON dau.day = spine.day
        |LEFT JOIN wau ON wau.day = spine.day
        |ORDER BY day""".stripMargin,

    // LTV: the retention CTE with exact decimal revenue; cumulative and
    // cohort-size windows over the bounded cohort x offset table
    "ev_ltv" ->
      """WITH uw AS (SELECT user_id, epoch_us(ts) // 604800000000 AS week,
        |    SUM(CAST(COALESCE(value, 0.0) AS DECIMAL(28, 6))) AS v
        |  FROM events GROUP BY user_id, week),
        |c AS (SELECT user_id, week, v,
        |    MIN(week) OVER (PARTITION BY user_id) AS cohort_week FROM uw),
        |cells AS (SELECT cohort_week, week - cohort_week AS week_offset,
        |    CAST(COUNT(*) AS BIGINT) AS n_users, SUM(v) AS rev
        |  FROM c GROUP BY 1, 2),
        |x AS (SELECT cohort_week, week_offset, n_users, rev,
        |    SUM(rev) OVER (PARTITION BY cohort_week ORDER BY week_offset
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_rev,
        |    first_value(n_users) OVER (PARTITION BY cohort_week
        |      ORDER BY week_offset ROWS BETWEEN UNBOUNDED PRECEDING AND
        |      UNBOUNDED FOLLOWING) AS cohort_size
        |  FROM cells)
        |SELECT CAST(cohort_week AS BIGINT) AS cohort_week,
        |  CAST(week_offset AS BIGINT) AS week_offset, n_users,
        |  CAST(rev AS DOUBLE) AS revenue,
        |  CAST(cum_rev AS DOUBLE) AS cum_revenue,
        |  CAST(cum_rev AS DOUBLE) / CAST(cohort_size AS DOUBLE)
        |    AS cum_ltv_per_user
        |FROM x ORDER BY cohort_week, week_offset""".stripMargin,

    // growth accounting: LAG/LEAD over the distinct (user, week) set,
    // churn contributions unioned at week+1, horizon-capped
    "ev_lifecycle" ->
      """WITH uw AS (SELECT DISTINCT user_id,
        |    epoch_us(ts) // 604800000000 AS week FROM events),
        |s AS (SELECT user_id, week,
        |    LAG(week) OVER (PARTITION BY user_id ORDER BY week) AS prev,
        |    LEAD(week) OVER (PARTITION BY user_id ORDER BY week) AS nxt
        |  FROM uw),
        |m AS (SELECT MAX(week) AS max_week FROM uw),
        |c AS (SELECT week,
        |    CASE WHEN prev IS NULL THEN 1 ELSE 0 END AS n_new,
        |    CASE WHEN prev = week - 1 THEN 1 ELSE 0 END AS n_retained,
        |    CASE WHEN prev IS NOT NULL AND prev < week - 1 THEN 1 ELSE 0 END
        |      AS n_resurrected,
        |    0 AS n_churned
        |  FROM s
        |  UNION ALL
        |  SELECT week + 1, 0, 0, 0, 1
        |  FROM s, m WHERE (nxt IS NULL OR nxt > week + 1)
        |    AND week + 1 <= m.max_week)
        |SELECT CAST(week AS BIGINT) AS week,
        |  CAST(SUM(n_new) AS BIGINT) AS n_new,
        |  CAST(SUM(n_retained) AS BIGINT) AS n_retained,
        |  CAST(SUM(n_resurrected) AS BIGINT) AS n_resurrected,
        |  CAST(SUM(n_churned) AS BIGINT) AS n_churned
        |FROM c GROUP BY week ORDER BY week""".stripMargin,

    // distinct-user count — same reduction order as the Spark side.
    "ev_retention" ->
      """WITH uw AS (SELECT DISTINCT user_id,
        |    epoch_us(ts) // 604800000000 AS week FROM events),
        |c AS (SELECT user_id, week,
        |    MIN(week) OVER (PARTITION BY user_id) AS cohort_week FROM uw)
        |SELECT cohort_week, week - cohort_week AS week_offset,
        |  COUNT(*) AS n_users
        |FROM c GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "ev_dedup" ->
      """SELECT event_type, COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    // Dwell: LEAD over the same (µs, event_id) per-user order; gaps are
    // exact µs integers, the mean one HUGEINT-sum division
    "ev_dwell" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS us, event_id, event_type
        |  FROM events),
        |g AS (SELECT event_type, us, event_id,
        |    LEAD(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS next_us
        |  FROM e)
        |SELECT event_type, COUNT(*) AS n_gaps,
        |  CAST(MIN(next_us - us) AS BIGINT) AS min_gap_us,
        |  CAST(MAX(next_us - us) AS BIGINT) AS max_gap_us,
        |  CAST(SUM(CAST(next_us - us AS HUGEINT)) AS DOUBLE) /
        |    CAST(COUNT(*) AS DOUBLE) AS mean_gap_us
        |FROM g WHERE next_us IS NOT NULL
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    // Hazard: the same LEAD order; last events right-censor at the
    // corpus max; the DecadeUs thresholds interpolate verbatim (single
    // source of truth), at-risk a window over the bounded bucket table
    "ev_hazard" -> {
      val bucket = graft.operators.EventOps.DecadeUs
        .map(t => s"(CASE WHEN t_us >= $t THEN 1 ELSE 0 END)").mkString(" + ")
      s"""WITH e AS (SELECT user_id, epoch_us(ts) AS us, event_id, event_type
         |  FROM events),
         |m AS (SELECT MAX(us) AS corpus_max_us FROM e),
         |g AS (SELECT event_type, us,
         |    LEAD(us) OVER (PARTITION BY user_id ORDER BY us, event_id)
         |      AS next_us
         |  FROM e),
         |t AS (SELECT event_type,
         |    CASE WHEN next_us IS NOT NULL THEN next_us - us
         |         ELSE m.corpus_max_us - us END AS t_us,
         |    next_us IS NOT NULL AS observed
         |  FROM g, m),
         |c AS (SELECT event_type, CAST($bucket AS BIGINT) AS bucket,
         |    CAST(SUM(CASE WHEN observed THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_events,
         |    CAST(SUM(CASE WHEN observed THEN 0 ELSE 1 END) AS BIGINT)
         |      AS n_censored
         |  FROM t GROUP BY event_type, bucket)
         |SELECT event_type, bucket, n_events, n_censored,
         |  CAST(SUM(n_events + n_censored) OVER (PARTITION BY event_type
         |    ORDER BY bucket DESC ROWS BETWEEN UNBOUNDED PRECEDING AND
         |    CURRENT ROW) AS BIGINT) AS n_at_risk,
         |  CAST(n_events AS DOUBLE) / CAST(SUM(n_events + n_censored)
         |    OVER (PARTITION BY event_type ORDER BY bucket DESC ROWS
         |    BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
         |    AS hazard
         |FROM c ORDER BY event_type, bucket""".stripMargin
    },

    // KM: the hazard cells + a recursive CTE folding the round-6
    // product per type (every scale-12 intermediate < 10 -> the
    // decimal->double hop is exact, the markov re-quantization)
    "ev_survival" -> {
      val bucket = graft.operators.EventOps.DecadeUs
        .map(t => s"(CASE WHEN t_us >= $t THEN 1 ELSE 0 END)").mkString(" + ")
      s"""WITH RECURSIVE e AS (SELECT user_id, epoch_us(ts) AS us, event_id,
         |    event_type FROM events),
         |m AS (SELECT MAX(us) AS corpus_max_us FROM e),
         |g AS (SELECT event_type, us,
         |    LEAD(us) OVER (PARTITION BY user_id ORDER BY us, event_id)
         |      AS next_us
         |  FROM e),
         |t AS (SELECT event_type,
         |    CASE WHEN next_us IS NOT NULL THEN next_us - us
         |         ELSE m.corpus_max_us - us END AS t_us,
         |    next_us IS NOT NULL AS observed
         |  FROM g, m),
         |c AS (SELECT event_type, CAST($bucket AS BIGINT) AS bucket,
         |    CAST(SUM(CASE WHEN observed THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_events,
         |    CAST(SUM(CASE WHEN observed THEN 0 ELSE 1 END) AS BIGINT)
         |      AS n_censored
         |  FROM t GROUP BY event_type, bucket),
         |o AS (SELECT event_type, bucket, n_events,
         |    CAST(SUM(n_events + n_censored) OVER (PARTITION BY event_type
         |      ORDER BY bucket DESC ROWS BETWEEN UNBOUNDED PRECEDING AND
         |      CURRENT ROW) AS BIGINT) AS n_at_risk,
         |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY bucket)
         |      AS rn
         |  FROM c),
         |f(event_type, rn, sv) AS (
         |  SELECT event_type, CAST(0 AS BIGINT),
         |    CAST(1 AS DECIMAL(12,6)) FROM (SELECT DISTINCT event_type FROM o) q
         |  UNION ALL
         |  SELECT o.event_type, o.rn,
         |    CAST(round(CAST(f.sv *
         |      CAST(round(1 - CAST(o.n_events AS DOUBLE)
         |        / CAST(o.n_at_risk AS DOUBLE), 6) AS DECIMAL(12,6))
         |      AS DOUBLE), 6) AS DECIMAL(12,6))
         |  FROM f JOIN o ON o.event_type = f.event_type AND o.rn = f.rn + 1)
         |SELECT o.event_type, o.bucket, o.n_at_risk, o.n_events,
         |  CAST(f.sv AS DOUBLE) AS survival
         |FROM f JOIN o ON o.event_type = f.event_type AND o.rn = f.rn
         |ORDER BY o.event_type, o.bucket""".stripMargin
    },

    // co-engagement: distinct (user, type) sets, user-keyed pair join,
    // complete matrix via the sizes left join
    "ev_coengagement" ->
      """WITH e AS (SELECT DISTINCT user_id AS u, event_type AS t FROM events
        |  WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
        |sz AS (SELECT t, COUNT(*) AS n FROM e GROUP BY t),
        |b AS (SELECT x.t AS type_a, y.t AS type_b, COUNT(*) AS users_both
        |  FROM e x JOIN e y ON x.u = y.u AND x.t < y.t GROUP BY 1, 2)
        |SELECT a.t AS type_a, bb.t AS type_b, CAST(a.n AS BIGINT) AS users_a,
        |  CAST(bb.n AS BIGINT) AS users_b,
        |  CAST(COALESCE(b.users_both, 0) AS BIGINT) AS users_both,
        |  CAST(COALESCE(b.users_both, 0) AS DOUBLE) /
        |    CAST(a.n + bb.n - COALESCE(b.users_both, 0) AS DOUBLE) AS jaccard
        |FROM sz a JOIN sz bb ON a.t < bb.t
        |LEFT JOIN b ON b.type_a = a.t AND b.type_b = bb.t
        |ORDER BY type_a, type_b""".stripMargin,

    // 3 unrolled power-iteration CTEs on the round-6 quantized matrix;
    // every step exact decimal multiply-sum + the round-before-cast
    // re-quantization
    "ev_markov3" ->
      """WITH pr AS (SELECT user_id, event_type AS from_type,
        |    LEAD(event_type) OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts), event_id) AS to_type
        |  FROM events),
        |c AS (SELECT from_type, to_type, COUNT(*) AS n FROM pr
        |  WHERE to_type IS NOT NULL GROUP BY 1, 2),
        |t AS (SELECT from_type, CAST(SUM(n) AS BIGINT) AS tot FROM c GROUP BY 1),
        |p AS (SELECT c.from_type, c.to_type,
        |    CAST(round(CAST(c.n AS DOUBLE) / CAST(t.tot AS DOUBLE), 6)
        |      AS DECIMAL(12,6)) AS p6
        |  FROM c JOIN t USING (from_type)),
        |ty AS (SELECT DISTINCT from_type AS et FROM p),
        |k AS (SELECT COUNT(*) AS k FROM ty),
        |i0 AS (SELECT et, CAST(round(CAST(1 AS DOUBLE) / k.k, 6) AS DECIMAL(12,6)) AS pi
        |  FROM ty, k),
        |i1 AS (SELECT p.to_type AS et,
        |    CAST(round(CAST(SUM(i0.pi * p.p6) AS DOUBLE), 6) AS DECIMAL(12,6)) AS pi
        |  FROM i0 JOIN p ON p.from_type = i0.et GROUP BY 1),
        |i2 AS (SELECT p.to_type AS et,
        |    CAST(round(CAST(SUM(i1.pi * p.p6) AS DOUBLE), 6) AS DECIMAL(12,6)) AS pi
        |  FROM i1 JOIN p ON p.from_type = i1.et GROUP BY 1),
        |i3 AS (SELECT p.to_type AS et,
        |    CAST(round(CAST(SUM(i2.pi * p.p6) AS DOUBLE), 6) AS DECIMAL(12,6)) AS pi
        |  FROM i2 JOIN p ON p.from_type = i2.et GROUP BY 1)
        |SELECT et AS event_type, CAST(pi AS DOUBLE) AS pi FROM i3 ORDER BY event_type""".stripMargin,

    // exclusive-prefix decile bucketing over the ranked per-user counts;
    // cumulative share one division
    "ev_lorenz" ->
      """WITH u AS (SELECT user_id, COUNT(*) AS n FROM events
        |  WHERE user_id IS NOT NULL GROUP BY user_id),
        |r AS (SELECT n, ROW_NUMBER() OVER (ORDER BY n DESC, user_id) AS rk FROM u),
        |nu AS (SELECT COUNT(*) AS nu FROM r),
        |b AS (SELECT ((rk - 1) * 10) // nu.nu + 1 AS decile, COUNT(*) AS n_users,
        |    CAST(SUM(n) AS BIGINT) AS n_events
        |  FROM r, nu GROUP BY 1),
        |t AS (SELECT CAST(SUM(n_events) AS BIGINT) AS te FROM b)
        |SELECT CAST(decile AS BIGINT) AS decile, CAST(n_users AS BIGINT) AS n_users,
        |  n_events,
        |  CAST(SUM(n_events) OVER cw AS BIGINT) AS cum_events,
        |  CASE WHEN t.te > 0 THEN CAST(SUM(n_events) OVER cw AS DOUBLE)
        |    / CAST(t.te AS DOUBLE) END AS cum_share
        |FROM b, t
        |WINDOW cw AS (ORDER BY decile ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY decile""".stripMargin,

    // 3-step funnel: per-step per-user min anchors as chained CTEs; the
    // two conversions each one division over the <=3-row count table
    "ev_funnel3" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS tk FROM events
        |  WHERE user_id IS NOT NULL),
        |s1 AS (SELECT user_id, MIN(tk) AS t FROM e WHERE event_type = 'signup'
        |  GROUP BY user_id),
        |s2 AS (SELECT e.user_id, MIN(e.tk) AS t FROM e JOIN s1 ON s1.user_id = e.user_id
        |  WHERE e.event_type = 'click' AND e.tk > s1.t AND e.tk <= s1.t + 86400000000
        |  GROUP BY e.user_id),
        |s3 AS (SELECT e.user_id, MIN(e.tk) AS t FROM e JOIN s2 ON s2.user_id = e.user_id
        |  WHERE e.event_type = 'purchase' AND e.tk > s2.t AND e.tk <= s2.t + 86400000000
        |  GROUP BY e.user_id),
        |c AS (SELECT 1 AS step, 'signup' AS step_name, (SELECT COUNT(*) FROM s1) AS n
        |  UNION ALL SELECT 2, 'click', (SELECT COUNT(*) FROM s2)
        |  UNION ALL SELECT 3, 'purchase', (SELECT COUNT(*) FROM s3))
        |SELECT CAST(step AS BIGINT) AS step, step_name, CAST(n AS BIGINT) AS n_users,
        |  CASE WHEN LAG(n) OVER (ORDER BY step) > 0 THEN
        |    CAST(n AS DOUBLE) / CAST(LAG(n) OVER (ORDER BY step) AS DOUBLE)
        |  END AS conv_from_prev,
        |  CASE WHEN FIRST_VALUE(n) OVER (ORDER BY step) > 0 THEN
        |    CAST(n AS DOUBLE) / CAST(FIRST_VALUE(n) OVER (ORDER BY step) AS DOUBLE)
        |  END AS conv_from_first
        |FROM c ORDER BY step""".stripMargin,

    // first-3 path concat (concat_ws skips the NULL tail in both
    // engines); top-10 by (n_users desc, path)
    "ev_paths" ->
      """WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS tk
        |  FROM events WHERE user_id IS NOT NULL),
        |r AS (SELECT user_id, event_type,
        |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY tk, event_id) AS rn
        |  FROM e),
        |p AS (SELECT user_id, concat_ws('>',
        |    MAX(CASE WHEN rn = 1 THEN event_type END),
        |    MAX(CASE WHEN rn = 2 THEN event_type END),
        |    MAX(CASE WHEN rn = 3 THEN event_type END)) AS path
        |  FROM r WHERE rn <= 3 GROUP BY user_id),
        |c AS (SELECT path, COUNT(*) AS n_users FROM p GROUP BY path)
        |SELECT CAST(rank AS BIGINT) AS rank, path, CAST(n_users AS BIGINT) AS n_users
        |FROM (SELECT path, n_users,
        |    ROW_NUMBER() OVER (ORDER BY n_users DESC, path) AS rank FROM c) q
        |WHERE rank <= 10 ORDER BY rank""".stripMargin,

    // anchor joins mirrored; mean one division over exact integer gaps;
    // percentile <-> quantile_cont (the q22 convention)
    "ev_time_to_convert" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS tk FROM events
        |  WHERE user_id IS NOT NULL),
        |a AS (SELECT user_id, MIN(tk) AS t1 FROM e WHERE event_type = 'signup'
        |  GROUP BY user_id),
        |g AS (SELECT e.user_id, MIN(e.tk) - MIN(a.t1) AS gap
        |  FROM e JOIN a ON a.user_id = e.user_id
        |  WHERE e.event_type = 'click' AND e.tk > a.t1
        |    AND e.tk <= a.t1 + 86400000000
        |  GROUP BY e.user_id)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_converted,
        |  CAST(SUM(gap) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_gap,
        |  quantile_cont(gap, 0.5) AS p50_gap,
        |  quantile_cont(gap, 0.9) AS p90_gap,
        |  CAST(MAX(gap) AS BIGINT) AS max_gap
        |FROM g""".stripMargin,

    // exact rank over per-user counts; the top-decile cut is the same
    // ceil-division on both sides; share one division
    "ev_pareto" ->
      """WITH u AS (SELECT user_id, COUNT(*) AS n FROM events
        |  WHERE user_id IS NOT NULL GROUP BY user_id),
        |r AS (SELECT n, ROW_NUMBER() OVER (ORDER BY n DESC, user_id) AS rk FROM u),
        |t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
        |    CAST(SUM(n) AS BIGINT) AS total_events FROM r),
        |tp AS (SELECT CAST(COUNT(*) AS BIGINT) AS top_users,
        |    CAST(SUM(n) AS BIGINT) AS top_events
        |  FROM r, t WHERE rk <= (t.n_users + 9) // 10)
        |SELECT t.n_users, tp.top_users, tp.top_events, t.total_events,
        |  CASE WHEN t.total_events > 0 THEN
        |    CAST(tp.top_events AS DOUBLE) / CAST(t.total_events AS DOUBLE)
        |  END AS top_share
        |FROM t, tp""".stripMargin,

    // RFM: per-user aggregate, 1-row global max, row-local scoring. The
    // decimal accumulation is exact; `monetary` is EMITTED through one
    // final decimal→double cast (the ev_gap_fill convention — a raw
    // decimal sum's result width is the engine's choice), and the
    // m-score compares that same double against the literals. Scores via
    // CASE WHEN, the join explicit CROSS JOIN — the dialect-stable
    // idioms of the passing ev_ family.
    "ev_rfm" ->
      """WITH u AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS frequency,
        |    CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS monetary,
        |    MAX(epoch_us(ts)) AS mx
        |  FROM events WHERE user_id IS NOT NULL GROUP BY user_id),
        |g AS (SELECT MAX(mx) AS gmx FROM u),
        |s AS (SELECT user_id, (g.gmx - u.mx) // 3600000000 AS recency,
        |    frequency, monetary, COALESCE(monetary, 0.0) AS md
        |  FROM u CROSS JOIN g),
        |sc AS (SELECT user_id, recency, frequency, monetary,
        |    CAST(1 + (CASE WHEN recency <= 14 THEN 1 ELSE 0 END)
        |      + (CASE WHEN recency <= 7 THEN 1 ELSE 0 END)
        |      + (CASE WHEN recency <= 2 THEN 1 ELSE 0 END) AS BIGINT) AS r_score,
        |    CAST(1 + (CASE WHEN frequency >= 60 THEN 1 ELSE 0 END)
        |      + (CASE WHEN frequency >= 66 THEN 1 ELSE 0 END)
        |      + (CASE WHEN frequency >= 73 THEN 1 ELSE 0 END) AS BIGINT) AS f_score,
        |    CAST(1 + (CASE WHEN md >= 2900.0 THEN 1 ELSE 0 END)
        |      + (CASE WHEN md >= 3300.0 THEN 1 ELSE 0 END)
        |      + (CASE WHEN md >= 3650.0 THEN 1 ELSE 0 END) AS BIGINT) AS m_score
        |  FROM s)
        |SELECT user_id, recency, frequency, monetary, r_score, f_score,
        |  m_score, CAST(r_score*100 + f_score*10 + m_score AS BIGINT) AS rfm
        |FROM sc ORDER BY user_id""".stripMargin,
    // Transitions: LEAD over the same (µs, event_id) per-user order; p is
    // one exact-integer division
    "ev_transitions" ->
      """WITH p AS (SELECT user_id, event_type AS from_type,
        |    LEAD(event_type) OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts), event_id) AS to_type
        |  FROM events),
        |c AS (SELECT from_type, to_type, COUNT(*) AS n FROM p
        |  WHERE to_type IS NOT NULL GROUP BY 1, 2),
        |t AS (SELECT from_type, CAST(SUM(n) AS BIGINT) AS tot FROM c GROUP BY 1)
        |SELECT c.from_type, c.to_type, CAST(c.n AS BIGINT) AS n,
        |  CAST(c.n AS DOUBLE) / CAST(t.tot AS DOUBLE) AS p
        |FROM c JOIN t USING (from_type) ORDER BY from_type, to_type""".stripMargin,
    // Funnel: same µs interval arithmetic as the Spark side; the rank
    // window picks the latest touch with the identical DESC tie-break.
    "ev_funnel" ->
      """SELECT user_id, to_id, to_us, from_id, from_us, to_us - from_us AS gap_us FROM (
        |  SELECT t.user_id, t.event_id AS to_id, epoch_us(t.ts) AS to_us,
        |    f.event_id AS from_id, epoch_us(f.ts) AS from_us,
        |    ROW_NUMBER() OVER (PARTITION BY t.event_id
        |      ORDER BY epoch_us(f.ts) DESC, f.event_id DESC) AS rn
        |  FROM events t JOIN events f
        |    ON f.user_id = t.user_id
        |    AND t.event_type = 'purchase' AND f.event_type = 'click'
        |    AND epoch_us(f.ts) < epoch_us(t.ts)
        |    AND epoch_us(f.ts) >= epoch_us(t.ts) - 7200000000
        |) x WHERE rn = 1 ORDER BY to_id""".stripMargin,
    "ev_click_error_join" ->
      """SELECT e.event_id AS error_id, c.event_id AS click_id, e.user_id,
        |  epoch_us(e.ts) AS error_us, epoch_us(c.ts) AS click_us
        |FROM events e JOIN events c
        |  ON e.user_id = c.user_id
        |  AND e.event_type = 'error' AND c.event_type = 'click'
        |  AND epoch_us(c.ts) >= epoch_us(e.ts) - 1800000000
        |  AND epoch_us(c.ts) < epoch_us(e.ts)
        |ORDER BY error_id, click_id""".stripMargin,
    "ev_tumbling" ->
      """SELECT (epoch_us(ts) // 900000000) * 900000000 AS window_start_us,
        |  event_type, COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "ev_sliding" ->
      """SELECT ((epoch_us(ts) // 900000000) - j.j) * 900000000 AS window_start_us,
        |  event_type, COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events CROSS JOIN generate_series(0, 1) j(j)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "ev_sessions" ->
      s"""$sessionsSql
         |ORDER BY user_id, session_start_us""".stripMargin,
    "ev_session_histogram" ->
      s"""WITH s AS ($sessionsSql),
         |pu AS (SELECT user_id, COUNT(*) AS n_sessions FROM s GROUP BY user_id)
         |SELECT n_sessions, COUNT(*) AS n_users FROM pu
         |GROUP BY n_sessions ORDER BY n_sessions""".stripMargin,
    // Changelog apply: snapshot(before cutoff) + changes(after) folded by
    // the op must equal latest-over-everything minus tombstoned keys —
    // the merge identity, expressed directly.
    "ev_apply_changes" ->
      """SELECT user_id, event_id, ts_us, event_type, value FROM (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type, value,
        |    ROW_NUMBER() OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
        |  FROM events) x
        |WHERE rn = 1 AND event_type <> 'error' ORDER BY user_id""".stripMargin,
    // Attribution: identical range predicate and (ts, id) rank; weight is
    // integer floor division — no fractional credit FP anywhere.
    "ev_attribution" ->
      """WITH c AS (SELECT user_id, event_id AS conv_id, epoch_us(ts) AS conv_ts
        |  FROM events WHERE event_type = 'purchase'),
        |tc AS (SELECT user_id, event_id AS touch_id, epoch_us(ts) AS touch_ts
        |  FROM events WHERE event_type = 'click'),
        |p AS (SELECT c.conv_id, tc.touch_id, tc.touch_ts
        |  FROM c JOIN tc ON c.user_id = tc.user_id
        |    AND tc.touch_ts <= c.conv_ts
        |    AND tc.touch_ts > c.conv_ts - 259200000000)
        |SELECT conv_id, touch_id,
        |  CAST(ROW_NUMBER() OVER w AS BIGINT) AS pos,
        |  CAST(COUNT(*) OVER (PARTITION BY conv_id) AS BIGINT) AS k,
        |  CAST(10000 // (COUNT(*) OVER (PARTITION BY conv_id)) AS BIGINT)
        |    AS weight_bp
        |FROM p
        |WINDOW w AS (PARTITION BY conv_id ORDER BY touch_ts, touch_id)
        |ORDER BY conv_id, pos""".stripMargin,
    // Keyless range join: the oracle is the plain theta join the binned
    // op must reproduce pair-for-pair (binning is invisible in output).
    "ev_range_join" ->
      """WITH c AS (SELECT event_id AS click_id, epoch_us(ts) AS click_us
        |  FROM events WHERE event_type = 'click'),
        |e AS (SELECT event_id AS err_id, epoch_us(ts) - 1800000000 AS lo_us,
        |    epoch_us(ts) AS hi_us
        |  FROM events WHERE event_type = 'error')
        |SELECT c.click_id, c.click_us, e.err_id, e.lo_us, e.hi_us
        |FROM c JOIN e ON c.click_us >= e.lo_us AND c.click_us <= e.hi_us
        |ORDER BY click_id, err_id""".stripMargin)
}
