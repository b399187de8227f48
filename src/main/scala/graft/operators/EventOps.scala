package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch event-history analytics that need a GLOBAL per-user reduction
  * (first-seen cohorts), complementing the incremental shapes in
  * [[graft.streaming.StreamOps]] — a cohort is defined by the minimum over
  * a user's whole history, so unlike sessions/funnels it has no
  * watermark-bounded streaming twin.
  */
object EventOps {

  /** Microseconds in one epoch-aligned week. */
  private val WeekUs = 7L * 24 * 3600 * 1000000L

  /** Cohort retention matrix: users grouped by their first-seen week
    * (epoch-aligned, so both engines bucket identically with integer
    * division — no calendar/timezone arithmetic), counted in every later
    * week they return. The product-analytics "week N retention" table.
    *
    * Scale shape: the corpus reduces IMMEDIATELY to distinct
    * (user_id, week) — bounded by users × weeks, not by event count, with
    * map-side partial dedup. The cohort minimum is a window over the SAME
    * user_id hash partitioning (one exchange serves both), and the final
    * aggregate's output is weeks² rows. Raw events never shuffle.
    *
    * `tsUs` must be microseconds since epoch (the gate passes
    * `ts div 1000` over the int64-nanos parquet column). Because the
    * input to the count is the distinct (user, week) set, `count(*)`
    * IS the distinct-user count — no countDistinct state needed.
    */
  def cohortRetention(events: DataFrame, tsUs: org.apache.spark.sql.Column)
      : DataFrame = {
    val e = OpContract.requireCols(events, "EventOps.cohortRetention", "user_id")
    val uw = e.select(col("user_id"),
        call_function("div", tsUs, lit(WeekUs)).as("week"))
      .distinct()
    uw.withColumn("cohort_week",
        min(col("week")).over(Window.partitionBy("user_id")))
      .groupBy(col("cohort_week"),
        (col("week") - col("cohort_week")).as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** TIME-TO-NEXT-ACTION dwell latency per event type — "after a user
    * does X, how long until they do ANYTHING next": for every event, the
    * gap to the same user's next event (per-user `(us, event_id)` order,
    * the [[transitionCounts]] sequencing contract), aggregated per the
    * FROM event's type. The engagement-cadence panel next to
    * [[transitionCounts]]' "where do they go" — this is "how fast".
    * Output: `(event_type, n_gaps, min_gap_us, max_gap_us, mean_gap_us)`.
    *
    * `tsUs` must be microseconds since epoch (the gate passes
    * `ts div 1000` over the int64-nanos column — gaps are computed on
    * the µs values themselves so both engines difference identical
    * integers, the cohortRetention convention). Exactness: gaps and
    * min/max are exact longs, the sum a DECIMAL(38,0), the mean ONE
    * division. Scale shape: one user_id hash exchange for the lead
    * window (users sequence in parallel), then a map-side-combined
    * aggregate to ≤\|types\| rows; events shuffle once as
    * (user, us, id, type) — no payload.
    */
  def dwellReport(events: DataFrame, tsUs: org.apache.spark.sql.Column): DataFrame = {
    val e = OpContract.requireCols(events, "EventOps.dwellReport",
      "user_id", "event_id", "event_type")
    val dec = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0)
    val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
    val gaps = e.select(col("user_id"), tsUs.as("us"), col("event_id"),
        col("event_type"))
      .withColumn("next_us", lead(col("us"), 1).over(w))
      .filter(col("next_us").isNotNull)
      .withColumn("gap_us", col("next_us") - col("us"))
    gaps.groupBy("event_type")
      .agg(count(lit(1)).as("n_gaps"),
        min(col("gap_us")).as("min_gap_us"),
        max(col("gap_us")).as("max_gap_us"),
        sum(col("gap_us").cast(dec)).as("gsum"))
      .select(col("event_type"), col("n_gaps"), col("min_gap_us"),
        col("max_gap_us"),
        (col("gsum").cast("double") / col("n_gaps").cast("double"))
          .as("mean_gap_us"))
      .orderBy("event_type")
  }

  /** BURSTINESS of the inter-event process per event type — the
    * traffic-pattern audit next to [[dwellReport]]'s "how fast"
    * (Goh–Barabási '08): from the same per-user next-event gaps,
    * the squared coefficient of variation cv² = (n·Σg² − (Σg)²)/(Σg)²
    * and B = (cv − 1)/(cv + 1) ∈ (−1, 1) — a Poisson process sits at
    * B ≈ 0, B → 1 is bursty (machine retries, scraper storms,
    * incident-driven traffic), B → −1 is a metronome (cron/heartbeat
    * traffic posing as users). Emits
    * `(event_type, n_gaps, mean_gap_us, cv2, burstiness)`.
    *
    * FP discipline: gap moments are exact DECIMAL(38,0); cv² is ONE
    * division of exact integers; B is the mirrored √ → (two one-op
    * sums) → ÷ chain on engine-identical inputs (no a·b+c shape).
    * Scale shape: the [[dwellReport]] plan — one user-partitioned lead
    * window, then a map-side-combined aggregate to ≤\|types\| rows.
    */
  def burstinessReport(events: DataFrame,
      tsUs: org.apache.spark.sql.Column): DataFrame = {
    val e = OpContract.requireCols(events, "EventOps.burstinessReport",
      "user_id", "event_id", "event_type")
    val dec = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0)
    val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
    val gaps = e.select(col("user_id"), tsUs.as("us"), col("event_id"),
        col("event_type"))
      .withColumn("next_us", lead(col("us"), 1).over(w))
      .filter(col("next_us").isNotNull)
      .withColumn("g", col("next_us") - col("us"))
    val agg = gaps.groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(col("g").cast(dec)).as("sg"),
        sum(col("g").cast(dec) * col("g")).as("qg"))
    val cv2 = when(col("sg") > 0,
      (col("n").cast(dec) * col("qg") - col("sg") * col("sg")).cast("double") /
        (col("sg") * col("sg")).cast("double"))
    val b = when(cv2.isNotNull,
      (sqrt(cv2) - lit(1.0)) / (sqrt(cv2) + lit(1.0)))
    agg.select(col("event_type"), col("n").as("n_gaps"),
        (col("sg").cast("double") / col("n").cast("double")).as("mean_gap_us"),
        cv2.as("cv2"), b.as("burstiness"))
      .orderBy("event_type")
  }

  /** RFM SEGMENTATION — the classic recency/frequency/monetary user
    * scoring (Hughes '94) behind lifecycle cohorts and churn targeting:
    * per user, recency = whole `unitTicks` units between the user's last
    * event and the corpus-latest event, frequency = event count, monetary
    * = exact decimal sum of `valueCol`; each metric scores 1–4 against
    * the caller's three cutpoints (recency lower-is-better, the others
    * higher), and `rfm` packs them as r·100 + f·10 + m (111…444). The
    * cutpoints are CONFIG — derive data-driven quartiles with
    * [[graft.operators.SketchOps.exactQuantileRefine]] over this
    * function's own per-user aggregate and pass them back in (the spec
    * pins that composition); fixed business thresholds work unchanged.
    *
    * FP discipline: frequency/recency are exact integers; monetary
    * quantizes each double ONCE to DECIMAL(28,6) ([[AuditOps.winsorize]]'s
    * order-independent accumulation), accumulates exactly, and is
    * EMITTED through one final decimal→double cast (the battery-wide
    * convention — a raw decimal sum's result width is the engine's
    * choice, so cross-engine decimal output is not portable); the
    * m-score compares that same correctly-rounded double against the
    * literal cutpoints — every comparison engine-stable. All-null users
    * score m via COALESCE(·, 0).
    *
    * Scale shape: ONE map-side-combined per-user aggregation (no window
    * — the corpus never sorts), a 1-row global-max broadcast crossJoin,
    * then row-local scoring. At 10⁹ users the output is the user table,
    * partitioned by the groupBy hash — nothing unpartitioned anywhere.
    */
  def rfmReport(events: DataFrame, tsTicks: Column, userCol: String,
      valueCol: String, unitTicks: Long,
      cutR: (Long, Long, Long), cutF: (Long, Long, Long),
      cutM: (Double, Double, Double)): DataFrame = {
    OpContract.requireCols(events, "EventOps.rfmReport", userCol, valueCol)
    require(unitTicks >= 1L, s"rfmReport: unitTicks >= 1, got $unitTicks")
    require(cutR._1 <= cutR._2 && cutR._2 <= cutR._3 &&
      cutF._1 <= cutF._2 && cutF._2 <= cutF._3 &&
      cutM._1 <= cutM._2 && cutM._2 <= cutM._3,
      "rfmReport: cutpoints must be ascending per metric")
    val dec = org.apache.spark.sql.types.DataTypes.createDecimalType(28, 6)
    val u = events.filter(col(userCol).isNotNull)
      .select(col(userCol).cast("long").as("user_id"),
        tsTicks.cast("long").as("tsn"), col(valueCol).cast(dec).as("v"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("frequency"), sum(col("v")).as("monetary"),
        max(col("tsn")).as("mx"))
      // the user table feeds BOTH the global max and the scored output —
      // without the (lazy) checkpoint each side re-aggregates the raw
      // events, doubling the corpus scan (the cmsHeavyHitters pattern)
      .localCheckpoint(false)
    val gmax = u.agg(max(col("mx")).as("gmx"))
    val md = coalesce(col("monetary").cast("double"), lit(0.0))
    val rScore = lit(1L) + (col("recency") <= cutR._3).cast("long") +
      (col("recency") <= cutR._2).cast("long") +
      (col("recency") <= cutR._1).cast("long")
    val fScore = lit(1L) + (col("frequency") >= cutF._1).cast("long") +
      (col("frequency") >= cutF._2).cast("long") +
      (col("frequency") >= cutF._3).cast("long")
    val mScore = lit(1L) + (md >= cutM._1).cast("long") +
      (md >= cutM._2).cast("long") + (md >= cutM._3).cast("long")
    u.crossJoin(broadcast(gmax))
      .withColumn("recency",
        call_function("div", col("gmx") - col("mx"), lit(unitTicks)))
      .select(col("user_id"), col("recency"), col("frequency"),
        col("monetary").cast("double").as("monetary"),
        rScore.as("r_score"), fScore.as("f_score"), mScore.as("m_score"))
      .withColumn("rfm",
        col("r_score") * 100L + col("f_score") * 10L + col("m_score"))
      .orderBy("user_id")
  }

  /** First-order Markov TRANSITION MATRIX of user journeys: for each
    * ordered pair of event types, how many times a user's event of
    * `from_type` was IMMEDIATELY followed by one of `to_type` (per-user
    * `(ts, event_id)` order — the same deterministic sequencing contract
    * as [[graft.operators.AuditOps.anomalyVerdicts]]), plus the row-
    * normalized transition probability `p = n / Σ_to n`. The product-
    * analytics "where do users go next" panel, and the input to
    * journey-simulation / next-event-prediction baselines.
    *
    * Scale shape: ONE hash exchange on user_id for the lag window (groups
    * rank in parallel — sessions are independent), then a map-side-
    * combined aggregate straight down to the ≤\|types\|² transition
    * table; the per-from normalizer joins broadcast over that bounded
    * table. Raw events shuffle once, as (user, ts, id, type) — no payload.
    * FP: counts exact, `p` a single exact-integer division.
    */
  def transitionCounts(events: DataFrame): DataFrame = {
    val e = OpContract.requireCols(events, "EventOps.transitionCounts",
      "user_id", "ts", "event_id", "event_type")
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val pairs = e
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("from_type"))
      .withColumn("to_type", lead(col("from_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
    val cnt = pairs.groupBy("from_type", "to_type").agg(count(lit(1)).as("n"))
    val totals = cnt.groupBy("from_type").agg(sum(col("n")).as("tot"))
    cnt.join(broadcast(totals), Seq("from_type"))
      .select(col("from_type"), col("to_type"), col("n"),
        (col("n").cast("double") / col("tot").cast("double")).as("p"))
  }

  /** CDC changelog apply (the batch MERGE / snapshot-refresh pattern):
    * fold a change batch into an existing keyed snapshot — per key, the
    * row greatest by `ord` across snapshot ∪ changes survives; a
    * surviving row matching `tombstone` deletes the key. This is what a
    * nightly refresh of a CDC-ingested table runs, and the batch twin of
    * the keyed state [[graft.streaming.StreamOps.latestByKey]] documents.
    *
    * Unlike latestByKey's per-key window (sorts every key group), the
    * merge here is ONE map-side-combinable `max_by` hash aggregate: at
    * 100 TB snapshot + small delta the partial aggregation collapses each
    * mapper's rows to one candidate per key before anything shuffles —
    * no sort, no windowed rank. `ord` must be a TOTAL order (include a
    * unique id as the last column) or ties pick an arbitrary survivor;
    * the gate passes (ts_us, event_id). Both inputs must share the
    * snapshot's schema (changes carry the same columns a stored row has).
    *
    * Determinism/FP: the survivor is selected by exact struct comparison
    * on integer ordering columns; no arithmetic at all.
    */
  def applyChangelog(snapshot: DataFrame, changes: DataFrame,
      keys: Seq[String], ord: Seq[org.apache.spark.sql.Column],
      tombstone: org.apache.spark.sql.Column): DataFrame = {
    require(keys.nonEmpty && ord.nonEmpty, "applyChangelog needs keys and ordering columns")
    val snap = OpContract.requireCols(snapshot, "EventOps.applyChangelog", keys: _*)
    val all = snap.unionByName(changes)
    val row = struct(all.columns.toIndexedSeq.map(col): _*)
    all.groupBy(keys.map(col): _*)
      .agg(max_by(row, struct(ord: _*)).as("r"))
      .select(col("r.*"))
      // three-valued logic: a NULL tombstone verdict means the row did NOT
      // match the delete predicate — it must survive, not be dropped
      .filter(coalesce(!tombstone, lit(true)))
  }

  /** Linear multi-touch attribution: each `convType` conversion is joined
    * to the SAME user's `touchType` events inside the lookback window
    * `(conv_ts − windowUs, conv_ts]`, every touch ranked by event time and
    * credited equally. The marketing-analytics companion of the as-of
    * join (q20 credits only the latest touch; this op splits credit over
    * all of them). Conversions with zero in-window touches emit nothing.
    *
    * Output per (conversion, touch): `conv_id, touch_id, pos` (1-based in
    * (ts, id) order), `k` (touch count), `weight_bp` (floor of 10000/k —
    * basis points; floor-division of positive integers is engine-exact,
    * unlike a decimal 1/k).
    *
    * Scale shape: per-user pair volume is bounded by the lookback
    * window, so output is ∝ events, not events². The rank/count window
    * partitions by (user_id, conv_id), and hash(user_id) satisfies that
    * clustering — so in the large-corpus regime (both sides shuffle-join
    * on user_id) the window adds a sort but NO second exchange (pinned in
    * PlanSpec with broadcast off); when the touch side is small enough to
    * broadcast, the window's hash exchange is the plan's ONLY shuffle.
    * Either way the pairs shuffle at most once.
    * FP: pure integer timestamps/counts; no floating point anywhere.
    */
  def attribution(events: DataFrame, convType: String, touchType: String,
      windowUs: Long): DataFrame = {
    val e = OpContract.requireCols(events, "EventOps.attribution",
      "user_id", "ts", "event_id", "event_type")
    val tsUs = call_function("div", col("ts").cast("long"), lit(1000L))
    val convs = e.filter(col("event_type") === convType)
      .select(col("user_id"), col("event_id").as("conv_id"), tsUs.as("conv_ts"))
    val touches = e.filter(col("event_type") === touchType)
      .select(col("user_id").as("t_user"), col("event_id").as("touch_id"),
        tsUs.as("touch_ts"))
    val w = Window.partitionBy(col("user_id"), col("conv_id"))
    val paired = convs.join(touches,
      col("user_id") === col("t_user") &&
        col("touch_ts") <= col("conv_ts") &&
        col("touch_ts") > col("conv_ts") - lit(windowUs))
    paired
      .withColumn("pos",
        row_number().over(w.orderBy(col("touch_ts"), col("touch_id")))
          .cast("long"))
      .withColumn("k", count(lit(1)).over(w))
      .select(col("conv_id"), col("touch_id"), col("pos"), col("k"),
        call_function("div", lit(10000L), col("k")).as("weight_bp"))
  }

  /** Time-series GAP FILL: daily per-group aggregates re-spined onto the
    * complete day range, missing days materialized with zero counts and a
    * forward-filled carry of the last observed sum — the regularization
    * step before any windowed trend/anomaly model consumes an event feed
    * (a day with no rows is DATA, and silently skipping it shifts every
    * lag/window downstream).
    *
    * Output per (group, day) for EVERY day in the global [min, max] span:
    * `(event_type, day, n, day_sum, ffill_sum)` — `n = 0` on gap days,
    * `day_sum` NULL on gaps, `ffill_sum` the last non-NULL `day_sum` at
    * or before the day (NULL before a group's first observation).
    *
    * Scale shape: events reduce IMMEDIATELY to (group, day) aggregates —
    * bounded by groups × days, not event count, map-side combined. The
    * spine is groups × days rows built from a 1-row min/max broadcast
    * (`sequence` + explode); the forward fill is a window over the SAME
    * bounded table, partitioned by group. Raw events never shuffle.
    *
    * Exactness: counts are integers; `day_sum` fixes each addend as
    * DECIMAL(28,6) before summation (order-independent), emitted as one
    * double cast; the forward fill copies those exact values.
    */
  def gapFill(events: DataFrame, tsUs: Column): DataFrame = {
    OpContract.requireCols(events, "EventOps.gapFill", "event_type", "value")
    val dayUs = 86400000000L
    val dec = org.apache.spark.sql.types.DataTypes.createDecimalType(28, 6)
    val base = events.select(col("event_type"),
      call_function("div", tsUs, lit(dayUs)).as("day"), col("value"))
    val daily = base.groupBy("event_type", "day")
      .agg(count(col("value")).as("n"),
        sum(col("value").cast(dec)).cast("double").as("day_sum"))
    val span = base.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
    val spine = daily.select(col("event_type")).distinct()
      .crossJoin(broadcast(span))
      .select(col("event_type"), explode(sequence(col("lo"), col("hi"))).as("day"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, 0)
    spine.join(daily, Seq("event_type", "day"), "left")
      .na.fill(0L, Seq("n"))
      .withColumn("ffill_sum", last(col("day_sum"), ignoreNulls = true).over(w))
  }

  /** Trailing N-day ROLLING aggregates per group — a RANGE window frame
    * over the day VALUE, not a rows frame: a missing day simply isn't in
    * the frame, so the rolling sum is correct over sparse histories
    * without a gap-fill pass (compose with [[gapFill]] only when the
    * output must carry the empty days too). The windowed-trend input
    * every ops dashboard and anomaly baseline consumes.
    *
    * Scale shape: events reduce IMMEDIATELY to (group, day) daily
    * aggregates (map-side combined, bounded by groups × days); the range
    * window runs over that bounded table, partitioned by group. Raw
    * events never shuffle. Exactness: counts are integers; sums fix each
    * addend as DECIMAL(28,6) pre-aggregation, and the rolling decimal
    * sum is cast to double once on emission.
    */
  def rollingDaily(events: DataFrame, tsUs: Column, windowDays: Int = 7): DataFrame = {
    require(windowDays >= 1, s"windowDays >= 1, got $windowDays")
    OpContract.requireCols(events, "EventOps.rollingDaily", "event_type", "value")
    val dayUs = 86400000000L
    val dec = org.apache.spark.sql.types.DataTypes.createDecimalType(28, 6)
    val daily = events
      .select(col("event_type"),
        call_function("div", tsUs, lit(dayUs)).as("day"), col("value"))
      .groupBy("event_type", "day")
      .agg(count(col("value")).as("n"), sum(col("value").cast(dec)).as("dsum"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rangeBetween(-(windowDays - 1L), 0L)
    daily.select(col("event_type"), col("day"), col("n"),
      col("dsum").cast("double").as("day_sum"),
      sum(col("n")).over(w).as("roll_n"),
      sum(col("dsum")).over(w).cast("double").as("roll_sum"))
  }

  /** PSEUDONYMIZATION: replace identifier columns with salted-hash tokens
    * — the privacy step a training-data pipeline runs before events leave
    * the trust boundary. Each listed column becomes
    * `md5(salt ‖ ':' ‖ value)` (hex string; NULL stays NULL, so
    * completeness audits still see the gap). Deterministic per
    * (salt, value): the same user maps to the same token across tables
    * and days — joins, retention, and funnel analyses still work on the
    * tokens — while rotating the salt unlinks every released dataset
    * from the previous one. The ':' separator makes the preimage framing
    * unambiguous (salt "ab" + id "1" cannot collide with "a" + "b1").
    *
    * This is PSEUDONYMIZATION (GDPR art. 4(5)), not anonymization: the
    * salt holder can re-identify; treat the salt as key material.
    *
    * Scale shape: a pure projection — codegen'd md5 per row, no shuffle,
    * no model state. Cross-engine: md5 of the same bytes is identical
    * everywhere (DuckDB: `md5('salt:' || CAST(x AS VARCHAR))`).
    */
  def pseudonymize(df: DataFrame, keyCols: Seq[String], salt: String): DataFrame = {
    require(keyCols.nonEmpty, "pseudonymize needs at least one key column")
    OpContract.requireCols(df, "EventOps.pseudonymize", keyCols: _*)
    keyCols.foldLeft(df) { (acc, c) =>
      acc.withColumn(c,
        when(col(c).isNotNull,
          md5(concat(lit(salt), lit(":"), col(c).cast("string")))))
    }
  }

  /** Markov REMOVAL-EFFECT attribution (Anderl et al. '14 — the
    * principled multi-touch model; [[attribution]] is the last-touch
    * heuristic, this credits channels by how much conversion probability
    * DISAPPEARS when the channel is removed from the journey graph):
    * per-user journeys become a first-order chain START → touches →
    * CONV/DROP (absorbing); channel c's removal effect is
    * `1 − P(CONV | transitions through c redirected to DROP)/P(CONV)`,
    * and `share` normalizes the effects over channels. Returns
    * `(channel, removal_effect, share)` plus the baseline row
    * `("__p_conv__", P(CONV), NULL)` so callers can audit the chain.
    *
    * Distributed/driver split (the trainCentroids model-state class):
    * journeys reduce on the CLUSTER to the ≤(\|types\|+2)² transition-
    * count table (the [[transitionCounts]] machinery with synthetic
    * START/absorbing ends — raw events shuffle once on user_id); the
    * absorbing-chain solves run on the DRIVER over that bounded matrix
    * (fixed-point iteration, deterministic order and iteration count, so
    * results are reproducible across runs/partitionings). Conversions
    * END a journey: post-conversion touches start a NEW journey (the
    * standard convention; documented).
    *
    * No DuckDB gate: the solve is a driver-side matrix fixed point, not
    * a SQL expression — spec-tested against hand-solved chains instead
    * (the sink/source convention).
    */
  def markovAttribution(events: DataFrame, convType: String,
      iters: Int = 200): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val e = OpContract.requireCols(events, "EventOps.markovAttribution",
      "user_id", "ts", "event_id", "event_type")
    val w = Window.partitionBy("user_id", "journey").orderBy(col("ts"), col("event_id"))
    // journey index: conversions close a journey, so a user's events
    // split at each conversion (cumulative conv count of PRECEDING rows)
    val uw = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val journeys = e
      .withColumn("journey",
        coalesce(sum(when(col("event_type") === convType, 1L).otherwise(0L))
          .over(uw), lit(0L)))
    val steps = journeys
      .select(col("user_id"), col("journey"), col("ts"), col("event_id"),
        col("event_type").as("from_type"))
      .withColumn("to_type", lead(col("from_type"), 1).over(w))
      .select(col("from_type"),
        // a journey's last event transitions to CONV if it IS the
        // conversion, else the journey dangles -> DROP
        when(col("to_type").isNotNull, col("to_type"))
          .when(col("from_type") === convType, lit("__conv__"))
          .otherwise(lit("__drop__")).as("to_type"))
      // conversions are absorbing: their own outgoing row is the CONV edge
      .withColumn("to_type",
        when(col("from_type") === convType, lit("__conv__"))
          .otherwise(col("to_type")))
    val starts = journeys
      .groupBy("user_id", "journey")
      .agg(min_by(col("event_type"), struct(col("ts"), col("event_id"))).as("to_type"))
      .select(lit("__start__").as("from_type"), col("to_type"))
    val counts = steps.unionAll(starts)
      .filter(col("from_type") =!= convType || col("to_type") === "__conv__")
      .groupBy("from_type", "to_type").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // driver-side bounded solve
    val froms = counts.keys.map(_._1).toSet
    val channels = (froms ++ counts.keys.map(_._2))
      .filterNot(Set("__start__", "__conv__", "__drop__", convType)).toSeq.sorted
    val outTot = counts.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    def pConv(removed: Option[String]): Double = {
      // v(s) = P(absorb in CONV from s); CONV=1, DROP=0; fixed point of
      // v = P·v with removed channel's INCOMING edges sent to DROP
      var v = Map[String, Double]().withDefaultValue(0.0)
      (0 until iters).foreach { _ =>
        v = froms.map { s =>
          val tot = outTot(s).toDouble
          val x = counts.collect {
            case ((`s`, t), n) =>
              val p = n / tot
              val tEff = if (removed.contains(t)) "__drop__" else t
              tEff match {
                case "__conv__" => p
                case "__drop__" => 0.0
                case other => p * v(other)
              }
          }.sum
          s -> x
        }.toMap.withDefaultValue(0.0)
      }
      v("__start__")
    }
    val base = pConv(None)
    val effects = channels.map { c =>
      val without = pConv(Some(c))
      c -> (if (base > 0) 1.0 - without / base else 0.0)
    }
    val totEff = effects.map(_._2).sum
    val rows = effects.map { case (c, eff) =>
      (c, eff, if (totEff > 0) Some(eff / totEff) else None)
    } :+ (("__p_conv__", base, Option.empty[Double]))
    rows.toDF("channel", "removal_effect", "share")
      .select(col("channel"), col("removal_effect"),
        col("share").as("share"))
      .orderBy("channel")
  }

  /** DAU/WAU STICKINESS per day — the engagement-frequency ratio next
    * to [[growthAccounting]]'s composition ("of the people active this
    * week, what share showed up today"): per day d in the corpus span,
    * `dau` = distinct users that day and `wau` = distinct users over
    * the trailing 7 days [d−6, d], stickiness = dau/wau (1/7 = weekly
    * habit, →1 = daily habit). Exact distinct counts — each (user, day)
    * presence contributes to the 7 windows it falls in by an explode,
    * and the per-window distinct collapses duplicates.
    * Emits `(day, dau, wau, stickiness)` for every day in
    * [min_day, max_day]; days with no events carry dau = 0 and the
    * trailing wau.
    *
    * Exactness: counts exact, stickiness ONE division (NULL when wau=0).
    * Scale shape: events reduce to the distinct (user, day) set first
    * (map-side combined); the ×7 window explode and second distinct
    * move 16-byte pairs — 7× the reduced set, linear in users·days, no
    * corpus-sized window anywhere. The day spine is a driver-bounded
    * sequence from a 1-row min/max aggregate.
    */
  def stickinessReport(events: DataFrame, tsUs: org.apache.spark.sql.Column)
      : DataFrame = {
    val e = OpContract.requireCols(events, "EventOps.stickinessReport", "user_id")
    val dayUs = 86400000000L
    val ud = e.select(col("user_id"),
        call_function("div", tsUs, lit(dayUs)).as("day"))
      .distinct()
    val span = ud.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    val spine = span.select(explode(sequence(col("d0"), col("d1"))).as("day"))
    val dau = ud.groupBy("day").agg(count(lit(1)).as("dau"))
    val wau = ud
      .select(col("user_id"), explode(sequence(col("day"),
        col("day") + 6L)).as("day"))
      .distinct()
      .groupBy("day").agg(count(lit(1)).as("wau"))
    spine.join(dau, Seq("day"), "left").join(wau, Seq("day"), "left")
      .select(col("day"), coalesce(col("dau"), lit(0L)).as("dau"),
        coalesce(col("wau"), lit(0L)).as("wau"))
      .withColumn("stickiness", when(col("wau") > 0,
        col("dau").cast("double") / col("wau").cast("double")))
      .orderBy("day")
  }

  /** COHORT LTV CURVE — [[cohortRetention]] with money: per (cohort
    * week, week offset), the active-user count AND the exact revenue
    * those users generated that week, plus the running cumulative
    * LTV-per-cohort-user — the curve a payback-period decision reads
    * ("week-N revenue per user acquired in week W"). Emits
    * `(cohort_week, week_offset, n_users, revenue, cum_revenue,
    * cum_ltv_per_user)` where the cohort size (offset-0 user count)
    * divides the cumulative ONCE.
    *
    * Exactness: revenue quantizes each value ONCE to DECIMAL(28,6)
    * ([[rfmReport]]'s order-independent accumulation); the cumulative
    * runs over the bounded (cohort × offset) table; both emitted
    * doubles are single divisions/casts of exact decimals.
    *
    * Scale shape: events reduce to (user, week, decimal revenue)
    * map-side, the cohort tag is one per-user min window over the
    * reduced set, and everything after is ≤\|cohorts × offsets\| rows —
    * the [[cohortRetention]] plan with one extra decimal column.
    */
  def cohortLtv(events: DataFrame, tsUs: org.apache.spark.sql.Column,
      valueCol: String): DataFrame = {
    val e = OpContract.requireCols(events, "EventOps.cohortLtv",
      "user_id", valueCol)
    val dec = org.apache.spark.sql.types.DataTypes.createDecimalType(28, 6)
    val uw = e.select(col("user_id"),
        call_function("div", tsUs, lit(WeekUs)).as("week"),
        coalesce(col(valueCol), lit(0.0)).cast(dec).as("v"))
      .groupBy("user_id", "week").agg(sum(col("v")).as("v"))
    val tagged = uw.withColumn("cohort_week",
      min(col("week")).over(Window.partitionBy("user_id")))
    val cells = tagged
      .groupBy(col("cohort_week"), (col("week") - col("cohort_week")).as("week_offset"))
      .agg(count(lit(1)).as("n_users"), sum(col("v")).as("rev"))
    val wcum = Window.partitionBy("cohort_week").orderBy("week_offset")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wsize = Window.partitionBy("cohort_week")
      .orderBy("week_offset")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    cells
      .withColumn("cum_rev", sum(col("rev")).over(wcum))
      .withColumn("cohort_size", first(col("n_users")).over(wsize))
      .select(col("cohort_week"), col("week_offset"), col("n_users"),
        col("rev").cast("double").as("revenue"),
        col("cum_rev").cast("double").as("cum_revenue"),
        (col("cum_rev").cast("double") / col("cohort_size").cast("double"))
          .as("cum_ltv_per_user"))
      .orderBy("cohort_week", "week_offset")
  }

  /** GROWTH ACCOUNTING per week — the new/retained/resurrected/churned
    * decomposition (the "quick ratio" inputs) every DAU/WAU dashboard is
    * built from: over the distinct (user, week) presence set (the
    * [[cohortRetention]] reduction), each presence classifies by the
    * user's PREVIOUS presence week — `new` (none), `retained` (exactly
    * the week before), `resurrected` (a gap) — and a user present at
    * week w with no presence at w+1 contributes `churned` to week w+1
    * (capped at the corpus max week: churn past the observation horizon
    * is unknowable, not zero). Emits per week:
    * `(week, n_new, n_retained, n_resurrected, n_churned)`.
    *
    * Identity the spec pins: active(w) = new + retained + resurrected,
    * and retained(w) = active(w−1) − churned(w). All counts exact.
    *
    * Scale shape: events reduce to the distinct (user, week) set FIRST
    * (map-side combined); the lag/lead run in one window over that set,
    * partitioned by user (per-user week lists are tiny and sort in
    * parallel); contributions re-aggregate to ≤|weeks| rows. The corpus
    * max week is a 1-row broadcast. Same 100 TB shape as
    * [[cohortRetention]] — nothing global ever sorts.
    */
  def growthAccounting(events: DataFrame, tsUs: org.apache.spark.sql.Column)
      : DataFrame = {
    val e = OpContract.requireCols(events, "EventOps.growthAccounting", "user_id")
    val uw = e.select(col("user_id"),
        call_function("div", tsUs, lit(WeekUs)).as("week"))
      .distinct()
    val w = Window.partitionBy("user_id").orderBy("week")
    val seq0 = uw
      .withColumn("prev", lag(col("week"), 1).over(w))
      .withColumn("nxt", lead(col("week"), 1).over(w))
      .crossJoin(broadcast(uw.agg(max(col("week")).as("max_week"))))
    val present = seq0.select(col("week"),
      when(col("prev").isNull, 1L).otherwise(0L).as("n_new"),
      when(col("prev") === col("week") - 1, 1L).otherwise(0L).as("n_retained"),
      when(col("prev").isNotNull && col("prev") < col("week") - 1, 1L)
        .otherwise(0L).as("n_resurrected"),
      lit(0L).as("n_churned"))
    val churned = seq0
      .filter((col("nxt").isNull || col("nxt") > col("week") + 1) &&
        col("week") + 1 <= col("max_week"))
      .select((col("week") + 1).as("week"), lit(0L).as("n_new"),
        lit(0L).as("n_retained"), lit(0L).as("n_resurrected"),
        lit(1L).as("n_churned"))
    present.unionAll(churned).groupBy("week")
      .agg(sum("n_new").as("n_new"), sum("n_retained").as("n_retained"),
        sum("n_resurrected").as("n_resurrected"),
        sum("n_churned").as("n_churned"))
      .orderBy("week")
  }

  /** Decade bucket edges in µs (1 µs … 10¹¹ µs ≈ 28 h) for
    * [[hazardReport]] — shared verbatim with the SQL oracle so the
    * bucket index is a pure chain of integer comparisons in both
    * engines. Bucket of t = #{k : t ≥ 10^k} ∈ 0..12.
    */
  val DecadeUs: Seq[Long] = (0 to 11).map(k => math.pow(10, k).toLong)

  /** DISCRETE-TIME HAZARD table per event type — the Kaplan–Meier
    * ingredient panel for "how quickly does the next action happen, and
    * does that decay": per user, the gap to the next event (the
    * [[dwellReport]] sequencing contract) is an OBSERVED time; each
    * user's LAST event contributes a RIGHT-CENSORED time (corpus-max ts
    * − last event ts — still alive, next action not yet seen), so the
    * risk sets are honest instead of survivor-biased. Times discretize
    * into the [[DecadeUs]] decade buckets; per (from-type, bucket):
    * `n_events` d_b, `n_censored` c_b, `n_at_risk` = Σ_{b' ≥ b}(d+c)
    * (the standard at-risk convention: censored inside the interval
    * still entered it), and `hazard` = d_b/n_at_risk_b. The discrete
    * KM survival is Π(1−hazard) over a prefix — a cumulative PRODUCT of
    * FP values, deliberately NOT emitted (order-dependent FP; callers
    * fold the ≤13 rows per type themselves).
    *
    * Exactness: bucket indices are integer threshold counts, d/c/at-risk
    * exact longs (the cumulative over the bounded per-type bucket table),
    * hazard ONE division of engine-identical integers.
    *
    * Scale shape: one user_id hash exchange for the lead window (users
    * sequence in parallel), a 1-row corpus-max broadcast, then a
    * map-side-combined aggregate to ≤\|types\|·13 rows — the descending
    * cumulative window runs on that bounded table, partitioned by type.
    * Events shuffle once as (user, us, id, type); no payload moves.
    */
  def hazardReport(events: DataFrame, tsUs: org.apache.spark.sql.Column): DataFrame = {
    val e = OpContract.requireCols(events, "EventOps.hazardReport",
      "user_id", "event_id", "event_type")
    val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
    val base = e.select(col("user_id"), tsUs.as("us"), col("event_id"),
        col("event_type"))
    val maxUs = base.agg(max(col("us")).as("corpus_max_us"))
    val times = base
      .withColumn("next_us", lead(col("us"), 1).over(w))
      .crossJoin(broadcast(maxUs))
      .select(col("event_type"),
        when(col("next_us").isNotNull, col("next_us") - col("us"))
          .otherwise(col("corpus_max_us") - col("us")).as("t_us"),
        col("next_us").isNotNull.as("observed"))
    val bucket = DecadeUs.map(t => when(col("t_us") >= t, 1L).otherwise(0L))
      .reduce(_ + _)
    val cells = times.withColumn("bucket", bucket)
      .groupBy("event_type", "bucket")
      .agg(sum(when(col("observed"), 1L).otherwise(0L)).as("n_events"),
        sum(when(col("observed"), 0L).otherwise(1L)).as("n_censored"))
    val atRisk = Window.partitionBy("event_type")
      .orderBy(col("bucket").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cells.withColumn("n_at_risk",
        sum(col("n_events") + col("n_censored")).over(atRisk))
      .withColumn("hazard",
        col("n_events").cast("double") / col("n_at_risk").cast("double"))
      .orderBy("event_type", "bucket")
  }

  /** KAPLAN–MEIER SURVIVAL CURVE per event type — the survival function
    * completing [[hazardReport]]'s pair (hazard = instantaneous risk per
    * bucket; KM = the probability of SURVIVING past it, the curve a
    * retention/latency analysis actually plots; Kaplan & Meier '58):
    * over the same censored decade buckets, S_k = Π_{j≤k}(1 − d_j/n_j).
    * Emits `(event_type, bucket, n_at_risk, n_events, survival)`.
    *
    * FP discipline: each factor is ONE exact-integer division +
    * subtract, round(·,6)-quantized; the running product re-quantizes
    * through the same round-6 per step (the [[markovStepAhead]]
    * convention — every scale-12 intermediate is < 10, hence EXACTLY
    * representable as a double, so the re-quantization is engine-stable
    * and the oracle's recursive CTE reproduces the chain bit-for-bit).
    *
    * Scale shape: the [[hazardReport]] reduction does all the data work
    * (one lead window + one aggregate); the KM fold runs on the
    * collected ≤\|types\|×12 cell table — bounded model state, the
    * trainCentroids collect discipline.
    */
  def survivalReport(events: DataFrame, tsUs: Column): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val cells = hazardReport(events, tsUs)
      .select("event_type", "bucket", "n_events", "n_at_risk")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))
    def r6(d: Double): java.math.BigDecimal =
      java.math.BigDecimal.valueOf(d).setScale(6, java.math.RoundingMode.HALF_UP)
    val out = cells.groupBy(_._1).toSeq.flatMap { case (tpe, rows) =>
      var s = java.math.BigDecimal.ONE.setScale(6)
      rows.sortBy(_._2).map { case (_, bucket, d, n) =>
        val f = r6(1.0 - d.toDouble / n.toDouble)
        // exact scale-12 product, value < 10 => .doubleValue is exact;
        // re-quantize through the same round-6 the oracle CTE applies
        s = r6(s.multiply(f).doubleValue)
        (tpe, bucket, n, d, s.doubleValue)
      }
    }.sortBy(t => (t._1, t._2))
    out.toDF("event_type", "bucket", "n_at_risk", "n_events", "survival")
  }

  /** MULTI-STEP ORDERED FUNNEL — the k-step generalization of
    * [[attribution]]'s two-event question and the product-analytics
    * staple ("of the users who clicked, how many then viewed, then
    * purchased?"): per user, step 1 anchors at the user's FIRST
    * `steps(0)` event; each later step `i` matches the user's first
    * `steps(i)` event STRICTLY AFTER the step-(i−1) match and within
    * `horizonTicks` of it. Emits one row per step:
    * `(step, step_name, n_users, conv_from_prev, conv_from_first)` —
    * each conversion ONE division of exact counts.
    *
    * Determinism: every anchor is a min() over the tick values — tie
    * ticks share the min, no ordering ambiguity anywhere.
    *
    * Scale shape: step 1 is one map-side-combined per-user min; each
    * later step joins the events of ONE type against the previous
    * step's per-user anchor — all joins hash on user_id, so AQE reuses
    * the same partitioning down the chain, and each stage's state is
    * ≤ the surviving-user count. Nothing global except the ≤k-row
    * count table.
    */
  def funnelSteps(events: DataFrame, tsTicks: Column, steps: Seq[String],
      horizonTicks: Long): DataFrame = {
    require(steps.size >= 2, s"funnelSteps: need >= 2 steps, got $steps")
    require(horizonTicks > 0, s"funnelSteps: horizonTicks > 0, got $horizonTicks")
    val e = OpContract.requireCols(events, "EventOps.funnelSteps",
        "user_id", "event_type")
      .filter(col("user_id").isNotNull)
      .select(col("user_id"), col("event_type"), tsTicks.as("tk"))
    val first = e.filter(col("event_type") === steps.head)
      .groupBy("user_id").agg(min(col("tk")).as("t"))
    val anchors = steps.toList.tail.scanLeft(first) { (prev, st) =>
      e.filter(col("event_type") === st)
        .join(prev.select(col("user_id"), col("t").as("pt")), "user_id")
        .filter(col("tk") > col("pt") && col("tk") <= col("pt") + horizonTicks)
        .groupBy("user_id").agg(min(col("tk")).as("t"))
    }
    val counts = anchors.zip(steps).map { case (a, st) =>
      a.agg(count(lit(1)).as("n")).select(lit(st).as("step_name"), col("n"))
    }
    val labeled = counts.zipWithIndex.map { case (c, i) =>
      c.select(lit(i + 1L).as("step"), col("step_name"), col("n"))
    }.reduce(_ unionByName _).localCheckpoint()
    val w = Window.orderBy("step")
    labeled
      .withColumn("prev_n", lag(col("n"), 1).over(w))
      .withColumn("first_n", first_value(col("n")).over(
        Window.orderBy("step").rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
      .select(col("step"), col("step_name"), col("n").as("n_users"),
        when(col("prev_n") > 0,
          col("n").cast("double") / col("prev_n").cast("double"))
          .as("conv_from_prev"),
        when(col("first_n") > 0,
          col("n").cast("double") / col("first_n").cast("double"))
          .as("conv_from_first"))
      .orderBy("step")
  }

  /** TIME-TO-CONVERT DISTRIBUTION — the latency readout behind
    * [[funnelSteps]]' counts ("HOW LONG does signup→click take for the
    * users who convert"): per user, the gap between the first `fromType`
    * event and the first `toType` event strictly after it within
    * `horizonTicks`; emits ONE row `(n_converted, mean_gap, p50_gap,
    * p90_gap, max_gap)` over the converting users. The SLA/funnel-decay
    * panel every growth team plots next to the conversion rate.
    *
    * FP discipline: gaps are exact tick integers; the mean is one exact
    * sum + one division; p50/p90 are the shared exact interpolated
    * percentile (Spark `percentile` ↔ DuckDB `quantile_cont`, the
    * q22/gbm convention).
    *
    * Scale shape: the [[funnelSteps]] anchor joins (hash on user_id,
    * partitioning reused), then one 1-row global aggregate; the
    * percentile runs over the converting-user gap table (users-sized).
    */
  def timeToConvert(events: DataFrame, tsTicks: Column, fromType: String,
      toType: String, horizonTicks: Long): DataFrame = {
    require(horizonTicks > 0, s"timeToConvert: horizonTicks > 0, got $horizonTicks")
    val e = OpContract.requireCols(events, "EventOps.timeToConvert",
        "user_id", "event_type")
      .filter(col("user_id").isNotNull)
      .select(col("user_id"), col("event_type"), tsTicks.as("tk"))
    val a = e.filter(col("event_type") === fromType)
      .groupBy("user_id").agg(min(col("tk")).as("t1"))
    val gaps = e.filter(col("event_type") === toType)
      .join(a, "user_id")
      .filter(col("tk") > col("t1") && col("tk") <= col("t1") + horizonTicks)
      .groupBy("user_id")
      .agg((min(col("tk")) - min(col("t1"))).as("gap"))
    gaps.agg(count(lit(1)).as("n_converted"),
      (sum(col("gap")).cast("double") / count(lit(1)).cast("double"))
        .as("mean_gap"),
      expr("percentile(gap, 0.5)").as("p50_gap"),
      expr("percentile(gap, 0.9)").as("p90_gap"),
      max(col("gap")).as("max_gap"))
  }

  /** TOP SESSION-OPENING PATHS — the "where do journeys start" panel
    * next to [[transitionCounts]]'s one-step matrix: per user, the
    * first `depth` event types in `(tick, event_id)` order concatenated
    * as `a>b>c` (shorter journeys keep their shorter path), then the
    * top `k` paths by user count. Emits `(rank, path, n_users)`.
    *
    * Scale shape: ONE user-partitioned rank window (groups rank in
    * parallel), a per-user conditional-max fold to one row per user
    * (map-side combined), a path hash-aggregate down to ≤\|types\|^depth
    * rows, and a TakeOrdered top-k — raw events shuffle once as
    * (user, tick, id, type).
    */
  def topPaths(events: DataFrame, tsTicks: Column, depth: Int = 3,
      k: Int = 10): DataFrame = {
    require(depth >= 1 && depth <= 8, s"topPaths: depth in [1,8], got $depth")
    require(k >= 1, s"topPaths: k >= 1, got $k")
    val e = OpContract.requireCols(events, "EventOps.topPaths",
        "user_id", "event_id", "event_type")
      .filter(col("user_id").isNotNull)
      .select(col("user_id"), col("event_id"), col("event_type"),
        tsTicks.as("tk"))
    val w = Window.partitionBy("user_id").orderBy(col("tk"), col("event_id"))
    val ranked = e.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= depth)
    val perUser = ranked.groupBy("user_id")
      .agg(concat_ws(">", (1 to depth).map(i =>
        max(when(col("rn") === i, col("event_type")))): _*).as("path"))
    val counts = perUser.groupBy("path").agg(count(lit(1)).as("n_users"))
    val top = Window.orderBy(col("n_users").desc, col("path"))
    counts.withColumn("rank", row_number().over(top).cast("long"))
      .filter(col("rank") <= k)
      .select(col("rank"), col("path"), col("n_users"))
      .orderBy("rank")
  }

  /** CO-ENGAGEMENT MATRIX — for each pair of event types, how many
    * users did BOTH (and the Jaccard share of their user bases): the
    * feature-adoption companion to [[transitionCounts]]' sequential
    * matrix — transitions say "b follows a", co-engagement says "the a
    * crowd and the b crowd are the same people". Pairs sharing no users
    * still emit their zero row. Emits `(type_a, type_b, users_a,
    * users_b, users_both, jaccard)` with jaccard ONE division of exact
    * integers.
    *
    * Scale shape: one DISTINCT (user, type) reduction (the shuffle
    * carries each pair once); the pair join runs user-keyed over that
    * reduced set — each user contributes its ≤\|types\|² pairs — and
    * the output is the ≤\|types\|² matrix ([[graft.operators.DedupOps
    * .sourceOverlap]]'s plan with users as the tokens).
    */
  def coEngagement(events: DataFrame): DataFrame = {
    val e = OpContract.requireCols(events, "EventOps.coEngagement",
        "user_id", "event_type")
      .filter(col("user_id").isNotNull && col("event_type").isNotNull)
      .select(col("user_id").as("u"), col("event_type").as("t"))
      .distinct()
      .localCheckpoint(false)
    val sizes = e.groupBy("t").agg(count(lit(1)).as("n"))
    val both = e.as("x").join(e.as("y"),
        col("x.u") === col("y.u") && col("x.t") < col("y.t"))
      .groupBy(col("x.t").as("type_a"), col("y.t").as("type_b"))
      .agg(count(lit(1)).as("users_both"))
    sizes.as("a").join(sizes.as("b"), col("a.t") < col("b.t"))
      .select(col("a.t").as("type_a"), col("b.t").as("type_b"),
        col("a.n").as("users_a"), col("b.n").as("users_b"))
      .join(both, Seq("type_a", "type_b"), "left")
      .select(col("type_a"), col("type_b"), col("users_a"), col("users_b"),
        coalesce(col("users_both"), lit(0L)).as("users_both"),
        (coalesce(col("users_both"), lit(0L)).cast("double") /
          (col("users_a") + col("users_b")
            - coalesce(col("users_both"), lit(0L))).cast("double"))
          .as("jaccard"))
      .orderBy("type_a", "type_b")
  }

  /** k-STEP-AHEAD MARKOV DISTRIBUTION — power-iterate the
    * [[transitionCounts]] matrix from the uniform start: where do
    * journeys concentrate after `iters` steps (the stationary-
    * distribution readout for the journey simulator; π converges
    * geometrically, so 3 steps already ranks the absorbing types).
    * Emits `(event_type, pi)`.
    *
    * FP discipline: p quantizes ONCE as round(n/tot, 6) →
    * DECIMAL(12,6) (the round-before-cast tie convention); each
    * iteration is exact decimal multiply-sum re-quantized through the
    * same round-6 — every number bit-identical cross-engine. π mass can
    * drift from 1 by the quantization (≤k·10⁻⁶/step) and by types with
    * no outgoing edges — both mirrored exactly in the oracle.
    *
    * Scale shape: the matrix is ≤\|types\|² rows — after
    * [[transitionCounts]]' one exchange, everything here is bounded
    * model-table arithmetic (localCheckpointed per step, the
    * trainCentroids discipline).
    */
  def markovStepAhead(events: DataFrame, iters: Int = 3): DataFrame = {
    require(iters >= 1 && iters <= 6,
      s"markovStepAhead: iters in [1,6], got $iters")
    val dec = org.apache.spark.sql.types.DataTypes.createDecimalType(12, 6)
    val p = transitionCounts(events)
      .select(col("from_type"), col("to_type"),
        round(col("p"), 6).cast(dec).as("p6"))
      .localCheckpoint(false)
    val types = p.select(col("from_type").as("event_type")).distinct()
      .localCheckpoint(false)
    val k = types.count()
    val pi0 = types.withColumn("pi",
      round(lit(1.0) / lit(k.toDouble), 6).cast(dec))
    val fin = (1 to iters).foldLeft(pi0) { (pi, _) =>
      pi.join(p, col("event_type") === col("from_type"))
        .groupBy(col("to_type").as("event_type"))
        .agg(round(sum(col("pi") * col("p6")).cast("double"), 6)
          .cast(dec).as("pi"))
        .localCheckpoint(false)
    }
    fin.select(col("event_type"), col("pi").cast("double").as("pi"))
      .orderBy("event_type")
  }

  /** LORENZ CURVE of user activity — the full decile-by-decile
    * generalization of [[paretoReport]]'s one point: users ranked by
    * (event count desc, user_id), split into 10 equal-width rank
    * buckets ([[graft.operators.AuditOps.gainsReportBy]]'s exclusive-
    * prefix bucketing), each emitting its exact event mass and the
    * cumulative share. Emits `(decile, n_users, n_events, cum_events,
    * cum_share)`.
    *
    * Scale shape: per-user counts (users-sized), one rank window over
    * that aggregate, a ≤10-row bucket table — the [[paretoReport]]
    * plan with the full curve instead of one cut.
    */
  def lorenzReport(events: DataFrame): DataFrame = {
    val e = OpContract.requireCols(events, "EventOps.lorenzReport", "user_id")
      .filter(col("user_id").isNotNull)
    val perUser = e.groupBy("user_id").agg(count(lit(1)).as("n"))
    val w = Window.orderBy(col("n").desc, col("user_id"))
    val ranked = perUser.withColumn("rk", row_number().over(w))
      .localCheckpoint(false)
    val u = ranked.agg(count(lit(1)).as("nu"))
    val b = ranked.crossJoin(broadcast(u))
      .withColumn("decile",
        call_function("div", (col("rk") - 1L) * 10L, col("nu")) + 1L)
      .groupBy("decile")
      .agg(count(lit(1)).as("n_users"), sum(col("n")).as("n_events"))
    val cw = Window.orderBy("decile")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = b.agg(sum(col("n_events")).as("te"))
    b.withColumn("cum_events", sum(col("n_events")).over(cw))
      .crossJoin(broadcast(tot))
      .select(col("decile"), col("n_users"), col("n_events"),
        col("cum_events"),
        when(col("te") > 0, col("cum_events").cast("double") /
          col("te").cast("double")).as("cum_share"))
      .orderBy("decile")
  }

  /** ACTIVITY CONCENTRATION (Pareto/Lorenz point) — "what share of all
    * events do the top decile of users produce": per-user event counts,
    * users ranked by (count desc, user_id), the top ⌈U/10⌉ users' share
    * as ONE division of exact integers. The power-user readout behind
    * rate-limit and abuse thresholds, and the user-axis companion to
    * [[graft.operators.AuditOps.giniReport]]'s category concentration.
    * Emits one row `(n_users, top_users, top_events, total_events,
    * top_share)`.
    *
    * Scale shape: one map-side-combined per-user count (users-sized —
    * orders of magnitude under the event count), then ONE rank window
    * over that aggregate. The global sort is over users, not events;
    * past ~10⁹ users switch to an exact-percentile threshold on the
    * count distribution ([[graft.operators.SketchOps]]) — documented
    * trade, not a silent cap.
    */
  def paretoReport(events: DataFrame): DataFrame = {
    val e = OpContract.requireCols(events, "EventOps.paretoReport", "user_id")
      .filter(col("user_id").isNotNull)
    val perUser = e.groupBy("user_id").agg(count(lit(1)).as("n"))
    val w = Window.orderBy(col("n").desc, col("user_id"))
    // the ranked table feeds both the totals and the top-decile slice —
    // checkpoint so the users-sized sort runs once (the rfmReport pattern)
    val ranked = perUser.withColumn("rk", row_number().over(w))
      .localCheckpoint(false)
    ranked.agg(count(lit(1)).as("n_users"), sum(col("n")).as("total_events"))
      .crossJoin(broadcast(
        // ⌈U/10⌉ via the already-ranked table: rank ≤ (U + 9) div 10
        ranked.crossJoin(broadcast(ranked.agg(count(lit(1)).as("u"))))
          .filter(col("rk") <=
            call_function("div", col("u") + 9L, lit(10L)))
          .agg(count(lit(1)).as("top_users"), sum(col("n")).as("top_events"))))
      .select(col("n_users"), col("top_users"), col("top_events"),
        col("total_events"),
        when(col("total_events") > 0,
          col("top_events").cast("double") / col("total_events").cast("double"))
          .as("top_share"))
  }
}
