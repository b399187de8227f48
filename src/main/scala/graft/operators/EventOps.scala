package graft.operators

import org.apache.spark.sql.DataFrame
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
}
