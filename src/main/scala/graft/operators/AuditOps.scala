package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint checks (the Deequ/Great-Expectations
  * surface a training-data pipeline runs before a corpus is allowed into a
  * mixture): completeness, key uniqueness, referential integrity, value
  * ranges, accepted-value domains. Each suite run emits one row per check —
  * `(check_id, check_type, table_name, target, violations, total, passed)` —
  * the machine-readable gate a scheduler can assert on.
  *
  * Scale shape (the part that matters at 100 TB):
  *   - All ROW-LEVEL checks on one table (not-null, in-range,
  *     accepted-values) share a SINGLE scan: they compile to one
  *     conditional-sum aggregate over the table, partial (map-side)
  *     aggregation reducing each partition to one row before the 1-row
  *     exchange. k row-level checks cost one pass, not k.
  *   - [[Check.UniqueKey]] is one shuffle on the key (count per key, then a
  *     1-row re-agg of the bounded per-key counts).
  *   - [[Check.FkIntegrity]] joins the child against the parent's DISTINCT
  *     key projection (1 column) — Catalyst/AQE broadcasts dim-sized
  *     parents; a fact-sized parent degrades to a shuffle on the key where
  *     only (key) pairs move, never payload columns.
  *   - Every branch ends in a 1-row aggregate, so the union that stitches
  *     the report together moves O(checks) rows total.
  *
  * Null discipline (documented, asserted in AuditOpsSpec): `InRange` and
  * `AcceptedValues` do NOT count nulls as violations, and `FkIntegrity`
  * skips null foreign keys — completeness is exclusively [[Check.NotNull]]'s
  * job, so a single root cause (a null column) fires exactly one check.
  */
object AuditOps {

  /** One declarative constraint; see [[AuditOps.dataQualityReport]]. */
  sealed trait Check {
    /** Stable id — also the report's sort key. */
    def id: String
    def table: String
  }
  object Check {
    /** `column` must never be null in `table`. */
    final case class NotNull(table: String, column: String) extends Check {
      val id = s"nn_${table}_$column"
    }
    /** `columns` form a unique key of `table`; violations = surplus rows
      * (total minus distinct key count). A null key value counts as one
      * key (Spark groupBy semantics — engines that drop nulls from
      * COUNT(DISTINCT) diverge on null-keyed rows; pair with [[NotNull]]
      * on the key columns, which is also what a real schema requires). */
    final case class UniqueKey(table: String, columns: Seq[String]) extends Check {
      require(columns.nonEmpty, s"UniqueKey($table) needs at least one column")
      val id = s"uk_${table}_${columns.mkString("_")}"
    }
    /** Every non-null `childCol` value must exist in `parentTable.parentCol`;
      * violations = orphan child rows. */
    final case class FkIntegrity(table: String, childCol: String,
        parentTable: String, parentCol: String) extends Check {
      val id = s"fk_${table}_${childCol}"
    }
    /** Non-null `column` values must satisfy `lo <= v <= hi` (bounds as
      * canonical string literals so the same check text runs in any
      * engine); violations = out-of-range rows. */
    final case class InRange(table: String, column: String, lo: String, hi: String)
        extends Check {
      val id = s"rng_${table}_$column"
    }
    /** Non-null `column` values must be one of `values`; violations = rows
      * outside the domain. */
    final case class AcceptedValues(table: String, column: String, values: Seq[String])
        extends Check {
      require(values.nonEmpty, s"AcceptedValues($table.$column) needs a non-empty domain")
      val id = s"av_${table}_$column"
    }
    /** `table` must hold between `lo` and `hi` rows (a delivery-size
      * sanity gate); violations = how many rows short of `lo` or past
      * `hi`. Rides the table's shared-scan aggregate for free (it only
      * reads the count every fused block already computes). */
    final case class RowCountBetween(table: String, lo: Long, hi: Long) extends Check {
      require(0 <= lo && lo <= hi, s"RowCountBetween($table) needs 0 <= lo <= hi")
      val id = s"rc_$table"
    }
  }
  import Check._

  /** Row-level violation predicate of a check evaluated against the columns
    * of `df` (the check's table name is not consulted). This is the single
    * definition shared by the batch report and the streaming twin
    * ([[graft.streaming.StreamOps.dqViolationsStream]]) — same predicate,
    * same null discipline, incremental execution. Keyed checks (unique key,
    * FK) have no row-local form and are rejected here.
    */
  def violationOf(df: DataFrame, c: Check): Column = c match {
    case NotNull(_, col0) => col(col0).isNull
    case InRange(_, col0, lo, hi) =>
      col(col0).isNotNull &&
        !(col(col0) >= lit(lo).cast(df.schema(col0).dataType) &&
          col(col0) <= lit(hi).cast(df.schema(col0).dataType))
    case AcceptedValues(_, col0, vals) =>
      col(col0).isNotNull && !col(col0).cast("string").isin(vals: _*)
    case other => throw new IllegalArgumentException(
      s"check ${other.id} is not row-level (unique/FK checks need the full key space)")
  }

  private def report(c: Check, target: String, violations: Column, total: Column,
      tpe: String): Seq[Column] = Seq(
    lit(c.id).as("check_id"), lit(tpe).as("check_type"),
    lit(c.table).as("table_name"), lit(target).as("target"),
    violations.cast("long").as("violations"), total.cast("long").as("total"),
    (violations === 0).cast("long").as("passed"))

  /** Run a constraint suite against named tables; one result row per check,
    * ordered by `check_id`. Row-level checks per table are fused into one
    * shared-scan aggregate (see object Scaladoc for the full scale shape).
    */
  def dataQualityReport(tables: Map[String, DataFrame], checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "dataQualityReport needs at least one check")
    val ids = checks.map(_.id)
    require(ids.distinct.size == ids.size,
      s"duplicate check ids: ${ids.diff(ids.distinct).distinct.mkString(", ")}")
    checks.foreach { c =>
      require(tables.contains(c.table), s"check ${c.id}: unknown table '${c.table}'")
      c match {
        case fk: FkIntegrity => require(tables.contains(fk.parentTable),
          s"check ${fk.id}: unknown parent table '${fk.parentTable}'")
        case _ => ()
      }
    }

    // Row/table-level checks grouped per table -> ONE conditional-sum agg
    // per table (k checks, one scan), then exploded back to one row per
    // check. RowCountBetween contributes no agg of its own — it reads the
    // count every fused block already computes.
    val rowLevel: Seq[DataFrame] = checks.collect {
      case c @ (_: NotNull | _: InRange | _: AcceptedValues | _: RowCountBetween) => c
    }.groupBy(_.table).toSeq.map { case (tname, cs) =>
      val df = tables(tname)
      val aggs = cs.flatMap {
        case _: RowCountBetween => Nil
        case c => Seq(sum(when(violationOf(df, c), 1).otherwise(0)).as(s"v_${c.id}"))
      } :+ count(lit(1)).as("v_total")
      val one = df.agg(aggs.head, aggs.tail: _*)
      cs.map {
        case c @ RowCountBetween(_, lo, hi) =>
          one.select(report(c, s"[$lo,$hi]",
            greatest(lit(lo) - col("v_total"), col("v_total") - lit(hi), lit(0)),
            col("v_total"), "row_count"): _*)
        case c =>
          val (tgt, tpe) = c match {
            case NotNull(_, col0) => (col0, "not_null")
            case InRange(_, col0, _, _) => (col0, "in_range")
            case AcceptedValues(_, col0, _) => (col0, "accepted_values")
            case other => throw new MatchError(other)
          }
          one.select(report(c, tgt, coalesce(col(s"v_${c.id}"), lit(0)), col("v_total"), tpe): _*)
      }.reduce(_.unionByName(_))
    }

    val keyed: Seq[DataFrame] = checks.collect {
      case c @ UniqueKey(tname, cols) =>
        // one shuffle on the key; the re-agg input is one row per key
        val perKey = tables(tname).groupBy(cols.map(col): _*).agg(count(lit(1)).as("cnt"))
        perKey.agg(sum(col("cnt")).as("t"), count(lit(1)).as("d"))
          .select(report(c, cols.mkString(","), coalesce(col("t") - col("d"), lit(0)),
            coalesce(col("t"), lit(0)), "unique_key"): _*)
      case c @ FkIntegrity(tname, childCol, ptable, pcol) =>
        // child (non-null fk) LEFT JOIN distinct parent keys: one pass over
        // the child, the 1-column parent side broadcast when dim-sized;
        // violations and total come out of the same aggregate.
        val parentKeys = tables(ptable).select(col(pcol).as("__pk")).distinct()
        val joined = tables(tname).filter(col(childCol).isNotNull)
          .select(col(childCol))
          .join(parentKeys, col(childCol) === col("__pk"), "left")
        joined.agg(
          sum(when(col("__pk").isNull, 1).otherwise(0)).as("v"),
          count(lit(1)).as("t"))
          .select(report(c, s"$childCol->$ptable.$pcol",
            coalesce(col("v"), lit(0)), col("t"), "fk_integrity"): _*)
    }

    // no trailing sort: gate bindings order by check_id for the oracle hash
    // (library discipline — ops never plan a determinism-only global sort)
    (rowLevel ++ keyed).reduce(_.unionByName(_))
  }

  /** Robust (median/MAD) outlier report — the detect sibling of
    * [[outlierReport]] for skewed or already-contaminated columns, where
    * mean/stddev are dragged by the very outliers being hunted: flag rows
    * with `|x − median| > k · MAD` (MAD = median of absolute deviations).
    * Both medians are EXACT sketch-then-refine percentiles
    * ([[SketchOps.exactQuantileRefine]] — counters locate the target bins,
    * one pruned pass ranks them), broadcast back as two-number-per-group
    * model state; the flag comparison is `|x−med| > k·mad`, three IEEE
    * ops identical in any engine. Integer `k` (k=3 ≈ 2·sigma on normal
    * data via the 1.4826 MAD-to-sigma factor — callers wanting the exact
    * sigma calibration scale their cutoff upstream).
    *
    * Scale shape: two quantile refinements (each: one counter agg + one
    * pruned ranking pass) + one broadcast-join scan for the flags — five
    * scan-bound passes total, no data-sized shuffle anywhere.
    */
  def robustOutlierReport(df: DataFrame, valCol: Column, groupCol: String,
      k: Int = 3, binWidth: Long = 1024L, bins: Int = 1024): DataFrame = {
    require(k >= 1, s"robustOutlierReport needs k >= 1, got $k")
    val med = SketchOps.exactQuantileRefine(df, valCol, groupCol, binWidth, bins, Seq(500))
      .select(col(groupCol).as("g"), col("exact_value").as("med"))
    val base = df.filter(valCol.isNotNull)
      .select(col(groupCol).as("g"), valCol.cast("double").as("v"))
    val dev = base.join(broadcast(med), Seq("g"))
      .withColumn("ad", abs(col("v") - col("med")))
    val mad = SketchOps.exactQuantileRefine(dev, col("ad"), "g", binWidth, bins, Seq(500))
      .select(col("g"), col("exact_value").as("mad"))
    dev.join(broadcast(mad), Seq("g"))
      .groupBy("g")
      .agg(
        count(lit(1)).as("n"),
        min(col("med")).as("med"), min(col("mad")).as("mad"),
        sum(when(col("ad") > lit(k) * col("mad"), 1).otherwise(0))
          .cast("long").as("n_flagged"))
      .withColumnRenamed("g", groupCol)
  }

  /** Exact tie-corrected binary AUC (Mann–Whitney U) of a score against a
    * boolean label — the ranking-quality audit run before trusting a
    * quality/toxicity/contamination classifier's scores for filtering.
    * Computed WITHOUT per-row ranking: scores collapse to DISTINCT values
    * first (one hash aggregation carrying `cnt` and `pos` per value), the
    * tie-averaged rank sum follows from a cumulative window over those
    * groups — `Σ pos_g·(2·cum_g + cnt_g + 1) = 2·Σ avgrank(positives)` —
    * and AUC = (that − P·(P+1)) / (2·P·N). Every term is an exact integer;
    * the single final division is the only floating-point op, so the
    * result is bit-identical in any engine.
    *
    * Scale shape: the data pass is one map-side-combined aggregation to
    * ≤|distinct scores| rows; the window runs over those GROUPS (sorted
    * once), not the data. AUC is NULL when either class is empty.
    */
  def aucReport(df: DataFrame, scoreCol: Column, labelCol: Column): DataFrame = {
    val g = df.filter(scoreCol.isNotNull)
      .select(scoreCol.as("s"), when(labelCol, 1L).otherwise(0L).as("y"))
      .groupBy("s")
      .agg(count(lit(1)).as("cnt"), sum(col("y")).as("pos"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("s"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val dec = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0)
    val ranked = g.withColumn("cum", coalesce(sum(col("cnt")).over(w), lit(0L)))
    // decimal(38,0) keeps the rank sum exact out to ~1e18-row inputs; the
    // ONLY floating-point op is the final num/denom division of two
    // correctly-rounded exact integers — engine-identical
    ranked.agg(
      sum(col("cnt")).cast(dec).as("n"),
      sum(col("pos")).cast(dec).as("p"),
      sum(col("pos").cast(dec) *
        (lit(2) * col("cum") + col("cnt") + lit(1)).cast(dec)).as("s2x"))
      .select(col("n").cast("long").as("n"),
        col("p").cast("long").as("n_pos"),
        (col("n") - col("p")).cast("long").as("n_neg"),
        when(col("p") > 0 && col("n") - col("p") > 0,
          (col("s2x") - col("p") * (col("p") + lit(1))).cast("double") /
            (lit(2).cast(dec) * col("p") * (col("n") - col("p"))).cast("double"))
          .as("auc"))
  }

  /** Per-group [[aucReport]] — the data-card form (one AUC row per source/
    * domain/shard). Same distinct-score-group construction, but the
    * cumulative window partitions by the group key, so groups rank in
    * parallel and no global single-partition window exists — this is also
    * the shape to prefer at extreme score cardinality.
    */
  def aucReportBy(df: DataFrame, scoreCol: Column, labelCol: Column,
      groupCol: String): DataFrame = {
    OpContract.requireCols(df, "AuditOps.aucReportBy", groupCol)
    val dec = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0)
    val g = df.filter(scoreCol.isNotNull)
      .select(col(groupCol).as("grp"), scoreCol.as("s"),
        when(labelCol, 1L).otherwise(0L).as("y"))
      .groupBy("grp", "s")
      .agg(count(lit(1)).as("cnt"), sum(col("y")).as("pos"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("grp").orderBy(col("s"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val ranked = g.withColumn("cum", coalesce(sum(col("cnt")).over(w), lit(0L)))
    ranked.groupBy("grp").agg(
      sum(col("cnt")).cast(dec).as("n"),
      sum(col("pos")).cast(dec).as("p"),
      sum(col("pos").cast(dec) *
        (lit(2) * col("cum") + col("cnt") + lit(1)).cast(dec)).as("s2x"))
      .select(col("grp"),
        col("n").cast("long").as("n"),
        col("p").cast("long").as("n_pos"),
        (col("n") - col("p")).cast("long").as("n_neg"),
        when(col("p") > 0 && col("n") - col("p") > 0,
          (col("s2x") - col("p") * (col("p") + lit(1))).cast("double") /
            (lit(2).cast(dec) * col("p") * (col("n") - col("p"))).cast("double"))
          .as("auc"))
  }

  /** Winsorization — the TREAT step after [[outlierReport]]'s detect: clip
    * each group's values into its exact `[loPermille, hiPermille]`
    * percentiles (quantile_cont definition, computed by
    * [[SketchOps.exactQuantileRefine]]'s sketch-then-refine: counters
    * locate the target bins, ONE pruned pass ranks only those bins) and
    * report per group the clip counts and the exact decimal sum of the
    * winsorized column. The clip itself is a broadcast join of two
    * cutoffs per group over one scan — no data shuffle beyond the cutoff
    * computation's own counter aggregation.
    *
    * FP discipline: cutoffs are the engine-exact interpolated percentiles
    * (q34 parity), comparisons are raw double compares, and the sum casts
    * each clipped double to DECIMAL(28,6) (one correctly-rounded op per
    * row) before the order-independent decimal accumulation.
    */
  def winsorize(df: DataFrame, valCol: Column, groupCol: String,
      loPermille: Int, hiPermille: Int,
      binWidth: Long = 1024L, bins: Int = 1024): DataFrame = {
    require(0 <= loPermille && loPermille < hiPermille && hiPermille <= 1000,
      s"need 0 <= lo < hi <= 1000 permille, got ($loPermille, $hiPermille)")
    val dec = org.apache.spark.sql.types.DataTypes.createDecimalType(28, 6)
    val cuts = SketchOps.exactQuantileRefine(df, valCol, groupCol, binWidth, bins,
        Seq(loPermille, hiPermille))
      .groupBy(groupCol)
      .agg(
        min(when(col("q") === lit(loPermille / 1000.0), col("exact_value"))).as("lo_cut"),
        max(when(col("q") === lit(hiPermille / 1000.0), col("exact_value"))).as("hi_cut"))
      .withColumnRenamed(groupCol, "g")
    val base = df.filter(valCol.isNotNull)
      .select(col(groupCol).as("g"), valCol.cast("double").as("v"))
    base.join(broadcast(cuts), Seq("g"))
      .withColumn("w", least(greatest(col("v"), col("lo_cut")), col("hi_cut")))
      .groupBy("g")
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("v") < col("lo_cut"), 1).otherwise(0)).cast("long").as("n_clip_lo"),
        sum(when(col("v") > col("hi_cut"), 1).otherwise(0)).cast("long").as("n_clip_hi"),
        min(col("lo_cut")).as("lo_cut"), min(col("hi_cut")).as("hi_cut"),
        sum(col("w").cast(dec)).cast("double").as("win_sum"))
      .withColumnRenamed("g", groupCol)
  }

  /** Per-row SEQUENTIAL (prequential) anomaly verdicts: row i is anomalous
    * iff its floor-value deviates more than `z` sigma from the statistics
    * of all PRIOR rows in its group, in `(orderCol, idCol)` order — the
    * exact decision an online monitor makes at arrival time, reproduced
    * over data at rest. Same integer rewrite as [[outlierReport]]
    * (`(n·x−S)² > z²(n·S2−S²)` on DECIMAL(38,0) cumulative sums), so the
    * verdict sequence is engine-exact AND identical to the streaming
    * stateful twin ([[graft.streaming.StreamOps.anomalyStream]]) fed in
    * event-time order — spec-pinned both ways. Rows with fewer than
    * `minPrior` predecessors are unscored (cold start).
    *
    * Scale shape: ONE window over `(grp)` ordered by `(ord, id)` — a
    * single hash exchange on the group key plus a per-group sort. The
    * sequential semantics inherently order each group; the deployment
    * shape for unbounded data is the streaming twin, whose state is three
    * numbers per group.
    */
  def anomalyVerdicts(df: DataFrame, groupCol: String, orderCol: String,
      idCol: String, valueCol: String, z: Int = 3, minPrior: Long = 30): DataFrame = {
    require(z >= 1, s"anomalyVerdicts needs z >= 1, got $z")
    require(minPrior >= 2, s"anomalyVerdicts needs minPrior >= 2, got $minPrior")
    OpContract.requireCols(df, "AuditOps.anomalyVerdicts",
      groupCol, orderCol, idCol, valueCol)
    val dec = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0)
    val base = df.filter(col(valueCol).isNotNull)
      .select(col(groupCol).as("grp"), col(orderCol).as("ord"),
        col(idCol).as("id"), floor(col(valueCol)).cast(dec).as("x"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("grp").orderBy(col("ord"), col("id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val st = base.select(col("grp"), col("id"), col("x"),
      count(lit(1)).over(w).cast(dec).as("n"),
      sum(col("x")).over(w).as("s"),
      sum(col("x") * col("x")).over(w).as("s2"))
    val lhs = (col("n") * col("x") - col("s")) * (col("n") * col("x") - col("s"))
    val rhs = lit(z * z).cast(dec) * (col("n") * col("s2") - col("s") * col("s"))
    st.withColumn("scored", col("n") >= lit(minPrior))
      // first row per group has NULL window sums: scored is false there, so
      // coalesce never reaches the null comparison
      .withColumn("is_anomaly", col("scored") && coalesce(lhs > rhs, lit(false)))
      .select(col("grp"), col("id"), col("x").cast("long").as("x"),
        col("scored"), col("is_anomaly"))
  }

  /** Group-level rollup of [[anomalyVerdicts]]: scored/anomaly counts and
    * the first/last anomalous id per group.
    */
  def anomalyReport(df: DataFrame, groupCol: String, orderCol: String,
      idCol: String, valueCol: String, z: Int = 3, minPrior: Long = 30): DataFrame =
    anomalyVerdicts(df, groupCol, orderCol, idCol, valueCol, z, minPrior)
      .groupBy("grp")
      .agg(
        sum(when(col("scored"), 1).otherwise(0)).cast("long").as("n_scored"),
        sum(when(col("is_anomaly"), 1).otherwise(0)).cast("long").as("n_anomalies"),
        min(when(col("is_anomaly"), col("id"))).as("first_anomaly"),
        max(when(col("is_anomaly"), col("id"))).as("last_anomaly"))

  /** Exact z-score outlier report per group: a row of `df` is an outlier
    * when `|x - mean| > z * stddev` within its group, with `x = floor(v)`
    * (floor, not truncation — engines disagree on double→int rounding, no
    * engine disagrees on floor). Evaluated WITHOUT floating point: the
    * test rewrites to `(n*x - S)^2 > z^2 * (n*S2 - S^2)` over exact
    * integer sums (S = sum x, S2 = sum x^2) carried as DECIMAL(38,0), so
    * the verdict is bit-identical in any engine — no sqrt, no division,
    * no rounding to reconcile.
    *
    * Two passes, both scan-bound: (1) per-group (n, S, S2) — a partial-agg
    * shuffle of one row per group; (2) re-scan joined against the
    * broadcast group stats, conditional count. Group count is assumed
    * dim-sized (stats broadcast); the data never shuffles in pass 2.
    */
  def outlierReport(df: DataFrame, groupCol: String, valueCol: String, z: Int = 3): DataFrame = {
    require(z >= 1, s"outlierReport needs z >= 1, got $z")
    OpContract.requireCols(df, "AuditOps.outlierReport", groupCol, valueCol)
    val dec = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0)
    val x = floor(col(valueCol)).cast(dec)
    val base = df.filter(col(valueCol).isNotNull)
      .select(col(groupCol).as("grp"), x.as("x"))
    val stats = base.groupBy("grp").agg(
      count(lit(1)).cast(dec).as("n"),
      sum(col("x")).as("s"),
      sum(col("x") * col("x")).as("s2"))
    val lhs = (col("n") * col("x") - col("s")) * (col("n") * col("x") - col("s"))
    val rhs = lit(z * z).cast(dec) * (col("n") * col("s2") - col("s") * col("s"))
    base.join(broadcast(stats), Seq("grp"))
      .groupBy("grp")
      .agg(
        count(lit(1)).as("n_rows"),
        sum(when(lhs > rhs, 1).otherwise(0)).cast("long").as("n_outliers"),
        max(when(lhs > rhs, col("x").cast("long"))).as("max_outlier"),
        min(when(lhs > rhs, col("x").cast("long"))).as("min_outlier"))
  }
}
