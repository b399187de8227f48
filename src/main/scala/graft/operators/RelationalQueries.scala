package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** The relational query battery over the driver test tables (SURVEY §2.2):
  * scans with pushdown, equi/broadcast/semi/anti/range/as-of joins, hash
  * aggregation incl. rollup/cube/distinct, window functions, top-k, set ops,
  * string/date/regex scalar functions, correlated-style subqueries.
  *
  * Every query has a DuckDB oracle with identical column names/types.
  * Scale notes per query are in Scaladoc — each plan was chosen to survive a
  * 100× scale-up: filters/projections push to the parquet scan, always-small
  * dims (nation/region) are broadcast explicitly, everything else is left to
  * Catalyst/AQE (which can pick broadcast at low SF and shuffled-hash/SMJ at
  * high SF).
  */
object RelationalQueries {
  import Tables._

  private val dec = DecimalType(18, 2)
  /** Exact revenue term: l_extendedprice * (1 - l_discount), decimal. */
  private def revenue: Column =
    col("l_extendedprice").cast(dec) * (lit(1).cast(dec) - col("l_discount").cast(dec))
  private val sqlRevenue =
    "CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- scans / filters / projections -----------------------------------
    // Predicate + projection pushdown to parquet (PushedFilters in explain).
    "q2_filter_project" -> ((s, d) =>
      t(s, d, "lineitem")
        .filter(col("l_quantity") >= 50 && col("l_discount") === 0.0)
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity", "l_extendedprice")
        .orderBy("l_orderkey", "l_linenumber")),

    // ---- aggregation ------------------------------------------------------
    // TPC-H Q1 shape: full-scan hash aggregate with partial (map-side) agg.
    "q1_pricing_summary" -> ((s, d) =>
      t(s, d, "lineitem")
        .filter(col("l_shipdate") <= "2001-09-01")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          sum(revenue).cast("double").as("sum_disc_price"),
          davg(col("l_quantity")).as("avg_qty"),
          davg(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")),

    // TPC-H Q6 shape: single-row agg, all predicates pushed to the scan.
    "q6_revenue_forecast" -> ((s, d) =>
      t(s, d, "lineitem")
        .filter(col("l_shipdate") >= "1996-01-01" && col("l_shipdate") < "1997-01-01" &&
          col("l_discount") >= 0.03 && col("l_discount") <= 0.07 && col("l_quantity") < 24)
        .agg(sum(col("l_extendedprice").cast(dec) * col("l_discount").cast(dec))
          .cast("double").as("promo_revenue"))),

    // ROLLUP grouping sets.
    "q9_rollup_lineitem" -> ((s, d) =>
      t(s, d, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)),

    // CUBE grouping sets.
    "q10_cube_orders" -> ((s, d) =>
      t(s, d, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))
        .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)),

    // Exact distinct aggregation (expand + two-phase agg under the hood).
    // Multi-distinct without the full-width Expand: three countDistinct
    // directly over lineitem triple the SCAN rows through the shuffle
    // (Catalyst's Expand rewrite). Collapsing to the distinct
    // (flag, part, supp) triples first is ONE full-data exchange whose
    // map-side combine removes in-partition repeats; the three distinct
    // counts (incl. the Expand) then run over the small triple set —
    // the shape that survives a 100× lineitem.
    "q11_distinct_parts" -> ((s, d) =>
      t(s, d, "lineitem")
        .select("l_returnflag", "l_partkey", "l_suppkey").distinct()
        .groupBy("l_returnflag")
        .agg(
          countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          count(lit(1)).as("n_part_supp"))
        .orderBy("l_returnflag")),

    // HAVING over hash aggregate.
    "q15_having_suppliers" -> ((s, d) =>
      t(s, d, "lineitem")
        .groupBy("l_suppkey")
        .agg(dsum(col("l_quantity")).as("total_qty"), count(lit(1)).as("n_items"))
        .filter(col("total_qty") > 3000)
        .orderBy("l_suppkey")),

    // Z-order layout: tile envelopes prove 2-D locality (each top-6-bit
    // tile of the 32-bit curve is an ALIGNED 2^13x2^13 rectangle — the
    // property file-level min/max stats prune against). See LayoutOps.
    // dims scaled into the full 16-bit domain (odd multipliers mod 2^16)
    // so the battery exercises MULTI-tile grouping at every sf — raw sf0.01
    // keys all landed in tile 0 (z < 2^26)
    "q32_zorder" -> ((s, d) =>
      LayoutOps.zTiles(t(s, d, "lineitem"),
        pmod(col("l_partkey") * 131, lit(65536L)),
        pmod(col("l_suppkey") * 521, lit(65536L)))
        .orderBy("tile")),

    // ---- joins ------------------------------------------------------------
    // TPC-H Q3 shape: 3-way join + agg + deterministic top-k.
    "q3_top_revenue_orders" -> ((s, d) => {
      val cust = t(s, d, "customer").filter(col("c_mktsegment") === "HOUSEHOLD")
      val ord = t(s, d, "orders").filter(col("o_orderdate") < "1998-01-01")
      val li = t(s, d, "lineitem").filter(col("l_shipdate") > "1998-01-01")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate").cast("date").cast("string").as("orderdate"))
        .agg(sum(revenue).cast("double").as("order_revenue"))
        .orderBy(col("order_revenue").desc, col("l_orderkey"))
        .limit(10)
    }),

    // TPC-H Q5 shape: 5-way join; nation/region are ALWAYS-small dims ->
    // explicit broadcast (no shuffle for them at any scale).
    "q5_region_revenue" -> ((s, d) => {
      val nat = broadcast(t(s, d, "nation"))
      val reg = broadcast(t(s, d, "region"))
      t(s, d, "lineitem")
        .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .join(t(s, d, "supplier"),
          col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
        .join(nat, col("s_nationkey") === col("n_nationkey"))
        .join(reg, col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "ASIA")
        .groupBy("n_name")
        .agg(sum(revenue).cast("double").as("region_revenue"))
        .orderBy(col("region_revenue").desc, col("n_name"))
    }),

    // Left-semi join (EXISTS).
    "q4_exists_orders" -> ((s, d) => {
      val bigItems = t(s, d, "lineitem").filter(col("l_quantity") >= 48).select("l_orderkey")
      t(s, d, "orders")
        .join(bigItems, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_orders"))
        .orderBy("o_orderpriority")
    }),

    // Left-anti join (NOT EXISTS): customers with no high-value order.
    "q21_anti_customers" -> ((s, d) =>
      t(s, d, "customer")
        .join(t(s, d, "orders").filter(col("o_totalprice") > 400000),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_customers"), dsum(col("c_acctbal")).as("sum_bal"))
        .orderBy("c_mktsegment")),

    // Left-outer join preserving zero-order customers; order-count histogram.
    "q16_order_histogram" -> ((s, d) =>
      t(s, d, "customer")
        .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("n_orders"))
        .groupBy("n_orders")
        .agg(count(lit(1)).as("n_customers"))
        .orderBy("n_orders")),

    // Equi + range (band) join: ship lag distribution within the order.
    "q19_ship_lag" -> ((s, d) =>
      t(s, d, "lineitem")
        .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .withColumn("lag_days", datediff(col("l_shipdate"), col("o_orderdate")))
        .filter(col("lag_days") >= 0 && col("lag_days") <= 30)
        .groupBy("lag_days")
        .agg(count(lit(1)).as("n_items"))
        .orderBy("lag_days")),

    // ---- subquery shapes --------------------------------------------------
    // TPC-H Q17 shape: agg subquery join + correlated threshold.
    "q17_small_qty_revenue" -> ((s, d) => {
      val li = t(s, d, "lineitem")
      val partAvg = li.groupBy("l_partkey")
        .agg(davg(col("l_quantity")).as("avg_qty"))
        .withColumnRenamed("l_partkey", "ap_partkey")
      li.join(t(s, d, "part").filter(col("p_brand") === "Brand#2"),
          col("l_partkey") === col("p_partkey"))
        .join(partAvg, col("l_partkey") === col("ap_partkey"))
        .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
        .agg((dsum(col("l_extendedprice")) / lit(7.0)).as("avg_yearly"))
    }),

    // ---- window functions -------------------------------------------------
    // Rank per group, deterministic tie-break, top-3.
    "q7_priority_top3" -> ((s, d) => {
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, d, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("o_orderpriority", "rn", "o_orderkey", "o_totalprice")
        .orderBy("o_orderpriority", "rn")
    }),

    // Running total per customer (exact decimal accumulation in the frame).
    "q8_running_total" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, d, "orders")
        .filter(col("o_custkey") < 20)
        .select(col("o_custkey"), col("o_orderkey"),
          sum(col("o_totalprice").cast(dec)).over(w).cast("double").as("running_spend"),
          lag(col("o_totalprice"), 1).over(
            Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey")))
            .as("prev_price"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    // As-of style: latest strictly-preceding click per user for each error.
    // (events.ts arrives as int64 nanos — see Tables.t; `div 1000` = epoch µs.)
    "q20_asof_clicks" -> ((s, d) => {
      val ev = t(s, d, "events").filter(col("event_type").isin("click", "error"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      ev.withColumn("last_click_us",
          max(when(col("event_type") === "click", expr("ts div 1000"))).over(w))
        .filter(col("event_type") === "error")
        .select(col("event_id"), col("user_id"), col("last_click_us"))
        .orderBy("event_id")
    }),

    // ---- set operations ---------------------------------------------------
    // Distinct AND multiset (ALL) variants — exceptAll/intersectAll have
    // genuinely different semantics (bag difference/intersection).
    // PIVOT surface: events wide-formed per day x event_type (the one
    // relational verb not yet demonstrated) — Spark's RelationalGroupedDataset
    // .pivot with an EXPLICIT value list, so the plan is a single
    // aggregate with conditional sums (no values-discovery job) and the
    // column set is deterministic. Counts exact; decimal value sums cast
    // once.
    // Rank-statistics window panel: percent_rank + cume_dist of account
    // balance within market segment (standard-SQL formulas, each one
    // division of exact integers in both engines); output bounded to the
    // top-3 rows per segment by the deterministic (acctbal desc, custkey)
    // tiebreak.
    "q45_percent_rank" -> ((s, d) => {
      val c = t(s, d, "customer")
      val wv = Window.partitionBy("c_mktsegment").orderBy(col("c_acctbal").desc)
      val wr = Window.partitionBy("c_mktsegment")
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      c.select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"),
          percent_rank().over(wv).as("pr"), cume_dist().over(wv).as("cd"),
          row_number().over(wr).cast("long").as("rn"))
        .filter(col("rn") <= 3)
        .orderBy("c_mktsegment", "rn")
    }),

    "q44_pivot" -> ((s, d) => {
      val dec = org.apache.spark.sql.types.DataTypes.createDecimalType(18, 2)
      t(s, d, "events")
        .select(call_function("div",
          call_function("div", col("ts").cast("long"), lit(1000L)),
          lit(86400000000L)).as("day"),
          col("event_type"), col("value"))
        .groupBy("day")
        .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
        .agg(sum(col("value").cast(dec)))
        .select(col("day"),
          col("click").cast("double").as("click"),
          col("view").cast("double").as("view"),
          col("purchase").cast("double").as("purchase"),
          col("signup").cast("double").as("signup"),
          col("error").cast("double").as("error"))
        .orderBy("day")
    }),

    "q12_setops" -> ((s, d) => {
      val rich = t(s, d, "customer").filter(col("c_acctbal") > 9000)
        .select(col("c_custkey").as("k"))
      val big = t(s, d, "orders").filter(col("o_totalprice") > 450000)
        .select(col("o_custkey").as("k"))
      def tag(df: DataFrame, op: String) =
        df.agg(count(lit(1)).as("n")).select(lit(op).as("op"), col("n"))
      tag(rich.union(big).distinct(), "union")
        .union(tag(rich.unionAll(big), "union_all"))
        .union(tag(rich.intersect(big), "intersect"))
        .union(tag(rich.intersectAll(big), "intersect_all"))
        .union(tag(rich.except(big), "except"))
        .union(tag(rich.exceptAll(big), "except_all"))
        .orderBy("op")
    }),

    // JSON parsing via from_json (schema'd), not regex: per-key-decile
    // event-value stats.
    "q29_from_json" -> ((s, d) =>
      t(s, d, "events")
        .withColumn("k",
          from_json(col("props"), org.apache.spark.sql.types.StructType.fromDDL("k INT"))
            .getField("k"))
        // integer div, not /: DuckDB casts float->int by ROUNDING, Spark by
        // truncation — `div`/`//` floor identically for positive ints
        .groupBy(expr("k div 10").cast("int").as("k_decile"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .orderBy("k_decile")),

    // Spark 4 VARIANT path for the same JSON column: parse_json binary-
    // encodes once, variant_get extracts lazily — no up-front schema, and
    // at scale the open-format shredding beats re-parsing text per field
    // (the from_json struct twin q29 needs the full DDL). Exact integer
    // aggregates of the extracted field.
    "q39_variant" -> ((s, d) =>
      t(s, d, "events")
        .withColumn("k", variant_get(parse_json(col("props")), "$.k", "long"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), min(col("k")).as("min_k"),
          max(col("k")).as("max_k"), sum(col("k")).as("sum_k"))
        .orderBy("event_type")),

    // Correlated LATERAL subquery with per-row ORDER BY + LIMIT (top-2
    // nations per region by customer count) — the SQL-surface twin of the
    // q7 window top-k. Catalyst decorrelates the lateral into a
    // join + per-group rank, so the plan is the same distributed shape
    // the DataFrame form produces (no per-row re-execution).
    "q40_lateral" -> ((s, d) => {
      Seq("region", "nation", "customer")
        .foreach(n => t(s, d, n).createOrReplaceTempView(s"g40_$n"))
      s.sql("""SELECT r.r_name, t.n_name, t.n_cust FROM g40_region r,
        |LATERAL (SELECT n.n_name, COUNT(c.c_custkey) AS n_cust
        |  FROM g40_nation n JOIN g40_customer c ON c.c_nationkey = n.n_nationkey
        |  WHERE n.n_regionkey = r.r_regionkey
        |  GROUP BY n.n_name ORDER BY n_cust DESC, n.n_name LIMIT 2) t
        |ORDER BY r.r_name, t.n_cust DESC, t.n_name""".stripMargin)
    }),

    // ---- scalar functions -------------------------------------------------
    "q13_string_part" -> ((s, d) =>
      t(s, d, "part")
        .filter(col("p_partkey") < 100)
        .select(
          col("p_partkey"),
          upper(col("p_name")).as("name_upper"),
          length(col("p_name")).as("name_len"),
          substring(col("p_name"), 1, 3).as("name_pre"),
          split_part(col("p_name"), lit(" "), lit(1)).as("first_word"),
          regexp_extract(col("p_brand"), "Brand#(\\d+)", 1).cast("int").as("brand_num"),
          concat(col("p_brand"), lit("/"), col("p_type")).as("brand_type"))
        .orderBy("p_partkey")),

    "q14_order_seasonality" -> ((s, d) =>
      t(s, d, "orders")
        .groupBy(year(col("o_orderdate")).as("yr"), month(col("o_orderdate")).as("mo"))
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("sum_price"))
        .orderBy("yr", "mo")),

    // Regex-based JSON field extraction (works identically in both engines
    // without JSON extensions; see also get_json_object in EventQueries).
    "q18_json_events" -> ((s, d) =>
      t(s, d, "events")
        .withColumn("k", regexp_extract(col("props"), "\"k\": (\\d+)", 1).cast("int"))
        .groupBy(col("event_type"), (col("k") % 10).as("k_bucket"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .orderBy("event_type", "k_bucket")),

    // Exact interpolated percentiles (both engines use the same
    // (n-1)p index + linear interpolation definition).
    //
    // SCALE CAVEAT — deliberate: built-in percentile() collects EVERY value
    // of a group into one aggregation buffer, so this plan dies at 100 TB.
    // It stays in the gate because exercising the exact builtin is this
    // query's point; the scale-safe path that returns the SAME exact
    // numbers with bounded state is SketchOps.exactQuantileRefine (gate
    // q34_quantile_refine), and PipelineOpsSpec pins their equality on this
    // very table.
    "q22_percentiles" -> ((s, d) =>
      t(s, d, "orders")
        .groupBy("o_orderstatus")
        .agg(
          percentile_approx(col("o_totalprice"), lit(0.5), lit(1000000)).as("approx_median"),
          expr("percentile(o_totalprice, 0.5)").as("median_price"),
          expr("percentile(o_totalprice, 0.9)").as("p90_price"),
          min(col("o_totalprice")).as("min_price"),
          max(col("o_totalprice")).as("max_price"))
        .drop("approx_median") // exercised, but sketch output isn't oracle-comparable
        .orderBy("o_orderstatus")),

    // Pivot (dynamic column generation from values).
    "q23_pivot" -> ((s, d) =>
      t(s, d, "lineitem")
        .groupBy("l_linestatus")
        .pivot("l_returnflag", Seq("A", "N", "R"))
        .agg(dsum(col("l_quantity")))
        .orderBy("l_linestatus")),

    // Sorted array aggregation (deterministic collect).
    "q24_array_agg" -> ((s, d) =>
      t(s, d, "customer")
        .filter(col("c_custkey") < 50)
        .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"))
        .filter(col("o_totalprice") > 300000)
        .groupBy("c_custkey")
        .agg(concat_ws(",", sort_array(collect_set(col("o_orderkey")))).as("big_orders"))
        .orderBy("c_custkey")),

    // Window-function suite: lead/lag offsets, ntile, percent_rank,
    // first/last over frames — one query covering the window surface.
    "q27_window_suite" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
      val wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t(s, d, "orders")
        .filter(col("o_custkey") < 30)
        .select(col("o_custkey"), col("o_orderkey"),
          lead(col("o_orderkey"), 1).over(w).as("next_order"),
          ntile(4).over(w).as("quartile"),
          round(percent_rank().over(w), 6).as("pct_rank"),
          first(col("o_orderkey")).over(wf).as("first_order"),
          last(col("o_orderkey")).over(wf).as("last_order"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    // Date arithmetic: shifted dates, truncation, day-difference buckets.
    "q28_date_arith" -> ((s, d) =>
      t(s, d, "orders")
        .filter(col("o_orderkey") < 200)
        .select(col("o_orderkey"),
          date_add(col("o_orderdate").cast("date"), 30).cast("string").as("due_date"),
          date_trunc("quarter", col("o_orderdate")).cast("date").cast("string").as("quarter_start"),
          datediff(lit("2000-01-01").cast("date"), col("o_orderdate").cast("date")).as("days_to_y2k"))
        .orderBy("o_orderkey")),

    // Sketch aggregates: approx_count_distinct (HLL++) next to the exact
    // count. No oracle — sketch estimates are engine-specific by nature;
    // QueriesSpec asserts the estimate lands within HLL's error bound.
    // Plan note: the exact counts run as separate two-phase
    // distinct-then-count aggregates and the two sketches share one scan,
    // glued with 1-row cross joins — a single agg with two countDistinct
    // columns would go through Catalyst's multi-distinct Expand (3× every
    // input row through the shuffle), the classic multi-distinct trap.
    "q26_approx_distinct" -> ((s, d) => {
      val li = t(s, d, "lineitem")
      def exact(c: String, as: String) =
        li.select(col(c)).filter(col(c).isNotNull).distinct()
          .agg(count(lit(1)).as(as))
      exact("l_partkey", "exact_parts")
        .crossJoin(li.agg(
          approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"),
          approx_count_distinct(col("l_orderkey"), 0.02).as("approx_orders")))
        .crossJoin(exact("l_orderkey", "exact_orders"))
        .select("exact_parts", "approx_parts", "exact_orders", "approx_orders")
    }),

    // GROUPING SETS through the SQL surface (spark.sql on a temp view).
    // The view is registered under a collision-proof name and dropped as
    // soon as the statement is analyzed — sql() resolves eagerly, so the
    // returned DataFrame stays valid and no session state leaks.
    "q25_grouping_sets" -> ((s, d) => {
      val view = s"graft_lineitem_${java.util.UUID.randomUUID().toString.replace("-", "")}"
      t(s, d, "lineitem").createOrReplaceTempView(view)
      try s.sql(
        s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
           |  CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
           |  CAST(GROUPING(l_linestatus) AS INT) AS g_ls
           |FROM $view
           |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
           |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin)
      finally s.catalog.dropTempView(view)
    }))

  def oracleSql: Map[String, String] = Map(
    "q2_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_quantity, l_extendedprice
        |FROM lineitem WHERE l_quantity >= 50 AND l_discount = 0.0
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q1_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${sqlDsum("l_quantity")} AS sum_qty,
         |  ${sqlDsum("l_extendedprice")} AS sum_base_price,
         |  CAST(SUM($sqlRevenue) AS DOUBLE) AS sum_disc_price,
         |  ${sqlDavg("l_quantity")} AS avg_qty,
         |  ${sqlDavg("l_discount")} AS avg_disc,
         |  COUNT(*) AS count_order
         |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2001-09-01'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q6_revenue_forecast" ->
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS promo_revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24""".stripMargin,
    "q9_rollup_lineitem" ->
      s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS n, ${sqlDsum("l_quantity")} AS sum_qty
         |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
         |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "q10_cube_orders" ->
      s"""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n, ${sqlDsum("o_totalprice")} AS sum_price
         |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
         |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,
    "q32_zorder" ->
      s"""WITH b AS (SELECT (l_partkey * 131) % 65536 AS zx,
         |  (l_suppkey * 521) % 65536 AS zy FROM lineitem),
         |z AS (SELECT zx, zy, ${LayoutOps.sqlZorder16("zx", "zy")} AS zz FROM b),
         |t AS (SELECT zz >> 26 AS tile, zx, zy FROM z)
         |SELECT tile, COUNT(*) AS n_rows,
         |  MIN(zx) AS x_min, MAX(zx) AS x_max,
         |  MIN(zy) AS y_min, MAX(zy) AS y_max
         |FROM t GROUP BY tile ORDER BY tile""".stripMargin,
    "q11_distinct_parts" ->
      """SELECT l_returnflag,
        |  COUNT(DISTINCT l_partkey) AS n_parts,
        |  COUNT(DISTINCT l_suppkey) AS n_supps,
        |  COUNT(DISTINCT (l_partkey, l_suppkey)) AS n_part_supp
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q15_having_suppliers" ->
      s"""SELECT l_suppkey, ${sqlDsum("l_quantity")} AS total_qty, COUNT(*) AS n_items
         |FROM lineitem GROUP BY l_suppkey
         |HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) > 3000
         |ORDER BY l_suppkey""".stripMargin,
    "q3_top_revenue_orders" ->
      s"""SELECT l_orderkey, CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS orderdate,
         |  CAST(SUM($sqlRevenue) AS DOUBLE) AS order_revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |WHERE c_mktsegment = 'HOUSEHOLD'
         |  AND o_orderdate < TIMESTAMP '1998-01-01'
         |  AND l_shipdate > TIMESTAMP '1998-01-01'
         |GROUP BY l_orderkey, CAST(CAST(o_orderdate AS DATE) AS VARCHAR)
         |ORDER BY order_revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q5_region_revenue" ->
      s"""SELECT n_name, CAST(SUM($sqlRevenue) AS DOUBLE) AS region_revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |GROUP BY n_name ORDER BY region_revenue DESC, n_name""".stripMargin,
    "q4_exists_orders" ->
      """SELECT o_orderpriority, COUNT(*) AS n_orders
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity >= 48)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q21_anti_customers" ->
      s"""SELECT c_mktsegment, COUNT(*) AS n_customers, ${sqlDsum("c_acctbal")} AS sum_bal
         |FROM customer
         |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 400000)
         |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q16_order_histogram" ->
      """WITH per_cust AS (
        |  SELECT c_custkey, COUNT(o_orderkey) AS n_orders
        |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |  GROUP BY c_custkey)
        |SELECT n_orders, COUNT(*) AS n_customers
        |FROM per_cust GROUP BY n_orders ORDER BY n_orders""".stripMargin,
    "q19_ship_lag" ->
      """SELECT CAST(date_diff('day', o_orderdate, l_shipdate) AS INTEGER) AS lag_days, COUNT(*) AS n_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE date_diff('day', o_orderdate, l_shipdate) BETWEEN 0 AND 30
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q17_small_qty_revenue" ->
      s"""SELECT ${sqlDsum("l_extendedprice")} / 7.0 AS avg_yearly
         |FROM lineitem
         |JOIN part ON l_partkey = p_partkey
         |JOIN (SELECT l_partkey AS ap_partkey, ${sqlDavg("l_quantity")} AS avg_qty
         |      FROM lineitem GROUP BY l_partkey) a ON l_partkey = ap_partkey
         |WHERE p_brand = 'Brand#2' AND l_quantity < 0.2 * avg_qty""".stripMargin,
    "q7_priority_top3" ->
      """SELECT o_orderpriority, rn, o_orderkey, o_totalprice FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) x
        |WHERE rn <= 3 ORDER BY o_orderpriority, rn""".stripMargin,
    "q8_running_total" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend,
        |  LAG(o_totalprice, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_price
        |FROM orders WHERE o_custkey < 20
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q20_asof_clicks" ->
      """SELECT event_id, user_id, last_click_us FROM (
        |  SELECT event_id, user_id, event_type,
        |    MAX(CASE WHEN event_type = 'click' THEN epoch_us(ts) END) OVER (
        |      PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_click_us
        |  FROM events WHERE event_type IN ('click', 'error')) x
        |WHERE event_type = 'error' ORDER BY event_id""".stripMargin,
    // pivot: conditional decimal sums per explicit value — DuckDB CASE
    // form, the exact relational equivalent of Spark's explicit-list
    // pivot
    "q45_percent_rank" ->
      """SELECT c_mktsegment, c_custkey, c_acctbal, pr, cd, CAST(rn AS BIGINT) AS rn
        |FROM (SELECT c_mktsegment, c_custkey, c_acctbal,
        |    percent_rank() OVER (PARTITION BY c_mktsegment
        |      ORDER BY c_acctbal DESC) AS pr,
        |    cume_dist() OVER (PARTITION BY c_mktsegment
        |      ORDER BY c_acctbal DESC) AS cd,
        |    ROW_NUMBER() OVER (PARTITION BY c_mktsegment
        |      ORDER BY c_acctbal DESC, c_custkey) AS rn
        |  FROM customer) x
        |WHERE rn <= 3 ORDER BY c_mktsegment, rn""".stripMargin,

    "q44_pivot" ->
      """SELECT epoch_us(ts) // 86400000000 AS day,
        |  CAST(SUM(CASE WHEN event_type = 'click'
        |    THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS click,
        |  CAST(SUM(CASE WHEN event_type = 'view'
        |    THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS view,
        |  CAST(SUM(CASE WHEN event_type = 'purchase'
        |    THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS purchase,
        |  CAST(SUM(CASE WHEN event_type = 'signup'
        |    THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS signup,
        |  CAST(SUM(CASE WHEN event_type = 'error'
        |    THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS error
        |FROM events GROUP BY day ORDER BY day""".stripMargin,

    "q12_setops" ->
      """WITH rich AS (SELECT c_custkey AS k FROM customer WHERE c_acctbal > 9000),
        |     big AS (SELECT o_custkey AS k FROM orders WHERE o_totalprice > 450000)
        |SELECT 'union' AS op, COUNT(*) AS n FROM (SELECT k FROM rich UNION SELECT k FROM big) u
        |UNION ALL
        |SELECT 'union_all', COUNT(*) FROM (SELECT k FROM rich UNION ALL SELECT k FROM big) ua
        |UNION ALL
        |SELECT 'intersect', COUNT(*) FROM (SELECT k FROM rich INTERSECT SELECT k FROM big) i
        |UNION ALL
        |SELECT 'intersect_all', COUNT(*) FROM (SELECT k FROM rich INTERSECT ALL SELECT k FROM big) ia
        |UNION ALL
        |SELECT 'except', COUNT(*) FROM (SELECT k FROM rich EXCEPT SELECT k FROM big) e
        |UNION ALL
        |SELECT 'except_all', COUNT(*) FROM (SELECT k FROM rich EXCEPT ALL SELECT k FROM big) ea
        |ORDER BY op""".stripMargin,
    "q29_from_json" ->
      s"""SELECT CAST(CAST(props->>'k' AS INTEGER) // 10 AS INTEGER) AS k_decile,
         |  COUNT(*) AS n, ${sqlDsum("value")} AS sum_value
         |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q40_lateral" ->
      """SELECT r.r_name, t.n_name, t.n_cust FROM region r,
        |LATERAL (SELECT n.n_name, COUNT(c.c_custkey) AS n_cust
        |  FROM nation n JOIN customer c ON c.c_nationkey = n.n_nationkey
        |  WHERE n.n_regionkey = r.r_regionkey
        |  GROUP BY n.n_name ORDER BY n_cust DESC, n.n_name LIMIT 2) t
        |ORDER BY r.r_name, t.n_cust DESC, t.n_name""".stripMargin,

    "q39_variant" ->
      """SELECT event_type, COUNT(*) AS n,
        |  MIN(CAST(props->>'k' AS BIGINT)) AS min_k,
        |  MAX(CAST(props->>'k' AS BIGINT)) AS max_k,
        |  CAST(SUM(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS sum_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q13_string_part" ->
      """SELECT p_partkey,
        |  UPPER(p_name) AS name_upper,
        |  CAST(LENGTH(p_name) AS INTEGER) AS name_len,
        |  SUBSTRING(p_name, 1, 3) AS name_pre,
        |  SPLIT_PART(p_name, ' ', 1) AS first_word,
        |  CAST(regexp_extract(p_brand, 'Brand#(\d+)', 1) AS INTEGER) AS brand_num,
        |  p_brand || '/' || p_type AS brand_type
        |FROM part WHERE p_partkey < 100 ORDER BY p_partkey""".stripMargin,
    "q14_order_seasonality" ->
      s"""SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS yr,
         |  CAST(EXTRACT(MONTH FROM o_orderdate) AS INTEGER) AS mo,
         |  COUNT(*) AS n_orders, ${sqlDsum("o_totalprice")} AS sum_price
         |FROM orders GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q18_json_events" ->
      s"""SELECT event_type,
         |  CAST(regexp_extract(props, '"k": (\\d+)', 1) AS INTEGER) % 10 AS k_bucket,
         |  COUNT(*) AS n, ${sqlDsum("value")} AS sum_value
         |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q22_percentiles" ->
      """SELECT o_orderstatus,
        |  quantile_cont(o_totalprice, 0.5) AS median_price,
        |  quantile_cont(o_totalprice, 0.9) AS p90_price,
        |  MIN(o_totalprice) AS min_price, MAX(o_totalprice) AS max_price
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q23_pivot" ->
      """SELECT l_linestatus,
        |  CAST(SUM(CASE WHEN l_returnflag = 'A' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS A,
        |  CAST(SUM(CASE WHEN l_returnflag = 'N' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS N,
        |  CAST(SUM(CASE WHEN l_returnflag = 'R' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS R
        |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,
    "q24_array_agg" ->
      """SELECT c_custkey,
        |  array_to_string(list_sort(list(DISTINCT o_orderkey)), ',') AS big_orders
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |WHERE c_custkey < 50 AND o_totalprice > 300000
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,
    "q25_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        |  CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
        |  CAST(GROUPING(l_linestatus) AS INT) AS g_ls
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "q27_window_suite" ->
      """SELECT o_custkey, o_orderkey,
        |  LEAD(o_orderkey, 1) OVER w AS next_order,
        |  CAST(NTILE(4) OVER w AS INTEGER) AS quartile,
        |  round(PERCENT_RANK() OVER w, 6) AS pct_rank,
        |  FIRST_VALUE(o_orderkey) OVER wf AS first_order,
        |  LAST_VALUE(o_orderkey) OVER wf AS last_order
        |FROM orders WHERE o_custkey < 30
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
        |  wf AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q28_date_arith" ->
      """SELECT o_orderkey,
        |  CAST(CAST(o_orderdate AS DATE) + 30 AS VARCHAR) AS due_date,
        |  CAST(CAST(date_trunc('quarter', o_orderdate) AS DATE) AS VARCHAR) AS quarter_start,
        |  CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS INTEGER) AS days_to_y2k
        |FROM orders WHERE o_orderkey < 200 ORDER BY o_orderkey""".stripMargin)
}
