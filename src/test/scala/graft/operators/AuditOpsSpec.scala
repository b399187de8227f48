package graft.operators

import graft.SparkTestBase
import graft.operators.AuditOps.Check._
import org.apache.spark.sql.functions._

/** Semantics the DuckDB oracle can't pin: the null discipline (one root
  * cause fires exactly one check), the shared-scan plan shape, exact
  * boundary behavior of the integer z-score rewrite, and call-site
  * validation errors.
  */
class AuditOpsSpec extends SparkTestBase {
  import spark.implicits._

  private def report(checks: Seq[AuditOps.Check]) = {
    val child = Seq(
      (1L, Option(10L), Option("a")), // clean
      (2L, Option(10L), Option("a")), // duplicate key with row 3
      (2L, Option(99L), None), // dup id, orphan fk, null name
      (3L, None, Option("z"))) // null fk
      .toDF("id", "fk", "name")
    val parent = Seq(10L, 11L).toDF("pk")
    AuditOps.dataQualityReport(Map("child" -> child, "parent" -> parent), checks)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
  }

  test("dataQualityReport: each defect fires exactly its own check") {
    val got = report(Seq(
      NotNull("child", "name"),
      UniqueKey("child", Seq("id")),
      FkIntegrity("child", "fk", "parent", "pk"),
      InRange("child", "id", "1", "2"),
      AcceptedValues("child", "name", Seq("a"))))
    // one null name
    assert(got("nn_child_name") == ((1L, 4L, 0L)))
    // 4 rows, 3 distinct ids -> 1 surplus row
    assert(got("uk_child_id") == ((1L, 4L, 0L)))
    // null fk is SKIPPED (not an orphan): 3 non-null fks, one orphan (99)
    assert(got("fk_child_fk") == ((1L, 3L, 0L)))
    // id=3 out of [1,2]; nulls n/a here
    assert(got("rng_child_id") == ((1L, 4L, 0L)))
    // null name NOT a domain violation; 'z' is
    assert(got("av_child_name") == ((1L, 4L, 0L)))
  }

  test("dataQualityReport: clean table passes every check with full totals") {
    val got = report(Seq(
      NotNull("child", "id"),
      InRange("child", "id", "1", "3"),
      AcceptedValues("child", "id", Seq("1", "2", "3")),
      RowCountBetween("child", 1, 10)))
    assert(got.values.forall { case (v, t, p) => v == 0L && t == 4L && p == 1L })
  }

  test("RowCountBetween: violations measure the distance outside the bounds") {
    val short = report(Seq(RowCountBetween("child", 6, 10)))("rc_child")
    assert(short == ((2L, 4L, 0L)), "4 rows vs [6,10] -> 2 short")
    val long = report(Seq(RowCountBetween("child", 1, 3)))("rc_child")
    assert(long == ((1L, 4L, 0L)), "4 rows vs [1,3] -> 1 over")
  }

  test("dataQualityReport: row-level checks on one table share a single scan") {
    // Pin the PHYSICAL sharing, not a logical-plan relation count that
    // holds even without sharing (ADVICE r7 — and the physical pin found a
    // real defect: the old per-check union let column pruning split the
    // fused agg into one scan PER CHECK). The explode-from-one-agg-row
    // shape must plan exactly one scan, one exchange, no union.
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = Seq((1L, "a"), (2L, "b")).toDF("id", "name")
      val plan = AuditOps.dataQualityReport(Map("t" -> df),
        Seq(NotNull("t", "id"), NotNull("t", "name"), InRange("t", "id", "1", "2"),
          AcceptedValues("t", "name", Seq("a", "b"))))
        .queryExecution.executedPlan.toString
      val scans = "LocalTableScan".r.findAllIn(plan).length
      val exchanges = "Exchange".r.findAllIn(plan).length
      assert(scans == 1, s"expected ONE physical scan, got $scans\n$plan")
      assert(exchanges == 1, s"expected ONE exchange, got $exchanges\n$plan")
      assert(!plan.contains("Union"), s"expected no union of per-check branches\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("calibrationReport: hand-computed bins, acc, integer-exact ECE") {
    // bin0: (0.05,T),(0.05,F) -> n=2, pos=1, acc=0.5, |20·1−2·1| = 18
    // bin9: (0.95,T)×3       -> n=3, pos=3, acc=1.0, |20·3−3·19| = 3
    // ECE = 21 / (20·5) = 0.21 = (2·0.45 + 3·0.05)/5
    val df = Seq((0.05, true), (0.05, false), (0.95, true), (0.95, true),
      (0.95, true)).toDF("s", "y")
    val r = AuditOps.calibrationReport(df, col("s"), col("y")).orderBy("bin").collect()
    assert(r.length == 2)
    assert(r(0).getLong(0) == 0 && r(0).getLong(2) == 2 && r(0).getLong(3) == 1)
    assert(r(0).getDouble(1) == 0.05 && r(0).getDouble(4) == 0.5)
    assert(r(0).getDouble(5) == 0.21)
    assert(r(1).getLong(0) == 9 && r(1).getDouble(4) == 1.0 && r(1).getDouble(5) == 0.21)
    // boundary clamp: score exactly 1.0 lands in the top bin, not bin 10
    val edge = Seq((1.0, true)).toDF("s", "y")
    assert(AuditOps.calibrationReport(edge, col("s"), col("y"))
      .collect()(0).getLong(0) == 9)
  }

  test("categoricalDrift: hand-computed TVD and chi-square; one-sided categories") {
    // old = [a,a,a,b], new = [a,b]: No=4, Nn=2, N=6
    //  a: o=3,n=1,c=4 -> chi2 = (18−16)²/96 + (6−8)²/48 = 1/24 + 1/12 = 0.125
    //  b: o=1,n=1,c=2 -> chi2 = (6−8)²/48 + (6−4)²/24 = 1/12 + 1/6
    //  TVD = (|3·2−1·4| + |1·2−1·4|) / (2·4·2) = 4/16 = 0.25
    val o = Seq("a", "a", "a", "b").toDF("cat0")
    val n = Seq("a", "b").toDF("cat0")
    val r = AuditOps.categoricalDrift(o, n, "cat0").orderBy("cat").collect()
    assert(r.length == 2)
    assert(r(0).getLong(1) == 3 && r(0).getLong(2) == 1)
    assert(r(0).getDouble(3) == 0.75 && r(0).getDouble(4) == 0.5)
    assert(math.abs(r(0).getDouble(5) - (4.0 / 96 + 4.0 / 48)) < 1e-15)
    assert(math.abs(r(1).getDouble(5) - (4.0 / 48 + 4.0 / 24)) < 1e-15)
    assert(r(0).getDouble(6) == 0.25 && r(1).getDouble(6) == 0.25)
    // a category present only in the new snapshot still reports
    val r2 = AuditOps.categoricalDrift(Seq("a").toDF("cat0"),
      Seq("a", "b").toDF("cat0"), "cat0").orderBy("cat").collect()
    assert(r2(1).getLong(1) == 0 && r2(1).getLong(2) == 1)
    assert(r2(1).getDouble(3) == 0.0)
  }

  test("numericAuditReport: column-for-column equal to the three separate detectors") {
    // the fused op's whole contract: same numbers as outlierReport +
    // robustOutlierReport + winsorize run independently on the same input
    val ev = Tables.t(spark, sfDir, "events")
    val fused = AuditOps.numericAuditReport(ev, col("value"), "event_type")
      .orderBy("event_type").collect()
    val zs = AuditOps.outlierReport(ev, "event_type", "value", z = 3)
      .orderBy("grp").collect()
    val rb = AuditOps.robustOutlierReport(ev, col("value"), "event_type")
      .orderBy("event_type").collect()
    val ws = AuditOps.winsorize(ev, col("value"), "event_type", 25, 975)
      .orderBy("event_type").collect()
    assert(fused.length == zs.length && fused.length == rb.length
      && fused.length == ws.length)
    fused.indices.foreach { i =>
      val (f, z, r, w) = (fused(i), zs(i), rb(i), ws(i))
      assert(f.getString(0) == z.getString(0))
      // z-score block: n_rows, n_outliers, min/max outlier
      assert(f.getLong(1) == z.getLong(1), s"n_rows ${f.getString(0)}")
      assert(f.getLong(2) == z.getLong(2), s"n_outliers ${f.getString(0)}")
      assert(f.get(3) == z.get(4) && f.get(4) == z.get(3),
        s"min/max outlier ${f.getString(0)}")
      // robust block: med, mad, n_flagged
      assert(f.getDouble(5) == r.getDouble(2) && f.getDouble(6) == r.getDouble(3),
        s"med/mad ${f.getString(0)}")
      assert(f.getLong(7) == r.getLong(4), s"n_flagged ${f.getString(0)}")
      // winsorize block: lo/hi cut, clip counts, winsorized sum
      assert(f.getDouble(8) == w.getDouble(4) && f.getDouble(9) == w.getDouble(5),
        s"cuts ${f.getString(0)}")
      assert(f.getLong(10) == w.getLong(2) && f.getLong(11) == w.getLong(3),
        s"clips ${f.getString(0)}")
      assert(f.getDouble(12) == w.getDouble(6), s"win_sum ${f.getString(0)}")
    }
  }

  test("outlierReport: exact strict-inequality boundary, floor semantics, null skip") {
    // group g: values 0,0,0,0,16 -> n=5, S=16, S2=256
    // x=16: (5*16-16)^2 = 4096 > 9*(5*256-256) = 9216? NO -> z=3 keeps it
    // at z=2: 4096 > 4*1024 = 4096? strict > -> still NOT an outlier (tie)
    // at z=1: 4096 > 1024 -> outlier
    val df = Seq(("g", Some(0.0)), ("g", Some(0.0)), ("g", Some(0.0)),
      ("g", Some(0.0)), ("g", Some(16.9)), // floor -> 16
      ("g", None)) // null skipped entirely
      .toDF("grp", "v")
    def run(z: Int) = AuditOps.outlierReport(df, "grp", "v", z).collect()(0)
    assert(run(3).getLong(2) == 0L)
    assert(run(2).getLong(2) == 0L, "tie must NOT be an outlier (strict >)")
    val r1 = run(1)
    assert(r1.getLong(1) == 5L && r1.getLong(2) == 1L)
    assert(r1.getLong(3) == 16L && r1.getLong(4) == 16L)
  }

  test("anomalyVerdicts: cold start, zero-variance deviation, prior-only stats") {
    // group g in arrival order: 0,0,0,0,16,0 with minPrior=2
    //  rows 1-2: fewer than 2 predecessors -> unscored
    //  rows 3-4 (x=0): prior variance 0, x == prior mean -> clean
    //  row 5 (x=16): prior variance 0, ANY deviation fires (4·16-0)² > 0
    //  row 6 (x=0): priors now 0,0,0,0,16 -> (5·0-16)²=256 vs 9·(5·256-256)
    val df = Seq(("g", 1L, 10L, 0.0), ("g", 2L, 11L, 0.0), ("g", 3L, 12L, 0.0),
      ("g", 4L, 13L, 0.0), ("g", 5L, 14L, 16.2), ("g", 6L, 15L, 0.0))
      .toDF("grp", "ord", "id", "v")
    val got = AuditOps.anomalyVerdicts(df, "grp", "ord", "id", "v", z = 3, minPrior = 2)
      .orderBy("id").collect()
    assert(got.map(_.getBoolean(3)).toSeq ==
      Seq(false, false, true, true, true, true), "scored flags")
    assert(got.map(_.getBoolean(4)).toSeq ==
      Seq(false, false, false, false, true, false), "anomaly flags")
    // floor semantics: 16.2 entered the stats as 16
    assert(got(4).getLong(2) == 16L)
    val rep = AuditOps.anomalyReport(df, "grp", "ord", "id", "v", z = 3, minPrior = 2)
      .collect()(0)
    assert(rep.getLong(1) == 4L && rep.getLong(2) == 1L)
    assert(rep.getLong(3) == 14L && rep.getLong(4) == 14L)
  }

  test("winsorize: quantile_cont cutoffs, clip counts, exact clipped sum") {
    // values 1..100 in one group; lo=100‰ -> idx 9.9 -> 10.9; hi=800‰ ->
    // idx 79.2 -> 80.2; clip 10 below / 20 above;
    // sum = Σ(11..80) + 10·10.9 + 20·80.2 = 3185 + 109 + 1604 = 4898
    val df = (1 to 100).map(i => ("g", i.toDouble)).toDF("grp", "v")
    val r = AuditOps.winsorize(df, col("v"), "grp", 100, 800).collect()(0)
    assert(r.getLong(1) == 100L)
    assert(r.getLong(2) == 10L && r.getLong(3) == 20L)
    assert(math.abs(r.getDouble(4) - 10.9) < 1e-12)
    assert(math.abs(r.getDouble(5) - 80.2) < 1e-12)
    assert(math.abs(r.getDouble(6) - 4898.0) < 1e-9)
  }

  test("aucReport: tie-averaged ranks, hand-computed 7/9, degenerate classes NULL") {
    // scores (1,1,2,3,3,3), positives at (2,3,3): pairwise wins = 6,
    // ties vs the negative 3 = 2 halves -> AUC = 7/9
    val df = Seq((1, false), (1, false), (2, true),
      (3, true), (3, true), (3, false)).toDF("s", "y")
    val r = AuditOps.aucReport(df, col("s"), col("y")).collect()(0)
    assert(r.getLong(0) == 6L && r.getLong(1) == 3L && r.getLong(2) == 3L)
    assert(r.getDouble(3) == 7.0 / 9.0)
    // single-class input: AUC is NULL, counts still reported
    val onePos = AuditOps.aucReport(df.filter(col("y")), col("s"), col("y")).collect()(0)
    assert(onePos.getLong(1) == 3L && onePos.getLong(2) == 0L && onePos.isNullAt(3))
    // perfect separation sanity: all positives above all negatives
    val perfect = Seq((1, false), (2, false), (5, true), (6, true)).toDF("s", "y")
    assert(AuditOps.aucReport(perfect, col("s"), col("y")).collect()(0).getDouble(3) == 1.0)
  }

  test("robustOutlierReport: median 5.5, MAD 2.5, only the planted extreme flagged") {
    // 1..9 plus 1000: median = 5.5, |v-med| sorted has median 2.5; the
    // z-score detector would be dragged by the 1000 (mean ~104, sigma
    // ~297 -> nothing flags at z=3); MAD flags exactly the plant
    val df = ((1 to 9).map(_.toDouble) :+ 1000.0).map(("g", _)).toDF("grp", "v")
    val r = AuditOps.robustOutlierReport(df, col("v"), "grp", k = 3).collect()(0)
    assert(r.getLong(1) == 10L)
    assert(r.getDouble(2) == 5.5 && r.getDouble(3) == 2.5)
    assert(r.getLong(4) == 1L)
    // contrast: the mean/sigma detector is blinded by its own outlier
    val z = AuditOps.outlierReport(df, "grp", "v", z = 3).collect()(0)
    assert(z.getLong(2) == 0L, "z=3 should NOT flag (sigma dragged by the plant)")
  }

  test("aucReportBy: each group's row equals the global op run on that group alone") {
    val df = Seq(("a", 1, false), ("a", 2, true), ("a", 3, true), ("a", 3, false),
      ("b", 5, true), ("b", 5, true), // group b: one class only -> NULL auc
      ("c", 1, false), ("c", 9, true))
      .toDF("src", "s", "y")
    val got = AuditOps.aucReportBy(df, col("s"), col("y"), "src")
      .orderBy("grp").collect()
    got.foreach { r =>
      val alone = AuditOps.aucReport(df.filter(col("src") === r.getString(0)),
        col("s"), col("y")).collect()(0)
      assert(r.getLong(1) == alone.getLong(0) && r.getLong(2) == alone.getLong(1))
      if (alone.isNullAt(3)) assert(r.isNullAt(4))
      else assert(r.getDouble(4) == alone.getDouble(3))
    }
    assert(got.find(_.getString(0) == "b").get.isNullAt(4))
    assert(got.find(_.getString(0) == "c").get.getDouble(4) == 1.0)
  }

  test("completenessReport: per-day null counts, exact cross-multiplied deltas, NULL first day") {
    import spark.implicits._
    // day 0: a has 1/4 nulls, b has 0/4; day 1: a 2/4, b 1/4
    val rows = Seq(
      (0L, Option(1.0), Option("x")), (0L, None, Option("y")),
      (0L, Option(2.0), Option("z")), (0L, Option(3.0), Option("w")),
      (1L, None, Option("x")), (1L, None, None),
      (1L, Option(4.0), Option("y")), (1L, Option(5.0), Option("z")))
      .toDF("day", "a", "b")
    val r = AuditOps.completenessReport(rows, Seq("a", "b"), col("day"))
      .orderBy("column_name", "day").collect()
    // rows: (a,0), (a,1), (b,0), (b,1)
    assert(r(0).getLong(2) == 4 && r(0).getLong(3) == 1 && r(0).isNullAt(5))
    assert(r(1).getLong(3) == 2 && r(1).getDouble(4) == 0.5)
    // delta a: (2*4 - 1*4) / (4*4) = 0.25 exactly
    assert(r(1).getDouble(5) == 0.25, r(1).toString)
    assert(r(2).getLong(3) == 0 && r(2).isNullAt(5))
    // delta b: (1*4 - 0*4) / 16 = 0.25
    assert(r(3).getDouble(5) == 0.25, r(3).toString)
  }

  test("validation: unknown tables and duplicate check ids fail at the call site") {
    val df = Seq((1L, "a")).toDF("id", "name")
    val e1 = intercept[IllegalArgumentException] {
      AuditOps.dataQualityReport(Map("t" -> df), Seq(NotNull("nope", "id")))
    }
    assert(e1.getMessage.contains("unknown table"))
    val e2 = intercept[IllegalArgumentException] {
      AuditOps.dataQualityReport(Map("t" -> df),
        Seq(NotNull("t", "id"), NotNull("t", "id")))
    }
    assert(e2.getMessage.contains("duplicate check ids"))
    val e3 = intercept[IllegalArgumentException] {
      AuditOps.dataQualityReport(Map("t" -> df),
        Seq(FkIntegrity("t", "id", "missing_parent", "pk")))
    }
    assert(e3.getMessage.contains("unknown parent table"))
  }

  test("ksReport: hand-computed KS with deterministic smallest arg-max") {
    // A=[1,2,3], B=[2,3,4]: cum_a=(1,2,3,3), cum_b=(0,1,2,3), n=3 each;
    // |cum_a*3 - cum_b*3| = (3,3,3,0) -> D=3/9 at the SMALLEST value 1
    val rows = Seq((1.0, true), (2.0, true), (3.0, true),
      (2.0, false), (3.0, false), (4.0, false)).toDF("v", "side")
    val r = AuditOps.ksReport(rows, col("v"), col("side")).collect()(0)
    assert(r.getLong(0) == 3 && r.getLong(1) == 3)
    assert(r.getLong(2) == 3, s"ks_num: $r")
    assert(r.getDouble(3) == 3.0 / 9.0)
    assert(r.getDouble(4) == 1.0, s"at_value: $r")
  }

  test("ksReport: identical samples give D = 0") {
    val rows = Seq((1.0, true), (2.0, true), (1.0, false), (2.0, false))
      .toDF("v", "side")
    val r = AuditOps.ksReport(rows, col("v"), col("side")).collect()(0)
    assert(r.getLong(2) == 0 && r.getDouble(3) == 0.0)
  }

  test("ksReport: banded cumulative stays exact beyond 4096 distinct values") {
    // evens are A, odds are B over 0..9999: after value 0 the CDFs differ
    // by exactly 1/5000 and never by more -> D = 5000/(5000*5000)
    val rows = spark.range(10000)
      .select(col("id").cast("double").as("v"), (col("id") % 2 === 0).as("side"))
    val r = AuditOps.ksReport(rows, col("v"), col("side")).collect()(0)
    assert(r.getLong(0) == 5000 && r.getLong(1) == 5000)
    assert(r.getLong(2) == 5000, s"ks_num: $r")
    assert(r.getDouble(4) == 0.0, s"at_value: $r")
  }

  test("thresholdReport: argmax-F1 cutoff from exact confusion counts; NULL label = negative") {
    // scores/labels: (1,+), (1,-), (2,+), (3,+), (3,NULL->-) — N=5, P=3
    // t=1: tp=3 fp=2 fn=0 -> F1 0.75; t=2: 2/3; t=3: 0.4 -> pick t=1
    // (the NULL label counts as a negative, the aucReport convention)
    val rows = Seq((1.0, Option(true)), (1.0, Option(false)), (2.0, Option(true)),
      (3.0, Option(true)), (3.0, Option.empty[Boolean])).toDF("v", "y")
    val r = AuditOps.thresholdReport(rows, col("v"), col("y")).collect()(0)
    assert(r.getDouble(0) == 1.0, r.toString)
    assert(r.getLong(1) == 3 && r.getLong(2) == 2 && r.getLong(3) == 0, r.toString)
    assert(r.getDouble(4) == 0.6 && r.getDouble(5) == 1.0 &&
      r.getDouble(6) == 0.75, r.toString)
  }

  test("gainsReport: hand-computed quintiles, tie collapse, P=0 NULLs") {
    // 10 rows, scores 1..10 (one each), positives at 9 and 10; B=5.
    // above(s) = 10−s -> bucket = (above·5) div 10 + 1 = two rows each.
    // Bucket 1 captures both positives: gain 1.0 from bucket 1 on,
    // lift 10/cum_n: 5.0, 2.5, 5/3, 1.25, 1.0 (last bucket always 1.0).
    val rows = (1 to 10).map(i => (i.toDouble, i >= 9)).toDF("v", "y")
    val r = AuditOps.gainsReport(rows, col("v"), col("y"), 5)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
        x.getLong(3), x.getLong(4), x.getDouble(5), x.getDouble(6)))
    assert(r.length == 5, r.mkString(";"))
    assert(r(0) == ((1L, 2L, 2L, 2L, 2L, 1.0, 5.0)), r(0).toString)
    assert(r(1) == ((2L, 2L, 0L, 4L, 2L, 1.0, 2.5)), r(1).toString)
    assert(r(2) == ((3L, 2L, 0L, 6L, 2L, 1.0, 10.0 / 6.0)), r(2).toString)
    assert(r(4) == ((5L, 2L, 0L, 10L, 2L, 1.0, 1.0)), r(4).toString)
    // One giant tie-group: the whole group lands in the bucket of its
    // first row -> bucket 1 holds everything, buckets 2..5 are absent.
    val tie = (1 to 10).map(i => (7.0, i <= 3)).toDF("v", "y")
    val rt = AuditOps.gainsReport(tie, col("v"), col("y"), 5).collect()
    assert(rt.length == 1 && rt(0).getLong(0) == 1L &&
      rt(0).getLong(3) == 10L && rt(0).getLong(4) == 3L &&
      rt(0).getDouble(5) == 1.0 && rt(0).getDouble(6) == 1.0,
      rt.mkString(";"))
    // NULL score dropped, NULL label = negative (family convention)
    val nulls = Seq((Option(1.0), Option(true)), (Option(2.0), Option.empty[Boolean]),
      (Option.empty[Double], Option(true))).toDF("v", "y")
    val rn = AuditOps.gainsReport(nulls, col("v"), col("y"), 2).collect()
    assert(rn.map(_.getLong(1)).sum == 2L, rn.mkString(";"))
    assert(rn.map(_.getLong(2)).sum == 1L, rn.mkString(";"))
    // no positives at all -> gain/lift NULL, counts still exact
    val np = Seq((1.0, false), (2.0, false)).toDF("v", "y")
    val rz = AuditOps.gainsReport(np, col("v"), col("y"), 2).collect()
    assert(rz.forall(x => x.isNullAt(5) && x.isNullAt(6)), rz.mkString(";"))
    intercept[IllegalArgumentException] {
      AuditOps.gainsReport(rows, col("v"), col("y"), 1)
    }
  }

  test("gainsReportBy: per-group curves match the global op group-by-group") {
    // group A = the global gainsReport quintile example; group B = one
    // tie-group. Each group's curve must equal gainsReport run on that
    // group alone (same distinct-score construction, windows partitioned).
    val a = (1 to 10).map(i => ("A", i.toDouble, i >= 9))
    val b = (1 to 10).map(i => ("B", 7.0, i <= 3))
    val df = (a ++ b).toDF("src", "v", "y")
    val by = AuditOps.gainsReportBy(df, col("v"), col("y"), "src", 5)
      .collect().groupBy(_.getString(0))
    for (grp <- Seq("A", "B")) {
      val solo = AuditOps.gainsReport(df.filter(col("src") === grp),
        col("v"), col("y"), 5).collect().map(_.toSeq).toSeq
      val got = by(grp).map(_.toSeq.drop(1)).toSeq
      assert(got == solo, s"group $grp: $got vs solo $solo")
    }
    // NULL group keys dropped
    val withNull = df.unionAll(Seq((null.asInstanceOf[String], 1.0, true))
      .toDF("src", "v", "y"))
    assert(AuditOps.gainsReportBy(withNull, col("v"), col("y"), "src", 5)
      .count() == by.values.map(_.length).sum)
  }

  test("categoricalDriftBy: per-group panels match the global op group-by-group") {
    val oldDf = Seq(("A", "en"), ("A", "en"), ("A", "de"), ("B", "en"), ("B", "fr"))
      .toDF("src", "lang")
    val newDf = Seq(("A", "en"), ("A", "de"), ("A", "de"), ("B", "fr"))
      .toDF("src", "lang")
    val by = AuditOps.categoricalDriftBy(oldDf, newDf, "lang", "src")
      .collect().groupBy(_.getString(0))
    for (grp <- Seq("A", "B")) {
      val solo = AuditOps.categoricalDrift(
          oldDf.filter(col("src") === grp), newDf.filter(col("src") === grp), "lang")
        .orderBy("cat").collect().map(_.toSeq).toSeq
      val got = by(grp).sortBy(_.getString(1)).map(_.toSeq.drop(1)).toSeq
      assert(got == solo, s"group $grp: $got vs solo $solo")
    }
    // NULL group/category rows are dropped
    val withNull = oldDf.unionAll(
      Seq((null.asInstanceOf[String], "en"), ("A", null.asInstanceOf[String]))
        .toDF("src", "lang"))
    assert(AuditOps.categoricalDriftBy(withNull, newDf, "lang", "src").count() ==
      by.values.map(_.length).sum)
  }

  test("psiReportBy: per-group panels match the global op group-by-group") {
    val oldDf = Seq(("A", "en"), ("A", "en"), ("A", "de"), ("B", "en"), ("B", "fr"))
      .toDF("src", "lang")
    val newDf = Seq(("A", "en"), ("A", "de"), ("A", "de"), ("B", "fr"), ("B", "fr"))
      .toDF("src", "lang")
    val by = AuditOps.psiReportBy(oldDf, newDf, "lang", "src")
      .collect().groupBy(_.getString(0))
    for (grp <- Seq("A", "B")) {
      val solo = AuditOps.psiReport(
          oldDf.filter(col("src") === grp), newDf.filter(col("src") === grp), "lang")
        .orderBy("cat").collect().map(_.toSeq).toSeq
      val got = by(grp).sortBy(_.getString(1)).map(_.toSeq.drop(1)).toSeq
      assert(got == solo, s"group $grp: $got vs solo $solo")
    }
  }

  test("kAnonymityReport: hand-built groups, NULL quasi linkable, NULL sensitive uncounted") {
    // quasi (age_band): "a" x5 (3 distinct cities), "b" x2 (1 city),
    // NULL x3 (2 cities, one NULL city)
    val rows = Seq(
      (Option("a"), Option("x")), (Option("a"), Option("y")), (Option("a"), Option("z")),
      (Option("a"), Option("x")), (Option("a"), Option("x")),
      (Option("b"), Option("x")), (Option("b"), Option("x")),
      (Option.empty[String], Option("x")), (Option.empty[String], Option("y")),
      (Option.empty[String], Option.empty[String]))
      .toDF("band", "city")
    val r = AuditOps.kAnonymityReport(rows, Seq("band"), col("city"), k = 3, l = 2)
      .collect()(0)
    assert(r.getLong(0) == 10 && r.getLong(1) == 3, r.toString)
    assert(r.getLong(2) == 2, "min group is the b-band pair")
    assert(r.getLong(3) == 2 && r.getDouble(4) == 0.2, r.toString)
    assert(r.getLong(5) == 1, "b-band has one distinct city")
    assert(!r.getBoolean(6) && !r.getBoolean(7), r.toString)
    // all groups >= k and >= l distinct -> both verdicts flip true
    val ok = AuditOps.kAnonymityReport(rows.filter(col("band") === "a"),
      Seq("band"), col("city"), k = 3, l = 2).collect()(0)
    assert(ok.getBoolean(6) && ok.getBoolean(7), ok.toString)
    intercept[IllegalArgumentException] {
      AuditOps.kAnonymityReport(rows, Seq("band"), col("city"), k = 1)
    }
  }

  test("dpCounts: seed-deterministic, seed-sensitive, noise matches the Scala reference") {
    val df = (0 until 400).map(i => s"c${i % 40}").toDF("cat")
      .select(col("cat"))
    val a = AuditOps.dpCounts(df, col("cat"), seed = 11L).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = AuditOps.dpCounts(df, col("cat"), seed = 11L).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a == b, "same seed must reproduce the release exactly")
    val c = AuditOps.dpCounts(df, col("cat"), seed = 12L).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a != c, "a fresh seed is a fresh draw")
    // Scala reference of the exact mechanism for every category: the
    // emitted count must match the independent recomputation bit-for-bit
    def l7(x: Long): BigDecimal =
      BigDecimal(math.log(x.toDouble)).setScale(7, BigDecimal.RoundingMode.HALF_EVEN)
    def mdintRef(s: String): Long = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15), 16)
    def geo(cat: String, draw: Long): Long = {
      val sim = mdintRef(cat)
      val u = graft.core.DeterministicRng.uniform(11L, 0L, sim, draw)
      val uq = (u * 1073741824.0).floor.toLong + 1L
      ((l7(1073741824L) - l7(uq)) * 2).setScale(0, BigDecimal.RoundingMode.FLOOR).toLong
    }
    val trueCnt = 10L
    a.foreach { case (cat, noisy) =>
      assert(noisy == trueCnt + geo(cat, 0L) - geo(cat, 1L), cat)
    }
    // mechanism sanity across the 40 categories: mean |noise| in the
    // two-sided-geometric ballpark for eps=0.5 (std ~2.4), not degenerate
    val noises = a.values.map(_ - trueCnt)
    assert(noises.exists(_ != 0L), "noise must actually perturb")
    val meanAbs = noises.map(math.abs).sum.toDouble / noises.size
    assert(meanAbs > 0.3 && meanAbs < 8.0, s"meanAbs $meanAbs")
    intercept[IllegalArgumentException] {
      AuditOps.dpCounts(df, col("cat"), seed = 1L, invEps = 0)
    }
  }

  test("cusumReport: hand-folded level shift, group reset, quiet group") {
    // g: four 0s then four 10s (mu=5). Scaled residuals 8x-40 = -40/+40;
    // k=2 -> nk=16, h=8 -> nh=64. Hand fold: tp = 0,0,0,0,24,48,72,96
    // (up alarms at rows 7,8); tn = 24,48,72,96,40,0,0,0 (down alarms at
    // rows 3,4 -> first alarm id 3); max stats 96/8 = 12.0 both sides.
    val g = (1 to 8).map(i => ("g", i.toLong, i.toLong, if (i <= 4) 0.0 else 10.0))
    val q = (1 to 6).map(i => ("q", i.toLong, 100L + i, 7.0)) // constant: quiet
    val df = (g ++ q).toDF("grp", "ord", "id", "v")
    val r = AuditOps.cusumReport(df, "grp", "ord", "id", "v", k = 2L, h = 8L)
      .collect().map(x => x.getString(0) -> x).toMap
    val rg = r("g")
    assert(rg.getLong(1) == 8 && rg.getLong(2) == 2 && rg.getLong(3) == 2, rg.toString)
    assert(rg.getLong(4) == 3L, s"first alarm must be the down alarm at id 3: $rg")
    assert(rg.getDouble(5) == 12.0 && rg.getDouble(6) == 12.0, rg.toString)
    val rq = r("q")
    assert(rq.getLong(2) == 0 && rq.getLong(3) == 0 && rq.isNullAt(4), rq.toString)
    assert(rq.getDouble(5) == 0.0 && rq.getDouble(6) == 0.0, rq.toString)
    intercept[IllegalArgumentException] {
      AuditOps.cusumReport(df, "grp", "ord", "id", "v", k = -1L, h = 8L)
    }
  }

  test("abTestReport: hand-computed lift and pooled z²; control row NULLs") {
    // v0 (control): n=4, conv=1; v1: n=4, conv=3
    // num = 3·4 − 1·4 = 8 -> lift = 8/16 = 0.5
    // N=8, C=4 -> z² = (64/16)·(8/(4·4)) = 4·0.5 = 2.0
    val df = Seq(
      ("v0", true), ("v0", false), ("v0", false), ("v0", false),
      ("v1", true), ("v1", true), ("v1", true), ("v1", false))
      .toDF("variant", "ok")
    val r = AuditOps.abTestReport(df, col("variant"), col("ok"), "v0")
      .orderBy("variant").collect()
    assert(r(0).getString(0) == "v0" && r(0).getLong(1) == 4 &&
      r(0).getLong(2) == 1 && r(0).getDouble(3) == 0.25, r(0).toString)
    assert(r(0).isNullAt(4) && r(0).isNullAt(5) && r(0).isNullAt(6),
      s"control row must carry NULL lift/z2/z: ${r(0)}")
    assert(r(1).getDouble(3) == 0.75 && r(1).getDouble(4) == 0.5, r(1).toString)
    assert(r(1).getDouble(5) == 2.0 && r(1).getDouble(6) == math.sqrt(2.0),
      r(1).toString)
    // degenerate: all successes (N == C) -> z undefined, NULL
    val alls = Seq(("v0", true), ("v1", true)).toDF("variant", "ok")
    val r2 = AuditOps.abTestReport(alls, col("variant"), col("ok"), "v0")
      .orderBy("variant").collect()
    assert(r2(1).isNullAt(5), r2(1).toString)
    // a misspelled control label raises loudly instead of returning an
    // empty DataFrame (the empty-crossJoin silent-no-data trap)
    val ex = intercept[Exception] {
      AuditOps.abTestReport(df, col("variant"), col("ok"), "v_typo").collect()
    }
    assert(ex.getMessage.contains("v_typo") ||
      Option(ex.getCause).exists(_.getMessage.contains("v_typo")),
      s"expected a loud missing-control error, got: ${ex.getMessage}")
  }

  test("trendReport: hand-computed Mann-Kendall — monotone up, tied-flat, mild down") {
    import spark.implicits._
    // (grp, day) rows: daily count = number of rows that day
    // up:   counts 1,2,3,4,5  -> S = 10 pairs all +1, no ties,
    //       var18 = 5*4*15 = 300, z = 9/sqrt(300/18) ≈ 2.2045 -> increasing
    // flat: counts 2,2,2,2    -> S = 0, one tie group t=4 ->
    //       tsum = 4*3*13 = 156 = var18 base -> var18 = 0 -> z NULL, none
    // down: counts 4,3,2,1    -> S = -6, var18 = 4*3*13 = 156,
    //       z = -5/sqrt(156/18) ≈ -1.698 -> above -1.96 -> none
    val rows =
      (1 to 5).flatMap(d => Seq.fill(d)(("up", d.toLong))) ++
      (1 to 4).flatMap(d => Seq.fill(2)(("flat", d.toLong))) ++
      (1 to 4).flatMap(d => Seq.fill(5 - d)(("down", d.toLong)))
    val df = rows.toDF("event_type", "day")
    val out = AuditOps.trendReport(df, "event_type", col("day"))
      .collect().map(r => r.getString(0) -> r).toMap

    val up = out("up")
    assert(up.getLong(1) == 5L && up.getLong(2) == 10L && up.getLong(3) == 300L)
    assert(math.abs(up.getDouble(4) - 9.0 / math.sqrt(300.0 / 18.0)) < 1e-12)
    assert(up.getString(5) == "increasing")

    val flat = out("flat")
    assert(flat.getLong(2) == 0L && flat.getLong(3) == 0L)
    assert(flat.isNullAt(4) && flat.getString(5) == "none",
      "zero variance must yield NULL z, never a division")

    val down = out("down")
    assert(down.getLong(2) == -6L && down.getLong(3) == 156L)
    assert(math.abs(down.getDouble(4) - (-5.0 / math.sqrt(156.0 / 18.0))) < 1e-12)
    assert(down.getString(5) == "none", "mild slope stays below the 1.96 gate")
  }

  test("theilSenReport: hand-computed medians — constant slope, odd, even, singleton") {
    import spark.implicits._
    // up:    counts 1,2,3,4,5 on days 1..5 -> all 10 slopes are 1.0
    // odd:   days 1,2,3 counts 3,1,2 -> slopes {-2, -0.5, 1} -> median -0.5
    // even:  days 1..4 counts 2,2,4,1 -> slopes {0, 1, -1/3, 2, -0.5, -3}
    //        sorted [-3,-0.5,-1/3,0,1,2], ranks 3&4 -> (-1/3 + 0)/2 = -1/6
    // lone:  one day -> 0 pairs, NULL slope
    val rows =
      (1 to 5).flatMap(d => Seq.fill(d)(("up", d.toLong))) ++
      Seq.fill(3)(("odd", 1L)) ++ Seq.fill(1)(("odd", 2L)) ++
        Seq.fill(2)(("odd", 3L)) ++
      Seq.fill(2)(("even", 1L)) ++ Seq.fill(2)(("even", 2L)) ++
        Seq.fill(4)(("even", 3L)) ++ Seq.fill(1)(("even", 4L)) ++
      Seq.fill(7)(("lone", 1L))
    val out = AuditOps.theilSenReport(rows.toDF("event_type", "day"),
        "event_type", col("day"))
      .collect().map(r => r.getString(0) -> r).toMap

    assert(out("up").getLong(2) == 10L && out("up").getDouble(3) == 1.0)
    assert(out("odd").getLong(2) == 3L && out("odd").getDouble(3) == -0.5)
    assert(out("even").getLong(2) == 6L &&
      out("even").getDouble(3) == (-1.0 / 3.0 + 0.0) / 2.0,
      "even count must average exactly the two middle slopes")
    assert(out("lone").getLong(1) == 1L && out("lone").getLong(2) == 0L &&
      out("lone").isNullAt(3), "a single day has no pairs and NULL slope")
  }

  test("seasonalityReport: hand-computed chi-square — uniform, weekend-heavy, absent slots") {
    import spark.implicits._
    // uniform: one event on each of days 0..6 -> every slot O=1, n=7,
    //   chi2 = 0 -> not seasonal
    // heavy:   10 events on day 0, 10 on day 1, slots 2..6 absent ->
    //   n=20: (70-20)^2 + (70-20)^2 + 5*20^2 = 7000; /(7*20) = 50 ->
    //   seasonal (crit ~= 12.57)
    val rows =
      (0 to 6).map(d => ("uniform", d.toLong)) ++
      Seq.fill(10)(("heavy", 0L)) ++ Seq.fill(10)(("heavy", 1L))
    val out = AuditOps.seasonalityReport(rows.toDF("event_type", "day"),
        "event_type", col("day"))
      .collect().map(r => r.getString(0) -> r).toMap

    val u = out("uniform")
    assert(u.getLong(1) == 7L && u.getDouble(2) == 0.0 && !u.getBoolean(4))

    val h = out("heavy")
    assert(h.getLong(1) == 20L && h.getDouble(2) == 50.0,
      s"absent slots must contribute n^2 to the numerator: ${h.getDouble(2)}")
    assert(h.getBoolean(4), "chi2 50 must clear the ~12.57 critical value")

    val dof = 6.0
    val c = (1.0 - 2.0 / (9.0 * dof)) + 1.645 * math.sqrt(2.0 / (9.0 * dof))
    assert(u.getDouble(3) == dof * (c * c * c),
      "critical value must be the exact Wilson-Hilferty chain")
  }

  test("mannWhitneyReport: hand-computed no-tie/tied cases; empty arm NULL z") {
    import spark.implicits._
    // g: A={1,3}, B={2,4} -> ranks 1..4, R1=4, U1=1, num2=-2 (cont -1),
    // VN = 4·(5·4·3−0)=240, VD=144 -> z = -0.5/√(240/144)
    // t: A={5,5}, B={5,7} -> avg rank of 5s = 2 (2×=4), R1=4, U1=1,
    // T=3³−3=24, VN=4·(60−24)=144, VD=144 -> z = -0.5
    // e: only arm A -> n2=0 -> NULL z, false flag
    val df = Seq(
      ("g", 1L, 1.0), ("g", 3L, 3.0), ("g", 2L, 2.0), ("g", 4L, 4.0),
      ("t", 1L, 5.0), ("t", 3L, 5.0), ("t", 2L, 5.0), ("t", 4L, 7.0),
      ("e", 2L, 1.0), ("e", 4L, 9.0))
      .toDF("grp0", "uid", "v")
    val out = AuditOps.mannWhitneyReport(df, "grp0",
        pmod(col("uid"), lit(2)) === 1, "v")
      .collect().map(r => r.getString(0) -> r).toMap
    val g = out("g")
    assert(g.getLong(1) == 2 && g.getLong(2) == 2 && g.getDouble(3) == 1.0)
    assert(g.getDouble(4) == (-1.0 / 2.0) / math.sqrt(240.0 / 144.0) &&
      !g.getBoolean(5), g.toString)
    val t = out("t")
    assert(t.getDouble(3) == 1.0 && t.getDouble(4) == -0.5, t.toString)
    val e = out("e")
    assert(e.getLong(1) == 0 && e.isNullAt(4) && !e.getBoolean(5), e.toString)
  }

  test("autocorrReport: alternating series r1=-1/r2=+1; constant NULL; short series emits only defined lags") {
    import spark.implicits._
    // A = [0,1,0,1,0,1]: lag1 pairs m=5 -> num=5·0−2·3=−6, d1=5·2−4=6,
    // d2=5·3−9=6, r1=−1 (perfect anti-correlation, |r|>2/√5 significant);
    // lag2 m=4 -> r2=+1; lag3 m=3: x=[0,1,0],y=[1,0,1] -> num=3·0−2·1?
    // Σx=1,Σy=2,Σxy=0 -> num=−2, d1=3·1−1=2, d2=3·2−4=2 -> r3=−1.
    // B constant -> d1=d2=0 -> NULL r, significant=false.
    // C two rows -> lag1 m=1 d1=0 -> NULL; lags 2,3 absent.
    val df = (1 to 6).map(i => ("A", i.toLong, i.toLong, (i % 2).toDouble)) ++
      (1 to 4).map(i => ("B", i.toLong, (10 + i).toLong, 5.0)) ++
      Seq(("C", 1L, 20L, 1.0), ("C", 2L, 21L, 7.0))
    val out = AuditOps.autocorrReport(df.toDF("g", "ts0", "id0", "v"),
      "g", "ts0", "id0", "v").collect()
      .map(x => (x.getString(0), x.getLong(1)) -> x).toMap
    assert(out.size == 3 + 3 + 1, out.keys.toSeq.sorted.mkString(","))
    // expected values mirror the op chain exactly: √d·√d is the correctly
    // rounded square, not d (√6·√6 = 5.999…), so r1 ≈ −1 to 1 ulp
    assert(out(("A", 1L)).getLong(2) == 5 &&
      out(("A", 1L)).getDouble(3) == -6.0 / (math.sqrt(6.0) * math.sqrt(6.0))
      && out(("A", 1L)).getBoolean(4))
    // lag2: d1=d2=4 exact squares -> r2 = 4/(2·2) = 1.0; |r|=1 vs band
    // 2/√4=1 -> NOT significant (strict >)
    assert(out(("A", 2L)).getDouble(3) == 1.0 && !out(("A", 2L)).getBoolean(4))
    assert(out(("A", 3L)).getDouble(3) ==
      -2.0 / (math.sqrt(2.0) * math.sqrt(2.0)))
    (1L to 3L).foreach { k =>
      assert(out(("B", k)).isNullAt(3) && !out(("B", k)).getBoolean(4),
        s"constant series lag $k must emit NULL r, false flag")
    }
    assert(out(("C", 1L)).getLong(2) == 1 && out(("C", 1L)).isNullAt(3))
  }

  test("runsReport: hand-computed alternating/stuck/constant cases; NULL on one-sided groups") {
    import spark.implicits._
    // A alternates around its mean 5 -> 4 runs of length 1 (oscillation,
    // z > 0); B is the stuck shape -> 2 runs of length 2 (z < 0);
    // C is constant -> every side 0 (x·n > Σx false), test undefined.
    val df = Seq(
      ("A", 1L, 10L, 1.0), ("A", 2L, 11L, 9.0), ("A", 3L, 12L, 1.0),
      ("A", 4L, 13L, 9.0),
      ("B", 1L, 20L, 1.0), ("B", 2L, 21L, 1.0), ("B", 3L, 22L, 9.0),
      ("B", 4L, 23L, 9.0),
      ("C", 1L, 30L, 5.0), ("C", 2L, 31L, 5.0), ("C", 3L, 32L, 5.0))
      .toDF("g", "ts0", "id0", "v")
    val r = AuditOps.runsReport(df, "g", "ts0", "id0", "v")
      .collect().map(x => x.getString(0) -> x).toMap
    val a = r("A")
    assert(a.getLong(1) == 4 && a.getLong(2) == 2 && a.getLong(3) == 2)
    assert(a.getLong(4) == 4 && a.getLong(5) == 1, a.toString)
    // mu = (4 + 2·2·2)/4 = 3; var = (8/16)·((8−4)/3) = 2/3;
    // z = ((4·4 − 4 − 8)/4) / sqrt(2/3) = 1/sqrt(2/3)
    assert(a.getDouble(6) == 3.0)
    assert(a.getDouble(7) == (8.0 / 16.0) * (4.0 / 3.0))
    assert(a.getDouble(8) == 1.0 / math.sqrt((8.0 / 16.0) * (4.0 / 3.0)))
    assert(a.getDouble(8) > 0, "alternating sequence must z-score positive")
    val b = r("B")
    assert(b.getLong(4) == 2 && b.getLong(5) == 2)
    assert(b.getDouble(8) < 0, "stuck sequence must z-score negative")
    val c = r("C")
    // constant group: all sides 0 (strict >), one long run, undefined test
    assert(c.getLong(2) == 0 && c.getLong(4) == 1 && c.getLong(5) == 3)
    assert(c.getDouble(6) == 1.0, "mu = (n+0)/n")
    assert(c.isNullAt(7) && c.isNullAt(8),
      s"one-sided group must emit NULL var/z, not 0/−0: $c")
  }

  test("psiReport: hand-computed terms; one-sided category excluded from the total") {
    // old = [a,a,a,b], new = [a,b] (the categoricalDrift spec corpus):
    //  a: num = 3·2−1·4 = 2, dl = round(ln 6,7)−round(ln 4,7) = 0.4054651
    //  b: num = 1·2−1·4 = −2, dl = round(ln 2,7)−round(ln 4,7) = −0.6931472
    //  psi = (2·0.4054651 + 2·0.6931472)/8
    val o = Seq("a", "a", "a", "b").toDF("cat0")
    val n = Seq("a", "b").toDF("cat0")
    val r = AuditOps.psiReport(o, n, "cat0").orderBy("cat").collect()
    assert(r.length == 2)
    val termA = BigDecimal("0.8109302").toDouble / 8.0
    val termB = BigDecimal("1.3862944").toDouble / 8.0
    val psi = BigDecimal("2.1972246").toDouble / 8.0
    assert(r(0).getLong(1) == 3 && r(0).getLong(2) == 1)
    assert(r(0).getDouble(3) == 0.75 && r(0).getDouble(4) == 0.5)
    assert(r(0).getDouble(5) == termA && r(1).getDouble(5) == termB,
      s"${r(0)} ${r(1)}")
    assert(r(0).getDouble(6) == psi && r(1).getDouble(6) == psi)
    // a category present only in one snapshot: NULL term, excluded total
    val o2 = Seq("a", "a", "z").toDF("cat0")
    val r2 = AuditOps.psiReport(o2, Seq("a").toDF("cat0"), "cat0")
      .orderBy("cat").collect()
    assert(r2(1).isNullAt(5), r2(1).toString)
    // only a's term remains: num = 2·1−1·3 = −1, dl = round(ln 2,7)−round(ln 3,7)
    val dlA = BigDecimal("0.6931472") - BigDecimal("1.0986123")
    assert(r2(0).getDouble(6) == (-dlA).toDouble / 3.0, r2(0).toString)
  }

  test("giniReport: uniform counts give 0; hand-computed concentration") {
    // counts a:3, b:1 -> num = 0+2+2+0 = 4, gini = 4/(2·2·4) = 0.25
    val df = Seq("a", "a", "a", "b").toDF("cat0")
    val r = AuditOps.giniReport(df, "cat0").collect()(0)
    assert(r.getLong(0) == 2 && r.getLong(1) == 4 && r.getDouble(2) == 0.25,
      r.toString)
    val u = Seq("a", "a", "b", "b").toDF("cat0")
    assert(AuditOps.giniReport(u, "cat0").collect()(0).getDouble(2) == 0.0)
  }

  test("calibrationReportBy: per-group bins and ECE; NULL group dropped") {
    // group A = the global test's data -> ece 0.21 on both its rows
    // group B: (0.45,F)×2 -> bin4, n=2, pos=0, acc=0,
    //   ece_num = |20·0 − 2·9| = 18, ece = 18/(20·2) = 0.45
    val df = Seq(
      (Option("A"), 0.05, true), (Option("A"), 0.05, false),
      (Option("A"), 0.95, true), (Option("A"), 0.95, true),
      (Option("A"), 0.95, true),
      (Option("B"), 0.45, false), (Option("B"), 0.45, false),
      (Option.empty[String], 0.5, true))
      .toDF("src", "s", "y")
    val r = AuditOps.calibrationReportBy(df, col("s"), col("y"), "src")
      .orderBy("grp", "bin").collect()
    assert(r.length == 3, r.mkString(";"))
    assert(r(0).getString(0) == "A" && r(0).getLong(1) == 0 &&
      r(0).getLong(3) == 2 && r(0).getLong(4) == 1 &&
      r(0).getDouble(5) == 0.5 && r(0).getDouble(6) == 0.21, r(0).toString)
    assert(r(1).getString(0) == "A" && r(1).getLong(1) == 9 &&
      r(1).getDouble(5) == 1.0 && r(1).getDouble(6) == 0.21, r(1).toString)
    assert(r(2).getString(0) == "B" && r(2).getLong(1) == 4 &&
      r(2).getDouble(5) == 0.0 && r(2).getDouble(6) == 0.45, r(2).toString)
  }

  test("thresholdReportBy: independent per-group argmax-F1 operating points") {
    // group A = the global thresholdReport example -> t=1, f1=0.75
    // group B: (1,-),(2,+) -> t=2 is a perfect classifier, f1=1
    val df = Seq(
      ("A", 1.0, Option(true)), ("A", 1.0, Option(false)),
      ("A", 2.0, Option(true)), ("A", 3.0, Option(true)),
      ("A", 3.0, Option.empty[Boolean]),
      ("B", 1.0, Option(false)), ("B", 2.0, Option(true)))
      .toDF("src", "v", "y")
    val r = AuditOps.thresholdReportBy(df, col("v"), col("y"), "src")
      .orderBy("grp").collect()
    assert(r.length == 2, r.mkString(";"))
    assert(r(0).getString(0) == "A" && r(0).getDouble(1) == 1.0 &&
      r(0).getLong(2) == 3 && r(0).getLong(3) == 2 && r(0).getLong(4) == 0 &&
      r(0).getDouble(5) == 0.6 && r(0).getDouble(6) == 1.0 &&
      r(0).getDouble(7) == 0.75, r(0).toString)
    assert(r(1).getString(0) == "B" && r(1).getDouble(1) == 2.0 &&
      r(1).getLong(2) == 1 && r(1).getLong(3) == 0 && r(1).getLong(4) == 0 &&
      r(1).getDouble(7) == 1.0, r(1).toString)
  }

  test("ksReportBy: independent per-group KS; a one-sided group reports NULL ks") {
    val rows = Seq(
      // group X = the hand-computed ksReport example -> D = 3/9 at value 1
      ("X", 1.0, true), ("X", 2.0, true), ("X", 3.0, true),
      ("X", 2.0, false), ("X", 3.0, false), ("X", 4.0, false),
      // group Y: identical samples -> D = 0
      ("Y", 5.0, true), ("Y", 5.0, false),
      // group Z: only side A present -> NULL ks
      ("Z", 7.0, true))
      .toDF("src", "v", "side")
    val r = AuditOps.ksReportBy(rows, col("v"), col("side"), "src")
      .orderBy("grp").collect()
    assert(r(0).getLong(3) == 3 && r(0).getDouble(4) == 3.0 / 9.0 &&
      r(0).getDouble(5) == 1.0, r(0).toString)
    assert(r(1).getLong(3) == 0 && r(1).getDouble(4) == 0.0, r(1).toString)
    assert(r(2).isNullAt(4), s"one-sided group must report NULL ks: ${r(2)}")
  }

  test("benfordReport: digits from the decimal string, zero-magnitude rows excluded") {
    // digits: 1.5->1, 19->1, 25->2, -33.7->3 (floor of |x|, NOT |floor x|
    // which would give 34), 9->9; 0.4 and -0.9 have magnitude < 1 -> no
    // leading digit, excluded
    val rows = Seq(1.5, 19.0, 25.0, 0.4, -33.7, 9.0, -0.9).toDF("v")
    val r = AuditOps.benfordReport(rows, col("v")).orderBy("digit").collect()
    assert(r.length == 9)
    val cnt = r.map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(cnt == Map(1L -> 2L, 2L -> 1L, 3L -> 1L, 4L -> 0L, 5L -> 0L,
      6L -> 0L, 7L -> 0L, 8L -> 0L, 9L -> 1L))
    assert(r.forall(_.getLong(2) == 5L), "n = 5 scored rows")
    // digit 1: dev_num = |2e9 - 5*301029996| exactly
    val d1 = r(0)
    assert(d1.getLong(5) == math.abs(2000000000L - 5L * 301029996L), d1.toString)
    assert(d1.getDouble(3) == 0.4)
  }

  /** Independent md5→Poisson-weight oracle: first 15 hex chars of md5 as a
    * long, then the [[AuditOps.PoissonT60]] threshold walk — a from-scratch
    * reimplementation (MessageDigest, not the Md5Int60 expression) so the
    * spec pins the whole hash→weight→mean chain, not just its determinism.
    */
  private def poissonWeight(s: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString.take(15)
    val h = java.lang.Long.parseLong(hex, 16)
    val k = AuditOps.PoissonT60.indexWhere(h < _)
    if (k < 0) AuditOps.PoissonT60.length.toLong else k.toLong
  }

  test("bootstrapCiReport: envelope matches an independent md5 oracle; constant group collapses; nulls excluded") {
    import spark.implicits._
    val xs = Map(10L -> 4L, 11L -> 7L, 12L -> 1L, 13L -> 9L, 14L -> 2L)
    val reps = 6
    // independent expectation: per replicate b, mean = Σw·x/Σw over the
    // hand md5 weights; envelope = min/max over replicates with Σw>0
    val means = (0 until reps).flatMap { b =>
      val ws = xs.toSeq.map { case (id, x) => (poissonWeight(s"boot:$b:$id"), x) }
      val ne = ws.map(_._1).sum
      if (ne == 0) None
      else Some(ws.map { case (w, x) => w * x }.sum.toDouble / ne.toDouble)
    }
    def jd(x: Double): java.lang.Double = x
    val df = (xs.toSeq.map { case (id, x) => ("a", id, jd(x.toDouble + 0.5)) } ++
      Seq(("c", 20L, jd(3.0)), ("c", 21L, jd(3.9)), ("c", 22L, jd(3.2)),
        ("a", 30L, null.asInstanceOf[java.lang.Double])))
      .toDF("grp0", "id0", "v")
    val out = AuditOps.bootstrapCiReport(df, "grp0", "id0", "v", reps)
      .collect().map(r => r.getString(0) -> r).toMap
    val a = out("a")
    assert(a.getLong(1) == 5L, "null value row must be excluded from n")
    assert(a.getDouble(2) == 23.0 / 5.0)
    assert(a.getLong(3) == means.size.toLong, a.toString)
    assert(a.getDouble(4) == means.min && a.getDouble(5) == means.max,
      s"envelope must equal the independent md5 oracle: $a vs " +
        s"[${means.min}, ${means.max}]")
    // constant group: every replicate mean is exactly the constant
    val c = out("c")
    assert(c.getDouble(4) == 3.0 && c.getDouble(5) == 3.0 &&
      c.getDouble(2) == 3.0, c.toString)
    // determinism across partitionings (the FP-discipline promise)
    val again = AuditOps.bootstrapCiReport(df.repartition(7), "grp0", "id0",
      "v", reps).collect().map(r => r.getString(0) -> r.toString).toMap
    assert(again == out.map { case (k, r) => k -> r.toString })
    intercept[IllegalArgumentException] {
      AuditOps.bootstrapCiReport(df, "grp0", "id0", "v", reps = 1)
    }
  }

  test("tostReport: hand-computed Schuirmann z pair; equivalent and non-equivalent variants; control row nulls") {
    import spark.implicits._
    // c: 500/1000, t: 510/1000 (within ±10pp), w: 700/1000 (outside)
    def arm(v: String, n: Int, conv: Int) =
      (0 until n).map(i => (v, i < conv))
    val df = (arm("c", 1000, 500) ++ arm("t", 1000, 510) ++
      arm("w", 1000, 700)).toDF("variant", "ok")
    val out = AuditOps.tostReport(df, col("variant"), col("ok"), "c", 0.10)
      .collect().map(r => r.getString(0) -> r).toMap
    val t = out("t")
    val diff = (510L * 1000 - 500L * 1000).toDouble / (1000L * 1000).toDouble
    val se2 = (510.0 * 490.0) / 1.0e9 + (500.0 * 500.0) / 1.0e9
    assert(t.getDouble(4) == diff && t.getDouble(5) == math.sqrt(se2))
    assert(t.getDouble(6) == (diff + 0.10) / math.sqrt(se2))
    assert(t.getDouble(7) == (0.10 - diff) / math.sqrt(se2))
    assert(t.getBoolean(8), "t is within +-10pp with tight CI")
    assert(!out("w").getBoolean(8), "w is 20pp off, not equivalent")
    val c = out("c")
    assert(c.isNullAt(4) && c.isNullAt(5) && c.isNullAt(6) && !c.getBoolean(8))
    intercept[IllegalArgumentException] {
      AuditOps.tostReport(df, col("variant"), col("ok"), "c", margin = 0.0)
    }
    // loud failure on a misspelled control label
    val err = intercept[Exception] {
      AuditOps.tostReport(df, col("variant"), col("ok"), "nope", 0.1).collect()
    }
    assert(err.getMessage != null)
  }

  test("spearmanReport: perfect monotone +-1; hand tie-averaged case; constant-column guard") {
    import spark.implicits._
    def df(rows: Seq[(Long, Double)]) =
      rows.map { case (x, y) => ("g", x, y) }.toDF("grp0", "x0", "v")
    def run(rows: Seq[(Long, Double)]) =
      AuditOps.spearmanReport(df(rows), "grp0", col("x0"), col("v"))
        .collect().head
    // the mirrored sqrt*sqrt chain: 24/(sqrt24*sqrt24), NOT exactly 1.0 —
    // both engines produce the identical 1+2ulp value
    val one = 24.0 / (math.sqrt(24.0) * math.sqrt(24.0))
    assert(run(Seq((1L, 10.0), (2L, 20.0), (3L, 30.0))).getDouble(2) == one)
    assert(run(Seq((1L, 30.0), (2L, 20.0), (3L, 10.0))).getDouble(2) == -one)
    // tie case: doubled ranks x=(2,4,6), y=(3,3,6) -> rho = 18/(sqrt24*sqrt18)
    val t = run(Seq((1L, 10.0), (2L, 10.0), (3L, 30.0)))
    assert(t.getDouble(2) == 18.0 / (math.sqrt(24.0) * math.sqrt(18.0)),
      t.toString)
    assert(!t.getBoolean(3), "n=3: |rho|*sqrt(2) < 1.96")
    // constant y: zero variance -> rho null, not significant
    val c = run(Seq((1L, 5.0), (2L, 5.0), (3L, 5.0)))
    assert(c.isNullAt(2) && !c.getBoolean(3), c.toString)
  }

  test("kruskalReport: textbook no-tie H; tie-corrected separated samples significant; all-equal guard") {
    import spark.implicits._
    // a=[1,2], b=[3,4]: no ties, H = 2.4 exactly through the integer chain
    val df = Seq(("a", 1.0), ("a", 2.0), ("b", 3.0), ("b", 4.0))
      .toDF("s0", "v")
    val r = AuditOps.kruskalReport(df, "s0", "v").collect().head
    assert(r.getLong(0) == 2 && r.getLong(1) == 4)
    assert(r.getDouble(2) == 2.4, r.toString)
    assert(!r.getBoolean(4), "H 2.4 < crit ~3.75")
    // fully separated tied samples: hand integer chain -> H = 19, significant
    val sep = (Seq.fill(10)(("a", 1.0)) ++ Seq.fill(10)(("b", 2.0)))
      .toDF("s0", "v")
    val r2 = AuditOps.kruskalReport(sep, "s0", "v").collect().head
    val hq = BigInt(32460) * 1000000 / 420 - BigInt(63) * 1000000
    val expected = (hq * 7980).toDouble / (BigInt(6000) * 1000000).toDouble
    assert(r2.getDouble(2) == expected && r2.getBoolean(4), r2.toString)
    // all values identical: tie correction degenerate -> H null, false
    val flat = Seq(("a", 5.0), ("b", 5.0), ("b", 5.0)).toDF("s0", "v")
    val r3 = AuditOps.kruskalReport(flat, "s0", "v").collect().head
    assert(r3.isNullAt(2) && !r3.getBoolean(4), r3.toString)
  }

  test("anovaReport: textbook two-group F and eta2; zero-within-variance and single-group guards") {
    import spark.implicits._
    // a=[1,1], b=[3,5]: SSB=9, SSW=2, F=(9*2)/(2*1)=9, eta2=9/11
    val df = Seq(("a", 1.0), ("a", 1.0), ("b", 3.0), ("b", 5.0))
      .toDF("grp0", "v")
    val r = AuditOps.anovaReport(df, "grp0", "v").collect().head
    assert(r.getLong(0) == 2 && r.getLong(1) == 4)
    assert(r.getDouble(2) == 9.0 && r.getDouble(3) == 2.0, r.toString)
    assert(r.getDouble(4) == 9.0 && r.getDouble(5) == 9.0 / 11.0, r.toString)
    // all groups constant: SSW 0 -> F null, eta2 1
    val c = AuditOps.anovaReport(
      Seq(("a", 1.0), ("a", 1.0), ("b", 5.0), ("b", 5.0)).toDF("grp0", "v"),
      "grp0", "v").collect().head
    assert(c.isNullAt(4) && c.getDouble(5) == 1.0, c.toString)
    // single group: F null
    val one = AuditOps.anovaReport(
      Seq(("a", 1.0), ("a", 2.0)).toDF("grp0", "v"), "grp0", "v")
      .collect().head
    assert(one.getLong(0) == 1 && one.isNullAt(4))
    // determinism across partitionings
    val again = AuditOps.anovaReport(df.repartition(5), "grp0", "v")
      .collect().head
    assert(again.toString == r.toString)
  }

  test("ewmaReport: hand-folded integer-floor recursion, alarm band, determinism") {
    import spark.implicits._
    // x = [10,10,10,50,50]: seed 26, z = 22,19,16,24,30;
    // dev = 20,35,50,10,20; h=6 -> n*h=30 -> alarms at rows 2,3
    val df = Seq((1L, 10.0), (2L, 10.0), (3L, 10.0), (4L, 50.0), (5L, 50.0))
      .map { case (i, v) => ("g", i, i, v) }
      .toDF("grp0", "ord0", "id0", "v")
    val r = AuditOps.ewmaReport(df, "grp0", "ord0", "id0", "v",
      el = 4L, h = 6L).collect().head
    assert(r.getLong(1) == 5 && r.getLong(2) == 2, r.toString)
    assert(r.getLong(3) == 2L, "first alarm at the second row")
    assert(r.getDouble(4) == 30.0 && r.getDouble(5) == 10.0, r.toString)
    // determinism across partitionings (the fold re-sorts per group)
    val again = AuditOps.ewmaReport(df.repartition(5), "grp0", "ord0",
      "id0", "v", el = 4L, h = 6L).collect().head
    assert(again.toString == r.toString)
    intercept[IllegalArgumentException] {
      AuditOps.ewmaReport(df, "grp0", "ord0", "id0", "v", el = 1L, h = 6L)
    }
  }

  test("kappaReport: textbook 2x2 kappa; perfect agreement; constant-labeler NULL") {
    import spark.implicits._
    // classic example: a/a 20, a/b 5, b/a 10, b/b 15 -> po=0.7,
    // pe = (25*30 + 25*20)/50^2 = 0.5, kappa = 0.4
    val rows = Seq.fill(20)(("a", "a")) ++ Seq.fill(5)(("a", "b")) ++
      Seq.fill(10)(("b", "a")) ++ Seq.fill(15)(("b", "b"))
    val r = AuditOps.kappaReport(rows.toDF("x", "y"), "x", "y").collect().head
    assert(r.getLong(0) == 50 && r.getLong(1) == 35)
    assert(r.getDouble(2) == 0.7 && r.getDouble(3) == 0.5)
    assert(r.getDouble(4) == (0.7 - 0.5) / 0.5, r.toString)
    // perfect agreement on a varied mix -> kappa 1.0
    val p = AuditOps.kappaReport(
      Seq(("a", "a"), ("b", "b"), ("b", "b")).toDF("x", "y"), "x", "y")
      .collect().head
    assert(p.getDouble(4) == 1.0)
    // both sides constant -> pe = 1 -> kappa NULL (vacuous, not perfect)
    val c = AuditOps.kappaReport(
      Seq(("a", "a"), ("a", "a")).toDF("x", "y"), "x", "y").collect().head
    assert(c.getDouble(3) == 1.0 && c.isNullAt(4), c.toString)
  }

  test("srmReport: hand chi-square at 1:1; balanced vs broken splits; off-design variant fails loudly") {
    import spark.implicits._
    def mk(a: Int, b: Int) =
      (Seq.fill(a)("v0") ++ Seq.fill(b)("v1")).toDF("v")
    val exp = Seq("v0" -> 1L, "v1" -> 1L)
    // 40/60 at 1:1 -> chi2 = (20^2/50 + 20^2/50) = 4*... exact: 4.0
    val ok = AuditOps.srmReport(mk(40, 60), col("v"), exp).collect().head
    assert(ok.getLong(0) == 100 && ok.getLong(2) == 1L)
    assert(ok.getDouble(3) == 4.0, ok.toString)
    assert(!ok.getBoolean(5), "chi2 4 < strict crit ~11")
    // 10/90 -> chi2 = 64 -> mismatch
    val bad = AuditOps.srmReport(mk(10, 90), col("v"), exp).collect().head
    assert(bad.getDouble(3) == 64.0 && bad.getBoolean(5), bad.toString)
    // observed variant outside the design raises loudly
    val err = intercept[Exception] {
      AuditOps.srmReport(Seq("v0", "vX").toDF("v"), col("v"), exp).collect()
    }
    assert(err.getMessage != null)
    intercept[IllegalArgumentException] {
      AuditOps.srmReport(mk(1, 1), col("v"), Seq("v0" -> 0L, "v1" -> 1L))
    }
  }

  test("classificationReport: hand confusion counts; never-predicted and never-actual classes; F1 single-division form") {
    import spark.implicits._
    // actual->predicted: a->a x3, a->b x1, b->b x2, b->c x1, c never
    // actual but predicted once (from b), d actual never predicted
    val df = Seq(("a", "a"), ("a", "a"), ("a", "a"), ("a", "b"),
      ("b", "b"), ("b", "b"), ("b", "c"), ("d", "a"))
      .toDF("actual", "pred")
    val out = AuditOps.classificationReport(df, "actual", "pred").collect()
      .map(r => r.getString(0) -> r).toMap
    val a = out("a")
    assert(a.getLong(1) == 4 && a.getLong(2) == 3 && a.getLong(3) == 1 &&
      a.getLong(4) == 1, a.toString)
    assert(a.getDouble(5) == 3.0 / 4.0 && a.getDouble(6) == 3.0 / 4.0 &&
      a.getDouble(7) == 6.0 / 8.0)
    val c = out("c")
    assert(c.getLong(1) == 0 && c.getLong(3) == 1 && c.isNullAt(6),
      "never-actual class: recall undefined, " + c)
    val d = out("d")
    assert(d.getLong(1) == 1 && d.getLong(2) == 0 && d.getLong(3) == 0 &&
      d.isNullAt(5) && d.getDouble(6) == 0.0,
      "never-predicted class: precision undefined, recall 0: " + d)
  }

  test("mdeReport: hand-computed MDE at 80% power; control row nulls; zero-rate control guard") {
    import spark.implicits._
    def arm(v: String, n: Int, conv: Int) =
      (0 until n).map(i => (v, i < conv))
    val df = (arm("c", 1000, 500) ++ arm("t", 1000, 510)).toDF("variant", "ok")
    val out = AuditOps.mdeReport(df, col("variant"), col("ok"), "c")
      .collect().map(r => r.getString(0) -> r).toMap
    val se2 = (510.0 * 490.0) / 1.0e9 + (500.0 * 500.0) / 1.0e9
    val t = out("t")
    assert(t.getDouble(4) == math.sqrt(se2))
    assert(t.getDouble(5) == 2.8016 * math.sqrt(se2))
    assert(t.getDouble(6) == (2.8016 * math.sqrt(se2)) / 0.5)
    val c = out("c")
    assert(c.isNullAt(4) && c.isNullAt(5) && c.isNullAt(6))
    // all-zero control rate: mde_rel undefined, mde_abs still live
    val z = (arm("c", 100, 0) ++ arm("t", 100, 10)).toDF("variant", "ok")
    val zt = AuditOps.mdeReport(z, col("variant"), col("ok"), "c")
      .collect().map(r => r.getString(0) -> r).toMap.apply("t")
    assert(!zt.isNullAt(5) && zt.isNullAt(6), zt.toString)
  }

  test("independenceReport: hand-computed 2x2 chi2/V; dof=0 guard; nulls excluded; determinism") {
    import spark.implicits._
    // contingency x/u=4, x/v=1, y/u=2, y/v=3: chi2 = 5/3, dof = 1
    val rows = Seq.fill(4)(("x", "u")) ++ Seq(("x", "v")) ++
      Seq.fill(2)(("y", "u")) ++ Seq.fill(3)(("y", "v")) ++
      Seq((null, "u"), ("x", null))
    val df = rows.toDF("lang0", "src0")
    val r = AuditOps.independenceReport(df, "lang0", "src0").collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getLong(0) == 10L, "null cells excluded from n")
    assert(row.getLong(1) == 2L && row.getLong(2) == 2L && row.getLong(3) == 1L)
    // quantized-exact chi2: hand floor divisions at Q=1e9
    val tq = 160000000000L / 30 + 10000000000L / 20 +
      40000000000L / 30 + 90000000000L / 20
    val chi2 = (10L * tq - 100L * 1000000000L).toDouble / (1.0e9 * 10.0)
    assert(row.getDouble(4) == chi2, s"chi2 ${row.getDouble(4)} != $chi2")
    val cc = BigDecimal((1.0 - 2.0 / 9.0) + 1.645 * math.sqrt(2.0 / 9.0))
      .setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(row.getDouble(5) == 1L * (cc * cc * cc))
    assert(row.getDouble(6) == math.sqrt(chi2 / 10.0))
    assert(!row.getBoolean(7), "chi2 ~1.67 < crit ~3.74")
    // determinism across partitionings
    val again = AuditOps.independenceReport(df.repartition(7), "lang0", "src0")
      .collect().head
    assert(again.toString == row.toString)
    // dof = 0 (single category on one side): null crit/V, dependent false
    val one = AuditOps.independenceReport(
      Seq(("x", "u"), ("x", "v")).toDF("lang0", "src0"), "lang0", "src0")
      .collect().head
    assert(one.getLong(3) == 0L && one.isNullAt(5) && one.isNullAt(6) &&
      !one.getBoolean(7), one.toString)
  }
}
