package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Round-15 op specs: the refineFromCounts restructure (one window pass
  * computes cum_prev AND n; rank targets derived per row from the
  * permille literals instead of a targets-table join) must keep the
  * locate-and-refine result bit-identical — these pin the edge cases the
  * restructure could plausibly break: exact-rank hits (fr == 0),
  * interpolated ranks straddling a BIN boundary, single-row groups, and
  * ties inside the target bin.
  */
class R15OpsSpec extends SparkTestBase {
  import spark.implicits._

  private def refine(vals: Seq[(String, Double)], permille: Seq[Int],
      binWidth: Long = 4L, bins: Int = 8) =
    SketchOps.exactQuantileRefine(vals.toDF("g", "x"), col("x"), "g",
        binWidth, bins, permille)
      .collect()
      .map(r => ((r.getString(0), r.getDouble(1)), (r.getDouble(2), r.getLong(3))))
      .toMap

  test("refineFromCounts: exact-rank hit (fr == 0) returns the order" +
      " statistic itself, including when it sits last in its bin") {
    // g=a: n=5, p50 -> idxnum=2000, fr=0, rank 3 of (1,2,3,9,30) = 3.0;
    // value 3 is the LAST row of bin 0 (binWidth 4) — the (cum_prev,
    // cum_prev+cnt] boundary case.
    val got = refine(Seq("a" -> 1.0, "a" -> 2.0, "a" -> 3.0, "a" -> 9.0,
      "a" -> 30.0), Seq(500))
    assert(got == Map(("a", 0.5) -> ((3.0, 5L))), got.toString)
  }

  test("refineFromCounts: interpolated rank pair straddling a bin boundary") {
    // n=4, p500: idxnum=1500, fr=500, rank_lo=2 (value 3, bin 0),
    // rank_hi=3 (value 4, bin 1) — lo and hi land in DIFFERENT bins, so
    // both bins must be located and the interpolation crosses them.
    val got = refine(Seq("b" -> 1.0, "b" -> 3.0, "b" -> 4.0, "b" -> 9.0),
      Seq(500))
    assert(got == Map(("b", 0.5) -> ((3.5, 4L))), got.toString)
  }

  test("refineFromCounts: single-row group, multi-permille, and ties" +
      " inside the target bin") {
    val vals = Seq("s" -> 7.0) ++ Seq.fill(6)("t" -> 2.0) ++ Seq("t" -> 10.0)
    val got = refine(vals, Seq(250, 500, 900))
    // single-row group: every percentile is the row itself
    assert(got(("s", 0.25)) == ((7.0, 1L)), got.toString)
    assert(got(("s", 0.5)) == ((7.0, 1L)), got.toString)
    assert(got(("s", 0.9)) == ((7.0, 1L)), got.toString)
    // t: n=7 of (2,2,2,2,2,2,10); p250 idx=1500 -> 2.0 (tie run);
    // p500 idx=3000 fr=0 -> rank 4 = 2.0; p900 idx=5400 -> between rank 6
    // (2.0) and rank 7 (10.0): 2 + 0.4*8 = 5.2
    assert(got(("t", 0.25)) == ((2.0, 7L)), got.toString)
    assert(got(("t", 0.5)) == ((2.0, 7L)), got.toString)
    assert(got(("t", 0.9)) == ((5.2, 7L)), got.toString)
  }

  test("nearPairsLsh saturation guard: loud refusal before the pair join" +
      " when estimated candidates exceed maxCandidates; pass-through and" +
      " identical pairs at sane occupancy") {
    val e = (1 to 12).map(i => (i.toLong,
      Array.tabulate(graft.operators.SimilarityOps.DIM)(d =>
        (((i * 31 + d * 17) % 7) - 3).toFloat))).toDF("vec_id", "embedding")
    val ok = SimilarityOps.nearPairsLsh(e, 0.4, 4, 8, 4241L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // tiny cap -> the guard must throw BEFORE any pair is produced, with
    // the actionable message naming the scaled-bits twin
    val ex = intercept[Exception] {
      SimilarityOps.nearPairsLsh(e, 0.4, 4, 8, 4241L, maxCandidates = 1L)
        .collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(m => m.contains("saturated") &&
      m.contains("maxCandidates=1")), msgs(ex).mkString(" | "))
    // default cap: guard is a constant-true filter — pairs unchanged
    val dflt = SimilarityOps.nearPairsLsh(e, 0.4, 4, 8, 4241L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(dflt == ok)
  }

  test("refineFromCounts: agrees with built-in percentile on a 2-group" +
      " random-ish integer load (the q22/q34 tie, small form)") {
    val vals = (1 to 97).map(i => (if (i % 3 == 0) "u" else "v",
      ((i * 37) % 23).toDouble))
    val df = vals.toDF("g", "x")
    val got = refine(vals, Seq(250, 500, 750), binWidth = 4L, bins = 8)
    val want = df.groupBy("g")
      .agg(expr("percentile(x, 0.25)").as("a"),
        expr("percentile(x, 0.5)").as("b"),
        expr("percentile(x, 0.75)").as("c"))
      .collect().flatMap(r => Seq(
        ((r.getString(0), 0.25), r.getDouble(1)),
        ((r.getString(0), 0.5), r.getDouble(2)),
        ((r.getString(0), 0.75), r.getDouble(3)))).toMap
    assert(got.keySet == want.keySet)
    want.foreach { case (k, w) =>
      assert(math.abs(got(k)._1 - w) < 1e-9, s"$k: got=${got(k)._1} want=$w")
    }
  }
}
