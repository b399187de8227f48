package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Hand-computed pins for the round-12 additions: the Welch /
  * Wasserstein / Brown–Forsythe statistics cells, the k-step funnel /
  * top-paths / Pareto product panel, PCM zero-crossing rate, and the
  * cross-source vocabulary overlap matrix.
  */
class R12OpsSpec extends SparkTestBase {
  import spark.implicits._

  test("welchReport: exact-moment unequal-variance t, hand-computed") {
    // arm A: x = 0,2,4 (mean 2, var 4); arm B: x = 1,1 (mean 1, var 0)
    val df = Seq((1L, "g", 0.0), (1L, "g", 2.0), (1L, "g", 4.0),
      (2L, "g", 1.0), (2L, "g", 1.0))
      .toDF("user_id", "grp", "value")
    val r = AuditOps.welchReport(df, "grp", col("user_id") === 1L, "value")
      .collect()(0)
    assert(r.getLong(1) == 3 && r.getLong(2) == 2)
    assert(r.getDouble(3) == 2.0 && r.getDouble(4) == 1.0)
    val se2 = (3.0 * 20 - 36) / (9.0 * 2) + 0.0
    assert(r.getDouble(7) == 1.0 / math.sqrt(se2), r.toString)
    assert(!r.getBoolean(8))
    // an arm with < 2 rows: t NULL, verdict a real false
    val one = Seq((1L, "g", 5.0), (2L, "g", 1.0), (2L, "g", 3.0))
      .toDF("user_id", "grp", "value")
    val r1 = AuditOps.welchReport(one, "grp", col("user_id") === 1L, "value")
      .collect()(0)
    assert(r1.isNullAt(7) && !r1.getBoolean(8), r1.toString)
  }

  test("wassersteinReport: exact W1 between {0,2} and {1} is 1.0") {
    val df = Seq((1L, "g", 0.0), (1L, "g", 2.0), (2L, "g", 1.0))
      .toDF("user_id", "grp", "value")
    val r = AuditOps.wassersteinReport(df, "grp", col("user_id") === 1L, "value")
      .collect()(0)
    assert(r.getLong(1) == 2 && r.getLong(2) == 1)
    assert(r.getDouble(3) == 1.0, r.toString)
    // shifting one side by a constant c shifts W1 by exactly c
    val sh = Seq((1L, "g", 0.0), (1L, "g", 2.0), (2L, "g", 4.0))
      .toDF("user_id", "grp", "value")
    val r2 = AuditOps.wassersteinReport(sh, "grp", col("user_id") === 1L, "value")
      .collect()(0)
    assert(r2.getDouble(3) == 3.0, r2.toString)
  }

  test("leveneReport: lower medians + anova-quantized F on |z|, hand-computed") {
    val df = Seq(("g1", 0.0), ("g1", 0.0), ("g1", 10.0),
      ("g2", 5.0), ("g2", 5.0)).toDF("grp", "value")
    val r = AuditOps.leveneReport(df, "grp", "value").collect()(0)
    assert(r.getLong(0) == 2 && r.getLong(1) == 5)
    // z(g1)=[0,0,10] -> sg=10,qg=100; z(g2)=[0,0]
    // tsum=(100e6 div 3)=33333333; tq=20000000; ssb=13333333; ssw=66666667
    assert(r.getDouble(2) == (13333333L * 3).toDouble / 66666667L.toDouble,
      r.toString)
    assert(r.getDouble(3) == 10.0 / 3.0 && r.getDouble(4) == 0.0)
  }

  test("funnelSteps: strictly-after within-horizon anchors, per-step conversions") {
    // u1 completes a@0 -> b@5 -> c@14 (each hop <= 10); u2 stalls (b@20
    // outside the horizon); u3 never did step 1
    val df = Seq((1L, "a", 0L), (1L, "b", 5L), (1L, "c", 14L),
      (2L, "a", 0L), (2L, "b", 20L), (3L, "b", 1L), (3L, "c", 2L))
      .toDF("user_id", "event_type", "tk")
    val rows = EventOps.funnelSteps(df, col("tk"), Seq("a", "b", "c"), 10L)
      .collect()
    assert(rows.map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq ==
      Seq((1L, "a", 2L), (2L, "b", 1L), (3L, "c", 1L)), rows.toSeq)
    assert(rows(0).isNullAt(3) && rows(1).getDouble(3) == 0.5 &&
      rows(2).getDouble(3) == 1.0)
    assert(rows(1).getDouble(4) == 0.5 && rows(2).getDouble(4) == 0.5)
  }

  test("topPaths: first-depth types in (tick, id) order; short journeys keep short paths") {
    val df = Seq((1L, 10L, 0L, "a"), (1L, 11L, 1L, "b"), (1L, 12L, 2L, "c"),
      (1L, 13L, 3L, "d"), (2L, 20L, 0L, "a"), (2L, 21L, 1L, "b"),
      (3L, 30L, 0L, "a"), (3L, 31L, 1L, "b"), (3L, 32L, 2L, "c"))
      .toDF("user_id", "event_id", "tk", "event_type")
    val rows = EventOps.topPaths(df, col("tk"), depth = 3, k = 10)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(rows.toSeq == Seq((1L, "a>b>c", 2L), (2L, "a>b", 1L)), rows.toSeq)
  }

  test("timeToConvert: converting-user gap distribution, hand-computed") {
    // u1 converts at gap 5; u2 at gap 9 (first click after t1 within 10);
    // u3's click precedes signup (no convert); u4 outside the horizon
    val df = Seq((1L, "a", 0L), (1L, "b", 5L), (1L, "b", 7L),
      (2L, "a", 1L), (2L, "b", 10L), (3L, "b", 0L), (3L, "a", 2L),
      (4L, "a", 0L), (4L, "b", 20L))
      .toDF("user_id", "event_type", "tk")
    val r = EventOps.timeToConvert(df, col("tk"), "a", "b", 10L).collect()(0)
    assert(r.getLong(0) == 2 && r.getDouble(1) == 7.0, r.toString)
    assert(r.getDouble(2) == 7.0 && r.getLong(4) == 9L, r.toString)
    // p90 of {5, 9}: interpolated at rank 1 + 0.9 = 5 + 0.9*4
    assert(r.getDouble(3) == 5.0 + 0.9 * 4.0, r.toString)
  }

  test("paretoReport: top-decile share, exact ceil cut") {
    val df = (Seq.fill(10)(1L) ++ Seq(2L, 3L, 4L, 5L)).map(u => (u, "e"))
      .toDF("user_id", "event_type")
    val r = EventOps.paretoReport(df).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((5L, 1L, 10L, 14L)), r.toString)
    assert(r.getDouble(4) == 10.0 / 14.0)
  }

  test("audioZcr: sign-change count and peak over the synth PCM pattern") {
    // frames 0..3 of the (i*31 mod 251) pattern: +7936, +23870, -25732,
    // -9798 -> exactly one crossing; peak 25732
    val df = Seq((7L, graft.multimodal.MediaStub.synthWav(8000, 1, 16, 4)))
      .toDF("doc_id", "payload")
    val r = graft.multimodal.MediaOps.audioZcr(spark, df).collect()(0)
    assert(r.decoded && r.n_samples == 4 && r.n_crossings == 1, r.toString)
    assert(r.zcr == 1.0 / 3.0 && r.max_abs == 25732L, r.toString)
    // garbage payload -> decoded=false zero row, never a throw
    val bad = Seq((8L, Array[Byte](1, 2, 3))).toDF("doc_id", "payload")
    val rb = graft.multimodal.MediaOps.audioZcr(spark, bad).collect()(0)
    assert(!rb.decoded && rb.n_samples == 0 && rb.zcr == 0.0)
    // stereo payload -> decoded=false: the single-sequence sign walk
    // would count crossings ACROSS interleaved channels (ADVICE r12)
    val st = Seq((9L, graft.multimodal.MediaStub.synthWav(8000, 2, 16, 4)))
      .toDF("doc_id", "payload")
    val rs = graft.multimodal.MediaOps.audioZcr(spark, st).collect()(0)
    assert(!rs.decoded && rs.n_samples == 0 && rs.n_crossings == 0, rs.toString)
  }

  test("coEngagement: complete type-pair matrix over distinct user sets") {
    // users: 1 does a+b, 2 does a, 3 does b, 4 does c only
    val df = Seq((1L, "a"), (1L, "a"), (1L, "b"), (2L, "a"), (3L, "b"),
      (4L, "c")).toDF("user_id", "event_type")
    val rows = EventOps.coEngagement(df).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(rows.toSeq == Seq(
      ("a", "b", 2L, 2L, 1L, 1.0 / 3.0),
      ("a", "c", 2L, 1L, 0L, 0.0),
      ("b", "c", 2L, 1L, 0L, 0.0)), rows.toSeq)
  }

  test("markovStepAhead: deterministic chain converges to the absorbing-ish type") {
    // chain a->b, b->b (mostly): users repeat a,b,b,b so after 3 steps
    // mass concentrates on b. Hand-check one iteration exactly:
    // p(a->b)=1, p(b->a)=1/3 (one user goes back), p(b->b)=2/3
    val df = Seq(
      (1L, 1L, 0L, "a"), (1L, 2L, 1L, "b"), (1L, 3L, 2L, "b"),
      (1L, 4L, 3L, "b"), (2L, 5L, 0L, "b"), (2L, 6L, 1L, "a"),
      (2L, 7L, 2L, "b"))
      .toDF("user_id", "event_id", "ts", "event_type")
    val one = EventOps.markovStepAhead(df, iters = 1).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    // transitions: a->b x2; b->b x2, b->a x1 => p(a->b)=1,
    // p(b->a)=0.333333, p(b->b)=0.666667 (round-6 quantization).
    // pi0=(0.5,0.5) -> pi1(a)=round6(0.5*0.333333)=0.166667,
    // pi1(b)=round6(0.5*1+0.5*0.666667)=0.833334
    assert(one == Map("a" -> 0.166667, "b" -> 0.833334), one.toString)
    val three = EventOps.markovStepAhead(df, iters = 3).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    // exact decimal HALF_UP chain: pi2=(0.277778,0.722223),
    // pi3=(0.240741,0.759260)
    assert(three == Map("a" -> 0.240741, "b" -> 0.759260), three.toString)
  }

  test("lorenzReport: exact decile masses and cumulative shares") {
    // 10 users with counts 10,9,...,1 -> one user per decile
    val rows = (1 to 10).flatMap(u => Seq.fill(11 - u)((u.toLong, "e")))
      .toDF("user_id", "event_type")
    val out = EventOps.lorenzReport(rows).collect()
    assert(out.length == 10)
    assert(out.map(_.getLong(1)).forall(_ == 1L), "one user per decile")
    assert(out.map(_.getLong(2)).toSeq == (1 to 10).reverse.map(_.toLong))
    assert(out.last.getLong(3) == 55L && out.last.getDouble(4) == 1.0)
    assert(out.head.getDouble(4) == 10.0 / 55.0)
  }

  test("holtReport: two-accumulator truncating recursion, hand-traced incl. negative trend") {
    // ramp x = 4, 8, 12; l0 = 8, b0 = 0 (truncating division):
    //   t1: fc=8, ae=4,  l=(4+24)/4=7,  b=(-1)/4 = 0
    //   t2: fc=7, ae=5,  l=(8+21)/4=7,  b=0
    //   t3: fc=7, ae=10, l=(12+21)/4=8, b=1/4 = 0
    val df = Seq(("g", 1L, 1L, 4.0), ("g", 2L, 2L, 8.0), ("g", 3L, 3L, 12.0))
      .toDF("grp", "ts", "event_id", "value")
    val r = AuditOps.holtReport(df, "grp", "ts", "event_id", "value")
      .collect()(0)
    assert(r.getLong(1) == 3 && r.getDouble(2) == 8.0 &&
      r.getDouble(3) == 0.0 && r.getDouble(4) == 8.0, r.toString)
    assert(r.getDouble(5) == 10.0 / 3.0, r.toString)
    // crash x = 100, 0: the trend state goes NEGATIVE and the division
    // convention becomes load-bearing — trunc((-5)/4) = -1 where floor
    // would give -2 (DuckDB // truncates; the op must match):
    //   t1: fc=50, ae=50,  l=(100+150)/4=62, b=12/4=3
    //   t2: fc=65, ae=115, l=(0+195)/4=48,   b=((48-62)+9)/4=(-5)/4=-1
    val dn = Seq(("g", 1L, 1L, 100.0), ("g", 2L, 2L, 0.0))
      .toDF("grp", "ts", "event_id", "value")
    val r2 = AuditOps.holtReport(dn, "grp", "ts", "event_id", "value")
      .collect()(0)
    assert(r2.getDouble(2) == 48.0 && r2.getDouble(3) == -1.0 &&
      r2.getDouble(4) == 47.0 && r2.getDouble(5) == 57.5, r2.toString)
    // determinism across partitionings (the fold crosses partitions)
    val again = AuditOps.holtReport(df.repartition(5), "grp", "ts",
      "event_id", "value").collect()(0)
    assert(again.toString == r.toString)
  }

  test("jsdBySource: 0 on identical mixes; hand-computed on disjoint mixes") {
    def r7(x: Double): BigDecimal =
      BigDecimal(x).setScale(7, BigDecimal.RoundingMode.HALF_UP)
    val same = Seq(("A", "x"), ("A", "x"), ("A", "y"), ("A", "y"),
      ("B", "x"), ("B", "x"), ("B", "y"), ("B", "y"))
      .toDF("source", "lang")
    val s = AuditOps.jsdBySource(same, "lang", "source").collect()
    assert(s.forall(_.getDouble(2) == 0.0), s.toSeq.toString)
    // A = all x, B = all y vs the 50/50 corpus: JSD = ln2-bounded mix
    val disj = Seq.fill(4)(("A", "x")) ++ Seq.fill(4)(("B", "y"))
    val d = AuditOps.jsdBySource(disj.toDF("source", "lang"), "lang", "source")
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    // sp(A) = 4·(r7(ln 64) − r7(ln 48)); sq(A) = 4·(r7(ln 32) − r7(ln 48))
    //   + 4·(r7(ln 32) − r7(ln 16)); jsd = sp/(2·4) + sq/(2·8)
    val sp = (BigDecimal(4) * (r7(math.log(64)) - r7(math.log(48)))).toDouble
    val sq = (BigDecimal(4) * (r7(math.log(32)) - r7(math.log(48))) +
      BigDecimal(4) * (r7(math.log(32)) - r7(math.log(16)))).toDouble
    val expect = sp / 8.0 + sq / 16.0
    assert(d("A") == expect && d("B") == expect, s"$d vs $expect")
    // true JSD of these mixes is ~0.2157616 nats — the quantized chain
    // must sit within 1e-6 of it
    assert(math.abs(d("A") - 0.21576158) < 1e-6)
  }

  test("survivalReport: KM product over the hazard cells, hand-computed") {
    // the hazardReport spec's scenario — A: gap 5 (bucket 1) + censored
    // t=0 (bucket 0); B: gap 995 (bucket 3) + censored t=1000 (bucket 4)
    val e = Seq((1L, 0L, 1L, "A"), (1L, 5L, 2L, "B"), (1L, 1000L, 3L, "A"),
      (2L, 0L, 4L, "B")).toDF("user_id", "tk", "event_id", "event_type")
    val out = EventOps.survivalReport(e, col("tk")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    // A: bucket0 d=0/n=2 -> S=1; bucket1 d=1/n=1 -> S=0 (all die)
    // B: bucket3 d=1/n=2 -> S=0.5; bucket4 d=0/n=1 -> S stays 0.5
    assert(out.toSeq == Seq(
      ("A", 0L, 2L, 0L, 1.0), ("A", 1L, 1L, 1L, 0.0),
      ("B", 3L, 2L, 1L, 0.5), ("B", 4L, 1L, 0L, 0.5)), out.toSeq)
    // survival is monotone nonincreasing per type — the KM invariant
    out.groupBy(_._1).foreach { case (_, rows) =>
      val svs = rows.sortBy(_._2).map(_._5)
      assert(svs.zip(svs.tail).forall { case (a, b) => b <= a }, svs.toSeq)
    }
  }

  test("cupedReport: perfectly-correlated covariate adjusts both arms to the same mean") {
    // post = 2·pre for every user => theta=2, corr²=1, and CUPED removes
    // the pre-period imbalance entirely: both arms adjust to 5.0
    val df = Seq(
      (1L, 0L, 1.0), (1L, 20L, 2.0), (2L, 0L, 3.0), (2L, 20L, 6.0),
      (3L, 0L, 2.0), (3L, 20L, 4.0), (4L, 0L, 4.0), (4L, 20L, 8.0))
      .toDF("user_id", "tk", "value")
    val out = AuditOps.cupedReport(df,
        when(col("user_id") <= 2, "A").otherwise("B"), col("tk"),
        "value", cutoffTicks = 10L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5), r.getDouble(6))).toMap
    assert(out("A") == ((2L, 2.0, 4.0, 5.0, 2.0, 1.0)), out.toString)
    assert(out("B") == ((2L, 3.0, 6.0, 5.0, 2.0, 1.0)), out.toString)
    // constant pre (zero variance): theta/var_reduction NULL, means raw
    val flat = Seq((1L, 0L, 5.0), (1L, 20L, 2.0), (2L, 0L, 5.0),
      (2L, 20L, 6.0)).toDF("user_id", "tk", "value")
    val r = AuditOps.cupedReport(flat, lit("A"), col("tk"), "value", 10L)
      .collect()(0)
    assert(r.isNullAt(5) && r.isNullAt(6), r.toString)
  }

  test("sim_ou_final: exact weight table + mean-reversion statistics") {
    // weight exactness: a^(15-step)·10^15 as exact longs
    val w = OuWeights.unitRows(16)
      .map { case (m, st, v) => (m, st) -> v }.toMap
    assert(w((0, 15)) == 1000000000000000L)
    assert(w((0, 0)) == 205891132094649L)  // 0.9^15·10^15 = 9^15
    assert(w((1, 0)) == 35184372088832L)   // 0.8^15·10^15 = 2^45
    // statistical pin (the SimModelSpec style): the OU variance is
    // Σ a^2k (z has unit variance), so both models must sit near theory
    // and BELOW the pure walk's sd = 4; a=0.8 reverts harder than a=0.9
    val rows = SimQueries.queries("sim_ou_final")(spark, sfDir).collect()
      .map(r => r.getInt(0) -> (r.getDouble(2), r.getDouble(3))).toMap
    def theory(a: Double) =
      math.sqrt((0 to 15).map(k => math.pow(a, 2.0 * k)).sum)
    assert(math.abs(rows(0)._1) < 0.2 && math.abs(rows(1)._1) < 0.2,
      s"OU mean must sit near 0: $rows")
    assert(math.abs(rows(0)._2 - theory(0.9)) / theory(0.9) < 0.15, rows.toString)
    assert(math.abs(rows(1)._2 - theory(0.8)) / theory(0.8) < 0.15, rows.toString)
    assert(rows(1)._2 < rows(0)._2 && rows(0)._2 < 4.0,
      s"stronger reversion => smaller spread: $rows")
  }

  test("bpeFertility: merged-pair source compresses below the unmerged one") {
    // source A repeats "ab" (the merge candidate); source B is unmergeable
    // single chars — after training on the union, A's fertility drops
    // below B's (B stays at chars-per-word)
    val docs = Seq((1L, "A", "ab ab ab ab"), (2L, "A", "ab ab"),
      (3L, "B", "xq zw"), (4L, "B", "qz wx"))
      .toDF("doc_id", "source", "text")
    val merges = TextOps.bpeTrain(docs, 1).orderBy("merge_round").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    assert(merges == Seq(("a", "b")), merges.toString)
    val out = TextOps.bpeFertility(docs, merges).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    // A: 6 words, each "ab" -> 1 token: fertility 1.0
    assert(out("A") == ((2L, 6L, 6L, 1.0)), out.toString)
    // B: 4 words x 2 chars, no merge applies: fertility 2.0
    assert(out("B") == ((2L, 4L, 8L, 2.0)), out.toString)
  }

  test("sourceOverlap: complete pairwise token-Jaccard matrix incl. zero rows") {
    val docs = Seq((1L, "s1", "a b c"), (2L, "s1", "a d"),
      (3L, "s2", "a b"), (4L, "s3", "zz"))
      .toDF("doc_id", "source", "text")
    val rows = DedupOps.sourceOverlap(docs).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(rows.toSeq == Seq(
      ("s1", "s2", 4L, 2L, 2L, 0.5),
      ("s1", "s3", 4L, 1L, 0L, 0.0),
      ("s2", "s3", 2L, 1L, 0L, 0.0)), rows.toSeq)
  }
}
