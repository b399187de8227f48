package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property-based checks of the audit family against brute-force
  * reference implementations on random small inputs (ScalaCheck directly —
  * scalatestplus isn't in the offline dep set). Spark jobs per trial are
  * expensive, so trial counts are modest; the properties cover the
  * combinatorial space the hand-case specs can't.
  */
class AuditPropertiesSpec extends SparkTestBase {
  import spark.implicits._

  private def check(p: Prop, name: String, trials: Int): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(trials), p)
    assert(res.passed, s"$name: $res")
  }

  // small integer scores with heavy tie pressure, labels biased both ways
  private val rowsGen: Gen[List[(Int, Boolean)]] =
    Gen.nonEmptyListOf(Gen.zip(Gen.chooseNum(0, 6), Gen.oneOf(true, false)))

  test("aucReport equals brute-force pair counting (wins + half-ties) on random inputs") {
    check(Prop.forAll(rowsGen) { rows =>
      val df = rows.toDF("s", "y")
      val r = AuditOps.aucReport(df, col("s"), col("y")).collect()(0)
      val pos = rows.filter(_._2).map(_._1)
      val neg = rows.filterNot(_._2).map(_._1)
      if (pos.isEmpty || neg.isEmpty) r.isNullAt(3)
      else {
        val wins = (for (p <- pos; n <- neg) yield
          if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum
        val brute = wins / (pos.size.toDouble * neg.size.toDouble)
        // both sides are exact-integer-derived; tolerance only for the
        // different division groupings of the two formulas
        math.abs(r.getDouble(3) - brute) < 1e-12 &&
          r.getLong(1) == pos.size.toLong && r.getLong(2) == neg.size.toLong
      }
    }, "auc-vs-brute", trials = 30)
  }

  test("gainsReport invariants: partition of N, monotone cumulatives, brute gains") {
    check(Prop.forAll(rowsGen, Gen.chooseNum(2, 6)) { (rows, b) =>
      val df = rows.toDF("s", "y")
      val rs = AuditOps.gainsReport(df, col("s"), col("y"), b)
        .collect().sortBy(_.getLong(0))
      val n = rows.size.toLong
      val p = rows.count(_._2).toLong
      // buckets partition the rows; cumulatives are monotone and end at
      // (N, P); gain of the last bucket is 1 when P > 0
      val partition = rs.map(_.getLong(1)).sum == n &&
        rs.map(_.getLong(2)).sum == p
      val cums = rs.map(r => (r.getLong(3), r.getLong(4)))
      val monotone = cums.zip(cums.drop(1)).forall { case ((a, c), (b2, d)) =>
        a < b2 && c <= d }
      val ends = cums.last == ((n, p))
      // brute check: every bucket's cum cut lands on a tie-group boundary
      // (whole groups per bucket), so taking cum_n rows from the sorted
      // top yields exactly the bucket's rows regardless of within-tie
      // order — cum_pos must equal the brute positive count there
      val sorted = rows.sortBy(-_._1)
      val brute = rs.forall { r =>
        val k = r.getLong(3).toInt // cum_n rows from the top
        r.getLong(4) == sorted.take(k).count(_._2).toLong
      }
      val gainOk = p == 0 || rs.last.getDouble(5) == 1.0
      partition && monotone && ends && brute && gainOk
    }, "gains-invariants", trials = 25)
  }

  test("outlierReport flags exactly the brute-force |x-mean|>z*sigma set") {
    val vg = Gen.nonEmptyListOf(Gen.chooseNum(-50, 50)).suchThat(_.size >= 2)
    check(Prop.forAll(vg, Gen.chooseNum(1, 3)) { (xs, z) =>
      val df = xs.map(v => ("g", v.toDouble)).toDF("grp", "v")
      val r = AuditOps.outlierReport(df, "grp", "v", z).collect()(0)
      val n = xs.size.toLong
      val s = xs.map(_.toLong).sum
      val s2 = xs.map(x => x.toLong * x).sum
      val brute = xs.count { x =>
        val d = BigInt(n) * x - s
        d * d > BigInt(z.toLong * z) * (BigInt(n) * s2 - BigInt(s) * s)
      }
      r.getLong(2) == brute.toLong
    }, "zscore-vs-brute", trials = 30)
  }

  test("fuzzyPairs banded blocking loses nothing vs exhaustive levenshtein") {
    // variable-length keys (3..11 chars) so the length bands are REAL:
    // pairs land in same/adjacent/distant bands and the ±1 probe replicas
    // plus the |len diff| <= k prefilter must still lose nothing
    val wordGen = Gen.listOfN(2, Gen.chooseNum(1, 5)
      .flatMap(n => Gen.stringOfN(n, Gen.alphaLowerChar))).map(_.mkString(" "))
    val corpusGen = Gen.listOfN(12, wordGen)
    check(Prop.forAll(corpusGen) { keys =>
      val df = keys.zipWithIndex.map { case (k, i) => (i.toLong, k) }.toDF("id", "key")
      val got = DedupOps.fuzzyPairs(df, col("id"), col("key"), k = 2, blockWidth = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      def lev(a: String, b: String): Int = {
        val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
          if (i == 0) j else if (j == 0) i else 0 }
        for (i <- 1 to a.length; j <- 1 to b.length)
          d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
            d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
        d(a.length)(b.length)
      }
      val want = (for {
        i <- keys.indices; j <- keys.indices if i < j
        dist = lev(keys(i), keys(j)) if dist <= 2
      } yield (i.toLong, j.toLong, dist.toLong)).toSet
      got == want
    }, "fuzzy-lossless", trials = 20)
  }

  test("zorder16 preserves locality: same 2^b-aligned tile iff same z-prefix") {
    val cGen = Gen.chooseNum(0, 65535)
    check(Prop.forAll(cGen, cGen, cGen, cGen, Gen.chooseNum(1, 8)) { (x1, y1, x2, y2, b) =>
      val df = Seq((x1.toLong, y1.toLong), (x2.toLong, y2.toLong)).toDF("x", "y")
        .select(LayoutOps.zorder16(col("x"), col("y")).as("z"))
      val zs = df.collect().map(_.getLong(0))
      val sameTile = (x1 >> b) == (x2 >> b) && (y1 >> b) == (y2 >> b)
      val samePrefix = (zs(0) >> (2 * b)) == (zs(1) >> (2 * b))
      sameTile == samePrefix
    }, "zorder-tile-prefix", trials = 60)
  }

  test("triangleStats equals brute triple enumeration on random graphs") {
    // small random edge lists with heavy duplicate/self-loop pressure
    val edgeGen = Gen.listOf(Gen.zip(Gen.chooseNum(1L, 9L), Gen.chooseNum(1L, 9L)))
    check(Prop.forAll(edgeGen) { raw =>
      val canon = raw.collect { case (a, b) if a != b =>
        (math.min(a, b), math.max(a, b)) }.distinct
      if (canon.isEmpty) true
      else {
        val r = GraphOps.triangleStats(canon.toDF("doc_a", "doc_b")).collect().head
        val es = canon.toSet
        val nodes = canon.flatMap(e => Seq(e._1, e._2)).distinct.sorted
        val bruteTri = (for {
          i <- nodes.indices; j <- nodes.indices if i < j
          k <- nodes.indices if j < k
          (a, b, c) = (nodes(i), nodes(j), nodes(k))
          if es((a, b)) && es((b, c)) && es((a, c))
        } yield 1).size.toLong
        val deg = canon.flatMap(e => Seq(e._1, e._2)).groupBy(identity)
          .view.mapValues(_.size.toLong).toMap
        val bruteWedges = deg.values.map(d => d * (d - 1) / 2).sum
        r.getLong(0) == canon.size.toLong && r.getLong(1) == bruteTri &&
          r.getLong(2) == bruteWedges
      }
    }, "triangles-vs-brute", trials = 25)
  }

  test("kmvSetOps is exact below saturation on random two-set inputs") {
    val setGen = Gen.zip(
      Gen.nonEmptyListOf(Gen.chooseNum(0, 40)).map(_.toSet),
      Gen.nonEmptyListOf(Gen.chooseNum(20, 60)).map(_.toSet))
    check(Prop.forAll(setGen) { case (sa, sb) =>
      val df = (sa.toSeq.map(("A", _)) ++ sb.toSeq.map(("B", _)))
        .toDF("g", "key")
      // k = 128 > any union here: kept-count and union are EXACT; the
      // derived intersection/differences go through (n_both/n_union)*U —
      // two IEEE roundings — so assert them to 1e-9, not bit-exact
      val r = SketchOps.kmvSetOps(df, col("key"), "g", 128).collect().head
      def near(x: Double, want: Int) = math.abs(x - want) < 1e-9
      r.getLong(2) == (sa ++ sb).size.toLong &&
        r.getDouble(3) == (sa ++ sb).size.toDouble &&
        near(r.getDouble(5), (sa & sb).size) &&
        near(r.getDouble(6), (sa -- sb).size) &&
        near(r.getDouble(7), (sb -- sa).size)
    }, "kmv-setops-exact", trials = 25)
  }
}
