package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Hand-computed pins for the round-13 additions: the unigram-LM
  * (hard-EM/Viterbi) tokenizer trainer family and the wasserstein
  * single-value-group emission fix (ADVICE r12).
  */
class R13OpsSpec extends SparkTestBase {
  import spark.implicits._

  test("unigramTrain: EM keeps the whole-word piece over its char split") {
    // corpus words: "ab"×2, "b"×1. Candidates a:2, ab:2, b:3 (tot 7);
    // lp7(a)=lp7(ab)=6931472−19459101, lp7(b)=10986123−19459101.
    // "ab" as [ab] (−12527629) beats [a][b] (−21000607) → round-1 counts
    // ab:2, b:1; round 2 keeps them. Ranks: (1, ab, 2), (2, b, 1).
    val docs = Seq((1L, "ab ab b")).toDF("doc_id", "text")
    val rows = TextOps.unigramTrain(docs, candN = 100, maxPieceLen = 3,
      rounds = 2, topK = 20).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(rows.toSeq == Seq((1L, "ab", 2L), (2L, "b", 1L)), rows.toSeq)
  }

  test("unigramTrain: char split wins when the pair is rarer than its chars") {
    // corpus "aa": candidates a:2, aa:1 (tot 3); [a][a] = 2·(ln2−ln3)·1e7
    // = −8109302 beats [aa] = −10986123 → 'aa' never used, dropped.
    val docs = Seq((1L, "aa")).toDF("doc_id", "text")
    val rows = TextOps.unigramTrain(docs, candN = 100).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(rows.toSeq == Seq((1L, "a", 2L)), rows.toSeq)
  }

  test("unigramModel/unigramLp/unigramFertility compose: tokens per word per source") {
    // words ab:2 (doc 1), b:1 (doc 1) + b:1 (doc 2); trained model keeps
    // {ab, b}; every word segments to ONE token → fertility 1.0 per source
    val docs = Seq((1L, "ab ab b", "s1"), (2L, "b", "s2"))
      .toDF("doc_id", "text", "source")
    val model = TextOps.unigramModel(docs, candN = 100)
    val lp = TextOps.unigramLp(model)
    assert(lp.keySet == Set("ab", "b"), lp)
    val rows = TextOps.unigramFertility(docs, lp).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.toSeq == Seq(("s1", 3L, 3L, 1.0), ("s2", 1L, 1L, 1.0)),
      rows.toSeq)
  }

  test("unigramEncode: per-doc token budget under the trained vocab") {
    // doc 1: "ab"(2 chars → 1 token) ×2 + "b"(1 → 1): 3 words, 5 chars,
    // 3 tokens, compression 0.6
    val docs = Seq((1L, "ab ab b")).toDF("doc_id", "text")
    val lp = TextOps.unigramLp(TextOps.unigramModel(docs, candN = 100))
    val r = TextOps.unigramEncode(docs, lp).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getDouble(4)) == ((1L, 3L, 5L, 3L, 0.6)), r.toString)
  }

  test("unigramFertility: unknown text segments deterministically under the sentinel") {
    // model trained on "ab" corpus lacks 'c' entirely: "cc" still
    // segments deterministically — ONE sentinel-priced piece beats two
    // (NEG > 2·NEG), so the whole unknown word becomes a single token;
    // the oracle's BIGINT arithmetic lands on the identical path
    val train = Seq((1L, "ab ab")).toDF("doc_id", "text")
    val lp = TextOps.unigramLp(TextOps.unigramModel(train, candN = 100))
    val score = Seq((9L, "cc ab", "s9")).toDF("doc_id", "text", "source")
    val r = TextOps.unigramFertility(score, lp).collect()(0)
    // "cc" -> 1 sentinel token, "ab" -> 1 token: 2 tokens / 2 words
    assert((r.getString(0), r.getLong(1), r.getLong(2)) == (("s9", 2L, 2L)),
      r.toString)
  }

  test("unigram invariants on random corpora: segmentation covers, budgets bound, encode/fertility agree") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // words over a tiny alphabet maximize piece collisions/tie pressure;
    // sizes kept small — every trial is 2 EM rounds of Spark jobs
    val wordGen = Gen.choose(1, 6)
      .flatMap(n => Gen.listOfN(n, Gen.oneOf('a', 'b', 'c'))).map(_.mkString)
    val docGen = Gen.choose(1, 5)
      .flatMap(n => Gen.listOfN(n, wordGen)).map(_.mkString(" "))
    val corpusGen = Gen.choose(1, 3).flatMap(n => Gen.listOfN(n, docGen))
    val p = Prop.forAll(corpusGen) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t, "s") }
        .toDF("doc_id", "text", "source")
      val model = TextOps.unigramModel(docs, candN = 50)
      val lp = TextOps.unigramLp(model)
      val enc = TextOps.unigramEncode(docs, lp).collect()
      val byDoc = texts.zipWithIndex.map { case (t, i) =>
        (i.toLong, t.split(" ").filter(_.nonEmpty)) }.toMap
      val perDocOk = enc.forall { r =>
        val ws = byDoc(r.getLong(0))
        r.getLong(1) == ws.length &&                 // n_words
        r.getLong(2) == ws.map(_.length).sum &&      // n_chars exact
        r.getLong(3) >= r.getLong(1) &&              // >= 1 token per word
        r.getLong(3) <= r.getLong(2)                 // <= 1 token per char
      }
      // encode and fertility segment under the SAME lp, so their token
      // totals must agree exactly (NOT the trained model's Σcnt — those
      // counts came from segmenting under the PREVIOUS round's model,
      // and hard-EM need not reach a fixed point in 2 rounds)
      val fert = TextOps.unigramFertility(docs, lp).collect()(0)
      val encTotal = enc.map(_.getLong(3)).sum
      val encWords = enc.map(_.getLong(1)).sum
      perDocOk && fert.getLong(1) == encWords && fert.getLong(2) == encTotal
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(6), p)
    assert(res.passed, res.toString)
  }

  test("wassersteinReport: single-distinct-value group emits w1 = 0 (ADVICE r12)") {
    val df = Seq((1L, "g", 5.0), (2L, "g", 5.0), (1L, "h", 0.0),
      (1L, "h", 2.0), (2L, "h", 1.0)).toDF("user_id", "grp", "value")
    val rows = AuditOps.wassersteinReport(df, "grp", col("user_id") === 1L,
      "value").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // g collapses to one quantized value -> (g, 1, 1, 0.0) still emitted;
    // h is the R12OpsSpec case (W1 = 1.0)
    assert(rows.toSeq == Seq(("g", 1L, 1L, 0.0), ("h", 2L, 1L, 1.0)),
      rows.toSeq)
  }
}
