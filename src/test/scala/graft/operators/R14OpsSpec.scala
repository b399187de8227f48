package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Round-14 op specs: the ADVICE-r13 code-point contract for the
  * unigram family, and the data-card composition seams.
  */
class R14OpsSpec extends SparkTestBase {
  import spark.implicits._

  test("unigram family walks code points: supplementary-plane words keep " +
      "single-char coverage and oracle-parity n_chars (ADVICE r13)") {
    // 😀 is U+1F600 (2 UTF-16 units, 1 code point). Candidate extraction
    // runs in Spark SQL, whose substring/length count code points — a
    // code-UNIT dp would look up surrogate-half substrings that can never
    // be in the model, price every position with the sentinel, and report
    // n_chars in units (8) instead of code points (5).
    val docs = Seq((1L, "src", "en", "😀😀x 😀x", 8L))
      .toDF("doc_id", "source", "lang", "text", "n_chars")
    val m = TextOps.unigramModel(docs, candN = 10, maxPieceLen = 3, rounds = 2)
    val pieces = m.select("piece").as[String].collect().toSet
    // a code-unit dp segments into unit-substrings, leaving lone
    // surrogates; a code-point dp only ever emits well-formed pieces
    // (here EM absorbs everything into the two whole words)
    assert(pieces.forall(p => !p.exists(c => Character.isSurrogate(c) &&
      (Character.isLowSurrogate(p.charAt(0)) ||
        Character.isHighSurrogate(p.charAt(p.length - 1))))),
      s"no surrogate-half-edged pieces: $pieces")
    assert(pieces == Set("😀😀x", "😀x"), s"EM fixed point: $pieces")
    val lp = TextOps.unigramLp(m)
    val enc = TextOps.unigramEncode(docs, lp).collect()(0)
    // words "😀😀x" (3 cps) + "😀x" (2 cps) = 5 code points, 8 UTF-16 units
    assert(enc.getAs[Long]("n_chars") == 5L,
      s"n_chars must count code points, got ${enc.getAs[Long]("n_chars")}")
    // both words ARE model pieces (3 and 2 code points <= maxPieceLen 3,
    // in-model beats any sentinel split) -> exactly one token each; the
    // code-unit dp never finds them (unit-length 5 and 3 exceed 3) and
    // would emit 8 sentinel units instead
    val nTok = enc.getAs[Long]("n_tokens")
    assert(nTok == 2L, s"whole-word pieces must win: $nTok")
    // encode and fertility segment under the same lp -> exact agreement
    val fert = TextOps.unigramFertility(docs, lp).collect()(0)
    assert(fert.getAs[Long]("n_tokens") == nTok)
    assert(fert.getAs[Long]("n_words") == 2L)
  }

  test("unigram: BMP-only corpora segment exactly as before the code-point walk") {
    val docs = Seq((1L, "s", "en", "abab ab ab cd", 13L))
      .toDF("doc_id", "source", "lang", "text", "n_chars")
    val m = TextOps.unigramModel(docs, candN = 6, maxPieceLen = 3, rounds = 2)
    val lp = TextOps.unigramLp(m)
    val enc = TextOps.unigramEncode(docs, lp).collect()(0)
    assert(enc.getAs[Long]("n_chars") == 10L)
    assert(enc.getAs[Long]("n_words") == 4L)
  }

  test("unigram: maxPieceLen=4 trains (the full documented bound) and a " +
      "4-char word can win as one piece") {
    val docs = Seq((1L, "s", "en", "wxyz wxyz wxyz w x y z", 22L))
      .toDF("doc_id", "source", "lang", "text", "n_chars")
    val m4 = TextOps.unigramModel(docs, candN = 8, maxPieceLen = 4, rounds = 2)
    val pieces = m4.select("piece").as[String].collect().toSet
    assert(pieces.contains("wxyz"), s"4-piece must survive EM: $pieces")
    val enc = TextOps.unigramEncode(docs, TextOps.unigramLp(m4), maxPieceLen = 4)
      .collect()(0)
    // "wxyz" x3 -> 1 token each; "w x y z" -> 4 single-char tokens
    assert(enc.getAs[Long]("n_tokens") == 7L,
      s"expected 3x1 + 4x1 tokens, got ${enc.getAs[Long]("n_tokens")}")
    // the bound itself is enforced
    intercept[IllegalArgumentException] {
      TextOps.unigramModel(docs, candN = 8, maxPieceLen = 5, rounds = 1)
    }
  }

  test("writeTokenizer/readTokenizer: loaded model equals freshly trained " +
      "for BOTH families; torn artifacts raise") {
    val docs = Seq(
      (1L, "s", "en", "abab ab ab cd cd ab", 19L),
      (2L, "s", "en", "abab cd ab ba ba", 16L))
      .toDF("doc_id", "source", "lang", "text", "n_chars")
    val root = java.nio.file.Files.createTempDirectory("graft-tokspec").toString
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq.map(String.valueOf)).sortBy(_.mkString("|")).toSeq

    // BPE: merge list round-trips in training order, encode identical
    val merges = TextOps.bpeTrain(docs, 4)
    TextOps.writeTokenizer(merges, s"$root/bpe", "bpe")
    assert(TextOps.tokenizerExists(s"$root/bpe"))
    val (bf, bm, _) = TextOps.readTokenizer(spark, s"$root/bpe")
    assert(bf == "bpe")
    assert(TextOps.bpeMergeSeq(bm) == TextOps.bpeMergeSeq(merges))
    assert(canon(TextOps.bpeEncode(docs, TextOps.bpeMergeSeq(bm))) ==
      canon(TextOps.bpeEncode(docs, TextOps.bpeMergeSeq(merges))))

    // unigram: (piece, cnt) + maxPieceLen round-trip, encode identical
    val uni = TextOps.unigramModel(docs, candN = 10, maxPieceLen = 4, rounds = 2)
    TextOps.writeTokenizer(uni, s"$root/uni", "unigram", maxPieceLen = 4)
    val (uf, um, umpl) = TextOps.readTokenizer(spark, s"$root/uni")
    assert(uf == "unigram" && umpl == 4)
    assert(TextOps.unigramLp(um) == TextOps.unigramLp(uni))
    assert(canon(TextOps.unigramEncode(docs, TextOps.unigramLp(um), umpl)) ==
      canon(TextOps.unigramEncode(docs, TextOps.unigramLp(uni), 4)))

    // overwrite is idempotent (a re-train replaces the artifact cleanly)
    TextOps.writeTokenizer(merges, s"$root/bpe", "bpe")
    assert(TextOps.readTokenizer(spark, s"$root/bpe")._1 == "bpe")

    // torn/absent artifact: model parquet without a manifest must raise
    val torn = s"$root/torn"
    merges.write.mode("overwrite").parquet(s"$torn/model.parquet")
    assert(!TextOps.tokenizerExists(torn))
    intercept[IllegalArgumentException] { TextOps.readTokenizer(spark, torn) }
    // family/param validation on write
    intercept[IllegalArgumentException] {
      TextOps.writeTokenizer(merges, s"$root/x", "wordpiece")
    }
    intercept[IllegalArgumentException] {
      TextOps.writeTokenizer(uni, s"$root/x", "unigram", maxPieceLen = 9)
    }
  }

  test("dataCard seams: fromCounts variants equal their public ops exactly") {
    val docs = Seq(
      (1L, "a", "en", 0.9, true), (2L, "a", "en", 0.4, false),
      (3L, "a", "de", 0.7, true), (4L, "b", "de", 0.2, false),
      (5L, "b", "en", 0.8, true), (6L, "b", "fr", 0.5, false),
      (7L, "b", "fr", 0.6, true))
      .toDF("doc_id", "source", "lang", "score", "label")
    val ref = docs.filter(col("doc_id") % 3 =!= 0)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq.map(String.valueOf)).sortBy(_.mkString("|")).toSeq
    val sc = docs.filter(col("score").isNotNull && col("source").isNotNull)
      .select(col("source").as("grp"), col("score").as("s"),
        when(col("label"), 1L).otherwise(0L).as("y"))
      .groupBy("grp", "s").agg(count(lit(1)).as("cnt"), sum(col("y")).as("pos"))
    assert(canon(AuditOps.aucFromScoreCounts(sc)) ==
      canon(AuditOps.aucReportBy(docs, col("score"), col("label"), "source")))
    assert(canon(AuditOps.thresholdFromScoreCounts(sc)) ==
      canon(AuditOps.thresholdReportBy(docs, col("score"), col("label"), "source")))
    assert(canon(AuditOps.gainsFromScoreCounts(sc, 5)) ==
      canon(AuditOps.gainsReportBy(docs, col("score"), col("label"), "source", 5)))
    assert(canon(AuditOps.calibrationFromScoreCounts(sc)) ==
      canon(AuditOps.calibrationReportBy(docs, col("score"), col("label"), "source")))
    def gc(df: org.apache.spark.sql.DataFrame) =
      df.filter(col("lang").isNotNull && col("source").isNotNull)
        .groupBy(col("source").cast("string").as("grp"),
          col("lang").cast("string").as("cat"))
        .agg(count(lit(1)).as("cnt"))
    assert(canon(AuditOps.categoricalDriftFromCounts(gc(docs), gc(ref))) ==
      canon(AuditOps.categoricalDriftBy(docs, ref, "lang", "source")))
    assert(canon(AuditOps.psiFromCounts(gc(docs), gc(ref))) ==
      canon(AuditOps.psiReportBy(docs, ref, "lang", "source")))
    assert(canon(AuditOps.jsdFromCounts(gc(docs).withColumnRenamed("cnt", "o"))) ==
      canon(AuditOps.jsdBySource(docs, "lang", "source")))
    assert(canon(AuditOps.independenceFromCounts(gc(docs).select(
        col("cat").as("a"), col("grp").as("b"), col("cnt").as("o")))) ==
      canon(AuditOps.independenceReport(docs, "lang", "source")))
    val src = docs.filter(col("source").isNotNull)
      .groupBy(col("source").as("cat")).agg(count(lit(1)).as("cnt"))
    assert(canon(AuditOps.giniFromCounts(src)) ==
      canon(AuditOps.giniReport(docs, "source")))
  }

  test("PQ model seam: caller-trained pqModel feeds pqCodes/pqTopK/ivfPqTopK " +
      "identically to self-trained (the r14 shared-training overloads)") {
    import graft.core.DeterministicRng
    val dim = SimilarityOps.DIM
    val vecs = (0 until 40).map { id =>
      (id.toLong, Array.tabulate(dim)(i =>
        (DeterministicRng.uniform(31L, id.toLong, 0L, i.toLong) - 0.5).toFloat).toSeq)
    }
    val e = vecs.toDF("vec_id", "embedding").repartition(3)
    val q = e.filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val cents = e.filter(col("vec_id") < 4)
      .select(col("vec_id").as("cid"), col("embedding").as("ce"))
    val model = SimilarityOps.pqModel(e)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).sorted.toSeq
    assert(canon(SimilarityOps.pqCodes(e, model, 4, 16)) ==
      canon(SimilarityOps.pqCodes(e)))
    assert(canon(SimilarityOps.pqTopK(e, q, 5, model, 4, 16,
        excludeQueryId = true)) ==
      canon(SimilarityOps.pqTopK(e, q, 5)))
    assert(canon(SimilarityOps.ivfPqTopK(e, q, cents, 2, 5, model, 4, 16,
        excludeQueryId = true)) ==
      canon(SimilarityOps.ivfPqTopK(e, q, cents, 2, 5)))
  }

  test("normalizeEmbeddingsMelted == normalizeEmbeddings + posexplode, " +
      "bit-for-bit incl. the zero-norm passthrough (r14 gate restructure)") {
    // means (2,2); centered (-1,1),(1,-1),(0,0); vec 3 exercises the
    // nrm == 0 branch (unrounded centered values pass through)
    val e = Seq((1L, Array(1f, 3f), 7), (2L, Array(3f, 1f), 7),
        (3L, Array(2f, 2f), 9))
      .toDF("vec_id", "embedding", "label")
    val viaArray = SimilarityOps.normalizeEmbeddings(e)
      .select(col("vec_id"), col("label"), col("norm"),
        posexplode(col("embedding")).as(Seq("dim", "v")))
      .select(col("vec_id"), col("dim").cast("long").as("dim"), col("v"),
        col("norm"), col("label"))
    val melted = SimilarityOps.normalizeEmbeddingsMelted(e)
    def bits(df: org.apache.spark.sql.DataFrame) = df.collect().map { r =>
      (r.getLong(0), r.getLong(1),
        java.lang.Double.doubleToRawLongBits(r.getDouble(2)),
        java.lang.Double.doubleToRawLongBits(r.getDouble(3)), r.getInt(4))
    }.sortBy(t => (t._1, t._2)).toSeq
    assert(bits(melted) == bits(viaArray))
    assert(melted.columns.toSeq ==
      Seq("vec_id", "dim", "v", "norm", "label"))
  }
}
