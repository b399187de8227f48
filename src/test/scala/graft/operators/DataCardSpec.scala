package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** The release data card is a RELABELING, never a recomputation: every
  * `(section, source, metric, value)` row must equal the corresponding
  * gate-pinned operator's own output on the same inputs (VERDICT r11 #8
  * — the card closes the publish loop only if it can't drift from the
  * panel it summarizes).
  */
class DataCardSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = {
    // 3 sources × skewed langs, deterministic scores; ids 1..60
    (1 to 60).map { i =>
      val src = Seq("web", "books", "code")(i % 3)
      val lang = if (i % 5 == 0) "de" else "en"
      (i.toLong, src, lang, 100 + (i % 7) * 250)
    }.toDF("doc_id", "source", "lang", "n_chars")
      .withColumn("len_band", expr("n_chars div 200"))
  }
  private lazy val ref = docs.filter(col("doc_id") % 3 =!= 0)
  private lazy val score = col("n_chars") / 2000.0
  private lazy val label = col("lang") === "en"

  // null metric values (a one-class AUC, a zero-side TVD) are kept as
  // None — NaN would break Map equality
  private def optD(r: org.apache.spark.sql.Row, i: Int): Option[Double] =
    if (r.isNullAt(i)) None else Some(r.getDouble(i))

  private lazy val card = AuditOps.dataCard(docs, ref, score, label,
      "source", "lang", Seq("lang", "len_band"), col("source"), k = 5, l = 2)
    .collect()
    .map(r => (r.getString(0), r.getString(1), r.getString(2)) -> optD(r, 3))
    .toMap

  private def metric(section: String, metric: String): Map[String, Option[Double]] =
    card.collect { case ((s, src, m), v) if s == section && m == metric =>
      src -> v }

  test("volume/ranking/calibration/operating_point/gains rows equal the per-source ops") {
    val vol = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> Option(r.getLong(1).toDouble)).toMap
    assert(metric("volume", "n_docs") == vol)
    def byGrp(df: org.apache.spark.sql.DataFrame, vCol: String) =
      df.collect().map(r => r.getString(r.fieldIndex("grp")) ->
        optD(r, r.fieldIndex(vCol))).toMap
    assert(metric("ranking", "auc") ==
      byGrp(AuditOps.aucReportBy(docs, score, label, "source"), "auc"))
    assert(metric("calibration", "ece") ==
      byGrp(AuditOps.calibrationReportBy(docs, score, label, "source")
        .select("grp", "ece").distinct(), "ece"))
    assert(metric("operating_point", "f1") ==
      byGrp(AuditOps.thresholdReportBy(docs, score, label, "source"), "f1"))
    assert(metric("gains", "top_quintile_lift") ==
      byGrp(AuditOps.gainsReportBy(docs, score, label, "source", 5)
        .filter(col("bucket") === 1), "lift"))
  }

  test("drift/psi/ks rows equal the two-corpus ops") {
    def byGrp(df: org.apache.spark.sql.DataFrame, vCol: String) =
      df.collect().map(r => r.getString(r.fieldIndex("grp")) ->
        optD(r, r.fieldIndex(vCol))).toMap
    assert(metric("drift", "tvd") ==
      byGrp(AuditOps.categoricalDriftBy(docs, ref, "lang", "source")
        .groupBy("grp").agg(min(col("tvd")).as("tvd")), "tvd"))
    assert(metric("psi", "psi") ==
      byGrp(AuditOps.psiReportBy(docs, ref, "lang", "source")
        .groupBy("grp").agg(min(col("psi")).as("psi")), "psi"))
    val both = docs.select(col("source"), score.as("v"), lit(true).as("side"))
      .unionByName(ref.select(col("source"), score.as("v"), lit(false).as("side")))
    assert(metric("ks", "ks") ==
      byGrp(AuditOps.ksReportBy(both, col("v"), col("side"), "source"), "ks"))
    // mix (r13): per-source JSD vs the corpus lang mix — the jsdBySource op
    assert(metric("mix", "jsd_norm") ==
      byGrp(AuditOps.jsdBySource(docs, "lang", "source"), "jsd_norm"))
  }

  test("corpus-global privacy/concentration/independence rows equal the global ops") {
    val ka = AuditOps.kAnonymityReport(docs, Seq("lang", "len_band"),
      col("source"), k = 5, l = 2).collect()(0)
    assert(metric("privacy", "k_anonymous")("__corpus__") ==
      Some(if (ka.getAs[Boolean]("k_anonymous")) 1.0 else 0.0))
    assert(metric("privacy", "l_diverse")("__corpus__") ==
      Some(if (ka.getAs[Boolean]("l_diverse")) 1.0 else 0.0))
    assert(metric("privacy", "min_group_size")("__corpus__") ==
      Some(ka.getAs[Long]("min_group_size").toDouble))
    assert(metric("privacy", "frac_below_k")("__corpus__") ==
      Some(ka.getAs[Double]("frac_below_k")))
    val gini = AuditOps.giniReport(docs, "source").collect()(0)
    assert(metric("concentration", "gini")("__corpus__") ==
      Some(gini.getAs[Double]("gini")))
    val ind = AuditOps.independenceReport(docs, "lang", "source").collect()(0)
    assert(metric("independence", "cramers_v")("__corpus__") ==
      Some(ind.getAs[Double]("cramers_v")))
    assert(metric("independence", "dependent")("__corpus__") ==
      Some(if (ind.getAs[Boolean]("dependent")) 1.0 else 0.0))
  }

  test("card is publishable and versioned (the --card composition)") {
    // the long format is stable: exactly 4 columns, no NULL keys, and the
    // (section, source, metric) triple is unique — the publish id contract
    val cardDf = AuditOps.dataCard(docs, ref, score, label,
      "source", "lang", Seq("lang", "len_band"), col("source"), k = 5, l = 2)
    assert(cardDf.columns.toSeq == Seq("section", "source", "metric", "value"))
    val n = cardDf.count()
    assert(cardDf.select("section", "source", "metric").distinct().count() == n)
    val root = java.nio.file.Files.createTempDirectory("graft-cardspec").toString
    val v = graft.sources.SnapshotStore.publish(cardDf, root,
      concat_ws(":", col("section"), col("source"), col("metric")))
    assert(graft.sources.SnapshotStore.read(spark, root).count() == n)
    assert(v == 1L)
  }
}
