package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators over the `documents` table — the language-ID,
  * quality-scoring, token-counting and fingerprinting stages of a large-scale
  * training-data pipeline (north-star additions, SURVEY §2.2).
  *
  * The four scan-shaped queries (token stats, quality, langid, bag-of-words
  * fingerprint) are single-pass, shuffle-light and expression-based — at
  * 100 TB they run as a map-side scan with partial aggregation. tx_winnow
  * shuffles by doc_id by nature (winnowing needs positional windows) but its
  * shingle generation is the native positional WordShingles expression, so
  * the per-row work stays codegen'd; the 200-doc slice only bounds the
  * oracle's SQL cost.
  *
  * Cross-engine notes: ratios are always exact-integer sums divided once at
  * the end (never averaged doubles); word splitting is a plain single-space
  * split identical to DuckDB's string_split.
  */
object TextQueries {
  import Tables._

  private def words: Column = split(col("text"), " ")
  private val stop = Seq("the", "a", "of", "and", "to", "in")
  private def stopCount(w: Column): Column =
    size(filter(w, x => x.isin(stop.map(lit(_)): _*)))
  private val sqlStop = stop.map(s => s"'$s'").mkString("(", ", ", ")")

  // Marker vocabularies for the language-ID heuristic (argmax of hit counts;
  // ties resolved in fixed en>de>es>fr order both engines).
  private val markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and"),
    "de" -> Seq("der", "die", "das", "und"),
    "es" -> Seq("el", "los", "las", "y"),
    "fr" -> Seq("le", "les", "et", "ou"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Token counting: whitespace tokens + BPE-ish regex tokens, corpus stats
    // per language label. One scan, one small hash agg.
    "tx_token_stats" -> ((s, d) =>
      t(s, d, "documents")
        .select(col("lang"), col("n_chars"),
          size(words).as("ws_tokens"),
          // count of maximal [a-z0-9]+ runs == count of non-empty tokens
          // when splitting on [^a-z0-9]+ (the oracle's formulation), with
          // no interpreted filter lambda and no token-array materialization
          regexp_count(col("text"), lit("[a-z0-9]+")).cast("int").as("re_tokens"),
          size(array_distinct(words)).as("uniq_tokens"))
        .groupBy("lang")
        .agg(
          count(lit(1)).as("n_docs"),
          (sum(col("ws_tokens")).cast("double") / count(lit(1))).as("avg_tokens"),
          (sum(col("n_chars")).cast("double") / count(lit(1))).as("avg_chars"),
          sum(col("re_tokens")).as("total_re_tokens"),
          (sum(col("uniq_tokens")).cast("double") / sum(col("ws_tokens"))).as("distinct_ratio"))
        .orderBy("lang")),

    // Per-document quality scoring: type-token ratio, stopword ratio, word
    // length — combined into one deterministic score. Pure projection (no
    // shuffle at all).
    "tx_quality" -> ((s, d) =>
      t(s, d, "documents")
        .filter(col("doc_id") < 200)
        .select(col("doc_id"),
          size(words).as("n_tokens"),
          (size(array_distinct(words)).cast("double") / size(words)).as("ttr"),
          (stopCount(words).cast("double") / size(words)).as("stop_ratio"),
          (length(regexp_replace(col("text"), " ", "")).cast("double") / size(words))
            .as("avg_word_len"))
        .withColumn("quality_score",
          col("ttr") * 0.5 + col("stop_ratio") * 0.2 +
            when(col("n_tokens") >= 30 && col("n_tokens") <= 120, 0.3).otherwise(0.0))
        .orderBy("doc_id")),

    // Language-ID heuristic: marker-word hit counts, argmax with fixed tie
    // order; output is the label×prediction confusion matrix.
    // Plan: ONE word explode + four codegen'd conditional sums per doc —
    // the earlier `size(filter(split(...)))` form split the text four times
    // and ran the marker test as an interpreted per-element lambda (the
    // repo's documented ~40× higher-order-function trap). The per-doc
    // aggregate partially combines map-side, so the shuffle carries ~one
    // row per document, not the exploded words.
    "tx_langid" -> ((s, d) => {
      val hitCols = markers.map { case (l, ms) =>
        sum(when(col("word").isin(ms.map(lit(_)): _*), 1).otherwise(0)).as(s"c_$l")
      }
      // explode(split) emits >= 1 row per doc (split("") is [""]) — but
      // split(NULL) is NULL and explode would DROP the document, while the
      // oracle's CASE over NULL counts falls through to 'fr' and keeps it;
      // coalescing text to '' plus an explicit null flag preserves parity
      // on corpora with NULL text (all-NULL marker counts -> 'fr')
      val counts = t(s, d, "documents")
        .repartition(s.sparkContext.defaultParallelism)
        .select(col("doc_id"), col("lang"), col("text").isNull.as("tnull"),
          explode(split(coalesce(col("text"), lit("")), " ")).as("word"))
        .groupBy("doc_id", "lang", "tnull")
        .agg(hitCols.head, hitCols.tail: _*)
      val predicted =
        when(col("tnull"), "fr") // matches the oracle's NULL-falls-to-ELSE
          .when(col("c_en") >= greatest(col("c_de"), col("c_es"), col("c_fr")), "en")
          .when(col("c_de") >= greatest(col("c_es"), col("c_fr")), "de")
          .when(col("c_es") >= col("c_fr"), "es")
          .otherwise("fr")
      counts
        .select(col("lang"), predicted.as("predicted"))
        .groupBy("lang", "predicted")
        .agg(count(lit(1)).as("n_docs"))
        .orderBy("lang", "predicted")
    }),

    // Winnowing fingerprints (Schleimer/Wilkerson/Aiken, the MOSS
    // algorithm): positional 3-gram hashes → minimum per sliding window of
    // 8 → the distinct minima are the document's fingerprint set. Guarantees
    // any shared run ≥ 10 words produces a shared fingerprint. Output:
    // corpus summary of per-doc fingerprint counts.
    "tx_winnow" -> ((s, d) => {
      import graft.functions.CrossHash
      import org.apache.spark.sql.graftbridge.Bridge
      val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
        .rowsBetween(Window.currentRow, 7)
      // positional (non-distinct) native shingles — winnowing needs
      // document order, and the interpreted transform form cost ~4s/pass
      val sh = Bridge.column(
        graft.functions.WordShingles(Bridge.expression(col("text")), 3, distinct = false))
      val fps = t(s, d, "documents")
        .filter(col("doc_id") < 200).filter(size(words) >= 3)
        .select(col("doc_id"), posexplode(sh).as(Seq("pos", "shingle")))
        .withColumn("h", CrossHash.mdint(col("shingle")))
        .withColumn("winmin", min(col("h")).over(w))
        .select(col("doc_id"), col("winmin")).distinct()
      fps.groupBy("doc_id").agg(count(lit(1)).as("n_fingerprints"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_fingerprints")).as("total_fps"),
          min(col("n_fingerprints")).as("min_fps"),
          max(col("n_fingerprints")).as("max_fps"))
    }),

    // Repetition filter (the Gopher-style quality signal): fraction of
    // positional 3-grams that are duplicates within the document — boosted
    // boilerplate/spam detection in every large-scale corpus pipeline.
    // One native-shingle explode, per-doc exact integer counts (total vs
    // distinct via a two-level aggregate — no countDistinct, so no Expand),
    // per-language summary with a single division at the end; the 0.2
    // flag threshold compares identically cross-engine because each ratio
    // is ONE correctly-rounded division of exact integers.
    "tx_repetition" -> ((s, d) => {
      import org.apache.spark.sql.graftbridge.Bridge
      val sh = Bridge.column(
        graft.functions.WordShingles(Bridge.expression(col("text")), 3, distinct = false))
      val perShingle = t(s, d, "documents")
        .repartition(s.sparkContext.defaultParallelism)
        .filter(size(words) >= 3)
        .select(col("doc_id"), col("lang"), explode(sh).as("shingle"))
        .groupBy("doc_id", "lang", "shingle")
        .agg(count(lit(1)).as("cnt"))
      val perDoc = perShingle.groupBy("doc_id", "lang")
        .agg(sum(col("cnt")).as("total"), count(lit(1)).as("uniq"))
      perDoc.groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("total")).as("total_shingles"),
          sum(col("total") - col("uniq")).as("dup_shingles"),
          (sum(col("total") - col("uniq")).cast("double") / sum(col("total")))
            .as("dup_ratio"),
          sum(when((col("total") - col("uniq")).cast("double") / col("total") >= 0.2, 1)
            .otherwise(0)).as("n_flagged"))
        .orderBy("lang")
    }),

    // Stratified sampling (class rebalancing): sampleBy with per-language
    // fractions downsamples the dominant class. Sampler randomness is
    // engine-specific -> rows-only gate; per-class fraction tolerances are
    // asserted in PipelineOpsSpec.
    "tx_stratified_sample" -> ((s, d) => {
      val fractions = Map("en" -> 0.25, "de" -> 1.0, "es" -> 1.0, "fr" -> 1.0, "zh" -> 1.0)
      t(s, d, "documents")
        .stat.sampleBy("lang", fractions, 42L)
        .groupBy("lang").agg(count(lit(1)).as("n_sampled"))
        .orderBy("lang")
    }),

    // Deterministic train/val/test split — the canonical dataset-prep op.
    // Hash-based assignment (not randomSplit) so membership is a pure
    // function of doc_id: stable across runs, partitionings and engines —
    // at 100 TB you want splits reproducible from the row itself, not from
    // a sampler's partition-local state. Fully oracle-checkable.
    "tx_train_val_test" -> ((s, d) =>
      t(s, d, "documents")
        .withColumn("bucket", graft.functions.CrossHash.mdint(concat(lit("split:"), col("doc_id"))) % 10)
        .withColumn("split",
          when(col("bucket") <= 7, "train").when(col("bucket") === 8, "val").otherwise("test"))
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("min_doc"),
          max(col("doc_id")).as("max_doc"))
        .orderBy("split")),

    // Bag-of-words fingerprint (md5 over the sorted distinct vocabulary):
    // documents with identical word sets collapse to one fingerprint —
    // word-order-insensitive near-dup detection in one agg pass.
    "tx_fingerprint" -> ((s, d) =>
      t(s, d, "documents")
        .select(md5(concat_ws(" ", array_sort(array_distinct(split(lower(col("text")), " ")))))
          .as("fp"))
        .groupBy("fp").agg(count(lit(1)).as("cluster_size"))
        .agg(
          count(lit(1)).as("n_fingerprints"),
          sum(col("cluster_size")).as("n_docs"),
          sum(when(col("cluster_size") > 1, 1).otherwise(0)).as("n_multi_clusters"),
          max(col("cluster_size")).as("max_cluster"))))

  private def sqlMarkerCount(ms: Seq[String]): String =
    s"len(list_filter(string_split(text, ' '), x -> x IN ${ms.map(m => s"'$m'").mkString("(", ", ", ")")}))"

  def oracleSql: Map[String, String] = Map(
    "tx_repetition" ->
      """WITH ws AS (SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents),
        |sh AS (SELECT doc_id, lang,
        |    unnest(list_transform(range(1, len(w) - 1), i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS shingle
        |  FROM ws WHERE len(w) >= 3),
        |pc AS (SELECT doc_id, lang, shingle, COUNT(*) AS cnt FROM sh GROUP BY 1, 2, 3),
        |pd AS (SELECT doc_id, lang, SUM(cnt) AS total, COUNT(*) AS uniq FROM pc GROUP BY 1, 2)
        |SELECT lang, COUNT(*) AS n_docs,
        |  CAST(SUM(total) AS BIGINT) AS total_shingles,
        |  CAST(SUM(total - uniq) AS BIGINT) AS dup_shingles,
        |  CAST(SUM(total - uniq) AS DOUBLE) / CAST(SUM(total) AS DOUBLE) AS dup_ratio,
        |  CAST(SUM(CASE WHEN CAST(total - uniq AS DOUBLE) / CAST(total AS DOUBLE) >= 0.2
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged
        |FROM pd GROUP BY lang ORDER BY lang""".stripMargin,
    "tx_token_stats" ->
      """WITH x AS (
        |  SELECT lang, n_chars,
        |    len(string_split(text, ' ')) AS ws_tokens,
        |    len(list_filter(regexp_split_to_array(text, '[^a-z0-9]+'), x -> x <> '')) AS re_tokens,
        |    len(list_distinct(string_split(text, ' '))) AS uniq_tokens
        |  FROM documents)
        |SELECT lang, COUNT(*) AS n_docs,
        |  CAST(SUM(ws_tokens) AS DOUBLE) / COUNT(*) AS avg_tokens,
        |  CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars,
        |  CAST(SUM(re_tokens) AS BIGINT) AS total_re_tokens,
        |  CAST(SUM(uniq_tokens) AS DOUBLE) / CAST(SUM(ws_tokens) AS DOUBLE) AS distinct_ratio
        |FROM x GROUP BY lang ORDER BY lang""".stripMargin,
    "tx_quality" ->
      s"""WITH x AS (
         |  SELECT doc_id,
         |    len(string_split(text, ' ')) AS n_tokens,
         |    CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) / len(string_split(text, ' ')) AS ttr,
         |    CAST(len(list_filter(string_split(text, ' '), x -> x IN $sqlStop)) AS DOUBLE) / len(string_split(text, ' ')) AS stop_ratio,
         |    CAST(length(replace(text, ' ', '')) AS DOUBLE) / len(string_split(text, ' ')) AS avg_word_len
         |  FROM documents WHERE doc_id < 200)
         |SELECT doc_id, n_tokens, ttr, stop_ratio, avg_word_len,
         |  ttr * 0.5 + stop_ratio * 0.2 +
         |    (CASE WHEN n_tokens >= 30 AND n_tokens <= 120 THEN 0.3 ELSE 0.0 END) AS quality_score
         |FROM x ORDER BY doc_id""".stripMargin,
    "tx_langid" ->
      s"""WITH h AS (
         |  SELECT lang,
         |    ${sqlMarkerCount(markers(0)._2)} AS c_en,
         |    ${sqlMarkerCount(markers(1)._2)} AS c_de,
         |    ${sqlMarkerCount(markers(2)._2)} AS c_es,
         |    ${sqlMarkerCount(markers(3)._2)} AS c_fr
         |  FROM documents)
         |SELECT lang,
         |  CASE WHEN c_en >= greatest(c_de, c_es, c_fr) THEN 'en'
         |       WHEN c_de >= greatest(c_es, c_fr) THEN 'de'
         |       WHEN c_es >= c_fr THEN 'es'
         |       ELSE 'fr' END AS predicted,
         |  COUNT(*) AS n_docs
         |FROM h GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "tx_winnow" ->
      s"""WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents WHERE doc_id < 200),
        |sh0 AS (SELECT doc_id, unnest(range(1, len(w) - 1)) AS i, w FROM ws WHERE len(w) >= 3),
        |sh AS (SELECT doc_id, i - 1 AS pos,
        |    ${graft.functions.CrossHash.sqlMdint("w[i] || ' ' || w[i+1] || ' ' || w[i+2]")} AS h
        |  FROM sh0),
        |wm AS (SELECT doc_id, MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
        |    ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS winmin FROM sh),
        |fp AS (SELECT DISTINCT doc_id, winmin FROM wm),
        |pc AS (SELECT doc_id, COUNT(*) AS n_fingerprints FROM fp GROUP BY doc_id)
        |SELECT COUNT(*) AS n_docs, CAST(SUM(n_fingerprints) AS BIGINT) AS total_fps,
        |  MIN(n_fingerprints) AS min_fps, MAX(n_fingerprints) AS max_fps
        |FROM pc""".stripMargin,
    "tx_train_val_test" ->
      s"""WITH b AS (
         |  SELECT doc_id, ${graft.functions.CrossHash.sqlMdint("'split:' || doc_id")} % 10 AS bucket
         |  FROM documents),
         |s AS (SELECT doc_id, CASE WHEN bucket <= 7 THEN 'train'
         |                          WHEN bucket = 8 THEN 'val' ELSE 'test' END AS split
         |      FROM b)
         |SELECT split, COUNT(*) AS n_docs, MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
         |FROM s GROUP BY split ORDER BY split""".stripMargin,
    "tx_fingerprint" ->
      """WITH fp AS (
        |  SELECT md5(array_to_string(list_sort(list_distinct(string_split(lower(text), ' '))), ' ')) AS fp
        |  FROM documents),
        |cl AS (SELECT fp, COUNT(*) AS cluster_size FROM fp GROUP BY fp)
        |SELECT COUNT(*) AS n_fingerprints,
        |  CAST(SUM(cluster_size) AS BIGINT) AS n_docs,
        |  CAST(SUM(CASE WHEN cluster_size > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_multi_clusters,
        |  MAX(cluster_size) AS max_cluster
        |FROM cl""".stripMargin)
}
