package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.multimodal.{MediaOps, MediaStub}

/** Multimodal-column queries (north-star): binary payloads + stubbed decode.
  * The stub derives metadata arithmetically from the payload length, so the
  * DuckDB oracle reproduces the exact values from octet_length — the Spark
  * side still runs the REAL plumbing (typed mapPartitions decode for
  * mm_decode_meta; generated-column explode for mm_frame_sample).
  */
object MultimodalQueries {
  import Tables._

  // SQL mirrors of MediaStub.decodeStub's arithmetic — single source for all
  // mm_* oracle strings (change decodeStub => change these together).
  private val sqlNBytes = "octet_length(encode(text))"
  private val sqlWidth = s"CAST(32 + $sqlNBytes % 512 AS INTEGER)"
  private val sqlHeight = s"CAST(32 + ($sqlNBytes * 7) % 512 AS INTEGER)"
  private val sqlNFrames = s"CAST(1 + $sqlNBytes // 100 AS INTEGER)"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Typed mapPartitions decode -> extracted metadata (first 100 docs).
    "mm_decode_meta" -> ((s, d) =>
      MediaStub.decodeAll(s, t(s, d, "documents").filter(col("doc_id") < 100))
        .toDF()
        .select("doc_id", "n_bytes", "width", "height", "n_frames", "format")
        .orderBy("doc_id")),

    // The oracle slices the source string — same bytes, payloads are ASCII.
    "mm_thumbnail" -> ((s, d) =>
      MediaOps.thumbnail(
        MediaStub.withPayload(t(s, d, "documents").filter(col("doc_id") < 100)))
        .orderBy("doc_id")),

    "mm_resize" -> ((s, d) =>
      MediaOps.resizeToFit(
        MediaStub.decodeAll(s, t(s, d, "documents").filter(col("doc_id") < 100)).toDF())
        .orderBy("doc_id")),

    "mm_frame_sample" -> ((s, d) =>
      MediaOps.frameSample(
        MediaStub.withPayload(t(s, d, "documents").filter(col("doc_id") < 100)))
        .orderBy("doc_id")))

  def oracleSql: Map[String, String] = Map(
    "mm_decode_meta" ->
      s"""SELECT doc_id,
         |  CAST($sqlNBytes AS INTEGER) AS n_bytes,
         |  $sqlWidth AS width,
         |  $sqlHeight AS height,
         |  $sqlNFrames AS n_frames,
         |  CASE WHEN $sqlNBytes % 2 = 0 THEN 'fake/even' ELSE 'fake/odd' END AS format
         |FROM documents WHERE doc_id < 100 ORDER BY doc_id""".stripMargin,
    "mm_thumbnail" ->
      s"""SELECT doc_id, md5(substr(text, 1, 64)) AS thumb_md5,
         |  CAST(least($sqlNBytes, 64) AS INTEGER) AS thumb_bytes
         |FROM documents WHERE doc_id < 100 ORDER BY doc_id""".stripMargin,
    "mm_resize" ->
      s"""WITH dims AS (
         |  SELECT doc_id, $sqlWidth AS width, $sqlHeight AS height
         |  FROM documents WHERE doc_id < 100),
         |m AS (SELECT *, greatest(width, height) AS max_dim FROM dims)
         |SELECT doc_id, width, height,
         |  CAST(CASE WHEN max_dim <= 128 THEN width ELSE (width * 128) // max_dim END AS INTEGER) AS new_w,
         |  CAST(CASE WHEN max_dim <= 128 THEN height ELSE (height * 128) // max_dim END AS INTEGER) AS new_h
         |FROM m ORDER BY doc_id""".stripMargin,
    "mm_frame_sample" ->
      s"""WITH f AS (SELECT doc_id, $sqlNFrames AS n_frames
         |           FROM documents WHERE doc_id < 100),
         |fr AS (SELECT doc_id, unnest(range(0, n_frames)) AS frame_idx FROM f)
         |SELECT doc_id, COUNT(*) AS n_sampled, CAST(MAX(frame_idx) AS INTEGER) AS last_frame
         |FROM fr WHERE frame_idx % 3 = 0
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin)
}
