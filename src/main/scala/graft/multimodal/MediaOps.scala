package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal transforms as DataFrame→DataFrame functions — the public
  * library surface over [[MediaStub]]'s decode plumbing (the gate queries
  * in `operators.MultimodalQueries` are thin bindings). The decode itself
  * is the documented stub (this container has no image/audio libraries);
  * the Spark-side shapes — typed mapPartitions decode, binary slicing,
  * generator explode — are the real 100 TB plumbing and are all
  * embarrassingly parallel map work.
  */
object MediaOps {

  /** Thumbnail/preview extraction shape: slice the leading bytes of the
    * binary payload and fingerprint them (a real pipeline would decode and
    * resize; the byte-slice + digest plumbing is identical).
    */
  def thumbnail(docsWithPayload: DataFrame, nBytes: Int = 64): DataFrame =
    graft.operators.OpContract.requireCols(docsWithPayload,
        "MediaOps.thumbnail", "doc_id", "payload")
      .select(col("doc_id"),
        md5(substring(col("payload"), 1, nBytes)).as("thumb_md5"),
        least(octet_length(col("payload")), lit(nBytes)).as("thumb_bytes"))
      .orderBy("doc_id")

  /** Resize stage: scale decoded dimensions to fit a `box`-pixel square
    * preserving aspect ratio — integer arithmetic only (floor semantics
    * identical across engines), the standard thumbnail-resize contract.
    * Input: a DataFrame with `doc_id, width, height` (e.g.
    * [[MediaStub.decodeAll]]).
    */
  def resizeToFit(dims: DataFrame, box: Int = 128): DataFrame =
    graft.operators.OpContract.requireCols(dims,
        "MediaOps.resizeToFit", "doc_id", "width", "height")
      .withColumn("max_dim", greatest(col("width"), col("height")))
      .select(col("doc_id"), col("width"), col("height"),
        when(col("max_dim") <= box, col("width"))
          .otherwise(((col("width") * box) / col("max_dim")).cast("int")).as("new_w"),
        when(col("max_dim") <= box, col("height"))
          .otherwise(((col("height") * box) / col("max_dim")).cast("int")).as("new_h"))
      .orderBy("doc_id")

  /** Frame sampling: explode the frame index space, keep every `stride`-th
    * frame — the classic video frame-sample shape (generator + filter).
    */
  def frameSample(docsWithPayload: DataFrame, stride: Int = 3): DataFrame =
    docsWithPayload
      .select(col("doc_id"),
        (lit(1) + expr("octet_length(payload) div 100")).cast("int").as("n_frames"))
      .select(col("doc_id"), explode(sequence(lit(0), col("n_frames") - 1)).as("frame_idx"))
      .filter(col("frame_idx") % stride === 0)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_sampled"), max(col("frame_idx")).as("last_frame"))
      .orderBy("doc_id")
}
