package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: treat media as opaque `binary` payloads with
  * typed extracted metadata.
  *
  * The container has no image/audio codecs, so the decode itself is a
  * clearly-marked deterministic STUB ([[decodeStub]]) — what is real and
  * tested is everything Spark-side: the binary column handling, the typed
  * `Dataset.mapPartitions` batch shape (one decoder instantiation per
  * partition, streaming iterator, no per-row setup cost — the same shape a
  * JNI/FFmpeg decoder needs), the schema of the extracted features, and the
  * frame-sampling explode.
  */
object MediaStub {

  /** Extracted per-asset metadata (what a real decoder would return). */
  final case class MediaMeta(
      doc_id: Long, n_bytes: Int, width: Int, height: Int, n_frames: Int, format: String)

  /** STUB decoder: deterministic fake dimensions derived from the payload
    * length. A real implementation would parse the container header; the
    * call signature and the per-partition lifecycle are the real contract.
    */
  def decodeStub(docId: Long, payload: Array[Byte]): MediaMeta = {
    val n = payload.length
    MediaMeta(
      doc_id = docId,
      n_bytes = n,
      width = 32 + n % 512,
      height = 32 + (n * 7) % 512,
      n_frames = 1 + n / 100,
      format = if (n % 2 == 0) "fake/even" else "fake/odd")
  }

  /** Attach a binary payload column (stand-in for real media bytes). */
  def withPayload(docs: DataFrame): DataFrame =
    docs.withColumn("payload", encode(col("text"), "UTF-8"))

  /** The mapPartitions decode path: per-partition decoder lifecycle,
    * iterator-to-iterator (no materialization of the partition).
    */
  def decodeAll(spark: SparkSession, docs: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    withPayload(docs)
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // A real decoder would be constructed HERE, once per partition.
        it.map { case (id, bytes) => decodeStub(id, bytes) }
      }
  }
}
