package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: treat media as opaque `binary` payloads with
  * typed extracted metadata.
  *
  * The decode is REAL for image containers the JDK ships readers for
  * (PNG/BMP/GIF/JPEG via `javax.imageio` — [[decodeImage]]); payloads no
  * installed reader recognizes (audio/video, and the synthetic UTF-8 gate
  * corpus) fall back to the clearly-marked deterministic STUB
  * ([[decodeStub]]). Everything Spark-side is real and tested either way:
  * the binary column handling, the typed `Dataset.mapPartitions` batch
  * shape (one decoder instantiation per partition, streaming iterator, no
  * per-row setup cost — the same shape a JNI/FFmpeg decoder needs), the
  * schema of the extracted features, and the frame-sampling explode.
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

  /** REAL image decode via `javax.imageio` (JDK built-in, no external
    * deps): asks the installed reader registry to sniff the container,
    * then reads header-level metadata — actual parsed width/height/format,
    * and the frame count for multi-frame containers (GIF). Returns None
    * when no reader recognizes the payload, so callers can fall back to
    * [[decodeStub]] for non-image bytes.
    */
  def decodeImage(docId: Long, payload: Array[Byte]): Option[MediaMeta] = {
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(payload))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) None
      else {
        val r = readers.next()
        try {
          r.setInput(iis)
          val n = try r.getNumImages(true) catch { case _: Exception => 1 }
          Some(MediaMeta(
            doc_id = docId,
            n_bytes = payload.length,
            width = r.getWidth(0),
            height = r.getHeight(0),
            n_frames = math.max(n, 1),
            format = "image/" + r.getFormatName.toLowerCase))
        } finally r.dispose()
      }
    } finally if (iis != null) iis.close()
  }

  /** Decode dispatch: real image decode first, stub for everything else. */
  def decode(docId: Long, payload: Array[Byte]): MediaMeta =
    decodeImage(docId, payload).getOrElse(decodeStub(docId, payload))

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
        // Per-partition decoder lifecycle: the imageio registry lookup is
        // JVM-wide, so dispatch per row is cheap; a JNI decoder would be
        // constructed HERE, once per partition.
        it.map { case (id, bytes) => decode(id, bytes) }
      }
  }
}
