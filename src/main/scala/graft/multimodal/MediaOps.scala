package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
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

  /** One thumbnail row per asset from [[thumbnailPixels]]. */
  final case class Thumb(
      doc_id: Long, decoded: Boolean, src_w: Int, src_h: Int,
      new_w: Int, new_h: Int, thumb_bytes: Int, thumb_md5: String)

  /** REAL pixel thumbnailing: decode the payload via `javax.imageio`
    * ([[MediaStub.decodeImage]] containers), resize to fit a `box`-pixel
    * square with the same integer-floor contract as [[resizeToFit]],
    * re-encode as PNG, and fingerprint the result. Payloads no installed
    * reader recognizes (audio/video, the synthetic gate corpus) keep the
    * leading-byte fingerprint of [[thumbnail]] with `decoded = false`.
    * Same mapPartitions discipline as [[MediaStub.decodeAll]]:
    * iterator-to-iterator, per-partition setup, embarrassingly parallel —
    * no shuffle at any scale.
    */
  def thumbnailPixels(spark: SparkSession, docsWithPayload: DataFrame,
      box: Int = 128): Dataset[Thumb] = {
    import spark.implicits._
    require(box >= 1, s"thumbnailPixels needs box >= 1, got $box")
    graft.operators.OpContract.requireCols(docsWithPayload,
        "MediaOps.thumbnailPixels", "doc_id", "payload")
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        def hex(b: Array[Byte]): String = b.map("%02x".format(_)).mkString
        it.map { case (id, bytes) =>
          val decoded = try {
            Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
          } catch { case _: Exception => None }
          decoded match {
            case Some(img) =>
              val (w, h) = (img.getWidth, img.getHeight)
              val m = math.max(w, h)
              val (nw, nh) =
                if (m <= box) (w, h) else (w * box / m, h * box / m)
              val out = new java.awt.image.BufferedImage(
                math.max(nw, 1), math.max(nh, 1),
                java.awt.image.BufferedImage.TYPE_INT_RGB)
              val g = out.createGraphics()
              try g.drawImage(img, 0, 0, math.max(nw, 1), math.max(nh, 1), null)
              finally g.dispose()
              val bos = new java.io.ByteArrayOutputStream()
              javax.imageio.ImageIO.write(out, "png", bos)
              val png = bos.toByteArray
              md.reset()
              Thumb(id, decoded = true, w, h, math.max(nw, 1), math.max(nh, 1),
                png.length, hex(md.digest(png)))
            case None =>
              md.reset()
              Thumb(id, decoded = false, 0, 0, 0, 0,
                math.min(bytes.length, box), hex(md.digest(bytes.take(box))))
          }
        }
      }
  }

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

  /** [[frameSample]] over REAL frame counts: n_frames comes from the
    * container header via [[MediaStub.decode]] (actual for multi-frame
    * formats the JDK reads — animated GIF; stub fallback otherwise), then
    * the same generator-explode sampling shape. Decode is the
    * mapPartitions path, sampling stays pure relational — the explode
    * never materializes frames, only indices, so the op ships (doc_id,
    * int) rows regardless of media size.
    */
  def frameSampleDecoded(spark: SparkSession, docsWithPayload: DataFrame,
      stride: Int = 3): DataFrame = {
    import spark.implicits._
    require(stride >= 1, s"frameSampleDecoded needs stride >= 1, got $stride")
    graft.operators.OpContract.requireCols(docsWithPayload,
        "MediaOps.frameSampleDecoded", "doc_id", "payload")
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        (id, MediaStub.decode(id, bytes).n_frames)
      })
      .toDF("doc_id", "n_frames")
      .select(col("doc_id"), explode(sequence(lit(0), col("n_frames") - 1)).as("frame_idx"))
      .filter(col("frame_idx") % stride === 0)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_sampled"), max(col("frame_idx")).as("last_frame"))
  }
}
