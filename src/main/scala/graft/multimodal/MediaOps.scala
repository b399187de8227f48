package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal transforms as DataFrame→DataFrame functions — the public
  * library surface over [[MediaStub]]'s decode plumbing (the gate queries
  * in `operators.MultimodalQueries` are thin bindings). Image and audio
  * header decode are REAL (JDK `javax.imageio` / `javax.sound.sampled`);
  * only genuinely unknown bytes (video) take the documented stub. The
  * Spark-side shapes — typed mapPartitions decode, binary slicing,
  * generator explode — are the real 100 TB plumbing and are all
  * embarrassingly parallel map work.
  */
object MediaOps {

  /** Audio metadata extraction over a binary payload column — the audio
    * sibling of [[MediaStub.decodeAll]]: real `javax.sound.sampled`
    * header parse ([[MediaStub.decodeAudio]]) per asset, unrecognized
    * payloads emit a `decoded = false` zero row (column totals stay
    * complete — the [[thumbnailPixels]] fallback convention). Same
    * mapPartitions discipline: iterator-to-iterator, embarrassingly
    * parallel, no shuffle at any scale.
    */
  def audioMeta(spark: SparkSession,
      docsWithPayload: DataFrame): Dataset[MediaStub.AudioMeta] = {
    import spark.implicits._
    graft.operators.OpContract.requireCols(docsWithPayload,
        "MediaOps.audioMeta", "doc_id", "payload")
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        MediaStub.decodeAudio(id, bytes).getOrElse(
          MediaStub.AudioMeta(id, decoded = false, bytes.length,
            0, 0, 0, 0L, 0L, "unknown"))
      })
  }

  /** Video container-metadata extraction over a binary payload column —
    * the video sibling of [[audioMeta]]: real pure-JVM ISO BMFF box walk
    * ([[MediaStub.decodeVideo]]) per asset, unrecognized payloads emit a
    * `decoded = false` zero row. Same mapPartitions discipline:
    * iterator-to-iterator, embarrassingly parallel, no shuffle at any
    * scale.
    */
  def videoMeta(spark: SparkSession,
      docsWithPayload: DataFrame): Dataset[MediaStub.VideoMeta] = {
    import spark.implicits._
    graft.operators.OpContract.requireCols(docsWithPayload,
        "MediaOps.videoMeta", "doc_id", "payload")
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        MediaStub.decodeVideo(id, bytes).getOrElse(
          MediaStub.VideoMeta(id, decoded = false, bytes.length,
            0, 0L, 0L, 0, "unknown"))
      })
  }

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

  /** One perceptual-hash row per asset from [[perceptualHash]]. */
  final case class PHash(doc_id: Long, decoded: Boolean, phash: String)

  final case class ImageStats(doc_id: Long, decoded: Boolean, width: Long,
      height: Long, n_pixels: Long, sum_r: Long, sum_g: Long, sum_b: Long,
      mean_r: Double, mean_g: Double, mean_b: Double)

  final case class AudioStats(doc_id: Long, decoded: Boolean, channels: Long,
      n_samples: Long, sum_abs: Long, mean_abs: Double)

  final case class AudioZcr(doc_id: Long, decoded: Boolean, n_samples: Long,
      n_crossings: Long, zcr: Double, max_abs: Long)

  /** ZERO-CROSSING RATE + peak level per clip — the cheapest useful
    * audio features after [[audioStats]]'s mean level (ZCR separates
    * voiced/unvoiced/noise segments and is the classic first column of
    * every audio-quality screen; max\|sample\| is the clipping
    * detector): a real `javax.sound.sampled` decode to 16-bit LE PCM,
    * then the exact count of adjacent-sample sign changes (sign =
    * `sample >= 0`, the textbook convention) and the exact peak.
    * `zcr = crossings/(n−1)` is ONE division of exact integers.
    * Undecodable, non-16-bit, or multi-channel payloads emit
    * `decoded = false` zeros (interleaved stereo would count sign
    * changes across channels — demuxing is the caller's job).
    *
    * Scale shape: the [[MediaStub.decodeAll]] mapPartitions discipline —
    * embarrassingly parallel, no shuffle at any scale; per-clip state is
    * three longs.
    */
  def audioZcr(spark: SparkSession, docsWithPayload: DataFrame): Dataset[AudioZcr] = {
    import spark.implicits._
    graft.operators.OpContract.requireCols(docsWithPayload,
        "MediaOps.audioZcr", "doc_id", "payload")
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val decoded = try {
          val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(bytes))
          val fmt = in.getFormat
          // Mono only: the sign-change walk below reads interleaved PCM
          // as ONE sequence, so on stereo it would count crossings
          // ACROSS channels — semantically wrong ZCR. Multi-channel
          // clips emit decoded=false like the other unsupported formats
          // (audioStats, which sums |sample| symmetrically, still
          // accepts them).
          if (fmt.getSampleSizeInBits != 16 || fmt.isBigEndian ||
              fmt.getChannels != 1) None
          else {
            val data = in.readAllBytes()
            var i = 0; var n = 0L; var cross = 0L; var mx = 0L
            var prevNonNeg = false
            while (i + 1 < data.length) {
              val s = ((data(i) & 0xFF) | (data(i + 1) << 8)).toShort
              val nonNeg = s >= 0
              if (n > 0 && nonNeg != prevNonNeg) cross += 1
              prevNonNeg = nonNeg
              if (math.abs(s.toLong) > mx) mx = math.abs(s.toLong)
              n += 1
              i += 2
            }
            Some((n, cross, mx))
          }
        } catch { case _: Exception => None }
        decoded match {
          case Some((n, cross, mx)) =>
            AudioZcr(id, decoded = true, n, cross,
              if (n > 1) cross.toDouble / (n - 1).toDouble else 0.0, mx)
          case None => AudioZcr(id, decoded = false, 0L, 0L, 0.0, 0L)
        }
      })
  }

  /** PER-CLIP PCM SAMPLE STATISTICS — the audio sibling of
    * [[imageStats]] and the first real feature-extraction step past
    * [[audioMeta]]'s header fields (silence/clipping detection, level
    * normalization all read off these sums): a REAL
    * `javax.sound.sampled` decode to the PCM stream, then the exact
    * integer sum of \|16-bit LE sample\| over every frame×channel and
    * ONE division for the mean level. Undecodable or non-16-bit
    * payloads emit a `decoded = false` zero row.
    *
    * Over [[MediaStub.synthWav]] payloads the data bytes are the
    * deterministic (i·31 mod 251) pattern, so the whole decode is
    * arithmetically predictable — the gate's oracle recomputes the
    * sample sum in closed form over the byte indices and never touches
    * RIFF bytes: only a correct header-parse → PCM round trip matches.
    *
    * Scale shape: the [[MediaStub.decodeAll]] mapPartitions discipline —
    * embarrassingly parallel, no shuffle at any scale.
    */
  def audioStats(spark: SparkSession, docsWithPayload: DataFrame): Dataset[AudioStats] = {
    import spark.implicits._
    graft.operators.OpContract.requireCols(docsWithPayload,
        "MediaOps.audioStats", "doc_id", "payload")
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val decoded = try {
          val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(bytes))
          val fmt = in.getFormat
          if (fmt.getSampleSizeInBits != 16 || fmt.isBigEndian) None
          else {
            val data = in.readAllBytes()
            var i = 0; var sum = 0L; var n = 0L
            while (i + 1 < data.length) {
              val s = ((data(i) & 0xFF) | (data(i + 1) << 8)).toShort
              sum += math.abs(s.toLong)
              n += 1
              i += 2
            }
            Some((fmt.getChannels.toLong, n, sum))
          }
        } catch { case _: Exception => None }
        decoded match {
          case Some((ch, n, sum)) =>
            AudioStats(id, decoded = true, ch, n, sum,
              if (n > 0) sum.toDouble / n.toDouble else 0.0)
          case None => AudioStats(id, decoded = false, 0L, 0L, 0L, 0.0)
        }
      })
  }

  /** PER-IMAGE CHANNEL STATISTICS over a binary payload column — the
    * first real feature-extraction step of an image-curation pipeline
    * (brightness/color-cast filters, black-frame and solid-color
    * detection all read off these sums): a REAL `javax.imageio` decode
    * per asset, then exact integer R/G/B sums over every pixel and one
    * division per channel mean. Undecodable payloads emit a
    * `decoded = false` zero row (the [[thumbnailPixels]] fallback
    * convention — column totals stay complete).
    *
    * Exactness: channel sums are exact longs (each pixel contributes
    * 0–255; 2⁶³ covers ~10¹⁶ pixels); each mean is ONE division of
    * exact integers — over [[MediaStub.synthPng]] payloads the whole
    * decode is arithmetically predictable, which is how the gate
    * value-oracles a real pixel decode end-to-end.
    *
    * Scale shape: the [[MediaStub.decodeAll]] mapPartitions discipline —
    * iterator-to-iterator, one decoder lifecycle per partition,
    * embarrassingly parallel, no shuffle at any scale.
    */
  def imageStats(spark: SparkSession, docsWithPayload: DataFrame): Dataset[ImageStats] = {
    import spark.implicits._
    graft.operators.OpContract.requireCols(docsWithPayload,
        "MediaOps.imageStats", "doc_id", "payload")
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val decoded = try {
          Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
        } catch { case _: Exception => None }
        decoded match {
          case Some(img) =>
            val (w, h) = (img.getWidth, img.getHeight)
            var (sr, sg, sb) = (0L, 0L, 0L)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val rgb = img.getRGB(x, y)
                sr += (rgb >> 16) & 0xFF
                sg += (rgb >> 8) & 0xFF
                sb += rgb & 0xFF
                x += 1
              }
              y += 1
            }
            val np = w.toLong * h
            ImageStats(id, decoded = true, w.toLong, h.toLong, np, sr, sg, sb,
              sr.toDouble / np.toDouble, sg.toDouble / np.toDouble,
              sb.toDouble / np.toDouble)
          case None =>
            ImageStats(id, decoded = false, 0L, 0L, 0L, 0L, 0L, 0L, 0.0, 0.0, 0.0)
        }
      })
  }

  /** Difference-hash (dHash) perceptual image fingerprint — the standard
    * 64-bit near-duplicate signature for image dedup: luma-downscale to a
    * 9×8 grid, set bit (y·8 + x) when cell (x, y) is darker than its
    * right neighbor. Output `phash` is the 16-hex-char form.
    *
    * The downscale is an EXACT integer box filter (per-cell sums of
    * 299r + 587g + 114b over floor-partitioned pixel blocks, one integer
    * division) — not `drawImage` scaling, whose interpolation is
    * JDK-implementation-defined; the same image bytes hash identically on
    * any JVM, which is what makes the hash usable as a dedup KEY across a
    * heterogeneous cluster. Decode is the [[MediaStub.decodeImage]]
    * `javax.imageio` path (real for PNG/BMP/GIF — fixture-pinned in
    * MediaOpsSpec); payloads no reader recognizes fall back to the
    * leading 16 hex chars of the payload MD5 with `decoded = false` — a
    * uniform pseudo-hash that keeps the column total and exact-dup-only
    * (two identical payloads still collide; nothing else is near).
    *
    * Same mapPartitions discipline as [[thumbnailPixels]]: iterator-to-
    * iterator, embarrassingly parallel, no shuffle at any scale.
    */
  def perceptualHash(spark: SparkSession, docsWithPayload: DataFrame): Dataset[PHash] = {
    import spark.implicits._
    graft.operators.OpContract.requireCols(docsWithPayload,
        "MediaOps.perceptualHash", "doc_id", "payload")
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
              val (gw, gh) = (9, 8)
              val (w, h) = (img.getWidth, img.getHeight)
              val grid = Array.ofDim[Long](gh, gw)
              var gy = 0
              while (gy < gh) {
                var gx = 0
                while (gx < gw) {
                  val x0 = gx * w / gw
                  val x1 = math.min(math.max((gx + 1) * w / gw, x0 + 1), w)
                  val y0 = gy * h / gh
                  val y1 = math.min(math.max((gy + 1) * h / gh, y0 + 1), h)
                  var sum = 0L; var n = 0L; var y = y0
                  while (y < y1) {
                    var x = x0
                    while (x < x1) {
                      val rgb = img.getRGB(x, y)
                      sum += 299L * ((rgb >> 16) & 0xff) +
                        587L * ((rgb >> 8) & 0xff) + 114L * (rgb & 0xff)
                      n += 1; x += 1
                    }
                    y += 1
                  }
                  grid(gy)(gx) = sum / n
                  gx += 1
                }
                gy += 1
              }
              var hash = 0L
              var y = 0
              while (y < 8) {
                var x = 0
                while (x < 8) {
                  if (grid(y)(x) < grid(y)(x + 1)) hash |= 1L << (y * 8 + x)
                  x += 1
                }
                y += 1
              }
              PHash(id, decoded = true, f"$hash%016x")
            case None =>
              md.reset()
              PHash(id, decoded = false, hex(md.digest(bytes)).take(16))
          }
        }
      }
  }

  /** Near-duplicate image pairs over [[perceptualHash]] output: bit-level
    * Hamming ≤ `k` on the 64-bit hash. Implemented by EXPANDING the hex
    * hash to its 64-char bit string and delegating to
    * [[graft.operators.DedupOps.hammingPairs]] — character Hamming over
    * the bit string IS bit Hamming, so the lossless (k+1)-segment
    * pigeonhole blocking, its candidate bounds and its gate/spec pins all
    * carry over unchanged. Output: (doc_a, doc_b, dist).
    */
  def phashPairs(hashes: DataFrame, k: Int = 3): DataFrame = {
    val h = graft.operators.OpContract.requireCols(hashes,
      "MediaOps.phashPairs", "doc_id", "phash")
    def half(start: Int) =
      lpad(bin(conv(substring(col("phash"), start, 8), 16, 10).cast("long")), 32, "0")
    val bits = h.select(col("doc_id"), concat(half(1), half(9)).as("bits"))
    graft.operators.DedupOps.hammingPairs(bits, col("doc_id"), col("bits"), k)
  }
}
