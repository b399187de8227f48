package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: treat media as opaque `binary` payloads with
  * typed extracted metadata.
  *
  * The decode is REAL for image containers the JDK ships readers for
  * (PNG/BMP/GIF/JPEG via `javax.imageio` — [[decodeImage]]) and for
  * audio containers `javax.sound.sampled` parses (WAV/AIFF/AU —
  * [[decodeAudio]]); payloads no installed reader recognizes (video,
  * and the synthetic UTF-8 gate corpus) fall back to the clearly-marked
  * deterministic STUB ([[decodeStub]]). Everything Spark-side is real and tested either way:
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

  /** Extracted per-asset AUDIO metadata (what a real decoder returns). */
  final case class AudioMeta(
      doc_id: Long, decoded: Boolean, n_bytes: Int, channels: Int,
      sample_rate: Int, bits_per_sample: Int, n_frames: Long,
      duration_us: Long, format: String)

  /** REAL audio header decode via `javax.sound.sampled` (JDK built-in, no
    * external deps — the same no-new-deps discipline as [[decodeImage]]):
    * parses WAV/AIFF/AU container headers into channels, sample rate,
    * sample width, frame count and exact-integer µs duration
    * (frames·10⁶/rate, one floor division). Returns None when no
    * installed provider recognizes the payload, so callers fall back to
    * [[decodeStub]] — audio joins images in the REAL-decode domain and
    * the stub now covers only genuinely unknown bytes (video).
    */
  def decodeAudio(docId: Long, payload: Array[Byte]): Option[AudioMeta] =
    try {
      val aff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
        new java.io.ByteArrayInputStream(payload))
      val f = aff.getFormat
      val rate = Math.round(f.getSampleRate)
      val frames = aff.getFrameLength.toLong
      Some(AudioMeta(docId, decoded = true, payload.length, f.getChannels,
        rate, f.getSampleSizeInBits, frames,
        if (rate > 0 && frames >= 0) frames * 1000000L / rate else -1L,
        "audio/" + aff.getType.toString.toLowerCase))
    } catch { case _: Exception => None }

  /** Minimal PCM WAV writer (the public RIFF layout: 44-byte header +
    * interleaved little-endian samples). Hand-rolled independently of
    * `javax.sound.sampled` ON PURPOSE — the mm_audio_meta gate
    * synthesizes payloads here and decodes them through the real
    * AudioSystem header parse, so the two implementations cross-check
    * (an off-by-one in either fails the oracle). Sample content is a
    * deterministic byte ramp: irrelevant to header decode, but non-zero
    * so truncated length fields can't hide.
    */
  def synthWav(sampleRate: Int, channels: Int, bitsPerSample: Int,
      nFrames: Int): Array[Byte] = {
    require(sampleRate >= 1 && channels >= 1 && nFrames >= 0 &&
      bitsPerSample >= 8 && bitsPerSample % 8 == 0,
      s"synthWav: bad params ($sampleRate, $channels, $bitsPerSample, $nFrames)")
    val blockAlign = channels * bitsPerSample / 8
    val dataSize = nFrames * blockAlign
    val bb = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII")).put("fmt ".getBytes("US-ASCII"))
      .putInt(16).putShort(1).putShort(channels.toShort).putInt(sampleRate)
      .putInt(sampleRate * blockAlign).putShort(blockAlign.toShort)
      .putShort(bitsPerSample.toShort)
      .put("data".getBytes("US-ASCII")).putInt(dataSize)
    var i = 0
    while (i < dataSize) { bb.put((i * 31 % 251).toByte); i += 1 }
    bb.array()
  }

  /** Decode dispatch: real image decode, then real audio-header decode
    * (folded into the [[MediaMeta]] shape: width/height 0, n_frames =
    * audio frames), stub only for genuinely unknown bytes.
    */
  def decode(docId: Long, payload: Array[Byte]): MediaMeta =
    decodeImage(docId, payload)
      .orElse(decodeAudio(docId, payload).map(a => MediaMeta(
        doc_id = docId, n_bytes = a.n_bytes, width = 0, height = 0,
        n_frames = math.max(math.min(a.n_frames, Int.MaxValue.toLong).toInt, 1),
        format = a.format)))
      .getOrElse(decodeStub(docId, payload))

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
