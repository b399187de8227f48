package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: treat media as opaque `binary` payloads with
  * typed extracted metadata.
  *
  * The decode is REAL for image containers the JDK ships readers for
  * (PNG/BMP/GIF/JPEG via `javax.imageio` — [[decodeImage]]), for audio
  * containers `javax.sound.sampled` parses (WAV/AIFF/AU —
  * [[decodeAudio]]), and for MP4/ISO-BMFF video containers via the
  * pure-JVM box walk ([[decodeVideo]]); payloads no decoder recognizes
  * (the synthetic UTF-8 gate corpus) fall back to the clearly-marked
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
    * [[decodeStub]] — audio joins images in the REAL-decode domain (and
    * since r11, MP4 video via [[decodeVideo]]); the stub covers only
    * genuinely unknown bytes.
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

  /** Synthesize a REAL PNG with a deterministic per-pixel gradient —
    * pixel (x, y) carries r = (7x+3y+id) mod 256, g = (5x+11y+2id) mod
    * 256, b = (13x+y+5id) mod 256 — via `java.awt.image.BufferedImage` +
    * `javax.imageio`. PNG is lossless, so a decoder must recover every
    * pixel EXACTLY; [[graft.multimodal.MediaOps.imageStats]]' channel
    * sums over these payloads are therefore arithmetically predictable,
    * which is what lets the gate value-oracle a real image decode (the
    * [[synthWav]]/[[synthMp4]] cross-check pattern, applied to pixels
    * instead of headers).
    */
  def synthPng(id: Long, w: Int, h: Int): Array[Byte] = {
    require(w >= 1 && h >= 1, s"synthPng: bad dims ${w}x$h")
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = ((7L * x + 3L * y + id) % 256).toInt
        val g = ((5L * x + 11L * y + 2L * id) % 256).toInt
        val b = ((13L * x + y + 5L * id) % 256).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Extracted per-asset VIDEO container metadata (the `moov/mvhd` header
    * fields a real probe reports before any codec work).
    */
  final case class VideoMeta(
      doc_id: Long, decoded: Boolean, n_bytes: Int, timescale: Int,
      duration_ticks: Long, duration_us: Long, n_tracks: Int, format: String)

  /** Minimal ISO BMFF (MP4) writer: `ftyp` + `moov(mvhd, trak·n)` + `mdat`
    * with version-0 full boxes in the public ISO/IEC 14496-12 layout.
    * Hand-rolled independently of [[decodeVideo]] ON PURPOSE — the
    * mm_video_meta gate synthesizes payloads here and parses them back
    * through the independent box walk, so the two implementations
    * cross-check against the DuckDB arithmetic oracle (the r10
    * [[synthWav]]/[[decodeAudio]] pattern). `mdat` carries a
    * deterministic byte ramp so truncated size fields can't hide.
    * Layout arithmetic the oracle mirrors: n_bytes = 20 (ftyp) + 8 +
    * 108 (mvhd) + 100·nTracks (trak/tkhd) + 8 + dataLen (mdat).
    */
  def synthMp4(timescale: Int, durationTicks: Long, nTracks: Int,
      dataLen: Int): Array[Byte] = {
    require(timescale >= 1 && durationTicks >= 0 && durationTicks <= 0xFFFFFFFFL &&
      nTracks >= 1 && dataLen >= 0,
      s"synthMp4: bad params ($timescale, $durationTicks, $nTracks, $dataLen)")
    val total = 20 + 8 + 108 + 100 * nTracks + 8 + dataLen
    val bb = java.nio.ByteBuffer.allocate(total)
      .order(java.nio.ByteOrder.BIG_ENDIAN) // ISO BMFF is big-endian
    def fourcc(s: String): Unit = { bb.put(s.getBytes("US-ASCII")); () }
    // ftyp: major brand isom, minor version 0, one compatible brand
    bb.putInt(20); fourcc("ftyp"); fourcc("isom"); bb.putInt(0); fourcc("isom")
    // moov
    bb.putInt(8 + 108 + 100 * nTracks); fourcc("moov")
    //   mvhd v0: creation/modification 0, rate 1.0 (16.16), volume 1.0
    bb.putInt(108); fourcc("mvhd"); bb.putInt(0) // version 0 + flags
    bb.putInt(0).putInt(0).putInt(timescale).putInt(durationTicks.toInt)
    bb.putInt(0x00010000).putShort(0x0100.toShort).putShort(0)
    bb.putInt(0).putInt(0) // reserved
    // unity matrix (9 × u32)
    Seq(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000).foreach(v => { bb.putInt(v); () })
    (0 until 6).foreach(_ => bb.putInt(0)) // pre_defined
    bb.putInt(nTracks + 1) // next_track_ID
    //   trak boxes, each a minimal tkhd v0
    (1 to nTracks).foreach { tid =>
      bb.putInt(100); fourcc("trak")
      bb.putInt(92); fourcc("tkhd"); bb.putInt(7) // v0, flags=enabled|in-movie|in-preview
      bb.putInt(0).putInt(0).putInt(tid).putInt(0).putInt(durationTicks.toInt)
      bb.putInt(0).putInt(0) // reserved
      bb.putShort(0).putShort(0).putShort(0).putShort(0) // layer/group/volume/reserved
      Seq(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000).foreach(v => { bb.putInt(v); () })
      bb.putInt(0).putInt(0) // width/height (16.16; no visual stream here)
    }
    // mdat: deterministic ramp payload
    bb.putInt(8 + dataLen); fourcc("mdat")
    var i = 0
    while (i < dataLen) { bb.put((i * 31 % 251).toByte); i += 1 }
    bb.array()
  }

  /** REAL MP4/ISO-BMFF container-header decode in pure JVM — the box walk
    * a probe tool performs: scan top-level boxes for `ftyp` (major brand)
    * and `moov`, inside `moov` read `mvhd` (version 0 AND 1 layouts:
    * timescale, duration in ticks) and count `trak` children. Exact
    * integers throughout; duration_us = ticks·10⁶ / timescale, one floor
    * division. Returns None when the payload is not a plausible BMFF
    * stream (no valid box structure or no `moov/mvhd`), so the decode
    * dispatch can fall through — video joins image/audio in the
    * REAL-decode domain and [[decodeStub]] now covers only genuinely
    * unknown bytes.
    */
  def decodeVideo(docId: Long, payload: Array[Byte]): Option[VideoMeta] = {
    val bb = java.nio.ByteBuffer.wrap(payload).order(java.nio.ByteOrder.BIG_ENDIAN)
    def u32(at: Int): Long = bb.getInt(at).toLong & 0xFFFFFFFFL
    def name(at: Int): String =
      new String(payload, at, 4, "US-ASCII")
    def plausibleType(s: String): Boolean = s.forall(c => c >= ' ' && c <= '~')
    if (payload.length < 16) return None
    var brand = "isom"
    var timescale = 0L
    var duration = -1L
    var tracks = 0
    var sawMoov = false
    var pos = 0
    while (pos + 8 <= payload.length) {
      val size = u32(pos)
      if (size < 8 || pos + size > payload.length) return None
      val typ = name(pos + 4)
      if (!plausibleType(typ)) return None
      typ match {
        case "ftyp" if size >= 16 => brand = name(pos + 8).trim
        case "moov" =>
          sawMoov = true
          var cp = pos + 8
          val end = pos + size.toInt
          while (cp + 8 <= end) {
            val csize = u32(cp)
            if (csize < 8 || cp + csize > end) return None
            name(cp + 4) match {
              case "mvhd" =>
                // size check BEFORE the version-byte read: a malformed
                // 8-byte mvhd ending at the buffer edge must yield None,
                // not an out-of-bounds read
                if (csize < 32) return None
                val version = payload(cp + 8) & 0xFF
                if (version == 0) {
                  timescale = u32(cp + 20); duration = u32(cp + 24)
                } else if (version == 1 && csize >= 44) {
                  timescale = u32(cp + 28); duration = bb.getLong(cp + 32)
                } else return None
              case "trak" => tracks += 1
              case _ => ()
            }
            cp += csize.toInt
          }
        case _ => ()
      }
      pos += size.toInt
    }
    // domain guards: a u32 timescale past Int.MaxValue would wrap the
    // typed field negative, and a v1 duration past ~9.2e12 ticks would
    // overflow the µs multiply — both are outside any real container's
    // range, treated as unrecognized rather than silently wrong
    if (!sawMoov || timescale <= 0 || timescale > Int.MaxValue ||
      duration < 0 || duration > Long.MaxValue / 1000000L) None
    else Some(VideoMeta(docId, decoded = true, payload.length,
      timescale.toInt, duration, duration * 1000000L / timescale,
      tracks, "video/" + brand.toLowerCase))
  }

  /** Decode dispatch: real image decode, then real audio-header decode
    * (folded into the [[MediaMeta]] shape: width/height 0, n_frames =
    * audio frames), then real video container-header decode (width/height
    * 0 — mvhd carries no pixel dims — and n_frames 1), stub only for
    * genuinely unknown bytes.
    */
  def decode(docId: Long, payload: Array[Byte]): MediaMeta =
    decodeImage(docId, payload)
      .orElse(decodeAudio(docId, payload).map(a => MediaMeta(
        doc_id = docId, n_bytes = a.n_bytes, width = 0, height = 0,
        n_frames = math.max(math.min(a.n_frames, Int.MaxValue.toLong).toInt, 1),
        format = a.format)))
      .orElse(decodeVideo(docId, payload).map(v => MediaMeta(
        doc_id = docId, n_bytes = v.n_bytes, width = 0, height = 0,
        n_frames = 1, format = v.format)))
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
