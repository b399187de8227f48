package graft.multimodal

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Real-decode tests for the multimodal family: `javax.imageio` parses
  * actual committed image fixtures (PNG + BMP, generated deterministically
  * — a 48x32 gradient test card); payloads no reader recognizes fall back
  * to the documented stub. The Spark-side plumbing (typed mapPartitions,
  * binary columns) is shared between both paths.
  */
class MediaSpec extends SparkTestBase {

  private def fixture(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/graft/$name")
    assert(in != null, s"missing test resource $name")
    try in.readAllBytes() finally in.close()
  }

  test("decodeImage parses the committed PNG and BMP fixtures (real pixels, real headers)") {
    val png = MediaStub.decodeImage(1L, fixture("testcard_48x32.png"))
    assert(png.isDefined)
    assert(png.get.width == 48 && png.get.height == 32)
    assert(png.get.format == "image/png")
    assert(png.get.n_frames == 1)

    val bmp = MediaStub.decodeImage(2L, fixture("testcard_48x32.bmp"))
    assert(bmp.isDefined)
    assert(bmp.get.width == 48 && bmp.get.height == 32)
    assert(bmp.get.format == "image/bmp")
  }

  test("decode dispatch: image bytes take the real path, synthetic bytes the stub") {
    val real = MediaStub.decode(1L, fixture("testcard_48x32.png"))
    assert(real.format == "image/png" && real.width == 48)

    val stub = MediaStub.decode(2L, "not an image at all".getBytes("UTF-8"))
    assert(stub.format.startsWith("fake/"))
    assert(stub.width == 32 + stub.n_bytes % 512)
  }

  test("decodeAudio parses the committed WAV fixture (real javax.sound header fields)") {
    // fixture pinned byte-for-byte: synthWav(8000, 1, 16, 1600) committed
    // at generation time — the md5 guards the artifact, the field asserts
    // guard the INDEPENDENT AudioSystem header parse of it
    val wav = fixture("tone_8k_mono.wav")
    val md = java.security.MessageDigest.getInstance("MD5")
    assert(md.digest(wav).map("%02x".format(_)).mkString ==
      "f46e665a4f062d6b15f6960d233c0d25", "fixture bytes changed")
    val a = MediaStub.decodeAudio(7L, wav)
    assert(a.isDefined, "AudioSystem must recognize the PCM WAV")
    val m = a.get
    assert(m.decoded && m.doc_id == 7L)
    assert(m.n_bytes == 3244, m.toString)          // 44 + 1600·2
    assert(m.channels == 1 && m.sample_rate == 8000)
    assert(m.bits_per_sample == 16 && m.n_frames == 1600L)
    assert(m.duration_us == 200000L, m.toString)   // 1600·10⁶/8000
    assert(m.format == "audio/wave", m.format)
    // non-audio bytes: no provider, None (stub domain)
    assert(MediaStub.decodeAudio(8L, "plain text".getBytes("UTF-8")).isEmpty)
    // stereo/other-rate synthesis round-trips through the real parser too
    val st = MediaStub.decodeAudio(9L, MediaStub.synthWav(44100, 2, 16, 441)).get
    assert(st.channels == 2 && st.sample_rate == 44100 && st.n_frames == 441L)
    assert(st.duration_us == 441L * 1000000L / 44100L)
  }

  test("decode dispatch: audio bytes take the real audio path, not the stub") {
    val m = MediaStub.decode(3L, fixture("tone_8k_mono.wav"))
    assert(m.format == "audio/wave", m.toString)
    assert(m.width == 0 && m.height == 0 && m.n_frames == 1600)
  }

  test("audioMeta: mixed corpus — WAV rows decode, unknown payloads fall back complete") {
    import spark.implicits._
    val payloads = Seq(
      (1L, fixture("tone_8k_mono.wav")),
      (2L, MediaStub.synthWav(16000, 2, 16, 320)),
      (3L, "not audio".getBytes("UTF-8"))).toDF("doc_id", "payload")
    val r = MediaOps.audioMeta(spark, payloads).collect().sortBy(_.doc_id)
    assert(r.length == 3, "fallback must keep column totals complete")
    assert(r(0).decoded && r(0).sample_rate == 8000 && r(0).n_frames == 1600L)
    assert(r(1).decoded && r(1).channels == 2 && r(1).duration_us == 20000L)
    assert(!r(2).decoded && r(2).format == "unknown" && r(2).n_bytes == 9)
  }

  test("decodeVideo parses the synthMp4 box layout (independent writer/parser cross-check)") {
    // the writer's bytes are pinned by md5 (the committed-fixture
    // discipline without the file): any layout change in synthMp4 must be
    // deliberate, and the INDEPENDENT box walk then re-derives every field
    val mp4 = MediaStub.synthMp4(timescale = 90000, durationTicks = 270000L,
      nTracks = 2, dataLen = 50)
    val md = java.security.MessageDigest.getInstance("MD5")
    assert(md.digest(mp4).map("%02x".format(_)).mkString ==
      "d95b4294a67e955dbcb89cb27bd83c54", "synthMp4 byte layout changed")
    assert(mp4.length == 144 + 100 * 2 + 50)
    val v = MediaStub.decodeVideo(7L, mp4)
    assert(v.isDefined, "box walk must recognize the BMFF stream")
    val m = v.get
    assert(m.decoded && m.doc_id == 7L)
    assert(m.n_bytes == mp4.length)
    assert(m.timescale == 90000 && m.duration_ticks == 270000L)
    assert(m.duration_us == 3000000L, m.toString) // 270000·10⁶/90000
    assert(m.n_tracks == 2 && m.format == "video/isom")
    // non-video bytes: no box structure, None (stub domain)
    assert(MediaStub.decodeVideo(8L, "plain text here".getBytes("UTF-8")).isEmpty)
    // truncated stream (size field past the buffer): None, never a crash
    assert(MediaStub.decodeVideo(9L, mp4.take(40)).isEmpty)
    // malformed 8-byte mvhd ending exactly at the buffer edge: the size
    // guard must fire BEFORE the version-byte read (None, not an
    // ArrayIndexOutOfBoundsException through the mapPartitions path)
    val tiny = java.nio.ByteBuffer.allocate(16)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    tiny.putInt(16).put("moov".getBytes("US-ASCII"))
    tiny.putInt(8).put("mvhd".getBytes("US-ASCII"))
    assert(MediaStub.decodeVideo(10L, tiny.array()).isEmpty)
  }

  test("decodeVideo reads the mvhd VERSION 1 layout (64-bit duration) the writer never emits") {
    // hand-built v1 mvhd inside a minimal moov — proves the parser covers
    // the layout domain beyond its own writer (the cross-check stays
    // independent in both directions)
    val bb = java.nio.ByteBuffer.allocate(8 + 120)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    bb.putInt(128).put("moov".getBytes("US-ASCII"))
    bb.putInt(120).put("mvhd".getBytes("US-ASCII"))
    bb.put(1.toByte).put(Array[Byte](0, 0, 0))   // version 1, flags
    bb.putLong(0L).putLong(0L)                   // creation/modification u64
    bb.putInt(600)                               // timescale
    bb.putLong(5000000001L)                      // duration u64 (past u32)
    while (bb.hasRemaining) bb.put(0.toByte)
    val v = MediaStub.decodeVideo(1L, bb.array())
    assert(v.isDefined, "v1 mvhd must parse")
    assert(v.get.timescale == 600 && v.get.duration_ticks == 5000000001L)
    assert(v.get.duration_us == 5000000001L * 1000000L / 600L)
    assert(v.get.n_tracks == 0 && v.get.format == "video/isom")
  }

  test("decode dispatch: MP4 bytes take the real video path, not the stub") {
    val m = MediaStub.decode(3L, MediaStub.synthMp4(600, 1200L, 1, 10))
    assert(m.format == "video/isom", m.toString)
    assert(m.width == 0 && m.height == 0 && m.n_frames == 1)
  }

  test("videoMeta: mixed corpus — MP4 rows decode, unknown payloads fall back complete") {
    import spark.implicits._
    val payloads = Seq(
      (1L, MediaStub.synthMp4(1000, 3000L, 1, 5)),
      (2L, MediaStub.synthMp4(30000, 90000L, 3, 0)),
      (3L, "not a video".getBytes("UTF-8"))).toDF("doc_id", "payload")
    val r = MediaOps.videoMeta(spark, payloads).collect().sortBy(_.doc_id)
    assert(r.length == 3, "fallback must keep column totals complete")
    assert(r(0).decoded && r(0).timescale == 1000 && r(0).duration_us == 3000000L)
    assert(r(1).decoded && r(1).n_tracks == 3 && r(1).duration_us == 3000000L)
    assert(!r(2).decoded && r(2).format == "unknown" && r(2).n_bytes == 11)
  }

  test("thumbnailPixels: real resize through the mapPartitions path; stub fallback fingerprints bytes") {
    import spark.implicits._
    val pngBytes = fixture("testcard_48x32.png")
    val textBytes = "synthetic corpus payload".getBytes("UTF-8")
    val payloads = Seq((1L, pngBytes), (2L, textBytes)).toDF("doc_id", "payload")

    val thumbs = MediaOps.thumbnailPixels(spark, payloads, box = 24)
      .collect().sortBy(_.doc_id)
    val real = thumbs(0)
    assert(real.decoded)
    assert(real.src_w == 48 && real.src_h == 32)
    // 48x32 into a 24-box: max dim 48 -> 24, 32*24/48 = 16 (integer floor)
    assert(real.new_w == 24 && real.new_h == 16)
    assert(real.thumb_bytes > 0 && real.thumb_md5.length == 32)

    val stub = thumbs(1)
    assert(!stub.decoded)
    assert(stub.src_w == 0 && stub.new_w == 0)
    val md = java.security.MessageDigest.getInstance("MD5")
    val expected = md.digest(textBytes.take(24)).map("%02x".format(_)).mkString
    assert(stub.thumb_md5 == expected)
    assert(stub.thumb_bytes == textBytes.length.min(24))

    // Determinism: a second run produces the identical PNG digest.
    val again = MediaOps.thumbnailPixels(spark, payloads, box = 24)
      .collect().sortBy(_.doc_id).head
    assert(again.thumb_md5 == real.thumb_md5)
  }

  test("animated GIF: decodeImage reads the real frame count; frameSampleDecoded samples it") {
    import spark.implicits._
    val gif = fixture("anim_16x16x3.gif")
    val meta = MediaStub.decodeImage(1L, gif)
    assert(meta.isDefined)
    assert(meta.get.format == "image/gif")
    assert(meta.get.width == 16 && meta.get.height == 16)
    assert(meta.get.n_frames == 3)

    val payloads = Seq((1L, gif)).toDF("doc_id", "payload")
    val r = MediaOps.frameSampleDecoded(spark, payloads, stride = 2).collect()(0)
    // frames 0,1,2 with stride 2 -> sampled {0, 2}
    assert(r.getLong(1) == 2 && r.getInt(2) == 2, r.toString)
  }

  test("no-upscale contract: images already inside the box keep their dimensions") {
    import spark.implicits._
    val payloads = Seq((1L, fixture("testcard_48x32.png"))).toDF("doc_id", "payload")
    val t = MediaOps.thumbnailPixels(spark, payloads, box = 128).collect()(0)
    assert(t.new_w == 48 && t.new_h == 32)
  }

  test("decodeAll over a synthetic corpus still takes the stub path (gate rows unchanged)") {
    val metas = MediaStub.decodeAll(spark,
      graft.operators.Tables.t(spark, sfDir, "documents").filter(col("doc_id") < 10))
      .collect()
    assert(metas.length == 10)
    assert(metas.forall(_.format.startsWith("fake/")))
  }

  /** Deterministic in-test PNG: pixels from a pure function, encoded by
    * the same JDK ImageIO the decode path uses.
    */
  private def pngBytes(w: Int, h: Int)(f: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, f(x, y))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def checkerboard: Array[Byte] =
    pngBytes(32, 32)((x, y) =>
      if (((x / 4) + (y / 4)) % 2 == 0) 0xffffff else 0x000000)

  test("perceptualHash: PNG and BMP of the same pixels hash identically; dHash is real, fallback is MD5") {
    import spark.implicits._
    val payloads = Seq(
      (1L, fixture("testcard_48x32.png")),
      (2L, fixture("testcard_48x32.bmp")),
      (3L, checkerboard),
      (4L, "not an image".getBytes("UTF-8")),
      (5L, "not an image".getBytes("UTF-8"))).toDF("doc_id", "payload")
    val ph = MediaOps.perceptualHash(spark, payloads).collect().sortBy(_.doc_id)
    // same pixels through different containers -> the same 64-bit dHash
    assert(ph(0).decoded && ph(1).decoded && ph(0).phash == ph(1).phash, ph.mkString(","))
    // the test card is a left-to-right luminance gradient: every cell is
    // darker than its right neighbor, so its dHash is all-ones BY
    // CONSTRUCTION — a strong pin of the bit orientation
    assert(ph(0).phash == "ffffffffffffffff", ph(0).toString)
    // the checkerboard alternates: a genuinely different, non-flat hash
    assert(ph(2).decoded && ph(2).phash != ph(0).phash &&
      ph(2).phash != "0000000000000000", ph(2).toString)
    // undecodable payloads: MD5 pseudo-hash, equal bytes collide
    assert(!ph(3).decoded && ph(3).phash == ph(4).phash)
    assert(ph(3).phash.length == 16 && ph(3).phash.matches("[0-9a-f]{16}"))
  }

  test("phashPairs: bit-level Hamming via the pigeonhole bit-string join, exact distances") {
    import spark.implicits._
    // hand-built hexes: b differs from a in exactly bits 0 and 63;
    // c is a at distance 1 (bit 4); d is far from everything
    val hashes = Seq(
      (1L, "8000000000000001"), (2L, "0000000000000000"),
      (3L, "8000000000000011"), (4L, "ffffffff00000000"))
      .toDF("doc_id", "phash")
    val r = MediaOps.phashPairs(hashes, k = 2).orderBy("doc_a", "doc_b")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    assert(r.toSeq == Seq((1L, 2L, 2L), (1L, 3L, 1L)), r.toSeq.toString)
    // the real-image path: png+bmp twins pair at distance 0; the
    // checkerboard pairs with neither
    val payloads = Seq(
      (10L, fixture("testcard_48x32.png")),
      (11L, fixture("testcard_48x32.bmp")),
      (12L, checkerboard)).toDF("doc_id", "payload")
    val imgPairs = MediaOps.phashPairs(
      MediaOps.perceptualHash(spark, payloads).toDF(), k = 0).collect()
    assert(imgPairs.length == 1 &&
      imgPairs(0).getLong(0) == 10L && imgPairs(0).getLong(1) == 11L &&
      imgPairs(0).getLong(2) == 0L, imgPairs.mkString(","))
  }

  test("audioStats: synthWav PCM round trip recovers the closed-form sample sums; garbage falls back") {
    import spark.implicits._
    val frames = 7
    // independent closed form over the (i*31 % 251) data bytes
    var expected = 0L
    for (f <- 0 until frames) {
      val raw = ((2 * f * 31) % 251) + 256 * (((2 * f + 1) * 31) % 251)
      expected += math.abs(if (raw >= 32768) raw - 65536 else raw).toLong
    }
    val payloads = Seq(
      (1L, MediaStub.synthWav(8000, 1, 16, frames)),
      (2L, Array[Byte](9, 9, 9))).toDF("doc_id", "payload")
    val out = MediaOps.audioStats(spark, payloads).collect()
      .map(r => r.doc_id -> r).toMap
    val a = out(1L)
    assert(a.decoded && a.channels == 1 && a.n_samples == frames.toLong)
    assert(a.sum_abs == expected, s"${a.sum_abs} != $expected")
    assert(a.mean_abs == expected.toDouble / frames.toDouble)
    assert(!out(2L).decoded && out(2L).sum_abs == 0L)
  }

  test("imageStats: synthPng round trip recovers the closed-form gradient sums; garbage falls back") {
    import spark.implicits._
    val (id, w, h) = (9L, 4, 3)
    // closed-form expectation over the gradient
    var (sr, sg, sb) = (0L, 0L, 0L)
    for (y <- 0 until h; x <- 0 until w) {
      sr += (7L * x + 3L * y + id) % 256
      sg += (5L * x + 11L * y + 2L * id) % 256
      sb += (13L * x + y + 5L * id) % 256
    }
    val payloads = Seq((id, MediaStub.synthPng(id, w, h)),
      (99L, Array[Byte](1, 2, 3))).toDF("doc_id", "payload")
    val out = MediaOps.imageStats(spark, payloads).collect()
      .map(r => r.doc_id -> r).toMap
    val a = out(id)
    assert(a.decoded && a.width == w && a.height == h && a.n_pixels == 12L)
    assert(a.sum_r == sr && a.sum_g == sg && a.sum_b == sb, a.toString)
    assert(a.mean_r == sr.toDouble / 12.0 && a.mean_b == sb.toDouble / 12.0)
    val bad = out(99L)
    assert(!bad.decoded && bad.n_pixels == 0L && bad.mean_r == 0.0)
  }
}
