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
}
