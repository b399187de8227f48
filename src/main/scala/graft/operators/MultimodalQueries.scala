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
        .orderBy("doc_id")),

    // REAL audio-header decode as a value-oracled gate: per doc, a PCM
    // WAV payload is synthesized by the hand-rolled RIFF writer
    // (rate/channels/frames derived arithmetically from doc_id and the
    // text length), then parsed back through the INDEPENDENT
    // javax.sound.sampled header decoder — the oracle recomputes every
    // field from the same arithmetic, so a bug in either the writer's
    // or the parser's header layout fails the hash. All exact integers.
    // REAL pixel decode as a value-oracled gate: per doc, a lossless
    // PNG with a deterministic per-pixel gradient is synthesized
    // (BufferedImage + imageio), decoded back through the independent
    // ImageIO read path, and the channel sums must equal the closed-form
    // arithmetic the oracle recomputes over (x, y, doc_id) — a wrong
    // pixel anywhere fails the hash. Means are single exact divisions.
    "mm_image_stats" -> ((s, d) => {
      import s.implicits._
      t(s, d, "documents").filter(col("doc_id") < 100)
        .select(col("doc_id")).as[Long]
        .mapPartitions(_.map { id =>
          (id, MediaStub.synthPng(id,
            w = 4 + (id % 5).toInt, h = 3 + (id % 4).toInt))
        })
        .toDF("doc_id", "payload")
        .transform(df => MediaOps.imageStats(s, df).toDF())
        .orderBy("doc_id")
    }),

    // REAL PCM decode as a value-oracled gate (the mm_image_stats
    // pattern for audio): mono 16-bit synth WAVs whose data bytes are
    // the deterministic (i*31 mod 251) pattern; the oracle recomputes
    // the |sample| sum in closed form over byte indices — only a
    // correct header-parse -> PCM round trip matches.
    "mm_audio_stats" -> ((s, d) => {
      import s.implicits._
      t(s, d, "documents").filter(col("doc_id") < 100)
        .select(col("doc_id")).as[Long]
        .mapPartitions(_.map { id =>
          (id, MediaStub.synthWav(sampleRate = 8000, channels = 1,
            bitsPerSample = 16, nFrames = 40 + (id % 20).toInt))
        })
        .toDF("doc_id", "payload")
        .transform(df => MediaOps.audioStats(s, df).toDF())
        .orderBy("doc_id")
    }),

    // ZCR + peak over the same synth-PCM payloads as mm_audio_stats:
    // the oracle recomputes sign changes and the max |sample| in closed
    // form over the (i*31 mod 251) byte pattern — only a correct
    // header-parse -> PCM -> lag walk matches.
    "mm_audio_zcr" -> ((s, d) => {
      import s.implicits._
      t(s, d, "documents").filter(col("doc_id") < 100)
        .select(col("doc_id")).as[Long]
        .mapPartitions(_.map { id =>
          (id, MediaStub.synthWav(sampleRate = 8000, channels = 1,
            bitsPerSample = 16, nFrames = 40 + (id % 20).toInt))
        })
        .toDF("doc_id", "payload")
        .transform(df => MediaOps.audioZcr(s, df).toDF())
        .orderBy("doc_id")
    }),

    "mm_audio_meta" -> ((s, d) => {
      import s.implicits._
      t(s, d, "documents").filter(col("doc_id") < 100)
        .select(col("doc_id"), octet_length(col("text")).as("nb"))
        .as[(Long, Int)]
        .mapPartitions(_.map { case (id, nb) =>
          val wav = MediaStub.synthWav(
            sampleRate = 8000 + (id % 8).toInt * 1000,
            channels = 1 + (id % 2).toInt,
            bitsPerSample = 16,
            nFrames = 100 + nb)
          (id, wav)
        })
        .toDF("doc_id", "payload")
        .transform(df => MediaOps.audioMeta(s, df).toDF())
        .select("doc_id", "decoded", "n_bytes", "channels", "sample_rate",
          "bits_per_sample", "n_frames", "duration_us", "format")
        .orderBy("doc_id")
    }),

    // REAL MP4 container decode as a value-oracled gate — the r10 audio
    // pattern applied to the last synthetic-bytes domain: per doc, an
    // ISO BMFF payload is synthesized by the hand-rolled box writer
    // (timescale/duration/tracks derived arithmetically from doc_id and
    // the text length), then parsed back through the INDEPENDENT pure-JVM
    // box walk — the oracle recomputes every field from the same
    // arithmetic, so a bug in either the writer's or the parser's box
    // layout fails the hash. All exact integers.
    "mm_video_meta" -> ((s, d) => {
      import s.implicits._
      t(s, d, "documents").filter(col("doc_id") < 100)
        .select(col("doc_id"), octet_length(col("text")).as("nb"))
        .as[(Long, Int)]
        .mapPartitions(_.map { case (id, nb) =>
          val mp4 = MediaStub.synthMp4(
            timescale = 1000 + (id % 7).toInt * 500,
            durationTicks = (100L + nb) * 30L,
            nTracks = 1 + (id % 3).toInt,
            dataLen = nb)
          (id, mp4)
        })
        .toDF("doc_id", "payload")
        .transform(df => MediaOps.videoMeta(s, df).toDF())
        .select("doc_id", "decoded", "n_bytes", "timescale",
          "duration_ticks", "duration_us", "n_tracks", "format")
        .orderBy("doc_id")
    }),

    // Perceptual hash: the synthetic gate payloads never decode, so every
    // row takes the documented MD5 pseudo-hash fallback the oracle can
    // mirror; the REAL dHash pixel path is fixture-pinned in MediaOpsSpec.
    "mm_phash" -> ((s, d) =>
      MediaOps.perceptualHash(s,
          MediaStub.withPayload(t(s, d, "documents").filter(col("doc_id") < 100)))
        .toDF().orderBy("doc_id")),

    // Image near-dup pairs: every 5th payload re-appended under a shifted
    // id (the dd_exact injection pattern — identical bytes, identical
    // hash, Hamming 0); the oracle is the BRUTE bit-Hamming join, so any
    // accidental near-collision would also have to appear.
    "mm_phash_pairs" -> ((s, d) => {
      val docs = t(s, d, "documents").filter(col("doc_id") < 100)
      val withDups = docs.unionByName(
        docs.filter(col("doc_id") % 5 === 0)
          .withColumn("doc_id", col("doc_id") + 1000))
      MediaOps.phashPairs(
          MediaOps.perceptualHash(s, MediaStub.withPayload(withDups)).toDF(),
          k = 3)
        .orderBy("doc_a", "doc_b")
    }),

    // Image near-dup CLUSTERING end-to-end: dHash pairs -> the SAME
    // star-contraction CC engine the text dedup uses — the visual
    // counterpart of dd_clusters_star (one dedup graph machinery, any
    // pair detector).
    "mm_phash_clusters" -> ((s, d) => {
      val docs = t(s, d, "documents").filter(col("doc_id") < 100)
      val withDups = docs.unionByName(
        docs.filter(col("doc_id") % 5 === 0)
          .withColumn("doc_id", col("doc_id") + 1000))
      DedupOps.nearDupClustersStar(
          MediaOps.phashPairs(
            MediaOps.perceptualHash(s, MediaStub.withPayload(withDups)).toDF(),
            k = 3))
        .orderBy("doc_id")
    }))

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
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // header arithmetic mirror of synthWav: blockAlign = ch·2 (16-bit),
    // n_bytes = 44 + frames·blockAlign, duration = frames·10⁶ // rate
    // pixel decode: the oracle recomputes the gradient sums in closed
    // form over (x, y, doc_id) — never touches PNG bytes, so only a
    // CORRECT write→decode round trip can match
    "mm_image_stats" ->
      """WITH d AS (SELECT doc_id AS id,
        |    CAST(4 + doc_id % 5 AS BIGINT) AS w,
        |    CAST(3 + doc_id % 4 AS BIGINT) AS h
        |  FROM documents WHERE doc_id < 100),
        |px AS (SELECT d.id, d.w, d.h, gx.x, gy.y
        |  FROM d, unnest(generate_series(0, d.w - 1)) AS gx(x),
        |       unnest(generate_series(0, d.h - 1)) AS gy(y)),
        |s AS (SELECT id, w, h,
        |    CAST(SUM((7*x + 3*y + id) % 256) AS BIGINT) AS sr,
        |    CAST(SUM((5*x + 11*y + 2*id) % 256) AS BIGINT) AS sg,
        |    CAST(SUM((13*x + y + 5*id) % 256) AS BIGINT) AS sb
        |  FROM px GROUP BY id, w, h)
        |SELECT id AS doc_id, TRUE AS decoded, w AS width, h AS height,
        |  w * h AS n_pixels, sr AS sum_r, sg AS sum_g, sb AS sum_b,
        |  CAST(sr AS DOUBLE) / CAST(w * h AS DOUBLE) AS mean_r,
        |  CAST(sg AS DOUBLE) / CAST(w * h AS DOUBLE) AS mean_g,
        |  CAST(sb AS DOUBLE) / CAST(w * h AS DOUBLE) AS mean_b
        |FROM s ORDER BY doc_id""".stripMargin,

    // PCM stats: closed-form (i*31 mod 251) bytes -> signed 16-bit LE
    // samples -> exact |sample| sums; mean one division
    "mm_audio_stats" ->
      """WITH d AS (SELECT doc_id AS id,
        |    CAST(40 + doc_id % 20 AS BIGINT) AS frames
        |  FROM documents WHERE doc_id < 100),
        |fr AS (SELECT id, frames, f.f
        |  FROM d, unnest(generate_series(0, d.frames - 1)) AS f(f)),
        |s AS (SELECT id, frames,
        |    ((2*f*31) % 251) + 256*(((2*f+1)*31) % 251) AS raw FROM fr),
        |v AS (SELECT id, frames,
        |    CASE WHEN raw >= 32768 THEN raw - 65536 ELSE raw END AS sv
        |  FROM s),
        |a AS (SELECT id, frames, CAST(SUM(abs(sv)) AS BIGINT) AS sum_abs
        |  FROM v GROUP BY id, frames)
        |SELECT id AS doc_id, TRUE AS decoded, CAST(1 AS BIGINT) AS channels,
        |  frames AS n_samples, sum_abs,
        |  CAST(sum_abs AS DOUBLE) / CAST(frames AS DOUBLE) AS mean_abs
        |FROM a ORDER BY doc_id""".stripMargin,

    // ZCR: the mm_audio_stats closed-form samples + a LAG sign-change
    // count; zcr one division, max_abs exact
    "mm_audio_zcr" ->
      """WITH d AS (SELECT doc_id AS id, CAST(40 + doc_id % 20 AS BIGINT) AS frames
         |  FROM documents WHERE doc_id < 100),
         |fr AS (SELECT id, frames, f.f
         |  FROM d, unnest(generate_series(0, d.frames - 1)) AS f(f)),
         |v AS (SELECT id, frames, f,
         |    CASE WHEN ((2*f*31) % 251) + 256*(((2*f+1)*31) % 251) >= 32768
         |      THEN ((2*f*31) % 251) + 256*(((2*f+1)*31) % 251) - 65536
         |      ELSE ((2*f*31) % 251) + 256*(((2*f+1)*31) % 251) END AS sv
         |  FROM fr),
         |l AS (SELECT id, frames, sv,
         |    LAG(sv) OVER (PARTITION BY id ORDER BY f) AS pv FROM v),
         |a AS (SELECT id, frames,
         |    CAST(SUM(CASE WHEN pv IS NOT NULL AND ((sv >= 0) <> (pv >= 0))
         |      THEN 1 ELSE 0 END) AS BIGINT) AS cr,
         |    CAST(MAX(abs(sv)) AS BIGINT) AS mx
         |  FROM l GROUP BY id, frames)
         |SELECT id AS doc_id, TRUE AS decoded, frames AS n_samples, cr AS n_crossings,
         |  CASE WHEN frames > 1 THEN CAST(cr AS DOUBLE) / CAST(frames - 1 AS DOUBLE)
         |    ELSE 0.0 END AS zcr,
         |  mx AS max_abs
         |FROM a ORDER BY doc_id""".stripMargin,

    "mm_audio_meta" ->
      s"""WITH p AS (SELECT doc_id,
         |    CAST(8000 + (doc_id % 8) * 1000 AS INTEGER) AS rate,
         |    CAST(1 + doc_id % 2 AS INTEGER) AS ch,
         |    CAST(100 + $sqlNBytes AS BIGINT) AS frames
         |  FROM documents WHERE doc_id < 100)
         |SELECT doc_id, TRUE AS decoded,
         |  CAST(44 + frames * ch * 2 AS INTEGER) AS n_bytes,
         |  ch AS channels, rate AS sample_rate,
         |  CAST(16 AS INTEGER) AS bits_per_sample,
         |  frames AS n_frames,
         |  CAST(frames * 1000000 // rate AS BIGINT) AS duration_us,
         |  'audio/wave' AS format
         |FROM p ORDER BY doc_id""".stripMargin,
    // box-layout arithmetic mirror of synthMp4: n_bytes = 20 (ftyp) +
    // 8 + 108 (moov hdr + mvhd) + 100·tracks (trak/tkhd) + 8 + nb (mdat);
    // duration_us = ticks·10⁶ // timescale
    "mm_video_meta" ->
      s"""WITH p AS (SELECT doc_id,
         |    CAST(1000 + (doc_id % 7) * 500 AS INTEGER) AS ts,
         |    CAST((100 + $sqlNBytes) * 30 AS BIGINT) AS dur,
         |    CAST(1 + doc_id % 3 AS INTEGER) AS tracks,
         |    CAST($sqlNBytes AS INTEGER) AS nb
         |  FROM documents WHERE doc_id < 100)
         |SELECT doc_id, TRUE AS decoded,
         |  CAST(144 + 100 * tracks + nb AS INTEGER) AS n_bytes,
         |  ts AS timescale, dur AS duration_ticks,
         |  CAST(dur * 1000000 // ts AS BIGINT) AS duration_us,
         |  tracks AS n_tracks, 'video/isom' AS format
         |FROM p ORDER BY doc_id""".stripMargin,
    "mm_phash" ->
      """SELECT doc_id, FALSE AS decoded, substr(md5(text), 1, 16) AS phash
        |FROM documents WHERE doc_id < 100 ORDER BY doc_id""".stripMargin,
    "mm_phash_pairs" ->
      """WITH src AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id < 100
        |  UNION ALL
        |  SELECT doc_id + 1000, text FROM documents
        |  WHERE doc_id < 100 AND doc_id % 5 = 0),
        |h AS (SELECT doc_id, substr(md5(text), 1, 16) AS ph FROM src),
        |p AS (SELECT doc_id,
        |    ('0x' || substr(ph, 1, 8))::BIGINT AS hi,
        |    ('0x' || substr(ph, 9, 8))::BIGINT AS lo FROM h)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo))
        |    AS BIGINT) AS dist
        |FROM p a JOIN p b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) <= 3
        |ORDER BY doc_a, doc_b""".stripMargin,
    // recursive min-label closure over the same pair construction — the
    // dd_clusters oracle applied to the visual edge detector
    "mm_phash_clusters" ->
      """WITH RECURSIVE src AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id < 100
        |  UNION ALL
        |  SELECT doc_id + 1000, text FROM documents
        |  WHERE doc_id < 100 AND doc_id % 5 = 0),
        |h AS (SELECT doc_id, substr(md5(text), 1, 16) AS ph FROM src),
        |p AS (SELECT doc_id,
        |    ('0x' || substr(ph, 1, 8))::BIGINT AS hi,
        |    ('0x' || substr(ph, 9, 8))::BIGINT AS lo FROM h),
        |mp AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM p a JOIN p b ON a.doc_id < b.doc_id
        |  WHERE bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) <= 3),
        |edges AS (SELECT doc_a AS src, doc_b AS dst FROM mp
        |          UNION ALL SELECT doc_b, doc_a FROM mp),
        |reach(id, r) AS (
        |  SELECT src, src FROM edges
        |  UNION
        |  SELECT e.src, r.r FROM edges e JOIN reach r ON e.dst = r.id)
        |SELECT id AS doc_id, MIN(r) AS cluster_id FROM reach
        |GROUP BY id ORDER BY doc_id""".stripMargin)
}
