package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Proves the StreamOps transforms are genuinely streaming-capable: the same
  * function that powers the oracle-checked batch ev_* queries runs under
  * readStream/writeStream, and custom state survives micro-batch boundaries.
  */
class StreamingSpec extends SparkTestBase {
  import StreamOps._

  test("tumblingCounts: streaming result equals batch result on same input") {
    val batchDf = graft.operators.Tables.t(spark, sfDir, "events")
    val expected = tumblingCounts(batchDf)
      .orderBy("window_start_us", "event_type").collect().toSeq

    val schema = batchDf.schema
    // Dedicated dir with only the events file so the file source reads one table.
    val tmp = java.nio.file.Files.createTempDirectory("graft-stream")
    // write the NORMALIZED events (ts as int64 nanos — Tables.t contract) so
    // the file-source schema below matches the files it reads
    batchDf.coalesce(1).write.mode("append").parquet(tmp.toString)
    val sdf = spark.readStream.schema(schema).parquet(tmp.toString)
    assert(sdf.isStreaming)
    val q = tumblingCounts(sdf)
      .writeStream.format("memory").queryName("tumbling_out")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val got = spark.table("tumbling_out")
        .orderBy("window_start_us", "event_type").collect().toSeq
      assert(got == expected)
    } finally q.stop()
  }

  test("dqViolationsStream: windowed constraint verdicts equal batch; watermark append works") {
    import graft.operators.AuditOps.Check._
    val checks = Seq(
      NotNull("events", "value"),
      InRange("events", "value", "0", "500"),
      AcceptedValues("events", "event_type", Seq("click", "view", "purchase")))
    val batchDf = graft.operators.Tables.t(spark, sfDir, "events")
    val expected = dqViolationsStream(batchDf, checks)
      .orderBy("window_start_us", "check_id").collect().toSeq
    // the suite must be able to say something other than "pass"
    assert(expected.exists(_.getLong(2) > 0), "test checks never fire — assert nothing")
    assert(expected.map(_.getString(1)).distinct.size == 3)

    val tmp = java.nio.file.Files.createTempDirectory("graft-stream-dq")
    batchDf.coalesce(1).write.mode("append").parquet(tmp.toString)
    val sdf = spark.readStream.schema(batchDf.schema).parquet(tmp.toString)
    val q = dqViolationsStream(sdf, checks)
      .writeStream.format("memory").queryName("dq_out")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val got = spark.table("dq_out")
        .orderBy("window_start_us", "check_id").collect().toSeq
      assert(got == expected)
    } finally q.stop()

    // watermarked variant: append mode is accepted (state evictable) and
    // every emitted closed-window row matches the batch verdict exactly
    val q2 = dqViolationsStreamWm(spark.readStream.schema(batchDf.schema)
        .parquet(tmp.toString), checks)
      .writeStream.format("memory").queryName("dq_append")
      .outputMode("append").start()
    try {
      q2.processAllAvailable()
      val got = spark.table("dq_append").collect().toSeq
      val exp = expected.map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
      assert(got.nonEmpty)
      assert(got.forall(r => exp.contains((r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))))
    } finally q2.stop()
  }

  test("cmsCountersStream: incremental sketch build equals the batch counters") {
    val batchDf = graft.operators.Tables.t(spark, sfDir, "events")
    val expected = cmsCountersStream(batchDf, d = 4, w = 256)
      .orderBy("r", "bucket").collect().toSeq
    val tmp = java.nio.file.Files.createTempDirectory("graft-stream-cms")
    // write the NORMALIZED events (ts as int64 nanos — Tables.t contract) so
    // the file-source schema below matches the files it reads
    batchDf.coalesce(1).write.mode("append").parquet(tmp.toString)
    val sdf = spark.readStream.schema(batchDf.schema).parquet(tmp.toString)
    assert(sdf.isStreaming)
    val q = cmsCountersStream(sdf, d = 4, w = 256)
      .writeStream.format("memory").queryName("cms_out")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val got = spark.table("cms_out").orderBy("r", "bucket").collect().toSeq
      assert(got == expected)
      // sketch state is bounded by construction: at most d*w counter rows
      assert(got.length <= 4 * 256)
    } finally q.stop()
  }

  test("checkpoint recovery: restart resumes mid-stream state, final counts exactly-once vs batch twin") {
    // The engine's fault-tolerance story: stop a windowed aggregation
    // between micro-batches, append more source files, restart from the
    // SAME checkpoint, and the fault-tolerant (manifest-tracked) file sink
    // must hold each window's count EXACTLY ONCE, equal to the batch twin
    // over the full input. The split is BY TIME (a round-robin split would
    // make every half2 row late past the watermark — correctly dropped,
    // but then nothing tests recovery), with the boundary cutting through
    // a >=2-event window: that window's correct count REQUIRES the state
    // carried across the restart, and all windows within 30 min of the
    // boundary flush only after the restarted query advances the
    // watermark. A restart that lost state would undercount the boundary
    // window; a replayed batch would duplicate sink rows.
    val events = graft.operators.Tables.t(spark, sfDir, "events")
    val schema = events.schema
    val winUs = 15L * 60 * 1000000
    val ws = tumblingCounts(events).filter(col("n_events") >= 2)
      .orderBy("window_start_us").limit(1).collect()(0).getLong(0)
    // split strictly between the window's first two events (ts is raw nanos)
    val splitTs = events
      .filter(expr("ts div 1000") >= ws && expr("ts div 1000") < ws + winUs)
      .orderBy("ts").limit(2).collect()(1).getAs[Long]("ts")
    val half1 = events.filter(col("ts") < splitTs)
    val half2 = events.filter(col("ts") >= splitTs)
    assert(half1.filter(expr("ts div 1000") >= ws).count() >= 1 &&
      half2.filter(expr("ts div 1000") < ws + winUs).count() >= 1,
      "boundary window must straddle the split")
    // sentinel 2 days past max ts: advances the 30-min watermark past every
    // real window so append mode flushes them all (its own window stays open)
    val sentinel = events.orderBy(col("ts").desc).limit(1)
      .select((col("ts") + lit(2L * 86400 * 1000000000L)).as("ts"))
      .crossJoin(events.limit(1).drop("ts"))
      .select(schema.fieldNames.map(col): _*)

    val src = java.nio.file.Files.createTempDirectory("graft-ckpt-src")
    val out = java.nio.file.Files.createTempDirectory("graft-ckpt-out")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ckpt-state")
    def startQuery() = tumblingCountsStream(
        spark.readStream.schema(schema).parquet(src.toString))
      .writeStream.format("parquet")
      .option("path", out.toString)
      .option("checkpointLocation", ckpt.toString)
      .outputMode("append").start()

    half1.coalesce(1).write.mode("append").parquet(src.toString)
    val q1 = startQuery()
    q1.processAllAvailable()
    q1.stop() // stop between micro-batches — state lives in the checkpoint
    // the boundary window (and everything within the 30-min watermark lag)
    // must still be OPEN in checkpointed state, not yet in the sink
    val flushedAtStop = spark.read.parquet(out.toString).collect()
    assert(!flushedAtStop.exists(_.getLong(0) == ws),
      "boundary window flushed before the restart — nothing tests recovery")
    half2.coalesce(1).write.mode("append").parquet(src.toString)
    sentinel.coalesce(1).write.mode("append").parquet(src.toString)
    val q2 = startQuery() // restart from the checkpoint, NOT from scratch
    try q2.processAllAvailable() finally q2.stop()

    val got = spark.read.parquet(out.toString)
      .filter(col("window_start_us") < unix_micros(lit("2024-03-01").cast("timestamp")))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    val want = tumblingCounts(events)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    // exactly-once: no duplicated (window, event_type) from a replayed batch
    assert(got.map(t => (t._1, t._2)).distinct.length == got.length,
      "duplicate sink rows — a micro-batch was replayed non-idempotently")
    assert(got.toSet == want.toSet,
      s"recovered counts diverge from batch twin: got=${got.length} want=${want.length}")
    // the restart itself did real work: rows flushed after recovery, and the
    // boundary window's count combines pre- and post-restart events
    assert(flushedAtStop.length < got.length,
      "all rows flushed before the restart — recovery path untested")
    assert(got.filter(_._1 == ws).map(_._3).sum ==
      want.filter(_._1 == ws).map(_._3).sum && got.exists(_._1 == ws),
      "boundary window count not recovered across restart")
  }

  test("tumblingCountsStream: watermark reaches the aggregation (append mode works)") {
    // Regression: the watermark used to be attached to a column the window
    // didn't group on, which made append mode throw
    // STREAMING_OUTPUT_MODE.UNSUPPORTED_OPERATION and left state unbounded.
    val batchDf = graft.operators.Tables.t(spark, sfDir, "events")
    val tmp = java.nio.file.Files.createTempDirectory("graft-stream-wm")
    // write the NORMALIZED events (ts as int64 nanos — Tables.t contract) so
    // the file-source schema below matches the files it reads
    batchDf.coalesce(1).write.mode("append").parquet(tmp.toString)
    val sdf = spark.readStream.schema(batchDf.schema).parquet(tmp.toString)
    val q = tumblingCountsStream(sdf)
      .writeStream.format("memory").queryName("tumbling_append")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // append emits only watermark-closed windows; with one finite batch the
      // final window stays open, so expect strictly fewer rows than batch —
      // but the windows that DID close must match the batch result exactly.
      val got = spark.table("tumbling_append")
      val batch = tumblingCounts(batchDf)
      val joined = got.as("g").join(batch.as("b"),
        got("window_start_us") === batch("window_start_us") &&
          got("event_type") === batch("event_type"))
      assert(got.count() > 0)
      assert(joined.count() == got.count(), "append rows must match batch rows")
    } finally q.stop()
  }

  test("slidingCountsStream: overlapping windows close under the watermark") {
    val batchDf = graft.operators.Tables.t(spark, sfDir, "events")
    val tmp = java.nio.file.Files.createTempDirectory("graft-stream-slide")
    // write the NORMALIZED events (ts as int64 nanos — Tables.t contract) so
    // the file-source schema below matches the files it reads
    batchDf.coalesce(1).write.mode("append").parquet(tmp.toString)
    val sdf = spark.readStream.schema(batchDf.schema).parquet(tmp.toString)
    val q = slidingCountsStream(sdf)
      .writeStream.format("memory").queryName("sliding_append")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("sliding_append")
      val batch = slidingCounts(batchDf)
      val joined = got.as("g").join(batch.as("b"),
        got("window_start_us") === batch("window_start_us") &&
          got("event_type") === batch("event_type"))
      assert(got.count() > 0)
      assert(joined.count() == got.count(), "append rows must match batch rows")
    } finally q.stop()
  }

  test("anomalyStream: stateful verdicts equal batch sequential verdicts across a split") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ev = graft.operators.Tables.t(spark, sfDir, "events")
    val want = graft.operators.AuditOps
      .anomalyVerdicts(ev, "event_type", "ts", "event_id", "value", 3, 30)
      .filter(col("is_anomaly")).select("grp", "id")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(want.nonEmpty, "batch detector found nothing — spec asserts nothing")

    val rows = ev.filter(col("value").isNotNull)
      .select(col("event_type"), col("ts"), col("event_id"),
        floor(col("value")).cast("long"))
      .as[(String, Long, Long, Long)].collect()
      .map(t => StreamOps.AnomRow(t._1, t._2, t._3, t._4))
      .sortBy(r => (r.ord, r.id))
    // contiguous split of the globally time-ordered feed: per-group order
    // holds across the two micro-batches, and running state must carry the
    // first half's moments into the second
    val (h1, h2) = rows.splitAt(rows.length / 2)
    val input = MemoryStream[StreamOps.AnomRow]
    val q = StreamOps.anomalyStream(input.toDS(), 3, 30).toDF("grp", "id", "x")
      .writeStream.format("memory").queryName("anom_out")
      .outputMode("append").start()
    try {
      input.addData(h1.toIndexedSeq: _*)
      q.processAllAvailable()
      input.addData(h2.toIndexedSeq: _*)
      q.processAllAvailable()
      val got = spark.table("anom_out").select("grp", "id")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(got == want, s"stream=${got.size} batch=${want.size}")
    } finally q.stop()
  }

  test("cusumStream: alarm sequence identical across a mid-series split; hand fold") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // hand series (the batch cusumReport spec's shape, fixed mu=5):
    // x = 0,0,0,0,10,10,10,10; k=2, h=8 -> down alarms at rows 3,4
    // (tn 9,12), up alarms at rows 7,8 (tp 9,12)
    val rows = (1 to 8).map(i =>
      StreamOps.AnomRow("g", i.toLong, i.toLong, if (i <= 4) 0L else 10L))
    def run(batches: Seq[Seq[StreamOps.AnomRow]], name: String) = {
      val input = MemoryStream[StreamOps.AnomRow]
      val q = StreamOps.cusumStream(input.toDS(), mu = 5L, k = 2L, h = 8L)
        .toDF("grp", "id", "x", "tp", "tn")
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        batches.foreach { b => input.addData(b.toIndexedSeq: _*); q.processAllAvailable() }
        spark.table(name).collect()
          .map(r => (r.getLong(1), r.getLong(3), r.getLong(4))).toSet
      } finally q.stop()
    }
    val single = run(Seq(rows), "cusum_one")
    assert(single == Set((3L, 0L, 9L), (4L, 0L, 12L), (7L, 9L, 0L), (8L, 12L, 0L)),
      single.toString)
    // mid-series split: the carried accumulators stitch the boundary
    val split = run(Seq(rows.take(5), rows.drop(5)), "cusum_two")
    assert(split == single, s"split $split vs single $single")
  }

  test("ewmaStream: alarm sequence equals the batch fold across a mid-series split; baseline-seeded twin equality") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the ewmaReport spec's series: x = 10,10,10,50,50; seed mu=26 (the
    // batch floor mean), el=4, h=6 -> z = 22,19,16,24,30;
    // dev = |z-26| = 4,7,10,2,4 -> alarms at rows 2 (dev 7), 3 (dev 10)
    val rows = Seq(10L, 10L, 10L, 50L, 50L).zipWithIndex.map { case (x, i) =>
      StreamOps.AnomRow("g", i + 1L, i + 1L, x)
    }
    def run(batches: Seq[Seq[StreamOps.AnomRow]], name: String) = {
      val input = MemoryStream[StreamOps.AnomRow]
      val q = StreamOps.ewmaStream(input.toDS(), mu = 26L, el = 4L, h = 6L)
        .toDF("grp", "id", "x", "z", "dev")
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        batches.foreach { b => input.addData(b.toIndexedSeq: _*); q.processAllAvailable() }
        spark.table(name).collect()
          .map(r => (r.getLong(1), r.getLong(3), r.getLong(4))).toSet
      } finally q.stop()
    }
    val single = run(Seq(rows), "ewma_one")
    assert(single == Set((2L, 19L, 7L), (3L, 16L, 10L)), single.toString)
    // the carried z stitches a mid-series split
    val split = run(Seq(rows.take(2), rows.drop(2)), "ewma_two")
    assert(split == single, s"split $split vs single $single")
    // twin check: same alarm rows the batch ewmaReport counts (n_alarms 2,
    // first at id 2) when its seed equals this baseline
    val batch = graft.operators.AuditOps.ewmaReport(
      rows.map(r => ("g", r.ord, r.id, r.x.toDouble))
        .toDF("grp0", "ord0", "id0", "v"), "grp0", "ord0", "id0", "v",
      el = 4L, h = 6L).collect().head
    assert(batch.getLong(2) == single.size.toLong &&
      batch.getLong(3) == single.map(_._1).min, batch.toString)
  }

  test("holtStream: forecast-miss alarms equal the batch fold across a mid-series split") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // x = 10,10,10,50,50 seeded at mu=26 (the batch floor mean), h=12.
    // Hand trace (truncating division, the batch convention):
    //   t1: fc=26 err=16*  l=22 b=-1      t2: fc=21 err=11  l=18 b=-1
    //   t3: fc=17 err=7    l=15 b=-1      t4: fc=14 err=36* l=23 b=1
    //   t5: fc=24 err=26*  l=30 b=2
    val rows = Seq(10L, 10L, 10L, 50L, 50L).zipWithIndex.map { case (x, i) =>
      StreamOps.AnomRow("g", i + 1L, i + 1L, x)
    }
    def run(batches: Seq[Seq[StreamOps.AnomRow]], name: String) = {
      val input = MemoryStream[StreamOps.AnomRow]
      val q = StreamOps.holtStream(input.toDS(), mu = 26L, h = 12L)
        .toDF("grp", "id", "x", "forecast", "err")
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        batches.foreach { b => input.addData(b.toIndexedSeq: _*); q.processAllAvailable() }
        spark.table(name).collect()
          .map(r => (r.getLong(1), r.getLong(3), r.getLong(4))).toSet
      } finally q.stop()
    }
    val single = run(Seq(rows), "holt_one")
    assert(single == Set((1L, 26L, 16L), (4L, 14L, 36L), (5L, 24L, 26L)),
      single.toString)
    // the carried (l, b) stitches a mid-series split
    val split = run(Seq(rows.take(2), rows.drop(2)), "holt_two")
    assert(split == single, s"split $split vs single $single")
    // twin check: the batch holtReport over the same series (its floor-
    // mean seed IS 26 here) must land on the final state this stream
    // carried: level 30, trend 2, forecast 32, mae 96/5
    val batch = graft.operators.AuditOps.holtReport(
      rows.map(r => ("g", r.ord, r.id, r.x.toDouble))
        .toDF("grp0", "ord0", "id0", "v"), "grp0", "ord0", "id0", "v")
      .collect().head
    assert(batch.getDouble(2) == 30.0 && batch.getDouble(3) == 2.0 &&
      batch.getDouble(4) == 32.0 && batch.getDouble(5) == 96.0 / 5.0,
      batch.toString)
  }

  test("transitionsStream: edge multiset equals batch transitions across a mid-user split") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ev = graft.operators.Tables.t(spark, sfDir, "events")
      .withColumn("ts", call_function("div", col("ts").cast("long"), lit(1000L)))
    val want = graft.operators.EventOps.transitionCounts(ev)
      .select("from_type", "to_type", "n").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(want.nonEmpty)

    val rows = ev.select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .as[(Long, Long, Long, String)].collect()
      .map(t => StreamOps.TransRow(t._1, t._2, t._3, t._4))
      .sortBy(r => (r.ord, r.id))
    // contiguous split of the time-ordered feed: per-user order holds and
    // the stored last event must stitch cross-batch transitions
    val (h1, h2) = rows.splitAt(rows.length / 2)
    val input = MemoryStream[StreamOps.TransRow]
    val q = StreamOps.transitionsStream(input.toDS()).toDF("from_type", "to_type")
      .writeStream.format("memory").queryName("trans_out")
      .outputMode("append").start()
    try {
      input.addData(h1.toIndexedSeq: _*)
      q.processAllAvailable()
      input.addData(h2.toIndexedSeq: _*)
      q.processAllAvailable()
      val got = spark.table("trans_out").groupBy("from_type", "to_type").count()
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(got == want, s"stream=${got.size} batch=${want.size}")
    } finally q.stop()
  }

  test("runningUserCounts: mapGroupsWithState accumulates across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EvRow]
    val q = runningUserCounts(input.toDS())
      .toDF("user_id", "total")
      .writeStream.format("memory").queryName("state_out")
      .outputMode("update").start()
    try {
      input.addData(EvRow(1, 1000L, 7, "click", 1.0), EvRow(2, 2000L, 7, "view", 2.0),
        EvRow(3, 3000L, 9, "click", 3.0))
      q.processAllAvailable()
      input.addData(EvRow(4, 4000L, 7, "error", 4.0))
      q.processAllAvailable()
      val rows = spark.table("state_out").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      // update-mode sink appends each batch's emissions: batch1 has (7,2),(9,1);
      // batch2 re-emits user 7 with accumulated state (7,3).
      assert(rows.contains((7L, 2L)) || rows.contains((7L, 3L)))
      assert(rows.contains((9L, 1L)))
      assert(rows.contains((7L, 3L)), s"state did not accumulate: $rows")
    } finally q.stop()
  }

  test("funnelAttributionStream: bounded state attributes across micro-batches, equals batch op") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ns(min: Long) = min * 60L * 1000000000L
    val b1 = Seq(EvRow(1, ns(0), 7, "click", 0), EvRow(2, ns(2), 7, "click", 0),
      EvRow(3, ns(3), 9, "purchase", 0)) // user 9: no prior click
    val b2 = Seq(
      EvRow(4, ns(8), 7, "purchase", 0),  // attributes to click 2 held as STATE from batch 1
      EvRow(5, ns(20), 7, "purchase", 0)) // outside the 10-minute gap
    val input = MemoryStream[EvRow]
    val q = funnelAttributionStream(input.toDS().toDF())
      .toDF("user_id", "to_id", "to_us", "from_id", "from_us", "gap_us")
      .writeStream.format("memory").queryName("funnel_out")
      .outputMode("append").start()
    try {
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
      val got = spark.table("funnel_out").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getLong(5))).toSet
      val batch = funnelAttribution((b1 ++ b2).toDF(), maxGapMin = 10).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getLong(5))).toSet
      assert(got == batch, s"stream $got vs batch $batch")
      assert(got == Set((7L, 4L, 2L, 6L * 60L * 1000000L)),
        "exactly one attribution: purchase 4 -> click 2, 6-minute gap")
    } finally q.stop()
  }

  test("funnelAttributionStream with event-time state GC: equals batch, and idle from-state expires") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ns(min: Long) = min * 60L * 1000000000L
    val b1 = Seq(EvRow(1, ns(0), 7, "click", 0), EvRow(2, ns(2), 7, "click", 0),
      EvRow(3, ns(3), 9, "purchase", 0))
    val b2 = Seq(
      EvRow(4, ns(8), 7, "purchase", 0),  // attributes to click 2 (6-min gap)
      EvRow(5, ns(20), 7, "purchase", 0)) // outside the 10-minute gap; advances watermark to 20
    // batch 3 only advances the watermark (purchase = no new state): user 7's
    // click@2 timed out at 12 min < the batch-start watermark of 20 min
    val b3 = Seq(EvRow(6, ns(60), 9, "purchase", 0))
    val input = MemoryStream[EvRow]
    val q = funnelAttributionStream(input.toDS().toDF(),
        stateWatermarkDelay = Some("0 seconds"))
      .toDF("user_id", "to_id", "to_us", "from_id", "from_us", "gap_us")
      .writeStream.format("memory").queryName("funnel_gc_out")
      .outputMode("append").start()
    try {
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
      input.addData(b3: _*); q.processAllAvailable()
      val got = spark.table("funnel_gc_out").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getLong(5))).toSet
      // expiry is output-invariant: same attributions as the batch op
      val batch = funnelAttribution((b1 ++ b2 ++ b3).toDF(), maxGapMin = 10).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getLong(5))).toSet
      assert(got == batch, s"stream $got vs batch $batch")
      assert(got == Set((7L, 4L, 2L, 6L * 60L * 1000000L)))
      // ...and the held from-state is GONE once the watermark passes
      // fts + gap — the bounded-in-time claim, observed via the state store
      val stateRows = q.lastProgress.stateOperators.head.numRowsTotal
      assert(stateRows == 0, s"expected all funnel state expired, found $stateRows rows")
    } finally q.stop()
  }

  test("incrementalDedupStream: batch-wise probes of a fixed corpus index union to the batch op across a restart") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def doc(id: Long, text: String): (Long, String, Int, String) =
      (id, "en", text.length, text)
    val baseText = "the quick brown fox jumps over the lazy dog while the " +
      "spotted cat watches quietly from the warm stone windowsill every " +
      "single morning before the busy village market slowly opens its gates"
    val corpus = Seq(
      doc(1, baseText),
      doc(2, "entirely different content describing shuffle partitioning " +
        "strategies and broadcast joins for large scale distributed " +
        "analytics engines running on many executors"),
      doc(3, baseText.replace("morning", "evening"))
    ).toDF("doc_id", "lang", "n_chars", "text")
    // the production shape: corpus index computed ONCE, persisted, probed
    // by every micro-batch — the corpus is never re-shingled per batch
    val index = graft.operators.DedupOps.minhashIndex(corpus)
    index._1.persist(); index._2.persist()
    val b1 = Seq(doc(101, baseText.replace("quick", "sneaky"))) // near-dup of 1,3
    val b2 = Seq(doc(102, "totally unrelated text about counter based " +
      "random number generation for reproducible monte carlo simulation " +
      "of geometric brownian motion trajectories")) // no pairs
    val b3 = Seq(doc(103, baseText)) // EXACT text of doc 1 (jac 1.0 — guaranteed pair)
    val input = MemoryStream[(Long, String, Int, String)]
    val buf = new scala.collection.concurrent.TrieMap[(Long, Long), Double]()
    val ckpt = java.nio.file.Files.createTempDirectory("inc_dedup_ckpt").toString
    def start() = incrementalDedupStream(
        input.toDS().toDF("doc_id", "lang", "n_chars", "text"), index) {
      (_, pairs) =>
        pairs.collect().foreach(r => buf((r.getLong(0), r.getLong(1))) = r.getDouble(2))
    }.option("checkpointLocation", ckpt).start()
    try {
      val q1 = start()
      input.addData(b1: _*); q1.processAllAvailable()
      input.addData(b2: _*); q1.processAllAvailable()
      q1.stop() // restart mid-feed: batch 3 arrives while the stream is down
      input.addData(b3: _*)
      val q2 = start()
      q2.processAllAvailable(); q2.stop()
      // union of per-batch pair sets == the batch op on the whole feed
      val batchTwin = graft.operators.DedupOps.minhashPairsAgainst(
          corpus, (b1 ++ b2 ++ b3).toDF("doc_id", "lang", "n_chars", "text"))
        .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
      assert(buf.toMap == batchTwin, s"stream ${buf.toMap} vs batch $batchTwin")
      // non-vacuous: the exact-text copy MUST pair with its corpus original
      assert(buf.contains((1L, 103L)), s"expected (1,103) in ${buf.keySet}")
      // and the corpus never pairs against itself (old x old silent):
      // docs 1 and 3 are near-dups of each other but never appear as a pair
      assert(buf.keySet.forall { case (_, n) => n >= 101L },
        s"corpus-side doc leaked into the new side: ${buf.keySet}")
    } finally {
      index._1.unpersist(); index._2.unpersist()
    }
  }

  test("enrichEvents: stream-static join enriches each micro-batch statelessly") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val customers = Seq((7L, "AUTOMOBILE"), (8L, "BUILDING"), (9L, "MACHINERY"))
      .toDF("c_custkey", "c_mktsegment")
    val input = MemoryStream[EvRow]
    val q = enrichEvents(input.toDS().toDF(), customers)
      .writeStream.format("memory").queryName("enrich_out")
      .outputMode("append").start()
    try {
      input.addData(EvRow(1, 1000L, 7, "click", 1.0), EvRow(2, 2000L, 8, "view", 2.0))
      q.processAllAvailable()
      input.addData(EvRow(3, 3000L, 9, "error", 3.0))
      q.processAllAvailable()
      val rows = spark.table("enrich_out").collect()
        .map(r => (r.getLong(0), r.getString(4))).toSet
      assert(rows == Set((1L, "AUTOMOBILE"), (2L, "BUILDING"), (3L, "MACHINERY")),
        s"got $rows")
    } finally q.stop()
  }

  test("dedupEventsStream: duplicates within the watermark horizon are dropped") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = 1700000000000000000L // epoch ns
    def ns(s: Long) = base + s * 1000000000L
    val input = MemoryStream[EvRow]
    val q = dedupEventsStream(input.toDS().toDF())
      .select("event_id")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      input.addData(EvRow(1, ns(0), 7, "click", 1.0), EvRow(2, ns(10), 8, "view", 2.0))
      q.processAllAvailable()
      // batch 2 re-delivers event 1 (well inside the 1h watermark horizon)
      // alongside a new event — the duplicate must be dropped
      input.addData(EvRow(1, ns(0), 7, "click", 1.0), EvRow(3, ns(20), 9, "error", 3.0))
      q.processAllAvailable()
      val ids = spark.table("dedup_out").collect().map(_.getLong(0)).sorted.toSeq
      assert(ids == Seq(1L, 2L, 3L), s"expected exactly-once ids, got $ids")
    } finally q.stop()
  }

  test("clickErrorJoin: stream-stream interval join equals the batch result") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def mkDf(rows: Seq[(Long, Long, Long, String)]) =
      rows.toDF("event_id", "ts", "user_id", "event_type")
    val m = 60L * 1000 * 1000 * 1000 // minutes in nanos
    val clicks = Seq((1L, 10 * m, 7L, "click"), (2L, 50 * m, 7L, "click"),
      (3L, 10 * m, 9L, "click"))
    val errors = Seq((10L, 30 * m, 7L, "error"), (11L, 95 * m, 7L, "error"),
      (12L, 200 * m, 9L, "error"))
    val batch = clickErrorJoin(mkDf(clicks), mkDf(errors))
      .orderBy("error_id", "click_id").collect().map(_.toSeq).toSeq
    // error 10 @30min matches click 1 @10min (within 30min); error 11 @95min
    // matches nothing (click 2 @50min is 45min prior); user 9's error @200min
    // matches nothing.
    assert(batch.map(r => (r(0), r(1))) == Seq((10L, 1L)))

    val ci = MemoryStream[(Long, Long, Long, String)]
    val ei = MemoryStream[(Long, Long, Long, String)]
    val q = clickErrorJoin(
        ci.toDF().toDF("event_id", "ts", "user_id", "event_type"),
        ei.toDF().toDF("event_id", "ts", "user_id", "event_type"))
      .writeStream.format("memory").queryName("ssj_out").outputMode("append").start()
    try {
      ci.addData(clicks); ei.addData(errors)
      q.processAllAvailable()
      val streamed = spark.table("ssj_out")
        .orderBy("error_id", "click_id").collect().map(_.toSeq).toSeq
      assert(streamed == batch, s"streamed=$streamed batch=$batch")
    } finally q.stop()
  }

  test("coinTraceStream: streaming generation is bit-identical to batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    case class Req(model_id: Int, sim_id: Long, seed: Long, points: Int, bias: Double)
    val reqs = Seq(Req(0, 0, 42, 8, 0.5), Req(0, 1, 42, 8, 0.5), Req(1, 0, 43, 5, 0.7))
    val input = MemoryStream[(Int, Long, Long, Int, Double)]
    val sdf = input.toDF().toDF("model_id", "sim_id", "seed", "points", "bias")
    val q = coinTraceStream(sdf)
      .writeStream.format("memory").queryName("mc_out").outputMode("append").start()
    try {
      input.addData(reqs.map(r => (r.model_id, r.sim_id, r.seed, r.points, r.bias)))
      q.processAllAvailable()
      val streamed = spark.table("mc_out")
        .select(col("model_id"), col("sim_id"), concat_ws(",", col("trace")))
        .orderBy("model_id", "sim_id").collect().map(_.toSeq).toSeq
      val batch = coinTraceStream(
        reqs.map(r => (r.model_id, r.sim_id, r.seed, r.points, r.bias))
          .toDF("model_id", "sim_id", "seed", "points", "bias"))
        .select(col("model_id"), col("sim_id"), concat_ws(",", col("trace")))
        .orderBy("model_id", "sim_id").collect().map(_.toSeq).toSeq
      assert(streamed == batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("expiringSessions: event-time timeout emits state when the watermark passes") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ns(hours: Double): Long = (hours * 3600d * 1e9).toLong
    val input = MemoryStream[(Long, Long, Long, String, Double)]
    val q = expiringSessions(input.toDF()
        .toDF("event_id", "ts", "user_id", "event_type", "value"))
      .toDF("user_id", "n_events")
      .writeStream.format("memory").queryName("expire_out")
      .outputMode("append").start()
    try {
      // user 7: two events at t=1h and t=1.5h (away from epoch 0 — an event
      // at exactly the initial watermark would be dropped as late data)
      input.addData((1L, ns(1.0), 7L, "click", 1.0), (2L, ns(1.5), 7L, "view", 1.0))
      q.processAllAvailable()
      assert(spark.table("expire_out").count() == 0) // state held, not expired
      // an event at t=4h advances the watermark past 1.5h + 1h -> user 7 expires
      input.addData((3L, ns(4.0), 9L, "click", 1.0))
      q.processAllAvailable()
      // one more batch so the new watermark is applied to timeouts
      input.addData((4L, ns(4.1), 9L, "view", 1.0))
      q.processAllAvailable()
      val rows = spark.table("expire_out").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(rows.contains((7L, 2L)), s"user 7's session did not expire: $rows")
    } finally q.stop()
  }

  test("scoreLinearStream: stateless append scoring equals the batch op across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val model = spark.range(256).select(col("id").as("feature"),
      ((col("id") * 37 % 2001 - 1000).cast("double") / 1000.0).as("weight"))
    val docs = Seq((1L, "aa bb aa"), (2L, "cc dd"), (3L, "ee"), (4L, "aa ee zz"))
    val input = MemoryStream[(Long, String)]
    val q = StreamOps.scoreLinearStream(
        input.toDS().toDF("doc_id", "text"), model)
      .writeStream.format("memory").queryName("score_out")
      .outputMode("append").start()
    try {
      input.addData(docs.take(2): _*)
      q.processAllAvailable()
      input.addData(docs.drop(2): _*)
      q.processAllAvailable()
      val streamed = spark.table("score_out").collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
      val batch = graft.operators.TextOps.scoreLinear(
          docs.toDF("doc_id", "text"), model).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
      assert(streamed == batch,
        s"stream/batch scoring diverged: $streamed vs $batch")
    } finally q.stop()
  }

  test("file sink + checkpoint: stream restart resumes without reprocessing") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val outDir = java.nio.file.Files.createTempDirectory("graft-sink-out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    val input = MemoryStream[(Long, Long, Long, String, Double)]
    def start() = coinlessPassthrough(input.toDF()
        .toDF("event_id", "ts", "user_id", "event_type", "value"))
      .writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckpt)
      .outputMode("append").start()
    val q1 = start()
    try { input.addData((1L, 1000L, 7L, "click", 1.0)); q1.processAllAvailable() }
    finally q1.stop()
    val q2 = start() // restart from the SAME checkpoint
    try { input.addData((2L, 2000L, 8L, "view", 2.0)); q2.processAllAvailable() }
    finally q2.stop()
    val rows = spark.read.parquet(outDir).orderBy("event_id")
      .select("event_id").collect().map(_.getLong(0)).toSeq
    // each event exactly once across the restart — offsets came from the checkpoint
    assert(rows == Seq(1L, 2L), s"got $rows")
  }

  private def coinlessPassthrough(df: org.apache.spark.sql.DataFrame) =
    df.select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))

  test("userSessions groups events separated by more than the gap") {
    import spark.implicits._
    def ns(hours: Double): Long = (hours * 3600d * 1e9).toLong
    val df = Seq(
      (1L, ns(0.0), 5L, "click", 1.0, "{}"),
      (2L, ns(1.0), 5L, "view", 1.0, "{}"),
      (3L, ns(20.0), 5L, "click", 1.0, "{}"), // > 8h after -> new session
      (4L, ns(0.5), 6L, "click", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = userSessions(df).orderBy("user_id", "session_start_us").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(
      (5L, 0L, 2L),
      (5L, (20.0 * 3600 * 1e6).toLong, 1L),
      (6L, (0.5 * 3600 * 1e6).toLong, 1L)))
  }

  test("snapshotPublishStream: each micro-batch lands as one immutable version") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.sources.SnapshotStore
    val root = java.nio.file.Files.createTempDirectory("graft-snapstream").toString + "/c"
    val input = MemoryStream[(Long, String)]
    val q = StreamOps.snapshotPublishStream(
        input.toDF().toDF("doc_id", "text"), root, col("doc_id"))
      .start()
    try {
      input.addData((1L, "a"), (2L, "b"))
      q.processAllAvailable()
      input.addData((3L, "c"))
      q.processAllAvailable()
      assert(SnapshotStore.latestVersion(root).contains(2L))
      // the live version is the LAST delivery; v1 pinned with its batch
      assert(SnapshotStore.read(spark, root).collect().map(_.getLong(0)).toSet == Set(3L))
      assert(SnapshotStore.readVersion(spark, root, 1L)
        .collect().map(_.getLong(0)).toSet == Set(1L, 2L))
      val vs = SnapshotStore.versions(spark, root).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(vs == Map(1L -> 2L, 2L -> 1L), vs.toString)
    } finally q.stop()
  }

  test("userSessionsStream: closed sessions equal the batch op over the landed slice") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ns(hours: Double): Long = (hours * 3600d * 1e9).toLong
    val input = MemoryStream[(Long, Long)]
    val q = StreamOps.userSessionsStream(
        input.toDF().toDF("ts", "user_id"))
      .writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    try {
      // user 5: events at 0h and 1h (one session); user 6 at 0.5h
      input.addData((ns(0.0), 5L), (ns(1.0), 5L), (ns(0.5), 6L))
      q.processAllAvailable()
      assert(spark.table("sess_out").count() == 0, "sessions still open")
      // an event at 20h lifts the watermark to 19h — past both sessions'
      // closes (1h+8h=9h, 0.5h+8h=8.5h) -> they emit, final
      input.addData((ns(20.0), 5L))
      q.processAllAvailable()
      val closed = spark.table("sess_out").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val batchOverSame = StreamOps.userSessions(
          Seq((ns(0.0), 5L), (ns(1.0), 5L), (ns(0.5), 6L))
            .toDF("ts", "user_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(closed == batchOverSame, s"stream $closed vs batch $batchOverSame")
      // the 20h event's own session is still open (nothing re-emits)
      assert(closed.size == 2)
    } finally q.stop()
  }

  test("driftStream: a closed window's verdict equals the batch categoricalDrift bit-for-bit") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ns(hours: Double): Long = (hours * 3600d * 1e9).toLong
    val baseline = Map("click" -> 2L, "error" -> 1L)
    val input = MemoryStream[(Long, String)]
    val q = StreamOps.driftStream(input.toDF().toDF("ts", "event_type"), baseline)
      .toDF("win", "cat", "o_cnt", "n_cnt", "tvd")
      .writeStream.format("memory").queryName("drift_out")
      .outputMode("append").start()
    try {
      // day-0 window: click x3, view x1
      input.addData((ns(1), "click"), (ns(2), "click"), (ns(3), "click"),
        (ns(4), "view"))
      q.processAllAvailable()
      assert(spark.table("drift_out").count() == 0, "window still open")
      // day-2 event advances the watermark past day 0; one more batch
      // applies the new watermark to timeouts
      input.addData((ns(49), "click"))
      q.processAllAvailable()
      input.addData((ns(50), "click"))
      q.processAllAvailable()
      val got = spark.table("drift_out").filter(col("win") === 0)
        .collect().map(r => (r.getString(1), r.getLong(2), r.getLong(3),
          r.getDouble(4))).toSet
      // batch twin over the identical landed slice
      val oldDf = baseline.toSeq.flatMap { case (c, n) =>
        Seq.fill(n.toInt)(c) }.toDF("cat")
      val newDf = Seq("click", "click", "click", "view").toDF("cat")
      val batch = graft.operators.AuditOps.categoricalDrift(oldDf, newDf, "cat")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getDouble(6))).toSet
      assert(got == batch, s"stream $got vs batch $batch")
      assert(got.map(_._4).head == 8.0 / 24.0, "hand-computed TVD 1/3")
    } finally q.stop()
  }

  test("abTestStream: a closed window's rows equal the batch abTestReport bit-for-bit") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ns(hours: Double): Long = (hours * 3600d * 1e9).toLong
    val input = MemoryStream[(Long, String, Boolean)]
    val q = StreamOps.abTestStream(input.toDF().toDF("ts", "variant", "ok"),
        col("variant"), col("ok"), "v0")
      .toDF("win", "variant", "n", "conv", "rate", "lift", "z2", "z")
      .writeStream.format("memory").queryName("abtest_out")
      .outputMode("append").start()
    try {
      // day-0 window = the AuditOpsSpec hand case: v0 1/4, v1 3/4
      input.addData(
        (ns(1), "v0", true), (ns(2), "v0", false), (ns(3), "v0", false),
        (ns(4), "v0", false),
        (ns(5), "v1", true), (ns(6), "v1", true), (ns(7), "v1", true),
        (ns(8), "v1", false))
      q.processAllAvailable()
      assert(spark.table("abtest_out").count() == 0, "window still open")
      input.addData((ns(49), "v0", false))
      q.processAllAvailable()
      input.addData((ns(50), "v0", false))
      q.processAllAvailable()
      val got = spark.table("abtest_out").filter(col("win") === 0)
        .collect().map(r => (r.getString(1), r.getLong(2), r.getLong(3),
          r.getDouble(4),
          if (r.isNullAt(5)) null else r.getDouble(5),
          if (r.isNullAt(6)) null else r.getDouble(6),
          if (r.isNullAt(7)) null else r.getDouble(7))).toSet
      val batchIn = Seq(("v0", true), ("v0", false), ("v0", false),
        ("v0", false), ("v1", true), ("v1", true), ("v1", true),
        ("v1", false)).toDF("variant", "ok")
      val batch = graft.operators.AuditOps
        .abTestReport(batchIn, col("variant"), col("ok"), "v0")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getDouble(3),
          if (r.isNullAt(4)) null else r.getDouble(4),
          if (r.isNullAt(5)) null else r.getDouble(5),
          if (r.isNullAt(6)) null else r.getDouble(6))).toSet
      assert(got == batch, s"stream $got vs batch $batch")
      assert(got.exists(t => t._1 == "v1" && t._6 == 2.0),
        "hand-computed z^2 = 2")
    } finally q.stop()
  }

  test("srmStream: a closed window's verdict equals the batch srmReport bit-for-bit; off-design arm forces mismatch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ns(hours: Double): Long = (hours * 3600d * 1e9).toLong
    val input = MemoryStream[(Long, String)]
    val q = StreamOps.srmStream(input.toDF().toDF("ts", "variant"),
        col("variant"), Seq("v0" -> 1L, "v1" -> 1L))
      .toDF("win", "n", "n_variants", "dof", "chi2", "crit", "mismatch",
        "off_design")
      .writeStream.format("memory").queryName("srm_out")
      .outputMode("append").start()
    try {
      // day 0: the AuditOpsSpec 10/90 broken split; day 1: a 2/2 clean
      // split plus one off-design arm
      input.addData((1 to 10).map(i => (ns(0.1 * i), "v0")) ++
        (1 to 90).map(i => (ns(0.1 * i + 10), "v1")): _*)
      input.addData((ns(25), "v0"), (ns(26), "v0"), (ns(27), "v1"),
        (ns(28), "v1"), (ns(29), "vX"))
      q.processAllAvailable()
      input.addData((ns(49), "v0")); q.processAllAvailable()
      input.addData((ns(50), "v0")); q.processAllAvailable()
      val rows = spark.table("srm_out").collect()
        .map(r => r.getLong(0) -> r).toMap
      val day0 = rows(0L)
      val batch = graft.operators.AuditOps.srmReport(
        ((1 to 10).map(_ => "v0") ++ (1 to 90).map(_ => "v1")).toDF("v"),
        col("v"), Seq("v0" -> 1L, "v1" -> 1L)).collect().head
      assert(day0.getLong(1) == batch.getLong(0) &&
        day0.getDouble(4) == batch.getDouble(3) &&
        day0.getDouble(5) == batch.getDouble(4) &&
        day0.getBoolean(6) == batch.getBoolean(5),
        s"stream $day0 vs batch $batch")
      assert(day0.getBoolean(6), "10/90 at 1:1 is a mismatch")
      val day1 = rows(1L)
      assert(day1.getLong(1) == 4 && day1.getLong(7) == 1 &&
        day1.getBoolean(6), "off-design arm must force mismatch: " + day1)
      assert(day1.getDouble(4) == 0.0, "in-design split is exactly even")
    } finally q.stop()
  }

  test("abTestStream/driftStream: late rows for a closed window are dropped, not fatal") {
    // flatMapGroupsWithState does NOT auto-drop late rows; without the
    // watermark guard a late event re-creates state for a closed window
    // and setTimeoutTimestamp(<= watermark) throws, killing the query.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ns(hours: Double): Long = (hours * 3600d * 1e9).toLong
    val input = MemoryStream[(Long, String, Boolean)]
    val q = StreamOps.abTestStream(input.toDF().toDF("ts", "variant", "ok"),
        col("variant"), col("ok"), "v0")
      .toDF("win", "variant", "n", "conv", "rate", "lift", "z2", "z")
      .writeStream.format("memory").queryName("abtest_late_out")
      .outputMode("append").start()
    try {
      input.addData((ns(1), "v0", true), (ns(2), "v1", true))
      q.processAllAvailable()
      // two batches: advance the watermark past day 0, then fire timeouts
      input.addData((ns(49), "v0", false))
      q.processAllAvailable()
      input.addData((ns(50), "v0", false))
      q.processAllAvailable()
      val closed = spark.table("abtest_late_out").filter(col("win") === 0).count()
      assert(closed == 2, s"day-0 window should have closed with 2 rows, got $closed")
      // a day-0 straggler arrives AFTER the window closed: must be
      // silently dropped — the query keeps running and day-0 output
      // is unchanged (no re-emit, no split counts)
      input.addData((ns(3), "v1", false))
      q.processAllAvailable()
      assert(q.exception.isEmpty, s"query died on a late row: ${q.exception}")
      assert(spark.table("abtest_late_out").filter(col("win") === 0).count() == 2,
        "late row must not re-open or re-emit the closed window")
    } finally q.stop()

    val dInput = MemoryStream[(Long, String)]
    val dq = StreamOps.driftStream(dInput.toDF().toDF("ts", "event_type"),
        Map("click" -> 1L))
      .toDF("win", "cat", "o_cnt", "n_cnt", "tvd")
      .writeStream.format("memory").queryName("drift_late_out")
      .outputMode("append").start()
    try {
      dInput.addData((ns(1), "click"))
      dq.processAllAvailable()
      dInput.addData((ns(49), "click"))
      dq.processAllAvailable()
      dInput.addData((ns(50), "click"))
      dq.processAllAvailable()
      val n0 = spark.table("drift_late_out").filter(col("win") === 0).count()
      assert(n0 == 1, s"day-0 drift window should have closed, got $n0 rows")
      dInput.addData((ns(2), "view"))
      dq.processAllAvailable()
      assert(dq.exception.isEmpty, s"query died on a late row: ${dq.exception}")
      assert(spark.table("drift_late_out").filter(col("win") === 0).count() == 1)
    } finally dq.stop()
  }
}
