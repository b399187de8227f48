package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators: the write-side clustering that makes 100 TB
  * READS cheap. Z-ordering (bit-interleaved space-filling curve) maps
  * multi-dimensional keys to one dimension while preserving locality, so
  * range-partitioning + sorting by the z-key co-locates rows that are
  * close in EVERY dimension — after which min/max column statistics
  * (parquet row groups, Delta/Iceberg file skipping) prune
  * multi-dimensional predicates that a single-column sort can only prune
  * on its leading column.
  *
  * Usage at write time:
  * {{{
  *   df.withColumn("z", LayoutOps.zorder16(col("a"), col("b")))
  *     .repartitionByRange(n, col("z")).sortWithinPartitions("z")
  *     .write.parquet(...)
  * }}}
  */
object LayoutOps {

  /** 32-bit Z-value of two dimensions (low 16 bits each, masked — callers
    * scale/quantize wider domains first; wrap preserves locality within
    * each 65536-aligned window). Pure integer bit arithmetic: codegen'd,
    * shuffle-free, and bit-identical in any engine.
    */
  def zorder16(x: Column, y: Column): Column =
    (0 until 16).map { b =>
      shiftleft(shiftright(x, b).bitwiseAND(1), 2 * b) +
        shiftleft(shiftright(y, b).bitwiseAND(1), 2 * b + 1)
    }.reduce(_ + _)

  /** SQL text of [[zorder16]] for the DuckDB oracle. */
  def sqlZorder16(x: String, y: String): String =
    (0 until 16).map { b =>
      s"(((($x) >> $b) & 1) << ${2 * b}) + (((($y) >> $b) & 1) << ${2 * b + 1})"
    }.mkString("(", " + ", ")")

  /** Write `df` as a BUCKETED (and per-bucket sorted) managed parquet
    * table: rows are hash-partitioned into `nBuckets` files by
    * `bucketCols`, each file sorted by those columns. This is the other
    * half of the 100 TB layout story next to [[zorder16]]: a join or
    * aggregation on the bucket columns between two tables bucketed the
    * same way needs NO shuffle at read time — the exchange is paid ONCE
    * at write time and amortized over every subsequent query
    * (BucketedJoinSpec pins the exchange-free plan; BENCHNOTES has the
    * measured effect). The `repartition(nBuckets, bucketCols)` preceding
    * the write keeps ONE file per bucket, so Spark can also trust each
    * bucket's sort order and skip the SMJ sort at read time.
    */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
      nBuckets: Int): Unit = {
    require(bucketCols.nonEmpty, "writeBucketed needs at least one bucket column")
    require(nBuckets >= 1, s"writeBucketed needs nBuckets >= 1, got $nBuckets")
    df.repartition(nBuckets, bucketCols.map(col): _*)
      .write.mode("overwrite").format("parquet")
      .bucketBy(nBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .saveAsTable(table)
  }

  /** Z-order tile summary: assign each row its z-key, bucket into 2^bits
    * coarse tiles (top bits of the 32-bit z), and report each tile's row
    * count and per-dimension min/max envelope. The envelope IS the
    * locality proof — every tile covers a bounded rectangle in (x, y), so
    * file-level min/max stats prune 2-D predicates. (The gate query
    * checks these envelopes value-for-value; ZorderSpec asserts the
    * rectangle-area bound.)
    */
  def zTiles(df: DataFrame, x: Column, y: Column, tileBits: Int = 6): DataFrame = {
    require(tileBits >= 1 && tileBits <= 16, s"tileBits in [1,16], got $tileBits")
    df.select(x.as("zx"), y.as("zy"))
      .withColumn("tile", shiftright(zorder16(col("zx"), col("zy")), 32 - tileBits))
      .groupBy("tile")
      .agg(count(lit(1)).as("n_rows"),
        min(col("zx")).as("x_min"), max(col("zx")).as("x_max"),
        min(col("zy")).as("y_min"), max(col("zy")).as("y_max"))
  }

  /** Small-file COMPACTION: rewrite a parquet directory into
    * ceil(rows / targetRowsPerFile) files. The maintenance pass that keeps
    * a long-lived table readable — daily ingests and streaming file sinks
    * accrete thousands of KB-sized files, and at 100 TB the scan's task
    * count (and the namenode/listing cost) is dominated by file COUNT,
    * not bytes. One count pass + one round-robin repartition write; a
    * `sortBy` column list turns the rewrite into a clustering pass
    * instead (repartitionByRange + sortWithinPartitions — the zorder16
    * write recipe), so compaction and layout are one rewrite, not two.
    *
    * Overwrites `outDir`; rows pass through byte-identical (spec pins
    * count and content equality plus the file-count bound).
    */
  def compact(spark: org.apache.spark.sql.SparkSession, inDir: String,
      outDir: String, targetRowsPerFile: Long, sortBy: Seq[Column] = Nil): Unit = {
    require(targetRowsPerFile >= 1, s"targetRowsPerFile >= 1, got $targetRowsPerFile")
    // Self-overwrite guard on CANONICALIZED paths (ADVICE r8): plain
    // string inequality lets a trailing slash, a relative spelling, or a
    // symlink alias through, and mode(overwrite) on the input dir would
    // destroy the source mid-scan. toRealPath resolves symlinks for
    // existing prefixes; for a not-yet-created outDir canonicalize the
    // deepest existing ancestor and rebuild. Non-local URIs (hdfs://,
    // s3a://) skip the filesystem resolution and compare normalized
    // string forms — alias detection there would need the Hadoop
    // FileSystem, and the local case is where dev destroys data.
    def canon(p: String): String =
      if (p.contains("://")) p.replaceAll("/+$", "")
      else {
        var f = new java.io.File(p).getAbsoluteFile
        val tail = new scala.collection.mutable.ListBuffer[String]
        while (f != null && !f.exists()) { tail.prepend(f.getName); f = f.getParentFile }
        val base = if (f == null) "" else f.toPath.toRealPath().toString
        (base +: tail.toList).mkString(java.io.File.separator)
      }
    require(canon(inDir) != canon(outDir),
      s"compact cannot overwrite its own input in place ($inDir vs $outDir)")
    val df = spark.read.parquet(inDir)
    val n = df.count()
    val files = math.max(1, ((n + targetRowsPerFile - 1) / targetRowsPerFile).toInt)
    val laid =
      if (sortBy.isEmpty) df.repartition(files)
      else df.repartitionByRange(files, sortBy: _*)
        .sortWithinPartitions(sortBy: _*)
    laid.write.mode("overwrite").parquet(outDir)
  }

  /** Parquet write with IN-FLIGHT metrics via Spark's `Observation` API:
    * the row count, per-key-column null count, and min/max id ride the
    * SAME pass that writes the files — no second scan. This is the
    * zero-cost half of write certification; [[graft.sources.CorpusSink
    * .manifest]] remains the read-back half (it certifies the BYTES ON
    * DISK and costs a scan; this certifies what the writing job streamed
    * out and costs nothing). At 100 TB a daily publish runs this always
    * and the read-back only on delivery disputes.
    *
    * Returns the observed metrics: `n_rows`, `id_nulls`, `id_min`,
    * `id_max` (min/max NULL on an empty input). Observation metrics are
    * collected on the driver from task-completion events — exact, not
    * sampled, and safe at any scale (four longs).
    */
  def writeObserved(df: DataFrame, outDir: String,
      idCol: Column): Map[String, Any] = {
    val obs = org.apache.spark.sql.Observation()
    df.observe(obs,
        count(lit(1)).as("n_rows"),
        sum(when(idCol.isNull, 1L).otherwise(0L)).as("id_nulls"),
        min(idCol).as("id_min"),
        max(idCol).as("id_max"))
      .write.mode("overwrite").parquet(outDir)
    obs.get
  }
}
