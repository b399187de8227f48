package graft.core

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Trace sinks.
  *
  * The reference writes each model's battery as one local CSV file — one row
  * per trace, points as columns, truncate-on-open (`"w"` mode)
  * (`parallel_simulations/utils.py:15-23`). That exact behavior is preserved
  * by [[writeReferenceCsv]] for parity; the scale paths are
  * [[writePartitionedText]] / [[writeParquet]], which keep the write fully
  * distributed (one directory per model via `partitionBy`, no single-file
  * bottleneck — the right shape for a 100 TB run).
  */
object TraceSink {

  /** Distributed CSV-format sink: `dir/model_id=<m>/part-*.txt`, one CSV line
    * per trace. Overwrite semantics, matching `utils.py:19`.
    */
  def writePartitionedText(traces: DataFrame, dir: String): Unit =
    traces
      .select(col("model_id"), concat_ws(",", col("trace")).as("value"))
      .write.mode(SaveMode.Overwrite).partitionBy("model_id").text(dir)

  /** Columnar sink for downstream analytics (keeps the array type). */
  def writeParquet(traces: DataFrame, dir: String): Unit =
    traces.write.mode(SaveMode.Overwrite).partitionBy("model_id").parquet(dir)

  /** Reference-parity sink: exactly one local CSV file per model at each
    * spec's `resolvedOutputPath` (default `./{i}.txt`,
    * `parallel_simulations.py:176-179`), rows ordered by sim_id, overwritten
    * on rerun. Funnels each model through one task — use only at
    * demo/parity scale; the reference itself is single-file-per-model too.
    *
    * ONE Spark job for the whole battery (not one per model): rows are
    * hash-repartitioned on model_id and sorted (model_id, sim_id) within
    * partitions, then written `partitionBy(model_id)` — the writer's
    * required ordering (partition columns) is already a prefix of ours, so
    * no extra sort is inserted and each model lands as a single
    * sim_id-ordered part file, which the driver then just renames. (Single
    * file per model relies on the default
    * `spark.sql.files.maxRecordsPerFile = 0`; a battery big enough to
    * trip a configured cap has outgrown the parity sink.)
    */
  def writeReferenceCsv(traces: DataFrame, specs: Seq[SimulationSpec]): Unit = {
    if (specs.isEmpty) return
    val tmp = Files.createTempDirectory("graft-sink")
    traces
      .filter(col("model_id").isin(specs.map(_.modelId): _*))
      .repartition(col("model_id"))
      .sortWithinPartitions(col("model_id"), col("sim_id"))
      .select(col("model_id"), concat_ws(",", col("trace")).as("value"))
      .write.mode(SaveMode.Overwrite).partitionBy("model_id").text(tmp.toString)
    specs.foreach { s =>
      val dir = tmp.resolve(s"model_id=${s.modelId}")
      val dest = Paths.get(s.resolvedOutputPath)
      Option(dest.getParent).foreach(Files.createDirectories(_))
      if (Files.isDirectory(dir)) {
        val listing = Files.list(dir)
        val part =
          try listing.filter(_.getFileName.toString.startsWith("part-"))
            .findFirst().orElseThrow(() => new IllegalStateException(s"no part file in $dir"))
          finally listing.close()
        // COPY, not move: two specs may (ab)use the same modelId with
        // different output paths — each must receive the file, as the old
        // per-spec jobs produced
        Files.copy(part, dest, StandardCopyOption.REPLACE_EXISTING)
      } else {
        // a spec whose model has no rows in `traces`: dynamic partitionBy
        // writes no directory for it — preserve the previous per-spec
        // behavior (an empty output file) instead of failing the battery
        Files.write(dest, Array.emptyByteArray)
      }
    }
    deleteRecursively(tmp)
  }

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p)) {
      val listing = Files.list(p)
      try listing.forEach(deleteRecursively(_))
      finally listing.close()
    }
    Files.deleteIfExists(p)
  }
}
