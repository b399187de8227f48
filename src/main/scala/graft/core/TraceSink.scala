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
    */
  def writeReferenceCsv(traces: DataFrame, specs: Seq[SimulationSpec]): Unit =
    specs.foreach { s =>
      val tmp = Files.createTempDirectory("graft-sink")
      traces
        .filter(col("model_id") === s.modelId)
        .orderBy(col("sim_id"))
        .select(concat_ws(",", col("trace")))
        .coalesce(1)
        .write.mode(SaveMode.Overwrite).text(tmp.toString)
      val listing = Files.list(tmp)
      val part =
        try listing.filter(_.getFileName.toString.startsWith("part-"))
          .findFirst().orElseThrow(() => new IllegalStateException(s"no part file in $tmp"))
        finally listing.close()
      val dest = Paths.get(s.resolvedOutputPath)
      Option(dest.getParent).foreach(Files.createDirectories(_))
      Files.move(part, dest, StandardCopyOption.REPLACE_EXISTING)
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
