package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Re-ingestion of reference-format trace files (SURVEY §2.2 "Scans"):
  * the reference's only on-disk artifact is one CSV file per model, one row
  * per trace, points as columns with no header and ragged widths across
  * models (`utils.py:15-23`). Reading them as `text` and splitting (rather
  * than the csv reader) avoids schema inference over ragged rows and keeps
  * the array shape the engine's long format expects.
  */
object TraceSource {

  /** Read one reference CSV trace file → `(model_id, sim_id, trace)`.
    * sim_id is the row's position in the file (the reference writes traces
    * in simulation order).
    */
  def readReferenceCsv(spark: SparkSession, path: String, modelId: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(lit(1)).orderBy(monotonically_increasing_id())
    spark.read.text(path)
      .select(split(col("value"), ",").as("trace"))
      .withColumn("sim_id", row_number().over(w).cast("long") - 1)
      .select(lit(modelId).as("model_id"), col("sim_id"), col("trace"))
  }

  /** Read a battery of reference CSV files (modelId → path). */
  def readReferenceCsvBattery(spark: SparkSession, paths: Map[Int, String]): DataFrame =
    paths.toSeq.sortBy(_._1)
      .map { case (m, p) => readReferenceCsv(spark, p, m) }
      .reduce(_ unionAll _)
}
