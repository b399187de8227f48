package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core._
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the query surface from the operator modules; every entry in
  * [[queries]] that is SQL-expressible has a DuckDB oracle in [[oracleSql]]
  * with column names aligned on both sides.
  */
object SparkEntry {

  /** Flagship query (driver smoke-checks rows>0 on sf0.001): the canonical
    * MC-estimator — generate two coin-model batteries with the shuffle-free
    * Range→Project plan, explode to long format, aggregate heads fraction
    * per model (SURVEY §7.2 step 1).
    */
  def entry(spark: SparkSession): DataFrame = {
    val specs = Seq(
      SimulationSpec(0, "coin_sequence", 2000, 16, Seq(0.5), Nil, 42),
      SimulationSpec(1, "coin_sequence", 2000, 16, Seq(0.7), Seq("T", "T", "T", "T", "T"), 43))
    val traces = new MCBattery(spark).simulate(specs)
    MCBattery.explodeTraces(traces)
      .groupBy(col("model_id"))
      .agg(
        avg(when(col("value") === "H", 1).otherwise(0)).as("heads_frac"),
        count(lit(1)).as("n_points"),
        countDistinct(col("sim_id")).as("n_sims"))
      .orderBy(col("model_id"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    SimQueries.queries ++ RelationalQueries.queries ++
      TextQueries.queries ++ DedupQueries.queries ++
      SimilarityQueries.queries ++ MultimodalQueries.queries ++
      EventQueries.queries ++ SketchQueries.queries ++ AuditQueries.queries

  /** For each key in queries, equivalent SQL runnable by DuckDB on the same
    * parquet tables. Omitted only for non-SQL-expressible ops (driver then
    * records a rows-only check).
    */
  def oracleSql: Map[String, String] =
    SimQueries.oracleSql ++ RelationalQueries.oracleSql ++
      TextQueries.oracleSql ++ DedupQueries.oracleSql ++
      SimilarityQueries.oracleSql ++ MultimodalQueries.oracleSql ++
      EventQueries.oracleSql ++ SketchQueries.oracleSql ++ AuditQueries.oracleSql
}
