package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Test-table access + cross-engine FP discipline helpers.
  *
  * The driver's correctness gate hash-compares Spark results against DuckDB
  * (`Verify.scala` → `CORRECTNESS_r{N}.json`), so any compared double must be
  * bit-identical across engines. Sums of doubles are order-dependent; the
  * fix used throughout the query battery: accumulate EXACTLY (cast inputs to
  * decimal, both engines sum decimals exactly), then convert to double in one
  * correctly-rounded final cast/division.
  */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.ts is parquet TIMESTAMP(NANOS) which Spark rejects by default;
    // read it as int64 nanoseconds instead (queries use `ts div 1000` where
    // the DuckDB oracle uses epoch_us(ts)).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTs(spark.read.parquet(s"$dir/$name.parquet"))
  }

  /** Engine-internal `ts` contract: int64 epoch NANOSECONDS. Driver test-data
    * generations have shipped events.ts both as parquet TIMESTAMP(NANOS)
    * (which the nanosAsLong flag reads as int64 nanos directly) and as
    * TIMESTAMP(MICROS) (which Spark reads as a timestamp type); fold the
    * timestamp form back to nanos so every query/stream sees ONE type. The
    * NTZ→LTZ cast interprets the naive value in the session timezone — all
    * entry points pin UTC, matching DuckDB's epoch_us(ts) reading of the
    * same naive parquet value.
    */
  def normalizeTs(df: DataFrame): DataFrame =
    if (!df.columns.contains("ts")) df
    else df.schema("ts").dataType match {
      case org.apache.spark.sql.types.TimestampType |
           org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts",
          unix_micros(col("ts").cast(org.apache.spark.sql.types.TimestampType)) * lit(1000L))
      case _ => df
    }

  /** Exact decimal sum of a double column, returned as double.
    * DuckDB equivalent: `CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE)`.
    */
  def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  /** Exact decimal average: decimal sum / count, one double division.
    * DuckDB: `CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE) / COUNT(x)`.
    * (Plain AVG is an order-dependent double accumulation in DuckDB.)
    */
  def davg(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double") / count(c)

  /** SQL text for [[dsum]]. */
  def sqlDsum(x: String, scale: Int = 2): String =
    s"CAST(SUM(CAST($x AS DECIMAL(18,$scale))) AS DOUBLE)"

  /** SQL text for [[davg]]. */
  def sqlDavg(x: String, scale: Int = 2): String =
    s"CAST(SUM(CAST($x AS DECIMAL(18,$scale))) AS DOUBLE) / COUNT($x)"
}
