package graft

import org.apache.spark.sql.functions._
import graft.operators.Tables

/** Source/sink format breadth (SURVEY §2.2 "Scans/Sinks"): the same data
  * round-trips through parquet, ORC, CSV and JSON with values preserved
  * (CSV/JSON via explicit schema — text formats don't carry one).
  */
class FormatSpec extends SparkTestBase {

  test("lineitem round-trips through orc, csv and json") {
    val src = Tables.t(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_partkey", "l_quantity", "l_returnflag")
    val base = java.nio.file.Files.createTempDirectory("graft-fmt").toString
    def fingerprint(df: org.apache.spark.sql.DataFrame) =
      df.agg(count(lit(1)), sum(col("l_orderkey")),
        sum(col("l_quantity").cast("decimal(18,2)")),
        countDistinct(col("l_returnflag"))).collect()(0).toSeq
    val want = fingerprint(src)

    src.write.mode("overwrite").orc(s"$base/orc")
    assert(fingerprint(spark.read.orc(s"$base/orc")) == want, "orc")

    src.write.mode("overwrite").option("header", "true").csv(s"$base/csv")
    val csvBack = spark.read.schema(src.schema).option("header", "true").csv(s"$base/csv")
    assert(fingerprint(csvBack) == want, "csv")

    src.write.mode("overwrite").json(s"$base/json")
    assert(fingerprint(spark.read.schema(src.schema).json(s"$base/json")) == want, "json")
  }
}
