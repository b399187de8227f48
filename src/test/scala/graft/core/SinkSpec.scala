package graft.core

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Distributed sinks: per-model partitioned text (reference CSV format per
  * line) and partitioned parquet (array type preserved).
  */
class SinkSpec extends SparkTestBase {

  private val specs = Seq(
    SimulationSpec(0, "coin_sequence", 30, 5, Seq(0.5), Nil, 42),
    SimulationSpec(1, "random_walk", 20, 4, Seq(0.5), Nil, 43))

  test("writePartitionedText: one dir per model, one CSV line per trace") {
    val out = java.nio.file.Files.createTempDirectory("graft-ptext").toString
    val traces = new MCBattery(spark).simulate(specs)
    TraceSink.writePartitionedText(traces, out)
    val m0 = spark.read.text(s"$out/model_id=0")
    val m1 = spark.read.text(s"$out/model_id=1")
    assert(m0.count() == 30 && m1.count() == 20)
    assert(m0.head().getString(0).split(",").length == 5)
    assert(m1.head().getString(0).split(",").length == 4)
    // overwrite semantics (utils.py:19 "w" mode)
    TraceSink.writePartitionedText(traces, out)
    assert(spark.read.text(s"$out/model_id=0").count() == 30)
  }

  test("writeParquet round-trips the array column and partitions by model") {
    val out = java.nio.file.Files.createTempDirectory("graft-pparq").toString
    val traces = new MCBattery(spark).simulate(specs)
    TraceSink.writeParquet(traces, out)
    val back = spark.read.parquet(out)
    assert(back.count() == 50)
    val sizes = back.groupBy("model_id").agg(min(size(col("trace"))), max(size(col("trace"))))
      .collect().map(r => r.getInt(0) -> (r.getInt(1), r.getInt(2))).toMap
    assert(sizes == Map(0 -> (5, 5), 1 -> (4, 4)))
    // traces must be byte-identical through the round trip
    def dump(df: org.apache.spark.sql.DataFrame) =
      df.select(col("model_id"), col("sim_id"), concat_ws(",", col("trace")))
        .orderBy("model_id", "sim_id").collect().map(_.toSeq).toSeq
    assert(dump(back) == dump(traces))
  }
}
