package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Dumps `.explain("formatted")` for a named set of gate queries to
  * one file per query — the r14 optimization-round evidence artifact
  * (`plans/r14/<query>_before.txt` / `..._after.txt`).
  *
  *   sbt "runMain graft.PlanDump /root/testdata/sf0.01 plans/r14 before q1,q2"
  *
  * Uses the bench session shape (local[32], shuffle.partitions=32) so
  * the dumped plan is the one the bench actually runs, not the
  * PLANS.md local[4] shape.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val names: Seq[String] =
      if (args.length > 3 && args(3).nonEmpty) args(3).split(",").map(_.trim).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      Files.writeString(Paths.get(outDir, s"${name}_$suffix.txt"), plan.trim + "\n")
      System.err.println(s"[plandump] $name -> $outDir/${name}_$suffix.txt")
    }
    println(s"""{"plandump":${names.size},"out":"$outDir","suffix":"$suffix"}""")
    spark.stop()
  }
}
