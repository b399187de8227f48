package graft

import org.apache.spark.sql.SparkSession

/** Measurement probe (guide §1): for each named gate, separates
  * DRIVER-side cost (analysis + optimization + physical planning,
  * forced via `queryExecution.executedPlan`) from EXECUTION cost (the
  * noop-sink write that follows, re-using the just-planned DataFrame).
  * Both phases repeat `reps` times on freshly-constructed DataFrames —
  * the same work Bench's once() does, split at the plan boundary.
  *
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.Probe /root/testdata/sf0.1 3 q1,q2"
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 2
    val names: Seq[String] =
      if (args.length > 2 && args(2).nonEmpty) args(2).split(",").map(_.trim).toSeq
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
    spark.range(0, 1000000).selectExpr("sum(id)").collect()
    Seq("lineitem", "orders", "customer", "events", "documents", "embeddings")
      .foreach(t => spark.read.parquet(s"$sfDir/$t.parquet").count())
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val runs = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        df.queryExecution.executedPlan // force analyze/optimize/plan
        val t1 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val t2 = System.nanoTime()
        ((t1 - t0) / 1e9, (t2 - t1) / 1e9)
      }
      val plan = runs.map(_._1).min
      val exec = runs.map(_._2).min
      println(f"""{"probe":"$name","plan_s":$plan%.3f,"exec_s":$exec%.3f}""")
    }
    spark.stop()
  }
}
