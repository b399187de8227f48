package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Clean slate: a stale per-query dump from a previous run would be
    // silently compared (and could pass) if this run's query throws before
    // overwriting it — and a dump from a since-RENAMED query would be
    // reported by the gate as a live rows-only result. Delete the
    // artifacts Verify owns: every current-query subdirectory plus
    // oracle_sql.json, AND any other subdirectory carrying a Spark
    // `_SUCCESS` write marker (an old query dump by construction). Never
    // the outDir wholesale, so a mistyped argument can't recursively wipe
    // an arbitrary directory tree. listFiles() is null for
    // unreadable/raced paths.
    def rmrf(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rmrf)
      f.delete()
    }
    val outRoot = new java.io.File(outDir)
    (SparkEntry.queries.keys.toSeq :+ "oracle_sql.json")
      .foreach(n => rmrf(new java.io.File(outRoot, n)))
    Option(outRoot.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && new java.io.File(f, "_SUCCESS").exists())
      .foreach(rmrf)
    outRoot.mkdirs()
    SparkEntry.queries.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
