package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** JSONL corpus ingest — the wire format most raw text/crawl dumps
  * arrive in before they ever become parquet. Design goals at 100 TB:
  *
  *   - **Corrupt lines are DATA, not exceptions.** A crawl shard with a
  *     truncated final line or an interleaved garbage record must not
  *     kill a 1000-executor read (FAILFAST) or silently vanish
  *     (DROPMALFORMED). Both halves stay queryable: the good rows as
  *     typed columns, the rejects as raw lines with their source file —
  *     the quarantine a data-quality audit ([[graft.operators.AuditOps]])
  *     runs on.
  *   - **One text scan, codegen parse.** The split is expressed as
  *     `spark.read.text` + [[org.apache.spark.sql.functions.from_json]]
  *     (NULL on malformed) rather than the DataFrameReader's
  *     `_corrupt_record` column — the corrupt-column path cannot be
  *     filtered without caching the whole parse (Spark's documented
  *     internal-column restriction, SPARK-21610); `from_json` has no such
  *     restriction, stays inside whole-stage codegen, and lets BOTH
  *     halves derive from the same scan.
  *
  * A JSON line that parses but violates the minimal contract (required
  * fields null — e.g. a doc with no id) is quarantined too: "parsed but
  * unusable" rows poison downstream joins more quietly than syntax
  * errors do.
  */
object CorpusSource {

  /** Parse result: `good` carries the schema's columns plus
    * `source_file`; `quarantine` carries (raw_line, source_file, reason)
    * with reason ∈ {malformed_json, missing_required}.
    */
  final case class JsonlRead(good: DataFrame, quarantine: DataFrame)

  /** Read a JSONL directory/glob against an EXPLICIT schema (schema
    * inference is a second full pass at corpus scale — callers state
    * their contract). `required` names fields that must be non-null for
    * a row to count as good (default: none beyond JSON validity).
    */
  def readJsonl(spark: SparkSession, path: String, schema: StructType,
      required: Seq[String] = Nil): JsonlRead =
    parseJsonl(spark.read.text(path)
      .select(col("value"), input_file_name().as("source_file")),
      schema, required)

  /** The parse/quarantine core of [[readJsonl]] over an EXISTING
    * `(value, source_file)` line table — shared verbatim by the batch
    * reader above and the streaming ingest
    * ([[graft.streaming.StreamOps.ingestPipeline]] feeds it
    * `readStream.text` batches inside foreachBatch), so the two paths
    * cannot drift: one parser, one quarantine contract, spec-pinned once.
    */
  def parseJsonl(lines: DataFrame, schema: StructType,
      required: Seq[String] = Nil): JsonlRead = {
    require(schema.fieldNames.nonEmpty, "CorpusSource.parseJsonl: empty schema")
    require(!schema.fieldNames.contains("_corrupt_record"),
      "CorpusSource.parseJsonl: _corrupt_record is reserved for the parser")
    val missing = required.filterNot(schema.fieldNames.contains)
    require(missing.isEmpty,
      s"CorpusSource.parseJsonl: required fields not in schema: $missing")
    graft.operators.OpContract.requireCols(lines,
      "CorpusSource.parseJsonl", "value", "source_file")
    // PERMISSIVE from_json does NOT reliably null the whole struct on a
    // malformed line — a truncated record can surface the fields Jackson
    // managed to read before the syntax error. The in-struct corrupt
    // column is the contract: non-null iff the line was malformed. (The
    // file reader's SPARK-21610 can't-filter-corrupt-column restriction
    // does not apply to from_json.)
    val parseSchema = schema.add("_corrupt_record",
      org.apache.spark.sql.types.StringType)
    val parsed = lines
      .select(col("value"),
        col("source_file"),
        from_json(col("value"), parseSchema,
          Map("mode" -> "PERMISSIVE",
            "columnNameOfCorruptRecord" -> "_corrupt_record")).as("j"))
    // Blank lines (a common trailing artifact) are dropped silently:
    // they are not records.
    val nonBlank = parsed.filter(length(trim(col("value"))) > 0)
    val malformed = col("j").isNull || col("j._corrupt_record").isNotNull
    val reqOk = required.foldLeft(lit(true))((acc, f) => acc && col(s"j.$f").isNotNull)
    val good = nonBlank
      .filter(!malformed && reqOk)
      .select((schema.fieldNames.map(f => col(s"j.$f")) :+ col("source_file")): _*)
    val quarantine = nonBlank
      .filter(malformed || !reqOk)
      .select(col("value").as("raw_line"), col("source_file"),
        when(malformed, lit("malformed_json"))
          .otherwise(lit("missing_required")).as("reason"))
    JsonlRead(good, quarantine)
  }

  /** Write a DataFrame as JSONL text shards — `to_json` over the row
    * struct, one line per record, partitioned however `df` is (callers
    * repartition/sortWithinPartitions for layout; [[CorpusSink]] owns the
    * sharded-parquet publish path). Plain-text JSONL is the interchange
    * format for tokenizer trainers and external tools that don't read
    * parquet.
    */
  def writeJsonl(df: DataFrame, outDir: String): Unit =
    df.select(to_json(struct(df.columns.map(col): _*)).as("value"))
      .write.mode("overwrite").text(outDir)
}
