package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Interchange-format source/sink surface beyond parquet and JDBC:
  * JSON-lines, CSV, and ORC, all through the same `spark.read`/`write`
  * machinery (splittable, schema-applied, pushdown where the format
  * supports it — ORC gets predicate pushdown and column pruning like
  * parquet; CSV/JSON get column pruning only, which is why parquet/ORC
  * stay the recommended at-scale layout and CSV/JSON are ingest
  * formats).
  *
  * CSV and JSON are schemaless on disk, so reads apply an explicit
  * schema — inference would both cost an extra pass over the data and
  * drift types (e.g. int-looking longs). FormatsSpec proves each
  * format round-trips the documents table byte-identically.
  */
object Formats {

  val Supported: Seq[String] = Seq("json", "csv", "orc")

  /** Write `df` under `dir` in the given format. CSV quotes/escapes
    * embedded delimiters and quotes, writes NULL as an explicit \N
    * token and the empty string as a quoted "" so the two stay
    * distinguishable on read (Spark's defaults collapse both to
    * null). */
  def writeAs(df: DataFrame, dir: String, format: String): Unit = {
    val w = df.write.mode("overwrite").format(format)
    (if (format == "csv")
       w.option("header", "true").option("escape", "\"")
         .option("nullValue", "\\N").option("emptyValue", "\"\"")
     else w).save(dir)
  }

  /** Read `dir` in the given format with an explicit schema.
    * `multiLine` is opt-in for CSV payloads with embedded newlines:
    * it forces whole-file parsing (non-splittable), so the default
    * keeps line-boundary splits — the at-scale ingest shape. */
  def readAs(spark: SparkSession, dir: String, format: String,
      schema: StructType, multiLine: Boolean = false): DataFrame = {
    val r = spark.read.format(format).schema(schema)
    (if (format == "csv")
       r.option("header", "true").option("escape", "\"")
         .option("nullValue", "\\N")
         .option("multiLine", multiLine.toString)
     else r).load(dir)
  }
}
