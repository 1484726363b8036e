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
    * embedded delimiters and newlines (multiLine on read restores
    * them). */
  def writeAs(df: DataFrame, dir: String, format: String): Unit = {
    val w = df.write.mode("overwrite").format(format)
    (if (format == "csv") w.option("header", "true").option("escape", "\"")
     else w).save(dir)
  }

  /** Read `dir` in the given format with an explicit schema. */
  def readAs(spark: SparkSession, dir: String, format: String,
      schema: StructType): DataFrame = {
    val r = spark.read.format(format).schema(schema)
    (if (format == "csv")
       r.option("header", "true").option("escape", "\"")
         .option("multiLine", "true")
     else r).load(dir)
  }
}
