package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // dev loop: SPARK_GRAFT_ONLY=q126,q41 restricts the dump (the
    // driver never sets it, so its runs always cover every query)
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = only match {
      case Some(ks) =>
        SparkEntry.queries.filter { case (n, _) => ks.exists(n.startsWith) }
      case None => SparkEntry.queries
    }
    // a query that throws must leave a VISIBLE artifact, not a silent
    // hole: round 5's seven failures surfaced only as absent rows in
    // the driver's correctness file (ADVICE r5) — failures.json names
    // every failed query with its error, and is written even when
    // empty so "no file" can't be confused with "no failures"
    val failures = collection.mutable.LinkedHashMap[String, String]()
    selected.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        failures(name) = String.valueOf(e.getMessage).take(500)
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      graft.ops.Dedup.unpersistCaches()
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
    Files.writeString(Paths.get(s"$outDir/failures.json"), failures
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}"))
    // exit 0 even on failures: the driver must still run its DuckDB
    // compare over the queries that DID dump (round 5 proved it
    // handles partial dumps); the failure signal is failures.json +
    // the stderr line, not the exit code
    if (failures.nonEmpty)
      System.err.println(
        s"[verify] ${failures.size}/${selected.size} queries FAILED: " +
          failures.keys.mkString(", "))
    spark.stop()
  }
}
