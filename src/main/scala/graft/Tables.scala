package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver testdata (TESTDATA.md / FIXTURES.md §B).
  *
  * One parquet file per table locally; at cluster scale each would be a
  * partitioned directory of many files — `spark.read.parquet` is already
  * splittable and nothing else in the engine would change. Readers go
  * through here so that a future swap to a JDBC source (the reference's
  * actual source, transfer_data_script.py:107-114) touches one seam.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = apply(s, d, "lineitem")

  /** events.ts is parquet TIMESTAMP(NANOS), which Spark 4 refuses to
    * read natively; with `spark.sql.legacy.parquet.nanosAsLong=true`
    * (set by Verify/Bench/tests) it surfaces as a nanos-since-epoch
    * long, converted here to a microsecond timestamp. Integer `div`
    * keeps the full 63-bit range (a double division would lose
    * precision above 2^53); the generated data has no sub-µs residue
    * so the truncation is lossless. */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{expr, timestamp_micros}
    val raw = apply(s, d, "events")
    if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw
  }
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
