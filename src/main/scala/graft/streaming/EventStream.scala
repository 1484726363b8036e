package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, StreamingQuery}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.Row

/** Structured Streaming variant of the event pipeline (SURVEY.md §7
  * step 5). The reference batch-loads its event table; the engine runs
  * the SAME aggregation expressions over readStream with a watermark
  * for late data. foreachBatch is the JDBC-sink adapter: each
  * micro-batch goes through Transfer.writeJdbc, giving the streaming
  * path the identical batched-write characteristics as the bulk path.
  *
  * Scale: state is bounded by the watermark (late events beyond 10
  * minutes are dropped from state); the tumbling-window agg keeps one
  * row of state per (window, event_type).
  */
object EventStream {

  val eventSchema: StructType = StructType.fromDDL(
    "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, " +
      "value DOUBLE, props STRING")

  /** Streaming tumbling-window aggregation with watermark — the
    * streaming twin of ops.Events.tumbling. */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("w.start").as("hour_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** File-source stream over a directory of event parquet/json files. */
  def readEventStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(eventSchema).parquet(dir)

  /** JDBC sink via foreachBatch: per micro-batch batched append
    * (streaming reuse of the bulk writer — same batchsize semantics). */
  def jdbcSink(agg: DataFrame, url: String, table: String,
      props: java.util.Properties): DataStreamWriter[Row] =
    agg.writeStream
      .outputMode(OutputMode.Update())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.etl.Transfer.writeJdbc(batch, url, table, props)
      }

  /** Memory-sink harness for synchronous testing: process everything
    * currently in the source, then stop. */
  def runOnce(agg: DataFrame, name: String): StreamingQuery = {
    val q = agg.writeStream
      .outputMode(OutputMode.Complete())
      .format("memory")
      .queryName(name)
      .start()
    q.processAllAvailable()
    q
  }
}
