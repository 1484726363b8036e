package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Event-time windowing over the events table — the batch form of the
  * streaming surface (SURVEY.md §2B "Streaming"); the reference only
  * batch-loads its event table (event-table.sql), so tumbling/sliding/
  * session analytics are engine extensions. The same expressions run
  * unchanged under readStream (see graft.streaming).
  *
  * Scale: window(ts, ...) is an ordinary groupBy on (window, keys) —
  * partial aggregation map-side, one small shuffle. session_window is
  * the exception: it needs a shuffle on user_id plus a per-key sort,
  * the same cost shape as any sessionization.
  */
object Events {

  /** Tumbling 1-hour windows per event type. */
  def tumbling(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("w.start").as("hour_start"), col("event_type"), col("n"),
        col("sum_value"))
      .orderBy(col("hour_start"), col("event_type"))

  /** Sliding 1-hour windows every 15 minutes (each event lands in 4). */
  def sliding(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("w.start").as("win_start"), col("n"), col("sum_value"))
      .orderBy(col("win_start"))

  /** Session windows with a 30-minute inactivity gap, per user.
    * A new session starts when the gap since the previous event is
    * >= 30 min; session end = last event + gap (Spark semantics). */
  def sessions(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"), col("sum_value"))
      .orderBy(col("user_id"), col("session_start"))
}
