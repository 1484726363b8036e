package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Behavioral analytics over the events stream — the cohort / funnel /
  * transition trio every product-analytics consumer of an event table
  * runs (the reference's event-table.sql:1-33 models exactly this kind
  * of Django analytics event; these are the queries that table exists
  * to answer).
  *
  * Determinism: every rate is an integer parts-per-million (`x * 1e6
  * div denom`) — no float division anywhere, so the DuckDB oracle
  * replays bit-identically.
  *
  * Scale shape: all three ops collapse raw events to per-user (or
  * per-user-week) aggregates FIRST, so each later exchange moves
  * aggregate rows, not events. Every window and join is keyed on
  * user_id or a grouping key — nothing sorts globally except the
  * final ≤ tens-of-rows funnel frame.
  */
object Behavior {

  /** Weekly cohort retention grid: users cohorted by the week of their
    * first event; for each (cohort_week, week_offset) the count of
    * cohort members active that week and the retention as integer ppm.
    * Distinct-per-week activity is computed once and reused for both
    * the cohort assignment and the activity join (one scan, two keyed
    * shuffles on user_id that AQE plans back-to-back). */
  def cohortRetention(spark: SparkSession, dir: String): DataFrame = {
    val activity = Tables.events(spark, dir)
      .select(col("user_id"), date_trunc("week", col("ts")).as("week"))
      .distinct()
    val cohorts = activity.groupBy(col("user_id"))
      .agg(min(col("week")).as("cohort_week"))
    val sizes = cohorts.groupBy(col("cohort_week"))
      .agg(count(lit(1)).as("cohort_size"))
    activity.join(cohorts, Seq("user_id"))
      .groupBy(col("cohort_week"),
        expr("datediff(week, cohort_week) div 7").as("week_offset"))
      .agg(count(lit(1)).as("active_users"))
      .join(sizes, Seq("cohort_week"))
      .select(col("cohort_week"), col("week_offset"), col("cohort_size"),
        col("active_users"),
        expr("active_users * 1000000 div cohort_size").as("retention_ppm"))
      .orderBy(col("cohort_week"), col("week_offset"), col("cohort_size"),
        col("active_users"), col("retention_ppm"))
  }

  /** Ordered 3-step funnel (signup → view → purchase, each step
    * strictly after the previous one's first completion). Classic
    * iterated min-timestamp construction: step N's candidate events
    * join the step-N−1 completion times and keep only later events.
    * All three joins share the user_id key, so the shuffle
    * partitioning is planned once and reused. Output is one row per
    * step with the surviving user count and the step-over-step
    * conversion in ppm (step 1 = 1,000,000 by definition). */
  def funnel(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("ts"))
    val s1 = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    val s2 = ev.filter(col("event_type") === "view")
      .join(s1, Seq("user_id")).filter(col("ts") > col("t1"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
    val s3 = ev.filter(col("event_type") === "purchase")
      .join(s2, Seq("user_id")).filter(col("ts") > col("t2"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
    def stage(df: DataFrame, step: Long, name: String): DataFrame =
      df.agg(count(lit(1)).as("users"))
        .select(lit(step).as("step"), lit(name).as("stage"), col("users"))
    // 3-row frame: the unpartitioned window is a deliberate driver-size
    // sort, not a scale hazard
    val w = Window.orderBy(col("step"))
    stage(s1, 1L, "signup")
      .unionAll(stage(s2, 2L, "view"))
      .unionAll(stage(s3, 3L, "purchase"))
      .withColumn("prev_users",
        coalesce(lag(col("users"), 1).over(w), col("users")))
      // prev_users = 0 forces users = 0 (later steps filter on earlier
      // ones); define 0/0 conversion as 100% to keep ANSI div total
      .withColumn("conv_ppm", expr(
        "CASE WHEN prev_users = 0 THEN CAST(1000000 AS BIGINT) " +
        "ELSE users * 1000000 div prev_users END"))
      .drop("prev_users")
      .orderBy(col("step"), col("stage"), col("users"), col("conv_ppm"))
  }

  /** Event-type transition matrix (first-order Markov counts): for
    * each user's event sequence ordered by (ts, event_id) — event_id
    * breaks timestamp ties, making the sequence total — count
    * from→to transitions and the per-from-state probability in ppm.
    * One keyed window over user_id, then a 25-row aggregate; the
    * denominator is a second tiny window over the aggregated matrix,
    * not the raw events. */
  def transitions(spark: SparkSession, dir: String): DataFrame = {
    val pairs = transitionPairs(Tables.events(spark, dir))
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    val denom = Window.partitionBy(col("from_type"))
    pairs
      .withColumn("from_total", sum(col("n")).over(denom))
      .withColumn("prob_ppm", expr("n * 1000000 div from_total"))
      .drop("from_total")
      .orderBy(col("from_type"), col("to_type"), col("n"), col("prob_ppm"))
  }

  /** Top event paths: the 10 most common 3-event sequences across all
    * user timelines (2nd-order extension of [[transitions]]) — the
    * clickstream "what do users actually do" query. Two window leads
    * inside the user partitioning, one count aggregate over ≤|types|³
    * keys, deterministic (count desc, path asc) cut. */
  def topPaths(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    val seq = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .select(col("event_type").as("t1"),
        lead(col("event_type"), 1).over(seq).as("t2"),
        lead(col("event_type"), 2).over(seq).as("t3"))
      .filter(col("t3").isNotNull)
      .groupBy(col("t1"), col("t2"), col("t3"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("t1"), col("t2"), col("t3"))
      .limit(k)
  }

  /** The raw from→to pair stage of [[transitions]], exposed so the
    * streaming twin (EventStream.transitionPairsStateful) can assert
    * stream==batch on the pair multiset before aggregation. */
  def transitionPairs(ev: DataFrame): DataFrame = {
    val seq = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    ev.select(col("user_id"), col("event_type").as("from_type"),
        lead(col("event_type"), 1).over(seq).as("to_type"))
      .filter(col("to_type").isNotNull)
  }
}
