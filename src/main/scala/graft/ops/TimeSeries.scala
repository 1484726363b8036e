package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series reshaping over the events table — regularization
  * (gap-fill + last-observation-carried-forward) and interval
  * concurrency, the two ops a metrics/monitoring consumer of an event
  * stream runs constantly and plain SQL engines make painful.
  *
  * Scale shape: both ops aggregate the raw stream down to per-hour /
  * per-session rows FIRST, so every later exchange moves aggregate
  * rows, not events. The spine explode is narrow (generated from a
  * 2-column per-user min/max), and all windows are keyed (user_id or
  * day) — nothing ever sorts globally.
  */
object TimeSeries {

  /** Hourly per-user aggregate of events: the "observed" series. */
  private def hourly(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("hour"))
      .agg(sum(col("value").cast("decimal(18,2)")).as("sv"),
        count(lit(1)).as("n_events"))

  /** Gap-fill + LOCF: densify each user's hourly series over their own
    * [min, max] hour span and carry the last observed hourly sum
    * forward into silent hours. The carried value stays DECIMAL until
    * the final cast so the fill replays exactly in DuckDB. The first
    * spine hour per user is observed by construction (the span starts
    * at an observed min), so `filled_value` is never NULL.
    *
    * ROLE: this (q87) is the ORACLE EXEMPLAR of the fill — the
    * simplest whole-span form, kept because its DuckDB replay is the
    * cleanest correctness anchor for LOCF semantics. It is NOT the
    * production shape: the spine is span×users, and a years-long span
    * over a mostly-silent key amplifies rows ~10^4×. Production runs
    * [[gapFillLocfCapped]] (q143), whose trailing-window spine is
    * bounded at users×capHours and whose fills are proven identical
    * to this one inside the window (TimeSeriesSpec). If this query's
    * bench cost ever grows with the data's time span, cap it — the
    * capped twin is the shape that survives 100 TB. */
  def gapFillLocf(spark: SparkSession, dir: String): DataFrame = {
    // r15 optimization: the dense spine + (user, hour) shuffle join +
    // dense LOCF window is replaced by SEGMENT EXPLODE — a lead()
    // window over the small observed hourly table pairs each
    // observation with its successor, and the silent interior hours
    // of each segment are generated directly carrying the segment's
    // own sv (exactly what the dense running carry would have filled
    // them with; span endpoints are observed so every dense hour is
    // covered). The only remaining fact-sized work is the hourly
    // aggregate and the final sort: the (user, hour)-keyed exchange
    // of the dense frame and its window pass disappear.
    val h = hourly(spark, dir)
    val w = Window.partitionBy(col("user_id")).orderBy(col("hour"))
    // hourly-sized (NOT event-sized) two-consumer frame: without the
    // persist each union branch re-scans events and re-aggregates
    // (the q146 multi-consumer rule; recompute here is fact-sized,
    // unlike the narrow q149 shingle explode)
    val seg = graft.ops.Dedup.register(
      h.withColumn("nh", lead(col("hour"), 1).over(w))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val observed = seg.select(col("user_id"), col("hour"),
      col("n_events"), col("sv").cast("double").as("filled_value"))
    val interior = seg.filter(col("nh").isNotNull &&
        col("nh") > col("hour") + expr("interval 1 hour"))
      .select(col("user_id"),
        explode(sequence(col("hour") + expr("interval 1 hour"),
          col("nh") - expr("interval 1 hour"), expr("interval 1 hour")))
          .as("hour"),
        lit(0L).as("n_events"),
        col("sv").cast("double").as("filled_value"))
    observed.union(interior)
      .orderBy(col("user_id"), col("hour"), col("n_events"),
        col("filled_value"))
  }

  /** q143: the grain-cap fix q87's scale note prescribes — densify
    * only the TRAILING `capHours` hours of each user's span, seeding
    * LOCF with the user's latest observation strictly BEFORE the
    * capped window, so fills inside the window are identical to what
    * the uncapped fill produces for the same hours. This bounds the
    * spine at users × capHours rows regardless of span — q87's spine
    * is span × users and amplifies ~1e4× on mostly-silent keys with
    * years-long spans; a 100 TB dashboard fill runs THIS shape.
    *
    * Scale shape: one keyed bounds aggregate, one carry aggregate
    * (max_by over the pre-window rows, keyed), one bounded explode,
    * one keyed LOCF window — nothing global, nothing span-sized. */
  def gapFillLocfCapped(spark: SparkSession, dir: String,
      capHours: Int = 72): DataFrame = {
    val h = hourly(spark, dir)
    val b = h.groupBy(col("user_id"))
      .agg(min(col("hour")).as("mn"), max(col("hour")).as("mx"))
      .select(col("user_id"),
        greatest(col("mn"),
          col("mx") - expr(s"interval ${capHours - 1} hours")).as("w0"),
        col("mx"))
    val spine = b.select(col("user_id"),
      explode(sequence(col("w0"), col("mx"), expr("interval 1 hour")))
        .as("hour"))
    // carry-in: latest observed hourly sum strictly before the capped
    // window (hour is unique per user in `hourly`, so max_by is
    // deterministic); stays DECIMAL until the final cast, like q87
    val carry = h.join(b.select(col("user_id"), col("w0")), Seq("user_id"))
      .filter(col("hour") < col("w0"))
      .groupBy(col("user_id"))
      .agg(max_by(col("sv"), col("hour")).as("carry_sv"))
    val locf = Window.partitionBy(col("user_id")).orderBy(col("hour"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(h, Seq("user_id", "hour"), "left")
      .join(carry, Seq("user_id"), "left")
      .select(col("user_id"), col("hour"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        coalesce(last(col("sv"), ignoreNulls = true).over(locf),
          col("carry_sv")).cast("double").as("filled_value"))
      .orderBy(col("user_id"), col("hour"), col("n_events"),
        col("filled_value"))
  }

  /** 30-minute-gap sessions as [start, last event + 30 min) intervals
    * — the same session_window semantics as Events.sessions. */
  private def sessionIntervals(spark: SparkSession, dir: String): DataFrame =
    sessionIntervalsOf(Tables.events(spark, dir))

  /** Same, over any (user_id, ts) event frame. */
  def sessionIntervalsOf(ev: DataFrame): DataFrame =
    ev.groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("s_start"), col("w.end").as("s_end"))

  /** Time-weighted average value (TWAP) per user-day over the
    * irregularly-sampled event stream: each observation is weighted by
    * its holding duration (micros until the user's next event that
    * day); the last observation of a day carries no weight. The
    * numerator Σ(v·dt) accumulates exactly in DECIMAL(38,0) over
    * micro-unit values × micro-second durations, and the final TWAP is
    * one correctly-rounded double division — the deterministic version
    * of the metric every monitoring system computes approximately.
    *
    * Scale shape: one user_id-keyed window forms durations, then one
    * (user, day) aggregate; nothing global. */
  def twap(spark: SparkSession, dir: String): DataFrame = {
    val seq = Window.partitionBy(col("user_id"), col("day"))
      .orderBy(col("ts"), col("event_id"))
    val obs = Tables.events(spark, dir)
      .withColumn("day", date_trunc("day", col("ts")))
      .select(col("user_id"), col("day"),
        (col("value").cast("decimal(18,6)") * 1000000).cast("long")
          .as("v_micro"),
        (lead(unix_micros(col("ts")), 1).over(seq) -
          unix_micros(col("ts"))).as("dt_us"))
      .filter(col("dt_us").isNotNull)
    // twap_micro is an exact integer micro-unit rate (truncating div,
    // positive operands — the integer-ppm rule): the prior
    // round(num/sum_dt, 6) double form hit the cross-engine
    // ROUND-of-double boundary at sf0.1 (8 cells exactly on a
    // x.xxxxxx5 quotient — Spark rounds the double's exact binary
    // expansion HALF_UP, DuckDB rounds via a 1e6 multiply that
    // carries its own ulp), the first bug the round-11 full-sf0.1
    // sweep caught.
    obs.groupBy(col("user_id"), col("day"))
      .agg(count(lit(1)).as("n_weighted"),
        sum(col("dt_us")).as("sum_dt"),
        sum((col("v_micro").cast("decimal(38,0)") * col("dt_us")))
          .as("num"))
      .select(col("user_id"), col("day"), col("n_weighted"),
        when(col("sum_dt") === 0, lit(null).cast("long"))
          .otherwise(expr("CAST(num div sum_dt AS BIGINT)"))
          .as("twap_micro"))
      .orderBy(col("user_id"), col("day"), col("n_weighted"),
        col("twap_micro"))
  }

  /** Inter-arrival burstiness per user: the squared coefficient of
    * variation of the gaps between consecutive events — CV² ≈ 1 for a
    * Poisson process, ≫ 1 for bursty traffic, ≈ 0 for a metronome.
    * Gap moments accumulate exactly (micros in DECIMAL(38,0)), and
    *   CV² = n·(n·Σd² − (Σd)²) / ((n−1)·(Σd)²)
    * is one correctly-rounded double division; the mean gap is an
    * exact integer div. One keyed window + one keyed aggregate. */
  def burstiness(spark: SparkSession, dir: String): DataFrame = {
    val seq = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val gaps = Tables.events(spark, dir)
      .select(col("user_id"),
        (lead(unix_micros(col("ts")), 1).over(seq) -
          unix_micros(col("ts"))).as("dt"))
      .filter(col("dt").isNotNull)
    def d(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    gaps.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"), sum(d(col("dt"))).as("s"),
        sum(d(col("dt")) * d(col("dt"))).as("ss"))
      .filter(col("n") >= 2 && col("s") > 0)
      .select(col("user_id"), col("n").as("n_gaps"),
        expr("CAST(s div n AS BIGINT)").as("mean_gap_us"),
        round(((col("n") * col("ss") - col("s") * col("s")) * col("n"))
          .cast("double") /
          ((col("n") - 1) * col("s") * col("s")).cast("double"), 6)
          .as("cv2"))
      .orderBy(col("user_id"), col("n_gaps"), col("mean_gap_us"),
        col("cv2"))
  }

  /** Floored running balance — the inventory/credit-ledger fold
    * `bal_t = max(0, bal_{t-1} + delta_t)` per user, which NO window
    * frame can express (the floor makes each step depend on the
    * clamped previous step, not on any prefix aggregate). This is the
    * showcase for the typed Dataset API: `flatMapSortedGroups` hands
    * each user's events in (ts, event_id) order as a lazy iterator, so
    * the group is never materialized — Spark's secondary sort does the
    * ordering inside the exchange and the fold is O(1) memory.
    *
    * Deltas are micro-units centered at 50 (the generated value mean)
    * so the balance genuinely hits the floor. Oracle: per-user
    * recursive CTE replaying the same fold (the q65 WITH RECURSIVE
    * pattern).
    *
    * Scale shape: one keyed exchange (user_id), sort within
    * partitions, streaming fold — the same cost envelope as any
    * sessionization; no per-group in-memory buffering. */
  def cappedBalance(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("tsm"),
        col("event_id"),
        ((col("value").cast("decimal(18,6)") * 1000000).cast("long") -
          50000000L).as("delta_micro"))
      .as[(Long, Long, Long, Long)]
    ev.groupByKey(_._1)
      .flatMapSortedGroups(col("tsm"), col("event_id")) { (u, it) =>
        var bal = 0L
        it.map { case (_, _, eid, d) =>
          bal = math.max(0L, bal + d)
          (u, eid, d, bal)
        }
      }
      .toDF("user_id", "event_id", "delta_micro", "balance_micro")
      .orderBy(col("user_id"), col("event_id"), col("delta_micro"),
        col("balance_micro"))
  }

  /** Integer EWMA activity score (q162): exponential smoothing of
    * each user's event-value stream with per-event decay 7/8:
    *   s_t = (s_{t-1} · 7) div 8 + v_t   (micro-units),
    * reporting each user's event count and FINAL smoothed score — the
    * recency-weighted activity signal (recent events dominate, old
    * mass decays geometrically) behind engagement scoring and
    * freshness-weighted sampling. Like [[cappedBalance]] this is a
    * sequential fold no window frame expresses (the decay compounds
    * per event); flatMapSortedGroups streams each user's events in
    * (ts, event_id) order with one long of state. Division is
    * TRUNCATING in all three places (Scala `/`, Spark `div`, DuckDB
    * `//` on integers — the round-5 rule), so the fold replays
    * bit-exactly in the recursive-CTE oracle.
    *
    * Scale shape: one shuffle on user_id with secondary sort; state
    * is O(1) per key; output is |users| rows. */
  def ewmaActivity(spark: SparkSession, dir: String): DataFrame =
    ewmaActivityOn(Tables.events(spark, dir))

  /** Frame-based core of [[ewmaActivity]] (needs user_id, ts,
    * event_id, value). */
  def ewmaActivityOn(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val ev = events
      .select(col("user_id"), unix_micros(col("ts")).as("tsm"),
        col("event_id"),
        (col("value").cast("decimal(18,6)") * 1000000).cast("long").as("v"))
      .as[(Long, Long, Long, Long)]
    ev.groupByKey(_._1)
      .flatMapSortedGroups(col("tsm"), col("event_id")) { (u, it) =>
        var s = 0L
        var n = 0L
        it.foreach { case (_, _, _, v) => s = s * 7 / 8 + v; n += 1 }
        Iterator.single((u, n, s))
      }
      .toDF("user_id", "n_events", "ewma_micro")
      .orderBy(col("user_id"), col("n_events"), col("ewma_micro"))
  }

  /** DuckDB oracle for [[ewmaActivity]]: per-key recursive CTE
    * stepping a row_number index (the q105 pattern), final row per
    * user. */
  val ewmaActivityOracleSql: String =
    """WITH RECURSIVE seq AS (
      |  SELECT user_id, event_id,
      |    CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS v,
      |    ROW_NUMBER() OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) AS i,
      |    COUNT(*) OVER (PARTITION BY user_id) AS n
      |  FROM events),
      |fold AS (
      |  SELECT user_id, i, n, v AS s FROM seq WHERE i = 1
      |  UNION ALL
      |  SELECT s.user_id, s.i, s.n, (f.s * 7) // 8 + s.v
      |  FROM fold f JOIN seq s
      |    ON s.user_id = f.user_id AND s.i = f.i + 1)
      |SELECT user_id, CAST(n AS BIGINT) AS n_events,
      |  CAST(s AS BIGINT) AS ewma_micro
      |FROM fold WHERE i = n
      |ORDER BY user_id, n_events, ewma_micro""".stripMargin

  /** Chained event throttle (true rate limiting): per (user, type),
    * keep an event iff it is ≥ 5 minutes after the LAST KEPT event —
    * the state references kept rows, not raw predecessors, so a burst
    * admits exactly one event per window no matter its length. Like
    * [[cappedBalance]] this is a sequential fold no window frame can
    * express (plain `lag` debouncing would re-admit the 3rd event of
    * a 3-event burst); flatMapSortedGroups streams each key's events
    * in order with one timestamp of state. Oracle: per-key recursive
    * CTE carrying last_kept. */
  def eventThrottle(spark: SparkSession, dir: String,
      minGapMin: Int = 5): DataFrame = {
    import spark.implicits._
    val gapUs = minGapMin * 60L * 1000000L
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("tsm"), col("event_id"))
      .as[(Long, String, Long, Long)]
    ev.groupByKey(e => (e._1, e._2))
      .flatMapSortedGroups(col("tsm"), col("event_id")) { (key, it) =>
        var lastKept = Long.MinValue
        it.flatMap { case (_, _, tsm, eid) =>
          if (lastKept == Long.MinValue || tsm - lastKept >= gapUs) {
            lastKept = tsm
            Some((key._1, key._2, eid))
          } else None
        }
      }
      .toDF("user_id", "event_type", "event_id")
      .orderBy(col("user_id"), col("event_type"), col("event_id"))
  }

  /** CUSUM drift detection over the per-type daily value series, with
    * the running statistic kept exact by multiplying through by the
    * series length: the textbook CUSUM S_t = Σ_{i≤t}(x_i − μ) with
    * μ = Σx/T becomes
    *   cusum_scaled_t = T · Σ_{i≤t} x_i  −  t · Σx
    * — pure BIGINT arithmetic over micro-units (value · 1e6), no
    * rational mean ever materialized, so the oracle replays exactly.
    * A sustained level shift shows as a monotone run in cusum_scaled;
    * the peak |value| locates the change point.
    *
    * Scale shape: events collapse to (type, day) totals first (one
    * keyed exchange of daily rows); the running windows run per type
    * over days — thousands of rows per partition at any horizon, not
    * events. */
  def cusumDrift(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(sum((col("value").cast("decimal(18,6)") * 1000000).cast("long"))
        .as("d_micro"))
    val byType = Window.partitionBy(col("event_type"))
    val run = byType.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily
      .withColumn("t_len", count(lit(1)).over(byType))
      .withColumn("total", sum(col("d_micro")).over(byType))
      .withColumn("run_sum", sum(col("d_micro")).over(run))
      .withColumn("t_idx", row_number().over(byType.orderBy(col("day"))))
      .select(col("event_type"), col("day"), col("d_micro"),
        (col("t_len") * col("run_sum") - col("t_idx") * col("total"))
          .as("cusum_scaled"))
      .orderBy(col("event_type"), col("day"), col("d_micro"),
        col("cusum_scaled"))
  }

  /** Per-day session concurrency via the classic +1/−1 sweep: clip
    * each session to day boundaries, emit a start (+1) and end (−1)
    * point per segment, running-sum within the day. Intervals are
    * half-open, so at an identical instant ends are processed before
    * starts (ORDER BY t, delta) — back-to-back sessions never count
    * as overlapping. The per-day MAX of the running count is
    * insensitive to tie order within equal (t, delta) groups, which
    * is what makes it oracle-safe.
    *
    * Scale note: the sweep sorts one partition PER DAY — measured
    * fine at 10x shared-day load (0.62 → 1.45 s, BASELINE.md r5); a
    * day holding billions of points would want the hierarchical form
    * (net deltas pre-aggregated per (day, bucket), prefix-summed
    * across buckets, sweep within) — same answer, bounded partitions. */
  def dailyConcurrency(spark: SparkSession, dir: String): DataFrame =
    dailyConcurrencyOf(sessionIntervals(spark, dir))

  /** Core of q88 over any (s_start, s_end) interval table — exposed
    * so the scale rehearsal can drive it with a 10x session load. */
  def dailyConcurrencyOf(intervals: DataFrame): DataFrame = {
    val segs = intervals
      .select(col("s_start"), col("s_end"),
        explode(sequence(date_trunc("day", col("s_start")),
          date_trunc("day", col("s_end")), expr("interval 1 day"))).as("day"))
    val clip = segs.select(col("day"),
      greatest(col("s_start"), col("day")).as("cs"),
      least(col("s_end"), col("day") + expr("interval 1 day")).as("ce"))
    val pts = clip.select(col("day"), col("cs").as("t"), lit(1L).as("delta"))
      .unionAll(clip.select(col("day"), col("ce").as("t"), lit(-1L).as("delta")))
    val sweep = Window.partitionBy(col("day")).orderBy(col("t"), col("delta"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    pts.withColumn("c", sum(col("delta")).over(sweep))
      .groupBy(col("day"))
      .agg(sum(when(col("delta") === 1L, 1L).otherwise(0L)).as("n_sessions"),
        max(col("c")).as("max_concurrent"))
      .orderBy(col("day"), col("n_sessions"), col("max_concurrent"))
  }

  /** Interval-overlap self-join: pairs of DIFFERENT users whose
    * 30-minute-gap sessions starting the same day overlap in time,
    * with the exact overlap duration in µs — the "who was on together"
    * join behind co-occurrence and abuse-correlation analysis, and
    * the one join type (range × range) the relational family (q06–q60)
    * doesn't cover. Session ends carry session_window's +30 min gap
    * padding, so "overlap" means within-one-gap concurrency, matching
    * q30's session semantics exactly.
    *
    * Scale shape: the join is EQUI on the day key with the two range
    * conditions as a residual filter — a hash join whose fan-out is
    * bounded by per-day session count (the daily-concurrency audit
    * q88 reports exactly the quantity that governs it), never a
    * nested loop over the corpus. Same-user pairs can't overlap
    * (session windows are disjoint per user), so user_a < user_b
    * loses nothing. */
  def overlappingSessions(spark: SparkSession, dir: String): DataFrame =
    overlappingSessionsOf(sessionsWithDay(spark, dir))

  private def sessionsWithDay(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(session_window(col("ts"), "30 minutes").as("w"),
        col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("w.start").as("ss"), col("w.end").as("se"),
        date_trunc("day", col("w.start")).as("day"))

  /** Query entry (q141): the overlap report for the corpus's FIRST
    * calendar day — the operational grain this join actually runs at
    * (a dashboard reports per day; the all-history pair space over a
    * synthetic corpus where ~every user is active ~every day is
    * millions of rows of noise, measured 6.4M pairs at sf0.1). The
    * day filter lands on the SESSION table before the join, so the
    * join input shrinks with the scope, not just the output. */
  def sessionOverlapDay(spark: SparkSession, dir: String): DataFrame = {
    val s = sessionsWithDay(spark, dir)
    val d0 = s.agg(min(col("day")).as("d0"))
    overlappingSessionsOf(
      s.crossJoin(broadcast(d0)).filter(col("day") === col("d0"))
        .drop("d0"))
  }

  /** Query entry (q142): interval-BUCKETED session overlap — the
    * grain-free generalization that lifts q141's day-scope caveat:
    * sessions crossing midnight pair correctly because each session
    * emits one row per coverage bucket (day) it TOUCHES, the pair
    * join is equi on the bucket with the range conditions as a
    * residual, and pairs found in several buckets collapse to one by
    * a distinct on the session-pair tuple BEFORE aggregation. Scope:
    * sessions starting within the corpus's first two days — wide
    * enough to contain cross-midnight pairs, bounded enough for a
    * report (q141's scoping lesson: the filter shrinks the join
    * input, not just the output).
    *
    * Scale shape: identical to q141's — a bucket-keyed hash join with
    * per-bucket fan-out bounded by concurrent sessions (q88's
    * quantity); the dedup shuffle is keyed by the true pair tuple,
    * a small multiple of the pair count (sessions rarely span many
    * buckets at day grain; shrink the bucket for denser spans). */
  def sessionOverlapBucketed(spark: SparkSession, dir: String): DataFrame = {
    val s = sessionsWithDay(spark, dir)
    val d0 = s.agg(min(col("day")).as("d0"))
    val scoped = s.crossJoin(broadcast(d0))
      .filter(col("day") <= col("d0") + expr("interval 1 day"))
      .select(col("user_id"), col("ss"), col("se"))
    overlappingSessionsBucketed(scoped)
      .orderBy(col("user_a"), col("user_b"), col("n_overlaps"),
        col("total_overlap_us"))
  }

  /** Core of q142, taking any (user_id, ss, se) session table: bucket
    * decomposition → equi join on bucket + range residual → pair
    * dedup → per-pair aggregate. Exposed separately so specs can
    * plant cross-boundary fixtures. */
  def overlappingSessionsBucketed(s: DataFrame): DataFrame = {
    val withB = s.select(col("user_id"), col("ss"), col("se"),
      explode(sequence(date_trunc("day", col("ss")),
        date_trunc("day", col("se")), expr("interval 1 day"))).as("bucket"))
    val a = withB.select(col("bucket"), col("user_id").as("user_a"),
      col("ss").as("sa"), col("se").as("ea"))
    val b = withB.select(col("bucket"), col("user_id").as("user_b"),
      col("ss").as("sb"), col("se").as("eb"))
    a.join(b, Seq("bucket"))
      .filter(col("user_a") < col("user_b") &&
        col("sa") < col("eb") && col("sb") < col("ea"))
      // a pair whose overlap spans k buckets surfaced k times: dedup
      // on the full session-pair tuple, THEN aggregate
      .select(col("user_a"), col("sa"), col("ea"),
        col("user_b"), col("sb"), col("eb"))
      .distinct()
      .groupBy(col("user_a"), col("user_b"))
      .agg(count(lit(1)).as("n_overlaps"),
        sum(unix_micros(least(col("ea"), col("eb"))) -
          unix_micros(greatest(col("sa"), col("sb"))))
          .as("total_overlap_us"))
  }

  private def overlappingSessionsOf(s: DataFrame): DataFrame = {
    val a = s.select(col("day"), col("user_id").as("user_a"),
      col("ss").as("sa"), col("se").as("ea"))
    val b = s.select(col("day"), col("user_id").as("user_b"),
      col("ss").as("sb"), col("se").as("eb"))
    a.join(b, Seq("day"))
      .filter(col("user_a") < col("user_b") &&
        col("sa") < col("eb") && col("sb") < col("ea"))
      .select(col("day"), col("user_a"), col("user_b"),
        (unix_micros(least(col("ea"), col("eb"))) -
          unix_micros(greatest(col("sa"), col("sb")))).as("overlap_us"))
      // pair-grain aggregate: bounds the output by distinct pairs (the
      // raw join result is quadratic in daily sessions) and puts a
      // shuffle stage under the final sort, so the sort's sampling
      // pass reads the materialized aggregate instead of re-running
      // the join (the q126 orderBy hazard)
      .groupBy(col("day"), col("user_a"), col("user_b"))
      .agg(count(lit(1)).as("n_overlaps"),
        sum(col("overlap_us")).as("total_overlap_us"))
      .orderBy(col("day"), col("user_a"), col("user_b"),
        col("n_overlaps"), col("total_overlap_us"))
  }

  /** Lag-k autocorrelation (k = 1..6) of the monthly order-count
    * series per priority — the seasonality probe run before choosing
    * a forecasting model or a drift-detector window. The series is
    * gap-FILLED on a shared global month spine (a missing month is a
    * real zero, not a missing observation; skipping it would splice
    * non-adjacent months into "consecutive" lag pairs).
    *
    * Determinism: counts are integers, so the mean is the rational
    * S/n and centering cross-multiplies to n-scaled moments —
    *   num_k = Σ_i (n·x_i − S)(n·x_{i+k} − S),  den = Σ_i (n·x_i − S)²
    * accumulated exactly in DECIMAL(38,0); acf = round(num/den, 6) is
    * the single IEEE fold, symbol-identical in DuckDB.
    *
    * Scale shape: the per-(priority, month) count is the only
    * corpus-sized aggregate; everything after runs on the
    * groups × months table (bounded by calendar span), with the lag
    * pairing an explode(1..6) + month-key self-join on that tiny
    * frame. */
  def autocorrelation(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir).select(col("o_orderpriority").as("p"),
      (year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
        .cast("long").as("m"))
    val counts = o.groupBy(col("p"), col("m")).agg(count(lit(1)).as("cnt"))
    val bounds = o.agg(min(col("m")).as("m0"), max(col("m")).as("m1"))
    val spine = counts.select(col("p")).distinct()
      .crossJoin(broadcast(bounds))
      .select(col("p"), explode(sequence(col("m0"), col("m1"))).as("m"))
    val x = spine.join(counts, Seq("p", "m"), "left")
      .select(col("p"), col("m"),
        coalesce(col("cnt"), lit(0L)).as("x"))
    val s = x.groupBy(col("p"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("s"))
    val xs = x.join(broadcast(s), Seq("p"))
      .select(col("p"), col("m"),
        (col("n") * col("x") - col("s")).cast("decimal(38,0)").as("cx"))
    val den = xs.groupBy(col("p"))
      .agg(sum(col("cx") * col("cx")).as("den"))
    val b = xs.select(col("p").as("bp"), col("m").as("bm"),
      col("cx").as("bcx"))
    val pairs = xs
      .withColumn("lag_k", explode(sequence(lit(1L), lit(6L))))
      .join(b, col("bp") === col("p") && col("bm") === col("m") + col("lag_k"))
      .groupBy(col("p"), col("lag_k"))
      .agg(sum(col("cx") * col("bcx")).as("num"))
    pairs.join(broadcast(den), Seq("p")).join(broadcast(s), Seq("p"))
      .select(col("p").as("o_orderpriority"), col("lag_k"),
        col("n").as("n_months"),
        round(col("num").cast("double") / col("den").cast("double"), 6)
          .as("acf"))
      .orderBy(col("o_orderpriority"), col("lag_k"), col("n_months"),
        col("acf"))
  }

  /** Linear-interpolation resampling (q180): densify each user's
    * hourly series over their own span — like the q87 LOCF fill, but
    * silent hours take the LINE between the surrounding observations
    * instead of the carry:
    *   v(t) = v0 + (v1 − v0)·(t − t0) div (t1 − t0)
    * in exact micro-units with truncating integer division (identical
    * in both engines for either sign of the slope — the round-5 `//`
    * finding), so the resample replays bit-exactly with no float
    * interpolation at all. Span endpoints are observed by
    * construction, so (t0, v0) and (t1, v1) always exist and
    * t1 − t0 = 0 only on observed rows, which take their own value.
    *
    * Scale shape: q87's spine (the oracle exemplar — the q143
    * grain-cap applies verbatim if the span grows), one user-keyed
    * window in each direction; the (t0,v0)/(t1,v1) pairs ride single
    * structs so a carried pair can never mix two observations (the
    * AsOf struct-atomicity rule). */
  def linearInterp(spark: SparkSession, dir: String): DataFrame =
    linearInterpEv(Tables.events(spark, dir))

  /** Hourly-aggregate + interpolate over an events frame (needs
    * user_id, ts, value) — the 10x rehearsal entry point. */
  def linearInterpEv(ev: DataFrame): DataFrame =
    linearInterpOf(ev
      .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("hour"))
      .agg(sum(col("value").cast("decimal(18,2)")).as("sv"))
      .select(col("user_id"), col("hour"),
        (col("sv") * 1000000).cast("long").as("vmu")))

  /** Frame-based core of [[linearInterp]] over observed
    * (user_id, hour: timestamp, vmu: long) rows. */
  def linearInterpOf(h: DataFrame): DataFrame = {
    // r15 optimization: SEGMENT EXPLODE replaces densify + shuffle
    // join + two window carries. A lead() window over the OBSERVED
    // hourly rows pairs each observation with its successor; the
    // silent interior hours of each segment are generated directly
    // and interpolate from that segment's own (t0,v0,t1,v1) — exactly
    // the pair the forward/backward carries assigned them (silent
    // hours lie strictly between consecutive observations, and span
    // endpoints are observed by construction, so every dense hour is
    // emitted exactly once). This removes the dense (user, hour)
    // shuffle join and BOTH dense window sorts (the asc running carry
    // and the desc-resorted backward carry — the r9 lesson's two
    // O(n) passes become zero dense passes); the remaining cost is
    // the hourly aggregate, one small lead window, and the final
    // sort. The truncating-div formula is unchanged, so the resample
    // is bit-identical and the oracle is untouched.
    val w = Window.partitionBy(col("user_id")).orderBy(col("hour"))
    // hourly-sized two-consumer frame — same persist rationale as
    // gapFillLocf's seg (each union branch would otherwise re-run the
    // event-sized hourly aggregate)
    val seg = graft.ops.Dedup.register(h
      .withColumn("nh", lead(col("hour"), 1).over(w))
      .withColumn("nv", lead(col("vmu"), 1).over(w))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val observed = seg.select(col("user_id"), col("hour"),
      lit(true).as("observed"), col("vmu").as("v_interp_mu"))
    val interior = seg.filter(col("nh").isNotNull &&
        col("nh") > col("hour") + expr("interval 1 hour"))
      .select(col("user_id"),
        explode(sequence(col("hour") + expr("interval 1 hour"),
          col("nh") - expr("interval 1 hour"), expr("interval 1 hour")))
          .as("hr"),
        expr("unix_micros(hour) div 3600000000").as("t0"),
        expr("unix_micros(nh) div 3600000000").as("t1"),
        col("vmu").as("v0"), col("nv").as("v1"))
      .select(col("user_id"), col("hr").as("hour"),
        lit(false).as("observed"),
        expr("v0 + (v1 - v0) * ((unix_micros(hr) div 3600000000) - t0)" +
          " div (t1 - t0)").as("v_interp_mu"))
    observed.union(interior)
      .orderBy(col("user_id"), col("hour"), col("observed"),
        col("v_interp_mu"))
  }

  /** DuckDB oracle for [[linearInterp]] — same spine, same two
    * IGNORE NULLS window carries (the t/v carriers share one null
    * pattern, so per-column carries cannot mix observations), same
    * truncating division. */
  val linearInterpOracleSql: String =
    """WITH h AS (
      |  SELECT user_id, DATE_TRUNC('hour', ts) AS hour,
      |    CAST(SUM(CAST(value AS DECIMAL(18,2))) * 1000000 AS BIGINT)
      |      AS vmu
      |  FROM events GROUP BY user_id, DATE_TRUNC('hour', ts)),
      |spine AS (
      |  SELECT user_id,
      |    UNNEST(generate_series(MIN(hour), MAX(hour),
      |      INTERVAL 1 HOUR)) AS hour
      |  FROM h GROUP BY user_id),
      |j AS (
      |  SELECT s.user_id, s.hour, h.vmu,
      |    epoch_us(s.hour) // 3600000000 AS t
      |  FROM spine s LEFT JOIN h
      |    ON h.user_id = s.user_id AND h.hour = s.hour),
      |c AS (
      |  SELECT user_id, hour, vmu, t,
      |    LAST_VALUE(CASE WHEN vmu IS NOT NULL THEN t END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY t
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS t0,
      |    LAST_VALUE(CASE WHEN vmu IS NOT NULL THEN vmu END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY t
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v0,
      |    FIRST_VALUE(CASE WHEN vmu IS NOT NULL THEN t END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY t
      |        ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS t1,
      |    FIRST_VALUE(CASE WHEN vmu IS NOT NULL THEN vmu END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY t
      |        ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS v1
      |  FROM j)
      |SELECT user_id, hour, vmu IS NOT NULL AS observed,
      |  CAST(CASE WHEN vmu IS NOT NULL THEN vmu
      |    ELSE v0 + (v1 - v0) * (t - t0) // (t1 - t0) END AS BIGINT)
      |    AS v_interp_mu
      |FROM c
      |ORDER BY user_id, hour, observed, v_interp_mu""".stripMargin

  /** Interval union (q178): merge each user's OVERLAPPING hold
    * intervals into maximal disjoint spans and report per-user
    * coverage — the classic interval-merge operator (downtime
    * stitching, attention-time accounting). Intervals here are
    * per-event holds [ts, ts + value-scaled µs] (events within a hold
    * of each other chain into one span; session windows would be
    * pre-merged by construction, so the hold interval is what gives
    * the operator real overlaps to merge). The merge is the
    * textbook single-pass running-max rule: a row opens a NEW span
    * iff its start exceeds the max end seen so far in (start, end)
    * order; span ids are the running sum of open flags — two windows
    * over the same user partition, one grouped rollup, no join, no
    * self-join. All epoch-micros longs, bit-exact in both engines.
    *
    * Scale shape: one user-keyed shuffle; windows and rollups all
    * ride the same partitioning; output is |users| rows. */
  def intervalUnion(spark: SparkSession, dir: String): DataFrame =
    intervalUnionEv(Tables.events(spark, dir))

  /** Hold-interval projection + merge over an events frame (needs
    * user_id, ts, value) — the 10x rehearsal entry point. */
  def intervalUnionEv(ev: DataFrame): DataFrame = {
    val holdUs = expr(
      "greatest(1L, cast(round(cast(value as double) * 100000000, 0) as bigint))")
    intervalUnionOf(ev
      .select(col("user_id"), unix_micros(col("ts")).as("s"),
        (unix_micros(col("ts")) + holdUs).as("e")))
  }

  /** Frame-based merge core of [[intervalUnion]] over (user_id, s, e)
    * rows — the planted-fixture entry point. */
  def intervalUnionOf(iv: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("s"), col("e"))
    val prevMax = max(col("e"))
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    iv
      .withColumn("opens",
        when(col("s") > coalesce(prevMax, lit(Long.MinValue)), 1L)
          .otherwise(0L))
      .withColumn("span_id",
        sum(col("opens")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("span_id"))
      .agg(min(col("s")).as("ss"), max(col("e")).as("se"),
        count(lit(1)).as("n_iv"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_spans"),
        sum(col("se") - col("ss")).as("covered_us"),
        sum(col("n_iv")).as("n_events"),
        max(col("n_iv")).as("max_span_events"))
      .orderBy(col("user_id"), col("n_spans"), col("covered_us"),
        col("n_events"), col("max_span_events"))
  }

  /** DuckDB oracle for [[intervalUnion]] — the same two windows and
    * rollups. */
  val intervalUnionOracleSql: String =
    """WITH iv AS (
      |  SELECT user_id, epoch_us(ts) AS s,
      |    epoch_us(ts) + GREATEST(1,
      |      CAST(ROUND(CAST(value AS DOUBLE) * 100000000) AS BIGINT)) AS e
      |  FROM events),
      |flagged AS (
      |  SELECT user_id, s, e,
      |    CASE WHEN s > COALESCE(MAX(e) OVER (PARTITION BY user_id
      |      ORDER BY s, e ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
      |      -9223372036854775808) THEN 1 ELSE 0 END AS opens
      |  FROM iv),
      |spans AS (
      |  SELECT user_id, s, e,
      |    SUM(opens) OVER (PARTITION BY user_id ORDER BY s, e
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS span_id
      |  FROM flagged),
      |rolled AS (
      |  SELECT user_id, span_id, MIN(s) AS ss, MAX(e) AS se,
      |    COUNT(*) AS n_iv
      |  FROM spans GROUP BY user_id, span_id)
      |SELECT user_id, COUNT(*) AS n_spans,
      |  CAST(SUM(se - ss) AS BIGINT) AS covered_us,
      |  CAST(SUM(n_iv) AS BIGINT) AS n_events,
      |  CAST(MAX(n_iv) AS BIGINT) AS max_span_events
      |FROM rolled GROUP BY user_id
      |ORDER BY user_id, n_spans, covered_us, n_events,
      |  max_span_events""".stripMargin

  /** Weekday seasonality profile (q215): per (event_type, weekday)
    * the event count, its share of the type's volume, and the
    * seasonality INDEX vs a flat week (share × 7 in ppm — 1,000,000
    * = no weekday effect). The calendar structure every
    * freshness/throughput monitor needs before it can alarm on a
    * "drop" that is just Saturday — and the q187 drift monitor's
    * natural baseline refinement. The weekday is derived purely
    * arithmetically from epoch microseconds ((days-since-epoch + 4)
    * mod 7, 0 = Sunday — 1970-01-01 was a Thursday), so no
    * cross-engine calendar/locale semantics are in play at all.
    *
    * Scale shape: a codegen'd scan projection + one
    * map-side-combined groupBy into ≤ |types|·7 cells; the share
    * window runs over that tiny frame. */
  def weekdaySeasonality(spark: SparkSession, dir: String): DataFrame =
    weekdaySeasonalityOn(Tables.events(spark, dir))

  /** Frame-based core of [[weekdaySeasonality]] (needs event_type +
    * µs-precision ts). */
  def weekdaySeasonalityOn(events: DataFrame): DataFrame =
    weekdaySeasonalityFromCounts(weekdayCounts(events))

  /** Additive (event_type, dow, n_events) counts — the mergeable
    * state shared with the streaming twin. */
  def weekdayCounts(events: DataFrame): DataFrame =
    events
      .select(col("event_type"),
        expr("pmod((unix_micros(ts) div 86400000000) + 4, 7)")
          .cast("long").as("dow"))
      .groupBy(col("event_type"), col("dow"))
      .agg(count(lit(1)).as("n_events"))

  /** The read over [[weekdayCounts]]-shaped state: shares + flat-week
    * index over the tiny cells frame. */
  def weekdaySeasonalityFromCounts(cells: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    cells
      .withColumn("type_total", sum(col("n_events"))
        .over(Window.partitionBy(col("event_type"))))
      .select(col("event_type"), col("dow"), col("n_events"),
        col("type_total"),
        expr("n_events * 1000000 div type_total").as("share_ppm"),
        expr("n_events * 7000000 div type_total").as("idx_ppm"))
      .orderBy(col("event_type"), col("dow"), col("n_events"),
        col("type_total"), col("share_ppm"), col("idx_ppm"))
  }

  /** Error-budget burn (q239): per day the error-event share and the
    * trailing-7-day share (both exact cross-multiplied ppm over
    * per-day counts) — the SLO read-out: the daily line spikes, the
    * trailing line is what pages. The trailing window is a RANGE
    * frame over the integer epoch-day key, so calendar gaps are
    * handled without materializing a day spine (sparse days simply
    * contribute nothing), and bounded sliding frames compute
    * incrementally (the q180 rule concerns unbounded-following
    * re-scans, not these).
    *
    * Scale shape: one map-side-combined per-day aggregate; every
    * window runs over the |days|-sized count table. */
  def errorBurn(spark: SparkSession, dir: String): DataFrame =
    errorBurnOn(Tables.events(spark, dir))

  /** Frame-based core of [[errorBurn]] (needs event_type + µs ts). */
  def errorBurnOn(events: DataFrame): DataFrame =
    errorBurnFromDaily(dailyErrorCounts(events))

  /** The additive state of the error-burn profile: per integer day,
    * total and error event counts. Counts merge by per-day sum, so a
    * streaming twin's state is chunking-invariant (the
    * weekdayCounts pattern) and bounded by the calendar. */
  def dailyErrorCounts(events: DataFrame): DataFrame = events
    .select(expr("unix_micros(ts) div 86400000000").as("day"),
      (col("event_type") === "error").cast("long").as("is_err"))
    .groupBy(col("day"))
    .agg(count(lit(1)).as("n_events"), sum(col("is_err")).as("n_errors"))

  /** The burn profile as a READ over the daily-count state (batch and
    * streaming share it verbatim, so the twin cannot drift). */
  def errorBurnFromDaily(daily: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w7 = Window.orderBy(col("day")).rangeBetween(-6, 0)
    daily
      .withColumn("t7n", sum(col("n_events")).over(w7))
      .withColumn("t7e", sum(col("n_errors")).over(w7))
      .select(col("day"), col("n_events"), col("n_errors"),
        expr("n_errors * 1000000 div n_events").as("err_ppm"),
        expr("t7e * 1000000 div t7n").as("trail7_ppm"))
      .orderBy(col("day"), col("n_events"), col("n_errors"),
        col("err_ppm"), col("trail7_ppm"))
  }

  /** DuckDB oracle for [[errorBurn]] — same integer day key, same
    * RANGE frame. */
  val errorBurnOracleSql: String =
    """WITH d AS (
      |  SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
      |    CAST(COUNT(*) AS BIGINT) AS n_events,
      |    CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS n_errors
      |  FROM events GROUP BY 1),
      |w AS (
      |  SELECT day, n_events, n_errors,
      |    SUM(n_events) OVER (ORDER BY day
      |      RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS t7n,
      |    SUM(n_errors) OVER (ORDER BY day
      |      RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS t7e
      |  FROM d)
      |SELECT day, n_events, n_errors,
      |  CAST(n_errors * 1000000 // n_events AS BIGINT) AS err_ppm,
      |  CAST(t7e * 1000000 // t7n AS BIGINT) AS trail7_ppm
      |FROM w
      |ORDER BY day, n_events, n_errors, err_ppm, trail7_ppm""".stripMargin

  /** DuckDB oracle for [[weekdaySeasonality]] — same integer weekday
    * formula; positive operands so `//`/`%` match div/pmod. */
  val weekdaySeasonalityOracleSql: String =
    """WITH c AS (
      |  SELECT event_type,
      |    CAST(((epoch_us(ts) // 86400000000) + 4) % 7 AS BIGINT)
      |      AS dow,
      |    COUNT(*) AS n_events
      |  FROM events GROUP BY 1, 2),
      |t AS (
      |  SELECT event_type, dow, CAST(n_events AS BIGINT) AS n_events,
      |    CAST(SUM(n_events) OVER (PARTITION BY event_type) AS BIGINT)
      |      AS type_total
      |  FROM c)
      |SELECT event_type, dow, n_events, type_total,
      |  CAST(n_events * 1000000 // type_total AS BIGINT) AS share_ppm,
      |  CAST(n_events * 7000000 // type_total AS BIGINT) AS idx_ppm
      |FROM t
      |ORDER BY event_type, dow, n_events, type_total, share_ppm,
      |  idx_ppm""".stripMargin
}
