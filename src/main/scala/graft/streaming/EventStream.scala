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

  /** Streaming twin of the q215 weekday seasonality: per-row
    * weekdays are independent, so the (event_type, dow) counts merge
    * by sum and the state is chunking-invariant (≤ |types|·7 rows).
    * The seasonality profile is a READ over the state
    * (TimeSeries.weekdaySeasonalityFromCounts).
    * Crash matrix (CdcStream.mergeAdditive): replays skip via the
    * promoted marker, a crashed batch's leftover stage is discarded,
    * a mid-swap crash restores the aside state copy. */
  def weekdayCountsStream(events: DataFrame, stateDir: String)
      : DataStreamWriter[Row] =
    events.writeStream.outputMode("append").foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        CdcStream.mergeAdditive(stateDir, batchId,
          graft.ops.TimeSeries.weekdayCounts(batch),
          Seq("event_type", "dow"))
    }

  /** Streaming twin of the q239 error-budget burn: per-day
    * (n_events, n_errors) counts are additive, so the state merges by
    * per-day sum (chunking-invariant, calendar-bounded — the
    * weekdayCountsStream shape) and the burn profile — err_ppm plus
    * the trailing-7-day RANGE share — is a READ over the state via
    * the same TimeSeries.errorBurnFromDaily the batch op uses, so the
    * twin cannot drift. */
  def errorBurnStream(events: DataFrame, stateDir: String)
      : DataStreamWriter[Row] =
    events.writeStream.outputMode("append").foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        errorBurnProcessBatch(batch, batchId, stateDir)
    }

  /** Per-batch core of [[errorBurnStream]]. Additive count merges are
    * NOT replay-idempotent (unlike the id-keyed twins, whose
    * anti-joins drop replayed docs), so a micro-batch replayed after
    * a crash-after-promote is skipped via the promoted-batchId marker
    * (ADVICE r11) — the marker rides inside the state dir, promoted
    * atomically with it. Crash matrix: stage discard + aside
    * recovery per CdcStream.mergeAdditive (StreamingSpec). */
  private[graft] def errorBurnProcessBatch(batch: DataFrame,
      batchId: Long, stateDir: String): Unit =
    CdcStream.mergeAdditive(stateDir, batchId,
      graft.ops.TimeSeries.dailyErrorCounts(batch), Seq("day"))

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

  /** Streaming sliding-window twin of ops.Events.sliding: 1-hour
    * windows every 15 minutes, one state row per open window. */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("w.start").as("win_start"), col("n"), col("sum_value"))

  /** Streaming session-window twin of ops.Events.sessions: built-in
    * session_window with a 30-minute gap; state per open session,
    * closed (and emitted, in append mode) once the watermark passes
    * session end + gap. */
  def sessionCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"), col("sum_value"))

  /** Stream-stream inner join: each purchase matched to the same
    * user's clicks in the preceding hour. Both sides are watermarked
    * and the join condition carries a time RANGE, so the state store
    * can evict: a buffered click older than (watermark - 1 hour) can
    * never match a future purchase and is dropped — without the range
    * bound, stream-stream join state grows forever. */
  def purchaseClickJoin(purchases: DataFrame, clicks: DataFrame): DataFrame = {
    val p = purchases.withWatermark("ts", "10 minutes")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts").as("p_ts"))
    val c = clicks.withWatermark("ts", "10 minutes")
      .select(col("user_id").as("c_user_id"),
        col("event_id").as("click_id"), col("ts").as("c_ts"))
    p.join(c,
      col("user_id") === col("c_user_id") &&
        col("c_ts") <= col("p_ts") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR"))
      .select(col("user_id"), col("purchase_id"), col("click_id"),
        col("p_ts"), col("c_ts"))
  }

  /** File-source stream over a directory of event parquet/json files. */
  def readEventStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(eventSchema).parquet(dir)

  /** JDBC sink via foreachBatch: per micro-batch batched append
    * (streaming reuse of the bulk writer — same batchsize semantics).
    * Append output mode: with the watermark on the agg, a window row is
    * emitted exactly once, after it can no longer change — an
    * append-only sink table stays correct. (Update mode would re-emit
    * evolving rows and an append sink would accumulate stale versions;
    * that combination needs an upsert writer instead.) */
  def jdbcSink(agg: DataFrame, url: String, table: String,
      props: java.util.Properties): DataStreamWriter[Row] =
    agg.writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.etl.Transfer.writeJdbc(batch, url, table, props)
      }

  // ---- custom stateful sessionization (flatMapGroupsWithState) ----

  case class Ev(user_id: Long, ts: java.sql.Timestamp)
  /** start/last are MICROSECONDS since epoch — java.sql.Timestamp
    * getTime() is millis and silently truncates the µs the testdata
    * carries. */
  case class SessionState(start: Long, last: Long, n: Long)
  case class SessionOut(user_id: Long, session_start: java.sql.Timestamp,
      n_events: Long)

  def toMicros(t: java.sql.Timestamp): Long =
    t.getTime * 1000 + (t.getNanos / 1000) % 1000
  def fromMicros(us: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(Math.floorDiv(us, 1000))
    t.setNanos((Math.floorMod(us, 1000000L)).toInt * 1000)
    t
  }

  /** Custom state-machine sessionization: per-user inactivity-gap
    * sessions via flatMapGroupsWithState with event-time timeout — the
    * KeyValueGroupedDataset state API the built-in session_window
    * doesn't expose (per-event custom logic, arbitrary state shape).
    * Emits a session when the watermark passes its gap deadline. */
  def sessionizeStateful(events: org.apache.spark.sql.Dataset[Ev],
      gapMs: Long): org.apache.spark.sql.Dataset[SessionOut] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, rows: Iterator[Ev], state: GroupState[SessionState]) =>
          val gapUs = gapMs * 1000
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(user, fromMicros(s.start), s.n))
          } else {
            // flatMapGroupsWithState does NOT auto-filter late rows —
            // enforce the watermark contract here, otherwise an
            // out-of-order batch walks the session state backwards
            val wmUs = state.getCurrentWatermarkMs() * 1000
            val sorted = rows.map(e => toMicros(e.ts)).filter(_ >= wmUs)
              .toSeq.sorted
            var out = List.empty[SessionOut]
            var cur = state.getOption
            sorted.foreach { t =>
              cur match {
                case Some(s) if t - s.last < gapUs =>
                  cur = Some(SessionState(s.start, t, s.n + 1))
                case Some(s) =>
                  out ::= SessionOut(user, fromMicros(s.start), s.n)
                  cur = Some(SessionState(t, t, 1))
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // a timeout at-or-before the current watermark throws;
              // clamp so late-arriving groups time out on the next batch
              state.setTimeoutTimestamp(
                math.max(s.last / 1000 + gapMs, state.getCurrentWatermarkMs() + 1))
            }
            out.reverseIterator
          }
      }
  }

  // ---- streaming transition-pair twin (Behavior.transitions) ----

  case class TEv(user_id: Long, event_id: Long, ts: java.sql.Timestamp,
      event_type: String)
  case class TransState(lastUs: Long, lastEventId: Long, lastType: String)
  case class TransPair(user_id: Long, from_type: String, to_type: String)

  /** Streaming twin of the batch transition-matrix pair stage
    * (Behavior.transitionPairs): per-user "last event" state emits a
    * from→to pair for every arriving event after the first, so the
    * daily matrix can be maintained incrementally instead of
    * re-windowing the full history. State is one row per user and
    * never grows; like the incremental-dedup twin this assumes the
    * per-user feed is event-time ordered across batches (within a
    * batch it sorts), which the upstream watermarked ingestion
    * provides. */
  def transitionPairsStateful(events: org.apache.spark.sql.Dataset[TEv])
      : org.apache.spark.sql.Dataset[TransPair] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[TEv], state: GroupState[TransState]) =>
          val sorted = rows.toSeq.sortBy(e => (toMicros(e.ts), e.event_id))
          var prev = state.getOption
          val out = sorted.flatMap { e =>
            val p = prev.map(s => TransPair(user, s.lastType, e.event_type))
            prev = Some(TransState(toMicros(e.ts), e.event_id, e.event_type))
            p
          }
          prev.foreach(state.update)
          out.iterator
      }
  }

  case class ThrottleOut(user_id: Long, event_type: String, event_id: Long)

  /** Streaming twin of the chained event throttle
    * (graft.ops.TimeSeries.eventThrottle): per (user, type), admit an
    * event iff it is ≥ `minGapMin` minutes after the LAST ADMITTED
    * event — true rate limiting, where a burst admits exactly one
    * event per window regardless of length. State is ONE timestamp
    * per key (the last admitted event time), never grows, and chains
    * across micro-batches; within a batch the group sorts by
    * (ts, event_id) like every stateful twin here, and cross-batch
    * correctness assumes per-key event-time-ordered arrival, which
    * the upstream watermarked ingestion provides. */
  def throttleStateful(events: org.apache.spark.sql.Dataset[TEv],
      minGapMin: Int = 5): org.apache.spark.sql.Dataset[ThrottleOut] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
    import events.sparkSession.implicits._
    val gapUs = minGapMin * 60L * 1000000L
    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(e => (e.user_id, e.event_type))
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout()) {
        (key: (Long, String), rows: Iterator[TEv], state: GroupState[Long]) =>
          var lastKept = state.getOption.getOrElse(Long.MinValue)
          val out = rows.toSeq.sortBy(e => (toMicros(e.ts), e.event_id))
            .flatMap { e =>
              val tsm = toMicros(e.ts)
              if (lastKept == Long.MinValue || tsm - lastKept >= gapUs) {
                lastKept = tsm
                Some(ThrottleOut(key._1, key._2, e.event_id))
              } else None
            }
          if (lastKept != Long.MinValue) state.update(lastKept)
          out.iterator
      }
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
