package graft

import graft.ops.TimeSeries
import org.apache.spark.sql.functions._

/** Gap-fill/LOCF and concurrency-sweep semantics on planted series. */
class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  test("gap-fill densifies each user's span and LOCF carries values") {
    val out = TimeSeries.gapFillLocf(spark, sf)
    // spine is dense: per user, rows == hours between min and max + 1
    val spans = out.groupBy("user_id")
      .agg(count(lit(1)).as("rows"),
        ((unix_timestamp(max(col("hour"))) -
          unix_timestamp(min(col("hour")))) / 3600 + 1).cast("long")
          .as("hours"))
      .filter(col("rows") =!= col("hours"))
    assert(spans.count() == 0, "spine must be dense per user")
    // LOCF total: no filled_value may be null, and gap hours exist
    assert(out.filter(col("filled_value").isNull).count() == 0)
    assert(out.filter(col("n_events") === 0).count() > 0,
      "fixture should contain silent hours")
  }

  test("LOCF carries the previous hourly sum, not the global last") {
    // one user: value 5 at 00:10, nothing 01:xx, value 7 at 02:20
    val df = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:10:00"), 5.0),
      (1L, java.sql.Timestamp.valueOf("2024-01-01 02:20:00"), 7.0))
      .toDF("user_id", "ts", "value")
    val h = df.groupBy(col("user_id"), date_trunc("hour", col("ts")).as("hour"))
      .agg(sum(col("value").cast("decimal(18,2)")).as("sv"),
        count(lit(1)).as("n_events"))
    val spine = h.groupBy(col("user_id"))
      .agg(min(col("hour")).as("mn"), max(col("hour")).as("mx"))
      .select(col("user_id"),
        explode(sequence(col("mn"), col("mx"), expr("interval 1 hour")))
          .as("hour"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("hour")
      .rowsBetween(Long.MinValue, 0)
    val filled = spine.join(h, Seq("user_id", "hour"), "left")
      .select(col("hour"),
        last(col("sv"), ignoreNulls = true).over(w)
          .cast("double").as("v"))
      .orderBy("hour").as[(java.sql.Timestamp, Double)].collect()
    assert(filled.map(_._2).toSeq == Seq(5.0, 5.0, 7.0))
  }

  test("concurrency sweep counts overlaps, half-open at touch points") {
    // Three sessions on one day: A 01:00-02:00, B 01:30-03:00 (overlap
    // with A), C 02:00-02:30 (starts exactly when A ends: no overlap
    // with A, overlaps B). Max concurrent = 2.
    val day = java.sql.Timestamp.valueOf("2024-03-01 00:00:00")
    def t(s: String) = java.sql.Timestamp.valueOf(s"2024-03-01 $s:00")
    val clip = Seq(
      (day, t("01:00"), t("02:00")),
      (day, t("01:30"), t("03:00")),
      (day, t("02:00"), t("02:30"))).toDF("day", "cs", "ce")
    val pts = clip.select(col("day"), col("cs").as("t"), lit(1L).as("delta"))
      .unionAll(clip.select(col("day"), col("ce").as("t"), lit(-1L).as("delta")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("day").orderBy(col("t"), col("delta"))
      .rowsBetween(Long.MinValue, 0)
    val mx = pts.withColumn("c", sum(col("delta")).over(w))
      .agg(max(col("c"))).as[Long].head()
    assert(mx == 2L)
  }

  test("q88 output is sane: sessions per day positive, max <= sessions") {
    val out = TimeSeries.dailyConcurrency(spark, sf)
    val bad = out.filter(col("max_concurrent") < 1 ||
      col("max_concurrent") > col("n_sessions")).count()
    assert(bad == 0 && out.count() > 0)
  }

  test("session overlap join: planted concurrency with exact duration") {
    import java.sql.Timestamp
    // user 1: session 10:00-10:10 (+30min pad -> ends 10:40)
    // user 2: session 10:20-10:25 (pad -> 10:55): overlap 10:20-10:40
    // user 3: 18:00 (pad -> 18:30): no overlap with either
    val ev = Seq(
      (1L, 1L, Timestamp.valueOf("2024-03-01 10:00:00")),
      (2L, 1L, Timestamp.valueOf("2024-03-01 10:10:00")),
      (3L, 2L, Timestamp.valueOf("2024-03-01 10:20:00")),
      (4L, 2L, Timestamp.valueOf("2024-03-01 10:25:00")),
      (5L, 3L, Timestamp.valueOf("2024-03-01 18:00:00")))
      .toDF("event_id", "user_id", "ts")
    val dir = java.nio.file.Files.createTempDirectory("ovl").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = TimeSeries.overlappingSessions(spark, dir).collect()
    assert(got.length == 1, s"got ${got.toSeq}")
    assert(got(0).getAs[Long]("user_a") == 1L &&
      got(0).getAs[Long]("user_b") == 2L)
    assert(got(0).getAs[Long]("n_overlaps") == 1L)
    // 10:20 -> 10:40 = 20 min in micros
    assert(got(0).getAs[Long]("total_overlap_us") == 20L * 60 * 1000000L,
      s"got ${got(0)}")
  }

  test("bucketed overlap pairs cross-midnight sessions and dedups multi-bucket pairs") {
    import java.sql.Timestamp
    def t(s: String) = Timestamp.valueOf(s)
    // u1 spans midnight; u2 lives entirely in day 2 (a DAY-GRAIN key
    // join would miss the (1,2) pair — their start days differ);
    // u4 overlaps u1 ACROSS midnight (the overlap interval itself
    // spans two buckets → surfaced twice → must dedup to one);
    // u3 is day-1 only
    val sess = Seq(
      (1L, t("2024-03-01 23:50:00"), t("2024-03-02 00:30:00")),
      (2L, t("2024-03-02 00:10:00"), t("2024-03-02 00:20:00")),
      (3L, t("2024-03-01 23:00:00"), t("2024-03-01 23:55:00")),
      (4L, t("2024-03-01 23:40:00"), t("2024-03-02 00:40:00")))
      .toDF("user_id", "ss", "se")
    val got = TimeSeries.overlappingSessionsBucketed(sess).collect()
      .map(r => (r.getAs[Long]("user_a"), r.getAs[Long]("user_b")) ->
        (r.getAs[Long]("n_overlaps"), r.getAs[Long]("total_overlap_us")))
      .toMap
    val mn = 60L * 1000000L
    assert(got.keySet == Set((1L, 2L), (1L, 3L), (1L, 4L), (2L, 4L), (3L, 4L)),
      s"pairs: ${got.keySet}")
    // every pair exactly once, despite (1,4) appearing in both buckets
    assert(got.values.forall(_._1 == 1L), s"dedup failed: $got")
    assert(got((1L, 2L)) == (1L, 10 * mn)) // cross-midnight pair
    assert(got((1L, 3L)) == (1L, 5 * mn))
    assert(got((1L, 4L)) == (1L, 40 * mn)) // overlap spans midnight
    assert(got((2L, 4L)) == (1L, 10 * mn))
    assert(got((3L, 4L)) == (1L, 15 * mn))
  }

  test("capped gap-fill bounds the spine and seeds LOCF with the pre-window carry") {
    import java.sql.Timestamp
    // user 1: observations at hour 0 (value 5) and hour 200 (value 9)
    // — uncapped spine = 201 hours; capped at 72 it is hours 129..200,
    // all silent except the last, filled with the CARRY value 5.0
    // user 2: a short dense span, cap is a no-op
    val ev = Seq(
      (1L, 1L, Timestamp.valueOf("2024-03-01 00:10:00"), 5.0),
      (2L, 1L, Timestamp.valueOf("2024-03-09 08:20:00"), 9.0),
      (3L, 2L, Timestamp.valueOf("2024-03-01 10:00:00"), 1.0),
      (4L, 2L, Timestamp.valueOf("2024-03-01 12:30:00"), 2.0))
      .toDF("event_id", "user_id", "ts", "value")
    val dir = java.nio.file.Files.createTempDirectory("gfc").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rows = TimeSeries.gapFillLocfCapped(spark, dir, capHours = 72)
      .collect()
    val u1 = rows.filter(_.getAs[Long]("user_id") == 1L)
    assert(u1.length == 72, s"spine not capped: ${u1.length} rows")
    // every silent hour carries the pre-window value; the observed
    // last hour has its own
    assert(u1.count(_.getAs[Long]("n_events") == 0L) == 71)
    assert(u1.filter(_.getAs[Long]("n_events") == 0L)
      .forall(_.getAs[Double]("filled_value") == 5.0))
    assert(u1.filter(_.getAs[Long]("n_events") == 1L)
      .forall(_.getAs[Double]("filled_value") == 9.0))
    // short span untouched: hours 10..12 inclusive
    val u2 = rows.filter(_.getAs[Long]("user_id") == 2L)
    assert(u2.length == 3)
    assert(u2.map(_.getAs[Double]("filled_value")).toSeq == Seq(1.0, 1.0, 2.0))
  }

  test("autocorrelation: alternating monthly series gives exact ACF") {
    import java.sql.Timestamp
    // counts over Jan..Aug 1995 = (1,3,1,3,1,3,1,3): mean 2, n = 8,
    // centered n-scaled = ±8; acf_k = ±(8-k)/8 with sign (-1)^k.
    // Both endpoint months are observed so the global spine is
    // exactly Jan..Aug (the spine spans observed min..max).
    val rows = (1 to 8).flatMap { mm =>
      val n = if (mm % 2 == 0) 3 else 1
      (1 to n).map(d =>
        ("1-TEST", Timestamp.valueOf(f"1995-$mm%02d-${d * 5}%02d 00:00:00")))
    }
    val df = rows.toDF("o_orderpriority", "o_orderdate")
    val dir = java.nio.file.Files.createTempDirectory("acf").toString
    df.write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = TimeSeries.autocorrelation(spark, dir).collect()
      .map(r => r.getAs[Long]("lag_k") ->
        (r.getAs[Long]("n_months"), r.getAs[Double]("acf"))).toMap
    assert(got.size == 6)
    val want = Map(1L -> -0.875, 2L -> 0.75, 3L -> -0.625,
      4L -> 0.5, 5L -> -0.375, 6L -> 0.25)
    want.foreach { case (k, v) =>
      assert(got(k) == ((8L, v)), s"lag $k: got ${got(k)}, want $v")
    }
  }
}
