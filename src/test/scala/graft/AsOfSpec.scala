package graft

import java.sql.Timestamp
import graft.ops.AsOf
import org.apache.spark.sql.functions._

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("as-of join picks latest right row at-or-before, per key") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")),  // after two clicks
      (2L, 10L, ts("2024-01-01 08:30:00")),  // between clicks
      (3L, 11L, ts("2024-01-01 09:00:00")),  // exact tie with click ts
      (4L, 12L, ts("2024-01-01 09:00:00")))  // user with no clicks
      .toDF("purchase_id", "user_id", "purchase_ts")
    val right = Seq(
      (100L, 10L, ts("2024-01-01 08:00:00")),
      (101L, 10L, ts("2024-01-01 09:00:00")),
      (102L, 11L, ts("2024-01-01 09:00:00")),
      (103L, 11L, ts("2024-01-01 09:30:00")))
      .toDF("event_id", "user_id", "ts")

    val out = AsOf.join(left, right, Seq("user_id"),
        "purchase_ts", "ts", Seq("event_id", "ts"), "event_id")
      .select(col("purchase_id"), col("asof_event_id"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap

    assert(out(1L) == 101L)  // latest of the two
    assert(out(2L) == 100L)  // only the earlier one qualifies
    assert(out(3L) == 102L)  // inclusive: equal ts matches
    assert(out(4L) == -1L)   // no right rows for key -> null
  }

  test("null payload field on the matching row is NOT backfilled from older rows") {
    val left = Seq((1L, 5L, ts("2024-01-01 10:00:00")))
      .toDF("purchase_id", "user_id", "purchase_ts")
    val right = Seq(
      (300L, 5L, ts("2024-01-01 08:00:00"), Some("x")),
      (301L, 5L, ts("2024-01-01 09:00:00"), None))  // matching row, extra=NULL
      .toDF("event_id", "user_id", "ts", "extra")
    val row = AsOf.join(left, right, Seq("user_id"),
        "purchase_ts", "ts", Seq("event_id", "extra"), "event_id")
      .select(col("asof_event_id"), col("asof_extra")).head()
    assert(row.getLong(0) == 301L)
    assert(row.isNullAt(1), "NULL field stitched from an older right row")
  }

  test("as-of tie between right rows at same ts resolves to max tiebreak") {
    val left = Seq((1L, 5L, ts("2024-01-01 10:00:00")))
      .toDF("purchase_id", "user_id", "purchase_ts")
    val right = Seq(
      (200L, 5L, ts("2024-01-01 09:00:00")),
      (201L, 5L, ts("2024-01-01 09:00:00")))
      .toDF("event_id", "user_id", "ts")
    val got = AsOf.join(left, right, Seq("user_id"),
        "purchase_ts", "ts", Seq("event_id"), "event_id")
      .select(col("asof_event_id")).head().getLong(0)
    assert(got == 201L)
  }
}
