package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** The events loader seam must survive parquet re-encodings of `ts`.
  *
  * The driver testdata has already shipped `events.ts` two ways —
  * TIMESTAMP(NANOS) (surfacing as a long under
  * `spark.sql.legacy.parquet.nanosAsLong=true`) through round 4, then
  * `timestamp[us]` unadjusted (TIMESTAMP_NTZ) from round 5 — and the
  * second switch silently broke every `unix_micros(ts)` call site for a
  * whole round. All 26 events readers go through the single
  * `Tables.events` seam (verified by grep — nothing reads
  * events.parquet directly), so covering the seam against every
  * encoding covers every query; a representative query from each
  * consumption family (unix_micros arithmetic, window() bucketing,
  * Row.getTimestamp accessors) is additionally run end-to-end per
  * encoding and must return identical rows.
  *
  * If the driver regenerates events in a fourth encoding, this suite —
  * not seven missing CORRECTNESS rows — is where it should fail.
  */
class LoaderSchemaSpec extends SparkSpec {

  /** One fixture dir per encoding, each holding ONLY events.parquet
    * (the representative queries read no other table). */
  private lazy val fixtures: Map[String, String] = {
    val base = Tables.events(spark, sf)
      .select("event_id", "user_id", "event_type", "value", "ts")
    val root = java.nio.file.Files.createTempDirectory("graft_evenc").toString

    def dirFor(tag: String)(write: org.apache.spark.sql.DataFrame => Unit)
        : (String, String) = {
      val d = s"$root/$tag"
      write(base)
      (tag, d)
    }

    Map(
      // timestamp[us] isAdjustedToUTC=true — plain TimestampType write
      dirFor("ltz") { df =>
        df.write.parquet(s"$root/ltz/events.parquet")
      },
      // timestamp[us] isAdjustedToUTC=false — the round-5 regen shape
      dirFor("ntz") { df =>
        df.withColumn("ts", col("ts").cast("timestamp_ntz"))
          .write.parquet(s"$root/ntz/events.parquet")
      },
      // nanos-since-epoch int64 — what TIMESTAMP(NANOS) surfaces as
      // under nanosAsLong=true (the reader yields LongType either way,
      // so a raw long column exercises the identical seam branch)
      dirFor("nanos") { df =>
        df.withColumn("ts", expr("unix_micros(ts) * 1000L"))
          .write.parquet(s"$root/nanos/events.parquet")
      })
  }

  test("Tables.events normalizes every shipped ts encoding to TIMESTAMP") {
    fixtures.foreach { case (tag, dir) =>
      val ts = Tables.events(spark, dir).schema("ts").dataType
      assert(ts == TimestampType, s"encoding $tag surfaced $ts")
    }
  }

  test("the normalized instants are identical across encodings") {
    val sums = fixtures.map { case (tag, dir) =>
      val r = Tables.events(spark, dir)
        .agg(sum(unix_micros(col("ts"))).cast("decimal(38,0)"),
          count(lit(1))).collect()(0)
      tag -> (r.getDecimal(0), r.getLong(1))
    }
    assert(sums.values.toSet.size == 1,
      s"per-encoding (sum unix_micros, count) diverged: $sums")
  }

  test("unix_micros-family query (twap) returns identical rows per encoding") {
    val results = fixtures.map { case (tag, dir) =>
      tag -> ops.TimeSeries.twap(spark, dir).collect().toSeq
    }
    assert(results.values.toSet.size == 1, "twap diverged across encodings")
    assert(results("ntz").nonEmpty)
  }

  test("window()-family query (tumbling) returns identical rows per encoding") {
    val results = fixtures.map { case (tag, dir) =>
      tag -> ops.Events.tumbling(spark, dir).collect().toSeq
    }
    assert(results.values.toSet.size == 1, "tumbling diverged across encodings")
    assert(results("ntz").nonEmpty)
  }

  test("getTimestamp accessors work against every encoding") {
    fixtures.foreach { case (tag, dir) =>
      val first = Tables.events(spark, dir)
        .select(col("ts")).orderBy(col("ts")).limit(1).collect()(0)
      // throws ClassCastException on an unnormalized NTZ column
      assert(first.getTimestamp(0) != null, s"encoding $tag")
    }
  }
}
