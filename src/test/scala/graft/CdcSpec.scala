package graft

import graft.etl.Cdc
import org.apache.spark.sql.functions._

/** Snapshot-diff CDC: planted fixtures for each change class, null
  * handling, and the no-change fast path. */
class CdcSpec extends SparkSpec {
  import spark.implicits._

  private def snap(rows: (Long, String, java.lang.Double)*) =
    rows.toDF("id", "status", "price")

  test("classifies inserts, deletes, updates; drops unchanged rows") {
    val old = snap((1L, "A", 10.0), (2L, "B", 20.0), (3L, "C", 30.0))
    val neu = snap((2L, "B", 25.0), (3L, "C", 30.0), (4L, "D", 40.0))
    val out = Cdc.snapshotDiff(old, neu, Seq("id"), Seq("status", "price"))
      .select("id", "change").as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "D", 2L -> "U", 4L -> "I"))
  }

  test("null-safe compare: value flipping to/from NULL is an update") {
    val old = snap((1L, "A", 10.0), (2L, "B", null))
    val neu = snap((1L, "A", null), (2L, "B", null))
    val out = Cdc.snapshotDiff(old, neu, Seq("id"), Seq("status", "price"))
      .select("id", "change").as[(Long, String)].collect().toMap
    // id 2 stays NULL on both sides: not a change
    assert(out == Map(1L -> "U"))
  }

  test("identical snapshots produce an empty change feed") {
    val s = snap((1L, "A", 10.0), (2L, "B", 20.0))
    assert(Cdc.snapshotDiff(s, s, Seq("id"), Seq("status", "price")).count() == 0)
  }

  test("q85 change feed: every change class present, counts consistent") {
    val feed = Cdc.ordersChangeFeed(spark, sf).cache()
    val byClass = feed.groupBy("change").count()
      .as[(String, Long)].collect().toMap
    // inserts are keys %11==0 (and %13!=0); deletes %13==0 (and %11!=0);
    // updates %7==0 survivors of both filters
    assert(byClass.keySet == Set("I", "D", "U"))
    val n = Tables.orders(spark, sf)
    val ins = n.filter(pmod(col("o_orderkey"), lit(11)) === 0 &&
      pmod(col("o_orderkey"), lit(13)) =!= 0).count()
    val del = n.filter(pmod(col("o_orderkey"), lit(13)) === 0 &&
      pmod(col("o_orderkey"), lit(11)) =!= 0).count()
    assert(byClass("I") == ins && byClass("D") == del)
    // updated rows carry both prices, exactly +100 apart
    val bad = feed.filter(col("change") === "U" &&
      (col("new_price") - col("old_price")) =!= 100.0).count()
    assert(bad == 0)
    feed.unpersist()
  }
}
