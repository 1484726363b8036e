package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL entry point: the engine's tables exposed as temp views and
  * queried through spark.sql — same Catalyst plans as the DataFrame
  * API, proving a reference user could bring existing SQL unchanged.
  */
object SqlSurface {

  /** Register every testdata table as a temp view (idempotent).
    * `events` goes through Tables.events so SQL users see the
    * microsecond timestamp, not the raw nanos long the parquet file
    * carries under nanosAsLong=true. */
  def registerViews(spark: SparkSession, dir: String): Unit =
    Tables.names.foreach {
      case "events" => Tables.events(spark, dir).createOrReplaceTempView("events")
      case n        => Tables(spark, dir, n).createOrReplaceTempView(n)
    }

  /** Correlated scalar subquery + IN subquery, via SQL. MAX-based
    * comparisons only (exact under floats, unlike AVG thresholds). */
  def maxQuantityLineitems(spark: SparkSession, dir: String): DataFrame = {
    registerViews(spark, dir)
    spark.sql(
      """SELECT l_orderkey, l_linenumber, l_quantity
        |FROM lineitem
        |WHERE l_quantity = (SELECT MAX(l_quantity) FROM lineitem)
        |  AND l_orderkey IN (SELECT o_orderkey FROM orders
        |                     WHERE o_orderstatus = 'F')
        |ORDER BY l_orderkey, l_linenumber, l_quantity""".stripMargin)
  }

  /** Correlated LATERAL subquery with per-group ORDER BY + LIMIT — the
    * "top 2 orders for every customer" shape expressed as a lateral
    * join rather than a window. Catalyst rewrites the correlated limit
    * into a ranked window under the hood, so the physical plan is the
    * same partitioned-window shape as q20 — the point here is the SQL
    * surface (DuckDB runs the identical text as the oracle). */
  def lateralTopOrders(spark: SparkSession, dir: String): DataFrame = {
    registerViews(spark, dir)
    spark.sql(
      """SELECT c_custkey, t.o_orderkey, t.o_totalprice
        |FROM customer CROSS JOIN LATERAL (
        |  SELECT o_orderkey, o_totalprice FROM orders
        |  WHERE o_custkey = c_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
        |ORDER BY c_custkey, o_orderkey, o_totalprice""".stripMargin)
  }
}
