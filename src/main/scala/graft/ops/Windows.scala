package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window-function surface (SURVEY.md §2B): ranking, running frames,
  * lag/lead. Absent in the reference (single-table copy tool); this is
  * engine extension surface.
  *
  * Scale: a window partitioned by a key is one shuffle on that key plus
  * a per-partition sort — same cost shape as a groupBy, no broadcast of
  * anything. Partition keys here (custkey, suppkey) are high-cardinality
  * so there is no single-partition bottleneck; an ORDER BY-only window
  * (no partitionBy) would be the anti-pattern at scale and is avoided.
  */
object Windows {
  import Det._

  /** row_number / rank / dense_rank: top-3 orders per customer. */
  def topOrdersPerCustomer(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(spark, dir)
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("rnk", rank().over(w).cast("long"))
      .withColumn("drnk", dense_rank().over(w).cast("long"))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("rn"), col("rnk"), col("drnk"),
        col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_custkey"), col("rn"))
  }

  /** Running (cumulative) revenue per supplier over ship time — ROWS
    * UNBOUNDED PRECEDING frame, exact decimal arithmetic. */
  def runningRevenuePerSupplier(spark: SparkSession, dir: String): DataFrame = {
    val order = Seq(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
      col("l_extendedprice"))
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.lineitem(spark, dir)
      .filter(col("l_suppkey") <= 3) // keep output bounded; 3 suppliers
      .withColumn("running_price",
        sum(col("l_extendedprice").cast("decimal(18,2)")).over(w).cast("double"))
      .select(col("l_suppkey"), col("l_shipdate"), col("l_orderkey"),
        col("l_linenumber"), col("l_extendedprice"), col("running_price"))
      .orderBy(col("l_suppkey") +: order :+ col("running_price"): _*)
  }

  /** 90-day trailing revenue per supplier — RANGE frame over a numeric
    * day column (rangeBetween), the time-window complement of the ROWS
    * frame above: every row whose ship day falls in [day-90, day]
    * contributes, including same-day peers beyond the current row
    * (which a ROWS frame would exclude). */
  def trailingRevenuePerSupplier(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("ship_day"))
      .rangeBetween(-90, Window.currentRow)
    Tables.lineitem(spark, dir)
      .filter(col("l_suppkey") <= 3) // keep output bounded; 3 suppliers
      .withColumn("ship_day",
        datediff(col("l_shipdate"), lit("1995-01-01").cast("date")).cast("long"))
      .withColumn("trailing_rev",
        sum(col("l_extendedprice").cast("decimal(18,2)")).over(w).cast("double"))
      .select(col("l_suppkey"), col("ship_day"), col("l_orderkey"),
        col("l_linenumber"), col("l_extendedprice"), col("trailing_rev"))
      .orderBy(col("l_suppkey"), col("ship_day"), col("l_orderkey"),
        col("l_linenumber"), col("l_extendedprice"), col("trailing_rev"))
  }

  /** Distribution window functions (the analytic-SQL tail of the
    * window family): quartile assignment, percentile rank, cumulative
    * distribution, and a whole-partition nth_value. Ordering includes
    * the unique o_orderkey so NTILE's row numbering — which is
    * order-dependent under ties — is deterministic cross-engine. */
  def windowDistribution(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    val full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.orders(spark, dir)
      .withColumn("quartile", ntile(4).over(w).cast("long"))
      .withColumn("pct_rank", round(percent_rank().over(w), 6))
      .withColumn("cume", round(cume_dist().over(w), 6))
      .withColumn("second_price", nth_value(col("o_totalprice"), 2).over(full))
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        col("quartile"), col("pct_rank"), col("cume"), col("second_price"))
      .orderBy(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        col("quartile"), col("pct_rank"), col("cume"), col("second_price"))
  }

  /** lag/lead of order price within each customer's order history. */
  def orderPriceLagLead(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(spark, dir)
      .withColumn("prev_price", lag(col("o_totalprice"), 1).over(w))
      .withColumn("next_price", lead(col("o_totalprice"), 1).over(w))
      .withColumn("first_date", first(col("o_orderdate")).over(w))
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        col("o_totalprice"), col("prev_price"), col("next_price"),
        col("first_date"))
      .orderBy(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
  }
}
