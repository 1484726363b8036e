package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Flagship demo query (SURVEY.md §7): revenue by region × month with the
  * top-3 customers per region — scan(5 tables) → broadcast dims → equi
  * joins → date_trunc → agg → window rank → orderBy, in one Catalyst plan.
  *
  * Scale shape: the fact-fact leg (lineitem⋈orders on orderkey) reads the
  * BUCKETED layout (Tables.bucketedFacts), so the sort-merge join plans
  * with zero exchange on either fact input — at 100 TB that shuffle is
  * the dominant cost of this plan, and the co-located layout removes it
  * entirely (PlanShapeSpec "q00 flagship"; same contract as q70). Dims
  * broadcast; the window runs over the already-aggregated (region ×
  * customer) set, which is dim-sized, not fact-sized.
  */
object Flagship {
  import Det._

  def revenueTop3PerRegion(spark: SparkSession, dir: String): DataFrame = {
    val (li, o) = Tables.bucketedFacts(spark, dir)
    val c  = Tables.customer(spark, dir)
    val n  = Tables.nation(spark, dir)
    val r  = Tables.region(spark, dir)

    val joined = li
      .hint("merge").join(o, li("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .select(col("r_name"), col("c_custkey"),
        revenueTerm(col("l_extendedprice"), col("l_discount")).as("rev"))

    val byCustomer = joined
      .groupBy(col("r_name"), col("c_custkey"))
      .agg(sum(col("rev")).as("rev_d"))

    val w = Window.partitionBy(col("r_name"))
      .orderBy(col("rev_d").desc, col("c_custkey"))

    byCustomer
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select(col("r_name"), col("rnk"), col("c_custkey"),
        col("rev_d").cast("double").as("revenue"))
      .orderBy(col("r_name"), col("rnk"))
  }

  /** TPC-H Q5-shaped composite: revenue per nation from LOCAL supply
    * chains (customer and supplier in the same nation) within one
    * region and one order year — the 6-table join-ordering showcase.
    *
    * Scale shape: lineitem⋈orders reads the BUCKETED layout, so the
    * one fact-fact join plans with no exchange on either side; the
    * date filter cuts orders BEFORE the join (pushed to the bucketed
    * scan — a filter preserves the scan's bucket partitioning), and
    * every dimension broadcasts. customer broadcasts here because
    * SF-scale customers fit; at 100 TB the customer join becomes the
    * one key-shuffle while the plan shape otherwise holds. */
  def regionalRevenue(spark: SparkSession, dir: String,
      region: String = "ASIA"): DataFrame = {
    val (li, oAll) = Tables.bucketedFacts(spark, dir)
    val o = oAll
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
    val c = Tables.customer(spark, dir)
    val s = Tables.supplier(spark, dir)
    val n = Tables.nation(spark, dir)
    val r = Tables.region(spark, dir).filter(col("r_name") === region)
    li.hint("merge").join(o, li("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(s), li("l_suppkey") === s("s_suppkey") &&
        c("c_nationkey") === s("s_nationkey"))
      .join(broadcast(n), s("s_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(sum(revenueTerm(col("l_extendedprice"), col("l_discount")))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }
}
