package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Flagship demo query (SURVEY.md §7): revenue by region × month with the
  * top-3 customers per region — scan(5 tables) → broadcast dims → equi
  * joins → date_trunc → agg → window rank → orderBy, in one Catalyst plan.
  *
  * Scale shape: one fact-fact shuffle (lineitem⋈orders on orderkey), dims
  * broadcast, two small aggregations downstream of the join; the window
  * runs over the already-aggregated (region × customer) set, which is
  * dim-sized, not fact-sized.
  */
object Flagship {
  import Det._

  def revenueTop3PerRegion(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val o  = Tables.orders(spark, dir)
    val c  = Tables.customer(spark, dir)
    val n  = Tables.nation(spark, dir)
    val r  = Tables.region(spark, dir)

    val joined = li
      .join(o, li("l_orderkey") === o("o_orderkey"))
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
}
