package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Set-operation surface: UNION / INTERSECT / EXCEPT (+ ALL variants in
  * tests). Absent in the reference; engine extension surface.
  *
  * Scale: all three are key-partitioned shuffles on the full projected
  * row; inputs here are pre-projected to the key column so only keys
  * move. Spark's except/intersect are DISTINCT-semantics, matching SQL.
  */
object SetOps {
  private def buyersOf(spark: SparkSession, dir: String, status: String): DataFrame =
    Tables.orders(spark, dir)
      .filter(col("o_orderstatus") === status)
      .select(col("o_custkey").as("c_custkey"))

  /** Customers with a finished OR open order (UNION = distinct). */
  def unionBuyers(spark: SparkSession, dir: String): DataFrame =
    buyersOf(spark, dir, "F").union(buyersOf(spark, dir, "O"))
      .distinct().orderBy(col("c_custkey"))

  /** Customers with BOTH a finished and an open order (INTERSECT). */
  def intersectBuyers(spark: SparkSession, dir: String): DataFrame =
    buyersOf(spark, dir, "F").intersect(buyersOf(spark, dir, "O"))
      .orderBy(col("c_custkey"))

  /** Customers with a finished but no open order (EXCEPT). */
  def exceptBuyers(spark: SparkSession, dir: String): DataFrame =
    buyersOf(spark, dir, "F").except(buyersOf(spark, dir, "O"))
      .orderBy(col("c_custkey"))
}
