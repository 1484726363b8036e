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

  /** TPC-H Q8 shape (q218): a supplier nation's market share inside
    * one region's market, per order year — the two-level aggregate
    * the Q5 shape (q82) lacks: a conditional revenue sum DIVIDED by
    * the market total, with the division kept exact (both revenue
    * sums are DECIMAL-exact; the share is integer ppm over their
    * scale-4 integer images, so no float enters the decision).
    *
    * Scale shape: the fact join rides the orderkey-bucketed layout
    * (merge-pinned, zero fact exchanges); all five dimension sides
    * broadcast; one map-side-combined aggregate to |years| rows. */
  def marketShare(spark: SparkSession, dir: String,
      regionName: String = "ASIA",
      nationName: String = "NATION_2"): DataFrame = {
    val (li, o) = Tables.bucketedFacts(spark, dir)
    val c = Tables.customer(spark, dir)
    val cn = Tables.nation(spark, dir)
      .select(col("n_nationkey").as("cn_key"),
        col("n_regionkey").as("cn_region"))
    val r = Tables.region(spark, dir)
      .filter(col("r_name") === regionName)
    val s = Tables.supplier(spark, dir)
    val sn = Tables.nation(spark, dir)
      .select(col("n_nationkey").as("sn_key"),
        col("n_name").as("supp_nation"))
    val rev = revenueTerm(col("l_extendedprice"), col("l_discount"))
    li.hint("merge").join(o, li("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(cn), c("c_nationkey") === col("cn_key"))
      .join(broadcast(r), col("cn_region") === r("r_regionkey"))
      .join(broadcast(s), li("l_suppkey") === s("s_suppkey"))
      .join(broadcast(sn), s("s_nationkey") === col("sn_key"))
      .groupBy(year(col("o_orderdate")).cast("long").as("yr"))
      .agg(sum(rev).as("total"),
        sum(when(col("supp_nation") === nationName, rev)).as("natn"))
      .select(col("yr"),
        col("total").cast("double").as("total_revenue"),
        coalesce(col("natn"), lit(0)).cast("double")
          .as("nation_revenue"),
        expr("CAST((CAST(coalesce(natn, 0) * 10000 AS DECIMAL(38,0))" +
          " * 1000000) div CAST(total * 10000 AS DECIMAL(38,0))" +
          " AS BIGINT)").as("share_ppm"))
      .orderBy(col("yr"), col("total_revenue"), col("nation_revenue"),
        col("share_ppm"))
  }

  /** TPC-H Q7 shape (q230): shipping volume between two nations —
    * revenue flowing supplier-nation → customer-nation per order
    * year, both directions of the pair. The classic "trade lane"
    * two-dimension drill the Q5/Q8 shapes don't cover (both ends of
    * the fact row carry a nation).
    *
    * Scale shape: fact join on the orderkey-bucketed seam
    * (merge-pinned, exchange-free); supplier/customer + both nation
    * aliases broadcast; one aggregate to |pairs|·|years| rows. */
  def nationVolume(spark: SparkSession, dir: String,
      n1: String = "NATION_13", n2: String = "NATION_19"): DataFrame = {
    val (li, o) = Tables.bucketedFacts(spark, dir)
    val s = Tables.supplier(spark, dir)
    val c = Tables.customer(spark, dir)
    val sn = Tables.nation(spark, dir)
      .select(col("n_nationkey").as("snk"),
        col("n_name").as("supp_nation"))
    val cn = Tables.nation(spark, dir)
      .select(col("n_nationkey").as("cnk"),
        col("n_name").as("cust_nation"))
    val rev = revenueTerm(col("l_extendedprice"), col("l_discount"))
    li.hint("merge").join(o, li("l_orderkey") === o("o_orderkey"))
      .join(broadcast(s), li("l_suppkey") === s("s_suppkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(sn), s("s_nationkey") === col("snk"))
      .join(broadcast(cn), c("c_nationkey") === col("cnk"))
      .filter((col("supp_nation") === n1 && col("cust_nation") === n2) ||
        (col("supp_nation") === n2 && col("cust_nation") === n1))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("o_orderdate")).cast("long").as("yr"))
      .agg(sum(rev).cast("double").as("revenue"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("yr"),
        col("revenue"))
  }

  /** DuckDB oracle for [[nationVolume]]. */
  def nationVolumeOracleSql(n1: String = "NATION_13",
      n2: String = "NATION_19"): String = {
    val rev = graft.ops.Det.Sql
      .revenueTerm("l_extendedprice", "l_discount")
    s"""SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       |  CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS yr,
       |  CAST(SUM($rev) AS DOUBLE) AS revenue
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN supplier s ON l_suppkey = s.s_suppkey
       |JOIN customer c ON o_custkey = c.c_custkey
       |JOIN nation sn ON s.s_nationkey = sn.n_nationkey
       |JOIN nation cn ON c.c_nationkey = cn.n_nationkey
       |WHERE (sn.n_name = '$n1' AND cn.n_name = '$n2')
       |   OR (sn.n_name = '$n2' AND cn.n_name = '$n1')
       |GROUP BY 1, 2, 3
       |ORDER BY supp_nation, cust_nation, yr, revenue""".stripMargin
  }

  /** DuckDB oracle for [[marketShare]] — same joins, same DECIMAL
    * revenue term, same scale-4 integer ppm. */
  def marketShareOracleSql(regionName: String = "ASIA",
      nationName: String = "NATION_2"): String = {
    val rev = graft.ops.Det.Sql
      .revenueTerm("l_extendedprice", "l_discount")
    s"""WITH f AS (
       |  SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS yr,
       |    $rev AS rev, sn.n_name AS supp_nation
       |  FROM lineitem
       |  JOIN orders ON l_orderkey = o_orderkey
       |  JOIN customer ON o_custkey = c_custkey
       |  JOIN nation cn ON c_nationkey = cn.n_nationkey
       |  JOIN region r ON cn.n_regionkey = r.r_regionkey
       |    AND r.r_name = '$regionName'
       |  JOIN supplier s ON l_suppkey = s.s_suppkey
       |  JOIN nation sn ON s.s_nationkey = sn.n_nationkey),
       |a AS (
       |  SELECT yr, SUM(rev) AS total,
       |    COALESCE(SUM(CASE WHEN supp_nation = '$nationName'
       |      THEN rev END), 0) AS natn
       |  FROM f GROUP BY yr)
       |SELECT yr, CAST(total AS DOUBLE) AS total_revenue,
       |  CAST(natn AS DOUBLE) AS nation_revenue,
       |  CAST(CAST(natn * 10000 AS HUGEINT) * 1000000
       |    // CAST(total * 10000 AS HUGEINT) AS BIGINT) AS share_ppm
       |FROM a
       |ORDER BY yr, total_revenue, nation_revenue, share_ppm""".stripMargin
  }
}
