package graft

import scala.collection.immutable.ListMap
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 gets a named query here;
  * each query with SQL-expressible semantics also gets a DuckDB oracle in
  * [[oracleSql]] with IDENTICAL output column names and ordering (the
  * driver sorts columns by name and hash-compares values).
  */
object SparkEntry {
  type Q = (SparkSession, String) => DataFrame

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Flagship.revenueTop3PerRegion(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, Q] = ListMap(
    "q01_pricing_summary"   -> (Relational.pricingSummary _),
    "q02_scan_project"      -> (Relational.scanProject _),
    "q03_filter_predicates" -> (Relational.filterPredicates _),
    "q04_topk_orders"       -> (Relational.topkOrders _),
    "q05_distinct"          -> (Relational.distinctFlags _),
    "q06_join_equi"         -> (Relational.joinEqui _),
    "q07_join_broadcast_dims" -> (Relational.joinBroadcastDims _),
    "q08_join_semi"         -> (Relational.joinSemi _),
    "q09_join_anti"         -> (Relational.joinAnti _),
    "q10_join_outer"        -> (Relational.joinOuter _),
    "q00_flagship"          -> ((s: SparkSession, d: String) => Flagship.revenueTop3PerRegion(s, d)),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = {
    import Det.Sql._
    ListMap(
      "q01_pricing_summary" ->
        s"""SELECT l_returnflag, l_linestatus,
           |  ${exactSum("l_quantity")} AS sum_qty,
           |  ${exactSum("l_extendedprice")} AS sum_base_price,
           |  CAST(SUM(${revenueTerm("l_extendedprice", "l_discount")}) AS DOUBLE) AS sum_disc_price,
           |  CAST(SUM(${chargeTerm("l_extendedprice", "l_discount", "l_tax")}) AS DOUBLE) AS sum_charge,
           |  ${exactAvg("l_quantity")} AS avg_qty,
           |  ${exactAvg("l_extendedprice")} AS avg_price,
           |  COUNT(*) AS count_order
           |FROM lineitem
           |WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
           |GROUP BY l_returnflag, l_linestatus
           |ORDER BY l_returnflag, l_linestatus""".stripMargin,
      "q02_scan_project" ->
        """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
          |WHERE l_orderkey < 1000 ORDER BY l_orderkey, l_linenumber, l_quantity""".stripMargin,
      "q03_filter_predicates" ->
        """SELECT l_orderkey, l_linenumber, l_returnflag, l_discount FROM lineitem
          |WHERE l_shipdate BETWEEN TIMESTAMP '1995-01-01 00:00:00' AND TIMESTAMP '1996-12-31 00:00:00'
          |  AND l_returnflag IN ('A', 'R') AND l_discount > 0.05 AND l_quantity IS NOT NULL
          |ORDER BY l_orderkey, l_linenumber, l_returnflag, l_discount""".stripMargin,
      "q04_topk_orders" ->
        """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
          |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,
      "q05_distinct" ->
        """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
          |ORDER BY l_returnflag, l_linestatus""".stripMargin,
      "q06_join_equi" ->
        s"""SELECT c_mktsegment, COUNT(*) AS n_orders,
           |  ${exactSum("o_totalprice")} AS sum_price
           |FROM orders JOIN customer ON o_custkey = c_custkey
           |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
      "q07_join_broadcast_dims" ->
        s"""SELECT r_name,
           |  CAST(SUM(${revenueTerm("l_extendedprice", "l_discount")}) AS DOUBLE) AS revenue,
           |  COUNT(*) AS n_items
           |FROM lineitem
           |JOIN orders ON l_orderkey = o_orderkey
           |JOIN customer ON o_custkey = c_custkey
           |JOIN nation ON c_nationkey = n_nationkey
           |JOIN region ON n_regionkey = r_regionkey
           |GROUP BY r_name ORDER BY r_name""".stripMargin,
      "q08_join_semi" ->
        """SELECT c_custkey, c_name, c_mktsegment FROM customer
          |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
          |ORDER BY c_custkey""".stripMargin,
      "q09_join_anti" ->
        """SELECT c_custkey, c_name, c_nationkey FROM customer
          |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
          |ORDER BY c_custkey""".stripMargin,
      "q10_join_outer" ->
        """SELECT c_custkey, COUNT(o_orderkey) AS n_orders
          |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
          |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,
      "q00_flagship" ->
        s"""WITH by_customer AS (
           |  SELECT r_name, c_custkey,
           |    SUM(${revenueTerm("l_extendedprice", "l_discount")}) AS rev_d
           |  FROM lineitem
           |  JOIN orders ON l_orderkey = o_orderkey
           |  JOIN customer ON o_custkey = c_custkey
           |  JOIN nation ON c_nationkey = n_nationkey
           |  JOIN region ON n_regionkey = r_regionkey
           |  GROUP BY r_name, c_custkey
           |), ranked AS (
           |  SELECT r_name, c_custkey, rev_d,
           |    ROW_NUMBER() OVER (PARTITION BY r_name ORDER BY rev_d DESC, c_custkey) AS rnk
           |  FROM by_customer
           |)
           |SELECT r_name, rnk, c_custkey, CAST(rev_d AS DOUBLE) AS revenue
           |FROM ranked WHERE rnk <= 3 ORDER BY r_name, rnk""".stripMargin,
    )
  }
}
