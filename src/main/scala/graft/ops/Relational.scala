package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Core relational operator surface (SURVEY.md §2B).
  *
  * The reference implements only trivial projection/filter/count
  * (transfer_data_script.py:102-125); everything else here is the
  * engine's analytics extension. All queries are pure DataFrame API so
  * Catalyst plans them (pushdown, pruning, broadcast, whole-stage
  * codegen). Every query ends in an orderBy over a unique key set and
  * uses Det.* for float aggregates — the DuckDB oracle hash-compare
  * requires bit-stable output.
  *
  * Scale notes (100 TB): filters/projections push into the scan;
  * aggregations are partial-map-side by default; dims (region, nation,
  * customer at TPC-H ratios, supplier, part) are broadcast explicitly so
  * the fact table (lineitem) never shuffles for dim joins; the only
  * unavoidable shuffles are fact-fact joins (orders⋈lineitem on
  * orderkey) and final group-bys, both keyed well and AQE-coalesced.
  */
object Relational {
  import Det._

  /** TPC-H-Q1-style pricing summary: scan → filter → groupBy → agg.
    * Partial aggregation happens map-side (4 groups), so the shuffle is
    * tiny regardless of input scale. */
  def pricingSummary(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        exactSum(col("l_quantity")).as("sum_qty"),
        exactSum(col("l_extendedprice")).as("sum_base_price"),
        sum(revenueTerm(col("l_extendedprice"), col("l_discount")))
          .cast("double").as("sum_disc_price"),
        sum(chargeTerm(col("l_extendedprice"), col("l_discount"), col("l_tax")))
          .cast("double").as("sum_charge"),
        exactAvg(col("l_quantity")).as("avg_qty"),
        exactAvg(col("l_extendedprice")).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** Projection + selective filter; both push into the parquet scan
    * (PushedFilters + 3-column ReadSchema — verified via explain). */
  def scanProject(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_orderkey") < 1000)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      // (l_orderkey, l_linenumber) is not unique in the synthetic data —
      // order by every output column so ties are only between equal rows.
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))

  /** Compound predicate surface: between, isin, comparison, isNotNull. */
  def filterPredicates(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(
        col("l_shipdate").between(
          lit("1995-01-01").cast("timestamp"),
          lit("1996-12-31").cast("timestamp")) &&
        col("l_returnflag").isin("A", "R") &&
        col("l_discount") > 0.05 &&
        col("l_quantity").isNotNull)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
        col("l_discount"))
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
        col("l_discount"))

  /** Global top-k: Catalyst plans TakeOrderedAndProject — each partition
    * keeps k rows, so no full sort/shuffle at any scale. */
  def topkOrders(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)

  /** DISTINCT — a shuffle on the projected columns only (2 small cols). */
  def distinctFlags(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), col("l_linestatus"))
      .distinct()
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** Equi inner join orders⋈customer, then agg by segment. The join key
    * (o_custkey = c_custkey) shuffles both sides; at scale, customer is
    * ~1/10 of orders so Catalyst/AQE picks broadcast or shuffled-hash. */
  def joinEqui(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    o.join(c, o("o_custkey") === c("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"),
        exactSum(col("o_totalprice")).as("sum_price"))
      .orderBy(col("c_mktsegment"))
  }

  /** Fact-fact join over the BUCKETED layout (Tables.bucketedFacts):
    * both sides pre-bucketed by the order key, so the sort-merge join
    * plans with ZERO exchange on either input — the co-location
    * strategy that removes the one big shuffle from every
    * lineitem⋈orders query at 100 TB. `hint("merge")` pins SMJ (a
    * broadcast would also avoid the shuffle locally but proves
    * nothing about the layout); the only exchange left in the plan is
    * the final tiny groupBy. PlanShapeSpec asserts the shape. */
  def joinBucketed(spark: SparkSession, dir: String): DataFrame = {
    val (li, o) = Tables.bucketedFacts(spark, dir)
    li.hint("merge").join(o, li("l_orderkey") === o("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_items"),
        exactSum(col("l_quantity")).as("sum_qty"))
      .orderBy(col("o_orderstatus"))
  }

  /** q06's aggregate through the CUSTKEY-bucketed layout (q124): the
    * customer-grain join — the star's second join key, where customer
    * stops being broadcastable at 100 TB — plans as a sort-merge join
    * with zero exchange on either side, the q70 contract applied to
    * the second dominant key (one co-located layout per join pattern,
    * the projection/sort-order move). Same oracle as q06; only the
    * physical plan differs. */
  def joinBucketedCustomer(spark: SparkSession, dir: String): DataFrame = {
    val (c, o) = Tables.bucketedCustomerOrders(spark, dir)
    o.hint("merge").join(c, o("o_custkey") === c("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"),
        exactSum(col("o_totalprice")).as("sum_price"))
      .orderBy(col("c_mktsegment"))
  }

  /** Ship-latency distribution per order priority: lineitem⋈orders on
    * the bucketed layout (zero fact-side exchange, the q00/q70
    * contract), then a 7-day-bin histogram of shipdate − orderdate.
    * The synthetic data has no causal order→ship relation, so
    * latencies span negative days; BOTH engines' integer division
    * truncates toward zero (DuckDB `//` floors only on floats), so
    * the bucket uses an explicit integer FLOOR division (truncating
    * div minus one when the remainder is negative) written
    * symbol-for-symbol in the oracle — exact for ANY latency, no
    * shift, no data invariant. */
  def shipLatencyDist(spark: SparkSession, dir: String): DataFrame = {
    val (li, o) = Tables.bucketedFacts(spark, dir)
    li.hint("merge").join(o, li("l_orderkey") === o("o_orderkey"))
      .select(col("o_orderpriority"),
        datediff(col("l_shipdate").cast("date"),
          col("o_orderdate").cast("date")).cast("long").as("lat"))
      .groupBy(col("o_orderpriority"),
        (expr("(lat div 7) - (case when lat % 7 < 0 then 1 else 0 end)")
          * 7).as("bucket_lo_days"))
      .agg(count(lit(1)).as("n"), min(col("lat")).as("min_days"),
        max(col("lat")).as("max_days"))
      .orderBy(col("o_orderpriority"), col("bucket_lo_days"), col("n"),
        col("min_days"), col("max_days"))
  }

  /** Monthly ship-latency percentile trend (q225): per order month,
    * exact nearest-rank P50 and P90 of shipdate − orderdate in days
    * — the SLA trend line an ops dashboard plots, kept exact: the
    * rank test is cross-multiplied (cum·100 ≥ n·p ⇔ cum ≥ ⌈n·p/100⌉
    * for integer cum), so no float percentile enters. q137's
    * histogram shows the SHAPE; this shows the trend.
    *
    * Scale shape: the fact join rides the bucketed layout; the cum
    * walk windows the per-(month, latency) COUNT table (distinct
    * values per month, not rows), partitioned by month, running
    * frame only. */
  def latencyTrend(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val (li, o) = Tables.bucketedFacts(spark, dir)
    val counts = li.hint("merge")
      .join(o, li("l_orderkey") === o("o_orderkey"))
      .select(expr("year(o_orderdate) * 100 + month(o_orderdate)")
        .cast("long").as("ym"),
        datediff(col("l_shipdate").cast("date"),
          col("o_orderdate").cast("date")).cast("long").as("lat"))
      .groupBy(col("ym"), col("lat")).agg(count(lit(1)).as("c"))
    val wCum = Window.partitionBy(col("ym")).orderBy(col("lat"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("ym"))
    counts
      .withColumn("cum", sum(col("c")).over(wCum))
      .withColumn("n", sum(col("c")).over(wAll))
      .groupBy(col("ym"))
      .agg(max(col("n")).as("n"),
        min(when(col("cum") * 100 >= col("n") * 50, col("lat")))
          .as("p50_days"),
        min(when(col("cum") * 100 >= col("n") * 90, col("lat")))
          .as("p90_days"))
      .orderBy(col("ym"), col("n"), col("p50_days"), col("p90_days"))
  }

  /** DuckDB oracle for [[latencyTrend]] — same cross-multiplied
    * nearest-rank cut. */
  val latencyTrendOracleSql: String =
    """WITH l AS (
      |  SELECT CAST(EXTRACT(YEAR FROM o_orderdate) * 100
      |    + EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS ym,
      |    CAST(DATEDIFF('day', CAST(o_orderdate AS DATE),
      |      CAST(l_shipdate AS DATE)) AS BIGINT) AS lat
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      |c AS (SELECT ym, lat, COUNT(*) AS c FROM l GROUP BY 1, 2),
      |w AS (
      |  SELECT ym, lat,
      |    SUM(c) OVER (PARTITION BY ym ORDER BY lat
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
      |    SUM(c) OVER (PARTITION BY ym) AS n
      |  FROM c)
      |SELECT ym, CAST(MAX(n) AS BIGINT) AS n,
      |  CAST(MIN(CASE WHEN cum * 100 >= n * 50 THEN lat END)
      |    AS BIGINT) AS p50_days,
      |  CAST(MIN(CASE WHEN cum * 100 >= n * 90 THEN lat END)
      |    AS BIGINT) AS p90_days
      |FROM w GROUP BY ym
      |ORDER BY ym, n, p50_days, p90_days""".stripMargin

  /** TPC-H Q13 shape (q226): the orders-per-customer distribution
    * INCLUDING the zero bucket (the left join no inner-join shape
    * can produce) — how many customers placed 0, 1, 2, … orders.
    * Rides the custkey-bucketed layout (q124's second co-located
    * seam): the outer join co-locates exactly like the inner one,
    * zero exchange on either side.
    *
    * Scale shape: merge-pinned bucketed outer join → per-customer
    * count (reuses the bucket distribution) → a histogram over
    * ≤ max-orders rows. */
  def customerOrderDist(spark: SparkSession, dir: String): DataFrame = {
    val (c, o) = Tables.bucketedCustomerOrders(spark, dir)
    c.hint("merge").join(o, c("c_custkey") === o("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("n_orders"))
      .groupBy(col("n_orders"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy(col("n_orders"), col("n_customers"))
  }

  /** DuckDB oracle for [[customerOrderDist]]. */
  val customerOrderDistOracleSql: String =
    """WITH pc AS (
      |  SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS n_orders
      |  FROM customer LEFT JOIN orders ON o_custkey = c_custkey
      |  GROUP BY c_custkey)
      |SELECT n_orders, COUNT(*) AS n_customers
      |FROM pc GROUP BY n_orders
      |ORDER BY n_orders, n_customers""".stripMargin

  /** TPC-H Q10 shape (q231): returned-item revenue per customer, top
    * N — the "who is returning the most money" churn report. The
    * deterministic-cut rule applies: revenue ties break on custkey
    * before the LIMIT.
    *
    * Scale shape: bucketed fact join, returnflag filter pushed to
    * the lineitem scan, broadcast customer/nation, TakeOrdered
    * top-N — never a global sort of the aggregate. */
  def returnedRevenueTop(spark: SparkSession, dir: String,
      topN: Int = 20): DataFrame = {
    import graft.ops.Det._
    val (li, o) = Tables.bucketedFacts(spark, dir)
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    val rev = revenueTerm(col("l_extendedprice"), col("l_discount"))
    li.filter(col("l_returnflag") === "R")
      .hint("merge").join(o, li("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
      .agg(sum(rev).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"), col("c_name"),
        col("n_name"))
      .limit(topN)
  }

  /** DuckDB oracle for [[returnedRevenueTop]]. */
  def returnedRevenueTopOracleSql(topN: Int = 20): String = {
    val rev = graft.ops.Det.Sql
      .revenueTerm("l_extendedprice", "l_discount")
    s"""SELECT c_custkey, c_name, n_name,
       |  CAST(SUM($rev) AS DOUBLE) AS revenue
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation ON c_nationkey = n_nationkey
       |WHERE l_returnflag = 'R'
       |GROUP BY 1, 2, 3
       |ORDER BY revenue DESC, c_custkey, c_name, n_name
       |LIMIT $topN""".stripMargin
  }

  /** TPC-H Q14 shape (q232): promo revenue share per order month —
    * the conditional-aggregate ratio kept exact (scale-4 integer
    * images, the q218 rule).
    *
    * Scale shape: lineitem joins the broadcast part dim; one
    * map-side-combined aggregate to |months| rows. (Months come from
    * l_shipdate — the lineitem's own time axis; no orders join
    * needed at all.) */
  def promoRevenueShare(spark: SparkSession, dir: String): DataFrame =
    promoRevenueShareOn(Tables.lineitem(spark, dir),
      Tables.part(spark, dir))

  /** Frame-based core of [[promoRevenueShare]]. */
  def promoRevenueShareOn(li: DataFrame, part: DataFrame): DataFrame = {
    import graft.ops.Det._
    val rev = revenueTerm(col("l_extendedprice"), col("l_discount"))
    li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .groupBy(expr("year(l_shipdate) * 100 + month(l_shipdate)")
        .cast("long").as("ym"))
      .agg(sum(rev).as("total"),
        sum(when(col("p_type") === "PROMO", rev)).as("promo"))
      .select(col("ym"),
        col("total").cast("double").as("total_revenue"),
        coalesce(col("promo"), lit(0)).cast("double")
          .as("promo_revenue"),
        expr("CAST((CAST(coalesce(promo, 0) * 10000 AS DECIMAL(38,0))" +
          " * 1000000) div CAST(total * 10000 AS DECIMAL(38,0))" +
          " AS BIGINT)").as("promo_share_ppm"))
      .orderBy(col("ym"), col("total_revenue"), col("promo_revenue"),
        col("promo_share_ppm"))
  }

  /** DuckDB oracle for [[promoRevenueShare]]. */
  val promoRevenueShareOracleSql: String = {
    val rev = graft.ops.Det.Sql
      .revenueTerm("l_extendedprice", "l_discount")
    s"""WITH a AS (
       |  SELECT CAST(EXTRACT(YEAR FROM l_shipdate) * 100
       |      + EXTRACT(MONTH FROM l_shipdate) AS BIGINT) AS ym,
       |    SUM($rev) AS total,
       |    COALESCE(SUM(CASE WHEN p_type = 'PROMO' THEN $rev END), 0)
       |      AS promo
       |  FROM lineitem JOIN part ON l_partkey = p_partkey
       |  GROUP BY 1)
       |SELECT ym, CAST(total AS DOUBLE) AS total_revenue,
       |  CAST(promo AS DOUBLE) AS promo_revenue,
       |  CAST(CAST(promo * 10000 AS HUGEINT) * 1000000
       |    // CAST(total * 10000 AS HUGEINT) AS BIGINT)
       |    AS promo_share_ppm
       |FROM a
       |ORDER BY ym, total_revenue, promo_revenue,
       |  promo_share_ppm""".stripMargin
  }

  /** TPC-H Q22 shape (q233): dormant high-balance customers — above
    * the positive-balance average (cross-multiplied integer cents,
    * no float average) with NO orders in the trailing 90 days of the
    * data (the anti join against a recency-filtered orders; the
    * cutoff derives from max(o_orderdate), a data-dependent
    * parameter the oracle re-derives — the autoK trick). The
    * "dormant capital" report; Q22's phone-prefix grouping becomes
    * the nation key (this schema carries no phone).
    *
    * Scale shape: the anti join rides the custkey-bucketed seam
    * (anti joins co-locate like inner ones, and the recency filter
    * preserves the bucket distribution — zero exchange on either
    * side); the average and the cutoff are 1-row broadcasts. */
  def idleRichCustomers(spark: SparkSession, dir: String,
      trailingDays: Int = 90): DataFrame = {
    val (c0, o) = Tables.bucketedCustomerOrders(spark, dir)
    val c = c0.withColumn("cents",
      (col("c_acctbal").cast("decimal(12,2)") * 100).cast("long"))
    val avgA = c.filter(col("cents") > 0L)
      .agg(sum(col("cents")).as("tc"), count(lit(1)).as("nc"))
    // get(0), not getTimestamp: orderdate may surface as NTZ
    // (LocalDateTime) depending on the parquet encoding; lit()
    // accepts both
    val cutoff = o.agg(max(col("o_orderdate")).as("mx")).head().get(0)
    val recent = o.filter(col("o_orderdate") >=
      lit(cutoff) - expr(s"INTERVAL $trailingDays DAYS"))
    c.crossJoin(broadcast(avgA))
      .filter(col("cents") * col("nc") > col("tc"))
      .hint("merge")
      .join(recent, c("c_custkey") === recent("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey").cast("long").as("c_nationkey"))
      .agg(count(lit(1)).as("n_cust"),
        sum(col("cents")).as("total_cents"))
      .orderBy(col("c_nationkey"), col("n_cust"), col("total_cents"))
  }

  /** DuckDB oracle for [[idleRichCustomers]] — same cross-multiplied
    * average, same data-derived recency cutoff. */
  def idleRichCustomersOracleSql(trailingDays: Int = 90): String =
    s"""WITH c AS (
       |  SELECT c_custkey, c_nationkey,
       |    CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT)
       |      AS cents
       |  FROM customer),
       |a AS (
       |  SELECT CAST(SUM(cents) AS BIGINT) AS tc,
       |    CAST(COUNT(*) AS BIGINT) AS nc
       |  FROM c WHERE cents > 0),
       |cut AS (
       |  SELECT MAX(o_orderdate) - INTERVAL $trailingDays DAY AS cu
       |  FROM orders)
       |SELECT c_nationkey, COUNT(*) AS n_cust,
       |  CAST(SUM(cents) AS BIGINT) AS total_cents
       |FROM c CROSS JOIN a CROSS JOIN cut
       |WHERE cents * nc > tc
       |  AND NOT EXISTS (SELECT 1 FROM orders o
       |                  WHERE o.o_custkey = c.c_custkey
       |                    AND o.o_orderdate >= cut.cu)
       |GROUP BY c_nationkey
       |ORDER BY c_nationkey, n_cust, total_cents""".stripMargin

  /** Star join with explicitly broadcast dims: revenue per region.
    * lineitem⋈orders rides the bucketed layout (zero exchange below
    * the sort-merge join); customer/nation/region ride along
    * broadcast — the fact table is never re-shuffled for them. */
  def joinBroadcastDims(spark: SparkSession, dir: String): DataFrame = {
    val (li, o) = Tables.bucketedFacts(spark, dir)
    val c  = Tables.customer(spark, dir)
    val n  = Tables.nation(spark, dir)
    val r  = Tables.region(spark, dir)
    li.hint("merge").join(o, li("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(sum(revenueTerm(col("l_extendedprice"), col("l_discount")))
        .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("r_name"))
  }

  /** Left-semi join: customers having at least one order (EXISTS). Only
    * the key column of orders crosses the wire. */
  def joinSemi(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir).select(col("o_custkey"))
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  /** Left-anti join: customers with no finished ('F') order (NOT EXISTS
    * with a pushed-down filter on the probe side — unfiltered anti is
    * empty in this data). */
  def joinAnti(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderstatus") === "F").select(col("o_custkey"))
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"))
      .orderBy(col("c_custkey"))
  }

  /** Full outer join with unmatched rows on BOTH sides: per-customer
    * finished-order stats vs open-order stats — customers having only
    * one of the two appear with nulls on the other side. */
  def joinFullOuter(spark: SparkSession, dir: String): DataFrame = {
    def side(status: String, n: String, s: String) =
      Tables.orders(spark, dir).filter(col("o_orderstatus") === status)
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as(n), exactSum(col("o_totalprice")).as(s))
    val f = side("F", "n_f", "sum_f")
    val o = side("O", "n_o", "sum_o")
    f.join(o, f("o_custkey") === o("o_custkey"), "full_outer")
      .select(
        coalesce(f("o_custkey"), o("o_custkey")).as("custkey"),
        coalesce(col("n_f"), lit(0L)).as("n_f"),
        coalesce(col("n_o"), lit(0L)).as("n_o"),
        col("sum_f"), col("sum_o"),
        f("o_custkey").isNull.as("only_open"),
        o("o_custkey").isNull.as("only_finished"))
      .orderBy(col("custkey"))
  }

  /** Pure range join (no equi conjunct): lineitems bucketed into
    * literal quarter intervals. The interval dim is tiny and broadcast,
    * so Catalyst's BroadcastNestedLoopJoin is the RIGHT plan — each
    * fact row tests 4 intervals in codegen, no shuffle of the fact. */
  def rangeJoinQuarters(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val quarters = Seq(
      ("1996-Q1", "1996-01-01", "1996-04-01"),
      ("1996-Q2", "1996-04-01", "1996-07-01"),
      ("1996-Q3", "1996-07-01", "1996-10-01"),
      ("1996-Q4", "1996-10-01", "1997-01-01"))
      .toDF("quarter", "q_start", "q_end")
      .select(col("quarter"), col("q_start").cast("timestamp"),
        col("q_end").cast("timestamp"))
    Tables.lineitem(spark, dir)
      .join(broadcast(quarters),
        col("l_shipdate") >= col("q_start") && col("l_shipdate") < col("q_end"))
      .groupBy(col("quarter"))
      .agg(count(lit(1)).as("n_items"),
        exactSum(col("l_quantity")).as("sum_qty"))
      .orderBy(col("quarter"))
  }

  /** TPC-H-Q3-style shipping priority: top unshipped revenue orders for
    * one segment — selective filters on all three tables push to the
    * scans, broadcast customer-key set, exchange-free bucketed
    * fact-fact join, top-10 via TakeOrdered. */
  def shippingPriority(spark: SparkSession, dir: String): DataFrame = {
    val cut = lit("1997-01-01").cast("timestamp")
    val c = Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
    // both date filters apply on the bucketed scans (a filter preserves
    // bucket partitioning), so the selective fact-fact join is still
    // exchange-free
    val (liAll, oAll) = Tables.bucketedFacts(spark, dir)
    val o = oAll.filter(col("o_orderdate") < cut)
    val li = liAll.filter(col("l_shipdate") > cut)
    li.hint("merge").join(o, li("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate"))
      .agg(sum(revenueTerm(col("l_extendedprice"), col("l_discount")))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)
  }

  /** Left outer join preserving customers with zero orders; COUNT of the
    * right key counts only matches (SQL COUNT(o_orderkey) semantics). */
  def joinOuter(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("n_orders"))
      .orderBy(col("c_custkey"))
  }

  /** Right outer join — the genuine RightOuter variant (orders on the
    * left, every customer preserved from the right), not a rewritten
    * left join; min order date instead of a count so the unmatched-row
    * NULL passes through visibly. */
  def joinRightOuter(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    o.join(c, o("o_custkey") === c("c_custkey"), "right_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("n_orders"),
        min(col("o_orderdate")).as("first_order"))
      .orderBy(col("c_custkey"))
  }

  /** TPC-H-Q18-style large-order customers (q160): orders whose total
    * lineitem quantity clears a threshold, joined back to order and
    * customer attributes — the aggregate-then-having-then-enrich
    * shape.
    *
    * Scale shape: BOTH fact passes ride the orderkey-bucketed layout —
    * the groupBy(l_orderkey) needs no exchange (the scan is already
    * hash-distributed on the key) and the orders join sort-merges
    * bucket-to-bucket with no exchange on either side (hint("merge")
    * pins it; the q00/q49 discipline). Only the customer dim
    * broadcasts. The qty sum is the exact-decimal fold cast to double
    * once (Det.exactSum), so the HAVING compare cannot drift. */
  def largeOrderCustomers(spark: SparkSession, dir: String,
      minQty: Long = 300L): DataFrame = {
    val (li, o) = Tables.bucketedFacts(spark, dir)
    val big = li.groupBy(col("l_orderkey"))
      .agg(exactSum(col("l_quantity")).as("sum_qty"))
      .filter(col("sum_qty") > minQty)
    big.join(o.hint("merge"), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(spark, dir)),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"), col("sum_qty"))
      .orderBy(col("c_custkey"), col("c_name"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"), col("sum_qty"))
  }

  /** DuckDB oracle for [[largeOrderCustomers]]. */
  def largeOrderCustomersOracleSql(minQty: Long = 300L): String =
    s"""WITH big AS (
       |  SELECT l_orderkey, ${Det.Sql.exactSum("l_quantity")} AS sum_qty
       |  FROM lineitem GROUP BY l_orderkey
       |  HAVING ${Det.Sql.exactSum("l_quantity")} > $minQty)
       |SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate,
       |  o.o_totalprice, b.sum_qty
       |FROM big b
       |JOIN orders o ON b.l_orderkey = o.o_orderkey
       |JOIN customer c ON o.o_custkey = c.c_custkey
       |ORDER BY c_custkey, c_name, o_orderkey, o_orderdate,
       |  o_totalprice, sum_qty""".stripMargin

  /** TPC-H-Q21-style sole-late-supplier screen (q161), adapted to the
    * bundled schema (no commit/receipt dates): a lineitem is LATE when
    * it ships more than `lateDays` days after its order date. For each
    * supplier, count the multi-supplier orders where it was the ONLY
    * late supplier — the "who alone holds up shared orders" operations
    * query, classically written with EXISTS/NOT EXISTS; the aggregate
    * formulation below (per-order supplier/late counts, then a filter)
    * is equivalent and joins once instead of thrice.
    *
    * Scale shape: the fact-fact join rides the bucketed layout (no
    * exchange); the per-(order, supplier) and per-order aggregates
    * re-use the same orderkey distribution; the supplier rollup is
    * |suppliers|-sized. */
  def soleLateSuppliers(spark: SparkSession, dir: String,
      lateDays: Int = 60): DataFrame = {
    val (li, o) = Tables.bucketedFacts(spark, dir)
    val flags = li.join(o.hint("merge"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey"),
        when(col("l_shipdate") >
          col("o_orderdate") + expr(s"INTERVAL $lateDays DAYS"), 1L)
          .otherwise(0L).as("late"))
    val perSupp = flags.groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(max(col("late")).as("supp_late"))
    // per-order supplier/late counts as a WINDOW over the same
    // orderkey clustering, not a second aggregate: a perOrder frame
    // would make perSupp a two-consumer subtree and re-scan both
    // bucketed facts (measured: 4 scans vs 2); the window needs no
    // exchange because perSupp is already distributed on the order key
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("l_orderkey"))
    perSupp
      .withColumn("n_supp", count(lit(1)).over(w))
      .withColumn("n_late", sum(col("supp_late")).over(w))
      .filter(col("supp_late") === 1L &&
        col("n_supp") >= 2L && col("n_late") === 1L)
      .groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("l_suppkey"), col("numwait"))
  }

  /** TPC-H-Q4-style order-priority checking (q168): for each order
    * priority, how many orders placed in a window have at least one
    * LATE lineitem (shipped more than `lateDays` days after the order
    * date — the bundled schema's lateness rule, as q161). The classic
    * EXISTS-subquery shape, expressed as a per-order max-flag
    * aggregate (one pass, no second fact scan).
    *
    * Scale shape: both facts ride the orderkey-bucketed layout — the
    * merge join and the per-order aggregate reuse the bucket
    * distribution (no fact exchange); the priority rollup is 5
    * groups. */
  def orderPriorityAudit(spark: SparkSession, dir: String,
      lateDays: Int = 60, from: String = "1996-01-01",
      until: String = "1997-01-01"): DataFrame = {
    val (li, o) = Tables.bucketedFacts(spark, dir)
    val inWindow = o
      .filter(col("o_orderdate") >= lit(from).cast("timestamp") &&
        col("o_orderdate") < lit(until).cast("timestamp"))
    val perOrder = li.join(inWindow.hint("merge"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderkey"), col("o_orderpriority"))
      .agg(max(when(col("l_shipdate") >
          col("o_orderdate") + expr(s"INTERVAL $lateDays DAYS"), 1L)
        .otherwise(0L)).as("has_late"))
    perOrder.groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("has_late")).as("n_late_orders"))
      .orderBy(col("o_orderpriority"), col("n_orders"),
        col("n_late_orders"))
  }

  /** DuckDB oracle for [[orderPriorityAudit]]. */
  def orderPriorityAuditOracleSql(lateDays: Int = 60,
      from: String = "1996-01-01", until: String = "1997-01-01"): String =
    s"""WITH per_order AS (
       |  SELECT o.o_orderkey, o.o_orderpriority,
       |    MAX(CASE WHEN l.l_shipdate >
       |      o.o_orderdate + INTERVAL $lateDays DAY THEN 1 ELSE 0 END)
       |      AS has_late
       |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
       |  WHERE o.o_orderdate >= TIMESTAMP '$from'
       |    AND o.o_orderdate < TIMESTAMP '$until'
       |  GROUP BY o.o_orderkey, o.o_orderpriority)
       |SELECT o_orderpriority, COUNT(*) AS n_orders,
       |  CAST(SUM(has_late) AS BIGINT) AS n_late_orders
       |FROM per_order GROUP BY o_orderpriority
       |ORDER BY o_orderpriority, n_orders, n_late_orders""".stripMargin

  /** DuckDB oracle for [[soleLateSuppliers]]. */
  def soleLateSuppliersOracleSql(lateDays: Int = 60): String =
    s"""WITH flags AS (
       |  SELECT l.l_orderkey, l.l_suppkey,
       |    CASE WHEN l.l_shipdate >
       |      o.o_orderdate + INTERVAL $lateDays DAY THEN 1 ELSE 0 END
       |      AS late
       |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
       |per_supp AS (
       |  SELECT l_orderkey, l_suppkey, MAX(late) AS supp_late
       |  FROM flags GROUP BY l_orderkey, l_suppkey),
       |per_order AS (
       |  SELECT l_orderkey, COUNT(*) AS n_supp, SUM(supp_late) AS n_late
       |  FROM per_supp GROUP BY l_orderkey)
       |SELECT s.l_suppkey, COUNT(*) AS numwait
       |FROM per_supp s JOIN per_order po ON s.l_orderkey = po.l_orderkey
       |WHERE s.supp_late = 1 AND po.n_supp >= 2 AND po.n_late = 1
       |GROUP BY s.l_suppkey
       |ORDER BY l_suppkey, numwait""".stripMargin
}
