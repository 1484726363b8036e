package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The remaining TPC-H query shapes (SURVEY.md §2B "TPC-H shapes"),
  * completing the 22-analog set: Q2/Q6/Q9/Q11/Q12/Q15/Q16/Q17/Q19/Q20
  * re-expressed over the synthetic star (which has no partsupp table
  * and no commitdate/shipmode columns — the partsupp-dependent queries
  * keep their SHAPE with lineitem as the supply relation, and Q12's
  * lateness is shipdate vs orderdate + 90 days).
  *
  * Determinism: every money aggregate runs in exact DECIMAL
  * (graft.ops.Det) and casts to DOUBLE once at the end; every
  * threshold that would be a float division is cross-multiplied into
  * exact DECIMAL/integer comparisons (the integer-ppm rule); every
  * query ends in an orderBy over all output columns.
  *
  * Scale: fact-fact joins ride the bucketed (orderkey) layout where
  * both sides appear; part/supplier/nation are broadcast dims; the
  * per-part/per-nation "global" comparisons are windows over the
  * POST-AGGREGATE (group-count-sized) frames, never over fact rows.
  */
object TpchShapes {
  import Det._

  private def rev: org.apache.spark.sql.Column =
    revenueTerm(col("l_extendedprice"), col("l_discount"))
  private def revSql: String =
    Det.Sql.revenueTerm("l_extendedprice", "l_discount")

  // ------------------------------------------------- q244 (Q6 shape)

  /** Q6: forecast revenue change — one tight filter + one exact sum.
    * The discount band compares in DECIMAL(3,2) on both engines so
    * the double 0.05/0.07 representations can't straddle the bound. */
  def revenueForecast(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount").cast("decimal(3,2)")
          .between(lit(0.05).cast("decimal(3,2)"),
            lit(0.07).cast("decimal(3,2)")) &&
        col("l_quantity") < 24)
      .agg(sum(col("l_extendedprice").cast("decimal(12,2)") *
          col("l_discount").cast("decimal(3,2)"))
        .cast("double").as("revenue"))
      .orderBy(col("revenue"))

  val revenueForecastOracleSql: String =
    """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
      |    * CAST(l_discount AS DECIMAL(3,2))) AS DOUBLE) AS revenue
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l_shipdate < TIMESTAMP '1997-01-01'
      |  AND CAST(l_discount AS DECIMAL(3,2))
      |    BETWEEN CAST(0.05 AS DECIMAL(3,2)) AND CAST(0.07 AS DECIMAL(3,2))
      |  AND l_quantity < 24
      |ORDER BY revenue""".stripMargin

  // ------------------------------------------------- q245 (Q9 shape)

  /** Q9: product profit by supplier nation × order year. No partsupp
    * → cost proxy is p_retailprice · quantity; the 5-way join shape
    * (fact-fact on the bucketed seam + three broadcast dims) and the
    * nation×year profit rollup are the point. */
  def productProfit(spark: SparkSession, dir: String,
      namePattern: String = "%gear%"): DataFrame = {
    val (li, o) = Tables.bucketedFacts(spark, dir)
    val p = Tables.part(spark, dir).filter(col("p_name").like(namePattern))
    val s = Tables.supplier(spark, dir)
    val n = Tables.nation(spark, dir)
    val profit = rev - col("p_retailprice").cast("decimal(12,2)") *
      col("l_quantity").cast("decimal(12,2)")
    li.hint("merge").join(o, li("l_orderkey") === o("o_orderkey"))
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(broadcast(s), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("o_orderdate")).cast("long").as("yr"))
      .agg(sum(profit).cast("double").as("profit"))
      .orderBy(col("nation"), col("yr"), col("profit"))
  }

  def productProfitOracleSql(namePattern: String = "%gear%"): String =
    s"""SELECT n_name AS nation,
       |  CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS yr,
       |  CAST(SUM($revSql - CAST(p_retailprice AS DECIMAL(12,2))
       |    * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS profit
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN part ON l_partkey = p_partkey
       |JOIN supplier ON l_suppkey = s_suppkey
       |JOIN nation ON s_nationkey = n_nationkey
       |WHERE p_name LIKE '$namePattern'
       |GROUP BY 1, 2
       |ORDER BY nation, yr, profit""".stripMargin

  // ------------------------------------------------ q246 (Q11 shape)

  /** Q11: important-stock concentration — per supplier nation, the
    * parts carrying more than 3× that nation's MEAN per-part value
    * share. The HAVING-vs-global-scalar shape becomes a window over
    * the (nation, part) AGGREGATE; the threshold is data-dependent
    * (share > 3/n_parts — the autoK rule: a fixed 0.5% cut went
    * vacuous at sf0.1 where each nation spans thousands of parts) and
    * the test stays exact DECIMAL cross-multiplication
    * (value · cnt > total · 3). */
  def partConcentration(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val s = Tables.supplier(spark, dir)
    val n = Tables.nation(spark, dir)
    val byPart = li
      .join(broadcast(s), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"), col("l_partkey"))
      .agg(sum(rev).as("value"))
    // per-nation totals as a ≤25-row aggregate broadcast back (the
    // round-13 global-window-census fix shape, r16): the per-nation
    // WINDOW exchanged the whole (nation, part) table into 25
    // partitions and sorted each in one task; byPart's two consumers
    // share ONE (nation, partkey) aggregate exchange at runtime
    // (AQE stage reuse — the q202 pin's contract), and DECIMAL sums
    // are exact + associative, so the re-aggregated totals are
    // value-identical to the window's
    val totals = byPart.groupBy(col("nation"))
      .agg(sum(col("value")).as("total"), count(lit(1)).as("cnt"))
    byPart
      .join(broadcast(totals), Seq("nation"))
      .filter(col("value") * col("cnt") > col("total") * 3)
      .select(col("nation"), col("l_partkey"),
        col("value").cast("double").as("value"))
      .orderBy(col("nation"), col("l_partkey"), col("value"))
  }

  val partConcentrationOracleSql: String =
    s"""WITH byp AS (
       |  SELECT n_name AS nation, l_partkey, SUM($revSql) AS value
       |  FROM lineitem
       |  JOIN supplier ON l_suppkey = s_suppkey
       |  JOIN nation ON s_nationkey = n_nationkey
       |  GROUP BY 1, 2)
       |SELECT nation, l_partkey, CAST(value AS DOUBLE) AS value
       |FROM byp
       |QUALIFY value * COUNT(*) OVER (PARTITION BY nation)
       |  > SUM(value) OVER (PARTITION BY nation) * 3
       |ORDER BY nation, l_partkey, value""".stripMargin

  // ------------------------------------------------ q247 (Q12 shape)

  /** Q12: late-line priority accounting — lines shipped more than 90
    * days after their order, within one shipdate year, split into
    * high/low priority counts per return flag (no shipmode column;
    * lateness is shipdate vs orderdate + 90d). Bucketed fact seam. */
  def latePriorityLines(spark: SparkSession, dir: String): DataFrame = {
    val (li, o) = Tables.bucketedFacts(spark, dir)
    li.hint("merge").join(o, li("l_orderkey") === o("o_orderkey"))
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
        col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"))
      .groupBy(col("l_returnflag"))
      .agg(sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L)).as("high_line_count"),
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L)
          .otherwise(1L)).as("low_line_count"))
      .orderBy(col("l_returnflag"), col("high_line_count"),
        col("low_line_count"))
  }

  val latePriorityLinesOracleSql: String =
    """SELECT l_returnflag,
      |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      |  AND l_shipdate < TIMESTAMP '1998-01-01'
      |  AND l_shipdate > o_orderdate + INTERVAL 90 DAY
      |GROUP BY 1
      |ORDER BY l_returnflag, high_line_count, low_line_count""".stripMargin

  // ------------------------------------------------ q248 (Q15 shape)

  /** Q15: top supplier(s) by quarterly revenue — the CREATE VIEW +
    * max-scalar-subquery shape. The max is a 1-row AGGREGATE joined
    * back by broadcast, NOT a full-frame window: a
    * `Window.partitionBy()` max would funnel the whole per-supplier
    * aggregate through one task (supplier count scales with the
    * corpus — the round-13 global-window discipline), while the
    * broadcast-max join keeps every stage distributed for one extra
    * scan of the REGISTER-persisted supplier aggregate. The max
    * compare stays in exact DECIMAL so ties are real ties. */
  def topSupplierRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val s = Tables.supplier(spark, dir)
    val perSupp = Dedup.register(li
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey")).agg(sum(rev).as("total_revenue"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val mx = perSupp.agg(max(col("total_revenue")).as("mx"))
    perSupp
      .join(broadcast(mx), col("total_revenue") === col("mx"))
      .join(broadcast(s), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        col("total_revenue").cast("double").as("total_revenue"))
      .orderBy(col("s_suppkey"), col("s_name"), col("total_revenue"))
  }

  val topSupplierRevenueOracleSql: String =
    s"""WITH pr AS (
       |  SELECT l_suppkey, SUM($revSql) AS total_revenue
       |  FROM lineitem
       |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
       |    AND l_shipdate < TIMESTAMP '1996-04-01'
       |  GROUP BY 1)
       |SELECT s_suppkey, s_name,
       |  CAST(total_revenue AS DOUBLE) AS total_revenue
       |FROM pr JOIN supplier ON l_suppkey = s_suppkey
       |QUALIFY total_revenue = MAX(total_revenue) OVER ()
       |ORDER BY s_suppkey, s_name, total_revenue""".stripMargin

  // ------------------------------------------------ q249 (Q16 shape)

  /** Q16: supplier diversity per part attribute class (lineitem as
    * the supply relation), excluding one brand and one type family —
    * count(DISTINCT supplier) per (brand, type, size) over a
    * broadcast-filtered dim join. */
  def supplierDiversity(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val p = Tables.part(spark, dir)
      .filter(col("p_brand") =!= "Brand#1" && col("p_type") =!= "PROMO" &&
        col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35))
    li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_type"),
        col("p_size").cast("long").as("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
        col("p_size"))
  }

  val supplierDiversityOracleSql: String =
    """SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
      |  CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
      |  AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
      |GROUP BY 1, 2, 3
      |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin

  // ------------------------------------------------ q250 (Q17 shape)

  /** Q17: small-quantity revenue — lines of one brand whose quantity
    * is under 20% of their part's average, as a yearly revenue figure.
    * The correlated avg becomes a per-part window; the 0.2·avg test
    * is cross-multiplied (5·qty·cnt < Σqty, exact DECIMAL); the /7
    * yearly figure is exact integer micro-dollars (Σ·10⁶ div 7 —
    * round-of-a-float-quotient is the q113 cross-engine ulp trap;
    * ADVICE r11). */
  def smallQuantityRevenue(spark: SparkSession, dir: String,
      brand: String = "Brand#2"): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val p = Tables.part(spark, dir).filter(col("p_brand") === brand)
    // quantities are integral: BIGINT keeps the cross-multiplied
    // 0.2·avg test exact on both engines (Spark's double→long cast
    // truncates, DuckDB's rounds — identical on integral values)
    val w = Window.partitionBy(col("p_partkey"))
    li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .withColumn("qb", col("l_quantity").cast("bigint"))
      .withColumn("cnt", count(lit(1)).over(w))
      .withColumn("sq", sum(col("qb")).over(w))
      .filter(col("qb") * 5 * col("cnt") < col("sq"))
      .agg(expr("cast((sum(cast(l_extendedprice as decimal(18,2)))" +
          " * 1000000) div 7 as bigint)").as("avg_yearly_micro"))
      .orderBy(col("avg_yearly_micro"))
  }

  def smallQuantityRevenueOracleSql(brand: String = "Brand#2"): String =
    s"""WITH j AS (
       |  SELECT CAST(l_quantity AS BIGINT) AS qb, l_extendedprice,
       |    COUNT(*) OVER (PARTITION BY p_partkey) AS cnt,
       |    SUM(CAST(l_quantity AS BIGINT))
       |      OVER (PARTITION BY p_partkey) AS sq
       |  FROM lineitem JOIN part ON l_partkey = p_partkey
       |  WHERE p_brand = '$brand')
       |SELECT CAST((SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
       |    * 1000000) // 7 AS BIGINT) AS avg_yearly_micro
       |FROM j
       |WHERE qb * 5 * cnt < sq
       |ORDER BY avg_yearly_micro""".stripMargin

  // ------------------------------------------------ q251 (Q19 shape)

  /** Q19: three disjunctive (brand, size, quantity) bands — the
    * OR-of-ANDs predicate Catalyst must keep pushable into the
    * broadcast-joined scan. One exact revenue sum. */
  def brandSizeQtyRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val p = Tables.part(spark, dir)
    li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
          col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
          col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#3" && col("p_size").between(1, 15) &&
          col("l_quantity").between(20, 30)))
      .agg(sum(rev).cast("double").as("revenue"))
      .orderBy(col("revenue"))
  }

  val brandSizeQtyRevenueOracleSql: String =
    s"""SELECT CAST(SUM($revSql) AS DOUBLE) AS revenue
       |FROM lineitem JOIN part ON l_partkey = p_partkey
       |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
       |    AND l_quantity BETWEEN 1 AND 11)
       |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
       |    AND l_quantity BETWEEN 10 AND 20)
       |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
       |    AND l_quantity BETWEEN 20 AND 30)
       |ORDER BY revenue""".stripMargin

  // ------------------------------------------------ q252 (Q20 shape)

  /** Q20: surplus suppliers — suppliers who shipped more than half of
    * some matching part's 1997 volume (lineitem as the supply
    * relation; the EXISTS/excess-stock test is an exact integer
    * 2·supplier_qty > part_total over the per-(part,supplier)
    * aggregate, then a distinct-supplier semi shape). */
  def surplusSuppliers(spark: SparkSession, dir: String,
      namePattern: String = "%bolt%"): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val p = Tables.part(spark, dir).filter(col("p_name").like(namePattern))
    val s = Tables.supplier(spark, dir)
    val perPS = li
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_partkey"), col("l_suppkey"))
      .agg(sum(col("l_quantity").cast("bigint")).as("sq"))
    perPS
      .withColumn("tq",
        sum(col("sq")).over(Window.partitionBy(col("p_partkey"))))
      .filter(col("sq") * 2 > col("tq"))
      .select(col("l_suppkey")).distinct()
      .join(broadcast(s), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"))
      .orderBy(col("s_suppkey"), col("s_name"))
  }

  def surplusSuppliersOracleSql(namePattern: String = "%bolt%"): String =
    s"""WITH ps AS (
       |  SELECT p_partkey, l_suppkey,
       |    CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sq
       |  FROM lineitem JOIN part ON l_partkey = p_partkey
       |  WHERE p_name LIKE '$namePattern'
       |    AND l_shipdate >= TIMESTAMP '1997-01-01'
       |    AND l_shipdate < TIMESTAMP '1998-01-01'
       |  GROUP BY 1, 2),
       |surplus AS (
       |  SELECT DISTINCT l_suppkey FROM ps
       |  QUALIFY sq * 2 > SUM(sq) OVER (PARTITION BY p_partkey))
       |SELECT s_suppkey, s_name
       |FROM surplus JOIN supplier ON l_suppkey = s_suppkey
       |ORDER BY s_suppkey, s_name""".stripMargin

  // ------------------------------------------------- q253 (Q2 shape)

  /** Q2: minimum-cost supplier per part — for one (type, size) part
    * class, the supplier(s) achieving the minimum unit price (exact
    * integer micro-units: cents·10⁴ div qty — no float division),
    * with the classic acctbal-desc output order. The correlated MIN
    * subquery becomes a window over the per-(part,supplier)
    * aggregate. */
  def minUnitPriceSupplier(spark: SparkSession, dir: String,
      pType: String = "ECONOMY", pSize: Int = 7): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val p = Tables.part(spark, dir)
      .filter(col("p_type") === pType && col("p_size") === pSize)
    val s = Tables.supplier(spark, dir)
    val n = Tables.nation(spark, dir)
    val unit = expr("CAST((CAST(CAST(l_extendedprice AS DECIMAL(12,2))" +
      " * 100 AS DECIMAL(38,0)) * 10000)" +
      " div CAST(l_quantity AS BIGINT) AS BIGINT)")
    val perPS = li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .select(col("p_partkey"), col("l_suppkey"), unit.as("unit_ppm"))
      .groupBy(col("p_partkey"), col("l_suppkey"))
      .agg(min(col("unit_ppm")).as("unit_ppm"))
    perPS
      .withColumn("mn",
        min(col("unit_ppm")).over(Window.partitionBy(col("p_partkey"))))
      .filter(col("unit_ppm") === col("mn"))
      .join(broadcast(s), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"),
        col("p_partkey"), col("unit_ppm"))
      .orderBy(col("s_acctbal").desc, col("s_name"), col("n_name"),
        col("p_partkey"), col("unit_ppm"))
  }

  def minUnitPriceSupplierOracleSql(pType: String = "ECONOMY",
      pSize: Int = 7): String =
    s"""WITH ps AS (
       |  SELECT p_partkey, l_suppkey,
       |    MIN(CAST(CAST(CAST(CAST(l_extendedprice AS DECIMAL(12,2))
       |      * 100 AS DECIMAL(38,0)) AS HUGEINT) * 10000
       |      // CAST(l_quantity AS BIGINT) AS BIGINT)) AS unit_ppm
       |  FROM lineitem JOIN part ON l_partkey = p_partkey
       |  WHERE p_type = '$pType' AND p_size = $pSize
       |  GROUP BY 1, 2),
       |mins AS (
       |  SELECT p_partkey, l_suppkey, unit_ppm FROM ps
       |  QUALIFY unit_ppm = MIN(unit_ppm) OVER (PARTITION BY p_partkey))
       |SELECT s_acctbal, s_name, n_name, p_partkey, unit_ppm
       |FROM mins
       |JOIN supplier ON l_suppkey = s_suppkey
       |JOIN nation ON s_nationkey = n_nationkey
       |ORDER BY s_acctbal DESC, s_name, n_name, p_partkey,
       |  unit_ppm""".stripMargin
}
