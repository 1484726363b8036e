package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Schema-level data audits — the checks the reference's constraint
  * phase implies but never runs: before `add_foreign_keys` blindly
  * emits ALTER TABLE (transfer_data_with_constraints_script.py:
  * 104-171, failures swallowed per-FK), a migrator should KNOW which
  * edges are clean. These are the audits, as queries.
  */
object Audit {

  /** Functional-dependency check: for key → attr, count keys whose
    * attr is not constant. "Not constant" is decided by min ≠ max
    * instead of countDistinct > 1 — identical verdict per key (both
    * ignore NULLs; an all-NULL attr yields NULL ≠ NULL = false, i.e.
    * not violating, matching distinct-count 0), but min/max are plain
    * partial aggregates while exact countDistinct pays a Catalyst
    * Expand that doubles the scan's rows. One aggregate per
    * dependency, partial aggregation bounds the shuffle at |keys|. */
  def fdViolations(df: DataFrame, name: String, key: String,
      attr: String): DataFrame =
    df.groupBy(col(key))
      .agg(min(col(attr)).as("lo"), max(col(attr)).as("hi"))
      .agg(count(lit(1)).as("n_keys"),
        sum(when(col("lo") =!= col("hi"), 1L).otherwise(0L))
          .as("n_violating"))
      .select(lit(name).as("dependency"), col("n_keys"), col("n_violating"))

  /** Query entry (q111): one holding and one failing dependency —
    * o_orderkey→o_custkey holds (orderkey is the orders PK), while
    * l_orderkey→l_shipdate fails (the generated data spreads ship
    * dates inside an order; even (orderkey, linenumber) is not unique
    * in this corpus, which is itself a finding this op surfaces). */
  def fdCheck(spark: SparkSession, dir: String): DataFrame =
    fdViolations(Tables.lineitem(spark, dir), "l_orderkey->l_shipdate",
        "l_orderkey", "l_shipdate")
      .unionAll(fdViolations(Tables.orders(spark, dir),
        "o_orderkey->o_custkey", "o_orderkey", "o_custkey"))
      .orderBy(col("dependency"), col("n_keys"), col("n_violating"))

  /** One schema-drift finding between two reflections of "the same"
    * table. `change` ∈ added | removed | type_changed |
    * nullability_changed | serial_changed. */
  final case class SchemaChange(column: String, change: String,
      oldType: Option[String], newType: Option[String])

  /** Schema-drift audit between two reflections of a table — the
    * pre-flight an incremental migrator runs before trusting
    * yesterday's DDL: the reference re-creates blindly with
    * checkfirst=True (transfer_data_script.py:67), which silently
    * keeps a STALE target schema when the source evolved; this
    * surfaces exactly what changed instead. Pure metadata function
    * (catalog-sized input), deterministic output order. */
  def schemaDiff(old: graft.meta.TableMeta,
      neu: graft.meta.TableMeta): Seq[SchemaChange] = {
    val o = old.columns.map(c => c.name -> c).toMap
    val n = neu.columns.map(c => c.name -> c).toMap
    def ty(c: graft.meta.ColumnMeta) =
      c.sourceTypeName.getOrElse(c.dataType.sql)
    val added = (n.keySet -- o.keySet).toSeq.sorted
      .map(k => SchemaChange(k, "added", None, Some(ty(n(k)))))
    val removed = (o.keySet -- n.keySet).toSeq.sorted
      .map(k => SchemaChange(k, "removed", Some(ty(o(k))), None))
    val common = (o.keySet & n.keySet).toSeq.sorted
    val typed = common.filter(k => o(k).dataType != n(k).dataType ||
        o(k).sourceTypeName != n(k).sourceTypeName)
      .map(k => SchemaChange(k, "type_changed", Some(ty(o(k))), Some(ty(n(k)))))
    val nulled = common.filter(k => o(k).nullable != n(k).nullable)
      .map(k => SchemaChange(k, "nullability_changed",
        Some(if (o(k).nullable) "NULL" else "NOT NULL"),
        Some(if (n(k).nullable) "NULL" else "NOT NULL")))
    val serial = common.filter(k => o(k).serial != n(k).serial)
      .map(k => SchemaChange(k, "serial_changed",
        Some(o(k).serial.toString), Some(n(k).serial.toString)))
    added ++ removed ++ typed ++ nulled ++ serial
  }

  /** Export-chunk skew audit: rows per fixed key-range chunk of the
    * fact, with each chunk's load as ppm of the ideal uniform share —
    * the planning step for a partitioned JDBC export
    * (`Transfer.readJdbcPartitioned`), and the scale-correct answer to
    * the reference's unordered OFFSET/LIMIT paging
    * (transfer_data_script.py:109-114): fixed key ranges scan in
    * parallel, never rescan, and this audit shows whether the key
    * space is uniform enough or the stride needs adjusting. Pure
    * integer arithmetic; one keyed aggregate + a broadcast 1-row
    * total — the chunk table is corpus-sized/stride, so a full-frame
    * window over it would funnel every chunk row through one task
    * (the round-13 global-window discipline); the register-persisted
    * chunk frame feeds both the totals and the per-chunk share. */
  def exportChunkAudit(spark: SparkSession, dir: String,
      stride: Long = 2048L): DataFrame = {
    val chunks = Dedup.register(Tables.orders(spark, dir)
      .select(expr(s"o_orderkey div $stride").as("chunk"))
      .groupBy(col("chunk")).agg(count(lit(1)).as("n_rows"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val totals = chunks.agg(sum(col("n_rows")).as("total"),
      count(lit(1)).as("n_chunks"))
    chunks.crossJoin(broadcast(totals))
      .select(col("chunk"), col("n_rows"),
        expr("n_rows * n_chunks * 1000000 div total").as("load_ppm"))
      .orderBy(col("chunk"), col("n_rows"), col("load_ppm"))
  }

  /** Referential-integrity audit: for every FK edge of the star
    * schema, the referencing row count and the number of orphaned
    * rows (left-anti join against the referenced key). True dims
    * broadcast; the one fact→fact edge (lineitem→orders) rides the
    * BUCKETED layout so the anti-join is exchange-free — orders is
    * not broadcastable at 100 TB, and co-location covers anti-joins
    * the same way it covers inner joins. This is the pre-flight for
    * the reference's 3-phase FK rebuild — a nonzero orphan count is
    * exactly the case where its per-FK try/except would swallow an
    * ALTER TABLE failure. */
  def riAudit(spark: SparkSession, dir: String): DataFrame = {
    def edge(name: String, child: DataFrame, fk: String,
        parent: DataFrame, pk: String,
        hinted: Boolean = false): DataFrame = {
      val p = parent.select(col(pk))
      val orphans = child.join(
        if (hinted) p.hint("merge") else broadcast(p),
        col(fk) === col(pk), "left_anti")
      child.agg(count(lit(1)).as("n_rows"))
        .crossJoin(orphans.agg(count(lit(1)).as("n_orphans")))
        .select(lit(name).as("fk_edge"), col("n_rows"), col("n_orphans"))
    }
    val (li, o) = Tables.bucketedFacts(spark, dir)
    edge("lineitem.l_orderkey->orders", li, "l_orderkey",
        o, "o_orderkey", hinted = true)
      .unionAll(edge("lineitem.l_partkey->part", li, "l_partkey",
        Tables.part(spark, dir), "p_partkey"))
      .unionAll(edge("lineitem.l_suppkey->supplier", li, "l_suppkey",
        Tables.supplier(spark, dir), "s_suppkey"))
      .unionAll(edge("orders.o_custkey->customer", o, "o_custkey",
        Tables.customer(spark, dir), "c_custkey"))
      .unionAll(edge("customer.c_nationkey->nation",
        Tables.customer(spark, dir), "c_nationkey",
        Tables.nation(spark, dir), "n_nationkey"))
      .unionAll(edge("supplier.s_nationkey->nation",
        Tables.supplier(spark, dir), "s_nationkey",
        Tables.nation(spark, dir), "n_nationkey"))
      .orderBy(col("fk_edge"), col("n_rows"), col("n_orphans"))
  }

  /** Ingest-freshness audit over the event stream: per event type,
    * the row count, first/last event time (µs), and staleness against
    * the corpus watermark (max ts anywhere) — the "is this feed
    * still flowing" dashboard row; a type whose staleness grows while
    * others stay near zero is a dead upstream, the first thing a
    * pipeline on-call checks. All integer µs, one keyed aggregate
    * plus a 1-row watermark broadcast. */
  def freshnessAudit(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_type"), unix_micros(col("ts")).as("us"))
    val perType = ev.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"), min(col("us")).as("first_us"),
        max(col("us")).as("last_us"))
    val watermark = perType.agg(max(col("last_us")).as("wm"))
    perType.crossJoin(broadcast(watermark))
      .select(col("event_type"), col("n_events"), col("first_us"),
        col("last_us"), (col("wm") - col("last_us")).as("staleness_us"))
      .orderBy(col("event_type"), col("n_events"), col("first_us"),
        col("last_us"), col("staleness_us"))
  }

  /** Join-skew diagnostic for a prospective equi-join: per join key,
    * both sides' row counts and the output fan-out (their product) —
    * the pre-flight a 100 TB join runs BEFORE shuffling, because one
    * hot key turns a sort-merge join into a straggler (AQE's skew
    * split reacts at runtime; this report predicts it from two cheap
    * keyed counts). Reports every key whose fan-out exceeds `minFan`
    * plus each side's key count share in ppm, ordered worst-first by
    * the deterministic (fanout, key) rule.
    *
    * Scale shape: two map-side-combined counts + one join on the key
    * count tables (|keys| rows, not |rows|); nothing touches the
    * facts beyond the first aggregates. The fan-out cross-multiply
    * runs in DECIMAL(38,0) (DuckDB oracle: HUGEINT) so the very
    * skew this diagnostic exists to catch — hot-key fan-outs past
    * ~9.2e12, where a LongType product would hit ANSI overflow —
    * still produces a report; BIGINT casts only on the outputs. */
  def joinSkewReport(spark: SparkSession, dir: String,
      minFan: Long = 8L): DataFrame = {
    val l = Tables.lineitem(spark, dir).groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n_left"))
    val r = Tables.orders(spark, dir).groupBy(col("o_orderkey"))
      .agg(count(lit(1)).as("n_right"))
    val joined = l.join(r, col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey").as("join_key"), col("n_left"),
        col("n_right"),
        (col("n_left").cast("decimal(19,0)") *
          col("n_right").cast("decimal(19,0)")).as("fan_d"))
    val tot = joined.agg(
      sum(col("fan_d")).cast("decimal(38,0)").as("total_fanout"))
    joined.crossJoin(broadcast(tot))
      .filter(col("fan_d") >= minFan)
      .select(col("join_key"), col("n_left"), col("n_right"),
        col("fan_d").cast("long").as("fanout"),
        expr("fan_d * 1000000 div total_fanout").as("fanout_share_ppm"))
      .orderBy(col("fanout").desc, col("join_key").asc, col("n_left"),
        col("n_right"), col("fanout_share_ppm"))
  }

  /** k-anonymity audit over a quasi-identifier tuple — the
    * re-identification screen run before releasing or training on
    * user-adjacent data: every (nationkey, mktsegment) equivalence
    * class with fewer than k members is a privacy risk row. Reports
    * per-class size, the at-risk flag, and the overall risk share in
    * integer ppm (share of ROWS living in small classes — the metric
    * privacy reviews quote).
    *
    * Scale shape: one keyed count over the quasi-identifier (map-side
    * combined) + a 1-row global aggregate joined back; the fact is
    * scanned once. */
  def kAnonymity(spark: SparkSession, dir: String, k: Long = 5L): DataFrame = {
    val classes = Tables.customer(spark, dir)
      .groupBy(col("c_nationkey"), col("c_mktsegment"))
      .agg(count(lit(1)).as("class_size"))
    val risk = classes.agg(
      sum(col("class_size")).as("total_rows"),
      sum(when(col("class_size") < k, col("class_size")).otherwise(0L))
        .as("risk_rows"))
    classes.crossJoin(broadcast(risk))
      .select(col("c_nationkey"), col("c_mktsegment"), col("class_size"),
        (col("class_size") < k).as("at_risk"),
        expr("risk_rows * 1000000 div total_rows").as("risk_share_ppm"))
      .orderBy(col("c_nationkey"), col("c_mktsegment"), col("class_size"),
        col("at_risk"), col("risk_share_ppm"))
  }

  /** l-diversity audit (q158): the sibling of [[kAnonymity]] — a
    * quasi-identifier class is safe only if its SENSITIVE attribute
    * takes at least `l` distinct values within the class (k-anonymity
    * alone admits a class of 50 rows that all share one diagnosis).
    * Quasi-identifier: c_nationkey; sensitive: c_mktsegment. Reports
    * each class's size and diversity plus the population share living
    * in under-diverse classes (integer ppm).
    *
    * Scale shape: one keyed aggregate (count + distinct-count per
    * class), one 1-row broadcast — the countDistinct Expand doubles
    * class-scan rows, acceptable for an audit that runs per release,
    * not per query. */
  def lDiversity(spark: SparkSession, dir: String, l: Long = 3L): DataFrame = {
    val classes = Tables.customer(spark, dir)
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("class_size"),
        countDistinct(col("c_mktsegment")).as("l_div"))
    val risk = classes.agg(
      sum(col("class_size")).as("total_rows"),
      sum(when(col("l_div") < l, col("class_size")).otherwise(0L))
        .as("risk_rows"))
    classes.crossJoin(broadcast(risk))
      .select(col("c_nationkey").cast("long").as("c_nationkey"),
        col("class_size"), col("l_div"),
        (col("l_div") < l).as("at_risk"),
        expr("risk_rows * 1000000 div total_rows").as("risk_share_ppm"))
      .orderBy(col("c_nationkey"), col("class_size"), col("l_div"),
        col("at_risk"), col("risk_share_ppm"))
  }

  /** DuckDB oracle for [[lDiversity]]. */
  def lDiversityOracleSql(l: Long = 3L): String =
    s"""WITH c AS (
       |  SELECT c_nationkey, COUNT(*) AS class_size,
       |    COUNT(DISTINCT c_mktsegment) AS l_div
       |  FROM customer GROUP BY c_nationkey),
       |r AS (
       |  SELECT SUM(class_size) AS total_rows,
       |    SUM(CASE WHEN l_div < $l THEN class_size ELSE 0 END)
       |      AS risk_rows
       |  FROM c)
       |SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey,
       |  CAST(class_size AS BIGINT) AS class_size,
       |  CAST(l_div AS BIGINT) AS l_div,
       |  l_div < $l AS at_risk,
       |  CAST(risk_rows * 1000000 // total_rows AS BIGINT)
       |    AS risk_share_ppm
       |FROM c CROSS JOIN r
       |ORDER BY c_nationkey, class_size, l_div, at_risk,
       |  risk_share_ppm""".stripMargin

  /** Self-join size forecast (q229): the planner pre-flight for any
    * user-keyed pair operator (q141's session-overlap join, q98's
    * wedges) — from ONE keyed count, the exact output cardinality a
    * self-join on user_id would produce (Σ nᵤ², and its
    * pairs-without-self variant Σ nᵤ(nᵤ−1)/2), the single heaviest
    * key's contribution, and that key's share in ppm. The number
    * that says "this join is safe" / "salt this key first" BEFORE
    * paying the shuffle — q139 profiles fan-out between two tables,
    * this prices the self-join.
    *
    * Scale shape: one map-side-combined keyed count, then a 1-row
    * fold in DECIMAL(38,0) — the join itself is never executed. */
  def joinSizeForecast(spark: SparkSession, dir: String): DataFrame = {
    def d(c: Column) = c.cast("decimal(38,0)")
    Tables.events(spark, dir)
      .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      .agg(count(lit(1)).as("n_keys"),
        sum(d(col("n")) * d(col("n"))).as("sq"),
        max(d(col("n")) * d(col("n"))).as("mx"),
        sum(d(col("n"))).as("tot"))
      .select(col("n_keys"),
        expr("CAST(sq AS BIGINT)").as("forecast_rows"),
        expr("CAST((sq - tot) div 2 AS BIGINT)")
          .as("forecast_pairs"),
        expr("CAST(mx AS BIGINT)").as("max_key_rows"),
        expr("CAST((mx * 1000000) div sq AS BIGINT)")
          .as("top_share_ppm"))
      .orderBy(col("n_keys"), col("forecast_rows"),
        col("forecast_pairs"), col("max_key_rows"),
        col("top_share_ppm"))
  }

  /** DuckDB oracle for [[joinSizeForecast]] — forecast_pairs =
    * Σnᵤ(nᵤ−1)/2 = (Σn² − N)/2 with N the total row count. */
  val joinSizeForecastOracleSql: String =
    """WITH k AS (
      |  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n
      |  FROM events GROUP BY user_id),
      |f AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
      |    SUM(CAST(n AS HUGEINT) * n) AS sq,
      |    MAX(CAST(n AS HUGEINT) * n) AS mx,
      |    SUM(CAST(n AS HUGEINT)) AS tot
      |  FROM k)
      |SELECT n_keys, CAST(sq AS BIGINT) AS forecast_rows,
      |  CAST((sq - tot) // 2 AS BIGINT) AS forecast_pairs,
      |  CAST(mx AS BIGINT) AS max_key_rows,
      |  CAST(mx * 1000000 // sq AS BIGINT) AS top_share_ppm
      |FROM f
      |ORDER BY n_keys, forecast_rows, forecast_pairs, max_key_rows,
      |  top_share_ppm""".stripMargin

  /** k-anonymity generalization ladder (q219): the ENFORCEMENT step
    * the q133 audit stops short of — four fixed coarsening levels of
    * the (nationkey, mktsegment, acctbal) quasi-identifier (exact
    * cents → $100 buckets → $1000 buckets → acctbal dropped), each
    * measured (class count, min class size, risky rows, risk ppm),
    * with `chosen` marking the MINIMAL level whose every class
    * reaches k — the release answer "how much resolution must we
    * give up". Bucketing uses the explicit negative-safe floor
    * division (acctbal can be negative; the q137 rule, written
    * symbol-for-symbol in both engines).
    *
    * Scale shape: a 4× explode of one projection, one keyed
    * aggregate, then everything is |levels|-sized (persisted for its
    * two consumers — the chosen-level scan and the 1-row
    * min-satisfying aggregate it broadcasts). */
  def kAnonLadder(spark: SparkSession, dir: String,
      k: Long = 5L): DataFrame =
    kAnonLadderOn(Tables.customer(spark, dir), k)

  /** Frame-based core of [[kAnonLadder]] (needs c_nationkey,
    * c_mktsegment, c_acctbal). */
  def kAnonLadderOn(customers: DataFrame, k: Long = 5L): DataFrame = {
    def fdiv(g: Long) = expr(
      s"cents div $g - (case when cents % $g < 0 then 1 else 0 end)")
    val base = customers
      .select(col("c_nationkey"), col("c_mktsegment"),
        (col("c_acctbal").cast("decimal(12,2)") * 100).cast("long")
          .as("cents"))
    val lv = base.select(col("c_nationkey"), col("c_mktsegment"),
        explode(array(
          struct(lit(0L).as("level"), col("cents").as("bucket")),
          struct(lit(1L).as("level"), fdiv(10000L).as("bucket")),
          struct(lit(2L).as("level"), fdiv(100000L).as("bucket")),
          struct(lit(3L).as("level"), lit(0L).as("bucket")))).as("e"))
      .select(col("c_nationkey"), col("c_mktsegment"),
        col("e.level").as("level"), col("e.bucket").as("bucket"))
    val perLevel = graft.ops.Dedup.register(lv
      .groupBy(col("level"), col("c_nationkey"), col("c_mktsegment"),
        col("bucket"))
      .agg(count(lit(1)).as("cs"))
      .groupBy(col("level"))
      .agg(count(lit(1)).as("n_classes"), min(col("cs")).as("min_class"),
        sum(when(col("cs") < k, col("cs")).otherwise(0L))
          .as("risky_rows"),
        sum(col("cs")).as("total"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val sat = perLevel.agg(
      min(when(col("risky_rows") === 0L, col("level"))).as("sat_min"))
    perLevel.crossJoin(broadcast(sat))
      .select(col("level"), col("n_classes"), col("min_class"),
        col("risky_rows"),
        expr("risky_rows * 1000000 div total").as("risk_ppm"),
        (col("level") <=> col("sat_min")).as("chosen"))
      .orderBy(col("level"), col("n_classes"), col("min_class"),
        col("risky_rows"), col("risk_ppm"), col("chosen"))
  }

  /** DuckDB oracle for [[kAnonLadder]] — same floor-division
    * buckets, same minimal-satisfying-level rule ((x = NULL) IS TRUE
    * mirrors Spark's null-safe `<=>` when no level satisfies). */
  def kAnonLadderOracleSql(k: Long = 5L): String = {
    def fdiv(g: Long) =
      s"cents // $g - (CASE WHEN cents % $g < 0 THEN 1 ELSE 0 END)"
    s"""WITH base AS (
       |  SELECT c_nationkey, c_mktsegment,
       |    CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT)
       |      AS cents
       |  FROM customer),
       |lv AS (
       |  SELECT c_nationkey, c_mktsegment, 0 AS level,
       |    cents AS bucket FROM base
       |  UNION ALL SELECT c_nationkey, c_mktsegment, 1,
       |    ${fdiv(10000L)} FROM base
       |  UNION ALL SELECT c_nationkey, c_mktsegment, 2,
       |    ${fdiv(100000L)} FROM base
       |  UNION ALL SELECT c_nationkey, c_mktsegment, 3, 0 FROM base),
       |cl AS (
       |  SELECT level, c_nationkey, c_mktsegment, bucket,
       |    COUNT(*) AS cs
       |  FROM lv GROUP BY level, c_nationkey, c_mktsegment, bucket),
       |pl AS (
       |  SELECT CAST(level AS BIGINT) AS level,
       |    CAST(COUNT(*) AS BIGINT) AS n_classes,
       |    CAST(MIN(cs) AS BIGINT) AS min_class,
       |    CAST(SUM(CASE WHEN cs < $k THEN cs ELSE 0 END) AS BIGINT)
       |      AS risky_rows,
       |    CAST(SUM(cs) AS BIGINT) AS total
       |  FROM cl GROUP BY level),
       |sm AS (
       |  SELECT MIN(CASE WHEN risky_rows = 0 THEN level END) AS sat_min
       |  FROM pl)
       |SELECT level, n_classes, min_class, risky_rows,
       |  CAST(risky_rows * 1000000 // total AS BIGINT) AS risk_ppm,
       |  (level = sat_min) IS TRUE AS chosen
       |FROM pl CROSS JOIN sm
       |ORDER BY level, n_classes, min_class, risky_rows, risk_ppm,
       |  chosen""".stripMargin
  }
}
