package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scalar-function surface (SURVEY.md §2B): string, date, math, array,
  * and JSON families. The JSON family is the engine form of the
  * reference's JSONB columns (event-table.sql:15-16).
  *
  * All pure projections — narrow (no shuffle), fully inside whole-stage
  * codegen, and column-pruned down to the referenced columns at the
  * parquet scan.
  */
object Funcs {

  /** String functions over part. Derived ints cast to long to match
    * DuckDB's BIGINT results in the oracle compare. */
  def stringFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .select(
        col("p_partkey"),
        upper(col("p_brand")).as("brand_u"),
        lower(col("p_type")).as("type_l"),
        substring(col("p_name"), 1, 5).as("name5"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
        length(col("p_name")).cast("long").as("name_len"),
        size(split(col("p_name"), " ")).cast("long").as("n_tokens"),
        regexp_extract(col("p_brand"), "([0-9]+)", 1).as("brand_num"),
        trim(concat(lit("  "), col("p_brand"), lit(" "))).as("trimmed"),
        lpad(col("p_size").cast("string"), 4, "0").as("size_pad"),
        col("p_name").contains("red").as("has_red"),
        col("p_name").startsWith("small").as("is_small"))
      .orderBy(col("p_partkey"))

  /** Date/time functions over orders. */
  def dateFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("o_year"),
        month(col("o_orderdate")).cast("long").as("o_month"),
        quarter(col("o_orderdate")).cast("long").as("o_quarter"),
        dayofmonth(col("o_orderdate")).cast("long").as("o_day"),
        date_trunc("month", col("o_orderdate")).as("month_start"),
        datediff(lit("1998-12-31").cast("date"),
          col("o_orderdate").cast("date")).cast("long").as("days_to_eoy"),
        to_date(col("o_orderdate")).as("o_date"))
      .orderBy(col("o_orderkey"))

  /** Math functions over lineitem; inputs chosen so results are exact
    * in both engines (integral quantities, IEEE-exact sqrt). */
  def mathFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_orderkey") < 500)
      .select(
        col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        abs(col("l_quantity") * -1).as("abs_q"),
        floor(col("l_quantity") / 2).cast("long").as("half_floor"),
        ceil(col("l_quantity") / 2).cast("long").as("half_ceil"),
        sqrt(col("l_quantity")).as("sqrt_q"),
        pow(col("l_quantity"), 2).as("q_sq"),
        (col("l_orderkey") % 7).cast("long").as("key_mod"),
        round(col("l_discount") * 100).cast("long").as("disc_pct"))
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))

  /** Array functions over embeddings: size, indexing, slice-sum, dot
    * product with itself via higher-order aggregate — all in codegen'd
    * builtins, no UDF. Output is scalar-only (array-valued outputs
    * don't round-trip the oracle compare). */
  def arrayFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(
        col("vec_id"),
        size(col("embedding")).cast("long").as("dim"),
        element_at(col("embedding"), 1).cast("double").as("e1"),
        element_at(col("embedding"), -1).cast("double").as("e_last"),
        aggregate(col("embedding"), lit(0.0),
          (acc, x) => acc + x.cast("double") * x.cast("double"))
          .as("sq_norm"),
        aggregate(slice(col("embedding"), 1, 8), lit(0.0),
          (acc, x) => acc + x.cast("double")).as("head8_sum"))
      .orderBy(col("vec_id"))

  /** Conditional aggregates: count_if / FILTER-style sums / bool
    * aggregates per group. */
  def conditionalAggs(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority"))
      .agg(
        count_if(col("o_orderstatus") === "F").as("n_finished"),
        sum(when(col("o_orderstatus") === "F",
          col("o_totalprice").cast("decimal(18,2)"))).cast("double")
          .as("sum_finished_price"),
        bool_or(col("o_totalprice") > 400000).as("any_jumbo"),
        bool_and(col("o_totalprice") > 0).as("all_positive"),
        count(lit(1)).as("n"))
      .orderBy(col("o_orderpriority"))

  /** Unpivot (melt): the inverse of q48's pivot — wide per-flag sums
    * back to (year, flag, sum_qty) rows. Null cells (a year with no
    * rows for a flag) are dropped to match SQL UNION-ALL-unpivot
    * semantics — Spark's unpivot keeps them. */
  def unpivotFlags(spark: SparkSession, dir: String): DataFrame =
    Grouping.pivotFlags(spark, dir)
      .unpivot(Array(col("ship_year")),
        Array(col("A"), col("N"), col("R")), "flag", "sum_qty")
      .filter(col("sum_qty").isNotNull)
      .orderBy(col("ship_year"), col("flag"))

  /** Null-handling functions: coalesce / nullif / nvl2-style / null
    * predicates over the outer-join result (the one place this data
    * produces NULLs naturally). */
  def nullFuncs(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderstatus") === "F").select(col("o_custkey"))
      .distinct()
    c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
      .select(
        col("c_custkey"),
        coalesce(col("o_custkey"), lit(-1L)).as("key_or_default"),
        col("o_custkey").isNull.as("no_f_order"),
        nullif(col("c_mktsegment"), lit("BUILDING")).as("segment_nb"),
        when(col("o_custkey").isNotNull, lit("buyer"))
          .otherwise(lit("prospect")).as("kind"))
      .orderBy(col("c_custkey"))
  }

  /** JSON functions over events.props — the JSONB surface. */
  def jsonFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(
        col("event_id"),
        get_json_object(col("props"), "$.k").as("k_str"),
        get_json_object(col("props"), "$.k").cast("long").as("k_val"),
        get_json_object(col("props"), "$.missing").as("k_missing"),
        from_json(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL("k LONG"))
          .getField("k").as("k_struct"))
      .orderBy(col("event_id"))

  /** Complex-type (struct/map) functions over orders: build, access,
    * and transform nested values. Output columns are scalars so the
    * oracle can state each value's SEMANTIC reduction (e.g.
    * element_at(map('lo', p, 'hi', 2p), 'hi') IS 2p) — the nested
    * machinery runs on the Spark side, the compare stays flat. */
  def complexTypeFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(
        col("o_orderkey"),
        // struct build + field access
        struct(col("o_custkey").as("c"), col("o_totalprice").as("p"))
          .getField("c").as("s_cust"),
        // nested struct through a field path
        struct(struct(col("o_orderstatus").as("st")).as("inner"))
          .getField("inner").getField("st").as("s_status"),
        // map build + lookup (hit and miss)
        element_at(map_from_arrays(
          array(lit("lo"), lit("hi")),
          array(col("o_totalprice"), col("o_totalprice") * 2)), "hi")
          .as("m_hi"),
        element_at(map(lit("only"), col("o_custkey")), "absent")
          .as("m_missing"),
        // map introspection
        size(map_from_arrays(array(lit("a"), lit("b")),
          array(col("o_custkey"), col("o_custkey")))).cast("long").as("m_size"),
        // array-of-struct access
        element_at(array(struct(col("o_custkey").as("k")),
          struct((col("o_custkey") + 1).as("k"))), 2)
          .getField("k").as("aos_second"))
      .orderBy(col("o_orderkey"), col("s_cust"), col("s_status"),
        col("m_hi"), col("m_missing"), col("m_size"), col("aos_second"))

  /** Regexp function family over part names — extract, match test,
    * match count, replace. Patterns are RE2-safe (no backreferences or
    * lookaround) so the identical strings run under Java regex here
    * and RE2 in the oracle; extract results are NULLIF-normalized
    * because Spark returns '' and engines differ on no-match. */
  def regexpFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .select(
        col("p_partkey"),
        nullif(regexp_extract(col("p_name"), "([a-z]+)", 1), lit(""))
          .as("first_word"),
        nullif(regexp_extract(col("p_name"), "([a-z]+)$", 1), lit(""))
          .as("last_word"),
        col("p_type").rlike("[A-Z]{2,}").as("has_caps_run"),
        size(regexp_extract_all(col("p_name"), lit("[aeiou]+"), lit(0)))
          .cast("long").as("vowel_runs"),
        regexp_replace(col("p_name"), "[aeiou]", "_").as("devoweled"))
      .orderBy(col("p_partkey"), col("first_word"), col("last_word"),
        col("has_caps_run"), col("vowel_runs"), col("devoweled"))
}
