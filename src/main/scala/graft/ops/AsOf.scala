package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — attach to each left row the latest right row with
  * `rightTs <= leftTs` on equal keys (inclusive).
  *
  * Spark has no native as-of join; the naive encoding (range join +
  * row_number() = 1) materializes every (left, earlier-right) pair,
  * which is quadratic per key group and unusable at 100 TB. This
  * implementation is the scalable union+window form: tag both sides,
  * union them, and carry the latest right payload forward with
  * last(ignoreNulls) over a (keys)-partitioned window — one shuffle on
  * the keys, linear work, no row explosion.
  */
object AsOf {

  /** @param rightTieBreak column making right rows totally ordered at
    *                      equal ts (max wins, matching the SQL
    *                      `ORDER BY ts DESC, tieBreak DESC ... = 1`). */
  def join(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTs: String, rightTs: String,
           rightPayload: Seq[String], rightTieBreak: String): DataFrame = {
    require(rightPayload.contains(rightTieBreak))
    val keyCols = keys.map(col)
    // right rows sort before left rows at equal ts (side 0 < 1) so an
    // exactly-simultaneous right row is still matched (inclusive as-of)
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      .withColumn("__tie", lit(null).cast(right.schema(rightTieBreak).dataType))
    val r = right
      .select((keys.map(col) :+ col(rightTs).as("__ts")) ++
        rightPayload.map(c => col(c).as(s"__r_$c")): _*)
      .withColumn("__side", lit(0))
      .withColumn("__tie", col(s"__r_$rightTieBreak"))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(keyCols: _*)
      .orderBy(col("__ts").asc, col("__side").asc, col("__tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // carry the payload as ONE struct: per-column last(ignoreNulls)
    // would backfill a NULL field of the matching row from an older
    // right row, stitching together a row that never existed. The
    // struct is non-null exactly for right rows, so last(ignoreNulls)
    // picks the whole matching row atomically.
    val withStruct = unioned.withColumn("__r",
      when(col("__side") === 0,
        struct(rightPayload.map(c => col(s"__r_$c").as(c)): _*)))
    val matched = withStruct
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val out = left.columns.map(col) ++
      rightPayload.map(c => col("__m").getField(c).as(s"asof_$c"))
    matched.select(out: _*)
  }

  /** FORWARD as-of with tolerance (q177): attach to each left row the
    * EARLIEST right row with `leftTs <= rightTs <= leftTs +
    * toleranceUs` on equal keys — the attribution-window join
    * (click → first conversion within the window) that is the mirror
    * of the backward [[join]]. Same scalable union+window encoding,
    * traversed in DESCENDING time order: the running last(ignoreNulls)
    * then carries the SMALLEST right ts ≥ the current left ts; at
    * equal ts the right row sorts first (inclusive), and among
    * equal-ts right rows the MIN tie-break wins (tie sorts desc, so
    * the min is the last seen). The tolerance is a post-filter that
    * nulls the payload — it cannot be folded into the window without
    * breaking the single-pass carry. One shuffle on the keys, linear,
    * no row explosion. Timestamps are compared as epoch-micros longs
    * so the tolerance arithmetic is integer-exact in both engines. */
  def joinForward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTsUs: String, rightTsUs: String, rightPayload: Seq[String],
      rightTieBreak: String, toleranceUs: Long): DataFrame = {
    require(rightPayload.contains(rightTieBreak))
    val keyCols = keys.map(col)
    val l = left
      .withColumn("__ts", col(leftTsUs))
      .withColumn("__side", lit(1))
      .withColumn("__tie", lit(null).cast(right.schema(rightTieBreak).dataType))
    val r = right
      .select((keys.map(col) :+ col(rightTsUs).as("__ts")) ++
        rightPayload.map(c => col(c).as(s"__r_$c")): _*)
      .withColumn("__side", lit(0))
      .withColumn("__tie", col(s"__r_$rightTieBreak"))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(keyCols: _*)
      .orderBy(col("__ts").desc, col("__side").asc, col("__tie").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withStruct = unioned.withColumn("__r",
      when(col("__side") === 0,
        struct((rightPayload.map(c => col(s"__r_$c").as(c)) :+
          col("__ts").as("__rts")): _*)))
    val matched = withStruct
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      // tolerance: a match beyond leftTs + tolerance is no match
      .withColumn("__m",
        when(col("__m").getField("__rts") <= col("__ts") + toleranceUs,
          col("__m")))
    val out = left.columns.map(col) ++
      rightPayload.map(c => col("__m").getField(c).as(s"next_$c"))
    matched.select(out: _*)
  }

  /** q177: click attribution — for each click, the FIRST purchase by
    * the same user at-or-after the click within a 24 h window (the
    * standard conversion-attribution join). Epoch-micros in, epoch-
    * micros out, so the DuckDB oracle replays the window arithmetic
    * exactly. */
  def clickAttribution(spark: SparkSession, dir: String,
      toleranceUs: Long = 86400000000L): DataFrame =
    clickAttributionEv(Tables.events(spark, dir), toleranceUs)

  /** Frame-based core of [[clickAttribution]] (needs event_id,
    * user_id, event_type, ts) — the 10x rehearsal entry point. */
  def clickAttributionEv(ev: DataFrame,
      toleranceUs: Long = 86400000000L): DataFrame = {
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        unix_micros(col("ts")).as("click_tsm"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), unix_micros(col("ts")).as("p_tsm"),
        col("event_id"))
    joinForward(clicks, purchases, Seq("user_id"),
        leftTsUs = "click_tsm", rightTsUs = "p_tsm",
        rightPayload = Seq("event_id", "p_tsm"),
        rightTieBreak = "event_id", toleranceUs = toleranceUs)
      .select(col("click_id"), col("user_id"), col("click_tsm"),
        col("next_event_id").as("purchase_id"),
        col("next_p_tsm").as("purchase_tsm"))
      .orderBy(col("click_id"), col("user_id"), col("click_tsm"),
        col("purchase_id"), col("purchase_tsm"))
  }

  /** DuckDB oracle for [[clickAttribution]] — the quadratic-per-key
    * rank form (oracle scale only; the engine's union+window form is
    * the 100 TB shape). */
  def clickAttributionOracleSql(toleranceUs: Long = 86400000000L): String =
    s"""WITH c AS (
       |  SELECT event_id AS click_id, user_id, epoch_us(ts) AS click_tsm
       |  FROM events WHERE event_type = 'click'),
       |p AS (
       |  SELECT user_id, epoch_us(ts) AS p_tsm, event_id
       |  FROM events WHERE event_type = 'purchase'),
       |m AS (
       |  SELECT c.click_id, p.event_id AS purchase_id, p.p_tsm,
       |    ROW_NUMBER() OVER (PARTITION BY c.click_id
       |      ORDER BY p.p_tsm, p.event_id) AS rn
       |  FROM c JOIN p ON p.user_id = c.user_id
       |    AND p.p_tsm >= c.click_tsm
       |    AND p.p_tsm <= c.click_tsm + $toleranceUs)
       |SELECT c.click_id, c.user_id, c.click_tsm,
       |  m.purchase_id, m.p_tsm AS purchase_tsm
       |FROM c LEFT JOIN (SELECT * FROM m WHERE rn = 1) m
       |  ON m.click_id = c.click_id
       |ORDER BY c.click_id, c.user_id, c.click_tsm,
       |  purchase_id NULLS FIRST, purchase_tsm NULLS FIRST""".stripMargin

  /** Query wrapper: for each purchase event, the latest click event of
    * the same user at or before the purchase. */
  def purchaseLastClick(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("purchase_ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"))
    join(purchases, clicks, Seq("user_id"),
        leftTs = "purchase_ts", rightTs = "ts",
        rightPayload = Seq("event_id", "ts"), rightTieBreak = "event_id")
      .select(col("purchase_id"), col("user_id"), col("purchase_ts"),
        col("asof_event_id").as("click_id"), col("asof_ts").as("click_ts"))
      .orderBy(col("purchase_id"))
  }
}
