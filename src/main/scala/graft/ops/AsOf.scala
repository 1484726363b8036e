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
