package graft

import graft.ops.Skew
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("salted two-phase sum equals direct groupBy sum") {
    val li = Tables.lineitem(spark, sf)
    val direct = li.groupBy(col("l_returnflag").as("k"))
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("total"))
      .collect().map(r => r.getString(0) -> r.getDecimal(1)).toMap
    val salted = Skew.saltedSum(li, col("l_returnflag"),
        salt = col("l_orderkey"), value = col("l_quantity").cast("decimal(18,2)"))
      .collect().map(r => r.getString(0) -> r.getDecimal(1)).toMap
    assert(salted == direct)
  }

  test("salted join returns the same rows as a plain join") {
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_suppkey")
    val s = Tables.supplier(spark, sf).select(
      col("s_suppkey").as("l_suppkey"), col("s_name"))
    val plain = li.join(s, "l_suppkey")
    val salted = Skew.saltedJoin(li, s, "l_suppkey")
    assert(salted.count() == plain.count())
    assert(plain.exceptAll(salted.select(plain.columns.map(col): _*)).isEmpty)
  }
}
