package graft

import graft.etl.Sanitize
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Property-style tests (SURVEY.md §5.4): the invariants the
  * reference's OFFSET paging violates, plus sanitize round-trips.
  * Deterministic seeded generation (scalatestplus is not in the
  * offline cache, so cases are driven by seeded Random directly). */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  test("written multiset == read multiset for arbitrary rows × partitions") {
    for (seed <- 1 to 6) {
      val rnd = new scala.util.Random(seed)
      val data = List.fill(10 + rnd.nextInt(60))(
        (rnd.nextLong() % 1000, rnd.alphanumeric.take(rnd.nextInt(9)).mkString))
      val nParts = 1 + rnd.nextInt(7)
      val df = data.toDF("k", "s")
      val out = java.nio.file.Files.createTempDirectory("prop_t").toString
      df.repartition(nParts).write.mode("overwrite").parquet(out)
      val back = spark.read.parquet(out)
      assert(back.count() == data.size, s"seed=$seed")
      assert(df.exceptAll(back).isEmpty && back.exceptAll(df).isEmpty,
        s"multiset broken at seed=$seed nParts=$nParts")
    }
  }

  test("sanitize JSON round-trip: parse(canonical(x)) == parse(x)") {
    val schema = StructType.fromDDL("k LONG, s STRING")
    for (seed <- 1 to 4) {
      val rnd = new scala.util.Random(100 + seed)
      val docs = List.fill(25) {
        val k = rnd.nextLong() % 100000
        val s = rnd.alphanumeric.take(rnd.nextInt(12)).mkString
        val sp = Seq("", " ", "  ")(rnd.nextInt(3))
        s"""{$sp"s":$sp"$s",$sp"k":$sp$k}"""
      }
      val df = docs.toDF("j")
      val mismatched = df.select(
          from_json(col("j"), schema).as("direct"),
          from_json(Sanitize.canonicalJson(col("j"), schema), schema)
            .as("via_canonical"))
        .filter(col("direct") =!= col("via_canonical") || col("direct").isNull)
        .count()
      assert(mismatched == 0, s"seed=$seed")
    }
  }

  test("numeric coercion: garbage -> NULL, numerics survive exactly") {
    val df = Seq("123", "-7", "12.9", "garbage", "", "9999999999999")
      .toDF("s").select(col("s"), Sanitize.toLongOrNull(col("s")).as("l"))
    val got = df.collect().map(r =>
      r.getString(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got("123").contains(123L) && got("-7").contains(-7L))
    assert(got("garbage").isEmpty && got("").isEmpty)
    assert(got("9999999999999").contains(9999999999999L))
  }
}
