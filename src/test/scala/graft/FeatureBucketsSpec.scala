package graft

import org.apache.spark.sql.functions._

/** r15 optimization: the native FeatureBuckets expression must equal
  * the interpreted unigram+bigram transform it replaced in q146 —
  * same bucket values, same order (unigrams then bigrams), same
  * split(text, " ") tokenization edges (empty text, double spaces,
  * trailing space, unicode tokens). */
class FeatureBucketsSpec extends SparkSpec {

  private val B = 1024

  private def oldForm(df: org.apache.spark.sql.DataFrame) = {
    val featB = expr(
      s"""transform(
         |  concat(sp,
         |    CASE WHEN size(sp) < 2
         |         THEN array()
         |         ELSE transform(sequence(0, size(sp) - 2),
         |           i -> concat(element_at(sp, i + 1), ' ',
         |                       element_at(sp, i + 2)))
         |    END),
         |  t -> pmod(rolling_hash(t), ${B}L))""".stripMargin)
    df.withColumn("sp", split(col("text"), " "))
      .select(col("id"), posexplode(featB).as(Seq("pos", "b")))
  }

  private def newForm(df: org.apache.spark.sql.DataFrame) =
    df.select(col("id"), posexplode(
      call_function("feature_buckets", col("text"), lit(B)))
      .as(Seq("pos", "b")))

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .toSeq.sortBy(t => (t._1, t._2))

  test("native == interpreted on planted edges and a seeded corpus") {
    val s = spark
    import s.implicits._
    graft.functions.GraftFunctions.register(s)
    val planted = Seq(
      "", "a", "a b", "a  b", "a b ", " a", "single",
      "the quick brown fox", "tök ünïcode grüße", "x " * 30)
    val rnd = new scala.util.Random(1546L)
    val words = Seq("alpha", "beta", "gamma", "delta", "x", "", "ß")
    val random = (0 until 150).map(_ =>
      Seq.fill(rnd.nextInt(12))(words(rnd.nextInt(words.size)))
        .mkString(" "))
    val df = (planted ++ random).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    assert(rows(newForm(df)) === rows(oldForm(df)))
  }
}
