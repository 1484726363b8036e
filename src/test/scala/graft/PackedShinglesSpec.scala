package graft

import org.apache.spark.sql.functions._

/** r15 optimization: the native one-pass PackedShingles expression
  * must be BIT-IDENTICAL to the interpreted transform/substring +
  * shiftleft/ascii-fold forms it replaced on the set-sim (q126
  * packedGrams), vocab-profile (q127) and source-overlap (q114)
  * corpus scans — same values, same order, every edge the old forms
  * had (short text zero-pad, first-occurrence distinct, stride,
  * Latin-1 high bytes, even out-of-Latin-1 code points). */
class PackedShinglesSpec extends SparkSpec
    with org.scalatest.BeforeAndAfterEach {

  override protected def afterEach(): Unit = {
    graft.ops.Dedup.unpersistCaches()
    super.afterEach()
  }

  private val texts = Seq(
    "",                       // empty: single zero-packed window
    "a",                      // 1 char: left-justified pad
    "abcdefg",                // 7 chars: one short window
    "abcdefgh",               // exactly one full window
    "abcdefghi",              // two windows
    "aaaaaaaaaaaa",           // repeats: distinct collapses to one
    "the quick brown fox jumps over the lazy dog",
    "café naïve ÿellow grüße", // Latin-1 high bytes
    "mixed Ж中 ascii tail padding here",       // > U+00FF code points
    "abcdabcdabcdabcdabcd")   // periodic: stride-4 all-equal grams

  /** The exact Column forms the expression replaced. */
  private def oldDistinctPack = {
    val packed = (1 to 8).foldLeft(lit(0L)) { (acc, i) =>
      shiftleft(acc, 8) + ascii(substring(col("gram"), i, 1)).cast("long")
    }
    (df: org.apache.spark.sql.DataFrame) => df
      .select(col("id"), posexplode(array_distinct(expr(
        "transform(sequence(1, greatest(length(text) - 7, 1))," +
          " i -> substring(text, i, 8))"))).as(Seq("pos", "gram")))
      .select(col("id"), col("pos"), packed.as("g"))
  }

  private def oldSeqPack(stride: Int) = {
    val packed = (1 to 8).foldLeft(lit(0L)) { (acc, i) =>
      shiftleft(acc, 8) + ascii(substring(col("gram"), i, 1)).cast("long")
    }
    (df: org.apache.spark.sql.DataFrame) => df
      .select(col("id"), posexplode(expr(
        "transform(sequence(1, greatest(length(text) - 7, 1), " + stride +
          "), i -> substring(text, i, 8))")).as(Seq("pos", "gram")))
      .select(col("id"), col("pos"), packed.as("g"))
  }

  private def newPack(fn: String) =
    (df: org.apache.spark.sql.DataFrame) => df
      .select(col("id"),
        posexplode(call_function(fn, col("text"))).as(Seq("pos", "g")))

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Int, Long)] =
    df.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
      .sortBy(t => (t._1, t._2))

  test("pack8 == array_distinct(transform(substring)) + shiftleft/ascii fold, values AND order") {
    val s = spark
    import s.implicits._
    graft.functions.GraftFunctions.register(s)
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    assert(rows(newPack("pack8")(df)) === rows(oldDistinctPack(df)))
  }

  test("pack8_seq (stride 1) and pack8_s4 (stride 4) == the sequential transform forms") {
    val s = spark
    import s.implicits._
    graft.functions.GraftFunctions.register(s)
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    assert(rows(newPack("pack8_seq")(df)) === rows(oldSeqPack(1)(df)))
    assert(rows(newPack("pack8_s4")(df)) === rows(oldSeqPack(4)(df)))
  }

  test("seeded random Latin-1 corpus: pack8 parity at scale") {
    val s = spark
    import s.implicits._
    graft.functions.GraftFunctions.register(s)
    val rnd = new scala.util.Random(1504L)
    val alphabet =
      ('a' to 'z') ++ ('A' to 'Z') ++ "0123456789 .,;:-" ++
        "àéîõüßÿ"
    val docs = (0 until 200).map { i =>
      val n = rnd.nextInt(120)
      (i.toLong, Seq.fill(n)(alphabet(rnd.nextInt(alphabet.size))).mkString)
    }
    val df = docs.toDF("id", "text")
    assert(rows(newPack("pack8")(df)) === rows(oldDistinctPack(df)))
    assert(rows(newPack("pack8_seq")(df)) === rows(oldSeqPack(1)(df)))
  }
}
