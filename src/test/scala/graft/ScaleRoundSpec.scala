package graft

import org.apache.spark.sql.functions._

/** r16 optimization: the native ScaleRound expression must be
  * BIT-IDENTICAL to the interpreted `transform(arr, v ->
  * cast(round(cast(v as double) * F, 0) as bigint))` it replaced on
  * the embedding-family µu/SQ-code integerizations (Ivf.muCol — the
  * IVF/PQ/medoid/outlier paths; Similarity's SQ codes). Round
  * semantics: Spark's Round(double, 0) HALF_UP decision equals
  * `new java.math.BigDecimal(x).setScale(0, HALF_UP)` (Det
  * .halfUpLong) — at integer scale the x.5 boundary values are
  * exactly representable, so the shortest-repr vs exact-expansion
  * BigDecimal constructions cannot disagree. NaN/Infinity THROW in
  * both forms (SparkArithmeticException vs NumberFormatException —
  * loud either way; embeddings contain neither). */
class ScaleRoundSpec extends SparkSpec {
  import spark.implicits._

  private def oldForm(f: Long) = expr(
    s"transform(embedding, v -> cast(round(cast(v as double) * $f, 0) as bigint))")

  private def newForm(f: Long) =
    call_function("scale_round", col("embedding"), lit(f))

  test("edge values: halves, boundaries, zeros, tiny, large") {
    graft.functions.GraftFunctions.register(spark)
    val edge = Seq(Array(0.5f, -0.5f, 1.5f, -1.5f, 0.49999997f, 2.675f,
      -2.675f, 0.0f, -0.0f, 1e-9f, -1e-9f, 0.9999995f, -0.9999995f,
      123.456789f, Float.MinPositiveValue))
      .toDF("embedding")
    Seq(1000000L, 255L).foreach { f =>
      val r = edge.select(oldForm(f).as("o"), newForm(f).as("n")).head()
      assert(r.getSeq[Long](0) == r.getSeq[Long](1), s"factor $f")
    }
  }

  test("long-overflow values throw in BOTH forms (the ANSI cast contract)") {
    graft.functions.GraftFunctions.register(spark)
    val big = Seq(Array(3.4e38f)).toDF("embedding")
    intercept[Throwable] { big.select(oldForm(1000000L)).head() }
    intercept[Throwable] { big.select(newForm(1000000L)).head() }
  }

  test("seeded random arrays, both factors, float extremes of the unit range") {
    graft.functions.GraftFunctions.register(spark)
    val rnd = new scala.util.Random(7)
    val docs = (0 until 500).map { i =>
      (i.toLong, Array.fill(64)((rnd.nextFloat() * 2 - 1)))
    }.toDF("id", "embedding")
    Seq(1000000L, 255L).foreach { f =>
      val d = docs.select(oldForm(f).as("o"), newForm(f).as("n"))
        .filter(not(col("o") <=> col("n"))).count()
      assert(d == 0L, s"factor $f: $d mismatching rows")
    }
  }

  test("the real embeddings corpus is bit-identical") {
    graft.functions.GraftFunctions.register(spark)
    val emb = Tables.embeddings(spark, sf)
    val d = emb.select(oldForm(1000000L).as("o"), newForm(1000000L).as("n"))
      .filter(not(col("o") <=> col("n"))).count()
    assert(d == 0L)
  }

  test("null array and null elements pass through like transform") {
    graft.functions.GraftFunctions.register(spark)
    val df = Seq[(Long, Option[Array[java.lang.Float]])](
      (1L, None),
      (2L, Some(Array[java.lang.Float](1.25f, null, -2.5f))))
      .toDF("id", "embedding")
    val r = df.select(col("id"), oldForm(1000000L).as("o"),
      newForm(1000000L).as("n")).orderBy(col("id")).collect()
    assert(r(0).isNullAt(1) && r(0).isNullAt(2))
    assert(r(1).getSeq[Any](1) == r(1).getSeq[Any](2))
  }
}
