package graft

import org.apache.spark.sql.functions._

/** r16 optimization: the native one-pass WordGrams/WordGramsArr
  * expressions must be BIT-IDENTICAL to the interpreted lambda forms
  * they replaced on the trigram-LM (Ranking.trigramFrame — q149/q163/
  * q172/q173/q194), positional-n-gram (Decontaminate.gramPosFrame —
  * q265/q267/q268) and window-novelty (Dedup.tokenWindows — q119/
  * q120) corpus scans. The identity argument: tokens are split on a
  * SINGLE space and joined with a single space, so every n-gram
  * string is a substring of the original text — empties from
  * repeated/leading/trailing spaces included. minOne = true mirrors
  * the tokenWindows slice-cap (a doc under w tokens contributes ONE
  * window: the whole text). */
class WordGramsSpec extends SparkSpec {
  import spark.implicits._

  private val texts = Seq(
    "",                      // one empty token
    " ",                     // two empty tokens
    "  ",                    // three empty tokens
    "a",                     // single token
    "a b",                   // below trigram threshold
    "a b c",                 // exactly one trigram
    "a b c d e f g h i j",   // plenty
    "a  b  c",               // empty tokens between words
    " leading", "trailing ", // boundary empties
    "café naïve grüße Ж中 tok x y z", // multi-byte code points
    "the the the the the the the the the") // repeats

  private def corpus = texts.zipWithIndex
    .map { case (t, i) => (i.toLong, t) }.toDF("id", "text")

  private def assertSame(a: org.apache.spark.sql.DataFrame,
      b: org.apache.spark.sql.DataFrame): Unit = {
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("word_grams(3, false) == the trigramFrame transform lambda") {
    graft.functions.GraftFunctions.register(spark)
    val old = corpus.withColumn("sp", split(col("text"), " "))
      .select(col("id"), explode(expr(
        """CASE WHEN size(sp) < 3 THEN array()
          |     ELSE transform(sequence(0, size(sp) - 3),
          |       i -> concat_ws(' ', element_at(sp, i + 1),
          |                           element_at(sp, i + 2),
          |                           element_at(sp, i + 3)))
          |END""".stripMargin)).as("g"))
    val neu = corpus.select(col("id"), explode(
      call_function("word_grams", col("text"), lit(3), lit(false))).as("g"))
    assertSame(old, neu)
  }

  test("word_grams(n, false) == the gramPosFrame slice lambda, n = 5 and 8") {
    graft.functions.GraftFunctions.register(spark)
    Seq(5, 8).foreach { n =>
      val old = corpus.withColumn("sp", split(col("text"), " "))
        .select(col("id"), posexplode(expr(
          s"""CASE WHEN size(sp) < $n THEN array()
             |     ELSE transform(sequence(1, size(sp) - ${n - 1}),
             |       i -> concat_ws(' ', slice(sp, i, $n)))
             |END""".stripMargin)).as(Seq("p", "g")))
      val neu = corpus.select(col("id"), posexplode(
        call_function("word_grams", col("text"), lit(n), lit(false)))
        .as(Seq("p", "g")))
      assertSame(old, neu)
    }
  }

  test("word_grams(8, true) and word_grams_arr == the tokenWindows array_join lambda") {
    graft.functions.GraftFunctions.register(spark)
    val old = corpus.withColumn("toks", split(col("text"), " "))
      .select(col("id"), posexplode(expr(
        """transform(sequence(0, greatest(size(toks) - 8, 0)),
          |  i -> array_join(slice(toks, i + 1, 8), ' '))""".stripMargin))
        .as(Seq("s", "w")))
    val neu = corpus.select(col("id"), posexplode(
      call_function("word_grams", col("text"), lit(8), lit(true)))
      .as(Seq("s", "w")))
    val neuArr = corpus.withColumn("toks", split(col("text"), " "))
      .select(col("id"), posexplode(
        call_function("word_grams_arr", col("toks"), lit(8), lit(true)))
        .as(Seq("s", "w")))
    assertSame(old, neu)
    assertSame(old, neuArr)
  }

  test("seeded random corpora: text and array forms at scale, several n") {
    graft.functions.GraftFunctions.register(spark)
    val rnd = new scala.util.Random(42)
    val words = Seq("a", "bb", "ccc", "", "dddd", "é", "ж", "word")
    val docs = (0 until 300).map { i =>
      val k = rnd.nextInt(20)
      (i.toLong, (0 until k).map(_ => words(rnd.nextInt(words.size)))
        .mkString(" "))
    }.toDF("id", "text")
    Seq(2, 3, 8).foreach { n =>
      val old = docs.withColumn("sp", split(col("text"), " "))
        .select(col("id"), posexplode(expr(
          s"""CASE WHEN size(sp) < $n THEN array()
             |     ELSE transform(sequence(1, size(sp) - ${n - 1}),
             |       i -> concat_ws(' ', slice(sp, i, $n)))
             |END""".stripMargin)).as(Seq("p", "g")))
      val neu = docs.select(col("id"), posexplode(
        call_function("word_grams", col("text"), lit(n), lit(false)))
        .as(Seq("p", "g")))
      assertSame(old, neu)
    }
  }

  test("the tokenWindows plan keeps the split below the Generate (the q119/q120 2x trap)") {
    // with the text-input form the optimizer inlined size(split(text))
    // ABOVE the Generate — the split ran once per exploded window; the
    // array-input form pins the split projection below it. Assert no
    // optimized-plan expression above a Generate contains a split.
    import org.apache.spark.sql.catalyst.plans.logical.{Generate, LogicalPlan}
    val plan = graft.ops.Dedup
      .substringDedup(Tables.documents(spark, sf), 8)
      .queryExecution.optimizedPlan
    def aboveGenerate(p: LogicalPlan, above: Boolean): Seq[String] = {
      val here =
        if (above)
          p.expressions.flatMap(e =>
            e.collect { case s if s.prettyName == "split" => s.sql })
        else Nil
      here ++ p.children.flatMap(c =>
        aboveGenerate(c, above && !p.isInstanceOf[Generate]))
    }
    val genCount = plan.collect { case g: Generate => g }.size
    assert(genCount >= 1, "expected a Generate in the q119 plan")
    assert(aboveGenerate(plan, above = true).isEmpty,
      "split() escaped above the Generate — the per-window re-split trap")
  }
}
