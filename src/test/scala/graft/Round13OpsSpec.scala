package graft

import org.apache.spark.sql.functions._

import graft.ops.Dedup

/** Round-13 additions, led by the distributed ssi4 dictionary rank —
  * the round-12 verdict's one remaining single-partition stage. */
class Round13OpsSpec extends SparkSpec {

  // ------------------------- distributed dictionary rank (VERDICT r12 #1)

  test("dictIdsOf is bit-identical to the global row_number rank") {
    val s = spark
    import s.implicits._
    graft.functions.GraftFunctions.register(spark)
    try {
      // a frequency table with heavy df ties (the realistic shape:
      // most grams share small df values) spread well past one
      // range partition at the 4-way test parallelism
      val r = new scala.util.Random(13)
      val freq = (1L to 5000L).map(g => (g * 1315423911L, 1L + r.nextInt(7)))
        .toDF("g64", "df")
      val got = Dedup.dictIdsOf(freq)
        .orderBy(col("gid")).collect().map(r => (r.getLong(0), r.getLong(1)))
      import org.apache.spark.sql.expressions.Window
      val want = freq.withColumn("gid", row_number()
          .over(Window.orderBy(col("df").desc, col("g64"))).cast("long"))
        .select(col("g64"), col("gid"))
        .orderBy(col("gid")).collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(got.length === 5000)
      assert(got === want)
    } finally Dedup.unpersistCaches()
  }

  test("ssi4 dictionary build has no single-partition exchange and no global window") {
    val s = spark
    import s.implicits._
    try {
      val freq = (1L to 2000L).map(g => (g, g % 13)).toDF("g64", "df")
      val ids = Dedup.dictIdsOf(freq)
      ids.collect() // materialize so AQE finalizes the plan
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
      import org.apache.spark.sql.execution.window.WindowExec
      import org.apache.spark.sql.catalyst.plans.physical.SinglePartition
      val bad = scala.collection.mutable.ArrayBuffer[String]()
      def walk(p: SparkPlan): Unit = p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case q: QueryStageExec => walk(q.plan)
        case w: WindowExec =>
          if (w.partitionSpec.isEmpty) bad += s"global window: $w"
          w.children.foreach(walk)
        case e: ShuffleExchangeLike =>
          if (e.outputPartitioning == SinglePartition)
            bad += s"single-partition exchange: $e"
          e.children.foreach(walk)
        case other => other.children.foreach(walk)
      }
      walk(ids.queryExecution.executedPlan)
      assert(bad.isEmpty, s"single-partition stages in the dict build: $bad")
    } finally Dedup.unpersistCaches()
  }

  // --------------------------- native BPE encode (VERDICT r12 #3)

  test("native bpe_encode == interpreted fold chain, bit-identical") {
    val s = spark
    import s.implicits._
    graft.functions.GraftFunctions.register(spark)
    val B = graft.ops.BpeIterative
    // multi-char compositions, a self-pair, an overlap chain, and a
    // rule that never fires — the shapes the iterative trainer emits
    val merges = Seq(("a", "b"), ("ab", "c"), ("c", "d"),
      ("abc", "abc"), ("ab", "ab"), ("x", "y"), ("q", "zz"))
    val r = new scala.util.Random(1313)
    val alpha = "abcdxyqz"
    val words = Seq("abcabc", "aab", "ababab", "abcd", "abab",
      "qzz", "qzzz", "zzq", "a", "zz") ++
      (1 to 300).map(_ => (1 to (1 + r.nextInt(12)))
        .map(_ => alpha(r.nextInt(alpha.length))).mkString)
    val df = words.distinct.toDF("w")
    val out = df
      .select(col("w"), B.encodeUnderMerges(col("w"), merges).as("nat"),
        B.encodeUnderMergesFold(col("w"), merges).as("fold"))
      .collect()
    out.foreach { row =>
      val (w, nat, fold) =
        (row.getString(0), row.getSeq[String](1), row.getSeq[String](2))
      assert(nat == fold, s"native diverged on '$w': $nat vs $fold")
      assert(nat.mkString("") == w, s"lossless violated on '$w': $nat")
      val ref = graft.functions.BpeMergeTable(merges.toArray)
        .encodeReference(w)
      assert(nat == ref, s"reference diverged on '$w': $nat vs $ref")
    }
  }

  test("native bpe_encode matches bpeEncodeSqlExpr for char-pair rules") {
    val s = spark
    import s.implicits._
    graft.functions.GraftFunctions.register(spark)
    val merges = Seq(("t", "h"), ("e", "r"), ("h", "e"))
    val words = Seq("the", "there", "ether", "her", "thth", "t")
    val df = words.toDF("w")
    val gotN = df.select(col("w"), size(call_function("bpe_encode",
        col("w"), lit(merges.map { case (a, b) => a + "\u001F" + b }
          .toArray))).as("n")).collect()
      .map(r => (r.getString(0), r.getInt(1))).toMap
    val gotS = df.select(col("w"), size(split(expr(
        graft.ops.TextAnalysis.bpeEncodeSqlExpr("w", merges)),
        "\u001F")).as("n")).collect()
      .map(r => (r.getString(0), r.getInt(1))).toMap
    assert(gotN == gotS, s"native $gotN vs sql-chain $gotS")
  }
}
