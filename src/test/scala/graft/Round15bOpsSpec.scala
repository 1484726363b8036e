package graft

import org.apache.spark.sql.functions._
import graft.ops.Decontaminate

/** Round-15 continuation: the contamination-span audit (q265) and the
  * incremental decontamination screen (q266). */
class Round15bOpsSpec extends SparkSpec
    with org.scalatest.BeforeAndAfterEach {

  // span/screen entry points register persists (the q146 rule);
  // drain after every test exactly like Bench/Verify do per query
  override protected def afterEach(): Unit = {
    graft.ops.Dedup.unpersistCaches()
    super.afterEach()
  }

  // ---- q265 planted fixture ----------------------------------------
  // eval1 (20 tokens w1..w20), eval2 (10 tokens w3..w12); train docs:
  //   10: x1 w3..w17 x2      — run of 8 grams vs eval1 (span 15, flagged)
  //   11: w5..w14 z1 z2      — run of 3 vs eval1, 1 vs eval2 (span 10)
  //   12: 9 novel tokens     — no matched gram, no output row
  //   13: w1..w8 q1 w9..w16  — two singleton runs on two diagonals
  private def w(a: Int, b: Int) = (a to b).map(i => s"w$i").mkString(" ")
  private lazy val spanDocs = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, "src0", w(1, 20)),
      (2L, "src0", w(3, 12)),
      (10L, "srcT", s"x1 ${w(3, 17)} x2"),
      (11L, "srcT", s"${w(5, 14)} z1 z2"),
      (12L, "srcT", "a b c d e f g h i"),
      (13L, "srcT", s"${w(1, 8)} q1 ${w(9, 16)}")
    ).toDF("doc_id", "source", "text")
  }

  test("q265 planted spans: run lengths, eval fanout, flag threshold") {
    val got = Decontaminate.contaminationSpansOn(spanDocs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
      .toList
    // doc 10: grams at train pos 2..9 match eval1 pos 3..10 (one
    // diagonal, run 8 -> span 15 >= 13); pos 2..4 also match eval2 ->
    // n_eval_docs 2, distinct matched positions still 8
    // doc 11: pos 1..3 match eval1 pos 5..7 (run 3 -> span 10); pos 1
    // also matches eval2 pos 3 -> 2 eval docs, 3 distinct positions
    // doc 13: pos 1 (diag 0) and pos 10 (diag 1) are singleton runs
    assert(got == List(
      (10L, 8L, 2L, 15L, true),
      (11L, 3L, 2L, 10L, false),
      (13L, 2L, 1L, 8L, false)), s"got $got")
  }

  test("q265 docs shorter than the gram length contribute nothing") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "src0", w(1, 20)),
      (20L, "srcT", w(1, 7)) // 7 tokens < n=8: no gram, no row
    ).toDF("doc_id", "source", "text")
    assert(Decontaminate.contaminationSpansOn(docs).count() == 0L)
  }

  test("q265 budget gate: -1 fires with the priced exchange, unset runs") {
    val key = "graft.decontam.maxExchangeBytes"
    spark.conf.set(key, "-1")
    try {
      val ex = intercept[IllegalStateException] {
        Decontaminate.contaminationSpansOn(spanDocs).collect()
      }
      assert(ex.getMessage.contains(key), ex.getMessage)
      assert(ex.getMessage.contains("candidate-join slots"), ex.getMessage)
    } finally spark.conf.unset(key)
    // unset: the gate is opt-in, the join runs
    assert(Decontaminate.contaminationSpansOn(spanDocs).count() == 3L)
    // a generous budget prices the same forecast and passes
    spark.conf.set(key, (64L * 1024 * 1024 * 1024).toString)
    try assert(Decontaminate.contaminationSpansOn(spanDocs).count() == 3L)
    finally spark.conf.unset(key)
  }

  test("q265 plan: eval side broadcasts at test scale; no exchange ships gram strings") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    val df = Decontaminate.contaminationSpans(spark, sf)
    try {
      df.collect() // materialize so the AQE final plan is in place
      var bhj = 0
      val gramShuffles = scala.collection.mutable.ArrayBuffer[String]()
      def walk(p: SparkPlan): Unit = p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case q: QueryStageExec => walk(q.plan)
        case b: BroadcastHashJoinExec =>
          bhj += 1; b.children.foreach(walk)
        case i: InMemoryTableScanExec => walk(i.relation.cachedPlan)
        case s: ShuffleExchangeLike =>
          gramShuffles ++= s.output.filter(_.name == "gram").map(_.name)
          s.children.foreach(walk)
        case other => other.children.foreach(walk)
      }
      walk(df.queryExecution.executedPlan)
      // the match join broadcasts the (small, leaf-stats-sized) eval
      // gram side at test scale — the corpus gram stream never sorts
      // or shuffles for it
      assert(bhj >= 1, "no BroadcastHashJoin in the q265 plan")
      // the run-window/aggregate exchanges ship ids + positions only;
      // a gram string on an exchange would be the q259 row-width
      // regression class
      assert(gramShuffles.isEmpty,
        s"an exchange carried the gram column: $gramShuffles")
    } finally graft.ops.Dedup.unpersistCaches()
  }

  test("q267 planted forecast: n=8 slots hand-computed; every n equals its raw join") {
    val got = Decontaminate.decontamPreflightOn(spanDocs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
      .sortBy(_._1).toList
    assert(got.map(_._1) == List(3L, 5L, 8L))
    // n=8 by hand on the fixture: shared grams and their ct·ce —
    //   w1..w8 1·1, w3..w10 1·2, w4..w11 1·2, w5..w12 2·2,
    //   w6..w13 2·1, w7..w14 2·1, w8..w15 1·1, w9..w16 2·1,
    //   w10..w17 1·1  →  9 grams, Σ 17, max 4
    val n8 = got.last
    assert(n8 == ((8L, 9L, 17L, 4L, 4L * 1000000L / 17L, 17L * 56L)),
      s"n=8 forecast: $n8")
    // slot-equality (the q259 raw-join rule): the priced slot count
    // IS the row count the positional match join processes, per n
    for (n <- Seq(3, 5, 8)) {
      val g = Decontaminate.gramPosFrame(spanDocs, n)
      val actual = g.filter(col("source") =!= "src0").select(col("gram"))
        .join(g.filter(col("source") === "src0").select(col("gram")),
          Seq("gram"))
        .count()
      val priced = got.find(_._1 == n.toLong).get._3
      assert(priced == actual, s"n=$n priced $priced != joined $actual")
    }
  }

  test("q265 streaming twin equals the batch spans on a 2-batch split") {
    import graft.streaming.DocStream
    import java.nio.file.Files
    val docs = Tables.documents(spark, sf)
    val evalDocs = docs.filter(col("source") === "src0")
      .select("doc_id", "source", "text")
    val ingest = docs.filter(col("source") =!= "src0")
      .withColumn("ingest_ts",
        timestamp_seconds(lit(1767225600L) + col("doc_id")))
      .select("doc_id", "text", "source", "ingest_ts")
    val staged = Files.createTempDirectory("graft_spanstream").toString
    ingest.filter(col("doc_id") < 250).coalesce(1)
      .write.mode("append").parquet(staged)
    ingest.filter(col("doc_id") >= 250).coalesce(1)
      .write.mode("append").parquet(staged)
    val outDir =
      Files.createTempDirectory("graft_spanstream_out").toString + "/s"
    val stream = spark.readStream.schema(DocStream.sourcedDocSchema)
      .option("maxFilesPerTrigger", 1).parquet(staged)
    // the frozen eval artifact: built once, persisted by the caller
    // (the deployed shape the twin documents)
    val evalG = Decontaminate.evalGramPositions(evalDocs).persist()
    evalG.count()
    val q = DocStream.contaminationSpansStream(stream, evalG, outDir)
      .start()
    try q.processAllAvailable() finally { q.stop(); evalG.unpersist(): Unit }
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Long]("n_matched_grams"), r.getAs[Long]("n_eval_docs"),
        r.getAs[Long]("max_span_tokens"), r.getAs[Boolean]("flagged")))
      .toSet
    val streamed = rows(spark.read.parquet(outDir))
    val batch = rows(Decontaminate.contaminationSpansOn(docs))
    assert(streamed.nonEmpty, "streaming spans emitted nothing")
    assert(streamed == batch,
      s"stream-only: ${(streamed -- batch).take(3)}; " +
        s"batch-only: ${(batch -- streamed).take(3)}")
  }

  // ---- q266 ---------------------------------------------------------

  test("q266 counts face: full == batch-filtered; verdicts split the batch") {
    val docs = Tables.documents(spark, sf)
    val cutoff =
      (docs.agg(max(col("doc_id"))).head().getLong(0) + 1L) * 9L / 10L
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_fps"),
        r.getAs[Long]("n_shared_fps"), r.getAs[Long]("shared_ppm"))).toSet
    // the counts face is per-doc independent -> exactly the full
    // corpus screen filtered to the batch
    val full = rows(Decontaminate.contaminationCountsOn(docs, lit(true)))
    val incr = rows(
      Decontaminate.contaminationCountsOn(docs, col("doc_id") >= cutoff))
    assert(incr.nonEmpty, "batch screen emitted nothing at sf0.001")
    assert(incr == full.filter(_._1 >= cutoff),
      s"incr-only: ${(incr -- full).take(3)}; " +
        s"missing: ${(full.filter(_._1 >= cutoff) -- incr).take(3)}")
    // the relative verdict: quarantined docs are exactly the top ppm
    // block (nearest-rank p90, ties up), and BOTH verdicts occur
    val scr = Decontaminate.decontamScreenOn(docs,
        col("doc_id") >= cutoff).collect()
      .map(r => (r.getAs[Long]("shared_ppm"),
        r.getAs[Boolean]("quarantine")))
    val (q, c) = scr.partition(_._2)
    assert(q.nonEmpty && c.nonEmpty,
      s"uniform verdicts: ${q.length} quarantined of ${scr.length}")
    assert(q.map(_._1).min >= c.map(_._1).max,
      "a quarantined doc has lower shared_ppm than a clean one")
    // decile arithmetic: clean count < k <= clean + quarantined
    val k = (9L * scr.length + 9L) / 10L
    assert(c.length < k && k <= scr.length,
      s"clean=${c.length} k=$k n=${scr.length}")
  }

  test("q266 planted verdicts: verbatim eval copy quarantined, novel doc clean") {
    val s = spark
    import s.implicits._
    val evalText = "the quick brown fox jumps over the lazy dog again"
    val docs = Seq(
      (1L, "src0", evalText),
      (10L, "srcT", evalText), // verbatim leak: shares every fingerprint
      (11L, "srcT", "xylophone quartz vibrant mosaic kelp")
    ).toDF("doc_id", "source", "text")
    val got = Decontaminate.decontamScreenOn(docs, lit(true))
      .collect().map(r => (r.getLong(0), r.getAs[Long]("n_fps"),
        r.getAs[Long]("n_shared_fps"), r.getAs[Long]("shared_ppm"),
        r.getAs[Boolean]("quarantine")))
      .sortBy(_._1).toList
    assert(got.map(_._1) == List(10L, 11L))
    val leak = got.head
    // verbatim copy: every fingerprint shared -> ppm exactly 1e6,
    // and with n=2 the nearest-rank p90 threshold IS 1e6
    assert(leak._2 == leak._3 && leak._4 == 1000000L && leak._5,
      s"verbatim copy not fully shared/quarantined: $leak")
    assert(got(1)._3 == 0L && got(1)._4 == 0L && !got(1)._5,
      s"novel doc not clean: ${got(1)}")
  }

  test("q266 streaming twin equals the batch screen on a 2-batch split") {
    import graft.streaming.DocStream
    import java.nio.file.Files
    val docs = Tables.documents(spark, sf)
    val evalDocs = docs.filter(col("source") === "src0")
      .select("doc_id", "source", "text")
    val ingest = docs.filter(col("doc_id") >= 400)
      .withColumn("ingest_ts",
        timestamp_seconds(lit(1767225600L) + col("doc_id")))
      .select("doc_id", "text", "source", "ingest_ts")
    val staged = Files.createTempDirectory("graft_decontam").toString
    ingest.filter(col("doc_id") < 450).coalesce(1)
      .write.mode("append").parquet(staged)
    ingest.filter(col("doc_id") >= 450).coalesce(1)
      .write.mode("append").parquet(staged)
    val outDir =
      Files.createTempDirectory("graft_decontam_out").toString + "/s"
    val stream = spark.readStream.schema(DocStream.sourcedDocSchema)
      .option("maxFilesPerTrigger", 1).parquet(staged)
    // the frozen eval artifact: built once, persisted by the caller
    // (the deployed shape the twin documents)
    val evalFp = Decontaminate.evalFingerprints(evalDocs).persist()
    evalFp.count()
    val q = DocStream.contaminationScreenStream(stream, evalFp, outDir)
      .start()
    try q.processAllAvailable() finally { q.stop(); evalFp.unpersist(): Unit }
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_fps"),
        r.getAs[Long]("n_shared_fps"), r.getAs[Long]("shared_ppm"))).toSet
    val streamed = rows(spark.read.parquet(outDir))
    val batch = rows(
      Decontaminate.contaminationCountsOn(docs, col("doc_id") >= 400))
    assert(streamed.nonEmpty, "streaming screen emitted nothing")
    assert(streamed == batch,
      s"stream-only: ${(streamed -- batch).take(3)}; " +
        s"batch-only: ${(batch -- streamed).take(3)}")
  }

  // ---- q268: deployed daily span audit ----------------------------

  test("q268 planted: batch spine zero-fills clean docs, stats match q265") {
    // batch = train docs with id >= 12: doc 12 (clean) and doc 13
    val got = Decontaminate.spanAuditOn(spanDocs, col("doc_id") >= 12L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
      .toList
    assert(got == List(
      (12L, 0L, 0L, 0L, false),
      (13L, 2L, 1L, 8L, false)), s"got $got")
  }

  test("q268 deployed face == q265 filtered to the batch, plus zero rows") {
    val docs = Tables.documents(spark, sf)
    val cutoff =
      (docs.agg(max(col("doc_id"))).head().getLong(0) + 1L) * 9L / 10L
    def tup(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4))).toSet
    val deployed = tup(Decontaminate.spanAuditIncremental(spark, sf))
    graft.ops.Dedup.unpersistCaches()
    val full = tup(Decontaminate.contaminationSpans(spark, sf))
      .filter(_._1 >= cutoff)
    // per-doc independence: the batch slice computes exactly the rows
    // the full audit computes for those docs
    assert(deployed.filter(_._2 > 0L) == full,
      s"deployed-only: ${(deployed.filter(_._2 > 0L) -- full).take(3)}; " +
        s"full-only: ${(full -- deployed).take(3)}")
    // the spine is every batch train doc — |batch| rows, scale-proof
    val nBatch = docs
      .filter(col("doc_id") >= cutoff && col("source") =!= "src0")
      .select("doc_id").distinct().count()
    assert(deployed.size.toLong == nBatch,
      s"spine ${deployed.size} != batch $nBatch")
    assert(deployed.exists(_._2 == 0L) || deployed == full,
      "no zero-filled row and no full coverage — fixture lost its clean docs")
  }

  test("q268 budget gate: -1 fires on the deployed face too") {
    val key = "graft.decontam.maxExchangeBytes"
    spark.conf.set(key, "-1")
    try {
      val ex = intercept[IllegalStateException] {
        Decontaminate.spanAuditOn(spanDocs, col("doc_id") >= 12L).collect()
      }
      assert(ex.getMessage.contains(key), ex.getMessage)
    } finally spark.conf.unset(key)
  }
}
