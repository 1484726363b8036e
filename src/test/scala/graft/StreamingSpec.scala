package graft

import java.nio.file.Files
import graft.ops.Events
import graft.streaming.EventStream

class StreamingSpec extends SparkSpec {

  test("stateful sessionization emits sessions that match batch sessions") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // stage time-ordered ARRIVAL: the file source orders batches by
    // file modification time, so write the early half strictly before
    // the late half (two separate jobs, distinct mtimes)
    val staged = Files.createTempDirectory("graft_sess").toString
    val ev = Tables.events(spark, sf).select("user_id", "ts")
    val mid = ev.selectExpr("percentile_approx(cast(ts as double), 0.5)")
      .head().getDouble(0)
    ev.filter(col("ts").cast("double") <= mid).coalesce(1)
      .sortWithinPartitions("ts").write.mode("append").parquet(staged)
    Thread.sleep(1100)
    ev.filter(col("ts").cast("double") > mid).coalesce(1)
      .sortWithinPartitions("ts").write.mode("append").parquet(staged)

    val stream = spark.readStream
      .schema("user_id LONG, ts TIMESTAMP")
      .option("maxFilesPerTrigger", 1)
      .parquet(staged)
      .as[EventStream.Ev]
    val sessions = EventStream.sessionizeStateful(stream, gapMs = 30 * 60 * 1000)
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("sess_out").start()
    try {
      q.processAllAvailable()
      val emitted = spark.table("sess_out")
        .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2))).toSet
      assert(emitted.nonEmpty, "no sessions emitted before the watermark")
      // every emitted session must exactly match a batch-mode session
      val batch = Events.sessions(spark, sf)
        .collect().map(r => (r.getLong(0), r.getTimestamp(1),
          r.getLong(3))).toSet
      val bad = emitted -- batch
      assert(bad.isEmpty, s"streaming-only sessions: ${bad.take(3)}")
    } finally q.stop()
  }

  test("stream-static enrichment join equals the batch join") {
    import org.apache.spark.sql.functions._
    val staged = Files.createTempDirectory("graft_enrich").toString
    Tables.events(spark, sf).write.mode("overwrite").parquet(staged)
    // static dim: user_id -> customer name (events user ids overlap the
    // low custkeys)
    val dim = Tables.customer(spark, sf)
      .select(col("c_custkey").as("user_id"), col("c_name"))
    val stream = spark.readStream.schema(EventStream.eventSchema).parquet(staged)
    val enriched = stream.join(dim, Seq("user_id"))
      .groupBy(col("c_name")).agg(count(lit(1)).as("n"))
    val q = EventStream.runOnce(enriched, "enrich_out")
    try {
      val streamed = spark.table("enrich_out").orderBy("c_name")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      val batch = Tables.events(spark, sf).join(dim, Seq("user_id"))
        .groupBy(col("c_name")).agg(count(lit(1)).as("n")).orderBy("c_name")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(streamed.nonEmpty && streamed == batch)
    } finally q.stop()
  }

  test("streaming sliding agg equals the batch result") {
    val staged = Files.createTempDirectory("graft_slide").toString
    Tables.events(spark, sf).write.mode("overwrite").parquet(staged)
    val stream = EventStream.readEventStream(spark, staged)
    val q = EventStream.runOnce(EventStream.slidingCounts(stream), "s_out")
    try {
      val streamed = spark.table("s_out").orderBy("win_start")
        .collect().map(r => (r.getTimestamp(0), r.getLong(1), r.getDouble(2)))
      val batch = Events.sliding(spark, sf)
        .collect().map(r => (r.getTimestamp(0), r.getLong(1), r.getDouble(2)))
      assert(streamed.nonEmpty)
      assert(streamed.toSeq == batch.toSeq)
    } finally q.stop()
  }

  test("streaming session agg equals the batch result") {
    val staged = Files.createTempDirectory("graft_sessw").toString
    Tables.events(spark, sf).write.mode("overwrite").parquet(staged)
    val stream = EventStream.readEventStream(spark, staged)
    val q = EventStream.runOnce(EventStream.sessionCounts(stream), "sw_out")
    try {
      val streamed = spark.table("sw_out").orderBy("user_id", "session_start")
        .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
          r.getLong(3), r.getDouble(4)))
      val batch = Events.sessions(spark, sf)
        .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
          r.getLong(3), r.getDouble(4)))
      assert(streamed.nonEmpty)
      assert(streamed.toSeq == batch.toSeq)
    } finally q.stop()
  }

  test("foreachBatch JDBC sink lands watermark-closed windows in Derby") {
    import org.apache.spark.sql.functions.col
    // two time-ordered files so the second batch advances the watermark
    // past the first's windows (append mode emits only closed windows)
    val staged = Files.createTempDirectory("graft_sink").toString
    val ev = Tables.events(spark, sf)
    val mid = ev.selectExpr("percentile_approx(cast(ts as double), 0.5)")
      .head().getDouble(0)
    ev.filter(col("ts").cast("double") <= mid).coalesce(1)
      .sortWithinPartitions("ts").write.mode("append").parquet(staged)
    Thread.sleep(1100)
    ev.filter(col("ts").cast("double") > mid).coalesce(1)
      .sortWithinPartitions("ts").write.mode("append").parquet(staged)

    val url = "jdbc:derby:memory:streamsink;create=true"
    val props = new java.util.Properties()
    val stream = spark.readStream.schema(EventStream.eventSchema)
      .option("maxFilesPerTrigger", 1).parquet(staged)
    val q = EventStream.jdbcSink(EventStream.tumblingCounts(stream),
      url, "tumbling_sink", props).start()
    try {
      q.processAllAvailable()
      val landed = spark.read.jdbc(url, "tumbling_sink", props)
      // Derby case-normalizes identifiers; read positionally
      val got = landed.collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
      assert(got.nonEmpty, "no windows closed by the final watermark")
      // every landed row must exactly match a batch-mode window row
      val batch = Events.tumbling(spark, sf).collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
      val bad = got -- batch
      assert(bad.isEmpty, s"sink-only rows: ${bad.take(3)}")
    } finally q.stop()
  }

  test("stream-stream time-range join equals the batch join") {
    import org.apache.spark.sql.functions._
    val stagedP = Files.createTempDirectory("graft_ssp").toString
    val stagedC = Files.createTempDirectory("graft_ssc").toString
    val ev = Tables.events(spark, sf).filter(col("user_id") < 40)
    ev.filter(col("event_type") === "purchase").write.mode("overwrite").parquet(stagedP)
    ev.filter(col("event_type") === "click").write.mode("overwrite").parquet(stagedC)
    val joined = EventStream.purchaseClickJoin(
      spark.readStream.schema(EventStream.eventSchema).parquet(stagedP),
      spark.readStream.schema(EventStream.eventSchema).parquet(stagedC))
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ss_join").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("ss_join").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("purchase_id"), col("ts").as("p_ts"))
      val c = ev.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user_id"), col("event_id").as("click_id"),
          col("ts").as("c_ts"))
      val batch = p.join(c, col("user_id") === col("c_user_id") &&
          col("c_ts") <= col("p_ts") &&
          col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR"))
        .select("user_id", "purchase_id", "click_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(streamed.nonEmpty, "stream-stream join emitted nothing")
      assert(streamed == batch)
    } finally q.stop()
  }

  test("streaming incremental snapshot diff + delete reconciliation equals the batch diff") {
    import org.apache.spark.sql.functions._
    import graft.etl.Cdc
    import graft.streaming.CdcStream
    val oldSnap = Cdc.ordersSnapshotOld(spark, sf)
    val newSnap = Cdc.ordersSnapshotNew(spark, sf)
    val keyCols = Seq("o_orderkey")
    val cmpCols = Seq("o_custkey", "o_orderstatus", "o_totalprice")
    // stage the new snapshot as two chunk files = two micro-batches
    // (the chunked-export arrival shape); chunking by key parity, so
    // neither chunk alone could decide deletes
    val staged = Files.createTempDirectory("graft_cdc_in").toString
    newSnap.filter(pmod(col("o_orderkey"), lit(2)) === 0)
      .coalesce(1).write.mode("append").parquet(staged)
    newSnap.filter(pmod(col("o_orderkey"), lit(2)) =!= 0)
      .coalesce(1).write.mode("append").parquet(staged)
    val changesDir = Files.createTempDirectory("graft_cdc_ch").toString + "/c"
    val keysDir = Files.createTempDirectory("graft_cdc_k").toString + "/k"
    val stream = spark.readStream.schema(newSnap.schema)
      .option("maxFilesPerTrigger", 1).parquet(staged)
    val q = CdcStream.incrementalDiff(stream, oldSnap, keyCols, cmpCols,
      changesDir, keysDir).start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.read.parquet(changesDir)
      .unionByName(CdcStream.deletes(spark, oldSnap, keyCols, cmpCols, keysDir))
    val batch = Cdc.snapshotDiff(oldSnap, newSnap, keyCols, cmpCols)
    val outCols = keyCols ++ Seq("change") ++
      cmpCols.flatMap(c => Seq(s"old_$c", s"new_$c"))
    def rowSet(df: org.apache.spark.sql.DataFrame) =
      df.select(outCols.map(col): _*).collect()
        .map(_.toSeq.map(String.valueOf).mkString("|")).toSet
    val s = rowSet(streamed)
    val b = rowSet(batch)
    Seq("I", "U", "D").foreach(k => assert(
      batch.filter(col("change") === k).count() > 0,
      s"fixture produced no '$k' changes — parity would be vacuous"))
    assert(s == b,
      s"stream-only: ${(s -- b).take(3)}; batch-only: ${(b -- s).take(3)}")
  }

  test("streaming moment-state maintenance equals the one-pass stats") {
    import org.apache.spark.sql.functions._
    import graft.streaming.CdcStream
    val li = Tables.lineitem(spark, sf).select(col("l_returnflag"),
      (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long")
        .as("c"))
    // stage as 3 chunk files = 3 micro-batches folded into state
    val staged = Files.createTempDirectory("graft_mom_in").toString
    (0 to 2).foreach(i => li.filter(pmod(col("c"), lit(3)) === i)
      .coalesce(1).write.mode("append").parquet(staged))
    val stateDir = Files.createTempDirectory("graft_mom_st").toString + "/s"
    val stream = spark.readStream.schema(li.schema)
      .option("maxFilesPerTrigger", 1).parquet(staged)
    val q = CdcStream.incrementalMoments(stream, "l_returnflag", "c",
      stateDir).start()
    try q.processAllAvailable() finally q.stop()
    def d(col0: org.apache.spark.sql.Column) = col0.cast("decimal(38,0)")
    val batch = li.groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"), sum(d(col("c"))).as("s"),
        sum(d(col("c")) * d(col("c"))).as("ss"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDecimal(2), r.getDecimal(3))).toMap
    val state = spark.read.parquet(stateDir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDecimal(2), r.getDecimal(3))).toMap
    assert(state.keySet == batch.keySet)
    state.foreach { case (k, (n, s, ss)) =>
      val (bn, bs, bss) = batch(k)
      assert(n == bn && s.compareTo(bs) == 0 && ss.compareTo(bss) == 0,
        s"group $k: state ($n,$s,$ss) != batch ($bn,$bs,$bss)")
    }
  }

  test("streaming cascade-funnel state equals the one-shot funnel") {
    import org.apache.spark.sql.functions._
    import graft.streaming.DocStream
    val docs = Tables.documents(spark, sf).select(col("source"), col("text"))
    // 3 chunk files = 3 micro-batches folded into funnel state
    val staged = Files.createTempDirectory("graft_casc_in").toString
    (0 to 2).foreach(i => docs
      .filter(pmod(length(col("text")), lit(3)) === i)
      .coalesce(1).write.mode("append").parquet(staged))
    val stateDir = Files.createTempDirectory("graft_casc_st").toString + "/s"
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1).parquet(staged)
    val q = DocStream.cascadeFunnelStream(stream, stateDir).start()
    try q.processAllAvailable() finally q.stop()
    def funnel(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(0) ->
        (1 to 5).map(r.getLong)).toMap
    val streamed = funnel(spark.read.parquet(stateDir))
    val batch = funnel(graft.ops.TextAnalysis.filterCascade(spark, sf))
    assert(streamed == batch,
      s"diverging sources: ${(streamed.keySet ++ batch.keySet)
        .filter(k => streamed.get(k) != batch.get(k)).take(3)}")
    // the fixture must exercise a non-trivial funnel
    assert(batch.values.exists(v => v(4) < v(0)),
      "no document died anywhere in the cascade — parity is vacuous")
  }

  test("streaming EWMA state equals the one-pass decay fold") {
    import org.apache.spark.sql.functions._
    import graft.streaming.CdcStream
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
    // day-chunk files = micro-batches in event-time order (the
    // in-order contract; the truncating decay makes order load-bearing)
    val staged = Files.createTempDirectory("graft_ew_in").toString
    val days = ev.select(date_trunc("day", col("ts")).as("d"))
      .distinct().orderBy("d").collect().map(_.getTimestamp(0))
    days.grouped(math.max(1, days.length / 3)).zipWithIndex.foreach {
      case (chunk, _) =>
        ev.filter(date_trunc("day", col("ts")).isin(chunk.toSeq: _*))
          .coalesce(1).write.mode("append").parquet(staged)
    }
    val stateDir = Files.createTempDirectory("graft_ew_st").toString + "/s"
    val stream = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", 1).parquet(staged)
    val q = CdcStream.ewmaStream(stream, stateDir).start()
    try q.processAllAvailable() finally q.stop()
    def m(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val streamed = m(spark.read.parquet(stateDir))
    val batch = m(graft.ops.TimeSeries.ewmaActivityOn(ev))
    assert(streamed == batch, s"diverging users: ${
      (streamed.keySet ++ batch.keySet)
        .filter(k => streamed.get(k) != batch.get(k)).take(3)}")
    assert(batch.nonEmpty && days.length >= 3,
      "fixture must span multiple micro-batches")
  }

  test("streaming gap-fill state equals the batch LOCF fill") {
    import org.apache.spark.sql.functions._
    import graft.streaming.CdcStream
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("ts"), col("value"))
    // stage as day-chunk files = micro-batches in event-time order
    // (the in-order contract; day boundaries never split an hour)
    val staged = Files.createTempDirectory("graft_gf_in").toString
    val days = ev.select(date_trunc("day", col("ts")).as("d"))
      .distinct().orderBy("d").collect().map(_.getTimestamp(0))
    days.foreach(d => ev.filter(date_trunc("day", col("ts")) === d)
      .coalesce(1).write.mode("append").parquet(staged))
    val outDir = Files.createTempDirectory("graft_gf_out").toString + "/o"
    val stateDir = Files.createTempDirectory("graft_gf_st").toString + "/s"
    val stream = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", 1).parquet(staged)
    val q = CdcStream.gapFillStream(stream, outDir, stateDir).start()
    try q.processAllAvailable() finally q.stop()
    def keyed(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("user_id"),
        r.getAs[java.sql.Timestamp]("hour")) ->
        (r.getAs[Long]("n_events"), r.getAs[Double]("filled_value"))).toMap
    val got = keyed(spark.read.parquet(outDir))
    val want = keyed(graft.ops.TimeSeries.gapFillLocf(spark, sf))
    assert(got.size == want.size,
      s"row counts differ: stream ${got.size} batch ${want.size}")
    assert(got == want, {
      val bad = want.collect { case (k, v) if got.get(k) != Some(v) =>
        s"$k: batch=$v stream=${got.get(k)}" }.take(5)
      s"first diffs: ${bad.mkString("; ")}"
    })
    // state landed on the last observed hour per user
    val st = spark.read.parquet(stateDir)
    assert(st.count() == ev.select("user_id").distinct().count())
  }

  test("streaming incremental dedup equals the batch incremental dedup") {
    import org.apache.spark.sql.functions._
    import graft.streaming.DocStream
    val docs = Tables.documents(spark, sf)
    val corpus = docs.filter(col("doc_id") < 400)
    val increment = docs.filter(col("doc_id") >= 400)
    // stage the increment as two id-ordered files (arrival order =
    // doc_id order, matching the batch op's min-doc_id tie rule) with a
    // synthetic monotonic ingest timestamp
    val staged = Files.createTempDirectory("graft_incdedup").toString
    val stagedInc = increment.withColumn("ingest_ts",
      timestamp_seconds(lit(1767225600L) + col("doc_id")))
      .select("doc_id", "text", "ingest_ts")
    stagedInc.filter(col("doc_id") < 450).coalesce(1)
      .sortWithinPartitions("doc_id").write.mode("append").parquet(staged)
    Thread.sleep(1100)
    stagedInc.filter(col("doc_id") >= 450).coalesce(1)
      .sortWithinPartitions("doc_id").write.mode("append").parquet(staged)

    val stream = spark.readStream.schema(DocStream.docSchema)
      .option("maxFilesPerTrigger", 1).parquet(staged)
    val q = DocStream.incrementalDedup(stream, corpus)
      .writeStream.outputMode("append")
      .format("memory").queryName("incdedup_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("incdedup_out")
        .collect().map(_.getLong(0)).toSet
      val batch = graft.ops.Dedup.incrementalExactNew(corpus, increment)
        .collect().map(_.getLong(0)).toSet
      assert(streamed.nonEmpty, "streaming dedup admitted nothing")
      assert(streamed == batch,
        s"stream-only: ${(streamed -- batch).take(3)}; batch-only: ${(batch -- streamed).take(3)}")
    } finally q.stop()
  }

  test("streaming passage dedup admits exactly the batch first-occurrence chunks") {
    import org.apache.spark.sql.functions._
    import graft.streaming.DocStream
    val docs = Tables.documents(spark, sf).filter(col("doc_id") < 100)
    // id-ordered single-partition arrival: in-batch dedup state scans
    // rows in order, matching the batch op's (doc_id, cidx) tie rule
    val staged = Files.createTempDirectory("graft_passdedup").toString
    docs.withColumn("ingest_ts",
        timestamp_seconds(lit(1767225600L) + col("doc_id")))
      .select("doc_id", "text", "ingest_ts")
      .coalesce(1).sortWithinPartitions("doc_id")
      .write.mode("append").parquet(staged)

    val stream = spark.readStream.schema(DocStream.docSchema).parquet(staged)
    val q = DocStream.passageDedup(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("passdedup_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("passdedup_out")
        .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
      val batch = graft.ops.Dedup.passageFirstOccurrences(docs)
        .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
      assert(streamed.nonEmpty, "streaming passage dedup admitted nothing")
      assert(streamed == batch,
        s"stream-only: ${(streamed -- batch).take(3)}; batch-only: ${(batch -- streamed).take(3)}")
    } finally q.stop()
  }

  test("streaming window novelty equals the batch novelty rows") {
    import org.apache.spark.sql.functions._
    import graft.streaming.DocStream
    val docs = Tables.documents(spark, sf)
    val corpus = docs.filter(col("doc_id") < 400)
    val ingest = docs.filter(col("doc_id") >= 400)
      .withColumn("ingest_ts",
        timestamp_seconds(lit(1767225600L) + col("doc_id")))
      .select("doc_id", "text", "ingest_ts")
    val staged = Files.createTempDirectory("graft_novelty").toString
    ingest.filter(col("doc_id") < 450).coalesce(1)
      .write.mode("append").parquet(staged)
    ingest.filter(col("doc_id") >= 450).coalesce(1)
      .write.mode("append").parquet(staged)
    val outDir = Files.createTempDirectory("graft_novelty_out").toString + "/n"
    val stream = spark.readStream.schema(DocStream.docSchema)
      .option("maxFilesPerTrigger", 1).parquet(staged)
    val q = DocStream.windowNoveltyStream(stream, corpus, outDir).start()
    try q.processAllAvailable() finally q.stop()
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_windows"),
        r.getAs[Long]("n_novel"), r.getAs[Long]("novelty_ppm"))).toSet
    val streamed = rows(spark.read.parquet(outDir))
    val batch = rows(graft.ops.Dedup.windowNovelty(
      docs.filter(col("doc_id") >= 400), corpus))
    assert(streamed.nonEmpty, "streaming novelty emitted nothing")
    assert(streamed == batch,
      s"stream-only: ${(streamed -- batch).take(3)}; batch-only: ${(batch -- streamed).take(3)}")
  }

  test("streaming transition pairs equal the batch pair stage") {
    import org.apache.spark.sql.functions._
    import graft.streaming.EventStream
    val ev = Tables.events(spark, sf)
      .select("user_id", "event_id", "ts", "event_type")
    // split at the median timestamp: two event-time-ordered arrivals
    val cut = ev.selectExpr("percentile(unix_micros(ts), 0.5)")
      .first().getDouble(0).toLong
    val staged = Files.createTempDirectory("graft_trans").toString
    ev.filter(unix_micros(col("ts")) <= cut).coalesce(1)
      .sortWithinPartitions("ts", "event_id")
      .write.mode("append").parquet(staged)
    Thread.sleep(1100)
    ev.filter(unix_micros(col("ts")) > cut).coalesce(1)
      .sortWithinPartitions("ts", "event_id")
      .write.mode("append").parquet(staged)

    import spark.implicits._
    val schema = spark.read.parquet(staged).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(staged)
      .as[EventStream.TEv]
    val q = EventStream.transitionPairsStateful(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("trans_out").start()
    try {
      q.processAllAvailable()
      def key(r: org.apache.spark.sql.Row) =
        (r.getAs[Long]("user_id"), r.getAs[String]("from_type"),
          r.getAs[String]("to_type"))
      val streamed = spark.table("trans_out").collect().map(key).toSeq.sorted
      val batch = graft.ops.Behavior.transitionPairs(ev)
        .collect().map(key).toSeq.sorted
      assert(streamed.nonEmpty, "streaming transitions emitted nothing")
      assert(streamed == batch,
        s"pair multisets differ: stream=${streamed.size} batch=${batch.size}")
    } finally q.stop()
  }

  test("streaming budget intake equals the batch arrival-order cut") {
    import org.apache.spark.sql.functions._
    import graft.streaming.DocStream
    val docs = Tables.documents(spark, sf)
    val toks = docs.select(col("doc_id"), col("source"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"))
    // two id-ordered arrivals split at the median doc_id — the
    // monotonic-ingest contract the twin documents
    val cut = toks.selectExpr("percentile(doc_id, 0.5)")
      .first().getDouble(0).toLong
    val staged = Files.createTempDirectory("graft_budget").toString
    toks.filter(col("doc_id") <= cut).coalesce(1)
      .sortWithinPartitions("doc_id")
      .write.mode("append").parquet(staged)
    Thread.sleep(1100)
    toks.filter(col("doc_id") > cut).coalesce(1)
      .sortWithinPartitions("doc_id")
      .write.mode("append").parquet(staged)

    import spark.implicits._
    val schema = spark.read.parquet(staged).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(staged)
      .as[DocStream.BDoc]
    val q = DocStream.budgetIntakeStateful(stream, budgetTokens = 1000L)
      .writeStream.outputMode("append")
      .format("memory").queryName("budget_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("budget_out").collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("cum_tokens"),
          r.getAs[Boolean]("kept"))).toSeq.sorted
      val batch = graft.ops.Sampling.budgetIntakeDocs(docs, 1000L)
        .collect()
        .map(r => (r.getLong(0), r.getLong(3), r.getBoolean(4)))
        .toSeq.sorted
      assert(streamed.nonEmpty, "budget intake emitted nothing")
      assert(streamed.exists(!_._3) && streamed.exists(_._3),
        "fixture must exercise both verdicts")
      assert(streamed == batch,
        s"verdicts differ: stream=${streamed.size} batch=${batch.size}")
    } finally q.stop()
  }

  test("streaming chained throttle equals the batch throttle") {
    import org.apache.spark.sql.functions._
    import graft.streaming.EventStream
    val ev = Tables.events(spark, sf)
      .select("user_id", "event_id", "ts", "event_type")
    // split at the median timestamp: two event-time-ordered arrivals,
    // so the per-key last-admitted state must chain across batches
    val cut = ev.selectExpr("percentile(unix_micros(ts), 0.5)")
      .first().getDouble(0).toLong
    val staged = Files.createTempDirectory("graft_throttle").toString
    ev.filter(unix_micros(col("ts")) <= cut).coalesce(1)
      .sortWithinPartitions("ts", "event_id")
      .write.mode("append").parquet(staged)
    Thread.sleep(1100)
    ev.filter(unix_micros(col("ts")) > cut).coalesce(1)
      .sortWithinPartitions("ts", "event_id")
      .write.mode("append").parquet(staged)

    import spark.implicits._
    val schema = spark.read.parquet(staged).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(staged)
      .as[EventStream.TEv]
    val q = EventStream.throttleStateful(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("throttle_out").start()
    try {
      q.processAllAvailable()
      def key(r: org.apache.spark.sql.Row) =
        (r.getAs[Long]("user_id"), r.getAs[String]("event_type"),
          r.getAs[Long]("event_id"))
      val streamed = spark.table("throttle_out").collect().map(key).toSet
      val batch = graft.ops.TimeSeries.eventThrottle(spark, sf)
        .collect().map(key).toSet
      assert(streamed.nonEmpty, "streaming throttle admitted nothing")
      assert(streamed == batch,
        s"stream-only: ${(streamed -- batch).take(3)}; batch-only: ${(batch -- streamed).take(3)}")
    } finally q.stop()
  }

  test("streaming semantic dedup equals the batch incremental run") {
    import org.apache.spark.sql.functions._
    import graft.streaming.EmbStream
    import graft.ops.Ivf
    // ingest = 60 perturbed corpus copies with ids above every corpus
    // id, staged as two id-ordered chunk files = two micro-batches —
    // so cross-micro-batch suppression (batch-2 vector vs batch-1
    // STREAM vector, carried by the seen-state table) is exercised,
    // not just the corpus join
    val ingest = Tables.embeddings(spark, sf).filter(col("vec_id") < 60)
      .select((col("vec_id") + 1000L).as("vec_id"),
        expr("transform(embedding, v -> cast(v * 0.999 as float))")
          .as("embedding"),
        lit(java.sql.Timestamp.valueOf("2026-01-01 00:00:00"))
          .as("ingest_ts"))
    // the corpus copies all drop against their ORIGINALS, so they
    // cannot distinguish a working seen-state from a broken one (the
    // corpus suppressor is always the min id). Plant a pair only the
    // state can catch: A = a direction verifiably >0.4 away from the
    // whole corpus (unit dim 1 — precondition asserted), in batch 1;
    // B = 0.999·A with the highest id, in batch 2. B's ONLY
    // suppressor is stream vector A, carried across micro-batches.
    graft.functions.GraftFunctions.register(spark)
    val planted = expr(
      "transform(sequence(0, 63), i -> cast(if(i = 1, 1.0, 0.0) as float))")
    val maxAbsCos = Tables.embeddings(spark, sf)
      .select(abs(round(graft.ops.Similarity.cosine(col("embedding"),
        planted), 6)).as("c"))
      .agg(max(col("c"))).head().getDouble(0)
    assert(maxAbsCos < 0.4,
      s"fixture precondition: dim-1 is no longer corpus-orthogonal " +
        s"($maxAbsCos) — pick another direction")
    import spark.implicits._
    def plantRow(id: Long) = Seq(id).toDF("vec_id")
      .select(col("vec_id"), planted.as("embedding"),
        lit(java.sql.Timestamp.valueOf("2026-01-01 00:00:00"))
          .as("ingest_ts"))
    val staged = Files.createTempDirectory("graft_emb_in").toString
    ingest.filter(col("vec_id") < 1030).unionByName(plantRow(1500L))
      .coalesce(1).write.mode("append").parquet(staged)
    ingest.filter(col("vec_id") >= 1030).unionByName(
        plantRow(2500L).select(col("vec_id"),
          expr("transform(embedding, v -> cast(v * 0.999 as float))")
            .as("embedding"), col("ingest_ts")))
      .coalesce(1).write.mode("append").parquet(staged)
    val outDir = Files.createTempDirectory("graft_emb_out").toString + "/o"
    val stateDir = Files.createTempDirectory("graft_emb_st").toString + "/s"
    val stream = spark.readStream.schema(EmbStream.embSchema)
      .option("maxFilesPerTrigger", 1).parquet(staged)
    val q = EmbStream.semanticDedupStream(stream, sf, outDir, stateDir).start()
    try q.processAllAvailable() finally q.stop()
    // compare (kept, overall min suppressor): a cross-micro-batch
    // suppression lands in dup_of_corpus for the stream but
    // dup_of_batch for the one-shot batch run — least() of the two
    // is the invariant (ids share one space)
    def verdicts(df: org.apache.spark.sql.DataFrame) = df
      .select(col("vec_id"), col("kept"),
        least(col("dup_of_corpus"), col("dup_of_batch")).as("dup_of"))
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(1), if (r.isNullAt(2)) -1L else r.getLong(2))).toMap
    val streamed = verdicts(spark.read.parquet(outDir))
    val full = ingest.unionByName(plantRow(1500L))
      .unionByName(plantRow(2500L).select(col("vec_id"),
        expr("transform(embedding, v -> cast(v * 0.999 as float))")
          .as("embedding"), col("ingest_ts")))
    val batch = verdicts(Ivf.semanticDedupIncremental(spark, sf,
      full.drop("ingest_ts")))
    assert(streamed.size == 62 && batch.size == 62)
    assert(streamed == batch, s"diverging: ${
      (streamed.keySet ++ batch.keySet)
        .filter(k => streamed.get(k) != batch.get(k)).take(5)}")
    assert(streamed.values.exists(!_._1), "no drop was exercised")
    // the direct evidence the seen-state works: B(2500) was dropped
    // BY stream vector A(1500) from the previous micro-batch — no
    // corpus vector is within tau of either (precondition above)
    assert(streamed(1500L) == ((true, -1L)), "planted A must survive")
    assert(streamed(2500L) == ((false, 1500L)),
      "planted B must be dropped by cross-micro-batch state")
  }

  test("EmbStream micro-batch replay is value-idempotent (crash after promote)") {
    import org.apache.spark.sql.functions._
    import graft.streaming.EmbStream
    // the hazard (VERDICT r7 #3): a crash AFTER promoteState but
    // BEFORE the checkpoint commit replays the batch with its own
    // vectors already in the seen-state — without the self-row
    // anti-join every replayed vector would "drop" at cosine 1.0
    // against itself. Batch: 10 scaled corpus copies (ids 3000+,
    // drop against the corpus) + 10 negations (ids 4000+, novel —
    // KEPT; these are the discriminating rows: a self-match flips
    // them to dropped).
    val e = Tables.embeddings(spark, sf)
    val b0 = e.filter(col("vec_id") < 10)
      .select((col("vec_id") + 3000L).as("vec_id"),
        expr("transform(embedding, v -> cast(v * 0.999 as float))")
          .as("embedding"))
      .unionByName(e.filter(col("vec_id") >= 10 && col("vec_id") < 20)
        .select((col("vec_id") + 4000L).as("vec_id"),
          expr("transform(embedding, v -> cast(-v as float))")
            .as("embedding")))
    val root = Files.createTempDirectory("graft_emb_replay").toString
    val outDir = root + "/o"; val stateDir = root + "/s"
    def run() = EmbStream.processBatch(b0, 0L, sf, outDir, stateDir, 400000L)
    def outSnap() = spark.read.parquet(s"$outDir/batch_id=0").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2),
        if (r.isNullAt(3)) -1L else r.getLong(3),
        if (r.isNullAt(4)) -1L else r.getLong(4))).toSet
    def stateSnap() = spark.read.parquet(stateDir)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    run()
    val out1 = outSnap(); val st1 = stateSnap()
    assert(out1.exists(_._3), "fixture: no kept row in the first run")
    assert(out1.exists(!_._3), "fixture: no dropped row in the first run")
    run() // the replay — state already holds this batch's vectors
    assert(outSnap() == out1,
      s"replay changed verdicts: ${(outSnap() -- out1).take(3)}")
    assert(stateSnap() == st1, "replay grew the seen-state")
  }

  test("phash stream verdicts equal the q204 batch run (cross-micro-batch suppression)") {
    import org.apache.spark.sql.functions._
    import graft.streaming.DocStream
    import graft.multimodal.{Multimodal => MM}
    val img = Tables.documents(spark, sf)
      .filter(col("doc_id") % 3 === 0).select(col("doc_id"), col("text"))
    val ingest = img.filter(col("doc_id") >= 300)
    // planted: A (9000) = ascending plane in micro-batch 1, B (9500) =
    // its 1-bit neighbour in micro-batch 2 — B must be suppressed BY
    // the cross-micro-batch seen-state (no corpus/ingest doc is near
    // either plane; all 64 dHash comparisons true needs adversarial
    // text the random corpus cannot produce)
    val asc = (0 until 72).map(i => ('0' + i).toChar).mkString
    val nearAsc = asc.take(71) + "0"
    def plant(id: Long, t: String) = {
      import spark.implicits._
      Seq((id, t)).toDF("doc_id", "text")
    }
    def withTs(df: org.apache.spark.sql.DataFrame) = df.select(
      col("doc_id"), col("text"),
      lit(java.sql.Timestamp.valueOf("2026-01-01 00:00:00")).as("ingest_ts"))
    val staged = Files.createTempDirectory("graft_ph_in").toString
    withTs(ingest.filter(col("doc_id") < 400).unionByName(plant(9000L, asc)))
      .coalesce(1).write.mode("append").parquet(staged)
    withTs(ingest.filter(col("doc_id") >= 400).unionByName(plant(9500L, nearAsc)))
      .coalesce(1).write.mode("append").parquet(staged)
    val outDir = Files.createTempDirectory("graft_ph_out").toString + "/o"
    val stateDir = Files.createTempDirectory("graft_ph_st").toString + "/s"
    val stream = spark.readStream.schema(DocStream.docSchema)
      .option("maxFilesPerTrigger", 1).parquet(staged)
    val q = DocStream.phashDedupStream(stream, sf, outDir, stateDir).start()
    try q.processAllAvailable() finally q.stop()
    // cross-micro-batch suppression lands in dup_of_corpus for the
    // stream but dup_of_batch for the one-shot batch run — the overall
    // min suppressor (sentinels lifted to NULL for least()) is the
    // invariant, ids share one space
    def verdicts(df: org.apache.spark.sql.DataFrame) = df.select(
        col("doc_id"), col("kept"),
        coalesce(least(nullif(col("dup_of_corpus"), lit(-1L)),
          nullif(col("dup_of_batch"), lit(-1L))), lit(-1L)).as("dup_of"))
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(1), r.getLong(2))).toMap
    val streamed = verdicts(spark.read.parquet(outDir))
    val full = ingest.unionByName(plant(9000L, asc))
      .unionByName(plant(9500L, nearAsc))
    val batch = verdicts(MM.phashIncrementalBands(
      MM.phashBandsCols(img.filter(col("doc_id") < 300)),
      MM.phashBandsCols(full)))
    graft.ops.Dedup.unpersistCaches()
    assert(streamed.size == batch.size && streamed.nonEmpty)
    assert(streamed == batch, s"diverging: ${
      (streamed.keySet ++ batch.keySet)
        .filter(k => streamed.get(k) != batch.get(k)).take(5)}")
    assert(streamed(9000L) == ((true, -1L)), "planted A must survive")
    assert(streamed(9500L) == ((false, 9000L)),
      "planted B must be dropped by cross-micro-batch state")
  }

  test("collocations stream state equals the one-shot lift table (chunking-invariant)") {
    import org.apache.spark.sql.functions._
    import graft.streaming.DocStream
    import graft.ops.TextAnalysis
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"))
    def withTs(df: org.apache.spark.sql.DataFrame) = df.select(
      col("doc_id"), col("text"),
      lit(java.sql.Timestamp.valueOf("2026-01-01 00:00:00")).as("ingest_ts"))
    val staged = Files.createTempDirectory("graft_col_in").toString
    withTs(docs.filter(col("doc_id") < 250)).coalesce(1)
      .write.mode("append").parquet(staged)
    withTs(docs.filter(col("doc_id") >= 250)).coalesce(1)
      .write.mode("append").parquet(staged)
    val stateDir = Files.createTempDirectory("graft_col_st").toString + "/s"
    val stream = spark.readStream.schema(DocStream.docSchema)
      .option("maxFilesPerTrigger", 1).parquet(staged)
    val q = DocStream.collocationsStream(stream, stateDir)
      .option("checkpointLocation", s"$stateDir.ckpt").start()
    try q.processAllAvailable() finally q.stop()
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    val streamed = rows(TextAnalysis.collocationsFromPairs(
      spark.read.parquet(stateDir)))
    val batch = rows(TextAnalysis.collocationsDocs(docs))
    graft.ops.Dedup.unpersistCaches()
    assert(streamed.nonEmpty && streamed == batch,
      s"chunked-state lift diverged: streamed ${streamed.take(2)} vs batch ${batch.take(2)}")
  }

  test("calibration stream state equals the one-shot reliability bins (chunking-invariant)") {
    import org.apache.spark.sql.functions._
    import graft.streaming.DocStream
    import graft.ops.TextAnalysis
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"), col("lang"))
    def withTs(df: org.apache.spark.sql.DataFrame) = df.select(
      col("doc_id"), col("text"), col("lang"),
      lit(java.sql.Timestamp.valueOf("2026-01-01 00:00:00")).as("ingest_ts"))
    val staged = Files.createTempDirectory("graft_cal_in").toString
    withTs(docs.filter(col("doc_id") < 250)).coalesce(1)
      .write.mode("append").parquet(staged)
    withTs(docs.filter(col("doc_id") >= 250)).coalesce(1)
      .write.mode("append").parquet(staged)
    val stateDir = Files.createTempDirectory("graft_cal_st").toString + "/s"
    val stream = spark.readStream.schema(DocStream.labeledDocSchema)
      .option("maxFilesPerTrigger", 1).parquet(staged)
    val q = DocStream.calibrationStream(stream, stateDir)
      .option("checkpointLocation", s"$stateDir.ckpt").start()
    try q.processAllAvailable() finally q.stop()
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    val streamed = rows(TextAnalysis.calibrationFromCounts(
      spark.read.parquet(stateDir)))
    val batch = rows(TextAnalysis.calibrationDocs(docs))
    assert(streamed.nonEmpty && streamed == batch,
      s"chunked-state calibration diverged: $streamed vs $batch")
  }

  test("weekday-count stream state equals the one-shot seasonality profile (chunking-invariant)") {
    import org.apache.spark.sql.functions._
    import graft.streaming.EventStream
    import graft.ops.TimeSeries
    val events = Tables.events(spark, sf)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"), col("props"))
    val staged = Files.createTempDirectory("graft_dow_in").toString
    events.filter(col("event_id") % 2 === 0).coalesce(1)
      .write.mode("append").parquet(staged)
    events.filter(col("event_id") % 2 === 1).coalesce(1)
      .write.mode("append").parquet(staged)
    val stateDir = Files.createTempDirectory("graft_dow_st").toString + "/s"
    val stream = spark.readStream
      .schema(events.schema)
      .option("maxFilesPerTrigger", 1).parquet(staged)
    val q = EventStream.weekdayCountsStream(stream, stateDir)
      .option("checkpointLocation", s"$stateDir.ckpt").start()
    try q.processAllAvailable() finally q.stop()
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    val streamed = rows(TimeSeries.weekdaySeasonalityFromCounts(
      spark.read.parquet(stateDir)))
    val batch = rows(TimeSeries.weekdaySeasonalityOn(events))
    assert(streamed.nonEmpty && streamed == batch,
      s"chunked-state seasonality diverged: ${streamed.take(3)} vs ${batch.take(3)}")
  }

  test("phash micro-batch replay is value-idempotent (crash after promote)") {
    import org.apache.spark.sql.functions._
    import graft.streaming.DocStream
    import spark.implicits._
    // batch: one doc near a CORPUS image's plane cannot be relied on,
    // so plant the discriminating rows directly: a novel plane (KEPT —
    // a self-match on replay would flip it to dropped) and an in-batch
    // duplicate pair (exercises a drop in the same run)
    val asc = (0 until 72).map(i => ('0' + i).toChar).mkString
    val b0 = Seq((9000L, asc), (9100L, asc), (9200L, "ba"))
      .toDF("doc_id", "text")
    val root = Files.createTempDirectory("graft_ph_replay").toString
    val outDir = root + "/o"; val stateDir = root + "/s"
    def run() = DocStream.phashProcessBatch(b0, 0L, sf, outDir, stateDir, 3)
    def outSnap() = spark.read.parquet(s"$outDir/batch_id=0").collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2),
        r.getLong(3))).toSet
    def stateSnap() = spark.read.parquet(stateDir)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    run()
    val out1 = outSnap(); val st1 = stateSnap()
    assert(out1.exists(_._2), "fixture: no kept row in the first run")
    assert(out1.exists(!_._2), "fixture: no dropped row in the first run")
    run() // the replay — state already holds this batch's bands
    assert(outSnap() == out1,
      s"replay changed verdicts: ${(outSnap() -- out1).take(3)}")
    assert(stateSnap() == st1, "replay grew the seen-state")
  }

  test("error-burn stream state equals the one-shot burn profile (chunking-invariant)") {
    import org.apache.spark.sql.functions._
    import graft.streaming.EventStream
    import graft.ops.TimeSeries
    val events = Tables.events(spark, sf)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"), col("props"))
    val staged = Files.createTempDirectory("graft_burn_in").toString
    events.filter(col("event_id") % 2 === 0).coalesce(1)
      .write.mode("append").parquet(staged)
    events.filter(col("event_id") % 2 === 1).coalesce(1)
      .write.mode("append").parquet(staged)
    val stateDir = Files.createTempDirectory("graft_burn_st").toString + "/s"
    val stream = spark.readStream
      .schema(events.schema)
      .option("maxFilesPerTrigger", 1).parquet(staged)
    val q = EventStream.errorBurnStream(stream, stateDir)
      .option("checkpointLocation", s"$stateDir.ckpt").start()
    try q.processAllAvailable() finally q.stop()
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    val streamed = rows(TimeSeries.errorBurnFromDaily(
      spark.read.parquet(stateDir)))
    val batch = rows(TimeSeries.errorBurnOn(events))
    assert(streamed.nonEmpty && streamed == batch,
      s"chunked-state burn profile diverged: ${streamed.take(3)} vs " +
        s"${batch.take(3)}")
  }

  test("bpe pair-count stream state ranks merges identically to the batch kernel") {
    import org.apache.spark.sql.functions._
    import graft.streaming.DocStream
    import graft.ops.TextAnalysis
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"))
    val staged = Files.createTempDirectory("graft_bpe_in").toString
    docs.filter(col("doc_id") % 2 === 0).coalesce(1)
      .write.mode("append").parquet(staged)
    docs.filter(col("doc_id") % 2 === 1).coalesce(1)
      .write.mode("append").parquet(staged)
    val stateDir = Files.createTempDirectory("graft_bpe_st").toString + "/s"
    val stream = spark.readStream
      .schema(docs.schema)
      .option("maxFilesPerTrigger", 1).parquet(staged)
    val q = DocStream.bpePairStream(stream, stateDir)
      .option("checkpointLocation", s"$stateDir.ckpt").start()
    try q.processAllAvailable() finally q.stop()
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    val streamed = rows(spark.read.parquet(stateDir)
      .orderBy(col("n_weighted").desc, col("sym_a"), col("sym_b"))
      .limit(20)
      .orderBy(col("n_weighted").desc, col("sym_a"), col("sym_b"))
      .select(col("sym_a"), col("sym_b"), col("n_weighted")))
    val batch = rows(TextAnalysis.bpePairStatsDocs(docs)
      .select(col("sym_a"), col("sym_b"), col("n_weighted")))
    assert(streamed.nonEmpty && streamed == batch,
      s"chunked pair state ranked differently: ${streamed.take(4)} vs " +
        s"${batch.take(4)}")
  }

  test("additive counter twins skip a replayed micro-batch (promoted-batchId provenance)") {
    // additive merges are not replay-idempotent, so a micro-batch
    // replayed after a crash-after-promote (same batchId) must be
    // skipped, while the next batchId still merges (ADVICE r11)
    import org.apache.spark.sql.functions._
    import graft.streaming.EventStream
    val s = spark
    import s.implicits._
    def ev(rows: (Long, String)*) = rows.toDF("day", "event_type")
      .select(timestamp_micros(col("day") * 86400000000L + 1L).as("ts"),
        col("event_type"))
    val stateDir =
      Files.createTempDirectory("graft_replay_st").toString + "/s"
    def state() = spark.read.parquet(stateDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    val b0 = ev((1L, "error"), (1L, "view"))
    EventStream.errorBurnProcessBatch(b0, 0L, stateDir)
    assert(state() == Seq((1L, 2L, 1L)), s"after b0: ${state()}")
    EventStream.errorBurnProcessBatch(b0, 0L, stateDir) // crash replay
    assert(state() == Seq((1L, 2L, 1L)),
      s"replayed batch double-counted: ${state()}")
    EventStream.errorBurnProcessBatch(ev((1L, "view")), 1L, stateDir)
    assert(state() == Seq((1L, 3L, 1L)), s"after b1: ${state()}")
  }

  test("additive crash matrix: leftover stage is discarded; mid-swap crash restores the aside copy") {
    // the two crash corners the replay guard alone doesn't cover
    // (VERDICT r12 #6 + ADVICE r12): (a) promote succeeds, the NEXT
    // batch crashes MID-STAGE — its stage dir exists with partial
    // rows but the marker never moved — the restart must DISCARD the
    // stage, never merge it; (b) a crash INSIDE promoteState's swap
    // (old state moved aside, staged copy not yet promoted) leaves
    // no state dir — the restart must restore the aside copy, not
    // rebuild from the single replayed micro-batch.
    import org.apache.spark.sql.functions._
    import graft.streaming.{CdcStream, EventStream}
    val s = spark
    import s.implicits._
    def ev(rows: (Long, String)*) = rows.toDF("day", "event_type")
      .select(timestamp_micros(col("day") * 86400000000L + 1L).as("ts"),
        col("event_type"))
    val stateDir =
      Files.createTempDirectory("graft_crash_st").toString + "/s"
    def state() = spark.read.parquet(stateDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    EventStream.errorBurnProcessBatch(ev((1L, "error"), (1L, "view")),
      0L, stateDir)
    assert(state() == Seq((1L, 2L, 1L)), s"after b0: ${state()}")
    // (a) poison the stage dir as a crashed batch 1 would leave it:
    // absurd counts + its own marker, never promoted
    val poison = Seq((1L, 999L, 999L)).toDF("day", "n_events", "n_errors")
    poison.write.mode("overwrite").parquet(stateDir + ".next")
    java.nio.file.Files.writeString(
      new java.io.File(stateDir + ".next", "_BATCH_ID").toPath, "1")
    EventStream.errorBurnProcessBatch(ev((1L, "view")), 1L, stateDir)
    assert(state() == Seq((1L, 3L, 1L)),
      s"crashed stage leaked into the merge: ${state()}")
    // (b) crash inside the swap: state moved aside, promote never ran
    assert(new java.io.File(stateDir)
      .renameTo(new java.io.File(stateDir + ".old")))
    EventStream.errorBurnProcessBatch(ev((1L, "error")), 2L, stateDir)
    assert(state() == Seq((1L, 4L, 2L)),
      s"aside copy not recovered before the merge: ${state()}")
    assert(!new java.io.File(stateDir + ".old").exists(),
      "aside copy left behind after recovery")
    // the recovered marker also re-arms the replay guard: batch 2
    // replayed is a no-op
    EventStream.errorBurnProcessBatch(ev((1L, "error")), 2L, stateDir)
    assert(state() == Seq((1L, 4L, 2L)),
      s"replay after recovery double-counted: ${state()}")
  }

  test("fresh checkpoint against an existing additive state errors loudly, same checkpoint restarts fine (lineage guard)") {
    // VERDICT r13 #5: the stateDir/checkpointLocation contract was
    // documentation only — a fresh checkpoint restarts batchIds at 0
    // and the replay guard silently SKIPPED every batch until the
    // counter passed the old marker (data loss, no error). The
    // _QUERY_ID marker now makes the violation loud.
    import org.apache.spark.sql.functions._
    import graft.streaming.CdcStream
    val s = spark
    import s.implicits._
    val staged = Files.createTempDirectory("graft_lin_in").toString
    def feed(flag: String, v: Long) =
      Seq((flag, v)).toDF("l_returnflag", "c")
        .coalesce(1).write.mode("append").parquet(staged)
    feed("A", 1L)
    val stateDir = Files.createTempDirectory("graft_lin_st").toString + "/s"
    val schema = spark.read.parquet(staged).schema
    def run(ckpt: String): Unit = {
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(staged)
      val q = CdcStream.incrementalMoments(stream, "l_returnflag", "c",
        stateDir).option("checkpointLocation", ckpt).start()
      try q.processAllAvailable() finally q.stop()
    }
    def state() = spark.read.parquet(stateDir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    val ckptA = Files.createTempDirectory("graft_lin_ca").toString
    run(ckptA)
    assert(new java.io.File(stateDir, "_QUERY_ID").isFile,
      "the lineage marker was not promoted with the state")
    assert(state() == Set(("A", 1L)), s"after run 1: ${state()}")
    // legitimate restart: SAME checkpoint, new data — the guard must
    // not false-positive and the state advances
    feed("A", 2L)
    run(ckptA)
    assert(state() == Set(("A", 2L)), s"after legit restart: ${state()}")
    // fresh checkpoint, same state dir: batch 0 would replay ALL
    // files and the old guard would skip it silently — now it refuses
    feed("B", 5L)
    val ckptB = Files.createTempDirectory("graft_lin_cb").toString
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException](
      run(ckptB))
    def rootMsg(t: Throwable): String =
      if (t.getCause == null) t.getMessage
      else t.getMessage + "\n" + rootMsg(t.getCause)
    assert(rootMsg(e).contains("lineage"),
      s"expected the lineage refusal, got: ${rootMsg(e).take(400)}")
    assert(state() == Set(("A", 2L)),
      s"the refused lineage still mutated state: ${state()}")
  }

  test("non-stream promote preserves the stored lineage marker (ADVICE r14)") {
    // assertLineage used to return only the CURRENT lineage: a
    // backfill / direct processBatch (no stream, lineage None) on
    // state carrying a _QUERY_ID promoted without the marker and the
    // rename ERASED it — silently disarming the guard, so a later
    // fresh-checkpoint stream was back to skipping every batch (the
    // exact r13 #5 data loss). The fix carries the stored id forward.
    import org.apache.spark.sql.functions._
    import graft.streaming.EventStream
    val s = spark
    import s.implicits._
    def ev(rows: (Long, String)*) = rows.toDF("day", "event_type")
      .select(timestamp_micros(col("day") * 86400000000L + 1L).as("ts"),
        col("event_type"))
    val stateDir =
      Files.createTempDirectory("graft_linbf_st").toString + "/s"
    EventStream.errorBurnProcessBatch(ev((1L, "error")), 0L, stateDir)
    // simulate state accumulated under a prior stream lineage
    val marker = new java.io.File(stateDir, "_QUERY_ID")
    java.nio.file.Files.writeString(marker.toPath, "lineage-original")
    // backfill promote OUTSIDE any stream: must keep the marker
    EventStream.errorBurnProcessBatch(ev((1L, "view")), 1L, stateDir)
    assert(marker.isFile &&
      java.nio.file.Files.readString(marker.toPath).trim
        == "lineage-original",
      "a non-stream promote erased (or rewrote) the lineage marker")
    // and the guard is still ARMED: a different lineage (simulated
    // via the thread-local Spark sets on micro-batch threads) refuses
    spark.sparkContext.setLocalProperty(
      "sql.streaming.queryId", "lineage-fresh")
    try {
      val e = intercept[IllegalStateException](
        EventStream.errorBurnProcessBatch(ev((1L, "view")), 2L, stateDir))
      assert(e.getMessage.contains("lineage"),
        s"expected the lineage refusal, got: ${e.getMessage.take(200)}")
    } finally spark.sparkContext.setLocalProperty(
      "sql.streaming.queryId", null)
    // the matching lineage still merges (marker adopted end to end)
    spark.sparkContext.setLocalProperty(
      "sql.streaming.queryId", "lineage-original")
    try EventStream.errorBurnProcessBatch(ev((1L, "view")), 2L, stateDir)
    finally spark.sparkContext.setLocalProperty(
      "sql.streaming.queryId", null)
    val st = spark.read.parquet(stateDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    assert(st == Seq((1L, 3L, 1L)), s"post-backfill merges drifted: $st")
  }

  test("iterative BPE trained from streamed vocab state equals the one-shot train") {
    import org.apache.spark.sql.functions._
    import graft.streaming.DocStream
    import graft.ops.BpeIterative
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"))
    val staged = Files.createTempDirectory("graft_bpev_in").toString
    docs.filter(col("doc_id") % 2 === 0).coalesce(1)
      .write.mode("append").parquet(staged)
    docs.filter(col("doc_id") % 2 === 1).coalesce(1)
      .write.mode("append").parquet(staged)
    val stateDir = Files.createTempDirectory("graft_bpev_st").toString + "/s"
    val stream = spark.readStream
      .schema(docs.schema)
      .option("maxFilesPerTrigger", 1).parquet(staged)
    val q = DocStream.bpeVocabStream(stream, stateDir)
      .option("checkpointLocation", s"$stateDir.ckpt").start()
    try q.processAllAvailable() finally q.stop()
    // the trainer as a READ over the streamed state: the FULL merge
    // table (every rank, symbol, weight) equals the one-shot train
    val fromState = BpeIterative
      .trainFromCounts(spark.read.parquet(stateDir), 32).merges
    val oneShot = BpeIterative.trainIterative(docs, 32).merges
    assert(fromState.nonEmpty && fromState == oneShot,
      s"state-trained merges diverged: ${fromState.take(4)} vs " +
        s"${oneShot.take(4)}")
  }

  test("boundary-stitch stream state read equals the q237 batch run") {
    import org.apache.spark.sql.functions._
    import graft.streaming.DocStream
    import graft.ops.Dedup
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"))
    val staged = Files.createTempDirectory("graft_bst_in").toString
    docs.filter(col("doc_id") % 2 === 0).coalesce(1)
      .write.mode("append").parquet(staged)
    docs.filter(col("doc_id") % 2 === 1).coalesce(1)
      .write.mode("append").parquet(staged)
    val root = Files.createTempDirectory("graft_bst").toString
    val outDir = root + "/o"; val stateDir = root + "/s"
    val stream = spark.readStream
      .schema(docs.schema)
      .option("maxFilesPerTrigger", 1).parquet(staged)
    val q = DocStream.boundaryStitchStream(stream, outDir, stateDir).start()
    try q.processAllAvailable() finally q.stop()
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // the authoritative table is the state READ — identical caps,
    // identical features, so it equals the batch op exactly
    val st = spark.read.parquet(stateDir)
    val streamed = rows(Dedup.boundaryStitchesFromFeatures(st, st))
    val batch = rows(Dedup.boundaryStitchesDocs(docs))
    Dedup.unpersistCaches()
    assert(streamed == batch,
      s"state-read stitches diverged: ${(streamed -- batch).take(3)} / " +
        s"${(batch -- streamed).take(3)}")
    // every batch-op pair also surfaced in some micro-batch emission
    // (emissions can be a superset near the cap boundary, never a
    // subset)
    val emitted = rows(spark.read.parquet(s"$outDir/batch_id=*"))
    assert((batch -- emitted).isEmpty,
      s"batch pairs never emitted: ${(batch -- emitted).take(3)}")
  }

  test("boundary-stitch micro-batch replay is value-idempotent (crash after promote)") {
    import org.apache.spark.sql.functions._
    import graft.streaming.DocStream
    import spark.implicits._
    // a planted stitch inside the batch: doc 4 begins with doc 2's
    // 8-char tail
    val b0 = Seq((2L, "qqqqqqqqxxxxxxba"), (4L, "xxxxxxbazzzz"))
      .toDF("doc_id", "text")
    val root = Files.createTempDirectory("graft_bst_replay").toString
    val outDir = root + "/o"; val stateDir = root + "/s"
    def run() = DocStream.boundaryProcessBatch(b0, 0L, outDir, stateDir, 64L)
    def outSnap() = spark.read.parquet(s"$outDir/batch_id=0").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    def stateSnap() = spark.read.parquet(stateDir)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    run()
    val out1 = outSnap(); val st1 = stateSnap()
    assert(out1 == Set((2L, 4L, 8L)), s"fixture stitch missing: $out1")
    assert(st1 == Set(2L, 4L))
    run() // replay — state already holds this batch's features
    assert(outSnap() == out1,
      s"replay changed emissions: ${(outSnap() -- out1).take(3)}")
    assert(stateSnap() == st1, "replay grew the feature state")
  }

  test("streaming tumbling agg equals the batch result") {
    // stage a µs-timestamp copy (the raw testdata is TIMESTAMP(NANOS),
    // which the file stream source can't bind to a TIMESTAMP schema)
    val staged = Files.createTempDirectory("graft_stream").toString
    Tables.events(spark, sf).write.mode("overwrite").parquet(staged)

    val stream = EventStream.readEventStream(spark, staged)
    val q = EventStream.runOnce(EventStream.tumblingCounts(stream), "t_out")
    try {
      val streamed = spark.table("t_out")
        .orderBy("hour_start", "event_type")
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
      val batch = Events.tumbling(spark, sf)
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
      assert(streamed.nonEmpty)
      assert(streamed.toSeq == batch.toSeq)
    } finally q.stop()
  }
}
