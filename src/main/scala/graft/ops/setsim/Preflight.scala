package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** The "price it, then run it" pre-flight forecasts (q259 self-join,
  * q260/q264 incremental, q263 containment) with their DuckDB oracle
  * SQL and the budget-gate plumbing — pure move out of Dedup.scala
  * (VERDICT r14 #6); object Dedup mixes this back in. */
trait SetSimPreflights { this: Dedup.type =>
  /** Set-sim verify pre-flight (q259): the executable "price it, then
    * run it" gate for the exact-verification family (VERDICT r12 #4 —
    * the q229/q238-Σdeg² pattern applied to the family that ships).
    * From ONE keyed count over the threshold-independent index's
    * prefix table, BEFORE any candidate join runs, per swept
    * threshold:
    *  - `fanout_slots` = Σ_g C(c_g, 2) over per-gram prefix
    *    memberships — EXACTLY the row count the PPJoin candidate
    *    self-join processes (every slot is one evaluated pair; the
    *    length/positional bounds prune inside the join, so this is
    *    the work upper bound and the distinct-candidate upper bound);
    *  - `max_gram_slots` / `top_gram_share_ppm` — the skew read (one
    *    hot prefix gram = one hot join partition, the salting
    *    trigger);
    *  - `est_exchange_bytes` = slots × (avg packed payload + row
    *    overhead) — what the over-threshold PACKED verify would move
    *    between its two joins (the measured 30×/100× cost center),
    *    priced from the index's own varint column;
    *  - `packed_regime` — whether the verify would take the packed
    *    shuffle path at the DEFAULT 1 GiB broadcast limit (the
    *    gramBytes rule [[SetSizer]] applies). The flag is pinned to
    *    the default — NOT the configured `graft.setsim.broadcastBytes`
    *    — by contract (ADVICE r14): the DuckDB oracle cannot read
    *    Spark conf, so the column is a pure data property; under a
    *    custom limit the ACTUAL regime switch may differ from the
    *    flag (read est_exchange_bytes against your own limit).
    * At 1000× a deployment runs THIS query (seconds — one aggregate
    * over the prefix table), reads est_exchange_bytes against its
    * shuffle budget, and only then commits to the verify — or
    * tightens t / salts the top gram first.
    *
    * All outputs are exact integers derived from replayable state, so
    * the DuckDB oracle re-derives every number — including the varint
    * payload bytes, replayed gram-by-gram from the LEB128 length
    * formula ⌈bitlen/7⌉ against Spark's `length(gv)` of the actual
    * packed bytes: the hash compare proves the payload accounting
    * cross-engine.
    *
    * Scale shape: ONE conditional-count pass (the swept cuts NEST,
    * so one g64-keyed aggregate — zero exchange on the bucketed
    * index — covers every threshold; the threshold-spine join it
    * replaced tripled the ranked scan: 77.6 s vs 1.1 s warm at the
    * 100× rehearsal point) → 1-row fold → stack() reshape. The only
    * corpus-sized inputs are index-table scans; no candidate pair
    * ever materializes, and the warm gate measured scale-FLAT
    * (0.5–1.6 s across 1×/10×/100×). */
  def setSimPreflight(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val idx = persistedSetSimIndex(spark, dir, "docs", Tables.documents _)
    setSimPreflightOn(idx.ranked, idx.gramSets, idx.nDocs, idx.gramBytes)
  }

  /** Fresh-path (index-free) twin of [[setSimPreflight]] for the
    * differential spec — bit-identical by the same argument as
    * setSimNearDups vs setSimJoin (exact integer state throughout). */
  private[graft] def setSimPreflightDocs(docs: DataFrame,
      idCol: String): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    latin1Guard(docs)
    val grams = packedGrams(docs, idCol)
    val freq = grams.groupBy(col("g64")).agg(count(lit(1)).as("df"))
    val gramSets = register(packedGramSetsOf(grams, freq)
      .persist(StorageLevel.MEMORY_AND_DISK))
    val sz = sizer(docs.sparkSession, gramSets)
    setSimPreflightOn(
      rankedGrams(grams, freq, gramSets, sz, leftJoinFreq = false),
      gramSets, sz.nDocs, sz.gramBytes)
  }

  /** The swept thresholds. Prefix cuts NEST (lower t ⇒ longer
    * prefix), so one scan with one conditional count per t replaces a
    * 3-way threshold-spine join — measured 77.6 s → one-scan at the
    * 100× rehearsal point, where the spine join tripled the
    * 55M-row ranked-table scan and the (t, g64) shuffle. */
  private[ops] val PreflightTs = Seq(600000L, 700000L, 800000L)

  /** Per-gram prefix-membership counts for ALL swept thresholds in
    * one pass over the ranked table: rows failing even the loosest
    * cut drop before the aggregate; each tighter t is a conditional
    * count. Output: (g64, c<t>...) for each swept t. */
  private[ops] def preflightGramCounts(ranked: DataFrame,
      ts: Seq[Long] = PreflightTs): DataFrame = {
    def cutOk(t: Long) =
      col("pos") <= col("n") - expr(s"($t * n + 999999) DIV 1000000") + 1
    val cnts = ts.map(t =>
      sum(when(cutOk(t), 1L).otherwise(0L)).as(s"c$t"))
    ranked.filter(cutOk(ts.min))
      .groupBy(col("g64"))
      .agg(cnts.head, cnts.tail: _*)
  }

  /** Shared loud failure of the opt-in pre-flight budget gates (the
    * q259 `graft.setsim.maxExchangeBytes` control, generalized in
    * round 14 to every pair family per VERDICT r13 #1): the estimated
    * exchange is slots × rowBytes; over budget the join never runs
    * and the numbers land in the error. */
  private[ops] def failBudget(label: String, confKey: String, budget: Long,
      slots: Long, maxSlots: Long, rowBytes: Long): Unit = {
    val est = BigInt(slots) * BigInt(rowBytes)
    if (est > BigInt(budget)) {
      val share =
        if (slots == 0L) 0L
        else (BigInt(maxSlots) * 1000000 / BigInt(slots)).toLong
      throw new IllegalStateException(
        s"$label pre-flight: estimated verify exchange $est B ($slots " +
          s"candidate-join slots × $rowBytes B/row, top key $share ppm " +
          s"of slots) exceeds $confKey=$budget — tighten the " +
          "threshold, salt the hot key, or raise the budget")
    }
  }

  /** Candidate-join slot count of one gram-keyed join, WITHOUT
    * running it: per-gram counts of both sides, Σ_g cA(g)·cB(g) and
    * the hottest gram's product — exactly the row count the equi-join
    * processes before any post-join filter. Decimal accumulation
    * (products of corpus-scale counts overflow long). */
  private[ops] def joinSlots(a: DataFrame, b: DataFrame): (Long, Long) = {
    def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    val cA = a.groupBy(col("g64")).agg(count(lit(1)).as("ca"))
    val cB = b.groupBy(col("g64")).agg(count(lit(1)).as("cb"))
    val r = cA.join(cB, Seq("g64"))
      .agg(sum(dec(col("ca")) * dec(col("cb"))).as("sl"),
        max(dec(col("ca")) * dec(col("cb"))).as("mx"))
      .select(expr("CAST(coalesce(sl, 0) AS BIGINT)"),
        expr("CAST(coalesce(mx, 0) AS BIGINT)"))
      .head()
    (r.getLong(0), r.getLong(1))
  }

  private[ops] val ContainPreflightTs = Seq(800000L, 900000L, 950000L)

  /** Containment pre-flight (q263): the q259 "price it, then run it"
    * forecast for the containment family (VERDICT r13 #1 — the last
    * pair generator with a forecast-less entry). Per swept threshold:
    * the contained-side prefix rows, `fanout_slots` = Σ_g cA(g)·df(g)
    * — EXACTLY the rows the prefix-cut-contained × FULL-container
    * candidate join processes (the container side is unfiltered, so
    * its per-gram count IS the corpus document frequency the index
    * precomputes) — the hottest gram's slot share, and the exchange
    * estimate. `est_row_bytes` prices the PACKED gv row (the q259
    * methodology): since round 14 [[containmentNearDups]] switches to
    * [[containVerifyPacked]] exactly when the exchange regime engages
    * (over the broadcast threshold — under it the verify BROADCASTS
    * and never exchanges candidate×payload), so the packed row is
    * what the gated join actually ships; `packed_regime` flags the
    * switch AT THE DEFAULT 1 GiB limit (a pure data property the
    * oracle replays — see the q259 doc for the custom-limit caveat,
    * ADVICE r14). */
  def containmentPreflight(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val idx = persistedSetSimIndex(spark, dir, "docs", Tables.documents _)
    containmentPreflightOn(idx.ranked, idx.freq, idx.gramSets,
      idx.nDocs, idx.gramBytes)
  }

  private[ops] def containmentPreflightOn(ranked: DataFrame, freq: DataFrame,
      gramSets: DataFrame, nDocs: Long, gramBytes: Long): DataFrame = {
    def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    val perGram = preflightGramCounts(ranked, ContainPreflightTs)
      .join(freq, Seq("g64"))
    val aggs = ContainPreflightTs.flatMap { t =>
      Seq(sum(col(s"c$t")).as(s"pr$t"),
        sum(dec(col(s"c$t")) * dec(col("df"))).as(s"sl$t"),
        max(dec(col(s"c$t")) * dec(col("df"))).as(s"mx$t"))
    }
    val agg1 = perGram.agg(aggs.head, aggs.tail: _*)
    // packed payload statistics — one aggregate over the index's gv
    // column (the q259 `pay` shape)
    val pay = gramSets
      .agg(sum(length(col("gv")).cast("long")).as("gv_bytes"))
      .select(lit(nDocs).as("n_docs"),
        lit(gramBytes).as("gram_bytes"), col("gv_bytes"),
        expr(s"CAST(gv_bytes div ${math.max(nDocs, 1L)} + 24 AS BIGINT)")
          .as("est_row_bytes"))
    agg1.select(expr(
        s"stack(${ContainPreflightTs.size}, " + ContainPreflightTs.map(t =>
          s"${t}L, pr$t, sl$t, mx$t").mkString(", ") +
          ") AS (t_ppm, prefix_rows0, sl0, mx0)"))
      .select(col("t_ppm"),
        coalesce(col("prefix_rows0"), lit(0L)).as("prefix_rows"),
        coalesce(expr("CAST(sl0 AS BIGINT)"), lit(0L)).as("fanout_slots"),
        coalesce(expr("CAST(mx0 AS BIGINT)"), lit(0L)).as("max_gram_slots"))
      .crossJoin(broadcast(pay))
      .select(col("t_ppm"), col("prefix_rows"), col("fanout_slots"),
        col("max_gram_slots"),
        when(col("fanout_slots") === 0L, 0L)
          .otherwise(expr(
            "CAST((max_gram_slots * 1000000) div fanout_slots AS BIGINT)"))
          .as("top_gram_share_ppm"),
        col("n_docs"), col("gram_bytes"), col("gv_bytes"),
        col("est_row_bytes"),
        (col("fanout_slots") * col("est_row_bytes"))
          .as("est_exchange_bytes"),
        (col("gram_bytes") > lit(1073741824L)).as("packed_regime"))
      .orderBy(col("t_ppm"), col("prefix_rows"), col("fanout_slots"),
        col("max_gram_slots"), col("top_gram_share_ppm"), col("n_docs"),
        col("gram_bytes"), col("gv_bytes"), col("est_row_bytes"),
        col("est_exchange_bytes"), col("packed_regime"))
  }

  /** DuckDB oracle for [[containmentPreflight]]: replays the shared
    * total order, the contained-side prefix cut per swept t,
    * Σ cA·df in HUGEINT (the q259 oracle shape with the container
    * side's count = df), the dictionary rank (df desc, gram asc) and
    * the LEB128 payload length ⌈bitlen(delta)/7⌉ per delta of each
    * doc's sorted dense ids — byte-for-byte the varint_delta_pack
    * length (the q259 `del` CTE, verbatim). */
  def containmentPreflightOracleSql(): String =
    """WITH g AS (
      |  SELECT doc_id, unnest(list_distinct([substr(text, i, 8)
      |    FOR i IN range(1, greatest(length(text) - 7, 1) + 1)])) AS gram
      |  FROM documents),
      |f AS (SELECT gram, CAST(count(*) AS BIGINT) AS df
      |      FROM g GROUP BY gram),
      |s AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n
      |      FROM g GROUP BY doc_id),
      |r AS (
      |  SELECT g.doc_id, g.gram,
      |    ROW_NUMBER() OVER (PARTITION BY g.doc_id
      |      ORDER BY f.df ASC, g.gram ASC) AS pos, s.n
      |  FROM g JOIN f ON f.gram = g.gram JOIN s ON s.doc_id = g.doc_id),
      |t AS (SELECT UNNEST([800000, 900000, 950000]) AS t_ppm),
      |p AS (
      |  SELECT t_ppm, gram
      |  FROM t JOIN r ON pos <= n - ((t_ppm * n + 999999) // 1000000) + 1),
      |cg AS (SELECT t_ppm, gram, CAST(COUNT(*) AS HUGEINT) AS c
      |       FROM p GROUP BY 1, 2),
      |fan AS (
      |  SELECT cg.t_ppm, CAST(SUM(cg.c) AS BIGINT) AS prefix_rows,
      |    CAST(SUM(cg.c * f.df) AS BIGINT) AS fanout_slots,
      |    CAST(MAX(cg.c * f.df) AS BIGINT) AS max_gram_slots
      |  FROM cg JOIN f ON f.gram = cg.gram GROUP BY 1),
      |d AS (SELECT gram, ROW_NUMBER() OVER (ORDER BY df DESC, gram ASC)
      |        AS gid
      |      FROM f),
      |del AS (
      |  SELECT gid - COALESCE(LAG(gid) OVER (
      |    PARTITION BY doc_id ORDER BY gid), 0) AS delta
      |  FROM (SELECT g.doc_id, d.gid FROM g JOIN d ON d.gram = g.gram)),
      |st AS (
      |  SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM s) AS n_docs,
      |    (SELECT CAST(SUM(n) * 8 + COUNT(*) * 48 AS BIGINT) FROM s)
      |      AS gram_bytes,
      |    (SELECT CAST(SUM((LENGTH(BIN(delta)) + 6) // 7) AS BIGINT)
      |     FROM del) AS gv_bytes)
      |SELECT CAST(t.t_ppm AS BIGINT) AS t_ppm,
      |  COALESCE(prefix_rows, 0) AS prefix_rows,
      |  COALESCE(fanout_slots, 0) AS fanout_slots,
      |  COALESCE(max_gram_slots, 0) AS max_gram_slots,
      |  CASE WHEN COALESCE(fanout_slots, 0) = 0 THEN 0
      |    ELSE CAST(CAST(max_gram_slots AS HUGEINT) * 1000000
      |      // fanout_slots AS BIGINT) END AS top_gram_share_ppm,
      |  n_docs, gram_bytes, gv_bytes,
      |  CAST(gv_bytes // GREATEST(n_docs, 1) + 24 AS BIGINT)
      |    AS est_row_bytes,
      |  CAST(CAST(COALESCE(fanout_slots, 0) AS HUGEINT)
      |    * (gv_bytes // GREATEST(n_docs, 1) + 24) AS BIGINT)
      |    AS est_exchange_bytes,
      |  gram_bytes > 1073741824 AS packed_regime
      |FROM t LEFT JOIN fan ON fan.t_ppm = t.t_ppm
      |CROSS JOIN st
      |ORDER BY t_ppm, prefix_rows, fanout_slots, max_gram_slots,
      |  top_gram_share_ppm, n_docs, gram_bytes, gv_bytes, est_row_bytes,
      |  est_exchange_bytes, packed_regime""".stripMargin

  private[ops] def setSimPreflightOn(ranked: DataFrame, gramSets: DataFrame,
      nDocs: Long, gramBytes: Long): DataFrame = {
    val sess = ranked.sparkSession
    import sess.implicits._
    def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    val perGram = preflightGramCounts(ranked)
    val aggs = PreflightTs.flatMap { t =>
      Seq(sum(col(s"c$t")).as(s"pr$t"),
        sum(dec(col(s"c$t")) * dec(col(s"c$t") - 1)).as(s"sl$t"),
        max(dec(col(s"c$t")) * dec(col(s"c$t") - 1)).as(s"mx$t"))
    }
    val agg1 = perGram.agg(aggs.head, aggs.tail: _*)
    // one stack() reshape of the 1-row aggregate into the 3-row sweep
    // (a unionAll of per-t selects would re-run the aggregate 3x)
    val fan = agg1.select(expr(
        s"stack(${PreflightTs.size}, " + PreflightTs.map(t =>
          s"${t}L, pr$t, sl$t, mx$t").mkString(", ") +
          ") AS (t_ppm, prefix_rows0, slots2, mx2)"))
      .select(col("t_ppm"),
        coalesce(col("prefix_rows0"), lit(0L)).as("prefix_rows"),
        coalesce(expr("CAST(slots2 div 2 AS BIGINT)"), lit(0L))
          .as("fanout_slots"),
        coalesce(expr("CAST(mx2 div 2 AS BIGINT)"), lit(0L))
          .as("max_gram_slots"))
    // payload statistics: nDocs/gramBytes ride the index's
    // precomputed stats (zero actions); the packed payload is one
    // aggregate over the bucketed signature table's gv column
    val pay = gramSets
      .agg(sum(length(col("gv")).cast("long")).as("gv_bytes"))
      .select(lit(nDocs).as("n_docs"),
        lit(gramBytes).as("gram_bytes"), col("gv_bytes"),
        expr(s"CAST(gv_bytes div $nDocs + 24 AS BIGINT)")
          .as("est_row_bytes"))
    fan.crossJoin(broadcast(pay))
      .select(col("t_ppm"), col("prefix_rows"), col("fanout_slots"),
        col("max_gram_slots"),
        when(col("fanout_slots") === 0L, 0L)
          .otherwise(expr(
            "CAST((max_gram_slots * 1000000) div fanout_slots AS BIGINT)"))
          .as("top_gram_share_ppm"),
        col("n_docs"), col("gram_bytes"), col("gv_bytes"),
        col("est_row_bytes"),
        (col("fanout_slots") * col("est_row_bytes"))
          .as("est_exchange_bytes"),
        (col("gram_bytes") > lit(1073741824L)).as("packed_regime"))
      .orderBy(col("t_ppm"), col("prefix_rows"), col("fanout_slots"),
        col("max_gram_slots"), col("top_gram_share_ppm"), col("n_docs"),
        col("gram_bytes"), col("gv_bytes"), col("est_row_bytes"),
        col("est_exchange_bytes"), col("packed_regime"))
  }

  /** DuckDB oracle for [[setSimPreflight]]: replays the shared total
    * order (df asc, gram asc — string order == packed-long order for
    * Latin-1 grams), the prefix cut, the per-gram slot counts, the
    * dictionary rank (df desc, gram asc), and the LEB128 payload
    * length ⌈bitlen(delta)/7⌉ per delta of each doc's sorted dense
    * ids — byte-for-byte the varint_delta_pack length. */
  def setSimPreflightOracleSql(): String =
    """WITH g AS (
      |  SELECT doc_id, unnest(list_distinct([substr(text, i, 8)
      |    FOR i IN range(1, greatest(length(text) - 7, 1) + 1)])) AS gram
      |  FROM documents),
      |f AS (SELECT gram, CAST(count(*) AS BIGINT) AS df
      |      FROM g GROUP BY gram),
      |s AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n
      |      FROM g GROUP BY doc_id),
      |r AS (
      |  SELECT g.doc_id, g.gram,
      |    ROW_NUMBER() OVER (PARTITION BY g.doc_id
      |      ORDER BY f.df ASC, g.gram ASC) AS pos, s.n
      |  FROM g JOIN f ON f.gram = g.gram JOIN s ON s.doc_id = g.doc_id),
      |t AS (SELECT UNNEST([600000, 700000, 800000]) AS t_ppm),
      |p AS (
      |  SELECT t_ppm, gram
      |  FROM t JOIN r ON pos <= n - ((t_ppm * n + 999999) // 1000000) + 1),
      |cg AS (SELECT t_ppm, gram, CAST(COUNT(*) AS HUGEINT) AS c
      |       FROM p GROUP BY 1, 2),
      |fan AS (
      |  SELECT t_ppm, CAST(SUM(c) AS BIGINT) AS prefix_rows,
      |    CAST(SUM(c * (c - 1)) // 2 AS BIGINT) AS fanout_slots,
      |    CAST(MAX(c * (c - 1)) // 2 AS BIGINT) AS max_gram_slots
      |  FROM cg GROUP BY 1),
      |d AS (SELECT gram, ROW_NUMBER() OVER (ORDER BY df DESC, gram ASC)
      |        AS gid
      |      FROM f),
      |del AS (
      |  SELECT gid - COALESCE(LAG(gid) OVER (
      |    PARTITION BY doc_id ORDER BY gid), 0) AS delta
      |  FROM (SELECT g.doc_id, d.gid FROM g JOIN d ON d.gram = g.gram)),
      |st AS (
      |  SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM s) AS n_docs,
      |    (SELECT CAST(SUM(n) * 8 + COUNT(*) * 48 AS BIGINT) FROM s)
      |      AS gram_bytes,
      |    (SELECT CAST(SUM((LENGTH(BIN(delta)) + 6) // 7) AS BIGINT)
      |     FROM del) AS gv_bytes)
      |SELECT CAST(t_ppm AS BIGINT) AS t_ppm, prefix_rows, fanout_slots,
      |  max_gram_slots,
      |  CASE WHEN fanout_slots = 0 THEN 0
      |    ELSE CAST(CAST(max_gram_slots AS HUGEINT) * 1000000
      |      // fanout_slots AS BIGINT) END AS top_gram_share_ppm,
      |  n_docs, gram_bytes, gv_bytes,
      |  CAST(gv_bytes // n_docs + 24 AS BIGINT) AS est_row_bytes,
      |  CAST(CAST(fanout_slots AS HUGEINT)
      |    * (gv_bytes // n_docs + 24) AS BIGINT) AS est_exchange_bytes,
      |  gram_bytes > 1073741824 AS packed_regime
      |FROM fan CROSS JOIN st
      |ORDER BY t_ppm, prefix_rows, fanout_slots, max_gram_slots,
      |  top_gram_share_ppm, n_docs, gram_bytes, gv_bytes, est_row_bytes,
      |  est_exchange_bytes, packed_regime""".stripMargin

  /** Incremental set-sim pre-flight (q260): the [[setSimPreflight]]
    * gate for the shape a deployment actually runs DAILY — an ingest
    * batch probing the existing corpus ([[setSimJoinIncremental]]).
    * Per swept threshold, from per-side keyed counts over the two
    * prefix tables (corpus-side df is the shared total order; batch
    * grams unseen in the corpus rank first with df = 0 — the
    * incremental asymmetry), BEFORE any join runs:
    * `fanout_slots` = Σ_g cN(g)·cC(g) — exactly the row count the
    * batch×corpus candidate join processes; the top-gram skew share;
    * and the exchange-byte estimate from the CORPUS-side signature
    * payload (the side that outgrows broadcast first). The batch is
    * the derived newest-10% id slice (the q191/q254/q257 convention),
    * so the oracle re-derives the cutoff too.
    *
    * METHODOLOGY (ADVICE r13 #2, resolved twice): round 14 first
    * documented the unpacked estimate as the true row size, then gave
    * the incremental verify its PACKED regime ([[verifyPairsPackedTwo]]
    * over [[packedGramSetsAgainst]] — batch grams in the corpus-
    * dictionary id space), so this forecast now prices the packed gv
    * row exactly like q259: the exchange this estimate prices only
    * exists over the broadcast threshold, which is precisely when the
    * verify ships gv. `packed_regime` flags the switch at the DEFAULT
    * 1 GiB limit (a pure data property the oracle replays — see the
    * q259 doc for the custom-limit caveat, ADVICE r14); all three
    * pair-forecast queries now share one methodology. */
  def setSimPreflightIncremental(spark: SparkSession,
      dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val docs = Tables.documents(spark, dir)
    // ONE corpus scan answers both driver questions (r16): the
    // newest-10% cutoff AND the Latin-1 injectivity guard — the
    // standalone latin1Guard paid its own full-text scan + action
    // right before the cutoff scan. Same failure semantics (loud
    // IllegalArgumentException at call time, before any heavy work);
    // the conf opt-out skips building the rlike column at all.
    val checkOn = spark.conf.getOption("graft.setsim.latin1Check")
      .forall(_.toBoolean)
    val aggCols = max(col("doc_id")).as("mx") +: (if (checkOn)
      Seq(count(when(col("text").rlike("[^\\x00-\\xFF]"), 1)).as("bad"))
      else Nil)
    val hd = docs.agg(aggCols.head, aggCols.tail: _*).head()
    if (checkOn && hd.getLong(1) > 0L)
      throw new IllegalArgumentException(
        "setSimJoin: corpus contains characters above U+00FF; the " +
          "packed-long gram encoding is only injective for Latin-1 " +
          "text. Pre-filter or transliterate the corpus first.")
    val cutoff = (hd.getLong(0) + 1L) * 9L / 10L
    // ONE corpus scan + pack8 explode serves BOTH sides (r16, VERDICT
    // r15 #3 — the fresh path paid two full document scans for a
    // row-disjoint split); sides are filters over the persisted frame
    val grams = packedGrams(docs, "doc_id")
    val isC = col("doc_id") < cutoff
    val gramsC = grams.filter(isC)
    val gramsN = grams.filter(!isC)
    // counts-only per-doc frames: this forecast never touches gram
    // ARRAYS, and the sizing/rank joins only read (doc_id, n) — the
    // sorted collect_list build was pure waste here (r15). One
    // aggregate + ONE sizing action now covers both sides (was two
    // frames and two driver actions).
    val sets = gramCountsOf(grams)
    val setsC = sets.filter(isC)
    val setsN = sets.filter(!isC)
    val limit = spark.conf.getOption("graft.setsim.broadcastBytes")
      .map(_.toLong).getOrElse(1024L * 1024 * 1024)
    val st = sets.agg(
      count(when(isC, 1)).as("dc"),
      sum(when(isC, col("n"))).as("gc"),
      count(when(!isC, 1)).as("dn"),
      sum(when(!isC, col("n"))).as("gn")).head()
    def gb(d: Long, i: Int) =
      (if (st.isNullAt(i)) 0L else st.getLong(i)) * 8L + d * 48L
    val szC = SetSizer(st.getLong(0), gb(st.getLong(0), 1), limit)
    val szN = SetSizer(st.getLong(2), gb(st.getLong(2), 3), limit)
    // two consumers (the fused corpus pass + the batch ranking) —
    // persist the vocabulary-sized frequency table once
    val freq = register(gramsC.groupBy(col("g64"))
      .agg(count(lit(1)).as("df"))
      .persist(StorageLevel.MEMORY_AND_DISK))
    // the count pipelines and the gv-byte pass stay SEPARATE subtrees
    // on purpose: a fused single-pass form (one dict join, two
    // windows over one doc_id exchange, one group-by-g64 emitting
    // counts + byte sums) was built and MEASURED SLOWER at sf0.1
    // (6.4/5.45 med/min vs 5.4/5.36 — the second wide in-partition
    // sort and the unfiltered aggregate cost more than the saved
    // exchange), and AQE materializes the independent subtrees
    // concurrently within the one final action anyway (r16,
    // OPTIMIZATION_r16.md q260)
    import org.apache.spark.sql.expressions.Window
    val gvRows = gramsC.join(dictIdsOf(freq), Seq("g64"))
      .withColumn("delta", col("gid") - coalesce(
        lag(col("gid"), 1).over(
          Window.partitionBy(col("doc_id")).orderBy(col("gid"))),
        lit(0L)))
      .select(expr("CAST((length(bin(delta)) + 6) DIV 7 AS BIGINT)")
        .as("gvb"))
    incrementalPreflightOn(
      rankedGrams(gramsC, freq, setsC, szC, leftJoinFreq = false),
      rankedGrams(gramsN, freq, setsN, szN, leftJoinFreq = true),
      gvRows, szN.nDocs, szC.nDocs, szC.gramBytes)
  }

  /** Index-riding twin of [[setSimPreflightIncremental]] — the shape
    * a DEPLOYMENT runs daily (VERDICT r13 #4): the corpus side's
    * ranked table, df order, and sizing stats come from the persisted
    * prior-corpus index (the q191 `docs_p90` artifact — shared, so
    * one build serves both the containment probe and this gate); only
    * the ingest batch's grams rank fresh. Bit-identical to the fresh
    * path (Round14OpsSpec differential); the fresh path stays the
    * oracle face. The warm-gate rehearsal row reads THIS — the q259
    * convention: warm the index outside the timed run, then the gate
    * itself is the ~1 s scale-flat read. */
  def setSimPreflightIncrementalIndexed(spark: SparkSession,
      dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val docs = Tables.documents(spark, dir)
    val cutoff =
      (docs.agg(max(col("doc_id"))).head().getLong(0) + 1L) * 9L / 10L
    val idx = persistedSetSimIndex(spark, dir, "docs_p90",
      (s, d) => Tables.documents(s, d).filter(col("doc_id") < cutoff))
    val newDocs = docs.filter(col("doc_id") >= cutoff)
    latin1Guard(newDocs)
    val gramsN = packedGrams(newDocs, "doc_id")
    val setsN = gramCountsOf(gramsN)  // counts-only (r15): no array use
    val szN = sizer(spark, setsN)
    incrementalPreflightOn(idx.ranked,
      rankedGrams(gramsN, idx.freq, setsN, szN, leftJoinFreq = true),
      idx.gramSets.select(length(col("gv")).cast("long").as("gvb")),
      szN.nDocs, idx.nDocs, idx.gramBytes)
  }

  /** Rehearsal instrument (q260i marginal row): the wired incremental
    * gate's cost OVER a probe that already built its prefix tables —
    * the deployment shape: [[setSimJoinIncremental]] builds
    * prefixN/prefixC for the candidate join regardless, and the gate
    * is one keyed-count pair + one vocabulary join on top. `warm()`
    * materializes and registry-persists both prefix tables (the
    * probe's own work, paid outside the timed read; corpus side off
    * the persisted index); `gate()` then prices Σ cN·cC from the warm
    * frames — the marginal control cost. */
  def incrementalGateInstrument(spark: SparkSession, dir: String,
      tPpm: Long = 700000L): (() => Unit, () => (Long, Long)) = {
    graft.functions.GraftFunctions.register(spark)
    val docs = Tables.documents(spark, dir)
    val cutoff =
      (docs.agg(max(col("doc_id"))).head().getLong(0) + 1L) * 9L / 10L
    val idx = persistedSetSimIndex(spark, dir, "docs_p90",
      (s, d) => Tables.documents(s, d).filter(col("doc_id") < cutoff))
    val newDocs = docs.filter(col("doc_id") >= cutoff)
    val gramsN = packedGrams(newDocs, "doc_id")
    val setsN = gramCountsOf(gramsN)  // counts-only (r15): no array use
    val szN = sizer(spark, setsN)
    val prefixC = register(prefixCutFilter(idx.ranked, tPpm)
      .persist(StorageLevel.MEMORY_AND_DISK))
    val prefixN = register(
      prefixOf(gramsN, idx.freq, setsN, szN, tPpm, leftJoinFreq = true)
        .persist(StorageLevel.MEMORY_AND_DISK))
    (() => { prefixC.count(); prefixN.count(); () },
      () => joinSlots(prefixN, prefixC))
  }

  /** Shared core of the incremental pre-flight: per-side one-pass
    * conditional counts (the q259 trick: prefix cuts nest, so one
    * scan covers all swept thresholds), the slot join, and the
    * stacked sweep reshape. */
  private[ops] def incrementalPreflightOn(rankedC: DataFrame,
      rankedN: DataFrame, gvByteRows: DataFrame, nBatchDocs: Long,
      nCorpusDocs: Long, corpusGramBytes: Long): DataFrame = {
    // each side feeds the slot join AND its own prefix-row totals —
    // persisted (vocabulary-sized) so the window stack runs once
    val cC = register(preflightGramCounts(rankedC)
      .select(col("g64") +: PreflightTs.map(t => col(s"c$t").as(s"cc$t")): _*)
      .persist(StorageLevel.MEMORY_AND_DISK))
    val cN = register(preflightGramCounts(rankedN)
      .select(col("g64") +: PreflightTs.map(t => col(s"c$t").as(s"cn$t")): _*)
      .persist(StorageLevel.MEMORY_AND_DISK))
    incrementalPreflightAssemble(cC, cN,
      gvByteRows.agg(sum(col("gvb")).as("gv_bytes")),
      nBatchDocs, nCorpusDocs, corpusGramBytes)
  }

  /** Shared assemble tail over prepared per-gram count frames (cC:
    * (g64, cc<t>...), cN: (g64, cn<t>...)) and a 1-row gv_bytes
    * aggregate — the slot join, totals, stacked sweep reshape and
    * payload stats. */
  private[ops] def incrementalPreflightAssemble(cC: DataFrame,
      cN: DataFrame, gvBytes1: DataFrame, nBatchDocs: Long,
      nCorpusDocs: Long, corpusGramBytes: Long): DataFrame = {
    def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    val slotAggs = PreflightTs.flatMap { t =>
      Seq(sum(dec(col(s"cn$t")) * dec(col(s"cc$t"))).as(s"sl$t"),
        max(dec(col(s"cn$t")) * dec(col(s"cc$t"))).as(s"mx$t"))
    }
    val fan1 = cN.join(cC, Seq("g64")).agg(slotAggs.head, slotAggs.tail: _*)
    val prNAggs = PreflightTs.map(t => sum(col(s"cn$t")).as(s"prn$t"))
    val prCAggs = PreflightTs.map(t => sum(col(s"cc$t")).as(s"prc$t"))
    val totals = cN.agg(prNAggs.head, prNAggs.tail: _*)
      .crossJoin(cC.agg(prCAggs.head, prCAggs.tail: _*))
      .crossJoin(fan1)
    // packed payload statistics (round 14 — the q259 methodology,
    // matching the regime-switched incremental verify): one aggregate
    // over the corpus side's per-delta gv byte lengths
    val pay = gvBytes1
      .select(lit(nBatchDocs).as("n_batch_docs"),
        lit(nCorpusDocs).as("n_corpus_docs"),
        lit(corpusGramBytes).as("corpus_gram_bytes"), col("gv_bytes"),
        expr(s"CAST(gv_bytes div ${math.max(nCorpusDocs, 1L)} + 24" +
          " AS BIGINT)").as("est_row_bytes"))
    totals.select(expr(
        s"stack(${PreflightTs.size}, " + PreflightTs.map(t =>
          s"${t}L, prn$t, prc$t, sl$t, mx$t").mkString(", ") +
          ") AS (t_ppm, prn0, prc0, sl0, mx0)"))
      .select(col("t_ppm"),
        coalesce(col("prn0"), lit(0L)).as("batch_prefix_rows"),
        coalesce(col("prc0"), lit(0L)).as("corpus_prefix_rows"),
        coalesce(expr("CAST(sl0 AS BIGINT)"), lit(0L)).as("fanout_slots"),
        coalesce(expr("CAST(mx0 AS BIGINT)"), lit(0L)).as("max_gram_slots"))
      .crossJoin(broadcast(pay))
      .select(col("t_ppm"), col("batch_prefix_rows"),
        col("corpus_prefix_rows"), col("fanout_slots"),
        col("max_gram_slots"),
        when(col("fanout_slots") === 0L, 0L)
          .otherwise(expr(
            "CAST((max_gram_slots * 1000000) div fanout_slots AS BIGINT)"))
          .as("top_gram_share_ppm"),
        col("n_batch_docs"), col("n_corpus_docs"),
        col("corpus_gram_bytes"), col("gv_bytes"), col("est_row_bytes"),
        (col("fanout_slots") * col("est_row_bytes"))
          .as("est_exchange_bytes"),
        (col("corpus_gram_bytes") > lit(1073741824L)).as("packed_regime"))
      .orderBy(col("t_ppm"), col("batch_prefix_rows"),
        col("corpus_prefix_rows"), col("fanout_slots"),
        col("max_gram_slots"), col("top_gram_share_ppm"),
        col("n_batch_docs"), col("n_corpus_docs"),
        col("corpus_gram_bytes"), col("gv_bytes"), col("est_row_bytes"),
        col("est_exchange_bytes"), col("packed_regime"))
  }

  /** DuckDB oracle for [[setSimPreflightIncremental]] — re-derives
    * the cutoff, the corpus-only df order (batch-unseen grams df = 0
    * via LEFT JOIN + COALESCE), both prefix cuts, and the per-gram
    * slot products. */
  def setSimPreflightIncrementalOracleSql(): String =
    """WITH cut AS (
      |  SELECT (MAX(doc_id) + 1) * 9 // 10 AS c FROM documents),
      |g AS (
      |  SELECT doc_id, unnest(list_distinct([substr(text, i, 8)
      |    FOR i IN range(1, greatest(length(text) - 7, 1) + 1)])) AS gram
      |  FROM documents),
      |gc AS (SELECT * FROM g WHERE doc_id < (SELECT c FROM cut)),
      |gn AS (SELECT * FROM g WHERE doc_id >= (SELECT c FROM cut)),
      |f AS (SELECT gram, CAST(count(*) AS BIGINT) AS df
      |      FROM gc GROUP BY gram),
      |sc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n
      |       FROM gc GROUP BY doc_id),
      |sn AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n
      |       FROM gn GROUP BY doc_id),
      |rc AS (
      |  SELECT gc.doc_id, gc.gram,
      |    ROW_NUMBER() OVER (PARTITION BY gc.doc_id
      |      ORDER BY f.df ASC, gc.gram ASC) AS pos, sc.n
      |  FROM gc JOIN f ON f.gram = gc.gram
      |  JOIN sc ON sc.doc_id = gc.doc_id),
      |rn AS (
      |  SELECT gn.doc_id, gn.gram,
      |    ROW_NUMBER() OVER (PARTITION BY gn.doc_id
      |      ORDER BY COALESCE(f.df, 0) ASC, gn.gram ASC) AS pos, sn.n
      |  FROM gn LEFT JOIN f ON f.gram = gn.gram
      |  JOIN sn ON sn.doc_id = gn.doc_id),
      |t AS (SELECT UNNEST([600000, 700000, 800000]) AS t_ppm),
      |pc AS (
      |  SELECT t_ppm, gram FROM t JOIN rc
      |    ON pos <= n - ((t_ppm * n + 999999) // 1000000) + 1),
      |pn AS (
      |  SELECT t_ppm, gram FROM t JOIN rn
      |    ON pos <= n - ((t_ppm * n + 999999) // 1000000) + 1),
      |cc AS (SELECT t_ppm, gram, CAST(COUNT(*) AS HUGEINT) AS c
      |       FROM pc GROUP BY 1, 2),
      |cn AS (SELECT t_ppm, gram, CAST(COUNT(*) AS HUGEINT) AS c
      |       FROM pn GROUP BY 1, 2),
      |fan AS (
      |  SELECT cn.t_ppm, CAST(SUM(cn.c * cc.c) AS BIGINT) AS fanout_slots,
      |    CAST(MAX(cn.c * cc.c) AS BIGINT) AS max_gram_slots
      |  FROM cn JOIN cc ON cn.t_ppm = cc.t_ppm AND cn.gram = cc.gram
      |  GROUP BY 1),
      |prn AS (SELECT t_ppm, CAST(SUM(c) AS BIGINT) AS batch_prefix_rows
      |        FROM cn GROUP BY 1),
      |prc AS (SELECT t_ppm, CAST(SUM(c) AS BIGINT) AS corpus_prefix_rows
      |        FROM cc GROUP BY 1),
      |d AS (SELECT gram, ROW_NUMBER() OVER (ORDER BY df DESC, gram ASC)
      |        AS gid
      |      FROM f),
      |del AS (
      |  SELECT gid - COALESCE(LAG(gid) OVER (
      |    PARTITION BY doc_id ORDER BY gid), 0) AS delta
      |  FROM (SELECT gc.doc_id, d.gid FROM gc JOIN d ON d.gram = gc.gram)),
      |st AS (
      |  SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM sn) AS n_batch_docs,
      |    (SELECT CAST(COUNT(*) AS BIGINT) FROM sc) AS n_corpus_docs,
      |    (SELECT CAST(SUM(n) * 8 + COUNT(*) * 48 AS BIGINT) FROM sc)
      |      AS corpus_gram_bytes,
      |    (SELECT CAST(SUM((LENGTH(BIN(delta)) + 6) // 7) AS BIGINT)
      |     FROM del) AS gv_bytes,
      |    (SELECT CAST(COUNT(*) AS BIGINT) FROM sc) AS nc0)
      |SELECT CAST(t.t_ppm AS BIGINT) AS t_ppm,
      |  COALESCE(batch_prefix_rows, 0) AS batch_prefix_rows,
      |  COALESCE(corpus_prefix_rows, 0) AS corpus_prefix_rows,
      |  COALESCE(fanout_slots, 0) AS fanout_slots,
      |  COALESCE(max_gram_slots, 0) AS max_gram_slots,
      |  CASE WHEN COALESCE(fanout_slots, 0) = 0 THEN 0
      |    ELSE CAST(CAST(max_gram_slots AS HUGEINT) * 1000000
      |      // fanout_slots AS BIGINT) END AS top_gram_share_ppm,
      |  n_batch_docs, n_corpus_docs, corpus_gram_bytes, gv_bytes,
      |  CAST(gv_bytes // GREATEST(nc0, 1) + 24 AS BIGINT)
      |    AS est_row_bytes,
      |  CAST(CAST(COALESCE(fanout_slots, 0) AS HUGEINT)
      |    * (gv_bytes // GREATEST(nc0, 1) + 24) AS BIGINT)
      |    AS est_exchange_bytes,
      |  corpus_gram_bytes > 1073741824 AS packed_regime
      |FROM t LEFT JOIN prn ON prn.t_ppm = t.t_ppm
      |LEFT JOIN prc ON prc.t_ppm = t.t_ppm
      |LEFT JOIN fan ON fan.t_ppm = t.t_ppm
      |CROSS JOIN st
      |ORDER BY t_ppm, batch_prefix_rows, corpus_prefix_rows,
      |  fanout_slots, max_gram_slots, top_gram_share_ppm, n_batch_docs,
      |  n_corpus_docs, corpus_gram_bytes, gv_bytes, est_row_bytes,
      |  est_exchange_bytes, packed_regime""".stripMargin

}
