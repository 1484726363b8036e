package graft

import graft.ops.{Behavior, Profiling, Sampling, Similarity}
import org.apache.spark.sql.functions._

/** Planted-fixture semantics for the behavioral-analytics and
  * statistical-QA operators (q91–q98) — the properties the DuckDB
  * oracle can't see (step ordering, clamping, frontier domination,
  * triangle closure). */
class BehaviorSpec extends SparkSpec {
  import spark.implicits._

  test("cohort retention: offsets are weeks since first activity") {
    val out = Behavior.cohortRetention(spark, sf)
    // week 0 row exists for every cohort and retains 100%
    val w0 = out.filter(col("week_offset") === 0)
    assert(w0.count() > 0)
    assert(w0.filter(col("retention_ppm") =!= 1000000L).count() == 0,
      "offset-0 retention must be 1,000,000 ppm by construction")
    // active_users never exceeds cohort_size
    assert(out.filter(col("active_users") > col("cohort_size")).count() == 0)
  }

  test("funnel steps are monotone and order-sensitive") {
    val out = Behavior.funnel(spark, sf).orderBy("step").collect()
    assert(out.length == 3)
    val users = out.map(_.getAs[Long]("users"))
    assert(users(0) >= users(1) && users(1) >= users(2),
      "later funnel steps can only lose users")
    assert(out(0).getAs[Long]("conv_ppm") == 1000000L)
  }

  test("funnel requires strict step order (purchase before view drops)") {
    import org.apache.spark.sql.{DataFrame, SparkSession}
    // user 1 does signup->view->purchase in order; user 2 purchases
    // before viewing (purchase must NOT count)
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      (1L, 1L, "signup", ts("2024-01-01 00:00:00")),
      (2L, 1L, "view", ts("2024-01-01 01:00:00")),
      (3L, 1L, "purchase", ts("2024-01-01 02:00:00")),
      (4L, 2L, "signup", ts("2024-01-01 00:00:00")),
      (5L, 2L, "purchase", ts("2024-01-01 01:00:00")),
      (6L, 2L, "view", ts("2024-01-01 02:00:00"))
    ).toDF("event_id", "user_id", "event_type", "ts")
    val dir = java.nio.file.Files.createTempDirectory("funnel").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Behavior.funnel(spark, dir).orderBy("step").collect()
    assert(out.map(_.getAs[Long]("users")).toSeq == Seq(2L, 2L, 1L),
      "only user 1 completes view->purchase in order")
  }

  test("transition ppm rows per from-state sum to ~1e6 (floor rounding)") {
    val out = Behavior.transitions(spark, sf)
    val sums = out.groupBy("from_type")
      .agg(sum(col("prob_ppm")).as("t"), count(lit(1)).as("k"))
      .collect()
    sums.foreach { r =>
      val t = r.getAs[Long]("t"); val k = r.getAs[Long]("k")
      assert(t <= 1000000L && t > 1000000L - k,
        s"floor-rounded ppm must sum within k of 1e6, got $t for k=$k")
    }
  }

  test("z-score outliers: planted extreme value is flagged high") {
    val li = Seq.tabulate(20)(i =>
      (1L, i.toLong, i, 100.0)) :+ (1L, 99L, 1, 10000.0)
    val df = li.toDF("l_suppkey", "l_orderkey", "l_linenumber",
      "l_extendedprice")
    val dir = java.nio.file.Files.createTempDirectory("zsc").toString
    df.write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = Profiling.zscoreOutliers(spark, dir).collect()
    assert(out.length == 1 && out(0).getAs[Long]("l_orderkey") == 99L
      && out(0).getAs[String]("side") == "high")
  }

  test("z-score outliers: constant group emits nothing (zero variance)") {
    val df = Seq.tabulate(10)(i => (7L, i.toLong, i, 500.0))
      .toDF("l_suppkey", "l_orderkey", "l_linenumber", "l_extendedprice")
    val dir = java.nio.file.Files.createTempDirectory("zsc0").toString
    df.write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    assert(Profiling.zscoreOutliers(spark, dir).count() == 0)
  }

  test("MAD outliers: planted extreme flagged at 5*MAD; median unmoved") {
    // 21 values 100.00..120.00 step 1 plus one 10000.00 bomb: median
    // of 22 = 11th smallest = 110.00 -> 1100000 cents... (values
    // 10000..12000 cents, rank-11 value = 11000); deviations 0..1000
    // step 100 (each twice) + 890000: MAD = 11th smallest dev = 500
    val rows = (0 to 20).map(i => ("A", 10000L + i * 100L)) :+
      ("A", 890000L + 11000L)
    val df = rows.toDF("l_returnflag", "c")
    val out = Profiling.madOutliersOf(df, kNum = 5L, kDen = 1L).collect()
    assert(out.length == 1)
    val r = out(0)
    assert(r.getAs[Long]("med_cents") == 11000L, s"median ${r}")
    assert(r.getAs[Long]("mad_cents") == 500L, s"mad ${r}")
    // only the bomb exceeds 5*MAD = 2500: all true deviations <= 1000
    assert(r.getAs[Long]("n_outliers") == 1L, s"outliers ${r}")
    // masking resistance: the bomb shifts the MEAN by ~40k cents but
    // the median only from 10.5th to 11th value — one step
  }

  test("k-anonymity: small class flagged, risk share exact ppm") {
    // class (1,A) has 6 members (safe at k=5), (2,B) has 2 (at risk):
    // risk share = 2 of 8 rows = 250000 ppm on every output row
    val rows = (1 to 6).map(_ => (1L, "A")) ++ Seq((2L, "B"), (2L, "B"))
    val df = rows.toDF("c_nationkey", "c_mktsegment")
    val dir = java.nio.file.Files.createTempDirectory("kanon").toString
    df.write.mode("overwrite").parquet(s"$dir/customer.parquet")
    val got = graft.ops.Audit.kAnonymity(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getBoolean(3), r.getLong(4))).toMap
    assert(got((1L, "A")) == ((6L, false, 250000L)), s"got ${got((1L, "A"))}")
    assert(got((2L, "B")) == ((2L, true, 250000L)), s"got ${got((2L, "B"))}")
  }

  test("heavy hitters: dominant planted token crosses the threshold") {
    val docs = Seq(
      (1L, "pad pad pad pad pad pad pad x", "s1"),   // 'pad' 7/8
      (2L, "a b c d e f g h i j k l m n o p q r s t u v w x y z " +
        "aa bb cc dd", "s2"))                        // all 1/30 < 3.5%
      .toDF("doc_id", "text", "source")
    val dir = java.nio.file.Files.createTempDirectory("hh").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.ops.TextAnalysis.heavyHitters(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(3)).toMap
    assert(got(("s1", "pad")) == 875000L, s"got $got")
    assert(got(("s1", "x")) == 125000L)
    assert(!got.keys.exists(_._1 == "s2"), s"diverse source flagged: $got")
  }

  test("weighted median: heavy-quantity row pulls the median dollar") {
    // values 1.00/2.00/3.00 with quantities 1/1/10: row median 2.00,
    // weight median 3.00 (10 of 12 weight sits at 3.00)
    val df = Seq(("A", 1.00, 1.0), ("A", 2.00, 1.0), ("A", 3.00, 10.0))
      .toDF("l_returnflag", "l_extendedprice", "l_quantity")
    val dir = java.nio.file.Files.createTempDirectory("wmed").toString
    df.write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val r = Profiling.weightedMedian(spark, dir).collect()
    assert(r.length == 1)
    assert(r(0).getAs[Long]("med_cents") == 200L, s"got ${r(0)}")
    assert(r(0).getAs[Long]("wmed_cents") == 300L, s"got ${r(0)}")
    assert(r(0).getAs[Long]("total_weight") == 1200L)
  }

  test("freshness audit: dead feed shows exact watermark staleness") {
    import java.sql.Timestamp
    val ev = Seq(
      (1L, Timestamp.valueOf("2024-01-01 00:00:00"), "alive"),
      (2L, Timestamp.valueOf("2024-01-01 00:01:40"), "alive"),
      (3L, Timestamp.valueOf("2024-01-01 00:00:50"), "dead"))
      .toDF("event_id", "ts", "event_type")
    val dir = java.nio.file.Files.createTempDirectory("fresh").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = graft.ops.Audit.freshnessAudit(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(4))).toMap
    assert(got("alive") == ((2L, 0L)), s"got $got")
    // dead feed last seen 50s before the corpus watermark
    assert(got("dead") == ((1L, 50000000L)), s"got $got")
  }

  test("histogram clamps overflow into the last bin and sums exactly") {
    val df = Seq((1L, 599999.99), (2L, 999999.99), (3L, 0.0))
      .toDF("o_orderkey", "o_totalprice")
    val dir = java.nio.file.Files.createTempDirectory("hist").toString
    df.write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val out = Profiling.priceHistogram(spark, dir)
      .collect().map(r => (r.getAs[Long]("bin"), r.getAs[Long]("n"),
        r.getAs[Long]("sum_cents"))).toSeq
    assert(out.contains((0L, 1L, 0L)))
    // 599999.99 and 999999.99 both land in bin 23 (clamp)
    assert(out.contains((23L, 2L, 59999999L + 99999999L)))
  }

  test("pareto frontier: dominated points drop, frontier survives") {
    val df = Seq(
      // (price, qty): (1,5) and (2,9) are the frontier; (2,4) is
      // dominated by (1,5); (3,9) by (2,9); (1,5) duplicate kept once
      (1L, 1.0, 5.0), (1L, 1.0, 5.0), (1L, 2.0, 9.0),
      (1L, 2.0, 4.0), (1L, 3.0, 9.0)
    ).toDF("l_suppkey", "l_extendedprice", "l_quantity")
    val dir = java.nio.file.Files.createTempDirectory("pareto").toString
    df.write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = Profiling.paretoFrontier(spark, dir)
      .collect().map(r => (r.getAs[Long]("p_cents"), r.getAs[Long]("q_cents")))
    assert(out.toSeq == Seq((100L, 500L), (200L, 900L)))
  }

  test("triangles: planted 4-clique gives 3 triangles per node") {
    val edges = Seq((0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L), (1L, 3L),
      (2L, 3L), (4L, 5L)).toDF("vec_a", "vec_b")
    val out = Similarity.triangleCounts(edges).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("n_triangles")))
    assert(out.toSeq == Seq((0L, 3L), (1L, 3L), (2L, 3L), (3L, 3L)),
      "each 4-clique node sits in C(3,2)=3 triangles; the isolated " +
        "edge contributes none")
  }

  test("correlation is in [-1,1] and exactly 1 on a planted linear pair") {
    val out = Profiling.corrQuantityPrice(spark, sf).collect()
    out.foreach { r =>
      val c = r.getAs[Double]("corr_qp")
      assert(c >= -1.0 && c <= 1.0)
    }
    // planted y = 3x: correlation exactly 1 after rounding
    val df = Seq((1.0, 3.0), (2.0, 6.0), (3.0, 9.0), (4.0, 12.0))
      .map { case (x, y) => ("A", x, y) }
      .toDF("l_returnflag", "l_quantity", "l_extendedprice")
    val dir = java.nio.file.Files.createTempDirectory("corr").toString
    df.write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val r = Profiling.corrQuantityPrice(spark, dir).collect()
    assert(r.length == 1 && r(0).getAs[Double]("corr_qp") == 1.0)
  }

  test("winsorized sum is bounded by the raw sum and clips both tails") {
    val out = Profiling.winsorizedRevenue(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("n_clipped_lo") > 0L)
      assert(r.getAs[Long]("n_clipped_hi") > 0L)
      // clipping both 5% tails moves mass inward: sum stays positive
      // and below n * max-bound; cheap sanity floor
      assert(r.getAs[Long]("wins_sum_cents") > 0L)
    }
  }

  test("KS drift: identical samples score 0 ppm, disjoint samples 1e6 ppm") {
    val rows =
      // status 'O': R and A carry identical price multisets -> KS 0
      (1 to 50).flatMap(i => Seq(("O", "R", i * 10.0), ("O", "A", i * 10.0))) ++
        // status 'F': every R price below every A price -> KS 1.0,
        // first attained at the largest R value (30.00 = 3000 cents)
        (1 to 30).map(i => ("F", "R", i * 1.0)) ++
        (1 to 40).map(i => ("F", "A", 1000.0 + i))
    val df = rows.toDF("l_linestatus", "l_returnflag", "l_extendedprice")
    val dir = java.nio.file.Files.createTempDirectory("ks").toString
    df.write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = Profiling.ksDrift(spark, dir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(3), r.getLong(4))).toMap
    assert(out("O")._1 == 0L, s"identical dists scored ${out("O")}")
    assert(out("F") == ((1000000L, 3000L)), s"disjoint dists scored ${out("F")}")
  }

  test("TVD drift: identical mixes score 0, disjoint mixes 1e6 ppm") {
    def write(rows: Seq[(String, java.sql.Timestamp)]): String = {
      val dir = java.nio.file.Files.createTempDirectory("tvd").toString
      rows.toDF("o_orderpriority", "o_orderdate")
        .write.mode("overwrite").parquet(s"$dir/orders.parquet")
      dir
    }
    def ts(s: String) = java.sql.Timestamp.valueOf(s + " 00:00:00")
    // identical category mixes across the two years -> every |diff| 0
    val same = Seq("1-HIGH", "2-MED", "2-MED", "3-LOW").flatMap(p =>
      Seq((p, ts("1996-06-01")), (p, ts("1997-06-01"))))
    val out0 = Profiling.tvdDrift(spark, write(same)).collect()
    assert(out0.nonEmpty && out0.forall(_.getAs[Long]("tvd_ppm") == 0L))
    // fully disjoint category sets -> TVD exactly 1
    val disjoint = Seq(("1-HIGH", ts("1996-06-01")),
      ("1-HIGH", ts("1996-07-01")), ("9-NEW", ts("1997-06-01")))
    val out1 = Profiling.tvdDrift(spark, write(disjoint)).collect()
    assert(out1.forall(_.getAs[Long]("tvd_ppm") == 1000000L),
      out1.mkString(";"))
  }

  test("mode breaks count ties toward the smaller value") {
    // 10 appears twice, 20 appears twice: tie -> mode must be 10
    val df = Seq(10.0, 10.0, 20.0, 20.0, 30.0)
      .map(q => ("A", q, 1.0))
      .toDF("l_returnflag", "l_quantity", "l_extendedprice")
    val dir = java.nio.file.Files.createTempDirectory("mode").toString
    df.write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val r = Profiling.modeQuantity(spark, dir).collect()
    assert(r.length == 1 && r(0).getAs[Long]("mode_q_cents") == 1000L
      && r(0).getAs[Long]("n") == 2L)
  }

  test("cusum ends at zero and peaks at a planted level shift") {
    val ts = (d: Int) => java.sql.Timestamp.valueOf(f"2024-01-$d%02d 12:00:00")
    // 6 days at 10.0, then 6 days at 50.0: |cusum| peaks at the shift
    val ev = (1 to 12).map(d =>
      (d.toLong, 1L, "click", ts(d), if (d <= 6) 10.0 else 50.0))
      .toDF("event_id", "user_id", "event_type", "ts", "value")
    val dir = java.nio.file.Files.createTempDirectory("cusum").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = graft.ops.TimeSeries.cusumDrift(spark, dir)
      .orderBy("day").collect()
    assert(out.last.getAs[Long]("cusum_scaled") == 0L,
      "CUSUM telescopes to zero at the end of the series")
    val peakDay = out.maxBy(r => math.abs(r.getAs[Long]("cusum_scaled")))
    assert(peakDay.getAs[java.sql.Timestamp]("day").toString.startsWith(
      "2024-01-06"), s"peak must sit at the level shift, got $peakDay")
  }

  test("benford digits cover 1-9 and shares sum to ~1e6") {
    val out = Profiling.benfordDigits(spark, sf).collect()
    val digits = out.map(_.getAs[Long]("digit"))
    assert(digits.forall(d => d >= 1 && d <= 9))
    val t = out.map(_.getAs[Long]("share_ppm")).sum
    assert(t <= 1000000L && t > 1000000L - out.length)
  }

  test("contingency cells: totals consistent, chi non-negative") {
    val out = Profiling.contingencyChi(spark, sf).collect()
    val n = out.map(_.getAs[Long]("n")).sum
    assert(out.forall(_.getAs[Long]("grand_total") == n))
    assert(out.forall(_.getAs[Double]("chi_cell") >= 0.0))
    // row totals: sum of n within a flag equals the row_total column
    out.groupBy(_.getAs[String]("l_returnflag")).foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Long]("n")).sum ==
        rs.head.getAs[Long]("row_total"))
    }
  }

  test("capped balance floors at zero and resumes from the floor") {
    val ts = (h: Int) => java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:00:00")
    // deltas (value - 50): +10, -30, +5 -> balances 10, 0, 5
    val ev = Seq(
      (1L, 1L, "click", ts(1), 60.0),
      (2L, 1L, "click", ts(2), 20.0),
      (3L, 1L, "click", ts(3), 55.0)
    ).toDF("event_id", "user_id", "event_type", "ts", "value")
    val dir = java.nio.file.Files.createTempDirectory("bal").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = graft.ops.TimeSeries.cappedBalance(spark, dir)
      .orderBy("event_id").collect()
      .map(_.getAs[Long]("balance_micro")).toSeq
    assert(out == Seq(10000000L, 0L, 5000000L),
      "the floor must clamp step 2 and step 3 must resume from 0, " +
        s"got $out")
  }

  test("capped balance is never negative on real data") {
    val out = graft.ops.TimeSeries.cappedBalance(spark, sf)
    assert(out.filter(col("balance_micro") < 0).count() == 0)
  }

  test("balanced mix caps every source and ignores other-source growth") {
    val out = Sampling.balancedSourceMix(spark, sf, cap = 60)
    val perSource = out.groupBy("source").count().collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("count")).toMap
    val sizes = Tables.documents(spark, sf).groupBy("source").count()
      .collect().map(r => r.getAs[String]("source") -> r.getAs[Long]("count"))
      .toMap
    sizes.foreach { case (s, n) =>
      assert(perSource.getOrElse(s, 0L) == math.min(60L, n),
        s"source $s must contribute min(cap, size)")
    }
    // growth invariance: dropping one source leaves the others' picks
    // untouched (the hash order is per-source, not global)
    val victim = sizes.keys.min
    val docs = Tables.documents(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("mix").toString
    docs.filter(col("source") =!= victim).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val reduced = Sampling.balancedSourceMix(spark, dir, cap = 60)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source")))
      .toSet
    val expect = out.collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source")))
      .filter(_._2 != victim).toSet
    assert(reduced == expect)
  }

  test("gini: equal revenues give 0, a monopoly approaches (n-1)/n") {
    def fixture(xs: Seq[Double]): String = {
      val li = xs.zipWithIndex.map { case (x, i) =>
        (i.toLong + 1, 1L, i + 1, x) }
        .toDF("l_suppkey", "l_orderkey", "l_linenumber", "l_extendedprice")
      val sup = xs.indices.map(i => (i.toLong + 1, s"s$i", 0L))
        .toDF("s_suppkey", "s_name", "s_nationkey")
      val dir = java.nio.file.Files.createTempDirectory("gini").toString
      li.write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
      sup.write.mode("overwrite").parquet(s"$dir/supplier.parquet")
      dir
    }
    val equal = Profiling.giniRevenue(spark, fixture(Seq(10, 10, 10, 10)))
      .collect()
    assert(equal.head.getAs[Long]("gini_ppm") == 0L)
    // one supplier holds everything: G = (n-1)/n = 0.75
    val mono = Profiling.giniRevenue(spark, fixture(Seq(0.01, 0.01, 0.01, 9999)))
      .collect()
    val g = mono.head.getAs[Long]("gini_ppm")
    assert(g > 740000L && g <= 750000L, s"monopoly gini ~750000, got $g")
  }

  test("trend recovers a planted linear price drift exactly") {
    // y = 100 + 2*x dollars over days x=0..9 -> slope 200 cents/day
    val ts = (d: Int) => java.sql.Timestamp.valueOf(f"1970-01-${d + 1}%02d 00:00:00")
    val li = (0 to 9).map(d =>
      ("A", ts(d), 100.0 + 2.0 * d)).toDF(
      "l_returnflag", "l_shipdate", "l_extendedprice")
    val dir = java.nio.file.Files.createTempDirectory("trend").toString
    li.write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val r = Profiling.priceTrend(spark, dir).collect()
    assert(r.length == 1)
    assert(r(0).getAs[Double]("slope_cents_per_day") == 200.0)
    assert(r(0).getAs[Double]("intercept_cents") == 10000.0)
  }

  test("histogram quantiles bracket the exact percentiles") {
    import graft.ops.Grouping
    val out = Grouping.histogramQuantileRollup(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val p50 = r.getAs[Long]("p50_lo_cents")
      val p95 = r.getAs[Long]("p95_lo_cents")
      assert(p50 <= p95, "p50 bin cannot exceed p95 bin")
    }
    // the weekly totals must equal the raw weekly row counts (the
    // merge lost nothing)
    val totals = out.map(r => (r.getAs[java.sql.Timestamp]("week"),
      r.getAs[Long]("total"))).toMap
    val raw = Tables.orders(spark, sf)
      .groupBy(date_trunc("week", col("o_orderdate")).as("week")).count()
      .collect().map(r => (r.getAs[java.sql.Timestamp]("week"),
        r.getAs[Long]("count"))).toMap
    assert(totals == raw)
  }

  test("standardized embeddings have ~zero mean and ~unit variance per dim") {
    val out = Similarity.standardizedEmbeddings(spark, sf)
    val stats = out.groupBy("pos")
      .agg(avg(col("z")).as("mu"), stddev_samp(col("z")).as("sd"))
      .collect()
    assert(stats.length == 64)
    stats.foreach { r =>
      assert(math.abs(r.getAs[Double]("mu")) < 1e-4)
      assert(math.abs(r.getAs[Double]("sd") - 1.0) < 1e-3)
    }
  }

  test("fd check: orders PK holds, per-order shipdate varies") {
    import graft.ops.Audit
    val out = Audit.fdCheck(spark, sf).collect()
      .map(r => r.getAs[String]("dependency") ->
        r.getAs[Long]("n_violating")).toMap
    assert(out("o_orderkey->o_custkey") == 0L,
      "o_orderkey is the orders primary key")
    assert(out("l_orderkey->l_shipdate") > 0L,
      "ship dates vary within an order in the generated data")
  }

  test("ri audit: clean corpus has zero orphans, planted orphan found") {
    import graft.ops.Audit
    val clean = Audit.riAudit(spark, sf).collect()
    assert(clean.length == 6)
    assert(clean.forall(_.getAs[Long]("n_orphans") == 0L),
      "driver testdata is referentially intact")
    // plant an orphaned lineitem: copy the dir shape with a bogus key
    val dir = java.nio.file.Files.createTempDirectory("ri").toString
    for (t <- Seq("orders", "part", "supplier", "customer", "nation"))
      Tables(spark, sf, t).write.parquet(s"$dir/$t.parquet")
    Tables.lineitem(spark, sf)
      .withColumn("l_orderkey",
        when(col("l_linenumber") === 1, lit(-999L)).otherwise(col("l_orderkey")))
      .write.parquet(s"$dir/lineitem.parquet")
    val planted = Audit.riAudit(spark, dir).collect()
      .map(r => r.getAs[String]("fk_edge") -> r.getAs[Long]("n_orphans"))
      .toMap
    assert(planted("lineitem.l_orderkey->orders") > 0L)
  }

  test("twap weights by holding duration, not event count") {
    val ts = (m: Int) => java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    // value 10 held 9 minutes, value 100 held 1 minute -> twap 19
    val ev = Seq(
      (1L, 1L, "click", ts(0), 10.0),
      (2L, 1L, "click", ts(9), 100.0),
      (3L, 1L, "click", ts(10), 7.0) // terminal: no weight
    ).toDF("event_id", "user_id", "event_type", "ts", "value")
    val dir = java.nio.file.Files.createTempDirectory("twap").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = graft.ops.TimeSeries.twap(spark, dir).collect()
    assert(r.length == 1)
    assert(r(0).getAs[Long]("twap_micro") == 19000000L,
      s"(10*9 + 100*1)/10 = 19, got ${r(0).getAs[Long]("twap_micro")}")
    assert(r(0).getAs[Long]("n_weighted") == 2L)
  }

  test("source overlap is symmetric-complete and bounded by shingle counts") {
    import graft.ops.Dedup
    val out = Dedup.sourceOverlap(spark, sf).collect()
    val sources = Tables.documents(spark, sf).select("source")
      .distinct().count()
    assert(out.length == (sources * (sources - 1) / 2).toInt,
      "every source pair shares at least one common-English shingle here")
    assert(out.forall(_.getAs[Long]("n_shared") > 0L))
    out.foreach(r => assert(
      r.getAs[String]("source_a") < r.getAs[String]("source_b")))
  }

  test("burstiness: metronome gives cv2=0, bursts push cv2 over 1") {
    val ts = (m: Int) => java.sql.Timestamp.valueOf(f"2024-01-01 ${m / 60}%02d:${m % 60}%02d:00")
    // user 1: perfectly regular (gap 10 min); user 2: 3 rapid + 1 huge
    val ev = (Seq(0, 10, 20, 30).zipWithIndex.map { case (m, i) =>
      (i.toLong, 1L, "click", ts(m), 1.0) } ++
      Seq(100, 101, 102, 500).zipWithIndex.map { case (m, i) =>
        (10L + i, 2L, "click", ts(m), 1.0) })
      .toDF("event_id", "user_id", "event_type", "ts", "value")
    val dir = java.nio.file.Files.createTempDirectory("burst").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = graft.ops.TimeSeries.burstiness(spark, dir).collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Double]("cv2")).toMap
    assert(out(1L) == 0.0, "constant gaps must give zero variation")
    assert(out(2L) > 1.0, s"bursty series must exceed Poisson, got ${out(2L)}")
  }

  test("export chunks are near-uniform on a dense key space") {
    import graft.ops.Audit
    val out = Audit.exportChunkAudit(spark, sf, stride = 256L).collect()
    assert(out.length > 1)
    // dense sequential orderkeys: every full chunk within 2% of ideal
    val full = out.dropRight(1)
    full.foreach { r =>
      val ppm = r.getAs[Long]("load_ppm")
      assert(ppm > 900000L && ppm < 1100000L,
        s"chunk ${r.getAs[Long]("chunk")} load $ppm ppm is skewed")
    }
  }

  test("profile counts nulls and distincts per column") {
    val out = Profiling.profileOrders(spark, sf).collect()
    assert(out.length == 6)
    val byName = out.map(r => r.getAs[String]("column_name") -> r).toMap
    assert(byName("o_orderkey").getAs[Long]("n_nulls") == 0L)
    val n = Tables.orders(spark, sf).count()
    assert(byName("o_orderkey").getAs[Long]("n_distinct") == n,
      "o_orderkey is the primary key: distinct == row count")
    assert(byName("o_orderstatus").getAs[Long]("n_distinct") <= 3L)
  }
}
