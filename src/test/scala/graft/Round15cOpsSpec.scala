package graft

import org.apache.spark.sql.functions._
import graft.ops.BandPlan

/** Round-15 continuation: the MinHash band-plan tuner (q269). */
class Round15cOpsSpec extends SparkSpec
    with org.scalatest.BeforeAndAfterEach {

  override protected def afterEach(): Unit = {
    graft.ops.Dedup.unpersistCaches()
    super.afterEach()
  }

  /** Independent Scala replication of the op's S-curve fold: repeated
    * squaring (the same multiply sequence as probChainSteps) + the
    * BigDecimal HALF_UP mirror of Spark's round (the round-2 rule:
    * BigDecimal(d).setScale(n, HALF_UP) == Spark round semantics). */
  private def pPpm(s: Double, r: Int, b: Int): Long = {
    def sq(x: Double, e: Int): Double = {
      var v = x; var k = 1
      while (k < e) { v = v * v; k *= 2 }
      v
    }
    val p = 1.0 - sq(1.0 - sq(s, r), b)
    val r6 = BigDecimal(p)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    BigDecimal(r6 * 1000000d)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
  }

  test("q269 planted histogram: every plan row matches the independent fold; chosen = cheapest meeting the SLO") {
    val s = spark
    import s.implicits._
    // 1000 mildly-similar pairs (bin 2, midpoint s = 0.125) and 10
    // true near-dups (bin 17, midpoint s = 0.875, above τ = 0.8)
    val pairs = (Seq.fill(1000)(125000L) ++ Seq.fill(10)(875000L))
      .toDF("jac_ppm")
    val got = BandPlan.bandPlanOn(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5))).toList
    val expected = BandPlan.Plans.map { case (b, r) =>
      val pLow = pPpm(0.125, r, b)
      val pHigh = pPpm(0.875, r, b)
      val est = 1000L * pLow + 10L * pHigh
      val recall = (10L * pHigh) / 10L
      (b.toLong, r.toLong, est, 10L, recall)
    }
    // chosen by the op's rule, replicated: qualifying → min est, else
    // max recall; ties broken by bands desc
    val qual = expected.filter(_._5 >= BandPlan.RecallTargetPpm)
    val want =
      if (qual.nonEmpty) qual.minBy(e => (e._3, -e._1)) else expected.maxBy(e => (e._5, e._1))
    val full = expected
      .map(e => (e._1, e._2, e._3, e._4, e._5, e == want))
      .sortBy(e => (e._1, e._2))
    assert(got == full, s"got $got\nwant $full")
    // the fixture is two-regime by construction: the wide plan floods
    // (catches the 1000 low-sim pairs) and the sharpest plan misses
    // the SLO — the chosen plan must be neither extreme
    assert(want._1 != 64L && want._2 != 16L, s"degenerate choice $want")
    assert(got.count(_._6) == 1)
  }

  test("q269 jaccard ppm: hand-computed shingle overlap") {
    val s = spark
    import s.implicits._
    // d1 = one shingle {abcdefgh}; d2 = {abcdefgh, bcdefghi};
    // d3 = {zzzzzzzz} (9 chars, both windows identical) — only (1,2)
    // intersects: 1 · 10⁶ div (1 + 2 − 1) = 500000
    val docs = Seq(
      (1L, "abcdefgh"), (2L, "abcdefghi"), (3L, "zzzzzzzzz")
    ).toDF("doc_id", "text")
    val got = BandPlan.jaccardPairsPpm(docs).collect()
      .map(_.getLong(0)).toList
    assert(got == List(500000L), s"got $got")
  }

  test("q269 degenerate corpus: 5-row spine, vacuous recall, one chosen") {
    val s = spark
    import s.implicits._
    val got = BandPlan.bandPlanOn(Seq.empty[Long].toDF("jac_ppm"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(4),
        r.getBoolean(5))).toList
    assert(got.map(x => (x._1, x._2, x._3)) ==
      BandPlan.Plans.map(p => (p._1.toLong, 0L, 1000000L)).sortBy(_._1),
      s"got $got")
    // all plans tie on (qual, cost): bands desc breaks it
    assert(got.filter(_._4).map(_._1) == List(64L), s"got $got")
  }

  // ---- q270: LSH plane-count tuner --------------------------------

  test("q270 per-p stats equal direct p-plane bucketing (prefix property end-to-end)") {
    import graft.ops.Similarity
    val emb = Tables.embeddings(spark, sf)
    val rows = Similarity.planePlanOn(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toList
    for (p <- Seq(8, 12)) {
      // independent path: bucket directly with hyperplanes(p) — the
      // low-p-bit mask of the 20-plane bucket must give identical
      // occupancy (hyperplanes(p) is a prefix of hyperplanes(20))
      val direct = emb.select(Similarity.lshBucket(col("embedding"),
          Similarity.hyperplanes(p, 64)).as("b"))
        .groupBy(col("b")).agg(count(lit(1)).as("m"))
        .agg(count(lit(1)).cast("long").as("nb"),
          max(col("m")).cast("long").as("mx"),
          sum(col("m") * (col("m") - 1L)).cast("long").as("cp2"))
        .head()
      val got = rows.find(_._1 == p.toLong).get
      assert((got._2, got._3, got._4) ==
        ((direct.getLong(0), direct.getLong(1), direct.getLong(2) / 2)),
        s"p=$p: plan row $got vs direct $direct")
    }
  }

  test("q270 chosen == autoPlanes(N); occupancy refines monotonically") {
    import graft.ops.Similarity
    val emb = Tables.embeddings(spark, sf)
    val rows = Similarity.planePlanOn(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5))).toList
    assert(rows.map(_._1) == (8L to 20L).toList)
    val n = emb.count()
    assert(rows.filter(_._6).map(_._1) ==
      List(Similarity.autoPlanes(n).toLong), s"rows $rows")
    // refining a partition can only split buckets: candidate pairs
    // non-increasing, bucket count non-decreasing in p
    rows.sliding(2).foreach { case Seq(a, b) =>
      assert(b._4 <= a._4, s"cand_pairs grew $a -> $b")
      assert(b._2 >= a._2, s"n_buckets shrank $a -> $b")
    }
  }
}
