package graft

import graft.ops.{Layout, Sampling}
import org.apache.spark.sql.functions._

/** Round-8 scale-swap rules as code (the autoK precedent, VERDICT r7
  * #3): each documented-deferred swap is now an executable branch, and
  * these specs prove the scale branch produces the SAME verdicts as
  * the test-scale branch on real data — the property that makes the
  * swap safe to flip at 100 TB. */
class Round8OpsSpec extends SparkSpec {

  test("q157 sharded padding rank equals the global rank run per shard") {
    // nShards = 2 must equal: split docs by the q153 shard key, run
    // the GLOBAL form on each half, relabel. Proves the shard
    // parameter only localizes the window — batch composition within
    // a shard is untouched.
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    val sharded = Layout.paddingWasteDocs(docs, batchSize = 8, nShards = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    val manual = (0 to 1).flatMap { s =>
      val half = docs.filter(
        pmod(Sampling.idBucket(col("doc_id")), lit(2L)) === s.toLong)
      Layout.paddingWasteDocs(half, batchSize = 8).collect()
        .map(r => (s.toLong, r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5)))
    }.toSet
    assert(sharded.nonEmpty, "fixture produced no batches")
    assert(sharded == manual,
      s"sharded-only: ${(sharded -- manual).take(3)}; " +
        s"manual-only: ${(manual -- sharded).take(3)}")
  }

  test("q171 cluster split: no near-dup cluster ever straddles splits") {
    // the defining property — the one q89's content-hash split cannot
    // give: EVERY member of a near-dup cluster carries the same split,
    // so a val doc can never have a train-side near-copy
    val rows = Sampling.clusterSplit(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(3)))
    val byCluster = rows.groupBy(_._2)
    byCluster.foreach { case (c, members) =>
      assert(members.map(_._3).distinct.size == 1,
        s"cluster $c straddles splits: ${members.map(_._3).distinct}")
    }
    assert(rows.map(_._3).distinct.size >= 2,
      "fixture must produce at least two splits")
    assert(byCluster.exists(_._2.size > 1),
      "fixture must contain a real multi-member cluster")
  }

  test("q172 terciles are balanced within one doc per source") {
    val rows = graft.ops.Ranking.fluencyTerciles(spark, sf).collect()
      .map(r => (r.getString(1), r.getString(3)))
    try rows.groupBy(_._1).foreach { case (src, members) =>
      val counts = members.groupBy(_._2).view.mapValues(_.size)
      val sizes = Seq("head", "middle", "tail").map(b => counts.getOrElse(b, 0))
      assert(sizes.max - sizes.min <= 1,
        s"source $src terciles unbalanced: $sizes")
    } finally graft.ops.Dedup.unpersistCaches()
  }

  test("q174 SQ error bound: every element error is at most half a code step") {
    // one int8-ish code spans 1e6/255 ≈ 3921.6 micro-units; round-to-
    // nearest-code keeps every per-element error within half a step
    // (+1 for the two roundings). A vector violating the bound means
    // the quantizer is not round-to-nearest — the audit's whole point.
    val rows = graft.ops.Similarity.sqErrorAudit(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) <= 1000000L / 255 / 2 + 2,
        s"vec ${r.getLong(0)} max_err_mu=${r.getLong(1)} exceeds half a code step")
    }
  }

  test("q175 epoch arithmetic: ceil division replayed driver-side") {
    val rows = graft.ops.TextAnalysis.epochBudget(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val uniq = r.getLong(4); val epochs = r.getLong(5)
      assert(epochs == (200000L + uniq - 1) / uniq,
        s"${r.getString(0)}: epochs $epochs != ceil(200000/$uniq)")
      assert(r.getBoolean(6) == (epochs > 4))
      assert(r.getLong(2) >= uniq, "total tokens below unique tokens")
    }
  }

  test("q176 quantile contract: sketch median lands inside the exact rank bounds") {
    val rows = graft.ops.Grouping.quantileContract(spark, sf).collect()
    assert(rows.length == 5, "five order priorities")
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(3), "lo bound above hi bound")
      assert(r.getBoolean(4),
        s"${r.getString(0)}: percentile_approx left its rank-error envelope")
    }
  }

  test("q177 forward as-of: planted window picks the first in-window match") {
    import spark.implicits._
    // click at t=100: purchases at 90 (before, ignored), 150 and 200
    // (in window) -> match 150. click at t=1000: only purchase at
    // 1000 + tol + 1 -> beyond tolerance, null. click at t=5000 with
    // a purchase at exactly t=5000 -> inclusive match. Ties: two
    // purchases at 150 (ids 71, 72) -> min id 71 wins.
    val clicks = Seq((1L, 10L, 100L), (2L, 10L, 1000L), (3L, 20L, 5000L))
      .toDF("click_id", "user_id", "click_tsm")
    val purchases = Seq(
      (10L, 90L, 70L), (10L, 150L, 72L), (10L, 150L, 71L),
      (10L, 200L, 73L), (10L, 1501L, 74L), (20L, 5000L, 80L))
      .toDF("user_id", "p_tsm", "event_id")
    val out = graft.ops.AsOf.joinForward(clicks, purchases, Seq("user_id"),
        "click_tsm", "p_tsm", Seq("event_id", "p_tsm"), "event_id",
        toleranceUs = 500L)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    assert(out(1L) == 71L, s"click 1 must match purchase 71: $out")
    assert(out(2L) == -1L, "click 2's only purchase is beyond tolerance")
    assert(out(3L) == 80L, "simultaneous purchase is an inclusive match")
  }

  test("q178 interval union: planted overlaps merge into exact spans") {
    import spark.implicits._
    // user 1: [0,10],[5,20],[30,40] -> 2 spans, covered 20+10 = 30;
    // touching intervals chain ([30,40],[40,45] share a boundary ->
    // s=40 is NOT > maxEnd=40, same span); user 2: disjoint singles
    val iv = Seq((1L, 0L, 10L), (1L, 5L, 20L), (1L, 30L, 40L),
      (1L, 40L, 45L), (2L, 0L, 1L), (2L, 10L, 11L))
      .toDF("user_id", "s", "e")
    val out = graft.ops.TimeSeries.intervalUnionOf(iv).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(1L) == ((2L, 35L)),
      s"user 1: expected 2 spans covering 35, got ${out(1L)}")
    assert(out(2L) == ((2L, 2L)),
      s"user 2: expected 2 unit spans, got ${out(2L)}")
  }

  test("q146 bin-walk rank (forced) selects exactly the one-phase set") {
    // binWalkMinDocs = 0 forces the q100 two-phase branch; its sel
    // verdicts must be IDENTICAL to the one-phase global window —
    // bins partition the (score desc, doc_id) order, so the boundary
    // bin's exact rank plus the cumulative walk reproduces the global
    // rank bit-for-bit.
    val docs = Tables.documents(spark, sf)
    def verdicts(minDocs: Long) = {
      graft.ops.Dedup.unpersistCaches()
      Sampling.dsirAffinitySelectOn(docs, binWalkMinDocs = minDocs)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getBoolean(3))).toSet
    }
    val onePhase = verdicts(Long.MaxValue)
    val binWalk = verdicts(0L)
    assert(onePhase.exists(_._4) && onePhase.exists(!_._4),
      "fixture must exercise both verdicts")
    assert(binWalk == onePhase,
      s"bin-walk-only: ${(binWalk -- onePhase).take(3)}; " +
        s"one-phase-only: ${(onePhase -- binWalk).take(3)}")
  }
}
