package graft

import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Window => LWindow}
import org.apache.spark.sql.functions._

/** VERDICT r12 #5: SCALE.md's "no unbounded global window" claim made
  * CHECKABLE. A `Window` with an empty partitionSpec funnels its whole
  * input through one task — fine when the input is bounded by
  * construction (a top-100 candidate frame, a ≤7-row funnel, a
  * verified-pair set), an OOM when it is corpus-sized (the round-12
  * ssi4 dictionary finding). This spec walks the OPTIMIZED logical
  * plan of every registered query at sf0.001 and fails on any global
  * window whose query is not in the allowlist below — each entry
  * carrying the boundedness argument. The planted-red test proves the
  * detector actually detects; the stale check proves the allowlist
  * can't outlive the windows it excuses.
  *
  * Global SORTS are deliberately out of scope: every oracle-checked
  * query ends in an orderBy over its (tiny, aggregate-shaped) output
  * by the determinism contract, and the one corpus-sized tail that
  * mattered was already converted to repartition(1)
  * .sortWithinPartitions (q126, round 4 — not a global Sort node). */
class GlobalWindowDisciplineSpec extends SparkSpec {

  /** query id -> why every global window in its plan is bounded.
    * The census (re-run every suite) walks every registered query's
    * optimized plan; in round 13 it flagged q248 (full-frame max over
    * the per-SUPPLIER aggregate — supplier count scales with the
    * corpus) and q116 (full-frame totals over the corpus/stride chunk
    * table), both FIXED to broadcast 1-row aggregates rather than
    * excused. The AllowlistSize (= 14) entries below are bounded by
    * domain or by a documented scale swap (ADVICE r13 #1: the count
    * is asserted against the map, so prose and code can't drift).
    * Every other global-window-looking site (q258's quartile cuts,
    * the RRF ranks, q65's cluster profile, …) either sits above a
    * limit the optimizer folds away or is partitioned. */
  private val AllowlistSize = 14
  private val boundedGlobalWindow: Map[String, String] = Map(
    "q92" -> ("funnel: lag over the 3-row stage frame (one row per" +
      " funnel stage — Behavior.scala documents the deliberate" +
      " driver-size sort)"),
    "q125" -> ("TVD drift: full-frame totals over the 5-row" +
      " o_orderpriority aggregate (priority domain has 5 values)"),
    "q217" -> ("Zipf decay: lag over log2-FREQUENCY bins — at most 63" +
      " rows by long bit length, whatever the corpus"),
    "q227" -> ("vocab growth: cumulative window over the 10-row" +
      " decile frame"),
    "q258" -> ("threshold sweep: quartile-cut windows over the" +
      " VERIFIED-pair frame — tiny by construction (only pairs above" +
      " t=0.6 survive the exact verify; sweepQuartiles documents the" +
      " single-partition choice)"),
    "q103" -> ("Benford: total over the 9-row first-digit aggregate" +
      " (digit domain is 1..9)"),
    "q104" -> ("contingency: totals over the returnflag×linestatus" +
      " grid (single-digit domain per axis)"),
    "q136" -> ("ABC classes: cumulative revenue share over the ≤25-row" +
      " NATION aggregate"),
    "q146" -> ("DSIR small-corpus branch guarded by the bin-walk" +
      " switch (Sampling.scala:714); above the switch the two-phase" +
      " histogram path runs and this window never sees the corpus"),
    "q157" -> ("padding waste: the DELIBERATE single-shard exposition" +
      " form — the per-shard branch is the documented executable" +
      " scale swap (q170 rides nShards=4; SCALE.md, oracle replays" +
      " both branches)"),
    "q164" -> ("RRF: both unpartitioned ranks sit above per-list" +
      " top-100 limits (TakeOrderedAndProject feeds them — the q164" +
      " plan pin in PlanShapeSpec)"),
    "q236" -> ("conversion latency: cum distribution over latency-" +
      "MINUTE histogram buckets — bounded by the observation window" +
      " in minutes, not by corpus size; PRICED (VERDICT r13 #7): a" +
      " 10-YEAR window is ~5.26M minute bins × 16 B = ~84 MB, a" +
      " sub-second single-task sort — the bound grows with deployment" +
      " AGE at 525.6k rows/year, never with corpus size or user count" +
      " (Behavior.conversionLatencyOn documents the same number)"),
    "q239" -> ("error burn: 7-day range window over the per-DAY" +
      " aggregate — calendar-bounded"),
    "q266" -> ("decontam screen: nearest-rank-p90 cum-walk over the" +
      " per-shared_ppm VALUE grid — bounded by the ppm domain" +
      " (≤ 1e6+1 rows) whatever the corpus (Decontaminate" +
      ".decontamScreenOn documents the q100-family choice)"))

  private def globalWindows(p: LogicalPlan): Seq[LWindow] =
    p.collect { case w: LWindow if w.partitionSpec.isEmpty => w }

  test("every global window in a registered query plan is allowlisted as bounded") {
    val offenders = scala.collection.mutable.ListBuffer[String]()
    val seen = scala.collection.mutable.Set[String]()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, f) =>
      val id = name.takeWhile(_ != '_')
      val gw = globalWindows(f(spark, sf).queryExecution.optimizedPlan)
      if (gw.nonEmpty) {
        seen += id
        if (!boundedGlobalWindow.contains(id))
          offenders += s"$name (${gw.size} global window(s))"
      }
      graft.ops.Dedup.unpersistCaches()
    }
    assert(offenders.isEmpty,
      "queries with a global (empty-partition) window and no documented" +
        s" boundedness argument: ${offenders.mkString(", ")}")
    val stale = (boundedGlobalWindow.keySet -- seen).toSeq.sorted
    assert(stale.isEmpty,
      s"allowlist entries whose queries no longer have a global window" +
        s" (remove them): ${stale.mkString(", ")}")
    assert(boundedGlobalWindow.size === AllowlistSize,
      "the allowlist grew or shrank — recount, update AllowlistSize AND" +
        " the census prose above so they can't drift apart")
  }

  test("the detector is red on a planted unbounded global window") {
    import org.apache.spark.sql.expressions.Window
    val planted = spark.range(100).toDF("x")
      .withColumn("rn", row_number().over(Window.orderBy(col("x"))))
    assert(globalWindows(planted.queryExecution.optimizedPlan).nonEmpty,
      "the detector failed to flag a textbook global window")
  }
}
