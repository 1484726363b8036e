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
