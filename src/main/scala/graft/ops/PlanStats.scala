package graft.ops

import org.apache.spark.sql.DataFrame

/** Zero-action size estimation from Catalyst plan statistics — the
  * round-7 rule (an eager sizing count()/agg costs a full job per
  * invocation; leaf file/cache sizes are free and honest). Scale
  * branches must derive their cutoff decisions from THESE, never from
  * an action. */
object PlanStats {

  /** Estimated row count of `df`: the optimized plan's rowCount when
    * the plan knows it, else summed leaf bytes over an assumed
    * `bytesPerRow` floor — a LOW floor OVERestimates rows, flipping
    * consumers to their scale branch early (the safe direction). A
    * plan with no measurable leaf estimates Long.MaxValue: unknown
    * size must select the scale-safe branch, never the
    * everything-in-one-task one. */
  def estRows(df: DataFrame, bytesPerRow: Long = 64L): BigInt = {
    val p = df.queryExecution.optimizedPlan
    p.stats.rowCount.getOrElse {
      val lb = leafBytes(df)
      if (lb == BigInt(Long.MaxValue)) lb else lb / bytesPerRow
    }
  }

  /** Summed leaf bytes of `df`'s optimized plan — EVERY LeafNode's
    * own stats (file relations report file size, InMemoryRelation its
    * cached size, LocalRelation its row data, DSv2 relations their
    * source estimate); a leaf with no real estimate reports the
    * session's defaultSizeInBytes (Long.MaxValue unless CBO tuned),
    * which saturates the sum and keeps the unknown-size =
    * scale-safe-branch contract. */
  def leafBytes(df: DataFrame): BigInt = {
    val bs = df.queryExecution.optimizedPlan.collect {
      case l: org.apache.spark.sql.catalyst.plans.logical.LeafNode =>
        l.stats.sizeInBytes
    }
    if (bs.isEmpty) BigInt(Long.MaxValue)
    else bs.sum.min(BigInt(Long.MaxValue))
  }
}
