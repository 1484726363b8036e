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
      val leafBytes = p.collect {
        case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          l.stats.sizeInBytes
        case c: org.apache.spark.sql.execution.columnar.InMemoryRelation =>
          c.stats.sizeInBytes
      }
      if (leafBytes.nonEmpty) leafBytes.sum / bytesPerRow
      else BigInt(Long.MaxValue)
    }
  }

  /** Summed leaf bytes (file + cache relations) of `df`'s optimized
    * plan; Long.MaxValue when no leaf is measurable. */
  def leafBytes(df: DataFrame): BigInt = {
    val bs = df.queryExecution.optimizedPlan.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        l.stats.sizeInBytes
      case c: org.apache.spark.sql.execution.columnar.InMemoryRelation =>
        c.stats.sizeInBytes
    }
    if (bs.nonEmpty) bs.sum else BigInt(Long.MaxValue)
  }
}
