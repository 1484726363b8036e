package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities (SURVEY.md §4 / SCALE.md). AQE's skew-join
  * handling covers most cases at runtime; these are the explicit forms
  * for when a key is known-degenerate (one user with 10^9 events, one
  * null-heavy join key).
  */
object Skew {

  /** Two-phase (salted) aggregation: partial-aggregate on
    * (key, salt) — spreading a hot key over `saltBuckets` reducers —
    * then final-aggregate on key. Salt is derived from a secondary
    * column (deterministic, no rand()) so results are reproducible.
    *
    * Only algebraic aggregates decompose this way; this helper takes
    * the partial and final expressions explicitly. */
  def saltedSum(df: DataFrame, key: Column, salt: Column, value: Column,
      saltBuckets: Int = 16): DataFrame =
    df.withColumn("__salt", pmod(hash(salt), lit(saltBuckets)))
      .groupBy(key.as("k"), col("__salt"))
      .agg(sum(value).as("__partial"))
      .groupBy(col("k"))
      .agg(sum(col("__partial")).as("total"))

  /** Salted broadcast-free join for a skewed fact key: replicate the
    * (small) right side `saltBuckets` times, salt the fact rows
    * deterministically, join on (key, salt). Each hot-key's rows spread
    * across `saltBuckets` tasks instead of one. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      saltBuckets: Int = 16): DataFrame = {
    // salt from the full row content — a nondeterministic source
    // (monotonically_increasing_id, rand) feeding a shuffle key can
    // duplicate/lose rows on task retry (recomputed rows land in
    // different reduce partitions than already-fetched copies)
    val saltedFact = fact.withColumn("__salt",
      pmod(hash(fact.columns.map(col): _*), lit(saltBuckets)))
    val replicatedDim = dim.withColumn("__salt",
      explode(array((0 until saltBuckets).map(lit): _*)))
    saltedFact.join(replicatedDim, Seq(key, "__salt")).drop("__salt")
  }
}
