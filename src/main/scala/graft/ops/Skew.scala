package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

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

  /** Join-key skew profile (q199): the pre-flight that DECIDES when
    * [[saltedSum]]/[[saltedJoin]]/AQE skew handling are worth paying —
    * for each candidate join key, the top-`topK` heaviest key values
    * with their corpus share (exact ppm) and an integer salt-bucket
    * recommendation `LEAST(32, cnt div avg_cnt)` (how many reducers
    * one hot key's rows should spread over; 1 = no salting needed).
    * All-integer arithmetic; `avg_cnt = total div n_keys` truncating
    * on both engines, so no float ratio crosses the hash compare.
    *
    * Scale shape: per key column, one map-side-combined count
    * aggregate over a two-column scan, a one-row stats rollup of the
    * (small) per-key table, and a TakeOrderedAndProject top-K — the
    * per-key table is persisted so its two consumers (stats + top-K)
    * never re-scan the fact. Nothing corpus-sized crosses an
    * unpartitioned window. */
  def keySkewProfile(spark: SparkSession, dir: String,
      topK: Int = 10): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    profileKey(li, "l_orderkey", topK)
      .unionByName(profileKey(li, "l_suppkey", topK))
      .orderBy(col("key_col"), col("cnt").desc, col("key_val"),
        col("share_ppm"), col("salt_buckets"))
  }

  /** Frame-based single-key core of [[keySkewProfile]]. */
  private[graft] def profileKey(fact: DataFrame, keyCol: String,
      topK: Int): DataFrame = {
    val counts = Dedup.register(
      fact.groupBy(col(keyCol).cast("long").as("key_val"))
        .agg(count(lit(1)).as("cnt"))
        .persist(StorageLevel.MEMORY_AND_DISK))
    val stats = counts.agg(count(lit(1)).as("n_keys"),
      sum(col("cnt")).as("total"))
    counts.crossJoin(broadcast(stats))
      .select(lit(keyCol).as("key_col"), col("key_val"), col("cnt"),
        expr("cnt * 1000000L div total").as("share_ppm"),
        least(lit(32L), greatest(lit(1L),
          expr("cnt div greatest(total div n_keys, 1L)")))
          .as("salt_buckets"))
      .orderBy(col("cnt").desc, col("key_val"))
      .limit(topK)
  }

  /** DuckDB oracle for [[keySkewProfile]]. */
  def keySkewProfileOracleSql(topK: Int = 10): String = {
    def branch(keyCol: String): String =
      s"""SELECT '$keyCol' AS key_col, key_val, cnt,
         |  CAST(cnt * 1000000 // total AS BIGINT) AS share_ppm,
         |  CAST(LEAST(32, GREATEST(1,
         |    cnt // GREATEST(total // n_keys, 1))) AS BIGINT)
         |    AS salt_buckets
         |FROM (
         |  SELECT CAST($keyCol AS BIGINT) AS key_val,
         |    CAST(COUNT(*) AS BIGINT) AS cnt,
         |    CAST(SUM(COUNT(*)) OVER () AS BIGINT) AS total,
         |    CAST(COUNT(*) OVER () AS BIGINT) AS n_keys
         |  FROM lineitem GROUP BY 1)
         |QUALIFY ROW_NUMBER() OVER (ORDER BY cnt DESC, key_val)
         |  <= $topK""".stripMargin
    s"""${branch("l_orderkey")}
       |UNION ALL
       |${branch("l_suppkey")}
       |ORDER BY key_col, cnt DESC, key_val, share_ppm,
       |  salt_buckets""".stripMargin
  }
}
