package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic sampling for dataset mixing — the training-data
  * primitive behind "x% of source A, y% of source B" corpus recipes.
  *
  * The keep decision is a pure arithmetic function of the row id
  * (multiplicative hash mod a prime), NOT rand(): task retries and
  * AQE re-planning cannot change the sample, reruns are reproducible
  * across engines (the DuckDB oracle replays the same arithmetic),
  * and the sample is stable under corpus growth — adding documents
  * never flips the decision for existing ids. At scale this is a
  * stateless narrow filter: no shuffle, no driver state, pushdown-
  * friendly.
  */
object Sampling {

  /** Modulus (prime) and multiplier for the id mixer. The double-mod
    * keeps every intermediate below 2^63 for any nonnegative id. */
  val Prime = 1000003L
  val Mult = 2654435761L // Knuth's 2^32 / phi

  /** Uniform-ish bucket in [0, Prime) from a nonnegative integer id —
    * plain integer arithmetic so any engine reproduces it. */
  def idBucket(id: Column): Column = pmod(pmod(id, lit(Prime)) * Mult, lit(Prime))

  /** SQL text of the same bucket (for oracles / SQL users). */
  def idBucketSql(idExpr: String): String =
    s"(($idExpr % $Prime) * $Mult) % $Prime"

  /** Keep a per-stratum fraction of rows: row kept iff its id bucket
    * falls below rate * Prime for its stratum's rate. */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
      rates: Map[String, Double], defaultRate: Double): DataFrame = {
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (k, r)) =>
      when(col(strataCol) === k, lit(r)).otherwise(acc)
    }
    df.filter(idBucket(col(idCol)).cast("double") < rate * Prime)
  }

  /** Query entry: language-stratified document sample (half the
    * English docs, a quarter of German, 10% of the rest) with the keep
    * bucket exposed for auditability. */
  def stratifiedDocSample(spark: SparkSession, dir: String): DataFrame =
    stratifiedSample(Tables.documents(spark, dir), "doc_id", "lang",
      Map("en" -> 0.5, "de" -> 0.25), defaultRate = 0.1)
      .select(col("doc_id"), col("lang"),
        idBucket(col("doc_id")).as("keep_bucket"))
      .orderBy(col("doc_id"), col("lang"), col("keep_bucket"))
}
