package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-layout operators: Z-order (Morton) clustering for
  * multi-column scan pruning — the "OPTIMIZE ZORDER BY" capability of
  * lakehouse table formats, expressed as a plain Spark write.
  *
  * Why it matters at 100 TB: a parquet scan prunes files (and row
  * groups) whose min/max stats exclude the predicate. A layout sorted
  * by ONE key gives perfect pruning on that key and none on any other;
  * interleaving the bits of two keys gives every file a narrow range
  * in BOTH dimensions (~sqrt of the per-file fraction each), so
  * point/range predicates on either column skip most files. The write
  * is one range-repartition shuffle on the z-value — the same cost as
  * any clustered write.
  *
  * Everything here is exact integer arithmetic (shift/mask/div), so
  * the z-value computation replays bit-for-bit in DuckDB (q130).
  */
object Layout {

  /** Spread the low 16 bits of `c` to even bit positions (classic
    * magic-number bit spread; inputs stay < 2^32 so ANSI long
    * arithmetic cannot overflow). */
  def spread16(c: Column): Column = {
    val s1 = c.bitwiseOR(shiftleft(c, 8)).bitwiseAND(lit(16711935L))
    val s2 = s1.bitwiseOR(shiftleft(s1, 4)).bitwiseAND(lit(252645135L))
    val s3 = s2.bitwiseOR(shiftleft(s2, 2)).bitwiseAND(lit(858993459L))
    s3.bitwiseOR(shiftleft(s3, 1)).bitwiseAND(lit(1431655765L))
  }

  /** Morton-interleave two 16-bit values: a in even bits, b in odd. */
  def interleave16(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))

  /** Z-order-cluster `df` on two long columns and write parquet:
    * range-repartition by z-value (one shuffle; range boundaries from
    * Spark's reservoir sample) + sort within partitions so row-group
    * stats are narrow too. Bounds are computed from the data (one
    * 1-row aggregate broadcast). */
  def zorderWrite(df: DataFrame, c1: String, c2: String, out: String,
      numFiles: Int): Unit = {
    val b = df.agg(min(col(c1)).as("mn1"), max(col(c1)).as("mx1"),
      min(col(c2)).as("mn2"), max(col(c2)).as("mx2"))
    val z = df.crossJoin(broadcast(b))
      .withColumn("__z", interleave16(
        expr(s"(($c1 - mn1) * 65536) div (mx1 - mn1 + 1)"),
        expr(s"(($c2 - mn2) * 65536) div (mx2 - mn2 + 1)")))
      .drop("mn1", "mx1", "mn2", "mx2")
    z.repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(out)
  }

  /** Query (q130): the z-cell occupancy map of lineitem's
    * (l_partkey, l_suppkey) space — per 2^18-wide z-cell, the row
    * count and both keys' min/max extents. The narrow per-cell extents
    * ARE the pruning property the clustered write exploits; the map is
    * also what a layout advisor reads to pick the file count.
    * All integer shift/mask/div — replayed exactly in DuckDB. */
  def zorderCells(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_suppkey"))
    val b = li.agg(min(col("l_partkey")).as("mn1"),
      max(col("l_partkey")).as("mx1"),
      min(col("l_suppkey")).as("mn2"), max(col("l_suppkey")).as("mx2"))
    li.crossJoin(broadcast(b))
      .withColumn("z", interleave16(
        expr("((l_partkey - mn1) * 65536) div (mx1 - mn1 + 1)"),
        expr("((l_suppkey - mn2) * 65536) div (mx2 - mn2 + 1)")))
      .withColumn("z_cell", expr("z div 262144"))
      .groupBy(col("z_cell"))
      .agg(count(lit(1)).as("n"),
        min(col("l_partkey")).as("p_min"), max(col("l_partkey")).as("p_max"),
        min(col("l_suppkey")).as("s_min"), max(col("l_suppkey")).as("s_max"))
      .orderBy(col("z_cell"), col("n"), col("p_min"), col("p_max"),
        col("s_min"), col("s_max"))
  }

  /** Deterministic training-shard assignment + manifest (q147): each
    * document routes to shard `idBucket(doc_id) mod nShards` — the
    * Sampling hash, so assignment is a pure function of the id
    * (retry/AQE/growth-stable, the property a resumable training run
    * needs from its shards), and shard fill is uniform-ish regardless
    * of id clustering. The manifest row per shard carries the row
    * count, total text bytes, and an exact integer content digest
    * (sum of the FNV token hash folded to a prime residue — bounded,
    * no wraparound), which is what a training loader checks before
    * trusting a shard it resumes from.
    *
    * Scale shape: one narrow projection + one keyed aggregate;
    * [[exportTrainingShards]] adds the partitionBy write (one shuffle
    * on the shard key) and re-derives the manifest from the WRITTEN
    * files, so the spec's round-trip equality is a real end-to-end
    * integrity check, not a replay of the same lineage. */
  def shardManifest(docs: DataFrame, nShards: Int): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    docs.select(
        pmod(Sampling.idBucket(col("doc_id")), lit(nShards.toLong))
          .as("shard"),
        length(col("text")).cast("long").as("len"),
        expr(s"pmod(rolling_hash(text), ${Sampling.Prime}L)").as("h"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("len")).as("sum_len"),
        sum(col("h")).as("content_digest"))
      .orderBy(col("shard"), col("n_docs"), col("sum_len"),
        col("content_digest"))
  }

  /** Query entry (q147). */
  def shardManifestQuery(spark: SparkSession, dir: String,
      nShards: Int = 16): DataFrame =
    shardManifest(Tables.documents(spark, dir), nShards)

  /** DuckDB oracle for [[shardManifestQuery]]: same id mixer
    * (Sampling.idBucketSql), same FNV hash (HashSql replay, converted
    * to the SIGNED value first — Spark's pmod acts on the signed
    * long, and the prime modulus is not a power of two). */
  def shardManifestOracleSql(nShards: Int = 16): String = {
    val p = Sampling.Prime
    val fnv = graft.ops.HashSql.fnvSignedSql(
      "[ascii(substr(text, i, 1))::HUGEINT FOR i IN range(1, length(text)+1)]")
    s"""WITH d AS (
       |  SELECT ${Sampling.idBucketSql("doc_id")} % $nShards AS shard,
       |    length(text) AS len,
       |    (($fnv % $p) + $p) % $p AS h
       |  FROM documents)
       |SELECT CAST(shard AS BIGINT) AS shard,
       |  COUNT(*) AS n_docs, CAST(SUM(len) AS BIGINT) AS sum_len,
       |  CAST(SUM(h) AS BIGINT) AS content_digest
       |FROM d GROUP BY shard
       |ORDER BY shard, n_docs, sum_len, content_digest""".stripMargin
  }

  /** Write the sharded corpus (partitionBy the shard key: one hash
    * shuffle, one directory per shard) and return a manifest computed
    * from the files JUST WRITTEN. */
  def exportTrainingShards(docs: DataFrame, outDir: String,
      nShards: Int): DataFrame = {
    val spark = docs.sparkSession
    graft.functions.GraftFunctions.register(spark)
    docs.withColumn("shard",
        pmod(Sampling.idBucket(col("doc_id")), lit(nShards.toLong)))
      .repartition(col("shard"))
      .write.mode("overwrite").partitionBy("shard").parquet(outDir)
    spark.read.parquet(outDir)
      .groupBy(col("shard").cast("long").as("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(length(col("text")).cast("long")).as("sum_len"),
        sum(expr(s"pmod(rolling_hash(text), ${Sampling.Prime}L)"))
          .as("content_digest"))
      .orderBy(col("shard"))
  }
}
