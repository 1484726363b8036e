package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication family for a training-data pipeline (SURVEY.md §2B
  * [ext]): exact (content-hash groupBy), MinHash+LSH, SimHash — all
  * built so that NO stage ever materializes the all-pairs cross
  * product. At 100 TB the only admissible shapes are per-row maps,
  * key-partitioned shuffles on hash buckets, and joins restricted to
  * bucket-collision candidates.
  */
object Dedup {

  // ---------------------------------------------------------------- exact

  /** Exact dedup via sha2(text) groupBy: one representative (min
    * doc_id) per distinct content. Hash-groupBy shuffles 32-byte
    * digests, not documents. */
  def exactDedup(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(sha2(col("text"), 256).as("content_hash"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .select(col("keep_id"), col("n_copies"), col("content_hash"))
      .orderBy(col("keep_id"))

  // -------------------------------------------------------------- minhash

  val NumHashes = 64
  val Bands = 16
  val RowsPerBand: Int = NumHashes / Bands
  val ShingleLen = 8

  /** Distinct 8-char shingle hashes per document. */
  def shingles(df: DataFrame, textCol: String = "text"): DataFrame =
    df.withColumn("sh",
      expr(s"array_distinct(transform(sequence(1, greatest(length($textCol) - ${ShingleLen - 1}, 1)), " +
        s"i -> xxhash64(substr($textCol, i, $ShingleLen))))"))

  /** 64-element MinHash signature: permutation j is xxhash64(h, j) —
    * re-hashing beats (a*x+b) mod p because 64-bit multiply overflow
    * never corrupts the math and it stays one codegen'd expression. */
  def minHashSignatures(df: DataFrame): DataFrame =
    shingles(df).withColumn("sig",
      array((0 until NumHashes).map(j =>
        array_min(transform(col("sh"), h => xxhash64(h, lit(j))))): _*))

  /** LSH candidate pairs: equal (band, band-hash) bucket → candidate.
    * The self-join runs on bucket keys only; with B bands of R rows a
    * pair collides with probability 1-(1-J^R)^B — the S-curve that
    * makes this sub-quadratic. */
  def lshCandidatePairs(sigs: DataFrame, idCol: String): DataFrame = {
    val banded = sigs.select(col(idCol), col("sh"),
      posexplode(array((0 until Bands).map(b =>
        hash(slice(col("sig"), b * RowsPerBand + 1, RowsPerBand), lit(b))): _*))
        .as(Seq("band_id", "band_hash")))
    val a = banded.select(col(idCol).as("doc_a"), col("sh").as("sh_a"),
      col("band_id"), col("band_hash"))
    val b = banded.select(col(idCol).as("doc_b"), col("sh").as("sh_b"),
      col("band_id"), col("band_hash"))
    a.join(b, Seq("band_id", "band_hash"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("sh_a"), col("sh_b"))
      .dropDuplicates("doc_a", "doc_b")
  }

  /** Candidates re-ranked by EXACT n-gram Jaccard (the standard
    * LSH-then-verify shape: estimate recalls, exact similarity
    * decides). */
  def nearDupPairs(df: DataFrame, idCol: String, minJaccard: Double): DataFrame =
    lshCandidatePairs(minHashSignatures(df), idCol)
      .withColumn("jaccard", round(
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double"), 6))
      .filter(col("jaccard") >= minJaccard)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))

  /** Query: top near-duplicate candidate pairs in documents. */
  def minhashNearDups(spark: SparkSession, dir: String): DataFrame =
    nearDupPairs(Tables.documents(spark, dir), "doc_id", 0.1)
      .orderBy(col("jaccard").desc, col("doc_a"), col("doc_b"))
      .limit(100)

  // -------------------------------------------------------------- simhash

  /** 64-bit SimHash over whitespace tokens: per-bit vote of token
    * hashes, assembled in one array-aggregate pass per doc. Written as
    * a SQL expression because the inner zip_with lambda must reference
    * the outer aggregate lambda's variable. */
  def simhashExpr(textCol: String): Column = {
    val counts =
      s"""aggregate(
         |  transform(split($textCol, ' '), t -> xxhash64(t)),
         |  array_repeat(0L, 64),
         |  (acc, h) -> zip_with(acc, sequence(0, 63),
         |    (a, i) -> a + CASE WHEN (h >> i) & 1 = 1 THEN 1 ELSE -1 END))""".stripMargin
    expr(
      s"""aggregate(
         |  zip_with($counts, sequence(0, 63),
         |    (c, i) -> CASE WHEN c >= 0 THEN shiftleft(1L, i) ELSE 0L END),
         |  0L, (acc, b) -> acc | b)""".stripMargin)
  }

  /** Per-document simhash + its 4×16-bit bands (the hamming-LSH keys). */
  def simhashFingerprints(spark: SparkSession, dir: String): DataFrame = {
    val withSim = Tables.documents(spark, dir)
      .select(col("doc_id"), simhashExpr("text").as("simhash"))
    (0 until 4).foldLeft(withSim) { (df, c) =>
      df.withColumn(s"band_$c",
        shiftrightunsigned(col("simhash"), c * 16).bitwiseAND(lit(0xFFFFL)))
    }.orderBy(col("doc_id"))
  }

  /** SimHash near-dups: docs sharing any 16-bit band (pigeonhole: any
    * pair within hamming distance 3 shares at least one of 4 bands),
    * verified by exact popcount. Bucket-join only — no all-pairs. */
  def simhashNearDups(df: DataFrame, idCol: String, maxHamming: Int): DataFrame = {
    val sims = df.select(col(idCol), simhashExpr("text").as("simhash"))
    val banded = sims.select(col(idCol), col("simhash"),
      posexplode(array((0 until 4).map(c =>
        shiftrightunsigned(col("simhash"), c * 16).bitwiseAND(lit(0xFFFFL))): _*))
        .as(Seq("band_id", "band_val")))
    val a = banded.select(col(idCol).as("doc_a"), col("simhash").as("sim_a"),
      col("band_id"), col("band_val"))
    val b = banded.select(col(idCol).as("doc_b"), col("simhash").as("sim_b"),
      col("band_id"), col("band_val"))
    a.join(b, Seq("band_id", "band_val"))
      .filter(col("doc_a") < col("doc_b"))
      .dropDuplicates("doc_a", "doc_b")
      .withColumn("hamming",
        bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
  }
}
