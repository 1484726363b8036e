package graft

import graft.ops.Layout
import org.apache.spark.sql.functions._

/** Z-order layout: the written files must be narrow in BOTH clustering
  * dimensions (that per-file min/max narrowness is exactly what parquet
  * file/row-group skipping prunes on), where a single-column sort is
  * narrow in one and full-width in the other. */
class LayoutSpec extends SparkSpec {

  private def perFileRanges(dir: String): Seq[(Long, Long)] = {
    val files = new java.io.File(dir).listFiles
      .filter(f => f.getName.startsWith("part-") &&
        f.getName.endsWith(".parquet"))
    assert(files.length > 1, s"expected multiple files in $dir")
    files.toSeq.map { f =>
      val r = spark.read.parquet(f.getAbsolutePath)
        .agg((max(col("l_partkey")) - min(col("l_partkey"))).as("pr"),
          (max(col("l_suppkey")) - min(col("l_suppkey"))).as("sr"))
        .head()
      (r.getLong(0), r.getLong(1))
    }
  }

  test("z-order write is narrow in both dims; plain sort is not") {
    // sf0.001 lineitem: l_partkey in [0,199], l_suppkey in [0,9]
    val li = Tables.lineitem(spark, sf).select(col("l_partkey"),
      col("l_suppkey"), col("l_orderkey"))
    val base = java.nio.file.Files.createTempDirectory("zord").toString

    Layout.zorderWrite(li, "l_partkey", "l_suppkey", s"$base/z", 16)
    li.repartitionByRange(16, col("l_partkey"))
      .sortWithinPartitions(col("l_partkey"))
      .write.mode("overwrite").parquet(s"$base/p")

    val zR = perFileRanges(s"$base/z")
    val pR = perFileRanges(s"$base/p")
    def avg(xs: Seq[Long]): Double = xs.sum.toDouble / xs.size

    // 16 files over a 2-D z-curve ~ a 4x4 grid: each dim ~1/4 width
    val zPart = avg(zR.map(_._1)); val zSupp = avg(zR.map(_._2))
    val pPart = avg(pR.map(_._1)); val pSupp = avg(pR.map(_._2))
    assert(zPart <= 100, s"z-order partkey file width $zPart > half-range")
    assert(zSupp <= 5, s"z-order suppkey file width $zSupp > half-range")
    // the single-key sort is tighter on its own key but full-width on
    // the other — the property z-order trades away and gains
    assert(pPart < zPart, s"plain sort should win its own dim ($pPart)")
    assert(pSupp > 2 * zSupp,
      s"plain sort suppkey width $pSupp should dwarf z-order $zSupp")

    // the rewrite is a permutation: same multiset back
    val in = li.agg(count(lit(1)), sum(col("l_orderkey")),
      sum(col("l_partkey"))).head()
    val out = spark.read.parquet(s"$base/z").agg(count(lit(1)),
      sum(col("l_orderkey")), sum(col("l_partkey"))).head()
    assert(in == out, s"z-order write lost rows: $in vs $out")
  }

  test("interleave16 round-trip: adjacent z-cells share key locality") {
    // spread16(1)=1, spread16(2)=4, spread16(3)=5 — spot-check the
    // magic-number chain against hand-computed Morton codes
    import spark.implicits._
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (2L, 3L),
      (65535L, 65535L)).toDF("a", "b")
      .select(Layout.interleave16(col("a"), col("b")).as("z"))
    val got = df.collect().map(_.getLong(0)).toSeq
    // z(a,b) with a in even bits: (0,0)=0 (1,0)=1 (0,1)=2 (1,1)=3
    // (2,3)= spread(2)|spread(3)<<1 = 4 | 5<<1 = 14; max = 2^32-1
    assert(got == Seq(0L, 1L, 2L, 3L, 14L, 4294967295L), s"got $got")
  }

  test("training-shard export round-trips: written files match the manifest") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    val out = java.nio.file.Files.createTempDirectory("graft_shards").toString
    val nShards = 8
    val written = Layout.exportTrainingShards(docs, s"$out/s", nShards)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val planned = Layout.shardManifest(docs, nShards)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // the manifest computed from the WRITTEN files equals the planned
    // assignment — nothing lost, duplicated, or misrouted in the write
    assert(written == planned, s"diverging shards: ${
      (written.keySet ++ planned.keySet)
        .filter(k => written.get(k) != planned.get(k))}")
    assert(written.values.map(_._1).sum == docs.count())
    assert(written.size == nShards, "uniform-ish hash left a shard empty")
    // every row in a shard directory actually belongs there
    val misrouted = spark.read.parquet(s"$out/s")
      .filter(pmod(graft.ops.Sampling.idBucket(col("doc_id")),
        lit(nShards.toLong)) =!= col("shard").cast("long")).count()
    assert(misrouted == 0)
  }
}
