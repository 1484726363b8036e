package graft

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

/** Bucketed-layout demonstration (SCALE.md "Joins"): pre-bucketing both
  * fact tables by the join key eliminates the per-query shuffle — the
  * concrete 100 TB co-location strategy, proven on the local catalog. */
class BucketingSpec extends SparkSpec {

  /** Recursively delete a test temp dir so repeated runs don't
    * accumulate table copies under java.io.tmpdir. */
  private def rmTree(root: String): Unit = {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val p = Paths.get(root)
    if (Files.exists(p))
      Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(f => Files.deleteIfExists(f))
  }

  test("IVF persisted index: search probes are partition-pruned, recall holds") {
    import graft.ops.{Ivf, Similarity}
    val emb = Tables.embeddings(spark, sf)
    val out = java.nio.file.Files.createTempDirectory("graft_ivf").toString
    try {
    Ivf.writeIndex(Ivf.build(emb, k = 8), out)
    val idx = Ivf.readIndex(spark, out)
    assert(idx.centroids.length == 8)
    val q = emb.filter(col("vec_id") === 11).select("embedding")
      .head().getSeq[Float](0).toArray
    val probe = Ivf.search(idx, q, topK = 10, nProbe = 2)
    // the probe plan must prune the cell table scan to the probed cells
    val plan = probe.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(plan.contains("PartitionFilters: [cell"),
      s"probe not partition-pruned:\n${plan.take(900)}")
    assert(probe.collect().map(_.getLong(0)).contains(11L),
      "query's own vector not retrieved from the persisted index")
    // recall@nProbe=4 (half the cells) vs brute-force top-10
    val brute = emb.select(col("vec_id"),
        Similarity.cosine(col("embedding"), array(q.map(lit): _*)).as("c"))
      .orderBy(col("c").desc, col("vec_id")).limit(10)
      .collect().map(_.getLong(0)).toSet
    val wide = Ivf.search(idx, q, topK = 10, nProbe = 4)
      .collect().map(_.getLong(0)).toSet
    assert(brute.intersect(wide).size >= 4,
      s"recall@4 too low: ${brute.intersect(wide).size}/10")
    } finally rmTree(out)
  }

  test("dynamic partition pruning: a dim filter prunes the partitioned fact scan") {
    // the other half of the pruning story next to static
    // PartitionFilters: when the fact is partitioned by a join key and
    // the dim side carries a selective filter, Catalyst injects a
    // dynamicpruning subquery so only the dim-selected partitions of
    // the fact are read — at 100 TB this is the date/tenant-partition
    // mechanism that turns a full scan into a handful of directories
    val root = java.nio.file.Files.createTempDirectory("graft_dpp").toString
    try {
    Tables.orders(spark, sf)
      .write.mode("overwrite").partitionBy("o_orderstatus")
      .parquet(s"$root/orders_by_status")
    val fact = spark.read.parquet(s"$root/orders_by_status")
    import spark.implicits._
    // the dim must be a real source scan: a Seq-backed LocalRelation
    // gets constant-folded (ConvertToLocalRelation), the Filter node
    // vanishes, and the pruning rule no longer sees a selective
    // predicate to derive the subquery from
    Seq(("F", "finished"), ("O", "open"), ("P", "pending"))
      .toDF("status", "label")
      .write.mode("overwrite").parquet(s"$root/status_dim")
    val dim = spark.read.parquet(s"$root/status_dim")
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio", "10.0")
    try {
      val joined = fact
        .join(dim.filter(col("label") === "finished"),
          fact("o_orderstatus") === dim("status"))
        .groupBy(col("status")).agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution
        .explainString(ExplainMode.fromString("formatted"))
      assert(plan.contains("dynamicpruning"),
        s"no DPP subquery injected:\n${plan.take(1200)}")
      // and the pruned result is still the right answer
      val n = joined.head().getLong(1)
      val expected = Tables.orders(spark, sf)
        .filter(col("o_orderstatus") === "F").count()
      assert(n == expected, s"DPP changed the answer: $n vs $expected")
    } finally
      spark.conf.unset("spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio")
    } finally rmTree(root)
  }

  test("bucketed fact-fact join plans without an exchange on the join key") {
    // warehouse dir is static conf, set in TestSpark's builder
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Tables.lineitem(spark, sf).write.mode("overwrite")
        .bucketBy(4, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("li_bucketed")
      Tables.orders(spark, sf).write.mode("overwrite")
        .bucketBy(4, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("o_bucketed")

      val joined = spark.table("li_bucketed")
        .join(spark.table("o_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution
        .explainString(ExplainMode.fromString("simple"))
      // the join must not shuffle either side (bucket co-location); the
      // single allowed exchange is the final tiny groupBy repartition
      val exchanges = plan.sliding("Exchange".length).count(_ == "Exchange")
      assert(exchanges <= 1, s"bucketed join still shuffles ($exchanges):\n$plan")
      // and it still computes the right answer
      val n = joined.agg(sum("n")).head().getLong(0)
      assert(n == Tables.lineitem(spark, sf).join(
        Tables.orders(spark, sf),
        col("l_orderkey") === col("o_orderkey")).count())
    } finally {
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS o_bucketed")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("bucketed layout rebuilds when the source corpus is regenerated in place") {
    // round-5 lesson: the driver regenerated the testdata at the SAME
    // path, and a layout digest keyed on the path alone kept serving
    // the STALE facts. The digest now folds in a source fingerprint
    // (byte length + mtime), so an in-place regen must produce a new
    // layout whose row count tracks the new data.
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val corpus = Files.createTempDirectory("graft_regen").toString
    val root = Files.createTempDirectory("graft_regen_buckets").toString
    def cp(t: String): Unit = Files.copy(
      Paths.get(sf, s"$t.parquet"), Paths.get(corpus, s"$t.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    try {
      cp("lineitem"); cp("orders")
      val (li1, _) = Tables.bucketedFacts(spark, corpus, root)
      val n1 = li1.count()
      assert(n1 == Tables.lineitem(spark, sf).count())
      // regenerate in place: half the lineitem rows, same path
      val half = Tables.lineitem(spark, sf)
        .filter(col("l_orderkey") % 2 === 0)
      val staged = s"$corpus/_staged"
      half.coalesce(1).write.mode("overwrite").parquet(staged)
      Files.delete(Paths.get(corpus, "lineitem.parquet"))
      val part = Files.list(Paths.get(staged)).iterator()
      var moved = false
      while (part.hasNext) {
        val f = part.next()
        if (f.toString.endsWith(".parquet") && !moved) {
          Files.move(f, Paths.get(corpus, "lineitem.parquet")); moved = true
        }
      }
      assert(moved, "no staged parquet part to promote")
      val (li2, o2) = Tables.bucketedFacts(spark, corpus, root)
      assert(li2.count() == half.count(),
        "regenerated corpus still served the stale bucketed layout")
      assert(o2.count() == Tables.orders(spark, sf).count())
    } finally { rmTree(corpus); rmTree(root) }
  }
}
