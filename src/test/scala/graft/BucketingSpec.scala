package graft

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

/** Bucketed-layout demonstration (SCALE.md "Joins"): pre-bucketing both
  * fact tables by the join key eliminates the per-query shuffle — the
  * concrete 100 TB co-location strategy, proven on the local catalog. */
class BucketingSpec extends SparkSpec {

  test("IVF cell table written partitioned-by-cell prunes probes to one partition") {
    import graft.ops.Ivf
    val idx = Ivf.build(Tables.embeddings(spark, sf), k = 8)
    val out = java.nio.file.Files.createTempDirectory("graft_ivf").toString
    idx.assigned.write.mode("overwrite").partitionBy("cell").parquet(out)
    val probe = spark.read.parquet(out).filter(col("cell") === 3)
    val plan = probe.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(plan.contains("PartitionFilters: [isnotnull(cell"),
      s"probe not partition-pruned:\n${plan.take(600)}")
    // pruned scan reads only cell 3's files
    assert(probe.count() ==
      idx.assigned.filter(col("cell") === 3).count())
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
}
