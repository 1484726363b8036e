package graft

import graft.ops.{Grouping, SetOps}
import org.apache.spark.sql.functions._

class OpsSpec extends SparkSpec {
  import spark.implicits._

  test("set ops partition correctly: union = intersect + both excepts") {
    val u = SetOps.unionBuyers(spark, sf).count()
    val i = SetOps.intersectBuyers(spark, sf).count()
    val fNotO = SetOps.exceptBuyers(spark, sf).count()
    val all = SetOps.unionBuyers(spark, sf)
    // |F ∪ O| = |F ∩ O| + |F \ O| + |O \ F|
    val oNotF = u - i - fNotO
    assert(oNotF >= 0 && i + fNotO + oNotF == u)
    assert(all.count() == all.distinct().count())
  }

  test("unionAll keeps duplicates, intersectAll/exceptAll multiset") {
    val a = Seq(1, 1, 2, 3).toDF("x")
    val b = Seq(1, 2, 2).toDF("x")
    assert(a.union(b).count() == 7)
    assert(a.intersectAll(b).count() == 2)      // {1, 2}
    assert(a.exceptAll(b).count() == 2)         // {1, 3}
    assert(a.intersect(b).count() == 2)         // distinct {1, 2}
  }

  test("rollup has per-group, subtotal, and grand-total rows") {
    val rows = Grouping.rollupPricing(spark, sf).collect()
    val grand = rows.filter(r => r.getAs[Long]("g_rf") == 1)
    assert(grand.length == 1)
    val totalN = grand.head.getAs[Long]("n")
    assert(totalN == Tables.lineitem(spark, sf).count())
    // cube adds the linestatus-only subtotals rollup lacks
    assert(Grouping.cubePricing(spark, sf).count() > rows.length)
  }

  test("HLL sketch rollup estimates match exact distinct users per type") {
    val est = Grouping.hllSketchRollup(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.events(spark, sf)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (t, n) =>
      assert(math.abs(est(t) - n).toDouble / n < 0.05,
        s"$t: est=${est(t)} exact=$n")
    }
  }

  test("approx_count_distinct within 5% of exact (HLL scale path)") {
    val li = Tables.lineitem(spark, sf)
    val exact = li.select(countDistinct(col("l_partkey"))).head().getLong(0)
    val approx = li.select(approx_count_distinct(col("l_partkey"), 0.02))
      .head().getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"approx=$approx exact=$exact")
  }

  test("stratified sample: deterministic, near-rate, stable under growth") {
    import graft.ops.Sampling
    val docs = Tables.documents(spark, sf)
    val rates = Map("en" -> 0.5, "de" -> 0.25)
    def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.select("doc_id").collect().map(_.getLong(0)).toSet
    val s1 = ids(Sampling.stratifiedSample(docs, "doc_id", "lang", rates, 0.1))
    val s2 = ids(Sampling.stratifiedSample(docs, "doc_id", "lang", rates, 0.1))
    assert(s1 == s2, "sample not deterministic across runs")
    // per-stratum rate lands near target (loose: n_en ~ 193 at sf0.001)
    val en = docs.filter(col("lang") === "en")
    val enKept = Sampling.stratifiedSample(en, "doc_id", "lang", rates, 0.1).count()
    val enRate = enKept.toDouble / en.count()
    assert(math.abs(enRate - 0.5) < 0.15, s"en rate $enRate far from 0.5")
    // growth stability: sampling a subset = subset of the full sample
    val subset = docs.filter(col("doc_id") < 250)
    val subsetSample = ids(Sampling.stratifiedSample(subset, "doc_id", "lang", rates, 0.1))
    assert(subsetSample == s1.filter(_ < 250), "keep decision not id-stable")
  }
}
