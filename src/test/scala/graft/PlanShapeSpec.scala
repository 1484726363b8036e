package graft

import graft.ops.{Dedup, Relational, Similarity}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode

/** Physical-plan shape assertions — the 100 TB contract (SCALE.md):
  * filters/projections reach the scan, dims broadcast, top-k avoids a
  * global sort, similarity ops never plan a cartesian product. */
class PlanShapeSpec extends SparkSpec {

  private def plan(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("filter and projection push into the parquet scan") {
    val p = plan(Relational.scanProject(spark, sf))
    assert(p.contains("PushedFilters: [IsNotNull(l_orderkey), LessThan(l_orderkey,1000)]"),
      s"missing pushed filter:\n$p")
    // pruned read schema: only the 3 selected columns are read
    assert(p.contains("ReadSchema") &&
      p.contains("l_quantity") && !p.contains("l_extendedprice"))
  }

  test("dim joins plan as BroadcastHashJoin, not shuffle") {
    val p = plan(Relational.joinBroadcastDims(spark, sf))
    assert(p.contains("BroadcastHashJoin"), s"no broadcast join:\n$p")
  }

  test("global top-k plans TakeOrderedAndProject (no full sort)") {
    val p = plan(Relational.topkOrders(spark, sf))
    assert(p.contains("TakeOrderedAndProject"), s"no TakeOrdered:\n$p")
  }

  test("whole-stage codegen covers the pricing-summary pipeline") {
    // AQE hides codegen until the plan is finalized — execute, then
    // inspect the executed plan ("*(n)" marks codegen stages)
    val df = Relational.pricingSummary(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("*("), s"no codegen stage in executed plan:\n${p.take(800)}")
  }

  test("minhash LSH plans no cartesian product and no nested loop") {
    val p = plan(Dedup.nearDupPairs(Tables.documents(spark, sf), "doc_id", 0.8))
    assert(!p.contains("CartesianProduct"), s"cartesian in plan:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"nested loop in plan:\n$p")
  }

  test("minhash LSH shingles once: sig stages read cache, verify joins text") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    val df = Dedup.nearDupPairs(Tables.documents(spark, sf), "doc_id", 0.8)
    df.collect()
    // banding + estimate branches read the cached (id, sig) table —
    // the expensive shingling runs exactly once, inside the cache
    // build; the only direct file scans are the two exact-verify text
    // joins (shingled post-join, survivors only). Walk the executed
    // plan, descending into AQE stages but not the cached relation.
    var cacheScans = 0
    var fileScans = 0
    def walk(p: SparkPlan): Unit = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case _: InMemoryTableScanExec => cacheScans += 1
      case q: QueryStageExec => walk(q.plan)
      case f: FileSourceScanExec => fileScans += 1
      case other => other.children.foreach(walk)
    }
    walk(df.queryExecution.executedPlan)
    assert(fileScans <= 2, s"$fileScans file scans — signature work not shared")
    assert(cacheScans >= 4, s"only $cacheScans cache scans — signature table not reused")
  }

  test("brute-force cosine top-k broadcasts the single query row") {
    val p = plan(Similarity.cosineTopK(spark, sf))
    assert(p.contains("Broadcast"), s"query vector not broadcast:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"no TakeOrdered:\n$p")
  }

  test("q70 bucketed fact-fact join: zero exchange below the join") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    val df = Relational.joinBucketed(spark, sf)
    df.collect()
    // walk the executed plan (descending AQE stages): the sort-merge
    // join must sit directly on the bucketed scans — no shuffle at or
    // below it; the single allowed exchange is the final tiny groupBy
    var smj = 0
    var shufflesBelowJoin = 0
    var shufflesTotal = 0
    def walk(p: SparkPlan, below: Boolean): Unit = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan, below)
      case q: QueryStageExec => walk(q.plan, below)
      case j: SortMergeJoinExec =>
        smj += 1; j.children.foreach(walk(_, true))
      case s: ShuffleExchangeLike =>
        shufflesTotal += 1
        if (below) shufflesBelowJoin += 1
        s.children.foreach(walk(_, below))
      case other => other.children.foreach(walk(_, below))
    }
    walk(df.queryExecution.executedPlan, below = false)
    assert(smj == 1, s"expected one sort-merge join, saw $smj")
    assert(shufflesBelowJoin == 0,
      s"bucketed join still shuffles an input ($shufflesBelowJoin)")
    // post-join: one tiny groupBy exchange + the deterministic-output
    // orderBy's range exchange — both over the 3-row aggregate result
    assert(shufflesTotal <= 2,
      s"more than the groupBy+orderBy exchanges: $shufflesTotal")
  }

  test("theta join keeps the equi conjunct as the join key") {
    val p = plan(graft.ops.Grouping.joinTheta(spark, sf))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"theta join degenerated:\n$p")
  }
}
