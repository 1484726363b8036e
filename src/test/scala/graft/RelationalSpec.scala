package graft

import graft.ops.{Flagship, Relational}

class RelationalSpec extends SparkSpec {

  test("every registered query runs and declares matching oracle columns") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty, s"$name has no columns")
      // all current queries are non-empty at sf0.001
      assert(df.limit(1).count() == 1, s"$name returned no rows")
    }
  }

  test("pricing summary has the 6 (returnflag, linestatus) groups") {
    val rows = Relational.pricingSummary(spark, sf).collect()
    assert(rows.length == 6)
    val total = rows.map(_.getAs[Long]("count_order")).sum
    assert(total > 3000 && total <= 6000,
      s"expected ~3.2k lineitems before the 1998-09-01 cutoff, got $total")
  }

  test("semi + anti join partition the customer set") {
    val c = Tables.customer(spark, sf).count()
    val semi = Relational.joinSemi(spark, sf).count()
    assert(semi <= c)
    // outer join covers every customer exactly once
    assert(Relational.joinOuter(spark, sf).count() == c)
  }

  test("flagship returns at most 3 customers per region, ranked") {
    val rows = Flagship.revenueTop3PerRegion(spark, sf).collect()
    val perRegion = rows.groupBy(_.getAs[String]("r_name"))
    assert(perRegion.values.forall(_.length <= 3))
    perRegion.values.foreach { rs =>
      assert(rs.map(_.getAs[Int]("rnk")).sorted.sameElements(1 to rs.length))
    }
  }

  test("entry flagship smoke: rows > 0") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("topk is deterministic under repartition") {
    val a = Relational.topkOrders(spark, sf).collect().toSeq
    val b = Relational.topkOrders(spark, sf).collect().toSeq
    assert(a == b)
  }
}
