package graft

import java.nio.file.Files
import java.sql.DriverManager
import java.util.Properties
import graft.etl.Transfer
import graft.pg.PgCatalog
import org.apache.spark.sql.functions._

/** Transfer + JDBC integration against embedded Derby (a real JDBC
  * database, standing in for PostgreSQL which isn't in this env). */
class TransferSpec extends SparkSpec {
  import spark.implicits._

  private val derbyUrl = "jdbc:derby:memory:graftdb;create=true"
  private val props = {
    val p = new Properties()
    p.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    p
  }

  test("parquet copy preserves the row multiset and honors exclusion") {
    val out = Files.createTempDirectory("graft_copy").toString
    val results = Transfer.copyTables(
      tables = Seq("nation", "region", "customer"),
      exclude = Set("region"),
      read = Tables(spark, sf, _),
      write = (t, df) => df.write.parquet(s"$out/$t.parquet"))
    assert(results.map(_.table) == Seq("nation", "customer"))
    assert(results.forall(_.ok))
    // multiset equality: except in both directions is empty
    val src = Tables.customer(spark, sf)
    val dst = spark.read.parquet(s"$out/customer.parquet")
    assert(src.exceptAll(dst).isEmpty && dst.exceptAll(src).isEmpty)
    assert(!new java.io.File(s"$out/region.parquet").exists())
  }

  test("partitioned write keeps the multiset for any partition count") {
    // the invariant the reference's unordered OFFSET paging violates
    val src = Tables.lineitem(spark, sf)
    for (n <- Seq(1, 3, 8)) {
      val out = Files.createTempDirectory(s"graft_p$n").toString
      src.repartition(n).write.mode("overwrite").parquet(out)
      val back = spark.read.parquet(out)
      assert(back.count() == src.count())
      assert(src.exceptAll(back).isEmpty && back.exceptAll(src).isEmpty)
    }
  }

  test("JDBC round trip: batched write then partitioned read (Derby)") {
    val src = Tables.nation(spark, sf)
    Transfer.writeJdbc(src, derbyUrl, "nation_t", props)
    val back = Transfer.readJdbcPartitioned(spark, derbyUrl, "nation_t",
      "n_nationkey", 0, 25, 4, props)
    assert(back.count() == src.count())
    assert(back.agg(sum("n_nationkey")).head().getLong(0) ==
      src.agg(sum("n_nationkey")).head().getLong(0))
  }

  test("catalog reflection over JDBC metadata (Derby)") {
    val conn = DriverManager.getConnection(derbyUrl)
    try {
      val st = conn.createStatement()
      st.executeUpdate(
        """CREATE TABLE APP.REFL_T (
          |  ID BIGINT NOT NULL GENERATED ALWAYS AS IDENTITY PRIMARY KEY,
          |  NAME VARCHAR(64) NOT NULL,
          |  BAL DOUBLE,
          |  CREATED TIMESTAMP)""".stripMargin)
      val meta = PgCatalog.tableMeta(conn, Some("APP"), "REFL_T")
      assert(meta.columns.map(_.name) == Seq("ID", "NAME", "BAL", "CREATED"))
      assert(meta.primaryKey == Seq("ID"))
      val byName = meta.columns.map(c => c.name -> c).toMap
      assert(byName("ID").serial && !byName("ID").nullable)
      assert(byName("ID").dataType == org.apache.spark.sql.types.LongType)
      assert(byName("BAL").dataType == org.apache.spark.sql.types.DoubleType)
      assert(byName("BAL").nullable)
      val tables = PgCatalog.listTables(conn, Some("APP"),
        exclude = Set("APP.NATION_T"))
      assert(tables.contains("REFL_T") && !tables.contains("NATION_T"))
    } finally conn.close()
  }

  test("atomicLoad publishes all-or-nothing through a staging table") {
    val conn = DriverManager.getConnection(derbyUrl)
    // Derby normalizes unquoted identifiers to uppercase; use uppercase
    // names so the quoted staging references resolve.
    conn.createStatement().executeUpdate(
      "CREATE TABLE ATOMIC_T (X BIGINT, Y VARCHAR(16))")
    conn.close()
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("X", "Y")
    Transfer.atomicLoad(df, derbyUrl, "ATOMIC_T", props,
      () => DriverManager.getConnection(derbyUrl))
    val back = spark.read.jdbc(derbyUrl, "ATOMIC_T", props)
    assert(back.count() == 3)
    // staging table is gone
    val c2 = DriverManager.getConnection(derbyUrl)
    val rs = c2.getMetaData.getTables(null, null, "ATOMIC_T_STAGING", null)
    assert(!rs.next()); c2.close()
  }

  test("atomicLoad retry after leftover staging rows publishes exactly once") {
    val conn = DriverManager.getConnection(derbyUrl)
    conn.createStatement().executeUpdate(
      "CREATE TABLE ATOMIC_R (X BIGINT)")
    // simulate a previous failed run that left partial staging rows
    conn.createStatement().executeUpdate(
      "CREATE TABLE ATOMIC_R_STAGING (X BIGINT)")
    conn.createStatement().executeUpdate(
      "INSERT INTO ATOMIC_R_STAGING VALUES (999)")
    conn.close()
    val df = Seq(1L, 2L).toDF("X")
    Transfer.atomicLoad(df, derbyUrl, "ATOMIC_R", props,
      () => DriverManager.getConnection(derbyUrl))
    val got = spark.read.jdbc(derbyUrl, "ATOMIC_R", props)
      .collect().map(_.getLong(0)).sorted
    assert(got.toSeq == Seq(1L, 2L), s"leftover staging rows published: ${got.toSeq}")
  }

  test("atomicLoad failure property: a mid-write abort never touches the target") {
    // the transactional-gap mitigation's actual contract: Spark's JDBC
    // writer commits per PARTITION, so a poisoned row aborts its task
    // only after sibling partitions already committed staging rows —
    // the target must still see zero of them, and a clean retry must
    // publish exactly its own rows (no leftovers from the failed run).
    // Seeded random poison position / partitioning, 3 rounds.
    import org.apache.spark.sql.functions.{col, lit, raise_error, when}
    val conn = DriverManager.getConnection(derbyUrl)
    conn.createStatement().executeUpdate(
      "CREATE TABLE ATOMIC_F (X BIGINT, Y VARCHAR(16))")
    conn.createStatement().executeUpdate(
      "INSERT INTO ATOMIC_F VALUES (100, 'pre'), (101, 'pre2')")
    conn.close()
    val pre = Set((100L, "pre"), (101L, "pre2"))
    def targetRows(): Set[(Long, String)] =
      spark.read.jdbc(derbyUrl, "ATOMIC_F", props)
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val rnd = new scala.util.Random(20260813L)
    (1 to 3).foreach { round =>
      val n = 20 + rnd.nextInt(30)
      val poison = 1L + rnd.nextInt(n)
      val parts = 2 + rnd.nextInt(6)
      val df = (1L to n.toLong).map(i => (i, s"v$i")).toDF("X", "Y")
        .repartition(parts)
        .withColumn("Y", when(col("X") === poison,
          raise_error(lit("poisoned row"))).otherwise(col("Y")))
      val e = intercept[Exception] {
        Transfer.atomicLoad(df, derbyUrl, "ATOMIC_F", props,
          () => DriverManager.getConnection(derbyUrl))
      }
      assert(targetRows() == pre,
        s"round $round (n=$n poison=$poison parts=$parts, ${e.getMessage
          .take(60)}): failed load leaked rows into the target")
    }
    // clean retry after the failures publishes exactly its rows
    Transfer.atomicLoad(Seq((1L, "a"), (2L, "b")).toDF("X", "Y"),
      derbyUrl, "ATOMIC_F", props,
      () => DriverManager.getConnection(derbyUrl))
    assert(targetRows() == pre + ((1L, "a")) + ((2L, "b")))
  }

  test("atomicLoad handles lowercase DataFrame columns (quoted staging)") {
    // Spark's JDBC writer creates staging columns QUOTED, so lowercase
    // frame names must be quoted on the SELECT side while the unquoted
    // target side case-normalizes — the common real-world shape, since
    // every table in this repo has lowercase columns
    val conn = DriverManager.getConnection(derbyUrl)
    conn.createStatement().executeUpdate(
      "CREATE TABLE ATOMIC_LC (ID BIGINT, NAME VARCHAR(16))")
    conn.close()
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "name")
    Transfer.atomicLoad(df, derbyUrl, "ATOMIC_LC", props,
      () => DriverManager.getConnection(derbyUrl))
    val back = spark.read.jdbc(derbyUrl, "ATOMIC_LC", props)
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted
    assert(back.toSeq == Seq((1L, "a"), (2L, "b")))
  }

  test("atomicLoad is column-order-safe against a reordered target") {
    val conn = DriverManager.getConnection(derbyUrl)
    // target DDL order (Y, X) differs from the DataFrame order (X, Y):
    // a positional INSERT .. SELECT * would mis-load or fail; the
    // explicit column lists must route values by name
    conn.createStatement().executeUpdate(
      "CREATE TABLE ATOMIC_O (Y VARCHAR(16), X BIGINT)")
    conn.close()
    val df = Seq((7L, "g"), (8L, "h")).toDF("X", "Y")
    Transfer.atomicLoad(df, derbyUrl, "ATOMIC_O", props,
      () => DriverManager.getConnection(derbyUrl))
    val back = spark.read.jdbc(derbyUrl, "ATOMIC_O", props)
      .collect().map(r => (r.getAs[Long]("X"), r.getAs[String]("Y"))).sorted
    assert(back.toSeq == Seq((7L, "g"), (8L, "h")))
  }

  test("round-trip checksum accepts an injected staging root (cluster path)") {
    val custom = java.nio.file.Files.createTempDirectory("graft_stage").toString
    val viaCustom = Transfer.roundTripChecksum(spark, sf, custom)
      .collect().map(_.toSeq).toSeq
    val viaDefault = Transfer.roundTripChecksum(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(viaCustom == viaDefault)
    // the staged copy under the custom root is cleaned up
    val leftovers = new java.io.File(custom).listFiles()
    assert(leftovers == null || leftovers.isEmpty,
      s"staging leak: ${leftovers.map(_.getName).toSeq}")
  }

  test("mergeUpsert: update wins, inserts new, keeps unmatched, honors NULL sets") {
    val target = Seq((1L, Option("a")), (2L, Option("b"))).toDF("k", "v")
    val updates = Seq((2L, None: Option[String]), (3L, Option("c"))).toDF("k", "v")
    val got = Transfer.mergeUpsert(target, updates, "k")
      .collect().map(r => (r.getLong(0), Option(r.getString(1)))).toSet
    // 1 carried over, 2 explicitly nulled by the update, 3 inserted
    assert(got == Set((1L, Option("a")), (2L, None), (3L, Option("c"))))
    // MERGE requires key-unique updates: duplicates fail fast instead
    // of silently fanning out matched rows
    val dups = Seq((2L, Option("x")), (2L, Option("y"))).toDF("k", "v")
    intercept[IllegalArgumentException] {
      Transfer.mergeUpsert(target, dups, "k")
    }
    // degenerate sides: empty updates = target unchanged; empty target
    // = pure insert
    val none = Seq.empty[(Long, Option[String])].toDF("k", "v")
    assert(Transfer.mergeUpsert(target, none, "k")
      .collect().map(_.getLong(0)).toSet == Set(1L, 2L))
    assert(Transfer.mergeUpsert(none, updates, "k")
      .collect().map(_.getLong(0)).toSet == Set(2L, 3L))
  }

  test("atomicLoad publishes into a Spark-created target (quoted columns)") {
    // a target created by Spark's own JDBC writer has an unquoted
    // (normalized) TABLE name but QUOTED case-preserved COLUMN names;
    // the publish resolves column names from target metadata
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "name")
    df.limit(0).write.jdbc(derbyUrl, "atomic_sp", props)
    Transfer.atomicLoad(df, derbyUrl, "atomic_sp", props,
      () => DriverManager.getConnection(derbyUrl))
    val back = spark.read.jdbc(derbyUrl, "atomic_sp", props)
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted
    assert(back.toSeq == Seq((1L, "a"), (2L, "b")))
  }

  test("JDBC scan pushes filters to the source database") {
    val df = Seq((1L, "a"), (50L, "b"), (99L, "c")).toDF("id", "name")
    df.write.mode("overwrite").jdbc(derbyUrl, "push_t", props)
    val filtered = spark.read.jdbc(derbyUrl, "push_t", props)
      .filter(col("id") > 10).select("id")
    val plan = filtered.queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // the predicate must reach the JDBC source (WHERE on the remote
    // query), not run as a post-scan Spark filter over a full dump
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan"),
      s"JDBC filter not pushed:\n${plan.take(800)}")
    assert(filtered.count() == 2)
  }

  test("JDBC DSv2 catalog pushes aggregate and limit to the database") {
    // the reference's row-count probe (transfer_data_script.py:102-104)
    // maps to DSv2 aggregate pushdown: COUNT/MAX run ON the database,
    // not as a full-table dump into Spark. The v1 reader
    // (spark.read.jdbc) never pushes aggregates — the DSv2 JDBCTableCatalog
    // path is the one that does, so that's the surface under test.
    val df = Seq((1L, "a"), (50L, "b"), (99L, "c")).toDF("id", "name")
    df.write.mode("overwrite").jdbc(derbyUrl, "push_agg_t", props)
    spark.conf.set("spark.sql.catalog.derbycat",
      "org.apache.spark.sql.execution.datasources.v2.jdbc.JDBCTableCatalog")
    spark.conf.set("spark.sql.catalog.derbycat.url", derbyUrl)
    spark.conf.set("spark.sql.catalog.derbycat.driver",
      "org.apache.derby.jdbc.EmbeddedDriver")
    spark.conf.set("spark.sql.catalog.derbycat.pushDownAggregate", "true")
    spark.conf.set("spark.sql.catalog.derbycat.pushDownLimit", "true")
    try {
      // Derby normalizes the unquoted v1-written name to upper case
      val agg = spark.sql(
        "SELECT COUNT(*) AS n, MAX(id) AS mx FROM derbycat.PUSH_AGG_T")
      val aggPlan = agg.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      assert(aggPlan.contains("PushedAggregates: [COUNT(*), MAX(id)]"),
        s"aggregate not pushed to Derby:\n${aggPlan.take(1200)}")
      val row = agg.head()
      assert(row.getLong(0) == 3L && row.getLong(1) == 99L)

      // LIMIT pushdown: the option is on, but Spark's DerbyDialect
      // reports supportsLimit=false (Derby SQL has FETCH FIRST, no
      // LIMIT clause), so the plan falls back to a Spark-side
      // CollectLimit over the v2 scan — correct, just not remote.
      // Against PostgreSQL the same option state yields "PushedLimit:
      // LIMIT n" (PostgresDialect supportsLimit=true); documented
      // dialect limitation, asserted against the option state here.
      assert(spark.conf.get("spark.sql.catalog.derbycat.pushDownLimit") == "true")
      val lim = spark.sql("SELECT id FROM derbycat.PUSH_AGG_T LIMIT 2")
      val limPlan = lim.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      assert(limPlan.contains("CollectLimit") || limPlan.contains("PushedLimit"),
        s"limit neither pushed nor applied:\n${limPlan.take(1200)}")
      assert(lim.count() == 2)
    } finally {
      spark.conf.unset("spark.sql.catalog.derbycat")
      spark.conf.unset("spark.sql.catalog.derbycat.url")
      spark.conf.unset("spark.sql.catalog.derbycat.driver")
      spark.conf.unset("spark.sql.catalog.derbycat.pushDownAggregate")
      spark.conf.unset("spark.sql.catalog.derbycat.pushDownLimit")
    }
  }

  test("migrate runs the three-phase topology end-to-end (DDL capture)") {
    val ddl = scala.collection.mutable.ArrayBuffer.empty[String]
    val metas = Seq(Fixtures.analyticsEvent)
    val data = Seq((1L, "e1"), (2L, "e2")).toDF("id", "name")
    val results = Transfer.migrate(metas, exclude = Set.empty,
      execDdl = ddl += _,
      read = _ => data,
      // the write contract: one Spark action over the given frame
      // (the observe() row count rides it)
      write = (_, d) => d.write.format("noop").mode("overwrite").save())
    assert(results.head.ok && results.head.rows == 2)
    // phase order: CREATE before ALTER..FOREIGN KEY before setval
    val createIdx = ddl.indexWhere(_.startsWith("CREATE TABLE"))
    val fkIdx = ddl.indexWhere(_.contains("FOREIGN KEY"))
    val seqIdx = ddl.indexWhere(_.contains("setval"))
    assert(createIdx >= 0 && fkIdx > createIdx && seqIdx > fkIdx)
    assert(ddl.count(_.contains("FOREIGN KEY")) == 3)
    assert(ddl.last.contains("setval"))
  }

  test("migrate reads each table once when the writer runs an action") {
    import graft.meta.{ColumnMeta, TableMeta}
    import org.apache.spark.sql.types.{LongType, VarcharType}
    // no serial column: phase 4 (sequence sync) has no second,
    // by-design read, so the accumulator isolates phase 2 exactly
    val meta = TableMeta(Some("public"), "plain_table",
      columns = Seq(ColumnMeta("id", LongType, nullable = false),
        ColumnMeta("name", VarcharType(16), nullable = true)))
    val acc = spark.sparkContext.longAccumulator("transfer_scans")
    val data = Seq((1L, "e1"), (2L, "e2")).toDS()
      .map { t => acc.add(1); t }.toDF("id", "name")
    val results = Transfer.migrate(Seq(meta), exclude = Set.empty,
      execDdl = _ => (),
      read = _ => data,
      write = (_, d) => d.write.format("noop").mode("overwrite").save())
    // the TransferResult count comes from the observe() node riding
    // the write action — 2 rows scanned ONCE, not re-counted
    assert(results.head.ok && results.head.rows == 2)
    assert(acc.value == 2L,
      s"expected one scan of 2 rows, saw ${acc.value} row-reads")
  }
}
