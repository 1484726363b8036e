package graft.etl

import java.sql.Connection
import java.util.Properties
import scala.util.control.NonFatal
import graft.meta.TableMeta
import graft.pg.{PgCatalog, PgDdl, SequenceSync}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions.{coalesce, col, lag, lead, lit, round, struct, when}

/** Bulk table transfer (reference ops R3–R6, R11) — the reference's
  * core capability, re-expressed Spark-first.
  *
  * The reference reads each table with unordered OFFSET/LIMIT pages
  * (transfer_data_script.py:107-114) — O(R²/C) server work and rows can
  * be duplicated/dropped between pages — and writes one INSERT round
  * trip per row (:121-126). Here: a range-partitioned JDBC scan
  * (deterministic, one pass, N parallel readers) and Spark's batched
  * JDBC writer (`batchsize` rows per round trip, one writer per
  * partition). At cluster scale both sides parallelize with the
  * executor count; the database becomes the bottleneck, not the engine.
  *
  * Transactionality (SURVEY.md §7 risk 2): the reference commits per
  * table and can roll back (:136,141-143); Spark JDBC commits per
  * partition. [[atomicLoad]] restores all-or-nothing per table by
  * writing to a staging table and publishing with a single
  * INSERT..SELECT transaction on the driver.
  */
object Transfer {

  final case class TransferResult(table: String, rows: Long, ok: Boolean,
      error: Option[String] = None)

  /** R3 replacement: deterministic parallel range scan. */
  def readJdbcPartitioned(spark: SparkSession, url: String, table: String,
      partitionColumn: String, lowerBound: Long, upperBound: Long,
      numPartitions: Int, props: Properties): DataFrame =
    spark.read.jdbc(url, table, partitionColumn, lowerBound, upperBound,
      numPartitions, props)

  /** Single-partition read for small tables (still one pass, no OFFSET). */
  def readJdbc(spark: SparkSession, url: String, table: String,
      props: Properties): DataFrame =
    spark.read.jdbc(url, table, props)

  /** R5 replacement: batched append, one writer per partition.
    * batchsize=1000 matches the reference's chunk_size so measured
    * speedup is batching+parallelism, not bigger pages (BASELINE.md). */
  def writeJdbc(df: DataFrame, url: String, table: String,
      props: Properties, batchSize: Int = 1000): Unit =
    df.write.mode(SaveMode.Append)
      .option("batchsize", batchSize.toString)
      .jdbc(url, table, props)

  /** All-or-nothing publish: batched write into a staging table named
    * `<target>_staging` (dropped and rebuilt each run), then a single
    * transactional INSERT INTO target. The staging write can retry/fail
    * freely; the target only ever sees zero or all rows. */
  def atomicLoad(df: DataFrame, url: String, targetTable: String,
      props: Properties, connFactory: () => Connection,
      batchSize: Int = 1000): Unit = {
    // a pre-quoted target ("t", the convention for Spark-created
    // case-sensitive names) gets the suffix INSIDE the quotes
    val staging =
      if (targetTable.endsWith("\"")) targetTable.dropRight(1) + "_staging\""
      else targetTable + "_staging"
    // a previously failed run can leave partial rows in staging (the
    // staging write commits per partition); start from a clean slate or
    // the retry would publish leftovers + the new copy
    locally {
      val c = connFactory()
      try c.createStatement().executeUpdate(s"DROP TABLE $staging")
      catch { case NonFatal(_) => () } finally c.close()
    }
    writeJdbc(df, url, staging, props, batchSize)
    val conn = connFactory()
    try {
      conn.setAutoCommit(false)
      val st = conn.createStatement()
      // Explicit column list on both sides: SELECT * is positional, so
      // a target whose DDL order differs from the DataFrame's would
      // mis-load columns (or fail) after the staging write succeeded.
      // Quoting: Spark's JDBC writer creates the STAGING table with
      // QUOTED (case-preserved) column names, so the SELECT side
      // quotes the DataFrame names verbatim. The TARGET may have been
      // created by anyone (unquoted DDL → database-case-normalized, or
      // a previous Spark write → quoted as-is), so its names are
      // resolved case-insensitively from the table's own metadata and
      // quoted exactly as stored — both conventions publish correctly.
      def q(n: String) = "\"" + n.replace("\"", "\"\"") + "\""
      def columnsOf(pattern: String): Map[String, String] = {
        val m = scala.collection.mutable.Map.empty[String, String]
        val crs = conn.getMetaData.getColumns(null, null, pattern, "%")
        while (crs.next()) {
          val n = crs.getString("COLUMN_NAME")
          m(n.toLowerCase) = n
        }
        crs.close()
        m.toMap
      }
      // metadata lookup is case-sensitive while SQL references
      // case-normalize — try the name as given, then both foldings
      // (a Spark-created table stores an UNQUOTED normalized table
      // name but QUOTED case-preserved column names)
      val tableOnly =
        targetTable.split('.').last.stripPrefix("\"").stripSuffix("\"")
      val stored = Seq(tableOnly, tableOnly.toUpperCase, tableOnly.toLowerCase)
        .view.map(columnsOf).find(_.nonEmpty).getOrElse(Map.empty)
      // metadata miss (exotic qualified name): keep the pre-round-2
      // unquoted pass-through rather than guessing a quoting
      val targetCols =
        if (stored.isEmpty) df.schema.fieldNames.mkString(", ")
        else df.schema.fieldNames
          .map(n => q(stored.getOrElse(n.toLowerCase, n))).mkString(", ")
      val stagingCols = df.schema.fieldNames.map(q).mkString(", ")
      st.executeUpdate(
        s"INSERT INTO $targetTable ($targetCols) SELECT $stagingCols FROM $staging")
      st.executeUpdate(s"DROP TABLE $staging")
      conn.commit()
    } catch {
      case NonFatal(e) => conn.rollback(); throw e
    } finally conn.close()
  }

  /** Generic per-table copy with exclusion (R6) and per-table
    * error-isolation (R11: the reference logs and continues;
    * engine form returns a result report instead of throwing).
    *
    * `countRows=false` skips the per-table count: the count is a second
    * full scan of the SOURCE (for a JDBC source that doubles the load
    * on the database this module exists to protect) and can disagree
    * with the written rows if the source changes between scans —
    * callers wanting an exact written count should count the target. */
  def copyTables(tables: Seq[String], exclude: Set[String],
      read: String => DataFrame,
      write: (String, DataFrame) => Unit,
      countRows: Boolean = true): Seq[TransferResult] =
    tables.filterNot(exclude).map { t =>
      try {
        val df = read(t)
        write(t, df)
        TransferResult(t, if (countRows) df.count() else -1L, ok = true)
      } catch {
        case NonFatal(e) =>
          TransferResult(t, 0L, ok = false, Some(e.getMessage))
      }
    }

  /** Oracle-checked round-trip checksum (the reference's implied
    * source/target-equivalence oracle, SURVEY.md §5): transfer the
    * fact table through a partitioned write + read-back, then compute
    * a multiset checksum that must equal the same checksum computed
    * directly on the source. */
  def roundTripChecksum(spark: SparkSession, dir: String): DataFrame =
    roundTripChecksum(spark, dir,
      sys.env.getOrElse("SPARK_GRAFT_STAGING_DIR", sys.props("java.io.tmpdir")))

  /** Staging-root-parameterized form: `stagingRoot` may be any
    * Hadoop-FS path (local tmp by default; a distributed FS on a
    * cluster, where /tmp of one node is not visible to executors).
    * Cleanup goes through the Hadoop FileSystem API so both work. */
  def roundTripChecksum(spark: SparkSession, dir: String,
      stagingRoot: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val src = graft.Tables.lineitem(spark, dir)
    val tmp = s"$stagingRoot/graft_rt_${java.util.UUID.randomUUID().toString.take(8)}"
    src.repartition(8).write.mode(SaveMode.Overwrite).parquet(tmp)
    // materialize the checksum BEFORE deleting the staged copy (the
    // returned plan must not depend on the temp files), then clean up —
    // otherwise every Verify/Bench/Explain run leaks a full copy of the
    // fact table under the staging root
    val rows = spark.read.parquet(tmp).agg(
      count(lit(1)).as("n_rows"),
      sum(col("l_orderkey")).as("sum_okey"),
      sum(col("l_partkey") + col("l_suppkey")).as("sum_keys"),
      graft.ops.Det.exactSum(col("l_extendedprice")).as("sum_price"))
    val (schema, collected) = (rows.schema, rows.collect().toSeq)
    val p = new org.apache.hadoop.fs.Path(tmp)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(collected.asJava, schema)
  }

  /** Keyed upsert (SCD-1 merge): updates override matching target rows
    * by key, unmatched updates insert, unmatched target rows carry
    * over — MERGE semantics expressed as one full outer join with an
    * update-presence marker (so an update that explicitly sets a
    * column NULL still wins). Both sides must share the schema. One
    * shuffle on the key; at scale the key partitioning carries into
    * the output write, and a small update batch broadcasts.
    *
    * Like SQL MERGE, the updates must be key-unique — duplicates would
    * silently fan out matched target rows, so `validate=true`
    * (default) fails fast with one aggregation over the (small) update
    * batch; pass false only for pre-deduplicated feeds. */
  def mergeUpsert(target: DataFrame, updates: DataFrame,
      key: String, validate: Boolean = true): DataFrame = {
    if (validate) {
      val dup = updates.groupBy(col(key))
        .count().filter(col("count") > 1).limit(1).collect()
      require(dup.isEmpty,
        s"mergeUpsert: updates contain duplicate rows for key " +
          s"${dup.head.get(0)} — MERGE requires key-unique updates")
    }
    val dataCols = target.columns.filterNot(_ == key)
    val u = dataCols.foldLeft(updates) { (df, c) =>
      df.withColumnRenamed(c, s"__u_$c")
    }.withColumn("__u_present", lit(true))
    val joined = target.join(u, Seq(key), "full_outer")
    // a presence MARKER (not value-coalesce) decides the winner, so an
    // update that explicitly sets a column NULL still wins on a
    // matched row
    val updatePresent = coalesce(col("__u_present"), lit(false))
    joined.select(col(key) +: dataCols.map(c =>
      when(updatePresent, col(s"__u_$c")).otherwise(col(c)).as(c)): _*)
  }

  /** Query entry: upsert the mod-3 customer-key slice of orders (with
    * a recomputed price) into the mod-2 slice — overlapping key sets,
    * so matched-override, insert, and carry-over paths all execute. */
  def upsertQuery(spark: SparkSession, dir: String): DataFrame = {
    import graft.Tables
    val base = Tables.orders(spark, dir)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val target = base.filter(col("o_custkey") % 2 === 0)
    val updates = base.filter(col("o_custkey") % 3 === 0)
      .withColumn("o_totalprice", round(col("o_totalprice") * 2, 2))
    mergeUpsert(target, updates, "o_orderkey")
      .orderBy("o_orderkey", "o_custkey", "o_totalprice")
  }

  /** SCD-2 history build from a change log: one output row per
    * attribute *change* per key, with [valid_from, valid_to) validity
    * and an is_current marker on the open row — the history-preserving
    * half of the MERGE surface (q68/[[mergeUpsert]] is the overwrite
    * half). Rows are ordered within a key by (ts, tieBreak) so change
    * detection is deterministic even when a key has several changes at
    * one timestamp; consecutive duplicates (no attribute change) are
    * collapsed. Null-safe comparison (`<=>`) means an attribute
    * flipping to NULL still opens a new version.
    *
    * Scale shape: one shuffle on the key; both windows share the
    * (partitionBy, orderBy) so Catalyst plans a single Exchange+Sort
    * feeding two Window nodes — linear per partition, no join. */
  def scd2FromChangeLog(changes: DataFrame, key: String, ts: String,
      tieBreak: String, attrs: Seq[String]): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(ts), col(tieBreak))
    val attrStruct = struct(attrs.map(col): _*)
    changes
      .withColumn("__prev", lag(attrStruct, 1).over(w))
      .filter(col("__prev").isNull || !(col("__prev") <=> attrStruct))
      .withColumn("valid_from", col(ts))
      .withColumn("valid_to", lead(col(ts), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .select(col(key) +: attrs.map(col) :+ col("valid_from") :+
        col("valid_to") :+ col("is_current"): _*)
  }

  /** Incremental SCD-2 merge: apply one batch of updates (key-unique,
    * each stamped with its effective `ts`) to an existing SCD-2
    * history. A matched key whose attributes changed gets its current
    * row closed (valid_to = update ts) and a new open row; an
    * identical update is a no-op (so re-applying a batch is
    * idempotent); a new key inserts an open row; closed history rows
    * pass through untouched. Like [[mergeUpsert]], updates must be
    * key-unique — and additionally non-null-keyed, since a NULL key
    * can never match its own current row on re-apply (every re-upsert
    * would append a duplicate open row).
    *
    * Scale shape: one shuffle — a full-outer join on the key between
    * the (small) current slice and the update batch; the closed
    * history is a union pass-through that never shuffles. */
  def scd2Apply(history: DataFrame, updates: DataFrame, key: String,
      ts: String, attrs: Seq[String], validate: Boolean = true): DataFrame = {
    if (validate) {
      // one aggregation job catches both invariants (NULL keys group
      // together, so they surface as a "key" row like any duplicate)
      val bad = updates.groupBy(col(key)).count()
        .filter(col("count") > 1 || col(key).isNull).limit(1).collect()
      bad.headOption.foreach { r =>
        require(!r.isNullAt(0),
          s"scd2Apply: updates contain a NULL $key — SCD-2 requires " +
            "non-null keys (a NULL key cannot match its own current row)")
        require(false,
          s"scd2Apply: updates contain duplicate rows for key " +
            s"${r.get(0)} — SCD-2 merge requires key-unique updates")
      }
    }
    val validToType = history.schema("valid_to").dataType
    val closed = history.filter(!col("is_current"))
    val cur = history.filter(col("is_current"))
    val u = updates.select(col(key).as("__u_key") +:
      col(ts).as("__u_ts") +: attrs.map(c => col(c).as(s"__u_$c")): _*)
    val j = cur.join(u, col(key) === col("__u_key"), "full_outer")
    val uPresent = col("__u_key").isNotNull
    val curPresent = col(key).isNotNull
    val changedAttrs = attrs.map(c => !(col(c) <=> col(s"__u_$c")))
      .reduce(_ || _)
    val closedOld = j.filter(curPresent && uPresent && changedAttrs)
      .select(col(key) +: attrs.map(col) :+ col("valid_from") :+
        col("__u_ts").as("valid_to") :+ lit(false).as("is_current"): _*)
    val newCur = j.filter(uPresent && (!curPresent || changedAttrs))
      .select(col("__u_key").as(key) +:
        attrs.map(c => col(s"__u_$c").as(c)) :+
        col("__u_ts").as("valid_from") :+
        lit(null).cast(validToType).as("valid_to") :+
        lit(true).as("is_current"): _*)
    val keepCur = j.filter(curPresent && (!uPresent || !changedAttrs))
      .select(col(key) +: attrs.map(col) :+ col("valid_from") :+
        col("valid_to") :+ col("is_current"): _*)
    closed.unionByName(closedOld).unionByName(newCur).unionByName(keepCur)
  }

  /** Query entry: SCD-2 history of each customer's order-status
    * attribute over the orders change log (o_orderdate event time,
    * o_orderkey as the deterministic within-day tie-break). */
  def scd2Query(spark: SparkSession, dir: String): DataFrame = {
    import graft.Tables
    scd2FromChangeLog(Tables.orders(spark, dir), "o_custkey",
      "o_orderdate", "o_orderkey", Seq("o_orderstatus"))
      .orderBy("o_custkey", "o_orderstatus", "valid_from", "valid_to",
        "is_current")
  }

  /** The reference's EP2 three-phase topology
    * (transfer_data_with_constraints_script.py:235-253): create all
    * tables without FKs → copy all data → add all FKs → sync
    * sequences. Load order is independent of the FK graph.
    *
    * The reference also carries a phase-2 lazy create-if-missing
    * fallback (transfer_data_with_constraints_script.py:193-197);
    * phase 1 here creates every selected table up front
    * (IF NOT EXISTS), so that fallback has no work left to do and is
    * deliberately not replicated. */
  def migrate(metas: Seq[TableMeta], exclude: Set[String],
      execDdl: String => Unit,
      read: TableMeta => DataFrame,
      write: (TableMeta, DataFrame) => Unit): Seq[TransferResult] = {
    val selected = metas.filterNot(m => exclude.contains(m.qualifiedName))
    // phase 1: DDL without FKs
    selected.foreach(m => execDdl(PgDdl.createTable(m)))
    // phase 2: data. The per-table row count rides an observe() node
    // on the write's own action (the Pipeline.curateObserved pattern,
    // zero extra action) instead of a post-write df.count() — the
    // count() form re-executed the partitioned source read per table,
    // doubling source I/O at migration scale (VERDICT r10 #1).
    // CONTRACT (same as curateObserved): `write` must execute exactly
    // one Spark action over the frame it is given — every real sink
    // (JDBC batch insert, parquet, noop) does; Observation.get then
    // returns the already-collected metric without blocking.
    val results = selected.map { m =>
      try {
        val df = read(m)
        val obs = new org.apache.spark.sql.Observation()
        write(m, df.observe(obs, org.apache.spark.sql.functions.count(
          lit(1)).as("rows")))
        // obs.get is the only public accessor and it BLOCKS; once
        // `write` has returned, the action either already ran (get
        // returns instantly) or never will — so a bounded wait turns
        // a zero-action writer into a loud per-table error instead of
        // an indefinite hang inside this try (ADVICE r11). The
        // timed-out waiter thread is daemon and leaks only on misuse.
        import scala.concurrent.ExecutionContext.Implicits.global
        val metrics =
          try scala.concurrent.Await.result(
            scala.concurrent.Future(obs.get),
            scala.concurrent.duration.Duration(30, "s"))
          catch { case _: java.util.concurrent.TimeoutException =>
            throw new IllegalStateException(
              s"migrate(${m.qualifiedName}): no observed metrics " +
                "after 30s — the supplied `write` must run exactly " +
                "one Spark action over the frame it is given")
          }
        TransferResult(m.qualifiedName,
          metrics("rows").asInstanceOf[Long], ok = true)
      } catch {
        case NonFatal(e) =>
          TransferResult(m.qualifiedName, 0L, ok = false, Some(e.getMessage))
      }
    }
    // phase 3: FKs (per-FK isolation like reference :163-171)
    selected.foreach { m =>
      PgDdl.addForeignKeys(m).foreach { sql =>
        try execDdl(sql) catch { case NonFatal(_) => () }
      }
    }
    // phase 4: sequence sync (reference EP3)
    selected.foreach { m =>
      if (m.serialColumns.nonEmpty) {
        try SequenceSync.syncStatements(m, read(m)).foreach(execDdl)
        catch { case NonFatal(_) => () }
      }
    }
    results
  }
}
