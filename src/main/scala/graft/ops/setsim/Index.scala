package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** The persisted set-sim index artifact (bucketed ranked/gramSets
  * tables, dictionary ids, varint packing, fingerprint-keyed reuse +
  * fresh-JVM re-attach) — pure move out of Dedup.scala (VERDICT r14
  * #6); object Dedup mixes this back in. */
trait SetSimIndexing { this: Dedup.type =>
  // ------------------------------------------- persisted set-sim index

  /** The corpus-side artifact of the exact set-similarity family,
    * loaded from fingerprint-keyed parquet: `ranked` = every gram
    * with its (df asc, g64 asc) position and the doc's set size
    * (doc_id, g64, df, pos, n) — threshold-INDEPENDENT, so one
    * artifact serves any t (the prefix cut is a query-time filter);
    * `gramSets` = the verify-stage signature table (doc_id, gs, n);
    * `freq` = corpus document frequency (g64, df) — the shared total
    * order an incremental ingest ranks its grams by. `nDocs` /
    * `gramBytes` are the precomputed [[SetSizer]] statistics, so the
    * index path pays ZERO driver actions for join sizing (the round-7
    * eager-sizing lesson). */
  final case class SetSimIndex(ranked: DataFrame, gramSets: DataFrame,
      freq: DataFrame, nDocs: Long, gramBytes: Long) {
    private[ops] def sizerOf(sess: SparkSession): SetSizer =
      SetSizer(nDocs, gramBytes,
        sess.conf.getOption("graft.setsim.broadcastBytes")
          .map(_.toLong).getOrElse(1024L * 1024 * 1024))
  }

  /** Dictionary-dense gid per gram in (df desc, g64 asc) order —
    * bit-identical to `row_number().over(Window.orderBy(...))` but
    * computed with NO single-partition stage (the round-12 verdict's
    * last scale-killer: at a 100 TB corpus the distinct-8-gram
    * dictionary is O(10⁹–10¹⁰) entries, and one task sorting tens of
    * GB is an OOM). Classic two-pass distributed rank:
    * range-repartition on the rank order, count rows per partition
    * (driver state = one long per partition — the only collect, and
    * it is partition-count-sized, not data-sized), then
    * gid = cumulative offset(pid) + pid-local row_number. Range
    * partitions are contiguous in the rank order, so the
    * concatenation of locally-sorted partitions IS the global order;
    * (df, g64) has the unique g64 tie-break, so no tie can straddle a
    * boundary ambiguously. The frame is persisted (registry-drained)
    * so both passes see one boundary sample and the pid column is
    * stable across the two jobs. */
  private[graft] def dictIdsOf(freq: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = freq.sparkSession
    val nP = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val parted = register(freq
      .repartitionByRange(nP, col("df").desc, col("g64").asc)
      .withColumn("pid", spark_partition_id())
      .persist(StorageLevel.MEMORY_AND_DISK))
    val counts = parted.groupBy(col("pid"))
      .agg(count(lit(1)).as("c")).collect()
      .map(r => (r.getInt(0), r.getLong(1))).toMap
    val maxPid = if (counts.isEmpty) 0 else counts.keys.max + 1
    val offsets = (0 until maxPid)
      .scanLeft(0L)((acc, p) => acc + counts.getOrElse(p, 0L))
    // an EMPTY frame (reachable via packedGramSetsAgainst's
    // no-unseen-grams case) has no offsets to map — map() with zero
    // args doesn't type-check against an int key, and no row ever
    // reads the value anyway
    val offOf =
      if (maxPid == 0) lit(0L)
      else element_at(
        map((0 until maxPid)
          .flatMap(p => Seq(lit(p), lit(offsets(p)))): _*), col("pid"))
    parted
      .withColumn("gid", (offOf + row_number().over(
        Window.partitionBy(col("pid"))
          .orderBy(col("df").desc, col("g64").asc))).cast("long"))
      .select(col("g64"), col("gid"))
  }

  /** The index's gram-set table WITH the packed column: per doc the
    * sorted raw gram array (gs — the broadcast-regime payload), the
    * set size, and the dictionary-dense delta-varint packing (gv —
    * the over-threshold exchange payload, ~4× smaller; see
    * graft.functions.VarintGramSet for the measurement chain that
    * chose this over a df-capped inverted join). The dictionary
    * orders ids by (df desc, g64) so common grams cluster at low ids
    * and per-doc gaps stay small. */
  private[ops] def packedGramSetsOf(grams: DataFrame,
      freq: DataFrame): DataFrame = {
    val freqG = dictIdsOf(freq)
    grams.join(freqG, Seq("g64"))
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("g64"))).as("gs"),
        count(lit(1)).as("n"),
        call_function("varint_delta_pack",
          sort_array(collect_list(col("gid")))).as("gv"))
  }

  /** Build + write the set-sim index for a corpus as PLAIN parquet —
    * the portable form for stores without a metastore (the
    * bucketed-table form [[persistedSetSimIndex]] builds is the
    * default). The one-off organized write a deployment amortizes
    * (the scaladoc promise at [[setSimJoinIncremental]] — "the stable
    * index-side statistic a deployment precomputes" — made real; the
    * Ivf.writeIndex twin). Everything written is exact integer state
    * (packed grams, counts, row_number ranks with a total tie-break),
    * so an index-riding query is bit-identical to the from-scratch
    * form. */
  def writeSetSimIndex(docs: DataFrame, idCol: String,
      path: String): Unit = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    latin1Guard(docs)
    val grams = register(packedGrams(docs, idCol)
      .persist(StorageLevel.MEMORY_AND_DISK))
    val freq = grams.groupBy(col("g64")).agg(count(lit(1)).as("df"))
    val gramSets = register(packedGramSetsOf(grams, freq)
      .persist(StorageLevel.MEMORY_AND_DISK))
    val sz = sizer(docs.sparkSession, gramSets)
    rankedGrams(grams, freq, gramSets, sz, leftJoinFreq = false)
      .write.mode("overwrite").parquet(s"$path/ranked")
    gramSets.write.mode("overwrite").parquet(s"$path/gramsets")
    freq.write.mode("overwrite").parquet(s"$path/freq")
    import docs.sparkSession.implicits._
    Seq((sz.nDocs, sz.gramBytes)).toDF("n_docs", "gram_bytes")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/stats")
  }

  /** Load a persisted set-sim index (stats read is one 1-row file). */
  def readSetSimIndex(spark: SparkSession, path: String): SetSimIndex = {
    val st = spark.read.parquet(s"$path/stats").head()
    SetSimIndex(spark.read.parquet(s"$path/ranked"),
      spark.read.parquet(s"$path/gramsets"),
      spark.read.parquet(s"$path/freq"),
      st.getLong(0), st.getLong(1))
  }

  // one persisted set-sim index per (root, dir, corpus tag) per JVM;
  // the on-disk digest folds in the source fingerprint AND a schema
  // version ("ssi2" = the bucketed-table layout) so both a
  // regenerated corpus and a code-level index schema change force a
  // rebuild (the round-6 fingerprint rule + the round-7
  // rehearsal-cache version rule) — all via the shared
  // graft.Artifacts resolver. Table-existence + stats/_SUCCESS
  // probes make the artifact reusable ACROSS JVMs: a verify run and
  // the bench that follows read the same on-disk build.

  /** Bucket count of the persisted index tables — matches the 32-way
    * session parallelism; on a cluster this is a deployment knob. */
  private[ops] val IndexBuckets = 32

  /** The persisted set-sim index for a corpus selection: built +
    * written on first use, read after (including from a PRIOR JVM
    * whose source fingerprint still matches) — the honest per-query
    * cost of a deployed exact-dedup system, exactly like
    * [[Ivf.persistedIndex]] for ANN. `tag` names the corpus selection
    * (full table, an id-range snapshot, …) so distinct selections
    * never share an artifact.
    *
    * Layout: `ranked` is a table BUCKETED+SORTED on g64, so the
    * candidate self-join (and an incremental probe's g64 join) plans
    * with ZERO exchange and zero sort on the index side; `gramSets`
    * is bucketed on doc_id, so an over-threshold shuffled-hash verify
    * never re-shuffles the signature table itself. Measured honesty
    * (30x rehearsal): that build-side saving is MARGINAL — the
    * over-threshold cliff (224 s vs 14 s broadcast) is the exchange
    * between the two verify joins, whose rows carry the first side's
    * gram ARRAY (24.7M candidates × ~2 KB); it is intrinsic to exact
    * verification once the signature table outgrows broadcast. The
    * scale levers are the broadcast limit (executors sized for 100 TB
    * hold 1 GiB routinely) and candidate volume (threshold choice) —
    * recorded in BASELINE.md round 11. */
  /** Re-ATTACH one bucketed index table in a fresh JVM: the parquet
    * artifact (bucket-id-encoded file names, written by saveAsTable)
    * is intact on disk, only the in-memory catalog entry died with
    * the previous JVM — so recreate the EXTERNAL table with the same
    * CLUSTERED/SORTED BY DDL the writer declared instead of re-running
    * the whole build (round 13's "first index-touching query pays a
    * rebuild" cost, eliminated: attach is a schema inference + one
    * DDL). Round14OpsSpec proves rows AND bucket metadata survive the
    * drop/attach cycle. */
  private[ops] def attachIndexTable(spark: SparkSession, name: String,
      dataPath: String, bucketCol: String): Unit = {
    val schemaDdl = spark.read.parquet(dataPath).schema.toDDL
    spark.sql(s"CREATE TABLE $name ($schemaDdl) USING PARQUET " +
      s"CLUSTERED BY ($bucketCol) SORTED BY ($bucketCol) " +
      s"INTO $IndexBuckets BUCKETS LOCATION '$dataPath'"): Unit
  }

  def persistedSetSimIndex(spark: SparkSession, dir: String, tag: String,
      corpus: (SparkSession, String) => DataFrame, idCol: String = "doc_id",
      indexRoot: String = sys.props("java.io.tmpdir") + "/graft_setsim")
      : SetSimIndex = {
    def tables(digest: String) = (s"ssi_gs_$digest", s"ssi_rk_$digest")
    val path = graft.Artifacts.resolve(indexRoot, dir,
      // the bucket count is part of the on-disk layout: folding it
      // into the digest means a code-level IndexBuckets change can
      // never re-ATTACH stale-bucket-count metadata over files written
      // with a different count (ADVICE r14) — it forces a rebuild,
      // exactly like a schema-version bump
      Tables.sourceFingerprint(dir, Seq("documents")),
      s"ssi5|b$IndexBuckets|$tag")(
      p => {
        val (gs, rk) = tables(p.split('/').last)
        new java.io.File(s"$p/stats/_SUCCESS").exists() && {
          if (!spark.catalog.tableExists(gs))
            attachIndexTable(spark, gs, s"$p/gramsets", "doc_id")
          if (!spark.catalog.tableExists(rk))
            attachIndexTable(spark, rk, s"$p/ranked", "g64")
          true
        }
      }) { (p, digest) =>
      val (gsTable, rkTable) = tables(digest)
      val docs = corpus(spark, dir)
      graft.functions.GraftFunctions.register(spark)
      latin1Guard(docs)
      val grams = register(packedGrams(docs, idCol)
        .persist(StorageLevel.MEMORY_AND_DISK))
      val freq = grams.groupBy(col("g64")).agg(count(lit(1)).as("df"))
      val gramSets = register(packedGramSetsOf(grams, freq)
        .persist(StorageLevel.MEMORY_AND_DISK))
      val sz = sizer(spark, gramSets)
      rankedGrams(grams, freq, gramSets, sz, leftJoinFreq = false)
        .write.mode("overwrite")
        .bucketBy(IndexBuckets, "g64").sortBy("g64")
        .option("path", s"$p/ranked").saveAsTable(rkTable)
      gramSets.write.mode("overwrite")
        .bucketBy(IndexBuckets, "doc_id").sortBy("doc_id")
        .option("path", s"$p/gramsets").saveAsTable(gsTable)
      freq.write.mode("overwrite").parquet(s"$p/freq")
      import spark.implicits._
      Seq((sz.nDocs, sz.gramBytes)).toDF("n_docs", "gram_bytes")
        .coalesce(1).write.mode("overwrite").parquet(s"$p/stats")
      unpersistCaches()
    }
    val (gsTable, rkTable) = tables(path.split('/').last)
    val st = spark.read.parquet(s"$path/stats").head()
    SetSimIndex(spark.table(rkTable), spark.table(gsTable),
      spark.read.parquet(s"$path/freq"),
      st.getLong(0), st.getLong(1))
  }

}
