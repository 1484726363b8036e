package graft.streaming

import graft.etl.Cdc
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** Streaming twin of the batch snapshot diff (graft.etl.Cdc
  * .snapshotDiff): the new snapshot arrives as a stream (the shape a
  * chunked export actually delivers — the reference reads its source
  * in chunks, transfer_data_script.py:107-114), and each micro-batch
  * is diffed incrementally against the static old snapshot.
  *
  * Semantics split by change kind:
  *  - INSERT/UPDATE are decidable per micro-batch: a new-snapshot row
  *    either has no old counterpart (I) or differs from it (U). Each
  *    batch's I/U rows append to the change feed as they arrive.
  *  - DELETE is NOT decidable per batch — a key absent from one
  *    micro-batch may arrive in the next. Deletes are reconciled once
  *    the snapshot load completes ([[deletes]]): old keys never seen
  *    across the whole stream. This is the standard end-of-load
  *    reconciliation of any streaming snapshot diff; the batch op
  *    remains the one-shot equivalent (StreamingSpec asserts
  *    stream I/U + reconciled D == batch diff exactly).
  *
  * Scale shape: per batch, one join of the micro-batch against the
  * old snapshot keyed by `keyCols` (broadcast the batch side — a
  * micro-batch is chunk-sized by construction; Spark picks this via
  * size estimation) plus an append of the batch's bare keys for the
  * final anti-join; no state store at all — the seen-keys ledger IS
  * the sink directory, so the stream carries zero in-memory state and
  * restarts are idempotent per micro-batch.
  */
object CdcStream {

  /** Start building the incremental diff: per micro-batch, classify
    * I/U rows against `oldSnap` (same shape/columns as the batch
    * [[Cdc.snapshotDiff]] output minus D rows) appended as parquet to
    * `changesDir`; the batch's key columns append to `keysDir` for
    * the end-of-load delete reconciliation. */
  def incrementalDiff(newSnapStream: DataFrame, oldSnap: DataFrame,
      keyCols: Seq[String], compareCols: Seq[String],
      changesDir: String, keysDir: String): DataStreamWriter[Row] =
    newSnapStream.writeStream.outputMode("append").foreachBatch {
      (batch: DataFrame, _: Long) =>
        // reuse the batch op verbatim so the I/U classification
        // CANNOT drift from the one-shot diff; 'D' rows here only
        // mean "old key absent from this chunk" — dropped
        Cdc.snapshotDiff(oldSnap, batch, keyCols, compareCols)
          .filter(col("change") =!= "D")
          .write.mode("append").parquet(changesDir)
        batch.select(keyCols.map(col): _*)
          .write.mode("append").parquet(keysDir)
    }

  /** Streaming twin of the incremental moment maintenance
    * (Grouping.incrementalStats, q132): each micro-batch folds its
    * per-group partials (n, Σx, Σx²) into a parquet state table by
    * the same unionByName + sum merge the batch op uses — so the
    * final state after any chunking of the input equals the one-pass
    * recompute (moment addition is associative and commutative; the
    * StreamingSpec asserts exactly this). State is group-count-sized;
    * the stream only ever scans the increment. */
  def incrementalMoments(rows: DataFrame, grpCol: String, valCol: String,
      stateDir: String): DataStreamWriter[Row] = {
    def d(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    rows.writeStream.outputMode("append").foreachBatch {
      (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val partial = batch.groupBy(col(grpCol))
          .agg(count(lit(1)).as("n"), sum(d(col(valCol))).as("s"),
            sum(d(col(valCol)) * d(col(valCol))).as("ss"))
        val merged =
          if (new java.io.File(stateDir).exists()) {
            val prev = spark.read.parquet(stateDir)
            prev.unionByName(partial).groupBy(col(grpCol))
              .agg(sum(col("n")).as("n"),
                sum(col("s")).cast("decimal(38,0)").as("s"),
                sum(col("ss")).cast("decimal(38,0)").as("ss"))
          } else partial
        // state is tiny (one row per group): rewrite atomically via
        // a collect-free staged overwrite into a temp dir + swap.
        // Crash-safe ordering: the OLD state is renamed ASIDE (not
        // deleted) before the new state is promoted, so no window
        // exists where a crash leaves NO state on disk; the aside
        // copy is removed only after a successful promote. Every
        // rename is checked — a failed swap aborts the batch (and
        // the checkpoint) instead of silently dropping the
        // accumulated moments.
        val tmp = stateDir + ".next"
        merged.write.mode("overwrite").parquet(tmp)
        def rmr(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles.foreach(rmr)
          f.delete(): Unit
        }
        val t = new java.io.File(tmp); val s0 = new java.io.File(stateDir)
        val aside = new java.io.File(stateDir + ".old")
        if (aside.exists()) rmr(aside) // leftover from a prior crash
        if (s0.exists() && !s0.renameTo(aside))
          throw new java.io.IOException(
            s"incrementalMoments: failed to move $stateDir aside")
        if (!t.renameTo(s0)) {
          // roll the old state back so the next batch still sees it
          if (aside.exists()) aside.renameTo(s0): Unit
          throw new java.io.IOException(
            s"incrementalMoments: failed to promote $tmp to $stateDir")
        }
        if (aside.exists()) rmr(aside)
    }
  }

  /** End-of-load delete reconciliation: old-snapshot rows whose key
    * never arrived in the stream, shaped exactly like the batch op's
    * 'D' rows (old_ values populated, new_ null). */
  def deletes(spark: SparkSession, oldSnap: DataFrame,
      keyCols: Seq[String], compareCols: Seq[String],
      keysDir: String): DataFrame = {
    val seen = spark.read.parquet(keysDir)
    val gone = oldSnap.join(seen, keyCols, "left_anti")
    gone.select(
      keyCols.map(col) ++ Seq(lit("D").as("change")) ++
        compareCols.flatMap(c => Seq(
          col(c).as(s"old_$c"),
          lit(null).cast(oldSnap.schema(c).dataType).as(s"new_$c"))): _*)
  }
}
