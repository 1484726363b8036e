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
      (batch: DataFrame, batchId: Long) =>
        mergeAdditive(stateDir, batchId,
          batch.groupBy(col(grpCol))
            .agg(count(lit(1)).as("n"), sum(d(col(valCol))).as("s"),
              sum(d(col(valCol)) * d(col(valCol))).as("ss")),
          Seq(grpCol))
    }
  }

  /** Streaming twin of the integer EWMA activity fold
    * (TimeSeries.ewmaActivity, q162): per-user state (n_events,
    * ewma_micro) advances through each micro-batch's events in
    * (ts, event_id) order. The truncating-division decay is NOT
    * affine-composable (⌊⌊s·7/8⌋·7/8⌋ ≠ ⌊s·49/64⌋ in general), so a
    * batch cannot be folded locally and merged — instead the prior
    * state enters the sort as a MARKER row (tsm = Long.MinValue,
    * event_id = -1) that SEEDS the fold, and every event then applies
    * the identical step the batch op uses. In-order contract as
    * gapFillStream: per-user event time moves forward across
    * micro-batches. After the stream drains, the state table equals
    * the one-pass [[graft.ops.TimeSeries.ewmaActivityOn]] exactly
    * (StreamingSpec).
    *
    * Scale shape: state is one row per user; each batch shuffles only
    * its own events plus |users-in-batch| marker rows. */
  def ewmaStream(events: DataFrame, stateDir: String)
      : DataStreamWriter[Row] =
    events.writeStream.outputMode("append").foreachBatch {
      (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        import spark.implicits._
        // the state seed is flagged by an EXPLICIT is_marker column —
        // not an in-band event_id sentinel (ADVICE r7: a legitimate
        // event_id = -1 would silently reset the user's state). The
        // marker's tsm = Long.MinValue still sorts it first in the
        // per-user fold.
        val ev = batch
          .select(col("user_id"), unix_micros(col("ts")).as("tsm"),
            col("event_id"),
            (col("value").cast("decimal(18,6)") * 1000000).cast("long")
              .as("v"), lit(0L).as("n0"), lit(false).as("is_marker"))
        recoverState(stateDir)
        val withState =
          if (new java.io.File(stateDir).exists())
            ev.unionByName(spark.read.parquet(stateDir)
              .select(col("user_id"), lit(Long.MinValue).as("tsm"),
                lit(-1L).as("event_id"), col("ewma_micro").as("v"),
                col("n_events").as("n0"), lit(true).as("is_marker")))
          else ev
        val folded = withState
          .as[(Long, Long, Long, Long, Long, Boolean)]
          .groupByKey(_._1)
          .flatMapSortedGroups(col("tsm"), col("event_id")) { (u, it) =>
            var s = 0L
            var n = 0L
            it.foreach { case (_, _, _, v, n0, marker) =>
              if (marker) { s = v; n = n0 }
              else { s = s * 7 / 8 + v; n += 1 }
            }
            Iterator.single((u, n, s))
          }
          .toDF("user_id", "n_events", "ewma_micro")
        promoteState(stateDir, folded)
    }

  /** Crash-safe state-table promotion shared by the foreachBatch
    * twins: write the new state to `<stateDir>.next` (collect-free
    * staged overwrite), rename the OLD state ASIDE (not deleted) so
    * no window exists where a crash leaves NO state on disk, promote,
    * then drop the aside copy. Every rename is checked — a failed
    * swap aborts the batch (and the checkpoint) instead of silently
    * dropping accumulated state. */
  /** Shared per-batch core for the ADDITIVE counter twins: merge the
    * micro-batch's `partial` into the parquet state by summing every
    * non-key column per `keys` group. Additive merges are NOT
    * replay-idempotent (unlike the id-keyed twins, whose anti-joins
    * drop replayed docs), so a micro-batch replayed after a
    * crash-after-promote is skipped via the promoted-batchId marker
    * (ADVICE r11) — the marker rides inside the state dir and is
    * promoted atomically with it, so state and provenance can never
    * disagree. */
  private[streaming] def mergeAdditive(stateDir: String, batchId: Long,
      partial: DataFrame, keys: Seq[String]): Unit = {
    recoverState(stateDir)
    // lineage check FIRST (VERDICT r13 #5): a batchId compare against
    // a marker from another checkpoint lineage is meaningless — a
    // fresh checkpoint restarts at 0 and the guard below would
    // silently SKIP every batch until the counter passed the old
    // marker. Mismatch errors loudly instead.
    val lineage = assertLineage(stateDir, partial.sparkSession)
    if (batchId <= lastPromotedBatchId(stateDir)) return
    val merged =
      if (new java.io.File(stateDir).exists()) {
        val aggs = partial.columns.filterNot(keys.contains)
          .map(c => sum(col(c)).cast(partial.schema(c).dataType).as(c))
        partial.sparkSession.read.parquet(stateDir)
          .unionByName(partial)
          .groupBy(keys.map(col): _*)
          .agg(aggs.head, aggs.tail.toIndexedSeq: _*)
      } else partial
    promoteState(stateDir, merged, batchId, lineage)
  }

  /** The checkpoint-lineage identity of the CURRENT stream: Spark's
    * streaming query id — persisted in the checkpoint's metadata file,
    * so it is STABLE across restarts from the same checkpointLocation
    * and FRESH for a new one (exactly the lineage _BATCH_ID numbers
    * live in). StreamExecution exposes it as a thread-local property
    * on the micro-batch thread foreachBatch runs on; absent (None)
    * outside a streaming query — direct processBatch calls in specs
    * and backfills skip the check. */
  private def lineageIdOf(spark: SparkSession): Option[String] =
    Option(spark.sparkContext.getLocalProperty("sql.streaming.queryId"))
      .map(_.trim).filter(_.nonEmpty)

  private[streaming] def storedLineageId(stateDir: String): Option[String] = {
    val f = new java.io.File(stateDir, "_QUERY_ID")
    if (f.isFile)
      Some(java.nio.file.Files.readString(f.toPath).trim).filter(_.nonEmpty)
    else None
  }

  /** Loud-error form of the stateDir/checkpoint contract (VERDICT r13
    * #5 — previously documentation only): the _QUERY_ID marker rides
    * inside the state dir next to _BATCH_ID (promoted atomically with
    * it); when both the stored and the current lineage are known and
    * differ, the merge REFUSES instead of letting the replay guard
    * silently drop every batch of the new lineage. Returns the
    * current lineage for the next promote. Pre-r14 state dirs have no
    * marker — the check arms itself on their next promote. */
  private[streaming] def assertLineage(stateDir: String,
      spark: SparkSession): Option[String] = {
    val cur = lineageIdOf(spark)
    val stored = storedLineageId(stateDir)
    (stored, cur) match {
      case (Some(old), Some(now)) if old != now =>
        throw new IllegalStateException(
          s"additive state dir $stateDir was accumulated under streaming" +
            s"-query lineage $old but this stream runs lineage $now — a " +
            "FRESH checkpointLocation against existing state restarts " +
            "batchIds at 0, and the replay guard would silently skip " +
            "every batch until the counter passed the old marker. " +
            "stateDir and checkpointLocation live and die together: " +
            "restore the original checkpointLocation, or remove/migrate " +
            "the state dir.")
      // A promote OUTSIDE a stream (backfill / direct processBatch) has
      // no current lineage; carry the stored id forward so the rename
      // doesn't erase the marker and disarm the guard (ADVICE r14).
      case _ => cur.orElse(stored)
    }
  }

  /** Recover from a crash INSIDE [[promoteState]]'s swap — between
    * moving the old state aside and promoting the staged copy, the
    * state dir (and its _BATCH_ID marker) is briefly absent. A crash
    * there previously left only `<stateDir>.old`, which the NEXT
    * promote deleted as a leftover: accumulated state silently lost
    * (ADVICE r12). Every state READ now restores the aside copy first
    * when the state dir is missing, so the window closes on restart
    * instead of compounding. */
  private[streaming] def recoverState(stateDir: String): Unit = {
    val s0 = new java.io.File(stateDir)
    val aside = new java.io.File(stateDir + ".old")
    if (!s0.exists() && aside.exists() && !aside.renameTo(s0))
      throw new java.io.IOException(
        s"recoverState: failed to restore $aside to $stateDir")
  }

  /** Last batchId promoted into `stateDir` (−1 when absent). The
    * marker lives INSIDE the state directory, so the promote rename
    * moves state and provenance atomically — no crash window where
    * they disagree.
    *
    * Identity contract: batchIds are meaningful only within ONE
    * checkpoint lineage. Restarting a stream against an existing
    * stateDir with a FRESH checkpointLocation resets batchIds to 0,
    * and the replay guard would skip every batch until the counter
    * passes the old marker — stateDir and checkpointLocation must be
    * created and destroyed TOGETHER (the same contract Spark's own
    * stateful operators place on their checkpointed state). */
  private[streaming] def lastPromotedBatchId(stateDir: String): Long = {
    val f = new java.io.File(stateDir, "_BATCH_ID")
    if (f.isFile) java.nio.file.Files.readString(f.toPath).trim.toLong
    else -1L
  }

  private[streaming] def promoteState(stateDir: String,
      merged: DataFrame, batchId: Long = -1L,
      lineageId: Option[String] = None): Unit = {
    val tmp = stateDir + ".next"
    merged.write.mode("overwrite").parquet(tmp)
    // underscore-prefixed, so parquet readers ignore them; both
    // markers ride the same rename as the state rows
    if (batchId >= 0L)
      java.nio.file.Files.writeString(
        new java.io.File(tmp, "_BATCH_ID").toPath, batchId.toString): Unit
    lineageId.foreach(id => java.nio.file.Files.writeString(
      new java.io.File(tmp, "_QUERY_ID").toPath, id): Unit)
    def rmr(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles.foreach(rmr)
      f.delete(): Unit
    }
    val t = new java.io.File(tmp); val s0 = new java.io.File(stateDir)
    val aside = new java.io.File(stateDir + ".old")
    if (aside.exists()) rmr(aside) // leftover from a prior crash
    if (s0.exists() && !s0.renameTo(aside))
      throw new java.io.IOException(
        s"promoteState: failed to move $stateDir aside")
    if (!t.renameTo(s0)) {
      // roll the old state back so the next batch still sees it
      if (aside.exists()) aside.renameTo(s0): Unit
      throw new java.io.IOException(
        s"promoteState: failed to promote $tmp to $stateDir")
    }
    if (aside.exists()) rmr(aside)
  }

  /** Streaming twin of the hourly gap-fill + LOCF
    * (TimeSeries.gapFillLocf): each micro-batch advances a per-user
    * (last_hour, last_sv) state and emits the FILLED hourly rows the
    * batch op produces for the hours this batch completes — silent
    * hours between the previous state and the batch's observations
    * fill with the carried DECIMAL value, so chunking can never drift
    * the fill (the carry is exactly the LOCF value at the previous
    * chunk's last hour).
    *
    * In-order contract (the watermark analog, same as the chunked
    * snapshot feed): per-user event time moves forward across
    * micro-batches; rows at or before the user's state hour are LATE
    * and dropped defensively. After the stream drains, the emitted
    * union equals the batch gapFillLocf over the same events exactly
    * (StreamingSpec). The late-drop also makes a REPLAYED micro-batch
    * a no-op (state already advanced past its hours — nothing emits,
    * state unchanged), so a post-promote crash replay cannot
    * double-fill.
    *
    * Scale shape: state is one row per user; each batch touches its
    * own hourly aggregate plus the state join — nothing span-sized,
    * nothing corpus-sized. */
  def gapFillStream(events: DataFrame, outDir: String,
      stateDir: String): DataStreamWriter[Row] =
    events.writeStream.outputMode("append").foreachBatch {
      (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        import org.apache.spark.sql.expressions.Window
        val hourly0 = batch.groupBy(col("user_id"),
            date_trunc("hour", col("ts")).as("hour"))
          .agg(sum(col("value").cast("decimal(18,2)")).as("sv"),
            count(lit(1)).as("n_events"))
        recoverState(stateDir)
        val prev =
          if (new java.io.File(stateDir).exists())
            spark.read.parquet(stateDir)
          else spark.createDataFrame(
            new java.util.ArrayList[Row](),
            org.apache.spark.sql.types.StructType(Seq(
              org.apache.spark.sql.types.StructField("user_id",
                org.apache.spark.sql.types.LongType),
              org.apache.spark.sql.types.StructField("last_hour",
                org.apache.spark.sql.types.TimestampType),
              org.apache.spark.sql.types.StructField("last_sv",
                org.apache.spark.sql.types.DataTypes
                  .createDecimalType(18, 2)))))
        // drop late rows (at or before the state hour) per contract
        val hourly = hourly0.join(prev, Seq("user_id"), "left")
          .filter(col("last_hour").isNull ||
            col("hour") > col("last_hour"))
          .select(col("user_id"), col("hour"), col("sv"), col("n_events"))
        val bounds = hourly.groupBy(col("user_id"))
          .agg(min(col("hour")).as("mn"), max(col("hour")).as("mx"))
          .join(prev, Seq("user_id"), "left")
          .select(col("user_id"),
            coalesce(col("last_hour") + expr("interval 1 hour"),
              col("mn")).as("w0"),
            col("mx"), col("last_sv"))
        val spine = bounds.select(col("user_id"), col("last_sv"),
          explode(sequence(col("w0"), col("mx"), expr("interval 1 hour")))
            .as("hour"))
        val locf = Window.partitionBy(col("user_id")).orderBy(col("hour"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        // fill in DECIMAL (state must not round-trip through double)
        val filled = spine.join(hourly, Seq("user_id", "hour"), "left")
          .select(col("user_id"), col("hour"),
            coalesce(col("n_events"), lit(0L)).as("n_events"),
            coalesce(last(col("sv"), ignoreNulls = true).over(locf),
              col("last_sv")).as("fill_dec"))
          .persist()
        filled.select(col("user_id"), col("hour"), col("n_events"),
            col("fill_dec").cast("double").as("filled_value"))
          .write.mode("append").parquet(outDir)
        // advance state: users with new rows take (mx, fill at mx);
        // untouched users keep their previous state row
        val updates = filled
          .join(bounds.select(col("user_id"), col("mx")), Seq("user_id"))
          .filter(col("hour") === col("mx"))
          .select(col("user_id"), col("hour").as("last_hour"),
            col("fill_dec").as("last_sv"))
        val newState = prev.join(updates.select(col("user_id")),
            Seq("user_id"), "left_anti")
          .unionByName(updates)
        promoteState(stateDir, newState)
        filled.unpersist(): Unit
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
