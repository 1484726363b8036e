package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Streaming twin of the batch incremental exact dedup
  * (graft.ops.Dedup.incrementalExactNew) — the shape a daily-ingest
  * pipeline actually runs: new documents arrive as a stream, and a doc
  * is admitted iff its content is new to BOTH the historical corpus
  * and the stream so far.
  *
  * Scale shape, mirroring the batch op's discipline:
  *  - the stream reduces to (doc_id, 32-byte digest) before any
  *    stateful op — document text never enters the state store;
  *  - within-stream dedup is `dropDuplicatesWithinWatermark` on the
  *    digest, so state is bounded by the watermark horizon instead of
  *    growing with corpus lifetime (the batch op's first-in-batch
  *    semi-join, re-expressed as bounded streaming state);
  *  - the corpus check is a stream-static LEFT ANTI join against the
  *    corpus digest set — stateless per micro-batch, and the static
  *    side prunes to the digest column only.
  */
object DocStream {

  val docSchema: StructType = StructType.fromDDL(
    "doc_id LONG, text STRING, ingest_ts TIMESTAMP")

  /** [[docSchema]] plus the declared language label — the q214
    * calibration twin scores predictions against it. */
  val labeledDocSchema: StructType = StructType.fromDDL(
    "doc_id LONG, text STRING, lang STRING, ingest_ts TIMESTAMP")

  /** Admit stream docs whose content digest is unseen in `corpus` and
    * first-arriving within the stream (watermark-bounded). Arrival
    * order decides within-stream ties — the batch op's min-doc_id rule
    * under an id-ordered ingest, which is what a monotonic ingest
    * pipeline delivers. */
  def incrementalDedup(docs: DataFrame, corpus: DataFrame,
      watermarkDelay: String = "1 hour"): DataFrame = {
    val fresh = docs
      // NULL text admits nothing in the batch twin (its equi semi-join
      // drops null digests); filter explicitly here because
      // dropDuplicatesWithinWatermark + anti-join would instead admit
      // the FIRST null-text doc (nulls compare equal in dedup state,
      // and a null key never matches the anti-join's corpus side)
      .filter(col("text").isNotNull)
      .select(col("doc_id"), col("ingest_ts"),
        sha2(col("text"), 256).as("content_hash"))
      .withWatermark("ingest_ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("content_hash")
    fresh.join(
      corpus.select(sha2(col("text"), 256).as("content_hash")),
      Seq("content_hash"), "left_anti")
      .select(col("doc_id"))
  }

  /** Streaming twin of the batch passage-level dedup
    * (graft.ops.Dedup.passageDedupDocs): each arriving document
    * explodes into `w`-token chunks (the SAME shared chunking
    * expression as the batch op), and a chunk is admitted iff its
    * digest is first-seen within the watermark horizon. State carries
    * 32-byte digests, never chunk text — the batch op's
    * sha2-the-shuffle-key-at-scale note, already mandatory here
    * because the digest IS the dedup state key. Under id-ordered
    * arrival the admitted (doc_id, cidx) set equals the batch op's
    * first-occurrence set (StreamingSpec). */
  def passageDedup(docs: DataFrame, w: Int = 8,
      watermarkDelay: String = "1 hour"): DataFrame =
    docs
      .filter(col("text").isNotNull)
      .select(col("doc_id"), col("ingest_ts"),
        posexplode(graft.ops.Dedup.chunkCol(w)).as(Seq("cidx", "chunk")))
      .withColumn("chunk_hash", sha2(col("chunk"), 256))
      .withWatermark("ingest_ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("chunk_hash")
      .select(col("doc_id"), col("cidx"))

  /** Streaming twin of the substring-level corpus novelty gauge
    * (graft.ops.Dedup.windowNovelty): per arriving document, the
    * fraction of its stride-1 token windows unseen in the STATIC
    * reference corpus. Novelty is per-doc against a fixed reference,
    * so the op is completely stateless across batches — each
    * micro-batch runs the batch op verbatim (no drift possible) and
    * appends its per-doc rows; chunked arrival provably cannot change
    * any row (StreamingSpec asserts stream == batch on a 2-batch
    * split). This is the live "how new is today's crawl" feed the
    * batch op computes retrospectively. */
  def windowNoveltyStream(docs: DataFrame, corpus: DataFrame,
      outDir: String): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream.outputMode("append").foreachBatch {
      (batch: DataFrame, _: Long) =>
        graft.ops.Dedup.windowNovelty(
            batch.select(col("doc_id"), col("text")), corpus)
          .write.mode("append").parquet(outDir)
    }

  /** [[docSchema]] plus the source label — the q266 contamination
    * twin excludes eval-source rows from the screened side. */
  val sourcedDocSchema: StructType = StructType.fromDDL(
    "doc_id LONG, text STRING, source STRING, ingest_ts TIMESTAMP")

  /** Streaming twin of the incremental decontamination screen's
    * COUNTS face (graft.ops.Decontaminate.countsAgainst, q266): per
    * arriving training document, its winnow-fingerprint count, shared
    * count against the STATIC frozen eval set, and the shared ppm
    * fraction — the live "is today's crawl leaking the eval set"
    * feed. Per-doc independent given the frozen eval fingerprints, so
    * the op is completely stateless across batches and chunked
    * arrival provably cannot change any row (2-batch parity in
    * Round15bOpsSpec).
    *
    * `evalFp` is the PREBUILT frozen artifact
    * (Decontaminate.evalFingerprints, persisted/parquet-backed by the
    * caller — the persisted-artifact pattern): building it per
    * micro-batch would re-winnow the whole eval corpus every trigger,
    * and a foreachBatch-side leaf has no measurable stats so the
    * size-conditional join would never broadcast. Sizing happens ONCE
    * here at stream construction from the artifact's own leaf/cache
    * stats. The batch query's quarantine verdict is deliberately NOT
    * emitted: it is batch-RELATIVE (nearest-rank p90 of the whole
    * ingest), so a per-micro-batch replay would drift by
    * construction — the verdict layer reads the day's accumulated
    * counts, exactly as q266 computes it. */
  def contaminationScreenStream(docs: DataFrame, evalFp: DataFrame,
      outDir: String): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    val limit = evalFp.sparkSession.conf
      .getOption("graft.setsim.broadcastBytes")
      .map(_.toLong).getOrElse(256L * 1024 * 1024)
    val sized =
      if (graft.ops.PlanStats.leafBytes(evalFp) * 2 <= limit)
        broadcast(evalFp)
      else evalFp.hint("shuffle_hash")
    docs.writeStream.outputMode("append").foreachBatch {
      (batch: DataFrame, _: Long) =>
        graft.ops.Decontaminate.countsAgainst(
            batch.filter(col("source") =!= "src0")
              .select(col("doc_id"), col("source"), col("text")),
            sized)
          .write.mode("append").parquet(outDir)
    }
  }

  /** Streaming twin of the contamination-span audit
    * (graft.ops.Decontaminate.spanStatsOf, q265): per arriving
    * training document, its longest matched 8-gram run against the
    * STATIC frozen eval set. Spans are per-(train doc, eval doc)
    * diagonals and the eval side is frozen, so the op is stateless
    * across batches; chunked arrival provably cannot change any row
    * (Round15bOpsSpec 2-batch parity).
    *
    * `evalGrams` is the PREBUILT frozen artifact
    * (Decontaminate.evalGramPositions, persisted/parquet-backed by
    * the caller) — sized ONCE at construction, never re-exploded per
    * trigger. The matched frame feeds two consumers, so each
    * micro-batch persists it LOCALLY and unpersists after the write
    * (the round-10 rule: a stream manages its own per-batch persists;
    * it never touches the global registry other queries share). */
  def contaminationSpansStream(docs: DataFrame, evalGrams: DataFrame,
      outDir: String): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    import graft.ops.Decontaminate
    val limit = evalGrams.sparkSession.conf
      .getOption("graft.setsim.broadcastBytes")
      .map(_.toLong).getOrElse(256L * 1024 * 1024)
    val sized =
      if (graft.ops.PlanStats.leafBytes(evalGrams) * 2 <= limit)
        broadcast(evalGrams)
      else evalGrams.hint("shuffle_hash")
    docs.writeStream.outputMode("append").foreachBatch {
      (batch: DataFrame, _: Long) =>
        val m = Decontaminate.trainGramPositions(
            batch.filter(col("source") =!= "src0")
              .select(col("doc_id"), col("source"), col("text")))
          .join(sized, Seq("gram"))
          .select(col("td"), col("ed"), col("pt"),
            (col("pt") - col("pe")).as("diag"))
          .persist()
        try Decontaminate.spanStatsOf(m, Decontaminate.SpanGram)
          .write.mode("append").parquet(outDir)
        finally m.unpersist(): Unit
    }
  }

  case class BDoc(doc_id: Long, source: String, n_tokens: Long)
  case class BudgetState(cum: Long)
  case class BVerdict(doc_id: Long, source: String, cum_tokens: Long,
      kept: Boolean)

  /** Streaming twin of the arrival-order budget intake
    * (Sampling.budgetIntakeDocs, q193): one O(1) cumulative-token
    * counter per source via flatMapGroupsWithState — the admission
    * gate a live ingest actually runs ("stop taking source X once its
    * budget fills"). Within a micro-batch rows sort by doc_id (the
    * arrival convention across the streaming twins); across batches
    * the id-ordered feed is the upstream contract, as in the
    * incremental-dedup twin. StreamingSpec asserts stream verdicts ==
    * batch verdicts on any chunking of the corpus — the counter
    * composes because addition is associative and the gate reads only
    * the prefix sum. */
  def budgetIntakeStateful(docs: org.apache.spark.sql.Dataset[BDoc],
      budgetTokens: Long): org.apache.spark.sql.Dataset[BVerdict] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import docs.sparkSession.implicits._
    docs.groupByKey(_.source)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout()) {
        (src: String, rows: Iterator[BDoc], state: GroupState[BudgetState]) =>
          var cum = state.getOption.map(_.cum).getOrElse(0L)
          val out = rows.toSeq.sortBy(_.doc_id).map { d =>
            cum += d.n_tokens
            BVerdict(d.doc_id, src, cum, cum <= budgetTokens)
          }
          state.update(BudgetState(cum))
          out.iterator
      }
  }

  /** Streaming twin of the quality-filter cascade funnel
    * (TextAnalysis.filterCascade, q151): every micro-batch scores its
    * documents with the SAME gate expressions (per-row decisions are
    * stateless, so chunking cannot flip any verdict) and folds the
    * per-source funnel counts into a parquet state table by additive
    * merge — the incrementalMoments shape. After any chunking of the
    * corpus the state equals the one-shot funnel exactly (counts are
    * associative+commutative sums; StreamingSpec asserts it). This is
    * the live curation dashboard a crawl ingest feeds.
    * Crash matrix (CdcStream.mergeAdditive): replays skip via the
    * promoted marker, a crashed batch's leftover stage is discarded,
    * a mid-swap crash restores the aside state copy. */
  def cascadeFunnelStream(docs: DataFrame, stateDir: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream.outputMode("append").foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        CdcStream.mergeAdditive(stateDir, batchId,
          graft.ops.TextAnalysis.filterCascadeDocs(
            batch.select(col("source"), col("text"))),
          Seq("source"))
    }

  /** Streaming twin of the collocation miner (TextAnalysis
    * .collocations, q202): every micro-batch reduces to its bigram
    * pair-count partial — pure additive counts, so the parquet state
    * merges by sum and any chunking of the corpus yields the SAME
    * state as one batch pass (associative+commutative, the
    * cascadeFunnelStream shape). Lift ranking is a READ over the
    * state (TextAnalysis.collocationsFromPairs), so the expensive
    * corpus explode is paid once per micro-batch over that batch
    * only; state is vocab²-bounded, never corpus-sized.
    * Crash matrix: the [[cascadeFunnelStream]] semantics (replay
    * skip, stage discard, aside recovery — CdcStream.mergeAdditive). */
  def collocationsStream(docs: DataFrame, stateDir: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream.outputMode("append").foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        CdcStream.mergeAdditive(stateDir, batchId,
          graft.ops.TextAnalysis.pairCountsOf(
            batch.select(col("text"))),
          Seq("w1", "w2"))
    }

  /** Streaming twin of the q214 calibration audit: per-doc margins
    * are independent, so the per-margin (n_docs, n_correct) counts
    * merge by sum and the state is chunking-invariant (≤ 7 rows
    * total — bins −1..5). The reliability diagram is a READ over the
    * state (TextAnalysis.calibrationFromCounts), never recomputed
    * from documents.
    * Crash matrix: the [[cascadeFunnelStream]] semantics (replay
    * skip, stage discard, aside recovery — CdcStream.mergeAdditive). */
  def calibrationStream(docs: DataFrame, stateDir: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream.outputMode("append").foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        CdcStream.mergeAdditive(stateDir, batchId,
          graft.ops.TextAnalysis.calibrationCounts(
            batch.select(col("doc_id"), col("text"), col("lang"))),
          Seq("margin"))
    }

  /** Streaming twin of the q207 BPE pair kernel: the weighted
    * adjacent-pair table is a sum over word occurrences, so per-batch
    * partials merge by (sym_a, sym_b) sum (chunking-invariant,
    * symbol²-bounded state — the collocationsStream shape) and the
    * merge RANKING — the artifact the q241 encode consumes — is a
    * read over the state via the same ordering the batch op uses.
    * A BPE trainer over a continuously-ingesting corpus keeps
    * exactly this state. */
  def bpePairStream(docs: DataFrame, stateDir: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream.outputMode("append").foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        bpePairProcessBatch(batch, batchId, stateDir)
    }

  /** Per-batch core of [[bpePairStream]]: additive count merges are
    * not replay-idempotent, so replayed micro-batches (batchId ≤ the
    * atomically-promoted marker) are skipped — the errorBurnStream
    * guard (ADVICE r11). Crash matrix: stage discard + aside
    * recovery per CdcStream.mergeAdditive. */
  private[graft] def bpePairProcessBatch(batch: DataFrame,
      batchId: Long, stateDir: String): Unit =
    CdcStream.mergeAdditive(stateDir, batchId,
      graft.ops.TextAnalysis.bpePairCounts(batch),
      Seq("sym_a", "sym_b"))

  /** Streaming twin of the ITERATIVE BPE trainer's corpus-sized step
    * (q255): the (w, freq) vocabulary counts are pure additive state
    * (chunking-invariant, vocab-bounded, replay-guarded), and the
    * trainer itself is a READ over the state —
    * `BpeIterative.trainFromCounts(read state)` produces the EXACT
    * merge table of a one-shot train over everything ingested
    * (StreamingSpec asserts full-table equality). This is how a
    * continuously-ingesting corpus keeps a retrainable tokenizer:
    * the rounds never touch the corpus, only this state.
    * Crash matrix: the [[cascadeFunnelStream]] semantics (replay
    * skip, stage discard, aside recovery — CdcStream.mergeAdditive). */
  def bpeVocabStream(docs: DataFrame, stateDir: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream.outputMode("append").foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        CdcStream.mergeAdditive(stateDir, batchId,
          graft.ops.BpeIterative.vocabCountsOf(
            batch.select(col("text"))),
          Seq("w"))
    }

  /** Streaming twin of the q237 boundary-stitch detector (the
    * phashDedupStream shape): corpus state is
    * [[graft.ops.Dedup.boundaryFeatures]] — head64/tail64/len per
    * seen doc, 128 chars of features, never the payload. Each
    * micro-batch emits the NEW stitch pairs involving batch docs
    * (batch heads vs all seen tails, and batch tails vs prior heads)
    * under the frequency caps of the CURRENT seen corpus, then
    * promotes the feature state crash-safe. The authoritative stitch
    * table is a READ over the state —
    * `boundaryStitchesFromFeatures(state, state)` — which equals the
    * batch op verbatim (parity spec), while the per-batch emissions
    * are the monitoring stream: a key that later crosses maxKeyFreq
    * was below it when its early pairs were emitted, so emissions are
    * a superset near the cap boundary and the state read is the
    * reconciliation (the round-4 end-of-load-reconciliation rule). */
  def boundaryStitchStream(docs: DataFrame, outDir: String,
      stateDir: String, maxKeyFreq: Long = 64L)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream.outputMode("append")
      .option("checkpointLocation", s"$stateDir.ckpt")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        boundaryProcessBatch(batch, batchId, outDir, stateDir, maxKeyFreq)
      }

  /** One micro-batch of [[boundaryStitchStream]], extracted so the
    * replay-idempotence spec can run the production body twice. */
  private[graft] def boundaryProcessBatch(batch: DataFrame,
      batchId: Long, outDir: String, stateDir: String,
      maxKeyFreq: Long): Unit = {
    val s = batch.sparkSession
    val dd = graft.ops.Dedup
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val bf = dd.boundaryFeatures(batch.select(col("doc_id"), col("text")))
      .persist(lvl)
    CdcStream.recoverState(stateDir)
    val prior: Option[DataFrame] =
      if (new java.io.File(stateDir).exists())
        Some(s.read.parquet(stateDir)
          .join(bf.select(col("doc_id")), Seq("doc_id"), "left_anti")
          .persist(lvl))
      else None
    val union = prior.fold(bf)(_.unionByName(bf)).persist(lvl)
    try {
      val fresh = prior match {
        case None => dd.boundaryStitchesFromFeatures(bf, bf, maxKeyFreq)
        case Some(p) =>
          dd.boundaryStitchesFromFeatures(union, bf, maxKeyFreq)
            .unionByName(dd.boundaryStitchesFromFeatures(bf, p, maxKeyFreq))
      }
      fresh.write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
      CdcStream.promoteState(stateDir, union.dropDuplicates("doc_id"))
    } finally {
      union.unpersist(); prior.foreach(_.unpersist()); bf.unpersist(): Unit
    }
  }

  /** Streaming twin of the incremental perceptual dedup
    * (graft.multimodal.Multimodal.phashIncremental, q204): new image
    * docs arrive as a stream; each is kept iff no STATIC-corpus
    * image, no earlier stream image, and no lower-id same-micro-batch
    * image sits within hamming `maxHamming` of its dHash. State holds
    * the bands of EVERY stream doc seen so far, kept AND dropped (the
    * EmbStream rule: hamming balls do not compose transitively, an
    * admitted-only state would diverge from the batch op). Under
    * id-ordered arrival the verdicts equal one q204 run over all rows
    * at once, with cross-micro-batch suppression landing in
    * dup_of_corpus instead of dup_of_batch (ids share one space —
    * least() of the two is the parity invariant, StreamingSpec).
    *
    * Scale shape: state is (doc_id, 4 ints) per seen doc — 64 bits
    * of perceptual hash, never payload bytes; each micro-batch pays
    * two band-keyed joins; state promotes crash-safe
    * (CdcStream.promoteState) and replay is value-idempotent (the
    * seen-state anti-joins the batch's own ids — a crash after
    * promote would otherwise drop every replayed doc against its own
    * state row at hamming 0). */
  def phashDedupStream(docs: DataFrame, dir: String, outDir: String,
      stateDir: String, maxHamming: Int = 3)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream.outputMode("append")
      .option("checkpointLocation", s"$stateDir.ckpt")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        phashProcessBatch(batch, batchId, dir, outDir, stateDir,
          maxHamming)
      }

  /** One micro-batch of [[phashDedupStream]], extracted so the
    * replay-idempotence spec can run the exact production body twice
    * against the same state. */
  private[graft] def phashProcessBatch(batch: DataFrame, batchId: Long,
      dir: String, outDir: String, stateDir: String,
      maxHamming: Int): Unit = {
    val s = batch.sparkSession
    val mm = graft.multimodal.Multimodal
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val bb = mm.phashBandsCols(batch.select(col("doc_id"), col("text")))
      .persist(lvl)
    val corpusBands = mm.phashBandsCols(
      graft.Tables.documents(s, dir)
        .filter(col("doc_id") % 3 === 0 && col("doc_id") < 300)
        .select(col("doc_id"), col("text")))
    CdcStream.recoverState(stateDir)
    val seen: Option[DataFrame] =
      if (new java.io.File(stateDir).exists())
        Some(s.read.parquet(stateDir)
          .join(bb.select(col("doc_id")), Seq("doc_id"), "left_anti"))
      else None
    val cb = seen.fold(corpusBands)(corpusBands.unionByName(_))
      .persist(lvl)
    try {
      mm.phashVerdicts(cb, bb, maxHamming)
        .write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
      val newSeen = seen.fold(bb)(_.unionByName(bb))
        .dropDuplicates("doc_id")
      CdcStream.promoteState(stateDir, newSeen)
    } finally { cb.unpersist(); bb.unpersist(): Unit }
  }
}
