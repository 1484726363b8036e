package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Eval-set decontamination + incremental dedup — the two corpus
  * maintenance ops a continuously-ingesting training-data pipeline
  * needs beyond one-shot dedup.
  *
  * Both reuse the winnowing/minhash machinery and keep the 100 TB
  * shape: the corpus side is reduced to (fingerprint, id) pairs once;
  * the small side (eval set, daily increment) broadcasts or
  * bucket-joins against it. Documents never shuffle — ids and 8-byte
  * fingerprints do.
  */
object Decontaminate {

  /** Training docs sharing at least `minShared` winnowing fingerprints
    * with any eval doc — the n-gram-overlap contamination definition.
    * Winnowing guarantees any shared run of ≥ 15 bytes (w=8 windows of
    * 8-byte shingles) produces a shared fingerprint. */
  def contaminated(corpus: DataFrame, evalSet: DataFrame,
      minShared: Int = 2): DataFrame = {
    val corpusFp = TextAnalysis.winnowed(corpus)
      .select(col("doc_id"), explode(col("fingerprints")).as("fp"))
    val evalFp = TextAnalysis.winnowed(evalSet)
      .select(explode(col("fingerprints")).as("fp")).distinct()
    corpusFp.join(broadcast(evalFp), Seq("fp"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shared_fps"))
      .filter(col("n_shared_fps") >= minShared)
  }

  /** Remove contaminated docs from the corpus. */
  def decontaminate(corpus: DataFrame, evalSet: DataFrame,
      minShared: Int = 2): DataFrame =
    corpus.join(contaminated(corpus, evalSet, minShared)
      .select("doc_id"), Seq("doc_id"), "left_anti")

  /** Per-document eval-overlap FRACTION (q173): what share of a
    * training document's distinct token trigrams also occur in the
    * eval set (source src0, the q51 convention) — the GPT-3-style
    * contamination SCORE (Brown et al. 2020, arXiv:2005.14165,
    * appendix C measures n-gram overlap against evals; the n here is
    * the repo's shared trigram convention, q149/q163, so the gram
    * definition cannot drift between the LM and the contamination
    * screen). q51 answers "is this doc contaminated?" (winnow
    * membership, run-length guarantee); this answers "HOW MUCH of it
    * overlaps" — the number a filtering threshold is calibrated on.
    * Integer ppm output: overlap_ppm = shared·1e6 div distinct.
    *
    * Scale shape: the corpus side reduces to distinct (doc_id, gram)
    * pairs once; the EVAL gram set is small by nature and usually
    * broadcasts (the [[contaminated]] asymmetry) — but "small by
    * nature" is a labeling convention, not a structural bound, so the
    * join is SIZE-CONDITIONAL (the fluencyScores leaf-stats rule): a
    * mislabeled corpus-sized eval source degrades to a shuffle_hash
    * join instead of pinning an OOM-sized broadcast. One left join +
    * one doc-keyed aggregate. Docs under 3 tokens have no row. */
  def evalOverlapScore(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame =
    evalOverlapScoreOn(graft.Tables.documents(spark, dir))

  /** Frame-based core of [[evalOverlapScore]] over documents
    * (doc_id, source, text); `evalSource` names the eval share. */
  def evalOverlapScoreOn(docs: DataFrame,
      evalSource: String = "src0"): DataFrame = {
    val tri = Ranking.trigramFrame(docs).distinct()
    val withSrc = tri
      .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
    val evalGrams = withSrc.filter(col("source") === evalSource)
      .select(col("ngram")).distinct().withColumn("hit", lit(1L))
    // Leaf-stats sizing (the Ranking.fluencyScores rule verbatim): the
    // eval gram set is bounded by ~3x the source text bytes (each
    // token starts at most one trigram; x3 covers parquet string
    // compression). Filter selectivity is unknowable without CBO
    // stats, so the WHOLE corpus leaf mass is the conservative bound —
    // under the limit broadcast; above it (or with no measurable
    // leaf) shuffle_hash, never an unbounded broadcast on a guess.
    val limit = docs.sparkSession.conf
      .getOption("graft.setsim.broadcastBytes")
      .map(_.toLong).getOrElse(256L * 1024 * 1024)
    val estBytes = PlanStats.leafBytes(docs) * 3
    val evalSized =
      if (estBytes <= limit) broadcast(evalGrams)
      else evalGrams.hint("shuffle_hash")
    withSrc.filter(col("source") =!= evalSource)
      .join(evalSized, Seq("ngram"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tri"),
        sum(coalesce(col("hit"), lit(0L))).as("n_shared"))
      .select(col("doc_id"), col("n_tri"), col("n_shared"),
        expr("n_shared * 1000000 div n_tri").as("overlap_ppm"))
      .orderBy(col("doc_id"), col("n_tri"), col("n_shared"),
        col("overlap_ppm"))
  }

  /** DuckDB oracle for [[evalOverlapScore]] — the q149 trigram CTEs,
    * distinct per doc, split by source, left-joined. */
  val evalOverlapOracleSql: String =
    """WITH toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS s FROM documents
      |), tg AS (
      |  SELECT doc_id, unnest(list_transform(range(1, len(s) - 1),
      |    i -> s[i] || ' ' || s[i + 1] || ' ' || s[i + 2])) AS ngram
      |  FROM toks
      |), dtg AS (
      |  SELECT DISTINCT doc_id, ngram FROM tg
      |), ev AS (
      |  SELECT DISTINCT dtg.ngram FROM dtg
      |  JOIN documents d ON d.doc_id = dtg.doc_id
      |  WHERE d.source = 'src0'
      |), raw AS (
      |  SELECT dtg.doc_id, dtg.ngram FROM dtg
      |  JOIN documents d ON d.doc_id = dtg.doc_id
      |  WHERE d.source <> 'src0'
      |)
      |SELECT raw.doc_id, COUNT(*) AS n_tri,
      |  CAST(SUM(CASE WHEN ev.ngram IS NOT NULL THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_shared,
      |  CAST(SUM(CASE WHEN ev.ngram IS NOT NULL THEN 1 ELSE 0 END)
      |    * 1000000 // COUNT(*) AS BIGINT) AS overlap_ppm
      |FROM raw LEFT JOIN ev ON raw.ngram = ev.ngram
      |GROUP BY raw.doc_id
      |ORDER BY doc_id, n_tri, n_shared, overlap_ppm""".stripMargin

  /** Split-leakage audit (q194): for every VAL/TEST document of the
    * q89 content-hash split, what share of its distinct trigrams also
    * occurs on the TRAIN side — the audit that certifies a split
    * BEFORE eval numbers are trusted. q171 prevents near-dup
    * straddle by construction (cluster-consistent split); this
    * MEASURES the residual n-gram leakage any split still has
    * (shared boilerplate, common phrases, genuine near-copies a
    * cluster threshold missed) and localizes it per held-out
    * document. High leak_ppm on a val doc means its eval loss is
    * partly memorization. The split is replayed in the oracle
    * (FNV+splitmix content bucket, HashSql.groupSplitCtes), so the
    * verdict covers the split rule itself, not just the overlap
    * arithmetic.
    *
    * Scale shape: the q173 shape with the split as the partition —
    * corpus reduces to distinct (doc, gram) pairs once; the train
    * gram set is ~80% of the corpus, so the join is SIZE-CONDITIONAL
    * from the start (shuffle_hash is the expected branch at scale —
    * unlike q173's naturally-small eval side). */
  def splitLeakage(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame =
    splitLeakageOn(graft.Tables.documents(spark, dir))

  /** Frame-based core of [[splitLeakage]] (needs doc_id, text). */
  def splitLeakageOn(docs: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val (_, split) = Sampling.groupSplit(col("text"))
    val withSplit = docs.select(col("doc_id"), col("text"),
      split.as("split"))
    val tri = Ranking.trigramFrame(withSplit).distinct()
    val lab = tri.join(withSplit.select(col("doc_id"), col("split")),
      Seq("doc_id"))
    val trainGrams = lab.filter(col("split") === "train")
      .select(col("ngram")).distinct().withColumn("hit", lit(1L))
    val limit = docs.sparkSession.conf
      .getOption("graft.setsim.broadcastBytes")
      .map(_.toLong).getOrElse(256L * 1024 * 1024)
    val estBytes = PlanStats.leafBytes(docs) * 3
    val trainSized =
      if (estBytes <= limit) broadcast(trainGrams)
      else trainGrams.hint("shuffle_hash")
    lab.filter(col("split") =!= "train")
      .join(trainSized, Seq("ngram"), "left")
      .groupBy(col("doc_id"), col("split"))
      .agg(count(lit(1)).as("n_tri"),
        sum(coalesce(col("hit"), lit(0L))).as("n_shared"))
      .select(col("doc_id"), col("split"), col("n_tri"), col("n_shared"),
        expr("n_shared * 1000000 div n_tri").as("leak_ppm"))
      .orderBy(col("doc_id"), col("split"), col("n_tri"),
        col("n_shared"), col("leak_ppm"))
  }

  /** DuckDB oracle for [[splitLeakage]] — the groupSplit replay +
    * the q173 trigram CTEs, split-partitioned. */
  val splitLeakageOracleSql: String =
    s"""WITH ${HashSql.groupSplitCtes},
       |sp AS (
       |  SELECT doc_id, ${HashSql.splitCase()} AS split FROM spb),
       |toks AS (
       |  SELECT doc_id, string_split(text, ' ') AS s FROM documents
       |), tg AS (
       |  SELECT doc_id, unnest(list_transform(range(1, len(s) - 1),
       |    i -> s[i] || ' ' || s[i + 1] || ' ' || s[i + 2])) AS ngram
       |  FROM toks
       |), dtg AS (
       |  SELECT DISTINCT doc_id, ngram FROM tg
       |), lab AS (
       |  SELECT dtg.doc_id, dtg.ngram, sp.split
       |  FROM dtg JOIN sp ON sp.doc_id = dtg.doc_id
       |), tr AS (
       |  SELECT DISTINCT ngram FROM lab WHERE split = 'train'
       |)
       |SELECT l.doc_id, l.split, COUNT(*) AS n_tri,
       |  CAST(SUM(CASE WHEN tr.ngram IS NOT NULL THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_shared,
       |  CAST(SUM(CASE WHEN tr.ngram IS NOT NULL THEN 1 ELSE 0 END)
       |    * 1000000 // COUNT(*) AS BIGINT) AS leak_ppm
       |FROM lab l LEFT JOIN tr ON tr.ngram = l.ngram
       |WHERE l.split <> 'train'
       |GROUP BY l.doc_id, l.split
       |ORDER BY doc_id, split, n_tri, n_shared, leak_ppm""".stripMargin

  /** Incremental near-dedup: which NEW docs near-duplicate the
    * EXISTING corpus. The corpus side is its (band, hash) index —
    * computed once and persisted in practice; the increment's bands
    * join against it, then candidates verify with exact Jaccard.
    * Returns (new_doc_id, corpus_doc_id, jaccard).
    *
    * `exact = true` swaps the MinHash-LSH candidate generator for the
    * PPJoin prefix-filter path ([[Dedup.setSimJoinIncremental]]): no
    * banding recall question — EVERY qualifying pair is found (LSH
    * can miss a pair whose bands all straddle the threshold; the
    * degenerate-bucket cap can drop a cluster member). Same corpus-
    * side asymmetry (the frequency order is the precomputed index-
    * side statistic), same id-only candidate shape at 100 TB. The two
    * modes answer the same question over the same 8-gram shingle
    * sets, so on any corpus exact ⊇ LSH-verified pairs
    * (DecontaminateSpec pins equality on planted fixtures). */
  def incrementalNearDups(corpusIndexed: DataFrame, newDocs: DataFrame,
      minJaccard: Double, exact: Boolean = false): DataFrame = {
    if (exact) {
      return Dedup.setSimJoinIncremental(corpusIndexed, "doc_id",
          newDocs, "doc_id", math.round(minJaccard * 1000000))
        .select(col("new_doc_id"), col("corpus_doc_id"),
          round(col("jaccard_ppm").cast("double") / 1e6, 6).as("jaccard"))
    }
    // each side's signatures are referenced from two plan branches
    // (banding, estimate-prune) — materialize each ONCE so the corpus
    // is shingled once (Dedup.signatureTable); exact verify fetches
    // texts by id and shingles survivors only
    val corpusSigs = Dedup.signatureTable(corpusIndexed, "doc_id")
    val newSigs = Dedup.signatureTable(newDocs, "doc_id")
    // shared banding scheme + estimate-prune discipline (Dedup.bandedIds/
    // estimatePrune): band join carries ids only; only estimate
    // survivors pay for the full shingle arrays.
    // Degenerate-bucket guard (Dedup.MaxBucket): a mega-bucket on the
    // corpus side (10k-copy boilerplate cluster) would multiply every
    // matching new doc by the whole cluster; keep the maxBucket
    // smallest ids per bucket — a new doc near the cluster still
    // matches its retained representatives
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("band_id"), col("band_hash"))
      .orderBy(col("corpus_doc_id"))
    val cappedCorpusBands = Dedup.bandedIds(
        corpusSigs.select(col("doc_id"), col("sig")), "corpus_doc_id")
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= Dedup.MaxBucket).drop("__rn")
    val candidates = Dedup.bandedIds(
        newSigs.select(col("doc_id"), col("sig")), "new_doc_id")
      .join(cappedCorpusBands, Seq("band_id", "band_hash"))
      .select("new_doc_id", "corpus_doc_id")
      .dropDuplicates("new_doc_id", "corpus_doc_id")
    val pruned = Dedup.estimatePrune(candidates, newSigs, corpusSigs,
      "new_doc_id", "corpus_doc_id", minJaccard)
    Dedup.exactVerify(pruned, newDocs, "doc_id", "new_doc_id",
      corpusIndexed, "doc_id", "corpus_doc_id", minJaccard)
  }

  /** Token n-gram length used by the span audit: 8 keeps published
    * decontamination practice (GPT-3 app. C uses 8–13-gram matches)
    * while this corpus's ≤100-token documents still carry enough
    * grams per doc to measure runs. */
  val SpanGram = 8

  /** Bytes one matched-position row ships on the run-grouping
    * exchange: (td, ed, pt, pe/diag) as four longs + the shuffle
    * row overhead (the q262→byte-gate conversion convention,
    * Multimodal's 104 B fixed-width pricing). */
  private val SpanRowBytes = 56L

  /** Positional token n-gram stream: one interpreted `transform` over
    * the split (the Ranking.trigramFrame single-generator rule — a
    * posexplode + (n−1)-lead window would plan a per-doc Exchange),
    * 1-based start positions. Docs under n tokens contribute no row. */
  private[graft] def gramPosFrame(docs: DataFrame, n: Int): DataFrame = {
    // one native pass (graft.functions.WordGrams) — bit-identical
    // gram strings to the interpreted transform/concat_ws lambda it
    // replaced (WordGramsSpec; the Ranking.trigramFrame swap)
    graft.functions.GraftFunctions.register(docs.sparkSession)
    docs
      .select(col("doc_id"), col("source"),
        posexplode(call_function("word_grams", col("text"), lit(n),
          lit(false))).as(Seq("p0", "gram")))
      .select(col("doc_id"), col("source"),
        (col("p0") + 1L).cast("long").as("pos"), col("gram"))
  }

  /** Contamination SPANS (q265): the longest run of consecutive
    * matched token 8-grams each training document shares with the
    * eval set — the "how LONG is the contaminated passage" audit of
    * published decontamination practice (GPT-3, Brown et al. 2020
    * app. C reports longest-match statistics; PaLM and Llama audits
    * follow it). q51 answers membership (winnow fingerprints), q173
    * answers the overlap FRACTION; this localizes contamination as a
    * maximal contiguous span, the number an "is this a verbatim eval
    * leak or shared boilerplate?" triage reads. A matched diagonal
    * (pos_train − pos_eval constant) with consecutive train positions
    * is exactly a shared token run of length run_grams + 7.
    *
    * Scale shape: the corpus side streams through one narrow explode
    * (never cached — the q149 shingle rule); the eval side is
    * leaf-stats-sized (broadcast under the limit, shuffle_hash
    * above — the evalOverlapScoreOn rule verbatim). Only MATCHED
    * positions reach the run-grouping window, keyed by (train doc,
    * eval doc, diagonal) — at a sane contamination rate that is a
    * vanishing fraction of the corpus. The matched frame feeds two
    * consumers (run window + per-doc distinct counts) so it is
    * register-persisted (the q146 multi-consumer rule). The opt-in
    * `graft.decontam.maxExchangeBytes` gate prices the matched-row
    * exchange as Σ_g cT(g)·cE(g) × 56 B BEFORE the join fans out
    * (the q259 "price it, then run it" family; planted −1 spec). */
  def contaminationSpans(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame =
    contaminationSpansOn(graft.Tables.documents(spark, dir))

  /** The eval side of the span match as a reusable feature frame
    * (ed, pe, gram) — the precomputed/persisted artifact a deployed
    * stream joins against (the persisted-artifact pattern: build the
    * frozen eval features ONCE, not per micro-batch). */
  def evalGramPositions(evalDocs: DataFrame,
      n: Int = SpanGram): DataFrame =
    gramPosFrame(evalDocs, n)
      .select(col("doc_id").as("ed"), col("pos").as("pe"), col("gram"))

  /** The train side of the span match: (td, pt, gram). */
  private[graft] def trainGramPositions(trainDocs: DataFrame,
      n: Int = SpanGram): DataFrame =
    gramPosFrame(trainDocs, n)
      .select(col("doc_id").as("td"), col("pos").as("pt"), col("gram"))

  /** Run statistics over a MATCHED-position frame m = (td, ed, pt,
    * diag): diagonal lag/run-id windows, two-level max, per-doc
    * distinct counts, the shared tail of the batch face and the
    * streaming twin (so the run rule cannot drift). `m` is consumed
    * twice — callers persist it (register-persist in the batch face,
    * a local per-micro-batch persist in the stream). Returns UNSORTED
    * rows — the oracle-checked faces append their own orderBy (the
    * stream writes order-free parquet and q268 joins the stats onto
    * its batch spine, where an inner global sort would be waste). */
  private[graft] def spanStatsOf(m: DataFrame, n: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("td"), col("ed"), col("diag"))
      .orderBy(col("pt"))
    val runs = m
      .withColumn("brk",
        when(col("pt") - lag(col("pt"), 1).over(w) === 1L, 0L)
          .otherwise(1L))
      .withColumn("rn", sum(col("brk")).over(w))
      .groupBy(col("td"), col("ed"), col("diag"), col("rn"))
      .agg(count(lit(1)).as("rl"))
      .groupBy(col("td")).agg(max(col("rl")).as("max_run"))
    val docStats = m.groupBy(col("td"))
      .agg(countDistinct(col("pt")).as("n_matched_grams"),
        countDistinct(col("ed")).as("n_eval_docs"))
    docStats.join(runs, Seq("td"))
      .select(col("td").as("doc_id"),
        col("n_matched_grams").cast("long").as("n_matched_grams"),
        col("n_eval_docs").cast("long").as("n_eval_docs"),
        (col("max_run") + lit(n - 1).cast("long")).cast("long")
          .as("max_span_tokens"),
        (col("max_run") + lit(n - 1).cast("long") >= 13L).as("flagged"))
  }

  /** Shared gate + sizing + match core: the budget-priced, register-
    * persisted matched-position frame (td, ed, pt, diag) for a train
    * slice against the eval docs. q265 passes the whole train corpus,
    * q268 its ingest batch — same gate conf, same sizing rule, same
    * priced row. */
  private def spanMatched(docs: DataFrame, trainDocs: DataFrame,
      evalDocs: DataFrame, gateName: String, n: Int): DataFrame = {
    val train = trainGramPositions(trainDocs, n)
    val evalG = evalGramPositions(evalDocs, n)
    docs.sparkSession.conf.getOption("graft.decontam.maxExchangeBytes")
      .map(_.toLong).foreach { budget =>
        val (slots, mx) = Dedup.joinSlots(
          train.select(col("gram").as("g64")),
          evalG.select(col("gram").as("g64")))
        Dedup.failBudget(gateName,
          "graft.decontam.maxExchangeBytes", budget, slots, mx,
          SpanRowBytes)
      }
    // eval-side sizing: each token starts at most one n-gram and the
    // gram string carries ~n tokens, so the gram table is bounded by
    // ~n× the text bytes; ×10 total covers parquet string compression
    // at n=8 (the evalOverlapScoreOn leaf-stats rule — whole-corpus
    // leaf mass as the conservative bound, shuffle_hash over the
    // limit, never an unbounded broadcast on a guess).
    val limit = docs.sparkSession.conf
      .getOption("graft.setsim.broadcastBytes")
      .map(_.toLong).getOrElse(256L * 1024 * 1024)
    val estBytes = PlanStats.leafBytes(docs) * 10
    val evalSized =
      if (estBytes <= limit) broadcast(evalG) else evalG.hint("shuffle_hash")
    // matched rows only: (td, ed, pt, diag) — pe is recoverable as
    // pt − diag and never read, so it stays off the persist and the
    // priced exchange (the 4-long row SpanRowBytes prices)
    Dedup.register(train.join(evalSized, Seq("gram"))
      .select(col("td"), col("ed"), col("pt"),
        (col("pt") - col("pe")).as("diag"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
  }

  /** Frame-based core of [[contaminationSpans]] (needs doc_id,
    * source, text). */
  def contaminationSpansOn(docs: DataFrame,
      evalSource: String = "src0", n: Int = SpanGram): DataFrame = {
    val m = spanMatched(docs,
      docs.filter(col("source") =!= evalSource),
      docs.filter(col("source") === evalSource),
      "contamination-span", n)
    spanStatsOf(m, n)
      .orderBy(col("doc_id"), col("n_matched_grams"),
        col("n_eval_docs"), col("max_span_tokens"), col("flagged"))
  }

  /** DEPLOYED daily face of the span audit (q268): the q265 span
    * statistics for the newest-10%-of-ids ingest batch ONLY (the
    * q266/q191/q254 split convention, cutoff re-derived by the
    * oracle), against the frozen eval set — the q264 pattern applied
    * to the span family: q265 is the full-corpus oracle face, this is
    * the row a daily ingest gate actually reads. Emits ALL batch
    * train docs with zero-filled statistics for unmatched ones, so
    * the row count is |batch| — scale-proof (the ADVICE r14
    * spine-join rule), and never a vacuous 0-row green when the
    * ingest slice happens to be clean (the q246 bug class; on
    * shard-isomorph rehearsal corpora the batch is content-disjoint
    * from eval at 10×+, so matched stats legitimately go to zero
    * there while the spine keeps |batch| rows).
    *
    * Scale shape: one gram explode over the BATCH (corpus/10), one
    * over eval; same size-conditional eval join and the same
    * `graft.decontam.maxExchangeBytes` gate as q265, pricing the
    * batch-side (deployed marginal) slot volume. The stats join back
    * to the spine is id-keyed counts, never text. */
  def spanAuditIncremental(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame = {
    val docs = graft.Tables.documents(spark, dir)
    val cutoff =
      (docs.agg(max(col("doc_id"))).head().getLong(0) + 1L) * 9L / 10L
    spanAuditOn(docs, col("doc_id") >= cutoff)
  }

  /** Frame-based core of [[spanAuditIncremental]]: span stats for the
    * `isBatch` train slice, left-joined onto the batch spine with
    * zero fill. */
  def spanAuditOn(docs: DataFrame,
      isBatch: org.apache.spark.sql.Column,
      evalSource: String = "src0", n: Int = SpanGram): DataFrame = {
    val batchTrain =
      docs.filter(isBatch && col("source") =!= evalSource)
    val m = spanMatched(docs, batchTrain,
      docs.filter(col("source") === evalSource),
      "span-audit-incremental", n)
    batchTrain.select(col("doc_id")).distinct()
      .join(spanStatsOf(m, n), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_matched_grams"), lit(0L)).as("n_matched_grams"),
        coalesce(col("n_eval_docs"), lit(0L)).as("n_eval_docs"),
        coalesce(col("max_span_tokens"), lit(0L)).as("max_span_tokens"),
        coalesce(col("flagged"), lit(false)).as("flagged"))
      .orderBy(col("doc_id"), col("n_matched_grams"),
        col("n_eval_docs"), col("max_span_tokens"), col("flagged"))
  }

  /** Shared DuckDB CTE chain for the span-family oracles: tokenize,
    * positional n-grams via half-open `range` (start positions
    * 1..len−n+1), the same diagonal lag/run-id windows, two-level
    * max-run aggregate. `prefixCte` is prepended (q268's `cut`);
    * `trainPred` additionally filters the train side of the match
    * (q265 passes TRUE, q268 the re-derived ingest cutoff). The
    * caller appends its final SELECT over ds/mx. The gram join
    * doubles as the completeness gate (q126's rule): a dropped
    * matched position = a shorter run = a hash mismatch. */
  private def spanOracleChain(n: Int, prefixCte: String,
      trainPred: String): String =
    s"""WITH $prefixCte toks AS (
       |  SELECT doc_id, source, string_split(text, ' ') AS s FROM documents
       |), g AS (
       |  SELECT doc_id, source, unnest(range(1, len(s) - ${n - 2})) AS pos, s
       |  FROM toks
       |), gg AS (
       |  SELECT doc_id, source, pos,
       |    list_aggregate(s[pos:pos + ${n - 1}], 'string_agg', ' ') AS gram
       |  FROM g
       |), m AS (
       |  SELECT t.doc_id AS td, e.doc_id AS ed, t.pos AS pt,
       |    t.pos - e.pos AS diag
       |  FROM gg t JOIN gg e ON t.gram = e.gram
       |  WHERE t.source <> 'src0' AND e.source = 'src0' AND ($trainPred)
       |), r AS (
       |  SELECT td, ed, diag, pt,
       |    CASE WHEN pt - lag(pt) OVER (PARTITION BY td, ed, diag
       |      ORDER BY pt) = 1 THEN 0 ELSE 1 END AS brk
       |  FROM m
       |), rid AS (
       |  SELECT td, ed, diag, pt,
       |    SUM(brk) OVER (PARTITION BY td, ed, diag ORDER BY pt) AS rn
       |  FROM r
       |), runs AS (
       |  SELECT td, ed, diag, rn, COUNT(*) AS rl FROM rid
       |  GROUP BY td, ed, diag, rn
       |), mx AS (
       |  SELECT td, MAX(rl) AS max_run FROM runs GROUP BY td
       |), ds AS (
       |  SELECT td, COUNT(DISTINCT pt) AS n_matched_grams,
       |    COUNT(DISTINCT ed) AS n_eval_docs
       |  FROM m GROUP BY td
       |)""".stripMargin

  /** DuckDB oracle for [[contaminationSpans]]. */
  def contaminationSpansOracleSql(n: Int = SpanGram): String =
    s"""${spanOracleChain(n, "", "TRUE")}
       |SELECT ds.td AS doc_id,
       |  CAST(ds.n_matched_grams AS BIGINT) AS n_matched_grams,
       |  CAST(ds.n_eval_docs AS BIGINT) AS n_eval_docs,
       |  CAST(mx.max_run + ${n - 1} AS BIGINT) AS max_span_tokens,
       |  (mx.max_run + ${n - 1} >= 13) AS flagged
       |FROM ds JOIN mx ON mx.td = ds.td
       |ORDER BY doc_id, n_matched_grams, n_eval_docs, max_span_tokens,
       |  flagged""".stripMargin

  /** DuckDB oracle for [[spanAuditIncremental]]: the q265 chain with
    * the train side cut to the newest-10% ingest batch (cutoff
    * re-derived from the data — the autoK rule), left-joined onto the
    * batch-doc spine with zero fill so the row count is |batch|. */
  def spanAuditIncrOracleSql(n: Int = SpanGram): String =
    s"""${spanOracleChain(n,
          "cut AS (SELECT (MAX(doc_id) + 1) * 9 // 10 AS c" +
            " FROM documents),",
          "t.doc_id >= (SELECT c FROM cut)")},
       |spine AS (
       |  SELECT DISTINCT doc_id FROM documents
       |  WHERE source <> 'src0' AND doc_id >= (SELECT c FROM cut)
       |)
       |SELECT spine.doc_id,
       |  CAST(COALESCE(ds.n_matched_grams, 0) AS BIGINT) AS n_matched_grams,
       |  CAST(COALESCE(ds.n_eval_docs, 0) AS BIGINT) AS n_eval_docs,
       |  CAST(COALESCE(mx.max_run + ${n - 1}, 0) AS BIGINT)
       |    AS max_span_tokens,
       |  COALESCE(mx.max_run + ${n - 1} >= 13, FALSE) AS flagged
       |FROM spine LEFT JOIN ds ON ds.td = spine.doc_id
       |  LEFT JOIN mx ON mx.td = spine.doc_id
       |ORDER BY doc_id, n_matched_grams, n_eval_docs, max_span_tokens,
       |  flagged""".stripMargin

  /** Decontamination pre-flight (q267): the q259 "price it, then run
    * it" forecast face of the `graft.decontam.maxExchangeBytes` gate,
    * swept over candidate gram lengths. Per n ∈ {3, 5, 8}: the number
    * of distinct shared grams, the matched-position join slots
    * Σ_g cT(g)·cE(g) — EXACTLY the rows the q265 match join processes
    * before any run grouping — the hottest gram's slot share, and the
    * exchange estimate at the 56-B matched row. This is how a
    * deployment picks the gram length from DATA instead of folklore:
    * at this corpus the sweep reads ~119k slots for trigrams vs ~1.2k
    * for 8-grams at sf0.1 — the longer gram IS the fanout throttle,
    * and the row that proves it costs three linear scans, zero pairs.
    *
    * Scale shape: per swept n, two gram-keyed counts and one keyed
    * join of count tables (gram-distinct-sized, not position-sized);
    * a fixed 3-row output spine whatever the corpus (agg-without-
    * groupBy rows coalesced to 0 — the ADVICE r15 scale-proof rule). */
  def decontamPreflight(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame =
    decontamPreflightOn(graft.Tables.documents(spark, dir))

  /** Frame-based core of [[decontamPreflight]]. One gram explode per
    * swept n with per-side CONDITIONAL counts (the r13 one-scan
    * sweep rule) — a filter-per-side pair would re-run the explode
    * twice per n. */
  def decontamPreflightOn(docs: DataFrame,
      evalSource: String = "src0",
      ns: Seq[Int] = Seq(3, 5, 8)): DataFrame = {
    def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    val perN = ns.map { n =>
      gramPosFrame(docs, n)
        .groupBy(col("gram"))
        .agg(sum(when(col("source") =!= evalSource, 1L).otherwise(0L))
            .as("ct"),
          sum(when(col("source") === evalSource, 1L).otherwise(0L))
            .as("ce"))
        .filter(col("ct") > 0L && col("ce") > 0L)
        .agg(count(lit(1)).as("__sg"),
          sum(dec(col("ct")) * dec(col("ce"))).as("__sl"),
          max(dec(col("ct")) * dec(col("ce"))).as("__mx"))
        .select(lit(n.toLong).as("gram_n"),
          col("__sg").cast("long").as("shared_grams"),
          expr("CAST(coalesce(__sl, 0) AS BIGINT)").as("match_slots"),
          expr("CAST(coalesce(__mx, 0) AS BIGINT)").as("max_gram_slots"))
    }
    perN.reduce(_.unionByName(_))
      .select(col("gram_n"), col("shared_grams"), col("match_slots"),
        col("max_gram_slots"),
        expr("CASE WHEN match_slots = 0 THEN 0L " +
          "ELSE CAST(CAST(max_gram_slots AS DECIMAL(38,0)) * 1000000 " +
          "div match_slots AS BIGINT) END").as("top_gram_ppm"),
        expr(s"CAST(CAST(match_slots AS DECIMAL(38,0)) * $SpanRowBytes " +
          "AS BIGINT)").as("est_exchange_bytes"))
      .orderBy(col("gram_n"), col("shared_grams"), col("match_slots"),
        col("max_gram_slots"), col("top_gram_ppm"),
        col("est_exchange_bytes"))
  }

  /** DuckDB oracle for [[decontamPreflight]]: per swept n, the gram
    * CTEs + count-table join, unioned over the fixed n spine. */
  def decontamPreflightOracleSql(ns: Seq[Int] = Seq(3, 5, 8)): String = {
    val blocks = ns.map { n =>
      s"""SELECT $n AS gram_n, COUNT(*) AS sg,
         |  SUM(ct.c * ce.c) AS sl, MAX(ct.c * ce.c) AS mx
         |FROM (
         |  SELECT gram, COUNT(*)::HUGEINT AS c FROM (
         |    SELECT list_aggregate(s[pos:pos + ${n - 1}], 'string_agg', ' ') AS gram
         |    FROM (SELECT source, unnest(range(1, len(s) - ${n - 2})) AS pos, s
         |          FROM (SELECT source, string_split(text, ' ') AS s
         |                FROM documents) t0) t1
         |    WHERE source <> 'src0') t2 GROUP BY gram) ct
         |JOIN (
         |  SELECT gram, COUNT(*)::HUGEINT AS c FROM (
         |    SELECT list_aggregate(s[pos:pos + ${n - 1}], 'string_agg', ' ') AS gram
         |    FROM (SELECT source, unnest(range(1, len(s) - ${n - 2})) AS pos, s
         |          FROM (SELECT source, string_split(text, ' ') AS s
         |                FROM documents) e0) e1
         |    WHERE source = 'src0') e2 GROUP BY gram) ce
         |ON ct.gram = ce.gram""".stripMargin
    }
    s"""WITH raw AS (
       |${blocks.mkString("\n", "\nUNION ALL\n", "\n")})
       |SELECT gram_n, CAST(sg AS BIGINT) AS shared_grams,
       |  CAST(COALESCE(sl, 0) AS BIGINT) AS match_slots,
       |  CAST(COALESCE(mx, 0) AS BIGINT) AS max_gram_slots,
       |  CAST(CASE WHEN COALESCE(sl, 0) = 0 THEN 0
       |    ELSE COALESCE(mx, 0) * 1000000 // sl END AS BIGINT)
       |    AS top_gram_ppm,
       |  CAST(COALESCE(sl, 0) * $SpanRowBytes AS BIGINT)
       |    AS est_exchange_bytes
       |FROM raw
       |ORDER BY gram_n, shared_grams, match_slots, max_gram_slots,
       |  top_gram_ppm, est_exchange_bytes""".stripMargin
  }

  /** Incremental decontamination screen (q266): the DEPLOYED daily
    * face of q51 — every training document of the newest-10%-of-ids
    * ingest batch (the q191/q254 split convention, cutoff re-derived
    * by the oracle) reported with its shared-winnow-fingerprint count
    * against the FROZEN eval set, its shared FRACTION in integer ppm,
    * and a quarantine verdict. Emitting ALL batch docs (clean ones at
    * 0) keeps the row count scale-proof (|batch| — the ADVICE r14
    * spine-join rule): one verdict row per ingested document.
    *
    * The verdict is deliberately RELATIVE — the batch's nearest-rank
    * p90 of shared_ppm, re-derived from the data by the oracle (the
    * autoK rule) — because the measured absolute overlap distribution
    * drifts a full 300k ppm across two growth decades (batch median
    * 623k at 1×, 940k at 100×: a bigger eval set shares more
    * fingerprints with everything, so any fixed cut goes uniform at
    * some scale — the q246/q192 vacuous-constant bug class). A
    * deployed daily screen triages the worst decile of each ingest
    * for review; the per-doc COUNTS face
    * ([[contaminationCountsOn]]) stays absolute, per-doc independent,
    * and is what the stateless streaming twin
    * (DocStream.contaminationScreenStream) emits.
    *
    * Scale shape: the batch side pays one winnow pass; the eval
    * fingerprint set is ~2/(W+1) of the eval text positions and is
    * leaf-stats SIZE-CONDITIONAL (broadcast under the limit,
    * shuffle_hash above — the evalOverlapScoreOn rule; here too
    * "small by nature" is a labeling convention, and this corpus's
    * src0 share scales with the corpus). The p90 threshold is computed
    * on the ppm VALUE GRID (≤ 1e6+1 rows whatever the corpus — a
    * domain-bounded global window, the census-allowlisted class),
    * never a batch-sized window or TakeOrdered. Documents never
    * shuffle — 8-byte fingerprints, ids and counts do. */
  def decontamIncremental(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame = {
    val docs = graft.Tables.documents(spark, dir)
    val cutoff =
      (docs.agg(max(col("doc_id"))).head().getLong(0) + 1L) * 9L / 10L
    decontamScreenOn(docs, col("doc_id") >= cutoff)
  }

  /** Per-doc contamination counts of the `isBatch` slice against the
    * frozen `evalSource` fingerprint set: (doc_id, n_fps,
    * n_shared_fps, shared_ppm). Per-doc independent given the eval
    * set — the face the streaming twin replays verbatim and the
    * full-vs-batch bit-identity spec pins. */
  def contaminationCountsOn(docs: DataFrame,
      isBatch: org.apache.spark.sql.Column,
      evalSource: String = "src0"): DataFrame = {
    // "small by nature" is a labeling convention, not a structural
    // bound (the evalOverlapScoreOn rule): winnow keeps ~2/(W+1) of
    // the byte positions as 8-byte longs, so the fingerprint table is
    // bounded by ~2× the text bytes; ×6 covers parquet compression.
    // Whole-corpus leaf mass is the conservative bound — under the
    // limit broadcast, above it shuffle_hash, never an unbounded
    // broadcast on a guess.
    val limit = docs.sparkSession.conf
      .getOption("graft.setsim.broadcastBytes")
      .map(_.toLong).getOrElse(256L * 1024 * 1024)
    val evalFp =
      evalFingerprints(docs.filter(col("source") === evalSource))
    val evalSized =
      if (PlanStats.leafBytes(docs) * 6 <= limit) broadcast(evalFp)
      else evalFp.hint("shuffle_hash")
    countsAgainst(docs.filter(isBatch && col("source") =!= evalSource),
      evalSized)
  }

  /** The frozen eval fingerprint set as a reusable marker frame
    * (fp, hit=1) — the precomputed/persisted artifact a deployed
    * stream joins against (the persisted-artifact pattern). */
  def evalFingerprints(evalDocs: DataFrame): DataFrame =
    TextAnalysis.winnowed(evalDocs)
      .select(explode(col("fingerprints")).as("fp")).distinct()
      .withColumn("hit", lit(1L))

  /** Counts core against an already-sized eval fingerprint frame:
    * ONE winnow pass (n_fps rides the exploded rows — the q173
    * left-join + conditional-sum shape, no second consumer and no
    * persist needed). */
  private[graft] def countsAgainst(batchTrain: DataFrame,
      evalSized: DataFrame): DataFrame =
    TextAnalysis.winnowed(batchTrain)
      .select(col("doc_id"),
        size(col("fingerprints")).cast("long").as("n_fps"),
        explode(col("fingerprints")).as("fp"))
      .join(evalSized, Seq("fp"), "left")
      .groupBy(col("doc_id"), col("n_fps"))
      .agg(sum(coalesce(col("hit"), lit(0L))).as("n_shared_fps"))
      .select(col("doc_id"), col("n_fps"), col("n_shared_fps"))
      .withColumn("shared_ppm",
        expr("n_shared_fps * 1000000 div n_fps"))

  /** [[contaminationCountsOn]] + the batch-relative triage verdict:
    * quarantine = shared_ppm at or above the batch's nearest-rank
    * p90 (k = ceil(0.9·n), ties included). The threshold walk runs
    * over per-ppm-value counts — a grid bounded by the ppm domain,
    * not the corpus. */
  def decontamScreenOn(docs: DataFrame,
      isBatch: org.apache.spark.sql.Column,
      evalSource: String = "src0"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pp = Dedup.register(contaminationCountsOn(docs, isBatch, evalSource)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val nn = pp.agg(count(lit(1)).as("__nb"))
    // domain-bounded value grid (≤ 1e6+1 rows): cumulative counts by
    // ppm value, nearest-rank selection — the q100 family without a
    // corpus-sized window or a driver-side TakeOrdered
    val wv = Window.orderBy(col("shared_ppm"))
    val thr = pp.groupBy(col("shared_ppm"))
      .agg(count(lit(1)).as("__c"))
      .withColumn("__cum", sum(col("__c")).over(wv))
      .crossJoin(broadcast(nn))
      .filter(col("__cum") >= expr("(9 * __nb + 9) div 10"))
      .agg(min(col("shared_ppm")).as("__thr"))
    pp.crossJoin(broadcast(thr))
      .select(col("doc_id"), col("n_fps"), col("n_shared_fps"),
        col("shared_ppm"),
        (col("shared_ppm") >= col("__thr")).as("quarantine"))
      .orderBy(col("doc_id"), col("n_fps"), col("n_shared_fps"),
        col("shared_ppm"), col("quarantine"))
  }
}
