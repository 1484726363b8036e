package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Deduplication family for a training-data pipeline (SURVEY.md §2B
  * [ext]): exact (content-hash groupBy), MinHash+LSH, SimHash — all
  * built so that NO stage ever materializes the all-pairs cross
  * product. At 100 TB the only admissible shapes are per-row maps,
  * key-partitioned shuffles on hash buckets, and joins restricted to
  * bucket-collision candidates.
  */
object Dedup {

  /** Tri-state `graft.setsim.packedVerify`, parsed ONCE for every
    * family (ADVICE r14 — the incremental path matched the exact
    * strings "true"/"false" while the fresh/containment paths used
    * toBoolean, so "TRUE" pinned one plan and silently fell back to
    * auto in the other): Some(true)/Some(false) for any
    * case-insensitive boolean spelling, None = unset, loud error on
    * anything else. */
  private[graft] def packedVerifyConf(spark: SparkSession): Option[Boolean] =
    spark.conf.getOption("graft.setsim.packedVerify")
      .map(_.trim.toLowerCase(java.util.Locale.ROOT))
      .map {
        case "true" => true
        case "false" => false
        case other => throw new IllegalArgumentException(
          s"graft.setsim.packedVerify must be true or false, got '$other'")
      }

  // ---------------------------------------------------------------- exact

  /** Exact dedup via sha2(text) groupBy: one representative (min
    * doc_id) per distinct content. Hash-groupBy shuffles 32-byte
    * digests, not documents. */
  def exactDedup(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(sha2(col("text"), 256).as("content_hash"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .select(col("keep_id"), col("n_copies"), col("content_hash"))
      .orderBy(col("keep_id"))

  /** Incremental exact dedup: rows of the increment whose content is
    * new to the corpus AND first-in-increment for their hash — the
    * daily-ingest complement of [[exactDedup]]. Both sides reduce to
    * 32-byte digests before the anti-join; documents never shuffle. */
  def incrementalExactNew(corpus: DataFrame, increment: DataFrame,
      idCol: String = "doc_id"): DataFrame = {
    val hashed = increment.withColumn("__h", sha2(col("text"), 256))
    val firstPerHash = hashed
      .groupBy(col("__h")).agg(min(col(idCol)).as(idCol))
    hashed.select(col(idCol), col("__h"))
      .join(firstPerHash, Seq("__h", idCol), "left_semi")
      .join(corpus.select(sha2(col("text"), 256).as("__h")),
        Seq("__h"), "left_anti")
      .select(col(idCol))
  }

  /** Query: docs with id >= 400 are "today's ingest"; keep those whose
    * content appears in neither the id < 400 corpus nor earlier in the
    * ingest itself. */
  def incrementalExactQuery(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    incrementalExactNew(docs.filter(col("doc_id") < 400),
        docs.filter(col("doc_id") >= 400))
      .orderBy(col("doc_id"))
  }

  /** Passage-level dedup (the sub-document half of corpus dedup):
    * split each document into fixed `w`-token chunks, keep only the
    * corpus-wide FIRST occurrence of each chunk text (ordered by
    * (doc_id, chunk index)), and report per-doc survival — the
    * boilerplate-paragraph removal step of a web-corpus pipeline.
    *
    * Scale shape: chunks shuffle by chunk text exactly once (the
    * first-occurrence window); at 100 TB replace the raw chunk string
    * with its sha2 digest as the partition key to cap key width —
    * semantics are unchanged because equality is all that's used. */
  def passageDedup(spark: SparkSession, dir: String, w: Int = 8): DataFrame =
    passageDedupDocs(Tables.documents(spark, dir), w)

  /** `w`-token chunk column (array<string>) — shared by the batch op
    * and its streaming twin so the chunking cannot drift.
    * transform() runs interpreted, but it is amortized over a whole
    * row's chunks; the per-chunk work downstream dominates. */
  private[graft] def chunkCol(w: Int): Column =
    expr(s"""transform(sequence(0, (size(split(text, ' ')) + ${w - 1}) div $w - 1),
             i -> array_join(slice(split(text, ' '), i * $w + 1, $w), ' '))""")

  /** (doc_id, cidx, chunk, __rn) — every chunk ranked by corpus-wide
    * first occurrence of its text, (doc_id, cidx) tie order. The ONE
    * place the first-occurrence rule lives: the batch aggregate, the
    * streaming twin's batch reference, and any future consumer all
    * read `__rn === 1` from here, so the tie rule cannot drift. */
  private def rankedChunks(docs: DataFrame, w: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // first-occurrence window keyed by the chunk DIGEST, not the text:
    // equality is all that's used, and the measured q119 point (10x
    // corpus, same change) was 17.4 -> 1.7 s — sorting long common-
    // prefix strings inside the window exchange dominates; 32-byte
    // binaries compare fast and distribute uniformly (the documented
    // q75 sha2-key move, now actually taken)
    docs.select(col("doc_id"), posexplode(chunkCol(w)).as(Seq("cidx", "chunk")))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(unhex(sha2(col("chunk"), 256)))
          .orderBy(col("doc_id"), col("cidx"))))
  }

  /** The chunk keys the batch op KEEPS: corpus-wide first occurrence
    * of each chunk text — exposed so the streaming twin's admissions
    * can be asserted against it. */
  def passageFirstOccurrences(docs: DataFrame, w: Int = 8): DataFrame =
    rankedChunks(docs, w).filter(col("__rn") === 1)
      .select(col("doc_id"), col("cidx"))

  /** Core passage dedup over any (doc_id, text) frame. */
  def passageDedupDocs(docs: DataFrame, w: Int = 8): DataFrame = {
    rankedChunks(docs, w)
      .withColumn("kept", (col("__rn") === 1).cast("long"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"), sum(col("kept")).as("n_kept"))
      .select(col("doc_id"), col("n_chunks"), col("n_kept"),
        round(col("n_kept").cast("double") /
          col("n_chunks").cast("double"), 6).as("kept_frac"))
      .orderBy(col("doc_id"), col("n_chunks"), col("n_kept"),
        col("kept_frac"))
  }

  /** Substring-level exact dedup — the overlapping-extent
    * generalization of [[passageDedupDocs]] and the distributed
    * re-expression of suffix-array training-data dedup ("find every
    * duplicated span of ≥ w tokens, wherever it starts"). Fixed-chunk
    * passage dedup misses a duplicate whenever it is SHIFTED relative
    * to chunk boundaries; here a w-token window slides at stride 1,
    * a window is duplicated iff its text occurred strictly earlier in
    * the corpus ((doc_id, start) order), and overlapping-or-adjacent
    * duplicate windows (gap ≤ w) merge into maximal duplicated
    * extents via a per-doc gaps-and-islands pass. Output: one row per
    * doc that contains any duplicated extent — token count, extent
    * count, duplicated-token count, and the integer dup rate in ppm
    * (no float anywhere, the q91+ rule).
    *
    * Scale shape: stride-1 windows cost w× the rows of fixed chunks —
    * the price of catching shifted duplicates. The first-occurrence
    * rank is ONE shuffle keyed by window text (swap the text for its
    * sha2 digest at 100 TB to cap key width — only equality is used,
    * q75's documented move); the extent merge is a keyed window per
    * doc over the pruned DUPLICATE rows only (orders of magnitude
    * smaller than the window set). At corpus scale you would
    * pre-select candidate docs with the winnowed fingerprints (q74)
    * and run the extent pass on survivors. */
  /** (doc_id, n_tokens, s, wtext): every stride-1 `w`-token window of
    * every document — pos IS the 0-based start token index (sequence
    * starts at 0); short docs (n ≤ w) produce the single whole-text
    * window, like windowHashes. Shared by [[substringDedup]] and
    * [[windowNovelty]] so the window rule cannot drift. */
  private def tokenWindows(docs: DataFrame, w: Int): DataFrame =
    docs.select(col("doc_id"), split(col("text"), " ").as("toks"))
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .select(col("doc_id"), col("n_tokens"),
        posexplode(expr(
          s"""transform(sequence(0, greatest(size(toks) - $w, 0)),
             |  i -> array_join(slice(toks, i + 1, $w), ' '))""".stripMargin))
          .as(Seq("s", "wtext")))

  def substringDedup(docs: DataFrame, w: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wins = tokenWindows(docs, w)
    // window keyed by digest, not text — measured 17.4 -> 1.7 s at the
    // 10x rehearsal point (sorting long common-prefix strings in the
    // window exchange dominated; equality/grouping is all that's used)
    val dups = wins.withColumn("__rn", row_number().over(
        Window.partitionBy(unhex(sha2(col("wtext"), 256)))
          .orderBy(col("doc_id"), col("s"))))
      .filter(col("__rn") >= 2)
      .select(col("doc_id"), col("n_tokens"), col("s").cast("long").as("s"))
    // gaps and islands over duplicate starts: a NULL lag (first dup of
    // a doc) takes the otherwise-branch and opens an island
    val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("s"))
    val extents = dups
      .withColumn("brk",
        when(col("s") - lag(col("s"), 1).over(wDoc) <= w, 0L).otherwise(1L))
      .withColumn("island", sum(col("brk")).over(wDoc))
      .groupBy(col("doc_id"), col("n_tokens"), col("island"))
      .agg(min(col("s")).as("ext_start"), max(col("s")).as("max_s"))
      .select(col("doc_id"), col("n_tokens"), col("ext_start"),
        least(col("max_s") + lit(w - 1), col("n_tokens") - 1).as("ext_end"))
    extents.groupBy(col("doc_id"), col("n_tokens"))
      .agg(count(lit(1)).as("n_extents"),
        sum(col("ext_end") - col("ext_start") + 1).as("n_dup_tokens"))
      .select(col("doc_id"), col("n_tokens"), col("n_extents"),
        col("n_dup_tokens"),
        expr("n_dup_tokens * 1000000 div n_tokens").as("dup_ppm"))
      .orderBy(col("doc_id"), col("n_tokens"), col("n_extents"),
        col("n_dup_tokens"), col("dup_ppm"))
  }

  /** Query entry (q119): duplicated extents over the documents corpus. */
  def substringDedupQuery(spark: SparkSession, dir: String): DataFrame =
    substringDedup(Tables.documents(spark, dir))

  /** Substring-level corpus novelty — the monitoring mirror of
    * [[substringDedup]]: for each INGEST document, the fraction of
    * its stride-1 `w`-token windows whose text never occurs in the
    * REFERENCE corpus, as an integer ppm rate. This is the "how much
    * of today's crawl is actually new content" gauge a curation
    * pipeline tracks per source/day; whole-doc incremental dedup
    * (q63) can say only new-or-not, this says how much and survives
    * boilerplate wrappers around copied bodies.
    *
    * Scale shape: the corpus side collapses to DISTINCT window texts
    * before the join (set semantics — corpus size stops mattering,
    * only vocabulary does); one shuffle keyed by window text (swap
    * text for its sha2 digest at 100 TB, equality-only as in q75);
    * the per-doc aggregate is map-side-combinable. */
  def windowNovelty(ingest: DataFrame, corpus: DataFrame,
      w: Int = 8): DataFrame = {
    val seen = tokenWindows(corpus, w).select(col("wtext")).distinct()
      .withColumn("__seen", lit(1L))
    tokenWindows(ingest, w)
      .join(seen, Seq("wtext"), "left")
      .groupBy(col("doc_id"), col("n_tokens"))
      .agg(count(lit(1)).as("n_windows"),
        sum(when(col("__seen").isNull, 1L).otherwise(0L)).as("n_novel"))
      .select(col("doc_id"), col("n_tokens"), col("n_windows"),
        col("n_novel"),
        expr("n_novel * 1000000 div n_windows").as("novelty_ppm"))
      .orderBy(col("doc_id"), col("n_tokens"), col("n_windows"),
        col("n_novel"), col("novelty_ppm"))
  }

  /** Query entry (q120): novelty of the id ≥ 400 ingest against the
    * id < 400 reference corpus (the q63 split). */
  def windowNoveltyQuery(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    windowNovelty(docs.filter(col("doc_id") >= 400),
      docs.filter(col("doc_id") < 400))
  }

  /** Fuzzy entity matching: distinct-name pairs within `maxDist` edit
    * distance, joined only inside a blocking key (first token) — the
    * block-then-verify shape every entity-resolution pipeline uses so
    * the quadratic verify runs per block, never corpus-wide. At 100 TB
    * the blocking key graduates to (first token, length bucket) or a
    * q-gram LSH; the join shape is unchanged. Distinct names (not
    * part ids) keep the pair space the vocabulary's, not the table's. */
  def fuzzyNameMatches(spark: SparkSession, dir: String,
      maxDist: Int = 3): DataFrame = {
    val names = Tables.part(spark, dir).select(col("p_name")).distinct()
      .withColumn("blk", split(col("p_name"), " ").getItem(0))
    val a = names.select(col("p_name").as("name_a"), col("blk"))
    val b = names.select(col("p_name").as("name_b"), col("blk"))
    a.join(b, Seq("blk"))
      .filter(col("name_a") < col("name_b"))
      .withColumn("edit_dist",
        levenshtein(col("name_a"), col("name_b")).cast("long"))
      .filter(col("edit_dist") <= maxDist)
      .select(col("name_a"), col("name_b"), col("edit_dist"))
      .orderBy(col("name_a"), col("name_b"), col("edit_dist"))
  }

  // -------------------------------------------------------------- minhash

  val NumHashes = 64
  // 16 bands × 4 rows: pair-collision probability 1-(1-J^4)^16 —
  // ≈99.95% recall at J=0.78 while background pairs (J≈0.04 in this
  // corpus, measured) collide with p≈4e-5, so candidates stay rare.
  // The band join carries only ids, so even a skewed bucket costs
  // little; a sharper curve (8×8) was measured to drop planted
  // near-dups at J≈0.79 to ~70% recall.
  val Bands = 16
  val RowsPerBand: Int = NumHashes / Bands
  val ShingleLen = 8

  /** Distinct 8-byte shingle hashes per document (native codegen
    * expression — see graft.functions.ShingleHashes). */
  def shingles(df: DataFrame, textCol: String = "text"): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    df.withColumn("sh", expr(s"shingle8($textCol)"))
  }

  /** 64-element MinHash signature via the native codegen expression
    * (graft.functions.MinHashSignature) — one JIT'd pass per row
    * instead of 64 interpreted transform() lambdas. */
  def minHashSignatures(df: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    shingles(df).withColumn("sig", expr("minhash64(sh)"))
  }

  /** (id, band_id, band_hash) rows for a signature table — THE banding
    * scheme, shared by same-corpus and incremental candidate
    * generation. Ids only: the band join must never carry shingle
    * arrays or signatures — at scale the candidate set can be orders
    * of magnitude larger than the corpus, so every byte on the
    * candidate row multiplies the shuffle. */
  def bandedIds(sigs: DataFrame, idAs: String): DataFrame =
    sigs.select(col(sigs.columns.head).as(idAs),
      posexplode(array((0 until Bands).map(b =>
        hash(slice(col("sig"), b * RowsPerBand + 1, RowsPerBand), lit(b))): _*))
        .as(Seq("band_id", "band_hash")))

  /** Candidate-pruning by signature estimate: keep pairs whose
    * matching-minhash fraction is within the estimator's noise margin
    * of the threshold (σ ≈ sqrt(J(1-J)/64) ≈ 0.06; margin 0.2 ≈ 3σ).
    * `sigsA`/`sigsB` are (id, sig) frames (same frame for a
    * within-corpus self-join; distinct frames for incremental). */
  def estimatePrune(pairs: DataFrame, sigsA: DataFrame, sigsB: DataFrame,
      aCol: String, bCol: String, minJaccard: Double): DataFrame =
    pairs
      .join(sigsA.select(col(sigsA.columns.head).as(aCol),
        col("sig").as("sig_a")), aCol)
      .join(sigsB.select(col(sigsB.columns.head).as(bCol),
        col("sig").as("sig_b")), bCol)
      .withColumn("est_j",
        size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y),
          b => b)).cast("double") / NumHashes)
      .filter(col("est_j") >= minJaccard - 0.2)
      .select(aCol, bCol)

  /** Band-join bucket-size cap: above this, a bucket's pairs switch
    * from all-pairs to star pairing. A corpus with a 10k-copy
    * boilerplate cluster puts all 10k ids into ONE (band, hash) bucket
    * in every band — 10^8 candidate pairs from a single key, the
    * quadratic blowup the banding scheme exists to avoid. */
  val MaxBucket = 256

  /** LSH candidate pairs within one corpus (ids only).
    *
    * Degenerate-bucket guard: buckets with more than `maxBucket`
    * members emit (bucket-min-id, member) star pairs instead of
    * all-pairs — O(n) per bucket instead of O(n²), and every member
    * stays connected to the representative, so dedup-cluster
    * connectivity is preserved (a mega-bucket is near-identical
    * content, which all verifies against the representative; the
    * estimate/exact stages still prune false edges). Salting would
    * only split the bucket while silently LOSING cross-salt pairs —
    * star pairing keeps the linear cost without that recall hole.
    * The bucket-size window shuffles on the same (band, hash) key the
    * join needs anyway, so no extra exchange is planned. */
  def lshCandidatePairs(sigs: DataFrame, idCol: String,
      maxBucket: Int = MaxBucket): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("band_id"), col("band_hash"))
    val sized = bandedIds(sigs.select(col(idCol), col("sig")), "__band_id_col")
      .withColumn("bucket_n", count(lit(1)).over(w))
      .withColumn("rep", min(col("__band_id_col")).over(w))
    val small = sized.filter(col("bucket_n") <= maxBucket)
    val smallPairs = small.select(col("__band_id_col").as("doc_a"),
        col("band_id"), col("band_hash"))
      .join(small.select(col("__band_id_col").as("doc_b"), col("band_id"),
        col("band_hash")), Seq("band_id", "band_hash"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"))
    val starPairs = sized
      .filter(col("bucket_n") > maxBucket && col("__band_id_col") =!= col("rep"))
      .select(col("rep").as("doc_a"), col("__band_id_col").as("doc_b"))
    smallPairs.unionByName(starPairs).dropDuplicates("doc_a", "doc_b")
  }

  /** Materialized (id, sig) signature table. Shingling + minhashing is
    * the most expensive linear pass over the corpus, and the LSH
    * pipeline references signatures from four plan branches (band
    * self-join ×2, estimate-prune ×2) — without materialization
    * Catalyst recomputes the shingling per branch (six corpus
    * re-shinglings in the round-1 q41 plan). Only the 512-byte
    * signatures are cached, NOT the shingle arrays (~8 bytes per
    * character — caching them is a corpus-sized copy at 100 TB); the
    * exact-verify stage re-shingles just the estimate survivors
    * instead ([[exactVerify]]). A multi-job production pipeline would
    * stage this table to parquet once and join against it. */
  /** Persisted (id, sig) table. `track = false` hands the cache
    * lifecycle to the caller (the frame is NOT added to the global
    * registry, so a concurrent `unpersistCaches` can't strip it and
    * repeated per-run builds can't grow the registry unboundedly) —
    * callers then own the unpersist (Pipeline's funnel release). */
  def signatureTable(df: DataFrame, idCol: String,
      track: Boolean = true): DataFrame = {
    val sigs = minHashSignatures(df).select(col(idCol), col("sig"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    if (track) register(sigs) else sigs
  }

  // internal caches pinned by signatureTable/simhashNearDups; a
  // long-lived session composing many dedup runs releases them with
  // [[unpersistCaches]] once all in-flight results are materialized —
  // otherwise each distinct input corpus would pin its signature cache
  // for the JVM lifetime. Runs needing per-call lifecycle build the
  // signature table themselves and unpersist exactly that frame
  // (nearDupPairs' sigsOpt; Pipeline.curate does this), since this
  // registry is JVM-global: draining it mid-flight would strip another
  // concurrent run's cache.
  private val cached =
    new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  private[graft] def register(df: DataFrame): DataFrame = { cached.add(df); df }

  /** Unpersist every signature cache pinned so far, session-wide. Safe
    * for correctness any time (downstream lineage stays valid; an
    * evicted frame recomputes) but meant for idle points — concurrent
    * dedup runs would lose their caches and pay recomputation. */
  def unpersistCaches(): Unit = {
    var df = cached.poll()
    while (df != null) { df.unpersist(); df = cached.poll() }
  }

  /** Exact shingle-set Jaccard over candidate id pairs: texts are
    * fetched by id-join and shingled AFTER the join, so only the
    * (rare) estimate survivors pay for shingle arrays — nothing
    * corpus-sized is cached or shuffled. */
  def exactVerify(pairs: DataFrame, docsA: DataFrame, idA: String, aCol: String,
      docsB: DataFrame, idB: String, bCol: String, minJaccard: Double,
      textCol: String = "text"): DataFrame = {
    graft.functions.GraftFunctions.register(pairs.sparkSession)
    pairs
      .join(docsA.select(col(idA).as(aCol), col(textCol).as("__text_a")), aCol)
      .join(docsB.select(col(idB).as(bCol), col(textCol).as("__text_b")), bCol)
      .withColumn("sh_a", expr("shingle8(__text_a)"))
      .withColumn("sh_b", expr("shingle8(__text_b)"))
      .withColumn("jaccard", round(
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double"), 6))
      .filter(col("jaccard") >= minJaccard)
      .select(col(aCol), col(bCol), col("jaccard"))
  }

  /** LSH → estimate → exact verify (the scalable three-stage shape):
    * candidates are id pairs; the 64-long signatures are joined back to
    * estimate Jaccard (matching-minhash fraction) and prune; only the
    * survivors pay for the exact shingle-set Jaccard (shingled
    * post-join in exactVerify). The signature computation runs ONCE
    * (signatureTable) — every band/estimate stage joins against the
    * same materialized frame. */
  def nearDupPairs(df: DataFrame, idCol: String, minJaccard: Double,
      sigsOpt: Option[DataFrame] = None): DataFrame = {
    // callers that need deterministic cache lifecycle (Pipeline.curate)
    // build the signature table themselves, pass it here, and
    // unpersist exactly that frame once their results materialize
    val sigs = sigsOpt.getOrElse(signatureTable(df, idCol))
    val estimated = estimatePrune(lshCandidatePairs(sigs, idCol),
      sigs, sigs, "doc_a", "doc_b", minJaccard)
    exactVerify(estimated, df, idCol, "doc_a", df, idCol, "doc_b", minJaccard)
  }

  /** MinHash accuracy contract (q192): over the exact near-dup pairs
    * of an id-bounded slice, the NATIVE MinHash estimate must land
    * within `boundPpm` of the exact shingle-set Jaccard — the
    * q57/q176 accuracy-contract pattern applied to the LSH family's
    * estimator. The engine computes est = matching-signature-position
    * count (the statistic [[estimatePrune]] prunes on, kept IN-PATH);
    * the oracle replays the exact Jaccard and TRUE for the flag, so
    * an estimator regression (hash change, signature truncation,
    * permutation bug) flips the boolean and fails the hash at both
    * scales. boundPpm = 250000 ≈ 5.6σ at NumHashes = 64 and J ≈ 0.5 —
    * loose enough that a healthy estimator never trips it over any
    * realistic pair count, tight enough that a broken one (σ-scale
    * errors are the benign failure; bugs are gross) cannot hide.
    *
    * Scale shape: the id-bounded all-pairs slice is the audit-grade
    * yardstick (the q44/embeddingNearDups convention — one side
    * broadcasts); the production estimator path stays q41's
    * LSH → estimate → verify. */
  /** The audit slice is DATA-DEPENDENT: ids < greatest(200,
    * (max_id+1) div 5) — the fixed 200-id slice went vacuous at
    * sf0.1 (its docs hold no J ≥ 0.5 pair there), and a vacuous
    * accuracy audit certifies nothing. The oracle re-derives the cap
    * (the autoK rule); small corpora keep the original 200. Pass
    * `maxId > 0` to pin an explicit slice. */
  def minhashAccuracy(spark: SparkSession, dir: String,
      maxId: Long = 0L, minJPpm: Long = 500000L,
      boundPpm: Long = 250000L): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val cap =
      if (maxId > 0) maxId
      else math.max(200L,
        (docs.agg(max(col("doc_id"))).head().getLong(0) + 1L) / 5L)
    minhashAccuracyOn(docs.filter(col("doc_id") < cap),
      minJPpm, boundPpm)
  }

  /** Frame-based core of [[minhashAccuracy]] (needs doc_id, text;
    * caller bounds the slice). */
  def minhashAccuracyOn(docs: DataFrame, minJPpm: Long = 500000L,
      boundPpm: Long = 250000L): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    // sort once per doc, intersect with the native two-cursor
    // expression: array_intersect/array_union built per-pair hash
    // sets and ran 95 s on the sf0.1 slice; sorted_intersect_count
    // is the same count at a fraction of the per-pair cost (the
    // setsim verify discipline)
    val sh = register(docs.select(col("doc_id"),
        sort_array(expr("shingle8(text)")).as("sh"))
      .persist(StorageLevel.MEMORY_AND_DISK))
    val sigs = minHashSignatures(docs).select(col("doc_id"), col("sig"))
    // exact PPJoin PREFIX candidates on the HASH total order instead
    // of the all-pairs join: two docs with J >= t must share a hash
    // among each one's first n - ceil(t*n) + 1 SMALLEST hashes (the
    // prefix theorem — complete for any shared total order), so only
    // prefix-colliding pairs pay the intersect. The audit stays an
    // LSH-independent path: the prefix bound is a theorem, not a
    // banding heuristic with recall.
    // ${minJPpm}L: the ppm literal × size() as INT×INT overflows ANSI
    // at ≥ ~4295 distinct shingles (ADVICE r11) — long arithmetic
    val prefix = sh.select(col("doc_id"), explode(expr(
      s"slice(sh, 1, cast(size(sh) -" +
        s" ((${minJPpm}L * cast(size(sh) as bigint) + 999999L)" +
        s" div 1000000) + 1 as int))")).as("h"))
    val cand = prefix.select(col("doc_id").as("doc_a"), col("h"))
      .join(prefix.select(col("doc_id").as("doc_b"), col("h")), Seq("h"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b")).distinct()
    // the q126 LENGTH bound + exact intersect on the candidates
    cand
      .join(broadcast(sh.select(col("doc_id").as("doc_a"),
        col("sh").as("sh_a"))), Seq("doc_a"))
      .join(broadcast(sh.select(col("doc_id").as("doc_b"),
        col("sh").as("sh_b"))), Seq("doc_b"))
      .filter(size(col("sh_a")).cast("long") * 1000000L >=
          lit(minJPpm) * size(col("sh_b")).cast("long") &&
        size(col("sh_b")).cast("long") * 1000000L >=
          lit(minJPpm) * size(col("sh_a")).cast("long"))
      .withColumn("ni", call_function("sorted_intersect_count",
        col("sh_a"), col("sh_b")))
      .withColumn("nu",
        size(col("sh_a")).cast("long") + size(col("sh_b")).cast("long")
          - col("ni"))
      .withColumn("jaccard_ppm", expr("ni * 1000000 div nu"))
      .filter(col("jaccard_ppm") >= minJPpm)
      .join(sigs.select(col("doc_id").as("doc_a"), col("sig").as("sig_a")),
        Seq("doc_a"))
      .join(broadcast(sigs.select(col("doc_id").as("doc_b"),
        col("sig").as("sig_b"))), Seq("doc_b"))
      .withColumn("est_ppm", expr(
        s"size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), v -> v))" +
          s" * 1000000L div ${NumHashes}L"))
      .select(col("doc_a"), col("doc_b"), col("jaccard_ppm"),
        (abs(col("est_ppm") - col("jaccard_ppm")) <= boundPpm)
          .as("est_within"))
      .orderBy(col("doc_a"), col("doc_b"), col("jaccard_ppm"),
        col("est_within"))
  }

  /** DuckDB oracle for [[minhashAccuracy]] — exact Jaccard over the
    * same slice, TRUE for the contract flag (the q57 convention; the
    * native signature stays in the measured path). */
  def minhashAccuracyOracleSql(minJPpm: Long = 500000L): String =
    s"""WITH cut AS (
       |  SELECT GREATEST(200, (MAX(doc_id) + 1) // 5) AS c
       |  FROM documents),
       |g AS (
       |  SELECT doc_id, unnest(list_distinct([substr(text, i, 8)
       |    FOR i IN range(1, greatest(length(text) - 7, 1) + 1)])) AS gram
       |  FROM documents CROSS JOIN cut WHERE doc_id < cut.c),
       |s AS (SELECT doc_id, count(*) AS n FROM g GROUP BY doc_id),
       |i AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS ni
       |  FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT doc_a, doc_b,
       |  CAST(ni * 1000000 // (sa.n + sb.n - ni) AS BIGINT)
       |    AS jaccard_ppm,
       |  TRUE AS est_within
       |FROM i
       |JOIN s sa ON sa.doc_id = doc_a
       |JOIN s sb ON sb.doc_id = doc_b
       |WHERE ni * 1000000 >= $minJPpm * (sa.n + sb.n - ni)
       |ORDER BY doc_a, doc_b, jaccard_ppm, est_within""".stripMargin

  /** Query: near-duplicate pairs (J ≥ 0.8) in documents. */
  def minhashNearDups(spark: SparkSession, dir: String): DataFrame =
    nearDupPairs(Tables.documents(spark, dir), "doc_id", 0.8)
      .orderBy(col("jaccard").desc, col("doc_a"), col("doc_b"))
      .limit(100)

  // ------------------------------------------------------------- clusters

  /** Dedup clusters from near-dup pairs: distributed connected
    * components by iterative min-label propagation, in the FUSED form
    * (round-4 measurement, see below): edges carry a self-loop per
    * node, so `min(label)` over a node's in-neighbours IS its next
    * label — one keyed join + one aggregate per round, no label-carry
    * join at all. Convergence is the label-sum fixpoint: labels are
    * monotone non-increasing (the self-loop keeps the own label in
    * every min), so an unchanged sum means no label moved; the sum is
    * one tiny aggregate in DECIMAL(38,0) (overflow-safe at any node
    * count), checked every 2nd round — detection one round late costs
    * less than an extra action per round. Labels are checkpointed per
    * round (`localCheckpoint` truncates the doubling lineage; a
    * cluster deployment would use reliable `checkpoint`).
    *
    * Pointer jumping (label := label(label), the extra self-join that
    * compresses paths for O(log diameter) convergence) is DEFERRED to
    * round 9: the star pairs emitted by the degenerate-bucket guard
    * keep real near-dup components at small diameter, where the jump
    * join is pure overhead — measured at sf0.1 (1126 edges, 200
    * nodes, same-session medians): two-join form 1.55 s, fused+jump
    * 1.15 s, fused no-jump check-every-2 0.80 s, all with identical
    * clusters. A pathological long chain still converges in O(log d)
    * rounds once the jump kicks in. Returns (node, cluster_id = min
    * id reachable).
    *
    * ONE persisted frame, ONE generator scan: the pair generator may
    * be expensive (q65's is a cosine join), so both directed edges AND
    * both endpoints' self-loops are exploded out of a single pass over
    * `pairs` — the only persist is the edge table every round reuses;
    * nodes and initial labels re-derive from that cache. A node's
    * self-loop appears once per incident pair (duplicates are
    * harmless under `min(label)` and map-side combine collapses them
    * before the shuffle), which beats a distinct/union pre-pass that
    * would re-evaluate the generator two more times: measured at
    * sf0.1 the drained q65 median fell 3.33 s → 1.64 s. */
  def dedupClusters(pairs: DataFrame, aCol: String, bCol: String,
      maxIter: Int = 20): DataFrame = {
    // pre-partitioning by dst lets every round's join reuse the
    // persisted layout instead of re-shuffling the edge table
    val edges = pairs.select(explode(array(
        struct(col(aCol).as("src"), col(bCol).as("dst")),
        struct(col(bCol).as("src"), col(aCol).as("dst")),
        struct(col(aCol).as("src"), col(aCol).as("dst")),
        struct(col(bCol).as("src"), col(bCol).as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .repartition(col("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var labels = edges.filter(col("src") === col("dst"))
      .select(col("src").as("node")).distinct()
      .withColumn("label", col("node")).localCheckpoint()
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(coalesce(sum(col("label").cast("decimal(38,0)")),
        lit(0).cast("decimal(38,0)"))).head().getDecimal(0)
    var prevSum = labelSum(labels)
    var converged = false
    var it = 0
    while (!converged && it < maxIter) {
      val nbrMin = edges
        .join(labels.select(col("node").as("dst"), col("label")), "dst")
        .groupBy(col("src")).agg(min(col("label")).as("label"))
        .select(col("src").as("node"), col("label"))
      val next =
        if (it < 8) nbrMin.localCheckpoint()
        else nbrMin
          .join(nbrMin.select(col("node").as("label"), col("label").as("jump")),
            Seq("label"), "left")
          .select(col("node"),
            least(col("label"), coalesce(col("jump"), col("label"))).as("label"))
          .localCheckpoint()
      labels = next
      it += 1
      if (it % 2 == 0 || it >= maxIter) {
        val s = labelSum(labels)
        converged = s.compareTo(prevSum) == 0
        prevSum = s
      }
    }
    edges.unpersist()
    labels.select(col("node"), col("label").as("cluster_id"))
  }

  // -------------------------------------------------------------- simhash

  /** 64-bit SimHash over whitespace tokens via the native codegen
    * expression (graft.functions.SimHash64): one JIT'd byte-walk per
    * row instead of nested interpreted aggregate/zip_with lambdas. */
  def simhashExpr(textCol: String): Column = expr(s"simhash64($textCol)")

  /** The interpreted higher-order-function form of the same SimHash —
    * kept as the differential-test reference for SimHash64 (the inner
    * zip_with lambda references the outer aggregate lambda's variable,
    * which is why it must be written as a SQL expression). */
  def simhashExprInterpreted(textCol: String): Column = {
    val counts =
      s"""aggregate(
         |  transform(split($textCol, ' '), t -> xxhash64(t)),
         |  array_repeat(0L, 64),
         |  (acc, h) -> zip_with(acc, sequence(0, 63),
         |    (a, i) -> a + CASE WHEN (h >> i) & 1 = 1 THEN 1 ELSE -1 END))""".stripMargin
    expr(
      s"""aggregate(
         |  zip_with($counts, sequence(0, 63),
         |    (c, i) -> CASE WHEN c >= 0 THEN shiftleft(1L, i) ELSE 0L END),
         |  0L, (acc, b) -> acc | b)""".stripMargin)
  }

  /** Deterministic SimHash: identical semantics to [[simhashExpr]] but
    * with the FNV+splitmix token hash (`rolling_hash`) in place of
    * xxhash64 — the one piece of the SimHash pipeline DuckDB cannot
    * replay. This sibling turns the SimHash *capability* into a full
    * hash-checked oracle row (q83), the q71-for-q46 move; the xxhash64
    * form stays the production default (built-in, codegen'd). */
  def simhashDetExpr(textCol: String): Column = {
    val counts =
      s"""aggregate(
         |  transform(split($textCol, ' '), t -> rolling_hash(t)),
         |  array_repeat(0L, 64),
         |  (acc, h) -> zip_with(acc, sequence(0, 63),
         |    (a, i) -> a + CASE WHEN (h >> i) & 1 = 1 THEN 1 ELSE -1 END))""".stripMargin
    expr(
      s"""aggregate(
         |  zip_with($counts, sequence(0, 63),
         |    (c, i) -> CASE WHEN c >= 0 THEN shiftleft(1L, i) ELSE 0L END),
         |  0L, (acc, b) -> acc | b)""".stripMargin)
  }

  /** Query entry: deterministic SimHash + 16-bit band split per doc.
    * Uses the native codegen expression (simhash64_fnv); the
    * interpreted [[simhashDetExpr]] is its differential reference,
    * exactly the xxhash64 pair's arrangement. */
  def simhashDetFingerprints(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val withSim = Tables.documents(spark, dir)
      .select(col("doc_id"), expr("simhash64_fnv(text)").as("simhash_det"))
    (0 until 4).foldLeft(withSim) { (df, c) =>
      df.withColumn(s"band_$c",
        shiftrightunsigned(col("simhash_det"), c * 16).bitwiseAND(lit(0xFFFFL)))
    }.orderBy(col("doc_id"), col("simhash_det"), col("band_0"),
      col("band_1"), col("band_2"), col("band_3"))
  }

  /** Per-document simhash + its 4×16-bit bands (the hamming-LSH keys). */
  def simhashFingerprints(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val withSim = Tables.documents(spark, dir)
      .select(col("doc_id"), simhashExpr("text").as("simhash"))
    (0 until 4).foldLeft(withSim) { (df, c) =>
      df.withColumn(s"band_$c",
        shiftrightunsigned(col("simhash"), c * 16).bitwiseAND(lit(0xFFFFL)))
    }.orderBy(col("doc_id"))
  }

  /** Oracle-checkable face of the SimHash capability (q42): per band
    * position, the value-distribution moments of the DETERMINISTIC
    * sibling's 16-bit bands — count, distinct values, exact integer
    * sum and sum-of-squares, min, max. DuckDB replays the FNV SimHash
    * bit-exactly (HashSql.simhashBandMomentsOracle), so this row is
    * hash-checked where the raw xxhash64 fingerprints (q83's
    * arrangement, [[simhashFingerprints]]) cannot be; the xxhash64
    * production path stays exercised by [[simhashNearDups]] and the
    * AnalyticsSpec native-vs-interpreted differential. sum_sq peaks at
    * 65535² ≈ 4.3e9 per doc — BIGINT-safe to ~2e9 docs/band; past
    * that, lift the two sums to decimal(38,0) (same ppm discipline as
    * joinSkewReport). */
  def simhashBandMoments(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val withSim = Tables.documents(spark, dir)
      .select(col("doc_id"), expr("simhash64_fnv(text)").as("sim"))
    withSim.select(posexplode(array((0 until 4).map(c =>
        shiftrightunsigned(col("sim"), c * 16).bitwiseAND(lit(0xFFFFL))): _*))
        .as(Seq("bp", "band_val")))
      .groupBy(col("bp").cast("long").as("band_pos"))
      .agg(count(lit(1)).as("n_docs"),
        count_distinct(col("band_val")).as("n_distinct"),
        sum(col("band_val")).as("sum_val"),
        sum(col("band_val") * col("band_val")).as("sum_sq"),
        min(col("band_val")).as("min_val"),
        max(col("band_val")).as("max_val"))
      .orderBy(col("band_pos"), col("n_docs"), col("n_distinct"),
        col("sum_val"), col("sum_sq"), col("min_val"), col("max_val"))
  }

  /** SimHash near-dups: docs sharing any 16-bit band (pigeonhole: any
    * pair within hamming distance 3 shares at least one of 4 bands),
    * verified by exact popcount. Bucket-join only — no all-pairs. */
  def simhashNearDups(df: DataFrame, idCol: String, maxHamming: Int): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    // materialize (id, simhash) before the band self-join — otherwise
    // both join branches re-tokenize + re-hash the corpus
    val sims = register(df.select(col(idCol), simhashExpr("text").as("simhash"))
      .persist(StorageLevel.MEMORY_AND_DISK))
    val banded = sims.select(col(idCol), col("simhash"),
      posexplode(array((0 until 4).map(c =>
        shiftrightunsigned(col("simhash"), c * 16).bitwiseAND(lit(0xFFFFL))): _*))
        .as(Seq("band_id", "band_val")))
    val a = banded.select(col(idCol).as("doc_a"), col("simhash").as("sim_a"),
      col("band_id"), col("band_val"))
    val b = banded.select(col(idCol).as("doc_b"), col("simhash").as("sim_b"),
      col("band_id"), col("band_val"))
    a.join(b, Seq("band_id", "band_val"))
      .filter(col("doc_a") < col("doc_b"))
      .dropDuplicates("doc_a", "doc_b")
      .withColumn("hamming",
        bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
  }

  /** Cross-source contamination matrix: for every pair of sources,
    * the number of distinct 8-char shingles (stride 4) they share —
    * the domain-overlap diagnostic a curation pipeline reads before
    * deciding what to dedup against what. An 8-char shingle is as
    * compact as a 64-bit hash, so shipping the literal substring is
    * already the scale-correct move AND keeps the op fully
    * oracle-replayable (no hash crosses engines, per the q63 rule).
    *
    * Scale shape: distinct (shingle, source) partial-aggregates
    * map-side; the pair join fans out per shingle only to the sources
    * containing it (≤ |sources|², independent of corpus size). With
    * millions of domains a stop-shingle cap (the LSH degenerate-
    * bucket guard pattern) bounds hot shingles; at this corpus'
    * 16 sources it is unnecessary. */
  def sourceOverlap(spark: SparkSession, dir: String): DataFrame = {
    val sh = graft.Tables.documents(spark, dir)
      .filter(length(col("text")) >= 8)
      .select(col("source"), explode(expr(
        "transform(sequence(1, length(text) - 7, 4)," +
          " i -> substring(text, i, 8))")).as("g"))
      .distinct()
    val a = sh.select(col("g"), col("source").as("source_a"))
    val b = sh.select(col("g"), col("source").as("source_b"))
    a.join(b, Seq("g"))
      .filter(col("source_a") < col("source_b"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(count(lit(1)).as("n_shared"))
      .orderBy(col("source_a"), col("source_b"), col("n_shared"))
  }

  // ------------------------------------------- exact set-similarity join

  /** Exact set-similarity join with prefix filtering (the PPJoin
    * family: Xiao/Wang/Lin/Yu, WWW'08) — the EXACT complement of the
    * probabilistic MinHash path ([[nearDupPairs]]): every pair with
    * shingle-set Jaccard ≥ t, no estimate stage, no recall question.
    * Sets are the same distinct 8-char stride-1 shingles as q41, so
    * the two paths answer the same question and differ only in
    * exact-vs-approximate candidate generation.
    *
    * Candidate filters (all from the PPJoin paper, all completeness-
    * preserving, all decided in integer ppm cross-multiplication):
    * - PREFIX: order each doc's shingles by global document frequency
    *   ascending (rarest first; ties by shingle text) and join only
    *   the first n − ⌈t·n⌉ + 1 — two docs with J ≥ t must share a
    *   prefix shingle.
    * - LENGTH: J ≥ t forces t·max(na,nb) ≤ min(na,nb); pairs with
    *   incompatible sizes never join.
    * - POSITIONAL: a prefix match at positions (i, j) can yield at
    *   most min(na−i, nb−j)+1 common shingles, which must reach
    *   α = ⌈t/(1+t)·(na+nb)⌉; for a true pair the FIRST shared prefix
    *   shingle satisfies this, so dropping failing matches is safe.
    *   Measured at sf0.1 (5000 docs, 12.5M pairs): prefix alone 6.5M
    *   candidates, +length 3.0M, +positional 0.82M, true pairs 256 —
    *   on real Zipfian corpora the prefix filter does far more work,
    *   but this worst-casey corpus is exactly what the positional
    *   bound is for.
    *
    * Scale shape: shingle frequency is one vocabulary-sized aggregate;
    * the prefix trim is a doc-keyed window; the candidate join fans
    * out only on prefix shingles with the length/positional bounds
    * applied INSIDE the join before the pair ever materializes. The
    * verify stage is SIZE-CONDITIONAL: below
    * `graft.setsim.broadcastBytes` (default 64 MB, estimated from one
    * O(1) driver aggregate over the persisted signature table) it
    * reads both docs' sorted shingle arrays from a broadcast — fast
    * at test scale; above the threshold it shuffled-HASH joins on
    * doc_id — measured at 10x sf0.1 (8.2M candidates x 50k docs):
    * broadcast 13 s, shuffle_hash 65 s, sort-merge 168 s (sorting the
    * candidate stream dominates SMJ; the hash build side is the
    * per-partition slice of the gram-set table, which SHRINKS as
    * partitions grow) — so a 100 TB corpus never forces a
    * corpus-sized BroadcastExchange onto the driver and never sorts
    * the candidate stream either. The hint pins the shuffled path so
    * AQE can't flip it back to broadcast. No stage touches the n²
    * pair space.
    */
  def setSimJoin(docs: DataFrame, idCol: String, tPpm: Long): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    latin1Guard(docs)
    // grams feeds freq + ranked + gramSets, and prefix feeds both
    // sides of the candidate self-join: without these persists the
    // scan/explode re-evaluates 3x and the window stack 2x (the q65
    // multi-reference-builder lesson; measured 68 s -> ~16 s at sf0.1)
    val grams = packedGrams(docs, idCol)
    val gramSets = gramSetsOf(grams)
    val sz = sizer(docs.sparkSession, gramSets)
    val freq = grams.groupBy(col("g64")).agg(count(lit(1)).as("df"))
    val prefix = register(
      prefixOf(grams, freq, gramSets, sz, tPpm, leftJoinFreq = false)
        .persist(StorageLevel.MEMORY_AND_DISK))
    val cand = selfCandidatesFromPrefix(prefix, tPpm)
    // over the broadcast threshold the FRESH path switches to the
    // packed verify too (round 14 — previously index-path only; the
    // 100× fresh join shipped the raw arrays and overflowed a 75 GB
    // /tmp with shuffle spill). Candidate-heavy is the self-join norm
    // over the threshold (the r12 224 s evidence), so size-only
    // switching is right here; the packing pass is one linear scan.
    if (sz.gramBytes > sz.limit &&
        packedVerifyConf(docs.sparkSession).getOrElse(true))
      verifyPairsPacked(cand,
        register(packedGramSetsOf(grams, freq)
          .persist(StorageLevel.MEMORY_AND_DISK)), tPpm)
    else
      verifyPairs(cand, gramSets, "doc_a", gramSets, "doc_b", sz, sz,
        tPpm)
  }

  /** Pre-flight diagnostic: the PPJoin candidate pairs (after the
    * prefix/length/positional filters, BEFORE the verify stage) — the
    * quantity whose growth governs set-sim cost at scale, recorded by
    * the 1x-vs-10x rehearsal (ScaleRehearsal / BASELINE.md). */
  def setSimCandidates(docs: DataFrame, idCol: String,
      tPpm: Long): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    latin1Guard(docs)
    val grams = packedGrams(docs, idCol)
    val gramSets = gramSetsOf(grams)
    val sz = sizer(docs.sparkSession, gramSets)
    selfCandidates(grams, gramSets, sz, tPpm)
  }

  private def selfCandidates(grams: DataFrame, gramSets: DataFrame,
      sz: SetSizer, tPpm: Long): DataFrame = {
    val freq = grams.groupBy(col("g64")).agg(count(lit(1)).as("df"))
    val prefix = register(
      prefixOf(grams, freq, gramSets, sz, tPpm, leftJoinFreq = false)
        .persist(StorageLevel.MEMORY_AND_DISK))
    selfCandidatesFromPrefix(prefix, tPpm)
  }

  /** The PPJoin candidate self-join over a prefix table (doc_id, g64,
    * pos, n) — shared by the from-scratch path and the persisted-index
    * path (which reads the prefix from parquet). */
  private def selfCandidatesFromPrefix(prefix: DataFrame,
      tPpm: Long): DataFrame = {
    val a = prefix.select(col("doc_id").as("doc_a"), col("g64"),
      col("pos").as("pa"), col("n").as("na"))
    val b = prefix.select(col("doc_id").as("doc_b"), col("g64"),
      col("pos").as("pb"), col("n").as("nb"))
    a.join(b, Seq("g64"))
      .filter(col("doc_a") < col("doc_b") && ppjoinBounds(tPpm))
      .select(col("doc_a"), col("doc_b"))
      .distinct()
  }

  /** Asymmetric exact set-similarity join: which NEW docs have exact
    * shingle Jaccard ≥ t against the EXISTING corpus — the PPJoin form
    * of [[Decontaminate.incrementalNearDups]]'s question (same stride-1
    * 8-gram sets, no banding recall question). The incremental
    * asymmetry: document frequency — the shared total order every
    * PPJoin prefix must agree on — comes from the CORPUS side only
    * (the stable index-side statistic a deployment precomputes);
    * increment grams unseen in the corpus take df = 0 and sort first,
    * which preserves completeness (ANY common total order does — the
    * rarest-first choice is only the pruning heuristic) at a small
    * prefix-selectivity cost on those grams.
    *
    * Scale shape: identical to [[setSimJoin]] — candidates carry ids
    * only, all three PPJoin bounds prune inside the join, the verify
    * stage is size-conditional per side (a huge corpus sort-merges on
    * its id while a small daily increment still broadcasts). */
  def setSimJoinIncremental(corpus: DataFrame, corpusId: String,
      newDocs: DataFrame, newId: String, tPpm: Long): DataFrame = {
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    latin1Guard(corpus); latin1Guard(newDocs)
    val gramsC = packedGrams(corpus, corpusId)
    val gramsN = packedGrams(newDocs, newId)
    val setsC = gramSetsOf(gramsC)
    val setsN = gramSetsOf(gramsN)
    val szC = sizer(corpus.sparkSession, setsC)
    val szN = sizer(corpus.sparkSession, setsN)
    val freq = gramsC.groupBy(col("g64")).agg(count(lit(1)).as("df"))
    val prefixC = prefixOf(gramsC, freq, setsC, szC, tPpm, leftJoinFreq = false)
    val prefixN = prefixOf(gramsN, freq, setsN, szN, tPpm, leftJoinFreq = true)
    // over the broadcast threshold the verify can switch to the
    // PACKED payload (round 14 — the q126 regime switch, incremental
    // edition): the corpus side packs against its own dictionary, the
    // batch side against the CORPUS dictionary (packedGramSetsAgainst
    // — unseen grams take non-intersecting high ids), so the varint
    // intersect counts exactly the common grams. UNLIKE the index
    // path (where gv is a sunk build cost), this path packs FRESH per
    // probe — measured at the forced-30× rehearsal point: with ~0
    // candidates the packing pass made packed 2.5× SLOWER (60.8 vs
    // 24.4 s), while q126's 30× candidate exchange made packed 7×
    // faster (224 → 32 s, round 12). So the AUTO rule weighs the
    // forecasted candidate exchange against the packing cost: pack
    // iff slots × unpacked-row-bytes > both sides' gram mass (one
    // linear scan — the packing pre-pass proxy). The slot count is
    // the same Σ cN·cC the q260 forecast prices — "price it, then run
    // it" deciding the PLAN, not just the budget.
    // graft.setsim.packedVerify: unset → auto; "true" → always packed
    // when over threshold (the differential spec's determinism);
    // "false" → never.
    val overThreshold =
      szC.gramBytes > szC.limit || szN.gramBytes > szN.limit
    val conf = corpus.sparkSession.conf
    val gateBudget = conf
      .getOption("graft.setsim.incremental.maxExchangeBytes").map(_.toLong)
    val packedMode = packedVerifyConf(corpus.sparkSession)
    val needSlots = gateBudget.isDefined ||
      (overThreshold && packedMode.isEmpty)
    // the slot pre-pass and the candidate join both read the prefix
    // tables — persist them when both consumers exist (the q65/q146
    // multi-consumer rule; unpersisted prefixes re-ran their whole
    // window builds for the forecast — 133 → 26 s on the 30× row)
    val (prefN, prefC) =
      if (needSlots)
        (register(prefixN.persist(StorageLevel.MEMORY_AND_DISK)),
          register(prefixC.persist(StorageLevel.MEMORY_AND_DISK)))
      else (prefixN, prefixC)
    val slotsOpt =
      if (needSlots) Some(joinSlots(prefN, prefC)) else None
    val unpackedRow = szC.gramBytes / math.max(szC.nDocs, 1L) + 24L
    val packedRegime = overThreshold && (packedMode match {
      case Some(pinned) => pinned
      case None => slotsOpt.exists { case (sl, _) =>
        BigInt(sl) * BigInt(unpackedRow) >
          BigInt(szC.gramBytes) + BigInt(szN.gramBytes) }
    })
    lazy val setsCp = register(packedGramSetsOf(gramsC, freq)
      .persist(StorageLevel.MEMORY_AND_DISK))
    lazy val setsNp = register(packedGramSetsAgainst(gramsN, freq)
      .persist(StorageLevel.MEMORY_AND_DISK))
    // OPT-IN pre-flight budget (the q259 gate, incremental edition —
    // VERDICT r13 #1, priced exactly like the q260 forecast): when
    // graft.setsim.incremental.maxExchangeBytes is set, the batch×
    // corpus candidate-slot count Σ_g cN(g)·cC(g) runs first (two
    // keyed counts + one vocabulary-sized join, no pair materialized)
    // and an over-budget probe fails LOUDLY. Row bytes price what the
    // verify SHIPS in the chosen regime. Unset costs nothing.
    gateBudget.foreach { budget =>
      val (sl, mx) = slotsOpt.get
      val rowBytes =
        if (packedRegime)
          setsCp.agg(sum(length(col("gv")).cast("long"))).head()
            .getLong(0) / math.max(szC.nDocs, 1L) + 24L
        else unpackedRow
      failBudget("setSimJoinIncremental",
        "graft.setsim.incremental.maxExchangeBytes", budget, sl, mx,
        rowBytes)
    }
    val cand = prefN.select(col("doc_id").as("new_doc_id"), col("g64"),
        col("pos").as("pa"), col("n").as("na"))
      .join(prefC.select(col("doc_id").as("corpus_doc_id"), col("g64"),
        col("pos").as("pb"), col("n").as("nb")), Seq("g64"))
      .filter(ppjoinBounds(tPpm))
      .select(col("new_doc_id"), col("corpus_doc_id"))
      .distinct()
    if (packedRegime)
      verifyPairsPackedTwo(cand, setsNp, "new_doc_id",
        setsCp, "corpus_doc_id", tPpm)
    else
      verifyPairs(cand, setsN, "new_doc_id", setsC, "corpus_doc_id",
        szN, szC, tPpm)
  }

  /** Batch-side packed signature table against a CORPUS dictionary:
    * grams the corpus knows take the corpus gid — so the sorted
    * varint intersect counts EXACTLY the common grams of a
    * batch×corpus pair — and unseen grams take 2^44 + a dense rank of
    * their own (deterministic, distributed — the dictIdsOf machinery
    * with df = 0), ids that can never collide with a corpus gid: a
    * 100 TB corpus holds O(10^11) distinct 8-grams, two orders below
    * 2^44, and dictIdsOf ranks are row_numbers bounded by the
    * dictionary size. Unseen ids therefore never intersect anything,
    * which is exact — an unseen gram is by definition in no corpus
    * document. */
  private def packedGramSetsAgainst(gramsN: DataFrame,
      corpusFreq: DataFrame): DataFrame = {
    val withIds = gramsN
      .join(dictIdsOf(corpusFreq), Seq("g64"), "left")
    val unseen = dictIdsOf(
        withIds.filter(col("gid").isNull).select(col("g64"))
          .distinct().withColumn("df", lit(0L)))
      .select(col("g64"), (col("gid") + lit(1L << 44)).as("ugid"))
    withIds.join(unseen, Seq("g64"), "left")
      .select(col("doc_id"), col("g64"),
        coalesce(col("gid"), col("ugid")).as("id"))
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("g64"))).as("gs"),
        count(lit(1)).as("n"),
        call_function("varint_delta_pack",
          sort_array(collect_list(col("id")))).as("gv"))
  }

  /** INJECTIVITY PRECONDITION (Latin-1): the 8-bit-per-char packing is
    * injective only while every codepoint is <= 0xFF — a char >=
    * U+0100 overflows its byte slot into the neighbour, so distinct
    * grams could collide and silently inflate the exact intersection
    * counts. Guard: one projection-only scan of the text column that
    * fails fast on non-Latin-1 input (disable via
    * graft.setsim.latin1Check=false only if the corpus is known clean
    * and the extra scan matters). */
  private def latin1Guard(docs: DataFrame): Unit =
    if (docs.sparkSession.conf.getOption("graft.setsim.latin1Check")
        .forall(_.toBoolean) &&
        !docs.filter(col("text").rlike("[^\\x00-\\xFF]")).isEmpty)
      throw new IllegalArgumentException(
        "setSimJoin: corpus contains characters above U+00FF; the " +
          "packed-long gram encoding is only injective for Latin-1 " +
          "text. Pre-filter or transliterate the corpus first.")

  /** Distinct stride-1 8-grams per doc, each packed INJECTIVELY into
    * one big-endian long (shingles are <= 8 LATIN-1 chars, guarded):
    * exactness preserved, unlike a hash — the frequency join,
    * candidate join, and sorted-set intersect all run on 8-byte
    * integers instead of strings (cheaper compares, smaller shuffles/
    * broadcasts). The long order equals the byte order, so it stays a
    * valid shared total order for the prefix. Persisted + registered. */
  private def packedGrams(docs: DataFrame, idCol: String): DataFrame = {
    val packed = (1 to 8).foldLeft(lit(0L)) { (acc, i) =>
      shiftleft(acc, 8) + ascii(substring(col("gram"), i, 1)).cast("long")
    }
    register(docs
      .select(col(idCol).as("doc_id"), explode(array_distinct(expr(
        "transform(sequence(1, greatest(length(text) - 7, 1))," +
          " i -> substring(text, i, 8))"))).as("gram"))
      .select(col("doc_id"), packed.as("g64"))
      .persist(StorageLevel.MEMORY_AND_DISK))
  }

  /** Sorted gram array + size per doc (the verify-stage signature
    * table). Persisted + registered. */
  private def gramSetsOf(grams: DataFrame): DataFrame =
    register(grams.groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("g64"))).as("gs"),
        count(lit(1)).as("n"))
      .persist(StorageLevel.MEMORY_AND_DISK))

  /** Size-conditional broadcast policy for one signature table: one
    * aggregate over the persisted frame (a driver scalar) estimates
    * the broadcast payload — 8 B per packed gram + ~48 B/row array/
    * field overhead. The lengths-only frame (doc_id, n) clears the
    * threshold far longer than the full gram arrays, but gets the
    * same guard: nothing corpus-sized is ever force-broadcast
    * (VERDICT r4 #1). Over the threshold the hint pins a shuffled
    * HASH join (no AQE flip back to broadcast, no sort of the
    * candidate stream — 2.6x faster than merge at the measured 10x
    * point, BASELINE.md round 5). The 1 GiB default is itself a
    * measured choice, twice: a ~120 MB gram-set broadcast beat the
    * shuffled path 13 s to 65 s (round 5), and at the 30x rehearsal
    * point the threshold CLIFF itself was the story — the 331 MB
    * signature table sat just over the old 256 MB limit and the
    * shuffled verify ran 224 s vs 14 s broadcast (16x, round 11).
    * Executors sized for 100 TB hold 1 GiB broadcasts routinely
    * (Spark's own hard cap is 8 GiB); the guard is against
    * CORPUS-sized (multi-GB) payloads, not dim-table-sized ones. */
  private final case class SetSizer(nDocs: Long, gramBytes: Long,
      limit: Long) {
    def apply(df: DataFrame, estBytes: Long): DataFrame =
      if (estBytes <= limit) broadcast(df) else df.hint("shuffle_hash")
  }

  private def sizer(sess: SparkSession, gramSets: DataFrame): SetSizer = {
    val limit = sess.conf.getOption("graft.setsim.broadcastBytes")
      .map(_.toLong).getOrElse(1024L * 1024 * 1024)
    val st = gramSets.agg(count(lit(1)).as("d"), sum(col("n")).as("g")).head()
    val nDocs = st.getLong(0)
    val gramBytes = (if (st.isNullAt(1)) 0L else st.getLong(1)) * 8L +
      nDocs * 48L
    SetSizer(nDocs, gramBytes, limit)
  }

  /** Frequency-ranked prefix of each doc's gram set: order by (df asc,
    * g64 asc), keep pos <= n − ⌈t·n⌉ + 1 (p >= 1 since ⌈t·n⌉ <= n).
    * `leftJoinFreq` admits grams absent from the frequency table with
    * df = 0 (the incremental asymmetry). */
  private def prefixOf(grams: DataFrame, freq: DataFrame,
      gramSets: DataFrame, sz: SetSizer, tPpm: Long,
      leftJoinFreq: Boolean): DataFrame =
    rankedGrams(grams, freq, gramSets, sz, leftJoinFreq)
      .filter(col("pos") <=
        col("n") - expr(s"($tPpm * n + 999999) DIV 1000000") + 1)

  /** Every gram with its position in the (df asc, g64 asc) shared
    * total order plus the doc's set size — [[prefixOf]] is this with
    * the prefix cutoff applied; the containment join needs the
    * UNFILTERED form for its container side. */
  private def rankedGrams(grams: DataFrame, freq: DataFrame,
      gramSets: DataFrame, sz: SetSizer,
      leftJoinFreq: Boolean): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val withDf =
      if (leftJoinFreq)
        grams.join(freq, Seq("g64"), "left").na.fill(0L, Seq("df"))
      else grams.join(freq, Seq("g64"))
    withDf
      .join(sz(gramSets.select(col("doc_id"), col("n")), sz.nDocs * 48L),
        Seq("doc_id"))
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("doc_id"))
          .orderBy(col("df").asc, col("g64").asc)))
  }

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
    private[Dedup] def sizerOf(sess: SparkSession): SetSizer =
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
  private def packedGramSetsOf(grams: DataFrame,
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
  private val IndexBuckets = 32

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
  private def attachIndexTable(spark: SparkSession, name: String,
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

  /** Exact set-CONTAINMENT join (q181): ordered pairs (a, b) where
    * C(a→b) = |grams(a) ∩ grams(b)| / |grams(a)| ≥ t — the asymmetric
    * near-dup relation Jaccard misses: a quoted paragraph, a
    * boilerplate-wrapped rehost, or a doc embedded whole in a larger
    * one has high containment but LOW Jaccard once the container
    * grows (J ≤ |a|/|b|). Containment-based dedup is what catches
    * "this document is inside that one" (the Bloom-filter dedup of
    * C4 / RealNews-style pipelines works per-span for the same
    * reason; PPJoin's prefix framework extends to containment —
    * Xiao et al.'s PPJoin family, which q126 already cites).
    *
    * Filter ladder (exact, completeness-preserving):
    *  - A-side PREFIX: a doc with containment ≥ t has at most
    *    n_a − ⌈t·n_a⌉ grams outside b, so among its first
    *    n_a − ⌈t·n_a⌉ + 1 grams in the shared (df asc, g64 asc)
    *    order at least one is in b — only the contained-side prefix
    *    prunes; the CONTAINER side must stay full (no symmetric
    *    prefix exists for containment).
    *  - SIZE lower bound: n_b ≥ t·n_a (b must be big enough to hold
    *    the required overlap). No upper bound — that is the point.
    *  - POSITIONAL: at the first shared gram (pa, pb) no earlier
    *    shared gram exists in a's order, so the overlap is at most
    *    1 + min(n_a − pa, n_b − pb); require ≥ ⌈t·n_a⌉ in ppm form.
    * Verify: exact sorted-set intersect; keep ni·1e6 ≥ t·n_a; emit
    * containment_ppm = ni·1e6 div n_a.
    *
    * Scale shape: identical bones to [[setSimJoin]] — the candidate
    * join carries ids only, the rarest-first prefix keeps the fan-out
    * at Σ_prefix df(g), the verify stage reuses the size-conditional
    * broadcast/shuffle_hash rule. The container side's full gram
    * table is the same persisted frame the prefix derives from (one
    * window, two consumers). */
  def containmentJoin(docs: DataFrame, idCol: String,
      tPpm: Long): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    latin1Guard(docs)
    val grams = packedGrams(docs, idCol)
    val gramSets = gramSetsOf(grams)
    val sz = sizer(docs.sparkSession, gramSets)
    val cand = containmentCandidatesOf(grams, gramSets, sz, tPpm)
    cand
      .join(sz(gramSets.select(col("doc_id").as("doc_a"),
        col("gs").as("gs_a"), col("n").as("na")), sz.gramBytes), Seq("doc_a"))
      .join(sz(gramSets.select(col("doc_id").as("doc_b"),
        col("gs").as("gs_b")), sz.gramBytes), Seq("doc_b"))
      .withColumn("ni", call_function("sorted_intersect_count",
        col("gs_a"), col("gs_b")))
      .filter(col("ni") * lit(1000000L) >= lit(tPpm) * col("na"))
      .select(col("doc_a"), col("doc_b"),
        expr("CAST((ni * 1000000) DIV na AS BIGINT)")
          .as("containment_ppm"))
  }

  /** Incremental exact containment (q191): for an ingest batch
    * against an existing corpus, BOTH containment directions —
    * `new_in_corpus` (the new doc is already inside something we
    * have: drop it) and `corpus_in_new` (the new doc is an EXTENDED
    * version of an existing one: supersede it) — the two decisions a
    * continuously-ingesting dedup pipeline actually takes, which the
    * symmetric q126 Jaccard join can't separate. Gram document
    * frequency — the shared total order — comes from the CORPUS side
    * only (the precomputed index-side statistic, the
    * setSimJoinIncremental asymmetry); increment-only grams take
    * df = 0 and sort first (completeness holds under ANY shared
    * order).
    *
    * Per direction the [[containmentJoin]] ladder applies with the
    * CONTAINED side prefixed and the container side full; each
    * direction verifies against its own na. One ranked-gram table per
    * side feeds both directions (prefix = filter, container = full —
    * two consumers of one persisted frame each).
    *
    * Scale shape: identical bones to [[setSimJoinIncremental]] —
    * id-only candidates, bounds inside the join, size-conditional
    * verify per side. */
  def containmentIncremental(corpus: DataFrame, corpusId: String,
      newDocs: DataFrame, newId: String, tPpm: Long): DataFrame = {
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    latin1Guard(corpus); latin1Guard(newDocs)
    val gramsC = packedGrams(corpus, corpusId)
    val gramsN = packedGrams(newDocs, newId)
    val setsC = gramSetsOf(gramsC)
    val setsN = gramSetsOf(gramsN)
    val szC = sizer(corpus.sparkSession, setsC)
    val szN = sizer(corpus.sparkSession, setsN)
    val freq = gramsC.groupBy(col("g64")).agg(count(lit(1)).as("df"))
    val rankedC = register(
      rankedGrams(gramsC, freq, setsC, szC, leftJoinFreq = false)
        .persist(StorageLevel.MEMORY_AND_DISK))
    val rankedN = register(
      rankedGrams(gramsN, freq, setsN, szN, leftJoinFreq = true)
        .persist(StorageLevel.MEMORY_AND_DISK))
    containmentDirections(rankedC, setsC, szC, rankedN, setsN, szN, tPpm)
  }

  /** The contained-side prefix cut, pos ≤ n − ⌈t·n⌉ + 1, over a
    * ranked-gram frame (pos, n). */
  private def prefixCutFilter(r: DataFrame, tPpm: Long): DataFrame =
    r.filter(col("pos") <=
      col("n") - expr(s"($tPpm * n + 999999) DIV 1000000") + 1)

  /** One containment direction's candidates: prefix-cut contained
    * side vs FULL container side, size + positional bounds inside
    * the join. */
  private def containCandidates(contained: DataFrame,
      container: DataFrame, tPpm: Long): DataFrame =
    prefixCutFilter(contained, tPpm)
      .select(col("doc_id").as("doc_a"), col("g64"),
        col("pos").as("pa"), col("n").as("na"))
      .join(container.select(col("doc_id").as("doc_b"), col("g64"),
        col("pos").as("pb"), col("n").as("nb")), Seq("g64"))
      .filter(col("nb") * lit(1000000L) >= lit(tPpm) * col("na") &&
        (least(col("na") - col("pa"), col("nb") - col("pb")) + 1) *
          lit(1000000L) >= lit(tPpm) * col("na"))
      .select(col("doc_a"), col("doc_b"))
      .distinct()

  /** One containment direction's exact verify against the contained
    * side's na. */
  private def containVerify(cand: DataFrame, setsA: DataFrame,
      szA: SetSizer, setsB: DataFrame, szB: SetSizer,
      tPpm: Long): DataFrame = cand
    .join(szA(setsA.select(col("doc_id").as("doc_a"),
      col("gs").as("gs_a"), col("n").as("na")), szA.gramBytes),
      Seq("doc_a"))
    .join(szB(setsB.select(col("doc_id").as("doc_b"),
      col("gs").as("gs_b")), szB.gramBytes), Seq("doc_b"))
    .withColumn("ni", call_function("sorted_intersect_count",
      col("gs_a"), col("gs_b")))
    .filter(col("ni") * lit(1000000L) >= lit(tPpm) * col("na"))
    .select(col("doc_a"), col("doc_b"),
      expr("CAST((ni * 1000000) DIV na AS BIGINT)")
        .as("containment_ppm"))

  /** Both containment directions over ranked corpus/increment gram
    * tables — the shared core of [[containmentIncremental]] and the
    * persisted-index path. */
  private def containmentDirections(rankedC: DataFrame, setsC: DataFrame,
      szC: SetSizer, rankedN: DataFrame, setsN: DataFrame, szN: SetSizer,
      tPpm: Long): DataFrame = {
    val newInCorpus = containVerify(
        containCandidates(rankedN, rankedC, tPpm),
        setsN, szN, setsC, szC, tPpm)
      .select(col("doc_a").as("new_doc_id"),
        col("doc_b").as("corpus_doc_id"),
        lit("new_in_corpus").as("direction"), col("containment_ppm"))
    val corpusInNew = containVerify(
        containCandidates(rankedC, rankedN, tPpm),
        setsC, szC, setsN, szN, tPpm)
      .select(col("doc_b").as("new_doc_id"),
        col("doc_a").as("corpus_doc_id"),
        lit("corpus_in_new").as("direction"), col("containment_ppm"))
    newInCorpus.unionByName(corpusInNew)
  }

  /** Query (q191): both containment directions of the newest-10%-of-
    * ids ingest batch against the other 90% as the indexed corpus,
    * C ≥ 0.9. The cutoff is DATA-DERIVED ((max_id+1)·9 div 10, the
    * autoK rule, re-derived by the oracle) so the corpus:batch ratio
    * matches the deployment shape at every scale — the round-10 fixed
    * id<400 split made the "increment" 92% of the sf0.1 corpus, which
    * inverted the asymmetry the persisted index exists for. */
  def containmentIncrementalQuery(spark: SparkSession,
      dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    // the corpus side rides its own persisted index snapshot (ranked
    // grams + signature table + the df order the ingest ranks by);
    // only the increment's grams are computed fresh — the deployment
    // shape: index once, probe per ingest batch.
    val maxId = Tables.documents(spark, dir)
      .agg(max(col("doc_id"))).head().getLong(0)
    val cutoff = (maxId + 1L) * 9L / 10L
    val idx = persistedSetSimIndex(spark, dir, "docs_p90",
      (s, d) => Tables.documents(s, d).filter(col("doc_id") < cutoff))
    val newDocs = Tables.documents(spark, dir)
      .filter(col("doc_id") >= cutoff)
    latin1Guard(newDocs)
    val szC = idx.sizerOf(spark)
    val gramsN = packedGrams(newDocs, "doc_id")
    val setsN = gramSetsOf(gramsN)
    val szN = sizer(spark, setsN)
    val rankedN = register(
      rankedGrams(gramsN, idx.freq, setsN, szN, leftJoinFreq = true)
        .persist(StorageLevel.MEMORY_AND_DISK))
    // OPT-IN pre-flight budget (VERDICT r13 #1): price BOTH direction
    // joins — Σ_g cNprefix(g)·cCfull(g) + Σ_g cCprefix(g)·cNfull(g) —
    // before either fans out; row bytes from the corpus side (the
    // side that outgrows broadcast first). Unset costs nothing.
    spark.conf.getOption("graft.containment.maxExchangeBytes")
      .map(_.toLong).foreach { budget =>
        val (s1, m1) =
          joinSlots(prefixCutFilter(rankedN, 900000L), idx.ranked)
        val (s2, m2) =
          joinSlots(prefixCutFilter(idx.ranked, 900000L), rankedN)
        failBudget("containmentIncrementalQuery",
          "graft.containment.maxExchangeBytes", budget,
          s1 + s2, math.max(m1, m2),
          idx.gramBytes / math.max(idx.nDocs, 1L) + 24L)
      }
    containmentDirections(idx.ranked, idx.gramSets, szC,
        rankedN, setsN, szN, 900000L)
      .repartition(1)
      .sortWithinPartitions(col("new_doc_id"), col("corpus_doc_id"),
        col("direction"), col("containment_ppm"))
  }

  /** DuckDB oracle for [[containmentIncrementalQuery]] — brute force
    * both directions over the same split, with the 90% cutoff
    * RE-DERIVED from the data (the autoK rule). */
  def containmentIncrementalOracleSql(tPpm: Long = 900000L): String =
    s"""WITH cut AS (
       |  SELECT (MAX(doc_id) + 1) * 9 // 10 AS c FROM documents),
       |g AS (
       |  SELECT doc_id, unnest(list_distinct([substr(text, i, 8)
       |    FOR i IN range(1, greatest(length(text) - 7, 1) + 1)])) AS gram
       |  FROM documents),
       |s AS (SELECT doc_id, count(*) AS n FROM g GROUP BY doc_id),
       |i AS (
       |  SELECT n.doc_id AS new_doc_id, c.doc_id AS corpus_doc_id,
       |    count(*) AS ni
       |  FROM g n JOIN g c ON n.gram = c.gram CROSS JOIN cut
       |  WHERE n.doc_id >= cut.c AND c.doc_id < cut.c
       |  GROUP BY 1, 2),
       |bo AS (
       |  SELECT new_doc_id, corpus_doc_id, 'new_in_corpus' AS direction,
       |    CAST((ni * 1000000) // sn.n AS BIGINT) AS containment_ppm
       |  FROM i JOIN s sn ON sn.doc_id = new_doc_id
       |  WHERE ni * 1000000 >= $tPpm * sn.n
       |  UNION ALL
       |  SELECT new_doc_id, corpus_doc_id, 'corpus_in_new',
       |    CAST((ni * 1000000) // sc.n AS BIGINT)
       |  FROM i JOIN s sc ON sc.doc_id = corpus_doc_id
       |  WHERE ni * 1000000 >= $tPpm * sc.n)
       |SELECT new_doc_id, corpus_doc_id, direction, containment_ppm
       |FROM bo
       |ORDER BY new_doc_id, corpus_doc_id, direction,
       |  containment_ppm""".stripMargin

  /** Pre-flight diagnostic: containment candidate pairs after the
    * prefix/size/positional ladder, before verify (the q126
    * setSimCandidates twin). */
  def containmentCandidates(docs: DataFrame, idCol: String,
      tPpm: Long): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    latin1Guard(docs)
    val grams = packedGrams(docs, idCol)
    val gramSets = gramSetsOf(grams)
    containmentCandidatesOf(grams, gramSets,
      sizer(docs.sparkSession, gramSets), tPpm)
  }

  private def containmentCandidatesOf(grams: DataFrame,
      gramSets: DataFrame, sz: SetSizer, tPpm: Long): DataFrame = {
    val freq = grams.groupBy(col("g64")).agg(count(lit(1)).as("df"))
    val ranked = register(
      rankedGrams(grams, freq, gramSets, sz, leftJoinFreq = false)
        .persist(StorageLevel.MEMORY_AND_DISK))
    containmentCandidatesFromRanked(ranked, tPpm)
  }

  /** Containment candidate self-join over a ranked-gram table
    * (doc_id, g64, pos, n): prefix-cut contained side vs full
    * container side, excluding self-pairs — shared by the
    * from-scratch path and the persisted-index path. */
  private def containmentCandidatesFromRanked(ranked: DataFrame,
      tPpm: Long): DataFrame = {
    val a = prefixCutFilter(ranked, tPpm)
      .select(col("doc_id").as("doc_a"), col("g64"),
        col("pos").as("pa"), col("n").as("na"))
    val b = ranked.select(col("doc_id").as("doc_b"), col("g64"),
      col("pos").as("pb"), col("n").as("nb"))
    a.join(b, Seq("g64"))
      .filter(col("doc_a") =!= col("doc_b") &&
        col("nb") * lit(1000000L) >= lit(tPpm) * col("na") &&
        (least(col("na") - col("pa"), col("nb") - col("pb")) + 1) *
          lit(1000000L) >= lit(tPpm) * col("na"))
      .select(col("doc_a"), col("doc_b"))
      .distinct()
  }

  /** Query (q181): contained→container pairs at C ≥ 0.9, ordered by
    * the q126 single-partition-sort convention. t = 0.9 over 0.8 is a
    * MEASURED choice (sf0.1, cold caches): the shorter prefix +
    * tighter positional bound cut candidates 5.6M → 1.4M and the full
    * join 11.2 → 7.7 s while the verified pair set is essentially
    * unchanged (512 → 511 — this corpus's containments are
    * near-total), so the looser threshold bought nothing but
    * candidate volume. */
  def containmentNearDups(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    // same persisted index as q126 — one corpus artifact serves both
    // the Jaccard and the containment family (the ranked table is
    // threshold- and measure-independent).
    val idx = persistedSetSimIndex(spark, dir, "docs", Tables.documents _)
    // OPT-IN pre-flight budget (the q259 gate, containment edition —
    // VERDICT r13 #1): when graft.containment.maxExchangeBytes is
    // set, the q263 forecast runs first and an over-budget candidate
    // join fails LOUDLY with the numbers. Unset costs nothing.
    spark.conf.getOption("graft.containment.maxExchangeBytes")
      .map(_.toLong).foreach { budget =>
        val r = containmentPreflightOn(idx.ranked, idx.freq,
            idx.gramSets, idx.nDocs, idx.gramBytes)
          .filter(col("t_ppm") === 900000L).head()
        failBudget("containmentNearDups",
          "graft.containment.maxExchangeBytes", budget,
          r.getAs[Long]("fanout_slots"), r.getAs[Long]("max_gram_slots"),
          r.getAs[Long]("est_row_bytes"))
      }
    val sz = idx.sizerOf(spark)
    val cand = containmentCandidatesFromRanked(idx.ranked, 900000L)
    // same regime switch as setSimNearDups (round 14): over the
    // broadcast threshold the unpacked verify pays the gram-array
    // exchange between its two joins — both sides ride the index's
    // gv packing, so the packed verify applies verbatim
    val verified =
      if (sz.gramBytes > sz.limit &&
          packedVerifyConf(spark).getOrElse(true))
        containVerifyPacked(cand, idx.gramSets, 900000L)
      else
        containVerify(cand, idx.gramSets, sz, idx.gramSets, sz, 900000L)
    verified
      .repartition(1)
      .sortWithinPartitions(col("doc_a"), col("doc_b"),
        col("containment_ppm"))
  }

  /** DuckDB oracle for [[containmentNearDups]] — the q126 brute-force
    * shape with the asymmetric threshold (doubles as the candidate-
    * completeness gate: any filter bug drops a pair and fails the
    * hash). */
  def containmentOracleSql(tPpm: Long = 900000L): String =
    s"""WITH g AS (
       |  SELECT doc_id, unnest(list_distinct([substr(text, i, 8)
       |    FOR i IN range(1, greatest(length(text) - 7, 1) + 1)])) AS gram
       |  FROM documents),
       |s AS (SELECT doc_id, count(*) AS n FROM g GROUP BY doc_id),
       |i AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS ni
       |  FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id <> b.doc_id
       |  GROUP BY 1, 2)
       |SELECT doc_a, doc_b,
       |  CAST((ni * 1000000) // sa.n AS BIGINT) AS containment_ppm
       |FROM i
       |JOIN s sa ON sa.doc_id = doc_a
       |WHERE ni * 1000000 >= $tPpm * sa.n
       |ORDER BY doc_a, doc_b, containment_ppm""".stripMargin

  /** The LENGTH and POSITIONAL PPJoin bounds, expecting columns
    * (pa, na) and (pb, nb) from the two prefixes:
    * length — J ≥ t forces t·max(na,nb) ≤ min(na,nb);
    * positional — (min_rem + 1)·(1+t) >= t·(na+nb), the exact integer
    * form of min_rem + 1 >= ⌈t/(1+t)·(na+nb)⌉. */
  private def ppjoinBounds(tPpm: Long): Column =
    col("nb") * lit(1000000L) >= lit(tPpm) * col("na") &&
      col("na") * lit(1000000L) >= lit(tPpm) * col("nb") &&
      (least(col("na") - col("pa"), col("nb") - col("pb")) + 1) *
        lit(1000000L + tPpm) >= lit(tPpm) * (col("na") + col("nb"))

  /** Verify stage: fetch both sides' sorted gram arrays (size-
    * conditionally broadcast), exact two-cursor intersect, final
    * Jaccard threshold in integer ppm. */
  private def verifyPairs(cand: DataFrame, setsA: DataFrame, aCol: String,
      setsB: DataFrame, bCol: String, szA: SetSizer, szB: SetSizer,
      tPpm: Long): DataFrame =
    cand
      .join(szA(setsA.select(col("doc_id").as(aCol),
        col("gs").as("gs_a"), col("n").as("na")), szA.gramBytes), Seq(aCol))
      .join(szB(setsB.select(col("doc_id").as(bCol),
        col("gs").as("gs_b"), col("n").as("nb")), szB.gramBytes), Seq(bCol))
      .withColumn("ni", call_function("sorted_intersect_count",
        col("gs_a"), col("gs_b")))
      .filter(col("ni") * lit(1000000L) >=
        lit(tPpm) * (col("na") + col("nb") - col("ni")))
      .select(col(aCol), col(bCol),
        expr("CAST((ni * 1000000) DIV (na + nb - ni) AS BIGINT)")
          .as("jaccard_ppm"))

  /** Query: every document pair with exact shingle Jaccard ≥ 0.7.
    * The total order comes from a single-partition sort rather than
    * orderBy: a global sort's range-boundary SAMPLING pass re-executes
    * the whole verify subtree (measured 2x, 35 s -> 18 s at sf0.1);
    * the surviving pair set is tiny, so one post-shuffle partition
    * sorts it with the identical deterministic result. */
  def setSimNearDups(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    // rides the persisted corpus index (first call builds it; steady
    // state — including a later JVM on the same corpus — is a parquet
    // probe, the honest per-query cost of a deployed exact-dedup
    // system). Bit-identical to setSimJoin on the same docs.
    val idx = persistedSetSimIndex(spark, dir, "docs", Tables.documents _)
    // OPT-IN pre-flight budget (the q259 gate as a CONTROL, not just
    // a report): when graft.setsim.maxExchangeBytes is set, the
    // forecast runs first (scale-flat — 1.1 s at the 100× rehearsal
    // point) and a verify whose estimated candidate×payload exchange
    // exceeds the budget fails LOUDLY with the numbers, instead of
    // shuffling tens of GB to find out. Unset (the default) costs
    // nothing — tests and the bench never pay the extra aggregate.
    spark.conf.getOption("graft.setsim.maxExchangeBytes")
      .map(_.toLong).foreach { budget =>
      val r = setSimPreflightOn(idx.ranked, idx.gramSets, idx.nDocs,
          idx.gramBytes)
        .filter(col("t_ppm") === 700000L).head()
      val est = r.getAs[Long]("est_exchange_bytes")
      if (est > budget) throw new IllegalStateException(
        s"setSimNearDups pre-flight: estimated verify exchange $est B " +
          s"(${r.getAs[Long]("fanout_slots")} candidate-join slots × " +
          s"${r.getAs[Long]("est_row_bytes")} B/row, top gram " +
          s"${r.getAs[Long]("top_gram_share_ppm")} ppm of slots) " +
          s"exceeds graft.setsim.maxExchangeBytes=$budget — tighten " +
          "the threshold, salt the top gram, or raise the budget")
    }
    val sz = idx.sizerOf(spark)
    val cand = selfCandidatesFromPrefix(
      prefixCutFilter(idx.ranked, 700000L), 700000L)
    // over the broadcast threshold the classic verify pays the
    // gram-array exchange between its two joins (the 30× 224 s
    // cliff); the index path then switches to the PACKED verify
    // (delta-varint gram sets, ~4× smaller exchange, no array on any
    // exchange) unless explicitly disabled
    val verified =
      if (sz.gramBytes > sz.limit &&
          packedVerifyConf(spark).getOrElse(true))
        verifyPairsPacked(cand, idx.gramSets, 700000L)
      else
        verifyPairs(cand, idx.gramSets, "doc_a", idx.gramSets, "doc_b",
          sz, sz, 700000L)
    verified
      .repartition(1)
      .sortWithinPartitions(col("doc_a"), col("doc_b"), col("jaccard_ppm"))
  }

  /** Threshold sweep (q258): the payoff of the THRESHOLD-INDEPENDENT
    * index — one candidate+verify pass at the loosest threshold
    * (t = 0.6) yields the exact verified-pair table with exact
    * Jaccard per pair, and every tighter cut's pair count and mean
    * Jaccard is a FILTER over that table: "how aggressive does dedup
    * get as t moves" answered with zero extra joins. The swept cuts
    * are DATA-DERIVED (the autoK rule — round 11's fixed-constant
    * bug class): the exact nearest-rank quartile VALUES of the
    * verified-pair J distribution, so the rows differentiate at any
    * scale and the oracle re-derives the cuts; nearest-rank values
    * are tie-order-invariant (the Theil–Sen rule). */
  def thresholdSweep(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val sess = spark
    import sess.implicits._
    import org.apache.spark.sql.expressions.Window
    val idx = persistedSetSimIndex(spark, dir, "docs", Tables.documents _)
    val sz = idx.sizerOf(spark)
    val base = 600000L
    val cand = selfCandidatesFromPrefix(
      prefixCutFilter(idx.ranked, base), base)
    val pairs = register(
      verifyPairs(cand, idx.gramSets, "doc_a", idx.gramSets, "doc_b",
        sz, sz, base).persist(StorageLevel.MEMORY_AND_DISK))
    sweepQuartiles(pairs)
  }

  /** The sweep over an exact verified-pair frame (jaccard_ppm): cuts
    * at nearest-rank quartile values, then per-cut count + integer
    * mean. Tiny input by construction — single-partition windows. */
  private[graft] def sweepQuartiles(pairs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sess = pairs.sparkSession
    import sess.implicits._
    val ranked = pairs.select(col("jaccard_ppm"))
      .withColumn("rn", row_number().over(Window.orderBy(col("jaccard_ppm"))))
      .withColumn("nn", count(lit(1)).over(
        Window.partitionBy().orderBy().rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)))
    // nearest rank k = ceil(pct·n/100):  (k−1)·100 < pct·n ≤ k·100
    val cuts = broadcast(Seq(25L, 50L, 75L).toDF("pct"))
      .join(ranked, col("rn") * 100L >= col("pct") * col("nn") &&
        (col("rn") - 1L) * 100L < col("pct") * col("nn"))
      .select(col("pct"), col("jaccard_ppm").as("t_ppm"))
    broadcast(cuts)
      .join(pairs, col("jaccard_ppm") >= col("t_ppm"))
      .groupBy(col("pct"), col("t_ppm"))
      .agg(count(lit(1)).as("n_pairs"),
        expr("CAST(sum(jaccard_ppm) div count(1) AS BIGINT)")
          .as("mean_j_ppm"))
      .orderBy(col("pct"))
  }

  /** DuckDB oracle for [[thresholdSweep]] — brute-force exact Jaccard
    * via the gram EQUIJOIN (the q126 completeness-gate form: only
    * co-occurring pairs pay an intersection, vs the all-pairs
    * LIST_INTERSECT that ran 12.5M comparisons at sf0.1), quartile
    * cuts re-derived by the same nearest-rank rule. */
  def thresholdSweepOracleSql(): String =
    s"""WITH g AS (
       |  SELECT doc_id, unnest(list_distinct([substr(text, i, 8)
       |    FOR i IN range(1, greatest(length(text) - 7, 1) + 1)])) AS gram
       |  FROM documents),
       |s AS (SELECT doc_id, count(*) AS n FROM g GROUP BY doc_id),
       |i AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS ni
       |  FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |j AS (
       |  SELECT (ni * 1000000) // (sa.n + sb.n - ni) AS jppm
       |  FROM i JOIN s sa ON sa.doc_id = doc_a
       |  JOIN s sb ON sb.doc_id = doc_b
       |  WHERE ni * 1000000 >= 600000 * (sa.n + sb.n - ni)),
       |r AS (
       |  SELECT jppm, ROW_NUMBER() OVER (ORDER BY jppm) AS rn,
       |    COUNT(*) OVER () AS nn
       |  FROM j),
       |c AS (
       |  SELECT pct, jppm AS t_ppm
       |  FROM (SELECT UNNEST([25, 50, 75]) AS pct) t JOIN r
       |    ON rn * 100 >= pct * nn AND (rn - 1) * 100 < pct * nn)
       |SELECT CAST(pct AS BIGINT) AS pct, CAST(t_ppm AS BIGINT) AS t_ppm,
       |  CAST(COUNT(*) AS BIGINT) AS n_pairs,
       |  CAST(SUM(jppm) // COUNT(*) AS BIGINT) AS mean_j_ppm
       |FROM c JOIN j ON j.jppm >= c.t_ppm
       |GROUP BY 1, 2
       |ORDER BY pct""".stripMargin

  /** Set-sim verify pre-flight (q259): the executable "price it, then
    * run it" gate for the exact-verification family (VERDICT r12 #4 —
    * the q229/q238-Σdeg² pattern applied to the family that ships).
    * From ONE keyed count over the threshold-independent index's
    * prefix table, BEFORE any candidate join runs, per swept
    * threshold:
    *  - `fanout_slots` = Σ_g C(c_g, 2) over per-gram prefix
    *    memberships — EXACTLY the row count the PPJoin candidate
    *    self-join processes (every slot is one evaluated pair; the
    *    length/positional bounds prune inside the join, so this is
    *    the work upper bound and the distinct-candidate upper bound);
    *  - `max_gram_slots` / `top_gram_share_ppm` — the skew read (one
    *    hot prefix gram = one hot join partition, the salting
    *    trigger);
    *  - `est_exchange_bytes` = slots × (avg packed payload + row
    *    overhead) — what the over-threshold PACKED verify would move
    *    between its two joins (the measured 30×/100× cost center),
    *    priced from the index's own varint column;
    *  - `packed_regime` — whether the verify would take the packed
    *    shuffle path at the DEFAULT 1 GiB broadcast limit (the
    *    gramBytes rule [[SetSizer]] applies). The flag is pinned to
    *    the default — NOT the configured `graft.setsim.broadcastBytes`
    *    — by contract (ADVICE r14): the DuckDB oracle cannot read
    *    Spark conf, so the column is a pure data property; under a
    *    custom limit the ACTUAL regime switch may differ from the
    *    flag (read est_exchange_bytes against your own limit).
    * At 1000× a deployment runs THIS query (seconds — one aggregate
    * over the prefix table), reads est_exchange_bytes against its
    * shuffle budget, and only then commits to the verify — or
    * tightens t / salts the top gram first.
    *
    * All outputs are exact integers derived from replayable state, so
    * the DuckDB oracle re-derives every number — including the varint
    * payload bytes, replayed gram-by-gram from the LEB128 length
    * formula ⌈bitlen/7⌉ against Spark's `length(gv)` of the actual
    * packed bytes: the hash compare proves the payload accounting
    * cross-engine.
    *
    * Scale shape: ONE conditional-count pass (the swept cuts NEST,
    * so one g64-keyed aggregate — zero exchange on the bucketed
    * index — covers every threshold; the threshold-spine join it
    * replaced tripled the ranked scan: 77.6 s vs 1.1 s warm at the
    * 100× rehearsal point) → 1-row fold → stack() reshape. The only
    * corpus-sized inputs are index-table scans; no candidate pair
    * ever materializes, and the warm gate measured scale-FLAT
    * (0.5–1.6 s across 1×/10×/100×). */
  def setSimPreflight(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val idx = persistedSetSimIndex(spark, dir, "docs", Tables.documents _)
    setSimPreflightOn(idx.ranked, idx.gramSets, idx.nDocs, idx.gramBytes)
  }

  /** Fresh-path (index-free) twin of [[setSimPreflight]] for the
    * differential spec — bit-identical by the same argument as
    * setSimNearDups vs setSimJoin (exact integer state throughout). */
  private[graft] def setSimPreflightDocs(docs: DataFrame,
      idCol: String): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    latin1Guard(docs)
    val grams = packedGrams(docs, idCol)
    val freq = grams.groupBy(col("g64")).agg(count(lit(1)).as("df"))
    val gramSets = register(packedGramSetsOf(grams, freq)
      .persist(StorageLevel.MEMORY_AND_DISK))
    val sz = sizer(docs.sparkSession, gramSets)
    setSimPreflightOn(
      rankedGrams(grams, freq, gramSets, sz, leftJoinFreq = false),
      gramSets, sz.nDocs, sz.gramBytes)
  }

  /** The swept thresholds. Prefix cuts NEST (lower t ⇒ longer
    * prefix), so one scan with one conditional count per t replaces a
    * 3-way threshold-spine join — measured 77.6 s → one-scan at the
    * 100× rehearsal point, where the spine join tripled the
    * 55M-row ranked-table scan and the (t, g64) shuffle. */
  private val PreflightTs = Seq(600000L, 700000L, 800000L)

  /** Per-gram prefix-membership counts for ALL swept thresholds in
    * one pass over the ranked table: rows failing even the loosest
    * cut drop before the aggregate; each tighter t is a conditional
    * count. Output: (g64, c<t>...) for each swept t. */
  private def preflightGramCounts(ranked: DataFrame,
      ts: Seq[Long] = PreflightTs): DataFrame = {
    def cutOk(t: Long) =
      col("pos") <= col("n") - expr(s"($t * n + 999999) DIV 1000000") + 1
    val cnts = ts.map(t =>
      sum(when(cutOk(t), 1L).otherwise(0L)).as(s"c$t"))
    ranked.filter(cutOk(ts.min))
      .groupBy(col("g64"))
      .agg(cnts.head, cnts.tail: _*)
  }

  /** Shared loud failure of the opt-in pre-flight budget gates (the
    * q259 `graft.setsim.maxExchangeBytes` control, generalized in
    * round 14 to every pair family per VERDICT r13 #1): the estimated
    * exchange is slots × rowBytes; over budget the join never runs
    * and the numbers land in the error. */
  private def failBudget(label: String, confKey: String, budget: Long,
      slots: Long, maxSlots: Long, rowBytes: Long): Unit = {
    val est = BigInt(slots) * BigInt(rowBytes)
    if (est > BigInt(budget)) {
      val share =
        if (slots == 0L) 0L
        else (BigInt(maxSlots) * 1000000 / BigInt(slots)).toLong
      throw new IllegalStateException(
        s"$label pre-flight: estimated verify exchange $est B ($slots " +
          s"candidate-join slots × $rowBytes B/row, top key $share ppm " +
          s"of slots) exceeds $confKey=$budget — tighten the " +
          "threshold, salt the hot key, or raise the budget")
    }
  }

  /** Candidate-join slot count of one gram-keyed join, WITHOUT
    * running it: per-gram counts of both sides, Σ_g cA(g)·cB(g) and
    * the hottest gram's product — exactly the row count the equi-join
    * processes before any post-join filter. Decimal accumulation
    * (products of corpus-scale counts overflow long). */
  private def joinSlots(a: DataFrame, b: DataFrame): (Long, Long) = {
    def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    val cA = a.groupBy(col("g64")).agg(count(lit(1)).as("ca"))
    val cB = b.groupBy(col("g64")).agg(count(lit(1)).as("cb"))
    val r = cA.join(cB, Seq("g64"))
      .agg(sum(dec(col("ca")) * dec(col("cb"))).as("sl"),
        max(dec(col("ca")) * dec(col("cb"))).as("mx"))
      .select(expr("CAST(coalesce(sl, 0) AS BIGINT)"),
        expr("CAST(coalesce(mx, 0) AS BIGINT)"))
      .head()
    (r.getLong(0), r.getLong(1))
  }

  private val ContainPreflightTs = Seq(800000L, 900000L, 950000L)

  /** Containment pre-flight (q263): the q259 "price it, then run it"
    * forecast for the containment family (VERDICT r13 #1 — the last
    * pair generator with a forecast-less entry). Per swept threshold:
    * the contained-side prefix rows, `fanout_slots` = Σ_g cA(g)·df(g)
    * — EXACTLY the rows the prefix-cut-contained × FULL-container
    * candidate join processes (the container side is unfiltered, so
    * its per-gram count IS the corpus document frequency the index
    * precomputes) — the hottest gram's slot share, and the exchange
    * estimate. `est_row_bytes` prices the PACKED gv row (the q259
    * methodology): since round 14 [[containmentNearDups]] switches to
    * [[containVerifyPacked]] exactly when the exchange regime engages
    * (over the broadcast threshold — under it the verify BROADCASTS
    * and never exchanges candidate×payload), so the packed row is
    * what the gated join actually ships; `packed_regime` flags the
    * switch AT THE DEFAULT 1 GiB limit (a pure data property the
    * oracle replays — see the q259 doc for the custom-limit caveat,
    * ADVICE r14). */
  def containmentPreflight(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val idx = persistedSetSimIndex(spark, dir, "docs", Tables.documents _)
    containmentPreflightOn(idx.ranked, idx.freq, idx.gramSets,
      idx.nDocs, idx.gramBytes)
  }

  private def containmentPreflightOn(ranked: DataFrame, freq: DataFrame,
      gramSets: DataFrame, nDocs: Long, gramBytes: Long): DataFrame = {
    def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    val perGram = preflightGramCounts(ranked, ContainPreflightTs)
      .join(freq, Seq("g64"))
    val aggs = ContainPreflightTs.flatMap { t =>
      Seq(sum(col(s"c$t")).as(s"pr$t"),
        sum(dec(col(s"c$t")) * dec(col("df"))).as(s"sl$t"),
        max(dec(col(s"c$t")) * dec(col("df"))).as(s"mx$t"))
    }
    val agg1 = perGram.agg(aggs.head, aggs.tail: _*)
    // packed payload statistics — one aggregate over the index's gv
    // column (the q259 `pay` shape)
    val pay = gramSets
      .agg(sum(length(col("gv")).cast("long")).as("gv_bytes"))
      .select(lit(nDocs).as("n_docs"),
        lit(gramBytes).as("gram_bytes"), col("gv_bytes"),
        expr(s"CAST(gv_bytes div ${math.max(nDocs, 1L)} + 24 AS BIGINT)")
          .as("est_row_bytes"))
    agg1.select(expr(
        s"stack(${ContainPreflightTs.size}, " + ContainPreflightTs.map(t =>
          s"${t}L, pr$t, sl$t, mx$t").mkString(", ") +
          ") AS (t_ppm, prefix_rows0, sl0, mx0)"))
      .select(col("t_ppm"),
        coalesce(col("prefix_rows0"), lit(0L)).as("prefix_rows"),
        coalesce(expr("CAST(sl0 AS BIGINT)"), lit(0L)).as("fanout_slots"),
        coalesce(expr("CAST(mx0 AS BIGINT)"), lit(0L)).as("max_gram_slots"))
      .crossJoin(broadcast(pay))
      .select(col("t_ppm"), col("prefix_rows"), col("fanout_slots"),
        col("max_gram_slots"),
        when(col("fanout_slots") === 0L, 0L)
          .otherwise(expr(
            "CAST((max_gram_slots * 1000000) div fanout_slots AS BIGINT)"))
          .as("top_gram_share_ppm"),
        col("n_docs"), col("gram_bytes"), col("gv_bytes"),
        col("est_row_bytes"),
        (col("fanout_slots") * col("est_row_bytes"))
          .as("est_exchange_bytes"),
        (col("gram_bytes") > lit(1073741824L)).as("packed_regime"))
      .orderBy(col("t_ppm"), col("prefix_rows"), col("fanout_slots"),
        col("max_gram_slots"), col("top_gram_share_ppm"), col("n_docs"),
        col("gram_bytes"), col("gv_bytes"), col("est_row_bytes"),
        col("est_exchange_bytes"), col("packed_regime"))
  }

  /** DuckDB oracle for [[containmentPreflight]]: replays the shared
    * total order, the contained-side prefix cut per swept t,
    * Σ cA·df in HUGEINT (the q259 oracle shape with the container
    * side's count = df), the dictionary rank (df desc, gram asc) and
    * the LEB128 payload length ⌈bitlen(delta)/7⌉ per delta of each
    * doc's sorted dense ids — byte-for-byte the varint_delta_pack
    * length (the q259 `del` CTE, verbatim). */
  def containmentPreflightOracleSql(): String =
    """WITH g AS (
      |  SELECT doc_id, unnest(list_distinct([substr(text, i, 8)
      |    FOR i IN range(1, greatest(length(text) - 7, 1) + 1)])) AS gram
      |  FROM documents),
      |f AS (SELECT gram, CAST(count(*) AS BIGINT) AS df
      |      FROM g GROUP BY gram),
      |s AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n
      |      FROM g GROUP BY doc_id),
      |r AS (
      |  SELECT g.doc_id, g.gram,
      |    ROW_NUMBER() OVER (PARTITION BY g.doc_id
      |      ORDER BY f.df ASC, g.gram ASC) AS pos, s.n
      |  FROM g JOIN f ON f.gram = g.gram JOIN s ON s.doc_id = g.doc_id),
      |t AS (SELECT UNNEST([800000, 900000, 950000]) AS t_ppm),
      |p AS (
      |  SELECT t_ppm, gram
      |  FROM t JOIN r ON pos <= n - ((t_ppm * n + 999999) // 1000000) + 1),
      |cg AS (SELECT t_ppm, gram, CAST(COUNT(*) AS HUGEINT) AS c
      |       FROM p GROUP BY 1, 2),
      |fan AS (
      |  SELECT cg.t_ppm, CAST(SUM(cg.c) AS BIGINT) AS prefix_rows,
      |    CAST(SUM(cg.c * f.df) AS BIGINT) AS fanout_slots,
      |    CAST(MAX(cg.c * f.df) AS BIGINT) AS max_gram_slots
      |  FROM cg JOIN f ON f.gram = cg.gram GROUP BY 1),
      |d AS (SELECT gram, ROW_NUMBER() OVER (ORDER BY df DESC, gram ASC)
      |        AS gid
      |      FROM f),
      |del AS (
      |  SELECT gid - COALESCE(LAG(gid) OVER (
      |    PARTITION BY doc_id ORDER BY gid), 0) AS delta
      |  FROM (SELECT g.doc_id, d.gid FROM g JOIN d ON d.gram = g.gram)),
      |st AS (
      |  SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM s) AS n_docs,
      |    (SELECT CAST(SUM(n) * 8 + COUNT(*) * 48 AS BIGINT) FROM s)
      |      AS gram_bytes,
      |    (SELECT CAST(SUM((LENGTH(BIN(delta)) + 6) // 7) AS BIGINT)
      |     FROM del) AS gv_bytes)
      |SELECT CAST(t.t_ppm AS BIGINT) AS t_ppm,
      |  COALESCE(prefix_rows, 0) AS prefix_rows,
      |  COALESCE(fanout_slots, 0) AS fanout_slots,
      |  COALESCE(max_gram_slots, 0) AS max_gram_slots,
      |  CASE WHEN COALESCE(fanout_slots, 0) = 0 THEN 0
      |    ELSE CAST(CAST(max_gram_slots AS HUGEINT) * 1000000
      |      // fanout_slots AS BIGINT) END AS top_gram_share_ppm,
      |  n_docs, gram_bytes, gv_bytes,
      |  CAST(gv_bytes // GREATEST(n_docs, 1) + 24 AS BIGINT)
      |    AS est_row_bytes,
      |  CAST(CAST(COALESCE(fanout_slots, 0) AS HUGEINT)
      |    * (gv_bytes // GREATEST(n_docs, 1) + 24) AS BIGINT)
      |    AS est_exchange_bytes,
      |  gram_bytes > 1073741824 AS packed_regime
      |FROM t LEFT JOIN fan ON fan.t_ppm = t.t_ppm
      |CROSS JOIN st
      |ORDER BY t_ppm, prefix_rows, fanout_slots, max_gram_slots,
      |  top_gram_share_ppm, n_docs, gram_bytes, gv_bytes, est_row_bytes,
      |  est_exchange_bytes, packed_regime""".stripMargin

  private def setSimPreflightOn(ranked: DataFrame, gramSets: DataFrame,
      nDocs: Long, gramBytes: Long): DataFrame = {
    val sess = ranked.sparkSession
    import sess.implicits._
    def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    val perGram = preflightGramCounts(ranked)
    val aggs = PreflightTs.flatMap { t =>
      Seq(sum(col(s"c$t")).as(s"pr$t"),
        sum(dec(col(s"c$t")) * dec(col(s"c$t") - 1)).as(s"sl$t"),
        max(dec(col(s"c$t")) * dec(col(s"c$t") - 1)).as(s"mx$t"))
    }
    val agg1 = perGram.agg(aggs.head, aggs.tail: _*)
    // one stack() reshape of the 1-row aggregate into the 3-row sweep
    // (a unionAll of per-t selects would re-run the aggregate 3x)
    val fan = agg1.select(expr(
        s"stack(${PreflightTs.size}, " + PreflightTs.map(t =>
          s"${t}L, pr$t, sl$t, mx$t").mkString(", ") +
          ") AS (t_ppm, prefix_rows0, slots2, mx2)"))
      .select(col("t_ppm"),
        coalesce(col("prefix_rows0"), lit(0L)).as("prefix_rows"),
        coalesce(expr("CAST(slots2 div 2 AS BIGINT)"), lit(0L))
          .as("fanout_slots"),
        coalesce(expr("CAST(mx2 div 2 AS BIGINT)"), lit(0L))
          .as("max_gram_slots"))
    // payload statistics: nDocs/gramBytes ride the index's
    // precomputed stats (zero actions); the packed payload is one
    // aggregate over the bucketed signature table's gv column
    val pay = gramSets
      .agg(sum(length(col("gv")).cast("long")).as("gv_bytes"))
      .select(lit(nDocs).as("n_docs"),
        lit(gramBytes).as("gram_bytes"), col("gv_bytes"),
        expr(s"CAST(gv_bytes div $nDocs + 24 AS BIGINT)")
          .as("est_row_bytes"))
    fan.crossJoin(broadcast(pay))
      .select(col("t_ppm"), col("prefix_rows"), col("fanout_slots"),
        col("max_gram_slots"),
        when(col("fanout_slots") === 0L, 0L)
          .otherwise(expr(
            "CAST((max_gram_slots * 1000000) div fanout_slots AS BIGINT)"))
          .as("top_gram_share_ppm"),
        col("n_docs"), col("gram_bytes"), col("gv_bytes"),
        col("est_row_bytes"),
        (col("fanout_slots") * col("est_row_bytes"))
          .as("est_exchange_bytes"),
        (col("gram_bytes") > lit(1073741824L)).as("packed_regime"))
      .orderBy(col("t_ppm"), col("prefix_rows"), col("fanout_slots"),
        col("max_gram_slots"), col("top_gram_share_ppm"), col("n_docs"),
        col("gram_bytes"), col("gv_bytes"), col("est_row_bytes"),
        col("est_exchange_bytes"), col("packed_regime"))
  }

  /** DuckDB oracle for [[setSimPreflight]]: replays the shared total
    * order (df asc, gram asc — string order == packed-long order for
    * Latin-1 grams), the prefix cut, the per-gram slot counts, the
    * dictionary rank (df desc, gram asc), and the LEB128 payload
    * length ⌈bitlen(delta)/7⌉ per delta of each doc's sorted dense
    * ids — byte-for-byte the varint_delta_pack length. */
  def setSimPreflightOracleSql(): String =
    """WITH g AS (
      |  SELECT doc_id, unnest(list_distinct([substr(text, i, 8)
      |    FOR i IN range(1, greatest(length(text) - 7, 1) + 1)])) AS gram
      |  FROM documents),
      |f AS (SELECT gram, CAST(count(*) AS BIGINT) AS df
      |      FROM g GROUP BY gram),
      |s AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n
      |      FROM g GROUP BY doc_id),
      |r AS (
      |  SELECT g.doc_id, g.gram,
      |    ROW_NUMBER() OVER (PARTITION BY g.doc_id
      |      ORDER BY f.df ASC, g.gram ASC) AS pos, s.n
      |  FROM g JOIN f ON f.gram = g.gram JOIN s ON s.doc_id = g.doc_id),
      |t AS (SELECT UNNEST([600000, 700000, 800000]) AS t_ppm),
      |p AS (
      |  SELECT t_ppm, gram
      |  FROM t JOIN r ON pos <= n - ((t_ppm * n + 999999) // 1000000) + 1),
      |cg AS (SELECT t_ppm, gram, CAST(COUNT(*) AS HUGEINT) AS c
      |       FROM p GROUP BY 1, 2),
      |fan AS (
      |  SELECT t_ppm, CAST(SUM(c) AS BIGINT) AS prefix_rows,
      |    CAST(SUM(c * (c - 1)) // 2 AS BIGINT) AS fanout_slots,
      |    CAST(MAX(c * (c - 1)) // 2 AS BIGINT) AS max_gram_slots
      |  FROM cg GROUP BY 1),
      |d AS (SELECT gram, ROW_NUMBER() OVER (ORDER BY df DESC, gram ASC)
      |        AS gid
      |      FROM f),
      |del AS (
      |  SELECT gid - COALESCE(LAG(gid) OVER (
      |    PARTITION BY doc_id ORDER BY gid), 0) AS delta
      |  FROM (SELECT g.doc_id, d.gid FROM g JOIN d ON d.gram = g.gram)),
      |st AS (
      |  SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM s) AS n_docs,
      |    (SELECT CAST(SUM(n) * 8 + COUNT(*) * 48 AS BIGINT) FROM s)
      |      AS gram_bytes,
      |    (SELECT CAST(SUM((LENGTH(BIN(delta)) + 6) // 7) AS BIGINT)
      |     FROM del) AS gv_bytes)
      |SELECT CAST(t_ppm AS BIGINT) AS t_ppm, prefix_rows, fanout_slots,
      |  max_gram_slots,
      |  CASE WHEN fanout_slots = 0 THEN 0
      |    ELSE CAST(CAST(max_gram_slots AS HUGEINT) * 1000000
      |      // fanout_slots AS BIGINT) END AS top_gram_share_ppm,
      |  n_docs, gram_bytes, gv_bytes,
      |  CAST(gv_bytes // n_docs + 24 AS BIGINT) AS est_row_bytes,
      |  CAST(CAST(fanout_slots AS HUGEINT)
      |    * (gv_bytes // n_docs + 24) AS BIGINT) AS est_exchange_bytes,
      |  gram_bytes > 1073741824 AS packed_regime
      |FROM fan CROSS JOIN st
      |ORDER BY t_ppm, prefix_rows, fanout_slots, max_gram_slots,
      |  top_gram_share_ppm, n_docs, gram_bytes, gv_bytes, est_row_bytes,
      |  est_exchange_bytes, packed_regime""".stripMargin

  /** Incremental set-sim pre-flight (q260): the [[setSimPreflight]]
    * gate for the shape a deployment actually runs DAILY — an ingest
    * batch probing the existing corpus ([[setSimJoinIncremental]]).
    * Per swept threshold, from per-side keyed counts over the two
    * prefix tables (corpus-side df is the shared total order; batch
    * grams unseen in the corpus rank first with df = 0 — the
    * incremental asymmetry), BEFORE any join runs:
    * `fanout_slots` = Σ_g cN(g)·cC(g) — exactly the row count the
    * batch×corpus candidate join processes; the top-gram skew share;
    * and the exchange-byte estimate from the CORPUS-side signature
    * payload (the side that outgrows broadcast first). The batch is
    * the derived newest-10% id slice (the q191/q254/q257 convention),
    * so the oracle re-derives the cutoff too.
    *
    * METHODOLOGY (ADVICE r13 #2, resolved twice): round 14 first
    * documented the unpacked estimate as the true row size, then gave
    * the incremental verify its PACKED regime ([[verifyPairsPackedTwo]]
    * over [[packedGramSetsAgainst]] — batch grams in the corpus-
    * dictionary id space), so this forecast now prices the packed gv
    * row exactly like q259: the exchange this estimate prices only
    * exists over the broadcast threshold, which is precisely when the
    * verify ships gv. `packed_regime` flags the switch at the DEFAULT
    * 1 GiB limit (a pure data property the oracle replays — see the
    * q259 doc for the custom-limit caveat, ADVICE r14); all three
    * pair-forecast queries now share one methodology. */
  def setSimPreflightIncremental(spark: SparkSession,
      dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val docs = Tables.documents(spark, dir)
    latin1Guard(docs)
    val cutoff =
      (docs.agg(max(col("doc_id"))).head().getLong(0) + 1L) * 9L / 10L
    val gramsC = packedGrams(docs.filter(col("doc_id") < cutoff), "doc_id")
    val gramsN = packedGrams(docs.filter(col("doc_id") >= cutoff), "doc_id")
    val setsC = gramSetsOf(gramsC)
    val setsN = gramSetsOf(gramsN)
    val szC = sizer(spark, setsC)
    val szN = sizer(spark, setsN)
    val freq = gramsC.groupBy(col("g64")).agg(count(lit(1)).as("df"))
    incrementalPreflightOn(
      rankedGrams(gramsC, freq, setsC, szC, leftJoinFreq = false),
      rankedGrams(gramsN, freq, setsN, szN, leftJoinFreq = true),
      gvByteLengths(gramsC, freq),
      szN.nDocs, szC.nDocs, szC.gramBytes)
  }

  /** Per-delta LEB128 byte lengths of the corpus gv packing WITHOUT
    * materializing any array or binary column: dict ids, per-doc
    * sorted-delta via a lag window, ⌈bitlen(delta)/7⌉ per row — the
    * sum is byte-identical to Σ length(gv) over [[packedGramSetsOf]]
    * (deltas ≥ 1 always: the first delta is the gid itself; the q259
    * oracle certifies the formula against the real column). The
    * forecast only needs the SUM, and building the actual arrays for
    * it cost ~40% of q260's fresh-path wall at 10×. */
  private def gvByteLengths(grams: DataFrame, freq: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    grams.join(dictIdsOf(freq), Seq("g64"))
      .withColumn("delta", col("gid") - coalesce(
        lag(col("gid"), 1).over(
          Window.partitionBy(col("doc_id")).orderBy(col("gid"))),
        lit(0L)))
      .select(expr("CAST((length(bin(delta)) + 6) DIV 7 AS BIGINT)")
        .as("gvb"))
  }

  /** Index-riding twin of [[setSimPreflightIncremental]] — the shape
    * a DEPLOYMENT runs daily (VERDICT r13 #4): the corpus side's
    * ranked table, df order, and sizing stats come from the persisted
    * prior-corpus index (the q191 `docs_p90` artifact — shared, so
    * one build serves both the containment probe and this gate); only
    * the ingest batch's grams rank fresh. Bit-identical to the fresh
    * path (Round14OpsSpec differential); the fresh path stays the
    * oracle face. The warm-gate rehearsal row reads THIS — the q259
    * convention: warm the index outside the timed run, then the gate
    * itself is the ~1 s scale-flat read. */
  def setSimPreflightIncrementalIndexed(spark: SparkSession,
      dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val docs = Tables.documents(spark, dir)
    val cutoff =
      (docs.agg(max(col("doc_id"))).head().getLong(0) + 1L) * 9L / 10L
    val idx = persistedSetSimIndex(spark, dir, "docs_p90",
      (s, d) => Tables.documents(s, d).filter(col("doc_id") < cutoff))
    val newDocs = docs.filter(col("doc_id") >= cutoff)
    latin1Guard(newDocs)
    val gramsN = packedGrams(newDocs, "doc_id")
    val setsN = gramSetsOf(gramsN)
    val szN = sizer(spark, setsN)
    incrementalPreflightOn(idx.ranked,
      rankedGrams(gramsN, idx.freq, setsN, szN, leftJoinFreq = true),
      idx.gramSets.select(length(col("gv")).cast("long").as("gvb")),
      szN.nDocs, idx.nDocs, idx.gramBytes)
  }

  /** Rehearsal instrument (q260i marginal row): the wired incremental
    * gate's cost OVER a probe that already built its prefix tables —
    * the deployment shape: [[setSimJoinIncremental]] builds
    * prefixN/prefixC for the candidate join regardless, and the gate
    * is one keyed-count pair + one vocabulary join on top. `warm()`
    * materializes and registry-persists both prefix tables (the
    * probe's own work, paid outside the timed read; corpus side off
    * the persisted index); `gate()` then prices Σ cN·cC from the warm
    * frames — the marginal control cost. */
  def incrementalGateInstrument(spark: SparkSession, dir: String,
      tPpm: Long = 700000L): (() => Unit, () => (Long, Long)) = {
    graft.functions.GraftFunctions.register(spark)
    val docs = Tables.documents(spark, dir)
    val cutoff =
      (docs.agg(max(col("doc_id"))).head().getLong(0) + 1L) * 9L / 10L
    val idx = persistedSetSimIndex(spark, dir, "docs_p90",
      (s, d) => Tables.documents(s, d).filter(col("doc_id") < cutoff))
    val newDocs = docs.filter(col("doc_id") >= cutoff)
    val gramsN = packedGrams(newDocs, "doc_id")
    val setsN = gramSetsOf(gramsN)
    val szN = sizer(spark, setsN)
    val prefixC = register(prefixCutFilter(idx.ranked, tPpm)
      .persist(StorageLevel.MEMORY_AND_DISK))
    val prefixN = register(
      prefixOf(gramsN, idx.freq, setsN, szN, tPpm, leftJoinFreq = true)
        .persist(StorageLevel.MEMORY_AND_DISK))
    (() => { prefixC.count(); prefixN.count(); () },
      () => joinSlots(prefixN, prefixC))
  }

  /** Shared core of the incremental pre-flight: per-side one-pass
    * conditional counts (the q259 trick: prefix cuts nest, so one
    * scan covers all swept thresholds), the slot join, and the
    * stacked sweep reshape. */
  private def incrementalPreflightOn(rankedC: DataFrame,
      rankedN: DataFrame, gvByteRows: DataFrame, nBatchDocs: Long,
      nCorpusDocs: Long, corpusGramBytes: Long): DataFrame = {
    val sess = rankedC.sparkSession
    import sess.implicits._
    // each side feeds the slot join AND its own prefix-row totals —
    // persisted (vocabulary-sized) so the window stack runs once
    val cC = register(preflightGramCounts(rankedC)
      .select(col("g64") +: PreflightTs.map(t => col(s"c$t").as(s"cc$t")): _*)
      .persist(StorageLevel.MEMORY_AND_DISK))
    val cN = register(preflightGramCounts(rankedN)
      .select(col("g64") +: PreflightTs.map(t => col(s"c$t").as(s"cn$t")): _*)
      .persist(StorageLevel.MEMORY_AND_DISK))
    def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    val slotAggs = PreflightTs.flatMap { t =>
      Seq(sum(dec(col(s"cn$t")) * dec(col(s"cc$t"))).as(s"sl$t"),
        max(dec(col(s"cn$t")) * dec(col(s"cc$t"))).as(s"mx$t"))
    }
    val fan1 = cN.join(cC, Seq("g64")).agg(slotAggs.head, slotAggs.tail: _*)
    val prNAggs = PreflightTs.map(t => sum(col(s"cn$t")).as(s"prn$t"))
    val prCAggs = PreflightTs.map(t => sum(col(s"cc$t")).as(s"prc$t"))
    val totals = cN.agg(prNAggs.head, prNAggs.tail: _*)
      .crossJoin(cC.agg(prCAggs.head, prCAggs.tail: _*))
      .crossJoin(fan1)
    // packed payload statistics (round 14 — the q259 methodology,
    // matching the regime-switched incremental verify): one aggregate
    // over the corpus side's per-delta gv byte lengths
    val pay = gvByteRows
      .agg(sum(col("gvb")).as("gv_bytes"))
      .select(lit(nBatchDocs).as("n_batch_docs"),
        lit(nCorpusDocs).as("n_corpus_docs"),
        lit(corpusGramBytes).as("corpus_gram_bytes"), col("gv_bytes"),
        expr(s"CAST(gv_bytes div ${math.max(nCorpusDocs, 1L)} + 24" +
          " AS BIGINT)").as("est_row_bytes"))
    totals.select(expr(
        s"stack(${PreflightTs.size}, " + PreflightTs.map(t =>
          s"${t}L, prn$t, prc$t, sl$t, mx$t").mkString(", ") +
          ") AS (t_ppm, prn0, prc0, sl0, mx0)"))
      .select(col("t_ppm"),
        coalesce(col("prn0"), lit(0L)).as("batch_prefix_rows"),
        coalesce(col("prc0"), lit(0L)).as("corpus_prefix_rows"),
        coalesce(expr("CAST(sl0 AS BIGINT)"), lit(0L)).as("fanout_slots"),
        coalesce(expr("CAST(mx0 AS BIGINT)"), lit(0L)).as("max_gram_slots"))
      .crossJoin(broadcast(pay))
      .select(col("t_ppm"), col("batch_prefix_rows"),
        col("corpus_prefix_rows"), col("fanout_slots"),
        col("max_gram_slots"),
        when(col("fanout_slots") === 0L, 0L)
          .otherwise(expr(
            "CAST((max_gram_slots * 1000000) div fanout_slots AS BIGINT)"))
          .as("top_gram_share_ppm"),
        col("n_batch_docs"), col("n_corpus_docs"),
        col("corpus_gram_bytes"), col("gv_bytes"), col("est_row_bytes"),
        (col("fanout_slots") * col("est_row_bytes"))
          .as("est_exchange_bytes"),
        (col("corpus_gram_bytes") > lit(1073741824L)).as("packed_regime"))
      .orderBy(col("t_ppm"), col("batch_prefix_rows"),
        col("corpus_prefix_rows"), col("fanout_slots"),
        col("max_gram_slots"), col("top_gram_share_ppm"),
        col("n_batch_docs"), col("n_corpus_docs"),
        col("corpus_gram_bytes"), col("gv_bytes"), col("est_row_bytes"),
        col("est_exchange_bytes"), col("packed_regime"))
  }

  /** DuckDB oracle for [[setSimPreflightIncremental]] — re-derives
    * the cutoff, the corpus-only df order (batch-unseen grams df = 0
    * via LEFT JOIN + COALESCE), both prefix cuts, and the per-gram
    * slot products. */
  def setSimPreflightIncrementalOracleSql(): String =
    """WITH cut AS (
      |  SELECT (MAX(doc_id) + 1) * 9 // 10 AS c FROM documents),
      |g AS (
      |  SELECT doc_id, unnest(list_distinct([substr(text, i, 8)
      |    FOR i IN range(1, greatest(length(text) - 7, 1) + 1)])) AS gram
      |  FROM documents),
      |gc AS (SELECT * FROM g WHERE doc_id < (SELECT c FROM cut)),
      |gn AS (SELECT * FROM g WHERE doc_id >= (SELECT c FROM cut)),
      |f AS (SELECT gram, CAST(count(*) AS BIGINT) AS df
      |      FROM gc GROUP BY gram),
      |sc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n
      |       FROM gc GROUP BY doc_id),
      |sn AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n
      |       FROM gn GROUP BY doc_id),
      |rc AS (
      |  SELECT gc.doc_id, gc.gram,
      |    ROW_NUMBER() OVER (PARTITION BY gc.doc_id
      |      ORDER BY f.df ASC, gc.gram ASC) AS pos, sc.n
      |  FROM gc JOIN f ON f.gram = gc.gram
      |  JOIN sc ON sc.doc_id = gc.doc_id),
      |rn AS (
      |  SELECT gn.doc_id, gn.gram,
      |    ROW_NUMBER() OVER (PARTITION BY gn.doc_id
      |      ORDER BY COALESCE(f.df, 0) ASC, gn.gram ASC) AS pos, sn.n
      |  FROM gn LEFT JOIN f ON f.gram = gn.gram
      |  JOIN sn ON sn.doc_id = gn.doc_id),
      |t AS (SELECT UNNEST([600000, 700000, 800000]) AS t_ppm),
      |pc AS (
      |  SELECT t_ppm, gram FROM t JOIN rc
      |    ON pos <= n - ((t_ppm * n + 999999) // 1000000) + 1),
      |pn AS (
      |  SELECT t_ppm, gram FROM t JOIN rn
      |    ON pos <= n - ((t_ppm * n + 999999) // 1000000) + 1),
      |cc AS (SELECT t_ppm, gram, CAST(COUNT(*) AS HUGEINT) AS c
      |       FROM pc GROUP BY 1, 2),
      |cn AS (SELECT t_ppm, gram, CAST(COUNT(*) AS HUGEINT) AS c
      |       FROM pn GROUP BY 1, 2),
      |fan AS (
      |  SELECT cn.t_ppm, CAST(SUM(cn.c * cc.c) AS BIGINT) AS fanout_slots,
      |    CAST(MAX(cn.c * cc.c) AS BIGINT) AS max_gram_slots
      |  FROM cn JOIN cc ON cn.t_ppm = cc.t_ppm AND cn.gram = cc.gram
      |  GROUP BY 1),
      |prn AS (SELECT t_ppm, CAST(SUM(c) AS BIGINT) AS batch_prefix_rows
      |        FROM cn GROUP BY 1),
      |prc AS (SELECT t_ppm, CAST(SUM(c) AS BIGINT) AS corpus_prefix_rows
      |        FROM cc GROUP BY 1),
      |d AS (SELECT gram, ROW_NUMBER() OVER (ORDER BY df DESC, gram ASC)
      |        AS gid
      |      FROM f),
      |del AS (
      |  SELECT gid - COALESCE(LAG(gid) OVER (
      |    PARTITION BY doc_id ORDER BY gid), 0) AS delta
      |  FROM (SELECT gc.doc_id, d.gid FROM gc JOIN d ON d.gram = gc.gram)),
      |st AS (
      |  SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM sn) AS n_batch_docs,
      |    (SELECT CAST(COUNT(*) AS BIGINT) FROM sc) AS n_corpus_docs,
      |    (SELECT CAST(SUM(n) * 8 + COUNT(*) * 48 AS BIGINT) FROM sc)
      |      AS corpus_gram_bytes,
      |    (SELECT CAST(SUM((LENGTH(BIN(delta)) + 6) // 7) AS BIGINT)
      |     FROM del) AS gv_bytes,
      |    (SELECT CAST(COUNT(*) AS BIGINT) FROM sc) AS nc0)
      |SELECT CAST(t.t_ppm AS BIGINT) AS t_ppm,
      |  COALESCE(batch_prefix_rows, 0) AS batch_prefix_rows,
      |  COALESCE(corpus_prefix_rows, 0) AS corpus_prefix_rows,
      |  COALESCE(fanout_slots, 0) AS fanout_slots,
      |  COALESCE(max_gram_slots, 0) AS max_gram_slots,
      |  CASE WHEN COALESCE(fanout_slots, 0) = 0 THEN 0
      |    ELSE CAST(CAST(max_gram_slots AS HUGEINT) * 1000000
      |      // fanout_slots AS BIGINT) END AS top_gram_share_ppm,
      |  n_batch_docs, n_corpus_docs, corpus_gram_bytes, gv_bytes,
      |  CAST(gv_bytes // GREATEST(nc0, 1) + 24 AS BIGINT)
      |    AS est_row_bytes,
      |  CAST(CAST(COALESCE(fanout_slots, 0) AS HUGEINT)
      |    * (gv_bytes // GREATEST(nc0, 1) + 24) AS BIGINT)
      |    AS est_exchange_bytes,
      |  corpus_gram_bytes > 1073741824 AS packed_regime
      |FROM t LEFT JOIN prn ON prn.t_ppm = t.t_ppm
      |LEFT JOIN prc ON prc.t_ppm = t.t_ppm
      |LEFT JOIN fan ON fan.t_ppm = t.t_ppm
      |CROSS JOIN st
      |ORDER BY t_ppm, batch_prefix_rows, corpus_prefix_rows,
      |  fanout_slots, max_gram_slots, top_gram_share_ppm, n_batch_docs,
      |  n_corpus_docs, corpus_gram_bytes, gv_bytes, est_row_bytes,
      |  est_exchange_bytes, packed_regime""".stripMargin

  /** Packed exact verify for the over-broadcast-threshold regime
    * (VERDICT r11 #5): identical semantics to [[verifyPairs]], but
    * the per-candidate payload is the delta-varint DICTIONARY packing
    * (gv, BinaryType) instead of the raw bigint gram array — ~4×
    * fewer exchanged bytes, and no exchange anywhere in the plan
    * carries an ArrayType column (the differential spec asserts
    * both). A df-capped inverted id-pair join was built and measured
    * first and rejected: on this corpus high-df grams dominate doc
    * membership, so its residual arrays kept 88% of the payload while
    * the uncapped inverted join generates Σ df² ≈ 17 B tuples at 30×
    * (see graft.functions.VarintGramSet).
    *
    * Join shape: shuffle_hash on both gram-set joins (sort-merge
    * would sort the fat candidate stream — hint-less SMJs measured
    * 235 s at 30×), with the build sides EXPLICITLY repartitioned on
    * the join key: their shuffles are small and AQE would otherwise
    * coalesce them into a handful of fat partitions whose per-task
    * hash builds blow the executor memory budget (measured:
    * SparkOutOfMemoryError at 30×) — an explicit numPartitions is
    * exempt from coalescing. */
  private def verifyPairsPacked(cand: DataFrame, gramSets: DataFrame,
      tPpm: Long): DataFrame =
    verifyPairsPackedTwo(cand, gramSets, "doc_a", gramSets, "doc_b", tPpm)

  /** Two-table form of the packed verify (round 14): the incremental
    * batch×corpus regime, where each side carries its own gv packing
    * over the SHARED corpus-dictionary id space (see
    * [[packedGramSetsAgainst]]). Identical join discipline to the
    * self-join form. */
  private def verifyPairsPackedTwo(cand: DataFrame, setsA: DataFrame,
      aCol: String, setsB: DataFrame, bCol: String,
      tPpm: Long): DataFrame = {
    val nP = cand.sparkSession.sessionState.conf.numShufflePartitions
    cand
      .join(setsA.select(col("doc_id").as(aCol),
          col("gv").as("gv_a"), col("n").as("na"))
        .repartition(nP, col(aCol)).hint("shuffle_hash"),
        Seq(aCol))
      .join(setsB.select(col("doc_id").as(bCol),
          col("gv").as("gv_b"), col("n").as("nb"))
        .repartition(nP, col(bCol)).hint("shuffle_hash"),
        Seq(bCol))
      .withColumn("ni", call_function("sorted_varint_intersect_count",
        col("gv_a"), col("gv_b")))
      .drop("gv_a", "gv_b")
      .filter(col("ni") * lit(1000000L) >=
        lit(tPpm) * (col("na") + col("nb") - col("ni")))
      .select(col(aCol), col(bCol),
        expr("CAST((ni * 1000000) DIV (na + nb - ni) AS BIGINT)")
          .as("jaccard_ppm"))
  }

  /** Packed containment verify (round 14): [[containVerify]]'s
    * over-broadcast-threshold regime — identical semantics, gv
    * payload instead of the raw gram arrays. Both q181 sides ride the
    * SAME persisted index, so both already carry the dictionary
    * packing; the r12 measurement chain (224 s unpacked vs 32 s
    * packed at 30× forced-over-threshold, no ArrayType on any
    * exchange) transfers verbatim — the only delta is the asymmetric
    * threshold against the contained side's na. Same join shape
    * discipline: shuffle_hash pinned, build sides explicitly
    * repartitioned against AQE coalescing. */
  private def containVerifyPacked(cand: DataFrame, gramSets: DataFrame,
      tPpm: Long): DataFrame = {
    val nP = cand.sparkSession.sessionState.conf.numShufflePartitions
    cand
      .join(gramSets.select(col("doc_id").as("doc_a"),
          col("gv").as("gv_a"), col("n").as("na"))
        .repartition(nP, col("doc_a")).hint("shuffle_hash"),
        Seq("doc_a"))
      .join(gramSets.select(col("doc_id").as("doc_b"),
          col("gv").as("gv_b"))
        .repartition(nP, col("doc_b")).hint("shuffle_hash"),
        Seq("doc_b"))
      .withColumn("ni", call_function("sorted_varint_intersect_count",
        col("gv_a"), col("gv_b")))
      .drop("gv_a", "gv_b")
      .filter(col("ni") * lit(1000000L) >= lit(tPpm) * col("na"))
      .select(col("doc_a"), col("doc_b"),
        expr("CAST((ni * 1000000) DIV na AS BIGINT)")
          .as("containment_ppm"))
  }

  /** Dedup-savings accounting (q156): the token-budget view of exact
    * dedup — per source, how many documents and tokens survive when
    * only the corpus-wide FIRST copy (min doc_id over identical text)
    * of each document is kept. Duplicates die in the source holding
    * the HIGHER id, so a source that mostly re-hosts content shows a
    * high savings_ppm even though the content survives elsewhere —
    * the cross-source twin of the q114 contamination matrix, answering
    * the planning question "how many tokens does each source really
    * contribute".
    *
    * The keep decision groups by sha2(text) in the engine (32-byte
    * shuffle keys, the q33/q75 discipline) while the oracle groups by
    * text itself — digests never cross engines (q63 rule); equality
    * is all that is used, so the verdicts are identical.
    *
    * Scale shape: one digest-keyed window (the same single shuffle as
    * exactDedup) + one map-side-combined source aggregate. */
  def dedupSavings(spark: SparkSession, dir: String): DataFrame =
    dedupSavingsDocs(Tables.documents(spark, dir))

  /** Frame-based core of [[dedupSavings]]. */
  def dedupSavingsDocs(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(sha2(col("text"), 256))
    docs
      .select(col("source"), col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tok"),
        (col("doc_id") === min(col("doc_id")).over(w)).as("keep"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        sum(col("n_tok")).as("sum_tokens"),
        sum(when(col("keep"), col("n_tok")).otherwise(0L))
          .as("kept_tokens"),
        expr("CAST((sum(n_tok) - sum(CASE WHEN keep THEN n_tok ELSE 0 END))" +
          " * 1000000 div sum(n_tok) AS BIGINT)").as("savings_ppm"))
      .orderBy(col("source"), col("n_docs"), col("n_kept"),
        col("sum_tokens"), col("kept_tokens"), col("savings_ppm"))
  }

  /** DuckDB oracle for [[dedupSavings]]: text-equality grouping. */
  val dedupSavingsOracleSql: String =
    """WITH k AS (
      |  SELECT source, doc_id,
      |    LEN(STRING_SPLIT(text, ' ')) AS n_tok,
      |    doc_id = MIN(doc_id) OVER (PARTITION BY text) AS keep
      |  FROM documents)
      |SELECT source, COUNT(*) AS n_docs,
      |  CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
      |  CAST(SUM(n_tok) AS BIGINT) AS sum_tokens,
      |  CAST(SUM(CASE WHEN keep THEN n_tok ELSE 0 END) AS BIGINT)
      |    AS kept_tokens,
      |  CAST((SUM(n_tok) - SUM(CASE WHEN keep THEN n_tok ELSE 0 END))
      |    * 1000000 // SUM(n_tok) AS BIGINT) AS savings_ppm
      |FROM k GROUP BY source
      |ORDER BY source, n_docs, n_kept, sum_tokens, kept_tokens,
      |  savings_ppm""".stripMargin

  /** Document boundary-stitch detection (q237): pairs (a, b) where
    * b BEGINS with the last L characters of a (8 ≤ L ≤ 64) — the
    * crawl-pagination artifact (the fetcher repeats the previous
    * page's tail as context) that whole-doc dedup misses and
    * corpus-wide window dedup (q119/q120) only catches at stride-1
    * cost on both sides. Candidates: a's packed SUFFIX 8-gram (the
    * q126 injective long) joined against every 8-gram position in
    * b's first 64 chars; a match at position p claims overlap
    * L = p+7, verified EXACTLY by comparing b's first L chars to a's
    * last L (both carried as 64-char probes — the verify never
    * touches full texts). Periodic boundaries can claim several L —
    * the maximal verified overlap is reported. Suffix keys more
    * frequent than `maxKeyFreq` are suppressed on both sides
    * (generic endings explode quadratically — the LSH MaxBucket
    * rule, replayed by the oracle so the cap is hash-checked).
    *
    * Scale shape: one ≤57-key head explode + one suffix key per doc,
    * an equi-join on longs with per-key frequency caps, 64-char
    * probes as the only payload. */
  def boundaryStitches(spark: SparkSession, dir: String,
      maxKeyFreq: Long = 64L): DataFrame =
    boundaryStitchesDocs(Tables.documents(spark, dir), maxKeyFreq)

  /** Frame-based core of [[boundaryStitches]] (needs doc_id,
    * text). */
  def boundaryStitchesDocs(docs: DataFrame,
      maxKeyFreq: Long = 64L): DataFrame = {
    val f = register(boundaryFeatures(docs)
      .persist(StorageLevel.MEMORY_AND_DISK))
    boundaryStitchesFromFeatures(f, f, maxKeyFreq)
      .orderBy(col("doc_a"), col("doc_b"), col("overlap_len"))
  }

  /** The per-doc state the stitch join needs: first/last 64 chars +
    * length — 128 chars per doc, never the payload (the feature-
    * before-bytes discipline; this is also the streaming twin's
    * corpus state). */
  def boundaryFeatures(docs: DataFrame): DataFrame =
    docs.filter(length(col("text")) >= 8)
      .select(col("doc_id"),
        expr("substring(text, 1, 64)").as("head64"),
        expr("substring(text, greatest(length(text) - 63, 1), 64)")
          .as("tail64"),
        length(col("text")).cast("long").as("len"))

  /** Stitch join over two feature frames ([[boundaryFeatures]]):
    * pairs (a ∈ featA, b ∈ featB) where b begins with a's last L
    * chars, 8 ≤ L ≤ 64. No internal persist (streaming callers manage
    * their own micro-batch lifecycles — the round-10 leak rule); the
    * batch form persists the shared feature frame at its call site. */
  def boundaryStitchesFromFeatures(featA: DataFrame, featB: DataFrame,
      maxKeyFreq: Long = 64L): DataFrame = {
    // when the cap base IS the joined side, a window computes the
    // frequency in the same pass — measured 0.8 s cheaper than the
    // aggregate+semi-join form at sf0.1; the Capped variant exists
    // for the incremental op whose cap base is a SUPERSET
    import org.apache.spark.sql.expressions.Window
    def windowCapped(side: DataFrame): DataFrame =
      side.withColumn("kf",
          count(lit(1)).over(Window.partitionBy(col("k8"))))
        .filter(col("kf") <= maxKeyFreq).drop("kf", "k8")
    boundaryStitchTail(
      windowCapped(boundaryASide(featA)),
      windowCapped(boundaryBSide(featB)))
  }

  private def boundaryPack(c: Column): Column =
    (1 to 8).foldLeft(lit(0L)) {
      (acc, i) => shiftleft(acc, 8) + ascii(substring(c, i, 1)).cast("long")
    }

  /** A-side rows (suffix key per doc), uncapped. */
  private def boundaryASide(feat: DataFrame): DataFrame =
    feat.select(col("doc_id").as("doc_a"),
      expr("substring(tail64, length(tail64) - 7, 8)").as("k8"),
      boundaryPack(expr("substring(tail64, length(tail64) - 7, 8)"))
        .as("k"),
      col("tail64"),
      col("len").as("len_a"))

  /** B-side rows (one per head-gram position), uncapped. */
  private def boundaryBSide(feat: DataFrame): DataFrame =
    feat.select(col("doc_id").as("doc_b"),
        col("head64"), col("len").as("len_b"),
        explode(expr("sequence(1, least(greatest(len - 7, 1), 57))"))
          .as("p"))
      .select(col("doc_b"), col("head64"), col("len_b"),
        col("p").cast("long").as("p"),
        expr("substring(head64, cast(p as int), 8)").as("k8"),
        boundaryPack(expr("substring(head64, cast(p as int), 8)"))
          .as("k"))

  /** Stitch join with the frequency caps COUNTED over `capA`/`capB`
    * (the cap base can be a superset of the joined side — the
    * incremental form caps over the full seen corpus while joining
    * only batch rows, so its verdicts equal the full batch run's).
    * The cap keys on the RAW 8-char substring (the oracle's key);
    * the packed long is only the join key — ascii() returns full
    * code points, so the 8-bit packing is injective only over
    * Latin-1, and capping on the packed value would merge distinct
    * non-Latin-1 keys and flip the suppression filter vs the oracle.
    * Packed-key COLLISIONS in the join are harmless: the exact
    * 64-char probe comparison removes false candidates. */
  private def boundaryStitchesCapped(featA: DataFrame, featB: DataFrame,
      maxKeyFreq: Long, capA: DataFrame, capB: DataFrame): DataFrame = {
    def capped(side: DataFrame, capBase: DataFrame): DataFrame =
      side.join(
        capBase.groupBy(col("k8")).agg(count(lit(1)).as("kf"))
          .filter(col("kf") <= maxKeyFreq).select(col("k8")),
        Seq("k8"), "left_semi").drop("k8")
    boundaryStitchTail(
      capped(boundaryASide(featA), boundaryASide(capA)),
      capped(boundaryBSide(featB), boundaryBSide(capB)))
  }

  /** The shared packed-key join + exact 64-char verify + per-pair
    * maximal overlap. */
  private def boundaryStitchTail(aTail: DataFrame,
      bHead: DataFrame): DataFrame =
    aTail.join(bHead, Seq("k"))
      .filter(col("doc_a") =!= col("doc_b"))
      .withColumn("ln", col("p") + 7L)
      .filter(col("ln") <= col("len_a") && col("ln") <= col("len_b") &&
        expr("substring(head64, 1, cast(ln as int)) = " +
          "substring(tail64," +
          " cast(length(tail64) - ln + 1 as int), cast(ln as int))"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(max(col("ln")).as("overlap_len"))

  /** Incremental boundary-stitch (q254): the stitch pairs INVOLVING
    * the newest-10%-of-ids ingest batch (the q191 split convention,
    * cutoff re-derived by the oracle), under the frequency caps of
    * the FULL seen corpus — so the result is exactly the full q237
    * run filtered to pairs touching the batch (the reconciliation
    * semantics the streaming twin's state read provides), while the
    * candidate join fans out only on batch-side rows: direction 1
    * joins every seen tail against BATCH heads, direction 2 batch
    * tails against prior heads. Feature frames only (head64/tail64/
    * len per doc); the cap bases are the union side. */
  def boundaryStitchesIncrementalQuery(spark: SparkSession,
      dir: String, maxKeyFreq: Long = 64L): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val cutoff =
      (docs.agg(max(col("doc_id"))).head().getLong(0) + 1L) * 9L / 10L
    boundaryStitchesIncrementalOn(docs, col("doc_id") >= cutoff,
      maxKeyFreq)
      .repartition(1)
      .sortWithinPartitions(col("doc_a"), col("doc_b"),
        col("overlap_len"))
  }

  /** Frame-based core of [[boundaryStitchesIncrementalQuery]]:
    * `isBatch` marks the ingest batch inside `docs` (the full seen
    * corpus). Registers a persist of the union feature frame — drain
    * via [[unpersistCaches]]. */
  def boundaryStitchesIncrementalOn(docs: DataFrame, isBatch: Column,
      maxKeyFreq: Long = 64L): DataFrame = {
    val union = register(boundaryFeatures(docs)
      .persist(StorageLevel.MEMORY_AND_DISK))
    val corpusF = union.filter(!isBatch)
    val batchF = union.filter(isBatch)
    boundaryStitchesCapped(union, batchF, maxKeyFreq, union, union)
      .unionByName(
        boundaryStitchesCapped(batchF, corpusF, maxKeyFreq, union, union))
  }

  /** DuckDB oracle for [[boundaryStitchesIncrementalQuery]] — the
    * full q237 brute force, filtered to pairs touching the derived
    * ingest batch. */
  def boundaryStitchesIncrementalOracleSql(
      maxKeyFreq: Long = 64L): String = {
    val full = boundaryStitchesOracleSql(maxKeyFreq)
    // splice the cutoff CTE in and filter the final select
    full
      .replace("WITH d AS (",
        """WITH cut AS (
          |  SELECT (MAX(doc_id) + 1) * 9 // 10 AS c FROM documents),
          |d AS (""".stripMargin)
      .replace("FROM v GROUP BY doc_a, doc_b",
        """FROM v CROSS JOIN cut
          |WHERE doc_a >= cut.c OR doc_b >= cut.c
          |GROUP BY doc_a, doc_b""".stripMargin)
  }

  /** DuckDB oracle for [[boundaryStitches]] — string keys
    * throughout; the Spark side also caps frequency on the raw
    * 8-char substring (packed longs are join keys only), so the
    * suppression filter agrees even off Latin-1. Same position
    * window, caps and exact verify. */
  def boundaryStitchesOracleSql(maxKeyFreq: Long = 64L): String =
    s"""WITH d AS (
       |  SELECT doc_id, text FROM documents WHERE LENGTH(text) >= 8),
       |a AS (
       |  SELECT doc_id AS doc_a,
       |    SUBSTR(text, LENGTH(text) - 7, 8) AS k,
       |    SUBSTR(text, GREATEST(LENGTH(text) - 63, 1), 64) AS tail64,
       |    CAST(LENGTH(text) AS BIGINT) AS len_a
       |  FROM d
       |  QUALIFY COUNT(*) OVER (PARTITION BY
       |    SUBSTR(text, LENGTH(text) - 7, 8)) <= $maxKeyFreq),
       |b0 AS (
       |  SELECT doc_id AS doc_b, SUBSTR(text, 1, 64) AS head64,
       |    CAST(LENGTH(text) AS BIGINT) AS len_b,
       |    CAST(UNNEST(range(1,
       |      LEAST(GREATEST(LENGTH(text) - 7, 1), 57) + 1)) AS BIGINT)
       |      AS p
       |  FROM d),
       |b AS (
       |  SELECT doc_b, head64, len_b, p,
       |    SUBSTR(head64, CAST(p AS INTEGER), 8) AS k
       |  FROM b0
       |  QUALIFY COUNT(*) OVER (PARTITION BY k) <= $maxKeyFreq),
       |v AS (
       |  SELECT doc_a, doc_b, p + 7 AS ln
       |  FROM a JOIN b USING (k)
       |  WHERE doc_a != doc_b AND p + 7 <= len_a AND p + 7 <= len_b
       |    AND SUBSTR(head64, 1, CAST(p + 7 AS INTEGER))
       |      = SUBSTR(tail64,
       |          CAST(LENGTH(tail64) - (p + 7) + 1 AS INTEGER),
       |          CAST(p + 7 AS INTEGER)))
       |SELECT doc_a, doc_b, CAST(MAX(ln) AS BIGINT) AS overlap_len
       |FROM v GROUP BY doc_a, doc_b
       |ORDER BY doc_a, doc_b, overlap_len""".stripMargin
}
