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
}
