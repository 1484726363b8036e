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
