package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-11 operators: the BPE encode (q241/q242), the persisted
  * set-similarity corpus index behind q126/q181/q191, and the
  * boundary-stitch raw-key frequency cap (ADVICE r10). */
class Round11OpsSpec extends SparkSpec {

  private def docsDf(rows: Seq[(Long, String, String)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "source", "text")
  }

  // ------------------------------------------------------------- BPE

  // Planted corpus, merge table computed by hand:
  //   d1 = "abab abab cd", d2 = "abab cdcd bab"
  // vocab freq: abab:3, cd:1, cdcd:1, bab:1
  // weighted pairs: (a,b) = 2*3 + 1 = 7; (b,a) = 1*3 + 1 = 4;
  //                 (c,d) = 1 + 2 = 3;  (d,c) = 1
  // ranks: 1 (a,b), 2 (b,a), 3 (c,d), 4 (d,c)
  private val bpeDocs = Seq(
    (1L, "web", "abab abab cd"),
    (2L, "web", "abab cdcd bab"))

  test("bpeMerges ranks pairs by weighted count with the (a,b) tie order") {
    val m = graft.ops.TextAnalysis.bpeMerges(docsDf(bpeDocs), 4)
    assert(m === Seq(("a", "b"), ("b", "a"), ("c", "d"), ("d", "c")))
  }

  test("bpeEncodeSqlExpr applies merges priority-ordered, leftmost-non-overlapping") {
    val s = spark
    import s.implicits._
    val merges = Seq(("a", "b"), ("b", "a"), ("c", "d"), ("d", "c"))
    val enc = Seq("abab", "cd", "cdcd", "bab").toDF("w")
      .withColumn("enc",
        expr(graft.ops.TextAnalysis.bpeEncodeSqlExpr("w", merges)))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val SEP = "\u001F"
    assert(enc("abab") === s"ab${SEP}ab")
    assert(enc("cd") === "cd")
    assert(enc("cdcd") === s"cd${SEP}cd")
    // priority: rule 1 (a,b) fires first inside "bab", so the correct
    // BPE result is b|ab — the lower-priority (b,a) never applies
    assert(enc("bab") === s"b${SEP}ab")
  }

  test("bpeEncodeSqlExpr merges greedily left-to-right without overlap") {
    val s = spark
    import s.implicits._
    val enc = Seq("aaa", "aaaa").toDF("w")
      .withColumn("enc",
        expr(graft.ops.TextAnalysis.bpeEncodeSqlExpr("w", Seq(("a", "a")))))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val SEP = "\u001F"
    assert(enc("aaa") === s"aa${SEP}a")
    assert(enc("aaaa") === s"aa${SEP}aa")
  }

  test("bpeEncodeStatsDocs matches the hand-computed doc stats") {
    // d1: abab(2 tok) + abab(2) + cd(1) -> words 3, chars 10, tok 5
    // d2: abab(2) + cdcd(2) + bab(2)    -> words 3, chars 11, tok 6
    val out = graft.ops.TextAnalysis.bpeEncodeStatsDocs(docsDf(bpeDocs), 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(out === Array(
      (1L, 3L, 10L, 5L, 1666666L, 500000L),
      (2L, 3L, 11L, 6L, 2000000L, 454545L)))
  }

  test("bpeFertilityDocs aggregates the same stats at source grain") {
    val out = graft.ops.TextAnalysis.bpeFertilityDocs(docsDf(bpeDocs), 4)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    // web: 6 words, 21 chars, 11 tokens ->
    //   tok/word = 11e6 div 6 = 1833333; chars/tok = 21e6 div 11 = 1909090
    assert(out === Array(("web", 6L, 21L, 11L, 1833333L, 1909090L)))
  }

  test("bpe encode with fewer distinct pairs than nMerges degrades to identity") {
    // corpus "aaa aaa": only merge (a,a); asking for 4 merges must
    // apply just the one that exists (the oracle's LEFT JOIN ON TRUE
    // mirror of the same degradation)
    val out = graft.ops.TextAnalysis.bpeEncodeStatsDocs(
        docsDf(Seq((1L, "web", "aaa aaa"))), 4)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out === Array((2L, 6L, 4L))) // 2 words, 6 chars, 2x[aa|a]
  }

  test("bpePackingWasteDocs matches hand-computed chunk arithmetic") {
    // chunk = 2: d1 (5 tok, 3 words) -> 3 bpe / 2 ws chunks;
    //            d2 (6 tok, 3 words) -> 3 bpe / 2 ws chunks
    // web: pad_bpe = 12-11 = 1 -> 83333 ppm; pad_ws = 8-6 -> 250000
    val out = graft.ops.TextAnalysis
      .bpePackingWasteDocs(docsDf(bpeDocs), nMerges = 4, chunk = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(out === Array(("web", 2L, 11L, 6L, 83333L, 250000L)))
  }

  // ----------------------------------------- persisted set-sim index

  test("index-riding q126/q181/q191 are bit-identical to the from-scratch forms") {
    val docs = Tables.documents(spark, sf)
    def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.mkString("|")).toSeq.sorted
    // q126: fresh setSimJoin vs persisted-index setSimNearDups
    val freshJ = rows(graft.ops.Dedup.setSimJoin(docs, "doc_id", 700000L))
    val idxJ = rows(graft.ops.Dedup.setSimNearDups(spark, sf))
    assert(idxJ === freshJ)
    // q181: fresh containmentJoin vs index path
    val freshC = rows(
      graft.ops.Dedup.containmentJoin(docs, "doc_id", 900000L))
    val idxC = rows(graft.ops.Dedup.containmentNearDups(spark, sf))
    assert(idxC === freshC)
    // q191: fresh containmentIncremental vs corpus-index path (the
    // query's own data-derived 90% cutoff: 500 docs -> 450)
    val cutoff =
      (docs.agg(max(col("doc_id"))).head().getLong(0) + 1L) * 9L / 10L
    val freshI = rows(graft.ops.Dedup.containmentIncremental(
      docs.filter(col("doc_id") < cutoff), "doc_id",
      docs.filter(col("doc_id") >= cutoff), "doc_id", 900000L))
    val idxI = rows(graft.ops.Dedup.containmentIncrementalQuery(spark, sf))
    assert(idxI === freshI)
    graft.ops.Dedup.unpersistCaches()
  }

  test("persistedSetSimIndex reuses the on-disk artifact for a matching fingerprint") {
    val idx1 = graft.ops.Dedup.persistedSetSimIndex(spark, sf, "spec_reuse",
      (s, d) => Tables.documents(s, d).limit(50))
    // second call must read, not rebuild: the ranked table's files are
    // the same on-disk parquet (same input fingerprint, same tag)
    val idx2 = graft.ops.Dedup.persistedSetSimIndex(spark, sf, "spec_reuse",
      (s, d) => Tables.documents(s, d).limit(50))
    assert(idx1.nDocs === idx2.nDocs && idx1.gramBytes === idx2.gramBytes)
    assert(idx1.ranked.inputFiles.sorted === idx2.ranked.inputFiles.sorted)
    assert(idx1.nDocs === 50L)
  }

  test("persisted tokenizer path is bit-identical to the fresh encode") {
    val docs = Tables.documents(spark, sf)
    def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.mkString("|")).toSeq
    val T = graft.ops.TextAnalysis
    assert(rows(T.bpeEncodeStats(spark, sf)) ===
      rows(T.bpeEncodeStatsDocs(docs)))
    assert(rows(T.bpeFertility(spark, sf)) ===
      rows(T.bpeFertilityDocs(docs)))
    assert(rows(T.bpePackingWaste(spark, sf)) ===
      rows(T.bpePackingWasteDocs(docs)))
    // second load reads the same on-disk artifact (per-JVM cache +
    // fingerprint digest)
    val t1 = T.persistedBpeTokenizer(spark, sf)
    val t2 = T.persistedBpeTokenizer(spark, sf)
    assert(t1.merges === t2.merges && t1.merges.size === 12)
    assert(t1.vocab.inputFiles.sorted === t2.vocab.inputFiles.sorted)
  }

  // ------------------------------------------------- autoPlanes LSH

  test("autoPlanes holds expected bucket occupancy constant (capped)") {
    val S = graft.ops.Similarity
    assert(S.autoPlanes(6000) === 8)    // 6000 >> 8 = 23 <= 24 already
    assert(S.autoPlanes(60000) === 12)  // 60000 >> 12 = 14
    assert(S.autoPlanes(180000) === 13) // the 30x rehearsal point
    assert(S.autoPlanes(1L << 40) === 20) // cap
    // occupancy bound below the cap; monotone in N
    for (n <- Seq(1000L, 50000L, 400000L, 3000000L)) {
      val p = S.autoPlanes(n)
      assert(p >= 8 && p <= 20)
      if (p < 20) assert((n >> p) <= 24L)
      assert(S.autoPlanes(n * 2) >= p)
    }
  }

  test("near-identical duplicates survive the auto-scaled plane count") {
    val s = spark
    import s.implicits._
    val r = new scala.util.Random(42)
    def vec(): Seq[Float] = Seq.fill(64)(r.nextFloat() * 2f - 1f)
    val base = (0 until 200).map(i => (i.toLong, vec()))
    val d1 = vec()
    // θ ≈ 0 twin: one coordinate nudged — cosine ≈ 0.9999
    val d2 = d1.updated(0, d1.head + 0.01f)
    val emb = (base :+ (9001L, d1) :+ (9002L, d1) :+ (9003L, d1) :+
        (9004L, d2))
      .toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    // 16 planes — twice the fixed default, the density-control regime
    val pairs = graft.ops.Similarity.lshEmbeddingNearDups(emb, 0.9, 16)
      .select(col("vec_a"), col("vec_b")).collect()
      .map(row => (row.getLong(0), row.getLong(1))).toSet
    // exact copies agree on EVERY plane; the θ≈0 twin flips a plane
    // only if the plane nearly contains the vector — all planted
    // pairs must surface at 16 planes
    assert(Set((9001L, 9002L), (9001L, 9003L), (9002L, 9003L),
      (9001L, 9004L), (9002L, 9004L), (9003L, 9004L)).subsetOf(pairs),
      s"planted near-dups lost at 16 planes: $pairs")
  }

  // ------------------------------------- boundary-stitch raw-key cap

  test("boundaryStitches caps key frequency on the raw substring, not the packed long") {
    // ascii() returns full code points, so the 8-bit packing collides
    // above Latin-1: pack("ba") == pack("a" + chr(353)) == pack("`" +
    // chr(609)) (97*256+353 = 96*256+609 = 98*256+97 = 25185). Three
    // docs whose tails pack-collide but are raw-distinct must NOT trip
    // maxKeyFreq = 2, and the genuine stitch (A2 -> B) must survive;
    // the packed-long collision candidates die in the exact verify.
    val sh = "š" // codepoint 353
    val gh = "ɡ" // codepoint 609
    val docs = docsDf(Seq(
      (1L, "web", "qqqqqqqqxxxxxxa" + sh),
      (2L, "web", "qqqqqqqqxxxxxxba"),
      (3L, "web", "qqqqqqqqxxxxxx`" + gh),
      (4L, "web", "xxxxxxbazzzz")))
    val out = graft.ops.Dedup.boundaryStitchesDocs(docs, maxKeyFreq = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out === Array((2L, 4L, 8L)))
    graft.ops.Dedup.unpersistCaches()
  }
}
