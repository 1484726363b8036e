package graft

import graft.ops.{Dedup, Similarity, TextAnalysis}
import org.apache.spark.sql.functions._

/** Round-10 planted fixtures for the ops the round-9 snapshot parked
  * without specs (q201 keep-best dedup, q202 collocations) — each pins
  * the decision the oracle hash-compare only checks in aggregate: the
  * quality-argmax vs min-id keep (and its ppm tie-break) for q201, the
  * hand-computed lift ranking and the minCount rare-pair suppression
  * for q202. */
class Round10OpsSpec extends SparkSpec {

  test("q201 keep-best: quality-keep differs from min-id keep; q_ppm tie broken by min id") {
    import spark.implicits._
    // Cluster {1,2,3} (pairs 1-2, 2-3): docs 1 and 3 TIE at q_ppm
    // 620000 — doc 1: "the of and to a" = 5 tokens all stopwords, no
    // punct -> 0.4·0.05 + 0.3·1 + 0.3·min(5/5·5, 1) = 0.62; doc 3
    // swaps "a" for "aa" (4 stopwords, stop term still capped at 1)
    // -> same 0.62. Tie -> min id keeps 1. Doc 2 "xx yy" scores
    // 0.308. tot_tok = 5+2+5 = 12, dropped = 12-5 = 7.
    // Cluster {4,5}: doc 4 "!! ??" = 2 tokens, 4 punct chars of 5 ->
    // 0.4·0.02 + 0.3·(1-4/5) + 0 = 0.068 (68000 ppm); doc 5
    // "the the the the" -> 0.4·0.04 + 0.3 + 0.3 = 0.616 (616000).
    // Quality-keep picks 5 — the MIN-ID keep would pick 4, so this
    // cluster proves the argmax is on (q_ppm, -id), not id.
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L))
      .toDF("vec_a", "vec_b")
    val docs = Seq(
      (1L, "the of and to a"),
      (2L, "xx yy"),
      (3L, "the of and to aa"),
      (4L, "!! ??"),
      (5L, "the the the the"))
      .toDF("doc_id", "text")
    try {
      val out = Similarity.keepBestDedupOn(pairs, docs).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4)))
      assert(out.toSeq == Seq(
        (1L, 3L, 1L, 620000L, 7L),
        (4L, 2L, 5L, 616000L, 2L)), s"keep-best: ${out.toSeq}")
    } finally Dedup.unpersistCaches()
  }

  test("q203 phash: planted planes — 1-bit neighbour, cycled-resize twin, no cross-family pair") {
    import spark.implicits._
    val mm = graft.multimodal.Multimodal
    // doc 3: 72 strictly ascending codepoints -> every within-row
    // comparison true -> all 64 bits set, bands (65535,65535,65535,
    // 65535). doc 6: same except the LAST char drops below its left
    // neighbour -> ONLY bit (row 7, col 7) = bit 63 flips -> band 3
    // loses bit 15 (32767); hamming(3,6) = 1 and they share bands
    // 0-2, so banding finds them. doc 9: constant char -> all bits 0;
    // hamming 64/63 to the others and NO shared band -> no pair.
    // docs 12/24: "ba" vs "baba" — different strings, IDENTICAL
    // cycled pixel plane (px[i] = char i mod n; both give 'b' at even
    // i) -> hamming 0: pins the resize-cycling rule.
    val asc = (0 until 72).map(i => ('0' + i).toChar).mkString
    val nearAsc = asc.take(71) + "0"
    val docs = Seq(
      (3L, asc), (6L, nearAsc), (9L, "a" * 72),
      (12L, "ba"), (24L, "baba"))
      .toDF("doc_id", "text")
    try {
      val bands = mm.phashBandsCols(docs).collect()
        .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
      assert(bands(3L) == Seq(65535, 65535, 65535, 65535), s"asc: ${bands(3L)}")
      assert(bands(6L) == Seq(65535, 65535, 65535, 32767), s"near: ${bands(6L)}")
      assert(bands(9L) == Seq(0, 0, 0, 0), s"const: ${bands(9L)}")
      assert(bands(12L) == bands(24L),
        s"cycled twins must share the plane: ${bands(12L)} vs ${bands(24L)}")
      val pairs = mm.phashDedupBands(mm.phashBandsCols(docs)).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(pairs.toSeq == Seq((3L, 6L, 1L), (12L, 24L, 0L)),
        s"pairs: ${pairs.toSeq}")
    } finally graft.ops.Dedup.unpersistCaches()
  }

  test("q203 phash: payload mapPartitions path == column-expression path (corpus + planted)") {
    import spark.implicits._
    val mm = graft.multimodal.Multimodal
    val corpus = Tables.documents(spark, sf)
      .filter(col("doc_id") % 3 === 0)
      .select(col("doc_id"), col("text"))
    val planted = Seq((1L, "ba"), (2L, "zz9 a"), (3L, "a"))
      .toDF("doc_id", "text")
    for (docs <- Seq(corpus, planted)) {
      val media = docs.select(col("doc_id"),
        encode(col("text"), "UTF-8").as("payload"))
      val jvm = mm.phashFeatures(media).collect()
        .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
      val cols = mm.phashBandsCols(docs).collect()
        .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
      assert(jvm == cols,
        s"paths diverge on ${jvm.keySet.filter(k => jvm(k) != cols.get(k).orNull).take(3)}")
    }
  }

  test("q204 phash incremental: corpus-wins, lower-id batch-mate, min-id + sentinel semantics") {
    import spark.implicits._
    val mm = graft.multimodal.Multimodal
    // corpus: doc 3 = ascending plane (bands all-65535), doc 9 =
    // constant (all-0). batch: 33 = 1-bit neighbour of asc (dup of
    // CORPUS 3, no lower batch mate); 63 = "ba" plane (matches
    // nothing -> kept); 93 = "baba" (identical cycled plane to 63 ->
    // dup of BATCH 63, not of corpus); 123 = asc exactly (dup of
    // corpus 3 AND of batch 33 at hamming 1 -> BOTH sides reported,
    // min ids).
    val asc = (0 until 72).map(i => ('0' + i).toChar).mkString
    val nearAsc = asc.take(71) + "0"
    val corpus = Seq((3L, asc), (9L, "a" * 72)).toDF("doc_id", "text")
    val batch = Seq((33L, nearAsc), (63L, "ba"), (93L, "baba"),
      (123L, asc)).toDF("doc_id", "text")
    try {
      val out = mm.phashIncrementalBands(
        mm.phashBandsCols(corpus), mm.phashBandsCols(batch)).collect()
        .map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2),
          r.getLong(3)))
      assert(out.toSeq == Seq(
        (33L, false, 3L, -1L),
        (63L, true, -1L, -1L),
        (93L, false, -1L, 63L),
        (123L, false, 3L, 33L)), s"verdicts: ${out.toSeq}")
    } finally graft.ops.Dedup.unpersistCaches()
  }

  test("q205 kappa: chance-level 0, degenerate-perfect 1e6, negative truncation") {
    import spark.implicits._
    // s1: labels en/en/de/de, preds en/de/de/en -> n=4, agree=2,
    // marginals na(en)=na(de)=nb(en)=nb(de)=2, pe_n2 = 8, n2 = 16 ->
    // kappa = (8-8)e6/(16-8) = 0 — agreement exactly at chance.
    // s2: two en docs both predicted en -> n2 = pe_n2 = 4, the 0/0
    // case pinned to 1000000.
    // s3: en->de, de->en -> agree 0, pe_n2 = 2 ->
    // kappa = (0-2)e6/(4-2) = -1000000 (negative path, truncating
    // div on both engines).
    // texts: "the" -> g_en=2 -> en; "chei" -> g_de=2 -> de.
    val docs = Seq(
      (1L, "s1", "en", "the"), (2L, "s1", "en", "chei"),
      (3L, "s1", "de", "chei"), (4L, "s1", "de", "the"),
      (5L, "s2", "en", "the"), (6L, "s2", "en", "the"),
      (7L, "s3", "en", "chei"), (8L, "s3", "de", "the"))
      .toDF("doc_id", "source", "lang", "text")
    try {
      val out = graft.ops.TextAnalysis.kappaAgreementDocs(docs).collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toMap
      assert(out("s1") == ((4L, 2L, 8L, 0L)), s"s1: ${out("s1")}")
      assert(out("s2") == ((2L, 2L, 4L, 1000000L)), s"s2: ${out("s2")}")
      assert(out("s3") == ((2L, 0L, 2L, -1000000L)), s"s3: ${out("s3")}")
    } finally graft.ops.Dedup.unpersistCaches()
  }

  test("q206 jackknife: hand-computed leave-one-out means and deviations") {
    import spark.implicits._
    // buckets 0:{10,20}, 1:{30}: N=3, S=60, full mean = 20e6 ppm.
    // loo(0) = (60-30)e6/(3-2) = 30e6, dev +10e6;
    // loo(1) = (60-30)e6/(3-1) = 15e6, dev -5e6.
    val bx = Seq((0L, 10L), (0L, 20L), (1L, 30L)).toDF("bucket", "x")
    try {
      val out = graft.ops.Profiling.jackknifeOf(bx).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4)))
      assert(out.toSeq == Seq(
        (0L, 2L, 30L, 30000000L, 10000000L),
        (1L, 1L, 30L, 15000000L, -5000000L)), s"jk: ${out.toSeq}")
      // degenerate: everything in one bucket -> sentinel, dev 0
      val solo = graft.ops.Profiling.jackknifeOf(
        Seq((7L, 5L)).toDF("bucket", "x")).collect()
        .map(r => (r.getLong(0), r.getLong(3), r.getLong(4)))
      assert(solo.toSeq == Seq((7L, -1L, 0L)), s"solo: ${solo.toSeq}")
    } finally graft.ops.Dedup.unpersistCaches()
  }

  test("q207 BPE pairs: vocab-weighted counts, deterministic tie order, 1-char words skipped") {
    import spark.implicits._
    // corpus "ab ab abc aaa z": vocab ab:2, abc:1, aaa:1 (z is a
    // 1-char word — no pair). pairs: (a,b) = 2(from ab)+1(abc) = 3,
    // (a,a) = 2 (two adjacent positions in aaa), (b,c) = 1.
    val docs = Seq((1L, "ab ab abc"), (2L, "aaa z")).toDF("doc_id", "text")
    val out = graft.ops.TextAnalysis.bpePairStatsDocs(docs).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq == Seq(("a", "b", 3L), ("a", "a", 2L),
      ("b", "c", 1L)), s"pairs: ${out.toSeq}")
  }

  test("q208 waterfill: saturation prefix, proportional floors, bonus order, all-saturated") {
    import spark.implicits._
    val S = graft.ops.Sampling
    // A (default budget Σs div 2 = 55): a(10,10) ratio 1 saturates
    // (10·20 ≤ 10·55); b(100,10) ratio 10 fails (100·10 > 10·45) ->
    // floor 45·10 div 10 = 45, leftover 0. Σ alloc = 55 = T.
    val a = S.waterfillAllocOn(
      Seq(("a", 10L, 10L), ("b", 100L, 10L))
        .toDF("source", "supply", "weight")).collect()
      .map(r => (r.getString(0), r.getLong(3), r.getBoolean(4)))
    assert(a.toSeq == Seq(("a", 10L, true), ("b", 45L, false)), s"A: ${a.toSeq}")
    graft.ops.Dedup.unpersistCaches()
    // B (budget 8): z(1,100) lowest ratio saturates; x(7,3)/y(7,3)
    // tie at the scaled ratio, name order x<y; t_fin=7, floors
    // 7·3 div 6 = 3 each, leftover 1 -> +1 to x (first unsaturated
    // by source). Caps survive (4 < 7). Σ = 8 = T.
    val b = S.waterfillAllocOn(
      Seq(("x", 7L, 3L), ("y", 7L, 3L), ("z", 1L, 100L))
        .toDF("source", "supply", "weight"), Some(8L)).collect()
      .map(r => (r.getString(0), r.getLong(3), r.getBoolean(4)))
    assert(b.toSeq == Seq(("x", 4L, false), ("y", 3L, false),
      ("z", 1L, true)), s"B: ${b.toSeq}")
    graft.ops.Dedup.unpersistCaches()
    // C (budget ≥ Σ supply): everything saturates at its cap; the
    // 970 surplus stays unallocated (nothing left to buy)
    val c = S.waterfillAllocOn(
      Seq(("a", 10L, 2L), ("b", 20L, 2L))
        .toDF("source", "supply", "weight"), Some(1000L)).collect()
      .map(r => (r.getString(0), r.getLong(3), r.getBoolean(4)))
    assert(c.toSeq == Seq(("a", 10L, true), ("b", 20L, true)), s"C: ${c.toSeq}")
    graft.ops.Dedup.unpersistCaches()
  }

  test("q209 Theil-Sen: pairwise-slope median shrugs off the outlier month") {
    import spark.implicits._
    // X: revs (0, 1e7, 2) at months 0,1,2 — slopes 1e7, 1, -9999998;
    // lower nearest-rank (rank 2 of 3) = 1.0. The outlier month drags
    // a least-squares slope to ~±millions; Theil-Sen reports 1.
    // Y: revs 0,1,2,300 at months 0..3 — six slopes
    // (1, 1, 100, 1, 149.5, 298), rank (6+1) div 2 = 3 -> 1.0.
    val monthly = Seq(
      ("X", 0L, 0L), ("X", 1L, 10000000L), ("X", 2L, 2L),
      ("Y", 0L, 0L), ("Y", 1L, 1L), ("Y", 2L, 2L), ("Y", 3L, 300L))
      .toDF("flag", "m", "rev")
    try {
      val out = graft.ops.Profiling.theilSenOf(monthly).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getDouble(3)))
      assert(out.toSeq == Seq(("X", 3L, 3L, 1.0), ("Y", 4L, 6L, 1.0)),
        s"ts: ${out.toSeq}")
    } finally graft.ops.Dedup.unpersistCaches()
  }

  test("q210 forget audit: per-shard before/forgotten/after, whole-shard forget, digest identity") {
    import spark.implicits._
    // shard 0: one keep (h=5) + one forget (h=7); shard 1: keep only
    // (h=11); shard 2: forget only (h=13 — the whole shard vanishes:
    // n_after 0 and digest 13-13 = 0 = COALESCE(after)). Residuals 0
    // and digest_ok everywhere.
    val assigned = Seq(
      (1L, 0L, 5L, false), (2L, 0L, 7L, true),
      (3L, 1L, 11L, false), (4L, 2L, 13L, true))
      .toDF("doc_id", "shard", "h", "forget")
    val out = graft.ops.Layout.forgetAuditOn(assigned).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getBoolean(5)))
    assert(out.toSeq == Seq(
      (0L, 2L, 1L, 1L, 0L, true),
      (1L, 1L, 0L, 1L, 0L, true),
      (2L, 1L, 1L, 0L, 0L, true)), s"audit: ${out.toSeq}")
  }

  test("q211 source centroid affinity: orthogonal/aligned planted sources, scale-invariant means") {
    import spark.implicits._
    // a: two vectors summing to (2,0) — the mean's 1/n cancels, cosine
    // works on raw sums; b: (0,3) orthogonal to a; c: (1,1) at 45°.
    // cos(a,b)=0, cos(a,c)=cos(b,c)=round(1/sqrt(2),6)=0.707107; the
    // magnitude-3 b vector must not move its cosine (scale invariance).
    val emb = Seq(
      ("a", Seq(1.0f, 0.0f)), ("a", Seq(1.0f, 0.0f)),
      ("b", Seq(0.0f, 3.0f)), ("c", Seq(1.0f, 1.0f)))
      .toDF("source", "embedding")
    try {
      val out = graft.ops.Similarity.sourceCentroidAffinityOn(emb)
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2),
          r.getLong(3), r.getDouble(4)))
      assert(out.toSeq == Seq(
        ("a", "b", 2L, 1L, 0.0),
        ("a", "c", 2L, 1L, 0.707107),
        ("b", "c", 1L, 1L, 0.707107)), s"affinity: ${out.toSeq}")
    } finally Dedup.unpersistCaches()
  }

  test("PlanStats measures LocalRelation leaves (broadcast path no longer forced off for tiny test frames)") {
    import spark.implicits._
    // a Seq-backed frame optimizes to a LocalRelation leaf; before the
    // round-10 fix, leafBytes matched only v1 LogicalRelation /
    // InMemoryRelation and returned Long.MaxValue here, permanently
    // forcing the shuffle_hash/bin-walk branch for such inputs
    val tiny = Seq((1L, "a"), (2L, "b")).toDF("id", "s")
    val lb = graft.ops.PlanStats.leafBytes(tiny)
    assert(lb < BigInt(Long.MaxValue) && lb > 0,
      s"LocalRelation leaf must be measurable: $lb")
    assert(graft.ops.PlanStats.estRows(tiny) < BigInt(1000000),
      "tiny frame must estimate small, selecting the broadcast branch")
  }

  test("q202 collocations: hand-computed lift, minCount suppresses the rare-pair explosion") {
    import spark.implicits._
    // Bigrams: "a b a b" -> (a,b)×2, (b,a)×1; two "c d" docs ->
    // (c,d)×2. N = 5 bigram positions. Marginals: n_x(a)=2, n_y(b)=2,
    // n_x(c)=2, n_y(d)=2. lift(a,b) = 2·5·1e6 div (2·2) = 2500000 =
    // lift(c,d); the tie orders (a,b) before (c,d) on (w1, w2).
    // (b,a) has the HIGHEST raw lift (1·5e6 div 1 = 5000000) — the
    // rare-pair explosion — and minCount=2 must suppress it.
    val docs = Seq(
      (1L, "a b a b"), (2L, "c d"), (3L, "c d"), (4L, "z"))
      .toDF("doc_id", "text")
    try {
      val out = TextAnalysis.collocationsDocs(docs, minCount = 2,
        topK = 10).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5)))
      assert(out.toSeq == Seq(
        ("a", "b", 2L, 2L, 2L, 2500000L),
        ("c", "d", 2L, 2L, 2L, 2500000L)), s"collocations: ${out.toSeq}")
    } finally Dedup.unpersistCaches()
  }

  test("q212 shuffle mix: adjacent same-source rate vs multiset expectation, singleton shard") {
    import spark.implicits._
    // shard 0 orders by shuffle_key as A, A, B: same_adj = 1 of 2
    // adjacent pairs -> 500000 ppm; counts A:2 B:1 give same_mass
    // Σ nₛ(nₛ−1) = 2 -> expected 2e6 div 6 = 333333 ppm. shard 1 is
    // a single doc: both ppms are the guarded 0.
    val assigned = Seq(
      (1L, "A", 0L, 10L), (2L, "A", 0L, 20L), (3L, "B", 0L, 30L),
      (4L, "C", 1L, 5L))
      .toDF("doc_id", "source", "shard", "shuffle_key")
    val out = graft.ops.Layout.shuffleMixAuditOn(assigned).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      (0L, 3L, 1L, 500000L, 333333L),
      (1L, 1L, 0L, 0L, 0L)), s"mix: ${out.toSeq}")
  }

  test("q213 k-core: triangle survives k=2 peel, tail and isolated edge dissolve; k=3 empties it") {
    import spark.implicits._
    // Triangle 1-2-3 plus tail 3-4 plus isolated edge 5-6. k=2:
    // round 1 peels 4, 5, 6 (degree 1); the triangle is the 2-core,
    // every member at degree 2. k=3: the triangle's degrees are all
    // 2 < 3, so the whole graph dissolves — empty core, and the
    // fixpoint guard must accept an empty result.
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (5L, 6L))
      .toDF("vec_a", "vec_b")
    val core2 = Similarity.kCoreOn(pairs, k = 2, rounds = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(core2.toSeq == Seq((1L, 2L), (2L, 2L), (3L, 2L)),
      s"2-core: ${core2.toSeq}")
    val core3 = Similarity.kCoreOn(pairs, k = 3, rounds = 3).count()
    assert(core3 == 0L, s"3-core should be empty, got $core3 rows")
  }

  test("q214 calibration: margin 5 correct, tie margin 0 wrong, und bin -1") {
    import spark.implicits._
    // doc 1 hits all five en bigrams and nothing else: margin 5,
    // pred en = label -> the only correct row. doc 2 "th ch" ties
    // en/de at 1 (margin 0), precedence picks en, label de -> wrong.
    // doc 3 has no profile bigram at all -> und, the -1 bin.
    val docs = Seq(
      (1L, "th he in er an", "en"),
      (2L, "th ch", "de"),
      (3L, "zzz", "en"))
      .toDF("doc_id", "text", "lang")
    val out = TextAnalysis.calibrationDocs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(out.toSeq == Seq(
      (-1L, 1L, 0L, 0L),
      (0L, 1L, 0L, 0L),
      (5L, 1L, 1L, 1000000L)), s"calibration: ${out.toSeq}")
  }

  test("q215 weekday seasonality: planted Monday/Sunday split, arithmetic dow") {
    import spark.implicits._
    // 1970-01-04 (day 3, dow (3+4)%7 = 0 = Sunday) one event;
    // 1970-01-05 (day 4, dow 1 = Monday) two events. Shares 1/3 and
    // 2/3; indexes 7/3 and 14/3 in truncated ppm.
    val us = 86400000000L
    val events = Seq(
      (1L, 3L * us), (2L, 4L * us), (3L, 4L * us + 3600000000L))
      .toDF("event_id", "us")
      .select(col("event_id"), lit("click").as("event_type"),
        timestamp_micros(col("us")).as("ts"))
    val out = graft.ops.TimeSeries.weekdaySeasonalityOn(events)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(out.toSeq == Seq(
      ("click", 0L, 1L, 3L, 333333L, 2333333L),
      ("click", 1L, 2L, 3L, 666666L, 4666666L)), s"dow: ${out.toSeq}")
  }

  test("q216 PQ: planted 2-subspace codebooks, Lloyd update, per-code error stats") {
    import spark.implicits._
    // dim 4, 2 subspaces of 2 dims, k=2 (seeds = vectors 0 and 1),
    // 1 Lloyd round. Subspace 0: v0=(0,0), v2=(.1,.3), v4=(.2,.6)
    // land on code 0, whose updated centroid is the exact mean
    // (100000, 300000) µu; v1=v3=(1,1) keep code 1 at (1e6, 1e6).
    // Final errors on code (0,0): 1e11, 0, 1e11 -> max 1e11, mean
    // 2e11/3 truncated = 66666666666. Subspace 1 splits (0,0) vs
    // (4,4) exactly -> all-zero errors.
    val emb = Seq(
      (0L, Seq(0f, 0f, 0f, 0f)), (1L, Seq(1f, 1f, 4f, 4f)),
      (2L, Seq(0.1f, 0.3f, 4f, 4f)), (3L, Seq(1f, 1f, 0f, 0f)),
      (4L, Seq(0.2f, 0.6f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val out = graft.ops.Ivf.pqAuditOn(emb, nSub = 2, k = 2,
      iters = 1, dim = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      (0L, 0L, 3L, 100000000000L, 66666666666L),
      (0L, 1L, 2L, 0L, 0L),
      (1L, 0L, 3L, 0L, 0L),
      (1L, 1L, 2L, 0L, 0L)), s"pq: ${out.toSeq}")
  }

  test("q217 zipf: planted frequency spectrum, doubling-bin decay ratios") {
    import spark.implicits._
    // freqs a:1 b:1 (bin 0), c:2 d:3 (bin 1), e:4 (bin 2). decay =
    // types ratio vs previous bin: bin0 -> 0 (no previous), bin1 ->
    // 2/2 = 1e6, bin2 -> 1/2 = 500000.
    val docs = Seq((1L, "a b c c d d d e e e e"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.zipfProfileDocs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(out.toSeq == Seq(
      (0L, 2L, 2L, 0L),
      (1L, 2L, 5L, 1000000L),
      (2L, 1L, 4L, 500000L)), s"zipf: ${out.toSeq}")
  }

  test("q218 market share: bucketed path equals a plain recomputation; shares bounded") {
    // the q70 discipline: the bucketed layout must change the PLAN,
    // never the answer — compare against a straightforward unbucketed
    // recomputation of the same aggregate at sf0.001
    import graft.ops.Det
    val out = graft.ops.Flagship.marketShare(spark, sf).collect()
    assert(out.nonEmpty, "market share produced no year rows")
    out.foreach { r =>
      val (total, nat, ppm) =
        (r.getDouble(1), r.getDouble(2), r.getLong(3))
      assert(nat >= 0 && nat <= total && ppm >= 0 && ppm <= 1000000,
        s"share invariants violated: $r")
    }
    val li = Tables.lineitem(spark, sf)
    val o = Tables.orders(spark, sf)
    val c = Tables.customer(spark, sf)
    val n = Tables.nation(spark, sf)
    val r = Tables.region(spark, sf)
    val s2 = Tables.supplier(spark, sf)
    val rev = Det.revenueTerm(col("l_extendedprice"), col("l_discount"))
    val plain = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(n.select(col("n_nationkey").as("cnk"),
        col("n_regionkey").as("cnr")), col("c_nationkey") === col("cnk"))
      .join(r.filter(col("r_name") === "ASIA"),
        col("cnr") === col("r_regionkey"))
      .join(s2, col("l_suppkey") === col("s_suppkey"))
      .join(n.select(col("n_nationkey").as("snk"),
        col("n_name").as("sn")), col("s_nationkey") === col("snk"))
      .groupBy(year(col("o_orderdate")).cast("long").as("yr"))
      .agg(sum(rev).cast("double").as("t"),
        coalesce(sum(when(col("sn") === "NATION_2", rev)), lit(0))
          .cast("double").as("nv"))
      .collect().map(x => (x.getLong(0), x.getDouble(1), x.getDouble(2)))
      .sortBy(_._1).toSeq
    val got = out.map(x => (x.getLong(0), x.getDouble(1), x.getDouble(2)))
      .sortBy(_._1).toSeq
    assert(got == plain, s"bucketed vs plain: $got vs $plain")
  }

  test("q219 k-anon ladder: negative-safe buckets, minimal satisfying level chosen") {
    import spark.implicits._
    // k=2. (1,A) holds acctbal 1.00, 1.00, -0.50: the -0.50 row is a
    // singleton class at levels 0-2 (its floor bucket is -1, proving
    // the negative-safe division) and only merges when acctbal drops
    // at level 3. (2,B) 5.00 ×2 is safe everywhere. So risky_rows =
    // 1,1,1,0 and chosen = level 3 only.
    val cust = Seq(
      (1L, "A", 1.00), (1L, "A", 1.00), (1L, "A", -0.50),
      (2L, "B", 5.00), (2L, "B", 5.00))
      .toDF("c_nationkey", "c_mktsegment", "c_acctbal")
    try {
      val out = graft.ops.Audit.kAnonLadderOn(cust, k = 2L).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getBoolean(5)))
      assert(out.toSeq == Seq(
        (0L, 3L, 1L, 1L, 200000L, false),
        (1L, 3L, 1L, 1L, 200000L, false),
        (2L, 3L, 1L, 1L, 200000L, false),
        (3L, 2L, 2L, 0L, 0L, true)), s"ladder: ${out.toSeq}")
    } finally Dedup.unpersistCaches()
  }

  test("q220 ADC recall: planted codebooks, tie-broken ADC top-k, exact-set flags") {
    import spark.implicits._
    // the q216 fixture with v3 as the query. Codebooks after 1 round:
    // sub0 c0=(1e5,3e5) c1=(1e6,1e6); sub1 c0=(0,0) c1=(4e6,4e6).
    // ADC to q=(1e6,1e6,0,0): v0/v4 = 1.3e12 (code pair 0,0 — the
    // quantization error: exact d2 differs, 2e12 vs 8e11), v1 =
    // 3.2e13, v2 = 3.33e13. topK=2 -> the v0/v4 ADC tie breaks by
    // vec_id; exact top-2 = {v4, v0}, so both flags are true.
    val emb = Seq(
      (0L, Seq(0f, 0f, 0f, 0f)), (1L, Seq(1f, 1f, 4f, 4f)),
      (2L, Seq(0.1f, 0.3f, 4f, 4f)), (3L, Seq(1f, 1f, 0f, 0f)),
      (4L, Seq(0.2f, 0.6f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val out = graft.ops.Ivf.pqAdcRecallOn(emb, queryId = 3L, nSub = 2,
      k = 2, iters = 1, topK = 2, dim = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(out.toSeq == Seq(
      (0L, 1300000000000L, true),
      (4L, 1300000000000L, true)), s"adc: ${out.toSeq}")
  }

  test("q221 release diff: planted two-source card — ratio, two TVDs, vocab Jaccard") {
    import spark.implicits._
    // A: 2 en docs, chars 1, vocab {a,b,c}; B: 1 en + 1 fr, chars
    // {1,3}, vocab {a,b,d}. ratio 2/2 = 1e6; lang TVD = (|2·2−1·2| +
    // |0−2|)·1e6 / (2·2·2) = 500000; len bins 0 vs 1 give the same
    // 500000; Jaccard = |{a,b}| / |{a,b,c,d}| = 500000.
    val docs = Seq(
      (1L, "A", "en", 1L, "a b"), (2L, "A", "en", 1L, "a c"),
      (3L, "B", "en", 1L, "a b"), (4L, "B", "fr", 3L, "d"),
      (5L, "C", "en", 9L, "ignored other source"))
      .toDF("doc_id", "source", "lang", "n_chars", "text")
    try {
      val out = TextAnalysis.releaseDiffDocs(docs, "A", "B").collect()
        .map(r => (r.getString(0), r.getLong(1)))
      assert(out.toSeq == Seq(
        ("doc_ratio_ppm", 1000000L),
        ("lang_tvd_ppm", 500000L),
        ("len_tvd_ppm", 500000L),
        ("vocab_jaccard_ppm", 500000L)), s"diff: ${out.toSeq}")
    } finally Dedup.unpersistCaches()
  }

  test("q222 heavy-hitter union: local thresholds cover every global hitter (pigeonhole)") {
    import spark.implicits._
    // C=2. shard 0: x:3 y:1 (st 4, local cut f·2 ≥ 4 admits x);
    // shard 1: x:1 y:3 (admits y). Neither shard admits BOTH, yet the
    // union {x, y} covers the global hitters x:4 y:4 (total 8, cut
    // f·2 ≥ 8) — exactly the pigeonhole the contract hash-checks.
    val local = Seq(
      (0L, "x", 3L), (0L, "y", 1L), (1L, "x", 1L), (1L, "y", 3L))
      .toDF("shard", "tok", "f")
    val out = TextAnalysis.hhUnionFromLocal(local, c = 2).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4)))
    assert(out.toSeq == Seq(
      ("x", 4L, 500000L, 2L, true),
      ("y", 4L, 500000L, 2L, true)), s"hh: ${out.toSeq}")
  }

  test("q223 retrain gain: frozen codebook degenerates on the unseen cluster, fresh splits it") {
    import spark.implicits._
    // Evens are all (0,0): the frozen build's two identical seeds
    // collapse to one code at the origin, so the odd cluster at
    // (1,1) pays 2e12 µu² each — mean_frozen 1e12. The fresh build
    // seeds (0,0)/(1,1) and reconstructs exactly — mean_fresh 0,
    // excess = 1e12·1e6 div GREATEST(0,1) = 1e18 (the zero guard).
    val emb = Seq(
      (0L, Seq(0f, 0f)), (1L, Seq(1f, 1f)),
      (2L, Seq(0f, 0f)), (3L, Seq(1f, 1f)))
      .toDF("vec_id", "embedding")
    val out = graft.ops.Ivf.pqRetrainGainOn(emb, nSub = 1, k = 2,
      iters = 1, dim = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      (0L, 4L, 1000000000000L, 0L, 1000000000000000000L)),
      s"retrain: ${out.toSeq}")
  }

  test("q224 rollup shares: level structure, truncated child shares sum back to the parent") {
    val out = graft.ops.Grouping.rollupShares(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getDouble(3), r.getLong(4)))
    try {
      val nations = out.filter(_._3 == "nation")
      val regions = out.filter(_._3 == "region")
      val total = out.filter(_._3 == "total")
      // sf0.001 has ~10 suppliers, so only their nations appear —
      // assert structure, not the full 25-nation TPC-H roster
      assert(nations.nonEmpty && regions.nonEmpty &&
        total.length == 1, s"levels: ${out.map(_._3).toSeq}")
      assert(regions.map(_._1).toSet == nations.map(_._1).toSet,
        "every nation's region has a region row and vice versa")
      assert(total.head._5 == 1000000L)
      // truncating div: children sum to within #children of 1e6
      regions.foreach { case (rn, _, _, _, _) =>
        val s = nations.filter(_._1 == rn).map(_._5).sum
        assert(s <= 1000000L && s >= 1000000L - 5,
          s"region $rn nation shares sum $s")
      }
      val rs = regions.map(_._5).sum
      assert(rs <= 1000000L && rs >= 1000000L - 5,
        s"region shares sum $rs")
    } finally Dedup.unpersistCaches()
  }

  test("q225 latency trend: exact nearest-rank P50/P90 reproduced independently for one month") {
    val out = graft.ops.Relational.latencyTrend(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(out.nonEmpty && out.forall(r => r._3 <= r._4),
      s"p50 > p90 somewhere: ${out.toSeq}")
    val (ym, n, p50, p90) = out.head
    val lats = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf),
        col("l_orderkey") === col("o_orderkey"))
      .filter(expr("year(o_orderdate) * 100 + month(o_orderdate)")
        .cast("long") === ym)
      .select(datediff(col("l_shipdate").cast("date"),
        col("o_orderdate").cast("date")).cast("long"))
      .collect().map(_.getLong(0)).sorted
    assert(lats.length == n.toInt)
    def nearestRank(p: Int): Long =
      lats((lats.length * p + 99) / 100 - 1)
    assert(p50 == nearestRank(50) && p90 == nearestRank(90),
      s"month $ym: got ($p50, $p90), want " +
        s"(${nearestRank(50)}, ${nearestRank(90)})")
  }

  test("q227 vocab growth: planted two-decile curve, new-type attribution, TTR decay") {
    import spark.implicits._
    // 10 docs (nd = 10, decile = doc_id); only docs 0 and 5 carry
    // text. Decile 0 introduces {a, b}; decile 5 repeats a and
    // introduces c — new_types 1, cum 3 types over 4 tokens
    // (ttr 750000). Empty texts contribute no token rows.
    val docs = (0L to 9L).map(i =>
      (i, if (i == 0L) "a b" else if (i == 5L) "a c" else ""))
      .toDF("doc_id", "text")
    try {
      val out = TextAnalysis.vocabGrowthDocs(docs).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5)))
      assert(out.toSeq == Seq(
        (0L, 2L, 2L, 2L, 2L, 1000000L),
        (5L, 2L, 1L, 3L, 4L, 750000L)), s"growth: ${out.toSeq}")
    } finally Dedup.unpersistCaches()
  }

  test("q228 dispersion: parallel-axis identity on a planted pair, singleton at zero") {
    import spark.implicits._
    // source a: (1,0) and (3,0) -> centroid (2,0), mean squared
    // distance 1 unit² = 1e12 µu²; source b: one vector -> 0.
    val emb = Seq(
      ("a", Seq(1f, 0f)), ("a", Seq(3f, 0f)), ("b", Seq(5f, 5f)))
      .toDF("source", "embedding")
    val out = Similarity.sourceDispersionOn(emb).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(
      ("a", 2L, 1000000000000L),
      ("b", 1L, 0L)), s"dispersion: ${out.toSeq}")
  }

  test("q229 join forecast: every field reproduced from an independent per-key recompute") {
    val out = graft.ops.Audit.joinSizeForecast(spark, sf).collect()
    assert(out.length == 1)
    val r = out.head
    val ns = Tables.events(spark, sf).groupBy(col("user_id"))
      .agg(count(lit(1)).as("n")).collect().map(_.getLong(1))
    val sq = ns.map(n => BigInt(n) * n).sum
    val tot = ns.map(BigInt(_)).sum
    val mx = ns.map(n => BigInt(n) * n).max
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) ==
      (ns.length.toLong, sq.toLong, ((sq - tot) / 2).toLong,
        mx.toLong, ((mx * 1000000) / sq).toLong),
      s"forecast: $r vs recompute")
  }

  test("q230 nation volume: bucketed path equals a plain recomputation, both directions present") {
    import graft.ops.Det
    val out = graft.ops.Flagship.nationVolume(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSeq
    val rev = Det.revenueTerm(col("l_extendedprice"), col("l_discount"))
    val plain = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.supplier(spark, sf),
        col("l_suppkey") === col("s_suppkey"))
      .join(Tables.customer(spark, sf),
        col("o_custkey") === col("c_custkey"))
      .join(Tables.nation(spark, sf).select(
        col("n_nationkey").as("sk"), col("n_name").as("sn")),
        col("s_nationkey") === col("sk"))
      .join(Tables.nation(spark, sf).select(
        col("n_nationkey").as("ck"), col("n_name").as("cn")),
        col("c_nationkey") === col("ck"))
      .filter((col("sn") === "NATION_13" && col("cn") === "NATION_19") ||
        (col("sn") === "NATION_19" && col("cn") === "NATION_13"))
      .groupBy(col("sn"), col("cn"),
        year(col("o_orderdate")).cast("long").as("yr"))
      .agg(sum(rev).cast("double").as("rv"))
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getDouble(3))).sortBy(x => (x._1, x._2, x._3))
      .toSeq
    assert(out.nonEmpty && out.map(_._1).toSet.size == 2,
      s"expected both directions: ${out.map(x => (x._1, x._2)).toSet}")
    assert(out.sortBy(x => (x._1, x._2, x._3)) == plain,
      s"bucketed vs plain: $out vs $plain")
  }

  test("q231 returned revenue: deterministic top-N cut, descending, tie-broken") {
    val out = graft.ops.Relational.returnedRevenueTop(spark, sf, 20)
      .collect().map(r => (r.getLong(0), r.getDouble(3))).toSeq
    assert(out.nonEmpty && out.length <= 20)
    out.sliding(2).foreach { case Seq((k1, r1), (k2, r2)) =>
      assert(r1 > r2 || (r1 == r2 && k1 < k2),
        s"order violated at ($k1,$r1) -> ($k2,$r2)")
    case _ => ()
    }
  }

  test("q232 promo share: planted two-month card, exact scale-4 ppm") {
    import spark.implicits._
    // month 199601: total 150.00 (promo 100.00) -> 666666 ppm;
    // month 199602: one promo line at 200.00 with 10% discount
    // (rev 180.00) -> the whole month, 1000000 ppm.
    val li = Seq(
      (1L, 100.00, 0.00, "1996-01-15"),
      (2L, 50.00, 0.00, "1996-01-20"),
      (1L, 200.00, 0.10, "1996-02-01"))
      .toDF("l_partkey", "l_extendedprice", "l_discount", "sd")
      .select(col("l_partkey"), col("l_extendedprice"),
        col("l_discount"), col("sd").cast("timestamp").as("l_shipdate"))
    val part = Seq((1L, "PROMO"), (2L, "ECONOMY"))
      .toDF("p_partkey", "p_type")
    val out = graft.ops.Relational.promoRevenueShareOn(li, part)
      .collect().map(r => (r.getLong(0), r.getDouble(1),
        r.getDouble(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (199601L, 150.0, 100.0, 666666L),
      (199602L, 180.0, 180.0, 1000000L)), s"promo: ${out.toSeq}")
  }

  test("q233 idle rich: every reported nation mass reproduced from independent filters") {
    val out = graft.ops.Relational.idleRichCustomers(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq
    val c = Tables.customer(spark, sf).select(col("c_custkey"),
      col("c_nationkey"),
      (col("c_acctbal").cast("decimal(12,2)") * 100).cast("long")
        .as("cents"))
    val pos = c.filter(col("cents") > 0L)
      .agg(sum(col("cents")), count(lit(1))).head()
    val (tc, nc) = (pos.getLong(0), pos.getLong(1))
    val cutoff = Tables.orders(spark, sf)
      .agg(max(col("o_orderdate"))).head().get(0)
    val recent = Tables.orders(spark, sf)
      .filter(col("o_orderdate") >=
        lit(cutoff) - expr("INTERVAL 90 DAYS"))
    val expected = c.filter(col("cents") * nc > tc)
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey").cast("long").as("nk"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("t"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    assert(out.nonEmpty && out == expected,
      s"idle rich: $out vs $expected")
  }

  test("q234 quality-length bias: planted bins, shared q35 scorer means") {
    import spark.implicits._
    // "the": 0.4·0.01 + 0.3·1 + 0.3·min(5·1,1) = 0.604; "xx"/"zz":
    // 0.4·0.01 + 0.3·1 + 0 = 0.304. n_chars 1,1,2 -> bins 0,0,1:
    // bin 0 mean (604000+304000)/2 = 454000, bin 1 = 304000.
    val docs = Seq(
      (1L, "the", 1L), (2L, "xx", 1L), (3L, "zz", 2L))
      .toDF("doc_id", "text", "n_chars")
    val out = TextAnalysis.qualityLengthBiasDocs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(
      (0L, 2L, 454000L), (1L, 1L, 304000L)), s"bias: ${out.toSeq}")
  }

  test("q235 A/B significance: planted insignificant and significant splits") {
    import spark.implicits._
    // 2-vs-2 users, 1 vs 2 conversions: (x1n2-x2n1)²·N·1e4 = 160000
    // < 38416·n1n2·X(N-X) = 460992 -> not significant. 10-vs-10 with
    // 0 vs 10: 2e9 >= 3.84e8 -> significant.
    def ev(rows: Seq[(Long, String)]) = rows
      .toDF("user_id", "event_type")
      .select(col("user_id"), col("event_type"),
        org.apache.spark.sql.functions.lit(0L).as("pad"))
    val small = ev(Seq((0L, "purchase"), (2L, "view"),
      (1L, "purchase"), (3L, "purchase")))
    val s1 = graft.ops.Behavior.abConversionOn(small).collect().head
    assert((s1.getLong(0), s1.getLong(1), s1.getLong(2), s1.getLong(3),
      s1.getLong(4), s1.getLong(5), s1.getBoolean(6)) ==
      ((2L, 1L, 500000L, 2L, 2L, 1000000L, false)), s"small: $s1")
    val big = ev((0L until 20L).map(u =>
      (u, if (u % 2 == 1) "purchase" else "view")))
    val s2 = graft.ops.Behavior.abConversionOn(big).collect().head
    assert((s2.getLong(1), s2.getLong(4), s2.getBoolean(6)) ==
      ((0L, 10L, true)), s"big: $s2")
  }

  test("q236 conversion latency: planted click->purchase gaps, exclusions, nearest ranks") {
    import spark.implicits._
    // u1 converts in 5 min, u2 in 100; u3 has no click, u4's only
    // purchase precedes its click — both excluded. n=2: p50 lands on
    // the 5-minute bin (cum 1·100 ≥ 100), p90 on 100 (2·100 ≥ 180).
    val m = 60000000L
    val events = Seq(
      (1L, "click", 0L), (1L, "purchase", 5L * m),
      (2L, "click", 0L), (2L, "purchase", 100L * m),
      (3L, "purchase", 7L * m),
      (4L, "purchase", 0L), (4L, "click", 10L * m))
      .toDF("user_id", "event_type", "us")
      .select(col("user_id"), col("event_type"),
        timestamp_micros(col("us")).as("ts"))
    val out = graft.ops.Behavior.conversionLatencyOn(events).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((2L, 5L, 100L)), s"latency: ${out.toSeq}")
  }

  test("q237 boundary stitch: aperiodic 20-char overlap, periodic bidirectional pair, key cap") {
    import spark.implicits._
    // A ends with the aperiodic 20-char region O and B begins with it:
    // the ONLY verified candidate is p=13 -> overlap 20. The all-z
    // pair stitches in BOTH directions (periodic boundary, max L
    // reported). C matches nothing.
    val o20 = "CONTINUED PAGE TAIL!"
    val docs = Seq(
      (1L, "a" * 20 + o20), (2L, o20 + "b" * 20), (3L, "c" * 40),
      (4L, "z" * 20), (5L, "z" * 20))
      .toDF("doc_id", "text")
    try {
      val out = Dedup.boundaryStitchesDocs(docs).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(out.toSeq == Seq(
        (1L, 2L, 20L), (4L, 5L, 20L), (5L, 4L, 20L)),
        s"stitches: ${out.toSeq}")
      // a generic boundary key above the cap is suppressed entirely:
      // G's head yields 5 positions of QQQQQQQQ > cap 4
      val capped = Seq(
        (6L, "m" * 12 + "QQQQQQQQ"), (7L, "Q" * 12 + "n" * 8))
        .toDF("doc_id", "text")
      val cap = Dedup.boundaryStitchesDocs(capped, maxKeyFreq = 4L)
        .collect()
      assert(cap.isEmpty, s"cap failed: ${cap.toSeq}")
    } finally Dedup.unpersistCaches()
  }

  test("q238 closure audit: planted 5-wedge graph with 3 closed") {
    import spark.implicits._
    // triangle 1-2-3 plus edge 3-4: wedges (2,3)@1, (1,3)@2,
    // (1,2)/(1,4)/(2,4)@3 — the triangle's three close, the two
    // through node 4 don't: 3/5 = 600000 ppm.
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
      .toDF("vec_a", "vec_b")
    try {
      val out = Similarity.closureAuditOn(pairs).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3)))
      assert(out.toSeq == Seq((4L, 5L, 3L, 600000L)),
        s"closure: ${out.toSeq}")
    } finally Dedup.unpersistCaches()
  }

  test("q239 error burn: daily vs trailing-7 shares, calendar gap handled by the range frame") {
    import spark.implicits._
    // day 0 (isolated): 1/2 errors; day 10: 1/4; day 11: 0/2 but its
    // trailing window spans days 5-11 -> (1 err)/(6 events) = 166666.
    // The 10-day gap proves the RANGE frame ignores missing days
    // (a ROWS frame would have pulled day 0 into day 10's window).
    val us = 86400000000L
    val events = Seq(
      (0L, "error"), (0L, "view"),
      (10L, "error"), (10L, "view"), (10L, "view"), (10L, "view"),
      (11L, "view"), (11L, "click"))
      .toDF("day", "event_type")
      .select(timestamp_micros(col("day") * us + 1000000L).as("ts"),
        col("event_type"))
    val out = graft.ops.TimeSeries.errorBurnOn(events).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      (0L, 2L, 1L, 500000L, 500000L),
      (10L, 4L, 1L, 250000L, 250000L),
      (11L, 2L, 0L, 0L, 166666L)), s"burn: ${out.toSeq}")
  }

  test("q240 quality rank: within-source percentiles, tie order, singleton source") {
    import spark.implicits._
    // source s: scores 304000 ("xx"), 304000 ("zz"), 604000 ("the");
    // rank ties break on doc_id -> pct 0 / 500000 / 1000000. The
    // singleton source t pins the greatest(n-1, 1) guard at 0.
    val docs = Seq(
      (1L, "s", "the"), (2L, "s", "xx"), (3L, "s", "zz"),
      (4L, "t", "qq"))
      .toDF("doc_id", "source", "text")
    val out = TextAnalysis.sourceQualityRankDocs(docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3)))
    assert(out.toSeq == Seq(
      (1L, "s", 604000L, 1000000L),
      (2L, "s", 304000L, 0L),
      (3L, "s", 304000L, 500000L),
      (4L, "t", 304000L, 0L)), s"rank: ${out.toSeq}")
  }

  test("q226 custdist: masses reconcile with the customer and joined-order counts") {
    val out = graft.ops.Relational.customerOrderDist(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val nCust = Tables.customer(spark, sf).count()
    val nJoinedOrders = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf),
        col("o_custkey") === col("c_custkey"), "left_semi").count()
    assert(out.map(_._2).sum == nCust,
      s"customer mass: ${out.map(_._2).sum} vs $nCust")
    assert(out.map(x => x._1 * x._2).sum == nJoinedOrders,
      s"order mass: ${out.map(x => x._1 * x._2).sum} vs $nJoinedOrders")
  }
}
