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
}
