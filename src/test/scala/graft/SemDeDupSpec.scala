package graft

import graft.ops.Ivf
import org.apache.spark.sql.functions._

/** SemDeDup (cluster-then-prune semantic dedup) — q145 is the
  * oracle-checked deterministic form; these specs prove the prune
  * SEMANTICS on planted duplicates and the production path over
  * ML-KMeans cells (whose init no oracle can replay). */
class SemDeDupSpec extends SparkSpec {

  test("planted duplicate cluster keeps exactly the lowest id") {
    import spark.implicits._
    // cell 0: ids 10/11/12 are the SAME vector (mutual cos 1.0) and
    // id 13 is orthogonal; cell 1: two near-identical vectors. The
    // greedy keep-first rule must keep 10 (lowest of the ε-ball),
    // drop 11 and 12 with dup_of=10, keep 13 (below τ to everything),
    // and keep 20 / drop 21 in cell 1.
    val v = Array.fill(64)(0.1f); v(0) = 1.0f
    val w = Array.fill(64)(0.0f); w(1) = 1.0f            // ~orthogonal to v
    val u = Array.fill(64)(0.1f); u(0) = 0.99f           // near-dup of v
    val rows = Seq(
      (10L, 0L, v), (11L, 0L, v), (12L, 0L, v), (13L, 0L, w),
      (20L, 1L, v), (21L, 1L, u))
      .toDF("vec_id", "cell", "embedding")
    val out = Ivf.semanticDedupOn(rows, tauPpm = 950000L)
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(2), if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    assert(out(10L) == ((true, -1L)))
    assert(out(11L) == ((false, 10L)))
    assert(out(12L) == ((false, 10L)))
    assert(out(13L) == ((true, -1L)))
    assert(out(20L) == ((true, -1L)))
    assert(out(21L) == ((false, 20L)))
  }

  test("cross-cell near-dups are NOT pruned (blocking is per cell)") {
    import spark.implicits._
    val v = Array.fill(64)(0.5f)
    val rows = Seq((1L, 0L, v), (2L, 1L, v)).toDF("vec_id", "cell", "embedding")
    val out = Ivf.semanticDedupOn(rows, tauPpm = 950000L).collect()
    assert(out.forall(_.getBoolean(2)),
      "identical vectors in different cells must both survive — " +
        "cell assignment is the recall boundary, as in LSH banding")
  }

  test("production path: ML-KMeans cells drop a planted duplicate pair") {
    // append two identical synthetic vectors to the corpus; whatever
    // cell k-means puts them in, they share it (identical input ⇒
    // identical assignment), so the higher id must be dropped
    import spark.implicits._
    val emb = Tables.embeddings(spark, sf)
    val planted = Array.tabulate(64)(i => math.sin(i + 1).toFloat)
    val maxId = emb.agg(max("vec_id")).head().getLong(0)
    val extra = Seq((maxId + 1, planted), (maxId + 2, planted))
      .toDF("vec_id", "embedding")
    val corpus = emb.select($"vec_id", $"embedding").union(extra)
    val assigned = Ivf.build(corpus, k = 8).assigned
      .select($"vec_id", $"cell", $"embedding")
    val out = Ivf.semanticDedupOn(assigned, tauPpm = 999000L)
      .filter($"vec_id" > maxId).collect()
      .map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(out(maxId + 1), "lower planted id must be kept")
    assert(!out(maxId + 2), "higher planted id must be dropped")
  }

  test("incremental corpus-vs-batch verdicts equal the full run over corpus ∪ batch") {
    import spark.implicits._
    // batch = 40 perturbed copies of corpus vectors (ids 1000+, above
    // every corpus id, so "corpus wins" and "lower id wins" coincide
    // with the full run's greedy rule) + the corpus's own centroid
    // routing. Full run: assign corpus ∪ batch to the CORPUS index's
    // cells, prune with semanticDedupOn; its batch-row verdicts must
    // match semanticDedupIncremental exactly.
    val idx = Ivf.deterministicIndex(spark, sf)
    val emb = Tables.embeddings(spark, sf)
    val batch = emb.filter($"vec_id" < 40)
      .select(($"vec_id" + 1000L).as("vec_id"),
        expr("transform(embedding, v -> cast(v * 0.999 as float))")
          .as("embedding"))
    val inc = Ivf.semanticDedupIncremental(spark, sf, batch, 400000L)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    val union = Ivf.assignToCells(
      emb.select($"vec_id", $"embedding").union(batch), idx.centroids)
    val full = Ivf.semanticDedupOn(union, 400000L)
      .filter($"vec_id" >= 1000L)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(inc.size == 40 && full.size == 40)
    assert(inc == full, s"diverging ids: ${
      (inc.keySet ++ full.keySet).filter(k => inc.get(k) != full.get(k))}")
    // a 0.999-scaled copy has cosine 1.0 with its original: everything
    // in the batch must be dropped against the corpus
    assert(inc.values.forall(_ == false), "scaled copies must all drop")
  }

  test("mega-cell star guard bounds pair fan-out, keeps dissimilar members") {
    import spark.implicits._
    // cell 0 holds 21 members (> maxCell=10): 20 identical vectors
    // plus one dissimilar; cell 1 is small (all-pairs path). The
    // guard must emit exactly n-1 star pairs for the mega cell —
    // not C(21,2)=210 — and still (a) drop every near-identical
    // member against the representative, (b) keep the dissimilar
    // member (below τ to the rep ⇒ survives; the documented recall
    // trade of star pairing over degenerate mass).
    val v = Array.fill(64)(0.5f)
    val w = Array.fill(64)(0.0f); w(0) = 1.0f // cos(v, w) = 0.125
    val rows = ((0L to 19L).map(i => (i, 0L, v)) ++ Seq((20L, 0L, w)) ++
      Seq((30L, 1L, v), (31L, 1L, v))).toDF("vec_id", "cell", "embedding")
    val nPairs = Ivf.semanticCandidates(rows, maxCell = 10).count()
    assert(nPairs == 21L, // 20 star pairs (cell 0) + 1 all-pair (cell 1)
      s"expected 21 guarded pairs, got $nPairs")
    val out = Ivf.semanticDedupOn(rows, tauPpm = 950000L, maxCell = 10)
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(2), if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    assert(out(0L) == ((true, -1L)), "rep survives")
    (1L to 19L).foreach(i =>
      assert(out(i) == ((false, 0L)), s"member $i must drop against rep"))
    assert(out(20L) == ((true, -1L)), "dissimilar member survives")
    assert(out(30L) == ((true, -1L)) && out(31L) == ((false, 30L)),
      "small cell keeps exact all-pairs semantics")
  }

  test("incremental guard: mega prior cell prunes to its representative") {
    import spark.implicits._
    val v = Array.fill(64)(0.5f)
    val u = Array.fill(64)(0.0f); u(1) = 1.0f
    // prior cell 0: rep c_id=100 is v, members 101..114 are u (cell
    // over maxCell=10). A batch copy of the REP must still drop
    // (dup_of_corpus = 100); a batch copy of a NON-rep member is kept
    // — the star guard's bounded-recall trade, same as LSH buckets.
    val prior = (Seq((0L, 100L, v)) ++
      (101L to 114L).map(i => (0L, i, u)))
      .toDF("cell", "c_id", "c_emb")
    val batch = Seq((1000L, 0L, v), (1001L, 0L, u))
      .toDF("vec_id", "cell", "embedding")
    val out = Ivf.semanticDedupAgainst(batch, prior, 950000L, maxCell = 10)
      .collect().map(r => r.getLong(0) -> (r.getBoolean(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    assert(out(1000L) == ((false, 100L)), "rep copy drops against corpus")
    assert(out(1001L)._1, "non-rep copy kept under the star guard")
  }

  test("autoK grows with N and both engines derive the same k") {
    assert(Ivf.autoK(500) == 8 && Ivf.autoK(2000) == 8,
      "test corpora stay at k=8 (floor)")
    assert(Ivf.autoK(5000) == 20 && Ivf.autoK(20000) == 79 &&
      Ivf.autoK(1000000) == 3907, "k scales as ceil(N/256) above the floor")
    // the oracle's scalar-subquery form computes the identical k for
    // this corpus (DuckDB replay of the same integer formula)
    val n = Tables.embeddings(spark, sf).count()
    val sql = Ivf.kSql()
    assert(sql.contains("GREATEST(8,") && sql.contains("// 256"),
      s"kSql must replay the autoK integers: $sql")
    assert(Ivf.autoK(n) == 8, "bundled corpus resolves to the floor")
  }

  test("deterministic index refuses k above MaxDetK, routes to the ML path") {
    // the driver envelope (round-8, verdict #5): autoK grows k ∝ N,
    // and the det path's centroid state/collect/broadcast/oracle
    // replay are all O(k) — above MaxDetK it must fail LOUDLY naming
    // the production alternative, not drag gigabytes through the
    // driver.
    val e = intercept[IllegalArgumentException] {
      Ivf.deterministicIndex(spark, sf, k = Ivf.MaxDetK + 1)
    }
    assert(e.getMessage.contains("MaxDetK") &&
      e.getMessage.contains("persistedIndex"),
      s"guard message must name the ceiling and the ML route: ${e.getMessage}")
    // autoK crosses the ceiling at N > MaxDetK * TargetCellSize — the
    // documented envelope boundary (~1M vectors)
    assert(Ivf.autoK(Ivf.MaxDetK * Ivf.TargetCellSize) == Ivf.MaxDetK)
    assert(Ivf.autoK(Ivf.MaxDetK * Ivf.TargetCellSize + 1) == Ivf.MaxDetK + 1)
  }

  test("k=256 assignment (native cell_argmin) matches a brute-force driver replay") {
    // r15: one native cell_argmin serves every k (the r8 literal/join
    // two-regime switch is gone). Exactness check at a near-ceiling
    // k: every vector's final cell must equal a brute-force driver
    // replay of the same exact-long (d², cell) argmin over the
    // index's own centroids.
    val t0 = System.nanoTime()
    val idx = Ivf.deterministicIndex(spark, sf, k = 256, iters = 1)
    val n = idx.assigned.count()
    val secs = (System.nanoTime() - t0) / 1e9
    info(f"k=256 native-argmin build+assign: $secs%.1f s")
    assert(n == Tables.embeddings(spark, sf).count(), "every vector assigned")
    assert(secs < 120, f"near-ceiling build pathologically slow: $secs%.1f s")
    // exactness: replay the assignment for every vector on the driver
    // in the same long arithmetic and compare cells
    val xs = Tables.embeddings(spark, sf)
      .select(col("vec_id"), expr(
        "transform(embedding, v -> cast(round(cast(v as double) * 1000000, 0) as bigint))"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    val got = idx.assigned.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    xs.foreach { case (id, x) =>
      val want = idx.centroids.map { case (cid, c) =>
        (c.zip(x).map { case (a, b) => (a - b) * (a - b) }.sum, cid)
      }.min._2
      assert(got(id) == want, s"vec $id routed to ${got(id)}, brute force says $want")
    }
  }

  test("q145 registered form: deterministic cells, ppm threshold, stable order") {
    val out = Ivf.semanticDedup(spark, sf, tauPpm = 400000L)
    val rows = out.collect()
    assert(rows.length ==
      Tables.embeddings(spark, sf).count(), "one row per vector")
    // every drop names a lower-id survivor in the same data
    val dropped = rows.filter(!_.getBoolean(2))
    dropped.foreach { r =>
      assert(r.getLong(3) < r.getLong(0), "dup_of must be a lower id")
      assert(r.getLong(4) >= 400000L, "recorded sim must clear τ")
    }
  }
}
