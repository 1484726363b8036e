package graft

import graft.ops.{Decontaminate, Dedup, Grouping, Layout, Profiling, Sampling, TimeSeries}
import org.apache.spark.sql.functions._

/** Round-9 planted fixtures for the two ops registered this round
  * (q179 PSI drift, q180 linear interpolation) — each pins the exact
  * arithmetic the oracle hash-compare can only check in aggregate:
  * the Laplace empty-bin smoothing and the truncating (not flooring)
  * integer division on a negative slope. */
class Round9OpsSpec extends SparkSpec {

  test("q179 PSI: planted shift with hand-computed per-bin terms incl. empty bins") {
    import spark.implicits._
    // bin 0: ref={3 rows}, cur={1 row}; bin 1: ref EMPTY, cur={2};
    // bin 2: ref={1}, cur EMPTY. Totals tr=4, tc=3, nb=3 bins.
    // Laplace +1: pr = (n_ref+1)/(tr+nb) = (n_ref+1)/7,
    //             pc = (n_cur+1)/(tc+nb) = (n_cur+1)/6.
    // bin 0: (4/7 - 2/6)·ln((4/7)/(2/6)) = 0.2380952…·0.5389965… =
    //   0.12833250… -> 0.128333 (HALF_UP at 6dp). The empty bins get
    //   finite positive terms instead of ln(0) blowups.
    val o = Seq(
      (0L, false), (0L, false), (0L, false), (0L, true),
      (1L, true), (1L, true),
      (2L, false)).toDF("bin", "cur")
    val out = Profiling.psiDriftOf(o).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    def term(nRef: Long, nCur: Long): Double = {
      val pr = (nRef + 1).toDouble / 7.0
      val pc = (nCur + 1).toDouble / 6.0
      BigDecimal((pr - pc) * math.log(pr / pc))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(out(0L) == ((3L, 1L, term(3, 1))), s"bin 0: ${out(0L)}")
    assert(out(0L)._3 == 0.128333, "hand-checked bin-0 term")
    assert(out(1L) == ((0L, 2L, term(0, 2))), s"bin 1 (empty ref): ${out(1L)}")
    assert(out(2L) == ((1L, 0L, term(1, 0))), s"bin 2 (empty cur): ${out(2L)}")
    // PSI terms are non-negative by construction ((p-q) and ln(p/q)
    // always share a sign) — the planted empty bins must stay finite
    out.values.foreach { case (_, _, t) =>
      assert(t >= 0.0 && !t.isInfinite && !t.isNaN)
    }
  }

  test("q176 bin-walk bounds (forced) equal the one-phase window bounds") {
    // binWalkMinRows = 0 forces the q100 two-phase branch for the
    // exact-bounds side; the (n, lo, hi) bounds must be IDENTICAL to
    // the one-phase per-group window — rank selection is
    // algorithm-independent (bins partition the value order), the
    // property that makes the swap safe to flip at 100 TB. The approx
    // side is shared, so only the bounds are compared.
    def bounds(minRows: Long) =
      Grouping.quantileContract(spark, sf, binWalkMinRows = minRows)
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
    val onePhase = bounds(Long.MaxValue)
    val binWalk = bounds(0L)
    assert(onePhase.size == 5, "five order priorities")
    assert(binWalk == onePhase,
      s"bin-walk-only: ${(binWalk -- onePhase).take(3)}; " +
        s"one-phase-only: ${(onePhase -- binWalk).take(3)}")
  }

  test("q173 planted contamination fractions incl. distinct-before-join") {
    import spark.implicits._
    // eval doc "a b c d" -> eval grams {a b c, b c d}.
    // doc 1 shares 1 of 3 trigrams -> 333333 ppm; doc 2 shares 2 of 3
    // -> 666666; doc 3 shares none; doc 4 repeats "a b c" three times
    // but its DISTINCT trigram set is {a b c, b c a, c a b} -> 1 of 3,
    // NOT 3 of 7 (428571) — pins the distinct-before-join rule the
    // corpus-scale oracle can only check in aggregate.
    val docs = Seq(
      (100L, "src0", "a b c d"),
      (1L, "src1", "a b c x y"),
      (2L, "src1", "a b c d e"),
      (3L, "src1", "p q r s"),
      (4L, "src2", "a b c a b c a b c"))
      .toDF("doc_id", "source", "text")
    val out = Decontaminate.evalOverlapScoreOn(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(out(1L) == ((3L, 1L, 333333L)), s"doc 1: ${out(1L)}")
    assert(out(2L) == ((3L, 2L, 666666L)), s"doc 2: ${out(2L)}")
    assert(out(3L) == ((2L, 0L, 0L)), s"doc 3: ${out(3L)}")
    assert(out(4L) == ((3L, 1L, 333333L)),
      s"doc 4 must count duplicate trigrams once: ${out(4L)}")
    assert(!out.contains(100L), "eval docs are excluded from scoring")
  }

  test("q181 containment: planted sub-document found, Jaccard would miss it") {
    import spark.implicits._
    // doc 1 (16 chars, 9 grams) is a strict PREFIX of doc 2 (24
    // chars, 17 grams): C(1→2) = 9/9 = 1e6 while J(1,2) = 9/17 ≈
    // 0.53 — under the q126 Jaccard threshold, which is the point of
    // the operator. The reverse C(2→1) = 9/17 is under t. doc 4
    // shares only 3 of its 9 grams with doc 1 (0.33, below t). docs
    // 3 and 5 are identical → containment 1e6 BOTH ways.
    val docs = Seq(
      (1L, "0123456789abcdef"),
      (2L, "0123456789abcdefghijklmn"),
      (3L, "zyxwvutsrqponml"),
      (4L, "56789abcdeUVWXYZ"),
      (5L, "zyxwvutsrqponml"))
      .toDF("doc_id", "text")
    try {
      val out = Dedup.containmentJoin(docs, "doc_id", 800000L).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(out == Set((1L, 2L, 1000000L), (3L, 5L, 1000000L),
        (5L, 3L, 1000000L)), s"got $out")
    } finally Dedup.unpersistCaches()
  }

  test("q182 budget select: hand-computed scores, greedy prefix cut") {
    import spark.implicits._
    // doc 1 "the the the the": 4 tokens all stopwords, no punct ->
    //   16000 + 300000 + 300000 = 616000
    // doc 3 "a b!": 2 tokens, 1 stopword, 1 punct of 4 chars ->
    //   8000 + (1e6 - 250000)*3 div 10 + 300000 = 533000
    // doc 2 "x y z": 3 tokens, no stopword -> 12000 + 300000 = 312000
    // budget 6: rank 616000(4 toks, cum 4 keep), 533000(cum 6 keep),
    // 312000(cum 9 DROP) — the first overflow ends the intake.
    val docs = Seq(
      (1L, "s1", "the the the the"),
      (2L, "s1", "x y z"),
      (3L, "s1", "a b!"))
      .toDF("doc_id", "source", "text")
    val out = Sampling.budgetSelectDocs(docs, budgetTokens = 6L).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(3), r.getLong(4), r.getBoolean(5))).toMap
    assert(out(1L) == ((616000L, 4L, true)), s"doc 1: ${out(1L)}")
    assert(out(3L) == ((533000L, 6L, true)), s"doc 3: ${out(3L)}")
    assert(out(2L) == ((312000L, 9L, false)), s"doc 2: ${out(2L)}")
  }

  test("q183 CDC chunks realign after a prefix insertion; fixed chunking would not") {
    import spark.implicits._
    // T is a fixed pseudo-text (~600 chars, seeded); doc 2 is T with a
    // 7-char prefix INSERTED. Fixed-grid chunking (q75) shares zero
    // chunks between the two (every boundary shifts by 7); content-
    // defined cuts realign at the first hash boundary, so the tail
    // chunks are IDENTICAL -> duplicated-chunk mass appears. The
    // control source "t" holds two unrelated texts -> zero dup mass.
    val r = new scala.util.Random(42)
    def txt(n: Int) = (1 to n).map { _ =>
      val c = r.nextInt(27); if (c == 26) ' ' else ('a' + c).toChar
    }.mkString
    val base = txt(600)
    val docs = Seq(
      (1L, "s", base),
      (2L, "s", "zq!pfx " + base),
      (3L, "t", txt(300)),
      (4L, "t", txt(300)))
      .toDF("doc_id", "source", "text")
    val out = Layout.cdcChunksDocs(docs).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val (nS, dS, ppmS) = out("s")
    assert(nS >= 6, s"fixture produced too few chunks ($nS) — no boundaries?")
    assert(dS < nS && ppmS > 0,
      s"prefix-shifted copy shares no CDC chunk: n=$nS distinct=$dS")
    val (nT, dT, ppmT) = out("t")
    assert(nT == dT && ppmT == 0L,
      s"unrelated texts must share no chunk: n=$nT distinct=$dT")
  }

  test("q184 length-tail: planted bins and decay ratios") {
    import spark.implicits._
    // lengths 1 | 2,3 | 4,5,6,7 -> bins 0:1, 1:2, 2:4; decay ratios
    // null, 2e6, 2e6 — the doubling-rate view, exact integers
    val docs = Seq("a", "ab", "abc", "abcd", "abcde", "abcdef", "abcdefg")
      .zipWithIndex.map { case (t, i) => (i.toLong, "s", t) }
      .toDF("doc_id", "source", "text")
    val out = Profiling.lengthTailProfileDocs(docs).collect()
      .map(r => r.getLong(1) ->
        (r.getLong(2), if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    assert(out(0L) == ((1L, -1L)), s"bin 0: ${out(0L)}")
    assert(out(1L) == ((2L, 2000000L)), s"bin 1: ${out(1L)}")
    assert(out(2L) == ((4L, 2000000L)), s"bin 2: ${out(2L)}")
  }

  test("q185 Spearman: planted perfect agreement and perfect inversion") {
    import spark.implicits._
    // source p: length rank == stopword rank -> rho exactly 1e6.
    // source q: length ascending while stopwords descend -> Σd² =
    // n(n²−1)/3 = 8 -> rho exactly −1e6. All integer arithmetic.
    val docs = Seq(
      (1L, "p", "b"), (2L, "p", "a b"), (3L, "p", "the a b"),
      (7L, "q", "the of"), (8L, "q", "xxxxxxx a"), (9L, "q", "xxxxxxxxxxxx"))
      .toDF("doc_id", "source", "text")
    val out = Profiling.spearmanDocs(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(out("p") == ((3L, 0L, 1000000L)), s"source p: ${out("p")}")
    assert(out("q") == ((3L, 8L, -1000000L)), s"source q: ${out("q")}")
  }

  test("q186 cell medoids: planted clusters, exact centroid math, d2 tie-break") {
    import spark.implicits._
    // 1-D geometry embedded in 64-D: seeds are vecs 0 (0.1) and 1
    // (−0.5). Cluster A = {0.1, 0.12, 0.2} -> integer-mean centroid
    // 140000 µu; medoid is vec 2 at d2 = 20000² = 4e8 (vec 0 is
    // 1.6e9, vec 3 is 3.6e9). Cluster B = {−0.5, −0.48} -> centroid
    // −490000; BOTH members sit at d2 = 1e8 -> min-vec_id tie-break
    // picks vec 1.
    def v(x: Float) = (x +: Seq.fill(63)(0.0f))
    val emb = Seq(
      (0L, v(0.1f)), (1L, v(-0.5f)), (2L, v(0.12f)),
      (3L, v(0.2f)), (4L, v(-0.48f)))
      .toDF("vec_id", "embedding")
    val idx = graft.ops.Ivf.deterministicIndexOn(emb, k = 2)
    try {
      val out = graft.ops.Ivf.cellMedoidsOn(idx, emb).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
        .toMap
      assert(out(0L) == ((3L, 2L, 400000000L)), s"cell 0: ${out(0L)}")
      assert(out(1L) == ((2L, 1L, 100000000L)),
        s"cell 1 (tie must break to min vec_id): ${out(1L)}")
    } finally idx.assigned.unpersist()
  }

  test("q187 daily PSI: dense grid, trailing baseline, hand-replayed terms") {
    import spark.implicits._
    // days 0..7, one stable bin (cnt 2/day); bin 1 APPEARS on day 7
    // only (cnt 3). Day 7 is the first with a full 7-day history ->
    // exactly the 2 grid rows for day 7 emit. ref(bin0)=14, ref(bin1)
    // =0 (dense grid keeps the vanishing/appearing bin). Terms
    // replayed driver-side with the identical IEEE sequence.
    val rows = (0 to 6).flatMap(d => Seq.fill(2)((d.toLong, 0L))) ++
      Seq.fill(2)((7L, 0L)) ++ Seq.fill(3)((7L, 1L))
    val ev = rows.toDF("day_idx", "bin")
    val out = Profiling.psiDriftDailyOf(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(out.size == 2, s"only day 7 has full history: ${out.keys}")
    def term(cnt: Long, ref: Long, totCur: Long, totRef: Long,
        nb: Long): Double = {
      val pr = (ref + 1).toDouble / (totRef + nb).toDouble
      val pc = (cnt + 1).toDouble / (totCur + nb).toDouble
      BigDecimal((pr - pc) * math.log(pr / pc))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(out((7L, 0L)) == ((2L, 14L, term(2, 14, 5, 14, 2))),
      s"stable bin: ${out((7L, 0L))}")
    assert(out((7L, 1L)) == ((3L, 0L, term(3, 0, 5, 14, 2))),
      s"appearing bin: ${out((7L, 1L))}")
    assert(out((7L, 1L))._3 > out((7L, 0L))._3 * 0 &&
      out((7L, 1L))._3 > 0, "appearing-bin term is positive and finite")
  }

  test("q188 HHI: planted mix vs monopoly") {
    import spark.implicits._
    // L1: shares 3/4 and 1/4 -> (750000² + 250000²) div 1e6 = 625000.
    // L2: one source -> exactly 1e6.
    val docs = Seq(
      (1L, "L1", "a"), (2L, "L1", "a"), (3L, "L1", "a"), (4L, "L1", "b"),
      (5L, "L2", "c"), (6L, "L2", "c"))
      .toDF("doc_id", "lang", "source")
    val out = Profiling.sourceHhiDocs(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(out("L1") == ((4L, 2L, 625000L)), s"L1: ${out("L1")}")
    assert(out("L2") == ((2L, 1L, 1000000L)), s"L2: ${out("L2")}")
  }

  test("q189 OOV: planted vocab cut with deterministic tie-break") {
    import spark.implicits._
    // corpus counts: x=5, y=3, z=2 -> top-2 vocab {x, y}.
    // s1 "x x z x x x": 6 tokens, 1 OOV -> 166666 ppm.
    // s2 "y z y y z": 5 tokens, 2 OOV -> 400000 ppm.
    val docs = Seq(
      (1L, "s1", "x x z x x x"),
      (2L, "s2", "y z y y z"))
      .toDF("doc_id", "source", "text")
    val out = graft.ops.TextAnalysis.oovRateDocs(docs, vocabSize = 2)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(out("s1") == ((6L, 1L, 166666L)), s"s1: ${out("s1")}")
    assert(out("s2") == ((5L, 2L, 400000L)), s"s2: ${out("s2")}")
  }

  test("q190 PII co-occurrence: planted linkage pair") {
    import spark.implicits._
    val docs = Seq(
      (1L, "mail a@b.co and 555-123-4567 now"),
      (2L, "ip 1.2.3.4 here"),
      (3L, "clean text"))
      .toDF("doc_id", "text")
    val out = graft.etl.Sanitize.piiCooccurrenceDocs(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out(("email", "email")) == ((3L, 1L, 333333L)))
    assert(out(("email", "phone")) == ((3L, 1L, 333333L)),
      "the linkage pair — email AND phone in one doc")
    assert(out(("email", "ip")) == ((3L, 0L, 0L)))
    assert(out(("ip", "ip")) == ((3L, 1L, 333333L)))
    assert(out(("ip", "phone")) == ((3L, 0L, 0L)))
    assert(out(("phone", "phone")) == ((3L, 1L, 333333L)))
  }

  test("q191 incremental containment: both directions on a planted split") {
    import spark.implicits._
    // corpus doc 1 is CONTAINED in new doc 401 (extended version ->
    // corpus_in_new); new doc 402 is a substring of doc 1 (already
    // have it -> new_in_corpus); 2/403 unrelated.
    val corpus = Seq(
      (1L, "0123456789abcdef"),
      (2L, "zyxwvutsrqponmlk"))
      .toDF("doc_id", "text")
    val nw = Seq(
      (401L, "0123456789abcdefghijklmn"),
      (402L, "23456789abcdef"),
      (403L, "THEQUICKBROWNFOX"))
      .toDF("doc_id", "text")
    try {
      val out = Dedup.containmentIncremental(corpus, "doc_id",
          nw, "doc_id", 900000L).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
        .toSet
      assert(out == Set(
        (401L, 1L, "corpus_in_new", 1000000L),
        (402L, 1L, "new_in_corpus", 1000000L)), s"got $out")
    } finally Dedup.unpersistCaches()
  }

  test("q192 minhash accuracy: identical pair estimates exactly 1e6") {
    import spark.implicits._
    // an identical pair's signatures are equal position-for-position
    // -> est exactly 1e6, |est - exact| = 0; a disjoint pair never
    // reaches the output (exact J = 0 under the minJ cut)
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again"),
      (2L, "the quick brown fox jumps over the lazy dog again"),
      (3L, "completely unrelated content with nothing shared at all"))
      .toDF("doc_id", "text")
    try {
      val out = Dedup.minhashAccuracyOn(docs).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      assert(out.toSeq == Seq((1L, 2L, 1000000L, true)), s"got ${out.toSeq}")
    } finally Dedup.unpersistCaches()
  }

  test("q193 budget intake: greedy arrival order, first overflow ends intake") {
    import spark.implicits._
    // tokens 4, 3, 2 in arrival order, budget 6: cum 4 (keep),
    // 7 (DROP — overflow), 9 (drop; no backfill even though doc 3's
    // 2 tokens would fit)
    val docs = Seq(
      (1L, "s1", "a b c d"),
      (2L, "s1", "e f g"),
      (3L, "s1", "h i"))
      .toDF("doc_id", "source", "text")
    val out = Sampling.budgetIntakeDocs(docs, budgetTokens = 6L).collect()
      .map(r => r.getLong(0) -> (r.getLong(3), r.getBoolean(4))).toMap
    assert(out(1L) == ((4L, true)))
    assert(out(2L) == ((7L, false)), "overflow doc is dropped")
    assert(out(3L) == ((9L, false)), "no best-fit backfill after overflow")
  }

  test("q194 split leakage: driver-replicated trigram overlap vs train side") {
    import spark.implicits._
    // variants of one base text scatter across splits by content
    // hash; every non-train doc's leak_ppm must equal the
    // driver-side recomputation of |trigrams ∩ train-gram-union| /
    // |trigrams| — pinning the distinct-before-join and the
    // split-partitioned overlap independently of the corpus
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val texts = (0 until 40).map(i => s"$base variant $i tail$i")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    def trigrams(t: String): Set[String] = {
      val s = t.split(" ")
      (0 to s.length - 3).map(i => s.slice(i, i + 3).mkString(" ")).toSet
    }
    graft.functions.GraftFunctions.register(spark)
    val (_, splitCol) = Sampling.groupSplit(col("text"))
    val splits = docs.select(col("doc_id"), splitCol.as("split")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assume(splits.values.exists(_ == "train") &&
      splits.values.exists(_ != "train"),
      "fixture must scatter across train and held-out splits")
    val trainGrams = splits.collect { case (id, "train") => id }
      .flatMap(id => trigrams(texts(id.toInt))).toSet
    val out = Decontaminate.splitLeakageOn(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    splits.foreach { case (id, sp) =>
      if (sp == "train") assert(!out.contains(id), "train docs emit no row")
      else {
        val tg = trigrams(texts(id.toInt))
        val shared = tg.count(trainGrams.contains).toLong
        assert(out(id) == ((tg.size.toLong, shared,
          shared * 1000000L / tg.size)),
          s"doc $id ($sp): ${out(id)} vs replica ($shared of ${tg.size})")
      }
    }
    assert(out.values.exists(_._3 > 0), "fixture must show real leakage")
  }

  test("q195 redaction completeness: adversarial fixture leaves zero residual hits") {
    import spark.implicits._
    // fixture stresses the chain-order hazards: a phone-shaped email
    // local part (the email pass must consume it whole), digits
    // abutting an email (the tag must break the digit run), and a
    // plain phone + IP; after redaction every pattern must count 0
    val docs = Seq(
      (1L, "s1", "reach 555-123-4567@spam.co or 10.0.0.1 now"),
      (2L, "s1", "x111 a@b.co 222.3333 and 555.123.4567"),
      (3L, "s2", "clean text only"))
      .toDF("doc_id", "source", "text")
    val out = graft.etl.Sanitize.redactionCompleteDocs(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    out.foreach { case (k, (_, after)) =>
      assert(after == 0L, s"$k leaves $after residual hits after redaction")
    }
    assert(out(("s1", "email"))._1 == 2L, s"emails: ${out(("s1", "email"))}")
    assert(out(("s1", "ip"))._1 == 1L)
    // the phone-shaped email local part counts BEFORE (both patterns
    // match the raw text) but the email pass consumes it whole, so it
    // must NOT survive as a residual phone hit
    assert(out(("s1", "phone"))._1 == 2L, s"phones: ${out(("s1", "phone"))}")
    assert(out(("s2", "email")) == ((0L, 0L)))
  }

  test("q196 cluster purity: planted within-source vs cross-source families") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (3L, 4L)).toDF("vec_a", "vec_b")
    val sources = Seq((1L, "a"), (2L, "a"), (3L, "a"), (4L, "b"))
      .toDF("vec_id", "source")
    val out = graft.ops.Similarity.clusterPurityOf(edges, sources)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == Set((2L, 1L, 1L), (2L, 2L, 1L)),
      s"one re-post family + one syndication family: $out")
  }

  test("q197 truncation waste: planted long doc, exact kept/waste arithmetic") {
    import spark.implicits._
    // 5-token + 200-token docs at L=128: total 205, kept 5+128=133,
    // waste 72e6 div 205 = 351219, one truncated doc
    val docs = Seq(
      (1L, "s1", "a b c d e"),
      (2L, "s1", Seq.fill(200)("w").mkString(" ")))
      .toDF("doc_id", "source", "text")
    val out = Layout.truncationWasteDocs(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(out("s1") == ((2L, 205L, 133L, 1L, 351219L)),
      s"s1: ${out("s1")}")
  }

  test("q198 language mismatch: planted noisy label and und separation") {
    import spark.implicits._
    // doc 1: English bigrams, labeled en -> agree; doc 2: English
    // bigrams labeled de -> MISMATCH; doc 3: no profile bigram ->
    // und (NOT a mismatch)
    val docs = Seq(
      (1L, "sA", "en", "the her in"),
      (2L, "sA", "de", "the her in an"),
      (3L, "sA", "en", "zzz"))
      .toDF("doc_id", "source", "lang", "text")
    val out = graft.ops.TextAnalysis.langMismatchDocs(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toMap
    assert(out("sA") == ((3L, 1L, 1L, 333333L)), s"sA: ${out("sA")}")
  }

  test("q199 skew profile: planted hot key, truncating avg, salt clamps") {
    import spark.implicits._
    // counts 6/2/1/1 over 4 keys: total 10, avg = 10 div 4 = 2.
    // key 1 -> share 600000 ppm, salt 6 div 2 = 3; keys 3/4 have
    // cnt < avg -> salt clamps up to 1.
    val fact = (Seq.fill(6)(1L) ++ Seq.fill(2)(2L) ++ Seq(3L, 4L))
      .toDF("k")
    val out = graft.ops.Skew.profileKey(fact, "k", 10).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      ("k", 1L, 6L, 600000L, 3L),
      ("k", 2L, 2L, 200000L, 1L),
      ("k", 3L, 1L, 100000L, 1L),
      ("k", 4L, 1L, 100000L, 1L)), s"profile: ${out.toSeq}")
    graft.ops.Dedup.unpersistCaches()
  }

  test("q200 emb outliers: far tail per cell, ceil-10% size, d2-desc tie to min id") {
    import spark.implicits._
    // q186's geometry: cell 0 = {0.1, 0.12, 0.2} centroid 140000 µu
    // -> tail size max(1, 3 div 10) = 1, farthest is vec 3 at
    // 60000² = 3.6e9. Cell 1 = {−0.5, −0.48} centroid −490000 ->
    // both at d2 = 1e8; the (d2 desc, vec_id) tie-break ranks vec 1
    // first and the 1-row tail keeps exactly it.
    def v(x: Float) = (x +: Seq.fill(63)(0.0f))
    val emb = Seq(
      (0L, v(0.1f)), (1L, v(-0.5f)), (2L, v(0.12f)),
      (3L, v(0.2f)), (4L, v(-0.48f)))
      .toDF("vec_id", "embedding")
    val idx = graft.ops.Ivf.deterministicIndexOn(emb, k = 2)
    try {
      val out = graft.ops.Ivf.cellOutliersOn(idx, emb).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4)))
      assert(out.toSeq == Seq(
        (0L, 3L, 3600000000L, 3L, 1L),
        (1L, 1L, 100000000L, 2L, 1L)), s"outliers: ${out.toSeq}")
    } finally idx.assigned.unpersist()
  }

  test("q180 interp: planted gap values, negative slope truncates toward zero") {
    import spark.implicits._
    // user 1: v(0h)=1_000_000, v(3h)=4_000_000 -> silent hours get the
    // exact line: 2_000_000, 3_000_000. user 2: v(0h)=5, v(3h)=-5 ->
    // slope -10/3: t=1 gives 5 + (-10·1) div 3 = 5 - 3 = 2 (TRUNCATING;
    // a flooring division would give 5 - 4 = 1), t=2 gives
    // 5 + (-20) div 3 = 5 - 6 = -1 (floor(-20/3) = -7 would give -2).
    // Both engines truncate on integer operands (the round-5 finding).
    val h = Seq(
      (1L, "2024-01-01 00:00:00", 1000000L),
      (1L, "2024-01-01 03:00:00", 4000000L),
      (2L, "2024-01-01 00:00:00", 5L),
      (2L, "2024-01-01 03:00:00", -5L))
      .toDF("user_id", "hs", "vmu")
      .select(col("user_id"), col("hs").cast("timestamp").as("hour"),
        col("vmu"))
    val out = TimeSeries.linearInterpOf(h).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString.take(13),
        r.getBoolean(2), r.getLong(3)))
    assert(out.length == 8, s"two users x four spine hours: ${out.length}")
    val byKey = out.map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(byKey((1L, "2024-01-01 00")) == ((true, 1000000L)))
    assert(byKey((1L, "2024-01-01 01")) == ((false, 2000000L)))
    assert(byKey((1L, "2024-01-01 02")) == ((false, 3000000L)))
    assert(byKey((1L, "2024-01-01 03")) == ((true, 4000000L)))
    assert(byKey((2L, "2024-01-01 01")) == ((false, 2L)),
      "negative slope must truncate toward zero, not floor")
    assert(byKey((2L, "2024-01-01 02")) == ((false, -1L)))
    assert(byKey((2L, "2024-01-01 03")) == ((true, -5L)))
  }
}
