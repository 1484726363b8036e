package graft

import graft.ops.{Layout, Sampling, TextAnalysis}
import org.apache.spark.sql.functions._

/** Planted-fixture semantics for the round-7 operator family
  * (q151–q155). The DuckDB oracles prove cross-engine agreement at two
  * scales; these specs prove the DECISIONS on hand-constructed rows
  * where the expected outcome is computed in the comment. */
class Round7OpsSpec extends SparkSpec {

  test("q151 filter cascade: each gate kills its planted document") {
    import spark.implicits._
    // 40 tokens, 40 distinct (TTR 1.0), 2/40 = 5% stopwords, >150 chars
    val good = ((1 to 38).map(i => s"word$i") ++ Seq("the", "of"))
      .mkString(" ")
    val rows = Seq(
      ("s", "short doc"),                         // fails s1 (len < 150)
      ("s", "x" * 200),                           // fails s2 (1 token)
      ("s", ("the " * 50).trim + " " + "y" * 20), // 51 tokens, 3 distinct -> fails TTR
      ("s", (1 to 40).map(i => s"w$i").mkString(" ") + " " + "z" * 60),
                                                  // no stopwords -> fails s4
      ("s", good))                                // passes all four
      .toDF("source", "text")
    val out = TextAnalysis.filterCascadeDocs(rows).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(1) == 5L, "n_docs")
    assert(r.getLong(2) == 4L, "pass_len: only the short doc dies")
    assert(r.getLong(3) == 3L, "pass_tokens: the 1-token wall dies")
    assert(r.getLong(4) == 2L, "pass_ttr: the repeated-token doc dies")
    assert(r.getLong(5) == 1L, "pass_stopword: only the good doc survives")
  }

  test("q152 curriculum schedule anneals proportional -> temperature shares") {
    import spark.implicits._
    // sources: big n=100 (sq=10), small n=4 (sq=2); K = isqrt(100) = 10.
    // phase 0: w = 3n -> (300, 12), tot 312 -> shares 961538 / 38461.
    // phase 3: w = 3·sq·K -> (300, 60), tot 360 -> shares 833333 / 166666.
    val docs = ((1 to 100).map(i => (i.toLong, "big")) ++
      (101 to 104).map(i => (i.toLong, "small")))
      .toDF("doc_id", "source")
    val out = Sampling.curriculumScheduleOn(docs, phases = 4)
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(3), r.getLong(4))).toMap
    assert(out((0L, "big")) == ((300L, 961538L)))
    assert(out((0L, "small")) == ((12L, 38461L)))
    assert(out((3L, "big")) == ((300L, 833333L)))
    assert(out((3L, "small")) == ((60L, 166666L)))
    // monotone annealing: the small source's share never decreases
    val smallShares = (0 to 3).map(p => out((p.toLong, "small"))._2)
    assert(smallShares == smallShares.sorted, s"not monotone: $smallShares")
  }

  test("q153 training order is a per-shard permutation, stable across runs") {
    val out = Layout.trainingOrder(spark, sf)
    val n = out.count()
    assert(n == Tables.documents(spark, sf).count(), "one row per doc")
    // (shard, pos) is a bijection: positions contiguous from 1 per shard
    val perShard = out.groupBy(col("shard"))
      .agg(count(lit(1)).as("c"), min(col("pos")).as("lo"),
        max(col("pos")).as("hi"),
        countDistinct(col("pos")).as("d"))
      .collect()
    perShard.foreach { r =>
      val (c, lo, hi, d) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(lo == 1L && hi == c && d == c,
        s"shard ${r.get(0)} positions not a contiguous 1..n run: $r")
    }
    // deterministic: a second evaluation is row-identical
    val again = Layout.trainingOrder(spark, sf)
    assert(out.exceptAll(again).count() == 0 &&
      again.exceptAll(out).count() == 0)
  }

  test("q154 chunk spans: exact spans for a 250-token document") {
    import spark.implicits._
    // 250 tokens, chunk 128, stride 96 -> starts 0/96/192 with
    // n_tok 128/128/58; a 1-token doc yields one (0, 1) span
    val docs = Seq(
      (1L, (1 to 250).map(i => s"t$i").mkString(" ")),
      (2L, "solo"))
      .toDF("doc_id", "text")
    val out = Layout.chunkSpansDocs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSet == Set(
      (1L, 0L, 0L, 128L), (1L, 96L, 1L, 128L), (1L, 192L, 2L, 58L),
      (2L, 0L, 0L, 1L)))
  }

  test("q156 dedup savings: duplicates die in the higher-id source") {
    import spark.implicits._
    // "x y z" appears in A(1), A(2), B(3): only A(1) is kept; B keeps
    // its unique doc. A: 2 docs / 1 kept, 6 tokens / 3 kept -> 500000
    // ppm saved. B: 2 docs / 1 kept, 5 tokens / 2 kept -> 600000 ppm.
    val docs = Seq(
      (1L, "A", "x y z"), (2L, "A", "x y z"),
      (3L, "B", "x y z"), (4L, "B", "unique doc"))
      .toDF("doc_id", "source", "text")
    val out = graft.ops.Dedup.dedupSavingsDocs(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(out("A") == ((2L, 1L, 6L, 3L, 500000L)))
    assert(out("B") == ((2L, 1L, 5L, 2L, 600000L)))
  }

  test("q157 padding waste: hand-computed batches for planted spans") {
    import spark.implicits._
    // spans of a 250-token doc (128/128/58) + three 10-token docs,
    // batchSize 4: batch 0 = [128,128,58,10] -> waste (512-324)/512 =
    // 367187 ppm; batch 1 = [10,10] -> zero waste
    val docs = (Seq((1L, (1 to 250).map(i => s"t$i").mkString(" "))) ++
      (2 to 4).map(i => (i.toLong, (1 to 10).map(j => s"w$j").mkString(" "))))
      .toDF("doc_id", "text")
    val out = Layout.paddingWasteDocs(docs, batchSize = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(out.toSet == Set( // global default = single shard 0
      (0L, 0L, 4L, 128L, 324L, 367187L),
      (0L, 1L, 2L, 10L, 20L, 0L)))
  }

  test("q162 EWMA fold: hand-computed decay with truncating division") {
    import spark.implicits._
    import java.sql.Timestamp
    // user 1, values 15/0/8 micro-unit-scaled by 1e-6 so v = 15, 0, 8:
    //   s1 = 15; s2 = 15*7/8 = 13 (truncation!); s3 = 13*7/8 + 8 = 19
    val rows = Seq(
      (1L, Timestamp.valueOf("2026-01-01 00:00:00"), 10L, 0.000015),
      (1L, Timestamp.valueOf("2026-01-01 00:01:00"), 11L, 0.0),
      (1L, Timestamp.valueOf("2026-01-01 00:02:00"), 12L, 0.000008))
      .toDF("user_id", "ts", "event_id", "value")
    val out = graft.ops.TimeSeries.ewmaActivityOn(rows).collect()
    assert(out.length == 1)
    assert(out.head.getLong(1) == 3L && out.head.getLong(2) == 19L,
      s"expected (3 events, ewma 19), got ${out.head}")
  }

  test("q155 fertility ppm equals the integer ratio of the summed counts") {
    val out = TextAnalysis.tokenFertility(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (chars, re, ppm) = (r.getLong(2), r.getLong(4), r.getLong(5))
      assert(ppm == chars * 1000000L / re, s"ppm mismatch in $r")
      assert(ppm >= 1000000L, "a token is at least one char")
    }
  }
}
