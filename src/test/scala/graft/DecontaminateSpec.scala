package graft

import graft.ops.Decontaminate

class DecontaminateSpec extends SparkSpec {
  import spark.implicits._

  private val benchmark =
    "what is the capital of france the capital of france is paris a city of light"

  test("decontamination removes docs containing an eval passage, keeps the rest") {
    val corpus = Seq(
      (1L, "some clean training text about engines and optimizers and plans"),
      (2L, s"leaked prefix $benchmark leaked suffix words"),  // contaminated
      (3L, "another clean document with entirely different words in it"))
      .toDF("doc_id", "text")
    val evalSet = Seq((100L, benchmark)).toDF("doc_id", "text")

    val bad = Decontaminate.contaminated(corpus, evalSet)
      .collect().map(_.getLong(0)).toSet
    assert(bad == Set(2L), s"got $bad")

    val clean = Decontaminate.decontaminate(corpus, evalSet)
      .collect().map(_.getLong(0)).toSet
    assert(clean == Set(1L, 3L))
  }

  test("incremental near-dedup flags new docs duplicating the corpus") {
    val corpus = Seq(
      (1L, "the catalyst optimizer rewrites logical plans into physical " +
        "plans with pushdown pruning broadcast and codegen for analytics"),
      (2L, "a completely unrelated corpus document about rivers and hills"))
      .toDF("doc_id", "text")
    val increment = Seq(
      (10L, "the catalyst optimizer rewrites logical plans into physical " +
        "plans with pushdown pruning shuffle and codegen for analytics"), // near-dup of 1
      (11L, "fresh new content with no relation to anything previously seen"))
      .toDF("doc_id", "text")
    val dups = Decontaminate.incrementalNearDups(corpus, increment, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(dups.contains((10L, 1L)), s"got ${dups.toSeq}")
    assert(!dups.exists(_._1 == 11L))
  }

  test("exact PPJoin mode matches LSH-verified pairs on a planted corpus") {
    // both modes answer "J >= t over the same 8-gram shingle sets";
    // fixtures sit clearly on either side of t = 0.5 so the LSH
    // path's banding recall cannot blur the expected answer
    val corpus = Seq(
      (1L, "the catalyst optimizer rewrites logical plans into physical " +
        "plans with pushdown pruning broadcast and codegen for analytics"),
      (2L, "a completely unrelated corpus document about rivers and hills " +
        "flowing through quiet valleys under a wide northern sky"),
      (3L, "structured streaming applies watermarks to bound state in " +
        "windowed aggregations over unbounded event sources"))
      .toDF("doc_id", "text")
    val increment = Seq(
      (10L, "the catalyst optimizer rewrites logical plans into physical " +
        "plans with pushdown pruning shuffle and codegen for analytics"),
      (11L, "fresh new content with no relation to anything previously " +
        "seen in this corpus or any other collection of documents"),
      (12L, "structured streaming applies watermarks to bound state in " +
        "windowed aggregations over unbounded event streams"))
      .toDF("doc_id", "text")
    def pairsOf(exact: Boolean) =
      Decontaminate.incrementalNearDups(corpus, increment, 0.5, exact)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = pairsOf(exact = false)
    val ex = pairsOf(exact = true)
    assert(ex == lsh, s"exact=$ex lsh=$lsh")
    assert(ex == Set((10L, 1L), (12L, 3L)), s"got $ex")
    // exact mode's jaccard clears the threshold it claims
    val j = Decontaminate.incrementalNearDups(corpus, increment, 0.5,
      exact = true).collect().map(_.getAs[Double]("jaccard"))
    assert(j.forall(_ >= 0.5), s"jaccard below threshold: ${j.toSeq}")
  }
}
