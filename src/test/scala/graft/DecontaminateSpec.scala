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
}
