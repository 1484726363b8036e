package graft

import graft.ops.{Dedup, Similarity, TextAnalysis}
import org.apache.spark.sql.functions._

/** Empty/degenerate-input robustness: operators must return empty
  * results, not throw, when a filter upstream removes everything —
  * at 100 TB some partition or day WILL be empty. */
class EdgeCaseSpec extends SparkSpec {
  import spark.implicits._

  private def emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")

  test("minhash pipeline on an empty corpus returns no pairs") {
    assert(Dedup.nearDupPairs(emptyDocs, "doc_id", 0.5).count() == 0)
  }

  test("simhash near-dups on an empty corpus returns no pairs") {
    assert(Dedup.simhashNearDups(emptyDocs, "doc_id", 3).count() == 0)
  }

  test("incremental exact dedup and cluster propagation on empty inputs") {
    assert(Dedup.incrementalExactNew(emptyDocs, emptyDocs).count() == 0)
    import spark.implicits._
    val noPairs = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    assert(Dedup.dedupClusters(noPairs, "doc_a", "doc_b").count() == 0)
  }

  test("winnowing on empty and single-char docs yields one fingerprint") {
    val docs = Seq((1L, ""), (2L, "x")).toDF("doc_id", "text")
    val fps = TextAnalysis.winnowed(docs).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](2).size).toMap
    // a doc shorter than the shingle hashes its full content once
    assert(fps(1L) == 1 && fps(2L) == 1)
  }

  test("LSH embedding near-dup on empty input returns no pairs") {
    val empty = Seq.empty[(Long, Array[Float], Int)]
      .toDF("vec_id", "embedding", "label")
    assert(Similarity.lshEmbeddingNearDups(empty, 0.9).count() == 0)
  }

  test("sequence sync maxId sentinel on an empty table") {
    val empty = Seq.empty[Long].toDF("id")
    assert(graft.pg.SequenceSync.maxId(empty, "id") == -1L)
  }

  test("as-of join with an empty right side yields null matches") {
    val left = Seq((1L, 7L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00")))
      .toDF("purchase_id", "user_id", "purchase_ts")
    val right = Seq.empty[(Long, Long, java.sql.Timestamp)]
      .toDF("event_id", "user_id", "ts")
    val row = graft.ops.AsOf.join(left, right, Seq("user_id"),
        "purchase_ts", "ts", Seq("event_id"), "event_id").head()
    assert(row.isNullAt(row.fieldIndex("asof_event_id")))
  }
}
