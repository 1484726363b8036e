package graft

import org.apache.spark.sql.functions._

class PipelineSpec extends SparkSpec {
  import spark.implicits._

  test("curation funnel removes planted low-quality and duplicate docs") {
    val good = "the catalyst optimizer rewrites logical plans into " +
      "physical plans of the engine and a broadcast join is the fast path"
    val docs = Seq(
      (1L, good),
      (2L, good),                                   // exact dup of 1
      (3L, good.replace("broadcast", "shuffle")),   // near dup of 1
      (4L, "!!! ??? ### $$$ %%% ^^^ &&& *** ((( )))"), // punctuation garbage
      (5L, "the quick brown fox jumps over a lazy dog and the day is long " +
        "and of the morning a walk to the river is the best of plans"))
      .toDF("doc_id", "text")
    val (curated, report) = Pipeline.curate(docs,
      minQuality = 0.4, nearDupJaccard = 0.7)
    val ids = curated.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(report.input == 5)
    assert(!ids.contains(4L), "garbage doc survived the quality filter")
    assert(!ids.contains(2L), "exact duplicate survived")
    assert(!ids.contains(3L), "near duplicate survived")
    assert(ids.contains(1L) && ids.contains(5L))
    assert(report.afterQuality >= report.afterExact &&
      report.afterExact >= report.afterNear)
    // survivors carry fingerprints + content hash
    assert(curated.filter(size(col("fingerprints")) === 0).count() == 0)
    assert(curated.filter(length(col("content_hash")) =!= 64).count() == 0)
  }

  test("exact near-dedup mode curates the same corpus as LSH on planted fixtures") {
    val good = "the catalyst optimizer rewrites logical plans into " +
      "physical plans of the engine and a broadcast join is the fast path"
    val docs = Seq(
      (1L, good),
      (2L, good),                                   // exact dup of 1
      (3L, good.replace("broadcast", "shuffle")),   // near dup of 1
      (5L, "the quick brown fox jumps over a lazy dog and the day is long " +
        "and of the morning a walk to the river is the best of plans"))
      .toDF("doc_id", "text")
    def idsOf(exactMode: Boolean) =
      Pipeline.curate(docs, minQuality = 0.4, nearDupJaccard = 0.7,
        exactNearDup = exactMode)._1
        .select("doc_id").collect().map(_.getLong(0)).toSet
    val lsh = idsOf(exactMode = false)
    val ex = idsOf(exactMode = true)
    assert(ex == lsh, s"exact=$ex lsh=$lsh")
    assert(ex == Set(1L, 5L))
  }

  test("curation scrubs PII and applies deterministic stratified sampling") {
    val docs = Tables.documents(spark, sf)
    val (_, r) = Pipeline.curate(docs,
      sampleRates = Map("en" -> 0.5), defaultSampleRate = 0.2)
    assert(r.afterSample < r.afterNear, "sampling removed nothing")
    val (_, r2) = Pipeline.curate(docs,
      sampleRates = Map("en" -> 0.5), defaultSampleRate = 0.2)
    assert(r2.afterSample == r.afterSample, "sample not deterministic")
    // planted email is scrubbed before anything downstream sees it
    val pii = Seq((9001L, "the of and a to reach me at bob@example.com " +
      "for the plan of the day and the rest of the story of the trip"))
      .toDF("doc_id", "text")
    val (c3, _) = Pipeline.curate(pii, minQuality = 0.0)
    val text = c3.select("text").head().getString(0)
    assert(text.contains("<EMAIL>") && !text.contains("bob@example.com"))
  }

  test("balanced mixing caps every source in the curated output") {
    val docs = Tables.documents(spark, sf)
    val (curated, r) = Pipeline.curate(docs, maxPerSource = 5)
    val perSource = curated.groupBy("source").count().collect()
    assert(perSource.forall(_.getAs[Long]("count") <= 5L),
      "a source exceeded the mixing cap")
    assert(r.afterSample < r.afterNear, "the cap removed nothing")
    val (_, r2) = Pipeline.curate(docs, maxPerSource = 5)
    assert(r2.afterSample == r.afterSample, "mixing cap not deterministic")
  }

  test("pipeline is idempotent: curating a curated corpus removes nothing") {
    val docs = Tables.documents(spark, sf)
    val (curated, r1) = Pipeline.curate(docs)
    val (_, r2) = Pipeline.curate(curated.select("doc_id", "text",
      "lang", "source", "n_chars"))
    assert(r2.input == r1.afterNear)
    assert(r2.afterNear == r2.input, "second pass removed documents")
  }

  test("observed curation: funnel metrics from ONE action equal the counted funnel") {
    val docs = Tables.documents(spark, sf)
    val (_, counted) = Pipeline.curate(docs)
    val obs = Pipeline.curateObserved(docs)
    try {
      // the single action — everything (persists included) materializes
      // under it and the observe nodes fire exactly once
      obs.curated.write.format("noop").mode("overwrite").save()
      def rows(o: org.apache.spark.sql.Observation): Long =
        o.get("rows").asInstanceOf[Long]
      assert(rows(obs.input) == counted.input)
      assert(rows(obs.afterQuality) == counted.afterQuality)
      assert(rows(obs.afterExact) == counted.afterExact)
      assert(rows(obs.afterNear) == counted.afterNear)
      // the bonus data-quality metric rides the same action
      assert(obs.afterQuality.get("avg_quality").asInstanceOf[Double] >= 0.5)
    } finally obs.release()
  }
}
