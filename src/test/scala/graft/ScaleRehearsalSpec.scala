package graft

import org.apache.spark.sql.functions._

/** The 10x rehearsal corpora are only as good as their isomorphism
  * claims — these specs pin them at sf0.001 so a generator regression
  * cannot silently invalidate the BASELINE.md scaling table. */
class ScaleRehearsalSpec extends SparkSpec {

  test("docs10x: 10 shards, ids offset, per-shard text lengths preserved") {
    val base = Tables.documents(spark, sf)
    val ten = ScaleRehearsal.docs10x(spark, sf)
    assert(ten.count() == 10 * base.count())
    // shard 0 is the identity embed (source and lang pass through —
    // the source-keyed ops' and corpus card's isomorph requirement,
    // rounds 7–8)
    val s0 = ten.filter(col("doc_id") < 1000000L)
    assert(s0.exceptAll(base.select(col("doc_id"), col("source"),
      col("lang"), col("text"))).count() == 0)
    // every shard's source distribution equals the original's
    val perShard = ten.groupBy(expr("doc_id div 1000000").as("shard"),
        col("source")).count()
    assert(perShard.groupBy(col("source"))
      .agg(countDistinct(col("count")).as("d"), count(lit(1)).as("n"))
      .filter(col("d") =!= 1L || col("n") =!= 10L).count() == 0,
      "a shard's source distribution diverged from the original")
    // letter permutation preserves length per doc (injective char map)
    val lens = ten.groupBy((col("doc_id") % 1000000L).as("base_id"))
      .agg(countDistinct(length(col("text"))).as("d"))
    assert(lens.filter(col("d") =!= 1L).count() == 0,
      "a shard changed some document's length")
    // shards beyond 0 actually differ from the original text
    val s1 = ten.filter(col("doc_id") >= 1000000L && col("doc_id") < 2000000L)
      .select((col("doc_id") - 1000000L).as("doc_id"), col("text"))
    assert(s1.join(base, Seq("doc_id"))
      .filter(s1("text") === base("text")).count() < base.count(),
      "shard 1 is byte-identical to the original — permutation not applied")
  }

  test("embeddings10x: signed dim permutation preserves norms exactly") {
    val base = Tables.embeddings(spark, sf)
    val ten = ScaleRehearsal.embeddings10x(spark, sf)
    assert(ten.count() == 10 * base.count())
    // orthogonal transformation: per-vector L2 norm identical across
    // every shard (float arithmetic — the SAME terms are summed in a
    // permuted order, so compare rounded)
    val norm = expr("round(aggregate(embedding, 0D, " +
      "(a, v) -> a + cast(v as double) * cast(v as double)), 3)")
    val norms = ten.select((col("vec_id") % 1000000L).as("base_id"),
        norm.as("n2"))
      .groupBy(col("base_id")).agg(countDistinct(col("n2")).as("d"))
    assert(norms.filter(col("d") =!= 1L).count() == 0,
      "a shard changed some vector's norm — transformation not orthogonal")
  }
}
