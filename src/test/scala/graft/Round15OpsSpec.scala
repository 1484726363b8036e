package graft

import graft.ops.Dedup

/** Round-15 additions, led by the ADVICE r14 fixes: one normalized
  * tri-state parse of graft.setsim.packedVerify shared by all four
  * verify sites, and the bucket-count-carrying index digest. */
class Round15OpsSpec extends SparkSpec {

  test("packedVerify conf parses identically across families (ADVICE r14)") {
    // Pre-fix, the incremental path matched the exact strings
    // "true"/"false" while the fresh/containment paths used toBoolean:
    // "TRUE" pinned packed in one family and silently meant AUTO in
    // another. The shared parser is tri-state and case/space-blind,
    // and rejects non-boolean spellings loudly instead of diverging.
    val key = "graft.setsim.packedVerify"
    def parsed(v: Option[String]): Option[Boolean] = {
      v match {
        case Some(x) => spark.conf.set(key, x)
        case None => spark.conf.unset(key)
      }
      try Dedup.packedVerifyConf(spark) finally spark.conf.unset(key)
    }
    assert(parsed(None).isEmpty, "unset must mean AUTO")
    assert(parsed(Some("true")).contains(true))
    assert(parsed(Some("TRUE")).contains(true),
      "case-insensitive spelling must pin the same plan everywhere")
    assert(parsed(Some(" False ")).contains(false),
      "whitespace must not change the verdict")
    val e = intercept[IllegalArgumentException](parsed(Some("1")))
    assert(e.getMessage.contains("packedVerify"),
      s"non-boolean spellings must fail loudly, got: ${e.getMessage}")
  }

  test("bpe_encode kernel dispatch is readable and trainer tables take the rank kernel (VERDICT r14 #5)") {
    import graft.ops.BpeIterative
    // a genuinely trained table (exhaustion on the corpus vocab) must
    // dispatch the rank-order kernel — the suite-level tripwire for a
    // trainer change that silently demotes encode to the sequential
    // sweep (the rehearsal asserts the same at the 32k/10× scale)
    val counts = Tables.documents(spark, sf)
      .select(org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.split(
          org.apache.spark.sql.functions.col("text"), " ")).as("w"))
      .filter("length(w) >= 1")
      .groupBy("w").count()
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val t = BpeIterative.trainInMemory(spark, counts, 10000, 16)
    assert(t.merges.nonEmpty, "training produced no rules")
    val rules = t.merges.map { case (a, b, _) => (a, b) }
    assert(BpeIterative.encodeKernelOf(rules) == "rank",
      "a trained table no longer satisfies byRankSafe")
    // an ill-formed table (side token never created at a lower rank)
    // must dispatch the sequential fallback
    val unsafe = ("\u0001", "\u0001\u0001") +: rules
    assert(BpeIterative.encodeKernelOf(unsafe) == "sequential",
      "the unsafe-table fallback detection broke")
  }

  test("phash byte gate: maxExchangeBytes fires like the slots gate, one budget unit across families (VERDICT r14 #3)") {
    // planted −1 budget (the Round14OpsSpec convention): any estimate
    // ≥ 0 exceeds it, so the gate MUST fire whatever the corpus — a
    // testdata regen can't make this vacuous.
    import graft.multimodal.Multimodal
    try {
      spark.conf.set("graft.phash.maxExchangeBytes", "-1")
      val e = intercept[IllegalStateException](
        Multimodal.phashDedup(spark, sf).head())
      assert(e.getMessage.contains("phashDedup pre-flight"))
      assert(e.getMessage.contains("exchange bytes"),
        s"byte estimate missing from the refusal: ${e.getMessage}")
      assert(e.getMessage.contains("graft.phash.maxExchangeBytes=-1"),
        s"the violated budget must be named: ${e.getMessage}")
      spark.conf.unset("graft.phash.maxExchangeBytes")
      Dedup.unpersistCaches()
      // unset costs nothing and the join proceeds
      assert(Multimodal.phashDedup(spark, sf).count() >= 0L)
    } finally {
      spark.conf.unset("graft.phash.maxExchangeBytes")
      Dedup.unpersistCaches()
    }
  }
}
