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
}
