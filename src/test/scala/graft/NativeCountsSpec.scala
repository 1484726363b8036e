package graft

import org.apache.spark.sql.functions._

/** r16 census: the three native counting kernels must be BIT-IDENTICAL
  * to the interpreted lambda pipelines they replaced —
  * eq_count == size(filter(zip_with(a,b,(x,y)->x=y), v->v)) (q41's
  * estimate prune, q192's audit), hamming_count ==
  * aggregate(zip_with(a,b,(x,y)->bit_count(x^y)), 0, +) (q203/q204's
  * verify), token_in_set_count == size(filter(split(text,' '),
  * tk -> tk IN set)) (the q35 stopword count shared by every
  * quality-gated query), plus the avg_token_len identity
  * Σ token lengths = length(text) − (n_tokens − 1). */
class NativeCountsSpec extends SparkSpec {
  import spark.implicits._

  test("eq_count matches the zip_with/filter form incl. length/null edges") {
    graft.functions.GraftFunctions.register(spark)
    val rows = Seq(
      (Array(1L, 2L, 3L), Array(1L, 9L, 3L)),
      (Array(1L, 2L), Array(1L, 2L, 3L)),       // length mismatch
      (Array[Long](), Array(1L)),               // empty side
      (Array(5L), Array(5L))).toDF("a", "b")
    val d = rows.select(
        expr("size(filter(zip_with(a, b, (x, y) -> x = y), v -> v))").as("o"),
        expr("eq_count(a, b)").as("n"))
      .filter(not(col("o") <=> col("n"))).count()
    assert(d == 0L)
    // null elements: dropped by filter(v -> v), skipped by eq_count
    val withNull = Seq((Array[java.lang.Long](1L, null, 3L),
      Array[java.lang.Long](1L, null, 3L))).toDF("a", "b")
    val r = withNull.select(
      expr("size(filter(zip_with(a, b, (x, y) -> x = y), v -> v))"),
      expr("eq_count(a, b)")).head()
    assert(r.getInt(0) == r.getInt(1))
  }

  test("hamming_count matches the aggregate/zip_with fold incl. null edges") {
    graft.functions.GraftFunctions.register(spark)
    val rows = Seq(
      (Array(0L, -1L, 0x0f0fL), Array(-1L, -1L, 0L)),
      (Array(1L, 2L), Array(1L, 2L, 3L)),       // mismatch -> NULL fold
      (Array[Long](), Array[Long]()),
      (Array(Long.MinValue), Array(Long.MaxValue))).toDF("a", "b")
    val d = rows.select(
        expr("cast(aggregate(zip_with(a, b, (x, y) -> bit_count(x ^ y))," +
          " 0, (acc, v) -> acc + v) as bigint)").as("o"),
        expr("hamming_count(a, b)").as("n"))
      .filter(not(col("o") <=> col("n"))).count()
    assert(d == 0L)
    // the q203 band arrays are array<int> — 32-bit xor semantics
    val intRows = Seq(
      (Array(0, -1, 0x0f0f), Array(-1, -1, 0)),
      (Array(Int.MinValue), Array(Int.MaxValue))).toDF("a", "b")
    val di = intRows.select(
        expr("cast(aggregate(zip_with(a, b, (x, y) -> bit_count(x ^ y))," +
          " 0, (acc, v) -> acc + v) as bigint)").as("o"),
        expr("hamming_count(a, b)").as("n"))
      .filter(not(col("o") <=> col("n"))).count()
    assert(di == 0L)
  }

  test("token_in_set_count matches size(filter(split, isin)) on edges + corpus") {
    graft.functions.GraftFunctions.register(spark)
    val texts = Seq("", " ", "the", "the the the", "a the  of", "athe the",
      "to", " to ", "xx yy", "the quick a of and to to").toDF("text")
    def oldC = size(filter(split(col("text"), " "),
      tk => tk.isin("the", "a", "and", "of", "to")))
    def newC = expr(
      "token_in_set_count(text, array('the', 'a', 'and', 'of', 'to'))")
    val d = texts.select(oldC.as("o"), newC.as("n"))
      .filter(not(col("o") <=> col("n"))).count()
    assert(d == 0L)
    val docs = Tables.documents(spark, sf)
    val dc = docs.select(oldC.as("o"), newC.as("n"))
      .filter(not(col("o") <=> col("n"))).count()
    assert(dc == 0L)
  }

  test("avg_token_len identity: sum of token lengths == length - (n_tokens - 1)") {
    val texts = Seq("", " ", "a", "a b", "a  b", "ab cde f",
      "café naïve Ж中", "trailing ").toDF("text")
    val d = texts.select(
        expr("aggregate(transform(split(text, ' '), x -> length(x))," +
          " 0, (acc, v) -> acc + v)").as("o"),
        (length(col("text")) - (size(split(col("text"), " ")) - lit(1)))
          .as("n"))
      .filter(not(col("o") <=> col("n"))).count()
    assert(d == 0L)
    val docs = Tables.documents(spark, sf)
    val dc = docs.select(
        expr("aggregate(transform(split(text, ' '), x -> length(x))," +
          " 0, (acc, v) -> acc + v)").as("o"),
        (length(col("text")) - (size(split(col("text"), " ")) - lit(1)))
          .as("n"))
      .filter(not(col("o") <=> col("n"))).count()
    assert(dc == 0L)
  }
}
