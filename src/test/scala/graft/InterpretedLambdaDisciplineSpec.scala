package graft

import org.apache.spark.sql.catalyst.expressions.LambdaFunction
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.functions._

/** VERDICT r15 #4: the interpreted-expression census, made CHECKABLE
  * (the GlobalWindowDisciplineSpec pattern, expression edition).
  * Higher-order-function lambdas NEVER reach codegen (the standing
  * round-2 rule) — on a corpus-scale hot path they cost an
  * interpreted eval per element per row (the pack8 measurement: the
  * gram-explode lambda was 4.2 s vs 0.33 s native at 10×). This spec
  * walks the OPTIMIZED logical plan of every registered query at
  * sf0.001 and fails on any LambdaFunction whose query is not in the
  * allowlist below — each entry carrying the boundedness/amortization
  * argument for why the lambda is acceptable.
  *
  * Round 16 removed the lambda from every UNJUSTIFIED path it found:
  * bigram/k-gram/window explodes → word_grams/word_grams_arr,
  * embedding integerization → scale_round, MinHash position match →
  * eq_count, banded Hamming → hamming_count, stopword count →
  * token_in_set_count, the avg-token-length fold → a length identity,
  * the q202 bigram transform → arrays_zip. */
class InterpretedLambdaDisciplineSpec extends SparkSpec {

  /** query id -> why its surviving lambda(s) are acceptable. */
  private val AllowlistSize = 5
  private val justifiedLambda: Map[String, String] = Map(
    "q26" -> ("array_funcs: the ARRAY-FUNCTION coverage demo — " +
      "exercising transform/filter/aggregate IS the query's purpose"),
    "q75" -> ("passage dedup: chunkCol's transform is one lambda eval " +
      "per w-token CHUNK (not per token), amortized over the row; the " +
      "sha2-keyed first-occurrence window downstream dominates " +
      "(Dedup.chunkCol documents the trade)"),
    "q174" -> ("SQ error audit: the per-element error composes TWO " +
      "roundings (µu and SQ code) and a squared-sum fold — audit " +
      "cadence (Layout.scala's q174 classification), 0.46 s at sf0.1; " +
      "a dedicated fused expression would be single-use"),
    "q183" -> ("CDC chunking: the rolling-hash cut finder is the " +
      "documented one-interpreted-HOF-pass audit (Layout.cdcChunks " +
      "scaladoc — 'audit cadence, like q174'); chunks are variable-" +
      "length substrings, not a fixed-gram shape word_grams covers"),
    "q207" -> ("BPE pair stats: the char-pair transform runs over the " +
      "VOCABULARY frame (31 distinct words in this corpus, vocab-" +
      "bounded at any corpus size after the word-frequency aggregate), " +
      "never the corpus"))

  private def lambdaCount(p: LogicalPlan): Int = {
    var n = 0
    p.foreach { node =>
      node.expressions.foreach(e =>
        e.foreach { case _: LambdaFunction => n += 1; case _ => () })
    }
    n
  }

  test("every interpreted HOF lambda in a registered query plan is allowlisted") {
    val offenders = scala.collection.mutable.ListBuffer[String]()
    val seen = scala.collection.mutable.Set[String]()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, f) =>
      val id = name.takeWhile(_ != '_')
      val n = lambdaCount(f(spark, sf).queryExecution.optimizedPlan)
      if (n > 0) {
        seen += id
        if (!justifiedLambda.contains(id))
          offenders += s"$name ($n lambda(s))"
      }
      graft.ops.Dedup.unpersistCaches()
    }
    assert(offenders.isEmpty,
      "queries with an interpreted HOF lambda and no documented" +
        s" justification: ${offenders.mkString(", ")} — use a native" +
        " expression (the pack8/word_grams/scale_round pattern) or add" +
        " an honest allowlist entry")
    val stale = (justifiedLambda.keySet -- seen).toSeq.sorted
    assert(stale.isEmpty,
      s"allowlist entries whose queries no longer have a lambda" +
        s" (remove them): ${stale.mkString(", ")}")
    assert(justifiedLambda.size === AllowlistSize,
      "the allowlist grew or shrank — recount, update AllowlistSize AND" +
        " the census prose above so they can't drift apart")
  }

  test("the detector is red on a planted interpreted lambda") {
    val planted = spark.range(10).toDF("x")
      .select(expr("transform(sequence(0, 3), i -> i + x)").as("a"))
    assert(lambdaCount(planted.queryExecution.optimizedPlan) > 0,
      "the detector failed to flag a textbook HOF lambda")
  }
}
