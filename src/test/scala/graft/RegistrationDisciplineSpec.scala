package graft

import org.scalatest.funsuite.AnyFunSuite

/** Structural guard against the snapshot-parking failure mode (q179/
  * q180 in round 8, q201/q202 in round 9): a query registered in
  * `SparkEntry.queries` without its oracle, SURVEY §2C row, PLANS.md
  * entry, or honest README count now fails the suite instead of
  * surfacing a round later in the judge's CORRECTNESS diff.
  *
  * Reads the docs from the repo root (sbt runs tests with the project
  * root as the working directory). Pure string checks — no Spark
  * session, so the spec costs nothing. */
class RegistrationDisciplineSpec extends AnyFunSuite {

  private def read(p: String): String = {
    val f = new java.io.File(p)
    assert(f.isFile, s"$p must exist at the repo root")
    val src = scala.io.Source.fromFile(f, "UTF-8")
    try src.mkString finally src.close()
  }

  /** Queries whose semantics cannot be expressed in DuckDB SQL would
    * go here with a one-line justification each. Currently empty —
    * every registered query is oracle-checked. */
  private val oracleExempt: Set[String] = Set.empty

  /** PLANS.md documents every query from the round-4 wave onward
    * (q142+) individually; earlier queries are covered by §2C rows
    * plus the headline-plans section. */
  private val plansDocumentedFrom = 142

  private def qNum(key: String): Int =
    key.drop(1).takeWhile(_.isDigit).toInt

  test("every query key has an oracleSql entry or an explicit exemption") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    val missing = (q -- o -- oracleExempt).toSeq.sorted
    assert(missing.isEmpty,
      s"registered without an oracle or exemption: ${missing.mkString(", ")}")
    val orphaned = (o -- q).toSeq.sorted
    assert(orphaned.isEmpty,
      s"oracleSql entries with no registered query: ${orphaned.mkString(", ")}")
  }

  test("every query id appears in SURVEY.md's coverage map") {
    val survey = read("SURVEY.md")
    val missing = SparkEntry.queries.keySet.toSeq.sorted.filter { k =>
      val id = k.takeWhile(_ != '_') // e.g. "q201"
      // \b keeps q20 from matching inside q200
      !s"\\b$id\\b".r.findFirstIn(survey).isDefined
    }
    assert(missing.isEmpty,
      s"queries with no SURVEY.md citation: ${missing.mkString(", ")}")
  }

  test(s"every query from q$plansDocumentedFrom on has a PLANS.md entry") {
    val plans = read("PLANS.md")
    // entries appear as "## qNNN_name" plan sections or "**qNNN_name**"
    // prose bullets — either form counts, so check the full key
    val missing = SparkEntry.queries.keySet.toSeq.sorted
      .filter(k => qNum(k) >= plansDocumentedFrom)
      .filterNot(plans.contains)
    assert(missing.isEmpty,
      s"queries with no PLANS.md entry: ${missing.mkString(", ")}")
  }

  test("README.md's registered-query count matches SparkEntry") {
    val readme = read("README.md")
    val m = "(\\d+) named queries".r.findFirstMatchIn(readme)
    assert(m.isDefined, "README.md must state '<N> named queries'")
    assert(m.get.group(1).toInt == SparkEntry.queries.size,
      s"README claims ${m.get.group(1)} queries; SparkEntry registers " +
        s"${SparkEntry.queries.size} — update README.md")
  }
}
