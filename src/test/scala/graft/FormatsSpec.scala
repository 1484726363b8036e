package graft

import java.nio.file.Files
import graft.sources.Formats
import org.apache.spark.sql.functions._

/** Source-format breadth: every interchange format must round-trip the
  * corpus with no row or value drift vs the parquet original —
  * including CSV's delimiter/quote/newline escaping. */
class FormatsSpec extends SparkSpec {
  import spark.implicits._

  test("json/csv/orc round-trip the documents table identically") {
    val docs = Tables.documents(spark, sf)
    Formats.Supported.foreach { fmt =>
      val dir = Files.createTempDirectory(s"graft_fmt_$fmt").toString
      Formats.writeAs(docs, dir, fmt)
      val back = Formats.readAs(spark, dir, fmt, docs.schema)
      assert(back.count() == docs.count(), s"$fmt row drift")
      assert(docs.exceptAll(back).isEmpty && back.exceptAll(docs).isEmpty,
        s"$fmt value drift")
    }
  }

  test("csv round-trips delimiters, quotes, newlines, and empty-vs-null") {
    val tricky = Seq(
      (1L, Option("plain text")),
      (2L, Option("comma, separated, values")),
      (3L, Option("a \"quoted\" phrase")),
      (4L, Option("line one\nline two")),
      (5L, Option("")),
      (6L, None: Option[String]))
      .toDF("doc_id", "text")
    val dir = Files.createTempDirectory("graft_fmt_tricky").toString
    Formats.writeAs(tricky, dir, "csv")
    // multiLine opt-in: row 4 embeds a newline
    val back = Formats.readAs(spark, dir, "csv", tricky.schema,
        multiLine = true)
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(back(2L) == Option("comma, separated, values"))
    assert(back(3L) == Option("a \"quoted\" phrase"))
    assert(back(4L) == Option("line one\nline two"))
    // empty string and NULL stay distinguishable
    assert(back(5L) == Option(""))
    assert(back(6L).isEmpty)
  }

  test("ORC scans get predicate pushdown like parquet") {
    val dir = Files.createTempDirectory("graft_fmt_orc").toString
    Formats.writeAs(Tables.orders(spark, sf), dir, "orc")
    val filtered = Formats.readAs(spark, dir, "orc",
        Tables.orders(spark, sf).schema)
      .filter(col("o_orderkey") < 100).select("o_orderkey")
    val plan = filtered.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("PushedFilters") && plan.contains("LessThan"),
      s"ORC filter not pushed:\n${plan.take(600)}")
    assert(filtered.count() > 0)
  }
}
