package graft.pg

import graft.meta.TableMeta
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{coalesce, lit, max}

/** Serial-sequence synchronization (reference op R10).
  *
  * The reference does this entirely server-side in PL/pgSQL loops over
  * pg_tables (after-running-script.sql:1-126). Engine form: compute
  * MAX(id) with a Spark aggregate (pushed down to the source when the
  * source is JDBC), then emit one setval statement per serial column.
  * The empty-table edge case uses the COALESCE(max,0)+1,false form the
  * reference's hardened third block adopts
  * (after-running-script.sql:99-103) — plain setval(seq, 0) would throw
  * because 0 is below the sequence minimum.
  */
object SequenceSync {

  /** MAX of a serial column; -1 sentinel when the table is empty. */
  def maxId(df: DataFrame, column: String): Long =
    df.agg(coalesce(max(df(column)).cast("long"), lit(-1L)))
      .head().getLong(0)

  /** The setval statement for one serial column. Mirrors
    * after-running-script.sql:99-103: for an empty table, set the
    * sequence to 1 with is_called=false so nextval yields 1. */
  def setvalSql(t: TableMeta, column: String, maxVal: Long): String = {
    val qualified = t.schema.fold(PgDdl.quote(t.name))(s =>
      s"${PgDdl.quote(s)}.${PgDdl.quote(t.name)}")
    // the identifiers are embedded in SQL STRING literals here — escape
    // apostrophes or a table named o'brien breaks the statement
    def sq(s: String) = s.replace("'", "''")
    val seq = s"pg_get_serial_sequence('${sq(qualified)}', '${sq(column)}')"
    if (maxVal >= 1) s"SELECT setval($seq, $maxVal, true)"
    else s"SELECT setval($seq, 1, false)"
  }

  /** All setval statements for a loaded table. */
  def syncStatements(t: TableMeta, df: DataFrame): Seq[String] =
    t.serialColumns.map(c => setvalSql(t, c.name, maxId(df, c.name)))
}
