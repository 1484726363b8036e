package graft

import graft.meta._
import graft.pg.{PgCatalog, PgDdl, SequenceSync}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class PgDdlSpec extends AnyFunSuite {
  private val t = Fixtures.analyticsEvent

  test("createTable maps the full §1 type surface and quotes identifiers") {
    val ddl = PgDdl.createTable(t)
    assert(ddl.startsWith("CREATE TABLE IF NOT EXISTS \"public\".\"analytics_analyticsevent\""))
    assert(ddl.contains("\"id\" BIGSERIAL NOT NULL"))
    assert(ddl.contains("\"created\" TIMESTAMPTZ NOT NULL"))
    assert(ddl.contains("\"name\" VARCHAR(255) NOT NULL"))
    assert(ddl.contains("\"identify\" TEXT"))
    assert(ddl.contains("\"synced_with_posthog\" BOOLEAN NOT NULL DEFAULT FALSE"))
    assert(ddl.contains("PRIMARY KEY (\"id\")"))
    // phase 1 must NOT contain FKs (two-phase topology)
    assert(!ddl.contains("FOREIGN KEY"))
  }

  test("addForeignKeys emits the deferred phase-3 ALTERs with actions") {
    val fks = PgDdl.addForeignKeys(t)
    assert(fks.length == 3)
    assert(fks.head ==
      "ALTER TABLE \"public\".\"analytics_analyticsevent\" ADD CONSTRAINT " +
        "\"analytics_event_org_fk\" FOREIGN KEY (\"organization_id\") " +
        "REFERENCES \"public\".\"organization\" (\"id\") ON DELETE SET NULL")
    assert(fks(2).contains("ON DELETE CASCADE"))
  }

  test("identifier quoting survives embedded quotes and dashes") {
    assert(PgDdl.quote("fde-local") == "\"fde-local\"")
    assert(PgDdl.quote("a\"b") == "\"a\"\"b\"")
  }

  test("array and decimal type mapping") {
    assert(PgDdl.pgType(ColumnMeta("x", ArrayType(FloatType), true)) == "REAL[]")
    assert(PgDdl.pgType(ColumnMeta("x", DecimalType(12, 2), true)) == "NUMERIC(12,2)")
  }

  test("source type fidelity: JSONB and VARCHAR(255) clone exactly") {
    import java.sql.Types
    // reflection renders the source's own type text
    assert(PgCatalog.renderSourceType("jsonb", Types.OTHER, 0, 0) == Some("jsonb"))
    assert(PgCatalog.renderSourceType("VARCHAR", Types.VARCHAR, 255, 0) == Some("VARCHAR(255)"))
    assert(PgCatalog.renderSourceType("NUMERIC", Types.NUMERIC, 12, 2) == Some("NUMERIC(12,2)"))
    // composite names pass through unmangled (Derby binary types)
    assert(PgCatalog.renderSourceType("VARCHAR () FOR BIT DATA", Types.VARBINARY, 64, 0) ==
      Some("VARCHAR () FOR BIT DATA"))
    // DDL prefers the source type: JSONB no longer downgrades to TEXT
    assert(PgDdl.pgType(ColumnMeta("props", StringType, true,
      sourceTypeName = Some("JSONB"))) == "JSONB")
    assert(PgDdl.pgType(ColumnMeta("name", StringType, false,
      sourceTypeName = Some("VARCHAR(255)"))) == "VARCHAR(255)")
    // serial semantics win over the raw source name
    assert(PgDdl.pgType(ColumnMeta("id", LongType, false, serial = true,
      sourceTypeName = Some("bigserial"))) == "BIGSERIAL")
    // absent source type falls back to the §1 inverse mapping
    assert(PgDdl.pgType(ColumnMeta("x", StringType, true)) == "TEXT")
  }

  test("Derby reflection captures source types and DDL round-trips them") {
    val conn = java.sql.DriverManager.getConnection(
      "jdbc:derby:memory:ddlfidelity;create=true")
    try {
      conn.createStatement().execute(
        "CREATE TABLE typed_t (name VARCHAR(255) NOT NULL, amt DECIMAL(12,2), note CLOB)")
      val meta = PgCatalog.tableMeta(conn, None, "TYPED_T")
      val byName = meta.columns.map(c => c.name -> c.sourceTypeName).toMap
      assert(byName("NAME") == Some("VARCHAR(255)"))
      assert(byName("AMT") == Some("DECIMAL(12,2)"))
      val ddl = PgDdl.createTable(meta)
      assert(ddl.contains("\"NAME\" VARCHAR(255) NOT NULL"))
      assert(ddl.contains("\"AMT\" DECIMAL(12,2)"))
      // Derby's CLOB is not valid PG DDL — falls back to the inverse
      // mapping instead of cloning an unexecutable type
      assert(ddl.contains("\"NOTE\" TEXT"))
    } finally conn.close()
  }

  test("non-PG source types fall back to the inverse mapping") {
    assert(PgDdl.pgType(ColumnMeta("x", StringType, true,
      sourceTypeName = Some("CLOB"))) == "TEXT")
    assert(PgDdl.pgType(ColumnMeta("x", DoubleType, true,
      sourceTypeName = Some("DOUBLE"))) == "DOUBLE PRECISION")
    assert(PgDdl.pgType(ColumnMeta("x", BinaryType, true,
      sourceTypeName = Some("VARCHAR () FOR BIT DATA"))) == "BYTEA")
    // pg's own aliases still clone verbatim
    assert(PgDdl.pgType(ColumnMeta("x", LongType, false,
      sourceTypeName = Some("int8"))) == "int8")
    // pg reflects user-defined/extension types in lowercase — those
    // clone too (enums, hstore, vector), preserving pg->pg fidelity
    assert(PgDdl.pgType(ColumnMeta("x", StringType, true,
      sourceTypeName = Some("mood"))) == "mood")
    assert(PgDdl.pgType(ColumnMeta("x", StringType, true,
      sourceTypeName = Some("hstore"))) == "hstore")
  }

  test("schemaDiff surfaces adds/removes/type/nullability/serial drift") {
    import graft.ops.Audit
    import org.apache.spark.sql.types.{IntegerType, LongType}
    val old = t
    val neu = t.copy(columns = t.columns.flatMap {
      case c if c.name == "identify" => None // removed
      case c if c.name == "name" =>          // widened type
        Some(c.copy(sourceTypeName = Some("TEXT"), dataType = StringType))
      case c if c.name == "synced_with_posthog" => // tightened null
        Some(c.copy(nullable = !c.nullable))
      case c => Some(c)
    } :+ ColumnMeta("added_col", IntegerType, nullable = true,
      sourceTypeName = Some("INTEGER")))
    val diff = Audit.schemaDiff(old, neu)
    val byCol = diff.groupBy(_.column)
    assert(byCol("added_col").map(_.change) == Seq("added"))
    assert(byCol("identify").map(_.change) == Seq("removed"))
    assert(byCol("name").map(_.change) == Seq("type_changed"))
    assert(byCol("synced_with_posthog").map(_.change)
      == Seq("nullability_changed"))
    // no drift -> empty report (the common case must stay silent)
    assert(Audit.schemaDiff(old, old).isEmpty)
  }

  test("setval uses COALESCE-hardened empty-table form") {
    // loaded table: setval(max, true)
    assert(SequenceSync.setvalSql(t, "id", 42L) ==
      "SELECT setval(pg_get_serial_sequence('\"public\".\"analytics_analyticsevent\"', 'id'), 42, true)")
    // empty table: is_called=false so nextval yields 1
    assert(SequenceSync.setvalSql(t, "id", -1L).endsWith(", 1, false)"))
  }
}
