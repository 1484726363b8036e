package graft

import graft.meta._
import org.apache.spark.sql.types._

/** Golden fixture: the reference's canonical wide-typed table
  * `analytics_analyticsevent` (event-table.sql:5-19; FIXTURES.md §A). */
object Fixtures {
  val analyticsEvent: TableMeta = TableMeta(
    schema = Some("public"),
    name = "analytics_analyticsevent",
    columns = Seq(
      ColumnMeta("id", LongType, nullable = false, serial = true),
      ColumnMeta("created", TimestampType, nullable = false),
      ColumnMeta("modified", TimestampType, nullable = false),
      ColumnMeta("name", VarcharType(255), nullable = false),
      ColumnMeta("sent_at", TimestampType, nullable = false),
      ColumnMeta("organization_id", LongType, nullable = true),
      ColumnMeta("school_id", LongType, nullable = true),
      ColumnMeta("user_id", LongType, nullable = false),
      ColumnMeta("user_ip", VarcharType(255), nullable = true),
      ColumnMeta("identify", StringType, nullable = true),   // JSONB
      ColumnMeta("properties", StringType, nullable = true), // JSONB
      ColumnMeta("synced_with_posthog", BooleanType, nullable = false,
        default = Some("FALSE")),
      ColumnMeta("last_local_modified_at", TimestampType, nullable = true)),
    primaryKey = Seq("id"),
    foreignKeys = Seq(
      ForeignKey("analytics_event_org_fk", Seq("organization_id"),
        "public.organization", Seq("id"), onDelete = Some("SET NULL")),
      ForeignKey("analytics_event_school_fk", Seq("school_id"),
        "public.school", Seq("id"), onDelete = Some("SET NULL")),
      ForeignKey("analytics_event_user_fk", Seq("user_id"),
        "public.auth_user", Seq("id"), onDelete = Some("CASCADE"))))
}
