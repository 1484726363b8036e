package graft.meta

import org.apache.spark.sql.types.{DataType, StructField, StructType}

/** Out-of-band table metadata the DataFrame world cannot carry
  * (SURVEY.md §1): primary keys, unique/check constraints, foreign
  * keys, and serial-sequence ownership. The reference keeps all of
  * this inside SQLAlchemy's reflected `Table` objects
  * (transfer_data_with_constraints_script.py:79-91); here it is an
  * explicit case-class model so DDL generation, the two-phase FK pass,
  * and sequence sync are pure functions over it.
  */
final case class ColumnMeta(
    name: String,
    dataType: DataType,
    nullable: Boolean,
    /** BIGSERIAL/SERIAL ownership (event-table.sql:6) — implies an
      * owned sequence that SequenceSync must reset after load. */
    serial: Boolean = false,
    /** raw SQL default expression, e.g. "FALSE" (event-table.sql:17) */
    default: Option[String] = None,
    /** the source database's own rendered type (e.g. "JSONB",
      * "VARCHAR(255)"), captured at reflection so DDL can clone the
      * exact source type like the reference's column.copy()
      * (transfer_data_script.py:59-64) — without it JSONB silently
      * downgrades to TEXT through the Spark-type round trip. */
    sourceTypeName: Option[String] = None) {
  def toField: StructField = StructField(name, dataType, nullable)
}

/** ON DELETE / ON UPDATE actions mirror event-table.sql:25-32
  * (SET NULL / CASCADE). */
final case class ForeignKey(
    name: String,
    columns: Seq[String],
    refTable: String,
    refColumns: Seq[String],
    onDelete: Option[String] = None,
    onUpdate: Option[String] = None)

final case class CheckConstraint(name: String, expression: String)

final case class TableMeta(
    schema: Option[String],
    name: String,
    columns: Seq[ColumnMeta],
    primaryKey: Seq[String] = Nil,
    uniques: Seq[(String, Seq[String])] = Nil,
    checks: Seq[CheckConstraint] = Nil,
    foreignKeys: Seq[ForeignKey] = Nil) {

  /** schema-qualified name, the exclusion-list key. The reference
    * checks exclusion against the qualified name but writes the bare
    * name (transfer_data_script.py:46,57) — we keep both explicit. */
  def qualifiedName: String = schema.fold(name)(s => s"$s.$name")

  def structType: StructType = StructType(columns.map(_.toField))

  def serialColumns: Seq[ColumnMeta] = columns.filter(_.serial)
}
