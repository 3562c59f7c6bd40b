package graft.sources

/**
 * PostgreSQL-CDC source constraints (S8) that have no MySQL analog —
 * modeled from `실습수행/Debezium PostgreSQL CDC Source Connector
 * 실습.md`:
 *
 *  - REPLICA IDENTITY (`:339-353`): a published table with no PK
 *    rejects DELETE until `ALTER TABLE ... REPLICA IDENTITY FULL`; with
 *    FULL, the delete event's key/before-image is the whole row. The
 *    Engine enforces this at pipeline registration
 *    (`Engine.start`/`SourceSpec.replicaIdentityFull`); the helper here
 *    is the same rule for library callers.
 *  - publication.autocreate.mode (`:366-426`): `all_tables` creates/
 *    uses a publication covering everything, `filtered` creates one
 *    covering exactly `table.include.list`, `disabled` requires a
 *    pre-created publication and fails the connector otherwise.
 */
object PgCdc {

  /** The PG-side refusal, as a pure check: can this table emit deletes? */
  def validateDeletes(table: String, pkFields: Seq[String],
                      replicaIdentityFull: Boolean): Either[String, Unit] =
    if (pkFields.nonEmpty || replicaIdentityFull) Right(())
    else Left(
      s"cannot delete from table $table because it does not have a " +
        "replica identity and publishes deletes — run ALTER TABLE " +
        s"$table REPLICA IDENTITY FULL, or add a primary key")

  /** Key fields for a table's change events: the PK, or under REPLICA
   * IDENTITY FULL the entire row (Debezium keys key-less tables by the
   * full before-image). */
  def eventKeyFields(pkFields: Seq[String], allColumns: Seq[String],
                     replicaIdentityFull: Boolean): Seq[String] =
    if (pkFields.nonEmpty) pkFields
    else if (replicaIdentityFull) allColumns
    else Seq.empty

  sealed trait AutocreateMode
  case object AllTables extends AutocreateMode
  case object Filtered extends AutocreateMode
  case object Disabled extends AutocreateMode

  object AutocreateMode {
    def parse(s: String): AutocreateMode = s match {
      case "all_tables" => AllTables
      case "filtered" => Filtered
      case "disabled" => Disabled
      case other => throw new IllegalArgumentException(
        s"unknown publication.autocreate.mode '$other'")
    }
  }

  /** Resolve which tables the connector's publication covers.
   * `existing` = the already-created publication's table set (None when
   * no publication of that name exists in the database). */
  def resolvePublication(mode: AutocreateMode,
                         includeList: Seq[String],
                         allTables: Seq[String],
                         existing: Option[Seq[String]]): Either[String, Seq[String]] =
    mode match {
      case AllTables => Right(existing.getOrElse(allTables))
      case Filtered => Right(existing.getOrElse(includeList))
      case Disabled => existing.toRight(
        "publication.autocreate.mode=disabled requires a pre-created " +
          "publication (CREATE PUBLICATION ... FOR TABLE ...) — none found")
    }
}
