package graft.model

/** Core constants of the engine's data contract.
  *
  * Mirrors the reference's synthetic-column contract
  * (reference: src/Sinks/Parquet/Models/Constants.cs:11-21): every
  * upsert-capable source appends a deterministic merge key and,
  * optionally, a date-partition column so a downstream merge job can
  * apply changes idempotently.
  */
object Constants {
  /** SHA-256 (lower hex) of '#'-joined primary-key values. */
  val MergeKeyColumn = "ARCANE_MERGE_KEY"
  /** Arbitrary date-partition expression result. */
  val DatePartitionKeyColumn = "DATE_PARTITION_KEY"
  /** Change-tracking metadata columns (reference:
    * src/Sources/SqlServer/SqlServerChangeTrackingSource.cs:321-349). */
  val ChangeVersionColumn = "SYS_CHANGE_VERSION"
  val ChangeOperationColumn = "SYS_CHANGE_OPERATION"
  val ChangeTrackingVersionColumn = "ChangeTrackingVersion"
  /** Name of the upload marker dropped on graceful completion
    * (reference: src/Sinks/Parquet/ParquetSink.cs:244-261). */
  def completedTokenFile(schemaHash: String): String = s"$schemaHash.COMPLETED"
}

/** Exit-code contract with the orchestrating operator
  * (reference: src/Contracts/Constants.cs:9-25).
  */
object ExitCodes {
  /** Stream finished (or schema mismatch handled — operator restarts in
    * backfill mode). */
  val Success = 0
  /** Unrecoverable failure; operator increments the retry counter. */
  val Fatal = 1
  /** Transient failure/interruption; operator restarts without counting. */
  val Restart = 2
}

/** Schema-related failure taxonomy
  * (reference: src/Exceptions — SchemaMismatchException,
  * SchemaInconsistentException, SchemaNotFoundException).
  */
class SchemaMismatchException(msg: String) extends RuntimeException(msg)
class SchemaInconsistentException(msg: String) extends RuntimeException(msg)
class SchemaNotFoundException(msg: String) extends RuntimeException(msg)

/** Identity + mode of a running stream, deserialized from environment
  * variables by the hosting operator
  * (reference: src/Providers/StreamContext.cs:45-53,81-88;
  * env contract STREAMCONTEXT__SPEC / __BACKFILL / __STREAM_ID /
  * __STREAM_KIND).
  *
  * @param streamId   unique id of this stream instance
  * @param streamKind source kind discriminator (e.g. "cdm", "rest")
  * @param isBackfilling true ⇒ full reload (Trigger.AvailableNow),
  *                      false ⇒ incremental (Trigger.ProcessingTime)
  * @param spec       raw JSON spec for the concrete source/sink pair
  */
final case class StreamContext(
    streamId: String,
    streamKind: String,
    isBackfilling: Boolean,
    spec: String)

object StreamContext {
  val SpecVar = "STREAMCONTEXT__SPEC"
  val BackfillVar = "STREAMCONTEXT__BACKFILL"
  val StreamIdVar = "STREAMCONTEXT__STREAM_ID"
  val StreamKindVar = "STREAMCONTEXT__STREAM_KIND"

  /** Build a context from an environment map (pass `sys.env`). */
  def fromEnvironment(env: Map[String, String]): StreamContext =
    StreamContext(
      streamId = env.getOrElse(StreamIdVar, "local"),
      streamKind = env.getOrElse(StreamKindVar, "unknown"),
      isBackfilling =
        env.get(BackfillVar).exists(_.equalsIgnoreCase("true")),
      spec = env.getOrElse(SpecVar, "{}"))
}

/** Partition advertisement written to `metadata/v0/partitions.json` for
  * downstream consumers (reference:
  * src/Sinks/Services/StreamMetadata/V1/PartitionsWriter.cs:14-48;
  * model src/Sinks/Models/StreamMetadata.cs:10-47).
  */
final case class StreamPartition(
    fieldName: String,
    fieldFormat: String,
    fieldExpression: String,
    isDatePartition: Boolean) {
  def toJson: String = {
    def q(s: String) = "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    } + "\""
    s"""{"field_name":${q(fieldName)},"field_format":${q(fieldFormat)},""" +
      s""""field_expression":${q(fieldExpression)},""" +
      s""""is_date_partition":$isDatePartition}"""
  }
}
