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

/** Typed accessor over the `STREAMCONTEXT__SPEC` JSON — the framework
  * half of the reference's plugin-context deserialization
  * (StreamContext.cs:45-53): concrete stream specs pick their fields
  * through this, with the reference's two custom codecs reproduced —
  * unix-epoch-seconds timestamps (Configuration/UnixTimeConverter.cs:12-22)
  * and integer-seconds durations (SecondsToTimeSpanConverter.cs:12-21).
  */
final class StreamSpec private (root: com.fasterxml.jackson.databind.JsonNode) {

  private def node(path: String): com.fasterxml.jackson.databind.JsonNode =
    path.split('.').foldLeft(root)((n, k) => n.path(k))

  def string(path: String): Option[String] = {
    val n = node(path)
    if (n.isMissingNode || n.isNull) None else Some(n.asText())
  }

  def long(path: String): Option[Long] = {
    val n = node(path)
    if (n.isNumber) Some(n.asLong())
    else if (n.isTextual) n.asText().toLongOption
    else None
  }

  def boolean(path: String): Option[Boolean] = {
    val n = node(path)
    if (n.isBoolean) Some(n.asBoolean()) else None
  }

  /** Unix-epoch-seconds field → Instant (UnixTimeConverter parity). */
  def unixTime(path: String): Option[java.time.Instant] =
    long(path).map(java.time.Instant.ofEpochSecond)

  /** Integer-seconds field → Duration (SecondsToTimeSpanConverter
    * parity; the reference encodes every interval this way). */
  def secondsDuration(path: String): Option[java.time.Duration] =
    long(path).map(java.time.Duration.ofSeconds)

  /** List-valued field: a JSON array of strings, or — because the spec
    * docs describe fields like `qualityStopwords` as a "comma list" — a
    * single textual node split on commas (trimmed, empties dropped). A
    * textual `"the,a,of"` and an array `["the","a","of"]` are
    * equivalent; any other node type is an absent list. */
  def stringList(path: String): Seq[String] = {
    val n = node(path)
    if (n.isArray) {
      val b = Vector.newBuilder[String]
      n.forEach(e => b += e.asText())
      b.result()
    } else if (n.isTextual) {
      n.asText().split(',').iterator.map(_.trim).filter(_.nonEmpty).toVector
    } else Nil
  }
}

object StreamSpec {
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** Parse the raw spec JSON; malformed input fails loudly (the
    * operator misconfigured the stream — FATAL territory, not a default). */
  def parse(specJson: String): StreamSpec = {
    val root = mapper.readTree(specJson)
    if (root == null || !root.isObject)
      throw new IllegalArgumentException(s"STREAMCONTEXT spec is not a JSON object: $specJson")
    new StreamSpec(root)
  }

  def fromContext(ctx: StreamContext): StreamSpec = parse(ctx.spec)
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
