package graft.sinks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.Row

import graft.model.StreamPartition
import graft.schema.SchemaOps

/** Configuration shared by the arcane-layout sinks.
  *
  * @param targetPath          sink root (blob container path in prod)
  * @param createSchemaFile    publish `schema/schema-*.parquet` on start
  * @param batchDatePartition  add `_batch_date=yyyy-MM-dd` path partitioning
  * @param partitions          advertised partition metadata
  * @param maxRecordsPerFile   bounds part-file size (the reference's
  *                            `rowGroupsPerFile` analogue); 0 = Spark default
  */
final case class SinkConfig(
    targetPath: String,
    createSchemaFile: Boolean = true,
    batchDatePartition: Boolean = false,
    partitions: Seq[StreamPartition] = Nil,
    maxRecordsPerFile: Long = 0L)

/** Streaming/batch sink writing the reference's Parquet blob layout
  * (reference: src/Sinks/Parquet/ParquetSink.cs; SURVEY.md §2.2 K1).
  *
  * Batch mode writes one data batch; streaming mode attaches a
  * `foreachBatch` writer. The COMPLETED token is NOT written here —
  * [[graft.runtime.StreamRunner]] drops it on graceful completion only,
  * preserving the reference's invariant that an interrupted or failed
  * stream never publishes a token (ParquetSink.cs:246-250).
  */
class ArcaneParquetSink(config: SinkConfig, format: String = "parquet") {

  @volatile private var initialized = false
  @volatile private var schemaHashValue: Option[String] = None
  @volatile private var frozenSchema: Option[org.apache.spark.sql.types.StructType] = None

  def schemaHash: Option[String] = schemaHashValue

  /** Idempotent start-of-stream publication: schema file + partition
    * metadata (reference writes these before the first data batch).
    * The first batch's schema is FROZEN — later batches must match it
    * structurally (the reference's silently-interposed validation flow,
    * SchemaBoundSink.cs:25-26 + FastParquetSchemaValidator.cs:13-47:
    * a mid-stream shape change is a SchemaInconsistentException ⇒ exit
    * RESTART). */
  def initialize(df: DataFrame): Unit = synchronized {
    if (!initialized) {
      schemaHashValue = Some(
        if (config.createSchemaFile) ArcaneLayout.writeSchemaFile(df, config.targetPath)
        else SchemaOps.shortFingerprint(df.schema))
      ArcaneLayout.writePartitionsMetadata(df, config.targetPath, config.partitions)
      frozenSchema = Some(df.schema)
      initialized = true
    }
  }

  /** Write one micro-batch (or one batch-mode DataFrame). */
  def writeBatch(df: DataFrame): Seq[String] = {
    initialize(df)
    frozenSchema.foreach { frozen =>
      SchemaOps.requireArity(frozen, df.schema.fields.length)
      if (!SchemaOps.structurallyEqual(frozen, df.schema))
        throw new graft.model.SchemaInconsistentException(
          s"Batch schema ${df.schema.simpleString} does not match the " +
            s"frozen sink schema ${frozen.simpleString}")
    }
    ArcaneLayout.writeDataBatch(df, config.targetPath, format,
      config.batchDatePartition, config.maxRecordsPerFile)
  }

  /** Attach to a streaming DataFrame via foreachBatch. Caller sets the
    * trigger + checkpoint and starts the query. */
  def attach(df: DataFrame): DataStreamWriter[Row] =
    df.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      writeBatch(batch): Unit
    }

  /** Convenience: start with a trigger + checkpoint. */
  def start(df: DataFrame, checkpoint: String, trigger: Trigger): StreamingQuery =
    attach(df).option("checkpointLocation", checkpoint).trigger(trigger).start()

  /** Graceful-completion hook — called by the runner only when the
    * stream finished without failure/interruption. */
  def complete(df: DataFrame): Unit =
    schemaHashValue.foreach(h =>
      ArcaneLayout.writeCompletionToken(df, config.targetPath, h))
}

/** JSON-lines variant (reference: MultilineJsonSink.cs; SURVEY.md §2.2
  * K2) — one `part-*-{hash}.json` blob per batch, schema file + metadata
  * + token semantics identical to the Parquet sink. */
object MultilineJsonSink {
  def apply(config: SinkConfig): ArcaneParquetSink =
    new ArcaneParquetSink(config, format = "json")
}
