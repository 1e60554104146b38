package graft.schema

import java.security.MessageDigest

import org.apache.spark.sql.types.StructType

import graft.model.SchemaMismatchException

/** Schema fingerprinting + drift detection.
  *
  * The reference fingerprints a schema by hashing the bytes of an empty
  * Parquet file (reference: src/Sinks/Parquet/ParquetOperations.cs:126-149)
  * and embeds full + 7-char short hashes in every part filename. Writer
  * bytes aren't reproducible across libraries, so we hash the canonical
  * `StructType.json` instead — consumers only ever compare fingerprints
  * for equality, so any stable canonical form works (SURVEY.md §7.4).
  */
object SchemaOps {

  def fingerprint(schema: StructType): String = {
    val md = MessageDigest.getInstance("SHA-256")
    md.digest(schema.json.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
  }

  /** 7-char short hash used in part filenames
    * (reference: ParquetSink.cs:239-240). */
  def shortFingerprint(schema: StructType): String =
    fingerprint(schema).take(7)

  /** Structural equality: same field names, types, and order.
    * Nullability and metadata are ignored — the reference's comparer
    * looks at name/type/order only (reference: SimpleCdmEntity.cs:82-115). */
  def structurallyEqual(a: StructType, b: StructType): Boolean =
    a.fields.length == b.fields.length &&
      a.fields.zip(b.fields).forall { case (x, y) =>
        x.name == y.name && x.dataType == y.dataType
      }

  /** Drift gate run per micro-batch / schema-poll tick: any structural
    * change to the frozen schema aborts the stream so the operator can
    * restart it in backfill mode (reference:
    * CdmChangeFeedSource.cs:374-404; ArcaneExceptionHandler.cs:29-48).
    */
  def requireNoDrift(frozen: StructType, current: StructType): Unit =
    if (!structurallyEqual(frozen, current))
      throw new SchemaMismatchException(
        s"Schema drift detected: frozen=${frozen.simpleString} " +
          s"current=${current.simpleString}")

  /** Arity check between an incoming row batch and the frozen schema
    * (reference: ParquetOperations.cs:60-72 ⇒ SchemaInconsistentException
    * ⇒ exit RESTART). */
  def requireArity(frozen: StructType, actualFieldCount: Int): Unit =
    if (frozen.fields.length != actualFieldCount)
      throw new graft.model.SchemaInconsistentException(
        s"Expected ${frozen.fields.length} fields, got $actualFieldCount")
}
