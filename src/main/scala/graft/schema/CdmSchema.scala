package graft.schema

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.types._

import graft.model.Constants

/** Parser for Microsoft CDM (Common Data Model) entity documents
  * (`{entity}.cdm.json`) into Spark [[StructType]]s.
  *
  * Behavior mirrors the reference's schema provider
  * (reference: src/Sources/CdmChangeFeedSource/Models/SimpleCdmAttribute.cs:14-29
  * — the 13-entry primitive map; :105-118 — recursive resolution of
  * user-defined types via `extendsDataType`), re-expressed over Spark's
  * type system per SURVEY.md §1.2. Column order is preserved: CDM change
  * feeds are positional CSV.
  */
object CdmSchema {
  private val mapper = new ObjectMapper()

  /** CDM primitive name (lowercased) → Spark type.
    * Notable quirks kept for parity: `time` is an int offset, `noyes` is
    * a boolean-as-int, `guid`/`binary` are strings
    * (reference: SimpleCdmAttribute.cs:14-29).
    */
  val primitiveTypes: Map[String, DataType] = Map(
    "string" -> StringType,
    "datetime" -> TimestampType,
    "date" -> TimestampType,
    "time" -> IntegerType,
    "int64" -> LongType,
    "biginteger" -> LongType,
    "int32" -> IntegerType,
    "integer" -> IntegerType,
    "decimal" -> DecimalType(38, 18),
    "double" -> DoubleType,
    "float" -> FloatType,
    "boolean" -> BooleanType,
    "listlookupwellknown" -> StringType,
    "noyes" -> IntegerType,
    "guid" -> StringType,
    "binary" -> StringType)

  /** Parse a CDM entity document. The document's `definitions` array
    * holds one entity (with `hasAttributes`) plus zero or more
    * user-defined data types (`dataTypeName`/`extendsDataType` chains)
    * which are resolved recursively down to a primitive.
    *
    * @throws IllegalArgumentException on an unknown primitive or an
    *         unresolvable/cyclic custom type (reference:
    *         SimpleCdmAttribute.cs:89-97).
    */
  def fromJson(cdmJson: String): StructType = {
    val root = mapper.readTree(cdmJson)
    val defs = root.path("definitions")
    require(defs.isArray, "CDM document has no definitions array")

    // user-defined type name → what it extends
    val customTypes: Map[String, String] = {
      val b = Map.newBuilder[String, String]
      defs.forEach { d =>
        if (d.has("dataTypeName")) {
          val ext = d.path("extendsDataType")
          val parent =
            if (ext.isTextual) ext.asText()
            else ext.path("dataTypeReference").asText("")
          if (parent.nonEmpty) b += d.path("dataTypeName").asText() -> parent
        }
      }
      b.result()
    }

    def resolve(name: String, seen: Set[String]): DataType = {
      val key = name.toLowerCase
      primitiveTypes.get(key).getOrElse {
        if (seen.contains(key))
          throw new IllegalArgumentException(s"Cyclic CDM data type: $name")
        customTypes.collectFirst {
          case (k, parent) if k.equalsIgnoreCase(name) => parent
        } match {
          case Some(parent) => resolve(parent, seen + key)
          case None =>
            throw new IllegalArgumentException(
              s"Unknown CDM primitive type: $name")
        }
      }
    }

    val entity = {
      var found: Option[JsonNode] = None
      defs.forEach { d => if (found.isEmpty && d.has("hasAttributes")) found = Some(d) }
      found.getOrElse(
        throw new IllegalArgumentException("No entity definition with hasAttributes"))
    }

    val fields = Vector.newBuilder[StructField]
    entity.path("hasAttributes").forEach { attr =>
      val name = attr.path("name").asText()
      val dt =
        if (attr.hasNonNull("dataFormat")) resolve(attr.path("dataFormat").asText(), Set())
        else if (attr.hasNonNull("dataType")) resolve(attr.path("dataType").asText(), Set())
        else throw new IllegalArgumentException(
          s"Attribute $name has neither dataFormat nor dataType")
      // everything nullable by default, per the reference's
      // GetNullableClrType wrapping (SURVEY.md §1.2)
      fields += StructField(name, dt, nullable = true)
    }
    StructType(fields.result())
  }

  /** Schema of the change feed = entity schema + appended merge key
    * (copied from RECID; reference: CdmChangeFeedSource.cs:36,266-272). */
  def withMergeKeyField(entity: StructType): StructType =
    StructType(entity.fields :+
      StructField(Constants.MergeKeyColumn, StringType, nullable = true))
}
