package graft.schema

import java.util.Base64

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.dataformat.yaml.YAMLFactory
import org.apache.spark.sql.types._

import graft.model.SchemaNotFoundException

/** OpenAPI v3 schema fragment → Spark StructType (reference:
  * src/Sources/RestApi/Extensions/StringExtensions.cs:20-33 parses a
  * base64 YAML/JSON fragment; src/Sinks/Parquet/ParquetOperations.cs:27,
  * 172-182 resolves properties recursively — `object` properties become
  * nested StructFields, verified two levels deep in
  * test/Operations/ParquetOperationsTests.cs:26-58).
  *
  * Primitive mapping mirrors Microsoft.OpenApi's
  * `MapOpenApiPrimitiveTypeToSimpleType` (type, format) table with the
  * reference's `GetNullableClrType` post-step (Guid → string,
  * everything nullable). `array` items are mapped to ArrayType — an
  * extension beyond the reference (its mapper falls back to `object`
  * for arrays), free in Spark and needed for embedding columns.
  */
object OpenApiSchema {

  private val yamlMapper = new ObjectMapper(new YAMLFactory()) // YAML ⊇ JSON

  /** Parse a base64-encoded fragment — the reference's wire format for
    * the declared REST schema. */
  def fromBase64(encoded: String): StructType =
    fromFragment(new String(Base64.getDecoder.decode(encoded), "UTF-8"))

  /** Parse a YAML or JSON OpenAPI v3 schema fragment. */
  def fromFragment(fragment: String): StructType = {
    val root =
      try yamlMapper.readTree(fragment)
      catch {
        case e: Exception =>
          throw new SchemaNotFoundException(
            s"Cannot parse OpenApi V3 schema fragment: ${e.getMessage}")
      }
    if (root == null || !root.has("properties"))
      throw new SchemaNotFoundException(
        s"OpenApi V3 schema fragment has no properties: $fragment")
    resolveObject(root)
  }

  private def resolveObject(node: JsonNode): StructType = {
    val props = node.path("properties")
    val fields = Vector.newBuilder[StructField]
    props.properties().forEach { e =>
      fields += StructField(e.getKey, resolveType(e.getValue), nullable = true)
    }
    StructType(fields.result())
  }

  /** (type, format) → Spark type, per the Microsoft.OpenApi primitive
    * table; `object` recurses, `array` wraps its items. */
  private def resolveType(node: JsonNode): DataType = {
    val tpe = node.path("type").asText("")
    val fmt = node.path("format").asText("")
    (tpe, fmt) match {
      case ("object", _) => resolveObject(node)
      case ("array", _) => ArrayType(resolveType(node.path("items")), containsNull = true)
      case ("boolean", _) => BooleanType
      case ("integer", "int64") => LongType
      case ("integer", _) => IntegerType
      case ("number", "float") => FloatType
      case ("number", "decimal") => DecimalType(38, 18)
      case ("number", _) => DoubleType
      case ("string", "date-time") => TimestampType
      case ("string", "date") => DateType
      case ("string", "binary") | ("string", "byte") => BinaryType
      // uuid/char/duration + unknown formats → string (GetNullableClrType
      // maps Guid to string; Parquet.NET stores the rest as strings)
      case ("string", _) => StringType
      case other =>
        throw new SchemaNotFoundException(
          s"Unsupported OpenApi type/format: $other")
    }
  }
}
