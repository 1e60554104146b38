package graft.schema

import java.util.Base64

import org.apache.spark.sql.types._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.model.SchemaNotFoundException

/** Ports the reference's OpenAPI→schema cases
  * (test/Operations/ParquetOperationsTests.cs:15-58 over the
  * RestApiTestData fixtures) to the Spark StructType converter. */
class OpenApiSchemaSpec extends AnyFlatSpec with Matchers {

  behavior of "OpenApiSchema"

  // mirror of open_api_schema_simple.yaml
  it should "map a flat int32 fragment (simple fixture)" in {
    val fragment =
      """{"type": "object", "properties": {
        |  "page": {"type": "integer", "format": "int32"},
        |  "limit": {"type": "integer", "format": "int32"},
        |  "pages": {"type": "integer", "format": "int32"},
        |  "total": {"type": "integer", "format": "int32"}}}""".stripMargin
    OpenApiSchema.fromFragment(fragment) shouldBe StructType(Seq(
      StructField("page", IntegerType),
      StructField("limit", IntegerType),
      StructField("pages", IntegerType),
      StructField("total", IntegerType)))
  }

  // mirror of open_api_schema_nested_two_levels.yaml
  it should "resolve nested objects two levels deep (nested fixture)" in {
    val fragment =
      """{"type": "object", "properties": {
        |  "page": {"type": "integer", "format": "int32"},
        |  "limit": {"type": "object", "properties": {
        |    "max_pages": {"type": "integer", "format": "int32"},
        |    "min_pages": {"type": "integer", "format": "int32"},
        |    "capacity": {"type": "object", "properties": {
        |      "size": {"type": "integer", "format": "int64"}}}}},
        |  "desc": {"type": "string"}}}""".stripMargin
    OpenApiSchema.fromFragment(fragment) shouldBe StructType(Seq(
      StructField("page", IntegerType),
      StructField("limit", StructType(Seq(
        StructField("max_pages", IntegerType),
        StructField("min_pages", IntegerType),
        StructField("capacity", StructType(Seq(
          StructField("size", LongType))))))),
      StructField("desc", StringType)))
  }

  it should "parse YAML fragments and base64 wire format" in {
    val yaml =
      """type: object
        |properties:
        |  id:
        |    type: string
        |    format: uuid
        |  score:
        |    type: number
        |    format: double
        |  active:
        |    type: boolean
        |  created:
        |    type: string
        |    format: date-time
        |  tags:
        |    type: array
        |    items:
        |      type: string""".stripMargin
    val expected = StructType(Seq(
      StructField("id", StringType), // Guid → string, per GetNullableClrType
      StructField("score", DoubleType),
      StructField("active", BooleanType),
      StructField("created", TimestampType),
      StructField("tags", ArrayType(StringType))))
    OpenApiSchema.fromFragment(yaml) shouldBe expected
    val b64 = Base64.getEncoder.encodeToString(yaml.getBytes("UTF-8"))
    OpenApiSchema.fromBase64(b64) shouldBe expected
  }

  it should "reject fragments without properties" in {
    a[SchemaNotFoundException] should be thrownBy
      OpenApiSchema.fromFragment("""{"type": "object"}""")
  }

  it should "reject unknown types" in {
    a[SchemaNotFoundException] should be thrownBy
      OpenApiSchema.fromFragment(
        """{"type": "object", "properties": {"x": {"type": "mystery"}}}""")
  }
}
